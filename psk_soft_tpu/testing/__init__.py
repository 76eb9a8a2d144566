"""Test fixtures and signal generators."""
