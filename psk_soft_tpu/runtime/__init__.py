"""Streaming host runtime: streams, packets, engine."""
