"""Reusable demod ops (timing, phase, fit, slicers, filters)."""
