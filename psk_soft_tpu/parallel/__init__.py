"""Mesh sharding: channel + time-block parallel demod."""
