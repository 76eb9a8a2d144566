"""Pallas TPU kernels for the hot sample-rate path."""
