"""Demod pipelines: exact-semantics scan (psk) and block-parallel (blockpsk)."""
