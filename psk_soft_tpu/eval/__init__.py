"""Evaluation tools: BER/SER sweeps vs theory."""
