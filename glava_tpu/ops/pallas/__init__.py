"""Pallas TPU kernels for the hot spectrum-update path."""
