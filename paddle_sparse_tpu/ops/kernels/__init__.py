"""Pallas TPU kernels for the hot sparse ops."""
