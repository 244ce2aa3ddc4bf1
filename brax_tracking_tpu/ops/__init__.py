"""Pallas TPU kernels for the physics hot path."""
