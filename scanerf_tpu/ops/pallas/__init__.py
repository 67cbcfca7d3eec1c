"""Pallas TPU kernels for the ScaNeRF-TPU hot path."""
