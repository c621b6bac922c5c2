"""Fused Pallas TPU kernels (hot-path ops)."""
