"""Numerical primitives: box geometry, matching, losses, NMS, Pallas kernels."""
