"""Compute primitives: assembly, dense/mixed-precision solvers,
orthonormalization, sparse ops, and Pallas TPU kernels."""
