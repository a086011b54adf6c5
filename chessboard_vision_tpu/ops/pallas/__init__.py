"""Pallas TPU kernels for ops where XLA's lowering leaves headroom."""
