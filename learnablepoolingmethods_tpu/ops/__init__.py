"""TPU op library: fused kernels and on-device primitives."""
