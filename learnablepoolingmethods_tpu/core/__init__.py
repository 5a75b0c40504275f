"""Training runtime: state, optimizers, jit'd train/eval steps."""
