"""Pure, vectorized kernels shared by stages and the oracle."""
