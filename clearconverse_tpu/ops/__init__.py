"""Shared compute kernels: XLA formulations in the model modules, Pallas
TPU kernels here for the hot ops where manual fusion/layout beats the
compiler (ops/pallas/*). Every Pallas kernel has an XLA reference
implementation it is tested against (interpret mode on CPU, compiled on
TPU)."""
