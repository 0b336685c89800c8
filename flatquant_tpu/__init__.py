"""flatquant-tpu: TPU-native FlatQuant (learnable affine transforms for LLM
quantization) built from scratch in JAX/XLA/Pallas.

Capability reference: ruikangliu/FlatQuant (ICML 2025, arXiv:2410.09426).
This package is a ground-up redesign for TPU: functional pytree models,
pjit/shard_map parallelism over a device mesh, and Pallas kernels for the
fused transform+quant / INT4-GEMM / quantized-KV hot paths.
"""

__version__ = "0.1.0"
