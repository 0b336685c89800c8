"""Fused Kronecker transform + per-token quantization.

Contract parity: deploy/kernels/kron_matmul.py (Triton fused
"L^T X R + absmax + round + pack" kernel) and block_matmul.py (per-head
Single-transform variant).

DESIGN NOTE (TPU): on GPUs the fusion matters because the transformed
activations would otherwise round-trip through global memory between the
transform matmul and the quantize kernel. On TPU, XLA already fuses the
per-token absmax reduction, divide, round and clip into the transform
matmul's epilogue (one HLO fusion — verify with jax.xla_computation or a
profiler trace), and a hand-written Pallas version would need lane-crossing
reshapes between the two small matmuls (Mosaic relayouts) for no measured
win at decode shapes (the transform is <2% of decode time; the W4 GEMM and
KV cache dominate). So the "kernel" here is the jit-fused composition, with
the same signature a Pallas drop-in would have. Activations stay int8-range
bf16 codes (see kernels/int4_matmul.py for why packing activations buys
nothing on TPU).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def fused_kron_quant(
    x,
    left,
    right,
    diag: Optional[jnp.ndarray] = None,
    clip_max=None,
    clip_min=None,
    q_max: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """y = quantize_per_token(x @ kron(left, right)).

    x [..., M*N]; left [M, M]; right [N, N]; optional per-channel diag
    pre-scale and LAC sigmoid-clip factors (already sigmoided ratios).
    Returns (codes bf16 on the int4 grid, scales fp32 [..., 1]).
    """
    shape = x.shape
    if diag is not None:
        x = x * diag.astype(x.dtype)
    ln, rn = left.shape[0], right.shape[0]
    xm = x.reshape(-1, ln, rn)
    xm = jnp.matmul(xm, right.astype(xm.dtype))
    xm = jnp.matmul(left.T.astype(xm.dtype), xm)
    y = xm.reshape(shape).astype(jnp.float32)

    xmax = jnp.maximum(jnp.max(y, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(y, axis=-1, keepdims=True), 0.0)
    if clip_max is not None:
        xmax = xmax * clip_max
        xmin = xmin * clip_min
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    scale = jnp.where(absmax == 0, 1.0, absmax / q_max)
    codes = jnp.clip(jnp.round(y / scale), -q_max - 1, q_max).astype(jnp.bfloat16)
    return codes, scale


def fused_head_trans_quant(
    x,
    head_matrix,
    q_max: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-head Single-transform + quant (block_matmul.py analog).

    x [..., n_heads, head_dim] is mixed over the *heads* axis by
    head_matrix^T (the o_proj transform, llama_utils.py:276-277), flattened
    and quantized per token.
    """
    mixed = jnp.einsum("ji,...jd->...id", head_matrix.astype(x.dtype), x)
    flat = mixed.reshape(mixed.shape[:-2] + (-1,)).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(flat), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / q_max)
    codes = jnp.clip(jnp.round(flat / scale), -q_max - 1, q_max).astype(jnp.bfloat16)
    return codes, scale
