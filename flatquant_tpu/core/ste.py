"""Straight-through estimators for quantization.

Parity target: flatquant/quant_utils.py:3-7 in the reference (round with
identity gradient). Implemented with ``stop_gradient`` so it traces to a
single fused VPU op under XLA instead of a custom-VJP call boundary.
"""

import jax
import jax.numpy as jnp


def round_ste(x: jax.Array) -> jax.Array:
    """Round to nearest (ties-to-even, matching torch.round) with a
    straight-through gradient of 1."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def clamp_ste(x: jax.Array, lo, hi) -> jax.Array:
    """Clamp with straight-through gradient (gradient 1 everywhere)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)
