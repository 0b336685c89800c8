"""Fused transform+quant (XLA-fusion design) correctness tests."""

import numpy as np
import jax.numpy as jnp

from flatquant_tpu.core.kron import kronecker_matmul
from flatquant_tpu.kernels.fused_trans_quant import fused_head_trans_quant, fused_kron_quant


def test_fused_kron_quant_matches_unfused(rng):
    n, ln, rn = 192, 12, 16
    x = jnp.asarray(rng.standard_normal((5, n)), jnp.float32)
    left = jnp.asarray(rng.standard_normal((ln, ln)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((rn, rn)), jnp.float32)
    diag = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)

    codes, scale = fused_kron_quant(x, left, right, diag=diag)
    y = kronecker_matmul(x * diag, left, right)
    # dequantized codes approximate the transformed activations
    deq = codes.astype(jnp.float32) * scale
    assert float(jnp.max(jnp.abs(deq - y))) <= float(scale.max()) * 0.5 + 1e-5
    cf = np.asarray(codes, np.float32)
    assert cf.min() >= -8 and cf.max() <= 7 and np.allclose(cf, np.round(cf))


def test_fused_kron_quant_lac_clip(rng):
    x = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    eye = jnp.eye(8, dtype=jnp.float32)
    _, s_free = fused_kron_quant(x, eye, eye)
    _, s_clip = fused_kron_quant(x, eye, eye, clip_max=jnp.float32(0.5),
                                 clip_min=jnp.float32(0.5))
    assert float(s_clip.max()) < float(s_free.max())


def test_fused_head_trans_quant(rng):
    nh, hd = 8, 16
    x = jnp.asarray(rng.standard_normal((4, nh, hd)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((nh, nh)), jnp.float32)
    codes, scale = fused_head_trans_quant(x, m)
    ref = jnp.einsum("ji,bjd->bid", m, x).reshape(4, -1)
    deq = codes.astype(jnp.float32) * scale
    assert float(jnp.max(jnp.abs(deq - ref))) <= float(scale.max()) * 0.5 + 1e-5
