"""Pallas kernel tests (interpret mode on CPU; bit-exactness vs XLA ref)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.kernels.int4_matmul import (
    pack_weight_planar,
    quantize_acts_sym,
    unpack_weight_planar,
    w4a8_matmul,
    w4a8_matmul_ref,
)


def test_planar_pack_roundtrip(rng):
    q = jnp.asarray(rng.integers(-8, 8, (64, 256)), jnp.int8)
    wp = pack_weight_planar(q)
    assert wp.shape == (64, 128) and wp.dtype == jnp.uint8
    np.testing.assert_array_equal(unpack_weight_planar(wp), q)


def test_quantize_acts_sym(rng):
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    q, s = quantize_acts_sym(x)
    assert q.dtype == jnp.bfloat16
    qf = np.asarray(q, np.float32)
    assert qf.min() >= -8 and qf.max() <= 7
    assert np.allclose(qf, np.round(qf))  # exact integer codes
    # dequant error bounded by scale/2
    assert float(jnp.max(jnp.abs(qf * s - np.asarray(x)))) <= float(s.max()) * 0.5 + 1e-6
    # zero row
    q0, s0 = quantize_acts_sym(jnp.zeros((2, 8)))
    assert float(jnp.abs(q0).max()) == 0 and bool(jnp.isfinite(s0).all())


@pytest.mark.parametrize("shape", [(8, 256, 384), (64, 512, 256), (17, 128, 128)])
def test_w4a8_kernel_exact_vs_ref(rng, shape):
    m, k, n = shape
    q = jnp.asarray(rng.integers(-8, 8, (n, k)), jnp.int8)
    wp = pack_weight_planar(q)
    ws = jnp.asarray(rng.uniform(0.005, 0.02, (n,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    xq, xs = quantize_acts_sym(x)
    ref = w4a8_matmul_ref(xq, xs, wp, ws, jnp.float32)
    out = w4a8_matmul(
        xq, xs, wp, ws, jnp.float32, block_m=64, block_n=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_w4a8_matches_fake_quant_semantics(rng):
    """Real-quant kernel == core fake-quant definition (sym, per-channel/token)."""
    from flatquant_tpu.core.quant import (
        ActQuantCfg,
        WeightQuantCfg,
        act_fake_quant,
        weight_fake_quant,
        weight_find_params,
        weight_quantize_int,
    )

    m, k, n = 16, 256, 128
    w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wcfg = WeightQuantCfg(bits=4, sym=True)
    acfg = ActQuantCfg(bits=4, sym=True)

    # fake path
    s, z = weight_find_params(w, wcfg)
    y_fake = act_fake_quant(x, acfg) @ weight_fake_quant(w, s, z, wcfg).T

    # real path
    q = weight_quantize_int(w, s, z, wcfg)
    wp = pack_weight_planar(q)
    xq, xs = quantize_acts_sym(x)
    y_real = w4a8_matmul_ref(xq, xs, wp, s[:, 0], jnp.float32)

    np.testing.assert_allclose(np.asarray(y_real), np.asarray(y_fake), atol=2e-5)


@pytest.mark.parametrize("shape", [(8, 256, 384), (64, 512, 256), (17, 128, 128)])
def test_w4a4_i8_kernel_exact_vs_ref(rng, shape):
    """int8-MXU kernel (prefill rate path) is bit-identical to the bf16-code
    reference: both accumulate the exact same integers."""
    from flatquant_tpu.kernels.int4_matmul import w4a4_matmul_i8

    m, k, n = shape
    q = jnp.asarray(rng.integers(-8, 8, (n, k)), jnp.int8)
    wp = pack_weight_planar(q)
    ws = jnp.asarray(rng.uniform(0.005, 0.02, (n,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    xq, xs = quantize_acts_sym(x)
    ref = w4a8_matmul_ref(xq, xs, wp, ws, jnp.float32)
    out = w4a4_matmul_i8(
        xq.astype(jnp.int8), xs, wp, ws, jnp.float32,
        block_m=64, block_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("use_clip", [False, True])
def test_w4a4_i8_fusedq_matches_composed(rng, use_clip):
    """Fused-quant GEMM (quant in the kernel prologue) matches the composed
    quantize-then-w4a4_matmul_i8 pipeline.

    On TPU the two are bit-identical (validated on-device 2026-08-17 at
    M=2048 K=4096 N=4096, exact and random cases). In CPU interpret mode
    the activation scale `absmax / 7.0` may differ by 1 ulp between
    lowering contexts (XLA CPU rewrites the division to reciprocal-multiply
    inside jit), so this test constructs rows whose absmax is exactly
    7 * 2^e — the scale is then a power of two, division is exact in any
    lowering, and bit-identity is guaranteed."""
    from flatquant_tpu.kernels.int4_matmul import w4a4_matmul_i8, w4a4_matmul_i8_fusedq

    m, k, n = 64, 256, 384
    q = jnp.asarray(rng.integers(-8, 8, (n, k)), jnp.int8)
    wp = pack_weight_planar(q)
    ws = jnp.asarray(rng.uniform(0.005, 0.02, (n,)), jnp.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    idx = np.argmax(np.abs(x), axis=1)
    x[np.arange(m), idx] = np.sign(x[np.arange(m), idx]) * 7.0 * 0.5
    x = np.clip(x, -7.0 * 0.5, 7.0 * 0.5)
    x = jnp.asarray(x)
    clip = (jnp.float32(1.0), jnp.float32(1.0)) if use_clip else None

    xf = x.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    xq = jnp.clip(jnp.round(xf / xs), -8, 7).astype(jnp.int8)
    ref = w4a4_matmul_i8(xq, xs, wp, ws, jnp.float32,
                         block_m=64, block_n=128, interpret=True)
    out = w4a4_matmul_i8_fusedq(x, wp, ws, clip, jnp.float32,
                                block_m=64, block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
