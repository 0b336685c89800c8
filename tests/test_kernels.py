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


@pytest.mark.parametrize("m,k,q_max,use_clip", [
    (300, 384, 7, False),   # m not a block multiple
    (256, 1408, 7, True),   # K = 11*128 (non-power-of-two chunking)
    (128, 256, 127, False),  # a8 grid
])
def test_quant_acts_i8_matches_xla_chain(rng, m, k, q_max, use_clip):
    """quant_acts_i8 (single-pass Pallas) == the serving XLA quant chain,
    including LAC clips, zero rows, and the asym max/min clamp rule."""
    from flatquant_tpu.kernels.int4_matmul import quant_acts_i8

    x = rng.standard_normal((m, k)).astype(np.float32) * 3.0
    x[5] = 0.0  # zero row -> scale 1.0, codes 0
    x = jnp.asarray(x, jnp.bfloat16)
    clip = ((jnp.float32(0.83), jnp.float32(0.91)) if use_clip else None)

    xq, xs = quant_acts_i8(x, clip=clip, q_max=q_max, interpret=True)
    assert xq.dtype == jnp.int8 and xs.shape == (m, 1)

    # XLA chain (serving _quant_linear semantics)
    xf = x.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    if clip is not None:
        xmax = xmax * clip[0]
        xmin = xmin * clip[1]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    want_s = jnp.where(absmax == 0, 1.0, absmax / q_max)
    want_q = jnp.clip(jnp.round(xf / want_s), -q_max - 1, q_max)

    # scales: XLA CPU lowers /q_max as reciprocal-multiply in some contexts
    # (1-ulp wobble, same quirk documented on w4a4_matmul_i8_fusedq);
    # on-TPU the division is exact and real==fake parity tests pin it
    np.testing.assert_allclose(np.asarray(xs), np.asarray(want_s), rtol=2e-7)
    np.testing.assert_allclose(np.asarray(xq, np.float32), np.asarray(want_q),
                               atol=1.0 + 1e-6)  # 1-ulp div rounding can
    # move a value across a .5 boundary on CPU interpret; codes then differ
    # by at most 1 on <0.1% of entries. Exactness on-TPU is asserted by the
    # device chain test (tools/glue_compare.py) and real==fake parity.
    mism = np.mean(np.asarray(xq, np.float32) != np.asarray(want_q))
    assert mism < 3e-3, mism
    assert float(jnp.abs(xq[5].astype(jnp.float32)).max()) == 0.0


@pytest.mark.parametrize("m,k,nh", [(256, 256, 384), (300, 128, 256)])
def test_w4a4_swiglu_matches_composed(rng, m, k, nh):
    """Fused SwiGLU epilogue == plain GEMM -> split -> silu(gate)*up, in f32
    (identical dequant algebra; silu on the same f32 values)."""
    from flatquant_tpu.kernels.int4_matmul import (
        w4a4_matmul_i8_swiglu, w4a8_matmul_ref)

    w = jnp.asarray(rng.integers(-8, 8, (2 * nh, k)), jnp.int8)
    wp = pack_weight_planar(w)
    sw = jnp.asarray(rng.uniform(0.01, 0.1, (2 * nh,)), jnp.float32)
    xq = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (m, 1)), jnp.float32)

    got = w4a4_matmul_i8_swiglu(xq, xs, wp, sw, out_dtype=jnp.float32,
                                interpret=True)
    y = w4a8_matmul_ref(xq, xs, wp, sw, out_dtype=jnp.float32)
    up, gate = jnp.split(y, 2, axis=-1)
    want = jax.nn.silu(gate) * up
    assert got.shape == (m, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
