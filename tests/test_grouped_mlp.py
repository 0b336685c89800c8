"""Grouped (relayout-free) MLP pipeline kernels: interpret-mode parity vs
the standard composed path (kernels/grouped_mlp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.kernels.grouped_mlp import (
    group_layout,
    quant_acts_i8_grouped,
    ungroup_layout,
    w4a4_matmul_i8_grouped,
    w4a4_swiglu_grouped,
)
from flatquant_tpu.kernels.int4_matmul import (
    pack_weight_planar,
    w4a8_matmul_ref,
)


def test_swiglu_grouped_matches_composed(rng):
    """Grouped swiglu+right epilogue == plain GEMM -> silu -> per-group
    right-dot, at matching (bf16) precision points."""
    m, k, G = 256, 256, 4  # nh = 512
    nh = G * 128
    w = jnp.asarray(rng.integers(-8, 8, (2 * nh, k)), jnp.int8)
    wp = pack_weight_planar(w)
    sw = jnp.asarray(rng.uniform(0.01, 0.05, (2 * nh,)), jnp.float32)
    xq = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (m, 1)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((128, 128)) * 0.2, jnp.float32)

    got = w4a4_swiglu_grouped(xq, xs, wp, sw, right, interpret=True)
    assert got.shape == (G, m, 128) and got.dtype == jnp.bfloat16

    y = w4a8_matmul_ref(xq, xs, wp, sw, out_dtype=jnp.float32)
    up, gate = jnp.split(y, 2, axis=-1)
    act = (up * (gate * jax.nn.sigmoid(gate))).astype(jnp.bfloat16)
    want = jnp.matmul(
        act.reshape(m, G, 128).astype(jnp.bfloat16),
        right.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).transpose(1, 0, 2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 output grid; dot orders identical
    # majority must be bit-equal (same f32 accumulation, same casts)
    eq = np.mean(np.asarray(got, np.float32) == np.asarray(want, np.float32))
    assert eq > 0.95, eq


@pytest.mark.parametrize("use_clip", [False, True])
def test_quant_grouped_matches_flat(rng, use_clip):
    G, t = 6, 96
    x = rng.standard_normal((t, G * 128)).astype(np.float32) * 2.0
    x[3] = 0.0
    xg = jnp.asarray(group_layout(jnp.asarray(x, jnp.bfloat16), G))
    clip = ((jnp.float32(0.9), jnp.float32(0.8)) if use_clip else None)

    qg, sg = quant_acts_i8_grouped(xg, clip=clip, q_max=7, interpret=True)
    assert qg.shape == (G, t, 128) and sg.shape == (t, 1)

    # flat XLA chain on the same bf16 values
    xf = jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    if clip is not None:
        xmax = xmax * clip[0]
        xmin = xmin * clip[1]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    want_s = jnp.where(absmax == 0, 1.0, absmax / 7)
    want_q = jnp.clip(jnp.round(xf / want_s), -8, 7)

    np.testing.assert_allclose(np.asarray(sg), np.asarray(want_s), rtol=2e-7)
    got_flat = ungroup_layout(qg).astype(jnp.float32)
    mism = np.mean(np.asarray(got_flat) != np.asarray(want_q))
    assert mism < 3e-3, mism  # 1-ulp CPU-interpret div wobble, as in
    # test_quant_acts_i8_matches_xla_chain
    assert float(jnp.abs(got_flat[3]).max()) == 0.0


def test_grouped_gemm_exact_vs_flat(rng):
    G, m, n = 6, 64, 384
    k = G * 128
    w = jnp.asarray(rng.integers(-8, 8, (n, k)), jnp.int8)
    wp = pack_weight_planar(w)
    sw = jnp.asarray(rng.uniform(0.005, 0.02, (n,)), jnp.float32)
    xq_flat = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (m, 1)), jnp.float32)

    ref = w4a8_matmul_ref(xq_flat, xs, wp, sw, jnp.float32)
    xg = group_layout(xq_flat, G)
    got = w4a4_matmul_i8_grouped(xg, xs, wp, sw, jnp.float32,
                                 block_m=32, block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grouped_pipeline_end_to_end(rng):
    """Full grouped pipeline == the engine's composed mlp tail:
    upgate GEMM -> silu*up -> kron(L, R) -> per-token quant -> down GEMM."""
    from flatquant_tpu.core.orth import random_orthogonal
    from flatquant_tpu.serving.quantized import kron_transform

    m, k, G = 256, 256, 4
    nh = G * 128
    wug = jnp.asarray(rng.integers(-8, 8, (2 * nh, k)), jnp.int8)
    wug_p = pack_weight_planar(wug)
    s_ug = jnp.asarray(rng.uniform(0.01, 0.05, (2 * nh,)), jnp.float32)
    wd = jnp.asarray(rng.integers(-8, 8, (k, nh)), jnp.int8)
    wd_p = pack_weight_planar(wd)
    s_d = jnp.asarray(rng.uniform(0.005, 0.02, (k,)), jnp.float32)
    left = jnp.asarray(random_orthogonal(G, rng), jnp.bfloat16)
    right = jnp.asarray(random_orthogonal(128, rng), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 0.5, (m, 1)), jnp.float32)

    # composed (current engine semantics)
    y = w4a8_matmul_ref(xq, xs, wug_p, s_ug, out_dtype=jnp.float32)
    up, gate = jnp.split(y, 2, axis=-1)
    act = (up * (gate * jax.nn.sigmoid(gate))).astype(jnp.bfloat16)
    z = kron_transform(act, (left, right))
    zf = z.astype(jnp.float32)
    am = jnp.max(jnp.abs(zf), axis=-1, keepdims=True)
    zs = jnp.where(am == 0, 1.0, am / 7)
    zq = jnp.clip(jnp.round(zf / zs), -8, 7).astype(jnp.int8)
    want = w4a8_matmul_ref(zq, zs, wd_p, s_d, jnp.float32)

    # grouped pipeline
    yg = w4a4_swiglu_grouped(xq, xs, wug_p, s_ug, right, interpret=True)
    zg = jnp.matmul(left.T, yg.reshape(G, -1),
                    preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16).reshape(G, m, 128)
    zq_g, zs_g = quant_acts_i8_grouped(zg, q_max=7, interpret=True)
    got = w4a4_matmul_i8_grouped(zq_g, zs_g, wd_p, s_d, jnp.float32,
                                 interpret=True)

    # scales agree closely; codes can differ by 1 on round boundaries,
    # so compare dequantized outputs within a few activation scales
    np.testing.assert_allclose(np.asarray(zs_g), np.asarray(zs),
                               rtol=3e-2)
    scale_bound = float(jnp.max(zs)) * float(jnp.max(jnp.abs(
        jnp.asarray(s_d)))) * k
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=0.05 * scale_bound)


def test_left_quant_grouped_matches_two_step(rng):
    """left_quant_i8_grouped (fused left contraction + quant) == the
    two-step matmul -> quant_acts_i8_grouped pipeline."""
    from flatquant_tpu.core.orth import random_orthogonal
    from flatquant_tpu.kernels.grouped_mlp import left_quant_i8_grouped

    G, t = 6, 96
    x = jnp.asarray(rng.standard_normal((G, t, 128)) * 1.5, jnp.bfloat16)
    left = jnp.asarray(random_orthogonal(G, rng), jnp.bfloat16)

    z = jnp.matmul(left.T, x.reshape(G, -1)).reshape(G, t, 128)
    want_q, want_s = quant_acts_i8_grouped(z, q_max=7, interpret=True)
    got_q, got_s = left_quant_i8_grouped(left.T, x, q_max=7, interpret=True)

    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-7)
    mism = np.mean(np.asarray(got_q) != np.asarray(want_q))
    assert mism < 3e-3, mism


def test_rmsnorm_right_grouped_matches_composed(rng):
    from flatquant_tpu.core.orth import random_orthogonal
    from flatquant_tpu.kernels.grouped_mlp import rmsnorm_right_grouped
    from flatquant_tpu.models.llama import rms_norm

    t, G = 96, 5
    h = G * 128
    x = jnp.asarray(rng.standard_normal((t, h)) * 2.0, jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (h,)), jnp.float32)
    right = jnp.asarray(random_orthogonal(128, rng), jnp.bfloat16)
    eps = 1e-5

    got = rmsnorm_right_grouped(x, w, right, eps, interpret=True)
    assert got.shape == (G, t, 128) and got.dtype == jnp.bfloat16

    xn = rms_norm(x, w, eps)  # bf16, same f32 math
    want = jnp.matmul(xn.reshape(t, G, 128), right).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    eq = np.mean(np.asarray(got, np.float32) == np.asarray(want, np.float32))
    assert eq > 0.95, eq


import pytest


@pytest.mark.parametrize("block_n", [512, 128])
def test_swiglu_grouped_gx_matches_flat_x(rng, block_n):
    """Grouped-x swiglu == flat-x swiglu on the same codes. block_n=128
    makes gridj = 4, exercising the j>0 reads of the j==0-hoisted concat/
    rowsum scratch (ADVICE r2: the default block covered only gridj=1)."""
    from flatquant_tpu.core.orth import random_orthogonal
    from flatquant_tpu.kernels.grouped_mlp import (
        group_layout, w4a4_swiglu_grouped_gx)

    m, Gin, G = 128, 2, 4  # k = 256, nh = 512
    k, nh = Gin * 128, G * 128
    w = jnp.asarray(rng.integers(-8, 8, (2 * nh, k)), jnp.int8)
    wp = pack_weight_planar(w)
    sw = jnp.asarray(rng.uniform(0.01, 0.05, (2 * nh,)), jnp.float32)
    xq = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (m, 1)), jnp.float32)
    right = jnp.asarray(random_orthogonal(128, rng), jnp.bfloat16)

    want = w4a4_swiglu_grouped(xq, xs, wp, sw, right, interpret=True)
    got = w4a4_swiglu_grouped_gx(group_layout(xq, Gin), xs, wp, sw, right,
                                 block_n=block_n, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_get_decompose_dim_rn128():
    from flatquant_tpu.core.kron import get_decompose_dim

    assert get_decompose_dim(4096, rn128=True) == (32, 128)
    assert get_decompose_dim(11008, rn128=True) == (86, 128)
    assert get_decompose_dim(256, rn128=True) == (2, 128)
    # not divisible -> balanced fallback
    assert get_decompose_dim(4092, rn128=True) == get_decompose_dim(4092)
    # 128 itself stays balanced (a 1x128 kron is pointless)
    assert get_decompose_dim(128, rn128=True) == get_decompose_dim(128)
    assert get_decompose_dim(4096) == (64, 64)


def test_tpu_decompose_end_to_end_cpu(rng):
    """Calibrate-mode forward, bake, serving params and fake==real parity
    all work with the rn128 decomposition (CPU fallback path; the grouped
    kernels themselves are covered by interpret tests + device parity)."""
    import dataclasses

    from flatquant_tpu.models.config import get_config
    from flatquant_tpu.models.llama import init_params, llama_forward
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4KV4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.serving.engine import serving_all_logits
    from flatquant_tpu.serving.quantized import build_serving_params

    from flatquant_tpu.quantize.bake import rtn_quantize_params
    from flatquant_tpu.quantize.spec import W4A4

    cfg = get_config("tiny-llama")
    fq_cfg = dataclasses.replace(W4A4, tpu_decompose=True)  # kv16: fake
    # and real paths numerically identical (same pairing as test_serving)
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                              dtype=jnp.float32)
    eval_params = rtn_quantize_params(fq_cfg, baked)
    fake = llama_forward(cfg, eval_params, toks, fq=baked_fq, fq_cfg=fq_cfg,
                         mode="eval", compute_dtype=jnp.float32)
    real = serving_all_logits(cfg, fq_cfg, sp, toks,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(real), np.asarray(fake),
                               rtol=1e-4, atol=1e-4)
