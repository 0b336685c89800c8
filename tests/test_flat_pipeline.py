"""Flat-pipeline fused kernels (kernels/flat_pipeline.py): parity vs the
grouped generation and vs the composed XLA path.

The flat pipeline is the serving default (see the module docstring for the
device measurements that motivated the switch); these tests pin it
bit-level to the grouped kernels it replaced, so the extensive grouped
parity suite transfers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flatquant_tpu.core.orth import random_orthogonal
from flatquant_tpu.kernels.flat_pipeline import (
    left_quant_i8_flat,
    rmsnorm_right_flat,
    w4a4_matmul_i8_swiglu_right,
)
from flatquant_tpu.kernels.grouped_mlp import (
    group_layout,
    left_quant_i8_grouped,
    rmsnorm_right_grouped,
    ungroup_layout,
    w4a4_swiglu_grouped,
)
from flatquant_tpu.kernels.int4_matmul import pack_weight_planar


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_rmsnorm_right_flat_matches_grouped(rng):
    t, g = 96, 3
    h = g * 128
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (h,)), jnp.float32)
    right = jnp.asarray(random_orthogonal(128, rng), jnp.bfloat16)
    flat = rmsnorm_right_flat(x, w, right, 1e-5, interpret=True)
    grp = rmsnorm_right_grouped(x, w, right, 1e-5, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(flat, np.float32),
        np.asarray(ungroup_layout(grp), np.float32))


def test_left_quant_flat_matches_grouped(rng):
    t, g = 128, 5
    k = g * 128
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
    left_t = jnp.asarray(random_orthogonal(g, rng), jnp.bfloat16)
    clip = (jnp.float32(0.9), jnp.float32(0.95))
    qf, sf = left_quant_i8_flat(left_t, x, clip=clip, interpret=True)
    qg, sg = left_quant_i8_grouped(left_t, group_layout(x, g), clip=clip,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(sf), np.asarray(sg))
    np.testing.assert_array_equal(np.asarray(qf),
                                  np.asarray(ungroup_layout(qg)))


def test_left_quant_flat_is_o_transform_quant(rng):
    """The attention-output path: left_quant_i8_flat(o_t.T, attn) ==
    the engine's einsum('ji,bstjd->bstid') + XLA per-token quant chain."""
    t, g, hd = 64, 4, 128
    attn = jnp.asarray(rng.standard_normal((t, g * hd)), jnp.bfloat16)
    o_t = jnp.asarray(random_orthogonal(g, rng), jnp.bfloat16)
    q, s = left_quant_i8_flat(o_t.T, attn, q_max=7, interpret=True)

    # composed: head mixing in bf16 (f32 accum), then the serving scale rule
    a3 = attn.reshape(t, g, hd)
    mixed = jnp.einsum("ji,tjd->tid", o_t.astype(jnp.float32),
                       a3.astype(jnp.float32)).astype(jnp.bfloat16)
    xf = mixed.reshape(t, g * hd).astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    want = jnp.clip(jnp.round(xf / xs), -8, 7)
    np.testing.assert_allclose(np.asarray(s), np.asarray(xs), rtol=1e-6)
    # f32 accumulation ORDER differs between the kernel dot and the
    # composed einsum; the final bf16 cast can then flip round() by one
    # code on values near .5 grid boundaries (~0.2% here). The engine's
    # own composed path has the same property, so within-1 is the
    # correct contract.
    d = np.abs(np.asarray(q, np.int32) - np.asarray(want, np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())


def test_swiglu_right_flat_matches_grouped(rng):
    m, gin, g = 128, 2, 4
    k, nh = gin * 128, g * 128
    w = jnp.asarray(rng.integers(-8, 8, (2 * nh, k)), jnp.int8)
    wp = pack_weight_planar(w)
    sw = jnp.asarray(rng.uniform(0.01, 0.05, (2 * nh,)), jnp.float32)
    xq = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (m, 1)), jnp.float32)
    right = jnp.asarray(random_orthogonal(128, rng), jnp.bfloat16)
    flat = w4a4_matmul_i8_swiglu_right(xq, xs, wp, sw, right,
                                       block_n=128, interpret=True)
    grp = w4a4_swiglu_grouped(xq, xs, wp, sw, right, interpret=True)
    np.testing.assert_array_equal(np.asarray(flat, np.float32),
                                  np.asarray(ungroup_layout(grp), np.float32))


def test_swiglu_right_flat_partial_tail(rng):
    """bn that does NOT divide nh (the [2, nh, K/2] weight view frees the
    block size; nh = 3*128 with bn = 256 leaves a 128-wide tail block):
    results must equal the bn=nh single-block run exactly."""
    m, gin = 128, 2
    k, nh = gin * 128, 3 * 128
    w = jnp.asarray(rng.integers(-8, 8, (2 * nh, k)), jnp.int8)
    wp = pack_weight_planar(w)
    sw = jnp.asarray(rng.uniform(0.01, 0.05, (2 * nh,)), jnp.float32)
    xq = jnp.asarray(rng.integers(-8, 8, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (m, 1)), jnp.float32)
    right = jnp.asarray(random_orthogonal(128, rng), jnp.bfloat16)
    want = w4a4_matmul_i8_swiglu_right(xq, xs, wp, sw, right,
                                       block_n=nh, interpret=True)
    got = w4a4_matmul_i8_swiglu_right(xq, xs, wp, sw, right,
                                      block_n=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_engine_fused_flat_vs_composed():
    """Engine-level: the fused flat path (use_kernel=True, auto-interpret
    on CPU) matches the composed XLA path on a config whose transforms
    qualify (hidden 256 = 2x128 rn128, intermediate 512 = 4x128)."""
    import dataclasses

    from flatquant_tpu.models.config import LlamaConfig
    from flatquant_tpu.models.llama import init_params
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.serving.engine import init_cache, serving_prefill
    from flatquant_tpu.serving.quantized import build_serving_params

    cfg = LlamaConfig(name="mini-128", vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=128, seqlen=256)
    fq_cfg = dataclasses.replace(W4A4, tpu_decompose=True)
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    bp, bfq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, bp, bfq, dtype=jnp.bfloat16,
                              merge_projections=True)
    toks = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (1, 256)).astype(np.int32)

    outs = {}
    for use_kernel in (False, True):
        cache = init_cache(cfg, 1, 256, dtype=jnp.bfloat16)
        logits, _ = serving_prefill(
            cfg, fq_cfg, sp, jnp.asarray(toks), cache,
            use_kernel=use_kernel, max_len=256, compute_dtype=jnp.bfloat16)
        outs[use_kernel] = np.asarray(logits)
    # On CPU the kernel (interpret) and composed XLA paths accumulate the
    # same bf16 dots in different orders; an uncalibrated random W4A4
    # model amplifies the resulting +-1 code flips through quant cliffs
    # (measured max|d| 0.097 on 0.85 logit scale here). On TPU both paths
    # share MXU accumulation and the grouped predecessor measured
    # bit-identical engine logits (STATUS item 19); this CPU test pins
    # structure + rough numerics, the kernel tests above pin exact math.
    assert (outs[True].argmax(-1) == outs[False].argmax(-1)).all()
    np.testing.assert_allclose(outs[True], outs[False], atol=0.2)


def test_attn_prologue_matches_composed(rng):
    """Fused rope+k-transform+KV-quant-pack kernel vs the composed XLA
    chain (attn_prologue_ref). bf16 matmul accumulation order can flip
    int4 KV codes by one at .5 boundaries — same contract as the engine's
    own composed path."""
    from flatquant_tpu.kernels.attn_prologue import (
        attn_prologue,
        attn_prologue_ref,
    )
    from flatquant_tpu.models.llama import rope_tables
    from flatquant_tpu.models.config import LlamaConfig

    B, S, nh, nkv, hd = 2, 128, 3, 2, 128
    cfg = LlamaConfig(name="t", hidden_size=nh * hd, num_heads=nh,
                      num_kv_heads=nkv, head_dim=hd)
    qkv = jnp.asarray(rng.standard_normal((B, S, (nh + 2 * nkv) * hd)),
                      jnp.bfloat16)
    cos, sin = rope_tables(cfg, jnp.arange(S))
    k_t = jnp.asarray(random_orthogonal(hd, rng), jnp.bfloat16)
    k_t_inv = jnp.asarray(random_orthogonal(hd, rng), jnp.bfloat16)
    clip = (jnp.float32(0.92), jnp.float32(0.9))

    got = attn_prologue(qkv, cos, sin, k_t, k_t_inv, clip, None,
                        nh=nh, nkv=nkv, interpret=True)
    want = attn_prologue_ref(qkv, cos, sin, k_t, k_t_inv, clip, None,
                             nh=nh, nkv=nkv)
    # tolerances: the k_t/k_t_inv bf16 dots reassociate between paths, and
    # XLA CPU lowers the /15.0 scale divide to reciprocal-multiply in one
    # lowering but not the other (1 f32 ulp — the same artifact documented
    # for /7.0 in int4_matmul.py), which flips round() codes and the asym
    # zero-point by one. The V passthrough values themselves are exact.
    names = ["q_rot", "k_rot", "v", "k_codes", "k_params", "v_codes",
             "v_params"]
    for nm, a, b in zip(names, got, want):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if nm == "v":
            np.testing.assert_array_equal(a, b, err_msg=nm)
        elif nm.endswith("codes"):
            # compare unpacked nibbles so a +-1 code isn't hidden by the
            # byte packing (16x amplification in the high nibble)
            av = np.stack([a.astype(np.int32) & 0xF,
                           a.astype(np.int32) >> 4])
            bv = np.stack([b.astype(np.int32) & 0xF,
                           b.astype(np.int32) >> 4])
            d = np.abs(av - bv)
            # a 1-ulp scale flip moves the zero-point AND the rounding,
            # so codes can shift by 2 while dequant stays consistent
            assert d.max() <= 2 and (d > 0).mean() < 0.03, (
                nm, d.max(), (d > 0).mean())
        elif nm.endswith("params"):
            np.testing.assert_allclose(a[..., 0], b[..., 0], rtol=1e-5,
                                       err_msg=nm + " scale")
            assert np.abs(a[..., 1] - b[..., 1]).max() <= 1, nm + " zero"
        else:
            np.testing.assert_allclose(a, b, rtol=0.04, atol=0.04,
                                       err_msg=nm)


def test_engine_fused_prefill_int4cache():
    """Engine-level: the fused-prologue prefill (int4 cache) matches the
    composed path and the caches agree; a greedy decode continues
    correctly from the fused-path cache."""
    import dataclasses

    from flatquant_tpu.models.config import LlamaConfig
    from flatquant_tpu.models.llama import init_params
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4KV4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.serving.engine import (
        init_cache,
        serving_decode_step,
        serving_prefill,
    )
    from flatquant_tpu.serving.quantized import build_serving_params

    cfg = LlamaConfig(name="mini-128", vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=128, seqlen=256)
    fq_cfg = dataclasses.replace(W4A4KV4, tpu_decompose=True)
    params = init_params(cfg, seed=2)
    fq = init_model_fq(cfg, fq_cfg, seed=2)
    bp, bfq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, bp, bfq, dtype=jnp.bfloat16,
                              merge_projections=True)
    toks = np.random.default_rng(3).integers(
        0, cfg.vocab_size, (1, 256)).astype(np.int32)

    outs, caches = {}, {}
    for use_kernel in (False, True):
        cache = init_cache(cfg, 1, 384, mode="int4")
        logits, cache = serving_prefill(
            cfg, fq_cfg, sp, jnp.asarray(toks), cache,
            use_kernel=use_kernel, max_len=384, compute_dtype=jnp.bfloat16)
        outs[use_kernel] = np.asarray(logits)
        caches[use_kernel] = cache
    assert (outs[True].argmax(-1) == outs[False].argmax(-1)).all()
    np.testing.assert_allclose(outs[True], outs[False], atol=0.25)
    # packed caches: same layout, near-identical codes (+-1 rounding)
    for key in ("kp", "vp"):
        a = np.asarray(caches[True][key], np.int32)
        b = np.asarray(caches[False][key], np.int32)
        d = np.abs(np.stack([a & 0xF, a >> 4]) - np.stack([b & 0xF, b >> 4]))
        assert d.max() <= 1 and (d > 0).mean() < 0.01, (key, d.max())
    # decode continues from the fused cache (kernel decode path)
    tok = jnp.argmax(outs[True], -1)[:, None].astype(jnp.int32)
    logits_d, _ = serving_decode_step(
        cfg, fq_cfg, sp, tok, caches[True], jnp.int32(256),
        use_kernel=True, max_len=384, compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(logits_d)).all()
