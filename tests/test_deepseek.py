"""DeepSeek-V3 model tests: MLA/MoE forward, gate, yarn, calibration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.models.deepseek import (
    TINY_DEEPSEEK,
    apply_ds_rope,
    bake_ds_fq,
    calibrate_deepseek,
    deepseek_forward,
    ds_gate,
    ds_rope_tables,
    fp8_block_dequant,
    init_ds_fq,
    init_ds_params,
)
from flatquant_tpu.quantize.spec import W4A4, FQConfig


@pytest.fixture(scope="module")
def tiny_ds():
    cfg = TINY_DEEPSEEK
    params = init_ds_params(cfg, seed=0)
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    return cfg, params, jnp.asarray(toks)


def test_fp_forward(tiny_ds):
    cfg, params, toks = tiny_ds
    logits = deepseek_forward(cfg, params, toks, compute_dtype=jnp.float32)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_yarn_rope_changes_low_freqs():
    cfg = TINY_DEEPSEEK
    cos_l, _ = ds_rope_tables(cfg, cfg.max_seq_len)  # > original -> yarn on
    cos_s, _ = ds_rope_tables(cfg, cfg.original_seq_len)  # yarn off
    n = cfg.original_seq_len
    assert float(jnp.max(jnp.abs(cos_l[:n] - cos_s))) > 1e-4


def test_rope_norm_preserved(rng):
    cfg = TINY_DEEPSEEK
    cos, sin = ds_rope_tables(cfg, 16)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, cfg.qk_rope_head_dim)), jnp.float32)
    y = apply_ds_rope(x, cos, sin)
    np.testing.assert_allclose(
        jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-5
    )


def test_gate_group_limiting(rng):
    cfg = TINY_DEEPSEEK  # 8 experts, 4 groups, 2 limited groups, top-2
    lp = {
        "gate_w": jnp.asarray(rng.standard_normal((cfg.n_routed_experts, cfg.dim)), jnp.float32),
        "gate_b": jnp.asarray(rng.standard_normal(cfg.n_routed_experts), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((5, cfg.dim)), jnp.float32)
    weights, indices = ds_gate(cfg, lp, x)
    assert weights.shape == (5, cfg.n_activated_experts)
    assert indices.shape == (5, cfg.n_activated_experts)
    # sigmoid renorm * route_scale: weights sum to route_scale
    np.testing.assert_allclose(weights.sum(-1), cfg.route_scale, rtol=1e-5)
    # group limiting: selected experts span at most n_limited_groups groups
    eg = cfg.n_routed_experts // cfg.n_expert_groups
    groups = np.asarray(indices) // eg
    for row in groups:
        assert len(set(row.tolist())) <= cfg.n_limited_groups


def test_quant_forward_and_bake(tiny_ds):
    cfg, params, toks = tiny_ds
    fq_cfg = W4A4
    dense_fq, moe_fq = init_ds_fq(cfg, fq_cfg, seed=0)
    logits_q = deepseek_forward(
        cfg, params, toks, fq=(dense_fq, moe_fq), fq_cfg=fq_cfg, mode="calib",
        compute_dtype=jnp.float32,
    )
    assert bool(jnp.isfinite(logits_q).all())
    # eval = calib forward with baked transforms: must match exactly
    baked = bake_ds_fq(dense_fq, moe_fq)
    logits_b = deepseek_forward(
        cfg, params, toks, fq=baked, fq_cfg=fq_cfg, mode="calib",
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_q),
                               rtol=2e-3, atol=2e-3)


def test_transform_invariance_ds(tiny_ds):
    cfg, params, toks = tiny_ds
    fq_cfg = dataclasses.replace(W4A4, quant_enabled=False, lwc=False, lac=False)
    fq = init_ds_fq(cfg, fq_cfg, seed=1)
    logits_fp = deepseek_forward(cfg, params, toks, compute_dtype=jnp.float32)
    logits_t = deepseek_forward(cfg, params, toks, fq=fq, fq_cfg=fq_cfg,
                                mode="calib", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(logits_fp),
                               rtol=5e-3, atol=5e-3)


def test_fp8_block_dequant():
    w = jnp.ones((100, 70), jnp.float32)
    scales = jnp.asarray([[2.0, 3.0], [4.0, 5.0]], jnp.float32)  # 128-blocks
    out = fp8_block_dequant(w, scales, block=64)
    assert out.shape == (100, 70)
    assert float(out[0, 0]) == 2.0 and float(out[0, 69]) == 3.0
    assert float(out[99, 0]) == 4.0 and float(out[99, 69]) == 5.0


def test_calibrate_deepseek_runs(tiny_ds):
    cfg, params, _ = tiny_ds
    fq_cfg = dataclasses.replace(W4A4, epochs=1, cali_bsz=2, nsamples=4)
    dense_fq, moe_fq = init_ds_fq(cfg, fq_cfg, seed=0)
    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)
    logs = []
    d2, m2 = calibrate_deepseek(
        cfg, fq_cfg, params, dense_fq, moe_fq, toks,
        compute_dtype=jnp.float32, log=logs.append,
    )
    assert any("dense layer 0" in l for l in logs)
    assert any("moe layer" in l for l in logs)
    # transforms moved
    delta = float(jnp.abs(m2.attn.qkv_trans.left.u - moe_fq.attn.qkv_trans.left.u).max())
    assert delta > 1e-7


def test_ds_generate_cache_consistency(tiny_ds):
    """Cached MLA decode must reproduce full-sequence forward argmaxes."""
    from flatquant_tpu.models.deepseek import bake_ds_fq, deepseek_generate

    cfg, params, _ = tiny_ds
    params = dict(params)
    params["head"] = params["head"] * 6.0
    fq = bake_ds_fq(*__import__("flatquant_tpu.models.deepseek", fromlist=["x"]).init_ds_fq(cfg, W4A4, seed=0))
    prompt = np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 5)).astype(np.int32)
    out = deepseek_generate(cfg, params, fq, W4A4, prompt, max_new_tokens=3,
                            max_len=32, compute_dtype=jnp.float32)

    # reference: grow the sequence with full-seq forwards
    seq = prompt.copy()
    for i in range(3):
        logits = deepseek_forward(cfg, params, jnp.asarray(seq), fq=fq,
                                  fq_cfg=W4A4, mode="calib",
                                  compute_dtype=jnp.float32)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))[:, None].astype(np.int32)
        assert int(nxt[0, 0]) == int(out[0, i]), f"step {i}"
        seq = np.concatenate([seq, nxt], axis=1)


def test_ds_real_quant_serving_parity(tiny_ds):
    """Packed-int4 DS serving == fake-quant forward exactly at fp32."""
    from flatquant_tpu.models.deepseek import (
        build_ds_serving_params,
        deepseek_generate,
    )

    cfg, params, toks = tiny_ds
    dfq, mfq = init_ds_fq(cfg, W4A4, seed=0)
    baked = bake_ds_fq(dfq, mfq)
    lc = deepseek_forward(cfg, params, toks, fq=baked, fq_cfg=W4A4,
                          mode="calib", compute_dtype=jnp.float32)
    sp, baked2 = build_ds_serving_params(cfg, W4A4, params, dfq, mfq,
                                         dtype=jnp.float32)
    ls = deepseek_forward(cfg, sp, toks, fq=baked2, fq_cfg=W4A4,
                          mode="serve", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lc), atol=1e-5)

    # generation through the packed path
    prompt = np.asarray(toks[:1, :6])
    out = deepseek_generate(cfg, sp, baked2, W4A4, prompt, max_new_tokens=3,
                            max_len=32, mode="serve", compute_dtype=jnp.float32)
    assert out.shape == (1, 3)


def test_gather_moe_matches_dense(tiny_ds):
    """Capacity-gather expert dispatch == dense-masked path (generous C)."""
    import dataclasses as _dc

    cfg, params, toks = tiny_ds
    cfg_g = _dc.replace(cfg, moe_impl="gather", moe_capacity_factor=8.0)
    fq = init_ds_fq(cfg, W4A4, seed=0)
    ld = deepseek_forward(cfg, params, toks, fq=fq, fq_cfg=W4A4,
                          mode="calib", compute_dtype=jnp.float32)
    lg = deepseek_forward(cfg_g, params, toks, fq=fq, fq_cfg=W4A4,
                          mode="calib", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ld), atol=1e-5)


def test_gather_moe_tight_capacity_drops_gracefully(tiny_ds):
    import dataclasses as _dc

    cfg, params, toks = tiny_ds
    cfg_g = _dc.replace(cfg, moe_impl="gather", moe_capacity_factor=0.5)
    lg = deepseek_forward(cfg_g, params, toks, compute_dtype=jnp.float32)
    assert bool(jnp.isfinite(lg).all())


def test_moe_dispatch_ranks():
    from flatquant_tpu.models.deepseek import moe_dispatch

    fe = jnp.asarray([2, 2, 1, 2, 0, 1], jnp.int32)
    rank, keep = moe_dispatch(fe, capacity=2, n_experts=4)
    assert rank.tolist() == [0, 1, 0, 2, 0, 1]
    assert keep.tolist() == [True, True, True, False, True, True]


def test_ds_perm_transforms_match_standard(tiny_ds):
    """perm_transforms serving (one-copy transposed-output Kron on both
    the activation side and the weight folds, via the BakedDecompose.perm
    marker) must reproduce the standard serve forward."""
    from flatquant_tpu.models.deepseek import build_ds_serving_params

    cfg, params, toks = tiny_ds
    dfq, mfq = init_ds_fq(cfg, W4A4, seed=0)
    sp_a, fq_a = build_ds_serving_params(cfg, W4A4, params, dfq, mfq,
                                         dtype=jnp.float32)
    sp_b, fq_b = build_ds_serving_params(cfg, W4A4, params, dfq, mfq,
                                         dtype=jnp.float32,
                                         perm_transforms=True)
    assert fq_b[0].attn.qkv_trans.perm and not fq_a[0].attn.qkv_trans.perm
    la = deepseek_forward(cfg, sp_a, toks, fq=fq_a, fq_cfg=W4A4,
                          mode="serve", compute_dtype=jnp.float32)
    lb = deepseek_forward(cfg, sp_b, toks, fq=fq_b, fq_cfg=W4A4,
                          mode="serve", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-5)
    assert (jnp.argmax(la, -1) == jnp.argmax(lb, -1)).all()
