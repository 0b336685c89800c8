"""Serving-path tests: real-quant vs fake-quant parity, cache decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
from flatquant_tpu.quantize.spec import FQConfig, W4A4, W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.engine import (
    generate,
    init_cache,
    serving_decode_step,
    serving_prefill,
)
from flatquant_tpu.serving.quantized import build_serving_params


@pytest.fixture(scope="module", params=["tiny-llama"])
def served(request):
    cfg = get_config(request.param)
    params = init_params(cfg, seed=0)
    # sharpen logits so parity checks aren't dominated by near-ties
    params["lm_head"] = params["lm_head"] * 6.0
    fq_cfg = W4A4  # kv16: fake and real paths are numerically identical
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked_params, baked_fq, dtype=jnp.float32)
    eval_params = rtn_quantize_params(fq_cfg, baked_params)
    return cfg, fq_cfg, sp, eval_params, baked_fq


def test_prefill_matches_fake_eval(served):
    """Real-quant serving == fake-quant eval, exactly, at fp32 compute
    (the fake-vs-real cross-validation of SURVEY 4.2, by construction)."""
    cfg, fq_cfg, sp, eval_params, baked_fq = served
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 24)).astype(np.int32)
    cache = init_cache(cfg, 2, 32, dtype=jnp.float32)
    logits_real, cache = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(toks), cache, use_kernel=False, max_len=32,
        compute_dtype=jnp.float32,
    )
    logits_fake = llama_forward(
        cfg, eval_params, jnp.asarray(toks), fq=baked_fq, fq_cfg=fq_cfg,
        mode="eval", compute_dtype=jnp.float32,
    )[:, -1]
    np.testing.assert_allclose(
        np.asarray(logits_real), np.asarray(logits_fake), atol=1e-4, rtol=1e-4
    )
    assert (jnp.argmax(logits_real, -1) == jnp.argmax(logits_fake, -1)).all()


def test_decode_matches_prefill(served):
    """Decoding token-by-token must reproduce the prefill logits of the
    extended sequence (cache correctness)."""
    cfg, fq_cfg, sp, _, _ = served
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    nxt = rng.integers(0, cfg.vocab_size, (1, 4)).astype(np.int32)

    # path A: prefill over the full 12 tokens
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    la, _ = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(np.concatenate([toks, nxt], 1)), cache,
        use_kernel=False, max_len=16, compute_dtype=jnp.float32,
    )

    # path B: prefill 8, then 4 decode steps
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    lb, cache = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(toks), cache, use_kernel=False, max_len=16,
        compute_dtype=jnp.float32,
    )
    pos = 8
    for i in range(4):
        lb, cache = serving_decode_step(
            cfg, fq_cfg, sp, jnp.asarray(nxt[:, i : i + 1]), cache, jnp.int32(pos),
            use_kernel=False, max_len=16, compute_dtype=jnp.float32,
        )
        pos += 1
    # kv16: prefill attends unquantized == cache contents -> near-identical
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-2, atol=2e-2)
    assert int(jnp.argmax(la)) == int(jnp.argmax(lb))


def test_generate_runs_kv4():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked_params, baked_fq)
    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)
    out = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=5, max_len=16, use_kernel=False)
    assert out.shape == (2, 5)
    assert out.min() >= 0 and out.max() < cfg.vocab_size


def test_qwen_serving_bias():
    cfg = get_config("tiny-qwen")
    params = init_params(cfg, seed=0)
    fq_cfg = W4A4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked_params, baked_fq)
    assert "bq" in sp["layers"]  # qwen attn bias must survive conversion
    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 4)).astype(np.int32)
    out = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=3, max_len=8, use_kernel=False)
    assert out.shape == (1, 3)


def test_int4_cache_mode_matches_bf16_cache():
    """Packed int4 cache mode == dequantized-store mode (KV4 config)."""
    from flatquant_tpu.models.llama import init_params as _init
    from flatquant_tpu.quantize.bake import bake_model as _bake
    from flatquant_tpu.quantize.state import init_model_fq as _initfq

    cfg = get_config("tiny-llama")
    fq_cfg = W4A4KV4
    params = _init(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq = _initfq(cfg, fq_cfg, seed=0)
    baked, bfq = _bake(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, bfq, dtype=jnp.float32)
    toks = np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    c1 = init_cache(cfg, 2, 16, dtype=jnp.float32)
    l1, c1 = serving_prefill(cfg, fq_cfg, sp, jnp.asarray(toks), c1,
                             use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    c2 = init_cache(cfg, 2, 16, mode="int4")
    l2, c2 = serving_prefill(cfg, fq_cfg, sp, jnp.asarray(toks), c2,
                             use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    nxt = jnp.argmax(l2, -1)[:, None].astype(jnp.int32)
    for i in range(3):
        l1, c1 = serving_decode_step(cfg, fq_cfg, sp, nxt, c1, jnp.int32(8 + i),
                                     use_kernel=False, max_len=16,
                                     compute_dtype=jnp.float32)
        l2, c2 = serving_decode_step(cfg, fq_cfg, sp, nxt, c2, jnp.int32(8 + i),
                                     use_kernel=False, max_len=16,
                                     compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
        nxt = jnp.argmax(l2, -1)[:, None].astype(jnp.int32)


def test_merged_projections_match_unmerged(served):
    cfg, fq_cfg, sp, _, _ = served
    from flatquant_tpu.models.llama import init_params
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.state import init_model_fq

    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked, bfq = bake_model(cfg, fq_cfg, params, fq)
    sp_m = build_serving_params(cfg, fq_cfg, baked, bfq, dtype=jnp.float32,
                                merge_projections=True)
    toks = np.random.default_rng(4).integers(0, cfg.vocab_size, (1, 10)).astype(np.int32)
    lm, _ = serving_prefill(cfg, fq_cfg, sp_m, jnp.asarray(toks),
                            init_cache(cfg, 1, 16, dtype=jnp.float32),
                            use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    lu, _ = serving_prefill(cfg, fq_cfg, sp, jnp.asarray(toks),
                            init_cache(cfg, 1, 16, dtype=jnp.float32),
                            use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lu), atol=1e-5)


def test_rope_scaled_config_serving():
    """Llama-3.1-style rope scaling flows through the serving engine."""
    import dataclasses as _dc

    from flatquant_tpu.models.config import RopeScaling
    from flatquant_tpu.models.llama import init_params as _init
    from flatquant_tpu.quantize.bake import bake_model as _bake
    from flatquant_tpu.quantize.state import init_model_fq as _initfq
    from flatquant_tpu.serving.engine import generate

    base = get_config("tiny-llama")
    cfg = _dc.replace(base, name="tiny-31",
                      rope_scaling=RopeScaling(factor=4.0,
                                               original_max_position_embeddings=8))
    params = _init(cfg, seed=0)
    fq = _initfq(cfg, W4A4, seed=0)
    baked, bfq = _bake(cfg, W4A4, params, fq)
    sp = build_serving_params(cfg, W4A4, baked, bfq, dtype=jnp.float32)
    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)
    out = generate(cfg, W4A4, sp, prompt, max_new_tokens=3, max_len=24,
                   use_kernel=False)
    assert out.shape == (1, 3)
    # scaled rope actually differs from unscaled at the same positions
    from flatquant_tpu.models.llama import rope_tables

    c1, _ = rope_tables(cfg, jnp.arange(16))
    c0, _ = rope_tables(base, jnp.arange(16))
    assert float(jnp.max(jnp.abs(c1 - c0))) > 1e-4


def test_unrolled_layers_match_scan(served):
    from flatquant_tpu.serving.engine import unstack_serving_layers

    cfg, fq_cfg, sp, _, _ = served
    spu = unstack_serving_layers(sp)
    toks = np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    l1, c1 = serving_prefill(cfg, fq_cfg, sp, jnp.asarray(toks),
                             init_cache(cfg, 1, 16, dtype=jnp.float32),
                             use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    l2, c2 = serving_prefill(cfg, fq_cfg, spu, jnp.asarray(toks),
                             init_cache(cfg, 1, 16, dtype=jnp.float32),
                             use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # decode step too
    nxt = jnp.argmax(l2, -1)[:, None].astype(jnp.int32)
    d1, _ = serving_decode_step(cfg, fq_cfg, sp, nxt, c1, jnp.int32(8),
                                use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    d2, _ = serving_decode_step(cfg, fq_cfg, spu, nxt, c2, jnp.int32(8),
                                use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_tuple_cache_matches_stacked(served):
    """unstack_cache tuples round-trip through the unrolled path with the
    same numbers as the stacked cache (both cache modes, prefill+decode)."""
    from flatquant_tpu.serving.engine import unstack_cache, unstack_serving_layers

    cfg, fq_cfg, sp, _, _ = served
    spu = unstack_serving_layers(sp)
    toks = np.random.default_rng(7).integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    l1, c1 = serving_prefill(cfg, fq_cfg, spu, jnp.asarray(toks),
                             init_cache(cfg, 1, 16, dtype=jnp.float32),
                             use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    l2, c2 = serving_prefill(cfg, fq_cfg, spu, jnp.asarray(toks),
                             unstack_cache(init_cache(cfg, 1, 16, dtype=jnp.float32)),
                             use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    assert isinstance(c2["k"], tuple) and len(c2["k"]) == cfg.num_layers
    # distinct pytree structures compile separately; XLA fusion choices can
    # differ by 1 ulp at fp32 — allclose, not array_equal
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    nxt = jnp.argmax(l2, -1)[:, None].astype(jnp.int32)
    d1, c1b = serving_decode_step(cfg, fq_cfg, spu, nxt, c1, jnp.int32(8),
                                  use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    d2, c2b = serving_decode_step(cfg, fq_cfg, spu, nxt, c2, jnp.int32(8),
                                  use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    assert isinstance(c2b["k"], tuple)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
    for i in range(cfg.num_layers):
        np.testing.assert_allclose(np.asarray(c1b["k"][i]),
                                   np.asarray(c2b["k"][i]), atol=1e-6)


def test_perm_transforms_match_standard(served):
    """perm_transforms=True (one-copy transposed-output Kron + permuted
    packed weight input channels) must reproduce the standard layout's
    prefill and decode results — it is a pure layout change."""
    cfg, fq_cfg, sp, eval_params, baked_fq = served
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked_params, bfq = bake_model(cfg, fq_cfg, params, fq)
    sp_perm = build_serving_params(cfg, fq_cfg, baked_params, bfq,
                                   dtype=jnp.float32, perm_transforms=True)
    assert any(k.endswith("_tp") for k in sp_perm["layers"].keys())
    toks = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)

    def run(spx):
        cache = init_cache(cfg, 2, 24, dtype=jnp.float32)
        logits, cache = serving_prefill(
            cfg, fq_cfg, spx, jnp.asarray(toks), cache, use_kernel=False,
            max_len=24, compute_dtype=jnp.float32)
        tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        logits2, _ = serving_decode_step(
            cfg, fq_cfg, spx, tok, cache, jnp.int32(16), use_kernel=False,
            max_len=24, compute_dtype=jnp.float32)
        return np.asarray(logits), np.asarray(logits2)

    a1, a2 = run(sp)
    b1, b2 = run(sp_perm)
    np.testing.assert_allclose(a1, b1, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(a2, b2, atol=2e-4, rtol=1e-4)


def test_perm_transforms_merged_and_int4cache():
    """perm layout under merged projections + the packed int4 cache."""
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=2)
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=2)
    baked_params, bfq = bake_model(cfg, fq_cfg, params, fq)
    sps = {
        perm: build_serving_params(cfg, fq_cfg, baked_params, bfq,
                                   dtype=jnp.float32,
                                   merge_projections=True,
                                   perm_transforms=perm)
        for perm in (False, True)
    }
    prompt = np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)
    outs = {
        perm: generate(cfg, fq_cfg, spx, prompt, max_new_tokens=6, max_len=32,
                       use_kernel=False, cache_mode="int4",
                       compute_dtype=jnp.float32)
        for perm, spx in sps.items()
    }
    np.testing.assert_array_equal(outs[False], outs[True])


def test_weight_only_w4a16_serving_matches_fake_eval():
    """Weight-only serving (a16: raw activations through the int4-weight
    kernel with unit act scale) must equal the fake-quant eval forward at
    fp32 — the production GPTQ-style deployment mode the reference's
    int4xint4 CUTLASS path cannot express."""
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq_cfg = FQConfig(w_bits=4, a_bits=16, k_bits=16, v_bits=16,
                      lac=False, epochs=0)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq, dtype=jnp.float32)
    eval_params = rtn_quantize_params(fq_cfg, baked)

    toks = np.random.default_rng(2).integers(
        0, cfg.vocab_size, (2, 12)).astype(np.int32)
    cache = init_cache(cfg, 2, 20, dtype=jnp.float32)
    logits_real, cache = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(toks), cache, use_kernel=False,
        max_len=20, compute_dtype=jnp.float32)
    from flatquant_tpu.models.llama import llama_forward

    logits_fake = llama_forward(
        cfg, eval_params, jnp.asarray(toks), fq=baked_fq, fq_cfg=fq_cfg,
        mode="eval", compute_dtype=jnp.float32)[:, -1]
    np.testing.assert_allclose(np.asarray(logits_real),
                               np.asarray(logits_fake), atol=1e-4, rtol=1e-4)
    # decode continues through the same weight-only path
    tok = jnp.argmax(logits_real, -1)[:, None].astype(jnp.int32)
    logits2, _ = serving_decode_step(cfg, fq_cfg, sp, tok, cache,
                                     jnp.int32(12), use_kernel=False,
                                     max_len=20, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits2)).all()


@pytest.mark.parametrize("w_bits,a_bits", [(8, 8), (4, 8), (8, 16)])
def test_int8_serving_modes_match_fake_eval(w_bits, a_bits):
    """W8A8 / W4A8 / W8A16 real-quant serving == fake-quant eval at fp32.

    W8 weights serve as plain int8 codes through XLA's int8 dot (2x MXU
    rate path); A8 activations reuse the same scale rule with q_max=127.
    The reference deploys int4xint4 only — these are the SmoothQuant-class
    production modes on top of the same transform stack."""
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=1)
    params["lm_head"] = params["lm_head"] * 6.0
    fq_cfg = FQConfig(w_bits=w_bits, a_bits=a_bits, k_bits=16, v_bits=16,
                      lac=(a_bits < 16), epochs=0)
    fq = init_model_fq(cfg, fq_cfg, seed=1)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq, dtype=jnp.float32)
    eval_params = rtn_quantize_params(fq_cfg, baked)

    toks = np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 10)).astype(np.int32)
    cache = init_cache(cfg, 2, 16, dtype=jnp.float32)
    logits_real, _ = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(toks), cache, use_kernel=False,
        max_len=16, compute_dtype=jnp.float32)
    from flatquant_tpu.models.llama import llama_forward

    logits_fake = llama_forward(
        cfg, eval_params, jnp.asarray(toks), fq=baked_fq, fq_cfg=fq_cfg,
        mode="eval", compute_dtype=jnp.float32)[:, -1]
    np.testing.assert_allclose(np.asarray(logits_real),
                               np.asarray(logits_fake), atol=1e-4, rtol=1e-4)
    assert (jnp.argmax(logits_real, -1) == jnp.argmax(logits_fake, -1)).all()


def test_kv8_cache_grid():
    """KV8 (asym) through the bf16 cache must store values on the 8-bit
    grid: re-quantizing the stored rows at q_max=255 is a no-op, while the
    int4 grid changes them. (Before the q_max fix the serving cache used
    the int4 grid for ANY kv-bits < 16; note serving-vs-fake logits can't
    be compared directly here — the prefill-unquantized trick shifts
    deeper-layer hiddens by design, reference modeling_llama.py:125-137.)"""
    from flatquant_tpu.serving.quantized import dequantize_kv, quantize_kv_asym

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=3)
    fq_cfg = FQConfig(w_bits=4, a_bits=4, k_bits=8, v_bits=8,
                      k_asym=True, v_asym=True, lac=False, epochs=0)
    fq = init_model_fq(cfg, fq_cfg, seed=3)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq, dtype=jnp.float32)

    toks = np.random.default_rng(4).integers(
        0, cfg.vocab_size, (2, 10)).astype(np.int32)
    cache = init_cache(cfg, 2, 16, dtype=jnp.float32)
    logits, cache = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(toks), cache, use_kernel=False,
        max_len=16, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
    rows = cache["k"][0, :, :10]  # layer 0, written positions

    def requant(x, qm):
        q, sc, z = quantize_kv_asym(x, None, q_max=qm)
        return dequantize_kv(q, sc, z, jnp.float32)

    np.testing.assert_allclose(np.asarray(requant(rows, 255)),
                               np.asarray(rows), atol=1e-6)
    assert float(jnp.max(jnp.abs(requant(rows, 15) - rows))) > 1e-4

    # decode continues over the 8-bit cache
    tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    logits2, _ = serving_decode_step(cfg, fq_cfg, sp, tok, cache,
                                     jnp.int32(10), use_kernel=False,
                                     max_len=16, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits2)).all()
