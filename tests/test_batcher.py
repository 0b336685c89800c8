"""Continuous batching: slot isolation and parity with single-request path."""

import numpy as np
import pytest

import jax.numpy as jnp

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.batcher import ContinuousBatcher
from flatquant_tpu.serving.engine import generate
from flatquant_tpu.serving.quantized import build_serving_params


@pytest.fixture(scope="module")
def served():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0  # sharpen to avoid ties
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq, dtype=jnp.float32)
    return cfg, fq_cfg, sp


@pytest.mark.parametrize("cache_mode", ["bf16", "int4"])
def test_batcher_matches_single_request(served, cache_mode):
    """3 requests through 2 slots must reproduce per-request greedy output
    — in both cache modes (the int4 packed cache under continuous batching
    is the flagship serving configuration)."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 7, 4)]
    n_new = [6, 4, 5]

    # reference: each request alone through generate()
    expected = {}
    for i, (p, n) in enumerate(zip(prompts, n_new)):
        out = generate(cfg, fq_cfg, sp, p[None, :], max_new_tokens=n,
                       max_len=32, use_kernel=False, cache_mode=cache_mode)
        expected[i] = out[0].tolist()

    batcher = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                                cache_mode=cache_mode)
    rids = [batcher.submit(p, n) for p, n in zip(prompts, n_new)]
    results = batcher.run(max_steps=200)

    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        assert results[rid] == expected[i], (
            f"req {i}: batched {results[rid]} != single {expected[i]}"
        )


@pytest.mark.parametrize("cache_mode", ["bf16", "int4"])
def test_batcher_prefill_bucketing(served, cache_mode):
    """Length-bucketed prefill (one compile per bucket) produces the same
    greedy tokens as exact-length prefill."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (3, 5, 9)]

    plain = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                              cache_mode=cache_mode)
    for p in prompts:
        plain.submit(p, 4)
    want = plain.run(max_steps=200)

    bucketed = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                                 cache_mode=cache_mode, prefill_bucket=8)
    for p in prompts:
        bucketed.submit(p, 4)
    got = bucketed.run(max_steps=200)
    assert got == want
    # 3 and 5 share the size-8 bucket: only 2 distinct compiled shapes
    sizes = {(-(-len(p) // 8) * 8) for p in prompts}
    assert len(sizes) == 2


def test_batcher_eos_early_exit(served):
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(1)
    p = rng.integers(0, cfg.vocab_size, (4,)).astype(np.int32)
    # find what greedy emits first, use it as eos -> must stop after 1 token
    probe = generate(cfg, fq_cfg, sp, p[None, :], max_new_tokens=1,
                     max_len=16, use_kernel=False)
    eos = int(probe[0, 0])
    batcher = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=1, max_len=16)
    rid = batcher.submit(p, max_new_tokens=8, eos_id=eos)
    results = batcher.run(max_steps=50)
    assert results[rid] == [eos]


def test_batcher_slot_reuse(served):
    """More requests than slots: later requests reuse freed slots cleanly."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, (3 + i,)).astype(np.int32)
               for i in range(5)]
    batcher = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=24)
    rids = [batcher.submit(p, 3) for p in prompts]
    results = batcher.run(max_steps=300)
    assert len(results) == 5
    for rid in rids:
        assert len(results[rid]) == 3
