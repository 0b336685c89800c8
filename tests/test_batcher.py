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


def test_chunk_step_equals_decode_step(served):
    """A phase="chunk" call with S=1 must reproduce phase="decode" exactly
    in both cache modes — chunked prefill IS decode semantics generalized
    to S query rows."""
    import jax

    from flatquant_tpu.serving.engine import _forward, init_cache

    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, (1, 9)).astype(np.int32)
    for cache_mode in ("bf16", "int4"):
        cache = init_cache(cfg, 1, 24, dtype=jnp.float32, mode=cache_mode)
        _, cache = _forward(cfg, fq_cfg, sp, jnp.asarray(prompt), cache, 0,
                            "prefill", False, 24, jnp.float32)
        tok = jnp.asarray([[3]], jnp.int32)
        ld, cd = _forward(cfg, fq_cfg, sp, tok, cache, jnp.int32(9), "decode",
                          False, 24, jnp.float32)
        lc, cc = _forward(cfg, fq_cfg, sp, tok, cache, jnp.int32(9), "chunk",
                          False, 24, jnp.float32)
        # cache writes share one code path -> exact; logits go through
        # different-but-equivalent attention programs (packed-cache ref
        # kernel vs dense unpack) -> ulp-level reduction-order noise
        np.testing.assert_allclose(np.asarray(ld), np.asarray(lc),
                                   rtol=1e-4, atol=1e-5)
        assert int(jnp.argmax(ld)) == int(jnp.argmax(lc))
        for k in cd:
            np.testing.assert_array_equal(np.asarray(cd[k]), np.asarray(cc[k]))


def test_batcher_chunked_prefill_outputs_kv16(served):
    """With an unquantized KV cache the chunk path attends the same values
    one-shot prefill does, so chunked greedy tokens must match the
    unchunked batcher's."""
    from flatquant_tpu.quantize.spec import W4A4
    from flatquant_tpu.models.llama import init_params as _ip
    from flatquant_tpu.quantize.bake import bake_model as _bm
    from flatquant_tpu.quantize.state import init_model_fq as _ifq

    cfg, _, _ = served
    params = _ip(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq = _ifq(cfg, W4A4, seed=0)
    baked, baked_fq = _bm(cfg, W4A4, params, fq)
    sp16 = build_serving_params(cfg, W4A4, baked, baked_fq, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (11, 4, 7)]

    plain = ContinuousBatcher(cfg, W4A4, sp16, batch_slots=2, max_len=32)
    for p in prompts:
        plain.submit(p, 4)
    want = plain.run(max_steps=300)

    chunked = ContinuousBatcher(cfg, W4A4, sp16, batch_slots=2, max_len=32,
                                prefill_chunk=4)
    for p in prompts:
        chunked.submit(p, 4)
    got = chunked.run(max_steps=300)
    assert got == want


@pytest.mark.parametrize("cache_mode", ["bf16", "int4"])
def test_batcher_chunked_prefill_kv4(served, cache_mode):
    """KV4 chunked prefill: history attends *quantized* (decode
    semantics; the one-shot path keeps the reference's unquantized-prompt
    trick, so tokens may legitimately differ on an uncalibrated random
    model) — assert completion, determinism, and output lengths."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (11, 4, 7)]

    def run_once():
        b = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                              cache_mode=cache_mode, prefill_chunk=4)
        rids = [b.submit(p, 4) for p in prompts]
        return rids, b.run(max_steps=300)

    rids, got = run_once()
    assert set(got) == set(rids)
    assert all(len(v) == 4 for v in got.values())
    _, again = run_once()
    assert again == got


def test_chunked_prefill_interleaves_decode(served):
    """While a long prompt prefills chunk-by-chunk, an already-active slot
    must emit one token per scheduler step (the latency property chunking
    exists for)."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(9)
    short = rng.integers(0, cfg.vocab_size, (4,)).astype(np.int32)
    long = rng.integers(0, cfg.vocab_size, (16,)).astype(np.int32)

    b = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=40,
                          prefill_chunk=4)
    ra = b.submit(short, 10)
    b.step()  # seats the short request (1 chunk), decodes once
    req_a = next(r for r in b.slot_req if r is not None and r.rid == ra)
    n0 = len(req_a.out_tokens)
    b.submit(long, 4)
    for i in range(3):  # long prompt needs 4 chunks; A must keep streaming
        b.step()
        assert b.pending is not None, "long prefill should still be in flight"
        assert len(req_a.out_tokens) == n0 + i + 1, "decode starved by prefill"
