"""DeepSeek packed-int4 serving under the continuous batcher.

The reference has no batched DS serving (main_dpskv3.py:46-82 is a fixed-
batch generate loop); here the same scheduler that serves Llama runs the
packed DS model through the engine hooks (ds_batch_forward +
ds_init_batch_cache), with per-slot positions over the absorbed-MLA
latent caches."""

import numpy as np
import pytest

import jax.numpy as jnp

from flatquant_tpu.models.deepseek import (
    TINY_DEEPSEEK,
    build_ds_serving_params,
    deepseek_generate,
    ds_batch_forward,
    ds_init_batch_cache,
    init_ds_fq,
    init_ds_params,
)
from flatquant_tpu.quantize.spec import W4A4
from flatquant_tpu.serving.batcher import ContinuousBatcher


@pytest.fixture(scope="module")
def ds_served():
    cfg = TINY_DEEPSEEK
    params = init_ds_params(cfg, seed=0)
    params = dict(params)
    params["head"] = params["head"] * 6.0  # sharpen argmax against ties
    dfq, mfq = init_ds_fq(cfg, W4A4, seed=0)
    sp, baked = build_ds_serving_params(cfg, W4A4, params, dfq, mfq,
                                        dtype=jnp.float32)
    return cfg, {"params": sp, "fq": baked}


def test_ds_batcher_matches_single_request(ds_served):
    """Mixed-length DS requests through 2 slots reproduce per-request
    greedy generation through the packed path."""
    cfg, spfq = ds_served
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 7, 4)]
    n_new = [5, 3, 4]

    expected = {}
    for i, (p, n) in enumerate(zip(prompts, n_new)):
        out = deepseek_generate(cfg, spfq["params"], spfq["fq"], W4A4,
                                p[None, :], max_new_tokens=n, max_len=32,
                                mode="serve", compute_dtype=jnp.float32)
        expected[i] = out[0].tolist()

    batcher = ContinuousBatcher(
        cfg, W4A4, spfq, batch_slots=2, max_len=32,
        forward_fn=ds_batch_forward, init_cache_fn=ds_init_batch_cache)
    rids = [batcher.submit(p, n) for p, n in zip(prompts, n_new)]
    results = batcher.run(max_steps=200)

    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        assert results[rid] == expected[i], (
            f"req {i}: batched {results[rid]} != single {expected[i]}")


def test_ds_batcher_under_mesh(ds_served):
    """Packed int4 DS serving THROUGH the batcher under a dp x ep x tp
    mesh (VERDICT r3 item 7): expert weights shard over "ep" via GSPMD
    (mesh.deepseek_serving_specs), the batcher's plain jitted programs
    pick the shardings up from the arrays, and greedy outputs match the
    single-device batcher exactly."""
    import jax

    from flatquant_tpu.parallel.mesh import (
        deepseek_serving_specs,
        make_mesh,
        replicated_specs,
        shard_tree,
    )

    cfg, spfq = ds_served
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 8, 4)]
    n_new = [4, 3, 4]

    plain = ContinuousBatcher(
        cfg, W4A4, spfq, batch_slots=2, max_len=32,
        forward_fn=ds_batch_forward, init_cache_fn=ds_init_batch_cache)
    for p, n in zip(prompts, n_new):
        plain.submit(p, n)
    want = plain.run(max_steps=200)

    mesh = make_mesh({"dp": 2, "ep": 2, "tp": 2},
                     devices=jax.devices()[:8])
    sp_sh = shard_tree(spfq["params"],
                       deepseek_serving_specs(spfq["params"]), mesh)
    fq_sh = shard_tree(spfq["fq"], replicated_specs(spfq["fq"]), mesh)
    sharded = ContinuousBatcher(
        cfg, W4A4, {"params": sp_sh, "fq": fq_sh}, batch_slots=2,
        max_len=32, forward_fn=ds_batch_forward,
        init_cache_fn=ds_init_batch_cache)
    for p, n in zip(prompts, n_new):
        sharded.submit(p, n)
    got = sharded.run(max_steps=200)
    assert got == want


def test_ds_batcher_slot_reuse_and_eos(ds_served):
    cfg, spfq = ds_served
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (3 + i,)).astype(np.int32)
               for i in range(4)]
    batcher = ContinuousBatcher(
        cfg, W4A4, spfq, batch_slots=2, max_len=24,
        forward_fn=ds_batch_forward, init_cache_fn=ds_init_batch_cache)
    rids = [batcher.submit(p, 3) for p in prompts]
    results = batcher.run(max_steps=300)
    assert len(results) == 4
    for rid in rids:
        assert len(results[rid]) == 3


def test_ds_batcher_bucketed_prefill(ds_served):
    """Length-bucketed DS prefill (last_idx gather in ds_batch_forward)
    matches exact-length prefill."""
    cfg, spfq = ds_served
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (3, 6)]
    mk = lambda **kw: ContinuousBatcher(
        cfg, W4A4, spfq, batch_slots=2, max_len=32,
        forward_fn=ds_batch_forward, init_cache_fn=ds_init_batch_cache, **kw)
    plain = mk()
    for p in prompts:
        plain.submit(p, 4)
    want = plain.run(max_steps=100)
    bucketed = mk(prefill_bucket=8)
    for p in prompts:
        bucketed.submit(p, 4)
    assert bucketed.run(max_steps=100) == want
