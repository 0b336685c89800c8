"""Continuous batching x pipeline parallelism (VERDICT r4 item 4).

The reference's vLLM serves continuous batching under TP and PP
simultaneously (vllm_custom/.../llama_flatquant.py:400-460); here the
batcher's three programs (prefill-into-slot, multi-slot decode, chunked
prefill) run through parallel/pipeline.pipeline_serving_forward with the
stacked weights, slot caches, and paged pools stage-sharded P("pp").
Greedy outputs must be bit-identical to the plain single-device batcher
in every cache mode.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.parallel.mesh import make_mesh
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.batcher import ContinuousBatcher
from flatquant_tpu.serving.quantized import build_serving_params


@pytest.fixture(scope="module")
def served():
    cfg = dataclasses.replace(get_config("tiny-llama"), num_layers=4)
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0  # sharpen to avoid ties
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                              dtype=jnp.float32, merge_projections=True)
    return cfg, fq_cfg, sp


def _run(batcher, prompts, n_new):
    rids = [batcher.submit(p, n) for p, n in zip(prompts, n_new)]
    results = batcher.run(max_steps=300)
    assert set(results) == set(rids)
    return [results[r] for r in rids]


@pytest.mark.parametrize("cache_mode", ["bf16", "int4", "paged"])
def test_batcher_pp_matches_plain(served, cache_mode):
    """3 requests through 2 slots under pp=2 reproduce the plain
    batcher's greedy tokens exactly — slot caches / paged pools are
    stage-sharded, prefill runs at M=1, decode pipelines 2 microbatches."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 7, 4)]
    n_new = [6, 4, 5]

    plain = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                              cache_mode=cache_mode)
    want = _run(plain, prompts, n_new)

    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    pp = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                           cache_mode=cache_mode, pp_mesh=mesh,
                           pp_microbatches=2)
    got = _run(pp, prompts, n_new)
    assert got == want


def test_batcher_pp_chunked_prefill(served):
    """Chunked prefill (decode interleaving) under pp: same tokens as the
    plain chunked batcher, int4 cache."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (9, 6)]
    n_new = [5, 5]

    plain = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                              cache_mode="int4", prefill_chunk=4)
    want = _run(plain, prompts, n_new)

    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    pp = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=32,
                           cache_mode="int4", prefill_chunk=4,
                           pp_mesh=mesh, pp_microbatches=2)
    got = _run(pp, prompts, n_new)
    assert got == want
