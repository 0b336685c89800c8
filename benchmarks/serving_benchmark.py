"""Continuous-batching serving benchmark: throughput + decode-stall.

The reference serves through vLLM (vllm_custom/) and reports end-to-end
throughput; here the first-party batcher is measured directly:

  - sustained throughput (tokens/s) for a mixed prompt-length workload,
    bf16 vs int4 cache modes
  - the decode-stall profile: the longest gap (in wall time) an active
    stream sees between its tokens while a long prompt is being admitted,
    with and without chunked prefill — the latency property chunking buys

Wall-clock numbers through the axon tunnel include the ~35 ms dispatch
per jitted call (see utils/benchmark.py); the *relative* stall shrink and
the step accounting are the meaningful signal, and both contenders pay
the same dispatch tax per step.

Usage: python benchmarks/serving_benchmark.py [--llama7b-dims] [--chunk N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.batcher import ContinuousBatcher
from flatquant_tpu.serving.quantized import build_serving_params


def build(cfg, perm):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, seed=0)
        fq = init_model_fq(cfg, W4A4KV4, seed=0)
        baked, baked_fq = bake_model(cfg, W4A4KV4, params, fq)
        sp = build_serving_params(cfg, W4A4KV4, baked, baked_fq,
                                  merge_projections=True, perm_transforms=perm)
    return jax.device_put(sp, jax.devices()[0])


def throughput(cfg, sp, cache_mode, use_kernel, prompts, n_new, max_len):
    """(tok/s, total tokens, KV-cache HBM bytes). The paged mode runs the
    default half-capacity pool (serving/batcher.py) — the memory row the
    block-table design exists for: mixed-length requests share blocks, so
    the same workload completes in half the slot cache's KV HBM (admission
    defers when the pool is momentarily full)."""
    hbm = {}

    def one_pass():
        b = ContinuousBatcher(cfg, W4A4KV4, sp, batch_slots=4, max_len=max_len,
                              cache_mode=cache_mode, use_kernel=use_kernel,
                              compute_dtype=jnp.bfloat16, prefill_bucket=128)
        hbm["bytes"] = sum(v.nbytes for v in jax.tree.leaves(b.cache))
        for p in prompts:
            b.submit(p, n_new)
        t0 = time.perf_counter()
        done = b.run(max_steps=100000)
        dt = time.perf_counter() - t0
        return sum(len(v) for v in done.values()), dt

    one_pass()  # warm: compiles every prefill bucket + decode shape untimed
    toks, dt = one_pass()
    return toks / dt, toks, hbm["bytes"]


def decode_stall(cfg, sp, chunk, use_kernel, long_s, max_len):
    """Max wall gap between an active stream's tokens while a long prompt
    admits. The scenario runs twice; the first (untimed) pass compiles
    every program the second pass will hit (seat/chunk/prefill/decode),
    so the timed gaps measure steps, not compiles."""
    rng = np.random.default_rng(0)
    short = rng.integers(0, cfg.vocab_size, (16,)).astype(np.int32)
    longp = rng.integers(0, cfg.vocab_size, (long_s,)).astype(np.int32)

    def one_pass(timed):
        b = ContinuousBatcher(cfg, W4A4KV4, sp, batch_slots=2, max_len=max_len,
                              cache_mode="int4", use_kernel=use_kernel,
                              compute_dtype=jnp.bfloat16,
                              prefill_chunk=chunk,
                              prefill_bucket=0 if chunk else long_s)
        b.submit(short, max_new_tokens=64)
        b.step()  # seat + first decode
        b.step()
        req = next(r for r in b.slot_req if r is not None)
        b.submit(longp, max_new_tokens=8)
        gaps = []
        last = time.perf_counter()
        n0 = len(req.out_tokens)
        for _ in range(64):
            b.step()
            now = time.perf_counter()
            if len(req.out_tokens) > n0:
                gaps.append(now - last)
                n0 = len(req.out_tokens)
                last = now
            if b.idle:
                break
        return gaps

    one_pass(timed=False)
    gaps = one_pass(timed=True)
    return max(gaps) * 1e3, float(np.median(gaps)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--llama7b-dims", action="store_true",
                    help="2-layer llama-2-7b dims (TPU); default tiny (CPU ok)")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--long-s", type=int, default=1024)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="cpu: run the tiny config off-TPU (backend not yet "
                         "initialized at this point, so the override works)")
    ap.add_argument("--perm", action="store_true",
                    help="perm (one-copy) transform layout; device-traced "
                         "slower end-to-end (tools/perm_compare.py), so off "
                         "by default")
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.llama7b_dims:
        cfg = dataclasses.replace(get_config("llama-2-7b"), name="bench",
                                  num_layers=2, vocab_size=2048)
        max_len, n_new = 2048, 32
        plens = (64, 350, 128, 700, 200, 512)
    else:
        cfg = get_config("tiny-llama")
        max_len, n_new = 128, 8
        plens = (5, 17, 9, 23)
        args.chunk = min(args.chunk, 8)
        args.long_s = min(args.long_s, 48)

    use_kernel = jax.default_backend() == "tpu"
    sp = build(cfg, perm=args.perm)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in plens]

    out = {"config": cfg.name, "use_kernel": use_kernel}
    for mode in ("bf16", "int4", "paged"):
        tps, toks, hbm = throughput(cfg, sp, mode, use_kernel, prompts,
                                    n_new, max_len)
        out[f"throughput_{mode}_tok_s"] = round(tps, 1)
        out[f"cache_hbm_mb_{mode}"] = round(hbm / 2**20, 2)
    stall_plain, med_plain = decode_stall(cfg, sp, 0, use_kernel,
                                          args.long_s, max_len)
    stall_chunk, med_chunk = decode_stall(cfg, sp, args.chunk, use_kernel,
                                          args.long_s, max_len)
    out["decode_stall_ms"] = {
        "unchunked_max": round(stall_plain, 1),
        "chunked_max": round(stall_chunk, 1),
        "unchunked_median": round(med_plain, 1),
        "chunked_median": round(med_chunk, 1),
        "long_prompt": args.long_s, "chunk": args.chunk,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
