"""Driver benchmark: W4A4KV4 decode throughput vs bf16 on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares our decode speedup ratio against the reference's
published decode speedup at bsz 1 on RTX3090 (0.71x, README.md:304 — the
FlatQuant decode path is *slower* than FP16 there; beating 0.71 means our
TPU decode stack does relatively better than the reference's CUDA stack).

Measurement notes for this environment (see .claude/skills/verify/SKILL.md):
~35 ms fixed dispatch latency per jitted call through the axon tunnel, so
decode steps are chained inside one jitted fori_loop; runs are interleaved
and the best of several repetitions taken.
"""

import dataclasses
import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.models.config import LlamaConfig, get_config, register
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.baseline import (
    bf16_decode_step,
    bf16_prefill,
    build_bf16_params,
    unstack_bf16_layers,
)
from flatquant_tpu.serving.engine import (
    init_cache,
    serving_decode_step,
    serving_prefill,
    unstack_cache,
    unstack_serving_layers,
)
from flatquant_tpu.serving.quantized import build_serving_params

# llama-2-7b layer dims at trimmed depth: the layer loop is a lax.scan, so
# per-token decode cost (and the speedup ratio) is layer-count-invariant
# while compile time through the remote tunnel compiler stays bounded
# (~7 min per decode loop; shapes are pinned so reruns hit the persistent
# compile cache at /root/.cache/jax_tpu_cache)
# vocab trimmed so the (unquantized, shared) lm_head matmul doesn't mask
# the decoder-layer speedup — the quantity this metric tracks
BENCH_CFG = dataclasses.replace(
    get_config("llama-2-7b"), name="bench", num_layers=2, vocab_size=2048
)
# The flagship measured path is the TPU-native rn128 decomposition
# (every Kronecker dim splits (n/128, 128)): it unlocks the fused flat
# pipeline (rmsnorm+right, left+quant, swiglu+right epilogue) and the
# attention prologue kernel, and calibrates slightly BETTER than the
# balanced split (tools/rn128_quality.py: KL 0.00076 vs 0.00082).
# VERDICT r3 item 2: the fused kernels must be what the bench measures.
BENCH_FQ = dataclasses.replace(W4A4KV4, tpu_decompose=True)
# int4 packed KV cache: the production serving cache (the fused prefill
# attention prologue writes it; decode reads it via the v4 flash-decode
# kernel) — the bf16-dequantized cache mode is a kv16 research fallback
CACHE_MODE = "int4"
N_STEPS = 256  # amortizes the ~25 ms tunnel dispatch to <0.1 ms/step so the
# reported ratio approaches the device-side truth (profiled: quant 813 us vs
# bf16 1358 us per step = 1.67x device-side)
BATCH = 1
MAX_LEN = 512
START_POS = 64


USE_KERNEL = jax.default_backend() == "tpu"  # pallas needs the TPU backend


def _decode_loop_quant(cfg, fq_cfg, sp, tok, cache, pos, n_steps, max_len):
    def body(i, carry):
        tok, cache, acc = carry
        logits, cache = serving_decode_step.__wrapped__(
            cfg, fq_cfg, sp, tok, cache, pos + i, USE_KERNEL, max_len, jnp.bfloat16
        )
        nxt = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        return nxt, cache, acc + jnp.sum(logits)

    tok, cache, acc = jax.lax.fori_loop(0, n_steps, body, (tok, cache, 0.0))
    return acc


def _decode_loop_bf16(cfg, bp, tok, cache, pos, n_steps, max_len):
    def body(i, carry):
        tok, cache, acc = carry
        logits, cache = bf16_decode_step.__wrapped__(cfg, bp, tok, cache, pos + i, max_len)
        nxt = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        return nxt, cache, acc + jnp.sum(logits)

    tok, cache, acc = jax.lax.fori_loop(0, n_steps, body, (tok, cache, 0.0))
    return acc


def main():
    cfg = BENCH_CFG
    fq_cfg = BENCH_FQ
    # build + bake on host CPU; only the final packed/bf16 params reach HBM
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, seed=0)
        fq = init_model_fq(cfg, fq_cfg, seed=0)
        baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
        sp_host = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                                       merge_projections=True)
        bp_host = build_bf16_params(cfg, params)
    tpu = jax.devices()[0]
    # unrolled layer lists: avoids the scan's per-iteration weight
    # slice-copies (device-traced ~125 us/layer of extra traffic)
    sp = jax.device_put(unstack_serving_layers(sp_host), tpu)
    bp = jax.device_put(unstack_bf16_layers(bp_host), tpu)
    del params, baked, fq, baked_fq, sp_host, bp_host

    tok = jnp.zeros((BATCH, 1), jnp.int32)
    pos = jnp.int32(START_POS)

    quant_loop = jax.jit(
        partial(_decode_loop_quant, cfg, fq_cfg, n_steps=N_STEPS, max_len=MAX_LEN)
    )
    bf16_loop = jax.jit(
        partial(_decode_loop_bf16, cfg, n_steps=N_STEPS, max_len=MAX_LEN)
    )

    # tuple-valued caches: no per-step full-cache stack copy (in-place
    # aliased one-token updates) — see engine.unstack_cache
    cache_q = unstack_cache(init_cache(cfg, BATCH, MAX_LEN, mode=CACHE_MODE))
    cache_b = unstack_cache(init_cache(cfg, BATCH, MAX_LEN))
    # warmup / compile
    t0 = time.perf_counter()
    float(quant_loop(sp, tok, cache_q, pos))
    print(f"# quant loop ready in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    t0 = time.perf_counter()
    float(bf16_loop(bp, tok, cache_b, pos))
    print(f"# bf16 loop ready in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    tq, tb = [], []
    for _ in range(5):  # interleaved to cancel tunnel-chip drift
        t0 = time.perf_counter()
        float(quant_loop(sp, tok, cache_q, pos))
        tq.append((time.perf_counter() - t0) / N_STEPS)
        t0 = time.perf_counter()
        float(bf16_loop(bp, tok, cache_b, pos))
        tb.append((time.perf_counter() - t0) / N_STEPS)

    # prefill comparison at the reference's headline shape (S=2048):
    # the int8-MXU W4A4 kernel runs at 2x the bf16 MXU rate on v5e, the
    # TPU analog of the reference's int4 tensor-core prefill wins
    # (REALQUANT.md 1.98-2.06x). State-carrying loop: each iteration's
    # tokens depend on the previous logits, so XLA cannot hoist the body.
    S_PRE = 2048
    N_PRE = 64  # device prefill is ~7-11 ms; 64 chained iterations drop the
    # ~28 ms tunnel dispatch to <0.5 ms/prefill (device-traced 2026-08-18:
    # N_PRE=8 inflated both sides by 3.5 ms/prefill of dispatch; both
    # contenders pay the same residual, so the ratio approaches the
    # device-side truth from below)
    ptoks0 = jnp.zeros((BATCH, S_PRE), jnp.int32)

    @jax.jit
    def quant_prefill_loop(sp, ptoks, cache):
        def body(i, carry):
            ptoks, acc = carry
            logits, _ = serving_prefill.__wrapped__(
                cfg, fq_cfg, sp, ptoks, cache, USE_KERNEL, S_PRE, jnp.bfloat16)
            nxt = (ptoks + jnp.argmax(logits, -1)[:, None].astype(jnp.int32)) % cfg.vocab_size
            return nxt, acc + jnp.sum(logits)
        _, acc = jax.lax.fori_loop(0, N_PRE, body, (ptoks, 0.0))
        return acc

    @jax.jit
    def bf16_prefill_loop(bp, ptoks, cache):
        def body(i, carry):
            ptoks, acc = carry
            logits, _ = bf16_prefill.__wrapped__(cfg, bp, ptoks, cache, S_PRE)
            nxt = (ptoks + jnp.argmax(logits, -1)[:, None].astype(jnp.int32)) % cfg.vocab_size
            return nxt, acc + jnp.sum(logits)
        _, acc = jax.lax.fori_loop(0, N_PRE, body, (ptoks, 0.0))
        return acc

    cache_pq = unstack_cache(init_cache(cfg, BATCH, S_PRE, mode=CACHE_MODE))
    cache_pb = unstack_cache(init_cache(cfg, BATCH, S_PRE))
    float(quant_prefill_loop(sp, ptoks0, cache_pq))
    float(bf16_prefill_loop(bp, ptoks0, cache_pb))
    tpq = tpb = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(quant_prefill_loop(sp, ptoks0, cache_pq))
        tpq = min(tpq, (time.perf_counter() - t0) / N_PRE)
        t0 = time.perf_counter(); float(bf16_prefill_loop(bp, ptoks0, cache_pb))
        tpb = min(tpb, (time.perf_counter() - t0) / N_PRE)

    # per-kernel roofline table (VERDICT r2 item 8): achieved vs this
    # chip's measured practical ceilings, recorded every round so kernel
    # regressions are visible in BENCH_r{N}.json
    try:
        import os
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        from roofline_report import collect_rooflines

        rooflines = collect_rooflines()
    except Exception as e:  # bench must still emit its metric line
        rooflines = {"error": f"{type(e).__name__}: {str(e)[:160]}"}

    t_quant = min(tq)
    t_bf16 = min(tb)
    speedup = t_bf16 / t_quant

    # full-depth protocol run (VERDICT r4 item 1b): 32 layers, full vocab,
    # prefill 2048 + 256 decode — the reference's own measurement protocol
    # (README.md:286-310) — measured as device time of the jitted step
    # (jax.profiler), so neither tunnel dispatch nor scan slice-copies
    # distort the ratio. Sequential residency: bf16 7B (13.5 GB) and the
    # packed model can't share the 16 GB HBM — and the TRIMMED models
    # must be freed first (leaving them resident OOMed the first
    # integrated run; the standalone fulldepth run had passed)
    import gc

    del sp, bp, cache_q, cache_b, cache_pq, cache_pb
    gc.collect()
    try:
        from tools.fulldepth_bench import run_fulldepth

        full = run_fulldepth()
    except Exception as e:  # bench must still emit its metric line
        full = {"error": f"{type(e).__name__}: {str(e)[:160]}"}

    ref_decode_speedup = 0.71  # README.md:304, bsz 1
    detail = {
        "config": "W4A4KV4 + tpu_decompose (rn128 fused flat "
                  "pipeline) + packed int4 KV cache",
        "t_decode_quant_ms": round(t_quant * 1e3, 3),
        "t_decode_bf16_ms": round(t_bf16 * 1e3, 3),
        "steps": N_STEPS,
        "tok_s_quant": round(BATCH / t_quant, 1),
        "tok_s_bf16": round(BATCH / t_bf16, 1),
        "prefill2048_quant_ms": round(tpq * 1e3, 3),
        "prefill2048_bf16_ms": round(tpb * 1e3, 3),
        "prefill_speedup": round(tpb / tpq, 4),
        "full_depth": full,
        "rooflines": rooflines,
    }
    # rooflines/sweeps go to a side file — the driver's tail capture only
    # reliably records a SHORT final line (BENCH_r04 'parsed: null' lesson)
    import os

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(f"# detail written to {detail_path}", file=sys.stderr)

    headline = {
        "metric": "llama2-7b W4A4KV4 decode speedup vs bf16, bsz1 "
                  "(trimmed 2-layer proxy)",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / ref_decode_speedup, 4),
        "trimmed": {"decode": round(speedup, 4),
                    "prefill": round(tpb / tpq, 4)},
    }
    if "decode_speedup" in full:
        headline.update(
            metric="llama2-7b W4A4KV4 decode speedup vs bf16, bsz1 "
                   "(full 32-layer model, device time)",
            value=full["decode_speedup"],
            vs_baseline=round(full["decode_speedup"] / ref_decode_speedup, 4),
            full_depth={"decode": full["decode_speedup"],
                        "prefill": full["prefill_speedup"],
                        "e2e_2048p_256d": full.get("e2e_speedup")},
        )
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
