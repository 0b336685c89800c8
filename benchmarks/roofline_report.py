"""Per-kernel roofline report: achieved vs speed-of-light, per round.

BASELINE demands every hot kernel be held to speed-of-light; this module
times the four kernels on the serving critical path at bench shapes and
reports achieved rates against their measured practical ceilings, so
kernel regressions show up in BENCH_r{N}.json round-over-round
(VERDICT r2 item 8). Ceilings are this chip's device-traced practical
limits (STATUS.md), not datasheet numbers:

  - int8 MXU dot rate: 376 TFLOPs (pure XLA int8 dot at these shapes;
    the W4A4 kernel's 359 = 96% of it)
  - HBM stream through the planar-nibble unpack: ~730 GB/s (convert-only
    probe; pure reduce measured 658)
  - v4 transposed u8 cache DMA floor: 568 GB/s
  - bf16 MXU: 189 TFLOPs measured at GEMM shapes

Used by bench.py (embedded in the JSON detail) and runnable standalone:
    python benchmarks/roofline_report.py
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

INT8_DOT_TFLOPS = 376.0
STREAM_GBS = 730.0
V4_DMA_GBS = 568.0
BF16_TFLOPS = 189.0

N_CHAIN = 64


def _time_chained(f, x0, n=N_CHAIN, reps=3):
    """Best-of-reps time per call of f, chained n times inside one jit so
    the ~25 ms tunnel dispatch amortizes away. f: x -> (x_next, scalar)."""

    @jax.jit
    def loop(x):
        def body(i, carry):
            x, acc = carry
            x, s = f(x)
            return x, acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (x, 0.0))
        return acc

    float(loop(x0))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def collect_rooflines():
    """Returns {kernel: {us, achieved, ceiling, sol_frac, unit}} for the
    four serving-critical kernels at llama-2-7b bench shapes."""
    from flatquant_tpu.kernels.int4_matmul import (
        pack_weight_planar,
        w4a4_matmul_i8,
    )
    from flatquant_tpu.kernels.kv_cache import (
        decode_attention_int4_v4,
        pack_kv_transposed,
    )
    from flatquant_tpu.kernels.prefill_attention import flash_prefill_attention

    rng = np.random.default_rng(0)
    out = {}

    # --- 1. prefill W4A4 GEMM, M=2048 K=4096 N=4096 (qkv-ish) ---
    M, K, N = 2048, 4096, 4096
    xq = jnp.asarray(rng.integers(-8, 8, (M, K)).astype(np.int8))
    xs = jnp.ones((M, 1), jnp.float32)
    wq = jnp.asarray(rng.integers(-8, 8, (N, K)).astype(np.int8))
    wp = pack_weight_planar(wq)
    ws = jnp.ones((N,), jnp.float32)

    def gemm_step(x):
        y = w4a4_matmul_i8(x, xs, wp, ws, jnp.bfloat16)
        # data-dependent chain: requantize output slice into the input
        return (x + y[:, :K].astype(jnp.int8) // 127,
                jnp.sum(y[0, :8].astype(jnp.float32)))

    t = _time_chained(gemm_step, xq)
    tf = 2.0 * M * K * N / t / 1e12
    out["w4a4_gemm_prefill_m2048"] = {
        "us": round(t * 1e6, 1), "achieved": round(tf, 1),
        "ceiling": INT8_DOT_TFLOPS, "sol_frac": round(tf / INT8_DOT_TFLOPS, 3),
        "unit": "TFLOPs"}

    # --- 2. decode W4A4 GEMM, M=1 (weight-stream bound) ---
    xq1 = jnp.asarray(rng.integers(-8, 8, (8, K)).astype(np.int8))
    xs1 = jnp.ones((8, 1), jnp.float32)

    def dec_step(x):
        y = w4a4_matmul_i8(x, xs1, wp, ws, jnp.bfloat16)
        return (x + y[:, :K].astype(jnp.int8) // 127,
                jnp.sum(y[0, :8].astype(jnp.float32)))

    t = _time_chained(dec_step, xq1)
    gbs = wp.nbytes / t / 1e9
    out["w4a4_gemm_decode_m8"] = {
        "us": round(t * 1e6, 1), "achieved": round(gbs, 1),
        "ceiling": STREAM_GBS, "sol_frac": round(gbs / STREAM_GBS, 3),
        "unit": "GB/s"}

    # --- 3. int4 flash-decode attention, B=1 MHA S=4096 ---
    B, nh, nkv, hd, S = 1, 32, 32, 128, 4096
    q = jnp.asarray(rng.normal(size=(B, nh, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, nkv, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, nkv, hd)).astype(np.float32))
    kc, kpar = pack_kv_transposed(k)
    vc, vpar = pack_kv_transposed(v)
    valid = jnp.full((B,), S - 1, jnp.int32)
    sm = 1.0 / np.sqrt(hd)

    def att_step(x):
        o = decode_attention_int4_v4(x, kc, kpar, vc, vpar, valid, sm)
        return x + 1e-6 * o, jnp.sum(o.astype(jnp.float32))

    t = _time_chained(att_step, q)
    cache_bytes = kc.nbytes + vc.nbytes + kpar.nbytes + vpar.nbytes
    gbs = cache_bytes / t / 1e9
    out["int4_decode_attention_s4096"] = {
        "us": round(t * 1e6, 1), "achieved": round(gbs, 1),
        "ceiling": V4_DMA_GBS, "sol_frac": round(gbs / V4_DMA_GBS, 3),
        "unit": "GB/s"}

    # --- 4. flash prefill attention, B=1 S=2048 MHA bf16 ---
    S2 = 2048
    qp = jnp.asarray(rng.normal(size=(B, S2, nh, hd))).astype(jnp.bfloat16)
    kp2 = jnp.asarray(rng.normal(size=(B, S2, nkv, hd))).astype(jnp.bfloat16)
    vp2 = jnp.asarray(rng.normal(size=(B, S2, nkv, hd))).astype(jnp.bfloat16)

    def fl_step(x):
        o = flash_prefill_attention(x, kp2, vp2, sm)
        return x + (1e-6 * o).astype(x.dtype), jnp.sum(o.astype(jnp.float32))

    t = _time_chained(fl_step, qp)
    flops = 2 * 2 * B * nh * (S2 * S2 / 2) * hd  # causal half, QK^T + PV
    tf = flops / t / 1e12
    out["flash_prefill_attention_s2048"] = {
        "us": round(t * 1e6, 1), "achieved": round(tf, 1),
        "ceiling": BF16_TFLOPS, "sol_frac": round(tf / BF16_TFLOPS, 3),
        "unit": "TFLOPs"}
    return out


if __name__ == "__main__":
    import json

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps(collect_rooflines(), indent=2))
