"""Timing infrastructure for TPU benchmarks.

The axon tunnel adds ~35 ms fixed dispatch latency per jitted call and the
shared chip drifts run-to-run, so every measurement here:
  - chains `iters` repetitions inside ONE jitted fori_loop,
  - forces completion with a scalar host fetch,
  - interleaves contenders and keeps the per-contender minimum.
(The reference uses torch.cuda.synchronize + warmups,
layer_benchmark.py:44-61; this is the TPU-tunnel equivalent.)
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def chained_timer(step_fn: Callable, args: tuple, iters: int = 20):
    """Build a jitted closure running `iters` dependent repetitions.

    step_fn(*args) must return an array; its sum feeds an accumulator so no
    iteration can be elided.
    """

    @jax.jit
    def run(*args):
        def body(i, acc):
            out = step_fn(*args)
            return acc + jnp.sum(out.astype(jnp.float32)) * (1.0 + 1e-12 * i)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    return run


def measure(run, args: tuple, iters: int, reps: int = 3) -> float:
    """Seconds per iteration (min over reps); first call compiles."""
    float(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def compare(cases: Dict[str, Tuple[Callable, tuple]], iters: int = 20,
            reps: int = 3) -> Dict[str, float]:
    """Interleaved comparison: {name: seconds-per-iter}."""
    runners = {name: (chained_timer(fn, args, iters), args)
               for name, (fn, args) in cases.items()}
    # compile all first
    for run, args in runners.values():
        float(run(*args))
    best = {name: float("inf") for name in cases}
    for _ in range(reps):
        for name, (run, args) in runners.items():
            t0 = time.perf_counter()
            float(run(*args))
            best[name] = min(best[name], (time.perf_counter() - t0) / iters)
    return best


def roofline_gemm(m: int, k: int, n: int, t_seconds: float,
                  bytes_weights: int, peak_tflops: float = 197.0,
                  peak_gbs: float = 819.0) -> Dict[str, float]:
    """Roofline accounting for a GEMM (v5e nominal peaks; the BASELINE
    demands per-kernel speed-of-light bookkeeping)."""
    flops = 2.0 * m * k * n
    t_compute = flops / (peak_tflops * 1e12)
    t_memory = bytes_weights / (peak_gbs * 1e9)
    sol = max(t_compute, t_memory)
    return {
        "achieved_tflops": flops / t_seconds / 1e12,
        "weight_stream_gbs": bytes_weights / t_seconds / 1e9,
        "speed_of_light_s": sol,
        "sol_fraction": sol / t_seconds,
        "bound": "compute" if t_compute > t_memory else "memory",
    }
