"""Timing infrastructure for TPU benchmarks.

Two measurement modes:
  - `device_compare` (preferred): run each case N times under a
    jax.profiler trace and report the DEVICE-side duration of its jit —
    immune to both the ~35 ms tunnel dispatch latency and to XLA hoisting
    loop-invariant work out of timing loops.
  - `compare` (wall-clock fallback): chains repetitions in one jitted
    fori_loop. VALID ONLY for step functions that carry state (e.g. a KV
    cache) between iterations; a pure function of loop-invariant inputs
    gets CSE-hoisted and the loop measures dispatch only. (This bit us in
    round 1 — see STATUS.md.)
(The reference uses torch.cuda.synchronize + warmups,
layer_benchmark.py:44-61.)
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


def device_compare(cases: Dict[str, Tuple[Callable, tuple]], iters: int = 10,
                   trace_dir: str = "/tmp/fq_bench_trace") -> Dict[str, float]:
    """Profiler-based comparison: {name: device seconds per call}.

    Each case's callable is jitted, warmed, then invoked `iters` times under
    one jax.profiler trace; the per-case cost is its jit's total device
    duration / iters (matched by function name in the trace).
    """
    import collections
    import glob
    import gzip
    import json
    import os
    import shutil

    jitted = {}
    for name, (fn, args) in cases.items():
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))  # warm/compile outside the trace
        jitted[name] = (f, args)

    def _trace_jit_total(case_dir, f, args):
        """Run one case under its own trace; return (total_us, n_events)
        over all jit_ executables seen. One trace PER CASE because XLA
        dedupes structurally identical jits into a single executable that
        carries the *first* function's name — name-matching in a shared
        trace silently merges such cases (observed: QuaRot-vs-FlatQuant
        transforms at equal Kron shapes)."""
        jax.profiler.start_trace(case_dir)
        out = None
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        tr = sorted(glob.glob(os.path.join(case_dir, "**", "*.trace.json.gz"),
                              recursive=True))[-1]
        with gzip.open(tr) as fh:
            data = json.load(fh)
        pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        total = 0.0
        n = 0
        for e in data["traceEvents"]:
            if (e.get("ph") == "X" and "dur" in e
                    and "TPU" in pids.get(e["pid"], "")
                    and e["name"].startswith("jit_")):
                total += e["dur"]
                n += 1
        return total, n

    shutil.rmtree(trace_dir, ignore_errors=True)
    results = {}
    for name, (f, args) in jitted.items():
        case_dir = os.path.join(trace_dir, name.replace(" ", "_"))
        os.makedirs(case_dir, exist_ok=True)
        total, n = _trace_jit_total(case_dir, f, args)
        results[name] = (total / n / 1e6) if n else float("nan")
    return results


def device_time_loop(run_loop: Callable[[], None],
                     trace_dir: str = "/tmp/fq_bench_trace_loop") -> Tuple[float, int]:
    """Device time of an arbitrary (pre-warmed) call sequence.

    run_loop() performs N calls of jitted work and blocks; returns
    (total_device_seconds, n_jit_executions) summed over every jit_
    executable in the trace. Unlike device_compare this lets the caller
    THREAD STATE between calls — required for donated-buffer steps
    (e.g. the full-depth bf16 decode, where a fresh undonated output
    cache per call would not fit HBM next to the 13.5 GB weights)."""
    import glob
    import gzip
    import json
    import os
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    run_loop()
    jax.profiler.stop_trace()
    tr = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True))[-1]
    with gzip.open(tr) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    total = 0.0
    n = 0
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and e["name"].startswith("jit_")):
            total += e["dur"]
            n += 1
    return total / 1e6, n


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
