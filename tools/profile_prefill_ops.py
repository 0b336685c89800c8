"""Op-level device profile of one serving prefill (S=2048) on the bench config.

Dumps the top XLA ops by total device time inside jit_serving_prefill so
glue costs (transforms, quant chains, layout copies) can be attributed
precisely. See utils/benchmark.py device_compare for the measurement
rationale (tunnel dispatch immunity).

Usage: python tools/profile_prefill_ops.py [--s 2048] [--batch 1] [--iters 4]
"""

import argparse
import dataclasses
import glob
import gzip
import json
import os
import re
import shutil
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.engine import (
    init_cache,
    serving_prefill,
    unstack_cache,
    unstack_serving_layers,
)
from flatquant_tpu.serving.quantized import build_serving_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tpu_decompose", action="store_true",
                    help="rn128 transform split: grouped Pallas front-ends "
                         "cover attn-in and the full MLP")
    ap.add_argument("--cache", default="bf16", choices=["bf16", "int4"],
                    help="int4 engages the fused attn prologue + fused o "
                         "path (serving_layer_int4cache)")
    args = ap.parse_args()

    cfg = dataclasses.replace(
        get_config("llama-2-7b"), name="bench", num_layers=2, vocab_size=2048
    )
    fq_cfg = dataclasses.replace(W4A4KV4, tpu_decompose=args.tpu_decompose)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, seed=0)
        fq = init_model_fq(cfg, fq_cfg, seed=0)
        baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
        sp_host = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                                       merge_projections=True)
    tpu = jax.devices()[0]
    sp = jax.device_put(unstack_serving_layers(sp_host), tpu)
    del params, baked, fq, baked_fq, sp_host

    toks = jnp.zeros((args.batch, args.s), jnp.int32)
    cache = unstack_cache(init_cache(cfg, args.batch, args.s, mode=args.cache))

    use_kernel = jax.default_backend() == "tpu"
    f = lambda sp, toks, cache: serving_prefill(
        cfg, fq_cfg, sp, toks, cache, use_kernel, args.s, jnp.bfloat16)
    out = f(sp, toks, cache)
    jax.block_until_ready(out)

    trace_dir = "/tmp/fq_prefill_ops"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        out = f(sp, toks, cache)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    tr = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True))[-1]
    with gzip.open(tr) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # per-op totals on the TPU op timeline (skip the enclosing jit_ events)
    totals = defaultdict(float)
    counts = defaultdict(int)
    jit_total = 0.0
    jit_n = 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pids.get(e["pid"], "")
        if "TPU" not in pname:
            continue
        name = e["name"]
        if name.startswith("jit_"):
            jit_total += e["dur"]
            jit_n += 1
            continue
        totals[name] += e["dur"]
        counts[name] += 1
    if jit_n:
        print(f"jit_serving_prefill device total: {jit_total/jit_n/1e3:.3f} ms/call "
              f"({jit_n} calls)")
    scale = 1.0 / max(args.iters, 1)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"{'us/call':>10}  {'n/call':>6}  op")
    shown = 0.0
    for name, us in rows[: args.top]:
        print(f"{us*scale:>10.1f}  {counts[name]*scale:>6.1f}  {name[:110]}")
        shown += us * scale
    rest = sum(us for _, us in rows[args.top:]) * scale
    print(f"{rest:>10.1f}          (remaining {len(rows)-args.top} ops)")


if __name__ == "__main__":
    main()
