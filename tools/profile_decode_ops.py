"""Op-level device profile of one serving DECODE step on the bench config.

The decode headline (bench.py) sits at 2.3-2.65x vs bf16; per-layer
weight-stream floor says ~3.3x is available. This dumps the top XLA ops
by device time inside jit_serving_decode_step so decode glue (S=1 kron
transforms, rope, KV write, quant chains) can be attributed, the same
way profile_prefill_ops.py attributes prefill.

Usage: python tools/profile_decode_ops.py [--iters 16] [--cache int4]
"""

import argparse
import dataclasses
import glob
import gzip
import json
import os
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
    serving_decode_step,
    unstack_cache,
    unstack_serving_layers,
)
from flatquant_tpu.serving.quantized import build_serving_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cache", default="int4", choices=["bf16", "int4"])
    ap.add_argument("--max_len", type=int, default=512)
    ap.add_argument("--bf16_model", action="store_true",
                    help="profile the bf16 baseline decode step instead")
    args = ap.parse_args()

    cfg = dataclasses.replace(
        get_config("llama-2-7b"), name="bench", num_layers=2, vocab_size=2048
    )
    fq_cfg = dataclasses.replace(W4A4KV4, tpu_decompose=True)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    tok = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.int32(64)
    if args.bf16_model:
        from flatquant_tpu.serving.baseline import (
            bf16_decode_step,
            build_bf16_params,
            unstack_bf16_layers,
        )

        with jax.default_device(cpu):
            params = init_params(cfg, seed=0)
            bp_host = build_bf16_params(cfg, params)
        bp = jax.device_put(unstack_bf16_layers(bp_host), tpu)
        cache = unstack_cache(init_cache(cfg, 1, args.max_len))
        f = lambda c: bf16_decode_step(cfg, bp, tok, c, pos, args.max_len)
    else:
        with jax.default_device(cpu):
            params = init_params(cfg, seed=0)
            fq = init_model_fq(cfg, fq_cfg, seed=0)
            baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
            sp_host = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                                           merge_projections=True)
        sp = jax.device_put(unstack_serving_layers(sp_host), tpu)
        cache = unstack_cache(init_cache(cfg, 1, args.max_len,
                                         mode=args.cache))
        use_kernel = jax.default_backend() == "tpu"
        f = lambda c: serving_decode_step(
            cfg, fq_cfg, sp, tok, c, pos, use_kernel, args.max_len,
            jnp.bfloat16)

    # the decode step DONATES its cache: thread it through (each call
    # consumes the previous call's output buffers)
    logits, cache = f(cache)
    jax.block_until_ready(logits)
    trace_dir = "/tmp/fq_decode_ops"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        logits, cache = f(cache)
    jax.block_until_ready(logits)
    jax.profiler.stop_trace()

    tr = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True))[-1]
    with gzip.open(tr) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    totals = defaultdict(float)
    counts = defaultdict(int)
    jit_total = 0.0
    jit_n = 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        name = e["name"]
        if name.startswith("jit_"):
            jit_total += e["dur"]
            jit_n += 1
            continue
        totals[name] += e["dur"]
        counts[name] += 1
    if jit_n:
        print(f"decode step device total: {jit_total/jit_n*1e-3:.3f} ms/call "
              f"({jit_n} calls)")
    scale = 1.0 / max(args.iters, 1)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"{'us/call':>10}  {'n/call':>6}  op")
    for name, us in rows[: args.top]:
        print(f"{us*scale:>10.1f}  {counts[name]*scale:>6.1f}  {name[:110]}")
    rest = sum(us for _, us in rows[args.top:]) * scale
    print(f"{rest:>10.1f}          (remaining {len(rows)-args.top} ops)")


if __name__ == "__main__":
    main()
