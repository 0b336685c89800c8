"""Decoder-layer decode latency: bf16 vs Int4 vs QuaRot-had vs FlatQuant.

layer_benchmark.py analog (reference: FP16 / Int4 / QuaRot(had) /
FlatQuant(matmul) on a single decoder layer with random weights,
layer_benchmark.py:237-274). Uses the pinned 2-layer llama-2-7b-dims stack
(scan makes per-layer cost depth-invariant).
"""

import argparse
import dataclasses
import json
from functools import partial

import numpy as np

import os
import sys

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
from flatquant_tpu.serving.baseline import (
    bf16_decode_step,
    build_bf16_params,
    unstack_bf16_layers,
)
from flatquant_tpu.serving.engine import (
    init_cache,
    serving_decode_step,
    unstack_serving_layers,
)
from flatquant_tpu.serving.quantized import (
    build_hadamard_serving_params,
    build_serving_params,
)
from flatquant_tpu.utils.benchmark import device_compare


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--max_len", type=int, default=512)
    args = p.parse_args()
    cfg = dataclasses.replace(get_config("llama-2-7b"), name="diag", num_layers=2,
                              vocab_size=32000)
    fq_cfg = W4A4KV4
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, seed=0)
        fq = init_model_fq(cfg, fq_cfg, seed=0)
        baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
        sp_flat = build_serving_params(cfg, fq_cfg, baked, baked_fq)
        sp_had = build_hadamard_serving_params(cfg, fq_cfg, params)
        bp = build_bf16_params(cfg, params)
    dev = jax.devices()[0]
    # unrolled layers (see serving.engine) + enough iterations to amortize
    # the ~25 ms tunnel dispatch
    sp_flat = jax.device_put(unstack_serving_layers(sp_flat), dev)
    sp_had = jax.device_put(unstack_serving_layers(sp_had), dev)
    bp = jax.device_put(unstack_bf16_layers(bp), dev)

    tok = jnp.zeros((args.batch, 1), jnp.int32)
    pos = jnp.int32(64)
    ml = args.max_len

    def flatquant_step(sp, tok, cache, pos):
        logits, cache = serving_decode_step.__wrapped__(
            cfg, fq_cfg, sp, tok, cache, pos, True, ml, jnp.bfloat16)
        return logits

    def quarot_step(sp, tok, cache, pos):
        logits, cache = serving_decode_step.__wrapped__(
            cfg, fq_cfg, sp, tok, cache, pos, True, ml, jnp.bfloat16)
        return logits

    def bf16_step(bp, tok, cache, pos):
        logits, cache = bf16_decode_step.__wrapped__(cfg, bp, tok, cache, pos, ml)
        return logits

    cases = {
        "flatquant_step": (flatquant_step, (sp_flat, tok, init_cache(cfg, args.batch, ml), pos)),
        "quarot_step": (quarot_step, (sp_had, tok, init_cache(cfg, args.batch, ml), pos)),
        "bf16_step": (bf16_step, (bp, tok, init_cache(cfg, args.batch, ml), pos)),
    }
    times = device_compare(cases, iters=10)
    n_layers = cfg.num_layers
    out = {name: round(t * 1e6 / n_layers, 1) for name, t in times.items()}
    print(json.dumps({
        "device_us_per_layer_decode": out,
        "speedup_vs_bf16": {n: round(times["bf16_step"] / t, 3) for n, t in times.items()},
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
