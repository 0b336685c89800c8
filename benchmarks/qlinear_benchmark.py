"""Quantized-linear benchmark: int4 linear (+online transform) vs bf16.

qlinear_benchmark.py analog (reference: Linear4bit [+had|+inv trans] vs
FP16 nn.Linear at Llama mlp dims, deploy/qlinear_benchmark.py). Here the
contenders are the full serving linear path — per-token act quant +
Pallas int4-weight GEMM — standalone, with and without the online
transform in front:

  bf16        x @ W^T                       (the FP16 baseline)
  int4        quant -> int4 GEMM            (Linear4bit analog)
  int4+had    FWHT kron -> quant -> GEMM    (QuaRot OnlineTrans("had"))
  int4+fq     kron P -> quant -> GEMM       (FlatQuant OnlineTrans("matmul"))

Decode shapes run the HBM-bound w4a8 kernel, prefill shapes the int8-MXU
w4a4 kernel (the same dispatch serving uses, serving/quantized.py:209-217).
Times are device-trace durations (utils/benchmark.device_compare).

Usage: python benchmarks/qlinear_benchmark.py [--iters N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.core.kron import get_decompose_dim
from flatquant_tpu.core.orth import random_orthogonal
from flatquant_tpu.kernels.int4_matmul import pack_weight_planar
from flatquant_tpu.serving.quantized import (
    _quant_linear,
    hadamard_pair,
    kron_transform,
)
from flatquant_tpu.utils.benchmark import device_compare

# (tokens, in_features, out_features): llama-2-7b / llama-3-8b linears
SHAPES = {
    "7b up_proj decode b8": (8, 4096, 11008),
    "7b down_proj decode b8": (8, 11008, 4096),
    "8b down_proj decode b8": (8, 14336, 4096),
    "7b up_proj prefill 2048": (2048, 4096, 11008),
    "7b down_proj prefill 2048": (2048, 11008, 4096),
}


def fq_pair(n: int, dtype=jnp.bfloat16):
    a, b = get_decompose_dim(n)
    return (
        jnp.asarray(random_orthogonal(a, np.random.default_rng(0)), dtype),
        jnp.asarray(random_orthogonal(b, np.random.default_rng(1)), dtype),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    results = {}
    for name, (t, k, n) in SHAPES.items():
        lin = {
            "wp": jax.device_put(
                pack_weight_planar(jnp.asarray(rng.integers(-8, 8, (n, k)), jnp.int8))
            ),
            "scale": jax.device_put(jnp.full((n,), 0.01, jnp.float32)),
        }
        w16 = jax.device_put(
            jnp.asarray(rng.standard_normal((n, k)) * 0.01, jnp.bfloat16)
        )
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
        )
        had = tuple(jax.device_put(m) for m in hadamard_pair(k))
        fq = tuple(jax.device_put(m) for m in fq_pair(k))

        def bf16_case(x, w16):
            return x @ w16.T

        def int4_case(x, lin):
            return _quant_linear(x, lin, use_kernel=True)

        def int4_had_case(x, lin, had):
            return _quant_linear(kron_transform(x, had), lin, use_kernel=True)

        def int4_fq_case(x, lin, fq):
            return _quant_linear(kron_transform(x, fq), lin, use_kernel=True)

        times = device_compare(
            {
                "bf16_case": (bf16_case, (x, w16)),
                "int4_case": (int4_case, (x, lin)),
                "int4_had_case": (int4_had_case, (x, lin, had)),
                "int4_fq_case": (int4_fq_case, (x, lin, fq)),
            },
            iters=args.iters,
        )
        row = {
            "bf16_us": round(times["bf16_case"] * 1e6, 1),
            "int4_us": round(times["int4_case"] * 1e6, 1),
            "int4_had_us": round(times["int4_had_case"] * 1e6, 1),
            "int4_fq_us": round(times["int4_fq_case"] * 1e6, 1),
            "int4_speedup": round(times["bf16_case"] / times["int4_case"], 3),
            "had_speedup": round(times["bf16_case"] / times["int4_had_case"], 3),
            "fq_speedup": round(times["bf16_case"] / times["int4_fq_case"], 3),
        }
        results[name] = row
        print(name, json.dumps(row))
    print(json.dumps({"summary": {k: v["fq_speedup"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
