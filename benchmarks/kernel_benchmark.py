"""W4A8 GEMM kernel benchmark vs bf16 matmul across model shapes.

kernel_benchmark.py analog (reference times the fused Triton kron+quant
kernel vs cuBLAS at (M,N) in {64x64..112x128} x bsz x seqlen; here the
contenders are the Pallas int4-weight GEMM vs the XLA bf16 matmul at llama
decode/prefill shapes, with roofline accounting per kernel).

Usage: python benchmarks/kernel_benchmark.py [--shapes small]
"""

import argparse
import json

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.kernels.int4_matmul import (
    pack_weight_planar,
    quantize_acts_sym,
    w4a8_matmul,
)
from flatquant_tpu.utils.benchmark import device_compare, roofline_gemm

SHAPES = {
    "llama2-7b qkv decode": (8, 4096, 4096),
    "llama2-7b mlp decode": (8, 4096, 11008),
    "llama3-8b mlp decode": (8, 4096, 14336),
    "llama2-7b qkv prefill": (2048, 4096, 4096),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    results = {}
    for name, (m, k, n) in SHAPES.items():
        q = jnp.asarray(rng.integers(-8, 8, (n, k)), jnp.int8)
        wp = jax.device_put(pack_weight_planar(q))
        ws = jax.device_put(jnp.full((n,), 0.01, jnp.float32))
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        xq, xs = quantize_acts_sym(x)
        xq, xs = jax.device_put(xq), jax.device_put(xs)
        w16 = jax.device_put(jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.bfloat16) * 0.01)
        xb = jax.device_put(x.astype(jnp.bfloat16))

        def w4a8_case(xq, xs, wp, ws):
            return w4a8_matmul(xq, xs, wp, ws, jnp.bfloat16,
                               block_m=min(256, m), block_n=1024)

        def bf16_case(xb, w16):
            return xb @ w16

        times = device_compare(
            {
                "w4a8_case": (w4a8_case, (xq, xs, wp, ws)),
                "bf16_case": (bf16_case, (xb, w16)),
            },
            iters=10,
        )
        times = {"w4a8": times["w4a8_case"], "bf16": times["bf16_case"]}
        rl4 = roofline_gemm(m, k, n, times["w4a8"], wp.nbytes)
        rl16 = roofline_gemm(m, k, n, times["bf16"], w16.nbytes)
        results[name] = {
            "w4a8_us": round(times["w4a8"] * 1e6, 1),
            "bf16_us": round(times["bf16"] * 1e6, 1),
            "speedup": round(times["bf16"] / times["w4a8"], 3),
            "w4a8_roofline": {k2: (round(v, 3) if isinstance(v, float) else v) for k2, v in rl4.items()},
            "bf16_roofline": {k2: (round(v, 3) if isinstance(v, float) else v) for k2, v in rl16.items()},
        }
        print(name, json.dumps(results[name]))
    print(json.dumps({"summary": {k: v["speedup"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
