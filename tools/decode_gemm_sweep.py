"""Decode-shape block sweep for the W4A4 int8-MXU GEMM.

The trace-based roofline (r4) put the decode GEMM at 17.1 us for the
8.4 MB qkv-ish weight = 490 GB/s = 0.60 of HBM spec — the kernel streams
the weight in only N/block_n grid steps, so the DMA pipeline spends a
large fraction filling. Decode e2e is weight-stream bound (~101 MB of
packed weights per llama-2-7b layer), so every point of stream
efficiency is a point of decode throughput. Sweep block_n (and block_m
pass-through) per weight shape at M in {1, 8}.

Usage: python tools/decode_gemm_sweep.py
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.kernels.int4_matmul import (
    pack_weight_planar,
    w4a4_matmul_i8,
)
from flatquant_tpu.utils.benchmark import device_compare


def main():
    rng = np.random.default_rng(0)
    # llama-2-7b decode GEMM shapes (merged projections)
    shapes = {
        "qkv_12288x4096": (12288, 4096),
        "o_4096x4096": (4096, 4096),
        "upgate_22016x4096": (22016, 4096),
        "down_4096x11008": (4096, 11008),
    }
    for M in (1, 8):
        cases = {}
        byte_count = {}
        for name, (N, K) in shapes.items():
            xq = jnp.asarray(rng.integers(-8, 8, (M, K)).astype(np.int8))
            xs = jnp.ones((M, 1), jnp.float32)
            wq = jnp.asarray(rng.integers(-8, 8, (N, K)).astype(np.int8))
            wp = pack_weight_planar(wq)
            ws = jnp.ones((N,), jnp.float32)
            byte_count[name] = wp.nbytes
            for bn in (256, 512, 1024, 2048):
                cases[f"{name}_bn{bn}"] = (
                    partial(w4a4_matmul_i8, block_n=bn,
                            out_dtype=jnp.bfloat16),
                    (xq, xs, wp, ws))
        res = device_compare(cases, iters=16,
                             trace_dir=f"/tmp/fq_gemm_sweep_m{M}")
        print(f"# M={M}  (device us | weight GB/s)")
        for cname, t in sorted(res.items()):
            base = cname.rsplit("_bn", 1)[0]
            gbs = byte_count[base] / t / 1e9
            print(f"{cname:28s} {t*1e6:8.1f} us   {gbs:6.0f} GB/s")


if __name__ == "__main__":
    main()
