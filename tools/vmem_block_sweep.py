"""Block-size x VMEM-budget sweep for the flat-pipeline hot kernels.

The r4 prefill op profile (tools/profile_prefill_ops.py) showed
left_quant_i8_flat at ~0.45 SoL (bt=64 forced by a ~10 MB scoped-VMEM
cap) and the K=11008 GEMMs at ~0.85 (block_m shrunk by an 11 MB cap) —
but this chip accepts vmem_limit_bytes=100 MB (attn_prologue runs with
it). Sweep bigger blocks under raised limits.

Usage: python tools/vmem_block_sweep.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.kernels.flat_pipeline import _left_quant_flat_kernel
from flatquant_tpu.kernels.int4_matmul import _w4a4_i8_kernel, pack_weight_planar
from flatquant_tpu.utils.benchmark import device_compare


@functools.partial(jax.jit, static_argnames=("q_max", "bt", "vmem_mb"))
def left_quant_v(left_t, x, q_max=7, bt=64, vmem_mb=None):
    t, k = x.shape
    g = k // 128
    cp = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
          if vmem_mb else None)
    return pl.pallas_call(
        functools.partial(_left_quant_flat_kernel, q_max=q_max, g=g),
        out_shape=(jax.ShapeDtypeStruct((t, k), jnp.int8),
                   jax.ShapeDtypeStruct((t, 1), jnp.float32)),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((g, g), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bt, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=cp,
    )(left_t.astype(jnp.bfloat16), x, jnp.ones((1, 2), jnp.float32))


@functools.partial(jax.jit, static_argnames=("bm", "bn", "vmem_mb"))
def gemm_v(x_q, x_scale, w_packed, w_scale, bm=512, bn=1024, vmem_mb=None):
    m, k = x_q.shape
    n = w_packed.shape[0]
    cp = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
          if vmem_mb else None)
    sw = w_scale.reshape(1, n).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_w4a4_i8_kernel, out_dtype=jnp.bfloat16),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, bm), pl.cdiv(n, bn)),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=cp,
    )(x_q, w_packed, sx, sw)


def main():
    rng = np.random.default_rng(0)
    T = 2048
    cases = {}

    for K in (4096, 11008):
        x = jnp.asarray(rng.normal(size=(T, K))).astype(jnp.bfloat16)
        lt = jnp.asarray(
            rng.normal(size=(K // 128, K // 128)) / 5.7).astype(jnp.float32)
        for bt, vm in ((64, None), (128, 64), (256, 64), (512, 96)):
            cases[f"lq_k{K}_bt{bt}"] = (
                functools.partial(left_quant_v, bt=bt, vmem_mb=vm), (lt, x))

    # down-shape GEMM M=2048 K=11008 N=4096
    K2, N2 = 11008, 4096
    xq = jnp.asarray(rng.integers(-8, 8, (T, K2)).astype(np.int8))
    xs = jnp.ones((T, 1), jnp.float32)
    wq = jnp.asarray(rng.integers(-8, 8, (N2, K2)).astype(np.int8))
    wp = pack_weight_planar(wq)
    ws = jnp.ones((N2,), jnp.float32)
    for bm, bn, vm in ((128, 1024, 24), (256, 1024, 64), (512, 1024, 96),
                       (512, 512, 64), (1024, 512, 96), (1024, 1024, 110)):
        cases[f"down_bm{bm}_bn{bn}"] = (
            functools.partial(gemm_v, bm=bm, bn=bn, vmem_mb=vm),
            (xq, xs, wp, ws))

    res = device_compare(cases, iters=12, trace_dir="/tmp/fq_vmem_sweep")
    print(f"{'case':24s} {'us':>8s}  note")
    for name, t in sorted(res.items()):
        if name.startswith("lq"):
            K = 11008 if "11008" in name else 4096
            gbs = T * K * 3 / t / 1e9
            print(f"{name:24s} {t*1e6:8.1f}  {gbs:5.0f} GB/s")
        else:
            tf = 2.0 * T * K2 * N2 / t / 1e12
            print(f"{name:24s} {t*1e6:8.1f}  {tf:5.1f} TF")


if __name__ == "__main__":
    main()
