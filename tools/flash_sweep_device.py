"""Block-size sweep for the flash prefill attention kernel on device.

VERDICT r2 #3: 0.39-0.42 ms/layer measured vs a ~0.18 ms bf16 GEMM-only
roofline at llama-2-7b dims (S=2048, 32 MHA heads, hd=128) — find the
(blk_q, blk_k) frontier. Timing per flash_attn_device.py (chained,
data-dependent fori iterations).

Usage: python tools/flash_sweep_device.py [--s 2048] [--gqa]
"""

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.kernels.prefill_attention import flash_prefill_attention

N = 64


def chained(f, q, k, v):
    def body(i, carry):
        q, acc = carry
        o = f(q, k, v)
        return (q + 1e-6 * o.astype(q.dtype),
                acc + jnp.sum(o.astype(jnp.float32)))

    _, acc = jax.lax.fori_loop(0, N, body, (q, 0.0))
    return acc


def timeit(f, q, k, v):
    g = jax.jit(partial(chained, f))
    float(g(q, k, v))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(q, k, v))
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--gqa", action="store_true",
                    help="llama-3-8b GQA dims (nkv=8) instead of MHA")
    args = ap.parse_args()
    B, S, nh, hd = 1, args.s, 32, 128
    nkv = 8 if args.gqa else 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, nh, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, nkv, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, nkv, hd), jnp.bfloat16)
    sm = 1.0 / np.sqrt(hd)
    flops = 2 * 2 * B * nh * (S * S / 2) * hd

    results = []
    for bq in (128, 256, 512, 1024):
        for bk in (256, 512, 1024, 2048):
            if bq > S or bk > S:
                continue
            t = timeit(
                lambda q, k, v, bq=bq, bk=bk: flash_prefill_attention(
                    q, k, v, sm, blk_q=bq, blk_k=bk), q, k, v)
            results.append((t, bq, bk))
            print(f"blk_q={bq:5d} blk_k={bk:5d}  {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TFLOPs")
    t, bq, bk = min(results)
    print(f"BEST: blk_q={bq} blk_k={bk}  {t*1e3:.3f} ms  "
          f"{flops/t/1e12:.1f} TFLOPs")


if __name__ == "__main__":
    main()
