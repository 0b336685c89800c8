"""On-device validation + timing for the paged int4 KV decode kernel.

Checks that Mosaic accepts the clamped scalar-prefetch index maps
(kernels/paged_kv.py) and that compiled results match the XLA oracle,
then times paged decode vs the monolithic v4 slot kernel at llama-2-7b
decode dims across context lengths — quantifying the paging overhead the
block-table design pays for its memory proportionality.

Usage: python tools/paged_kv_device.py [--bs 512] [--ctx 4096] [--batch 1]
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.kernels.kv_cache import (
    decode_attention_int4_v4,
    pack_kv_transposed,
)
from flatquant_tpu.kernels.paged_kv import (
    init_paged_pool,
    paged_decode_attention_int4,
    paged_decode_attention_ref,
    write_prompt_paged,
)

N = 256


def chained(f, q, *args):
    def body(i, carry):
        q, acc = carry
        o = f(q, *args)
        return (q + 1e-6 * o.astype(q.dtype),
                acc + jnp.sum(o.astype(jnp.float32)))

    _, acc = jax.lax.fori_loop(0, N, body, (q, 0.0))
    return acc


def timeit(f, q, *args):
    g = jax.jit(partial(chained, f))
    float(g(q, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(q, *args))
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=512, help="pool block size")
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    B, nh, nkv, hd = args.batch, 32, 32, 128
    S = args.ctx
    bs = args.bs
    mb = S // bs
    n_blocks = 1 + B * mb

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, nh, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, nkv, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, nkv, hd)).astype(np.float32))
    kc, kpar = pack_kv_transposed(k)
    vc, vpar = pack_kv_transposed(v)

    pool = init_paged_pool(1, n_blocks, nkv, hd, bs)
    # shuffled (non-contiguous) table to exercise real gathers
    perm = rng.permutation(np.arange(1, n_blocks)).reshape(B, mb)
    tbl = jnp.asarray(perm.astype(np.int32))
    kp, kparam = write_prompt_paged(pool["kp"][0], pool["kparam"][0], kc,
                                    kpar, tbl)
    vp, vparam = write_prompt_paged(pool["vp"][0], pool["vparam"][0], vc,
                                    vpar, tbl)
    valid = jnp.full((B,), S - 3, jnp.int32)
    sm = 1.0 / np.sqrt(hd)

    want = paged_decode_attention_ref(q, kp, kparam, vp, vparam, tbl, valid,
                                      sm)
    got = paged_decode_attention_int4(q, kp, kparam, vp, vparam, tbl, valid,
                                      sm)
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                              want.astype(jnp.float32))))
    print(f"compiled paged kernel vs XLA oracle: max|d| = {d:.3e}")
    if d > 3e-4:
        print("FAIL: paged kernel deviates from oracle")
        sys.exit(1)

    t_paged = timeit(lambda q: paged_decode_attention_int4(
        q, kp, kparam, vp, vparam, tbl, valid, sm), q)
    t_slot = timeit(lambda q: decode_attention_int4_v4(
        q, kc, kpar, vc, vpar, valid, sm), q)
    # half-valid run shows the clamped-tail DMA elision win
    valid_half = jnp.full((B,), S // 2, jnp.int32)
    t_paged_half = timeit(lambda q: paged_decode_attention_int4(
        q, kp, kparam, vp, vparam, tbl, valid_half, sm), q)
    t_slot_half = timeit(lambda q: decode_attention_int4_v4(
        q, kc, kpar, vc, vpar, valid_half, sm), q)
    print(f"B={B} ctx={S} bs={bs}: paged {t_paged*1e6:7.1f} us  "
          f"slot-v4 {t_slot*1e6:7.1f} us  (ratio {t_paged/t_slot:.2f})")
    print(f"  half-valid: paged {t_paged_half*1e6:7.1f} us  "
          f"slot-v4 {t_slot_half*1e6:7.1f} us  "
          f"(paged reads only allocated blocks)")
    print("PASS")


if __name__ == "__main__":
    main()
