"""Device timing for the flash prefill attention kernel (bf16-MXU path).

Compares the Pallas kernel against the dense-XLA attention at llama-2-7b
dims, S=2048. Measurement: N chained, data-dependent iterations inside one
jitted fori_loop, forced with float() — block_until_ready is not a reliable
fence through the axon tunnel (see bench.py notes).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.kernels.prefill_attention import (
    dense_causal_attention,
    flash_prefill_attention,
)

N = 64


def chained(f, q, k, v):
    def body(i, carry):
        q, acc = carry
        o = f(q, k, v)
        # data dependence: next q perturbed by this output
        return q + 1e-6 * o.astype(q.dtype), acc + jnp.sum(o.astype(jnp.float32))

    _, acc = jax.lax.fori_loop(0, N, body, (q, 0.0))
    return acc


def timeit(f, q, k, v):
    g = jax.jit(partial(chained, f))
    float(g(q, k, v))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(q, k, v))
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def main():
    B, S, nh, nkv, hd = 1, 2048, 32, 32, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, nh, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, nkv, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, nkv, hd), jnp.bfloat16)
    sm = 1.0 / np.sqrt(hd)

    t_flash = timeit(lambda q, k, v: flash_prefill_attention(q, k, v, sm),
                     q, k, v)
    t_dense = timeit(lambda q, k, v: dense_causal_attention(q, k, v, sm),
                     q, k, v)
    o_flash = flash_prefill_attention(q, k, v, sm)
    o_dense = dense_causal_attention(q, k, v, sm)
    d = float(jnp.max(jnp.abs(o_flash.astype(jnp.float32)
                              - o_dense.astype(jnp.float32))))
    # causal-half FLOPs: 2 matmuls * B*nh*S^2/2*hd*2
    flops = 2 * 2 * B * nh * (S * S / 2) * hd
    print(f"flash : {t_flash*1e3:8.3f} ms  {flops/t_flash/1e12:6.1f} TFLOPs")
    print(f"dense : {t_dense*1e3:8.3f} ms")
    print(f"max|d|: {d:.4f}  speedup {t_dense/t_flash:.2f}x")
    if d > 3e-2:  # ~2 bf16 ulps at unit scale; regressions exit nonzero
        print(f"FAIL: flash vs dense max|d| {d:.4f} > 3e-2")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
