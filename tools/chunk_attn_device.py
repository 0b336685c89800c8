"""Device validation of chunk_attention_int4_v4: Mosaic compile + parity
vs interpret mode + timing vs the decode kernel at llama-7b dims.

Queued from the round-2 tunnel outage (STATUS.md pending list); interpret
parity is already proven in tests/test_kv_kernel.py — this checks the
real Mosaic lowering compiles and agrees, then traces a chunked-prefill
shape (Sq=256 over ctx 4096).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.kernels.kv_cache import (
    chunk_attention_int4_v4,
    decode_attention_int4_v4,
    pack_kv_transposed,
)
from flatquant_tpu.utils.benchmark import device_compare


def main():
    assert jax.default_backend() == "tpu", "device check needs the chip"
    rng = np.random.default_rng(0)

    # --- parity: compiled vs interpret at a small GQA shape ---
    B, S, nh, nkv, hd, sq, pos0 = 2, 256, 8, 2, 128, 16, 37
    kv = rng.standard_normal((B, S, nkv, hd)).astype(np.float32)
    vv = rng.standard_normal((B, S, nkv, hd)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, sq, nh, hd)), jnp.float32)
    kp, kpar = pack_kv_transposed(jnp.asarray(kv))
    vp, vpar = pack_kv_transposed(jnp.asarray(vv))
    pos = jnp.full((B,), pos0, jnp.int32)
    sm = 1.0 / np.sqrt(hd)

    got = chunk_attention_int4_v4(q, kp, kpar, vp, vpar, pos, sm,
                                  block_s=128)
    want = chunk_attention_int4_v4(q, kp, kpar, vp, vpar, pos, sm,
                                   block_s=128, interpret=True)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"compiled-vs-interpret max abs err: {err:.2e}")
    assert err < 2e-5, err

    # --- timing at llama-2-7b dims, ctx 4096, chunk 256 ---
    B, S, nh, nkv, hd = 1, 4096, 32, 32, 128
    sq = 256
    kv = rng.standard_normal((B, S, nkv, hd)).astype(np.float32)
    vv = rng.standard_normal((B, S, nkv, hd)).astype(np.float32)
    kp, kpar = pack_kv_transposed(jnp.asarray(kv))
    vp, vpar = pack_kv_transposed(jnp.asarray(vv))
    qc = jnp.asarray(rng.standard_normal((B, sq, nh, hd)), jnp.bfloat16)
    q1 = jnp.asarray(rng.standard_normal((B, 1, nh, hd)), jnp.bfloat16)
    posc = jnp.full((B,), 2048, jnp.int32)
    vl = jnp.full((B,), 2304, jnp.int32)
    sm = 1.0 / np.sqrt(hd)

    res = device_compare({
        "chunk256_ctx4096": (
            lambda q, kp, kpar, vp, vpar: chunk_attention_int4_v4(
                q, kp, kpar, vp, vpar, posc, sm),
            (qc, kp, kpar, vp, vpar)),
        "decode1_ctx4096": (
            lambda q, kp, kpar, vp, vpar: decode_attention_int4_v4(
                q[:, 0], kp, kpar, vp, vpar, vl, sm),
            (q1, kp, kpar, vp, vpar)),
    })
    print(json.dumps(res, indent=1))
    us = res["chunk256_ctx4096"] * 1e6  # device_compare reports seconds
    # bandwidth: cache bytes touched (packed K+V + params) per chunk pass
    cache_bytes = 2 * (B * nkv * (hd // 2) * S + B * nkv * 2 * S * 4)
    print(f"chunk kernel: {us:.1f} us, cache traffic {cache_bytes/1e6:.1f} MB "
          f"-> {cache_bytes/us*1e6/1e9:.0f} GB/s effective")


if __name__ == "__main__":
    main()
