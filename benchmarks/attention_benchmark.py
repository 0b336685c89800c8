"""Int4 paged KV decode attention vs bf16 decode attention.

qattention_benchmark.py analog: per-step decode attention cost across
context lengths with int4-packed vs bf16 caches.
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

from flatquant_tpu.kernels.kv_cache import decode_attention_int4_v4, pack_kv_transposed
from flatquant_tpu.utils.benchmark import device_compare


def bf16_decode_attn(q, k, v, valid, sm_scale):
    B, nkv, S, hd = k.shape
    nh = q.shape[1]
    n_rep = nh // nkv
    kk = jnp.repeat(k, n_rep, axis=1) if n_rep > 1 else k
    vv = jnp.repeat(v, n_rep, axis=1) if n_rep > 1 else v
    s = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kk.astype(jnp.float32)) * sm_scale
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
    s = jnp.where(ids < valid.reshape(-1, 1, 1), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, vv.astype(jnp.float32)).astype(q.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[4])
    p.add_argument("--contexts", type=int, nargs="+", default=[2048, 8192])
    p.add_argument("--sweep", action="store_true",
                   help="full B in {1,4,8} x S in {2k,4k,8k} grid (VERDICT "
                        "r2 #5: hold the decode kernel to the DMA floor "
                        "across shapes, not a single point)")
    args = p.parse_args()
    if args.sweep:
        args.batches = [1, 4, 8]
        args.contexts = [2048, 4096, 8192]
    rng = np.random.default_rng(0)
    nkv, nh, hd = 8, 32, 128  # llama-3-8b attention
    for S in args.contexts:
      for B in args.batches:
          k_sf = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
          v_sf = jnp.asarray(rng.standard_normal((B, S, nkv, hd)), jnp.float32)
          kp, kparam = pack_kv_transposed(k_sf)  # v4 lane-full layout
          vp, vparam = pack_kv_transposed(v_sf)
          q = jax.device_put(jnp.asarray(rng.standard_normal((B, nh, hd)), jnp.bfloat16))
          valid = jax.device_put(jnp.full((B,), S, jnp.int32))
          kb = jax.device_put(jnp.swapaxes(k_sf, 1, 2).astype(jnp.bfloat16))
          vb = jax.device_put(jnp.swapaxes(v_sf, 1, 2).astype(jnp.bfloat16))
          kp, kparam, vp, vparam = map(jax.device_put, (kp, kparam, vp, vparam))
          sm = 1.0 / np.sqrt(hd)

          def int4_attn_case(q, kp, kparam, vp, vparam, valid):
              return decode_attention_int4_v4(q, kp, kparam, vp, vparam, valid, sm)

          def bf16_attn_case(q, kb, vb, valid):
              return bf16_decode_attn(q, kb, vb, valid, sm)

          times = device_compare(
              {
                  "int4_attn_case": (int4_attn_case, (q, kp, kparam, vp, vparam, valid)),
                  "bf16_attn_case": (bf16_attn_case, (q, kb, vb, valid)),
              },
              iters=10,
          )
          times = {"int4": times["int4_attn_case"], "bf16": times["bf16_attn_case"]}
          int4_bytes = kp.nbytes + vp.nbytes + kparam.nbytes + vparam.nbytes
          bf16_bytes = kb.nbytes + vb.nbytes
          print(json.dumps({
              "context": S,
              "batch": B,
              "int4_us": round(times["int4"] * 1e6, 1),
              "bf16_us": round(times["bf16"] * 1e6, 1),
              "speedup": round(times["bf16"] / times["int4"], 3),
              "int4_stream_gbs": round(int4_bytes / times["int4"] / 1e9, 1),
              "bf16_stream_gbs": round(bf16_bytes / times["bf16"] / 1e9, 1),
          }))


if __name__ == "__main__":
    main()
