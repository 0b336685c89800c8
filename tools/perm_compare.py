"""Device-trace comparison: standard vs perm (one-copy) transform layouts.

Measures, at prefill shapes on the real chip:
  1. the online Kronecker transform alone (llama-2-7b hidden 4096 = 64x64
     and inter 11008 = 86x128)
  2. the full serving glue chain: transform -> per-token quant -> int8-MXU
     GEMM (what serving_layer actually runs)
  3. the per-head o-transform (einsum vs transposed-matmul form)

Run when deciding whether bench.py / serving defaults adopt
perm_transforms (see serving/quantized.py kron_transform_perm).
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

from flatquant_tpu.core.orth import random_orthogonal
from flatquant_tpu.kernels.int4_matmul import pack_weight_planar
from flatquant_tpu.serving.quantized import (
    _perm_in_channels,
    _quant_linear,
    kron_transform,
    kron_transform_perm,
)
from flatquant_tpu.utils.benchmark import device_compare


def main():
    assert jax.default_backend() == "tpu", "device tracing needs the chip"
    rng = np.random.default_rng(0)
    T = 2048
    cases = {}

    shapes = {"4096=64x64": (64, 64, 4096), "11008=86x128": (86, 128, 4096)}
    for tag, (ln, rn, n_out) in shapes.items():
        d = ln * rn
        x = jnp.asarray(rng.standard_normal((T, d)), jnp.bfloat16)
        left = jnp.asarray(random_orthogonal(ln, rng), jnp.bfloat16)
        right = jnp.asarray(random_orthogonal(rn, rng), jnp.bfloat16)
        w = rng.integers(-8, 8, (n_out, d)).astype(np.int8)
        lin = {"wp": jnp.asarray(pack_weight_planar(jnp.asarray(w))),
               "scale": jnp.ones((n_out,), jnp.float32)}
        lin_p = {"wp": jnp.asarray(pack_weight_planar(
                    _perm_in_channels(jnp.asarray(w), ln, rn))),
                 "scale": jnp.ones((n_out,), jnp.float32)}

        cases[f"kron_std_{tag}"] = (
            lambda x, l, r: kron_transform(x, (l, r)), (x, left, right))
        cases[f"kron_perm_{tag}"] = (
            lambda x, l, r: kron_transform_perm(x, (l, r)), (x, left, right))
        cases[f"chain_std_{tag}"] = (
            lambda x, l, r, lin=lin: _quant_linear(
                kron_transform(x, (l, r)), lin, True), (x, left, right))
        cases[f"chain_perm_{tag}"] = (
            lambda x, l, r, lin=lin_p: _quant_linear(
                kron_transform_perm(x, (l, r)), lin, True), (x, left, right))

    # per-head o transform at [T, 32 heads, 128]
    nh, hd = 32, 128
    attn = jnp.asarray(rng.standard_normal((1, T, nh, hd)), jnp.bfloat16)
    o_mat = jnp.asarray(random_orthogonal(nh, rng), jnp.bfloat16)

    def o_std(a, m):
        y = jnp.einsum("ji,btjd->btid", m, a)
        return y.reshape(1, T, nh * hd)

    def o_perm(a, m):
        y = jnp.matmul(a.reshape(1, T, 1, nh, hd).swapaxes(-2, -1), m)
        return y.reshape(1, T, nh * hd)

    cases["o_std"] = (o_std, (attn, o_mat))
    cases["o_perm"] = (o_perm, (attn, o_mat))

    res = device_compare(cases, iters=20)
    out = {k: round(v * 1e6, 1) for k, v in res.items()}
    print(json.dumps(out, indent=1))
    for base in ["kron", "chain"]:
        for tag in shapes:
            a, b = out[f"{base}_std_{tag}"], out[f"{base}_perm_{tag}"]
            print(f"{base} {tag}: std {a} us, perm {b} us -> {a/b:.3f}x")
    print(f"o: std {out['o_std']} us, perm {out['o_perm']} us -> "
          f"{out['o_std']/out['o_perm']:.3f}x")


if __name__ == "__main__":
    main()
