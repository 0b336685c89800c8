"""Device-trace: XLA per-token quant chain vs the single-pass Pallas
quant_acts_i8 kernel, standalone and inside the serving glue chain
(kron transform -> quant -> int8-MXU GEMM) at prefill shapes.

Run after changing the quant path; adopts into serving via the
use_kernel branch in serving/quantized.py _quant_linear.
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
from flatquant_tpu.kernels.int4_matmul import (
    pack_weight_planar,
    quant_acts_i8,
    w4a4_matmul_i8,
)
from flatquant_tpu.serving.quantized import kron_transform
from flatquant_tpu.utils.benchmark import device_compare


def xla_quant(x, q_max=7):
    xf = x.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / q_max)
    xq = jnp.clip(jnp.round(xf / xs), -q_max - 1, q_max)
    return xq.astype(jnp.int8), xs


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    T = 2048
    cases = {}
    shapes = {"4096": (64, 64, 4096), "11008": (86, 128, 4096)}
    for tag, (ln, rn, n_out) in shapes.items():
        d = ln * rn
        x = jnp.asarray(rng.standard_normal((T, d)), jnp.bfloat16)
        left = jnp.asarray(random_orthogonal(ln, rng), jnp.bfloat16)
        right = jnp.asarray(random_orthogonal(rn, rng), jnp.bfloat16)
        w = rng.integers(-8, 8, (n_out, d)).astype(np.int8)
        wp = jnp.asarray(pack_weight_planar(jnp.asarray(w)))
        sw = jnp.ones((n_out,), jnp.float32)

        cases[f"quant_xla_{tag}"] = (lambda x: xla_quant(x)[0], (x,))
        cases[f"quant_pallas_{tag}"] = (lambda x: quant_acts_i8(x)[0], (x,))

        def chain(x, l, r, wp=wp, sw=sw, pallas=False):
            h = kron_transform(x, (l, r))
            h2 = h.reshape(-1, h.shape[-1])
            xq, xs = (quant_acts_i8(h2) if pallas else xla_quant(h2))
            return w4a4_matmul_i8(xq, xs, wp, sw)

        cases[f"chain_xla_{tag}"] = (
            lambda x, l, r, f=chain: f(x, l, r, pallas=False), (x, left, right))
        cases[f"chain_pallas_{tag}"] = (
            lambda x, l, r, f=chain: f(x, l, r, pallas=True), (x, left, right))

    res = device_compare(cases, iters=20)
    out = {k: round(v * 1e6, 1) for k, v in res.items()}
    print(json.dumps(out, indent=1))
    for base in ("quant", "chain"):
        for tag in shapes:
            a, b = out[f"{base}_xla_{tag}"], out[f"{base}_pallas_{tag}"]
            print(f"{base} {tag}: xla {a} us, pallas {b} us -> {a/b:.3f}x")


if __name__ == "__main__":
    main()
