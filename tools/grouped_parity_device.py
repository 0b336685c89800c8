"""On-device check of the grouped MLP pipeline: serving prefill logits with
the grouped path active vs the composed (standard-layout) path, plus the
decode-consistency sanity that decode (which never takes the grouped
branch) continues from a grouped prefill's cache.

The grouped path reorders no math — same GEMM integers, same quant scale
rule, same bf16 casts at the same points — but the quantizer can round a
tie differently after the (identical-order) bf16 matmuls, so logits are
compared with a small tolerance and the argmax must agree.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving import quantized as sq
from flatquant_tpu.serving.engine import (
    init_cache,
    serving_prefill,
    unstack_cache,
    unstack_serving_layers,
)
from flatquant_tpu.serving.quantized import build_serving_params


def main():
    assert jax.default_backend() == "tpu"
    cfg = dataclasses.replace(
        get_config("llama-2-7b"), name="bench", num_layers=2, vocab_size=2048
    )
    fq_cfg = W4A4KV4
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, seed=0)
        fq = init_model_fq(cfg, fq_cfg, seed=0)
        baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
        sp_host = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                                       merge_projections=True)
    sp = jax.device_put(unstack_serving_layers(sp_host), jax.devices()[0])

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 2048)), jnp.int32)
    cache = unstack_cache(init_cache(cfg, 1, 2048))

    fwd = lambda: jax.jit(
        lambda sp, toks: serving_prefill.__wrapped__(
            cfg, fq_cfg, sp, toks, cache, True, 2048, jnp.bfloat16)[0])

    logits_g = np.asarray(fwd()(sp, toks), np.float32)

    # force the composed path by disabling the grouped branch BEFORE
    # tracing a fresh jit (both sides must be jitted: eager-vs-jit
    # lowering differences alone flip quant ties on random weights)
    from flatquant_tpu.serving import engine
    orig = sq._quant_mlp_grouped
    none_fn = lambda *a, **k: None
    sq._quant_mlp_grouped = none_fn
    engine._quant_mlp_grouped = none_fn
    try:
        logits_c = np.asarray(fwd()(sp, toks), np.float32)
    finally:
        sq._quant_mlp_grouped = orig
        engine._quant_mlp_grouped = orig

    diff = np.abs(logits_g - logits_c)
    rel = diff.max() / (np.abs(logits_c).max() + 1e-9)
    agree = (logits_g.argmax(-1) == logits_c.argmax(-1)).mean()
    print(f"max|dlogit|={diff.max():.4f} rel={rel:.4f} argmax agree={agree:.3f}")
    # the grouped MLP tail itself is BIT-identical to the composed tail on
    # TPU (isolated check: max|d| == 0.0 exactly); residual differences
    # here come from XLA fusing the surrounding ops differently in the two
    # programs, which flips occasional quant ties on uncalibrated random
    # weights (see STATUS.md numerical-determinism note)
    assert rel < 0.05 and agree == 1.0, (rel, agree)
    print("grouped == composed (jit-vs-jit), argmax exact")


if __name__ == "__main__":
    main()
