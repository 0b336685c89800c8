"""Deploy packed-checkpoint interop (VERDICT r4 item 10): the reference's
released real-quant checkpoints (safetensors in the deploy naming scheme,
modeling_llama.py:454-517, interleaved pack_i4 codes) must load into our
serving params. Offline proof: export our baked model in that exact
format, reload it, and require the serving stack to produce the same
results as the directly-built params."""

import numpy as np
import pytest

import jax.numpy as jnp

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.quantized import build_serving_params
from flatquant_tpu.utils.reference_convert import (
    _pack_i4_interleaved,
    _unpack_i4_interleaved,
    load_reference_packed,
    save_reference_packed,
)


def test_i4_interleave_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (6, 32)).astype(np.int8)
    np.testing.assert_array_equal(
        _unpack_i4_interleaved(_pack_i4_interleaved(q)), q)


@pytest.fixture(scope="module")
def baked():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    bp, bfq = bake_model(cfg, W4A4KV4, params, fq)
    return cfg, bp, bfq


def test_packed_checkpoint_roundtrip(tmp_path, baked):
    cfg, bp, bfq = baked
    path = str(tmp_path / "deploy_packed.safetensors")
    save_reference_packed(path, cfg, W4A4KV4, bp, bfq)

    direct = build_serving_params(cfg, W4A4KV4, bp, bfq, dtype=jnp.float32)
    loaded = load_reference_packed(path, cfg, W4A4KV4, dtype=jnp.float32)

    # packed codes and scales are EXACT (same quantization grid on both
    # sides of the format)
    for nm in ("q", "k", "v", "o", "up", "gate", "down"):
        np.testing.assert_array_equal(
            np.asarray(loaded["layers"][nm]["wp"]),
            np.asarray(direct["layers"][nm]["wp"]), err_msg=nm)
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][nm]["scale"]),
            np.asarray(direct["layers"][nm]["scale"]), rtol=0, atol=0)
        if "a_clip" in direct["layers"][nm]:
            for a, b in zip(loaded["layers"][nm]["a_clip"],
                            direct["layers"][nm]["a_clip"]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-6)

    # the checkpoint stores only forward cache-transform matrices; the
    # recomputed inverse must match the analytic one numerically
    np.testing.assert_allclose(np.asarray(loaded["layers"]["k_t_inv"]),
                               np.asarray(direct["layers"]["k_t_inv"]),
                               rtol=1e-4, atol=1e-4)

    # end-to-end: prefill + decode logits through the serving engine
    from flatquant_tpu.serving.engine import init_cache, serving_prefill

    toks = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 16)), jnp.int32)
    outs = []
    for sp in (direct, loaded):
        cache = init_cache(cfg, 2, 16, dtype=jnp.float32, mode="int4")
        l, _ = serving_prefill(cfg, W4A4KV4, sp, toks, cache,
                               use_kernel=False, max_len=16,
                               compute_dtype=jnp.float32)
        outs.append(np.asarray(l))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-4, atol=2e-4)
