"""Model-level tests: fp forward, quantized forward, invariance, bake parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
from flatquant_tpu.quantize.spec import FQConfig, W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    return cfg, params, tokens


def test_fp_forward(tiny):
    cfg, params, tokens = tiny
    logits = llama_forward(cfg, params, tokens, compute_dtype=jnp.float32)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert jnp.isfinite(logits).all()


def test_fp_forward_qwen_bias_tied():
    cfg = get_config("tiny-qwen")
    params = init_params(cfg, seed=0)
    assert "lm_head" not in params and "bq" in params["layers"]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    logits = llama_forward(cfg, params, tokens, compute_dtype=jnp.float32)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert jnp.isfinite(logits).all()


def test_calib_forward_quantizes(tiny):
    cfg, params, tokens = tiny
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    logits_fp = llama_forward(cfg, params, tokens, compute_dtype=jnp.float32)
    logits_q = llama_forward(
        cfg, params, tokens, fq=fq, fq_cfg=W4A4KV4, mode="calib", compute_dtype=jnp.float32
    )
    assert jnp.isfinite(logits_q).all()
    # quantization must actually change the output
    assert float(jnp.max(jnp.abs(logits_q - logits_fp))) > 1e-4


def test_whole_model_transform_invariance(tiny):
    """With quantizers disabled, transforms must be exactly invisible."""
    cfg, params, tokens = tiny
    fq_cfg = dataclasses.replace(
        W4A4KV4, quant_enabled=False, lwc=False, lac=False, add_diag=True
    )
    fq = init_model_fq(cfg, fq_cfg, seed=3)
    # non-trivial diag scales to exercise the diag path
    fq = jax.tree.map(lambda a: a, fq)
    logits_fp = llama_forward(cfg, params, tokens, compute_dtype=jnp.float32)
    logits_t = llama_forward(
        cfg, params, tokens, fq=fq, fq_cfg=fq_cfg, mode="calib", compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(logits_t, logits_fp, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("separate_vtrans", [False, True])
def test_bake_eval_matches_calib(tiny, separate_vtrans):
    """reparameterize + RTN must reproduce the calib-mode forward exactly
    (fake-quant and baked paths share one scale/rounding definition)."""
    cfg, params, tokens = tiny
    fq_cfg = dataclasses.replace(W4A4KV4, separate_vtrans=separate_vtrans)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    logits_calib = llama_forward(
        cfg, params, tokens, fq=fq, fq_cfg=fq_cfg, mode="calib", compute_dtype=jnp.float32
    )
    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    baked_params = rtn_quantize_params(fq_cfg, baked_params)
    logits_eval = llama_forward(
        cfg,
        baked_params,
        tokens,
        fq=baked_fq,
        fq_cfg=fq_cfg,
        mode="eval",
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(logits_eval, logits_calib, rtol=5e-3, atol=5e-3)


def test_kv_only_quant(tiny):
    """w16a16kv4: only cache quant + k/v transforms; exercises the
    o_trans-None/vcache-present undo branch."""
    cfg, params, tokens = tiny
    fq_cfg = FQConfig(
        w_bits=16, a_bits=16, k_bits=4, v_bits=4, k_asym=True, v_asym=True
    )
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    logits = llama_forward(
        cfg, params, tokens, fq=fq, fq_cfg=fq_cfg, mode="calib", compute_dtype=jnp.float32
    )
    assert jnp.isfinite(logits).all()


def test_rope_llama31_scaling():
    from flatquant_tpu.models.llama import rope_tables

    cfg31 = get_config("llama-3.1-8b")
    cfg3 = get_config("llama-3-8b")
    pos = jnp.arange(64)
    cos31, sin31 = rope_tables(cfg31, pos)
    cos3, sin3 = rope_tables(cfg3, pos)
    assert cos31.shape == (64, 128)
    # scaling must change low-frequency components
    assert float(jnp.max(jnp.abs(cos31 - cos3))) > 1e-3


def test_per_kind_quantizer_switches(tiny):
    """set_weight_quantizer_state / set_act_quantizer_state must equal the
    explicit 16-bit configs (quant_utils.py:239-250 parity: disabling one
    quantizer kind leaves the other kind's error intact)."""
    import dataclasses as dc

    from flatquant_tpu.quantize.spec import (
        set_act_quantizer_state,
        set_quantizer_state,
        set_weight_quantizer_state,
    )

    cfg, params, tokens = tiny
    fq = init_model_fq(cfg, W4A4KV4, seed=0)

    def fwd(fc):
        return llama_forward(cfg, params, tokens, fq=fq, fq_cfg=fc,
                             mode="calib", compute_dtype=jnp.float32)

    w_only = fwd(set_act_quantizer_state(W4A4KV4, False))
    w_only_explicit = fwd(dc.replace(W4A4KV4, a_bits=16, q_bits=16,
                                     k_bits=16, v_bits=16))
    np.testing.assert_array_equal(w_only, w_only_explicit)

    a_only = fwd(set_weight_quantizer_state(W4A4KV4, False))
    a_only_explicit = fwd(dc.replace(W4A4KV4, w_bits=16))
    np.testing.assert_array_equal(a_only, a_only_explicit)

    # kinds differ from each other and from all-off
    off = fwd(set_quantizer_state(W4A4KV4, False))
    assert float(jnp.max(jnp.abs(w_only - a_only))) > 1e-5
    assert float(jnp.max(jnp.abs(w_only - off))) > 1e-5
    assert float(jnp.max(jnp.abs(a_only - off))) > 1e-5
