"""End-to-end calibration tests on a tiny outlier-heavy model (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.calib.data import get_loaders, synthetic_stream
from flatquant_tpu.calib.trainer import build_labels, calibrate, make_optimizer
from flatquant_tpu.evals.ppl import ppl_eval
from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq, slice_layer


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    # inject channel outliers so quantization actually hurts and transforms
    # have something to fix
    scale = np.ones(cfg.hidden_size, np.float32)
    scale[:4] = 12.0
    params["embed"] = params["embed"] * scale
    data = get_loaders("synthetic", cfg.vocab_size, nsamples=16, seqlen=64, seed=0,
                       n_test_tokens=8 * 64)
    return cfg, params, data


def _quant_ppl(cfg, params, fq_cfg, fq, test):
    bp, bfq = bake_model(cfg, fq_cfg, params, fq)
    bp = rtn_quantize_params(fq_cfg, bp)
    return ppl_eval(cfg, bp, test, fq=bfq, fq_cfg=fq_cfg, mode="eval",
                    seqlen=64, compute_dtype=jnp.float32)


def test_data_loaders_synthetic():
    cfg = get_config("tiny-llama")
    d = get_loaders("synthetic", cfg.vocab_size, nsamples=4, seqlen=32)
    assert d.train.shape == (4, 32) and d.source == "synthetic"
    assert d.test.ndim == 2 and d.test.min() >= 0 and d.test.max() < cfg.vocab_size
    # deterministic
    d2 = get_loaders("synthetic", cfg.vocab_size, nsamples=4, seqlen=32)
    np.testing.assert_array_equal(d.train, d2.train)


def test_data_loaders_local_file(tmp_path):
    """Local-corpus path (zero-egress substitute for the HF hub loaders):
    a pre-downloaded text/jsonl file drives the same tokenize -> crop ->
    eval-stream pipeline, 90/10 train/test split on the token stream."""
    import json

    class _Tok:  # char-level toy tokenizer with the HF call contract
        def __call__(self, s):
            import types

            return types.SimpleNamespace(
                input_ids=[ord(c) % 256 for c in s])

    cfg = get_config("tiny-llama")
    txt = tmp_path / "corpus.txt"
    txt.write_text("hello flat quant world " * 200)
    d = get_loaders(str(txt), cfg.vocab_size, nsamples=4, seqlen=32,
                    tokenizer=_Tok())
    assert d.train.shape == (4, 32) and d.source == "corpus.txt"
    assert d.test.ndim == 2 and d.test.shape[1] > 0

    jl = tmp_path / "corpus.jsonl"
    jl.write_text("\n".join(json.dumps({"text": "sample %d ok" % i * 40})
                            for i in range(60)))
    d2 = get_loaders(str(jl), cfg.vocab_size, nsamples=2, seqlen=16,
                     tokenizer=_Tok())
    assert d2.train.shape == (2, 16) and d2.source == "corpus.jsonl"
    # train crops come from the first 90%, eval stream from the tail —
    # deterministic under the same seed
    d3 = get_loaders(str(jl), cfg.vocab_size, nsamples=2, seqlen=16,
                     tokenizer=_Tok())
    np.testing.assert_array_equal(d2.train, d3.train)
    np.testing.assert_array_equal(d2.test, d3.test)


def test_optimizer_groups():
    cfg = get_config("tiny-llama")
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    layer0 = slice_layer(fq, 0)
    labels = build_labels(layer0)
    # label structure mirrors param structure
    jax.tree.map(lambda p, l: None, layer0, labels)
    tx = make_optimizer(W4A4KV4, labels, total_steps=10)
    state = tx.init(layer0)
    grads = jax.tree.map(jnp.ones_like, layer0)
    updates, _ = tx.update(grads, state, layer0)
    # transforms and clips all get non-zero updates
    assert float(jnp.abs(updates.attn.ln_trans.left.u).max()) > 0
    assert float(jnp.abs(updates.attn.q_lin.clip_w_max).max()) > 0


def test_frozen_groups_unchanged():
    cfg = get_config("tiny-llama")
    fq_cfg = dataclasses.replace(W4A4KV4, cali_trans=False, add_diag=False)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    layer0 = slice_layer(fq, 0)
    labels = build_labels(layer0)
    tx = make_optimizer(fq_cfg, labels, total_steps=10)
    state = tx.init(layer0)
    grads = jax.tree.map(jnp.ones_like, layer0)
    updates, _ = tx.update(grads, state, layer0)
    assert float(jnp.abs(updates.attn.ln_trans.left.u).max()) == 0.0
    assert float(jnp.abs(updates.attn.q_lin.clip_w_max).max()) > 0


def test_calibration_improves_fidelity(setup):
    """Calibration must reduce quant-vs-fp logit error (its real objective;
    PPL on a random tiny model is degenerate ~uniform, so logit fidelity is
    the meaningful metric here) and per-layer MSE must trend down."""
    from flatquant_tpu.models.llama import llama_forward

    cfg, params, data = setup
    fq_cfg = dataclasses.replace(W4A4KV4, epochs=6, cali_bsz=4, nsamples=16)
    fq0 = init_model_fq(cfg, fq_cfg, seed=0)
    toks = jnp.asarray(data.test[:, : 2 * 64].reshape(2, 64))
    logits_fp = llama_forward(cfg, params, toks, compute_dtype=jnp.float32)

    def fidelity(fq):
        bp, bfq = bake_model(cfg, fq_cfg, params, fq)
        bp = rtn_quantize_params(fq_cfg, bp)
        lq = llama_forward(
            cfg, bp, toks, fq=bfq, fq_cfg=fq_cfg, mode="eval", compute_dtype=jnp.float32
        )
        return float(jnp.mean((lq - logits_fp) ** 2))

    err_before = fidelity(fq0)
    logs = []
    fq1 = calibrate(
        cfg, fq_cfg, params, fq0, data.train,
        compute_dtype=jnp.float32,
        log=logs.append,
    )
    err_after = fidelity(fq1)

    print(f"logit MSE before={err_before:.6f} after={err_after:.6f}")
    assert err_after < err_before * 0.9

    # per-layer training MSE decreased from first to last epoch
    import re

    mses = {}
    for line in logs:
        m = re.match(r"layer (\d+) epoch (\d+) mse ([\d.]+)", line)
        if m:
            mses.setdefault(int(m.group(1)), []).append(float(m.group(3)))
    for layer, hist in mses.items():
        assert hist[-1] < hist[0], f"layer {layer} mse did not improve: {hist}"

    # transforms actually moved
    l0_before = slice_layer(fq0, 0)
    l0_after = slice_layer(fq1, 0)
    delta = float(jnp.abs(l0_after.attn.ln_trans.left.u - l0_before.attn.ln_trans.left.u).max())
    assert delta > 1e-6

    # quantized PPL stays sane after calibration
    ppl_after = _quant_ppl(cfg, params, fq_cfg, fq1, data.test)
    assert np.isfinite(ppl_after)
