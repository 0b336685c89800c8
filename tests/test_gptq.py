"""GPTQ tests: error-feedback beats RTN on correlated inputs; e2e driver."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.calib.data import get_loaders
from flatquant_tpu.calib.gptq import gptq_model, gptq_quantize_weight
from flatquant_tpu.core.quant import WeightQuantCfg, weight_fake_quant, weight_find_params
from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq


def _recon_err(x, w, wq):
    return float(jnp.mean((x @ wq.T - x @ w.T) ** 2))


@pytest.mark.parametrize("sym", [True, False])
def test_gptq_beats_rtn_on_correlated_inputs(rng, sym):
    n, out, N = 64, 32, 512
    # strongly correlated inputs (low-rank + noise): where error feedback wins
    basis = rng.standard_normal((8, n))
    x = rng.standard_normal((N, 8)) @ basis + 0.1 * rng.standard_normal((N, n))
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(rng.standard_normal((out, n)), jnp.float32)
    hess = 2.0 * x.T @ x

    cfg = WeightQuantCfg(bits=4, sym=sym)
    scale, zero = weight_find_params(w, cfg)
    w_rtn = weight_fake_quant(w, scale, zero, cfg)
    w_gptq = gptq_quantize_weight(w, hess, cfg)

    e_rtn = _recon_err(x, w, w_rtn)
    e_gptq = _recon_err(x, w, w_gptq)
    print(f"sym={sym} rtn={e_rtn:.5f} gptq={e_gptq:.5f}")
    assert e_gptq < e_rtn * 0.9


def test_gptq_grouped(rng):
    n, out, N = 128, 16, 256
    x = jnp.asarray(rng.standard_normal((N, n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((out, n)), jnp.float32)
    hess = 2.0 * x.T @ x
    cfg = WeightQuantCfg(bits=4, sym=True, group_size=32)
    wq = gptq_quantize_weight(w, hess, cfg)
    assert wq.shape == w.shape and bool(jnp.isfinite(wq).all())
    # quantized values respect the 4-bit grid per group (err bounded)
    assert _recon_err(x, w, wq) < _recon_err(x, w, jnp.zeros_like(w))


def test_gptq_act_order_with_groups(rng):
    """act_order + group_size combo (untested in the reference too): group
    scales are recomputed on the permuted column order, blocked and
    per-column schedules agree, and error feedback still beats RTN."""
    n, out, N = 256, 16, 512
    basis = rng.standard_normal((16, n)) * np.linspace(0.2, 4.0, n)
    x = rng.standard_normal((N, 16)) @ basis + 0.1 * rng.standard_normal((N, n))
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(rng.standard_normal((out, n)), jnp.float32)
    hess = 2.0 * x.T @ x
    cfg = WeightQuantCfg(bits=4, sym=True, group_size=32)

    wq_blk = gptq_quantize_weight(w, hess, cfg, act_order=True, block_size=128)
    wq_col = gptq_quantize_weight(w, hess, cfg, act_order=True, block_size=1)
    assert bool(jnp.isfinite(wq_blk).all())
    np.testing.assert_allclose(np.asarray(wq_blk), np.asarray(wq_col),
                               atol=1e-4, rtol=1e-4)

    scale, zero = weight_find_params(w, cfg)
    w_rtn = weight_fake_quant(w, scale, zero, cfg)
    assert _recon_err(x, w, wq_blk) < _recon_err(x, w, w_rtn)


def test_gptq_act_order(rng):
    n, out, N = 32, 8, 128
    x = jnp.asarray(rng.standard_normal((N, n)) * jnp.linspace(0.1, 5.0, n), jnp.float32)
    w = jnp.asarray(rng.standard_normal((out, n)), jnp.float32)
    hess = 2.0 * x.T @ x
    cfg = WeightQuantCfg(bits=4, sym=True)
    wq = gptq_quantize_weight(w, hess, cfg, act_order=True)
    assert bool(jnp.isfinite(wq).all())
    assert _recon_err(x, w, wq) < _recon_err(x, w, jnp.zeros_like(w))


def test_gptq_model_end_to_end():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq_cfg = dataclasses.replace(W4A4KV4, gptq=True)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    data = get_loaders("synthetic", cfg.vocab_size, nsamples=8, seqlen=32)

    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    gptq_params = gptq_model(
        cfg, fq_cfg, baked_params, baked_fq, data.train, log=lambda s: None
    )
    toks = jnp.asarray(data.train[:2])
    logits = llama_forward(
        cfg, gptq_params, toks, fq=baked_fq, fq_cfg=fq_cfg, mode="eval",
        compute_dtype=jnp.float32,
    )
    assert bool(jnp.isfinite(logits).all())
    # weights actually changed from the baked fp values
    assert float(jnp.abs(gptq_params["layers"]["wq"] - baked_params["layers"]["wq"]).max()) > 0


def test_serving_export_threads_gptq_weights(rng):
    """--quantized_save with --gptq must pack the GPTQ error-feedback codes,
    not re-RTN the baked weights (ADVICE r1 medium). The packed export must
    reconstruct eval_params' weights exactly (they lie on the scale grid)."""
    from flatquant_tpu.kernels.int4_matmul import unpack_weight_planar
    from flatquant_tpu.quantize.state import slice_layer
    from flatquant_tpu.serving.quantized import build_serving_params

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    data = get_loaders("synthetic", cfg.vocab_size, nsamples=4, seqlen=32)
    eval_params = gptq_model(cfg, fq_cfg, baked_params, baked_fq, data.train,
                             log=lambda *a: None)

    sp = build_serving_params(cfg, fq_cfg, baked_params, baked_fq,
                              eval_params=eval_params)
    sp_rtn = build_serving_params(cfg, fq_cfg, baked_params, baked_fq)

    any_diff = False
    for li in range(cfg.num_layers):
        elp = slice_layer(eval_params["layers"], li)
        for name, key in (("q", "wq"), ("down", "wdown")):
            lin = jax.tree.map(lambda t: t[li], sp["layers"][name])
            w_rec = unpack_weight_planar(lin["wp"]).astype(jnp.float32) \
                * lin["scale"][:, None]
            np.testing.assert_allclose(
                np.asarray(w_rec), np.asarray(elp[key], np.float32),
                atol=1e-5, rtol=0,
            )
            rtn_wp = sp_rtn["layers"][name]["wp"][li]
            any_diff |= bool(jnp.any(lin["wp"] != rtn_wp))
    assert any_diff, "GPTQ codes never differed from RTN — threading is dead"


@pytest.mark.parametrize("gs,sym", [(-1, True), (64, True), (128, False)])
def test_gptq_blocked_matches_percolumn(rng, gs, sym):
    """128-column lazy-batch schedule == per-column full-width feedback.

    Identical math re-associated: the cross-block update sums B rank-1
    terms in one matmul, so agreement is to f32 summation order (~1e-5),
    exact when no grouping re-derives scales mid-stream."""
    from flatquant_tpu.calib.gptq import gptq_quantize_weight
    from flatquant_tpu.core.quant import WeightQuantCfg

    w = jnp.asarray(rng.standard_normal((96, 256)) * 0.05, jnp.float32)
    x = rng.standard_normal((512, 256)).astype(np.float32)
    h = jnp.asarray(2.0 * x.T @ x)
    cfg = WeightQuantCfg(bits=4, sym=sym, group_size=gs)
    qb = gptq_quantize_weight(w, h, cfg, block_size=128)
    qc = gptq_quantize_weight(w, h, cfg, block_size=1)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qc),
                               atol=2e-6, rtol=0)
