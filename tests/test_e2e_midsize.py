"""End-to-end calibration quality on a mid-size outlier model (slow)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.calib.data import get_loaders
from flatquant_tpu.calib.trainer import calibrate
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq


@pytest.mark.slow
def test_calibration_halves_kl_on_outlier_model():
    cfg = LlamaConfig(name="mid", vocab_size=512, hidden_size=256,
                      intermediate_size=704, num_layers=4, num_heads=8,
                      num_kv_heads=4, head_dim=32, seqlen=64)
    rng = np.random.default_rng(0)
    params = init_params(cfg, seed=0)
    ch = rng.choice(cfg.hidden_size, 8, replace=False)
    emb = np.array(params["embed"]); emb[:, ch] *= 25.0
    params["embed"] = jnp.asarray(emb)
    for k in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        w = np.array(params["layers"][k])
        mask = rng.random(w.shape) < 0.001
        params["layers"][k] = jnp.asarray(w + mask * rng.standard_normal(w.shape) * 0.5)

    data = get_loaders("synthetic", cfg.vocab_size, nsamples=32, seqlen=64,
                       seed=0, n_test_tokens=16 * 64)
    toks = jnp.asarray(data.test[:, : 4 * 64].reshape(4, 64))
    fp_logits = llama_forward(cfg, params, toks, compute_dtype=jnp.float32)

    def kl_vs_fp(fq_cfg, fq):
        bp, bfq = bake_model(cfg, fq_cfg, params, fq)
        bp = rtn_quantize_params(fq_cfg, bp)
        lq = llama_forward(cfg, bp, toks, fq=bfq, fq_cfg=fq_cfg, mode="eval",
                           compute_dtype=jnp.float32)
        p = jax.nn.log_softmax(fp_logits, -1)
        q = jax.nn.log_softmax(lq, -1)
        return float(jnp.mean(jnp.sum(jnp.exp(p) * (p - q), -1)))

    fq_cfg = dataclasses.replace(W4A4KV4, epochs=10, cali_bsz=4, nsamples=32)
    fq0 = init_model_fq(cfg, fq_cfg, seed=0)
    kl0 = kl_vs_fp(fq_cfg, fq0)
    fq1 = calibrate(cfg, fq_cfg, params, fq0, data.train,
                    compute_dtype=jnp.float32, log=lambda s: None)
    kl1 = kl_vs_fp(fq_cfg, fq1)
    print(f"KL untrained={kl0:.5f} calibrated={kl1:.5f}")
    assert kl1 < kl0 * 0.7, (kl0, kl1)
