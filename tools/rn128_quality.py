"""Calibration-quality check: balanced vs --tpu_decompose (rn128)
Kronecker decomposition, on the outlier-channel mid-size model from
tests/test_e2e_midsize.py (CPU, fully offline).

Recorded result (2026-08-18): calibrated KL-to-fp balanced=0.00082,
rn128=0.00076 — the TPU-native decomposition calibrates slightly BETTER
(it has more transform parameters: G^2 + 128^2 vs two balanced squares).
Decompositions exercised: 256 = (16,16) -> (2,128), 640 = (16,40) ->
(5,128).
"""

import dataclasses
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from flatquant_tpu.calib.data import get_loaders  # noqa: E402
from flatquant_tpu.calib.trainer import calibrate  # noqa: E402
from flatquant_tpu.models.config import LlamaConfig  # noqa: E402
from flatquant_tpu.models.llama import init_params, llama_forward  # noqa: E402
from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params  # noqa: E402
from flatquant_tpu.quantize.spec import W4A4KV4  # noqa: E402
from flatquant_tpu.quantize.state import init_model_fq  # noqa: E402


def main():
    cfg = LlamaConfig(name="mid128", vocab_size=512, hidden_size=256,
                      intermediate_size=640, num_layers=2, num_heads=8,
                      num_kv_heads=4, head_dim=32, seqlen=64)
    rng = np.random.default_rng(0)
    params = init_params(cfg, seed=0)
    ch = rng.choice(cfg.hidden_size, 8, replace=False)
    emb = np.array(params["embed"])
    emb[:, ch] *= 25.0
    params["embed"] = jnp.asarray(emb)
    data = get_loaders("synthetic", cfg.vocab_size, nsamples=32, seqlen=64,
                       seed=0, n_test_tokens=16 * 64)
    toks = jnp.asarray(data.test[:, : 4 * 64].reshape(4, 64))
    fp_logits = llama_forward(cfg, params, toks, compute_dtype=jnp.float32)

    def kl_after(tpu_decompose: bool) -> float:
        fq_cfg = dataclasses.replace(W4A4KV4, tpu_decompose=tpu_decompose,
                                     epochs=10, cali_bsz=4, nsamples=32)
        fq0 = init_model_fq(cfg, fq_cfg, seed=0)
        fq1 = calibrate(cfg, fq_cfg, params, fq0, data.train,
                        compute_dtype=jnp.float32, log=lambda s: None)
        bp, bfq = bake_model(cfg, fq_cfg, params, fq1)
        bp = rtn_quantize_params(fq_cfg, bp)
        lq = llama_forward(cfg, bp, toks, fq=bfq, fq_cfg=fq_cfg, mode="eval",
                           compute_dtype=jnp.float32)
        p = jax.nn.log_softmax(fp_logits, -1)
        q = jax.nn.log_softmax(lq, -1)
        return float(jnp.mean(jnp.sum(jnp.exp(p) * (p - q), -1)))

    a = kl_after(False)
    b = kl_after(True)
    print(f"calibrated KL-to-fp: balanced={a:.5f} rn128={b:.5f}")
    assert b < a * 1.25, "rn128 decomposition should calibrate comparably"


if __name__ == "__main__":
    main()
