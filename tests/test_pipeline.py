"""Pipeline parallelism (GPipe over a "pp" mesh axis) — exactness tests.

The schedule only moves *which device* runs a layer; the math sequence per
token is unchanged, so the pipelined forward must equal the sequential
`llama_forward` bit-for-bit on the virtual CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.parallel.mesh import make_mesh
from flatquant_tpu.parallel.pipeline import pipeline_llama_forward
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq


def _four_layer_cfg():
    cfg = get_config("tiny-llama")
    return dataclasses.replace(cfg, num_layers=4)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 3)])
def test_pipeline_fp_exact(rng, pp, n_micro):
    cfg = _four_layer_cfg()
    params = init_params(cfg, seed=0)
    mesh = make_mesh({"pp": pp}, devices=jax.devices()[:pp])
    B, S = 6, 16
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    ref = llama_forward(cfg, params, tokens)
    out = pipeline_llama_forward(cfg, params, tokens, mesh,
                                 n_microbatches=n_micro)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_eval_mode_exact(rng):
    """Pipelined fake-quant (eval-mode) forward with stacked FQ state."""
    cfg = _four_layer_cfg()
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, W4A4KV4, seed=1)
    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    B, S = 4, 16
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    ref = llama_forward(cfg, params, tokens, fq=fq, fq_cfg=W4A4KV4,
                        mode="eval")
    out = pipeline_llama_forward(cfg, params, tokens, mesh,
                                 n_microbatches=2, fq=fq, fq_cfg=W4A4KV4,
                                 mode="eval")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_composes_with_dp(rng):
    """pp x dp mesh: microbatch batch dim sharded over dp, still exact."""
    cfg = _four_layer_cfg()
    params = init_params(cfg, seed=0)
    mesh = make_mesh({"pp": 4, "dp": 2}, devices=jax.devices())
    B, S = 8, 16
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    ref = llama_forward(cfg, params, tokens)
    out = pipeline_llama_forward(cfg, params, tokens, mesh,
                                 n_microbatches=2, dp_axis="dp")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
