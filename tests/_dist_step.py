"""Shared single-calib-step definition for the 2-process distributed test
(tests/test_distributed_2proc.py) — NOT collected by pytest.

The step is the trainer's own math (calib/trainer.py:train_step): fp
teacher through llama_layer, fq calib student, normalized-MSE loss, one
optimizer update over build_labels param groups. Kept in a module both
the worker subprocesses and the in-process reference import, so the two
computations are the same code by construction.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from flatquant_tpu.calib.trainer import build_labels, make_optimizer
from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import (
    causal_mask,
    init_params,
    llama_layer,
    rope_tables,
)
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq, slice_layer

B, S = 8, 16


def make_step_inputs():
    """Deterministic (seeded) layer params, FQ state, inputs, teacher."""
    import dataclasses

    cfg = get_config("tiny-llama")
    fq_cfg = dataclasses.replace(W4A4KV4, deactive_amp=True)  # f32 step
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    lp = slice_layer(params["layers"], 0)
    fq_l = slice_layer(fq, 0)
    tokens = np.random.default_rng(11).integers(0, cfg.vocab_size, (B, S))
    x = np.asarray(params["embed"])[tokens].astype(np.float32)
    cos, sin = rope_tables(cfg, jnp.arange(S))
    mask = causal_mask(S)
    teacher, _ = llama_layer(cfg, None, "fp", lp, None, jnp.asarray(x),
                             cos, sin, mask, with_stats=True)
    return cfg, fq_cfg, lp, fq_l, x, np.asarray(teacher)


def one_calib_step(cfg, fq_cfg, fq_l, lp, x, teacher):
    """One jitted trainer step; GSPMD-shards according to input shardings."""
    labels = build_labels(fq_l)
    tx = make_optimizer(fq_cfg, labels, total_steps=1)
    cos, sin = rope_tables(cfg, jnp.arange(S))
    mask = causal_mask(S)

    @jax.jit
    def step(fq_l, lp, x, teacher):
        opt_state = tx.init(fq_l)

        def loss_fn(fq_l):
            out = llama_layer(cfg, fq_cfg, "calib", lp, fq_l, x, cos, sin,
                              mask)
            mse = jnp.mean(
                (out.astype(jnp.float32) - teacher.astype(jnp.float32)) ** 2)
            return mse / jax.lax.stop_gradient(mse), mse

        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(fq_l)
        updates, opt_state = tx.update(grads, opt_state, fq_l)
        return optax.apply_updates(fq_l, updates), mse

    return step(fq_l, lp, x, teacher)
