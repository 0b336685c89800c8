"""GPTQ weight quantization (post-reparameterization pass).

Parity target: gptq_utils.py:15-310 —
  - Hessian accumulation from the quantized-path linear inputs (hooks on
    the .linear inside FlatQuantizedLinear -> here: eval-mode layer forward
    with capture points + act fake-quant re-applied)
  - per-weight column-sequential quantization with Cholesky-inverse error
    feedback, optional activation ordering and per-group scales
  - layer-sequential subset order [qkv] -> [o] -> [up,gate] -> [down] with
    quantized-output propagation between layers (gptq_utils.py:188-263)

TPU-native delta: the reference's 128-column blocked loop (a CUDA memory
optimization) is replaced by one `lax.fori_loop` over columns whose error
feedback updates *all* remaining columns under an iota mask — identical
math, fully vectorized for XLA, one compile per weight shape.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.core.quant import (
    WeightQuantCfg,
    act_fake_quant,
    asym_quant_dequant,
    sym_quant_dequant,
    weight_find_params,
)
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import causal_mask, llama_layer, rope_tables
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.quantize.state import set_layer, slice_layer


# ---------------------------------------------------------------------------
# core column loop
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("w_cfg", "act_order", "percdamp"))
def gptq_quantize_weight(
    w,
    hessian,
    w_cfg: WeightQuantCfg,
    percdamp: float = 0.01,
    act_order: bool = False,
):
    """Quantize w [out, in] against the input Hessian [in, in].

    Returns the fake-quantized weight (fp, ready for eval forwards / packing).
    """
    w = w.astype(jnp.float32)
    h = hessian.astype(jnp.float32)
    out_dim, n = w.shape
    q_max = float(w_cfg.q_max)
    group = w_cfg.group_size if w_cfg.group_size > 0 else n

    diag = jnp.diag(h)
    dead = diag == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)

    if act_order:
        perm = jnp.argsort(-jnp.diag(h))
        w = w[:, perm]
        h = h[perm][:, perm]
        inv_perm = jnp.argsort(perm)

    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(n, dtype=jnp.float32)

    # Hinv as the upper-Cholesky factor of H^{-1} (gptq_utils.py:96-100)
    h_inv_full = jnp.linalg.inv(h)
    # symmetrize against fp drift before factorizing
    h_inv_full = (h_inv_full + h_inv_full.T) / 2.0
    hinv = jnp.linalg.cholesky(h_inv_full).T  # upper triangular

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def quant_cols(cols, scale, zero):
        if w_cfg.sym:
            return sym_quant_dequant(cols, scale, q_max)
        return asym_quant_dequant(cols, scale, zero, q_max)

    def group_params(w_cur, i):
        """(re)compute scales from the current group's columns."""
        cols = jax.lax.dynamic_slice(w_cur, (0, i), (out_dim, group))
        gcfg = WeightQuantCfg(
            bits=w_cfg.bits, sym=w_cfg.sym, perchannel=True, group_size=-1
        )
        return weight_find_params(cols, gcfg)

    def body(i, carry):
        w_cur, q_out, scale, zero = carry
        if w_cfg.group_size > 0:
            scale, zero = jax.lax.cond(
                i % group == 0,
                lambda: group_params(w_cur, (i // group) * group),
                lambda: (scale, zero),
            )
        col = jax.lax.dynamic_slice(w_cur, (0, i), (out_dim, 1))
        qcol = quant_cols(col, scale, zero)
        q_out = jax.lax.dynamic_update_slice(q_out, qcol, (0, i))
        d = hinv[i, i]
        err = (col - qcol) / d  # [out, 1]
        hrow = hinv[i][None, :]  # [1, n]
        upd = err * hrow * (col_ids > i)
        return w_cur - upd, q_out, scale, zero

    scale0 = jnp.ones((out_dim, 1), jnp.float32)
    zero0 = jnp.zeros((out_dim, 1), jnp.float32)
    if w_cfg.group_size <= 0:
        scale0, zero0 = weight_find_params(w, w_cfg)
    _, q, _, _ = jax.lax.fori_loop(0, n, body, (w, jnp.zeros_like(w), scale0, zero0))

    if act_order:
        q = q[:, inv_perm]
    return q


# ---------------------------------------------------------------------------
# driver: layer-sequential over subsets with quantized propagation
# ---------------------------------------------------------------------------

_SUBSETS = (
    ("qkv", ("wq", "wk", "wv")),
    ("o", ("wo",)),
    ("upgate", ("wup", "wgate")),
    ("down", ("wdown",)),
)


def _subset_act_clip(fq_l, capture_key):
    """Act-quant clip factors of the linear(s) fed by this capture point."""
    a, m = fq_l.attn, fq_l.mlp
    lin = {
        "qkv": a.q_lin,  # q/k/v share the input; clips may differ slightly —
        # the reference hessian hooks also see each linear's own quantized
        # input; q's clips are representative (identical init, same input)
        "o": a.o_lin,
        "upgate": m.up_lin,
        "down": m.down_lin,
    }[capture_key]
    return lin.clip_a_max, lin.clip_a_min


def gptq_model(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    params: dict,
    fq_state,
    train_tokens: np.ndarray,
    log: Callable[[str], None] = print,
    compute_dtype=jnp.float32,
    bsz: int = 4,
):
    """Run GPTQ over all layers of a *baked* model; returns new params.

    params/fq_state must already be reparameterized (bake_model) and NOT
    RTN-quantized. Layer inputs propagate through the quantized layers
    (gptq_utils.py:255-258).
    """
    # functional: never mutate the caller's pytree
    params = dict(params)
    params["layers"] = dict(params["layers"])
    nsamples, seqlen = train_tokens.shape
    cos, sin = rope_tables(cfg, jnp.arange(seqlen))
    mask = causal_mask(seqlen)
    w_cfg = fq_cfg.w_cfg

    embed = jax.jit(lambda t: params["embed"][t].astype(compute_dtype))
    inps = np.concatenate(
        [np.asarray(embed(jnp.asarray(train_tokens[i : i + bsz])))
         for i in range(0, nsamples, bsz)],
        axis=0,
    )

    @jax.jit
    def eval_step(lp, fq_l, x):
        return llama_layer(
            cfg, fq_cfg, "eval", lp, fq_l, x, cos, sin, mask, with_linear_inputs=True
        )

    a_cfg = fq_cfg.a_cfg

    for i in range(cfg.num_layers):
        lp = {k: jax.device_put(v) for k, v in slice_layer(params["layers"], i).items()}
        fq_l = slice_layer(fq_state, i)
        for cap_key, weight_keys in _SUBSETS:
            # accumulate Hessian of this subset's (act-quantized) input
            hess = None
            clip_max, clip_min = _subset_act_clip(fq_l, cap_key)
            for j in range(0, nsamples, bsz):
                _, caps = eval_step(lp, fq_l, jnp.asarray(inps[j : j + bsz]))
                xin = caps[cap_key].astype(jnp.float32)
                xin = act_fake_quant(xin, a_cfg, clip_max, clip_min)
                xf = xin.reshape(-1, xin.shape[-1])
                contrib = 2.0 * (xf.T @ xf)
                hess = contrib if hess is None else hess + contrib
            for wk in weight_keys:
                lp[wk] = gptq_quantize_weight(
                    lp[wk],
                    hess,
                    w_cfg,
                    percdamp=fq_cfg.gptq_percdamp,
                    act_order=fq_cfg.gptq_act_order,
                )
            log(f"gptq layer {i} subset {cap_key} done")
        # write back + propagate quantized outputs
        for k, v in lp.items():
            params["layers"][k] = params["layers"][k].at[i].set(v)
        for j in range(0, nsamples, bsz):
            out, _ = eval_step(lp, fq_l, jnp.asarray(inps[j : j + bsz]))
            inps[j : j + bsz] = np.asarray(out)
    return params
