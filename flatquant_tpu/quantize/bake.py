"""Reparameterization: bake trained transforms into weights.

Parity targets:
  - flat_utils.reparameterize_model / reparameterize_ln (flat_utils.py:20-49)
  - FlatQuantLlamaMLP/Attention.reparameterize (llama_utils.py:80-97,289-306)
  - rtn weight quant pass (gptq_utils.rtn_fwrd:273-310)

Pipeline (order matches the reference exactly — diag folding happens BEFORE
weight quantization so the quantizer sees the folded weights):
  1. freeze transforms to fixed matrices (to_eval_mode)
  2. transform + clip every linear weight in fp32
  3. fold diag scales: ln_trans.diag -> input_layernorm weight,
     up_gate_trans.diag -> post_attn_layernorm weight,
     down_trans.diag -> up_proj rows
  4. (separately) RTN or GPTQ weight quantization over the baked params
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from flatquant_tpu.core.quant import weight_fake_quant, weight_find_params
from flatquant_tpu.core.transforms import apply_single, single_matrix
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.quantize.linear import transform_weight
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.quantize.state import LayerFQ, bake_layer_fq


def bake_layer(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    lp: dict,
    layer_fq: LayerFQ,
) -> Tuple[dict, LayerFQ]:
    """Bake one layer: returns (new layer params, eval-mode LayerFQ)."""
    fq = bake_layer_fq(layer_fq)
    a, m = fq.attn, fq.mlp
    new = dict(lp)
    lwc = fq_cfg.lwc

    tw = lambda w, st, qa=None, out=None: transform_weight(w, st, qa, out, lwc)

    # ---- attention linears ----
    new["wq"] = tw(lp["wq"], a.q_lin, qa=a.ln_trans)
    new["wk"] = tw(lp["wk"], a.k_lin, qa=a.ln_trans)
    out_v = None if fq_cfg.separate_vtrans else a.vcache_trans
    new["wv"] = tw(lp["wv"], a.v_lin, qa=a.ln_trans, out=out_v)
    if lp.get("bv") is not None and out_v is not None:
        new["bv"] = apply_single(out_v, lp["bv"].astype(jnp.float32))
    qa_o = None
    if a.o_trans is not None and a.vcache_trans is not None:
        qa_o = (
            single_matrix(a.o_trans, inv_t=True),
            single_matrix(a.vcache_trans, inv_t=True),
        )
    new["wo"] = tw(lp["wo"], a.o_lin, qa=qa_o)

    # ---- mlp linears ----
    new["wgate"] = tw(lp["wgate"], m.gate_lin, qa=m.up_gate_trans)
    new["wup"] = tw(lp["wup"], m.up_lin, qa=m.up_gate_trans)
    new["wdown"] = tw(lp["wdown"], m.down_lin, qa=m.down_trans)

    # ---- fold diag scales (reparameterize_ln + up-row fusion) ----
    if a.ln_trans is not None and a.ln_trans.diag_scale is not None:
        new["ln1_w"] = (
            lp["ln1_w"].astype(jnp.float32) * a.ln_trans.diag_scale
        )
        a = a.replace(ln_trans=a.ln_trans.replace(diag_scale=None))
    if m.up_gate_trans is not None and m.up_gate_trans.diag_scale is not None:
        new["ln2_w"] = (
            lp["ln2_w"].astype(jnp.float32) * m.up_gate_trans.diag_scale
        )
        m = m.replace(up_gate_trans=m.up_gate_trans.replace(diag_scale=None))
    if m.down_trans is not None and m.down_trans.diag_scale is not None:
        # scale up_proj out-rows so silu(gate)*up arrives pre-scaled
        # (llama_utils.py:88-93); tiles across blocks for shard-aligned
        # (size I//tp) transforms
        diag = m.down_trans.diag_scale
        if diag.shape[0] != new["wup"].shape[0]:
            diag = jnp.tile(diag, new["wup"].shape[0] // diag.shape[0])
        new["wup"] = new["wup"] * diag[:, None]
        m = m.replace(down_trans=m.down_trans.replace(diag_scale=None))

    return new, LayerFQ(attn=a, mlp=m)


def bake_model(cfg: LlamaConfig, fq_cfg: FQConfig, params: dict, fq_state) -> Tuple[dict, object]:
    """Bake all layers (stacked pytrees in, stacked pytrees out)."""
    baked = jax.vmap(lambda lp, lfq: bake_layer(cfg, fq_cfg, lp, lfq))(
        params["layers"], fq_state
    )
    new_layers, new_fq = baked
    new_params = dict(params)
    new_params["layers"] = new_layers
    return new_params, new_fq


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown")


def rtn_quantize_params(fq_cfg: FQConfig, params: dict) -> dict:
    """Round-to-nearest weight quant over all baked linears (rtn_fwrd analog).

    Runs per stacked weight via vmap over the layer axis.
    """
    if not fq_cfg.w_cfg.enabled:
        return params
    w_cfg = fq_cfg.w_cfg

    def quant_one(w):
        scale, zero = weight_find_params(w, w_cfg)
        return weight_fake_quant(w, scale, zero, w_cfg)

    layers = dict(params["layers"])
    for key in _QUANT_KEYS:
        layers[key] = jax.vmap(quant_one)(layers[key])
    new_params = dict(params)
    new_params["layers"] = layers
    return new_params
