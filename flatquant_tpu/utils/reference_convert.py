"""Interop with reference (PyTorch FlatQuant) artifacts.

The reference releases a model zoo of `flat_matrices.pth` checkpoints —
per-layer dicts of eval-mode transform matrices + clip factors saved by
`save_flat_matrices` (flat_utils.py:65-93, key filter ["trans.matrix",
"trans.diag_scale", "clip_factor_w", "clip_factor_a"]). This module converts

  - a torch HF Llama/Qwen state dict            -> our stacked fp params
  - a reference `flat_matrices.pth` object      -> our stacked FQ state of
    Baked transforms + clip factors, directly consumable by
    `quantize.bake.bake_model` (the --reload_matrix flow: load matrices,
    bake fresh fp weights against them, eval / export)

and provides the pre-fold "matrices" form of our own FQ state
(`rep_matrix_only` analog) so our `--save_matrix` artifact round-trips the
same way the reference's does (save BEFORE reparameterize, reload onto raw
weights, re-bake).

Reference key schema per layer (direct_inv or SVD, after to_eval_mode —
trans_utils.py:39-46 / 105-116 / 153-159 / 206-213):

  self_attn.ln_trans.matrix_left / matrix_right / matrix_left_inv /
      matrix_right_inv / diag_scale
  self_attn.{o,kcache,vcache}_trans.matrix / matrix_inv_t
  mlp.{up_gate,down}_trans.matrix_* / diag_scale
  {self_attn.{q,k,v,o}_proj, mlp.{up,gate,down}_proj}.clip_factor_w_{max,min}
  {...}_proj.act_quantizer.clip_factor_a_{max,min}
  self_attn.{q,k,v}_cache_quantizer.clip_factor_a_{max,min}

`matrix_left_inv`/`matrix_inv_t` hold the inverse-TRANSPOSE of the factor
(trans_utils.py:42,109-110,156,210-211) — the same convention as our
BakedSingle.matrix_inv_t / BakedDecompose.left_inv.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.core.transforms import BakedDecompose, BakedSingle
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.loader import params_from_named_tensors
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.quantize.state import (
    AttnFQ,
    CacheQuantState,
    LayerFQ,
    MlpFQ,
    bake_layer_fq,
    init_model_fq,
)
from flatquant_tpu.quantize.linear import LinearQuantState


def _np(t) -> np.ndarray:
    """torch tensor / array -> float32 numpy (no torch import required)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


# ---------------------------------------------------------------------------
# torch HF state dict -> our params
# ---------------------------------------------------------------------------


def params_from_torch_state_dict(sd: Dict[str, object], cfg: LlamaConfig,
                                 dtype=jnp.float32) -> dict:
    """HF Llama/Qwen2 `model.state_dict()` (torch tensors or arrays) ->
    our stacked param pytree."""
    return params_from_named_tensors(
        ((name, _np(t)) for name, t in sd.items()), cfg, dtype
    )


# ---------------------------------------------------------------------------
# reference flat_matrices -> our Baked FQ state
# ---------------------------------------------------------------------------


def _get(d, key):
    return jnp.asarray(d[key]) if key in d else None


def _decompose_from(d, prefix: str) -> Optional[BakedDecompose]:
    if f"{prefix}.matrix_left" not in d:
        return None
    return BakedDecompose(
        left=jnp.asarray(d[f"{prefix}.matrix_left"]),
        right=jnp.asarray(d[f"{prefix}.matrix_right"]),
        left_inv=jnp.asarray(d[f"{prefix}.matrix_left_inv"]),
        right_inv=jnp.asarray(d[f"{prefix}.matrix_right_inv"]),
        diag_scale=_get(d, f"{prefix}.diag_scale"),
    )


def _single_from(d, prefix: str) -> Optional[BakedSingle]:
    if f"{prefix}.matrix" not in d:
        return None
    return BakedSingle(
        matrix=jnp.asarray(d[f"{prefix}.matrix"]),
        matrix_inv_t=jnp.asarray(d[f"{prefix}.matrix_inv_t"]),
    )


def _linear_from(d, prefix: str) -> LinearQuantState:
    return LinearQuantState(
        clip_w_max=_get(d, f"{prefix}.clip_factor_w_max"),
        clip_w_min=_get(d, f"{prefix}.clip_factor_w_min"),
        clip_a_max=_get(d, f"{prefix}.act_quantizer.clip_factor_a_max"),
        clip_a_min=_get(d, f"{prefix}.act_quantizer.clip_factor_a_min"),
    )


def _cache_from(d, prefix: str) -> CacheQuantState:
    return CacheQuantState(
        clip_a_max=_get(d, f"{prefix}.clip_factor_a_max"),
        clip_a_min=_get(d, f"{prefix}.clip_factor_a_min"),
    )


def layer_fq_from_reference_dict(d: Dict[str, np.ndarray]) -> LayerFQ:
    """One layer's flat_matrices entry -> LayerFQ of Baked transforms."""
    attn = AttnFQ(
        ln_trans=_decompose_from(d, "self_attn.ln_trans"),
        o_trans=_single_from(d, "self_attn.o_trans"),
        kcache_trans=_single_from(d, "self_attn.kcache_trans"),
        vcache_trans=_single_from(d, "self_attn.vcache_trans"),
        q_lin=_linear_from(d, "self_attn.q_proj"),
        k_lin=_linear_from(d, "self_attn.k_proj"),
        v_lin=_linear_from(d, "self_attn.v_proj"),
        o_lin=_linear_from(d, "self_attn.o_proj"),
        q_cache=_cache_from(d, "self_attn.q_cache_quantizer"),
        k_cache=_cache_from(d, "self_attn.k_cache_quantizer"),
        v_cache=_cache_from(d, "self_attn.v_cache_quantizer"),
    )
    mlp = MlpFQ(
        up_gate_trans=_decompose_from(d, "mlp.up_gate_trans"),
        down_trans=_decompose_from(d, "mlp.down_trans"),
        up_lin=_linear_from(d, "mlp.up_proj"),
        gate_lin=_linear_from(d, "mlp.gate_proj"),
        down_lin=_linear_from(d, "mlp.down_proj"),
    )
    return LayerFQ(attn=attn, mlp=mlp)


def fq_from_flat_matrices(matrices: Dict[int, Dict[str, object]],
                          cfg: LlamaConfig) -> object:
    """Reference flat_matrices object ({layer: {key: tensor}}) -> stacked
    FQ state (leading [L] axis), ready for `bake_model`."""
    per_layer = []
    for i in range(cfg.num_layers):
        d = {k: _np(v) for k, v in matrices[i].items()}
        per_layer.append(layer_fq_from_reference_dict(d))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def load_reference_flat_matrices(path: str):
    """torch.load a reference flat_matrices.pth (local file)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# our own matrices artifact (rep_matrix_only analog)
# ---------------------------------------------------------------------------


def matrices_state(fq_state):
    """Freeze a (stacked) trained FQ state into eval matrices WITHOUT
    folding diag scales — the reference's rep_matrix_only form
    (llama_utils.py:106-109,317-325), i.e. what --save_matrix should write
    so that reload + bake onto raw weights reproduces the model."""
    return jax.vmap(bake_layer_fq)(fq_state)


def matrices_fq_template(cfg: LlamaConfig, fq_cfg: FQConfig, seed: int = 0,
                         tp: int = 1):
    """Structure template for deserializing a saved matrices artifact."""
    return matrices_state(init_model_fq(cfg, fq_cfg, seed=seed, tp=tp))
