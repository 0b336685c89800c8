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


# ---------------------------------------------------------------------------
# deploy PACKED-checkpoint interop (VERDICT r4 item 10)
#
# The reference's released real-quant checkpoints are safetensors in the
# deploy naming scheme that modeling_llama.py:454-517 renames into its
# module tree: per-linear `<module>.linear.weight` int4 codes packed two-
# per-byte INTERLEAVED (byte j = q[2j] | q[2j+1] << 4, two's complement —
# deploy/functional/quantization.py:49-56), weight scales under
# `quantizer.<module>.linear.scale` [out, 1], transform matrices under
# `ln_trans.matrix_left/right`, `o_trans.matrix`, `k/vcache_trans.matrix`,
# `up_gate_trans` / `down_trans`, and RAW (pre-sigmoid) activation / KV
# clip logits on each `act_quantizer` / `{k,v}_cache_quantizer`.
#
# save_reference_packed writes that format from our baked model (the
# correspondence documented executable both ways); load_reference_packed
# reads it into our stacked serving params — released checkpoints load
# day-1 once egress exists.
# ---------------------------------------------------------------------------

_DEPLOY_LINEARS = (
    ("q", "self_attn.q_proj", "wq"),
    ("k", "self_attn.k_proj", "wk"),
    ("v", "self_attn.v_proj", "wv"),
    ("o", "self_attn.o_proj", "wo"),
    ("up", "mlp.up_proj", "wup"),
    ("gate", "mlp.gate_proj", "wgate"),
    ("down", "mlp.down_proj", "wdown"),
)


def _pack_i4_interleaved(q: np.ndarray) -> np.ndarray:
    """int8 codes [-8, 7] [N, K] -> u8 [N, K/2], byte j = q[2j] | q[2j+1]<<4
    (two's complement nibbles — the reference pack_i4)."""
    u = (q.astype(np.int16) & 0xF).astype(np.uint8)
    return u[:, 0::2] | (u[:, 1::2] << 4)


def _unpack_i4_interleaved(u8: np.ndarray) -> np.ndarray:
    """Inverse of _pack_i4_interleaved (reference unpack_i4 semantics)."""
    lo = (u8 & 0xF).astype(np.int8)
    hi = (u8 >> 4).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo).astype(np.int8)
    hi = np.where(hi >= 8, hi - 16, hi).astype(np.int8)
    out = np.empty((u8.shape[0], u8.shape[1] * 2), np.int8)
    out[:, 0::2] = lo
    out[:, 1::2] = hi
    return out


def save_reference_packed(path: str, cfg: LlamaConfig, fq_cfg: FQConfig,
                          baked_params: dict, baked_fq) -> str:
    """Write a reference-deploy-format packed safetensors checkpoint from
    our baked model (the inverse of load_reference_packed; also the
    executable documentation of the key mapping)."""
    from safetensors.numpy import save_file

    from flatquant_tpu.core.quant import (
        weight_find_params,
        weight_quantize_int,
    )
    from flatquant_tpu.core.transforms import decompose_matrices, single_matrix
    from flatquant_tpu.quantize.state import slice_layer

    w_cfg = fq_cfg.w_cfg
    assert w_cfg.bits == 4 and w_cfg.sym and w_cfg.group_size <= 0, (
        "deploy packed checkpoints are symmetric per-channel int4")
    sd: Dict[str, np.ndarray] = {}

    def put(k, v):
        sd[k] = np.ascontiguousarray(np.asarray(v))

    put("model.embed_tokens.weight", baked_params["embed"])
    put("model.norm.weight", baked_params["final_norm_w"])
    put("lm_head.weight",
        baked_params.get("lm_head", baked_params["embed"]))

    for i in range(cfg.num_layers):
        L = f"model.layers.{i}."
        lp = jax.tree.map(np.asarray,
                          slice_layer(baked_params["layers"], i))
        lfq = slice_layer(baked_fq, i)
        a, m = lfq.attn, lfq.mlp
        put(L + "input_layernorm.weight", lp["ln1_w"])
        put(L + "post_attention_layernorm.weight", lp["ln2_w"])
        for _, mod, wkey in _DEPLOY_LINEARS:
            w = jnp.asarray(lp[wkey])
            scale, zero = weight_find_params(w, w_cfg)
            q = np.asarray(weight_quantize_int(w, scale, zero, w_cfg))
            put(L + mod + ".linear.weight", _pack_i4_interleaved(q))
            put("quantizer." + L + mod + ".linear.scale",
                np.asarray(scale, np.float32))
            bkey = {"wq": "bq", "wk": "bk", "wv": "bv"}.get(wkey)
            if bkey and lp.get(bkey) is not None:
                put(L + mod + ".linear.bias", lp[bkey])
        for trans, prefix in ((a.ln_trans, L + "self_attn.ln_trans"),
                              (m.up_gate_trans, L + "mlp.up_gate_trans"),
                              (m.down_trans, L + "mlp.down_trans")):
            if trans is not None:
                left, right = decompose_matrices(trans)
                put(prefix + ".matrix_left", left)
                put(prefix + ".matrix_right", right)
        for trans, prefix in ((a.o_trans, L + "self_attn.o_trans"),
                              (a.kcache_trans, L + "self_attn.kcache_trans"),
                              (a.vcache_trans, L + "self_attn.vcache_trans")):
            if trans is not None:
                put(prefix + ".matrix", single_matrix(trans))
        clip_map = (("self_attn.q_proj", a.q_lin), ("self_attn.k_proj", a.k_lin),
                    ("self_attn.v_proj", a.v_lin), ("self_attn.o_proj", a.o_lin),
                    ("mlp.up_proj", m.up_lin), ("mlp.gate_proj", m.gate_lin),
                    ("mlp.down_proj", m.down_lin))
        for mod, lin in clip_map:
            if lin.clip_a_max is not None:
                put(L + mod + ".act_quantizer.clip_factor_a_max",
                    lin.clip_a_max)
                put(L + mod + ".act_quantizer.clip_factor_a_min",
                    lin.clip_a_min)
        for nm, cq in (("k", a.k_cache), ("v", a.v_cache)):
            if cq.clip_a_max is not None:
                put(L + f"self_attn.{nm}_cache_quantizer.clip_factor_a_max",
                    cq.clip_a_max)
                put(L + f"self_attn.{nm}_cache_quantizer.clip_factor_a_min",
                    cq.clip_a_min)
    save_file(sd, path)
    return path


def load_reference_packed(path: str, cfg: LlamaConfig, fq_cfg: FQConfig,
                          dtype=jnp.bfloat16) -> dict:
    """Read a reference-deploy-format packed safetensors checkpoint into
    our STACKED serving params (build_serving_params layout, unmerged
    projections): interleaved int4 codes repack to the planar Pallas
    layout, weight scales attach per linear, raw clip logits pass through
    sigmoid (the serving convention), and cache-transform inverses are
    recomputed (the deploy format stores only the forward matrix)."""
    from safetensors.numpy import load_file

    from flatquant_tpu.kernels.int4_matmul import pack_weight_planar

    sd = load_file(path)
    layers = []
    sig = lambda c: jax.nn.sigmoid(jnp.asarray(c, jnp.float32))
    for i in range(cfg.num_layers):
        L = f"model.layers.{i}."
        out = {
            "ln1_w": jnp.asarray(sd[L + "input_layernorm.weight"],
                                 jnp.float32),
            "ln2_w": jnp.asarray(sd[L + "post_attention_layernorm.weight"],
                                 jnp.float32),
        }
        for ours, mod, _ in _DEPLOY_LINEARS:
            codes = _unpack_i4_interleaved(sd[L + mod + ".linear.weight"])
            lin = {
                "wp": pack_weight_planar(jnp.asarray(codes)),
                "scale": jnp.asarray(
                    sd["quantizer." + L + mod + ".linear.scale"],
                    jnp.float32)[:, 0],
            }
            cmax = sd.get(L + mod + ".act_quantizer.clip_factor_a_max")
            if cmax is not None:
                cmin = sd[L + mod + ".act_quantizer.clip_factor_a_min"]
                lin["a_clip"] = (sig(cmax), sig(cmin))
            out[ours] = lin
            b = sd.get(L + mod + ".linear.bias")
            if b is not None:
                out[{"q": "bq", "k": "bk", "v": "bv"}[ours]] = jnp.asarray(
                    b, jnp.float32)
        for ours, prefix in (("ln_t", L + "self_attn.ln_trans"),
                             ("ug_t", L + "mlp.up_gate_trans"),
                             ("down_t", L + "mlp.down_trans")):
            if prefix + ".matrix_left" in sd:
                out[ours] = (
                    jnp.asarray(sd[prefix + ".matrix_left"], dtype),
                    jnp.asarray(sd[prefix + ".matrix_right"], dtype))
        if L + "self_attn.o_trans.matrix" in sd:
            out["o_t"] = jnp.asarray(sd[L + "self_attn.o_trans.matrix"],
                                     dtype)
        if L + "self_attn.kcache_trans.matrix" in sd:
            kt = np.asarray(sd[L + "self_attn.kcache_trans.matrix"],
                            np.float32)
            out["k_t"] = jnp.asarray(kt, dtype)
            out["k_t_inv"] = jnp.asarray(np.linalg.inv(kt).T, dtype)
        if L + "self_attn.vcache_trans.matrix" in sd:
            vt = np.asarray(sd[L + "self_attn.vcache_trans.matrix"],
                            np.float32)
            out["v_t_inv"] = jnp.asarray(np.linalg.inv(vt).T, dtype)
        for ours, nm in (("kc_clip", "k"), ("vc_clip", "v")):
            cmax = sd.get(
                L + f"self_attn.{nm}_cache_quantizer.clip_factor_a_max")
            if cmax is not None:
                cmin = sd[
                    L + f"self_attn.{nm}_cache_quantizer.clip_factor_a_min"]
                out[ours] = (sig(cmax), sig(cmin))
        layers.append(out)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype),
        "final_norm_w": jnp.asarray(sd["model.norm.weight"], jnp.float32),
        "lm_head": jnp.asarray(sd["lm_head.weight"], dtype),
        "layers": stacked,
    }
