"""Quantized linear: the FlatQuantizedLinear analog as pure functions.

Parity target: flatquant/flat_linear.py:8-98. A linear's quant state holds
only the *learnable* extras (clip factors); weights live in the model param
pytree, transforms in the layer's FQ state. The train forward re-derives
weight scales every step (STE through round, gradient to transforms and
clips); `bake_linear_weight` reproduces reparameterize(): transform + clip
applied once in fp32, after which eval forwards are act-quant + plain
matmul.

Weight layout convention: [out_features, in_features] (torch-style) so
transforms apply over the last (in-features) dim exactly as in the
reference; the matmul is x @ W^T via dot_general.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import struct

from flatquant_tpu.core.kron import kronecker_matmul
from flatquant_tpu.core.quant import (
    ActQuantCfg,
    WeightQuantCfg,
    act_fake_quant,
    weight_fake_quant,
    weight_find_params,
)
from flatquant_tpu.core.transforms import (
    AnyDecompose,
    AnySingle,
    apply_decompose,
    apply_single,
)


@struct.dataclass
class LinearQuantState:
    """Learnable clip factors for one quantized linear (None = disabled)."""

    clip_w_max: Optional[jnp.ndarray]  # [out, 1] raw (sigmoid applied)
    clip_w_min: Optional[jnp.ndarray]  # [out, 1]
    clip_a_max: Optional[jnp.ndarray]  # [1]
    clip_a_min: Optional[jnp.ndarray]  # [1]


def init_linear_state(out_features: int, lwc: bool, lac: bool) -> LinearQuantState:
    """Clip factors init 4.0 (sigmoid(4) ~ 0.982), flat_linear.py:21-23."""
    init = 4.0
    return LinearQuantState(
        clip_w_max=jnp.full((out_features, 1), init, jnp.float32) if lwc else None,
        clip_w_min=jnp.full((out_features, 1), init, jnp.float32) if lwc else None,
        clip_a_max=jnp.full((1,), init, jnp.float32) if lac else None,
        clip_a_min=jnp.full((1,), init, jnp.float32) if lac else None,
    )


def _apply_wclip(w, st: LinearQuantState):
    """Learnable weight clipping: clamp to sigmoid(c) * rowwise min/max."""
    wmin = jnp.min(w, axis=1, keepdims=True)
    wmax = jnp.max(w, axis=1, keepdims=True)
    wmax = wmax * jax.nn.sigmoid(st.clip_w_max)
    wmin = wmin * jax.nn.sigmoid(st.clip_w_min)
    return jnp.clip(w, wmin, wmax)


QaTrans = Union[AnyDecompose, Sequence[jnp.ndarray], None]


def _apply_qa_trans(w, qa_trans: QaTrans):
    """Transform weight rows over in-features: W @ P^{-T}.

    qa_trans is either a Decompose transform (applied with inv_t=True) or an
    explicit (left, right) matrix pair already inverse-transposed (the
    o_proj case: [o_trans^{-T} over heads, vcache_trans^{-T} over head_dim],
    llama_utils.py:279-284).
    """
    if qa_trans is None:
        return w
    if isinstance(qa_trans, (tuple, list)):
        left, right = qa_trans
        return kronecker_matmul(w, left.astype(w.dtype), right.astype(w.dtype))
    return apply_decompose(qa_trans, w, inv_t=True)


def transform_weight(
    w,
    st: Optional[LinearQuantState],
    qa_trans: QaTrans = None,
    out_trans: Optional[AnySingle] = None,
    lwc: bool = False,
):
    """Transform + clip a weight in fp32 (shared by train forward and bake)."""
    w = w.astype(jnp.float32)
    w = _apply_qa_trans(w, qa_trans)
    if lwc and st is not None and st.clip_w_max is not None:
        w = _apply_wclip(w, st)
    if out_trans is not None:
        # fuse a Single transform acting on the *output* dim (per-head
        # blocks): W <- (P_out applied to W^T)^T
        w = apply_single(out_trans, w.T).T
    return w


def fq_linear_train(
    x,
    w,
    bias,
    st: LinearQuantState,
    w_cfg: WeightQuantCfg,
    a_cfg: ActQuantCfg,
    qa_trans: QaTrans = None,
    out_trans: Optional[AnySingle] = None,
    lwc: bool = False,
):
    """Calibration-mode forward: quantize (transformed) weight and act, matmul.

    Weight scales are recomputed from the current transformed weight every
    call (find_params-per-step, flat_linear.py:60-62) so gradients reach the
    transform parameters through the STE.
    """
    wt = transform_weight(w, st, qa_trans, out_trans, lwc)
    # scales stay in the autodiff graph: the reference's find_params runs
    # inside the train forward, so transform grads include the scale path
    scale, zero = weight_find_params(wt, w_cfg)
    wq = weight_fake_quant(wt, scale, zero, w_cfg)
    xq = act_fake_quant(x, a_cfg, st.clip_a_max, st.clip_a_min)
    y = jnp.matmul(xq, wq.T.astype(xq.dtype))
    if bias is not None:
        b = bias
        if out_trans is not None:
            b = apply_single(out_trans, b)
        y = y + b.astype(y.dtype)
    return y


def fq_linear_eval(x, w, bias, st: LinearQuantState, a_cfg: ActQuantCfg):
    """Eval-mode forward on baked weights: act quant + plain linear."""
    xq = act_fake_quant(x, a_cfg, st.clip_a_max, st.clip_a_min)
    y = jnp.matmul(xq, w.T.astype(xq.dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def bake_linear_weight(
    w,
    st: Optional[LinearQuantState],
    w_cfg: WeightQuantCfg,
    qa_trans: QaTrans = None,
    out_trans: Optional[AnySingle] = None,
    lwc: bool = False,
    rtn: bool = True,
):
    """reparameterize(): bake transform+clip into the weight once (fp32).

    With rtn=True additionally applies round-to-nearest weight fake-quant
    (the reference runs rtn_fwrd/gptq_fwrd as a separate pass after
    reparameterize; plain RTN is equivalent to folding it here). Returns
    (baked_weight, baked_bias_delta_applied?) — bias baking only matters for
    out_trans (v_proj fusion), returned as transformed bias.
    """
    wt = transform_weight(w, st, qa_trans, out_trans, lwc)
    if rtn and w_cfg.enabled:
        scale, zero = weight_find_params(wt, w_cfg)
        wt = weight_fake_quant(wt, scale, zero, w_cfg)
    return wt
