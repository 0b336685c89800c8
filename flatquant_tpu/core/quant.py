"""Fake-quantization math (fp-in, fp-out, STE gradients).

Parity targets in the reference (behavioral, not copied):
  - sym/asym primitives: flatquant/quant_utils.py:10-45
  - per-token activation quantizer (incl. LAC learnable clipping and static
    clip_ratio): flatquant/quant_utils.py:48-119
  - GPTQ-style per-channel weight quantizer (incl. optional MSE grid shrink
    search): flatquant/quant_utils.py:122-229

Everything is a pure function so it can be jitted, vmapped, and used
identically during calibration (STE training), fake-quant eval, and as the
*definition of record* that the real INT4 Pallas kernels are tested against
(fake and real paths share one scale/rounding rule by construction).

Conventions:
  - activations quantize per-token over the last dim (optionally per-group);
  - weights are [out_features, in_features] and quantize per-out-channel;
  - symmetric integer grid is [-(2^(b-1)), 2^(b-1)-1], asymmetric [0, 2^b-1].
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flatquant_tpu.core.ste import round_ste


# ---------------------------------------------------------------------------
# configs (static, hashable -> usable as jit-static arguments)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ActQuantCfg:
    """Per-token activation quantization config.

    lac=True enables learnable clipping (sigmoid(clip_factor) * min/max),
    in which case the caller threads clip parameters into act_fake_quant.
    """

    bits: int = 16
    sym: bool = True
    lac: bool = False
    group_size: int = -1  # -1 = whole last dim (per-token)
    clip_ratio: Optional[float] = None

    @property
    def enabled(self) -> bool:
        return self.bits < 16

    @property
    def q_max(self) -> int:
        return 2 ** (self.bits - 1) - 1 if self.sym else 2**self.bits - 1


@dataclasses.dataclass(frozen=True)
class WeightQuantCfg:
    """Per-out-channel weight quantization config (GPTQ-style)."""

    bits: int = 16
    sym: bool = True
    perchannel: bool = True
    group_size: int = -1
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    max_shrink: float = 0.8

    @property
    def enabled(self) -> bool:
        return self.bits < 16

    @property
    def q_max(self) -> int:
        return 2 ** (self.bits - 1) - 1 if self.sym else 2**self.bits - 1


def get_qmin_qmax(bits: int, sym: bool) -> Tuple[int, int]:
    if sym:
        q_max = 2 ** (bits - 1) - 1
        return -q_max - 1, q_max
    return 0, 2**bits - 1


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def sym_quant(x, scale, q_max):
    """q = clamp(round_ste(x / scale), -(q_max + 1), q_max)."""
    return jnp.clip(round_ste(x / scale), -(q_max + 1), q_max)


def sym_dequant(q, scale):
    return q * scale


def sym_quant_dequant(x, scale, q_max):
    return sym_dequant(sym_quant(x, scale, q_max), scale)


def asym_quant(x, scale, zero, q_max):
    """q = clamp(round_ste(x / scale) + zero, 0, q_max)."""
    return jnp.clip(round_ste(x / scale) + zero, 0, q_max)


def asym_dequant(q, scale, zero):
    return scale * (q - zero)


def asym_quant_dequant(x, scale, zero, q_max):
    return asym_dequant(asym_quant(x, scale, zero, q_max), scale, zero)


# ---------------------------------------------------------------------------
# activation quantization (per-token / per-group over last dim)
# ---------------------------------------------------------------------------


def _group_reshape(x, group_size: int):
    if group_size > 0:
        assert x.shape[-1] % group_size == 0, (
            f"last dim {x.shape[-1]} not divisible by group {group_size}"
        )
        return x.reshape(x.shape[:-1] + (x.shape[-1] // group_size, group_size))
    return x


def act_scale_zero(
    x,
    cfg: ActQuantCfg,
    clip_max=None,
    clip_min=None,
):
    """Scale/zero for per-token (or per-group) activation quantization.

    Returns (scale, zero) with a trailing singleton reduce axis so they
    broadcast against the (group-reshaped) x. Mirrors
    ActivationQuantizer.get_scale_zero: min/max are clamped through zero,
    LAC multiplies them by sigmoid(clip_factor), degenerate all-zero rows
    get scale 1 (sym) or range [-1, 1] (asym).
    """
    xg = _group_reshape(x, cfg.group_size)
    xmax = jnp.maximum(jnp.max(xg, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xg, axis=-1, keepdims=True), 0.0)

    if cfg.lac and clip_max is not None:
        xmax = xmax * jax.nn.sigmoid(clip_max)
        xmin = xmin * jax.nn.sigmoid(clip_min)
    elif cfg.clip_ratio is not None:
        xmax = xmax * cfg.clip_ratio
        xmin = xmin * cfg.clip_ratio

    q_max = float(cfg.q_max)
    if cfg.sym:
        absmax = jnp.maximum(jnp.abs(xmin), xmax)
        scale = jnp.where(absmax == 0, 1.0, absmax / q_max)
        zero = jnp.zeros_like(scale)
    else:
        degenerate = (xmin == 0) & (xmax == 0)
        xmin = jnp.where(degenerate, -1.0, xmin)
        xmax = jnp.where(degenerate, 1.0, xmax)
        scale = (xmax - xmin) / q_max
        zero = jnp.round(-xmin / scale)
    return scale, zero


def act_fake_quant(
    x,
    cfg: ActQuantCfg,
    clip_max=None,
    clip_min=None,
    enabled: bool = True,
):
    """Fake-quantize activations per token (STE-differentiable).

    Identity if bits >= 16 or not enabled (quantizer `enable` switch,
    quant_utils.py:69).
    """
    if not cfg.enabled or not enabled:
        return x
    x_dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale, zero = act_scale_zero(xf, cfg, clip_max, clip_min)
    xg = _group_reshape(xf, cfg.group_size)
    if cfg.sym:
        out = sym_quant_dequant(xg, scale, cfg.q_max)
    else:
        out = asym_quant_dequant(xg, scale, zero, cfg.q_max)
    return out.reshape(x.shape).astype(x_dtype)


# ---------------------------------------------------------------------------
# weight quantization (per-out-channel, optional MSE grid search)
# ---------------------------------------------------------------------------


def _weight_rows(w, cfg: WeightQuantCfg):
    """Reshape weight into rows that each get one scale.

    perchannel + group_size>0 -> [out*groups, group]; perchannel -> [out, in];
    per-tensor -> [1, out*in].
    """
    if cfg.perchannel:
        if cfg.group_size > 0:
            return w.reshape(-1, cfg.group_size)
        return w.reshape(w.shape[0], -1)
    return w.reshape(1, -1)


def weight_find_params(w, cfg: WeightQuantCfg):
    """Compute (scale, zero) for weight w of shape [out, in].

    Returns arrays broadcastable against the row view of w:
    shape [rows, 1]. Mirrors WeightQuantizer.find_params incl. the optional
    MSE shrink search over p = 1 - i/grid for i < max_shrink*grid.
    """
    rows = _weight_rows(w.astype(jnp.float32), cfg)
    q_max = float(cfg.q_max)

    xmin = jnp.minimum(rows.min(axis=1), 0.0)
    xmax = jnp.maximum(rows.max(axis=1), 0.0)

    if cfg.sym:
        absmax = jnp.maximum(jnp.abs(xmin), xmax).clip(min=1e-5)
        scale = absmax / q_max
        zero = jnp.zeros_like(scale)
    else:
        degenerate = (xmin == 0) & (xmax == 0)
        xmin_ = jnp.where(degenerate, -1.0, xmin)
        xmax_ = jnp.where(degenerate, 1.0, xmax)
        scale = (xmax_ - xmin_).clip(min=1e-5) / q_max
        zero = jnp.round(-xmin_ / scale)

    if cfg.mse:
        if cfg.sym:
            # the shrink grid scans p * absmax (reference reassigns xmax to
            # the symmetrized absmax before the search, quant_utils.py:166)
            absmax = jnp.maximum(jnp.abs(xmin), xmax).clip(min=1e-5)
            scale, zero = _mse_shrink(rows, -absmax, absmax, scale, zero, cfg)
        else:
            # search over the degenerate-fixed bounds (the reference mutates
            # xmin/xmax in place before the grid, quant_utils.py:171-173);
            # passing the raw bounds would make all-zero rows scan scale1=0
            # and rely on NaN-comparison semantics to stay correct
            scale, zero = _mse_shrink(rows, xmin_, xmax_, scale, zero, cfg)

    return scale[:, None], zero[:, None]


def _mse_shrink(rows, xmin, xmax, scale0, zero0, cfg: WeightQuantCfg):
    """Grid search shrinking [xmin, xmax] by p, keep the argmin-Lp choice."""
    q_max = float(cfg.q_max)
    n_iters = int(cfg.max_shrink * cfg.grid)

    def body(i, carry):
        best_err, scale, zero = carry
        p = 1.0 - i.astype(jnp.float32) / cfg.grid
        xmin1 = p * xmin
        xmax1 = p * xmax
        if cfg.sym:
            scale1 = xmax1 / q_max
            zero1 = jnp.zeros_like(scale1)
            q = sym_quant_dequant(rows, scale1[:, None], q_max)
        else:
            scale1 = (xmax1 - xmin1) / q_max
            zero1 = jnp.round(-xmin1 / scale1)
            q = asym_quant_dequant(rows, scale1[:, None], zero1[:, None], q_max)
        err = jnp.sum(jnp.abs(q - rows) ** cfg.norm, axis=1)
        better = err < best_err
        return (
            jnp.where(better, err, best_err),
            jnp.where(better, scale1, scale),
            jnp.where(better, zero1, zero),
        )

    init = (jnp.full(rows.shape[0], jnp.inf, dtype=jnp.float32), scale0, zero0)
    _, scale, zero = jax.lax.fori_loop(0, n_iters, body, init)
    return scale, zero


def weight_fake_quant(w, scale, zero, cfg: WeightQuantCfg, enabled: bool = True):
    """Fake-quantize weight with precomputed (scale, zero) row params."""
    if not cfg.enabled or not enabled:
        return w
    w_dtype = w.dtype
    rows = _weight_rows(w.astype(jnp.float32), cfg)
    if cfg.sym:
        out = sym_quant_dequant(rows, scale, cfg.q_max)
    else:
        out = asym_quant_dequant(rows, scale, zero, cfg.q_max)
    return out.reshape(w.shape).astype(w_dtype)


def weight_quantize_int(w, scale, zero, cfg: WeightQuantCfg):
    """Quantize weight to integer codes (no dequant) for real-quant export."""
    rows = _weight_rows(w.astype(jnp.float32), cfg)
    if cfg.sym:
        q = sym_quant(rows, scale, cfg.q_max)
    else:
        q = asym_quant(rows, scale, zero, cfg.q_max)
    return q.reshape(w.shape).astype(jnp.int8)
