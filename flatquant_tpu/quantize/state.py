"""Per-layer FlatQuant state: transforms + clip factors as one pytree.

This replaces the reference's module surgery (apply_flatquant_to_llama,
llama_utils.py:328-336) with a *state pytree alongside the model params*:
the model forward takes (params, fq_state, mode) and threads transforms
into each linear. Creation conditions mirror add_fq_trans
(llama_utils.py:141-162) and the cache quantizers (llama_utils.py:123-131).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from flatquant_tpu.core.transforms import (
    AnyDecompose,
    AnySingle,
    bake_decompose,
    bake_single,
    init_decompose,
    init_single,
)
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.quantize.linear import LinearQuantState, init_linear_state
from flatquant_tpu.quantize.spec import FQConfig


@struct.dataclass
class CacheQuantState:
    """LAC clip factors for a KV/Q cache quantizer (None = no LAC)."""

    clip_a_max: Optional[jnp.ndarray]
    clip_a_min: Optional[jnp.ndarray]


def _init_cache_state(lac: bool) -> CacheQuantState:
    init = 4.0
    return CacheQuantState(
        clip_a_max=jnp.full((1,), init, jnp.float32) if lac else None,
        clip_a_min=jnp.full((1,), init, jnp.float32) if lac else None,
    )


@struct.dataclass
class AttnFQ:
    ln_trans: Optional[AnyDecompose]
    o_trans: Optional[AnySingle]  # acts on num_heads
    kcache_trans: Optional[AnySingle]  # acts on head_dim, post-RoPE
    vcache_trans: Optional[AnySingle]  # acts on head_dim, fused into v_proj
    q_lin: LinearQuantState
    k_lin: LinearQuantState
    v_lin: LinearQuantState
    o_lin: LinearQuantState
    q_cache: CacheQuantState
    k_cache: CacheQuantState
    v_cache: CacheQuantState


@struct.dataclass
class MlpFQ:
    up_gate_trans: Optional[AnyDecompose]
    down_trans: Optional[AnyDecompose]
    up_lin: LinearQuantState
    gate_lin: LinearQuantState
    down_lin: LinearQuantState


@struct.dataclass
class LayerFQ:
    attn: AttnFQ
    mlp: MlpFQ


def init_layer_fq(cfg: LlamaConfig, fq: FQConfig, rng: np.random.Generator,
                  tp: int = 1) -> LayerFQ:
    """tp > 1: shard-aligned transforms. The transforms acting on
    row-parallel-sharded dims (down_trans on intermediate, o_trans on
    heads) are built at size dim // tp; `kronecker_matmul`/`apply_single`'s
    reshape then applies them block-diagonally, one identical block per TP
    shard — shard-local with zero cross-shard collectives (the reference's
    per-rank trans, vllm llama_flatquant.py:110, with the block shared
    across ranks so calibration stays single-program)."""
    wa_quant = fq.w_bits < 16 or fq.a_bits < 16
    ln_trans = o_trans = kcache = vcache = None
    up_gate = down = None
    if wa_quant:
        assert cfg.intermediate_size % tp == 0 and cfg.num_heads % tp == 0
        ln_trans = init_decompose(
            cfg.hidden_size, rng, add_diag=fq.add_diag,
            direct_inv=fq.direct_inv, rn128=fq.tpu_decompose,
        )
        o_trans = init_single(cfg.num_heads // tp, rng, direct_inv=fq.direct_inv)
        up_gate = init_decompose(
            cfg.hidden_size, rng, add_diag=fq.add_diag,
            direct_inv=fq.direct_inv, rn128=fq.tpu_decompose,
        )
        down = init_decompose(
            cfg.intermediate_size // tp, rng, add_diag=fq.add_diag,
            direct_inv=fq.direct_inv, rn128=fq.tpu_decompose,
        )
    if fq.k_bits < 16 or fq.q_bits < 16:
        kcache = init_single(cfg.head_dim, rng, direct_inv=fq.direct_inv)
    if fq.v_bits < 16 or wa_quant:
        vcache = init_single(cfg.head_dim, rng, direct_inv=fq.direct_inv)

    lin = lambda out: init_linear_state(out, fq.lwc, fq.lac)
    attn = AttnFQ(
        ln_trans=ln_trans,
        o_trans=o_trans,
        kcache_trans=kcache,
        vcache_trans=vcache,
        q_lin=lin(cfg.q_dim),
        k_lin=lin(cfg.kv_dim),
        v_lin=lin(cfg.kv_dim),
        o_lin=lin(cfg.hidden_size),
        q_cache=_init_cache_state(fq.lac and fq.q_bits < 16),
        k_cache=_init_cache_state(fq.lac and fq.k_bits < 16),
        v_cache=_init_cache_state(fq.lac and fq.v_bits < 16),
    )
    mlp = MlpFQ(
        up_gate_trans=up_gate,
        down_trans=down,
        up_lin=lin(cfg.intermediate_size),
        gate_lin=lin(cfg.intermediate_size),
        down_lin=lin(cfg.hidden_size),
    )
    return LayerFQ(attn=attn, mlp=mlp)


def init_model_fq(cfg: LlamaConfig, fq: FQConfig, seed: int = 0, tp: int = 1):
    """Stacked LayerFQ for all layers: every leaf gets a leading [L] axis.

    tp > 1 builds shard-aligned down/o transforms (see init_layer_fq)."""
    rng = np.random.default_rng(seed)
    per_layer = [init_layer_fq(cfg, fq, rng, tp=tp) for _ in range(cfg.num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def slice_layer(stacked, i: int):
    """Extract layer i's pytree from a stacked (leading [L]) pytree."""
    return jax.tree.map(lambda a: a[i], stacked)


def set_layer(stacked, i: int, layer):
    return jax.tree.map(lambda s, a: s.at[i].set(a), stacked, layer)


def bake_layer_fq(layer_fq: LayerFQ) -> LayerFQ:
    """Freeze all transforms into fixed matrices (to_eval_mode analog)."""
    mb = lambda t, f: None if t is None else f(t)
    attn = layer_fq.attn.replace(
        ln_trans=mb(layer_fq.attn.ln_trans, bake_decompose),
        o_trans=mb(layer_fq.attn.o_trans, bake_single),
        kcache_trans=mb(layer_fq.attn.kcache_trans, bake_single),
        vcache_trans=mb(layer_fq.attn.vcache_trans, bake_single),
    )
    mlp = layer_fq.mlp.replace(
        up_gate_trans=mb(layer_fq.mlp.up_gate_trans, bake_decompose),
        down_trans=mb(layer_fq.mlp.down_trans, bake_decompose),
    )
    return LayerFQ(attn=attn, mlp=mlp)
