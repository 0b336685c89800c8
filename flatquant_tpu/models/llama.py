"""Functional Llama-family transformer (Llama-2/3/3.1, Qwen-2.5) with
integrated FlatQuant forward modes.

One pure function replaces the reference's per-model adapter classes
(flatquant/model_tools/llama_utils.py, llama31_utils.py, qwen_utils.py).
Three forward modes:

  - "fp":    plain full-precision forward (the `_ori_mode` teacher path)
  - "calib": transforms + STE fake-quant threaded through every linear
             (the `_train_forward` path, llama_utils.py:163-286)
  - "eval":  weights already baked by reparameterization; only activation
             quant + baked activation-side transforms run
             (`_eval_forward`, flat_linear.py:75-80)

Parameters are a plain dict pytree with layer weights stacked on a leading
[L] axis so the layer loop is a `lax.scan` (one compiled layer body instead
of L inlined copies — critical for TPU compile times), and per-layer
calibration can slice out layer i with `quantize.state.slice_layer`.

Weight layout is [out_features, in_features]; matmuls are x @ W^T.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from flatquant_tpu.core.quant import act_fake_quant
from flatquant_tpu.core.transforms import apply_decompose, apply_single, single_matrix
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.quantize.linear import fq_linear_eval, fq_linear_train
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.quantize.state import LayerFQ

MODES = ("fp", "calib", "eval")


# ---------------------------------------------------------------------------
# init / params
# ---------------------------------------------------------------------------


def init_params(cfg: LlamaConfig, seed: int = 0, dtype=jnp.float32):
    """Random-weight model (tests / benches; no-egress envs have no HF)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 12)
    scale = 0.02
    L, H, I, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def w(k, *shape):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = {
        "ln1_w": jnp.ones((L, H), dtype),
        "ln2_w": jnp.ones((L, H), dtype),
        "wq": w(ks[0], L, cfg.q_dim, H),
        "wk": w(ks[1], L, cfg.kv_dim, H),
        "wv": w(ks[2], L, cfg.kv_dim, H),
        "wo": w(ks[3], L, H, cfg.q_dim),
        "wgate": w(ks[4], L, I, H),
        "wup": w(ks[5], L, I, H),
        "wdown": w(ks[6], L, H, I),
    }
    if cfg.attn_bias:
        layers["bq"] = jnp.zeros((L, cfg.q_dim), dtype)
        layers["bk"] = jnp.zeros((L, cfg.kv_dim), dtype)
        layers["bv"] = jnp.zeros((L, cfg.kv_dim), dtype)
    params = {
        "embed": w(ks[7], V, H),
        "final_norm_w": jnp.ones((H,), dtype),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = w(ks[8], V, H)
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def rms_norm(x, w, eps: float):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def _rope_inv_freq(cfg: LlamaConfig):
    import numpy as np

    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim)
    )
    rs = cfg.rope_scaling
    if rs is not None:
        # Llama-3.1 frequency-banded scaling (HF rope type "llama3")
        low_wavelen = rs.original_max_position_embeddings / rs.low_freq_factor
        high_wavelen = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        scaled = inv_freq / rs.factor
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        mid = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(
            wavelen < high_wavelen, inv_freq, np.where(wavelen > low_wavelen, scaled, mid)
        )
    return jnp.asarray(inv_freq, jnp.float32)


def rope_tables(cfg: LlamaConfig, positions):
    """cos/sin tables [S, head_dim] (fp32), HF half-rotation convention."""
    inv_freq = _rope_inv_freq(cfg)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q, k: [B, S, h, d]; cos/sin: [S, d] (broadcast over batch/heads)."""
    cos = cos[None, :, None, :].astype(q.dtype)
    sin = sin[None, :, None, :].astype(q.dtype)
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


def _head_cfg(cfg_act, head_dim: int):
    """Per-head cache quant: a group covering >= head_dim degrades to
    per-(token, head) over head_dim (the reference quantizes KV per head,
    llama_utils.py:188-200 with groupsize -1 at head granularity)."""
    if cfg_act.group_size <= 0 or cfg_act.group_size >= head_dim:
        return dataclasses.replace(cfg_act, group_size=-1)
    return cfg_act


# ---------------------------------------------------------------------------
# decoder layer
# ---------------------------------------------------------------------------


def _attention_core(cfg: LlamaConfig, q, k, v, mask):
    """Eager attention with fp32 softmax. q: [B,S,nh,d], k/v: [B,S,nkv,d]."""
    n_rep = cfg.num_heads // cfg.num_kv_heads
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(cfg.head_dim)).astype(
        q.dtype
    )
    scores = scores.astype(jnp.float32) + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def llama_layer(
    cfg: LlamaConfig,
    fq_cfg: Optional[FQConfig],
    mode: str,
    lp: dict,
    fq: Optional[LayerFQ],
    x,
    cos,
    sin,
    mask,
    with_stats: bool = False,
    with_linear_inputs: bool = False,
    attn_fn=None,
):
    """One decoder layer. lp: this layer's slice of params['layers'].

    with_stats (fp mode only): also return per-channel activation absmax of
    the three quantized-linear inputs (ln/up_gate/down) — the running-max
    statistics the sq-style diag init needs (llama_utils.py:63-71,175-179).

    with_linear_inputs (eval mode): also return the pre-act-quant inputs of
    the four linear groups {qkv, o, upgate, down} — the GPTQ Hessian
    capture points (gptq_utils.py:37-50 hooks the .linear modules; act
    fake-quant is re-applied by the GPTQ driver).
    """
    assert mode in MODES
    B, S, H = x.shape
    quant = mode != "fp" and fq is not None and fq_cfg is not None
    stats = {}
    captures = {}

    def _absmax(t):
        return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=tuple(range(t.ndim - 1)))

    def linear(h, w, b, lin_st, qa_trans=None, out_trans=None):
        if not quant:
            y = jnp.matmul(h, w.T.astype(h.dtype))
            return y + b.astype(y.dtype) if b is not None else y
        if mode == "calib":
            return fq_linear_train(
                h, w, b, lin_st, fq_cfg.w_cfg, fq_cfg.a_cfg,
                qa_trans=qa_trans, out_trans=out_trans, lwc=fq_cfg.lwc,
            )
        return fq_linear_eval(h, w, b, lin_st, fq_cfg.a_cfg)

    bq = lp.get("bq")
    bk = lp.get("bk")
    bv = lp.get("bv")

    # ---- attention ----
    h = rms_norm(x, lp["ln1_w"], cfg.rms_eps)
    if with_stats:
        stats["ln"] = _absmax(h)
    a = fq.attn if quant else None
    ln_trans = a.ln_trans if quant else None
    if quant and ln_trans is not None:
        # eval mode: diag_scale was folded into ln1_w at bake time
        h = apply_decompose(ln_trans, h)
    if with_linear_inputs:
        captures["qkv"] = h
    qa = ln_trans if mode == "calib" else None
    out_v = None
    if mode == "calib" and a is not None and not fq_cfg.separate_vtrans:
        out_v = a.vcache_trans
    q = linear(h, lp["wq"], bq, a.q_lin if quant else None, qa_trans=qa)
    k = linear(h, lp["wk"], bk, a.k_lin if quant else None, qa_trans=qa)
    v = linear(h, lp["wv"], bv, a.v_lin if quant else None, qa_trans=qa, out_trans=out_v)

    q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)

    if quant:
        # K/Q rotation + cache fake-quant, post-RoPE (llama_utils.py:188-200)
        if a.kcache_trans is not None:
            q = apply_single(a.kcache_trans, q, inv_t=True)
            k = apply_single(a.kcache_trans, k)
        if fq_cfg.q_cfg.enabled:
            q = act_fake_quant(
                q, _head_cfg(fq_cfg.q_cfg, cfg.head_dim), a.q_cache.clip_a_max, a.q_cache.clip_a_min
            )
        if fq_cfg.k_cfg.enabled:
            k = act_fake_quant(
                k, _head_cfg(fq_cfg.k_cfg, cfg.head_dim), a.k_cache.clip_a_max, a.k_cache.clip_a_min
            )
        # V transform (if not fused into v_proj) + cache fake-quant
        if fq_cfg.separate_vtrans and a.vcache_trans is not None:
            v = apply_single(a.vcache_trans, v)
        if fq_cfg.v_cfg.enabled:
            v = act_fake_quant(
                v, _head_cfg(fq_cfg.v_cfg, cfg.head_dim), a.v_cache.clip_a_max, a.v_cache.clip_a_min
            )

    if attn_fn is None:
        attn = _attention_core(cfg, q, k, v, mask)
    else:
        # pluggable attention (sequence-parallel ring, flash, ...) — same
        # [B, S, nh|nkv, hd] contract as _attention_core
        attn = attn_fn(q, k, v)

    if quant and a.o_trans is not None:
        # per-head mixing transform on the output: heads axis contraction
        # with o_trans^T (llama_utils.py:276-277); when the transform is
        # shard-aligned (size nh // tp) it mixes block-diagonally within
        # each shard's head group
        o_mat = single_matrix(a.o_trans).astype(attn.dtype)
        g = o_mat.shape[0]
        attn = attn.reshape(B, S, cfg.num_heads // g, g, cfg.head_dim)
        attn = jnp.einsum("ji,bstjd->bstid", o_mat, attn)
        attn = attn.reshape(B, S, cfg.num_heads, cfg.head_dim)
    elif quant and a.vcache_trans is not None:
        # KV-only quant: undo the V transform fused into v_proj by applying
        # Pv^{-1} over head_dim (llama_utils.py:270-274)
        v_inv = single_matrix(a.vcache_trans, inv_t=True).astype(attn.dtype)
        attn = jnp.matmul(attn, v_inv.T)
    attn = attn.reshape(B, S, cfg.q_dim)
    if with_linear_inputs:
        captures["o"] = attn
    qa_o = None
    if mode == "calib" and a is not None and a.o_trans is not None and a.vcache_trans is not None:
        qa_o = (
            single_matrix(a.o_trans, inv_t=True),
            single_matrix(a.vcache_trans, inv_t=True),
        )
    attn_out = linear(attn, lp["wo"], None, a.o_lin if quant else None, qa_trans=qa_o)
    x = x + attn_out

    # ---- mlp ----
    h2 = rms_norm(x, lp["ln2_w"], cfg.rms_eps)
    if with_stats:
        stats["up"] = _absmax(h2)
    m = fq.mlp if quant else None
    ug_trans = m.up_gate_trans if quant else None
    if quant and ug_trans is not None:
        h2 = apply_decompose(ug_trans, h2)
    if with_linear_inputs:
        captures["upgate"] = h2
    qa2 = ug_trans if mode == "calib" else None
    up = linear(h2, lp["wup"], None, m.up_lin if quant else None, qa_trans=qa2)
    gate = linear(h2, lp["wgate"], None, m.gate_lin if quant else None, qa_trans=qa2)
    act = jax.nn.silu(gate) * up
    if with_stats:
        stats["down"] = _absmax(act)
    down_trans = m.down_trans if quant else None
    if quant and down_trans is not None:
        act = apply_decompose(down_trans, act)
    if with_linear_inputs:
        captures["down"] = act
    qa3 = down_trans if mode == "calib" else None
    down = linear(act, lp["wdown"], None, m.down_lin if quant else None, qa_trans=qa3)
    out = x + down
    if with_stats:
        return out, stats
    if with_linear_inputs:
        return out, captures
    return out


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def causal_mask(S: int):
    mask = jnp.tril(jnp.ones((S, S), bool))
    return jnp.where(mask, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)


def llama_forward(
    cfg: LlamaConfig,
    params: dict,
    tokens,
    fq=None,
    fq_cfg: Optional[FQConfig] = None,
    mode: str = "fp",
    compute_dtype=jnp.bfloat16,
    positions=None,
    attn_fn=None,
):
    """Full forward over a token batch [B, S] -> fp32 logits [B, S, V].

    The layer loop is a lax.scan over stacked layer params (and stacked FQ
    state when quantizing) — single compiled layer body.

    attn_fn: optional replacement for the eager attention core (e.g. the
    sequence-parallel ring in parallel/sequence.py). When given, `positions`
    should carry the *global* positions of this shard's tokens and no local
    causal mask is built.
    """
    B, S = tokens.shape
    x = params["embed"][tokens].astype(compute_dtype)
    if positions is None:
        positions = jnp.arange(S)
    cos, sin = rope_tables(cfg, positions)
    mask = None if attn_fn is not None else causal_mask(S)

    def body(carry, layer_inputs):
        lp, lfq = layer_inputs
        out = llama_layer(cfg, fq_cfg, mode, lp, lfq, carry, cos, sin, mask,
                          attn_fn=attn_fn)
        return out, None

    x, _ = jax.lax.scan(body, x, (params["layers"], fq))

    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    head = params.get("lm_head", params["embed"])
    logits = jnp.matmul(x, head.T.astype(x.dtype))
    return logits.astype(jnp.float32)


def hidden_states_fn(cfg: LlamaConfig, params: dict, tokens, compute_dtype=jnp.bfloat16):
    """Embedding output + rope/mask — the calibration capture path
    (Catcher analog, train_utils.py:43-63, minus the exception hack)."""
    S = tokens.shape[1]
    x = params["embed"][tokens].astype(compute_dtype)
    cos, sin = rope_tables(cfg, jnp.arange(S))
    return x, cos, sin, causal_mask(S)
