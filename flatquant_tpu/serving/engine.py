"""Serving engine: prefill/decode with KV cache over the packed int4 model.

Mirrors the reference deploy semantics (SURVEY 3.3):
  - prefill attends with *unquantized* (transformed) K/V while writing the
    quantized entries into the cache (modeling_llama.py:125-137 /
    kv_cache.py:310-342)
  - decode attends fully over the quantized cache, with q rotated by
    Pk^{-T} into the transformed K space (kv_cache.py:343-359)
  - KV entries are asym-int4 per (token, head) with the k-transform applied
    pre-quant (kv_cache.py:267-289)

Cache v1 stores dequantized bf16 values (quantization error applied at
write): accuracy-identical to int4 storage, no bandwidth win yet; the
packed int4 cache + Pallas flash-decode kernel replaces the storage layer
without touching this control flow.

The whole decode step (all layers + sampling logits) is one jitted
function with `lax.scan` over layers; cache updates are functional
(donated buffers avoid copies under jit).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import rms_norm, rope_tables
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.serving.quantized import (
    _grouped_attn_in,
    _quant_linear,
    _quant_mlp_grouped,
    _quant_mlp_grouped_full,
    _quant_swiglu,
    dequantize_kv,
    kron_transform,
    kron_transform_perm,
    quantize_kv_asym,
)


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               mode: str = "bf16", n_blocks: int = 0, block_size: int = 256):
    """KV cache buffers. mode="bf16": dequantized values (quant error applied
    at write). mode="int4": packed nibbles + per-(token, head) scale/zero —
    4x less HBM traffic, read by the Pallas flash-decode kernel.
    mode="paged": block-table pool (kernels/paged_kv.py) — HBM proportional
    to allocated blocks, not batch x max_len; n_blocks=0 sizes the pool for
    the full batch x max_len capacity (plus the trash block 0), callers
    with mixed lengths pass a smaller pool. The returned "tbl" maps slot b
    to contiguous pool blocks (generate()'s static allocation; the
    continuous batcher manages tables through serving/paged.py)."""
    L, nkv, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    if mode == "paged":
        from flatquant_tpu.kernels.paged_kv import init_paged_pool

        mb = -(-max_len // block_size)
        if n_blocks <= 0:
            n_blocks = 1 + batch * mb
        pool = init_paged_pool(L, n_blocks, nkv, hd, block_size)
        n_per = min(mb, (n_blocks - 1) // max(batch, 1))
        tbl = np.zeros((batch, mb), np.int32)
        for b in range(batch):
            tbl[b, :n_per] = 1 + b * n_per + np.arange(n_per)
        pool["tbl"] = jnp.asarray(tbl)
        return pool
    if mode == "int4":
        # v4 lane-full transposed layout (kernels/kv_cache.py header):
        # codes [B, nkv, hd/2, S] u8, params [B, nkv, 2, S] f32 — token
        # index on lanes, full (32, 128) u8 VMEM tiles, measured 568 GB/s
        # vs 139 for the old [S, hd/2] layout
        return {
            "kp": jnp.zeros((L, batch, nkv, hd // 2, max_len), jnp.uint8),
            "kparam": jnp.zeros((L, batch, nkv, 2, max_len), jnp.float32),
            "vp": jnp.zeros((L, batch, nkv, hd // 2, max_len), jnp.uint8),
            "vparam": jnp.zeros((L, batch, nkv, 2, max_len), jnp.float32),
        }
    shape = (L, batch, max_len, nkv, hd)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def unstack_cache(cache: dict) -> dict:
    """Per-layer tuple cache for the unrolled layer loop.

    The stacked [L, ...] cache forces the unrolled path to jnp.stack the
    new per-layer caches back each step — a full-cache copy per decode
    token that also blocks XLA from aliasing the one-token
    dynamic-update-slice in place. Tuples keep each layer's buffer an
    independent loop-carried array: the update aliases, the copy
    disappears. The paged "tbl" has no layer axis and passes through."""
    return {k: (v if k == "tbl" else tuple(v[i] for i in range(v.shape[0])))
            for k, v in cache.items()}


def _rotate_half_rope(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_head_matrix(t, mat):
    """t [..., h, d] @ mat [d, d]."""
    return jnp.matmul(t.astype(mat.dtype), mat)


def _rope_slice(cfg, max_len: int):
    cos, sin = rope_tables(cfg, jnp.arange(max_len))
    return cos, sin


def serving_layer(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    sl: dict,
    x,
    cos,
    sin,
    ck,
    cv,
    pos,
    phase: str,
    use_kernel: bool,
    compute_dtype=jnp.bfloat16,
    tp_axis=None,
    attn_fn=None,
):
    """One quantized decoder layer.

    x: [B, S, H]; ck/cv: this layer's cache [B, Smax, nkv, hd];
    pos: first position index of x (prefill: 0, decode: current length).
    Returns (x_out, ck, cv).

    tp_axis: set when called inside a shard_map whose named axis tensor-
    shards this layer (parallel/serving_tp.py) — cfg must then be the
    LOCAL config (heads/intermediate divided by tp). Row-parallel o/down
    psum their partial outputs over the axis and quantize with global
    per-token scales (exact single-device parity); the grouped Pallas
    fast paths are bypassed because their in-kernel quant scales are
    shard-local.
    """
    B, S, H = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    k4 = fq_cfg.k_cfg.enabled
    v4 = fq_cfg.v_cfg.enabled

    def qlin(h, lin, bias=None, axis=None):
        y = _quant_linear(h.reshape(-1, h.shape[-1]), lin, use_kernel,
                          compute_dtype, quant_acts=fq_cfg.a_cfg.enabled,
                          a_q_max=fq_cfg.a_cfg.q_max, axis_name=axis)
        y = y.reshape(h.shape[:-1] + (lin["scale"].shape[0],))
        if axis is not None:
            y = jax.lax.psum(y, axis)  # row-parallel partial-sum reduce
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    # ---- attention ----
    qkv_g = (_grouped_attn_in(x.reshape(-1, H), sl, cfg.rms_eps,
                              compute_dtype, fq_cfg.a_cfg.q_max)
             if (use_kernel and fq_cfg.a_cfg.enabled and tp_axis is None)
             else None)
    if qkv_g is not None:
        # fully-grouped ln + transform + quant + merged-qkv GEMM
        # (tpu_decompose calibration; quantized._grouped_attn_in)
        qkv = qkv_g.reshape(B, S, qkv_g.shape[-1])
        if sl.get("bqkv") is not None:
            qkv = qkv + sl["bqkv"].astype(qkv.dtype)
        q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1)
    else:
        h = rms_norm(x, sl["ln1_w"], cfg.rms_eps)
        if "ln_tp" in sl:  # one-copy transposed-output form (perm weights)
            h = kron_transform_perm(h, sl["ln_tp"])
        elif "ln_t" in sl:
            h = kron_transform(h, sl["ln_t"])
        if "qkv" in sl:  # merged projection: one quant + one GEMM
            qkv = qlin(h, sl["qkv"], sl.get("bqkv"))
            q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                                axis=-1)
        else:
            q = qlin(h, sl["q"], sl.get("bq"))
            k = qlin(h, sl["k"], sl.get("bk"))
            v = qlin(h, sl["v"], sl.get("bv"))
    q = q.reshape(B, S, nh, hd)
    k = k.reshape(B, S, nkv, hd)
    v = v.reshape(B, S, nkv, hd)

    # rope at absolute positions [pos, pos+S); pos may be a scalar or a
    # per-slot [B] vector (continuous batching decode)
    from flatquant_tpu.models.llama import apply_rope

    per_slot = getattr(pos, "ndim", 0) == 1
    if per_slot:
        assert S == 1, "per-slot positions only in single-token decode"
        cos_s = cos[pos][:, None]  # [B, 1, d]
        sin_s = sin[pos][:, None]
        qf = q * cos_s[:, :, None, :].astype(q.dtype) + _rotate_half_rope(q) * sin_s[:, :, None, :].astype(q.dtype)
        kf = k * cos_s[:, :, None, :].astype(k.dtype) + _rotate_half_rope(k) * sin_s[:, :, None, :].astype(k.dtype)
        q, k = qf, kf
    else:
        cos_s = jax.lax.dynamic_slice_in_dim(cos, pos, S, axis=0)
        sin_s = jax.lax.dynamic_slice_in_dim(sin, pos, S, axis=0)
        q, k = apply_rope(q, k, cos_s, sin_s)

    # K-space transform: cache holds k·Pk; queries move to the same space
    if "k_t" in sl:
        k = _apply_head_matrix(k, sl["k_t"])
        q = _apply_head_matrix(q, sl["k_t_inv"])

    # quantize cache entries (asym per token-head)
    if k4:
        # serving KV is asymmetric (reference kv_cache.py:267-289), so the
        # grid is 2^bits - 1 regardless of the sym flag
        kq, ks, kz = quantize_kv_asym(k, sl.get("kc_clip"),
                                      q_max=(1 << fq_cfg.k_cfg.bits) - 1)
        k_store = dequantize_kv(kq, ks, kz, ck.dtype)
    else:
        k_store = k.astype(ck.dtype)
    if v4:
        vq, vs, vz = quantize_kv_asym(v, sl.get("vc_clip"),
                                      q_max=(1 << fq_cfg.v_cfg.bits) - 1)
        v_store = dequantize_kv(vq, vs, vz, cv.dtype)
    else:
        v_store = v.astype(cv.dtype)

    if per_slot:
        # masked select — beats both the advanced-index scatter (TPU
        # serializes it, ~285 us/layer at 7b dims) and an unrolled DUS
        # chain (per-op overhead dominates at batch); measured three-way in
        # serving_layer_int4cache's twin
        row = jax.lax.broadcasted_iota(jnp.int32, (B, ck.shape[1], 1, 1), 1)
        hit = row == pos[:, None, None, None]
        ck = jnp.where(hit, k_store, ck)
        cv = jnp.where(hit, v_store, cv)
    else:
        ck = jax.lax.dynamic_update_slice_in_dim(ck, k_store, pos, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v_store, pos, axis=1)

    # ---- attention scores ----
    n_rep = nh // nkv
    if phase == "prefill":
        # attend over the *unquantized* transformed k/v (reference prefill
        # accuracy trick), causal within the prompt; long prompts route
        # through flash (O(S*blk) memory) — reference flash-attn2 analog.
        # attn_fn overrides the local dispatch (sequence-parallel serving
        # passes ring_attention here; the k/v just written to the local
        # cache shard are exactly this rank's chunk)
        if attn_fn is not None:
            attn = attn_fn(q, k, v, 1.0 / float(np.sqrt(hd))).astype(
                compute_dtype)
        else:
            from flatquant_tpu.kernels.prefill_attention import (
                prefill_attention,
            )

            attn = prefill_attention(q, k, v, 1.0 / float(np.sqrt(hd)),
                                     use_kernel, compute_dtype)
    else:
        # decode, or a chunked-prefill "chunk" (S > 1 starting at pos):
        # attend over the cache — decode semantics generalized to S query
        # rows, row s seeing positions <= pos + s
        kv_len = ck.shape[1]
        k_att, v_att = ck, cv
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, kv_len), 3)
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S, 1), 2)
        limit = (pos.reshape(-1, 1, 1, 1) if per_slot else pos) + iq
        bias = jnp.where(ids <= limit, 0.0, -1e9)
        if n_rep > 1:
            k_att = jnp.repeat(k_att, n_rep, axis=2)
            v_att = jnp.repeat(v_att, n_rep, axis=2)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(compute_dtype), k_att.astype(compute_dtype)
        )
        scores = scores.astype(jnp.float32) / np.sqrt(hd) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v_att.astype(compute_dtype))

    # ---- output path ----
    if "o_tp" in sl:
        # transposed-output head mixing: [B,S,t,hd,g] @ [g,g] contracts the
        # minor dim (one layout copy, vs copy-in + copy-out around the
        # einsum's middle-dim contraction); flattens to (t, d, i) channel
        # order, matched by the o weight's permuted input channels
        o_mat = sl["o_tp"].astype(attn.dtype)
        g = o_mat.shape[0]
        attn = jnp.matmul(
            attn.reshape(B, S, nh // g, g, hd).swapaxes(-2, -1), o_mat)
    elif "o_t" in sl:
        o_mat = sl["o_t"].astype(attn.dtype)
        g = o_mat.shape[0]
        attn = attn.reshape(B, S, nh // g, g, hd)
        attn = jnp.einsum("ji,bstjd->bstid", o_mat, attn).reshape(B, S, nh, hd)
    elif "v_t_inv" in sl:
        attn = jnp.matmul(attn, sl["v_t_inv"].T.astype(attn.dtype))
    attn = attn.reshape(B, S, nh * hd)
    x = x + qlin(attn, sl["o"], axis=tp_axis)

    # ---- mlp ----
    y_full = (_quant_mlp_grouped_full(x.reshape(-1, H), sl, cfg.rms_eps,
                                      compute_dtype, fq_cfg.a_cfg.q_max)
              if (use_kernel and fq_cfg.a_cfg.enabled and tp_axis is None)
              else None)
    if y_full is not None:
        # fully-grouped MLP (tpu_decompose; quantized._quant_mlp_grouped_full)
        return x + y_full.reshape(x.shape), ck, cv
    h2 = rms_norm(x, sl["ln2_w"], cfg.rms_eps)
    if "ug_tp" in sl:
        h2 = kron_transform_perm(h2, sl["ug_tp"])
    elif "ug_t" in sl:
        h2 = kron_transform(h2, sl["ug_t"])
    y_mlp = (_quant_mlp_grouped(h2.reshape(-1, h2.shape[-1]), sl,
                                compute_dtype, fq_cfg.a_cfg.q_max)
             if (use_kernel and fq_cfg.a_cfg.enabled and tp_axis is None)
             else None)
    if y_mlp is not None:
        # relayout-free grouped pipeline (see quantized._quant_mlp_grouped)
        x = x + y_mlp.reshape(h2.shape[:-1] + (y_mlp.shape[-1],))
        return x, ck, cv
    if "upgate" in sl:
        act = _quant_swiglu(h2.reshape(-1, h2.shape[-1]), sl["upgate"],
                            use_kernel, compute_dtype,
                            fq_cfg.a_cfg.enabled, fq_cfg.a_cfg.q_max)
        act = act.reshape(h2.shape[:-1] + (act.shape[-1],))
    else:
        up = qlin(h2, sl["up"])
        gate = qlin(h2, sl["gate"])
        act = jax.nn.silu(gate) * up
    if "down_tp" in sl:
        act = kron_transform_perm(act, sl["down_tp"])
    elif "down_t" in sl:
        act = kron_transform(act, sl["down_t"])
    x = x + qlin(act, sl["down"], axis=tp_axis)
    return x, ck, cv


def serving_layer_int4cache(
    cfg, fq_cfg, sl, x, cos, sin, kp, kparam, vp, vparam, pos, phase,
    use_kernel, compute_dtype, tp_axis=None, tbl=None,
):
    """serving_layer variant over the packed int4 cache.

    Prefill: quantize+pack the prompt K/V into the cache, attend
    unquantized (reference prefill accuracy trick). Decode: one token via
    the fused int4 flash-decode kernel (kernels.kv_cache). pos may be a
    scalar or a per-slot [B] vector (continuous batching decode) — the
    kernel's valid_len is per-batch already (kernels/kv_cache.py:172-181).

    tbl is not None selects the block-table PAGED cache: kp/kparam/vp/
    vparam are then block pools [nb, nkv, hd/2|2, bs] shared across slots
    and tbl [B, max_blocks] maps slot positions to pool blocks
    (kernels/paged_kv.py; reference page growth kv_cache.py:206-225).
    Quantization math and attention numerics are identical to the slot
    cache, so both modes produce the same logits.
    """
    from flatquant_tpu.kernels.kv_cache import (
        decode_attention_int4_v4,
        decode_attention_ref,
        pack_kv_transposed,
        untranspose_kv,
    )
    from flatquant_tpu.serving.quantized import (
        _grouped_attn_in, _quant_linear, _quant_mlp_grouped,
        _quant_mlp_grouped_full, _quant_swiglu, kron_transform,
        kron_transform_perm)

    B, S, H = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def qlin(h, lin, bias=None, axis=None):
        y = _quant_linear(h.reshape(-1, h.shape[-1]), lin, use_kernel,
                          compute_dtype, quant_acts=fq_cfg.a_cfg.enabled,
                          a_q_max=fq_cfg.a_cfg.q_max, axis_name=axis)
        y = y.reshape(h.shape[:-1] + (lin["scale"].shape[0],))
        if axis is not None:
            y = jax.lax.psum(y, axis)  # row-parallel partial-sum reduce
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    qkv_g = (_grouped_attn_in(x.reshape(-1, H), sl, cfg.rms_eps,
                              compute_dtype, fq_cfg.a_cfg.q_max)
             if (use_kernel and fq_cfg.a_cfg.enabled and tp_axis is None)
             else None)
    qkv3 = None
    if qkv_g is not None:
        qkv3 = qkv_g.reshape(B, S, qkv_g.shape[-1])
        if sl.get("bqkv") is not None:
            qkv3 = qkv3 + sl["bqkv"].astype(qkv3.dtype)
    else:
        h = rms_norm(x, sl["ln1_w"], cfg.rms_eps)
        if "ln_tp" in sl:  # one-copy transposed-output form (perm weights)
            h = kron_transform_perm(h, sl["ln_tp"])
        elif "ln_t" in sl:
            h = kron_transform(h, sl["ln_t"])
        if "qkv" in sl:
            qkv3 = qlin(h, sl["qkv"], sl.get("bqkv"))
        else:
            q = qlin(h, sl["q"], sl.get("bq"))
            k = qlin(h, sl["k"], sl.get("bk"))
            v = qlin(h, sl["v"], sl.get("bv"))

    # ---- fused attention prologue + fused o path (prefill) ----
    # one Pallas pass for split+rope+k-transforms+KV-quant-pack
    # (kernels/attn_prologue.py) and one for o-transform+quant
    # (left_quant_i8_flat) — replaces ~230 us/layer of XLA layout chains
    if (qkv3 is not None and use_kernel and phase == "prefill"
            and hd == 128 and S % 128 == 0 and S >= 256
            and getattr(pos, "ndim", 0) == 0 and "k_t" in sl
            and sl.get("o_t") is not None and sl["o_t"].shape[-1] == nh
            and "wp" in sl["o"] and fq_cfg.a_cfg.enabled
            and fq_cfg.a_cfg.q_max == 7 and tp_axis is None):
        x, kp, kparam, vp, vparam = _fused_prefill_attention(
            cfg, fq_cfg, sl, x, qkv3, cos, sin, kp, kparam, vp, vparam,
            pos, use_kernel, compute_dtype, tbl=tbl)
        return _int4cache_mlp(cfg, fq_cfg, sl, x, use_kernel, compute_dtype,
                              tp_axis, qlin) + (kp, kparam, vp, vparam)

    if qkv3 is not None:
        q, k, v = jnp.split(qkv3, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                            axis=-1)
    q = q.reshape(B, S, nh, hd)
    k = k.reshape(B, S, nkv, hd)
    v = v.reshape(B, S, nkv, hd)

    from flatquant_tpu.models.llama import apply_rope

    per_slot = getattr(pos, "ndim", 0) == 1
    if per_slot:
        assert S == 1, "per-slot positions only in single-token decode"
        cos_s = cos[pos][:, None]  # [B, 1, d]
        sin_s = sin[pos][:, None]
        cb = cos_s[:, :, None, :]
        sb = sin_s[:, :, None, :]
        q = q * cb.astype(q.dtype) + _rotate_half_rope(q) * sb.astype(q.dtype)
        k = k * cb.astype(k.dtype) + _rotate_half_rope(k) * sb.astype(k.dtype)
    else:
        cos_s = jax.lax.dynamic_slice_in_dim(cos, pos, S, axis=0)
        sin_s = jax.lax.dynamic_slice_in_dim(sin, pos, S, axis=0)
        q, k = apply_rope(q, k, cos_s, sin_s)
    if "k_t" in sl:
        k = _apply_head_matrix(k, sl["k_t"])
        q = _apply_head_matrix(q, sl["k_t_inv"])

    # v4 transposed layout: new tokens land as lane columns
    kq, kpar_new = pack_kv_transposed(k, sl.get("kc_clip"))  # [B,nkv,hd/2,S]
    vq, vpar_new = pack_kv_transposed(v, sl.get("vc_clip"))
    if tbl is not None:
        from flatquant_tpu.kernels.paged_kv import (
            write_prompt_paged,
            write_token_paged,
        )

        if phase == "prefill":
            assert getattr(pos, "ndim", 0) == 0, "paged prefill starts at 0"
            kp, kparam = write_prompt_paged(kp, kparam, kq, kpar_new, tbl)
            vp, vparam = write_prompt_paged(vp, vparam, vq, vpar_new, tbl)
        elif phase == "chunk":
            # chunked prefill over the paged pool: the chunk's tokens
            # scatter through the slot's block table (chunk x paged
            # composition, VERDICT r3 item 4)
            from flatquant_tpu.kernels.paged_kv import write_chunk_paged

            assert getattr(pos, "ndim", 0) == 0, "chunk start is a scalar"
            kp, kparam = write_chunk_paged(kp, kparam, kq, kpar_new, tbl, pos)
            vp, vparam = write_chunk_paged(vp, vparam, vq, vpar_new, tbl, pos)
        else:
            assert phase == "decode" and S == 1, phase
            pos_vec = pos if per_slot else jnp.full((B,), pos, jnp.int32)
            kp, kparam = write_token_paged(kp, kparam, kq[..., 0],
                                           kpar_new[..., 0], tbl, pos_vec)
            vp, vparam = write_token_paged(vp, vparam, vq[..., 0],
                                           vpar_new[..., 0], tbl, pos_vec)
    elif per_slot:
        # each slot writes ONE token column at its own position. Four
        # formulations device-measured at full 7b depth (r5):
        #   - advanced-index scatter (r4 form): TPU serializes it,
        #     ~285 us/LAYER — B=1 decode 16.0 ms/step vs 7.05 scalar,
        #     B=8 114 ms (the batcher contract always uses vector pos);
        #   - unrolled per-slot dynamic_update_slice chain: B=1 7.05 ms
        #     but the B x 4 little ops per layer dominate at batch
        #     (B=4 14.9, B=8 24.6 ms);
        #   - masked select: streams the whole cache once per layer
        #     (B=4 131 us/layer/write-set);
        #   - write_token_v4 (Pallas windowed DMA): touches only each
        #     slot's 128-lane window, 16.9 us at B=4 under DONATED
        #     buffers (the serving regime; without donation XLA inserts
        #     a defensive full-cache copy and it degrades to the select).
        if kp.shape[3] % 128 == 0:
            from flatquant_tpu.kernels.kv_cache import write_token_v4

            kp, kparam, vp, vparam = write_token_v4(
                kp, kparam, vp, vparam, kq, kpar_new, vq, vpar_new, pos)
        else:
            # tiny test buckets (L % 128 != 0): the masked select
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (B, 1, 1, kp.shape[3]), 3)
            hit = lane == pos[:, None, None, None]
            kp = jnp.where(hit, kq, kp)
            vp = jnp.where(hit, vq, vp)
            kparam = jnp.where(hit, kpar_new, kparam)
            vparam = jnp.where(hit, vpar_new, vparam)
    else:
        kp = jax.lax.dynamic_update_slice_in_dim(kp, kq, pos, axis=3)
        vp = jax.lax.dynamic_update_slice_in_dim(vp, vq, pos, axis=3)
        kparam = jax.lax.dynamic_update_slice_in_dim(kparam, kpar_new, pos, axis=3)
        vparam = jax.lax.dynamic_update_slice_in_dim(vparam, vpar_new, pos, axis=3)

    sm_scale = 1.0 / float(np.sqrt(hd))
    if phase == "prefill":
        from flatquant_tpu.kernels.prefill_attention import prefill_attention

        attn = prefill_attention(q, k, v, sm_scale, use_kernel, compute_dtype)
    elif phase == "chunk" and tbl is not None:
        # chunk attention over the paged pool (history + this chunk read
        # through the block table)
        from flatquant_tpu.kernels.paged_kv import (
            paged_chunk_attention_int4,
            paged_chunk_attention_ref,
        )

        pos_vec = jnp.full((B,), pos, jnp.int32)
        chunk_fn = (paged_chunk_attention_int4 if use_kernel
                    else paged_chunk_attention_ref)
        attn = chunk_fn(q, kp, kparam, vp, vparam, tbl, pos_vec,
                        sm_scale).astype(compute_dtype)
    elif phase == "chunk" and use_kernel:
        # chunked prefill on-device: the Pallas chunk kernel (FlashInfer
        # append analog) streams the packed cache once — no dequant
        # materialization
        from flatquant_tpu.kernels.kv_cache import chunk_attention_int4_v4

        pos_vec = jnp.full((B,), pos, jnp.int32)
        attn = chunk_attention_int4_v4(q, kp, kparam, vp, vparam, pos_vec,
                                       sm_scale).astype(compute_dtype)
    elif phase == "chunk":
        # chunked prefill: S query rows attend over the packed cache
        # (history + this chunk, all quantized — decode semantics; the
        # one-shot prefill path keeps the reference's unquantized trick)
        from flatquant_tpu.kernels.kv_cache import unpack_dequant_kv

        kpo, kso, kzo = untranspose_kv(kp, kparam)
        vpo, vso, vzo = untranspose_kv(vp, vparam)
        k_att = unpack_dequant_kv(kpo, kso, kzo, jnp.float32)  # [B,nkv,Smax,hd]
        v_att = unpack_dequant_kv(vpo, vso, vzo, jnp.float32)
        n_rep = nh // nkv
        if n_rep > 1:
            k_att = jnp.repeat(k_att, n_rep, axis=1)
            v_att = jnp.repeat(v_att, n_rep, axis=1)
        kv_len = k_att.shape[2]
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, kv_len), 3)
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S, 1), 2)
        bias = jnp.where(ids <= pos + iq, 0.0, -1e9)
        scores = jnp.einsum(
            "bqhd,bhkd->bhqk", q.astype(jnp.float32), k_att
        ) * sm_scale + bias
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bqhd", probs, v_att).astype(compute_dtype)
    else:
        valid = (pos + 1).astype(jnp.int32) if per_slot else jnp.full(
            (B,), pos + 1, jnp.int32)
        if tbl is not None:
            from flatquant_tpu.kernels.paged_kv import (
                paged_decode_attention_int4,
                paged_decode_attention_ref,
            )

            paged_fn = (paged_decode_attention_int4 if use_kernel
                        else paged_decode_attention_ref)
            attn = paged_fn(q[:, 0], kp, kparam, vp, vparam, tbl, valid,
                            sm_scale)[:, None]
        elif use_kernel:
            attn = decode_attention_int4_v4(
                q[:, 0], kp, kparam, vp, vparam, valid, sm_scale
            )[:, None]
        else:
            kpo, kso, kzo = untranspose_kv(kp, kparam)
            vpo, vso, vzo = untranspose_kv(vp, vparam)
            attn = decode_attention_ref(
                q[:, 0], kpo, kso, kzo, vpo, vso, vzo, valid, sm_scale
            )[:, None]

    if "o_tp" in sl:
        # transposed-output head mixing: [B,S,t,hd,g] @ [g,g] contracts the
        # minor dim (one layout copy, vs copy-in + copy-out around the
        # einsum's middle-dim contraction); flattens to (t, d, i) channel
        # order, matched by the o weight's permuted input channels
        o_mat = sl["o_tp"].astype(attn.dtype)
        g = o_mat.shape[0]
        attn = jnp.matmul(
            attn.reshape(B, S, nh // g, g, hd).swapaxes(-2, -1), o_mat)
    elif "o_t" in sl:
        o_mat = sl["o_t"].astype(attn.dtype)
        g = o_mat.shape[0]
        attn = attn.reshape(B, S, nh // g, g, hd)
        attn = jnp.einsum("ji,bstjd->bstid", o_mat, attn).reshape(B, S, nh, hd)
    elif "v_t_inv" in sl:
        attn = jnp.matmul(attn, sl["v_t_inv"].T.astype(attn.dtype))
    attn = attn.reshape(B, S, nh * hd)
    x = x + qlin(attn, sl["o"], axis=tp_axis)

    return _int4cache_mlp(cfg, fq_cfg, sl, x, use_kernel, compute_dtype,
                          tp_axis, qlin) + (kp, kparam, vp, vparam)


def _int4cache_mlp(cfg, fq_cfg, sl, x, use_kernel, compute_dtype, tp_axis,
                   qlin):
    """The MLP half of a serving layer; returns (x_out,) so callers can
    append their cache state."""
    from flatquant_tpu.serving.quantized import (
        _quant_mlp_grouped,
        _quant_mlp_grouped_full,
        _quant_swiglu,
        kron_transform,
        kron_transform_perm,
    )

    H = x.shape[-1]
    y_full = (_quant_mlp_grouped_full(x.reshape(-1, H), sl, cfg.rms_eps,
                                      compute_dtype, fq_cfg.a_cfg.q_max)
              if (use_kernel and fq_cfg.a_cfg.enabled and tp_axis is None)
              else None)
    if y_full is not None:
        # fully-fused MLP (tpu_decompose; quantized._quant_mlp_grouped_full)
        return (x + y_full.reshape(x.shape),)
    h2 = rms_norm(x, sl["ln2_w"], cfg.rms_eps)
    if "ug_tp" in sl:
        h2 = kron_transform_perm(h2, sl["ug_tp"])
    elif "ug_t" in sl:
        h2 = kron_transform(h2, sl["ug_t"])
    y_mlp = (_quant_mlp_grouped(h2.reshape(-1, h2.shape[-1]), sl,
                                compute_dtype, fq_cfg.a_cfg.q_max)
             if (use_kernel and fq_cfg.a_cfg.enabled and tp_axis is None)
             else None)
    if y_mlp is not None:
        return (x + y_mlp.reshape(h2.shape[:-1] + (y_mlp.shape[-1],)),)
    if "upgate" in sl:
        act = _quant_swiglu(h2.reshape(-1, h2.shape[-1]), sl["upgate"],
                            use_kernel, compute_dtype,
                            fq_cfg.a_cfg.enabled, fq_cfg.a_cfg.q_max)
        act = act.reshape(h2.shape[:-1] + (act.shape[-1],))
    else:
        up = qlin(h2, sl["up"])
        gate = qlin(h2, sl["gate"])
        act = jax.nn.silu(gate) * up
    if "down_tp" in sl:
        act = kron_transform_perm(act, sl["down_tp"])
    elif "down_t" in sl:
        act = kron_transform(act, sl["down_t"])
    return (x + qlin(act, sl["down"], axis=tp_axis),)


def _fused_prefill_attention(cfg, fq_cfg, sl, x, qkv3, cos, sin, kp, kparam,
                             vp, vparam, pos, use_kernel, compute_dtype,
                             tbl=None):
    """Prefill attention through the fused prologue + fused o path.

    qkv3: the merged-projection output [B, S, (nh + 2*nkv)*128]. Writes
    the packed int4 K/V into the v4 cache at `pos` (or, when tbl is set,
    scatters them into the paged block pool), attends unquantized via
    flash (reference prefill trick), and runs the o-transform + quant
    as one left_quant_i8_flat pass (the o head-mixing is a left Kronecker
    factor with identity right factor). Returns (x_out, kp, kparam, vp,
    vparam)."""
    from flatquant_tpu.kernels.attn_prologue import attn_prologue
    from flatquant_tpu.kernels.flat_pipeline import left_quant_i8_flat
    from flatquant_tpu.kernels.int4_matmul import w4a4_matmul_i8

    B, S, _ = qkv3.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos_s = jax.lax.dynamic_slice_in_dim(cos, pos, S, axis=0)
    sin_s = jax.lax.dynamic_slice_in_dim(sin, pos, S, axis=0)
    qf, kf, vf, kq_c, kpar_c, vq_c, vpar_c = attn_prologue(
        qkv3, cos_s, sin_s, sl["k_t"], sl["k_t_inv"],
        sl.get("kc_clip"), sl.get("vc_clip"), nh=nh, nkv=nkv)
    # codes/params arrive in the v4 transposed cache layout already (the
    # kernel writes lane-full; r3 paid XLA u8/f32 transposes here)
    if tbl is not None:
        from flatquant_tpu.kernels.paged_kv import write_prompt_paged

        kp, kparam = write_prompt_paged(kp, kparam, kq_c, kpar_c, tbl)
        vp, vparam = write_prompt_paged(vp, vparam, vq_c, vpar_c, tbl)
    else:
        kp = jax.lax.dynamic_update_slice_in_dim(kp, kq_c, pos, axis=3)
        kparam = jax.lax.dynamic_update_slice_in_dim(kparam, kpar_c, pos,
                                                     axis=3)
        vp = jax.lax.dynamic_update_slice_in_dim(vp, vq_c, pos, axis=3)
        vparam = jax.lax.dynamic_update_slice_in_dim(vparam, vpar_c, pos,
                                                     axis=3)

    sm_scale = 1.0 / float(np.sqrt(hd))
    # kf arrives TRANSPOSED [B, nkv, hd, S] from the prologue — the flash
    # kt kernel consumes it directly; short prompts fall back to the
    # dense path on the untransposed view
    from flatquant_tpu.kernels.prefill_attention import (
        dense_causal_attention,
        flash_prefill_attention_kt,
    )

    q4 = qf.reshape(B, S, nh, hd)
    v4 = vf.reshape(B, S, nkv, hd)
    if S >= 1024 and S % 128 == 0:
        attn = flash_prefill_attention_kt(q4, kf, v4, sm_scale)
    else:
        attn = dense_causal_attention(
            q4, jnp.transpose(kf, (0, 3, 1, 2)), v4, sm_scale,
            compute_dtype)
    # o path: head mixing (einsum ji,...) == left factor o_t.T; quant scale
    # rule identical to the serving XLA chain
    zq, zs = left_quant_i8_flat(
        sl["o_t"].T, attn.reshape(B * S, nh * hd).astype(jnp.bfloat16),
        clip=sl["o"].get("a_clip"), q_max=fq_cfg.a_cfg.q_max)
    y = w4a4_matmul_i8(zq, zs, sl["o"]["wp"], sl["o"]["scale"],
                       compute_dtype)
    return x + y.reshape(B, S, -1), kp, kparam, vp, vparam


def _last_hidden(x, last_idx):
    """Hidden state of the last *real* token: x[:, -1], or per-batch
    last_idx when the prompt was right-padded to a length bucket."""
    if last_idx is None:
        return x[:, -1]
    return x[jnp.arange(x.shape[0]), last_idx]


def _forward(cfg, fq_cfg, sp, tokens, cache, pos, phase, use_kernel, max_len,
             compute_dtype=jnp.bfloat16, last_idx=None, tp_axis=None):
    B, S = tokens.shape
    x = sp["embed"][tokens].astype(compute_dtype)
    cos, sin = _rope_slice(cfg, max_len)

    if isinstance(sp["layers"], (list, tuple)):
        # unrolled layer loop: each layer's weights are independent buffers,
        # avoiding the scan's per-iteration dynamic-slice COPY of the packed
        # weights (device traces showed ~125 us/layer of slice-copy traffic,
        # an extra full weight read+write). Compile time grows with depth;
        # use for latency-critical serving of moderate-depth models.
        n_layers = len(sp["layers"])
        # a tuple-valued cache (unstack_cache) round-trips per-layer
        # buffers without the end-of-step jnp.stack — the one-token
        # dynamic-update-slice then aliases in place across loop steps
        tup = isinstance(cache["kp" if "kp" in cache else "k"],
                         (list, tuple))
        repack = (lambda xs: tuple(xs)) if tup else jnp.stack
        if "kp" in cache:
            tbl = cache.get("tbl")
            kps, kpars, vps, vpars = [], [], [], []
            for i, sl in enumerate(sp["layers"]):
                x, kp_i, kparam_i, vp_i, vparam_i = serving_layer_int4cache(
                    cfg, fq_cfg, sl, x, cos, sin, cache["kp"][i], cache["kparam"][i],
                    cache["vp"][i], cache["vparam"][i], pos, phase, use_kernel,
                    compute_dtype, tp_axis=tp_axis, tbl=tbl,
                )
                kps.append(kp_i); kpars.append(kparam_i)
                vps.append(vp_i); vpars.append(vparam_i)
            x = rms_norm(x, sp["final_norm_w"], cfg.rms_eps)
            logits = jnp.matmul(_last_hidden(x, last_idx), sp["lm_head"].T.astype(x.dtype))
            out_cache = {
                "kp": repack(kps), "kparam": repack(kpars),
                "vp": repack(vps), "vparam": repack(vpars),
            }
            if tbl is not None:
                out_cache["tbl"] = tbl
            return logits.astype(jnp.float32), out_cache
        cks, cvs = [], []
        for i, sl in enumerate(sp["layers"]):
            x, ck_i, cv_i = serving_layer(
                cfg, fq_cfg, sl, x, cos, sin, cache["k"][i], cache["v"][i],
                pos, phase, use_kernel, compute_dtype, tp_axis=tp_axis,
            )
            cks.append(ck_i); cvs.append(cv_i)
        x = rms_norm(x, sp["final_norm_w"], cfg.rms_eps)
        logits = jnp.matmul(_last_hidden(x, last_idx), sp["lm_head"].T.astype(x.dtype))
        return logits.astype(jnp.float32), {"k": repack(cks), "v": repack(cvs)}

    if "kp" in cache:  # packed int4 cache mode (slot or paged)
        assert fq_cfg.k_cfg.bits == 4 and fq_cfg.v_cfg.bits == 4, (
            "the packed cache layout is int4 nibbles; use the bf16 cache "
            "mode for kv16/kv8 configs (kv8 quantizes at write there)"
        )
        tbl = cache.get("tbl")

        def body4(carry, xs):
            x = carry
            sl, kp, kparam, vp, vparam = xs
            x, kp, kparam, vp, vparam = serving_layer_int4cache(
                cfg, fq_cfg, sl, x, cos, sin, kp, kparam, vp, vparam, pos,
                phase, use_kernel, compute_dtype, tp_axis=tp_axis, tbl=tbl,
            )
            return x, (kp, kparam, vp, vparam)

        x, (kp, kparam, vp, vparam) = jax.lax.scan(
            body4, x,
            (sp["layers"], cache["kp"], cache["kparam"], cache["vp"], cache["vparam"]),
        )
        x = rms_norm(x, sp["final_norm_w"], cfg.rms_eps)
        logits = jnp.matmul(_last_hidden(x, last_idx), sp["lm_head"].T.astype(x.dtype))
        out_cache = {"kp": kp, "kparam": kparam, "vp": vp, "vparam": vparam}
        if tbl is not None:
            out_cache["tbl"] = tbl
        return logits.astype(jnp.float32), out_cache

    def body(carry, xs):
        x = carry
        sl, ck, cv = xs
        x, ck, cv = serving_layer(
            cfg, fq_cfg, sl, x, cos, sin, ck, cv, pos, phase, use_kernel,
            compute_dtype, tp_axis=tp_axis,
        )
        return x, (ck, cv)

    x, (ck_new, cv_new) = jax.lax.scan(body, x, (sp["layers"], cache["k"], cache["v"]))
    x = rms_norm(x, sp["final_norm_w"], cfg.rms_eps)
    logits = jnp.matmul(_last_hidden(x, last_idx), sp["lm_head"].T.astype(x.dtype))
    return logits.astype(jnp.float32), {"k": ck_new, "v": cv_new}


def serving_all_logits(cfg, fq_cfg, sp, tokens, use_kernel=False,
                       compute_dtype=jnp.bfloat16):
    """Full-sequence logits [B, S, V] through the real-quant serving stack
    (prefill-phase layers). The lm-eval loglikelihood path over packed
    weights — the reference's benchmark_lm_eval.py runs QA through its
    real-quant model the same way."""
    B, S = tokens.shape
    cache = init_cache(cfg, B, S, dtype=compute_dtype)
    x = sp["embed"][tokens].astype(compute_dtype)
    cos, sin = _rope_slice(cfg, S)

    def body(carry, xs):
        x = carry
        sl, ck, cv = xs
        x, _, _ = serving_layer(cfg, fq_cfg, sl, x, cos, sin, ck, cv, 0,
                                "prefill", use_kernel, compute_dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, (sp["layers"], cache["k"], cache["v"]))
    x = rms_norm(x, sp["final_norm_w"], cfg.rms_eps)
    return jnp.matmul(x, sp["lm_head"].T.astype(x.dtype)).astype(jnp.float32)


def unstack_serving_layers(sp: dict) -> dict:
    """Convert stacked layer params to a per-layer list (unrolled loop)."""
    import jax as _jax

    n = _jax.tree.leaves(sp["layers"])[0].shape[0]
    out = dict(sp)
    out["layers"] = [
        _jax.tree.map(lambda a: a[i], sp["layers"]) for i in range(n)
    ]
    return out


@partial(jax.jit, static_argnames=("cfg", "fq_cfg", "use_kernel", "max_len", "compute_dtype"))
def serving_prefill(cfg, fq_cfg, sp, tokens, cache, use_kernel=True, max_len=2048,
                    compute_dtype=jnp.bfloat16):
    """Process the prompt; returns (last-token logits [B, V], cache)."""
    return _forward(cfg, fq_cfg, sp, tokens, cache, 0, "prefill", use_kernel,
                    max_len, compute_dtype)


@partial(jax.jit, static_argnames=("cfg", "fq_cfg", "use_kernel", "max_len", "compute_dtype"), donate_argnames=("cache",))
def serving_decode_step(cfg, fq_cfg, sp, token, cache, pos, use_kernel=True,
                        max_len=2048, compute_dtype=jnp.bfloat16):
    """One decode step. token: [B, 1] int32, pos: scalar current length."""
    return _forward(cfg, fq_cfg, sp, token, cache, pos, "decode", use_kernel,
                    max_len, compute_dtype)


def sample_token(logits, temperature: float = 0.0, key=None):
    """Greedy (temperature 0) or temperature sampling (generate loop,
    main_dpskv3.py:26-43 analog)."""
    if temperature <= 0.0 or key is None:
        return jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
    return jax.random.categorical(key, logits / temperature, axis=-1)[:, None].astype(jnp.int32)


def generate(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    sp: dict,
    prompt: np.ndarray,
    max_new_tokens: int = 32,
    max_len: int = 2048,
    use_kernel: bool = True,
    temperature: float = 0.0,
    seed: int = 0,
    cache_mode: str = "bf16",
    compute_dtype=jnp.bfloat16,
):
    """Generation (host loop over jitted steps); temperature 0 = greedy."""
    B, S = prompt.shape
    cache = init_cache(cfg, B, max_len, mode=cache_mode,
                       dtype=compute_dtype if cache_mode == "bf16" else jnp.bfloat16)
    logits, cache = serving_prefill(
        cfg, fq_cfg, sp, jnp.asarray(prompt), cache, use_kernel=use_kernel,
        max_len=max_len, compute_dtype=compute_dtype,
    )
    key = jax.random.PRNGKey(seed)
    out = []
    key, sub = jax.random.split(key)
    tok = sample_token(logits, temperature, sub)
    pos = S
    for _ in range(max_new_tokens):
        out.append(np.asarray(tok))
        logits, cache = serving_decode_step(
            cfg, fq_cfg, sp, tok, cache, jnp.int32(pos), use_kernel=use_kernel,
            max_len=max_len, compute_dtype=compute_dtype,
        )
        key, sub = jax.random.split(key)
        tok = sample_token(logits, temperature, sub)
        pos += 1
    return np.concatenate(out, axis=1)
