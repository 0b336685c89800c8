"""Int4 paged-free KV cache: packed storage + fused decode attention.

Replaces the reference's FlashInfer CUDA fork (deploy/kernels/include/
flashinfer/{decode,page,quantization}.cuh + kv_cache.py host logic):
  - asymmetric int4 per (token, head) over head_dim, codes 0..15 packed
    planar 2/byte with fp32 (scale, zero) per (token, head)
    (asym_quantize_and_pack_i4 analog, kv_cache.py:11-51)
  - decode attention dequantizes K/V tiles inside VMEM while streaming the
    packed cache from HBM (BatchDecodeWithPagedKVCacheKernel analog) —
    4x less cache traffic than bf16, the dominant decode cost at long
    context
  - GQA: queries grouped per kv-head so the MXU sees [n_rep, hd] x
    [hd, S_blk] tiles

TPU layout notes: head_dim is the packed axis (128 -> 64 bytes, one lane
group); the S axis tiles in BLOCK_S rows. The kernel uses one grid step
per (batch, kv_head) with an inner fori over S blocks carrying an online
softmax (m, l, acc) — the classic flash-decode recurrence.

A pure-XLA reference implementation (used on CPU and as the correctness
oracle) is provided by `decode_attention_ref`.

Four kernel generations, kept for comparison (device-traced at
llama-3-8b shapes, B=4/S=2048): v1 `decode_attention_int4` dequantizes
K/V per element (185 us); `_wide` loops kv heads in-kernel (no gain —
grid-step overhead is not the limiter); `_v3` folds scale/zero into the
score/output epilogues so per-element work is only the nibble->float
convert (119 us, 1.55x over v1; ~2.5x vs XLA bf16 attention).

`_v4` fixes the real bottleneck found by floor-kernel profiling at
llama-2-7b decode shapes (B=1, MHA, S=4096): the v1-v3 cache layouts are
DMA-pathological on TPU — u8 codes [S, hd/2] leave half of every
(32, 128) u8 VMEM tile empty (139 GB/s measured) and fp32 params [S, 2]
are 2/128-lane skinny (~50 GB/s; +200 us per call). v4 stores the cache
TRANSPOSED and lane-full: codes [B, nkv, hd/2, S] (token index on lanes,
568 GB/s measured floor) and params [B, nkv, 2, S]. The transpose also
removes all in-kernel relayouts: the two nibble planes concat along
sublanes directly into K^T [hd, S_blk] for the MXU, and scores, params,
and the causal mask all share the token-on-lanes layout. S-blocks run as
the innermost (sequential) grid dimension with VMEM scratch carrying the
online softmax, so block DMA overlaps compute. The engine uses v4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from flatquant_tpu.kernels.common import resolve_interpret
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# quantize / pack (cache writes)
# ---------------------------------------------------------------------------


def quantize_pack_kv(t, clip=None):
    """t [..., hd] -> (packed uint8 [..., hd/2], scale [..., 1], zero [..., 1]).

    Asym int4 per (token, head): codes q = clip(round(x/scale)+zero, 0, 15),
    packed planar (byte c = q[c] | q[c + hd/2] << 4).
    """
    hd = t.shape[-1]
    tf = t.astype(jnp.float32)
    tmax = jnp.maximum(jnp.max(tf, axis=-1, keepdims=True), 0.0)
    tmin = jnp.minimum(jnp.min(tf, axis=-1, keepdims=True), 0.0)
    if clip is not None:
        cmax, cmin = clip
        tmax = tmax * cmax
        tmin = tmin * cmin
    degenerate = (tmin == 0) & (tmax == 0)
    tmin = jnp.where(degenerate, -1.0, tmin)
    tmax = jnp.where(degenerate, 1.0, tmax)
    scale = (tmax - tmin) / 15.0
    zero = jnp.round(-tmin / scale)
    q = jnp.clip(jnp.round(tf / scale) + zero, 0, 15).astype(jnp.uint8)
    lo = q[..., : hd // 2]
    hi = q[..., hd // 2 :]
    return lo | (hi << 4), scale, zero


def unpack_dequant_kv(packed, scale, zero, dtype=jnp.bfloat16):
    """Inverse of quantize_pack_kv (XLA reference path)."""
    lo = (packed & 0xF).astype(jnp.float32)
    hi = ((packed >> 4) & 0xF).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-1)
    return ((q - zero) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# XLA reference decode attention
# ---------------------------------------------------------------------------


def decode_attention_ref(q, kp, ks, kz, vp, vs, vz, valid_len, sm_scale):
    """q [B, nh, hd]; kp/vp [B, nkv, S, hd/2]; ks.. [B, nkv, S, 1].

    Returns [B, nh, hd]. valid_len: scalar or [B] — positions < valid_len
    attend.
    """
    B, nkv, S, _ = kp.shape
    nh = q.shape[1]
    n_rep = nh // nkv
    k = unpack_dequant_kv(kp, ks, kz, jnp.float32)  # [B, nkv, S, hd]
    v = unpack_dequant_kv(vp, vs, vz, jnp.float32)
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=1)
        v = jnp.repeat(v, n_rep, axis=1)
    scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), k) * sm_scale
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
    lim = valid_len.reshape(-1, 1, 1) if getattr(valid_len, "ndim", 0) == 1 else valid_len
    scores = jnp.where(ids < lim, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhs,bhsd->bhd", probs, v)
    # rows with valid_len == 0 have all scores masked -> define output as 0
    # (matches the Pallas kernels' clamped online softmax)
    out = jnp.where(jnp.broadcast_to(lim, (B, 1, 1)) > 0, out, 0.0)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _decode_kernel(valid_ref, q_ref, kp_ref, kparam_ref, vp_ref, vparam_ref,
                   o_ref, *, sm_scale, block_s, hd):
    """Grid: (B, nkv). Blocks:
    q [1, n_rep, hd]; kp/vp [1, S, hd/2] (this kv head);
    kparam/vparam [1, S, 2] (scale, zero); o [1, n_rep, hd].
    Online softmax over S blocks.
    """
    b = pl.program_id(0)
    valid = valid_ref[b]
    S = kp_ref.shape[2]
    n_rep = q_ref.shape[2]
    q = q_ref[0, 0].astype(jnp.float32)  # [n_rep, hd]

    def body(si, carry):
        m, l, acc = carry
        start = si * block_s
        kp = kp_ref[0, 0, pl.ds(start, block_s), :].astype(jnp.int32)
        kpar = kparam_ref[0, 0, pl.ds(start, block_s), :]
        ksc = kpar[:, 0:1]
        kzr = kpar[:, 1:2]
        lo = (kp & 0xF).astype(jnp.float32)
        hi = (kp >> 4).astype(jnp.float32)
        kblk = jnp.concatenate([lo, hi], axis=1)  # [bs, hd] codes
        kblk = (kblk - kzr) * ksc
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [n_rep, bs]
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1) + start
        s = jnp.where(ids < valid, s, -jnp.inf)

        # clamp keeps p/corr finite when every score is masked (valid_len==0)
        m_new = jnp.maximum(jnp.maximum(m, jnp.max(s, axis=1, keepdims=True)), -1e30)
        p = jnp.exp(s - m_new)  # [n_rep, bs]
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)

        vp = vp_ref[0, 0, pl.ds(start, block_s), :].astype(jnp.int32)
        vpar = vparam_ref[0, 0, pl.ds(start, block_s), :]
        vsc = vpar[:, 0:1]
        vzr = vpar[:, 1:2]
        vlo = (vp & 0xF).astype(jnp.float32)
        vhi = (vp >> 4).astype(jnp.float32)
        vblk = jnp.concatenate([vlo, vhi], axis=1)
        vblk = (vblk - vzr) * vsc  # [bs, hd]
        acc_new = acc * corr + jax.lax.dot_general(
            p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((n_rep, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((n_rep, 1), jnp.float32)
    acc0 = jnp.zeros((n_rep, hd), jnp.float32)
    n_blocks = S // block_s
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_s", "interpret")
)
def decode_attention_int4(q, kp, kparam, vp, vparam, valid_len,
                          sm_scale: float, block_s: int = 128,
                          interpret: bool = None):
    """Fused int4-KV decode attention.

    q [B, nh, hd] (already rotated into the K space); kp/vp
    [B, nkv, S, hd/2] uint8 (head-contiguous cache layout); kparam/vparam
    [B, nkv, S, 2] fp32 (scale, zero); valid_len [B] int32.
    Returns [B, nh, hd].
    """
    B, nkv, S, hdh = kp.shape
    hd = hdh * 2
    nh = q.shape[1]
    n_rep = nh // nkv
    assert S % block_s == 0 or S <= block_s
    bs = min(block_s, S)

    # regroup queries per kv head: [B, nkv, n_rep, hd]
    qg = q.reshape(B, nkv, n_rep, hd)
    kp_t, vp_t, kparam_t, vparam_t = kp, vp, kparam, vparam

    grid = (B, nkv)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, sm_scale=sm_scale, block_s=bs, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, nkv, n_rep, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, n_rep, hd), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, hdh), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, 2), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, hdh), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, 2), lambda b, h, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, n_rep, hd), lambda b, h, *_: (b, h, 0, 0)),
        ),
        interpret=resolve_interpret(interpret),
    )(valid_len.astype(jnp.int32), qg, kp_t, kparam_t, vp_t, vparam_t)
    return out.reshape(B, nh, hd)


# ---------------------------------------------------------------------------
# wide variant: one grid step per batch element (kv heads looped in-kernel)
# ---------------------------------------------------------------------------


def _decode_kernel_wide(valid_ref, q_ref, kp_ref, kparam_ref, vp_ref,
                        vparam_ref, o_ref, *, sm_scale, block_s, hd, nkv):
    b = pl.program_id(0)
    valid = valid_ref[b]
    S = kp_ref.shape[2]
    n_rep = q_ref.shape[2]
    n_blocks = S // block_s

    def head_body(hidx, _):
        q = q_ref[0, hidx].astype(jnp.float32)  # [n_rep, hd]

        def body(si, carry):
            m, l, acc = carry
            start = si * block_s
            kp = kp_ref[0, hidx, pl.ds(start, block_s), :].astype(jnp.int32)
            kpar = kparam_ref[0, hidx, pl.ds(start, block_s), :]
            kblk = jnp.concatenate(
                [(kp & 0xF).astype(jnp.float32), (kp >> 4).astype(jnp.float32)],
                axis=1,
            )
            kblk = (kblk - kpar[:, 1:2]) * kpar[:, 0:1]
            sc = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * sm_scale
            ids = jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1) + start
            sc = jnp.where(ids < valid, sc, -jnp.inf)
            m_new = jnp.maximum(
                jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True)), -1e30)
            p = jnp.exp(sc - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            vp = vp_ref[0, hidx, pl.ds(start, block_s), :].astype(jnp.int32)
            vpar = vparam_ref[0, hidx, pl.ds(start, block_s), :]
            vblk = jnp.concatenate(
                [(vp & 0xF).astype(jnp.float32), (vp >> 4).astype(jnp.float32)],
                axis=1,
            )
            vblk = (vblk - vpar[:, 1:2]) * vpar[:, 0:1]
            acc_new = acc * corr + jax.lax.dot_general(
                p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((n_rep, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((n_rep, 1), jnp.float32)
        acc0 = jnp.zeros((n_rep, hd), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[0, hidx] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nkv, head_body, 0)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_s", "interpret"))
def decode_attention_int4_wide(q, kp, kparam, vp, vparam, valid_len,
                               sm_scale: float, block_s: int = 512,
                               interpret: bool = None):
    """decode_attention_int4 with one grid step per batch element (kv heads
    looped in-kernel) — fewer grid steps, same math."""
    B, nkv, S, hdh = kp.shape
    hd = hdh * 2
    nh = q.shape[1]
    n_rep = nh // nkv
    bs = min(block_s, S)
    qg = q.reshape(B, nkv, n_rep, hd)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_wide, sm_scale=sm_scale, block_s=bs,
                          hd=hd, nkv=nkv),
        out_shape=jax.ShapeDtypeStruct((B, nkv, n_rep, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, nkv, n_rep, hd), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, nkv, S, hdh), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, nkv, S, 2), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, nkv, S, hdh), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, nkv, S, 2), lambda b, *_: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nkv, n_rep, hd), lambda b, *_: (b, 0, 0, 0)),
        ),
        interpret=resolve_interpret(interpret),
    )(valid_len.astype(jnp.int32), qg, kp, kparam, vp, vparam)
    return out.reshape(B, nh, hd)


# ---------------------------------------------------------------------------
# v3: algebraic dequant — scale/zero fold into score/output epilogues, so
# per-element VPU work is just the nibble->float convert (the same trick as
# the W4A8 GEMM's biased-nibble epilogue):
#   q.K^T = q.(s*(C - z))^T = (q.C^T - (sum_d q_d) z^T) * s^T
#   P.V   = P.(s*(C - z))   = P'.C - (sum_t P'_t z_t),  P' = P * s
# ---------------------------------------------------------------------------


def _decode_kernel_v3(valid_ref, q_ref, kp_ref, kparam_ref, vp_ref,
                      vparam_ref, o_ref, *, sm_scale, block_s, hd):
    b = pl.program_id(0)
    valid = valid_ref[b]
    S = kp_ref.shape[2]
    n_rep = q_ref.shape[2]
    q = q_ref[0, 0].astype(jnp.float32)  # [n_rep, hd]
    qsum = jnp.sum(q, axis=1, keepdims=True)  # [n_rep, 1]

    def body(si, carry):
        m, l, acc, zacc = carry
        start = si * block_s
        kp = kp_ref[0, 0, pl.ds(start, block_s), :].astype(jnp.int32)
        kpar = kparam_ref[0, 0, pl.ds(start, block_s), :]
        ksc = kpar[:, 0]  # [bs]
        kzr = kpar[:, 1]
        ck = jnp.concatenate(
            [(kp & 0xF).astype(jnp.float32), (kp >> 4).astype(jnp.float32)], axis=1
        )  # [bs, hd] raw codes
        raw = jax.lax.dot_general(
            q, ck, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [n_rep, bs]
        sc = (raw - qsum * kzr[None, :]) * ksc[None, :] * sm_scale
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1) + start
        sc = jnp.where(ids < valid, sc, -jnp.inf)
        m_new = jnp.maximum(
            jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True)), -1e30)
        p = jnp.exp(sc - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)

        vp = vp_ref[0, 0, pl.ds(start, block_s), :].astype(jnp.int32)
        vpar = vparam_ref[0, 0, pl.ds(start, block_s), :]
        cv = jnp.concatenate(
            [(vp & 0xF).astype(jnp.float32), (vp >> 4).astype(jnp.float32)], axis=1
        )  # [bs, hd] raw codes
        p_s = p * vpar[:, 0][None, :]  # P' = P * scale
        acc_new = acc * corr + jax.lax.dot_general(
            p_s, cv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        zacc_new = zacc * corr + jnp.sum(p_s * vpar[:, 1][None, :], axis=1,
                                         keepdims=True)
        return m_new, l_new, acc_new, zacc_new

    m0 = jnp.full((n_rep, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((n_rep, 1), jnp.float32)
    acc0 = jnp.zeros((n_rep, hd), jnp.float32)
    z0 = jnp.zeros((n_rep, 1), jnp.float32)
    n_blocks = S // block_s
    m, l, acc, zacc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0, z0))
    o_ref[0, 0] = ((acc - zacc) / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_s", "interpret"))
def decode_attention_int4_v3(q, kp, kparam, vp, vparam, valid_len,
                             sm_scale: float, block_s: int = 512,
                             interpret: bool = None):
    """Algebraic-dequant int4 flash-decode (see header note)."""
    B, nkv, S, hdh = kp.shape
    hd = hdh * 2
    nh = q.shape[1]
    n_rep = nh // nkv
    bs = min(block_s, S)
    qg = q.reshape(B, nkv, n_rep, hd)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_v3, sm_scale=sm_scale, block_s=bs, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, nkv, n_rep, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, n_rep, hd), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, hdh), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, 2), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, hdh), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, 2), lambda b, h, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, n_rep, hd), lambda b, h, *_: (b, h, 0, 0)),
        ),
        interpret=resolve_interpret(interpret),
    )(valid_len.astype(jnp.int32), qg, kp, kparam, vp, vparam)
    return out.reshape(B, nh, hd)


# ---------------------------------------------------------------------------
# v4: lane-full transposed cache layout (see module docstring). Replaces the
# reference's BatchDecodeWithPagedKVCacheKernel at TPU-native layouts:
#   codes  [B, nkv, hd/2, S] uint8 — byte (c, t) packs codes (c, c+64) of
#                                     token t; token index on lanes
#   params [B, nkv, 2, S]   fp32   — rows (scale, zero); lanes align with
#                                     score lanes, no gather
# ---------------------------------------------------------------------------


def _decode_kernel_v4(valid_ref, q_ref, kp_ref, kpar_ref, vp_ref, vpar_ref,
                      o_ref, m_ref, l_ref, acc_ref, zacc_ref, *, sm_scale,
                      block_s):
    """Grid (B, nkv, S//block_s), S-blocks innermost (sequential). Blocks:
    q [1,1,n_rep,hd]; kp/vp [1,1,hd/2,bs]; kpar/vpar [1,1,2,bs];
    o [1,1,n_rep,hd] (revisited). Scratch carries the online softmax."""
    b = pl.program_id(0)
    si = pl.program_id(2)
    n_blk = pl.num_programs(2)
    valid = valid_ref[b]

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        zacc_ref[...] = jnp.zeros_like(zacc_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # [n_rep, hd]
    qsum = jnp.sum(q, axis=1, keepdims=True)  # [n_rep, 1]

    # K^T codes: two nibble planes concat along sublanes -> [hd, bs]
    kp = kp_ref[0, 0].astype(jnp.int32)  # [hd/2, bs]
    ck = jnp.concatenate([kp & 0xF, kp >> 4], axis=0).astype(jnp.float32)
    raw = jax.lax.dot_general(
        q, ck, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [n_rep, bs]
    ksc = kpar_ref[0, 0, 0:1, :]  # [1, bs]
    kzr = kpar_ref[0, 0, 1:2, :]
    sc = (raw - qsum * kzr) * ksc * sm_scale
    ids = si * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    sc = jnp.where(ids < valid, sc, -jnp.inf)

    m_prev = m_ref[...]  # [n_rep, 1]
    m_new = jnp.maximum(
        jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True)), -1e30)
    p = jnp.exp(sc - m_new)  # [n_rep, bs]
    corr = jnp.exp(m_prev - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1, keepdims=True)

    vsc = vpar_ref[0, 0, 0:1, :]
    vzr = vpar_ref[0, 0, 1:2, :]
    p_s = p * vsc  # P' = P * scale, [n_rep, bs]
    vp = vp_ref[0, 0].astype(jnp.int32)
    cv = jnp.concatenate([vp & 0xF, vp >> 4], axis=0).astype(jnp.float32)
    pv = jax.lax.dot_general(
        p_s, cv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [n_rep, hd]
    acc_ref[...] = acc_ref[...] * corr + pv
    zacc_ref[...] = zacc_ref[...] * corr + jnp.sum(p_s * vzr, axis=1,
                                                   keepdims=True)

    @pl.when(si == n_blk - 1)
    def _fin():
        l = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = ((acc_ref[...] - zacc_ref[...]) / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_s", "interpret"))
def decode_attention_int4_v4(q, kp, kparam, vp, vparam, valid_len,
                             sm_scale: float, block_s: int = 4096,
                             interpret: bool = None):
    """Lane-full transposed-layout int4 flash-decode (see header note).

    q [B, nh, hd]; kp/vp [B, nkv, hd/2, S] uint8; kparam/vparam
    [B, nkv, 2, S] fp32 (rows scale, zero); valid_len [B] int32.
    Returns [B, nh, hd].

    block_s defaults large: the block-size sweep at B=1/MHA/S=4096 gave
    512->122 us, 1024->73, 2048->50, 4096->36.7 (the DMA floor is 29.6)
    — per-grid-step overhead dominates below ~2048, while VMEM stays
    comfortable at 4096 (codes 2x256 KB + f32 intermediates ~4 MB).
    """
    B, nkv, hdh, S = kp.shape
    hd = hdh * 2
    nh = q.shape[1]
    n_rep = nh // nkv
    bs = min(block_s, S)
    while S % bs:  # largest power-of-two-ish divisor <= block_s
        bs //= 2
    assert bs >= 128 and S % bs == 0, (S, block_s)
    qg = q.reshape(B, nkv, n_rep, hd)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_v4, sm_scale=sm_scale, block_s=bs),
        out_shape=jax.ShapeDtypeStruct((B, nkv, n_rep, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nkv, S // bs),
            in_specs=[
                pl.BlockSpec((1, 1, n_rep, hd), lambda b, h, s, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, hdh, bs), lambda b, h, s, *_: (b, h, 0, s)),
                pl.BlockSpec((1, 1, 2, bs), lambda b, h, s, *_: (b, h, 0, s)),
                pl.BlockSpec((1, 1, hdh, bs), lambda b, h, s, *_: (b, h, 0, s)),
                pl.BlockSpec((1, 1, 2, bs), lambda b, h, s, *_: (b, h, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, 1, n_rep, hd), lambda b, h, s, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n_rep, 1), jnp.float32),   # m
                pltpu.VMEM((n_rep, 1), jnp.float32),   # l
                pltpu.VMEM((n_rep, hd), jnp.float32),  # acc
                pltpu.VMEM((n_rep, 1), jnp.float32),   # zacc
            ],
        ),
        interpret=resolve_interpret(interpret),
    )(valid_len.astype(jnp.int32), qg, kp, kparam, vp, vparam)
    return out.reshape(B, nh, hd)


def pack_kv_transposed(t, clip=None):
    """quantize_pack_kv + transpose to the v4 cache layout.

    t [B, S, nkv, hd] -> (codes [B, nkv, hd/2, S] uint8,
    params [B, nkv, 2, S] fp32 with rows (scale, zero))."""
    pk, sc, zr = quantize_pack_kv(t, clip)
    codes = jnp.transpose(pk, (0, 2, 3, 1))  # [B, nkv, hd/2, S]
    params = jnp.transpose(jnp.concatenate([sc, zr], -1), (0, 2, 3, 1))
    return codes, params


def untranspose_kv(codes, params):
    """v4 layout -> the decode_attention_ref layout: (packed
    [B, nkv, S, hd/2], scale [B, nkv, S, 1], zero [B, nkv, S, 1])."""
    pk = jnp.transpose(codes, (0, 1, 3, 2))
    par = jnp.transpose(params, (0, 1, 3, 2))
    return pk, par[..., 0:1], par[..., 1:2]


# ---------------------------------------------------------------------------
# chunk attention over the v4 packed cache: S_q query rows with per-row
# causal limits — the FlashInfer *append* kernel analog (the decode kernel
# generalized from one query to a chunk). Used by chunked prefill
# (serving/engine.py phase="chunk"): the chunk's K/V are already packed
# into the cache, and its queries attend history + themselves without the
# XLA path's full-cache dequant materialization.
# ---------------------------------------------------------------------------


def _chunk_kernel_v4(pos_ref, q_ref, kp_ref, kpar_ref, vp_ref, vpar_ref,
                     o_ref, m_ref, l_ref, acc_ref, zacc_ref, *, sm_scale,
                     block_s, sq):
    """Grid (B, nkv, S//block_s); q rows are (n_rep, Sq) flattened to
    [R, hd]; row r's query index is r % Sq, attending ids <= pos + r%Sq."""
    b = pl.program_id(0)
    si = pl.program_id(2)
    n_blk = pl.num_programs(2)
    pos = pos_ref[b]

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        zacc_ref[...] = jnp.zeros_like(zacc_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # [R, hd]
    R = q.shape[0]
    qsum = jnp.sum(q, axis=1, keepdims=True)

    kp = kp_ref[0, 0].astype(jnp.int32)  # [hd/2, bs]
    ck = jnp.concatenate([kp & 0xF, kp >> 4], axis=0).astype(jnp.float32)
    raw = jax.lax.dot_general(
        q, ck, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, bs]
    ksc = kpar_ref[0, 0, 0:1, :]
    kzr = kpar_ref[0, 0, 1:2, :]
    sc = (raw - qsum * kzr) * ksc * sm_scale
    ids = si * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    row_q = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % sq
    sc = jnp.where(ids <= pos + row_q, sc, -jnp.inf)

    m_prev = m_ref[...]
    m_new = jnp.maximum(
        jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True)), -1e30)
    p = jnp.exp(sc - m_new)
    corr = jnp.exp(m_prev - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1, keepdims=True)

    vsc = vpar_ref[0, 0, 0:1, :]
    vzr = vpar_ref[0, 0, 1:2, :]
    p_s = p * vsc
    vp = vp_ref[0, 0].astype(jnp.int32)
    cv = jnp.concatenate([vp & 0xF, vp >> 4], axis=0).astype(jnp.float32)
    pv = jax.lax.dot_general(
        p_s, cv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[...] = acc_ref[...] * corr + pv
    zacc_ref[...] = zacc_ref[...] * corr + jnp.sum(p_s * vzr, axis=1,
                                                   keepdims=True)

    @pl.when(si == n_blk - 1)
    def _fin():
        l = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = ((acc_ref[...] - zacc_ref[...]) / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_s", "interpret"))
def chunk_attention_int4_v4(q, kp, kparam, vp, vparam, pos, sm_scale: float,
                            block_s: int = 2048, interpret: bool = None):
    """Chunked-prefill attention over the v4 packed cache.

    q [B, Sq, nh, hd] (chunk queries, already rope'd/k-space-rotated);
    kp/vp [B, nkv, hd/2, S]; kparam/vparam [B, nkv, 2, S]; pos [B] int32 —
    the chunk's start position (row s of the chunk attends cache ids
    <= pos + s; the chunk's own packed K/V must already be written).
    Returns [B, Sq, nh, hd] in q.dtype.
    """
    B, sq, nh, hd = q.shape
    nkv = kp.shape[1]
    S = kp.shape[3]
    n_rep = nh // nkv
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    assert bs >= 128 and S % bs == 0, (S, block_s)
    # [B, Sq, nh, hd] -> [B, nkv, n_rep*Sq, hd], row r = (rep, q_idx)
    qg = q.reshape(B, sq, nkv, n_rep, hd).transpose(0, 2, 3, 1, 4)
    qg = qg.reshape(B, nkv, n_rep * sq, hd)
    R = n_rep * sq
    out = pl.pallas_call(
        functools.partial(_chunk_kernel_v4, sm_scale=sm_scale, block_s=bs,
                          sq=sq),
        out_shape=jax.ShapeDtypeStruct((B, nkv, R, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nkv, S // bs),
            in_specs=[
                pl.BlockSpec((1, 1, R, hd), lambda b, h, s, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, hd // 2, bs), lambda b, h, s, *_: (b, h, 0, s)),
                pl.BlockSpec((1, 1, 2, bs), lambda b, h, s, *_: (b, h, 0, s)),
                pl.BlockSpec((1, 1, hd // 2, bs), lambda b, h, s, *_: (b, h, 0, s)),
                pl.BlockSpec((1, 1, 2, bs), lambda b, h, s, *_: (b, h, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, 1, R, hd), lambda b, h, s, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((R, 1), jnp.float32),   # m
                pltpu.VMEM((R, 1), jnp.float32),   # l
                pltpu.VMEM((R, hd), jnp.float32),  # acc
                pltpu.VMEM((R, 1), jnp.float32),   # zacc
            ],
        ),
        interpret=resolve_interpret(interpret),
    )(pos.astype(jnp.int32), qg, kp, kparam, vp, vparam)
    # [B, nkv, n_rep, Sq, hd] -> [B, Sq, nh, hd]
    out = out.reshape(B, nkv, n_rep, sq, hd).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, sq, nh, hd)


# ---------------------------------------------------------------------------
# per-slot single-token cache write (continuous-batching decode).
#
# Three XLA formulations were device-measured at full llama-2-7b depth
# (r5): advanced-index scatter serializes on TPU (~285 us/LAYER); an
# unrolled per-slot dynamic_update_slice chain pays B x 4 op overheads
# (B=8: 24.6 ms/step); a masked select streams the whole [B, ...] cache
# every layer (B=8: ~230 us/layer, 17.1 ms/step). This kernel writes
# ONLY the touched bytes: the cache stays in HBM (memory_space=ANY,
# aliased in/out), and each slot's new token column DMAs straight into
# its [*, *, pos] lane — B x nkv x hd/2 bytes per array instead of a
# full-cache stream. The FlashInfer append-kernel analog
# (deploy/kernels/include/flashinfer/page.cuh) for the slot cache.
# ---------------------------------------------------------------------------


def _write_token_v4_kernel(pos_ref, kq_ref, kpar_ref, vq_ref, vpar_ref,
                           kp_in, kparam_in, vp_in, vparam_in,
                           kp_out, kparam_out, vp_out, vparam_out,
                           cod_s, par_s, sem):
    """Windowed read-modify-write of each slot's 128-lane window, in two
    CONCURRENT DMA waves (all copy-ins start before any wait — a
    serialized start/wait pairing measured 154 us vs the select's 132 at
    B=4; lane-dim DMA slices must be 128-aligned and width-1 VMEM lane
    stores are illegal, so the window + in-VMEM masked select is the
    minimal legal form)."""
    B = kq_ref.shape[0]

    def plan(b):
        # pos arrives pre-split as (window index, column): wid*128 is
        # statically provably 128-aligned; (pos//128)*128 is not
        win = pl.ds(pl.multiple_of(pos_ref[b, 0] * 128, 128), 128)
        return (
            (kq_ref, kp_out, cod_s.at[b, 0], 4 * b + 0, win),
            (vq_ref, vp_out, cod_s.at[b, 1], 4 * b + 1, win),
            (kpar_ref, kparam_out, par_s.at[b, 0], 4 * b + 2, win),
            (vpar_ref, vparam_out, par_s.at[b, 1], 4 * b + 3, win),
        )

    for b in range(B):  # B is static
        for upd, cache_out, scratch, si, win in plan(b):
            pltpu.make_async_copy(
                cache_out.at[b, :, :, win], scratch, sem.at[si]).start()
    for b in range(B):
        col = pos_ref[b, 1]
        for upd, cache_out, scratch, si, win in plan(b):
            pltpu.make_async_copy(
                cache_out.at[b, :, :, win], scratch, sem.at[si]).wait()
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, scratch.shape, scratch.ndim - 1)
            scratch[:] = jnp.where(lanes == col, upd[b], scratch[:])
            pltpu.make_async_copy(
                scratch, cache_out.at[b, :, :, win], sem.at[si]).start()
    for b in range(B):
        for upd, cache_out, scratch, si, win in plan(b):
            pltpu.make_async_copy(
                scratch, cache_out.at[b, :, :, win], sem.at[si]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_token_v4(kp, kparam, vp, vparam, kq, kpar, vq, vpar, pos,
                   interpret: bool = None):
    """Write each slot's single new token column into the v4 slot cache.

    kp/vp [B, nkv, hd/2, L] u8, kparam/vparam [B, nkv, 2, L] f32 (aliased
    and updated in place); kq/vq [B, nkv, hd/2, 1], kpar/vpar
    [B, nkv, 2, 1]; pos [B] int32. Returns the updated four arrays,
    bit-identical to the masked-select form."""
    B = kp.shape[0]
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _write_token_v4_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (kp, kparam, vp, vparam)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[vmem, vmem, vmem, vmem,
                      any_spec, any_spec, any_spec, any_spec],
            out_specs=(any_spec, any_spec, any_spec, any_spec),
            scratch_shapes=[
                pltpu.VMEM((B, 2, kp.shape[1], kp.shape[2], 128), kp.dtype),
                pltpu.VMEM((B, 2, kparam.shape[1], 2, 128), kparam.dtype),
                pltpu.SemaphoreType.DMA((4 * B,)),
            ],
        ),
        # aliases: operand indices count the scalar-prefetch arg
        # (pos=0) and the four VMEM updates (1-4); the cache operands
        # (5-8) alias outputs 0-3 so untouched bytes never move
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=resolve_interpret(interpret),
    )(jnp.stack([pos // 128, pos % 128], axis=1).astype(jnp.int32),
      kq, kpar, vq, vpar, kp, kparam, vp, vparam)
