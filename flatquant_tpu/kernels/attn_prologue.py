"""Fused attention prologue: qkv split + rope + K-space transforms +
int4 KV-cache quantize/pack in ONE kernel pass.

After the merged qkv GEMM, the serving prefill used to run an XLA chain of
~8 ops per layer (split + head reshapes, rope, the k_t / k_t_inv head
matmuls, asym-int4 KV quantization, nibble packing, and the v4-layout
transposes), device-traced at ~230 us/layer of mostly layout traffic at
llama-2-7b S=2048 — every op re-streaming 16-50 MB through HBM with XLA
choosing incompatible layouts between them ({2,0,1} rope outputs forcing
copies into the flash kernel and the quant chain).

This kernel streams the [S, (nh+2*nkv)*128] qkv GEMM output once and
emits everything the rest of the layer needs, all in flat row-major
layouts (zero downstream relayouts):

  q_rot [B, S, nh*128]   roped, rotated by Pk^{-T} (flash-ready)
  k_rot [B, nkv, 128, S] roped, rotated by Pk, TRANSPOSED for the flash
                         kt kernel's stationary QK operand (the prefill
                         attends UNQUANTIZED per the reference trick,
                         modeling_llama.py:125-137)
  v     [B, S, nkv*128]  passthrough (flash-ready)
  k/v codes  [B, nkv, 64, S] u8  planar int4 nibbles (c | c+64 << 4)
  k/v params [B, nkv, 2, S] f32  (row 0 scale, row 1 zero)

The codes/params come out directly in the v4 TRANSPOSED cache layout
(token index on lanes): an int32 in-kernel tile transpose before the u8
narrowing makes every HBM write lane-full, where the r3 version wrote
64-/2-lane token-major tiles and paid XLA transposes in the engine.

Numerics are pinned op-for-op to the composed chain (rope in bf16,
head matmuls bf16 with f32 accumulation, quantization in f32 — see
kv_cache.quantize_pack_kv); rotate-half is computed as
roll(x, 64) * sign-folded sin so no sub-128 lane slicing is needed.

Reference analog: the FlashInfer append path + CUDA quant
(deploy/kernels/include/flashinfer/page.cuh, quantization.cuh) — which
fuses only the quantize+append; rope and the FlatQuant k-transform stay
separate torch ops there (deploy/transformers/modeling_llama.py:88-123).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from flatquant_tpu.kernels.common import resolve_interpret
from jax.experimental.pallas import tpu as pltpu


def _quant_pack_head(tf, cmax, cmin):
    """Asym int4 per token over 128 lanes; returns (codes i32 [bt, 64] —
    the caller transposes before the u8 narrowing, 32-bit transposes being
    the supported kind — scale [bt, 1] f32, zero [bt, 1] f32). Math
    identical to kv_cache.quantize_pack_kv."""
    tmax = jnp.maximum(jnp.max(tf, axis=-1, keepdims=True), 0.0) * cmax
    tmin = jnp.minimum(jnp.min(tf, axis=-1, keepdims=True), 0.0) * cmin
    degenerate = (tmin == 0) & (tmax == 0)
    tmin = jnp.where(degenerate, -1.0, tmin)
    tmax = jnp.where(degenerate, 1.0, tmax)
    scale = (tmax - tmin) / 15.0
    zero = jnp.round(-tmin / scale)
    q = jnp.clip(jnp.round(tf / scale) + zero, 0, 15).astype(jnp.int32)
    # planar pack: byte c = q[c] | q[c+64] << 4 (int32 math — Mosaic has
    # no u8 vector shifts)
    byte = q[:, :64] + q[:, 64:] * 16
    return byte, scale, zero


def _attn_prologue_kernel(qkv_ref, cos_ref, sin_ref, kt_ref,
                          kti_ref, clip_ref, q_ref, k_ref, v_ref, kq_ref,
                          kp_ref, vq_ref, vp_ref, *, nh, nkv):
    """All heads batched into single MXU dots on grouped [g*bt, 128] views.

    The first version looped heads with [bt, 128] x [128, 128] dots —
    128 tiny MXU issues per grid step, device-traced at 398 us/layer
    (2026-08-20). The head transforms (rot, kt, kti) are the SAME matrix
    for every head, so grouping lane blocks onto the leading axis (tile
    placement, the left_quant_i8_flat idiom) turns them into 6 large
    dots per grid step and vectorizes quant across all (head, token)
    rows at once."""
    bt = cos_ref.shape[0]
    cos = cos_ref[:]  # [bt, 128] bf16
    sin = sin_ref[:]  # SIGN-FOLDED for the rotate-half roll (see wrapper)
    kt = kt_ref[:]
    kti = kti_ref[:]
    qoff = nh * 128
    voff = (nh + nkv) * 128

    def grouped(base, g):
        # [bt, g*128] lane groups -> [g*bt, 128]: tile placement + a
        # leading-dim collapse (no lane-crossing reshape)
        return jnp.concatenate(
            [qkv_ref[0, :, base + i * 128:base + (i + 1) * 128][None]
             for i in range(g)], axis=0).reshape(g * bt, 128)

    def ungroup(x2, g, out_ref):
        # [g*bt, 128] -> [bt, g*128] lane placement into the flat output
        x3 = x2.reshape(g, bt, 128)
        out_ref[0] = jnp.concatenate([x3[i] for i in range(g)], axis=1)

    def tile_rows(t, g):
        return jnp.broadcast_to(t[None], (g, bt, 128)).reshape(g * bt, 128)

    def rope_all(x, g):
        # x*cos + rotate_half(x)*sin, bf16 (matches models.llama.apply_rope).
        # rotate_half = sign-folded STATIC lane roll: roll(x, 64) gives
        # [x_hi, x_lo] exactly, and the required [-x_hi, x_lo] sign lives
        # pre-folded in the sin table (wrapper) — so no MXU permutation
        # dot. r4 ran rotate_half as a +-1 matrix dot; at [g*bt, 128]
        # that was 2 of the 4 MXU dots per grid step (device ablation
        # 2026-08-21: the prologue's I/O floor is 169 us vs 300 real —
        # the gap is mostly these small dots). Mosaic only rotates
        # 32-bit data, so the roll runs on an f32 widening — bf16
        # values widen and re-narrow exactly, keeping the output
        # bit-identical to the matrix form.
        rx = pltpu.roll(x.astype(jnp.float32), 64, axis=1).astype(x.dtype)
        return x * tile_rows(cos, g) + rx * tile_rows(sin, g)

    qr = jax.lax.dot_general(
        rope_all(grouped(0, nh), nh), kti, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(q_ref.dtype)
    ungroup(qr, nh, q_ref)

    def store_quant(t, q_out, p_out, cmax, cmin):
        # codes/params go out in the v4 TRANSPOSED cache layout (token
        # index on lanes): the r3 version wrote token-major [nkv, bt, 64]
        # codes and [nkv, bt, 2] params — 64- and 2-lane tiles, with the
        # engine paying XLA transposes afterwards. The int32 in-kernel
        # transpose is one 32-bit shuffle per tile and makes every HBM
        # write lane-full in bt.
        byte, scale, zero = _quant_pack_head(t.astype(jnp.float32), cmax,
                                             cmin)
        b3 = byte.reshape(nkv, bt, 64)
        q_out[0] = jnp.transpose(b3, (0, 2, 1)).astype(jnp.uint8)
        p_out[0, :, 0, :] = scale.reshape(nkv, bt)
        p_out[0, :, 1, :] = zero.reshape(nkv, bt)

    kr32 = jax.lax.dot_general(
        rope_all(grouped(qoff, nkv), nkv), kt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # K goes out TRANSPOSED [nkv, hd, bt] (f32 tile transpose, then the
    # bf16 narrowing — same rounding as the old token-major write): the
    # flash kt kernel's stationary QK operand then needs no per-tile
    # Mosaic transpose (kernels/prefill_attention.py:_flash_prefill_kernel_kt)
    k_ref[0] = jnp.transpose(
        kr32.reshape(nkv, bt, 128), (0, 2, 1)).astype(k_ref.dtype)
    store_quant(kr32.astype(q_ref.dtype), kq_ref, kp_ref, clip_ref[0, 0],
                clip_ref[0, 1])

    vg = grouped(voff, nkv)
    ungroup(vg, nkv, v_ref)
    store_quant(vg, vq_ref, vp_ref, clip_ref[0, 2], clip_ref[0, 3])


@functools.partial(
    jax.jit, static_argnames=("nh", "nkv", "block_t", "interpret")
)
def attn_prologue(qkv, cos, sin, k_t, k_t_inv, kc_clip=None, vc_clip=None,
                  nh: int = 32, nkv: int = 32, block_t: int = 128,
                  interpret: bool = None):
    """qkv [B, S, (nh + 2*nkv)*128] bf16 (merged GEMM output, head_dim
    128); cos/sin [S, 128] rope tables for positions [0, S).

    Returns (q_rot [B, S, nh*128], k_rot [B, nkv, 128, S] (transposed),
    v [B, S, nkv*128], k_codes [B, nkv, 64, S] u8,
    k_params [B, nkv, 2, S] f32, v_codes, v_params) — codes/params in the
    v4 TRANSPOSED cache layout (kernels/kv_cache.py), written lane-full
    directly (no engine-side relayout).
    """
    B, S, D = qkv.shape
    hd = 128
    assert D == (nh + 2 * nkv) * hd, (D, nh, nkv)
    assert S % 128 == 0 or S <= block_t
    bt = min(block_t, S)
    while S % bt:
        bt //= 2
    clips = []
    for c in (kc_clip, vc_clip):
        if c is None:
            clips += [jnp.float32(1.0), jnp.float32(1.0)]
        else:
            clips += [c[0].reshape(()).astype(jnp.float32),
                      c[1].reshape(()).astype(jnp.float32)]
    clip_arr = jnp.stack(clips).reshape(1, 4)
    cos_b = cos.astype(jnp.bfloat16)
    # rotate_half(x) = concat(-x_hi, x_lo) = roll(x, 64 lanes) with a
    # -1 sign on the first 64 positions — fold the sign into the sin
    # table so the kernel's roll needs no extra pass (+-1 signs are
    # exact in bf16, so this is bit-identical to the r4 matrix form)
    sign = jnp.where(jnp.arange(hd) < hd // 2, -1.0, 1.0)
    sin_b = (sin * sign).astype(jnp.bfloat16)

    grid = (B, S // bt)
    out = pl.pallas_call(
        functools.partial(_attn_prologue_kernel, nh=nh, nkv=nkv),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, nh * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, nkv, hd, S), qkv.dtype),
            jax.ShapeDtypeStruct((B, S, nkv * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, nkv, hd // 2, S), jnp.uint8),
            jax.ShapeDtypeStruct((B, nkv, 2, S), jnp.float32),
            jax.ShapeDtypeStruct((B, nkv, hd // 2, S), jnp.uint8),
            jax.ShapeDtypeStruct((B, nkv, 2, S), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bt, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, hd), lambda b, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, hd), lambda b, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, hd), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, hd), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, bt, nh * hd), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd, bt), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bt, nkv * hd), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd // 2, bt),
                             lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, 2, bt), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd // 2, bt),
                             lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, 2, bt), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * (nh + nkv) * hd * hd + 10 * B * S * D,
            bytes_accessed=B * S * D * 2 * 2 + B * S * nkv * hd + 16 * B * S,
            transcendentals=0,
        ),
        # the batched-heads body holds [g*bt, 128] f32 intermediates for
        # all heads at once; bt=128 needs ~20 MB scoped VMEM (v5e has 128)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=resolve_interpret(interpret),
    )(qkv, cos_b, sin_b, k_t.astype(jnp.bfloat16),
      k_t_inv.astype(jnp.bfloat16), clip_arr)
    return out


def attn_prologue_ref(qkv, cos, sin, k_t, k_t_inv, kc_clip=None,
                      vc_clip=None, nh: int = 32, nkv: int = 32):
    """Pure-XLA oracle: the composed engine chain, same output layouts."""
    from flatquant_tpu.kernels.kv_cache import quantize_pack_kv
    from flatquant_tpu.models.llama import apply_rope

    B, S, D = qkv.shape
    hd = 128
    q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
    q = q.reshape(B, S, nh, hd)
    k = k.reshape(B, S, nkv, hd)
    q, k = apply_rope(q, k, cos, sin)
    k = jnp.matmul(k.astype(k_t.dtype), k_t)
    q = jnp.matmul(q.astype(k_t_inv.dtype), k_t_inv)
    v4 = v.reshape(B, S, nkv, hd)
    kq, ks, kz = quantize_pack_kv(k, kc_clip)
    vq, vs, vz = quantize_pack_kv(v4, vc_clip)
    # v4 transposed cache layout: codes [B, nkv, hd/2, S], params
    # [B, nkv, 2, S] (scale row 0, zero row 1)
    kpar = jnp.concatenate([ks, kz], -1).transpose(0, 2, 3, 1)
    vpar = jnp.concatenate([vs, vz], -1).transpose(0, 2, 3, 1)
    return (q.reshape(B, S, nh * hd).astype(qkv.dtype),
            k.transpose(0, 2, 3, 1).astype(qkv.dtype),
            v.astype(qkv.dtype),
            kq.transpose(0, 2, 3, 1), kpar,
            vq.transpose(0, 2, 3, 1), vpar)
