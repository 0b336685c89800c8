"""W4A8 GEMM Pallas kernel: int4-packed weights, bf16-code activations,
exact-integer MXU compute, fused dequant epilogue.

Replaces the reference's CUTLASS int4b_t tensor-core GEMM + standalone
sym_quant/sym_dequant CUDA kernels (deploy/kernels/gemm.cu:16-26,
quant.cu:13-101). TPU-native design:

  - Weights live in HBM packed 2 int4 / byte in a *planar* layout
    (byte column c holds element k=c in the low nibble and k=c+K/2 in the
    high nibble), so a tile unpacks to int8 with one concat — no strided
    VMEM stores, which Mosaic cannot do.
  - Activations are bf16 *codes* on the int4 grid [-8, 7] with per-token
    fp32 scales (int4 storage for activations buys nothing on TPU, and
    activation bytes are negligible next to weights).
  - Codes multiply on the bf16 MXU path with fp32 accumulation: integer
    products (|q| <= 8*7, sums < 2^24 for K <= 260k) are exact, so this is
    bit-identical to integer GEMM while avoiding Mosaic's unsupported int8
    vector ops (arith.subi on i8 fails to legalize); measured int8 and bf16
    MXU throughput are equal on v5e anyway.
  - The nibble unpack runs as int32 *register* arithmetic inside the kernel
    (no materialized intermediate) straight into the bf16 operand.
  - The epilogue fuses scale_row * scale_col dequant (the reference's
    separate sym_dequant kernel) into the same Pallas block.

Why this wins: decode is HBM-bandwidth-bound; weight traffic drops 4x vs
bf16 weights while MXU throughput is unchanged, so prefill never loses.

PROFILING NOTE (round 1, revised after device traces): the kernel streams
packed weights at ~600 GB/s = ~73% of v5e's nominal HBM speed-of-light
(per-kernel: merged-qkv 605, upgate 609, down 660, o 600 GB/s) — it is
memory-bound and near-roofline; the VPU unpack chain is NOT the limiter.
Device-side decode is 1.67x faster than bf16 (813 vs 1358 us/step at
llama-2-7b dims); earlier wall-clock parity readings were diluted by the
~25 ms fixed tunnel dispatch per call. Remaining headroom: the last ~27%
to HBM SoL (tile/pipeline tuning), and bf16's own matmuls only reach
~375 GB/s here so the relative win may grow with a tuned baseline.
(The mantissa bit-trick — OR nibbles into the bf16 pattern 0x4300|nib via
pltpu.bitcast's sublane-doubling reinterpret — remains a curiosity, not a
priority.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from flatquant_tpu.kernels.common import resolve_interpret
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# packing (host/load-time)
# ---------------------------------------------------------------------------


def pack_weight_planar(q):
    """Pack int8 codes [N, K] (values in [-8, 7]) to planar uint8 [N, K/2].

    Biased encoding: nibble = q + 8 in [0, 15], so the kernel can feed raw
    nibbles to the MXU and fold the -8 zero-point into the epilogue as an
    affine correction (code = nibble - 8 exactly). Planar layout:
    byte c = (q[:, c] + 8) | ((q[:, c + K/2] + 8) << 4).
    """
    n, k = q.shape
    assert k % 2 == 0
    u = (q.astype(jnp.int16) + 8).astype(jnp.uint8)
    lo = u[:, : k // 2]
    hi = u[:, k // 2 :]
    return lo | (hi << 4)


def unpack_weight_planar(wp):
    """Inverse of pack_weight_planar -> int8 [N, K]."""
    lo = (wp & 0xF).astype(jnp.int16) - 8
    hi = ((wp >> 4) & 0xF).astype(jnp.int16) - 8
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)


# ---------------------------------------------------------------------------
# activation quantization (per-token, symmetric int4 grid, int8 codes)
# ---------------------------------------------------------------------------


def quantize_acts_sym(x, q_max: int = 7, clip_max=None):
    """Per-token symmetric quant to int8 codes on the [-q_max-1, q_max] grid.

    Matches deploy/nn/quantization.py:5-44 (absmax/q_max scale, optional
    sigmoid-clipped LAC factor). Returns (codes bf16 — exact small ints for
    the MXU bf16 path — and scales fp32 [T, 1]).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    if clip_max is not None:
        absmax = absmax * jax.nn.sigmoid(clip_max)
    scale = jnp.where(absmax == 0, 1.0, absmax / q_max)
    q = jnp.clip(jnp.round(xf / scale), -q_max - 1, q_max).astype(jnp.bfloat16)
    return q, scale


# ---------------------------------------------------------------------------
# standalone per-token quant kernel (prefill shapes)
#
# XLA lowers the quant chain (f32 convert + minmax reduce + divide + clamp +
# int8 convert) as 3 separate HBM passes — device-traced 336 us at
# [2048, 11008] vs an 83 us single-pass floor. This kernel keeps each
# m-block VMEM-resident across both the reduce and the write, so HBM
# traffic is exactly one bf16 read + one int8 write. Unlike the
# fused-quant GEMM above (measured negative: it stole the GEMM's tiles),
# this runs as its own pass and leaves w4a4_matmul_i8 at full tile size.
# Scale rule byte-identical to _quant_linear / deploy quant_utils.py:88-108.
# ---------------------------------------------------------------------------


def _quant_i8_kernel(x_ref, clip_ref, q_ref, s_ref, *, q_max):
    xb = x_ref[:]  # bf16/f32 [bm, K]
    # max/min computed in the input dtype, then widened: bf16 -> f32
    # conversion is exact and monotone, so max(f32(x)) == f32(max(x)) —
    # bit-identical to the XLA chain's convert-first order. The zero
    # clamp (maximum(., 0)) reproduces the reference's max(xmax, 0).
    zero = jnp.zeros((), xb.dtype)
    xmax = jnp.max(jnp.maximum(xb, zero), axis=1, keepdims=True).astype(jnp.float32)
    xmin = jnp.min(jnp.minimum(xb, zero), axis=1, keepdims=True).astype(jnp.float32)
    xmax = xmax * clip_ref[0, 0]
    xmin = xmin * clip_ref[0, 1]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / q_max)
    s_ref[:] = xs
    q_ref[:] = jnp.clip(
        jnp.round(xb.astype(jnp.float32) / xs), -q_max - 1, q_max
    ).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("q_max", "block_m", "interpret")
)
def quant_acts_i8(x, clip=None, q_max: int = 7, block_m: int = 256,
                  interpret: bool = None):
    """Per-token symmetric quant: x [M, K] fp -> (int8 codes [M, K],
    f32 scales [M, 1]) in one HBM pass.

    clip: optional (rmax, rmin) already-sigmoided LAC factors (scalars).
    Bit-identical math to the XLA chain in serving _quant_linear.
    """
    m, k = x.shape
    assert k % 128 == 0, k
    bm = min(block_m, m)
    # VMEM: x in (double-buffered) + int8 out (double-buffered) + two
    # whole-block f32 temporaries (the widened x and the scaled quotient)
    while (bm * k * (2 * jnp.dtype(x.dtype).itemsize + 2 * 1 + 8) > 10 * 2**20
           and bm > 64):
        bm //= 2
    if clip is None:
        clip_arr = jnp.ones((1, 2), jnp.float32)
    else:
        clip_arr = jnp.stack(
            [clip[0].reshape(()), clip[1].reshape(())]
        ).reshape(1, 2).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_quant_i8_kernel, q_max=q_max),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, bm),),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k,
            bytes_accessed=m * k * jnp.dtype(x.dtype).itemsize + m * k + 4 * m,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(x, clip_arr)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _w4a8_kernel(x_ref, wp_ref, sx_ref, sw_ref, o_ref, *, out_dtype):
    # Feed raw nibbles (0..15) to the MXU and fold the -8 zero-point into
    # the epilogue: sum_k x*(nib-8) = sum_k x*nib - 8*sum_k x. This halves
    # the VPU unpack chain (no xor/sub per element).
    wp = wp_ref[:].astype(jnp.int32)
    lo = wp & 0xF
    hi = wp >> 4
    nib = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)  # [TN, K]
    x = x_ref[:]
    acc = jax.lax.dot_general(
        x, nib, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TM, TN] exact integer-valued fp32
    x_rowsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # [TM, 1]
    out = (acc - 8.0 * x_rowsum) * sx_ref[:] * sw_ref[:]
    o_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret")
)
def w4a8_matmul(
    x_q,
    x_scale,
    w_packed,
    w_scale,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 256,
    interpret: bool = None,
):
    """y[M, N] = dequant( x_q[M, K] @ unpack(w_packed)[N, K]^T ).

    x_q: int8 codes, x_scale: [M, 1] fp32, w_packed: [N, K/2] uint8 planar,
    w_scale: [N] fp32 per-out-channel.
    """
    m, k = x_q.shape
    n = w_packed.shape[0]
    assert w_packed.shape[1] * 2 == k
    bm = min(block_m, m)
    bn = min(block_n, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    sw = w_scale.reshape(1, n).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_w4a8_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bn, k // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + n * k // 2 + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(x_q, w_packed, sx, sw)


def w4a8_matmul_ref(x_q, x_scale, w_packed, w_scale, out_dtype=jnp.bfloat16):
    """Pure-XLA reference (and CPU fallback) for the kernel."""
    w = unpack_weight_planar(w_packed).astype(jnp.float32)
    acc = jax.lax.dot_general(
        x_q.astype(jnp.float32), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = acc * x_scale.reshape(-1, 1) * w_scale.reshape(1, -1)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# int8-MXU variant (prefill / compute-bound shapes)
#
# v5e's int8 MXU path runs at 2x the bf16 rate (measured on this chip:
# 188 vs 94 TFLOPs for a 2048x4096x4096 dot_general) — the TPU analog of
# the reference's CUTLASS int4b_t tensor-core GEMM rate advantage
# (deploy/kernels/gemm.cu:16-26, REALQUANT.md prefill 1.98-2.06x).
# Round 1 assumed int8 == bf16 MXU; that was wrong (the earlier kernel fed
# bf16 operands, so it could never observe the int8 rate).
#
# The unpack stays int32 register arithmetic (Mosaic cannot legalize i8
# vector sub/shift) but the final operands convert int32 -> int8 and the
# MXU accumulates in int32: sum_k x*(nib-8) = x.nib - 8*rowsum(x), exact
# for K < 2^23.  Bit-identical to the bf16-code kernel by construction.
# ---------------------------------------------------------------------------


def _w4a4_i8_kernel(x_ref, wp_ref, sx_ref, sw_ref, o_ref, *, out_dtype):
    wp = wp_ref[:].astype(jnp.int32)
    nib = jnp.concatenate([wp & 0xF, wp >> 4], axis=1).astype(jnp.int8)  # [TN, K]
    x = x_ref[:]  # int8 codes in [-8, 7]
    acc = jax.lax.dot_general(
        x, nib, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [TM, TN] int32, exact
    x_rowsum = jnp.sum(x_ref[:].astype(jnp.int32), axis=1, keepdims=True)
    out = (acc - 8 * x_rowsum).astype(jnp.float32) * sx_ref[:] * sw_ref[:]
    o_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret")
)
def w4a4_matmul_i8(
    x_q,
    x_scale,
    w_packed,
    w_scale,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    block_n: int = 1024,
    interpret: bool = None,
):
    """y[M, N] = dequant( x_q[M, K] @ unpack(w_packed)[N, K]^T ), int8 MXU.

    x_q: int8 codes on the int4 grid, x_scale [M, 1] fp32,
    w_packed [N, K/2] uint8 planar biased nibbles, w_scale [N] fp32.

    Default blocks (512, 1024) measured 359 TFLOPs at M=2048/K=4096/N=11008
    on v5e — 96% of the pure int8 XLA dot rate (376), 1.9x bf16 (189);
    blocks shrink automatically for large K to stay within scoped VMEM.
    """
    m, k = x_q.shape
    n = w_packed.shape[0]
    assert x_q.dtype == jnp.int8
    assert w_packed.shape[1] * 2 == k
    if m <= 32 and n <= 16384 and block_n == 1024:
        # decode weight-stream shapes: finer N blocks pipeline the small
        # total transfer better (r5 device sweep at M=8: o 4096x4096
        # 17.1 -> 15.7 us, down 4096x11008 42.8 -> 37.4 us at bn=512;
        # the 22016-row upgate stays faster at 1024 and keeps it)
        block_n = 512
    bm = min(block_m, m)
    bn = min(block_n, n)
    # VMEM budget: x block (bm*k int8) + w block (bn*k/2 u8) + unpacked
    # nibbles (bn*k i8 working set) + acc/out (~6*bm*bn). v5e carries
    # 128 MB of VMEM and this chip accepts vmem_limit_bytes=110 MB, so
    # cap the per-step set at ~44 MB (Pallas double-buffers blocked
    # operands) — the old 11 MB cap shrank blocks at K=11008 and cost
    # 12% (sweep 2026-08-20: down GEMM 570 -> 501 us = 98% of the int8
    # dot rate at bm512/bn1024)
    while (bm * k + bn * k // 2 + bn * k + 6 * bm * bn > 44 * 2**20
           and max(bm, bn) > 128):
        if bm >= bn:
            bm //= 2
        else:
            bn //= 2
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    sw = w_scale.reshape(1, n).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_w4a4_i8_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bn, k // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + n * k // 2 + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=resolve_interpret(interpret),
    )(x_q, w_packed, sx, sw)


# ---------------------------------------------------------------------------
# SwiGLU-fused variant: the merged up||gate GEMM computes silu(gate)*up in
# the epilogue and emits [M, N/2] directly. Saves writing the [M, 22016]
# bf16 intermediate + re-reading 3x of it for the silu multiply
# (~180 MB -> ~220 us/layer at llama-2-7b prefill S=2048). No weight
# relayout: the kernel reads the up-row block and the matching gate-row
# block of the SAME planar-packed array through two BlockSpecs whose index
# maps are offset by N/2 blocks. Replaces the reference deploy path's
# separate up/gate GEMMs + eager SiLU (modeling_llama.py MLP).
# ---------------------------------------------------------------------------


def _w4a4_i8_swiglu_kernel(x_ref, wpu_ref, wpg_ref, sx_ref, swu_ref,
                           swg_ref, o_ref, *, out_dtype):
    xu = x_ref[:]  # int8 codes [bm, K]
    nib_u = jnp.concatenate(
        [wpu_ref[:].astype(jnp.int32) & 0xF, wpu_ref[:].astype(jnp.int32) >> 4],
        axis=1).astype(jnp.int8)
    nib_g = jnp.concatenate(
        [wpg_ref[:].astype(jnp.int32) & 0xF, wpg_ref[:].astype(jnp.int32) >> 4],
        axis=1).astype(jnp.int8)
    acc_u = jax.lax.dot_general(
        xu, nib_u, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    acc_g = jax.lax.dot_general(
        xu, nib_g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    rowsum = jnp.sum(xu.astype(jnp.int32), axis=1, keepdims=True)
    sx = sx_ref[:]
    u = (acc_u - 8 * rowsum).astype(jnp.float32) * sx * swu_ref[:]
    g = (acc_g - 8 * rowsum).astype(jnp.float32) * sx * swg_ref[:]
    o_ref[:] = (u * (g * jax.nn.sigmoid(g))).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret")
)
def w4a4_matmul_i8_swiglu(
    x_q,
    x_scale,
    w_packed,
    w_scale,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = None,
):
    """out[M, N/2] = silu(deq(x@gate.T)) * deq(x@up.T), int8 MXU.

    w_packed [N, K/2]: merged projection, rows [0, N/2) = up,
    [N/2, N) = gate (build_serving_params merge order). block_n is the
    per-projection (half) block width.
    """
    m, k = x_q.shape
    n2 = w_packed.shape[0]
    nh = n2 // 2
    assert x_q.dtype == jnp.int8 and w_packed.shape[1] * 2 == k
    assert nh % 128 == 0, nh
    bm = min(block_m, m)
    # bn must DIVIDE nh: the gate BlockSpec addresses row-block j + gridj,
    # which only lands at row nh when gridj*bn == nh exactly. Largest
    # 128-multiple divisor of nh that fits block_n (nh=11008 -> 256).
    units = nh // 128
    d = max(u for u in range(1, min(units, block_n // 128) + 1)
            if units % u == 0)
    bn = 128 * d
    # VMEM: x + 2 weight blocks + 2 unpacked nibble sets + 2 int32 accs;
    # ~44 MB cap under the 110 MB compiler limit (see w4a4_matmul_i8)
    while (bm * k + 2 * (bn * k // 2) + 2 * bn * k + 10 * bm * bn
           > 44 * 2**20 and bm > 128):
        bm //= 2
    gridj = nh // bn
    sw = w_scale.reshape(1, n2).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_w4a4_i8_swiglu_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, nh), out_dtype),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, bm), gridj),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k // 2), lambda i, j, gj=gridj: (j + gj, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, gj=gridj: (0, j + gj),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n2 * k,
            bytes_accessed=m * k + n2 * k // 2
            + m * nh * jnp.dtype(out_dtype).itemsize,
            transcendentals=m * nh,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=resolve_interpret(interpret),
    )(x_q, w_packed, w_packed, sx, sw, sw)


# ---------------------------------------------------------------------------
# fused-quant variant: bf16 activations in, per-token quant in the kernel
# prologue (j == 0), codes cached in VMEM scratch and reused across n-blocks
#
# MEASURED NEGATIVE RESULT — kept as a tested API + documentation, NOT wired
# into serving. Device-traced vs the composed XLA-quant -> w4a4_matmul_i8
# path at prefill shapes (M=2048, 30-iter device_compare):
#   K=4096  N=4096:  322 vs 265 us  (0.82x)
#   K=4096  N=11008: 752 vs 603 us  (0.80x)
#   K=11008 N=4096: 1975 vs 796 us  (0.40x)
# The quant prologue forces whole-K bf16 x blocks into VMEM (2 B/elt,
# double-buffered), which shrinks the GEMM tiles far below the composed
# kernel's (512, 1024) and costs MXU efficiency worth much more than the
# ~2 B/elt of M*K HBM traffic the fusion saves (~27 us at 600 GB/s). Same
# conclusion as the fused kron+quant prototype in fused_trans_quant.py:
# on this toolchain the standalone XLA quant pass fuses well and the GEMM
# should keep its tile freedom. The scale rule is byte-identical to
# _quant_linear (reference deploy quant_utils.py:88-108): xmax*rmax /
# xmin*rmin, absmax/7, zero -> 1.0; on-TPU output is bit-identical to the
# composed path (CPU interpret differs by ~1 ulp: XLA CPU lowers /7.0 to
# reciprocal-multiply in some contexts).
# ---------------------------------------------------------------------------


def _w4a4_i8_fusedq_kernel(x_ref, wp_ref, clip_ref, sw_ref, o_ref,
                           xq_ref, xs_ref, xr_ref, *, out_dtype, k_chunk):
    nj = pl.program_id(1)

    @pl.when(nj == 0)
    def _quantize():
        xf = x_ref[...].astype(jnp.float32)  # [bm, K]
        xmax = jnp.maximum(jnp.max(xf, axis=1, keepdims=True), 0.0) * clip_ref[0, 0]
        xmin = jnp.minimum(jnp.min(xf, axis=1, keepdims=True), 0.0) * clip_ref[0, 1]
        absmax = jnp.maximum(jnp.abs(xmin), xmax)
        xs = jnp.where(absmax == 0, 1.0, absmax / 7.0)
        xq = jnp.clip(jnp.round(xf / xs), -8, 7)
        xq_ref[...] = xq.astype(jnp.int8)
        xs_ref[...] = xs
        xr_ref[...] = jnp.sum(xq, axis=1, keepdims=True)  # exact in f32

    K = x_ref.shape[1]
    kh = K // 2
    acc = jnp.zeros((x_ref.shape[0], wp_ref.shape[0]), jnp.int32)
    n_chunks = kh // k_chunk

    def body(c, acc):
        c0 = c * k_chunk
        wp = wp_ref[:, pl.ds(c0, k_chunk)].astype(jnp.int32)
        lo = (wp & 0xF).astype(jnp.int8)  # [bn, kc]
        hi = (wp >> 4).astype(jnp.int8)
        acc += jax.lax.dot_general(
            xq_ref[:, pl.ds(c0, k_chunk)], lo,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            xq_ref[:, pl.ds(kh + c0, k_chunk)], hi,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        return acc

    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    out = (acc.astype(jnp.float32) - 8.0 * xr_ref[...]) * xs_ref[...] * sw_ref[...]
    o_ref[...] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret")
)
def w4a4_matmul_i8_fusedq(
    x,
    w_packed,
    w_scale,
    clip=None,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = None,
):
    """y[M, N] = dequant( quant_per_token(x)[M, K] @ unpack(w_packed)[N, K]^T ).

    x: bf16/f32 activations (UNquantized — the kernel quantizes rows once
    per m-block into VMEM scratch); clip: optional (rmax, rmin) LAC factors.
    Bit-identical to quantize-then-w4a4_matmul_i8 (same f32 scale math, same
    int8 MXU dot with exact int32 accumulation).
    """
    m, k = x.shape
    n = w_packed.shape[0]
    assert w_packed.shape[1] * 2 == k
    bm = min(block_m, m)
    bn = min(block_n, n)
    kc = min(1024, k // 2)
    while (k // 2) % kc:
        kc //= 2
    # VMEM (double-buffered inputs + int32 nibble intermediates — the
    # first budget omitted both and OOM'd the 16 MB scoped limit at
    # f32/K=4096): x 2·is·bm·k, wp 2·(bn·k/2), xq scratch bm·k,
    # unpack chunk ~6·bn·kc (wp int32 + lo/hi int8), acc f32 + out ×2.
    xis = jnp.dtype(x.dtype).itemsize

    def vmem(bm, bn):
        return (2 * xis * bm * k + bn * k + bm * k + 6 * bn * kc
                + 12 * bm * bn)

    while vmem(bm, bn) > 11 * 2**20 and max(bm, bn) > 128:
        if bm >= bn:
            bm //= 2
        else:
            bn //= 2
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    sw = w_scale.reshape(1, n).astype(jnp.float32)
    if clip is None:
        clip_arr = jnp.ones((1, 2), jnp.float32)
    else:
        clip_arr = jnp.stack([clip[0].reshape(()), clip[1].reshape(())]).reshape(1, 2).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_w4a4_i8_fusedq_kernel, out_dtype=out_dtype,
                          k_chunk=kc),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((bm, k), jnp.int8),     # xq codes
                pltpu.VMEM((bm, 1), jnp.float32),  # per-token scale
                pltpu.VMEM((bm, 1), jnp.float32),  # per-token code rowsum
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=2 * m * k + n * k // 2 + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(x, w_packed, clip_arr, sw)
