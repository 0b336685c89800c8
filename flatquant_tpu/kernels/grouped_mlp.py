"""Grouped (relayout-free) MLP pipeline for the quantized serving path.

The down_proj's online Kronecker transform is the last structural glue in
prefill: XLA lowers the left-factor contraction of kron(L[G,G], R[128,128])
over act [T, G*128] as a batched matmul wrapped in layout copies
(~250 us/layer device-traced at llama-2-7b dims, S=2048 — the relayout is
physical HBM traffic, not fusible). The reference's Triton kron_matmul
(deploy/kernels/kron_matmul.py) dodges this with an in-CTA smem transpose;
Mosaic on this toolchain has no equivalent relayout primitive (see
fused_trans_quant.py). The TPU answer is to never materialize the
[T, G*128] layout at all:

  1. w4a4_swiglu_grouped: the merged up||gate GEMM epilogue computes
     silu(gate)*up AND the right-factor dot (per 128-column group), writing
     Y grouped as [G, T, 128].
  2. The LEFT contraction is then one clean 2D matmul
     L^T[G,G] @ Y.reshape(G, T*128) — contraction on the leading dim of a
     row-major 2D array: no batched-matmul relayout, no copies.
  3. quant_acts_i8_grouped: per-token scales reduce over (G, lanes) of
     [G, bt, 128] blocks; int8 codes stay grouped.
  4. w4a4_matmul_i8_grouped: the down GEMM consumes grouped codes
     directly — the planar-packed weight's byte-column block b holds
     column group b in the low nibbles and group b + G/2 in the high
     nibbles, so the K loop walks byte blocks and issues two K=128 MXU
     dots per step. Dequant epilogue identical to w4a4_matmul_i8.

All four steps are HBM-minimal: the only traffic is each tensor once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from flatquant_tpu.kernels.common import resolve_interpret
from jax.experimental.pallas import tpu as pltpu


def _swiglu_grouped_kernel(x_ref, wpu_ref, wpg_ref, sx_ref, swu_ref,
                           swg_ref, r_ref, o_ref, *, gb):
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
    act = (u * (g * jax.nn.sigmoid(g))).astype(jnp.bfloat16)  # [bm, gb*128]
    r = r_ref[:]  # [128, 128] bf16 right Kronecker factor
    for gl in range(gb):
        seg = act[:, gl * 128:(gl + 1) * 128]
        o_ref[gl] = jax.lax.dot_general(
            seg, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def w4a4_swiglu_grouped(
    x_q,
    x_scale,
    w_packed,
    w_scale,
    right,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = None,
):
    """Y[G, M, 128] = group_r(silu(deq(x@gate.T)) * deq(x@up.T)) @ right.

    w_packed [2*G*128, K/2]: merged up||gate planar pack (rows [0, G*128)
    = up). right [128, 128]: the Kronecker right factor, applied per
    128-column group in the epilogue. Output is bf16 in the grouped
    layout [G, M, 128] (group g = columns [g*128, (g+1)*128) of the
    standard layout).
    """
    m, k = x_q.shape
    n2 = w_packed.shape[0]
    nh = n2 // 2
    n_groups = nh // 128
    assert x_q.dtype == jnp.int8 and w_packed.shape[1] * 2 == k
    assert nh % 128 == 0 and right.shape == (128, 128)
    bm = min(block_m, m)
    units = nh // 128
    d = max(u for u in range(1, min(units, block_n // 128) + 1)
            if units % u == 0)
    bn = 128 * d
    gb = bn // 128
    while (bm * k + 2 * (bn * k // 2) + 2 * bn * k + 10 * bm * bn
           > 11 * 2**20 and bm > 128):
        bm //= 2
    gridj = nh // bn
    sw = w_scale.reshape(1, n2).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_swiglu_grouped_kernel, gb=gb),
        out_shape=jax.ShapeDtypeStruct((n_groups, m, 128), jnp.bfloat16),
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
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (gb, bm, 128), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n2 * k + 2 * m * nh * 128,
            bytes_accessed=m * k + n2 * k // 2 + m * nh * 2,
            transcendentals=m * nh,
        ),
        interpret=resolve_interpret(interpret),
    )(x_q, w_packed, w_packed, sx, sw, sw, right.astype(jnp.bfloat16))


def _quant_i8_grouped_left_kernel(lt_ref, x_ref, clip_ref, q_ref, s_ref, *,
                                  q_max):
    """Left-factor contraction + per-token quant in one pass.

    The [G, bt, 128] block holds every group, so z = L^T @ Y is one MXU
    dot over the leading dim after an in-VMEM collapse to [G, bt*128] —
    the HBM round-trip (and the XLA-side 3D<->2D relayout copy, ~230
    us/layer device-traced) never happens."""
    g, bt, lw = x_ref.shape
    x2 = x_ref[:].reshape(g, bt * lw)
    z2 = jax.lax.dot_general(
        lt_ref[:], x2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # same numerics as jnp.matmul(left.T, .) bf16
    xb = z2.reshape(g, bt, lw)
    zero = jnp.zeros((), xb.dtype)
    xmax = jnp.max(jnp.maximum(xb, zero), axis=(0, 2)).astype(jnp.float32)
    xmin = jnp.min(jnp.minimum(xb, zero), axis=(0, 2)).astype(jnp.float32)
    xmax = (xmax * clip_ref[0, 0])[:, None]  # [bt, 1]
    xmin = (xmin * clip_ref[0, 1])[:, None]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / q_max)
    s_ref[:] = xs
    q_ref[:] = jnp.clip(
        jnp.round(xb.astype(jnp.float32) / xs[None, :, :]), -q_max - 1, q_max
    ).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("q_max", "block_t", "interpret")
)
def left_quant_i8_grouped(left_t, x, clip=None, q_max: int = 7,
                          block_t: int = 64, interpret: bool = None):
    """(codes, scales) = quant_per_token(left_t @ x) on the grouped layout.

    left_t [G, G]: the TRANSPOSED left Kronecker factor (pass left.T);
    x [G, T, 128] bf16. Fuses kron's left contraction into the quant pass.
    """
    g, t, lw = x.shape
    assert lw == 128 and left_t.shape == (g, g)
    bt = min(block_t, t)
    while g * bt * 128 * (4 * jnp.dtype(x.dtype).itemsize + 2 + 8) > 10 * 2**20 \
            and bt > 8:
        bt //= 2
    if clip is None:
        clip_arr = jnp.ones((1, 2), jnp.float32)
    else:
        clip_arr = jnp.stack(
            [clip[0].reshape(()), clip[1].reshape(())]
        ).reshape(1, 2).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_quant_i8_grouped_left_kernel, q_max=q_max),
        out_shape=(
            jax.ShapeDtypeStruct((g, t, 128), jnp.int8),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((g, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, bt, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((g, bt, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * g * t * 128 + 4 * g * t * 128,
            bytes_accessed=g * t * 128 * (jnp.dtype(x.dtype).itemsize + 1),
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(left_t.astype(jnp.bfloat16), x, clip_arr)


def _quant_i8_grouped_kernel(x_ref, clip_ref, q_ref, s_ref, *, q_max):
    xb = x_ref[:]  # bf16 [G, bt, 128]
    zero = jnp.zeros((), xb.dtype)
    xmax = jnp.max(jnp.maximum(xb, zero), axis=(0, 2)).astype(jnp.float32)
    xmin = jnp.min(jnp.minimum(xb, zero), axis=(0, 2)).astype(jnp.float32)
    xmax = (xmax * clip_ref[0, 0])[:, None]  # [bt, 1]
    xmin = (xmin * clip_ref[0, 1])[:, None]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / q_max)
    s_ref[:] = xs
    q_ref[:] = jnp.clip(
        jnp.round(xb.astype(jnp.float32) / xs[None, :, :]), -q_max - 1, q_max
    ).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("q_max", "block_t", "interpret")
)
def quant_acts_i8_grouped(x, clip=None, q_max: int = 7, block_t: int = 64,
                          interpret: bool = None):
    """Per-token quant over the grouped layout: x [G, T, 128] ->
    (int8 codes [G, T, 128], f32 scales [T, 1]). Token t's row is the
    concatenation over G of x[:, t, :]; scale math identical to
    quant_acts_i8 / the serving XLA chain."""
    g, t, lw = x.shape
    assert lw == 128
    bt = min(block_t, t)
    while g * bt * 128 * (2 * jnp.dtype(x.dtype).itemsize + 2 + 8) > 10 * 2**20 \
            and bt > 8:
        bt //= 2
    if clip is None:
        clip_arr = jnp.ones((1, 2), jnp.float32)
    else:
        clip_arr = jnp.stack(
            [clip[0].reshape(()), clip[1].reshape(())]
        ).reshape(1, 2).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_quant_i8_grouped_kernel, q_max=q_max),
        out_shape=(
            jax.ShapeDtypeStruct((g, t, 128), jnp.int8),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((g, bt, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((g, bt, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * t * 128,
            bytes_accessed=g * t * 128 * (jnp.dtype(x.dtype).itemsize + 1),
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(x, clip_arr)


def _w4a4_grouped_gemm_kernel(x_ref, wp_ref, sx_ref, sw_ref, o_ref,
                              xflat_ref, rowsum_ref, *, n_groups, out_dtype):
    # Reassemble the flat [bm, K] activation view by placing the G tile
    # planes side-by-side on the LANE axis — a pure tile-placement concat
    # (no cross-lane data movement within a tile; same primitive as the
    # planar nibble unpack below), then run ONE K-deep MXU dot. A first
    # version looped G times with K=128 dots instead and ran 3.7x slower
    # than the flat GEMM (MXU starved by tiny contractions); this form
    # matches _w4a4_i8_kernel's schedule exactly.
    #
    # The concat (and the row sums) are HOISTED into VMEM scratch at the
    # first N block: the x block's index map ignores j, so the planes are
    # already resident, but redoing the concat per N block cost ~90 us at
    # the qkv shape (device-traced 2026-08-18) — TPU grids run
    # sequentially with j fastest, so scratch written at j == 0 is valid
    # for the whole row of N blocks.
    @pl.when(pl.program_id(1) == 0)
    def _():
        xflat_ref[:] = jnp.concatenate(
            [x_ref[g] for g in range(n_groups)], axis=1)
        rowsum_ref[:] = jnp.sum(
            xflat_ref[:].astype(jnp.int32), axis=1, keepdims=True)

    xflat = xflat_ref[:]
    wp = wp_ref[:].astype(jnp.int32)
    nib = jnp.concatenate([wp & 0xF, wp >> 4], axis=1).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xflat, nib, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = ((acc - 8 * rowsum_ref[:]).astype(jnp.float32)
           * sx_ref[:] * sw_ref[:])
    o_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret")
)
def w4a4_matmul_i8_grouped(
    x_q,
    x_scale,
    w_packed,
    w_scale,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = None,
):
    """y[M, N] = dequant( flatten(x_q) @ unpack(w_packed)^T ) where x_q is
    the grouped layout [G, M, 128] (flatten: column g*128+j = x_q[g, :, j]).

    Bit-identical integer math to w4a4_matmul_i8 on the flattened layout
    (the kernel reassembles the flat lane order with a tile-placement
    concat, then runs the same single K-deep dot).
    """
    g, m, lw = x_q.shape
    k = g * 128
    n = w_packed.shape[0]
    assert lw == 128
    assert w_packed.shape[1] * 2 == k and x_q.dtype == jnp.int8
    bm = min(block_m, m)
    bn = min(block_n, n)
    # VMEM: grouped x block (dbuf) + flat concat copy + wp (dbuf) +
    # unpacked nibbles + acc/out
    while (2 * g * bm * 128 + bm * k + 2 * bn * k // 2 + bn * k
           + 10 * bm * bn > 11 * 2**20 and max(bm, bn) > 128):
        if bm >= bn:
            bm //= 2
        else:
            bn //= 2
    sw = w_scale.reshape(1, n).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_w4a4_grouped_gemm_kernel, n_groups=g,
                          out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((g, bm, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + n * k // 2
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        # the j==0 scratch hoist REQUIRES sequential grid execution with j
        # fastest — pin it so a future megacore/parallel dimension split
        # cannot silently leave one core reading stale scratch
        compiler_params=pltpu.CompilerParams(dimension_semantics=(
            pltpu.GridDimensionSemantics.ARBITRARY,
            pltpu.GridDimensionSemantics.ARBITRARY)),
        interpret=resolve_interpret(interpret),
    )(x_q, w_packed, sx, sw)


def group_layout(x2d, n_groups: int):
    """[T, G*128] -> [G, T, 128] (test/reference helper)."""
    t = x2d.shape[0]
    return x2d.reshape(t, n_groups, 128).transpose(1, 0, 2)


def ungroup_layout(xg):
    """[G, T, 128] -> [T, G*128] (test/reference helper)."""
    g, t, _ = xg.shape
    return xg.transpose(1, 0, 2).reshape(t, g * 128)


def _rmsnorm_right_grouped_kernel(x_ref, w_ref, r_ref, o_ref, *, eps, gb):
    xf = x_ref[:].astype(jnp.float32)  # [bt, H]
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    xn = ((xf * jax.lax.rsqrt(var + eps))
          * w_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    r = r_ref[:]  # [128, 128] bf16
    for g in range(gb):
        seg = xn[:, g * 128:(g + 1) * 128]
        o_ref[g] = jax.lax.dot_general(
            seg, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_t", "interpret")
)
def rmsnorm_right_grouped(x, w, right, eps: float, block_t: int = 256,
                          interpret: bool = None):
    """Fused rms_norm + Kronecker right factor, grouped output.

    x [T, H] -> [G, T, 128] bf16 where G = H/128: group g holds
    (rms_norm(x) * w)[:, g*128:(g+1)*128] @ right. Same f32 norm math as
    models.llama.rms_norm; the right dot matches kron_transform's first
    contraction at bf16. Feeds left_quant_i8_grouped directly — the
    attention/MLP input transforms never materialize the flat layout."""
    t, h = x.shape
    g = h // 128
    assert h % 128 == 0 and right.shape == (128, 128)
    bt = min(block_t, t)
    while bt * h * 14 > 10 * 2**20 and bt > 8:
        bt //= 2
    return pl.pallas_call(
        functools.partial(_rmsnorm_right_grouped_kernel, eps=eps, gb=g),
        out_shape=jax.ShapeDtypeStruct((g, t, 128), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((bt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, bt, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * h * 128 + 6 * t * h,
            bytes_accessed=t * h * (jnp.dtype(x.dtype).itemsize + 2),
            transcendentals=t,
        ),
        interpret=resolve_interpret(interpret),
    )(x, w.reshape(1, h), right.astype(jnp.bfloat16))


def _swiglu_grouped_gx_kernel(x_ref, wpu_ref, wpg_ref, sx_ref, swu_ref,
                              swg_ref, r_ref, o_ref, xflat_ref, rowsum_ref,
                              *, gb, n_groups_in):
    # grouped-x variant: reassemble the flat activation row from the
    # [Gin, bm, 128] tile planes (tile-placement concat, as in the
    # grouped GEMM), then identical math to _swiglu_grouped_kernel.
    # Concat + row sums hoisted to scratch at the first N block (see
    # _w4a4_grouped_gemm_kernel): redoing them per N block measured
    # ~60 us/layer at the upgate shape.
    @pl.when(pl.program_id(1) == 0)
    def _():
        xflat_ref[:] = jnp.concatenate(
            [x_ref[g] for g in range(n_groups_in)], axis=1)
        rowsum_ref[:] = jnp.sum(
            xflat_ref[:].astype(jnp.int32), axis=1, keepdims=True)

    xu = xflat_ref[:]
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
    rowsum = rowsum_ref[:]
    sx = sx_ref[:]
    u = (acc_u - 8 * rowsum).astype(jnp.float32) * sx * swu_ref[:]
    g_ = (acc_g - 8 * rowsum).astype(jnp.float32) * sx * swg_ref[:]
    act = (u * (g_ * jax.nn.sigmoid(g_))).astype(jnp.bfloat16)
    r = r_ref[:]
    for gl in range(gb):
        seg = act[:, gl * 128:(gl + 1) * 128]
        o_ref[gl] = jax.lax.dot_general(
            seg, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def w4a4_swiglu_grouped_gx(
    x_qg,
    x_scale,
    w_packed,
    w_scale,
    right,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = None,
):
    """w4a4_swiglu_grouped with GROUPED int8 activations [Gin, M, 128]
    (the left_quant_i8_grouped output) instead of flat [M, K] — the
    end-to-end grouped pipeline's upgate stage."""
    gin, m, lw = x_qg.shape
    k = gin * 128
    n2 = w_packed.shape[0]
    nh = n2 // 2
    assert lw == 128 and x_qg.dtype == jnp.int8
    assert w_packed.shape[1] * 2 == k and nh % 128 == 0
    assert right.shape == (128, 128)
    bm = min(block_m, m)
    units = nh // 128
    d = max(u for u in range(1, min(units, block_n // 128) + 1)
            if units % u == 0)
    bn = 128 * d
    gb = bn // 128
    while (2 * gin * bm * 128 + bm * k + 2 * (bn * k // 2) + 2 * bn * k
           + 10 * bm * bn > 11 * 2**20 and bm > 128):
        bm //= 2
    gridj = nh // bn
    sw = w_scale.reshape(1, n2).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_swiglu_grouped_gx_kernel, gb=gb,
                          n_groups_in=gin),
        out_shape=jax.ShapeDtypeStruct((nh // 128, m, 128), jnp.bfloat16),
        grid=(pl.cdiv(m, bm), gridj),
        in_specs=[
            pl.BlockSpec((gin, bm, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k // 2), lambda i, j, gj=gridj: (j + gj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, gj=gridj: (0, j + gj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb, bm, 128), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n2 * k + 2 * m * nh * 128,
            bytes_accessed=gin * m * 128 + n2 * k // 2 + m * nh * 2,
            transcendentals=m * nh,
        ),
        # the j==0 scratch hoist REQUIRES sequential grid execution with j
        # fastest — pin it so a future megacore/parallel dimension split
        # cannot silently leave one core reading stale scratch
        compiler_params=pltpu.CompilerParams(dimension_semantics=(
            pltpu.GridDimensionSemantics.ARBITRARY,
            pltpu.GridDimensionSemantics.ARBITRARY)),
        interpret=resolve_interpret(interpret),
    )(x_qg, w_packed, w_packed, sx, sw, sw, right.astype(jnp.bfloat16))
