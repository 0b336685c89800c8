"""Flat-layout fused transform+quant pipeline (supersedes the grouped one).

Round-2 built the grouped [G, T, 128] MLP pipeline (grouped_mlp.py) to kill
the XLA relayout copies around Kronecker transforms. Device profiling this
round showed the grouped HBM layout itself costs more than it saves once
everything is a kernel:

  - w4a4_matmul_i8_grouped at the down shape runs 657 us vs the 514 us
    int8-MXU roofline: holding all G=86 input tile planes per m-block caps
    blocks at (128, 256), so the packed weight streams 16x (360 MB of
    re-reads). The FLAT GEMM runs (512, 1024) blocks -> 4x re-reads.
  - left_quant_i8_grouped reads G separate [bt, 128] tile planes per block
    (strided DMA, 335 GB/s measured); flat rows are contiguous.

The grouped<->flat conversion is FREE inside a kernel — slicing 128-lane
column groups out of a flat [bt, G*128] block and stacking them on a
leading axis is pure tile placement (the same primitive as the planar
nibble unpack), with no HBM relayout. So this module keeps every fusion
(rmsnorm+right factor, swiglu+right epilogue, left factor+quant) but all
HBM tensors stay in the standard flat [T, K] layout:

    ln/ug:  rmsnorm_right_flat      -> [T, H]  bf16
    quant:  left_quant_i8_flat      -> [T, K]  int8 (+ [T,1] scales)
    GEMMs:  w4a4_matmul_i8 (flat, 512x1024 blocks, 96% of roofline)
    upgate: w4a4_matmul_i8_swiglu_right -> [T, inter] bf16
            (silu(gate)*up AND the down transform's right factor per
             128-column group, in the GEMM epilogue)

left_quant_i8_flat also serves the ATTENTION OUTPUT path: the o-transform
mixes heads within groups (single_matrix over g heads = a left Kronecker
factor with right = I(head_dim)), so "o_t einsum + per-token quant" is one
kernel call on the flash-attention output — replacing an XLA chain that
materialized an f32 transposed copy (device-traced ~115 us/layer).

Numerics are pinned to the composed XLA path operation-for-operation
(bf16 matmuls with f32 accumulation cast back to bf16, f32 quant math),
so engine-level results are bit-identical — tested in
tests/test_flat_pipeline.py and device-verified by tools/.

Reference analog: deploy/kernels/kron_matmul.py:24-266 (Triton fused
transform+quant); this design additionally fuses the normalization and
the SwiGLU into neighboring GEMMs, which the reference does not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from flatquant_tpu.kernels.common import resolve_interpret
from jax.experimental.pallas import tpu as pltpu


def _clip_arr(clip):
    if clip is None:
        return jnp.ones((1, 2), jnp.float32)
    return jnp.stack(
        [clip[0].reshape(()), clip[1].reshape(())]
    ).reshape(1, 2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# rmsnorm + Kronecker right factor, flat output
# ---------------------------------------------------------------------------


def _rmsnorm_right_flat_kernel(x_ref, w_ref, r_ref, o_ref, *, eps, g):
    xf = x_ref[:].astype(jnp.float32)  # [bt, H]
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    xn = ((xf * jax.lax.rsqrt(var + eps))
          * w_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    r = r_ref[:]  # [128, 128] bf16
    for i in range(g):
        seg = xn[:, i * 128:(i + 1) * 128]
        o_ref[:, i * 128:(i + 1) * 128] = jax.lax.dot_general(
            seg, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_t", "interpret"))
def rmsnorm_right_flat(x, w, right, eps: float, block_t: int = 256,
                       interpret: bool = None):
    """rms_norm(x) * w, then the Kronecker right factor per 128-column
    group — flat [T, H] bf16 output. x [T, H]; right [128, 128]."""
    t, h = x.shape
    g = h // 128
    assert h % 128 == 0 and right.shape == (128, 128)
    bt = min(block_t, t)
    while bt * h * (2 * jnp.dtype(x.dtype).itemsize + 4 + 2 * 2) > 9 * 2**20 \
            and bt > 8:
        bt //= 2
    return pl.pallas_call(
        functools.partial(_rmsnorm_right_flat_kernel, eps=eps, g=g),
        out_shape=jax.ShapeDtypeStruct((t, h), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((bt, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, h), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * h * 128 + 6 * t * h,
            bytes_accessed=t * h * (jnp.dtype(x.dtype).itemsize + 2),
            transcendentals=t,
        ),
        interpret=resolve_interpret(interpret),
    )(x, w.reshape(1, h), right.astype(jnp.bfloat16))


# ---------------------------------------------------------------------------
# left Kronecker factor + per-token quant, flat in / flat out
# ---------------------------------------------------------------------------


def _left_quant_flat_kernel(lt_ref, x_ref, clip_ref, q_ref, s_ref, *,
                            q_max, g):
    bt = x_ref.shape[0]
    # flat [bt, g*128] -> [g, bt*128]: tile placement only (each 128-lane
    # column group becomes one leading-axis plane)
    x3 = jnp.concatenate(
        [x_ref[:, i * 128:(i + 1) * 128][None] for i in range(g)], axis=0)
    z2 = jax.lax.dot_general(
        lt_ref[:], x3.reshape(g, bt * 128), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # same numerics as jnp.matmul(left.T, .) bf16
    xb = z2.reshape(g, bt, 128)
    zero = jnp.zeros((), xb.dtype)
    xmax = jnp.max(jnp.maximum(xb, zero), axis=(0, 2)).astype(jnp.float32)
    xmin = jnp.min(jnp.minimum(xb, zero), axis=(0, 2)).astype(jnp.float32)
    xmax = (xmax * clip_ref[0, 0])[:, None]  # [bt, 1]
    xmin = (xmin * clip_ref[0, 1])[:, None]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / q_max)
    s_ref[:] = xs
    zq = jnp.clip(
        jnp.round(xb.astype(jnp.float32) / xs[None, :, :]), -q_max - 1, q_max
    ).astype(jnp.int8)
    q_ref[:] = jnp.concatenate([zq[i] for i in range(g)], axis=1)


@functools.partial(
    jax.jit, static_argnames=("q_max", "block_t", "interpret")
)
def left_quant_i8_flat(left_t, x, clip=None, q_max: int = 7,
                       block_t: int = 64, interpret: bool = None):
    """(codes [T, K] int8, scales [T, 1] f32) = quant(kron-left(x)).

    left_t [G, G]: the matrix that LEFT-multiplies the grouped view (pass
    left.T for a Kronecker transform's left factor, or o_trans.T for the
    attention-output head mixing — right factor = identity there);
    x [T, K] bf16 flat, K = G*128. Scale rule identical to the serving
    XLA chain (global per-token absmax over all K columns)."""
    t, k = x.shape
    g = k // 128
    assert k % 128 == 0 and left_t.shape == (g, g)
    bt = min(block_t, t)
    # x block (dbuf) + grouped copy + f32 dot out + codes planes + flat out
    while bt * k * (3 * jnp.dtype(x.dtype).itemsize + 4 + 1 + 2) > 10 * 2**20 \
            and bt > 8:
        bt //= 2
    return pl.pallas_call(
        functools.partial(_left_quant_flat_kernel, q_max=q_max, g=g),
        out_shape=(
            jax.ShapeDtypeStruct((t, k), jnp.int8),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((g, g), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bt, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * g * t * 128 + 4 * t * k,
            bytes_accessed=t * k * (jnp.dtype(x.dtype).itemsize + 1),
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(left_t.astype(jnp.bfloat16), x, _clip_arr(clip))


# ---------------------------------------------------------------------------
# merged up||gate GEMM + SwiGLU + Kronecker right factor, flat output
# ---------------------------------------------------------------------------


def _swiglu_right_flat_kernel(x_ref, wpu_ref, wpg_ref, sx_ref, swu_ref,
                              swg_ref, r_ref, o_ref, *, gb):
    xu = x_ref[:]  # int8 codes [bm, K]
    wpu = wpu_ref[0].astype(jnp.int32)  # [bn, K/2] from the [2, nh, K/2] view
    wpg = wpg_ref[0].astype(jnp.int32)
    nib_u = jnp.concatenate([wpu & 0xF, wpu >> 4], axis=1).astype(jnp.int8)
    nib_g = jnp.concatenate([wpg & 0xF, wpg >> 4], axis=1).astype(jnp.int8)
    acc_u = jax.lax.dot_general(
        xu, nib_u, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    acc_g = jax.lax.dot_general(
        xu, nib_g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    rowsum = jnp.sum(xu.astype(jnp.int32), axis=1, keepdims=True)
    sx = sx_ref[:]
    u = (acc_u - 8 * rowsum).astype(jnp.float32) * sx * swu_ref[0]
    g = (acc_g - 8 * rowsum).astype(jnp.float32) * sx * swg_ref[0]
    act = (u * (g * jax.nn.sigmoid(g))).astype(jnp.bfloat16)  # [bm, gb*128]
    r = r_ref[:]  # [128, 128] bf16 right Kronecker factor
    for gl in range(gb):
        seg = act[:, gl * 128:(gl + 1) * 128]
        o_ref[:, gl * 128:(gl + 1) * 128] = jax.lax.dot_general(
            seg, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def w4a4_matmul_i8_swiglu_right(
    x_q,
    x_scale,
    w_packed,
    w_scale,
    right,
    block_m: int = 1024,
    block_n: int = 1024,
    interpret: bool = None,
):
    """act[M, N/2] = group_r(silu(deq(x@gate.T)) * deq(x@up.T)) @ right,
    flat output. Identical math to w4a4_swiglu_grouped, flat layout
    (group g = columns [g*128, (g+1)*128))."""
    m, k = x_q.shape
    n2 = w_packed.shape[0]
    nh = n2 // 2
    assert x_q.dtype == jnp.int8 and w_packed.shape[1] * 2 == k
    assert nh % 128 == 0 and right.shape == (128, 128)
    bm = min(block_m, m)
    bn = min(block_n, nh)
    gb = bn // 128
    # ~44 MB cap under the 110 MB compiler limit: the old 11 MB cap
    # shrank bm at K=11008 and cost ~12% of the int8 dot rate
    # (tools/vmem_block_sweep.py 2026-08-20; v5e has 128 MB VMEM)
    while (bm * k + 2 * (bn * k // 2) + 2 * bn * k + 10 * bm * bn
           > 44 * 2**20 and bm > 128):
        bm //= 2
    # the [2, nh, K/2] view addresses up (plane 0) and gate (plane 1) with
    # the SAME row-block index, so bn no longer needs to divide nh (the r3
    # layout indexed gate blocks at j + nh/bn, capping bn at 256 for
    # nh = 86*128 — its largest small 128-multiple divisor — and costing
    # ~15% of the int8 dot rate); the N tail is a partial block
    wr = w_packed.reshape(2, nh, k // 2)
    sw = w_scale.reshape(2, 1, nh).astype(jnp.float32)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_swiglu_right_flat_kernel, gb=gb),
        out_shape=jax.ShapeDtypeStruct((m, nh), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, bm), pl.cdiv(nh, bn)),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn, k // 2), lambda i, j: (0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn, k // 2), lambda i, j: (1, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda i, j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda i, j: (1, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n2 * k + 2 * m * nh * 128,
            bytes_accessed=m * k + n2 * k // 2 + m * nh * 2,
            transcendentals=m * nh,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=resolve_interpret(interpret),
    )(x_q, wr, wr, sx, sw, sw, right.astype(jnp.bfloat16))
