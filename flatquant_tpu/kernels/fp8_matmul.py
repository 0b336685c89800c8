"""FP8 block-scaled serving GEMM: stream float8_e4m3 weights from HBM,
decode in-kernel with integer bit arithmetic, bf16 MXU, fp32 accumulate.

TPU-native analog of the reference's DeepSeek FP8 path
(deepseek_v3/kernel.py:108-191 — a Triton GEMM that multiplies fp8 tiles
by per-[128,128]-block `weight_scale_inv` factors on the fly). This
kernel makes the FP8 checkpoint itself *servable* (the baseline row of
the FP8-vs-W4A4 comparison) instead of dequantizing to bf16 at load:
weights stay 1 byte/element in HBM, so decode-shape GEMMs (HBM-bound)
stream twice the elements per byte of a bf16-weight GEMM.

Design notes (all device-measured on this v5e, M=8 K=4096 N=4096,
16.7 MB weights, 30-iter jax.profiler traces — 2026-08-20):

  - v5e has no fp8 MXU mode and Mosaic's fp8->bf16 `astype` lowers to
    something catastrophically slow (219 us for convert+dot vs the 24.8
    us u8-convert floor). e4m3 embeds EXACTLY in bf16 (4-bit exp, 3-bit
    mantissa fit in 8/7), so the decode is integer bit surgery instead:
    bf16_bits = sign<<15 | ((em<<4) + 0x3C00) — the same int32-register
    style as int4_matmul's nibble unpack.
  - e4m3 SUBNORMAL codes (em < 8, value m*2^-9) do not follow the shift
    pattern. Mosaic legalizes neither 16-bit shifts/compares nor
    bf16 cmpf here, and every select-based fixup measured +30-50 us.
    Two modes ship:
      * exact=False (default): flush-to-zero decode — 3 extra int ops
        via the arithmetic mask `& ~((em-8)>>31)`, 47 us / ~360 GB/s.
        `fp8_block_quantize` flushes subnormal codes at PACK time, so
        for self-packed weights this mode is bit-exact. For original
        HF codes the deviation is bounded by 7*2^-9*tile_scale
        (~1.6e-5 of tile absmax — 64x below e4m3's own quant step).
      * exact=True: IEEE-complete decode via the select-free value
        reconstruction  +-M * 2^(E-10), M = m + 8*[e>0], E = max(e,1)
        (masks from `(0-t)>>31`, power-of-two via exponent-field bits,
        one exact bf16 multiply) — 79 us. Exhaustively verified against
        jax's own e4m3 semantics on all 254 non-NaN codes.
  - Block scales apply to the fp32 *partial accumulator* per 128-wide
    k-chunk (scale is constant per output column within a chunk), so
    sum_c s[c,n] * (x_c @ w8_c^T) is mathematically identical to
    dequant-first but touches [bm, bn] elements per chunk instead of
    [bn, 128]. The k loop is a statically unrolled Python loop over the
    VMEM-resident decoded block: a fori_loop serialized decode against
    the MXU and cost 1.4x.
  - Scales are pre-expanded host-side to [K/128, N] fp32 (out-dim
    repeated; ~3% of the fp8 weight bytes) so the kernel's per-chunk
    scale row is one lane-aligned [1, bn] load — no sublane gathers.
  - A pure-XLA formulation (fp8_matmul_ref) traces at a suspiciously
    fast 28.8 us standalone but collapses to ~239 us inside a real
    serving loop (its reshape/transposes materialize); it remains the
    CPU/interpret fallback and the parity oracle, not the TPU path.

Weight layout matches the HF checkpoint convention: w8 [N, K] (row =
out channel), scales [ceil(N/128), ceil(K/128)] as stored in
`<name>.weight_scale_inv`. NaN codes (0x7F/0xFF) decode to +-480; DS
checkpoints contain none (asserted at load).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flatquant_tpu.kernels.common import resolve_interpret

BLOCK = 128
E4M3_MAX = 448.0


# ---------------------------------------------------------------------------
# host/load-time helpers
# ---------------------------------------------------------------------------


def fp8_block_quantize(w, block: int = BLOCK, ftz: bool = True):
    """Blockwise-symmetric fp8 quantization of a weight matrix.

    w [N, K] -> (w8 float8_e4m3fn [N, K], scales [ceil(N/b), ceil(K/b)]
    fp32) with scale = tile absmax / 448 (the e4m3 max normal), matching
    the layout the HF DeepSeek shards store in `weight_scale_inv`
    (deepseek_v3/kernel.py:55-105). ftz=True (default) flushes subnormal
    codes (|value| < 2^-6) to zero so the serving kernel's fast decode
    is bit-exact for weights we packed ourselves; the flushed range is
    < 1.6e-5 of tile absmax.
    """
    n, k = w.shape
    sn, sk = -(-n // block), -(-k // block)
    wf = jnp.pad(w.astype(jnp.float32), ((0, sn * block - n), (0, sk * block - k)))
    tiles = wf.reshape(sn, block, sk, block)
    absmax = jnp.max(jnp.abs(tiles), axis=(1, 3))
    scales = jnp.where(absmax == 0, 1.0, absmax / E4M3_MAX)
    q = (tiles / scales[:, None, :, None]).astype(jnp.float8_e4m3fn)
    if ftz:
        u = jax.lax.bitcast_convert_type(q, jnp.uint8)
        q = jax.lax.bitcast_convert_type(
            jnp.where((u & 0x7F) < 8, jnp.uint8(0), u), jnp.float8_e4m3fn
        )
    w8 = q.reshape(sn * block, sk * block)[:n, :k]
    return w8, scales


def expand_fp8_scales(scales, n: int, k: int, block: int = BLOCK):
    """[ceil(N/b), ceil(K/b)] checkpoint scales -> kernel layout
    [ceil(K/b), N] fp32: transposed (k-chunk index becomes the sublane
    dim) and out-dim expanded (then cut to N) so the kernel's per-chunk
    scale is one [1, bn] row. Every real DS linear is a 128-multiple;
    dims < block (tiny fixtures) collapse to one scale row, which keeps
    the inferred chunking (k // rows) consistent with the checkpoint's
    tile boundaries. Mid-size non-multiples would not, so they are
    rejected."""
    rows = -(-k // block)
    assert k % block == 0 or rows == 1, (k, block)
    assert scales.shape == (-(-n // block), rows), (scales.shape, n, k)
    s = scales.astype(jnp.float32)
    return jnp.repeat(s.T, block, axis=1)[:, :n]  # [ceil(K/b), N]


def prep_fp8_weight(w, block: int = BLOCK):
    """bf16/f32 weight [N, K] -> serving dict {"w8", "se"} (quantize +
    expand scales in one step). If `block` does not divide both dims
    (tiny test models), the largest power-of-two common divisor is used
    instead — fp8_linear infers the effective block from se's shape."""
    n, k = w.shape
    b = block
    while n % b or k % b:
        b //= 2
    w8, scales = fp8_block_quantize(w, b)
    return {"w8": w8, "se": expand_fp8_scales(scales, n, k, b)}


# ---------------------------------------------------------------------------
# in-kernel decode (int32 register arithmetic; see module docstring)
# ---------------------------------------------------------------------------


def _decode_ftz(u_i32):
    em = u_i32 & 0x7F
    bits = ((u_i32 >> 7) << 15) | ((em << 4) + 0x3C00)
    bits = bits & ~((em - 8) >> 31)  # subnormal codes -> zero
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int16), jnp.bfloat16)


def _decode_exact(u_i32):
    em = u_i32 & 0x7F
    m = u_i32 & 7
    e = em >> 3
    hp = (0 - e) >> 31                    # -1 when normal (e > 0)
    mi = m + (hp & 8)                     # mantissa with implicit bit
    ee = e + ((hp + 1) & 1)               # max(e, 1)
    pbits = ((u_i32 >> 7) << 15) | ((ee + 117) << 7)  # +-2^(E-10)
    p = jax.lax.bitcast_convert_type(pbits.astype(jnp.int16), jnp.bfloat16)
    return mi.astype(jnp.bfloat16) * p    # exact: M <= 15, 4-bit product


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _fp8_kernel(x_ref, w_ref, se_ref, o_ref, *, out_dtype, exact):
    decode = _decode_exact if exact else _decode_ftz
    # bitcast the fp8 block to u8 IN-KERNEL (free) — a host-side bitcast
    # materializes a full HBM copy of the weights per call (+40 us
    # measured at 16.7 MB)
    wu8 = jax.lax.bitcast_convert_type(w_ref[:], jnp.uint8)
    wd = decode(wu8.astype(jnp.int32))  # [bn, K] bf16
    x = x_ref[:]
    sall = se_ref[:]
    kk = x.shape[1]
    acc = jnp.zeros((x.shape[0], w_ref.shape[0]), jnp.float32)
    for c in range(kk // BLOCK):
        xw = jax.lax.dot_general(
            x[:, c * BLOCK:(c + 1) * BLOCK],
            wd[:, c * BLOCK:(c + 1) * BLOCK],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + xw * sall[c:c + 1, :]
    o_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "exact", "block_m", "block_n", "interpret"),
)
def fp8_matmul(
    x,
    w8,
    se,
    out_dtype=jnp.bfloat16,
    exact: bool = False,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = None,
):
    """y[M, N] = x[M, K] @ (w8 * blockscale)[N, K]^T, fp8 weights streamed.

    x: bf16/f32 activations, w8: float8_e4m3fn [N, K], se: expanded
    scales [K/128, N] fp32 (expand_fp8_scales). K, N must be multiples
    of 128. exact=True uses the IEEE-complete subnormal decode (see
    module docstring).
    """
    m, k = x.shape
    n = w8.shape[0]
    assert w8.shape[1] == k and k % BLOCK == 0 and n % BLOCK == 0
    assert se.shape == (k // BLOCK, n), (se.shape, k, n)
    if x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    bm = min(block_m, m)
    bn = min(block_n, n)
    # VMEM: x bf16 + w8 bytes (double-buffered) + decoded bf16 block +
    # int32 decode temporaries (~2 live) + se + acc/out
    while (2 * 2 * bm * k + 2 * bn * k + 2 * bn * k + 8 * bn * k
           + 4 * (k // BLOCK) * bn + 6 * bm * bn > 44 * 2**20
           and max(bm, bn) > 128):
        if bm >= bn:
            bm //= 2
        else:
            bn //= 2
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))

    return pl.pallas_call(
        functools.partial(_fp8_kernel, out_dtype=out_dtype, exact=exact),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (k // BLOCK, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=2 * m * k + n * k + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=resolve_interpret(interpret),
    )(x, w8, se)


def fp8_matmul_ref(x, w8, se, out_dtype=jnp.bfloat16):
    """Pure-XLA reference (and CPU fallback): same chunked math as the
    kernel with IEEE decode (== kernel exact=True; == kernel exact=False
    on ftz-packed weights, which have no subnormal codes). The chunk
    width is inferred from se's sublane dim, so non-128 blocks (tiny
    test models) work here even though the TPU kernel is 128-only."""
    m, k = x.shape
    n = w8.shape[0]
    nc = se.shape[0]
    b = k // nc
    xc = x.astype(jnp.bfloat16).reshape(m, nc, b)
    wc = w8.astype(jnp.bfloat16).reshape(n, nc, b)
    parts = jnp.einsum(
        "mck,nck->cmn", xc, wc, preferred_element_type=jnp.float32
    )  # [nc, m, n]
    acc = jnp.sum(parts * se[:, None, :], axis=0)
    return acc.astype(out_dtype)


def fp8_linear(x, lin: dict, out_dtype=None, use_kernel: bool = None,
               exact: bool = False):
    """Apply an fp8 serving linear dict {"w8", "se"} to x [..., K].

    The block size is inferred as K // se.shape[0]; the Pallas kernel
    serves the 128-block (checkpoint-convention) aligned case on TPU,
    everything else (CPU, tiny test dims) runs the XLA reference."""
    if out_dtype is None:
        out_dtype = x.dtype if x.dtype != jnp.float32 else jnp.bfloat16
    k = x.shape[-1]
    n = lin["w8"].shape[0]
    k_aligned = k % BLOCK == 0 and k // lin["se"].shape[0] == BLOCK
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    x2 = x.reshape(-1, k)
    if use_kernel and k_aligned:
        w8, se = lin["w8"], lin["se"]
        if n % BLOCK:
            # K-aligned but ragged N (e.g. real DeepSeek-V3 kv_a_proj:
            # N = kv_lora_rank + qk_rope = 576 — ADVICE r4): zero-pad the
            # output rows up to the kernel's 128 tile and slice. Ragged-N
            # weights are the small projections, so the per-call pad copy
            # is cheap — far cheaper than dropping to the XLA ref path
            # (~239 us in a serving loop, see module docstring).
            pad = BLOCK - n % BLOCK
            w8 = jnp.pad(w8, ((0, pad), (0, 0)))
            se = jnp.pad(se, ((0, 0), (0, pad)))
        y = fp8_matmul(x2, w8, se, out_dtype=out_dtype, exact=exact)[:, :n]
    else:
        y = fp8_matmul_ref(x2, lin["w8"], lin["se"], out_dtype=out_dtype)
    return y.reshape(x.shape[:-1] + (n,))
