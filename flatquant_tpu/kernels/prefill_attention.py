"""Flash (chunked, online-softmax) causal prefill attention.

TPU analog of the reference's flash-attn2 prefill
(model_tools/modeling_llama.py:125-137 routes prompts through
LlamaFlashAttention2): memory is O(S * block) instead of the dense
[B, H, S, S] fp32 score tensor, so long prompts fit in HBM/VMEM.

Design (TPU-first, not a port):
  - GQA-aware blocking: one grid step per (batch, kv_head, q_block); the
    n_rep query heads sharing a kv head are stacked into the MXU M axis
    ([n_rep * blk_q, hd] x [hd, blk_k]), so K/V are never repeated
    n_rep times in HBM (the dense path and GPU flash kernels both pay
    that copy).
  - K/V for the whole sequence live in VMEM per (batch, kv_head): at
    hd=128, S=8192 costs 4 MB — within scoped VMEM. The online-softmax
    fori only touches [blk_k, hd] tiles.
  - Causal block skipping by trip count: q block i scans only
    ceil((i+1)*blk_q / blk_k) K blocks; the diagonal block is masked
    elementwise. Upper-triangle blocks are never visited, halving FLOPs
    vs a masked dense pass.

`flash_prefill_ref` is the pure-XLA blockwise oracle (runs everywhere,
O(S * blk) memory) used on CPU and in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from flatquant_tpu.kernels.common import resolve_interpret
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _flash_prefill_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, blk_q,
                          blk_k, hd, n_rep):
    """Grid: (B, nkv, n_qblk) over flat row-major views (see wrapper):
    q/o [1, blk_q, n_rep*hd]; k/v [1, S, hd].

    The n_rep query heads sharing this kv head are processed by a static
    unroll; K/V stay resident in VMEM across the reps, so GQA still never
    repeats K/V in HBM. MXU operands stay in the input dtype (bf16 at
    serving time runs the systolic array at full rate); softmax stats and
    the accumulator are fp32 via preferred_element_type.

    VPU economy (this kernel is near VPU-bound: per score element the MXU
    does 2*hd*2 flops but the softmax chain costs ~5-7 VPU passes, and at
    hd=128 those rates roughly tie on v5e):
      - sm_scale * log2(e) folds into q once per block (q is already
        bf16, so the fold costs one extra ulp, not a precision class);
        the softmax runs in the exp2 domain (shift-invariant, cheaper
        transcendental) — the r3 kernel spent a full [blk_q, blk_k] f32
        multiply per block on late scaling;
      - the K loop splits into FULL blocks (cols all <= rows: no mask —
        the r3 kernel paid the iota+where pass on every block) and
        DIAGONAL blocks (elementwise causal mask). Upper-triangle blocks
        are never visited, as before.
    """
    qi = pl.program_id(2)
    mxu_dt = q_ref.dtype
    q_start = qi * blk_q
    row_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
    # blocks entirely below the diagonal need no mask; the rest straddle it
    n_full = q_start // blk_k
    n_kblk = (q_start + blk_q + blk_k - 1) // blk_k

    for r in range(n_rep):
        q = (q_ref[0, :, r * hd:(r + 1) * hd].astype(jnp.float32)
             * (sm_scale * _LOG2E)).astype(mxu_dt)

        def tile(ki, carry, masked: bool):
            m, l, acc = carry
            k_start = ki * blk_k
            kblk = k_ref[0, pl.ds(k_start, blk_k), :]
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [blk_q, blk_k], already in the log2 domain
            if masked:
                col_pos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (1, blk_k), 1)
                s = jnp.where(row_pos >= col_pos, s, -jnp.inf)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            vblk = v_ref[0, pl.ds(k_start, blk_k), :]
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(mxu_dt), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((blk_q, 1), jnp.float32)
        acc0 = jnp.zeros((blk_q, hd), jnp.float32)
        carry = jax.lax.fori_loop(
            0, n_full, lambda ki, c: tile(ki, c, masked=False),
            (m0, l0, acc0))
        m, l, acc = jax.lax.fori_loop(
            n_full, n_kblk, lambda ki, c: tile(ki, c, masked=True), carry)
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0, :, r * hd:(r + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "blk_q", "blk_k", "interpret")
)
def flash_prefill_attention(q, k, v, sm_scale: float, blk_q: int = 256,
                            blk_k: int = 512, interpret: bool = None):
    """Causal self-attention over a full prompt, O(S * blk) memory.

    q [B, S, nh, hd]; k/v [B, S, nkv, hd] (nh % nkv == 0, GQA shared
    kv heads are NOT repeated). Returns [B, S, nh, hd] in q.dtype.
    S must be a multiple of 128 (serving buckets guarantee this).

    Layout: the kernel reads head columns straight out of row-major
    [B, S, heads*hd] views (the GEMM/rope-producer layout) via column-block
    BlockSpecs — the standard GEMM N-block pattern with proper (blk, 128)
    tiles. The first version pre-transposed q/k/v to head-major
    [B, nkv, n_rep, S, hd] and paid ~150 us/layer of XLA layout copies on
    both sides (device trace 2026-08-18: copy.64-67 at 62.5 us each plus
    the fused output untranspose); this form needs none.
    """
    B, S, nh, hd = q.shape
    nkv = k.shape[2]
    n_rep = nh // nkv
    bq = _shrink_to_divisor(min(blk_q, S), S)
    bk = _shrink_to_divisor(min(blk_k, S), S)

    q3 = q.reshape(B, S, nh * hd)  # minor-dims collapse: no data movement
    k3 = k.reshape(B, S, nkv * hd)
    v3 = v.reshape(B, S, nkv * hd)

    grid = (B, nkv, S // bq)
    out = pl.pallas_call(
        functools.partial(_flash_prefill_kernel, sm_scale=sm_scale, blk_q=bq,
                          blk_k=bk, hd=hd, n_rep=n_rep),
        out_shape=jax.ShapeDtypeStruct((B, S, nh * hd), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, n_rep * hd), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
                pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, n_rep * hd), lambda b, h, i: (b, i, h)
            ),
        ),
        interpret=resolve_interpret(interpret),
    )(q3, k3, v3)
    return out.reshape(B, S, nh, hd)


def _flash_prefill_kernel_kt(q_ref, kt_ref, v_ref, o_ref, *, sm_scale,
                             blk_q, blk_k, hd, n_rep, unroll=1):
    """_flash_prefill_kernel with K arriving TRANSPOSED [1, 1, hd, S]:
    the QK dot's stationary operand then has its contraction dim on
    sublanes, so Mosaic issues it without a per-tile transpose (ablation
    2026-08-20: 530 vs 556 us at llama dims — the fused prologue emits
    this layout for free, so the fused prefill path takes the win)."""
    qi = pl.program_id(2)
    mxu_dt = q_ref.dtype
    q_start = qi * blk_q
    row_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
    n_full = q_start // blk_k
    n_kblk = (q_start + blk_q + blk_k - 1) // blk_k

    for r in range(n_rep):
        q = (q_ref[0, :, r * hd:(r + 1) * hd].astype(jnp.float32)
             * (sm_scale * _LOG2E)).astype(mxu_dt)

        def tile(ki, carry, masked: bool):
            m, l, acc = carry
            k_start = ki * blk_k
            kblk = kt_ref[0, 0, :, pl.ds(k_start, blk_k)]  # [hd, bk]
            s = jax.lax.dot_general(
                q, kblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if masked:
                col_pos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (1, blk_k), 1)
                s = jnp.where(row_pos >= col_pos, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            vblk = v_ref[0, pl.ds(k_start, blk_k), :]
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(mxu_dt), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((blk_q, 1), jnp.float32)
        acc0 = jnp.zeros((blk_q, hd), jnp.float32)
        if unroll > 1:
            # manual unroll (bounds are qi-dependent, so lax's unroll=
            # is unavailable): tile 2i+1's QK dot is carry-independent,
            # so Mosaic's VLIW scheduler can issue it on the MXU while
            # tile 2i's softmax chain occupies the VPU
            def tile2(i, c):
                return tile(2 * i + 1, tile(2 * i, c, masked=False),
                            masked=False)

            carry = jax.lax.fori_loop(0, n_full // 2, tile2, (m0, l0, acc0))
            carry = jax.lax.fori_loop(
                n_full // 2 * 2, n_full,
                lambda ki, c: tile(ki, c, masked=False), carry)
        else:
            carry = jax.lax.fori_loop(
                0, n_full, lambda ki, c: tile(ki, c, masked=False),
                (m0, l0, acc0))
        m, l, acc = jax.lax.fori_loop(
            n_full, n_kblk, lambda ki, c: tile(ki, c, masked=True), carry)
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0, :, r * hd:(r + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "blk_q", "blk_k", "unroll",
                              "interpret")
)
def flash_prefill_attention_kt(q, kt, v, sm_scale: float, blk_q: int = 256,
                               blk_k: int = 512, unroll: int = 1,
                               interpret: bool = None):
    """flash_prefill_attention with K pre-transposed [B, nkv, hd, S]
    (the attn_prologue output layout). q [B, S, nh, hd];
    v [B, S, nkv, hd]."""
    B, S, nh, hd = q.shape
    nkv = kt.shape[1]
    n_rep = nh // nkv
    bq = _shrink_to_divisor(min(blk_q, S), S)
    bk = _shrink_to_divisor(min(blk_k, S), S)
    q3 = q.reshape(B, S, nh * hd)
    v3 = v.reshape(B, S, nkv * hd)
    out = pl.pallas_call(
        functools.partial(_flash_prefill_kernel_kt, sm_scale=sm_scale,
                          blk_q=bq, blk_k=bk, hd=hd, n_rep=n_rep,
                          unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((B, S, nh * hd), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nkv, S // bq),
            in_specs=[
                pl.BlockSpec((1, bq, n_rep * hd), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, 1, hd, S), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, n_rep * hd), lambda b, h, i: (b, i, h)
            ),
        ),
        interpret=resolve_interpret(interpret),
    )(q3, kt, v3)
    return out.reshape(B, S, nh, hd)


def _flash_prefill_kernel_kt_i8(q_ref, kt_ref, v_ref, o_ref, ki8_ref,
                                vi8_ref, sc_ref, *, sm_scale, blk_q, blk_k,
                                hd, n_rep, pv_i8):
    """int8-MXU flash prefill (VERDICT r4 item 2): Q·Kᵀ (and optionally
    P·V) run on the int8 MXU at 2x the bf16 rate — the same rate
    advantage the w4a4 GEMMs exploit (int4_matmul.py:276-289) applied to
    the attention score matmuls, which hold flash prefill at 0.33-0.42
    SoL of the bf16 ceiling.

    Quantization is fully in-kernel (inputs stay bf16; no extra HBM
    pass, no engine change):
      - K (transposed [hd, S]) and V are quantized ONCE per (batch,
        kv_head) into int8 VMEM scratch on the first q-block grid step
        (TPU grids run sequentially, scratch persists across the
        innermost dim) with one per-head symmetric scale each — K/V are
        flat (rotated into the int4-cache space), so per-head scales
        suffice; the int4 KV cache itself is coarser.
      - q is quantized per ROW (per query token) after the
        sm_scale*log2e fold, so the score dequant is a single [bq, 1]
        column-broadcast multiply per tile: s = s_i32 * (q_row_scale *
        k_scale/127).
      - pv_i8=True also quantizes P: rows of p are max-normalized by the
        online softmax (max == 1), so p_i8 = round(p * 127) uses the
        full int8 range; acc picks up the scalar v_scale/(127*127).

    Numerics: int32 accumulation is exact; the only loss is the int8
    rounding of q/k (SNR ~ 40 dB, before a softmax that suppresses small
    scores) and of p (per-row max-normalized). Parity bound vs the fp32
    blockwise oracle is asserted in tests/test_prefill_attention.py."""
    qi = pl.program_id(2)
    q_start = qi * blk_q
    row_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
    n_full = q_start // blk_k
    n_kblk = (q_start + blk_q + blk_k - 1) // blk_k

    @pl.when(qi == 0)
    def _quantize_kv():
        # both int8 operands land with the contraction dim LAST — the
        # layout the int8 MXU path is fast for (int4_matmul.py's 358 TF
        # kernel contracts (1,),(1,)); the one-off transposes here are
        # amortized over all q blocks of this (batch, kv_head)
        kt = kt_ref[0, 0].astype(jnp.float32)  # [hd, S]
        ks = jnp.maximum(jnp.max(jnp.abs(kt)), 1e-30)
        ki8_ref[:, :] = jnp.clip(jnp.round(kt.T * (127.0 / ks)),
                                 -127, 127).astype(jnp.int8)  # [S, hd]
        sc_ref[0] = ks / 127.0
        vf = v_ref[0].astype(jnp.float32)  # [S, hd]
        vs = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-30)
        vi8_ref[:, :] = jnp.clip(jnp.round(vf.T * (127.0 / vs)),
                                 -127, 127).astype(jnp.int8)  # [hd, S]
        sc_ref[1] = vs / (127.0 * 127.0)

    ks127 = sc_ref[0]
    pv_scale = sc_ref[1]

    for r in range(n_rep):
        qf = (q_ref[0, :, r * hd:(r + 1) * hd].astype(jnp.float32)
              * (sm_scale * _LOG2E))
        q_amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                             1e-30)  # [bq, 1]
        q_i8 = jnp.clip(jnp.round(qf * (127.0 / q_amax)),
                        -127, 127).astype(jnp.int8)
        s_scale = q_amax * (ks127 / 127.0)  # [bq, 1] column dequant

        def tile(ki, carry, masked: bool):
            m, l, acc = carry
            k_start = ki * blk_k
            kblk = ki8_ref[pl.ds(k_start, blk_k), :]  # [bk, hd] int8
            s_i32 = jax.lax.dot_general(
                q_i8, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = s_i32.astype(jnp.float32) * s_scale
            if masked:
                col_pos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (1, blk_k), 1)
                s = jnp.where(row_pos >= col_pos, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            if pv_i8:
                p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
                vblk = vi8_ref[:, pl.ds(k_start, blk_k)]  # [hd, bk] int8
                pv = jax.lax.dot_general(
                    p_i8, vblk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_new = acc * corr + pv.astype(jnp.float32) * pv_scale
            else:
                vblk = v_ref[0, pl.ds(k_start, blk_k), :]
                acc_new = acc * corr + jax.lax.dot_general(
                    p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((blk_q, 1), jnp.float32)
        acc0 = jnp.zeros((blk_q, hd), jnp.float32)
        carry = jax.lax.fori_loop(
            0, n_full, lambda ki, c: tile(ki, c, masked=False),
            (m0, l0, acc0))
        m, l, acc = jax.lax.fori_loop(
            n_full, n_kblk, lambda ki, c: tile(ki, c, masked=True), carry)
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0, :, r * hd:(r + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "blk_q", "blk_k", "pv_i8", "interpret"),
)
def flash_prefill_attention_kt_i8(q, kt, v, sm_scale: float,
                                  blk_q: int = 256, blk_k: int = 512,
                                  pv_i8: bool = True,
                                  interpret: bool = None):
    """flash_prefill_attention_kt with int8-MXU score matmuls (see the
    kernel docstring). Same interface: q [B, S, nh, hd]; kt [B, nkv, hd,
    S]; v [B, S, nkv, hd]."""
    B, S, nh, hd = q.shape
    nkv = kt.shape[1]
    n_rep = nh // nkv
    bq = _shrink_to_divisor(min(blk_q, S), S)
    bk = _shrink_to_divisor(min(blk_k, S), S)
    q3 = q.reshape(B, S, nh * hd)
    v3 = v.reshape(B, S, nkv * hd)
    out = pl.pallas_call(
        functools.partial(_flash_prefill_kernel_kt_i8, sm_scale=sm_scale,
                          blk_q=bq, blk_k=bk, hd=hd, n_rep=n_rep,
                          pv_i8=pv_i8),
        out_shape=jax.ShapeDtypeStruct((B, S, nh * hd), q.dtype),
        grid=(B, nkv, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, n_rep * hd), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, 1, hd, S), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, n_rep * hd), lambda b, h, i: (b, i, h)
        ),
        scratch_shapes=[
            pltpu.VMEM((S, hd), jnp.int8),
            pltpu.VMEM((hd, S), jnp.int8),
            pltpu.SMEM((2,), jnp.float32),
        ],
        interpret=resolve_interpret(interpret),
    )(q3, kt, v3)
    return out.reshape(B, S, nh, hd)


def _shrink_to_divisor(b: int, S: int) -> int:
    """Largest power-of-two reduction of b that divides S (S is a multiple
    of 128 here, so 128 always terminates the loop) — legal prompt/bucket
    lengths like S=1152 must not assert, they get smaller blocks."""
    while S % b:
        b //= 2
    return b


def flash_prefill_ref(q, k, v, sm_scale: float, blk_q: int = 256):
    """Pure-XLA blockwise causal attention (same signature/layout as the
    kernel). Scans q blocks; each block attends to keys [0, blk_end) with
    an elementwise causal mask — peak live score tensor is
    [B, nh, blk_q, S] instead of [B, nh, S, S]."""
    B, S, nh, hd = q.shape
    nkv = k.shape[2]
    n_rep = nh // nkv
    bq = _shrink_to_divisor(min(blk_q, S), S)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if n_rep > 1:
        kf = jnp.repeat(kf, n_rep, axis=2)
        vf = jnp.repeat(vf, n_rep, axis=2)
    kf = kf.transpose(0, 2, 1, 3)  # [B, nh, S, hd]
    vf = vf.transpose(0, 2, 1, 3)
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, nh, S, hd]
    qblocks = qf.reshape(B, nh, S // bq, bq, hd).transpose(2, 0, 1, 3, 4)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)

    def body(carry, qb):
        i = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qb, kf) * sm_scale
        row = i * bq + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bq, 1), 2)
        s = jnp.where(row >= col, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        return i + 1, o

    _, outs = jax.lax.scan(body, 0, qblocks)  # [nblk, B, nh, bq, hd]
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, nh, S, hd)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def dense_causal_attention(q, k, v, sm_scale: float, compute_dtype=jnp.bfloat16):
    """The O(S^2)-memory dense path (previous engine behavior), kept as the
    small-S fast path and the correctness oracle."""
    B, S, nh, hd = q.shape
    nkv = k.shape[2]
    n_rep = nh // nkv
    k_att, v_att = k, v
    if n_rep > 1:
        k_att = jnp.repeat(k_att, n_rep, axis=2)
        v_att = jnp.repeat(v_att, n_rep, axis=2)
    causal = jnp.tril(jnp.ones((S, S), bool))
    bias = jnp.where(causal, 0.0, -1e9)[None, None]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(compute_dtype), k_att.astype(compute_dtype)
    ).astype(jnp.float32) * sm_scale + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v_att.astype(compute_dtype))


def prefill_attention(q, k, v, sm_scale: float, use_kernel: bool,
                      compute_dtype=jnp.bfloat16, flash_threshold: int = 1024):
    """Dispatch: Pallas flash kernel on TPU for long prompts, blockwise XLA
    elsewhere when long, dense for short prompts (lowest latency; the
    [S, S] buffer is tiny)."""
    S = q.shape[1]
    if S < flash_threshold or S % 128 != 0:
        return dense_causal_attention(q, k, v, sm_scale, compute_dtype)
    if use_kernel:
        return flash_prefill_attention(q, k, v, sm_scale)
    return flash_prefill_ref(q, k, v, sm_scale)
