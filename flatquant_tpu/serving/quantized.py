"""Real-quant serving model: packed int4 weights + online transforms.

The TPU replacement for the reference's deploy/ stack
(deploy/transformers/modeling_llama.py + deploy/nn/*): a baked+calibrated
model converts once into
  - planar-packed int4 weights + per-out-channel fp32 scales (Linear4bit
    analog, deploy/nn/linear.py:22-77)
  - fixed Kronecker/single transform matrices in bf16 (OnlineTrans analog,
    deploy/nn/online_trans.py:18-67)
  - LAC clip factors baked to sigmoid(c) scalars (Quantizer analog,
    deploy/nn/quantization.py:5-44)

The decode hot path per layer is: kron-transform -> per-token quant ->
W4A8 Pallas GEMM (x7) + attention over the KV cache, mirroring the
reference decode stack (SURVEY 3.3) but with XLA fusing the transform +
quant chain and Pallas handling the weight-bound GEMMs.

KV cache: asymmetric int4 per (token, head) with k-transform pre-quant and
q rotated by Pk^{-T} (kv_cache.py:267-289 semantics), stored packed; a
bf16 cache mode exists for kv16 configs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from flatquant_tpu.core.transforms import decompose_matrices, single_matrix
from flatquant_tpu.kernels.int4_matmul import (
    pack_weight_planar,
    quant_acts_i8,
    w4a4_matmul_i8,
    w4a4_matmul_i8_swiglu,
    w4a8_matmul,
    w4a8_matmul_ref,
)
from flatquant_tpu.core.quant import weight_find_params, weight_quantize_int
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.quantize.spec import FQConfig


# ---------------------------------------------------------------------------
# conversion: baked fp model -> packed serving params
# ---------------------------------------------------------------------------


def _pack_linear(w, w_cfg, w_q=None) -> Dict[str, Any]:
    """fp weight [out, in] -> packed codes + per-channel scale.

    w_bits=4: planar int4 nibbles ("wp", the Pallas kernel layout);
    w_bits=8: plain int8 codes ("w8", fed to XLA's int8 dot — which runs
    at the same 2x-bf16 MXU rate the Pallas path measured, with no
    sub-byte packing needed).

    `w` provides the scale (find_params on the pre-weight-quant baked
    weight — the same rule GPTQ/RTN use); `w_q`, when given, carries
    values already on that grid (gptq_model / rtn_quantize_params output)
    whose integer codes are recovered exactly by rounding against the
    scale. Without it the export silently degrades to plain RTN even when
    --gptq ran (the reference exports from the GPTQ quantizers,
    flat_utils.py:97-204)."""
    scale, zero = weight_find_params(w, w_cfg)
    q = weight_quantize_int(w if w_q is None else w_q, scale, zero, w_cfg)
    if w_cfg.bits == 8:
        return {"w8": q, "scale": scale[:, 0].astype(jnp.float32)}
    return {"wp": pack_weight_planar(q), "scale": scale[:, 0].astype(jnp.float32)}


def _clip_sigmoid(c) -> Optional[jnp.ndarray]:
    return None if c is None else jax.nn.sigmoid(c.astype(jnp.float32))


def _interleave_rows(ws, tp: int):
    """Stack per-shard row blocks of several [out_i, ...] arrays:
    [a0, b0, ..., a1, b1, ...] so that sharding the merged out dim over tp
    gives each shard its own contiguous [a_s; b_s; ...] — the per-rank
    weight layout of the reference's vLLM QKVParallelLinear
    (llama_flatquant.py:557-562 remaps transforms the same way)."""
    if tp == 1:
        return jnp.concatenate(ws, axis=0)
    blocks = []
    for s in range(tp):
        for w in ws:
            o = w.shape[0] // tp
            blocks.append(w[s * o:(s + 1) * o])
    return jnp.concatenate(blocks, axis=0)


def _pack_linear_rp(w, w_cfg, tp: int, w_q=None) -> Dict[str, Any]:
    """_pack_linear for ROW-parallel weights (o/down) under tensor
    parallelism: the planar int4 packing pairs channel c with c + K/2
    GLOBALLY, which would make an in-dim shard reference channels it does
    not own. Pack each shard's K/tp input-channel block separately so the
    byte dim shards into valid local planar packings (per-out-channel
    scales are blocking-invariant)."""
    if tp == 1 or w_cfg.bits == 8:
        return _pack_linear(w, w_cfg, w_q)
    scale, zero = weight_find_params(w, w_cfg)
    q = weight_quantize_int(w if w_q is None else w_q, scale, zero, w_cfg)
    kb = q.shape[1] // tp
    wp = jnp.concatenate(
        [pack_weight_planar(q[:, s * kb:(s + 1) * kb]) for s in range(tp)],
        axis=1)
    return {"wp": wp, "scale": scale[:, 0].astype(jnp.float32)}


def build_serving_params(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    baked_params: dict,
    baked_fq,
    dtype=jnp.bfloat16,
    merge_projections: bool = False,
    eval_params: Optional[dict] = None,
    perm_transforms: bool = False,
    tp: int = 1,
) -> dict:
    """Convert a reparameterized (bake_model, NOT rtn-quantized) model into
    the packed serving format. Stacked over layers like the fp params.

    merge_projections=True fuses q/k/v into one packed GEMM and up/gate
    into another (vLLM QKVParallelLinear / MergedColumnParallelLinear
    analog, llama_flatquant.py:171-187): one per-token quantization + one
    kernel dispatch instead of three. The merged input uses the q (resp.
    up) branch's LAC clip factors — a serving-level approximation; leave
    False for exact fake-vs-real parity checks.

    eval_params: the output of gptq_model / rtn_quantize_params. When
    given, the packed integer codes come from these on-grid weights
    (preserving GPTQ error feedback) while scales still come from
    baked_params — the combination the quantized eval path actually used.

    perm_transforms=True stores Kronecker transforms in the one-copy
    transposed-output form (kron_transform_perm) and permutes the
    matching packed weights' input channels to compensate — identical
    results, less prefill glue traffic. The serving production default;
    leave False to compare layouts.

    tp > 1 lays the packed weights out for tensor-parallel serving under
    shard_map (parallel/serving_tp.py): merged projections interleave
    per-shard row blocks ([q_s;k_s;v_s] / [up_s;gate_s] per shard) and
    row-parallel o/down weights pack their int4 nibbles per input-channel
    shard block — sharding the out (resp. packed-in) dim over "tp" then
    hands every device a self-contained local model. Requires shard-aligned
    transforms (init_model_fq(tp=tp)) and tp | num_kv_heads."""
    assert fq_cfg.w_cfg.sym and fq_cfg.w_cfg.group_size <= 0, (
        "real-quant path currently supports symmetric per-channel weights "
        "(the reference CUTLASS path has the same restriction, REALQUANT.md)"
    )
    assert fq_cfg.w_cfg.bits in (4, 8), "real-quant weights: int4 or int8"
    if tp > 1:
        assert not perm_transforms, "perm layout + tp not combined yet"
        assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
            "head-granular tp rule", cfg.num_heads, cfg.num_kv_heads, tp)
        assert cfg.intermediate_size % tp == 0
    w_cfg = fq_cfg.w_cfg
    eval_layers = (eval_params or baked_params)["layers"]

    def convert_layer(lp, lfq, elp):
        a, m = lfq.attn, lfq.mlp
        out = {
            "ln1_w": lp["ln1_w"].astype(jnp.float32),
            "ln2_w": lp["ln2_w"].astype(jnp.float32),
        }
        # transform matrices first (baked, diag already folded into
        # norms): their factor shapes drive the optional input-channel
        # permutation of the packed weights below
        ln_pair = ug_pair = down_pair = None
        if a.ln_trans is not None:
            left, right = decompose_matrices(a.ln_trans)
            ln_pair = (left.astype(dtype), right.astype(dtype))
            out["ln_tp" if perm_transforms else "ln_t"] = ln_pair
        if m.up_gate_trans is not None:
            left, right = decompose_matrices(m.up_gate_trans)
            ug_pair = (left.astype(dtype), right.astype(dtype))
            out["ug_tp" if perm_transforms else "ug_t"] = ug_pair
        if m.down_trans is not None:
            left, right = decompose_matrices(m.down_trans)
            down_pair = (left.astype(dtype), right.astype(dtype))
            out["down_tp" if perm_transforms else "down_t"] = down_pair

        o_mat = None
        if a.o_trans is not None:
            o_mat = single_matrix(a.o_trans).astype(dtype)
            out["o_tp" if perm_transforms else "o_t"] = o_mat

        def maybe_perm(w, pair):
            if not perm_transforms or pair is None:
                return w
            return _perm_in_channels(w, pair[0].shape[0], pair[1].shape[0])

        def maybe_perm_o(w):
            # o-transform mixes heads within groups of g; the permuted
            # engine path emits (group, d, i) channel order instead of
            # (group, i, d) — swap the weight's input channels to match
            if not perm_transforms or o_mat is None:
                return w
            g = o_mat.shape[0]
            od, ind = w.shape
            t = ind // (g * cfg.head_dim)
            return w.reshape(od, t, g, cfg.head_dim).swapaxes(2, 3).reshape(od, ind)

        if merge_projections:
            qkv_w = _interleave_rows([lp["wq"], lp["wk"], lp["wv"]], tp)
            qkv_q = _interleave_rows([elp["wq"], elp["wk"], elp["wv"]], tp)
            out["qkv"] = _pack_linear(maybe_perm(qkv_w, ln_pair), w_cfg,
                                      maybe_perm(qkv_q, ln_pair))
            ug_w = _interleave_rows([lp["wup"], lp["wgate"]], tp)
            ug_q = _interleave_rows([elp["wup"], elp["wgate"]], tp)
            out["upgate"] = _pack_linear(maybe_perm(ug_w, ug_pair), w_cfg,
                                         maybe_perm(ug_q, ug_pair))
            out["o"] = _pack_linear_rp(maybe_perm_o(lp["wo"]), w_cfg, tp,
                                       maybe_perm_o(elp["wo"]))
            out["down"] = _pack_linear_rp(maybe_perm(lp["wdown"], down_pair),
                                          w_cfg, tp,
                                          maybe_perm(elp["wdown"], down_pair))
            if lp.get("bq") is not None:
                out["bqkv"] = _interleave_rows(
                    [lp["bq"], lp["bk"], lp["bv"]], tp).astype(jnp.float32)
        else:
            perm_of = {"wq": ln_pair, "wk": ln_pair, "wv": ln_pair,
                       "wup": ug_pair, "wgate": ug_pair, "wdown": down_pair}
            for name, key in (("q", "wq"), ("k", "wk"), ("v", "wv"),
                              ("up", "wup"), ("gate", "wgate")):
                out[name] = _pack_linear(maybe_perm(lp[key], perm_of[key]), w_cfg,
                                         maybe_perm(elp[key], perm_of[key]))
            out["down"] = _pack_linear_rp(maybe_perm(lp["wdown"], down_pair),
                                          w_cfg, tp,
                                          maybe_perm(elp["wdown"], down_pair))
            out["o"] = _pack_linear_rp(maybe_perm_o(lp["wo"]), w_cfg, tp,
                                       maybe_perm_o(elp["wo"]))
            for bkey in ("bq", "bk", "bv"):
                if lp.get(bkey) is not None:
                    out[bkey] = lp[bkey].astype(jnp.float32)
        if a.kcache_trans is not None:
            out["k_t"] = single_matrix(a.kcache_trans).astype(dtype)
            out["k_t_inv"] = single_matrix(a.kcache_trans, inv_t=True).astype(dtype)
        if a.vcache_trans is not None:
            out["v_t_inv"] = single_matrix(a.vcache_trans, inv_t=True).astype(dtype)
        # activation clip factors -> effective ratios (max and min kept
        # separate: the fake sym path clips each side before symmetrizing,
        # quant_utils.py:96-105 — serving must match exactly)
        if merge_projections:
            clip_map = (("qkv", a.q_lin), ("o", a.o_lin),
                        ("upgate", m.up_lin), ("down", m.down_lin))
        else:
            clip_map = (("q", a.q_lin), ("k", a.k_lin), ("v", a.v_lin), ("o", a.o_lin),
                        ("up", m.up_lin), ("gate", m.gate_lin), ("down", m.down_lin))
        for nm, lin in clip_map:
            rmax = _clip_sigmoid(lin.clip_a_max)
            rmin = _clip_sigmoid(lin.clip_a_min)
            if rmax is not None:
                out[nm]["a_clip"] = (rmax, rmin)
        for nm, cq in (("kc", a.k_cache), ("vc", a.v_cache), ("qc", a.q_cache)):
            cmax = _clip_sigmoid(cq.clip_a_max)
            cmin = _clip_sigmoid(cq.clip_a_min)
            if cmax is not None:
                out[nm + "_clip"] = (cmax, cmin)
        return out

    layers = jax.vmap(convert_layer)(baked_params["layers"], baked_fq, eval_layers)
    head = baked_params.get("lm_head", baked_params["embed"])
    return {
        "embed": baked_params["embed"].astype(dtype),
        "final_norm_w": baked_params["final_norm_w"].astype(jnp.float32),
        "lm_head": head.astype(dtype),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# online ops
# ---------------------------------------------------------------------------


def kron_transform(x, left_right):
    """x [..., M*N] @ kron(left, right) with bf16 matrices."""
    left, right = left_right
    shape = x.shape
    ln, rn = left.shape[0], right.shape[0]
    xm = x.reshape(-1, ln, rn).astype(left.dtype)
    xm = jnp.matmul(xm, right)
    xm = jnp.matmul(left.T, xm)
    return xm.reshape(shape)


def kron_transform_perm(x, left_right):
    """kron_transform with the output channels in transposed (j*ln+i)
    order — one layout copy instead of two (device-traced ~130 us each at
    the 11008 inter dim, S=2048; rationale in core/kron.py
    kronecker_matmul_perm). Per-token quantization is permutation-
    invariant and the downstream packed weight's input channels are
    permuted once at build time (_perm_in_channels), so end-to-end
    results are unchanged."""
    from flatquant_tpu.core.kron import kronecker_matmul_perm

    left, right = left_right
    return kronecker_matmul_perm(x.astype(left.dtype), left, right)


def _perm_in_channels(w, ln: int, rn: int):
    """Permute a weight's [out, in] input channels from standard (i*rn+j)
    to the transposed (j*ln+i) order kron_transform_perm emits — per
    ln*rn block when the transform is shard-aligned block-diagonal
    (in > ln*rn, tp>1), matching the transform's own blocking."""
    out, ind = w.shape
    assert ind % (ln * rn) == 0, (ind, ln, rn)
    return w.reshape(out, -1, ln, rn).swapaxes(2, 3).reshape(out, ind)


# minimum input width for routing per-token act quant through the Pallas
# quant_acts_i8 kernel at prefill shapes; None = always use the XLA chain
# (see the measurement note inside _quant_linear)
PALLAS_QUANT_MIN_K: Optional[int] = 8192


def _quant_linear(x2d, lin, use_kernel: bool, out_dtype=jnp.bfloat16,
                  quant_acts: bool = True, a_q_max: int = 7,
                  axis_name: Optional[str] = None):
    """Per-token quant + quantized-weight matmul. x2d: [T, K] fp.

    axis_name: set inside a shard_map whose named axis shards THIS linear's
    input channels (row-parallel o/down under tensor parallelism). The
    per-token quant scale then uses the GLOBAL absmax (pmax/pmin over the
    axis) so sharded serving is bit-identical to single-device — the
    reference's vLLM path instead quantizes per-rank
    (llama_flatquant.py:557-562), trading exactness for one less collective;
    here the [T, 1] pmax rides ICI for free next to the output psum.

    Scale rule is byte-identical to the fake path (quant_utils.py:88-108):
    xmax/xmin clipped separately by their sigmoid factors, then
    absmax = max(|xmin|, xmax), scale = absmax / a_q_max (7 for a4,
    127 for a8 — the same kernels serve W4A4, W4A8 and W8A8: integer
    products stay exact in the fp32/int32 accumulators for all of them).

    Weight layouts: "wp" planar int4 nibbles (Pallas kernels); "w8" plain
    int8 codes (XLA int8 dot, which reaches the same 2x-bf16 MXU rate).

    quant_acts=False is the weight-only (W4A16/W8A16) serving mode: raw
    bf16 activations flow through the quantized-weight matmul with unit
    act scale — the epilogue algebra is exact for arbitrary x, not just
    integer codes. The reference's CUTLASS int4xint4 deploy path has no
    weight-only mode at all.
    """
    w8 = lin.get("w8")
    if not quant_acts:
        if w8 is not None:
            # keep the caller's compute dtype (bf16 in serving; f32 in the
            # exact-parity tests) — int8 codes widen losslessly to both
            y = jnp.matmul(x2d, w8.T.astype(x2d.dtype),
                           preferred_element_type=jnp.float32)
            return (y * lin["scale"].reshape(1, -1)).astype(out_dtype)
        ones = jnp.ones((x2d.shape[0], 1), jnp.float32)
        if use_kernel:
            return w4a8_matmul(x2d.astype(jnp.bfloat16), ones, lin["wp"],
                               lin["scale"], out_dtype)
        return w4a8_matmul_ref(x2d, ones, lin["wp"], lin["scale"], out_dtype)
    clip = lin.get("a_clip")
    if (use_kernel and axis_name is None and PALLAS_QUANT_MIN_K is not None
            and x2d.shape[0] >= 256 and x2d.shape[1] >= PALLAS_QUANT_MIN_K
            and x2d.shape[1] % 128 == 0):
        # single-HBM-pass Pallas quant (quant_acts_i8). Device story:
        # standalone it beats the 3-pass XLA chain 1.33x at both 4096 and
        # 11008 (tools/glue_compare.py), and wins 1.11x when the producer
        # is a kron transform — but inside the full layer XLA fuses the
        # silu*up producer INTO the quant chain, and cutting that fusion
        # measured prefill 1.48x -> 1.17x e2e (bench.py). Disabled by
        # default; re-evaluated whenever the producer becomes a Pallas op
        # (e.g. the swiglu-fused GEMM) via this knob.
        xq_i8, xs = quant_acts_i8(x2d, clip=clip, q_max=a_q_max)
        if w8 is not None:
            acc = jax.lax.dot_general(
                xq_i8, w8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * xs * lin["scale"].reshape(1, -1)
            return out.astype(out_dtype)
        return w4a4_matmul_i8(xq_i8, xs, lin["wp"], lin["scale"], out_dtype)
    xf = x2d.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    if axis_name is not None:
        # input channels are sharded over this named axis: the per-token
        # scale must see the global extrema to match single-device math
        xmax = jax.lax.pmax(xmax, axis_name)
        xmin = jax.lax.pmin(xmin, axis_name)
    if clip is not None:
        rmax, rmin = clip
        xmax = xmax * rmax
        xmin = xmin * rmin
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / a_q_max)
    xq = jnp.clip(jnp.round(xf / xs), -a_q_max - 1, a_q_max)
    if w8 is not None:
        # int8 x int8 -> int32 on the MXU's 2x-rate path (codes are exact)
        acc = jax.lax.dot_general(
            xq.astype(jnp.int8), w8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * xs * lin["scale"].reshape(1, -1)
        return out.astype(out_dtype)
    if use_kernel:
        # int8-MXU kernel at ALL sizes: 2x the bf16 MXU rate at prefill
        # (359 vs 161 TFLOPs) AND 12-19% faster at decode shapes — the
        # integer unpack (no float converts) streams weights at 693 vs
        # 621 GB/s (M=1 sweep, 2026-08-18). Multiplies the exact same
        # integers as the bf16-code kernel, so results are bit-identical.
        # w4a8_matmul (bf16 codes) remains for the weight-only path above,
        # whose unquantized bf16 activations cannot be int8.
        return w4a4_matmul_i8(
            xq.astype(jnp.int8), xs, lin["wp"], lin["scale"], out_dtype
        )
    return w4a8_matmul_ref(xq.astype(jnp.bfloat16), xs, lin["wp"],
                           lin["scale"], out_dtype)


def _quant_swiglu(x2d, lin, use_kernel: bool, out_dtype=jnp.bfloat16,
                  quant_acts: bool = True, a_q_max: int = 7):
    """silu(gate) * up for a merged up||gate projection (rows [0, N/2) =
    up, [N/2, N) = gate, the build_serving_params merge order).

    Prefill kernel path: one int8-MXU GEMM with the SwiGLU fused into the
    epilogue (w4a4_matmul_i8_swiglu) — never materializes the [T, N]
    intermediate (~180 MB of HBM traffic per llama-2-7b layer at S=2048).
    All other paths (decode, CPU, W8A8, weight-only) compose the plain
    quantized matmul with an eager silu — numerically the fused epilogue
    evaluates silu in f32 before the out_dtype cast, a strict precision
    improvement over silu-on-bf16."""
    if (use_kernel and quant_acts and "wp" in lin and x2d.shape[0] >= 256
            and a_q_max == 7):
        clip = lin.get("a_clip")
        if (PALLAS_QUANT_MIN_K is not None
                and x2d.shape[1] >= PALLAS_QUANT_MIN_K
                and x2d.shape[1] % 128 == 0):
            xq_i8, xs = quant_acts_i8(x2d, clip=clip, q_max=a_q_max)
        else:
            xf = x2d.astype(jnp.float32)
            xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
            xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
            if clip is not None:
                xmax = xmax * clip[0]
                xmin = xmin * clip[1]
            absmax = jnp.maximum(jnp.abs(xmin), xmax)
            xs = jnp.where(absmax == 0, 1.0, absmax / a_q_max)
            xq_i8 = jnp.clip(jnp.round(xf / xs), -a_q_max - 1,
                             a_q_max).astype(jnp.int8)
        return w4a4_matmul_i8_swiglu(xq_i8, xs, lin["wp"], lin["scale"],
                                     out_dtype)
    y = _quant_linear(x2d, lin, use_kernel, out_dtype, quant_acts, a_q_max)
    up, gate = jnp.split(y, 2, axis=-1)
    return jax.nn.silu(gate) * up


def _act_codes_i8(x2d, clip, a_q_max: int):
    """XLA per-token quant chain -> (int8 codes, f32 scales)."""
    xf = x2d.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
    xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
    if clip is not None:
        xmax = xmax * clip[0]
        xmin = xmin * clip[1]
    absmax = jnp.maximum(jnp.abs(xmin), xmax)
    xs = jnp.where(absmax == 0, 1.0, absmax / a_q_max)
    xq = jnp.clip(jnp.round(xf / xs), -a_q_max - 1, a_q_max).astype(jnp.int8)
    return xq, xs


def _quant_mlp_grouped(x2d, sl, out_dtype=jnp.bfloat16, a_q_max: int = 7):
    """Fused MLP tail on the FLAT pipeline (kernels/flat_pipeline.py):
    upgate GEMM + silu + the down transform's Kronecker right factor in
    one kernel epilogue, then left factor + per-token quant in one pass,
    then the flat int8-MXU down GEMM. Round 2's grouped [G, T, 128] HBM
    layout was superseded after device profiling: the grouped down GEMM
    ran 657 us vs a 514 us roofline (small blocks -> 16x weight re-reads)
    and the grouped left-quant DMA'd G strided tile planes (335 GB/s);
    flat blocks restore (512, 1024) GEMM tiling and contiguous rows while
    keeping every fusion (the grouped<->flat conversion moves inside the
    kernels as free tile placement).

    x2d: post-ln2/ug-transform hidden [T, K]. Returns the down output
    [T, K], or None when the shape/config doesn't qualify (caller then
    composes the standard path)."""
    if not ("upgate" in sl and "down" in sl and "down_t" in sl
            and "wp" in sl["upgate"] and "wp" in sl["down"]
            and x2d.shape[0] >= 256 and a_q_max == 7):
        return None
    left, right = sl["down_t"]
    if right.shape[0] != 128:
        return None
    from flatquant_tpu.kernels.flat_pipeline import (
        left_quant_i8_flat,
        w4a4_matmul_i8_swiglu_right,
    )

    xq, xs = _act_codes_i8(x2d, sl["upgate"].get("a_clip"), a_q_max)
    ug = sl["upgate"]
    yf = w4a4_matmul_i8_swiglu_right(xq, xs, ug["wp"], ug["scale"], right)
    dn = sl["down"]
    zq, zs = left_quant_i8_flat(left.T, yf, clip=dn.get("a_clip"),
                                q_max=a_q_max)
    return w4a4_matmul_i8(zq, zs, dn["wp"], dn["scale"], out_dtype)


def _flat_ln_quant(x2d, ln_w, pair, clip, eps: float, a_q_max: int):
    """rms_norm + full Kronecker transform + per-token quant in two fused
    flat-layout kernels (requires the transform's right factor to be
    128x128 — the --tpu_decompose calibration mode)."""
    from flatquant_tpu.kernels.flat_pipeline import (
        left_quant_i8_flat,
        rmsnorm_right_flat,
    )

    left, right = pair
    hf = rmsnorm_right_flat(x2d, ln_w, right, eps)
    return left_quant_i8_flat(left.T, hf, clip=clip, q_max=a_q_max)


def _grouped_attn_in(x2d, sl, eps: float, out_dtype=jnp.bfloat16,
                     a_q_max: int = 7):
    """Fused attention input path: ln1 + ln-transform + quant (flat
    pipeline) + merged qkv int8-MXU GEMM. Returns qkv
    [T, q_dim + 2*kv_dim] or None when the config doesn't qualify
    (caller composes the standard path)."""
    if not ("qkv" in sl and "ln_t" in sl and "wp" in sl["qkv"]
            and x2d.shape[0] >= 256 and a_q_max == 7):
        return None
    left, right = sl["ln_t"]
    if right.shape[0] != 128:
        return None
    xq, xs = _flat_ln_quant(x2d, sl["ln1_w"], sl["ln_t"],
                            sl["qkv"].get("a_clip"), eps, a_q_max)
    return w4a4_matmul_i8(xq, xs, sl["qkv"]["wp"], sl["qkv"]["scale"],
                          out_dtype)


def _quant_mlp_grouped_full(x2d, sl, eps: float, out_dtype=jnp.bfloat16,
                            a_q_max: int = 7):
    """End-to-end fused MLP: ln2 + ug-transform + quant + swiglu upgate
    GEMM (+ down right factor) + left+quant + down GEMM, all on the flat
    pipeline. Requires --tpu_decompose (both transforms' right factors
    128x128). Returns the down output [T, H] or None."""
    if not ("upgate" in sl and "down" in sl and "down_t" in sl
            and "ug_t" in sl and "wp" in sl["upgate"] and "wp" in sl["down"]
            and x2d.shape[0] >= 256 and a_q_max == 7):
        return None
    ug_l, ug_r = sl["ug_t"]
    dn_l, dn_r = sl["down_t"]
    if ug_r.shape[0] != 128 or dn_r.shape[0] != 128:
        return None
    from flatquant_tpu.kernels.flat_pipeline import (
        left_quant_i8_flat,
        w4a4_matmul_i8_swiglu_right,
    )

    ug = sl["upgate"]
    dn = sl["down"]
    xq, xs = _flat_ln_quant(x2d, sl["ln2_w"], sl["ug_t"],
                            ug.get("a_clip"), eps, a_q_max)
    yf = w4a4_matmul_i8_swiglu_right(xq, xs, ug["wp"], ug["scale"], dn_r)
    zq, zs = left_quant_i8_flat(dn_l.T, yf, clip=dn.get("a_clip"),
                                q_max=a_q_max)
    return w4a4_matmul_i8(zq, zs, dn["wp"], dn["scale"], out_dtype)


def quantize_kv_asym(t, clip=None, q_max: int = 15):
    """Asym int4 per (token, head) over head_dim -> (codes u8-packed? no:
    biased bf16 codes, scale, zero). Used by both cache modes; packing
    happens at the cache layer."""
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
    scale = (tmax - tmin) / q_max
    zero = jnp.round(-tmin / scale)
    q = jnp.clip(jnp.round(tf / scale) + zero, 0, q_max)
    return q, scale, zero


def dequantize_kv(q, scale, zero, dtype=jnp.bfloat16):
    return ((q - zero) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# QuaRot-style Hadamard baseline (OnlineTrans(trans="had") analog)
# ---------------------------------------------------------------------------


def hadamard_pair(n: int, dtype=jnp.bfloat16):
    from flatquant_tpu.core.hadamard import get_hadK, hadamard_matrix
    import numpy as np

    mat, k, _ = get_hadK(n)
    m2 = n // k
    right_np, _ = hadamard_matrix(m2)
    right = jnp.asarray(right_np / np.sqrt(m2), dtype)
    if k == 1:
        # pure power of two: split into two pow2 factors for the kron form
        from flatquant_tpu.core.kron import get_decompose_dim

        a, b = get_decompose_dim(n)
        la, _ = hadamard_matrix(a)
        rb, _ = hadamard_matrix(b)
        return (jnp.asarray(la / np.sqrt(a), dtype), jnp.asarray(rb / np.sqrt(b), dtype))
    left = jnp.asarray(mat / np.sqrt(k), dtype)
    return (left, right)


def build_hadamard_serving_params(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    params: dict,
    dtype=jnp.bfloat16,
) -> dict:
    """QuaRot-style W4A4 serving model: fixed Hadamard rotations in place of
    learned transforms (benchmark baseline; layer_benchmark.py's "had"
    config). Orthonormal rotations are self-inverse-transpose, so weights
    fuse with the same matrices the activations use online."""
    from flatquant_tpu.core.hadamard import hadamard_matrix
    import numpy as np

    w_cfg = fq_cfg.w_cfg

    ln_pair = hadamard_pair(cfg.hidden_size, dtype)
    down_pair = hadamard_pair(cfg.intermediate_size, dtype)
    o_np, _ = hadamard_matrix(cfg.num_heads)
    o_mat = jnp.asarray(o_np / np.sqrt(cfg.num_heads), dtype)
    k_np, _ = hadamard_matrix(cfg.head_dim)
    k_mat = jnp.asarray(k_np / np.sqrt(cfg.head_dim), dtype)

    def kron_w(w, pair):
        from flatquant_tpu.core.kron import kronecker_matmul

        left, right = pair
        return kronecker_matmul(
            w.astype(jnp.float32), left.astype(jnp.float32), right.astype(jnp.float32)
        )

    def convert_layer(lp):
        out = {
            "ln1_w": lp["ln1_w"].astype(jnp.float32),
            "ln2_w": lp["ln2_w"].astype(jnp.float32),
            "ln_t": ln_pair,
            "ug_t": ln_pair,
            "down_t": down_pair,
            "o_t": o_mat,
            "k_t": k_mat,
            "k_t_inv": k_mat,  # orthonormal: P^{-T} == P
            "v_t_inv": k_mat,
        }
        # v_proj gets the per-head rotation fused on its output dim; o_proj
        # undoes it via kron(o, k) on its input rows
        v_w = lp["wv"].astype(jnp.float32)
        v_w = (v_w.T.reshape(-1, cfg.head_dim) @ k_mat.astype(jnp.float32)).reshape(v_w.shape[1], v_w.shape[0]).T
        o_w = kron_w(lp["wo"], (o_mat, k_mat))
        for name, w in (("q", kron_w(lp["wq"], ln_pair)),
                        ("k", kron_w(lp["wk"], ln_pair)),
                        ("v", kron_w(v_w, ln_pair)),
                        ("o", o_w),
                        ("up", kron_w(lp["wup"], ln_pair)),
                        ("gate", kron_w(lp["wgate"], ln_pair)),
                        ("down", kron_w(lp["wdown"], down_pair))):
            out[name] = _pack_linear(w, w_cfg)
        for bkey in ("bq", "bk", "bv"):
            if lp.get(bkey) is not None:
                b = lp[bkey].astype(jnp.float32)
                if bkey == "bv":
                    b = (b.reshape(-1, cfg.head_dim) @ k_mat.astype(jnp.float32)).reshape(-1)
                out[bkey] = b
        return out

    layers = jax.vmap(convert_layer)(params["layers"])
    head = params.get("lm_head", params["embed"])
    return {
        "embed": params["embed"].astype(dtype),
        "final_norm_w": params["final_norm_w"].astype(jnp.float32),
        "lm_head": head.astype(dtype),
        "layers": layers,
    }
