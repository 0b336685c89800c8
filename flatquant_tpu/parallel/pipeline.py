"""Pipeline parallelism: GPipe-microbatched layer stages over a "pp" mesh axis.

The reference gets pipeline parallelism for free from vLLM's engine
(vllm_custom/llama_flatquant.py:400-460 `PPMissingLayer` / `make_layers`
stage slicing) and from accelerate's layer-to-GPU dispatch
(flatquant/utils.py:53-61). The TPU-native equivalent is not a port of
either: layers are already stacked on a leading [L, ...] axis for the
`lax.scan` body (models/llama.py:329-361), so a pipeline stage is simply
an L-shard of that stack — `shard_map` over a "pp" mesh axis gives each
device its contiguous block of layers, and activations stream between
stages with `lax.ppermute` in the classic GPipe schedule:

    tick t (t = 0 .. M+P-2):  stage r runs microbatch (t - r)
    bubble fraction = (P-1) / (M+P-1)

Within a tick every rank runs the same traced stage computation (SPMD);
ranks whose (t - r) is out of range compute on don't-care data and the
result is discarded by the schedule's selects. That waste *is* the
pipeline bubble — identical arithmetic cost to any GPipe implementation,
just expressed data-parallel-style instead of with per-rank control flow
(XLA-friendly: no data-dependent branching, one compiled program).

Composition: the "pp" axis comes from the same `make_mesh` as dp/tp/ep.
Inside the shard_map body all ops are batch-elementwise, so a "dp" axis
composes by sharding the microbatch batch dimension; tp-sharding inside a
stage would need manual collectives here and is instead served by the
GSPMD path (parallel/mesh.py) — on TPU slices, TP over ICI inside a stage
+ PP across stages is the standard large-model layout, and the design
argument for preferring pure GSPMD TP+DP at calibration scale is in
PARALLELISM.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _stage_specs(tree):
    """P("pp") for every leaf: shard the leading (layer) axis by stage."""
    return jax.tree.map(lambda _: P("pp"), tree)


def pipeline_apply(layer_fn, mesh: Mesh, stacked_layers, x_mb,
                   *broadcast_args, dp_axis: Optional[str] = None):
    """Run x_mb [M, mb, ...] through L stacked layers pipelined over "pp".

    layer_fn(layer_params_slice, x, *broadcast_args) -> x next hidden.
    stacked_layers: pytree with leading layer axis L (L % pp == 0); each
    stage scans its local L/pp slice. Returns [M, mb, ...] outputs, bit-
    identical to the sequential scan (the schedule only reorders *which
    device* runs a layer, never the math).
    """
    pp = mesh.shape["pp"]
    M = x_mb.shape[0]
    n_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
    assert n_layers % pp == 0, f"n_layers {n_layers} % pp {pp} != 0"

    x_spec = P(None, dp_axis) if dp_axis else P()
    bcast_specs = tuple(P() for _ in broadcast_args)

    def stage_scan(layers_local, x, args):
        def body(carry, lp):
            return layer_fn(lp, carry, *args), None

        out, _ = jax.lax.scan(body, x, layers_local)
        return out

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_stage_specs(stacked_layers), x_spec) + bcast_specs,
        out_specs=x_spec,
        check_vma=False,
    )
    def run(layers_local, xs, *args):
        r = jax.lax.axis_index("pp")
        recv = jnp.zeros_like(xs[0])
        outs = []
        fwd = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(M + pp - 1):
            # stage 0 injects microbatch t (if any); others use received
            inj = xs[min(t, M - 1)]
            state = jnp.where(r == 0, inj, recv)
            out = stage_scan(layers_local, state, args)
            outs.append(out)
            if t < M + pp - 2:
                recv = jax.lax.ppermute(out, "pp", fwd)
        # microbatch m exits the last stage at tick m + pp - 1
        stacked = jnp.stack([outs[m + pp - 1] for m in range(M)])
        # broadcast the last stage's results to all pp ranks
        return jax.lax.psum(
            jnp.where(r == pp - 1, stacked, jnp.zeros_like(stacked)), "pp"
        )

    return run(stacked_layers, x_mb, *broadcast_args)


def pipeline_apply_stateful(layer_fn, mesh: Mesh, stacked_layers, state,
                            x_mb, *broadcast_args,
                            dp_axis: Optional[str] = None):
    """pipeline_apply for layers that carry per-layer STATE (KV caches):
    the real-quant serving composition the reference gets from vLLM PP
    (llama_flatquant.py:400-460 IntermediateTensors between stages, KV
    blocks living with each stage's layers).

    layer_fn(layer_slice, state_slice, x, mb_index, *broadcast_args)
      -> (x_out, state_slice_out)
    state: pytree with leading layer axis L, sharded P("pp") like the
    layers — each stage OWNS its layers' cache shard; activations flow
    between stages, caches never move. mb_index (traced int32) tells the
    layer which microbatch is flowing so it can address that microbatch's
    cache rows.

    Bubble ticks (stage r at tick t with t - r outside [0, M)) compute on
    don't-care data; their STATE writes are discarded by a select, so the
    cache after the schedule equals the sequential result exactly.
    Returns (y_mb [M, mb, ...], state_out).
    """
    pp = mesh.shape["pp"]
    M = x_mb.shape[0]
    n_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
    assert n_layers % pp == 0, f"n_layers {n_layers} % pp {pp} != 0"

    x_spec = P(None, dp_axis) if dp_axis else P()
    bcast_specs = tuple(P() for _ in broadcast_args)

    def stage_scan(layers_local, st_local, x, mb_idx, args):
        def body(carry, lp_st):
            lp, st = lp_st
            y, st_new = layer_fn(lp, st, carry, mb_idx, *args)
            return y, st_new

        out, st_out = jax.lax.scan(body, x, (layers_local, st_local))
        return out, st_out

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_stage_specs(stacked_layers), _stage_specs(state),
                  x_spec) + bcast_specs,
        out_specs=(x_spec, _stage_specs(state)),
        check_vma=False,
    )
    def run(layers_local, st_local, xs, *args):
        r = jax.lax.axis_index("pp")
        recv = jnp.zeros_like(xs[0])
        outs = []
        fwd = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(M + pp - 1):
            mb_idx = jnp.clip(t - r, 0, M - 1)
            valid = jnp.logical_and(t - r >= 0, t - r < M)
            inj = xs[min(t, M - 1)]
            state_in = jnp.where(r == 0, inj, recv)
            out, st_new = stage_scan(layers_local, st_local, state_in,
                                     mb_idx, args)
            # bubble ticks must not touch this stage's caches
            st_local = jax.tree.map(
                lambda new, old: jnp.where(valid, new, old), st_new,
                st_local)
            outs.append(out)
            if t < M + pp - 2:
                recv = jax.lax.ppermute(out, "pp", fwd)
        stacked = jnp.stack([outs[m + pp - 1] for m in range(M)])
        y = jax.lax.psum(
            jnp.where(r == pp - 1, stacked, jnp.zeros_like(stacked)), "pp"
        )
        return y, st_local

    return run(stacked_layers, state, x_mb, *broadcast_args)


def pipeline_serving_forward(cfg, fq_cfg, sp, tokens, cache, pos, phase,
                             mesh: Mesh, n_microbatches: int = 2,
                             use_kernel: bool = False, max_len: int = 2048,
                             compute_dtype=jnp.bfloat16,
                             dp_axis: Optional[str] = None,
                             last_idx=None):
    """REAL-QUANT serving forward (packed int4 weights + int4 / bf16 /
    PAGED KV cache) with the layer loop pipelined over mesh axis "pp" —
    the reference's vLLM PP serving analog (llama_flatquant.py:400-460).

    sp: STACKED build_serving_params output; cache: init_cache pytree
    (slot "bf16"/"int4" modes, or "paged" with a "tbl" block table);
    tokens [B, S] with B % n_microbatches == 0; pos: scalar position
    (prefill 0 / decode current length) or a per-slot [B] int32 vector
    (continuous-batching decode — each microbatch gets its slots' rows);
    last_idx: optional per-slot [B] index of the last real token (padded
    prefill buckets). Returns (last-token logits [B, V], cache) —
    bit-identical to the sequential engine (_forward) on the same
    inputs: the schedule only reorders which device runs a layer, and
    bubble-tick cache writes are masked out.

    Paged composition (VERDICT r4 item 4): pool leaves keep their
    leading layer axis and shard P("pp") like the layers — each stage
    owns its layers' pool shard; the block table (no layer axis)
    broadcasts, and each microbatch's writes scatter through its own
    slots' table rows, so microbatches never collide in the shared pool.
    """
    from flatquant_tpu.models.llama import rms_norm, rope_tables
    from flatquant_tpu.serving.engine import (
        _last_hidden,
        serving_layer,
        serving_layer_int4cache,
    )

    B, S = tokens.shape
    M = n_microbatches
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"
    mb = B // M
    x = sp["embed"][tokens].astype(compute_dtype)
    cos, sin = rope_tables(cfg, jnp.arange(max_len))
    int4 = "kp" in cache
    tbl = cache.get("tbl")
    pos_vec = getattr(pos, "ndim", 0) == 1

    if int4:
        state = (cache["kp"], cache["kparam"], cache["vp"], cache["vparam"])
    else:
        state = (cache["k"], cache["v"])

    def _mb_pos(mb_idx):
        if pos_vec:
            return jax.lax.dynamic_slice_in_dim(pos, mb_idx * mb, mb, 0)
        return pos

    def layer_fn(sl, st, h, mb_idx, cos, sin):
        p = _mb_pos(mb_idx)
        if tbl is not None:
            # paged: the pool is shared across slots — no batch slicing;
            # writes route through this microbatch's table rows
            tbl_mb = jax.lax.dynamic_slice_in_dim(tbl, mb_idx * mb, mb, 0)
            kp, kparam, vp, vparam = st
            h, kp, kparam, vp, vparam = serving_layer_int4cache(
                cfg, fq_cfg, sl, h, cos, sin, kp, kparam, vp, vparam, p,
                phase, use_kernel, compute_dtype, tbl=tbl_mb)
            return h, (kp, kparam, vp, vparam)
        # st leaves carry the FULL batch for this layer; slice out this
        # microbatch's rows (batch axis 0 after the scan strips L)
        sliced = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, mb_idx * mb, mb, 0),
            st)
        if int4:
            kp, kparam, vp, vparam = sliced
            h, kp, kparam, vp, vparam = serving_layer_int4cache(
                cfg, fq_cfg, sl, h, cos, sin, kp, kparam, vp, vparam, p,
                phase, use_kernel, compute_dtype)
            new = (kp, kparam, vp, vparam)
        else:
            ck, cv = sliced
            h, ck, cv = serving_layer(cfg, fq_cfg, sl, h, cos, sin, ck, cv,
                                      p, phase, use_kernel, compute_dtype)
            new = (ck, cv)
        st_out = jax.tree.map(
            lambda full, part: jax.lax.dynamic_update_slice_in_dim(
                full, part, mb_idx * mb, 0), st, new)
        return h, st_out

    x_mb = x.reshape(M, mb, S, -1)
    y_mb, state = pipeline_apply_stateful(
        layer_fn, mesh, sp["layers"], state, x_mb, cos, sin,
        dp_axis=dp_axis)
    x = y_mb.reshape(B, S, -1)

    x = rms_norm(x, sp["final_norm_w"], cfg.rms_eps)
    logits = jnp.matmul(_last_hidden(x, last_idx),
                        sp["lm_head"].T.astype(x.dtype))
    if int4:
        out_cache = dict(zip(("kp", "kparam", "vp", "vparam"), state))
    else:
        out_cache = dict(zip(("k", "v"), state))
    if tbl is not None:
        out_cache["tbl"] = tbl
    return logits.astype(jnp.float32), out_cache


def pipeline_llama_forward(cfg, params, tokens, mesh: Mesh,
                           n_microbatches: int = 4, fq=None, fq_cfg=None,
                           mode: str = "fp", compute_dtype=jnp.bfloat16,
                           dp_axis: Optional[str] = None):
    """llama_forward with the layer loop pipelined over mesh axis "pp".

    tokens [B, S]; B % n_microbatches == 0 (and the microbatch size must
    divide over dp when dp_axis is given). Embedding/head run replicated
    outside the pipeline (GSPMD places them; they are <2% of FLOPs).
    Bit-identical to models.llama.llama_forward on the same inputs.
    """
    from flatquant_tpu.models.llama import (
        causal_mask,
        llama_layer,
        rms_norm,
        rope_tables,
    )

    B, S = tokens.shape
    M = n_microbatches
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"
    x = params["embed"][tokens].astype(compute_dtype)
    cos, sin = rope_tables(cfg, jnp.arange(S))
    mask = causal_mask(S)

    if fq is not None:
        stacked = (params["layers"], fq)

        def layer_fn(lp_lfq, h, cos, sin, mask):
            lp, lfq = lp_lfq
            return llama_layer(cfg, fq_cfg, mode, lp, lfq, h, cos, sin, mask)
    else:
        stacked = params["layers"]

        def layer_fn(lp, h, cos, sin, mask):
            return llama_layer(cfg, fq_cfg, "fp", lp, None, h, cos, sin, mask)

    x_mb = x.reshape(M, B // M, S, -1)
    y_mb = pipeline_apply(layer_fn, mesh, stacked, x_mb, cos, sin, mask,
                          dp_axis=dp_axis)
    x = y_mb.reshape(B, S, -1)

    x = rms_norm(x, params["final_norm_w"], cfg.rms_eps)
    head = params.get("lm_head", params["embed"])
    logits = jnp.matmul(x, head.T.astype(x.dtype))
    return logits.astype(jnp.float32)
