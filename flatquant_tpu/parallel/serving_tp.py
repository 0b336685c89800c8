"""Tensor-parallel real-quant serving: the packed int4 engine under shard_map.

The reference serves its real-quant models TP-sharded through vLLM with
hand-placed collectives and per-rank transform remapping
(vllm_custom/model_executor/fake_quantized_models/llama_flatquant.py:557-562,
deepseek_v3/model.py:234-264 row-parallel all_reduce). The TPU-native
equivalent here is `shard_map` over a named "tp" mesh axis:

  - every device runs the UNMODIFIED serving engine on a local model slice
    (local config = heads / kv-heads / intermediate divided by tp), so the
    Pallas kernels (int8-MXU GEMMs, int4 flash-decode over the v4 cache)
    run per-shard natively — no GSPMD-visible custom-call partitioning
    needed;
  - build_serving_params(tp=tp) lays the packed weights out per-rank:
    merged projections interleave [q_s;k_s;v_s] / [up_s;gate_s] row blocks
    and row-parallel o/down weights planar-pack per input-channel block, so
    a plain PartitionSpec on the out (resp. packed-in) dim hands each
    device a self-contained local model;
  - collectives are explicit and minimal: one psum after o, one after down
    (megatron pairing), a [T, 1] pmax/pmin pair so the row-parallel
    activation-quant scales see GLOBAL per-token extrema (bit-parity with
    single-device serving — the reference's per-rank quantizers instead
    drift), and the vocab-parallel lm_head resolved by the out_spec.

The KV cache shards over kv heads ("tp") and optionally batch ("dp");
weights are replicated over "dp".
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.serving.engine import _forward, init_cache

_COL = {"q", "k", "v", "up", "gate", "qkv", "upgate"}
_ROW = {"o", "down"}
_BIAS = {"bqkv", "bq", "bk", "bv"}


def tp_local_config(cfg: LlamaConfig, tp: int) -> LlamaConfig:
    """The per-shard view of the model: heads and intermediate divided by
    tp (head-granular rule — tp must divide num_kv_heads), hidden/vocab
    untouched. The serving engine runs unchanged on this config inside
    shard_map."""
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        cfg.num_heads, cfg.num_kv_heads, tp)
    assert cfg.intermediate_size % tp == 0
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )


def serving_param_specs(sp: dict, tp_axis: str = "tp"):
    """PartitionSpec tree for build_serving_params(tp=tp) output.

    Column-parallel linears shard out_features; row-parallel o/down shard
    the packed input dim (valid per-block planar packings by construction);
    transforms / norms / clip factors replicate (down/o transforms are
    already shard-aligned block-diagonal from init_model_fq(tp=));
    lm_head is vocab-parallel."""

    def rule(path, leaf):
        keys = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
        nd = getattr(leaf, "ndim", 0)
        rep = P(*([None] * nd))
        if keys[0] == "lm_head":
            return P(tp_axis, None)
        if keys[0] != "layers":
            return rep
        name = keys[1]
        sub = keys[2] if len(keys) > 2 else None
        if name in _COL:
            if sub in ("wp", "w8"):
                return P(None, tp_axis, None)
            if sub == "scale":
                return P(None, tp_axis)
            return rep  # a_clip scalars
        if name in _ROW:
            if sub in ("wp", "w8"):
                return P(None, None, tp_axis)
            return rep  # scale (full out dim) + a_clip
        if name in _BIAS:
            return P(None, tp_axis)
        return rep  # norms, transform factors, cache clips

    return jax.tree_util.tree_map_with_path(rule, sp)


def serving_cache_specs(cache: dict, tp_axis: str = "tp",
                        dp_axis: Optional[str] = None):
    """KV cache specs: kv heads over tp, batch over dp (if given).
    int4 v4 layout [L, B, nkv, hd/2|2, S]; bf16 layout [L, B, S, nkv, hd].
    Paged pools [L, nb, nkv, hd/2|2, bs] shard kv heads over tp like the
    slot cache, but the block axis stays UNSHARDED (the pool is shared by
    all slots — a dp cut would split one slot's blocks across replicas);
    the block table replicates (host-managed indices, identical on every
    device)."""
    paged = "tbl" in cache
    out = {}
    for k in cache:
        if k == "tbl":
            out[k] = P(None, None)
        elif k in ("kp", "vp", "kparam", "vparam"):
            out[k] = P(None, None if paged else dp_axis, tp_axis, None, None)
        else:
            out[k] = P(None, dp_axis, None, tp_axis, None)
    return out


def shard_serving_params(sp: dict, mesh: Mesh, tp_axis: str = "tp"):
    """device_put the packed serving params onto the mesh; returns
    (sharded_params, spec_tree)."""
    specs = serving_param_specs(sp, tp_axis)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), sp, specs)
    return sharded, specs


def make_sharded_cache(cfg: LlamaConfig, batch: int, max_len: int, mesh: Mesh,
                       mode: str = "bf16", dtype=jnp.bfloat16,
                       tp_axis: str = "tp", dp_axis: Optional[str] = None,
                       n_blocks: int = 0, block_size: int = 256):
    """Sharded KV cache buffers; returns (cache, spec_tree). mode="paged"
    shards the block pool's kv heads over tp (block table replicated)."""
    cache = init_cache(cfg, batch, max_len, dtype=dtype, mode=mode,
                       n_blocks=n_blocks, block_size=block_size)
    specs = serving_cache_specs(cache, tp_axis, dp_axis)
    cache = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
             for k, v in cache.items()}
    return cache, specs


def tp_serving_programs(
    cfg: LlamaConfig,
    fq_cfg: FQConfig,
    mesh: Mesh,
    sp_specs,
    cache_specs,
    use_kernel: bool = False,
    max_len: int = 2048,
    compute_dtype=jnp.bfloat16,
    tp_axis: str = "tp",
    dp_axis: Optional[str] = None,
):
    """(prefill, decode_step, chunk) jitted shard_map programs.

    prefill(sp, tokens, cache, last_idx) -> (logits [B, V], cache)
    decode_step(sp, tok [B,1], cache, pos [B]) -> (logits, cache)
    chunk(sp, tokens, cache, pos_scalar, last_idx) -> (logits, cache)

    tokens/pos shard over dp_axis (if set); logits come back [B, V] with
    batch over dp and vocab over tp (vocab-parallel head)."""
    tp = mesh.shape[tp_axis]
    lcfg = tp_local_config(cfg, tp)
    tok_spec = P(dp_axis, None)
    vec_spec = P(dp_axis)
    logit_spec = P(dp_axis, tp_axis)

    def _body(phase):
        def f(sp, tokens, cache, pos, last_idx):
            return _forward(lcfg, fq_cfg, sp, tokens, cache, pos, phase,
                            use_kernel, max_len, compute_dtype,
                            last_idx=last_idx, tp_axis=tp_axis)
        return f

    def _wrap(phase, with_pos: bool):
        body = _body(phase)

        def g(sp, tokens, cache, pos, last_idx):
            return body(sp, tokens, cache, pos, last_idx)

        sm = jax.shard_map(
            g, mesh=mesh,
            in_specs=(sp_specs, tok_spec, cache_specs, vec_spec if with_pos
                      else P(), vec_spec),
            out_specs=(logit_spec, cache_specs),
            check_vma=False,
        )
        return jax.jit(sm)

    prefill_sm = _wrap("prefill", with_pos=False)
    decode_sm = _wrap("decode", with_pos=True)
    chunk_sm = _wrap("chunk", with_pos=False)

    def prefill(sp, tokens, cache, last_idx=None):
        B = tokens.shape[0]
        if last_idx is None:
            last_idx = jnp.full((B,), tokens.shape[1] - 1, jnp.int32)
        return prefill_sm(sp, tokens, cache, jnp.int32(0), last_idx)

    def decode_step(sp, tok, cache, pos):
        B = tok.shape[0]
        pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
        return decode_sm(sp, tok, cache, pos,
                         jnp.zeros((B,), jnp.int32))

    def chunk(sp, tokens, cache, pos, last_idx=None):
        B = tokens.shape[0]
        if last_idx is None:
            last_idx = jnp.full((B,), tokens.shape[1] - 1, jnp.int32)
        return chunk_sm(sp, tokens, cache, jnp.int32(pos), last_idx)

    return prefill, decode_step, chunk
