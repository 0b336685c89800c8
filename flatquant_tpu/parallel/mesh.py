"""Device mesh + sharding specs.

TPU-native replacement for the reference's explicit NCCL plumbing
(deepseek_v3/model.py:87-264 Column/RowParallelLinear + all_reduce,
vllm TP groups): one `jax.sharding.Mesh` with named axes and
PartitionSpec trees; GSPMD inserts the collectives (psum for row-parallel
contractions, all-gather for vocab-parallel logits) and overlaps them with
compute via the latency-hiding scheduler.

Axes:
  dp — data parallel (calibration batch; replicated weights)
  tp — tensor parallel (attention heads / mlp intermediate; megatron-style
       col->row pairing so each decoder layer needs exactly two psums)

Specs mirror the reference TP plan (SURVEY 2.3): q/k/v/up/gate out-sharded
(column-parallel, no comm), o/down in-sharded (row-parallel, psum),
lm_head vocab-sharded with gathered logits.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flatquant_tpu.models.config import LlamaConfig


def make_mesh(axes: Dict[str, int], devices=None) -> Mesh:
    """Mesh from {axis: size}; sizes must multiply to the device count."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axes)
    sizes = tuple(axes.values())
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh {axes} needs {int(np.prod(sizes))} devices, have {len(devices)}"
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def llama_param_specs(cfg: LlamaConfig, params: dict,
                      shard_vocab: bool = False, tp_size: int = None) -> dict:
    """PartitionSpec tree for the fp model params (stacked [L, ...]).

    shard_vocab=True also vocab-shards the embedding table (the reference's
    ParallelEmbedding, deepseek_v3/model.py:87-126 — GSPMD turns the gather
    into the masked-lookup + psum the reference hand-codes).

    tp_size (when known) enforces HEAD-GRANULAR tensor parallelism: wk/wv
    are tp-sharded only if tp divides num_kv_heads, else replicated (the
    Megatron rule). Cutting a shard boundary *inside* a head makes the
    [B, S, n, hd] reshape propagate a mixed head/hd sharding whose backward
    forces SPMD involuntary full rematerialization (seen in the round-1
    multichip dryrun at tiny-llama nkv=2, tp=4)."""
    kv_ok = tp_size is None or cfg.num_kv_heads % tp_size == 0
    q_ok = tp_size is None or cfg.num_heads % tp_size == 0
    layer_specs = {
        "ln1_w": P(None, None),
        "ln2_w": P(None, None),
        # column-parallel: shard out_features (dim 1 of [L, out, in])
        "wq": P(None, "tp", None) if q_ok else P(None, None, None),
        "wk": P(None, "tp", None) if kv_ok else P(None, None, None),
        "wv": P(None, "tp", None) if kv_ok else P(None, None, None),
        "wup": P(None, "tp", None),
        "wgate": P(None, "tp", None),
        # row-parallel: shard in_features (dim 2)
        "wo": P(None, None, "tp") if q_ok else P(None, None, None),
        "wdown": P(None, None, "tp"),
    }
    for bkey, ok in (("bq", q_ok), ("bk", kv_ok), ("bv", kv_ok)):
        if bkey in params["layers"]:
            layer_specs[bkey] = P(None, "tp") if ok else P(None, None)
    specs = {
        "embed": P("tp", None) if shard_vocab else P(None, None),
        "final_norm_w": P(None),
        "layers": layer_specs,
    }
    if "lm_head" in params:
        specs["lm_head"] = P("tp", None)  # vocab-parallel head
    return specs


def replicated_specs(tree) -> object:
    return jax.tree.map(lambda _: P(), tree)


def shard_tree(tree, specs, mesh: Mesh):
    """device_put a pytree according to a PartitionSpec tree."""
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), tree, specs
    )


def batch_spec() -> P:
    return P("dp")


def deepseek_param_specs(cfg, params: dict) -> dict:
    """PartitionSpec tree for DeepSeek params: MLA heads tensor-parallel
    (n_local_heads = n_heads/tp, deepseek_v3/model.py:413), dense FFN
    megatron-style, routed experts sharded over the "ep" axis (experts
    [start, end) per rank, model.py:655-690 — here: expert-axis sharding +
    GSPMD psum over the contraction)."""

    def attn_specs(lp):
        d = {
            "attn_norm": P(None, None),
            "ffn_norm": P(None, None),
            "wkv_a": P(None, None, None),
            "kv_norm": P(None, None),
            "wkv_b": P(None, "tp", None),
            "wo": P(None, None, "tp"),
        }
        if "wq_a" in lp:
            d.update(wq_a=P(None, None, None), q_norm=P(None, None),
                     wq_b=P(None, "tp", None))
        else:
            d["wq"] = P(None, "tp", None)
        return d

    dense = attn_specs(params["dense_layers"])
    dense.update(w1=P(None, "tp", None), w2=P(None, None, "tp"),
                 w3=P(None, "tp", None))
    moe = attn_specs(params["moe_layers"])
    moe.update(
        gate_w=P(None, None, None),
        e_w1=P(None, "ep", None, None),
        e_w2=P(None, "ep", None, None),
        e_w3=P(None, "ep", None, None),
        s_w1=P(None, "tp", None),
        s_w2=P(None, None, "tp"),
        s_w3=P(None, "tp", None),
    )
    if "gate_b" in params["moe_layers"]:
        moe["gate_b"] = P(None, None)
    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "head": P("tp", None),
        "dense_layers": dense,
        "moe_layers": moe,
    }


def deepseek_serving_specs(sp: dict) -> dict:
    """PartitionSpec tree for the PACKED int4 DS serving params
    (models/deepseek.py:build_ds_serving_params): routed-expert packed
    weights and scales shard over the "ep" axis (the int4 analog of
    model.py:655-690's per-rank expert ownership); everything else
    replicated — the MoE weights dominate DS parameter bytes, so ep is
    the axis packed serving needs first."""
    import jax

    specs = jax.tree.map(lambda a: P(*((None,) * getattr(a, "ndim", 0))), sp)
    for key in ("e_w1", "e_w2", "e_w3"):
        specs["moe_layers"][key]["wp"] = P(None, "ep", None, None)
        specs["moe_layers"][key]["scale"] = P(None, "ep", None)
    return specs
