"""MoE routed-expert dispatch: dense-masked einsum vs capacity gather.

Round-1 shipped two exact-math-compatible routed-expert execution
strategies (models/deepseek.py): "dense" computes every expert on every
token and masks (O(E) FLOPs, no token drops — the calibration/exactness
reference), "gather" scatters tokens into [E, C, D] capacity buffers and
computes only routed slots (O(K) FLOPs + sort/scatter/gather overhead,
capacity drops). This benchmark device-traces both at a mid-size MoE
config (DeepSeek-V2-Lite shapes: dim 2048, moe_inter 1408, E=64, K=6)
so serving can adopt the measured winner per regime.

Reference analog: deepseek_v3/model.py routed-expert loop (per-expert
index_select) — a host-side gather the TPU design replaces with static
capacity buffers.

Usage: python benchmarks/moe_benchmark.py [--dim 2048 ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.models.deepseek import (
    DeepSeekConfig,
    _ffn_moe,
    _ffn_moe_gathered,
)
from flatquant_tpu.utils.benchmark import device_compare


def make_moe_params(cfg: DeepSeekConfig, seed: int = 0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(
            rng.standard_normal(shape) * (shape[-1] ** -0.5), dtype
        )

    lp = {
        "gate_w": w(cfg.n_routed_experts, cfg.dim),
        "e_w1": w(cfg.n_routed_experts, cfg.moe_inter_dim, cfg.dim),
        "e_w2": w(cfg.n_routed_experts, cfg.dim, cfg.moe_inter_dim),
        "e_w3": w(cfg.n_routed_experts, cfg.moe_inter_dim, cfg.dim),
        "s_w1": w(cfg.n_shared_experts * cfg.moe_inter_dim, cfg.dim),
        "s_w2": w(cfg.dim, cfg.n_shared_experts * cfg.moe_inter_dim),
        "s_w3": w(cfg.n_shared_experts * cfg.moe_inter_dim, cfg.dim),
    }
    if cfg.gate_bias:
        lp["gate_b"] = jnp.zeros((cfg.n_routed_experts,), dtype)
    return lp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--moe_inter_dim", type=int, default=1408)
    p.add_argument("--n_experts", type=int, default=64)
    p.add_argument("--n_activated", type=int, default=6)
    p.add_argument("--capacity_factor", type=float, default=2.0)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    cfg = DeepSeekConfig(
        dim=args.dim,
        moe_inter_dim=args.moe_inter_dim,
        n_routed_experts=args.n_experts,
        n_activated_experts=args.n_activated,
        n_shared_experts=2,
        score_func="softmax",
        moe_capacity_factor=args.capacity_factor,
    )
    lp = make_moe_params(cfg)

    def dense(lp, x):
        return _ffn_moe(cfg, None, "fp", lp, None, x)

    def gather(lp, x):
        return _ffn_moe_gathered(cfg, None, "fp", lp, None, x,
                                 capacity_factor=args.capacity_factor)

    rng = np.random.default_rng(1)
    results = {}
    for label, (b, s) in (
        ("decode_b8", (8, 1)),
        ("decode_b32", (32, 1)),
        ("prefill_s2048", (1, 2048)),
    ):
        x = jnp.asarray(rng.standard_normal((b, s, cfg.dim)), jnp.bfloat16)
        res = device_compare(
            {"dense": (dense, (lp, x)), "gather": (gather, (lp, x))},
            iters=args.iters,
            trace_dir="/tmp/fq_moe_trace",
        )
        results[label] = {
            k: round(v * 1e6, 1) for k, v in res.items()
        } | {"gather_speedup": round(res["dense"] / res["gather"], 3)}
        print(label, results[label])

    print(json.dumps({"moe_dispatch": results}))


if __name__ == "__main__":
    main()
