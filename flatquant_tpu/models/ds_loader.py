"""HF DeepSeek-V3/R1 checkpoint loading: FP8 block-scaled safetensors ->
flatquant_tpu DeepSeek param pytree.

The official HF distribution stores linear weights as float8_e4m3 with a
sibling `<name>.weight_scale_inv` [ceil(out/128), ceil(in/128)] fp32 tile
scale (deepseek_v3/kernel.py:55-105 dequantizes on the fly; here weights
dequantize once at load via fp8_block_dequant since they proceed to int4
anyway). Key mapping (HF name -> our stacked key):

  model.embed_tokens.weight                    embed
  model.norm.weight / lm_head.weight           final_norm / head
  model.layers.N.input_layernorm.weight        attn_norm
  ...post_attention_layernorm.weight           ffn_norm
  ...self_attn.q_a_proj / q_a_layernorm /      wq_a / q_norm / wq_b
     q_b_proj      (or q_proj when no q-LoRA -> wq)
  ...self_attn.kv_a_proj_with_mqa /            wkv_a / kv_norm / wkv_b /
     kv_a_layernorm / kv_b_proj / o_proj       wo
  ...mlp.gate_proj / up_proj / down_proj       w1 / w3 / w2   (dense)
  ...mlp.experts.E.{gate,up,down}_proj         e_w1/e_w3/e_w2 [E, ...]
  ...mlp.shared_experts.{gate,up,down}_proj    s_w1/s_w3/s_w2
  ...mlp.gate.weight / e_score_correction_bias gate_w / gate_b

Reading fp8 needs torch (numpy has no float8 dtype); torch is CPU-only
here and used purely as a dtype bridge.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.models.deepseek import DeepSeekConfig, fp8_block_dequant


_ATTN_MAP = {
    "input_layernorm.weight": "attn_norm",
    "post_attention_layernorm.weight": "ffn_norm",
    "self_attn.q_proj.weight": "wq",
    "self_attn.q_a_proj.weight": "wq_a",
    "self_attn.q_a_layernorm.weight": "q_norm",
    "self_attn.q_b_proj.weight": "wq_b",
    "self_attn.kv_a_proj_with_mqa.weight": "wkv_a",
    "self_attn.kv_a_layernorm.weight": "kv_norm",
    "self_attn.kv_b_proj.weight": "wkv_b",
    "self_attn.o_proj.weight": "wo",
}

_FFN_MAP = {
    "mlp.gate_proj.weight": "w1",
    "mlp.up_proj.weight": "w3",
    "mlp.down_proj.weight": "w2",
}

_SHARED_MAP = {
    "mlp.shared_experts.gate_proj.weight": "s_w1",
    "mlp.shared_experts.up_proj.weight": "s_w3",
    "mlp.shared_experts.down_proj.weight": "s_w2",
}

_EXPERT_MAP = {"gate_proj": "e_w1", "up_proj": "e_w3", "down_proj": "e_w2"}


def ds_config_from_hf_json(path: str, name: str = "deepseek-hf",
                           **overrides) -> DeepSeekConfig:
    """DeepSeekConfig from an HF config.json (DeepseekV3Config schema)."""
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    rs = c.get("rope_scaling") or {}
    kw = dict(
        name=name,
        vocab_size=c["vocab_size"],
        dim=c["hidden_size"],
        inter_dim=c["intermediate_size"],
        moe_inter_dim=c.get("moe_intermediate_size", c["intermediate_size"]),
        n_layers=c["num_hidden_layers"],
        n_dense_layers=c.get("first_k_dense_replace", 1),
        n_heads=c["num_attention_heads"],
        n_routed_experts=c.get("n_routed_experts", 64),
        n_shared_experts=c.get("n_shared_experts", 2),
        n_activated_experts=c.get("num_experts_per_tok", 6),
        n_expert_groups=c.get("n_group", 1),
        n_limited_groups=c.get("topk_group", 1),
        score_func=c.get("scoring_func", "softmax"),
        route_scale=c.get("routed_scaling_factor", 1.0),
        gate_bias=c.get("topk_method") == "noaux_tc",
        q_lora_rank=c.get("q_lora_rank") or 0,
        kv_lora_rank=c.get("kv_lora_rank", 512),
        qk_nope_head_dim=c.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=c.get("qk_rope_head_dim", 64),
        v_head_dim=c.get("v_head_dim", 128),
        rope_theta=c.get("rope_theta", 10000.0),
        rope_factor=rs.get("factor", 40.0),
        original_seq_len=rs.get("original_max_position_embeddings", 4096),
        beta_fast=int(rs.get("beta_fast", 32)),
        beta_slow=int(rs.get("beta_slow", 1)),
        mscale=rs.get("mscale", 1.0),
        max_seq_len=c.get("max_position_embeddings", 16384),
        rms_eps=c.get("rms_norm_eps", 1e-6),
    )
    kw.update(overrides)
    return DeepSeekConfig(**kw)


def _iter_hf_tensors(path: str, use_native: bool = True,
                     keep_fp8: bool = False):
    """Yield (name, numpy fp32/int array) from all shards, fusing
    `weight_scale_inv` into its fp8 weight via fp8_block_dequant.

    Default path: the torch-free mmap reader + threaded C++ converters
    (native/safetensors_io.py) — fp8 bytes dequantize straight off the
    mmap in one fused pass. Fallback: safetensors.safe_open + torch as a
    dtype bridge (the only numpy-visible route to float8).

    keep_fp8=True: fp8 tensors are NOT dequantized — they yield
    `(raw_u8 [N, K], scales [so, si])` tuples so build-time can keep the
    checkpoint's ORIGINAL codes for the native-FP8 serving path
    (kernels/fp8_matmul; reference deepseek_v3/kernel.py:108-191 keeps
    fp8 resident too)."""
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")

    if use_native:
        from flatquant_tpu.native.safetensors_io import SafetensorsFile

        # first pass: collect scale tensors so fp8 weights pair with them
        scales: Dict[str, np.ndarray] = {}
        for f in files:
            with SafetensorsFile(f) as sf:
                for nm in sf.keys():
                    if nm.endswith(".weight_scale_inv"):
                        scales[nm] = sf.tensor_f32(nm)
        for f in files:
            with SafetensorsFile(f) as sf:
                for nm in sf.keys():
                    if nm.endswith(".weight_scale_inv"):
                        continue
                    snm = nm + "_scale_inv"
                    if snm in scales:
                        if keep_fp8:
                            raw, tag = sf.raw(nm)
                            assert tag == "F8_E4M3", (nm, tag)
                            arr = raw.copy()
                            del raw  # view into the mmap; must die pre-close
                            yield nm, (arr, scales[snm])
                        else:
                            yield nm, sf.fp8_tensor_dequant(nm, scales[snm])
                    else:
                        yield nm, sf.tensor_f32(nm)
        return

    import torch
    from safetensors import safe_open

    scales = {}
    for f in files:
        with safe_open(f, framework="pt") as sf:
            for nm in sf.keys():
                if nm.endswith(".weight_scale_inv"):
                    scales[nm] = sf.get_tensor(nm).float().numpy()
    for f in files:
        with safe_open(f, framework="pt") as sf:
            for nm in sf.keys():
                if nm.endswith(".weight_scale_inv"):
                    continue
                t = sf.get_tensor(nm)
                snm = nm + "_scale_inv"
                if snm in scales:
                    if keep_fp8:
                        yield nm, (t.view(torch.uint8).numpy().copy(),
                                   scales[snm])
                        continue
                    w = np.asarray(
                        fp8_block_dequant(
                            jnp.asarray(t.float().numpy()),
                            jnp.asarray(scales[snm]),
                        )
                    )
                else:
                    w = t.float().numpy()
                yield nm, w


def load_hf_deepseek(path: str, cfg: DeepSeekConfig, dtype=jnp.float32,
                     keep_fp8: bool = False) -> dict:
    """Load an HF DeepSeek checkpoint directory into our stacked pytree.

    Builds the full model in host memory (use for fixtures / distilled
    sizes; 671B-scale loads should stream shard-by-shard under a device
    mesh — the sharded load path composes this per layer).

    keep_fp8=True: every fp8-stored linear becomes a native-FP8 serving
    dict {"w8" float8_e4m3fn, "se" [K/128, N] f32} holding the
    checkpoint's ORIGINAL codes (serve with fp8_matmul(exact=True) for
    bit-faithful dequant semantics, since HF codes may include
    subnormals). wkv_b is the exception: the absorbed-MLA einsums
    consume it dense, so it dequantizes to `dtype` as in the int4 build
    (deepseekv3_utils.py:171 analog)."""
    nd = cfg.n_dense_layers
    dense: Dict[str, list] = {}
    moe: Dict[str, list] = {}
    top: Dict[str, np.ndarray] = {}

    def put(store, n_total, key, idx, val):
        if key not in store:
            store[key] = [None] * n_total
        store[key][idx] = val

    def _deq_tuple(name, w):
        """Dequantize a keep_fp8 (raw_u8, scales) pair to dense float."""
        raw, sc = w
        assert ((raw & 0x7F) != 0x7F).all(), f"NaN fp8 codes in {name}"
        return np.asarray(fp8_block_dequant(
            jax.lax.bitcast_convert_type(jnp.asarray(raw),
                                         jnp.float8_e4m3fn),
            jnp.asarray(sc)))

    for name, w in _iter_hf_tensors(path, keep_fp8=keep_fp8):
        if keep_fp8 and isinstance(w, tuple) and (
                name.endswith("kv_b_proj.weight")
                or not name.startswith("model.layers.")):
            # kv_b_proj: consumed dense by the absorbed-MLA einsums.
            # Non-layer tensors (embed / lm_head / final norm — some
            # checkpoints store these fp8 too): _linear never serves
            # them, so a (raw, scales) tuple would otherwise reach
            # jnp.asarray and die obscurely (ADVICE r4) — dequantize.
            w = _deq_tuple(name, w)
        if name == "model.embed_tokens.weight":
            top["embed"] = w
        elif name == "model.norm.weight":
            top["final_norm"] = w
        elif name == "lm_head.weight":
            top["head"] = w
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, sub = rest.split(".", 1)
            li = int(idx_s)
            if li >= cfg.n_layers:
                # official V3/R1 shards carry the multi-token-prediction
                # block at model.layers.<n_layers>; it is not part of the
                # decoder stack (the reference drops it too)
                continue
            is_dense = li < nd
            store = dense if is_dense else moe
            n_total = nd if is_dense else cfg.n_moe_layers
            si = li if is_dense else li - nd
            if sub in _ATTN_MAP:
                put(store, n_total, _ATTN_MAP[sub], si, w)
            elif is_dense and sub in _FFN_MAP:
                put(store, n_total, _FFN_MAP[sub], si, w)
            elif sub in _SHARED_MAP:
                put(store, n_total, _SHARED_MAP[sub], si, w)
            elif sub == "mlp.gate.weight":
                put(store, n_total, "gate_w", si, w)
            elif sub == "mlp.gate.e_score_correction_bias":
                put(store, n_total, "gate_b", si, w)
            elif sub.startswith("mlp.experts."):
                e_s, proj = sub[len("mlp.experts."):].split(".", 1)
                proj = proj.removesuffix(".weight")
                key = _EXPERT_MAP[proj]
                if key not in store:
                    store[key] = [None] * n_total
                if store[key][si] is None:
                    store[key][si] = [None] * cfg.n_routed_experts
                store[key][si][int(e_s)] = w

    def fp8_dict(raws, scs):
        """Stacked raw u8 codes + checkpoint scales -> serving dict."""
        from flatquant_tpu.kernels.fp8_matmul import expand_fp8_scales

        raw = np.stack(raws)
        assert ((raw & 0x7F) != 0x7F).all(), "NaN fp8 codes in checkpoint"
        n, k = raw.shape[-2:]
        w8 = jax.lax.bitcast_convert_type(jnp.asarray(raw), jnp.float8_e4m3fn)
        se = np.stack([np.asarray(expand_fp8_scales(jnp.asarray(s), n, k))
                       for s in scs])
        return {"w8": w8, "se": jnp.asarray(se)}

    def finalize(store, n_total, label):
        out = {}
        for key, vals in store.items():
            missing = [i for i, v in enumerate(vals) if v is None]
            if missing:
                raise ValueError(f"missing {label} {key} for layers {missing}")
            if isinstance(vals[0], tuple):  # keep_fp8 linears
                out[key] = fp8_dict([v[0] for v in vals], [v[1] for v in vals])
            elif key.startswith("e_w"):
                if isinstance(vals[0][0], tuple):  # [layer][expert] fp8
                    d = [fp8_dict([t[0] for t in layer], [t[1] for t in layer])
                         for layer in vals]
                    out[key] = {"w8": jnp.stack([x["w8"] for x in d]),
                                "se": jnp.stack([x["se"] for x in d])}
                else:
                    out[key] = jnp.asarray(
                        np.stack([np.stack(v) for v in vals]), dtype)
            else:
                out[key] = jnp.asarray(np.stack(vals), dtype)
        return out

    params = {
        "embed": jnp.asarray(top["embed"], dtype),
        "final_norm": jnp.asarray(top["final_norm"], dtype),
        "head": jnp.asarray(top.get("head", top["embed"]), dtype),
        "dense_layers": finalize(dense, nd, "dense"),
        "moe_layers": finalize(moe, cfg.n_moe_layers, "moe"),
    }
    return params


def write_hf_deepseek_fixture(path: str, cfg: DeepSeekConfig, seed: int = 0,
                              fp8: bool = True) -> None:
    """Write a tiny random checkpoint in the official HF layout (fp8
    block-scaled weights + weight_scale_inv) — the loader-format proof for
    tests and offline environments."""
    import torch

    from safetensors.torch import save_file

    os.makedirs(path, exist_ok=True)
    gen = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, out_d, in_d):
        w = torch.randn(out_d, in_d, generator=gen) * 0.02
        if fp8:
            block = 128
            so, si = -(-out_d // block), -(-in_d // block)
            scale = torch.rand(so, si, generator=gen) * 0.5 + 0.75
            sr = scale.repeat_interleave(block, 0)[:out_d]
            sc = sr.repeat_interleave(block, 1)[:, :in_d]
            w8 = (w / sc).to(torch.float8_e4m3fn)
            sd[name + ".weight"] = w8
            sd[name + ".weight_scale_inv"] = scale
        else:
            sd[name + ".weight"] = w

    def norm(name, d):
        sd[name + ".weight"] = torch.ones(d)

    sd["model.embed_tokens.weight"] = torch.randn(cfg.vocab_size, cfg.dim, generator=gen) * 0.02
    norm("model.norm", cfg.dim)
    sd["lm_head.weight"] = torch.randn(cfg.vocab_size, cfg.dim, generator=gen) * 0.02
    for li in range(cfg.n_layers):
        p = f"model.layers.{li}"
        norm(f"{p}.input_layernorm", cfg.dim)
        norm(f"{p}.post_attention_layernorm", cfg.dim)
        if cfg.q_lora_rank > 0:
            lin(f"{p}.self_attn.q_a_proj", cfg.q_lora_rank, cfg.dim)
            norm(f"{p}.self_attn.q_a_layernorm", cfg.q_lora_rank)
            lin(f"{p}.self_attn.q_b_proj", cfg.n_heads * cfg.qk_head_dim, cfg.q_lora_rank)
        else:
            lin(f"{p}.self_attn.q_proj", cfg.n_heads * cfg.qk_head_dim, cfg.dim)
        lin(f"{p}.self_attn.kv_a_proj_with_mqa",
            cfg.kv_lora_rank + cfg.qk_rope_head_dim, cfg.dim)
        norm(f"{p}.self_attn.kv_a_layernorm", cfg.kv_lora_rank)
        lin(f"{p}.self_attn.kv_b_proj",
            cfg.n_heads * (cfg.qk_nope_head_dim + cfg.v_head_dim), cfg.kv_lora_rank)
        lin(f"{p}.self_attn.o_proj", cfg.dim, cfg.n_heads * cfg.v_head_dim)
        if li < cfg.n_dense_layers:
            lin(f"{p}.mlp.gate_proj", cfg.inter_dim, cfg.dim)
            lin(f"{p}.mlp.up_proj", cfg.inter_dim, cfg.dim)
            lin(f"{p}.mlp.down_proj", cfg.dim, cfg.inter_dim)
        else:
            sd[f"{p}.mlp.gate.weight"] = torch.randn(
                cfg.n_routed_experts, cfg.dim, generator=gen) * 0.02
            if cfg.gate_bias:
                sd[f"{p}.mlp.gate.e_score_correction_bias"] = torch.zeros(
                    cfg.n_routed_experts)
            for e in range(cfg.n_routed_experts):
                lin(f"{p}.mlp.experts.{e}.gate_proj", cfg.moe_inter_dim, cfg.dim)
                lin(f"{p}.mlp.experts.{e}.up_proj", cfg.moe_inter_dim, cfg.dim)
                lin(f"{p}.mlp.experts.{e}.down_proj", cfg.dim, cfg.moe_inter_dim)
            si = cfg.n_shared_experts * cfg.moe_inter_dim
            lin(f"{p}.mlp.shared_experts.gate_proj", si, cfg.dim)
            lin(f"{p}.mlp.shared_experts.up_proj", si, cfg.dim)
            lin(f"{p}.mlp.shared_experts.down_proj", cfg.dim, si)

    save_file(sd, os.path.join(path, "model-00001-of-00001.safetensors"))
    hf_cfg = {
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.dim,
        "intermediate_size": cfg.inter_dim,
        "moe_intermediate_size": cfg.moe_inter_dim,
        "num_hidden_layers": cfg.n_layers,
        "first_k_dense_replace": cfg.n_dense_layers,
        "num_attention_heads": cfg.n_heads,
        "n_routed_experts": cfg.n_routed_experts,
        "n_shared_experts": cfg.n_shared_experts,
        "num_experts_per_tok": cfg.n_activated_experts,
        "n_group": cfg.n_expert_groups, "topk_group": cfg.n_limited_groups,
        "scoring_func": cfg.score_func,
        "routed_scaling_factor": cfg.route_scale,
        "topk_method": "noaux_tc" if cfg.gate_bias else "greedy",
        "q_lora_rank": cfg.q_lora_rank or None,
        "kv_lora_rank": cfg.kv_lora_rank,
        "qk_nope_head_dim": cfg.qk_nope_head_dim,
        "qk_rope_head_dim": cfg.qk_rope_head_dim,
        "v_head_dim": cfg.v_head_dim,
        "rope_theta": cfg.rope_theta,
        "rope_scaling": {
            "factor": cfg.rope_factor,
            "original_max_position_embeddings": cfg.original_seq_len,
            "beta_fast": cfg.beta_fast, "beta_slow": cfg.beta_slow,
            "mscale": cfg.mscale, "type": "yarn",
        },
        "max_position_embeddings": cfg.max_seq_len,
        "rms_norm_eps": cfg.rms_eps,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
