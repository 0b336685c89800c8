"""HF checkpoint loading: safetensors -> flatquant_tpu param pytree.

Maps HF Llama/Qwen2 weight names (model.layers.N.self_attn.q_proj.weight,
...) onto the stacked [L, out, in] layout. Works from a local directory
containing *.safetensors (+ optional index json); no network access is
attempted (zero-egress environments).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import numpy as np

import jax.numpy as jnp

from flatquant_tpu.models.config import LlamaConfig


_LAYER_MAP = {
    "input_layernorm.weight": ("ln1_w", None),
    "post_attention_layernorm.weight": ("ln2_w", None),
    "self_attn.q_proj.weight": ("wq", None),
    "self_attn.k_proj.weight": ("wk", None),
    "self_attn.v_proj.weight": ("wv", None),
    "self_attn.o_proj.weight": ("wo", None),
    "self_attn.q_proj.bias": ("bq", None),
    "self_attn.k_proj.bias": ("bk", None),
    "self_attn.v_proj.bias": ("bv", None),
    "mlp.gate_proj.weight": ("wgate", None),
    "mlp.up_proj.weight": ("wup", None),
    "mlp.down_proj.weight": ("wdown", None),
}


def _iter_safetensors(path: str):
    """Torch-free mmap reader (native/safetensors_io): real HF Llama/Qwen
    shards are BF16, which the safetensors numpy framework cannot
    represent — the native reader widens BF16/F16 to f32 via the threaded
    C++ converters."""
    from flatquant_tpu.native.safetensors_io import SafetensorsFile

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    for f in files:
        with SafetensorsFile(f) as sf:
            for name in sf.keys():
                yield name, sf.tensor_f32(name)


def params_from_named_tensors(items, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """(name, array) pairs with HF Llama/Qwen key names -> stacked params.

    Shared by the safetensors loader and the torch-state-dict converter
    (utils.reference_convert)."""
    L = cfg.num_layers
    staged: Dict[str, list] = {}
    top: Dict[str, np.ndarray] = {}

    def put_layer(key, idx, val):
        if key not in staged:
            staged[key] = [None] * L
        staged[key][idx] = val

    for name, tensor in items:
        if name == "model.embed_tokens.weight":
            top["embed"] = tensor
        elif name == "model.norm.weight":
            top["final_norm_w"] = tensor
        elif name == "lm_head.weight":
            top["lm_head"] = tensor
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_str, sub = rest.split(".", 1)
            if sub in _LAYER_MAP:
                key, _ = _LAYER_MAP[sub]
                put_layer(key, int(idx_str), tensor)

    layers = {}
    for key, vals in staged.items():
        missing = [i for i, v in enumerate(vals) if v is None]
        if missing:
            raise ValueError(f"missing {key} for layers {missing}")
        layers[key] = jnp.asarray(np.stack(vals), dtype)

    params = {
        "embed": jnp.asarray(top["embed"], dtype),
        "final_norm_w": jnp.asarray(top["final_norm_w"], dtype),
        "layers": layers,
    }
    if "lm_head" in top:
        params["lm_head"] = jnp.asarray(top["lm_head"], dtype)
    elif not cfg.tie_embeddings:
        raise ValueError("checkpoint has no lm_head but config is untied")
    return params


def load_hf_llama(path: str, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Load an HF Llama/Qwen2 checkpoint directory into stacked params."""
    return params_from_named_tensors(_iter_safetensors(path), cfg, dtype)


def config_from_hf_json(path: str, name: str = "custom") -> LlamaConfig:
    """Build a LlamaConfig from an HF config.json (local file)."""
    from flatquant_tpu.models.config import RopeScaling

    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    rs = None
    rc = c.get("rope_scaling")
    if rc and rc.get("rope_type", rc.get("type")) == "llama3":
        rs = RopeScaling(
            factor=rc["factor"],
            low_freq_factor=rc["low_freq_factor"],
            high_freq_factor=rc["high_freq_factor"],
            original_max_position_embeddings=rc["original_max_position_embeddings"],
        )
    num_heads = c["num_attention_heads"]
    return LlamaConfig(
        name=name,
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=c.get("num_key_value_heads", num_heads),
        head_dim=c.get("head_dim", c["hidden_size"] // num_heads),
        rope_theta=c.get("rope_theta", 10000.0),
        rms_eps=c.get("rms_norm_eps", 1e-5),
        attn_bias=c.get("attention_bias", c.get("model_type") == "qwen2"),
        tie_embeddings=c.get("tie_word_embeddings", False),
        rope_scaling=rs,
    )
