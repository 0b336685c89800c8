"""Checkpoint / artifact persistence.

Reference artifact formats (SURVEY §5 checkpoint/resume):
  1. flat_parameters  — raw trainable calibration state (resume format,
     flat_utils.py:52-62) -> here: the full FQ state pytree, msgpack.
  2. flat_matrices    — baked transforms + clips (released-model format,
     flat_utils.py:65-93) -> here: the baked FQ state pytree, msgpack.
  3. packed int4 safetensors + quantization_config metadata
     (flat_utils.py:97-204) -> here: the serving params, safetensors with
     a JSON manifest of the pytree structure.

msgpack (flax.serialization) carries our own pytrees byte-exactly; the
safetensors export is the interchange format for serving weights.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_pytree(path: str, tree) -> None:
    """msgpack-serialize any pytree of arrays (structure from template at load)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))
    with open(path, "wb") as f:
        f.write(data)


def load_pytree(path: str, template):
    """Load into the structure of `template` (same pytree shape)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


# --- named aliases for the three artifact kinds -----------------------------


def save_flat_parameters(exp_dir: str, fq_state) -> str:
    path = os.path.join(exp_dir, "flat_parameters.msgpack")
    save_pytree(path, fq_state)
    return path


def load_flat_parameters(exp_dir: str, template):
    return load_pytree(os.path.join(exp_dir, "flat_parameters.msgpack"), template)


def save_flat_matrices(exp_dir: str, baked_fq) -> str:
    path = os.path.join(exp_dir, "flat_matrices.msgpack")
    save_pytree(path, baked_fq)
    return path


def load_flat_matrices(exp_dir: str, template):
    return load_pytree(os.path.join(exp_dir, "flat_matrices.msgpack"), template)


# --- packed int4 safetensors export ----------------------------------------


def _flatten_with_keys(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def save_packed_safetensors(
    exp_dir: str,
    serving_params: dict,
    quantization_config: Optional[dict] = None,
    filename: str = "model_packed_int4.safetensors",
) -> str:
    """Export serving params (packed int4 + scales + transforms) to one
    safetensors file with quantization_config metadata
    (save_quantized_weights_with_safetensors analog)."""
    from safetensors.numpy import save_file

    os.makedirs(exp_dir, exist_ok=True)
    tensors = _flatten_with_keys(serving_params)
    # bf16 unsupported by safetensors-numpy: store as uint16 view + manifest
    manifest = {}
    out = {}
    for k, v in tensors.items():
        if str(v.dtype) == "bfloat16":
            out[k] = v.view(np.uint16)
            manifest[k] = "bfloat16"
        else:
            out[k] = v
            manifest[k] = str(v.dtype)
    meta = {
        "format": "flatquant_tpu_packed_int4",
        "dtypes": json.dumps(manifest),
        "quantization_config": json.dumps(quantization_config or {}),
    }
    path = os.path.join(exp_dir, filename)
    save_file(out, path, metadata=meta)
    return path


def load_packed_safetensors(path: str, template: dict) -> dict:
    """Load a packed export back into the structure of `template`."""
    from safetensors.numpy import load_file, safe_open

    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
    manifest = json.loads(meta.get("dtypes", "{}"))
    raw = load_file(path)
    for k, dt in manifest.items():
        if dt == "bfloat16":
            raw[k] = raw[k].view(jnp.bfloat16)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_keys, leaf in flat:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path_keys
        )
        if key not in raw:
            raise KeyError(f"checkpoint missing tensor {key!r}")
        leaves.append(jnp.asarray(raw[key]))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
