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


def save_packed_safetensors_sharded(
    exp_dir: str,
    serving_params: dict,
    quantization_config: Optional[dict] = None,
    max_shard_bytes: int = 5 * 1024**3,
    basename: str = "model_packed_int4",
) -> str:
    """Sharded packed export: `<basename>-00001-of-0000N.safetensors`
    files plus a `<basename>.safetensors.index.json` weight map — the HF
    shard convention the reference's exporter uses for its released
    real-quant checkpoints (flat_utils.py:97-204, 5 GB shards + index).
    Single-shard models fall back to save_packed_safetensors's one-file
    layout. Returns the index (or single-file) path."""
    from safetensors.numpy import save_file

    os.makedirs(exp_dir, exist_ok=True)
    tensors = _flatten_with_keys(serving_params)
    total = sum(v.nbytes for v in tensors.values())
    if total <= max_shard_bytes:
        return save_packed_safetensors(
            exp_dir, serving_params, quantization_config,
            filename=f"{basename}.safetensors")

    # greedy fill in key order (stacked layer tensors are the big items)
    shards = [[]]
    sizes = [0]
    for k, v in tensors.items():
        if sizes[-1] + v.nbytes > max_shard_bytes and shards[-1]:
            shards.append([])
            sizes.append(0)
        shards[-1].append(k)
        sizes[-1] += v.nbytes
    n = len(shards)
    weight_map = {}
    manifest = {k: str(v.dtype) for k, v in tensors.items()}
    meta = {
        "format": "flatquant_tpu_packed_int4",
        "dtypes": json.dumps(manifest),
        "quantization_config": json.dumps(quantization_config or {}),
    }
    for i, keys in enumerate(shards):
        fname = f"{basename}-{i + 1:05d}-of-{n:05d}.safetensors"
        out = {}
        for k in keys:
            v = tensors[k]
            out[k] = v.view(np.uint16) if str(v.dtype) == "bfloat16" else v
            weight_map[k] = fname
        save_file(out, os.path.join(exp_dir, fname), metadata=meta)
    index = {
        "metadata": {"total_size": total, **meta},
        "weight_map": weight_map,
    }
    index_path = os.path.join(exp_dir, f"{basename}.safetensors.index.json")
    with open(index_path, "w") as fh:
        json.dump(index, fh, indent=1)
    return index_path


def load_packed_safetensors_sharded(path: str, template: dict) -> dict:
    """Load a sharded packed export (index.json path) — or delegate to
    load_packed_safetensors for a single-file path."""
    if not path.endswith(".index.json"):
        return load_packed_safetensors(path, template)
    from safetensors.numpy import load_file

    with open(path) as fh:
        index = json.load(fh)
    manifest = json.loads(index["metadata"].get("dtypes", "{}"))
    base = os.path.dirname(os.path.abspath(path))
    raw = {}
    for fname in sorted(set(index["weight_map"].values())):
        raw.update(load_file(os.path.join(base, fname)))
    for k, dt in manifest.items():
        if dt == "bfloat16" and k in raw:
            raw[k] = raw[k].view(jnp.bfloat16)
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_keys, leaf in flat:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path_keys
        )
        if key not in raw:
            raise KeyError(f"sharded checkpoint missing tensor {key!r}")
        leaves.append(jnp.asarray(raw[key]))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
