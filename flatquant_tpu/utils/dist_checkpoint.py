"""Sharding-aware distributed checkpoints (orbax).

The reference persists multi-rank state as per-rank files the user must
keep aligned with the launch topology: `model{rank}-mp{world_size}.safetensors`
shards and `flat_matrices_{rank}.pth` transform checkpoints
(main_dpskv3.py:416,446 and :216-227) — a checkpoint written at mp=16
cannot be read at mp=8 without an offline reshard. The TPU-native
replacement is a topology-free sharded checkpoint: orbax writes each
host's shards of a GSPMD-sharded pytree in parallel, and restore
materializes arrays directly into ANY target sharding (different mesh
shape, axis order, or device count) without ever gathering the full tree
onto one host.

Used for: sharded model params during multi-chip calibration (dp/tp/ep
meshes from parallel/mesh.py) and the per-layer FQ-state resume artifact
when calibrating sharded. The single-host msgpack formats in
utils/checkpoint.py remain the interchange formats for small artifacts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded(path: str, tree, *, overwrite: bool = True) -> str:
    """Write a (possibly GSPMD-sharded) pytree of jax arrays.

    Each process writes only the shards it owns; no host-side gather.
    Works identically for fully-replicated trees on a single device.
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=overwrite)
    ckptr.wait_until_finished()
    return path


def load_sharded(path: str, template, mesh: Optional[Mesh] = None,
                 specs=None):
    """Restore a pytree saved by save_sharded.

    template: a pytree matching the saved structure whose leaves carry
      shape+dtype (concrete arrays or jax.ShapeDtypeStruct).
    mesh/specs: optional target sharding — specs is a pytree of
      PartitionSpec (broadcast over template if a single spec). When given,
      each leaf is restored directly into NamedSharding(mesh, spec): the
      target topology does NOT need to match the one that wrote the
      checkpoint. When omitted, arrays restore unsharded on the default
      device.
    """
    path = os.path.abspath(path)

    def leaf_abstract(leaf, spec):
        shape = np.shape(leaf) if not hasattr(leaf, "shape") else leaf.shape
        dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
        sharding = None
        if mesh is not None:
            sharding = NamedSharding(mesh, spec if spec is not None
                                     else PartitionSpec())
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    if specs is None or isinstance(specs, PartitionSpec):
        one = specs if isinstance(specs, PartitionSpec) else None
        abstract = jax.tree.map(lambda l: leaf_abstract(l, one), template)
    else:
        abstract = jax.tree.map(leaf_abstract, template, specs,
                                is_leaf=lambda x: x is None)

    ckptr = _checkpointer()
    return ckptr.restore(path, abstract)
