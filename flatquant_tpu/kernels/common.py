"""Shared kernel plumbing."""

from __future__ import annotations

import jax


def resolve_interpret(interpret) -> bool:
    """interpret=None (the kernel entry-point default) auto-selects Pallas
    interpret mode off-TPU: the engine's use_kernel=True paths then run
    bit-faithfully on the CPU test mesh (e.g. tensor-parallel decode over
    the packed int4 cache under shard_map) while compiling to real Mosaic
    kernels on the chip. Pass an explicit bool to pin either mode."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)
