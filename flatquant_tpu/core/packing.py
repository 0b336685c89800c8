"""Int4 nibble packing.

Checkpoint-compatible layout with the reference exporter
(deploy/functional/quantization.py:49-82): two's-complement int4 codes, the
even-indexed element of the last dim goes to the LOW nibble and the odd one
to the HIGH nibble of each uint8 byte.

The Pallas kernels may repack into a lane-friendly layout at load time; this
module defines the *interchange* format.
"""

import jax.numpy as jnp


def pack_int4(q):
    """Pack int8 codes in [-8, 7] into uint8 bytes (last dim halves)."""
    assert q.shape[-1] % 2 == 0, "last dim must be even to pack int4 pairs"
    u = q.astype(jnp.uint8) & 0xF
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return lo | (hi << 4)


def unpack_int4(b):
    """Unpack uint8 bytes into int8 codes in [-8, 7] (last dim doubles)."""
    lo = (b & 0xF).astype(jnp.int8)
    hi = ((b >> 4) & 0xF).astype(jnp.int8)
    # sign-extend 4-bit two's complement: (x ^ 8) - 8
    lo = (lo ^ 8) - 8
    hi = (hi ^ 8) - 8
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(b.shape[:-1] + (b.shape[-1] * 2,))
