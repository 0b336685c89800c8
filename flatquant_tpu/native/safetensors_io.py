"""Minimal mmap-based safetensors reader/writer (torch-free load path).

Format: 8-byte LE u64 header length, JSON header {name: {dtype, shape,
data_offsets}}, then the payload. Tensors are materialized as fp32 (or
their native integer dtype) straight off the mmap through the threaded
native converters (native/__init__.py) — the production load path for HF
DeepSeek FP8 shards (models/ds_loader.py) without the torch dtype bridge.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from flatquant_tpu import native

_DTYPES = {
    "F64": (np.float64, 8),
    "F32": (np.float32, 4),
    "F16": (np.uint16, 2),       # widened via f16_to_f32
    "BF16": (np.uint16, 2),      # widened via bf16_to_f32
    "F8_E4M3": (np.uint8, 1),    # decoded via fp8_e4m3_to_f32
    "I64": (np.int64, 8),
    "I32": (np.int32, 4),
    "I16": (np.int16, 2),
    "I8": (np.int8, 1),
    "U8": (np.uint8, 1),
    "BOOL": (np.bool_, 1),
}


class SafetensorsFile:
    """Zero-copy view over one .safetensors file."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        (hlen,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8 : 8 + hlen].decode("utf-8"))
        self.metadata = header.pop("__metadata__", {})
        self._entries: Dict[str, dict] = header
        self._base = 8 + hlen

    def keys(self):
        return self._entries.keys()

    def dtype_of(self, name: str) -> str:
        return self._entries[name]["dtype"]

    def raw(self, name: str) -> Tuple[np.ndarray, str]:
        """(raw array in storage dtype — a VIEW into the mmap — , dtype tag)."""
        e = self._entries[name]
        tag = e["dtype"]
        if tag not in _DTYPES:
            raise ValueError(f"unsupported safetensors dtype {tag} for {name}")
        np_dt, isz = _DTYPES[tag]
        start, end = e["data_offsets"]
        n = (end - start) // isz
        arr = np.frombuffer(self._mm, dtype=np_dt, count=n,
                            offset=self._base + start)
        return arr.reshape(e["shape"]), tag

    def tensor_f32(self, name: str) -> np.ndarray:
        """Tensor as float32 (fp8/bf16/f16 widened through native kernels);
        integer/bool dtypes are returned as-is (copy)."""
        raw, tag = self.raw(name)
        if tag == "F8_E4M3":
            return native.fp8_e4m3_to_f32(raw)
        if tag == "BF16":
            return native.bf16_to_f32(raw)
        if tag == "F16":
            return native.f16_to_f32(raw)
        if tag in ("F32", "F64"):
            return np.asarray(raw, np.float32).copy() if tag == "F64" else raw.copy()
        return raw.copy()

    def fp8_tensor_dequant(self, name: str, scales: np.ndarray,
                           block: int = 128) -> np.ndarray:
        """FP8 weight fused with its block scale tile in one threaded pass."""
        raw, tag = self.raw(name)
        assert tag == "F8_E4M3", tag
        return native.fp8_block_dequant_np(raw, scales, block)

    def close(self):
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def iter_safetensors(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, f32/int array) over all tensors of one file."""
    with SafetensorsFile(path) as sf:
        for name in sf.keys():
            yield name, sf.tensor_f32(name)


def write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                      metadata: Optional[Dict[str, str]] = None) -> None:
    """Write a safetensors file from numpy arrays (f32/i*/u8/bool only —
    enough for fixtures and packed exports; bf16/fp8 writing goes through
    the torch path in models/ds_loader.py)."""
    rev = {np.dtype(np.float64): "F64", np.dtype(np.float32): "F32",
           np.dtype(np.int64): "I64", np.dtype(np.int32): "I32",
           np.dtype(np.int16): "I16", np.dtype(np.int8): "I8",
           np.dtype(np.uint8): "U8", np.dtype(np.bool_): "BOOL"}
    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = metadata
    off = 0
    bufs = []
    for name, a in tensors.items():
        a = np.ascontiguousarray(a)
        tag = rev.get(a.dtype)
        if tag is None:
            raise ValueError(f"unsupported write dtype {a.dtype} for {name}")
        nb = a.nbytes
        header[name] = {"dtype": tag, "shape": list(a.shape),
                        "data_offsets": [off, off + nb]}
        bufs.append(a.tobytes())
        off += nb
    hj = json.dumps(header, separators=(",", ":")).encode("utf-8")
    pad = (8 - len(hj) % 8) % 8  # align payload to 8 bytes (spec allows pad)
    hj += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in bufs:
            f.write(b)
