"""Native (C++/OpenMP) host-runtime kernels with numpy fallbacks.

The TPU compute path is JAX/Pallas; this module covers the *host* side of
the runtime — checkpoint conversion inner loops (fp8 block dequant, bf16
widening, int4 planar pack) that the reference delegates to torch's C++
core. Built lazily with g++ into a cached .so and called via ctypes; every
entry point has a pure-numpy fallback so the framework works without a
toolchain (AVAILABLE tells you which path you're on).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fq_native.cpp")
_BUILD_DIR = os.path.join(_DIR, "_build")
_SO = os.path.join(_BUILD_DIR, "libfq_native.so")

_lib = None
AVAILABLE = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        "-o", _SO + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        sys.stderr.write(f"# fq_native build failed ({e}); using numpy fallbacks\n")
        return False
    os.replace(_SO + ".tmp", _SO)
    return True


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return
    fresh = os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    if not fresh and not _build():
        AVAILABLE = False
        _lib = False
        return
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        sys.stderr.write(f"# fq_native load failed ({e}); using numpy fallbacks\n")
        AVAILABLE = False
        _lib = False
        return
    c_i64, c_u8p = ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_u16p = ctypes.POINTER(ctypes.c_uint16)
    c_i8p = ctypes.POINTER(ctypes.c_int8)
    lib.fq_fp8_e4m3_to_f32.argtypes = [c_u8p, c_i64, c_f32p]
    lib.fq_fp8_block_dequant.argtypes = [c_u8p, c_i64, c_i64, c_f32p, c_i64,
                                         c_i64, c_f32p]
    lib.fq_bf16_to_f32.argtypes = [c_u16p, c_i64, c_f32p]
    lib.fq_f16_to_f32.argtypes = [c_u16p, c_i64, c_f32p]
    lib.fq_pack_int4_planar.argtypes = [c_i8p, c_i64, c_i64, c_u8p]
    lib.fq_unpack_int4_planar.argtypes = [c_u8p, c_i64, c_i64, c_i8p]
    lib.fq_num_threads.restype = ctypes.c_int
    _lib = lib
    AVAILABLE = True


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# numpy fallbacks (bit-identical to the C++ kernels; tests assert this)
# ---------------------------------------------------------------------------


_E4M3_LUT = None


def _e4m3_lut() -> np.ndarray:
    global _E4M3_LUT
    if _E4M3_LUT is None:
        b = np.arange(256, dtype=np.uint32)
        sign = np.where(b >> 7, -1.0, 1.0).astype(np.float64)
        exp = ((b >> 3) & 0xF).astype(np.int64)
        mant = (b & 0x7).astype(np.float64)
        val = np.where(exp == 0, mant / 8.0 * 2.0 ** -6,
                       (1.0 + mant / 8.0) * 2.0 ** (exp - 7.0))
        lut = (sign * val).astype(np.float32)
        lut[(exp == 0xF) & (mant == 7)] = np.nan
        _E4M3_LUT = lut
    return _E4M3_LUT


def fp8_e4m3_to_f32(raw: np.ndarray) -> np.ndarray:
    """raw uint8 E4M3 bytes -> float32 (same shape)."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    _load()
    if AVAILABLE:
        out = np.empty(raw.shape, np.float32)
        _lib.fq_fp8_e4m3_to_f32(_ptr(raw, ctypes.c_uint8), raw.size,
                                _ptr(out, ctypes.c_float))
        return out
    return _e4m3_lut()[raw]


def fp8_block_dequant_np(raw: np.ndarray, scales: np.ndarray,
                         block: int = 128) -> np.ndarray:
    """fp8 bytes [out, in] * tile scales [ceil(out/b), ceil(in/b)] -> f32.

    Host-side analog of models.deepseek.fp8_block_dequant (reference
    deepseek_v3/kernel.py:55-105 semantics)."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    scales = np.ascontiguousarray(scales, dtype=np.float32)
    out_dim, in_dim = raw.shape
    _load()
    if AVAILABLE:
        out = np.empty((out_dim, in_dim), np.float32)
        _lib.fq_fp8_block_dequant(
            _ptr(raw, ctypes.c_uint8), out_dim, in_dim,
            _ptr(scales, ctypes.c_float), scales.shape[1], block,
            _ptr(out, ctypes.c_float))
        return out
    wf = _e4m3_lut()[raw]
    sr = np.repeat(scales, block, axis=0)[:out_dim]
    sc = np.repeat(sr, block, axis=1)[:, :in_dim]
    return wf * sc


def bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """raw uint16 bf16 bit patterns -> float32 (same shape)."""
    raw = np.ascontiguousarray(raw, dtype=np.uint16)
    _load()
    if AVAILABLE:
        out = np.empty(raw.shape, np.float32)
        _lib.fq_bf16_to_f32(_ptr(raw, ctypes.c_uint16), raw.size,
                            _ptr(out, ctypes.c_float))
        return out
    return (raw.astype(np.uint32) << 16).view(np.float32)


def f16_to_f32(raw: np.ndarray) -> np.ndarray:
    """raw uint16 IEEE-half bit patterns -> float32."""
    raw = np.ascontiguousarray(raw, dtype=np.uint16)
    _load()
    if AVAILABLE:
        out = np.empty(raw.shape, np.float32)
        _lib.fq_f16_to_f32(_ptr(raw, ctypes.c_uint16), raw.size,
                           _ptr(out, ctypes.c_float))
        return out
    return raw.view(np.float16).astype(np.float32)


def pack_int4_planar(q: np.ndarray) -> np.ndarray:
    """int8 codes [n, k] in [-8, 7] -> planar biased nibbles [n, k/2]
    (kernels/int4_matmul.py pack_weight_planar layout)."""
    q = np.ascontiguousarray(q, dtype=np.int8)
    n, k = q.shape
    assert k % 2 == 0
    _load()
    if AVAILABLE:
        out = np.empty((n, k // 2), np.uint8)
        _lib.fq_pack_int4_planar(_ptr(q, ctypes.c_int8), n, k,
                                 _ptr(out, ctypes.c_uint8))
        return out
    u = (q.astype(np.int16) + 8).astype(np.uint8)
    return u[:, : k // 2] | (u[:, k // 2:] << 4)


def unpack_int4_planar(p: np.ndarray) -> np.ndarray:
    """Inverse of pack_int4_planar -> int8 [n, k]."""
    p = np.ascontiguousarray(p, dtype=np.uint8)
    n, kh = p.shape
    _load()
    if AVAILABLE:
        out = np.empty((n, kh * 2), np.int8)
        _lib.fq_unpack_int4_planar(_ptr(p, ctypes.c_uint8), n, kh * 2,
                                   _ptr(out, ctypes.c_int8))
        return out
    lo = (p & 0xF).astype(np.int8) - 8
    hi = (p >> 4).astype(np.int8) - 8
    return np.concatenate([lo, hi], axis=1)


def is_available() -> bool:
    _load()
    return AVAILABLE


def num_threads() -> int:
    _load()
    return _lib.fq_num_threads() if AVAILABLE else 1
