"""Native (C++/ctypes) host-runtime kernels: parity vs torch and numpy.

The native module accelerates checkpoint conversion (fp8 E4M3 block
dequant, bf16/f16 widening, int4 planar pack) with OpenMP; every function
must be bit-identical to its numpy fallback AND to torch's float8/bfloat16
semantics (the reference's dtype bridge). Also covers the torch-free mmap
safetensors reader and its equivalence to the safe_open path in
models/ds_loader.py.
"""

import numpy as np
import pytest

from flatquant_tpu import native

torch = pytest.importorskip("torch")


def _np_fallbacks(monkeypatch):
    """Force the numpy fallback path regardless of build status."""
    monkeypatch.setattr(native, "AVAILABLE", False)
    monkeypatch.setattr(native, "_lib", False)


def test_e4m3_decode_matches_torch():
    raw = np.arange(256, dtype=np.uint8)
    ours = native.fp8_e4m3_to_f32(raw)
    theirs = torch.tensor(raw).view(torch.float8_e4m3fn).float().numpy()
    nan = np.isnan(theirs)
    assert np.array_equal(ours[~nan], theirs[~nan])
    assert np.isnan(ours[nan]).all() and nan.sum() == 2  # s.1111.111 only


def test_e4m3_native_equals_numpy(monkeypatch):
    raw = np.random.default_rng(0).integers(0, 256, 5000, dtype=np.uint8)
    a = native.fp8_e4m3_to_f32(raw)
    _np_fallbacks(monkeypatch)
    b = native.fp8_e4m3_to_f32(raw)
    nan = np.isnan(a)
    assert np.array_equal(a[~nan], b[~nan]) and np.isnan(b[nan]).all()


def test_block_dequant_matches_device_impl():
    """Host dequant == models.deepseek.fp8_block_dequant (the jnp version
    the calibration path uses), including ragged tail tiles."""
    import jax.numpy as jnp

    from flatquant_tpu.models.deepseek import fp8_block_dequant

    rng = np.random.default_rng(1)
    w8 = rng.integers(0, 256, (300, 260), dtype=np.uint8)
    w8[(w8 & 0x7F) == 0x7F] = 0  # avoid NaN codes for exact compare
    sc = rng.standard_normal((3, 3)).astype(np.float32)
    wf = torch.tensor(w8).view(torch.float8_e4m3fn).float().numpy()
    ref = np.asarray(fp8_block_dequant(jnp.asarray(wf), jnp.asarray(sc)))
    got = native.fp8_block_dequant_np(w8, sc)
    assert np.array_equal(got, ref)


def test_bf16_f16_widening_matches_torch_numpy():
    rng = np.random.default_rng(2)
    u16 = rng.integers(0, 65536, 20000, dtype=np.uint16)
    bt = torch.tensor(u16.view(np.int16)).view(torch.bfloat16).float().numpy()
    bo = native.bf16_to_f32(u16)
    m = ~np.isnan(bt)
    assert np.array_equal(bo[m], bt[m]) and np.isnan(bo[~m]).all()
    ht = u16.view(np.float16).astype(np.float32)
    ho = native.f16_to_f32(u16)
    m = ~np.isnan(ht)
    assert np.array_equal(ho[m], ht[m]) and np.isnan(ho[~m]).all()


def test_pack_unpack_matches_kernel_layout():
    import jax.numpy as jnp

    from flatquant_tpu.kernels.int4_matmul import pack_weight_planar

    q = np.random.default_rng(3).integers(-8, 8, (96, 256), dtype=np.int8)
    pk = native.pack_int4_planar(q)
    assert np.array_equal(pk, np.asarray(pack_weight_planar(jnp.asarray(q))))
    assert np.array_equal(native.unpack_int4_planar(pk), q)


def test_safetensors_roundtrip(tmp_path):
    from flatquant_tpu.native.safetensors_io import (
        SafetensorsFile,
        write_safetensors,
    )

    rng = np.random.default_rng(4)
    tensors = {
        "a": rng.standard_normal((17, 33)).astype(np.float32),
        "b": rng.integers(0, 256, (4, 6), dtype=np.uint8),
        "c": rng.integers(-100, 100, (5,), dtype=np.int64),
    }
    p = str(tmp_path / "t.safetensors")
    write_safetensors(p, tensors, metadata={"format": "pt"})
    with SafetensorsFile(p) as sf:
        assert set(sf.keys()) == set(tensors)
        assert sf.metadata["format"] == "pt"
        for k, v in tensors.items():
            got = sf.tensor_f32(k)
            assert np.array_equal(got, v.astype(got.dtype))


def test_native_reader_matches_torch_reader(tmp_path):
    """The mmap/native shard iterator must produce the same tensors as the
    safe_open+torch fallback on a real HF-layout FP8 fixture."""
    from flatquant_tpu.models.deepseek import TINY_DEEPSEEK
    from flatquant_tpu.models.ds_loader import (
        _iter_hf_tensors,
        write_hf_deepseek_fixture,
    )

    d = str(tmp_path / "hf")
    import os

    os.makedirs(d)
    write_hf_deepseek_fixture(d, TINY_DEEPSEEK, seed=0, fp8=True)
    a = dict(_iter_hf_tensors(d, use_native=True))
    b = dict(_iter_hf_tensors(d, use_native=False))
    assert set(a) == set(b)
    for k in a:
        assert np.allclose(a[k], b[k], rtol=0, atol=0), k
