"""Int4 KV cache kernel tests (interpret mode vs XLA oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flatquant_tpu.kernels.kv_cache import (
    decode_attention_int4,
    decode_attention_ref,
    quantize_pack_kv,
    unpack_dequant_kv,
)


def _mk(rng, B, S, nkv, nh, hd):
    k = jnp.asarray(rng.standard_normal((B, nkv, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nkv, S, hd)), jnp.float32)
    kp, ks, kz = quantize_pack_kv(k)
    vp, vs, vz = quantize_pack_kv(v)
    q = jnp.asarray(rng.standard_normal((B, nh, hd)), jnp.bfloat16)
    return q, (kp, ks, kz), (vp, vs, vz)


def test_quantize_pack_roundtrip(rng):
    t = jnp.asarray(rng.standard_normal((3, 7, 2, 64)), jnp.float32)
    p, s, z = quantize_pack_kv(t)
    assert p.dtype == jnp.uint8 and p.shape[-1] == 32
    back = unpack_dequant_kv(p, s, z, jnp.float32)
    assert float(jnp.max(jnp.abs(back - t))) <= float(s.max()) / 2 + 1e-6


def test_quantize_pack_with_clip(rng):
    t = jnp.asarray(rng.standard_normal((4, 2, 1, 32)), jnp.float32)
    clip = (jnp.float32(0.5), jnp.float32(0.5))
    p, s, _ = quantize_pack_kv(t, clip)
    p2, s2, _ = quantize_pack_kv(t)
    assert float(s.max()) < float(s2.max())


@pytest.mark.parametrize("shape", [(2, 256, 2, 8, 64), (1, 128, 4, 4, 128)])
def test_decode_kernel_matches_ref(rng, shape):
    B, S, nkv, nh, hd = shape
    q, (kp, ks, kz), (vp, vs, vz) = _mk(rng, B, S, nkv, nh, hd)
    valid = jnp.asarray(rng.integers(1, S, B), jnp.int32)
    kparam = jnp.concatenate([ks, kz], -1)
    vparam = jnp.concatenate([vs, vz], -1)
    ref = decode_attention_ref(q, kp, ks, kz, vp, vs, vz, valid, 0.125)
    out = decode_attention_int4(q, kp, kparam, vp, vparam, valid, 0.125,
                                block_s=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )


def test_decode_kernel_valid_len_1(rng):
    """Edge: only one valid position -> output equals that position's V."""
    B, S, nkv, nh, hd = 1, 64, 1, 2, 64
    q, (kp, ks, kz), (vp, vs, vz) = _mk(rng, B, S, nkv, nh, hd)
    valid = jnp.asarray([1], jnp.int32)
    kparam = jnp.concatenate([ks, kz], -1)
    vparam = jnp.concatenate([vs, vz], -1)
    out = decode_attention_int4(q, kp, kparam, vp, vparam, valid, 0.125,
                                block_s=64, interpret=True)
    v0 = unpack_dequant_kv(vp, vs, vz, jnp.float32)[0, 0, 0]
    # output is bf16: one ulp at |v|~1 is ~0.008
    np.testing.assert_allclose(np.asarray(out[0, 0], np.float32), np.asarray(v0),
                               atol=1e-2)


@pytest.mark.parametrize("shape", [(2, 256, 2, 8, 64), (1, 128, 4, 4, 128)])
def test_decode_kernel_wide_matches_ref(rng, shape):
    from flatquant_tpu.kernels.kv_cache import decode_attention_int4_wide

    B, S, nkv, nh, hd = shape
    q, (kp, ks, kz), (vp, vs, vz) = _mk(rng, B, S, nkv, nh, hd)
    valid = jnp.asarray(rng.integers(1, S, B), jnp.int32)
    kparam = jnp.concatenate([ks, kz], -1)
    vparam = jnp.concatenate([vs, vz], -1)
    ref = decode_attention_ref(q, kp, ks, kz, vp, vs, vz, valid, 0.125)
    out = decode_attention_int4_wide(q, kp, kparam, vp, vparam, valid, 0.125,
                                     block_s=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )


@pytest.mark.parametrize("shape", [(2, 256, 2, 8, 64), (1, 128, 4, 4, 128)])
def test_decode_kernel_v3_matches_ref(rng, shape):
    from flatquant_tpu.kernels.kv_cache import decode_attention_int4_v3

    B, S, nkv, nh, hd = shape
    q, (kp, ks, kz), (vp, vs, vz) = _mk(rng, B, S, nkv, nh, hd)
    valid = jnp.asarray(rng.integers(1, S, B), jnp.int32)
    kparam = jnp.concatenate([ks, kz], -1)
    vparam = jnp.concatenate([vs, vz], -1)
    ref = decode_attention_ref(q, kp, ks, kz, vp, vs, vz, valid, 0.125)
    out = decode_attention_int4_v3(q, kp, kparam, vp, vparam, valid, 0.125,
                                   block_s=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-3
    )


def test_decode_valid_len_zero_no_nan(rng):
    """valid_len == 0 rows must produce finite (zero) output, not NaN
    (every score masked -> m stays -inf without the clamp)."""
    from flatquant_tpu.kernels.kv_cache import (
        decode_attention_int4_v3,
        decode_attention_int4_wide,
    )

    B, S, nkv, nh, hd = 2, 128, 2, 4, 64
    q, (kp, ks, kz), (vp, vs, vz) = _mk(rng, B, S, nkv, nh, hd)
    valid = jnp.asarray([0, S // 2], jnp.int32)
    kparam = jnp.concatenate([ks, kz], -1)
    vparam = jnp.concatenate([vs, vz], -1)

    ref = decode_attention_ref(q, kp, ks, kz, vp, vs, vz, valid, 0.125)
    assert bool(jnp.isfinite(ref.astype(jnp.float32)).all())
    assert float(jnp.abs(ref[0].astype(jnp.float32)).max()) == 0.0

    for fn in (decode_attention_int4, decode_attention_int4_wide,
               decode_attention_int4_v3):
        out = fn(q, kp, kparam, vp, vparam, valid, 0.125, interpret=True)
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), fn.__name__
        assert float(jnp.abs(out[0].astype(jnp.float32)).max()) == 0.0, fn.__name__
        np.testing.assert_allclose(
            np.asarray(out[1], np.float32), np.asarray(ref[1], np.float32),
            atol=2e-2, rtol=0,
        )


def test_decode_v4_matches_ref():
    """v4 transposed lane-full layout == oracle (scalar + per-slot valid,
    MHA + GQA)."""
    from flatquant_tpu.kernels.kv_cache import (
        decode_attention_int4_v4, pack_kv_transposed, untranspose_kv)

    for nh, nkv in [(4, 4), (8, 2)]:
        B, S, hd = 2, 512, 128
        key = jax.random.PRNGKey(7)
        kq_, kk_, kv_ = jax.random.split(key, 3)
        q = jax.random.normal(kq_, (B, nh, hd), jnp.float32)
        k = jax.random.normal(kk_, (B, S, nkv, hd), jnp.float32)
        v = jax.random.normal(kv_, (B, S, nkv, hd), jnp.float32)
        ck, pk_ = pack_kv_transposed(k)
        cv, pv_ = pack_kv_transposed(v)
        kp, ks, kz = untranspose_kv(ck, pk_)
        vp, vs, vz = untranspose_kv(cv, pv_)
        for valid in (jnp.array([S - 3, 17], jnp.int32),
                      jnp.array([1, S], jnp.int32)):
            ref = decode_attention_ref(q, kp, ks, kz, vp, vs, vz, valid, 0.125)
            out = decode_attention_int4_v4(q, ck, pk_, cv, pv_, valid, 0.125,
                                           block_s=128, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=1e-5)


def test_v4_layout_roundtrip():
    from flatquant_tpu.kernels.kv_cache import (
        pack_kv_transposed, quantize_pack_kv, untranspose_kv)

    t = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 4, 128), jnp.float32)
    ck, par = pack_kv_transposed(t)
    assert ck.shape == (2, 4, 64, 64) and par.shape == (2, 4, 2, 64)
    kp, ks, kz = untranspose_kv(ck, par)
    pk0, sc0, zr0 = quantize_pack_kv(t)
    np.testing.assert_array_equal(np.asarray(kp),
                                  np.asarray(jnp.swapaxes(pk0, 1, 2)))
    np.testing.assert_array_equal(np.asarray(ks),
                                  np.asarray(jnp.swapaxes(sc0, 1, 2)))
    np.testing.assert_array_equal(np.asarray(kz),
                                  np.asarray(jnp.swapaxes(zr0, 1, 2)))


def test_chunk_attention_matches_dense(rng):
    """chunk_attention_int4_v4 (interpret) == dense masked attention over
    the dequantized cache, across GQA ratios and chunk offsets — the
    FlashInfer append-kernel analog used by chunked prefill."""
    from flatquant_tpu.kernels.kv_cache import (
        chunk_attention_int4_v4,
        pack_kv_transposed,
        untranspose_kv,
        unpack_dequant_kv,
    )

    for nh, nkv, sq, pos0 in ((4, 4, 8, 5), (8, 2, 4, 0), (4, 2, 16, 48)):
        B, S, hd = 2, 128, 64
        kv = rng.standard_normal((B, S, nkv, hd)).astype(np.float32)
        vv = rng.standard_normal((B, S, nkv, hd)).astype(np.float32)
        q = jnp.asarray(rng.standard_normal((B, sq, nh, hd)), jnp.float32)
        kp, kpar = pack_kv_transposed(jnp.asarray(kv))
        vp, vpar = pack_kv_transposed(jnp.asarray(vv))
        pos = jnp.full((B,), pos0, jnp.int32)
        sm = 1.0 / np.sqrt(hd)

        got = chunk_attention_int4_v4(q, kp, kpar, vp, vpar, pos, sm,
                                      interpret=True)

        # dense reference over the dequantized cache
        kpo, kso, kzo = untranspose_kv(kp, kpar)
        vpo, vso, vzo = untranspose_kv(vp, vpar)
        kd = unpack_dequant_kv(kpo, kso, kzo, jnp.float32)  # [B,nkv,S,hd]
        vd = unpack_dequant_kv(vpo, vso, vzo, jnp.float32)
        n_rep = nh // nkv
        if n_rep > 1:
            kd = jnp.repeat(kd, n_rep, axis=1)
            vd = jnp.repeat(vd, n_rep, axis=1)
        sc = jnp.einsum("bqhd,bhkd->bhqk", q, kd) * sm
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sq, 1), 2)
        sc = jnp.where(ids <= pos0 + iq, sc, -jnp.inf)
        pr = jax.nn.softmax(sc, axis=-1)
        want = jnp.einsum("bhqk,bhkd->bqhd", pr, vd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
