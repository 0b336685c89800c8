"""FP8 block-scaled serving GEMM tests (kernels/fp8_matmul.py) and the
native-FP8 DeepSeek serving path (reference deepseek_v3/kernel.py:108-191
analog)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.kernels.fp8_matmul import (
    E4M3_MAX,
    expand_fp8_scales,
    fp8_block_quantize,
    fp8_linear,
    fp8_matmul,
    fp8_matmul_ref,
    prep_fp8_weight,
)


def _dense_dequant(w8, scales, n, k, block):
    s = np.repeat(np.repeat(np.asarray(scales), block, 0)[:n], block, 1)[:, :k]
    return np.asarray(w8.astype(jnp.float32)) * s


def _all_codes_weight():
    """[128, 128] fp8 weight tiling all 256 codes (NaN codes zeroed)."""
    codes = np.tile(np.arange(256, dtype=np.uint8), 64).reshape(128, 128)
    codes[codes & 0x7F == 0x7F] = 0  # the two NaN codes
    return jax.lax.bitcast_convert_type(jnp.asarray(codes), jnp.float8_e4m3fn)


def test_exhaustive_decode_exact_mode():
    """Kernel exact=True reproduces jax's own e4m3 semantics on every
    non-NaN code (interpret mode; x = identity picks out the decode)."""
    w8 = _all_codes_weight()
    se = jnp.ones((1, 128), jnp.float32)
    x = jnp.eye(128, dtype=jnp.bfloat16)
    out = fp8_matmul(x, w8, se, out_dtype=jnp.float32, exact=True,
                     interpret=True)  # [128(k), 128(n)] = decode(w8).T
    want = w8.astype(jnp.float32).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_ftz_mode_flushes_only_subnormals():
    w8 = _all_codes_weight()
    se = jnp.ones((1, 128), jnp.float32)
    x = jnp.eye(128, dtype=jnp.bfloat16)
    out = np.asarray(fp8_matmul(x, w8, se, out_dtype=jnp.float32,
                                interpret=True))
    want = np.asarray(w8.astype(jnp.float32).T)
    u = np.asarray(jax.lax.bitcast_convert_type(w8, jnp.uint8)).T
    sub = ((u & 0x7F) < 8) & ((u & 0x7F) > 0)
    np.testing.assert_array_equal(out[~sub], want[~sub])
    np.testing.assert_array_equal(out[sub], 0.0)
    assert np.abs(want[sub]).max() < 2.0 ** -6


def test_block_quantize_roundtrip_and_ftz():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(160, 192)).astype(np.float32)) * 0.07
    w8, s = fp8_block_quantize(w, block=64)
    assert w8.shape == w.shape and s.shape == (3, 3)
    deq = _dense_dequant(w8, s, 160, 192, 64)
    # fp8 tile quantization: relative error bounded by half an e4m3 step
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 2.0 ** -4
    # ftz: no subnormal codes survive packing
    u = np.asarray(jax.lax.bitcast_convert_type(w8, jnp.uint8))
    em = u & 0x7F
    assert not ((em > 0) & (em < 8)).any()
    # non-ftz pack may keep them; kernel exact mode must then match ref
    w_tiny = w * 1e-4
    w8n, sn = fp8_block_quantize(w_tiny, block=64, ftz=False)
    un = np.asarray(jax.lax.bitcast_convert_type(w8n, jnp.uint8)) & 0x7F
    assert ((un > 0) & (un < 8)).any()


def test_kernel_matches_ref_on_ftz_pack():
    rng = np.random.default_rng(1)
    M, K, N = 16, 256, 384
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32)) * 0.05
    w8, s = fp8_block_quantize(w)
    se = expand_fp8_scales(s, N, K)
    out_k = fp8_matmul(x, w8, se, out_dtype=jnp.float32, interpret=True)
    out_r = fp8_matmul_ref(x, w8, se, out_dtype=jnp.float32)
    # same math, different fp32 reduction structure -> ulp-level tolerance
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    # and both match dense dequant within fp32-accumulation noise
    gold = np.asarray(x.astype(jnp.float32)) @ _dense_dequant(w8, s, N, K, 128).T
    np.testing.assert_allclose(np.asarray(out_k), gold, rtol=2e-2, atol=1e-3)


def test_exact_mode_matches_ref_with_subnormals():
    rng = np.random.default_rng(2)
    M, K, N = 8, 256, 128
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = rng.normal(size=(N, K)).astype(np.float32) * 0.05
    w[::3] *= 1e-4  # force subnormal codes
    w8, s = fp8_block_quantize(jnp.asarray(w), ftz=False)
    se = expand_fp8_scales(s, N, K)
    out_k = fp8_matmul(x, w8, se, out_dtype=jnp.float32, exact=True,
                       interpret=True)
    out_r = fp8_matmul_ref(x, w8, se, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_prep_fp8_weight_odd_dims():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    lin = prep_fp8_weight(w)  # block falls back to 16
    assert lin["se"].shape == (4, 48)  # K/16 rows, N expanded
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    y = fp8_linear(x, lin, out_dtype=jnp.float32, use_kernel=False)
    sfull = np.repeat(np.asarray(lin["se"]), 16, axis=0)  # [64, 48]
    deq = np.asarray(lin["w8"].astype(jnp.float32)) * sfull.T
    xb = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))  # ref casts x
    np.testing.assert_allclose(np.asarray(y), xb @ deq.T,
                               rtol=2e-2, atol=1e-3)


def test_ds_fp8_serving_forward():
    """Native-FP8 DS serving: build_ds_fp8_serving_params forward matches
    the bf16 forward on dequantized weights (fp8 quantization noise only)."""
    from flatquant_tpu.models.deepseek import (
        TINY_DEEPSEEK,
        build_ds_fp8_serving_params,
        deepseek_forward,
        init_ds_params,
    )

    cfg = TINY_DEEPSEEK
    params = init_ds_params(cfg, seed=0)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    sp = build_ds_fp8_serving_params(cfg, params)

    # reference: forward on the DEQUANTIZED fp8 weights (isolates the
    # serving-path plumbing from fp8 quantization error)
    def dequant_one(w8, se):
        b = w8.shape[1] // se.shape[0]
        sfull = jnp.repeat(se, b, axis=0)  # [K, N]
        return (w8.astype(jnp.float32) * sfull.T).astype(jnp.bfloat16)

    ref_params = dict(sp)
    for grp in ("dense_layers", "moe_layers"):
        out = {}
        for kk, v in sp[grp].items():
            if isinstance(v, dict) and "w8" in v:
                fn = dequant_one
                for _ in range(v["w8"].ndim - 2):  # layer (+expert) axes
                    fn = jax.vmap(fn)
                out[kk] = fn(v["w8"], v["se"])
            else:
                out[kk] = v
        ref_params[grp] = out

    lg_fp8 = deepseek_forward(cfg, sp, toks, compute_dtype=jnp.bfloat16)
    lg_ref = deepseek_forward(cfg, ref_params, toks, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(lg_fp8, np.float32), np.asarray(lg_ref, np.float32),
        rtol=0.15, atol=0.15,
    )
    assert bool(jnp.isfinite(lg_fp8).all())
