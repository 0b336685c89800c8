"""Unit tests for the fake-quant math core (flatquant_tpu.core.quant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.core import (
    ActQuantCfg,
    WeightQuantCfg,
    act_fake_quant,
    act_scale_zero,
    get_qmin_qmax,
    pack_int4,
    round_ste,
    sym_quant,
    unpack_int4,
    weight_fake_quant,
    weight_find_params,
)
from flatquant_tpu.core.quant import weight_quantize_int


def test_qmin_qmax():
    assert get_qmin_qmax(4, True) == (-8, 7)
    assert get_qmin_qmax(4, False) == (0, 15)
    assert get_qmin_qmax(8, True) == (-128, 127)


def test_round_ste_values_and_grad():
    x = jnp.array([0.4, 0.5, 0.6, -1.5, 2.5])
    # jnp.round is ties-to-even, matching torch.round
    np.testing.assert_allclose(round_ste(x), jnp.round(x))
    g = jax.grad(lambda v: jnp.sum(round_ste(v)))(x)
    np.testing.assert_allclose(g, jnp.ones_like(x))


def test_sym_quant_range():
    x = jnp.linspace(-10, 10, 101)
    scale = jnp.float32(10.0 / 7.0)
    q = sym_quant(x, scale, 7)
    assert q.min() >= -8 and q.max() <= 7


@pytest.mark.parametrize("sym", [True, False])
def test_act_fake_quant_error_bound(rng, sym):
    x = jnp.asarray(rng.standard_normal((4, 32, 64)), jnp.float32)
    cfg = ActQuantCfg(bits=8, sym=sym)
    y = act_fake_quant(x, cfg)
    # per-token 8-bit: error bounded by scale/2 per element
    scale, _ = act_scale_zero(x, cfg)
    assert jnp.max(jnp.abs(y - x) / scale) <= 0.5 + 1e-5


def test_act_quant_identity_16bit(rng):
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    assert (act_fake_quant(x, ActQuantCfg(bits=16)) == x).all()
    assert (act_fake_quant(x, ActQuantCfg(bits=4), enabled=False) == x).all()


def test_act_quant_grouped(rng):
    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.float32)
    cfg = ActQuantCfg(bits=4, sym=False, group_size=128)
    y = act_fake_quant(x, cfg)
    assert y.shape == x.shape
    # grouped quantization should be at least as accurate as per-token
    y_tok = act_fake_quant(x, ActQuantCfg(bits=4, sym=False))
    assert jnp.mean((y - x) ** 2) <= jnp.mean((y_tok - x) ** 2) + 1e-6


def test_act_quant_lac_clipping(rng):
    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    cfg = ActQuantCfg(bits=4, sym=True, lac=True)
    # large negative clip factor -> sigmoid ~ 0 -> aggressive clipping
    y_clip = act_fake_quant(x, cfg, clip_max=jnp.float32(-10.0), clip_min=jnp.float32(-10.0))
    y_free = act_fake_quant(x, cfg, clip_max=jnp.float32(10.0), clip_min=jnp.float32(10.0))
    assert jnp.max(jnp.abs(y_clip)) < jnp.max(jnp.abs(y_free))
    # gradient flows to clip factors
    g = jax.grad(
        lambda c: jnp.sum(act_fake_quant(x, cfg, clip_max=c, clip_min=c) ** 2)
    )(jnp.float32(4.0))
    assert jnp.isfinite(g)


def test_act_quant_zero_row():
    x = jnp.zeros((2, 16), jnp.float32)
    for sym in (True, False):
        y = act_fake_quant(x, ActQuantCfg(bits=4, sym=sym))
        assert jnp.isfinite(y).all()
        np.testing.assert_allclose(y, 0.0)


@pytest.mark.parametrize("sym", [True, False])
def test_weight_quant_perchannel(rng, sym):
    w = jnp.asarray(rng.standard_normal((32, 64)) * 0.1, jnp.float32)
    cfg = WeightQuantCfg(bits=4, sym=sym)
    scale, zero = weight_find_params(w, cfg)
    assert scale.shape == (32, 1)
    wq = weight_fake_quant(w, scale, zero, cfg)
    assert jnp.max(jnp.abs(wq - w) / scale) <= 0.5 + 1e-4


def test_weight_quant_mse_improves(rng):
    # heavy-tailed weight: shrink search should reduce L2.4 error
    w = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    w = w.at[:, 0].set(w[:, 0] * 20.0)  # outlier channel
    base = WeightQuantCfg(bits=4, sym=True, mse=False)
    mse = WeightQuantCfg(bits=4, sym=True, mse=True)
    s0, z0 = weight_find_params(w, base)
    s1, z1 = weight_find_params(w, mse)
    e0 = jnp.sum(jnp.abs(weight_fake_quant(w, s0, z0, base) - w) ** 2.4)
    e1 = jnp.sum(jnp.abs(weight_fake_quant(w, s1, z1, mse) - w) ** 2.4)
    assert e1 <= e0 + 1e-6


def test_weight_quant_grouped(rng):
    w = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    cfg = WeightQuantCfg(bits=4, sym=True, group_size=128)
    scale, zero = weight_find_params(w, cfg)
    assert scale.shape == (8 * 2, 1)
    wq = weight_fake_quant(w, scale, zero, cfg)
    assert wq.shape == w.shape


def test_pack_unpack_roundtrip(rng):
    q = jnp.asarray(rng.integers(-8, 8, size=(7, 64)), jnp.int8)
    packed = pack_int4(q)
    assert packed.shape == (7, 32)
    assert packed.dtype == jnp.uint8
    np.testing.assert_array_equal(unpack_int4(packed), q)


def test_pack_layout_matches_reference():
    # even index -> low nibble, odd index -> high nibble
    q = jnp.array([[1, -2]], jnp.int8)
    b = pack_int4(q)
    assert int(b[0, 0]) == (1 | (((-2) & 0xF) << 4))


def test_weight_quantize_int_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    cfg = WeightQuantCfg(bits=4, sym=True)
    scale, zero = weight_find_params(w, cfg)
    q = weight_quantize_int(w, scale, zero, cfg)
    assert q.dtype == jnp.int8
    assert q.min() >= -8 and q.max() <= 7
    wq = weight_fake_quant(w, scale, zero, cfg)
    np.testing.assert_allclose(q * scale, wq, rtol=1e-5, atol=1e-6)
