"""Tests for Kronecker math, orthogonal parameterization, and transforms."""

import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.core import (
    cayley,
    get_decompose_dim,
    inverse_cayley,
    kronecker_matmul,
    random_orthogonal,
)
from flatquant_tpu.core.transforms import (
    apply_decompose,
    apply_single,
    bake_decompose,
    bake_single,
    decompose_matrices,
    init_decompose,
    init_single,
    single_matrix,
)


def test_get_decompose_dim_known_values():
    assert get_decompose_dim(4096) == (64, 64)
    assert get_decompose_dim(11008) == (86, 128)
    assert get_decompose_dim(14336) == (112, 128)
    assert get_decompose_dim(3584) == (56, 64)
    for n in (4096, 11008, 14336, 3584, 18944, 27648):
        a, b = get_decompose_dim(n)
        assert a * b == n


def test_kronecker_matmul_equals_dense(rng):
    left = jnp.asarray(rng.standard_normal((6, 6)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 48)), jnp.float32)
    got = kronecker_matmul(x, left, right)
    want = x @ jnp.kron(left, right)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cayley_orthogonal(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    q = cayley(x)
    np.testing.assert_allclose(q @ q.T, jnp.eye(32), atol=1e-4)


def test_inverse_cayley_roundtrip(rng):
    q0 = random_orthogonal(24, rng)
    x = inverse_cayley(q0)
    q1 = cayley(jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(q1, q0, atol=1e-3)


@pytest.mark.parametrize("direct_inv", [False, True])
def test_single_transform_inverse(rng, direct_inv):
    t = init_single(16, rng, direct_inv=direct_inv)
    p = single_matrix(t, inv_t=False)
    p_inv_t = single_matrix(t, inv_t=True)
    # P^{-T} definition: P @ (P^{-T})^T = I
    np.testing.assert_allclose(p @ p_inv_t.T, jnp.eye(16), atol=2e-4)


@pytest.mark.parametrize("direct_inv", [False, True])
@pytest.mark.parametrize("add_diag", [False, True])
def test_linear_invariance(rng, direct_inv, add_diag):
    """The FlatQuant identity: linear(trans(x), W @ P^{-T}) == linear(x, W)."""
    n = 48
    t = init_decompose(n, rng, add_diag=add_diag, direct_inv=direct_inv)
    if add_diag:
        # non-trivial diag
        diag = jnp.asarray(rng.uniform(0.5, 2.0, size=(n,)), jnp.float32)
        t = t.replace(diag_scale=diag)
    x = jnp.asarray(rng.standard_normal((5, n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((10, n)), jnp.float32)

    x_t = apply_decompose(t, x, inv_t=False)
    w_t = apply_decompose(t, w, inv_t=True)  # rows of W over in-dim
    np.testing.assert_allclose(x_t @ w_t.T, x @ w.T, rtol=1e-3, atol=1e-3)


def test_bake_matches_train_mode(rng):
    n = 24
    t = init_decompose(n, rng, add_diag=True)
    x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    baked = bake_decompose(t)
    for inv_t in (False, True):
        np.testing.assert_allclose(
            apply_decompose(t, x, inv_t=inv_t),
            apply_decompose(baked, x, inv_t=inv_t),
            rtol=1e-5,
            atol=1e-5,
        )

    ts = init_single(12, rng)
    bs = bake_single(ts)
    xs = jnp.asarray(rng.standard_normal((3, 12)), jnp.float32)
    for inv_t in (False, True):
        np.testing.assert_allclose(
            apply_single(ts, xs, inv_t=inv_t),
            apply_single(bs, xs, inv_t=inv_t),
            rtol=1e-5,
            atol=1e-5,
        )


def test_decompose_matrices_inverse_relation(rng):
    t = init_decompose(4096 // 64, rng)  # 64 -> (8, 8)
    left, right = decompose_matrices(t, False)
    left_it, right_it = decompose_matrices(t, True)
    np.testing.assert_allclose(left @ left_it.T, jnp.eye(left.shape[0]), atol=2e-4)
    np.testing.assert_allclose(right @ right_it.T, jnp.eye(right.shape[0]), atol=2e-4)
