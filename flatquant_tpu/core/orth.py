"""Orthogonal parameterization via the Cayley map.

The reference constrains the SVD-style transform factors U, V to be
orthogonal with torch's cayley parametrization
(flatquant/trans_utils.py:13-16). Re-derived here for JAX/optax:

  raw parameter X  ->  A = skew(tril(X, -1))  ->  Q = (I - A/2)^{-1} (I + A/2)

Q is orthogonal for every X, so plain AdamW on X maintains the constraint.
Initialization inverts the map on a QR-sampled special-orthogonal matrix
(host-side, float64 numpy) so training starts from a random rotation,
matching function_utils.py:24-32 semantics.
"""

import numpy as np

import jax.numpy as jnp


def cayley(x):
    """Map an unconstrained square matrix to an orthogonal one.

    Differentiable; runs in float32 (solve of an n x n system, n <= 128 for
    all FlatQuant factor sizes).
    """
    x = x.astype(jnp.float32)
    a = jnp.tril(x, -1)
    a = a - a.T
    n = a.shape[0]
    eye = jnp.eye(n, dtype=a.dtype)
    return jnp.linalg.solve(eye - a / 2, eye + a / 2)


def inverse_cayley(q: np.ndarray) -> np.ndarray:
    """Host-side inverse of `cayley` for initialization (float64).

    Solves (I + Q) A = 2 (Q - I) for the skew-symmetric A and returns a raw
    parameter whose strictly-lower triangle carries A. Requires -1 not an
    eigenvalue of Q (guaranteed a.s. for det(Q) = +1 random rotations).
    """
    q = np.asarray(q, dtype=np.float64)
    n = q.shape[0]
    eye = np.eye(n)
    a = np.linalg.solve(eye + q, 2.0 * (q - eye))
    a = (a - a.T) / 2.0  # clean numerical asymmetry
    return np.tril(a, -1)


def random_orthogonal(size: int, rng: np.random.Generator) -> np.ndarray:
    """Random orthogonal matrix via QR of a gaussian, sign-fixed (Haar).

    Mirrors function_utils.get_random_orthg; additionally flips one column
    if det = -1 so the result is special-orthogonal (required for the Cayley
    chart to contain it).
    """
    h = rng.standard_normal((size, size))
    q, r = np.linalg.qr(h)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def random_cayley_param(size: int, rng: np.random.Generator) -> np.ndarray:
    """Raw Cayley parameter initializing to a random rotation."""
    return inverse_cayley(random_orthogonal(size, rng)).astype(np.float32)
