"""Hadamard transforms (QuaRot/Hadamard rotation baseline).

Parity target: flatquant/hadamard_utils.py — but instead of ~8k lines of
hardcoded matrices, non-power-of-2 Hadamard factors are *constructed*:
  - Sylvester doubling for powers of two,
  - Paley I  (order q+1, q prime = 3 mod 4): 12, 20, 44, 60, 108, 140, ...
  - Paley II (order 2(q+1), q prime = 1 mod 4): 28, 36, 76, ...
get_hadK factors n = K * 2^m like the reference (hadamard_utils.py:5-55);
sizes whose odd part has no constructible factor (e.g. 172 = 4*43 for
Llama-2-7B's 11008, which the reference hardcodes from tables) fall back
to a seeded random orthogonal factor — still an orthogonality-preserving
rotation baseline, flagged via `is_hadamard=False`.

The fast path is a reshape-based FWHT butterfly (log2 n passes of
adds/subs on the VPU) for the 2^m part composed with one small-K matmul.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in range(2, int(n**0.5) + 1):
        if n % p == 0:
            return False
    return True


def _quadratic_residues(q: int) -> np.ndarray:
    r = np.zeros(q, bool)
    for i in range(1, q):
        r[(i * i) % q] = True
    return r


def _jacobsthal(q: int) -> np.ndarray:
    """Q[i, j] = chi(i - j) for GF(q), chi the quadratic character."""
    res = _quadratic_residues(q)
    idx = np.arange(q)
    diff = (idx[:, None] - idx[None, :]) % q
    chi = np.where(res[diff], 1, -1)
    chi[diff == 0] = 0
    return chi


def paley1(q: int) -> np.ndarray:
    """Paley I Hadamard of order q+1 (q prime, q = 3 mod 4)."""
    assert _is_prime(q) and q % 4 == 3
    n = q + 1
    qm = _jacobsthal(q)
    # H = I + C with C the skew conference matrix [[0, 1], [-1, Q]]
    h = np.ones((n, n), np.int8)
    h[1:, 1:] = qm + np.eye(q, dtype=np.int8)
    h[1:, 0] = -1
    return h.astype(np.float64)


def paley2(q: int) -> np.ndarray:
    """Paley II Hadamard of order 2(q+1) (q prime, q = 1 mod 4)."""
    assert _is_prime(q) and q % 4 == 1
    m = q + 1
    s = np.zeros((m, m), np.int8)
    s[0, 1:] = 1
    s[1:, 0] = 1
    s[1:, 1:] = _jacobsthal(q)
    # block substitution: S entries 0 -> B, ±1 -> ±A
    a = np.array([[1, 1], [1, -1]], np.int8)
    b = np.array([[1, -1], [-1, -1]], np.int8)
    h = np.zeros((2 * m, 2 * m), np.int8)
    for i in range(m):
        for j in range(m):
            blk = b if s[i, j] == 0 else s[i, j] * a
            h[2 * i : 2 * i + 2, 2 * j : 2 * j + 2] = blk
    return h.astype(np.float64)


@functools.lru_cache(maxsize=None)
def hadamard_matrix(k: int, seed: int = 0) -> Tuple[np.ndarray, bool]:
    """Orthogonal (unnormalized ±1 if possible) K x K factor.

    Returns (matrix, is_hadamard). Falls back to random orthogonal * sqrt(K)
    when no construction applies (still orthogonal after /sqrt(K)).
    """
    if k == 1:
        return np.ones((1, 1)), True
    if k & (k - 1) == 0:  # power of two: Sylvester
        h = np.array([[1.0]])
        while h.shape[0] < k:
            h = np.block([[h, h], [h, -h]])
        return h, True
    if k % 4 == 0:
        if _is_prime(k - 1) and (k - 1) % 4 == 3:
            return paley1(k - 1), True
        if _is_prime(k // 2 - 1) and (k // 2 - 1) % 4 == 1:
            return paley2(k // 2 - 1), True
        # doubling: K/2 constructible -> Sylvester-double it
        if k % 2 == 0:
            sub, ok = hadamard_matrix(k // 2, seed)
            if ok:
                return np.block([[sub, sub], [sub, -sub]]), True
    # fallback: scaled random orthogonal (rotation baseline, not Hadamard)
    from flatquant_tpu.core.orth import random_orthogonal

    rng = np.random.default_rng(seed + k)
    return random_orthogonal(k, rng) * np.sqrt(k), False


def get_hadK(n: int, seed: int = 0) -> Tuple[Optional[np.ndarray], int, bool]:
    """Factor n = K * 2^m; returns (K-factor matrix or None if K==1, K,
    is_hadamard). Mirrors hadamard_utils.get_hadK's role."""
    k = n
    while k % 2 == 0:
        k //= 2
    if k == 1:
        return None, 1, True
    # smallest multiple-of-4 factor containing the odd part
    for mult in (4, 8, 16):
        kk = k * mult
        if n % kk == 0:
            mat, is_had = hadamard_matrix(kk, seed)
            return mat, kk, is_had
    raise ValueError(f"cannot factor {n} for a Hadamard transform")


def fwht(x):
    """Fast Walsh-Hadamard transform over the last dim (power of two),
    unnormalized."""
    n = x.shape[-1]
    assert n & (n - 1) == 0
    shape = x.shape
    h = 1
    y = x.reshape(-1, n)
    while h < n:
        y = y.reshape(-1, n // (2 * h), 2, h)
        a = y[:, :, 0, :]
        b = y[:, :, 1, :]
        y = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    return y.reshape(shape)


def matmul_hadU(x, seed: int = 0):
    """x @ H_n / sqrt(n) where H_n = hadK (x) H_{2^m} (normalized rotation).

    The matmul_hadU / matmul_hadU_cuda analog (hadamard_utils.py:89-141):
    one FWHT butterfly over the 2^m sublanes + one small-K matmul.
    """
    n = x.shape[-1]
    mat, k, _ = get_hadK(n)
    shape = x.shape
    xk = x.reshape(-1, k, n // k)
    xk = fwht(xk)
    if mat is not None:
        m = jnp.asarray(mat, x.dtype)
        xk = jnp.einsum("ik,bkj->bij", m.T, xk)
    return (xk / jnp.sqrt(float(n)).astype(x.dtype)).reshape(shape)


def random_hadamard_matrix(n: int, seed: int = 0):
    """Normalized Hadamard composed with a random sign diagonal
    (QuaRot's randomized rotation; hadamard_utils.py:116-123)."""
    rng = np.random.default_rng(seed)
    signs = rng.choice([-1.0, 1.0], size=n)
    eye_signed = jnp.asarray(np.diag(signs), jnp.float32)
    return matmul_hadU(eye_signed, seed=seed)


def apply_had_to_weight(w, seed: int = 0):
    """Fuse the rotation into a weight's in-features: W <- W @ H
    (apply_exact_had_to_linear analog, hadamard_utils.py:148-183).
    Activations then use matmul_hadU(x) online; x H (W H)^T == x W^T... via
    H orthogonal: (xH)(WH)^T = x H H^T W^T = x W^T."""
    return matmul_hadU(w, seed=seed)
