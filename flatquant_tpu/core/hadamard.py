"""Hadamard transforms (QuaRot/Hadamard rotation baseline).

Parity target: flatquant/hadamard_utils.py — but instead of ~8k lines of
hardcoded matrices, non-power-of-2 Hadamard factors are *constructed*:
  - Sylvester doubling for powers of two,
  - Paley I  (order q+1,    q prime power = 3 mod 4): 12, 20, 28(27), 44,
    60, 108, 140, ...
  - Paley II (order 2(q+1), q prime power = 1 mod 4): 36, 52(25), 76, ...
Orders with no classical construction — 156 (Williamson 39) and 172
(Williamson 43, Baumert-Hall-Golomb 1962; Llama-2-7B's 11008 = 172*64) —
are search-discovered published tables with no generating formula; they
ship as verified bit-packed data (had_tables.npz, ~4 KB, see
tools/import_had_tables.py) rather than 8k lines of source.
get_hadK factors n = K * 2^m like the reference (hadamard_utils.py:5-55);
a size whose odd part still has no factor falls back to a seeded random
orthogonal factor, flagged via `is_hadamard=False`.

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


def _prime_power(n: int):
    """(p, m) with n == p**m, or None."""
    if n < 2:
        return None
    for p in range(2, int(n**0.5) + 1):
        if n % p == 0:
            m = 0
            v = n
            while v % p == 0:
                v //= p
                m += 1
            return (p, m) if v == 1 and _is_prime(p) else None
    return (n, 1)  # n itself prime


@functools.lru_cache(maxsize=None)
def _gf_ops(q: int):
    """GF(q) subtraction table [q, q] and nonzero-square set [q] (bool).

    Elements are encoded as integers whose base-p digits are the
    coefficients of polynomials over GF(p), reduced modulo a
    brute-force-found irreducible monic polynomial of degree m."""
    p, m = _prime_power(q)
    if m == 1:
        idx = np.arange(q)
        sub = (idx[:, None] - idx[None, :]) % q
        sq = np.zeros(q, bool)
        sq[(idx[1:] ** 2) % q] = True
        return sub, sq

    def digits(x):
        out = []
        for _ in range(m):
            out.append(x % p)
            x //= p
        return out

    def undigits(ds):
        v = 0
        for d in reversed(ds):
            v = v * p + d
        return v

    def poly_mul_mod(a, b, irred):
        # multiply coefficient lists, reduce mod irred (monic, degree m)
        prod = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                prod[i + j] = (prod[i + j] + ai * bj) % p
        for i in range(len(prod) - 1, m - 1, -1):
            c = prod[i]
            if c:
                for j in range(m + 1):
                    prod[i - m + j] = (prod[i - m + j] - c * irred[j]) % p
        return prod[:m]

    # find an irreducible monic polynomial of degree m over GF(p):
    # no roots is sufficient only for m <= 3; use trial division by all
    # monic polys of degree <= m//2 (m is tiny here: 2 or 3)
    def poly_mod(a, b):
        a = list(a)
        db, da = len(b) - 1, len(a) - 1
        inv_lead = pow(b[-1], p - 2, p)
        while len(a) - 1 >= db and any(a):
            shift = len(a) - 1 - db
            c = (a[-1] * inv_lead) % p
            for j in range(db + 1):
                a[shift + j] = (a[shift + j] - c * b[j]) % p
            while len(a) > 1 and a[-1] == 0:
                a.pop()
        return a

    def is_irreducible(f):
        for deg in range(1, m // 2 + 1):
            for t in range(p**deg):
                g = digits(t)[:deg] + [1]
                r = poly_mod(f, g)
                if len(r) == 1 and r[0] == 0:
                    return False
        return True

    irred = None
    for t in range(p**m):
        cand = digits(t) + [1]  # monic degree-m
        if is_irreducible(cand):
            irred = cand
            break
    assert irred is not None

    elems = [digits(x) for x in range(q)]
    sub = np.zeros((q, q), np.int64)
    for i in range(q):
        for j in range(q):
            sub[i, j] = undigits([(a - b) % p for a, b in zip(elems[i], elems[j])])
    sq = np.zeros(q, bool)
    for x in range(1, q):
        sq[undigits(poly_mul_mod(elems[x], elems[x], irred))] = True
    return sub, sq


def _jacobsthal(q: int) -> np.ndarray:
    """Q[i, j] = chi(e_i - e_j) over GF(q), chi the quadratic character.

    Works for any prime power q (the reference hardcodes the resulting
    matrices; here they are generated from the field)."""
    sub, sq = _gf_ops(q)
    chi = np.where(sq[sub], 1, -1)
    chi[sub == 0] = 0
    return chi.astype(np.int8)


def paley1(q: int) -> np.ndarray:
    """Paley I Hadamard of order q+1 (q prime power, q = 3 mod 4)."""
    assert _prime_power(q) is not None and q % 4 == 3
    n = q + 1
    qm = _jacobsthal(q)
    # H = I + C with C the skew conference matrix [[0, 1], [-1, Q]]
    h = np.ones((n, n), np.int8)
    h[1:, 1:] = qm + np.eye(q, dtype=np.int8)
    h[1:, 0] = -1
    return h.astype(np.float64)


def paley2(q: int) -> np.ndarray:
    """Paley II Hadamard of order 2(q+1) (q prime power, q = 1 mod 4)."""
    assert _prime_power(q) is not None and q % 4 == 1
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


def _load_had_table(k: int) -> Optional[np.ndarray]:
    """Published Hadamard matrices with no classical prime-power
    construction (orders 156, 172 — Baumert-Hall/Williamson-type results
    from N.J.A. Sloane's Hadamard library, as also embedded by the
    reference's hadamard_utils.py get_had156/get_had172). Stored bit-packed
    in had_tables.npz (tools/import_had_tables.py verifies H.H^T == n.I
    before writing)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "had_tables.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        key = f"h{k}"
        if key not in z:
            return None
        bits = np.unpackbits(z[key])[: k * k].reshape(k, k)
    return (bits.astype(np.float64) * 2.0 - 1.0)


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
        tab = _load_had_table(k)
        if tab is not None:
            return tab, True
        if _prime_power(k - 1) and (k - 1) % 4 == 3:
            return paley1(k - 1), True
        if _prime_power(k // 2 - 1) and (k // 2 - 1) % 4 == 1:
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
