"""Learnable invertible transforms (the "flat" in FlatQuant).

Parity target: flatquant/trans_utils.py (SVD- and direct-inverse-
parameterized Single/Decompose transform matrices) re-designed as JAX
pytrees + pure functions:

  - a *factor* is one learnable square matrix. SVD style stores
    (u_raw, v_raw, d) with U = cayley(u_raw), V = cayley(v_raw) so the
    effective matrix is P = U diag(d) V^T and the inverse-transpose is the
    closed form P^{-T} = U diag(1/d) V^T (trans_utils.py:27-37). Direct
    style stores P raw and computes P^{-T} by fp32 solve + one Newton
    refinement step (replacing the reference's fp64 `.inverse()`,
    function_utils.py:35-37).
  - SingleTransform: one dense n x n factor (head_dim / num_heads
    transforms).
  - DecomposeTransform: Kronecker pair left (x) right, optionally composed
    with a learnable per-channel diag_scale applied *before* the Kronecker
    product (trans_utils.py:78-103).
  - bake_*() freezes trained factors into fixed matrices for eval/serving
    (to_eval_mode analog, trans_utils.py:105-116).

All master parameters are float32; applications cast the matrix to the
activation dtype (bf16 under mixed-precision calibration).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

import jax.numpy as jnp
from flax import struct

from flatquant_tpu.core.kron import get_decompose_dim, kronecker_matmul
from flatquant_tpu.core.orth import cayley, random_cayley_param, random_orthogonal


# ---------------------------------------------------------------------------
# factors
# ---------------------------------------------------------------------------


@struct.dataclass
class SVDFactor:
    """P = cayley(u) @ diag(d) @ cayley(v)^T; closed-form inverse-transpose."""

    u: jnp.ndarray  # raw cayley param [n, n]
    v: jnp.ndarray  # raw cayley param [n, n]
    d: jnp.ndarray  # diagonal [n]

    @property
    def size(self) -> int:
        return self.d.shape[0]


@struct.dataclass
class InvFactor:
    """P stored raw; inverse computed numerically (direct_inv mode)."""

    m: jnp.ndarray  # [n, n]

    @property
    def size(self) -> int:
        return self.m.shape[0]


Factor = Union[SVDFactor, InvFactor]


def _newton_inv(m):
    """fp32 inverse with one Newton refinement step: X <- X(2I - MX)."""
    m = m.astype(jnp.float32)
    x = jnp.linalg.inv(m)
    eye2 = 2.0 * jnp.eye(m.shape[0], dtype=jnp.float32)
    return x @ (eye2 - m @ x)


def factor_matrix(f: Factor, inv_t: bool = False):
    """Effective fp32 matrix of a factor (or its inverse-transpose)."""
    if isinstance(f, SVDFactor):
        u = cayley(f.u)
        v = cayley(f.v)
        d = 1.0 / f.d if inv_t else f.d
        return (u * d[None, :]) @ v.T
    if isinstance(f, InvFactor):
        return _newton_inv(f.m).T if inv_t else f.m.astype(jnp.float32)
    raise TypeError(f"unknown factor {type(f)}")


def init_svd_factor(size: int, rng: np.random.Generator) -> SVDFactor:
    return SVDFactor(
        u=jnp.asarray(random_cayley_param(size, rng)),
        v=jnp.asarray(random_cayley_param(size, rng)),
        d=jnp.ones((size,), jnp.float32),
    )


def init_inv_factor(size: int, rng: np.random.Generator) -> InvFactor:
    return InvFactor(m=jnp.asarray(random_orthogonal(size, rng), jnp.float32))


# ---------------------------------------------------------------------------
# single transform (dense n x n)
# ---------------------------------------------------------------------------


@struct.dataclass
class SingleTransform:
    factor: Factor

    @property
    def size(self) -> int:
        return self.factor.size


@struct.dataclass
class BakedSingle:
    matrix: jnp.ndarray
    matrix_inv_t: jnp.ndarray

    @property
    def size(self) -> int:
        return self.matrix.shape[0]


AnySingle = Union[SingleTransform, BakedSingle]


def single_matrix(t: AnySingle, inv_t: bool = False):
    if isinstance(t, BakedSingle):
        return t.matrix_inv_t if inv_t else t.matrix
    return factor_matrix(t.factor, inv_t)


def apply_single(t: AnySingle, x, inv_t: bool = False):
    """x @ P over the last dim (reshape-safe for any leading dims)."""
    mat = single_matrix(t, inv_t).astype(x.dtype)
    shape = x.shape
    return (x.reshape(-1, mat.shape[0]) @ mat).reshape(shape)


def bake_single(t: AnySingle) -> BakedSingle:
    if isinstance(t, BakedSingle):
        return t
    return BakedSingle(
        matrix=single_matrix(t, False),
        matrix_inv_t=single_matrix(t, True),
    )


def init_single(size: int, rng: np.random.Generator, direct_inv: bool = False) -> SingleTransform:
    f = init_inv_factor(size, rng) if direct_inv else init_svd_factor(size, rng)
    return SingleTransform(factor=f)


# ---------------------------------------------------------------------------
# decomposed (Kronecker) transform
# ---------------------------------------------------------------------------


@struct.dataclass
class DecomposeTransform:
    left: Factor
    right: Factor
    diag_scale: Optional[jnp.ndarray]  # [left_n * right_n] or None

    @property
    def size(self) -> int:
        return self.left.size * self.right.size


@struct.dataclass
class BakedDecompose:
    left: jnp.ndarray
    right: jnp.ndarray
    left_inv: jnp.ndarray  # left^{-T}
    right_inv: jnp.ndarray  # right^{-T}
    diag_scale: Optional[jnp.ndarray]  # None once folded into the preceding norm
    # serving layout: emit transposed (j*ln+i) channel order via the
    # one-copy kron form. Static metadata — apply_decompose branches on it,
    # and because weight folds run through the same apply_decompose, the
    # activation channels and folded weight columns permute consistently
    # with NO call-site changes (kron.kronecker_matmul_perm rationale).
    perm: bool = struct.field(pytree_node=False, default=False)

    @property
    def size(self) -> int:
        return self.left.shape[0] * self.right.shape[0]


AnyDecompose = Union[DecomposeTransform, BakedDecompose]


def decompose_matrices(t: AnyDecompose, inv_t: bool = False):
    if isinstance(t, BakedDecompose):
        return (t.left_inv, t.right_inv) if inv_t else (t.left, t.right)
    return factor_matrix(t.left, inv_t), factor_matrix(t.right, inv_t)


def apply_decompose(t: AnyDecompose, x, inv_t: bool = False, use_diag: bool = True):
    """x * diag_scale (or / for inv_t) then x @ kron(left, right).

    When t.size divides x's last dim (shard-aligned transforms), the kron
    applies block-diagonally via the reshape and the diag tiles across
    blocks."""
    if t.diag_scale is not None and use_diag:
        d = t.diag_scale.astype(x.dtype)
        if d.shape[0] != x.shape[-1]:
            assert x.shape[-1] % d.shape[0] == 0
            d = jnp.tile(d, x.shape[-1] // d.shape[0])
        x = x / d if inv_t else x * d
    left, right = decompose_matrices(t, inv_t)
    if getattr(t, "perm", False):
        from flatquant_tpu.core.kron import kronecker_matmul_perm

        return kronecker_matmul_perm(
            x, left.astype(x.dtype), right.astype(x.dtype))
    return kronecker_matmul(x, left.astype(x.dtype), right.astype(x.dtype))


def bake_decompose(t: AnyDecompose, perm: bool = False) -> BakedDecompose:
    if isinstance(t, BakedDecompose):
        return t if t.perm == perm else t.replace(perm=perm)
    left, right = decompose_matrices(t, False)
    left_inv, right_inv = decompose_matrices(t, True)
    return BakedDecompose(
        perm=perm,
        left=left,
        right=right,
        left_inv=left_inv,
        right_inv=right_inv,
        diag_scale=t.diag_scale,
    )


def init_decompose(
    size: int,
    rng: np.random.Generator,
    add_diag: bool = False,
    direct_inv: bool = False,
    diag_init: Optional[np.ndarray] = None,
    rn128: bool = False,
) -> DecomposeTransform:
    ln, rn = get_decompose_dim(size, rn128=rn128)
    mk = init_inv_factor if direct_inv else init_svd_factor
    diag = None
    if add_diag:
        if diag_init is None:
            diag = jnp.ones((size,), jnp.float32)
        else:
            diag = jnp.asarray(diag_init, jnp.float32)
    return DecomposeTransform(left=mk(ln, rng), right=mk(rn, rng), diag_scale=diag)
