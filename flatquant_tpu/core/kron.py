"""Kronecker-structured transform math.

x @ (L kron R) computed as reshape -> (x @ R) -> (L^T @ x) -> reshape, turning
an O(n^2) dense transform into two O(n*sqrt(n)) small matmuls. Parity target:
flatquant/flat_utils.py:6-17 and the factor solver function_utils.py:11-21.

Both small matmuls land on the MXU; for typical LLM dims the factors are
64x64 .. 128x128, i.e. exactly one MXU tile.
"""

import math

import jax.numpy as jnp


def get_decompose_dim(n: int, rn128: bool = False):
    """Most-square factorization (a-b, a+b) with (a-b)(a+b) = n.

    Examples: 4096 -> (64, 64), 11008 -> (86, 128), 14336 -> (112, 128).

    rn128=True (TPU-native mode): return (n/128, 128) whenever n is a
    multiple of 128, falling back to the balanced split otherwise. A
    128-lane right factor lets the serving engine run the transform
    through the grouped [G, T, 128] pipeline (kernels/grouped_mlp.py) —
    one VREG-aligned lane-group per Kronecker block, no relayout copies.
    Slightly more transform parameters (G^2 + 128^2 vs two balanced
    squares) — same orthogonal-by-construction family, so calibration
    quality is comparable; the decomposition must match between
    calibration and serving (it is baked into the transform shapes).
    """
    if rn128 and n % 128 == 0 and n // 128 >= 2:
        return n // 128, 128
    a = int(math.isqrt(n))
    if a * a < n:
        a += 1
    while True:
        diff = a * a - n
        b = int(math.isqrt(diff))
        if b * b == diff:
            break
        a += 1
    return a - b, a + b


def kronecker_matmul(x, left, right):
    """Compute x @ kron(left, right) for x [..., left_n * right_n].

    Equivalent to reshaping the last dim to [left_n, right_n], applying
    right on the right and left^T on the left.
    """
    init_shape = x.shape
    ln, rn = left.shape[0], right.shape[0]
    xm = x.reshape(-1, ln, rn)
    xm = jnp.matmul(xm, right)
    xm = jnp.matmul(left.T, xm)
    return xm.reshape(init_shape)


def kronecker_matmul_perm(x, left, right):
    """x @ kron(left, right) with output channels in transposed (j*ln+i)
    order: out[..., j*ln+i] = (x @ kron)[..., i*rn+j].

    Both factor contractions run over *minor* dims (one explicit
    transpose), where the standard form's middle-dim batched matmul makes
    XLA insert a layout copy in AND out — the serving fast path
    (serving/quantized.py kron_transform_perm rationale). Consumers must
    permute the downstream weight's input channels to match; weight folds
    that run through this same function stay consistent automatically.
    """
    init_shape = x.shape
    ln, rn = left.shape[0], right.shape[0]
    xm = x.reshape(-1, ln, rn)
    xm = jnp.matmul(xm, right)      # contract rn (minor)
    xm = xm.swapaxes(1, 2)          # the single layout copy
    xm = jnp.matmul(xm, left)       # contract ln (minor): out[t, j, i]
    return xm.reshape(init_shape)


def kron_dense(left, right):
    """Dense kron(left, right) — for tests and for baking tiny transforms."""
    return jnp.kron(left, right)
