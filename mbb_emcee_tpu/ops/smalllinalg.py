"""Unrolled dense linear algebra for TINY static-size SPD systems.

The MAP/Laplace path (mapfit.py) needs (H + lambda I) solves and an
inverse of a <=5x5 Hessian inside a vmapped, jitted program. Routing
those through jnp.linalg means a LAPACK custom-call on CPU and an
awkward general eigendecomposition path on TPU -- heavyweight machinery
for a 5x5 SPD matrix living in registers. These helpers unroll Cholesky
factorization / substitution over the STATIC dimension into plain
elementwise arithmetic: vmap-friendly, fusable, and portable to every
backend with nothing but mul/add/sqrt/div.

All functions take matrices with arbitrary leading batch dimensions and
a static trailing (n, n); `n` must be small (intended n <= 8).
Indefinite inputs are handled by a diagonal clamp inside the
factorization (pivots floored at a tiny positive value), which is
exactly the regularization the damped-Newton/Laplace callers want
instead of NaNs.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(A, floor=1e-30):
    """Lower-triangular L with L L^T = A (SPD), unrolled over the static
    trailing (n, n). Pivots are floored at `floor` * (mean diagonal) so
    an indefinite A yields a finite (regularized) factor, not NaNs."""
    n = A.shape[-1]
    scale = jnp.maximum(
        jnp.mean(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1),
        1e-30)
    rows = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(jnp.maximum(s, floor * scale))
            else:
                rows[i][j] = s / rows[j][j]
    cols = []
    for j in range(n):
        col = [rows[i][j] if i >= j else jnp.zeros_like(A[..., 0, 0])
               for i in range(n)]
        cols.append(jnp.stack(col, axis=-1))
    return jnp.stack(cols, axis=-1)


def solve_tri_lower(L, b):
    """x with L x = b (L lower-triangular), unrolled. b: (..., n)."""
    n = L.shape[-1]
    xs = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * xs[k]
        xs.append(s / L[..., i, i])
    return jnp.stack(xs, axis=-1)


def solve_tri_upper_t(L, y):
    """x with L^T x = y (forward factor from cholesky_small), unrolled."""
    n = L.shape[-1]
    xs = [None] * n
    for i in reversed(range(n)):
        s = y[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * xs[k]
        xs[i] = s / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def spd_solve_small(A, b, floor=1e-30):
    """x with A x = b for tiny SPD A via unrolled Cholesky."""
    L = cholesky_small(A, floor)
    return solve_tri_upper_t(L, solve_tri_lower(L, b))


def spd_inverse_small(A, floor=1e-30):
    """inv(A) for tiny SPD A: Cholesky solves against the identity
    columns, symmetrized."""
    n = A.shape[-1]
    L = cholesky_small(A, floor)
    cols = []
    eye = jnp.eye(n, dtype=A.dtype)
    for j in range(n):
        e = jnp.broadcast_to(eye[j], A.shape[:-2] + (n,))
        cols.append(solve_tri_upper_t(L, solve_tri_lower(L, e)))
    inv = jnp.stack(cols, axis=-1)
    return 0.5 * (inv + jnp.swapaxes(inv, -1, -2))
