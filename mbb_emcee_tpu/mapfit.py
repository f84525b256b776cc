"""Batched MAP + Laplace quick fits: survey triage before MCMC.

ADDITIVE capability, not in the reference: upstream mbb_emcee's only
answer to "what are the parameters of these 100k sources, roughly?" is
a full emcee run per source. Here the posterior is a differentiable JAX
function, so a MAP fit is a few hundred gradient steps and the Laplace
approximation (inverse Hessian at the mode) gives error bars -- for a
whole catalog in ONE device program: `MultiFitter.run_map()` fits S
sources x nstarts multi-starts in parallel, each a fixed-iteration
optimizer, and typical survey batches finish in seconds. The workflow is
triage: MAP-fit everything, then spend MCMC time on the sources whose
Laplace fit is suspect (non-interior mode, poor conditioning) or
interesting.

TPU-native optimizer design: no line searches or convergence branches
(data-dependent control flow compiles poorly and runs ragged across a
batch). Instead:

1. an Adam approach phase (fixed step count) from each start, robust far
   from the mode;
2. a damped-Newton polish with a PARALLEL DAMPING LADDER: each iteration
   solves (H + lambda_k I) d_k = -g for a fixed ladder of lambdas,
   evaluates the objective at every candidate (the dimension is <= 5 --
   a Hessian solve is trivia next to one model eval), and keeps the best
   of {current, candidates}. Monotone by construction, quadratic near
   the mode, branchless, fixed shape.

Optimization runs in the logit-unconstrained space of the prior box (the
same transform hmc.py samples in) so hard bounds can never be violated;
the MAP point and its Laplace covariance are reported in the ORIGINAL
parameter space (covariance from the x-space Hessian at the mode,
eigenvalue-floored, so error bars mean what users expect).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mbb_emcee_tpu.ops.smalllinalg import spd_solve_small

# Damping ladder for the Newton polish (relative to the mean Hessian
# diagonal): from near-undamped Newton to a conservative, almost
# gradient-descent step.
_LAMBDAS = (1e-4, 1e-2, 1.0)


def _to_unconstrained(x, lower, width):
    frac = jnp.clip((x - lower) / width, 1e-6, 1.0 - 1e-6)
    return jnp.log(frac) - jnp.log1p(-frac)


def _to_box(u, lower, width):
    return lower + width * jax.nn.sigmoid(u)


@dataclasses.dataclass
class MAPResult:
    """One source's MAP fit (free-parameter space unless noted)."""
    x: np.ndarray            # (nfree,) MAP point
    lnprob: float            # posterior log-density at the mode
    cov: np.ndarray          # (nfree, nfree) Laplace covariance
    sigma: np.ndarray        # (nfree,) sqrt(diag(cov))
    interior: bool           # mode safely inside the box (Laplace valid)
    grad_norm: float         # |grad lnprob| at the mode (x-space)


def map_core(lnprob, lower, width, u0, n_adam, n_newton, adam_lr):
    """Traceable optimizer body: u0 (nstarts, nfree) -> best start's
    (u_map, lnp). `lnprob` is a scalar function of one x-space vector;
    vmapped over starts internally (and over sources by the callers)."""
    nstarts, nfree = u0.shape

    def neg(u):
        return -lnprob(_to_box(u, lower, width))

    vg = jax.vmap(jax.value_and_grad(neg))

    # -- Adam approach phase (fixed iterations, decayed lr) ------------------
    def adam_step(i, carry):
        u, m, v = carry
        f, g = vg(u)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        t = i.astype(u.dtype) + 1.0
        mhat = m / (1.0 - 0.9 ** t)
        vhat = v / (1.0 - 0.999 ** t)
        lr = adam_lr / (1.0 + 0.01 * i.astype(u.dtype))
        return (u - lr * mhat / (jnp.sqrt(vhat) + 1e-8), m, v)

    u, _, _ = jax.lax.fori_loop(
        0, n_adam, adam_step, (u0, jnp.zeros_like(u0), jnp.zeros_like(u0)))

    # -- damped-Newton polish with a parallel damping ladder ------------------
    hess = jax.vmap(jax.hessian(neg))
    f_of = jax.vmap(neg)

    def newton_step(_, u):
        f0, g = vg(u)
        H = hess(u)
        scale = jnp.maximum(
            jnp.mean(jnp.abs(jnp.diagonal(H, axis1=1, axis2=2)), axis=1),
            1e-8)[:, None, None]
        eye = jnp.eye(nfree, dtype=u.dtype)
        best_u, best_f = u, f0
        for lam in _LAMBDAS:
            # unrolled small-SPD Cholesky solve (ops/smalllinalg): no
            # LAPACK custom call inside the vmapped program, and the
            # pivot floor regularizes indefinite Hessians for free
            d = -spd_solve_small(H + lam * scale * eye, g)
            d = jnp.where(jnp.all(jnp.isfinite(d), axis=1, keepdims=True),
                          d, -g / (lam * scale[:, :, 0] + 1.0))
            cand = u + d
            fc = f_of(cand)
            better = (fc < best_f) & jnp.isfinite(fc)
            best_u = jnp.where(better[:, None], cand, best_u)
            best_f = jnp.where(better, fc, best_f)
        return best_u

    u = jax.lax.fori_loop(0, n_newton, newton_step, u)
    f, _ = vg(u)
    k = jnp.argmin(f)
    return u[k], -f[k]


def neg_hessian(lnprob, x_map):
    """-hessian(lnprob) at the mode, symmetrized. Traceable; the tiny
    (nfree, nfree) result goes to HOST fp64 for the Laplace inversion
    (laplace_cov_host) -- a truly degenerate mode (e.g. the
    exactly-determined 5-param/5-band fit with its T-lambda0 ridge) has
    condition numbers ~1e10+ that fp32 device inversion turns to NaN."""
    H = -jax.hessian(lnprob)(x_map)
    return 0.5 * (H + jnp.swapaxes(H, -1, -2))


def laplace_cov_host(H, floor=1e-10):
    """fp64 host Laplace covariance from -hessian values (any leading
    batch dims): eigendecompose, floor eigenvalues at floor * max|w| (a
    degenerate/boundary mode gets a HUGE but finite variance along its
    flat direction, which is the honest answer), invert.

    Returns (cov, ok): a source whose fp32 device Hessian came back
    non-finite (saturated model at an extreme in-box corner) gets
    ok=False and an identity covariance -- one pathological source must
    not abort the triage of a whole catalog, and the caller flags it
    untrustworthy."""
    H = np.asarray(H, np.float64)
    ok = np.all(np.isfinite(H), axis=(-2, -1))
    n = H.shape[-1]
    H = np.where(ok[..., None, None], H, np.eye(n))
    w, V = np.linalg.eigh(H)
    scale = np.maximum(np.abs(w).max(axis=-1, keepdims=True), 1e-300)
    w = np.maximum(w, floor * scale)
    return np.einsum("...ij,...j,...kj->...ik", V, 1.0 / w, V), ok


def interior_mask(x, sigma, lower, upper, k=2.0):
    """Per-point flag: mode at least k Laplace-sigmas inside every bound,
    i.e. the Gaussian approximation puts negligible mass outside the box
    (a width-relative margin is useless here: the default fnorm box is
    1e7 wide while its posterior is O(1))."""
    return jnp.all((x - lower > k * sigma) & (upper - x > k * sigma),
                   axis=-1)
