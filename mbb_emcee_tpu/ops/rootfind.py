"""Fixed-iteration, branchless 1-D root finding and maximization.

The reference calls scipy.optimize.brentq inside EVERY lnprob evaluation
(ref: mbb_emcee modified_blackbody.__init__ alpha-merge solve, SURVEY.md
section 3.5) and scipy bounded minimization per chain sample for the SED peak
(mbb_results.compute_peaklambda). Neither batches. These replacements use a
fixed iteration count so they are shape-static, always converge on a bracketing
interval, and vmap over (walkers x steps) or (chain samples) for free.
"""

import jax
import jax.numpy as jnp

_INVPHI = 0.6180339887498949   # 1/phi
_INVPHI2 = 0.3819660112501051  # 1/phi^2


def bisect_decreasing(f, lo, hi, iters=48):
    """Root of a monotonically DECREASING scalar function on [lo, hi].

    Requires f(lo) > 0 > f(hi). Fixed `iters` bisection steps; with
    iters=48 the bracket shrinks by 2^-48, far below fp32 resolution.
    `f` must be jax-traceable; lo/hi may be python floats or arrays
    broadcastable against f's operand.
    """
    lo = jnp.asarray(lo, dtype=jnp.result_type(float))
    hi = jnp.asarray(hi, dtype=lo.dtype)

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        pos = f(m) > 0.0
        return (jnp.where(pos, m, a), jnp.where(pos, b, m))

    # First step unrolled: under shard_map, f's output typically varies over
    # the mesh while the scalar bracket does not; routing the bracket through
    # one `where` on f's sign gives the loop carry a stable (varying) type.
    a, b = body(0, (lo, hi))
    a, b = jax.lax.fori_loop(0, iters - 1, body, (a, b))
    return 0.5 * (a + b)


def bisect_newton_decreasing(g_and_gp, lo, hi, bisect_iters=10,
                             newton_iters=3):
    """Root of a strictly DECREASING g on [lo, hi] (g(lo) > 0 > g(hi)) via
    fixed bisection to localize, then bracket-clamped Newton to polish.

    g_and_gp(u) -> (g(u), g'(u)), jax-traceable, g' < 0 on the bracket.
    Unrolled python loops, so the same code runs under jit, vmap, shard_map
    AND inside Pallas kernels. Equivalent accuracy to ~30 pure bisection
    steps at roughly half the evaluations: 10 bisections shrink the bracket
    2^-10, then each clamped Newton step squares the error (the clamp makes
    divergence impossible -- the root stays inside [a, b] by monotonicity).
    """
    lo = jnp.asarray(lo, dtype=jnp.result_type(float))
    hi = jnp.asarray(hi, dtype=lo.dtype)
    m = 0.5 * (lo + hi)
    gm, _ = g_and_gp(m)
    pos = gm > 0.0
    a = jnp.where(pos, m, lo)        # also lifts a/b to g's batched shape
    b = jnp.where(pos, hi, m)
    for _ in range(bisect_iters - 1):
        m = 0.5 * (a + b)
        gm, _ = g_and_gp(m)
        pos = gm > 0.0
        a = jnp.where(pos, m, a)
        b = jnp.where(pos, b, m)
    u = 0.5 * (a + b)
    for _ in range(newton_iters):
        gu, gpu = g_and_gp(u)
        u = jnp.clip(u - gu / jnp.minimum(gpu, -1e-10), a, b)
    return u


def golden_max(f, lo, hi, iters=64):
    """Argmax of a unimodal scalar function on [lo, hi] by golden-section.

    Fixed iteration count -> shape-static and vmappable. iters=64 shrinks
    the interval by 0.618^64 ~ 4e-14 of its width (fp32-saturating).
    Returns (x_max, f(x_max)).
    """
    lo = jnp.asarray(lo, dtype=jnp.result_type(float))
    hi = jnp.asarray(hi, dtype=lo.dtype)
    x1 = lo + _INVPHI2 * (hi - lo)
    x2 = lo + _INVPHI * (hi - lo)
    f1_0, f2_0 = f(x1), f(x2)
    # Lift the scalar carry components to f's varying-axes type so the
    # fori_loop carry is type-stable under shard_map (see bisect note).
    all_true = f1_0 == f1_0
    lo, hi, x1, x2 = (jnp.where(all_true, v, v) for v in (lo, hi, x1, x2))

    def body(_, state):
        a, b, x1, x2, f1, f2 = state
        # If f1 >= f2 the max is in [a, x2]; else in [x1, b].
        left = f1 >= f2
        a_n = jnp.where(left, a, x1)
        b_n = jnp.where(left, x2, b)
        x1_n = jnp.where(left, a_n + _INVPHI2 * (b_n - a_n), x2)
        x2_n = jnp.where(left, x1, a_n + _INVPHI * (b_n - a_n))
        # One new evaluation per iteration: the other interior value carries.
        x_new = jnp.where(left, x1_n, x2_n)
        f_new = f(x_new)
        f1_n = jnp.where(left, f_new, f2)
        f2_n = jnp.where(left, f1, f_new)
        return (a_n, b_n, x1_n, x2_n, f1_n, f2_n)

    state = (lo, hi, x1, x2, f1_0, f2_0)
    a, b, x1, x2, f1, f2 = jax.lax.fori_loop(0, iters, body, state)
    xm = 0.5 * (a + b)
    return xm, f(xm)
