"""Numerically stable special functions for log-space greybody evaluation.

fp32-safe over the whole sampling prior box: the Wien side of the Planck term
reaches x = h c / (lambda k T) ~ O(10^3) where e^x overflows, and the
optically-thin tail reaches tau ~ O(10^-30) where 1 - e^-tau underflows.
Everything here is branchless (jnp.where with both branches finite) so it
vmaps and fuses cleanly.
"""

import jax.numpy as jnp

# exp(x) for x > ~88 overflows fp32; cut well below that so the discarded
# where-branch stays finite.
_EXP_CUT = 25.0


def log_expm1(x):
    """log(e^x - 1) for x > 0, stable for both tiny and huge x.

    Small x: log(expm1(x)) is exact; large x: log(e^x - 1) -> x.
    """
    xs = jnp.minimum(x, _EXP_CUT)
    return jnp.where(x < _EXP_CUT, jnp.log(jnp.expm1(xs)), x)


def log1mexp(x):
    """log(1 - e^{-x}) for x > 0.

    -expm1(-x) is accurate for all x > 0; underflowed x (exactly 0) is
    clamped so the result is a large-negative finite number instead of -inf
    (the caller exponentiates differences of these).
    """
    xc = jnp.maximum(x, 1e-35)
    return jnp.log(-jnp.expm1(-xc))


def xoexpm1x(x):
    """x / (e^x - 1), stable: -> 1 as x -> 0, -> 0 as x -> inf."""
    xc = jnp.clip(x, 1e-30, _EXP_CUT)
    val = xc / jnp.expm1(xc)
    return jnp.where(x > _EXP_CUT, 0.0, val)
