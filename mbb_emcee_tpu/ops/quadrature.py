"""Fixed-node Gauss-Legendre quadrature.

Replaces the reference's adaptive scipy.integrate.quad (QUADPACK, called once
PER CHAIN SAMPLE in mbb_results.compute_lir -- SURVEY.md section 3.2) and
np.trapz filter integrals (response.py) with precomputed node/weight arrays:
the integral becomes a weighted contraction that batches over the whole chain
in one device op. Node counts are validated against the adaptive-quad oracle
in tests/test_quadrature_convergence.py (SURVEY.md test plan item 5).
"""

import numpy as np
import jax.numpy as jnp


def gauss_legendre(n, lo, hi):
    """GL nodes/weights on [lo, hi] (host-side, fp64 numpy).

    Returns (nodes, weights) as numpy arrays; callers move them to device
    once at setup.
    """
    x, w = np.polynomial.legendre.leggauss(int(n))
    half = 0.5 * (hi - lo)
    mid = 0.5 * (hi + lo)
    return mid + half * x, half * w


def loglam_nodes(n, lam_lo, lam_hi):
    """GL nodes/weights for integrals of form int g(lam) dlam done in
    u = ln(lam): int g(lam) lam du. Returns (lam_nodes, dlam_weights) so that
    sum(w * g(lam)) approximates int_{lam_lo}^{lam_hi} g(lam) dlam.

    Log-spacing matters: the greybody spans decades in lambda and its
    features (opacity pivot, Wien merge) are geometric.
    """
    u, wu = gauss_legendre(n, np.log(lam_lo), np.log(lam_hi))
    lam = np.exp(u)
    return lam, wu * lam


def contract(weights, values):
    """sum over last axis of weights*values (the quadrature contraction)."""
    return jnp.sum(weights * values, axis=-1)
