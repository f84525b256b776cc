"""Quadrature-convergence tests (SURVEY.md section 4, rebuild item 5).

The reference integrates adaptively per chain sample (scipy QUADPACK for
L_IR, native-grid trapz for filter responses); the rebuild uses FIXED
nodes chosen at setup. These tests pin the node counts: the fixed rules
must match the adaptive/fine references to well under the posterior's own
Monte-Carlo error over the whole parameter prior box, including its
corners (cold T with steep Wien sides, extreme beta/alpha).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.integrate as si

from mbb_emcee_tpu.models.modified_blackbody import (
    MBBShape, log_mbb_fnu, mbb_fnu)
from mbb_emcee_tpu.ops.quadrature import loglam_nodes, gauss_legendre
from mbb_emcee_tpu.constants import C_UM_HZ
from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle

# Spread over the plausible prior box, including awkward corners.
THETAS = [
    (35.0, 1.9, 250.0, 3.5, 40.0),
    (12.0, 0.6, 80.0, 2.2, 5.0),      # cold, shallow beta
    (60.0, 2.8, 600.0, 6.0, 200.0),   # hot, steep beta, steep alpha
    (20.0, 1.2, 2000.0, 3.0, 30.0),   # very optically thick
    (45.0, 2.2, 150.0, 2.05, 80.0),   # alpha near merge-bracket floor
]


def _lir_fixed(theta, opthin, z, nnodes):
    """The results-layer L_IR integrand with a configurable node count
    (mirrors MBBResults.compute_lir's device part)."""
    shape = MBBShape(opthin=opthin)
    opz = 1.0 + z
    lam, w = loglam_nodes(nnodes, 8.0 * opz, 1000.0 * opz)
    f = np.asarray(
        jnp.exp(log_mbb_fnu(jnp.asarray(theta, jnp.float32),
                            jnp.asarray(lam, jnp.float32), shape)),
        np.float64)
    return float(np.sum(w / lam ** 2 * f))


def _lir_adaptive(theta, opthin, z):
    o = ModifiedBlackbodyOracle(*theta, opthin=opthin)
    opz = 1.0 + z
    val, err = si.quad(lambda lam: o(np.array([lam]))[0] / lam ** 2,
                       8.0 * opz, 1000.0 * opz, limit=400)
    return val


@pytest.mark.parametrize("opthin", [False, True])
def test_lir_128_nodes_converged_over_prior_box(opthin):
    """128 GL nodes in ln-lambda reproduce adaptive QUADPACK to <=0.1%
    for every corner theta (the documented accuracy budget; posterior CI
    parity is 1%)."""
    for theta in THETAS:
        for z in (0.5, 2.2):
            got = _lir_fixed(theta, opthin, z, 128)
            want = _lir_adaptive(theta, opthin, z)
            assert abs(got - want) / want < 1e-3, (theta, z)


def test_lir_node_count_is_not_marginal():
    """Half the nodes must ALSO converge -- i.e. 128 sits safely inside
    the converged regime, not at its edge."""
    for theta in THETAS:
        a = _lir_fixed(theta, False, 2.2, 64)
        b = _lir_fixed(theta, False, 2.2, 128)
        assert abs(a - b) / b < 1e-3, theta


def test_band_quadrature_matches_fine_trapz():
    """Analytic box/gauss filters compiled to GL nodes match a 20x-finer
    trapz of R*S to <=0.1% for every corner theta."""
    from mbb_emcee_tpu.response import Response

    shape = MBBShape()
    specs = [("box", "box:250:80"), ("gauss", "gauss:350:100")]
    for _, spec in specs:
        r = Response.from_spec("t", spec)
        for theta in THETAS:
            th = jnp.asarray(theta, jnp.float32)
            got = float(np.sum(
                r.weights * np.asarray(mbb_fnu(th, jnp.asarray(
                    r.wave, jnp.float32), shape), np.float64)))

            # fine trapezoid reference on a dense grid in fp64
            o = ModifiedBlackbodyOracle(*theta)
            lo, hi = r.wave.min(), r.wave.max()
            lam = np.linspace(lo, hi, 4001)
            if spec.startswith("box"):
                trans = np.ones_like(lam)
            else:
                c, fwhm = 350.0, 100.0
                sig = fwhm / 2.3548200450309493
                trans = np.exp(-0.5 * ((lam - c) / sig) ** 2)
            base = trans / lam ** 2
            numer = np.trapezoid(base * o(lam), lam)
            # same reference-spectrum convention as Response (nu S_nu const)
            sref = (r.effective_wavelength / lam) ** r.refspec_index
            denom = np.trapezoid(base * sref, lam)
            want = numer / denom
            assert abs(got - want) / abs(want) < 1e-3, (spec, theta)
