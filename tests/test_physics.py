"""Analytic golden tests for the modified-blackbody core (SURVEY.md test
plan item 1) plus fp32-vs-fp64-oracle parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.models.modified_blackbody import (
    mbb_fnu, log_mbb_fnu, MBBShape, ModifiedBlackbody)
from mbb_emcee_tpu.constants import HCOK_UM_K
from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle

THETA = np.array([35.0, 1.8, 350.0, 3.0, 40.0], dtype=np.float32)


def test_normalization():
    """S(wavenorm) = fnorm exactly, for all shape variants."""
    for opthin in (False, True):
        for noalpha in (False, True):
            shape = MBBShape(opthin=opthin, noalpha=noalpha, wavenorm=500.0)
            f = mbb_fnu(jnp.array(THETA), jnp.array([500.0]), shape)
            np.testing.assert_allclose(np.asarray(f), [THETA[4]], rtol=1e-4)


def test_rayleigh_jeans_slope():
    """Long-wavelength (x << 1, tau << 1) slope: f propto lambda^-(2+beta)."""
    theta = jnp.array([30.0, 2.0, 100.0, 4.0, 50.0])
    shape = MBBShape()
    lam = jnp.array([2.0e5, 4.0e5])  # x ~ 2e-3: deep RJ, tau ~ 1e-7
    f = mbb_fnu(theta, lam, shape)
    slope = (jnp.log(f[1]) - jnp.log(f[0])) / (np.log(4e5) - np.log(2e5))
    np.testing.assert_allclose(float(slope), -(2.0 + 2.0), atol=5e-3)


def test_opthin_matches_thick_when_transparent():
    """lambda0 << lambda: thick model converges to thin (tau -> 0)."""
    t_thick = jnp.array([35.0, 1.8, 1.0, 3.0, 40.0])  # lambda0 = 1 um
    t_thin = t_thick
    lam = jnp.array([100.0, 250.0, 500.0, 1000.0])
    f_thick = mbb_fnu(t_thick, lam, MBBShape(opthin=False, noalpha=True))
    f_thin = mbb_fnu(t_thin, lam, MBBShape(opthin=True, noalpha=True))
    # Residual difference is the genuine (1 - e^-tau)/tau ~ 1 - tau/2
    # correction, ~1e-4 at lambda = 100 um here.
    np.testing.assert_allclose(np.asarray(f_thick), np.asarray(f_thin),
                               rtol=5e-4)


def test_merge_continuity():
    """Value continuity at x_merge to fp32 precision; slope matches -alpha
    on the power-law side."""
    mbb = ModifiedBlackbody(*THETA)
    xm = mbb.merge_x()
    assert xm is not None and 1.0 < xm < 100.0
    lam_m = HCOK_UM_K / (xm * THETA[0])
    eps = 1e-3
    f = np.asarray(mbb(np.array([lam_m * (1 + eps), lam_m * (1 - eps)])))
    np.testing.assert_allclose(f[0], f[1], rtol=2e-2)
    # Blueward power law: f propto lambda^alpha (since f propto x^-alpha).
    lam_blue = np.array([lam_m / 8.0, lam_m / 4.0])
    fb = np.asarray(mbb(lam_blue))
    slope = (np.log(fb[1]) - np.log(fb[0])) / np.log(2.0)
    np.testing.assert_allclose(slope, THETA[3], rtol=1e-3)


def test_wien_merge_brightens_blue_side():
    """The power-law replacement must sit ABOVE the exponential Wien decay
    blueward of the merge."""
    shape_merge = MBBShape(noalpha=False)
    shape_nomerge = MBBShape(noalpha=True)
    theta = jnp.array(THETA)
    lam = jnp.array([20.0, 40.0])  # well blueward of merge for T=35
    f_m = mbb_fnu(theta, lam, shape_merge)
    f_n = mbb_fnu(theta, lam, shape_nomerge)
    assert bool(jnp.all(f_m > f_n))


@pytest.mark.parametrize("opthin,noalpha", [
    (False, False), (False, True), (True, False), (True, True)])
def test_parity_vs_oracle(opthin, noalpha):
    """fp32 JAX model vs fp64 scipy oracle over a wavelength sweep and a
    spread of parameter vectors: relative agreement well under the 1%
    posterior-parity budget."""
    rng = np.random.default_rng(42)
    lam = np.geomspace(30.0, 3000.0, 25)
    shape = MBBShape(opthin=opthin, noalpha=noalpha)
    lam_j = jnp.array(lam, jnp.float32)
    fn = jax.jit(lambda p: mbb_fnu(p, lam_j, shape))
    for _ in range(20):
        T = rng.uniform(10.0, 80.0)
        beta = rng.uniform(0.5, 3.5)
        lambda0 = rng.uniform(50.0, 800.0)
        alpha = rng.uniform(1.0, 6.0)
        fnorm = rng.uniform(5.0, 100.0)
        theta = np.array([T, beta, lambda0, alpha, fnorm], dtype=np.float32)
        oracle = ModifiedBlackbodyOracle(T, beta, lambda0, alpha, fnorm,
                                         opthin=opthin, noalpha=noalpha)
        got = np.asarray(fn(jnp.array(theta)), dtype=np.float64)
        want = oracle(lam)
        # Only compare where the oracle flux is non-negligible relative to
        # the peak (deep Wien tail is irrelevant to any observable).
        # rtol reflects fp32 accumulation through the log-space chain
        # (measured max ~6e-4) -- far inside the 1% posterior-parity budget.
        mask = want > 1e-12 * want.max()
        np.testing.assert_allclose(got[mask], want[mask], rtol=2e-3)


def test_vmap_batches_over_walkers():
    rng = np.random.default_rng(0)
    thetas = np.stack([THETA * rng.uniform(0.9, 1.1, size=5)
                       for _ in range(64)]).astype(np.float32)
    lam = jnp.array([250.0, 350.0, 500.0])
    shape = MBBShape()
    batched = jax.jit(jax.vmap(lambda p: mbb_fnu(p, lam, shape)))
    out = batched(jnp.array(thetas))
    assert out.shape == (64, 3)
    ref = np.stack([np.asarray(mbb_fnu(jnp.array(t), lam, shape))
                    for t in thetas])
    # vmapped and scalar paths order fp32 ops differently; tolerance covers
    # that reordering noise only.
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4)


def test_log_flux_finite_over_prior_box():
    """No NaN/inf in log-space eval over an aggressive prior box, including
    the deep Wien side and huge/tiny opacity pivots."""
    rng = np.random.default_rng(7)
    lam = jnp.array(np.geomspace(5.0, 1e4, 16), dtype=jnp.float32)
    n = 256
    thetas = np.stack([
        rng.uniform(1.0, 200.0, n),      # T
        rng.uniform(0.1, 8.0, n),        # beta
        rng.uniform(1.0, 5000.0, n),     # lambda0
        rng.uniform(0.1, 15.0, n),       # alpha
        rng.uniform(1e-3, 1e3, n),       # fnorm
    ], axis=1).astype(np.float32)
    shape = MBBShape()
    out = jax.vmap(lambda p: log_mbb_fnu(p, lam, shape))(jnp.array(thetas))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_merge_solve_prior_box_corners():
    """The hybrid merge solve must stay accurate at the DEFAULT prior-box
    corners -- the tau transition becomes cliff-like at the beta ceiling,
    which random sweeps under-sample (a 2-bisection variant passed an
    8000-point random sweep but erred 0.14 at a corner)."""
    import itertools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.optimize import brentq
    from mbb_emcee_tpu.models.modified_blackbody import merge_log_x
    from mbb_emcee_tpu.constants import HCOK_UM_K

    corners = dict(beta=[0.01, 2.0, 20.0], alpha=[0.01, 10.0, 60.0],
                   T=[0.1, 30.0, 1000.0], lam0=[1.0, 2000.0, 2e4])
    combos = list(itertools.product(*corners.values()))
    b = np.array([c[0] for c in combos])
    a = np.array([c[1] for c in combos])
    T = np.array([c[2] for c in combos])
    l0 = np.array([c[3] for c in combos])
    log_x0 = np.log(HCOK_UM_K) - np.log(l0) - np.log(T)

    def dlns(u, bb, lx0):
        x = np.exp(u)
        q = x / (-np.expm1(-x)) if x > 1e-8 else 1 + x / 2
        e = bb * (u - lx0)
        tau = np.exp(min(e, 700))
        if tau <= 1e-8:
            h = 1 - tau / 2
        elif tau < 700:
            h = tau / np.expm1(tau)
        else:
            h = 0.0
        return 3 + bb * h - q

    f = jax.jit(jax.vmap(lambda bb, lx, aa: merge_log_x(bb, lx, aa, False)))
    got = np.asarray(f(jnp.asarray(b, jnp.float32),
                       jnp.asarray(log_x0, jnp.float32),
                       jnp.asarray(a, jnp.float32)), np.float64)
    for i in range(len(b)):
        want = brentq(lambda u: dlns(u, b[i], log_x0[i]) + a[i],
                      np.log(1e-3), np.log(1e4), xtol=1e-13)
        assert abs(got[i] - want) < 1e-5, (b[i], a[i], T[i], l0[i])


def test_freq_integrate_matches_adaptive_quad():
    """ModifiedBlackbody.freq_integrate (GL in ln-lambda) vs the fp64
    oracle under adaptive QUADPACK (ref: the reference's freq-integration
    helper feeding L_IR, SURVEY.md C1/3.2)."""
    import scipy.integrate as si
    from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody
    from mbb_emcee_tpu.constants import C_UM_HZ

    for theta, opthin in [((35.0, 1.9, 250.0, 3.5, 40.0), False),
                          ((20.0, 1.2, 100.0, 2.5, 10.0), True)]:
        m = ModifiedBlackbody(*theta, opthin=opthin)
        got = m.freq_integrate(8.0, 1000.0)
        o = ModifiedBlackbodyOracle(*theta, opthin=opthin)
        want, _ = si.quad(
            lambda lam: o(np.array([lam]))[0] * C_UM_HZ / lam ** 2,
            8.0, 1000.0, limit=200)
        assert abs(got - want) / want < 1e-3


def test_peak_lambda_matches_scalar_optimizer():
    from scipy.optimize import minimize_scalar
    from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody

    theta = (35.0, 1.9, 250.0, 3.5, 40.0)
    m = ModifiedBlackbody(*theta)
    got = m.peak_lambda()
    o = ModifiedBlackbodyOracle(*theta)
    res = minimize_scalar(lambda u: -o(np.array([np.exp(u)]))[0],
                          bounds=(np.log(10.0), np.log(3000.0)),
                          method="bounded",
                          options={"xatol": 1e-10})
    want = float(np.exp(res.x))
    assert abs(got - want) / want < 1e-3
