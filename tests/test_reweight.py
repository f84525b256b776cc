"""Post-hoc prior reweighting (reweight.py): weighted-percentile math,
identity swaps, agreement with direct refits, diagnostics, and the batch
form with per-source old priors."""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu import MBBFitter, MBBResults
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.reweight import (
    reweight_prior, reweight_prior_batch, _weighted_percentiles)

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
SHAPE = MBBShape(opthin=True, noalpha=True)
TRUE = np.array([30.0, 1.8, 250.0, 4.0, 40.0])


def _mock():
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), SHAPE),
                   np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(5)
    return f + unc * rng.standard_normal(WAVE.size), unc


def _fit(prior=None, seed=9, nburn=80, nsteps=400):
    flux, unc = _mock()
    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=seed)
    fit.set_data(WAVE, flux, unc)
    if prior is not None:
        fit.set_gaussian_prior("T", *prior)
    fit.run(nburn=nburn, nsteps=nsteps)
    return MBBResults(fit=fit)


def test_result_does_not_pin_parent_fit():
    """Regression (review): the ReweightResult's _index closure captured
    the whole results object, keeping multi-GB chains alive for the
    lifetime of the reweight result. It must pin at most the (tiny)
    model / name list."""
    import gc
    import weakref
    res = _fit(prior=(30.0, 4.0))
    rw = reweight_prior(res, "T", 30.0, 4.0)
    assert rw.par_cen("T") is not None        # resolver works pre-drop
    ref = weakref.ref(res)
    fit_ref = weakref.ref(res._fit)
    del res
    gc.collect()
    assert ref() is None, "ReweightResult still pins the results object"
    assert fit_ref() is None, "ReweightResult still pins the fitter"
    # and the resolver still works after the parent is gone
    cen = rw.par_cen("T")
    assert np.isfinite(cen).all()


def test_weighted_percentiles_unit():
    """Integer weights == sample repetition (up to the shared midpoint
    ECDF convention, checked against np.percentile on the expansion)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(200)
    reps = rng.integers(1, 5, 200)
    w = reps / reps.sum()
    expanded = np.repeat(x, reps)
    got = _weighted_percentiles(x, w, [15.85, 50.0, 84.15])
    want = np.percentile(expanded, [15.85, 50.0, 84.15])
    np.testing.assert_allclose(got, want, atol=0.05)
    # uniform weights == plain percentiles
    got_u = _weighted_percentiles(x, np.full(200, 1 / 200.0), [50.0])
    np.testing.assert_allclose(got_u, np.percentile(x, [50.0]), atol=0.02)


def test_identity_swap_is_uniform():
    res = _fit(prior=(30.0, 4.0))
    rw = reweight_prior(res, "T", 30.0, 4.0)
    assert rw.ess == pytest.approx(rw.nsamples, rel=1e-6)
    assert rw.reliable
    np.testing.assert_allclose(rw.par_cen("T"), res.par_cen("T"),
                               rtol=0.02, atol=0.02)
    np.testing.assert_allclose(rw.par_cen("beta"), res.par_cen("beta"),
                               rtol=0.05, atol=0.02)


def test_swap_matches_direct_refit():
    """Reweighting A -> B equals refitting under B (statistically)."""
    res_a = _fit(prior=(34.0, 5.0), seed=9)
    rw = reweight_prior(res_a, "T", 27.0, 2.5)
    assert rw.reliable, repr(rw)
    res_b = _fit(prior=(27.0, 2.5), seed=31)
    for p in ("T", "beta", "fnorm"):
        got, want = rw.par_cen(p), res_b.par_cen(p)
        width = 0.5 * (want[1] + want[2])
        assert abs(got[0] - want[0]) < 0.35 * width, (p, got, want)
        assert abs((got[1] + got[2]) - (want[1] + want[2])) \
            < 0.5 * width, (p, got, want)
    # weighted mean moves toward the new prior center
    assert rw.mean("T") < res_a.par_cen("T")[0]


def test_remove_prior_matches_flat_refit():
    res_a = _fit(prior=(28.0, 2.0), seed=9)
    rw = reweight_prior(res_a, "T", sigma=None)
    res_flat = _fit(prior=None, seed=31)
    got, want = rw.par_cen("T"), res_flat.par_cen("T")
    width = 0.5 * (want[1] + want[2])
    # widening swaps are the hard direction; require agreement only if
    # the diagnostic itself says the reweighting is trustworthy
    if rw.reliable:
        assert abs(got[0] - want[0]) < 0.6 * width, (got, want)
    else:
        assert rw.ess < 0.5 * rw.nsamples


def test_extreme_swap_flags_unreliable():
    res = _fit(prior=(30.0, 4.0))
    rw = reweight_prior(res, "T", 80.0, 0.5)   # far outside the posterior
    assert (not rw.reliable) or rw.ess < 20.0


def test_validation_errors():
    res = _fit(prior=None)
    with pytest.raises(ValueError, match="no prior"):
        reweight_prior(res, "T")               # nothing to change
    flux, unc = _mock()
    fit = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=2)
    fit.set_data(WAVE, flux, unc)
    fit.fix_param("beta", 1.8)
    fit.run(nburn=10, nsteps=20)
    with pytest.raises(ValueError, match="FIXED"):
        reweight_prior(MBBResults(fit=fit), "beta", 2.0, 0.1)
    with pytest.raises(ValueError, match="positive"):
        reweight_prior(res, "T", 30.0, -1.0)
    res_p = _fit(prior=(30.0, 4.0), nburn=10, nsteps=20)
    with pytest.raises(ValueError, match="BOTH mean and sigma"):
        reweight_prior(res_p, "T", sigma=5.0)      # forgot the mean


def test_batch_identity_with_per_source_prior():
    """The batch form reads per-source OLD priors: swapping in the same
    per-source prior must give uniform weights for every source."""
    from mbb_emcee_tpu.sed import SEDModel
    from mbb_emcee_tpu.sedmulti import SEDMultiFitter
    from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu

    def fnu(theta, wave):
        return jnp.exp(log_mbb_fnu(theta, wave, SHAPE))

    model = SEDModel(fnu=fnu,
                     param_names=("T", "beta", "lambda0", "alpha",
                                  "fnorm"),
                     lower=[1.0, 0.1, 1.0, 0.01, 1e-3],
                     upper=[100.0, 5.0, 2e4, 60.0, 1e4],
                     name="mbb-wrapped-rw")
    flux0, unc0 = _mock()
    S = 3
    rng = np.random.default_rng(1)
    flux = flux0[None, :] * rng.uniform(0.9, 1.1, (S, WAVE.size))
    unc = 0.05 * flux
    mf = SEDMultiFitter(model, nwalkers=32, seed=3)
    mf.fix_param("lambda0", 250.0).fix_param("alpha", 4.0)
    mf.set_data(WAVE, flux, unc)
    mu_s = np.array([28.0, 30.0, 32.0])
    sig_s = np.array([3.0, 4.0, 5.0])
    mf.set_gaussian_prior("T", mu_s, sig_s)
    mf.set_param_init("T", 30.0, 3.0)
    mf.set_param_init("fnorm", 40.0, 5.0)
    mf.run(nburn=20, nsteps=60)

    rw = reweight_prior_batch(mf, "T", mu_s, sig_s)
    n = rw.samples.shape[1]
    np.testing.assert_allclose(rw.ess, np.full(S, n), rtol=1e-6)
    assert rw.reliable.all()
    # ... and an actual per-source swap shifts each source toward its
    # own new center
    rw2 = reweight_prior_batch(mf, "T", mu_s - 2.0, sig_s / 2.0)
    cen_old = mf.par_cen("T")
    cen_new = rw2.par_cen("T")
    assert np.all(cen_new[:, 0] < cen_old[:, 0] + 0.2)
