"""Posterior-predictive goodness-of-fit checks (MBBResults.posterior_predictive).

Additive over the reference (which offers no absolute GOF; SURVEY.md C6):
p-value calibration on well-specified data, sensitivity to an injected
discrepant band, host-oracle chi-square agreement for the diagonal and
full-covariance whitenings, upper-limit exclusion, and the response-mode
HDF5 round-trip (the quadrature pack persists so a reloaded file PPCs
identically).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.results import MBBResults
from mbb_emcee_tpu.response import ResponseSet

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([30.0, 2.0, 250.0, 3.2, 50.0])


def _model_fluxes(shape=MBBShape()):
    return np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                              jnp.asarray(WAVE, jnp.float32), shape),
                      np.float64)


def _fit(flux, unc, cov=None, seed=3, **kw):
    fit = MBBFitter(nwalkers=32, seed=seed, **kw)
    fit.set_data(WAVE, flux, unc, cov=cov)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.set_gaussian_prior("lambda0", 250.0, 120.0)
    fit.set_gaussian_prior("alpha", 3.2, 1.5)
    fit.run(nburn=50, nsteps=100)
    return fit


@pytest.fixture(scope="module")
def good_fit():
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(0)
    return _fit(f + unc * rng.standard_normal(f.size), unc)


def test_ppc_well_specified(good_fit):
    res = MBBResults(fit=good_fit)
    ppc = res.posterior_predictive(thin=4)
    assert 0.02 < ppc.p_value < 0.98
    assert ppc.ndata == 5 and ppc.nfree == 5
    assert ppc.nsamples == res.flatchain[::4].shape[0]
    assert np.all(np.isfinite(ppc.band_p))
    assert np.all((ppc.band_p > 0.005) & (ppc.band_p < 0.995))
    # Replicated discrepancy is exactly chi-square with ndata dof.
    assert abs(np.mean(ppc.chi2_rep) - ppc.ndata) < 0.5
    # Determinism: same seed, same result.
    ppc2 = res.posterior_predictive(thin=4)
    assert ppc2.p_value == ppc.p_value
    np.testing.assert_array_equal(ppc2.chi2_obs, ppc.chi2_obs)


def test_ppc_flags_misfit_band():
    """A band displaced by 10 sigma must crater the p-value and show an
    extreme tail probability AT that band."""
    f = _model_fluxes()
    unc = 0.05 * f
    flux = f.copy()
    flux[2] += 10.0 * unc[2]
    fit = _fit(flux, unc, seed=5)
    ppc = MBBResults(fit=fit).posterior_predictive(thin=4)
    assert ppc.p_value < 0.01
    # The displaced band: observed far ABOVE replications (model cannot
    # follow a single 10-sigma outlier against 4 consistent bands).
    assert ppc.band_p[2] < 0.05


def test_ppc_chi2_matches_host_oracle(good_fit):
    """chi2_obs equals the host fp64 chi-square of the same thinned
    samples (point mode, diagonal errors) to fp32 tolerance."""
    res = MBBResults(fit=good_fit)
    thin = 40
    ppc = res.posterior_predictive(thin=thin)
    samples = res.flatchain[::thin]
    y = np.asarray(res.data_flux, np.float64)
    isig = 1.0 / np.asarray(res.data_flux_unc, np.float64)
    for t in range(0, samples.shape[0], 7):
        m = np.asarray(
            mbb_fnu(jnp.asarray(samples[t], jnp.float32),
                    jnp.asarray(WAVE, jnp.float32), res.shape), np.float64)
        want = np.sum(((m - y) * isig) ** 2)
        np.testing.assert_allclose(ppc.chi2_obs[t], want, rtol=2e-4)


def test_ppc_full_covariance_whitening():
    """With a band-correlated covariance, chi2_obs matches the host
    Mahalanobis distance under the full matrix."""
    f = _model_fluxes()
    sig = 0.05 * f
    C = 0.5 * np.outer(sig, sig) + np.diag(sig ** 2)
    rng = np.random.default_rng(2)
    flux = f + np.linalg.cholesky(C) @ rng.standard_normal(f.size)
    fit = _fit(flux, 0.05 * f, cov=C, seed=9)
    res = MBBResults(fit=fit)
    ppc = res.posterior_predictive(thin=40)
    Cinv = np.linalg.inv(C)
    samples = res.flatchain[::40]
    for t in range(0, samples.shape[0], 11):
        m = np.asarray(
            mbb_fnu(jnp.asarray(samples[t], jnp.float32),
                    jnp.asarray(WAVE, jnp.float32), res.shape), np.float64)
        d = m - flux
        np.testing.assert_allclose(ppc.chi2_obs[t], d @ Cinv @ d,
                                   rtol=5e-4)
    assert 0.001 < ppc.p_value <= 1.0


def test_ppc_excludes_upper_limit_bands():
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(4)
    flux = f + unc * rng.standard_normal(f.size)
    flux[-1] = 2.0 * f[-1]          # limit value, not a detection
    fit = MBBFitter(nwalkers=32, seed=13)
    fit.set_data(WAVE, flux, unc)
    fit.set_phot_upperlimits(np.array([0, 0, 0, 0, 1], bool))
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.set_gaussian_prior("lambda0", 250.0, 120.0)
    fit.set_gaussian_prior("alpha", 3.2, 1.5)
    fit.run(nburn=50, nsteps=100)
    ppc = MBBResults(fit=fit).posterior_predictive(thin=4)
    assert ppc.ndata == 4
    assert np.isnan(ppc.band_p[-1]) and np.all(np.isfinite(ppc.band_p[:4]))
    assert 0.005 < ppc.p_value < 0.995


def test_ppc_response_mode_h5_roundtrip(tmp_path):
    """Response-mode PPC works from a reloaded HDF5 file and reproduces
    the from-fit result exactly (the quadrature pack round-trips)."""
    rs = ResponseSet()
    names = []
    for w in WAVE:
        name = f"BOX{int(w)}"
        rs.add(name, f"box:{w}:{0.3 * w:.1f}")
        names.append(name)
    shape = MBBShape(opthin=True, noalpha=True)
    waves, weights = rs.pack(names)
    f_true = np.asarray(
        jnp.sum(weights * mbb_fnu(jnp.asarray(TRUE, jnp.float32), waves,
                                  shape), axis=-1), np.float64)
    unc = 0.05 * f_true
    rng = np.random.default_rng(6)
    flux = f_true + unc * rng.standard_normal(f_true.size)

    fit = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=17,
                    responses=rs)
    fit.set_data(WAVE, flux, unc, band_names=names)
    fit.run(nburn=50, nsteps=100)

    res = MBBResults(fit=fit)
    assert res.response_pack is not None
    ppc = res.posterior_predictive(thin=4)
    assert 0.005 < ppc.p_value < 0.995
    assert ppc.band_names == names

    path = str(tmp_path / "resp.h5")
    res.writeToHDF5(path)
    res2 = MBBResults(h5file=path)
    assert res2.response_pack is not None
    np.testing.assert_allclose(np.asarray(res2.response_pack[0]),
                               np.asarray(res.response_pack[0]))
    ppc2 = res2.posterior_predictive(thin=4)
    assert ppc2.p_value == ppc.p_value
    np.testing.assert_allclose(ppc2.chi2_obs, ppc.chi2_obs, rtol=1e-6)


def test_ppc_point_mode_h5_roundtrip(tmp_path):
    """Point-mode files carry no ResponsePack group and reload with
    response_pack=None (backward compatible with pre-existing files)."""
    import h5py
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(8)
    fit = _fit(f + unc * rng.standard_normal(f.size), unc, seed=21)
    res = MBBResults(fit=fit)
    assert res.response_pack is None
    path = str(tmp_path / "point.h5")
    res.writeToHDF5(path)
    with h5py.File(path, "r") as h:
        assert "ResponsePack" not in h
    res2 = MBBResults(h5file=path)
    assert res2.response_pack is None
    ppc = res2.posterior_predictive(thin=4)
    assert np.isfinite(ppc.p_value)
