"""Model-assessment tier (modelcheck.py): WAIC + PSIS-LOO.

Validation strategy: the conjugate Gaussian-mean model has an ANALYTIC
leave-one-out predictive density, so the whole pipeline (pointwise
log-likelihood matrix -> PSIS smoothing -> elpd sums) is checked against
exact values, not just self-consistency; the GPD tail fit is checked on
synthetic Pareto draws; then the MBBResults/MultiFitter surfaces get
end-to-end runs including the HDF5 round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu import modelcheck
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.results import MBBResults

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([30.0, 2.0, 250.0, 3.2, 50.0])


# -- tail fit ----------------------------------------------------------------

def test_gpd_fit_recovers_shape():
    """Zhang-Stephens estimator on synthetic GPD exceedances."""
    rng = np.random.default_rng(3)
    for k_true in (0.2, 0.5):
        sigma_true = 1.3
        u = rng.uniform(size=4000)
        x = sigma_true * np.expm1(-k_true * np.log1p(-u)) / k_true
        k, sigma = modelcheck.gpd_fit(np.sort(x))
        assert abs(k - k_true) < 0.1, (k, k_true)
        assert abs(sigma - sigma_true) / sigma_true < 0.15


def test_psis_smooth_properties():
    rng = np.random.default_rng(5)
    logw = rng.standard_normal(2000)
    lw, k = modelcheck.psis_smooth(logw)
    # Normalized in log space.
    np.testing.assert_allclose(np.exp(lw).sum(), 1.0, rtol=1e-10)
    # Smoothing never pushes a weight above the raw maximum.
    raw = logw - logw.max()
    raw -= np.log(np.exp(raw).sum())
    assert lw.max() <= raw.max() + 1e-9
    # Lognormal ratios are well-behaved: finite reliable k-hat.
    assert np.isfinite(k) and k < modelcheck.PARETO_K_WARN
    # Tiny inputs: no smoothing possible, k = inf, still normalized.
    lw2, k2 = modelcheck.psis_smooth(rng.standard_normal(8))
    assert np.isinf(k2)
    np.testing.assert_allclose(np.exp(lw2).sum(), 1.0, rtol=1e-10)


# -- exact conjugate check ----------------------------------------------------

def test_loo_matches_analytic_conjugate_gaussian():
    """Gaussian-mean model, flat prior: p(y_i | y_-i) is analytic.

    y_i ~ N(mu, s^2) with known s; posterior on all data is
    N(ybar, s^2/n); the exact LOO predictive is
    N(mean(y_-i), s^2 (1 + 1/(n-1))). PSIS-LOO over exact posterior
    draws must reproduce each pointwise value within MC error, and WAIC
    must agree with LOO (both estimate the same elpd)."""
    rng = np.random.default_rng(11)
    n_pts, s = 12, 1.0
    y = 2.0 + s * rng.standard_normal(n_pts)
    ndraw = 8000
    mu_draws = y.mean() + s / np.sqrt(n_pts) * rng.standard_normal(ndraw)
    loglik = (-0.5 * ((y[None, :] - mu_draws[:, None]) / s) ** 2
              - np.log(s) - 0.5 * np.log(2 * np.pi))
    res = modelcheck.loo_from_loglik(loglik)

    # Exact pointwise LOO.
    exact = np.empty(n_pts)
    for i in range(n_pts):
        rest = np.delete(y, i)
        var = s ** 2 * (1.0 + 1.0 / (n_pts - 1))
        exact[i] = (-0.5 * (y[i] - rest.mean()) ** 2 / var
                    - 0.5 * np.log(2 * np.pi * var))
    np.testing.assert_allclose(res.pointwise_loo, exact, atol=0.02)
    np.testing.assert_allclose(res.elpd_loo, exact.sum(), atol=0.1)
    # One free parameter: both penalties must say ~1.
    assert 0.7 < res.p_loo < 1.4
    assert 0.7 < res.p_waic < 1.4
    assert abs(res.elpd_waic - res.elpd_loo) < 0.2
    assert np.all(res.pareto_k < modelcheck.PARETO_K_WARN)
    assert res.n_bad_k == 0
    # lpd must upper-bound both elpd estimates pointwise.
    assert np.all(res.pointwise_lpd >= res.pointwise_loo - 1e-9)


def test_loo_input_validation():
    with pytest.raises(ValueError):
        modelcheck.loo_from_loglik(np.zeros(5))
    with pytest.raises(ValueError):
        modelcheck.loo_from_loglik(np.zeros((1, 5)))
    with pytest.raises(ValueError):
        modelcheck.gaussian_pointwise_constants()


# -- fit surface ---------------------------------------------------------------

# 12 bands: with only ~5 points and 3 free parameters PSIS-LOO is
# legitimately unstable (k-hat flags it); a well-conditioned fixture
# keeps the end-to-end assertions about the MACHINERY, not the noise.
LOO_WAVE = np.geomspace(80.0, 900.0, 12)


@pytest.fixture(scope="module")
def loo_fit():
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(LOO_WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.06 * f
    rng = np.random.default_rng(2)
    flux = f + unc * rng.standard_normal(f.size)
    fit = MBBFitter(nwalkers=64, seed=4, opthin=True, noalpha=True)
    fit.set_data(LOO_WAVE, flux, unc)
    fit.run(nburn=60, nsteps=120)
    return fit


def test_compute_loo_end_to_end(loo_fit, tmp_path):
    res = MBBResults(fit=loo_fit, redshift=2.0)
    loo = res.compute_loo(thin=2)
    assert loo is res.loo_result
    assert loo.pointwise_loo.shape == (LOO_WAVE.size,)
    assert np.all(np.isfinite(loo.pointwise_loo))
    assert loo.elpd_loo <= np.sum(loo.pointwise_lpd) + 1e-9
    # 3 free params on 12 bands: effective parameter count in range.
    assert 0.0 < loo.p_loo < 6.0
    assert "elpd_loo" in repr(loo)

    # HDF5 round-trip of the assessment.
    path = str(tmp_path / "loo.h5")
    res.writeToHDF5(path)
    back = MBBResults(h5file=path).loo_result
    assert back is not None
    np.testing.assert_allclose(back.pointwise_loo, loo.pointwise_loo)
    np.testing.assert_allclose(back.pareto_k, loo.pareto_k)
    np.testing.assert_array_equal(back.point_index, loo.point_index)
    assert back.nsamples == loo.nsamples
    np.testing.assert_allclose(back.elpd_loo, loo.elpd_loo)


def test_compute_loo_diag_vs_diagonal_covariance(loo_fit):
    """A diagonal full-covariance fit must assess identically to the
    plain sigma fit (the conditional factors reduce to the marginals)."""
    res = MBBResults(fit=loo_fit, redshift=2.0)
    loo_diag = res.compute_loo(thin=2)
    res2 = MBBResults(fit=loo_fit, redshift=2.0)
    res2.phot = type(res.phot)(
        res.phot.wave, res.phot.flux, res.phot.unc,
        cov=np.diag(np.asarray(res.phot.unc) ** 2))
    loo_cov = res2.compute_loo(thin=2)
    np.testing.assert_allclose(loo_cov.pointwise_lpd,
                               loo_diag.pointwise_lpd, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(loo_cov.elpd_loo, loo_diag.elpd_loo,
                               rtol=2e-3, atol=5e-3)


def test_loo_batch_matches_pointwise_math():
    """loo_batch_from_loglik is exactly stacked loo_from_loglik calls."""
    rng = np.random.default_rng(7)
    S, n, nb = 3, 400, 6
    loglik = -0.5 * rng.standard_normal((S, n, nb)) ** 2 - 1.0
    include = np.ones((S, nb), bool)
    include[1, 2] = False
    include[2, [0, 5]] = False
    batch = modelcheck.loo_batch_from_loglik(loglik, include)
    assert batch.nsamples == n
    # Regression (review): a source with NO assessable band reports NaN,
    # not a plausible-looking elpd of exactly 0.0
    none_inc = include.copy()
    none_inc[1] = False
    b2 = modelcheck.loo_batch_from_loglik(loglik, none_inc)
    assert np.isnan(b2.elpd_loo[1]) and np.isnan(b2.elpd_waic[1])
    assert b2.n_points[1] == 0
    np.testing.assert_allclose(b2.elpd_loo[0], batch.elpd_loo[0])
    for s in range(S):
        idx = np.where(include[s])[0]
        single = modelcheck.loo_from_loglik(loglik[s][:, idx],
                                            point_index=idx)
        np.testing.assert_allclose(batch.elpd_loo[s], single.elpd_loo)
        np.testing.assert_allclose(batch.p_waic[s], single.p_waic)
        np.testing.assert_allclose(batch.pointwise_loo[s, idx],
                                   single.pointwise_loo)
        np.testing.assert_allclose(batch.pareto_k[s, idx], single.pareto_k)
        assert np.all(np.isnan(batch.pointwise_loo[s, ~include[s]]))
    np.testing.assert_array_equal(batch.n_points, include.sum(axis=1))
    assert "LooBatchResult" in repr(batch)


@pytest.fixture(scope="module")
def batch_fit():
    from mbb_emcee_tpu.multifit import MultiFitter
    shape = MBBShape(opthin=True, noalpha=True)
    wave = np.geomspace(80.0, 900.0, 6)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(wave, jnp.float32), shape),
                   np.float64)
    rng = np.random.default_rng(13)
    S = 4
    flux = f[None, :] * rng.uniform(0.8, 1.2, (S, wave.size))
    unc = 0.06 * np.abs(flux)
    flux += unc * rng.standard_normal(flux.shape)
    # Ragged: source 1 misses band 2; source 2's last band is an uplim.
    flux[1, 2] = np.nan
    unc[1, 2] = np.nan
    uplims = np.zeros((S, wave.size), bool)
    uplims[2, -1] = True
    mf = MultiFitter(nwalkers=32, seed=3, opthin=True, noalpha=True)
    mf.set_data(wave, flux, unc)
    mf.set_phot_upperlimits(uplims)
    mf.run(nburn=40, nsteps=80)
    return mf


def test_multifit_compute_loo(batch_fit):
    mf = batch_fit
    loo = mf.compute_loo(thin=2)
    assert loo is mf.loo_result
    S, nb = mf.flux.shape
    assert loo.pointwise_loo.shape == (S, nb)
    # Excluded slots: the missing band and the upper limit.
    assert loo.excluded[1, 2] and loo.excluded[2, -1]
    assert np.isnan(loo.pointwise_loo[1, 2])
    assert np.isnan(loo.pareto_k[2, -1])
    np.testing.assert_array_equal(loo.n_points, [nb, nb - 1, nb - 1, nb])
    obs = ~loo.excluded
    assert np.all(np.isfinite(loo.pointwise_loo[obs]))
    assert np.all(np.isfinite(loo.elpd_loo))
    assert np.all(loo.p_loo > 0.0)


def test_psis_failed_tail_fit_reports_inf_not_nan(monkeypatch):
    """A GPD fit returning NaN must surface as k-hat = inf ('not
    assessable'), never NaN (NaN > 0.7 is False, so a NaN would report
    the broken band as the reliable one)."""
    monkeypatch.setattr(modelcheck, "gpd_fit",
                        lambda x: (np.nan, np.nan))
    rng = np.random.default_rng(31)
    lw, k = modelcheck.psis_smooth(rng.standard_normal(500))
    assert np.isinf(k)
    np.testing.assert_allclose(np.exp(lw).sum(), 1.0, rtol=1e-10)


def test_multifit_loo_hdf5_roundtrip(batch_fit, tmp_path):
    """The per-source assessment persists with the batch file -- the
    vectors the --loo help text says to difference across variants."""
    from mbb_emcee_tpu.multifit import MultiFitter
    mf = batch_fit
    loo = mf.compute_loo(thin=2)
    path = str(tmp_path / "batch_loo.h5")
    mf.writeToHDF5(path)
    back = MultiFitter.from_h5(path).loo_result
    assert back is not None
    np.testing.assert_allclose(back.elpd_loo, loo.elpd_loo)
    np.testing.assert_allclose(back.pointwise_loo, loo.pointwise_loo)
    np.testing.assert_allclose(back.pareto_k, loo.pareto_k)
    np.testing.assert_array_equal(back.excluded, loo.excluded)
    np.testing.assert_array_equal(back.n_points, loo.n_points)
    assert back.nsamples == loo.nsamples


def test_multifit_loo_identity_correlation_matches_diag():
    """With R = I the conditional factors reduce to the marginals: the
    correlated-mode assessment must equal the diagonal one on the SAME
    stored chains."""
    from mbb_emcee_tpu.multifit import MultiFitter
    shape = MBBShape(opthin=True, noalpha=True)
    wave = np.geomspace(80.0, 900.0, 6)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(wave, jnp.float32), shape),
                   np.float64)
    rng = np.random.default_rng(17)
    flux = f[None, :] * rng.uniform(0.9, 1.1, (2, wave.size))
    unc = 0.06 * np.abs(flux)
    mf = MultiFitter(nwalkers=32, seed=6, opthin=True, noalpha=True)
    mf.set_data(wave, flux, unc)
    mf.run(nburn=40, nsteps=80)
    loo_diag = mf.compute_loo(thin=2)
    mf._band_corr = np.eye(wave.size)       # assessment path only
    loo_corr = mf.compute_loo(thin=2)
    np.testing.assert_allclose(loo_corr.elpd_loo, loo_diag.elpd_loo,
                               rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(
        loo_corr.pointwise_loo[~loo_corr.excluded],
        loo_diag.pointwise_loo[~loo_diag.excluded], rtol=2e-3, atol=5e-3)


def test_compare_loo_paired():
    """Paired comparison: a mis-centered model must lose; a model
    compared against itself is a tie; mismatched points are refused."""
    rng = np.random.default_rng(23)
    n_pts, s, ndraw = 10, 1.0, 4000
    y = s * rng.standard_normal(n_pts)
    mu = y.mean() + s / np.sqrt(n_pts) * rng.standard_normal(ndraw)

    def loglik_for(offset):
        return (-0.5 * ((y[None, :] - offset - mu[:, None]) / s) ** 2
                - np.log(s) - 0.5 * np.log(2 * np.pi))

    loo_a = modelcheck.loo_from_loglik(loglik_for(0.0))
    loo_b = modelcheck.loo_from_loglik(loglik_for(3.0))   # badly biased
    cmp_ab = modelcheck.compare_loo(loo_a, loo_b)
    assert cmp_ab.favored == "A"
    assert cmp_ab.elpd_diff > 2.0 * cmp_ab.se_diff
    assert cmp_ab.n_points == n_pts
    tie = modelcheck.compare_loo(loo_a, loo_a)
    assert tie.favored == "neither"
    np.testing.assert_allclose(tie.elpd_diff, 0.0, atol=1e-12)
    with pytest.raises(ValueError):
        modelcheck.compare_loo(
            loo_a, modelcheck.loo_from_loglik(loglik_for(0.0)[:, :5]))
    assert "favored" in repr(cmp_ab)


def test_compute_loo_exact_matches_psis(loo_fit):
    """On a well-conditioned fit the exact refit-without-band elpd and
    the PSIS estimate agree within their Monte-Carlo errors."""
    res = MBBResults(fit=loo_fit, redshift=2.0)
    psis = res.compute_loo()
    # Pick the three best-behaved bands (smallest k-hat).
    pick = np.argsort(psis.pareto_k)[:3]
    bands = psis.point_index[pick]
    exact = loo_fit.compute_loo_exact(bands=[int(b) for b in bands],
                                      nburn=60, nsteps=200)
    assert exact.nsamples > 0
    np.testing.assert_array_equal(exact.point_index, bands)
    np.testing.assert_allclose(exact.pointwise_loo,
                               psis.pointwise_loo[pick], atol=0.3)
    assert np.all(np.isfinite(exact.se_mc))
    assert "ExactLooResult" in repr(exact)


def test_compute_loo_exact_validation():
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.06 * f
    fit = MBBFitter(nwalkers=16, seed=2, opthin=True, noalpha=True)
    fit.set_data(WAVE, f, unc, cov=np.diag(unc ** 2))
    with pytest.raises(ValueError, match="diagonal"):
        fit.compute_loo_exact()
    fit2 = MBBFitter(nwalkers=16, seed=2, opthin=True, noalpha=True)
    fit2.set_data(WAVE, f, unc)
    fit2.set_phot_upperlimits(np.array([False] * 4 + [True]))
    with pytest.raises(ValueError, match="upper limit"):
        fit2.compute_loo_exact(bands=[4])
    with pytest.raises(ValueError, match="out of range"):
        fit2.compute_loo_exact(bands=[7])


def test_sed_surfaces_compute_loo(tmp_path):
    """Generic-model tier: SEDFitter/SEDResults LOO + HDF5 round-trip,
    and the batched SEDMultiFitter analog with a missing band."""
    from mbb_emcee_tpu.sed import SEDModel, SEDFitter, SEDResults
    from mbb_emcee_tpu.sedmulti import SEDMultiFitter
    from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu

    thin_shape = MBBShape(opthin=True, noalpha=True)

    def fnu(theta, w):
        t, beta, f = theta
        return jnp.exp(log_mbb_fnu(jnp.stack([t, beta, 250.0, 4.0, f]),
                                   w, thin_shape))

    model = SEDModel(fnu=fnu, param_names=("T", "beta", "fnorm"),
                     lower=[5.0, 0.3, 1e-3], upper=[80.0, 4.0, 1e4],
                     name="wrapped-mbb")
    wave = np.geomspace(80.0, 900.0, 6)
    f = np.asarray(fnu(jnp.asarray([30.0, 2.0, 50.0], jnp.float32),
                       jnp.asarray(wave, jnp.float32)), np.float64)
    unc = 0.06 * f
    rng = np.random.default_rng(21)
    flux = f + unc * rng.standard_normal(f.size)

    fit = SEDFitter(model, nwalkers=32, seed=8)
    fit.set_data(wave, flux, unc)
    for nm, v in zip(model.param_names, [30.0, 2.0, 50.0]):
        fit.set_param_init(nm, v, 0.1 * v)
    fit.run(nburn=40, nsteps=80)
    res = fit.results()
    loo = res.compute_loo(thin=2)
    assert np.all(np.isfinite(loo.pointwise_loo))
    path = str(tmp_path / "sed_loo.h5")
    res.writeToHDF5(path)
    back = SEDResults(h5file=path, model=model).loo_result
    np.testing.assert_allclose(back.pointwise_loo, loo.pointwise_loo)
    np.testing.assert_allclose(back.elpd_loo, loo.elpd_loo)

    # Batched analog, ragged catalog.
    smf = SEDMultiFitter(model, nwalkers=32, seed=9)
    fb = f[None, :] * rng.uniform(0.9, 1.1, (2, wave.size))
    ub = 0.06 * np.abs(fb)
    fb[1, 0] = np.nan
    ub[1, 0] = np.nan
    smf.set_data(wave, fb, ub)
    for nm, v in zip(model.param_names, [30.0, 2.0, 50.0]):
        smf.set_param_init(nm, v, 0.1 * v)
    smf.run(nburn=40, nsteps=80)
    bloo = smf.compute_loo(thin=2)
    assert bloo is smf.loo_result
    assert bloo.excluded[1, 0] and np.isnan(bloo.pointwise_loo[1, 0])
    np.testing.assert_array_equal(bloo.n_points,
                                  [wave.size, wave.size - 1])
    assert np.all(np.isfinite(bloo.elpd_loo))


def test_compute_loo_excludes_uplim_bands():
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.06 * f
    fit = MBBFitter(nwalkers=32, seed=9, opthin=True, noalpha=True)
    fit.set_data(WAVE, f, unc)
    fit.set_phot_upperlimits(np.array([False, False, False, False, True]))
    fit.run(nburn=40, nsteps=60)
    loo = MBBResults(fit=fit, redshift=2.0).compute_loo()
    np.testing.assert_array_equal(loo.point_index, np.arange(4))
    assert loo.pointwise_loo.shape == (4,)
