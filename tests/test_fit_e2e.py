"""End-to-end fit tests on synthetic photometry (SURVEY.md test plan item 6;
BASELINE.json configs 0-3 in miniature): known-theta mock data -> fit ->
recovered parameters within tolerance; prior/limit plumbing; fixed params
stay fixed; response mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.response import ResponseSet

# Herschel PACS+SPIRE-like bands.
WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])


def _mock(theta, shape, unc_frac=0.05, seed=0):
    f = np.asarray(mbb_fnu(jnp.asarray(theta, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape), np.float64)
    unc = unc_frac * f
    rng = np.random.default_rng(seed)
    return f + unc * rng.standard_normal(f.size), unc


def _fit(opthin=False, noalpha=False, **kw):
    shape = MBBShape(opthin=opthin, noalpha=noalpha)
    flux, unc = _mock(TRUE, shape)
    fit = MBBFitter(nwalkers=64, opthin=opthin, noalpha=noalpha,
                    seed=99, **kw)
    fit.set_data(WAVE, flux, unc)
    # Keep T and beta in a sane range so the tiny test chain converges fast.
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    return fit, shape


def _check_recovery(fit, params, tol_sigmas=4.0):
    chain = fit.chain  # (nwalkers, nsteps, 5)
    flat = chain.reshape(-1, 5)
    for i in params:
        med = np.median(flat[:, i])
        std = flat[:, i].std()
        assert abs(med - TRUE[i]) < tol_sigmas * max(std, 1e-3), \
            f"param {i}: med={med}, true={TRUE[i]}, std={std}"


@pytest.mark.smoke
def test_config0_opthin_3param():
    """BASELINE config[0]: optically-thin 3-param (T, beta, fnorm).
    Marked smoke: the one end-to-end fit in the fast lane."""
    fit, _ = _fit(opthin=True, noalpha=True)
    fit.run(nburn=60, nsteps=200)
    assert fit.free_space.nfree == 3
    _check_recovery(fit, [0, 1, 4])
    af = fit.acceptance_fraction
    assert 0.1 < af.mean() < 0.9


def test_config1_thick_4param():
    """BASELINE config[1]: optically-thick with free lambda0."""
    fit, _ = _fit(opthin=False, noalpha=True)
    fit.set_gaussian_prior("lambda0", 250.0, 150.0)
    fit.run(nburn=80, nsteps=250)
    assert fit.free_space.nfree == 4
    _check_recovery(fit, [0, 1, 4])


def test_config2_full_5param():
    """BASELINE config[2]: full 5-param with Wien-side alpha."""
    fit, _ = _fit(opthin=False, noalpha=False)
    fit.set_gaussian_prior("lambda0", 250.0, 150.0)
    fit.set_gaussian_prior("alpha", 3.5, 2.0)
    fit.run(nburn=80, nsteps=250)
    assert fit.free_space.nfree == 5
    _check_recovery(fit, [0, 1, 4])


def test_config3_response_mode(tmp_path):
    """BASELINE config[3]: filter-response quadrature likelihood."""
    rs = ResponseSet()
    names = []
    for w in WAVE:
        name = f"BOX{int(w)}"
        rs.add(name, f"box:{w}:{0.3 * w:.1f}")
        names.append(name)
    shape = MBBShape(opthin=True, noalpha=True)
    # Mock data generated THROUGH the responses for consistency.
    theta_j = jnp.asarray(TRUE, jnp.float32)
    waves, weights = rs.pack(names)
    f_true = np.asarray(jnp.sum(weights * mbb_fnu(theta_j, waves, shape),
                                axis=-1), np.float64)
    unc = 0.05 * f_true
    rng = np.random.default_rng(1)
    flux = f_true + unc * rng.standard_normal(f_true.size)

    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=7,
                    responses=rs)
    fit.set_data(WAVE, flux, unc, band_names=names)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.run(nburn=60, nsteps=200)
    _check_recovery(fit, [0, 1, 4])


def test_fixed_param_stays_fixed():
    fit, _ = _fit(opthin=False, noalpha=True)
    fit.fix_param("lambda0", 250.0)
    fit.run(nburn=30, nsteps=100)
    chain = fit.chain
    assert np.all(chain[:, :, 2] == np.float32(250.0))
    assert fit.free_space.nfree == 3


def test_gaussian_prior_rejects_nonfinite():
    """Regression (review): NaN sigma passed `sigma <= 0` (NaN compares
    False) and silently poisoned every lnprob with a NaN prior term."""
    fit, _ = _fit(opthin=True, noalpha=True)
    with pytest.raises(ValueError, match="positive and finite"):
        fit.set_gaussian_prior("T", 30.0, float("nan"))
    with pytest.raises(ValueError, match="positive and finite"):
        fit.set_gaussian_prior("T", 30.0, float("inf"))
    with pytest.raises(ValueError, match="finite"):
        fit.set_gaussian_prior("T", float("nan"), 4.0)
    with pytest.raises(ValueError, match="positive"):
        fit.set_gaussian_prior("T", 30.0, 0.0)


def test_compile_cache_env_semantics(monkeypatch):
    """Regression (review): MBB_EMCEE_TPU_NO_COMPILE_CACHE=0/false must
    keep the cache ENABLED ('=1 disables'); only truthy values disable."""
    from mbb_emcee_tpu.utils import compilecache

    def probe(val):
        if val is None:
            monkeypatch.delenv("MBB_EMCEE_TPU_NO_COMPILE_CACHE",
                               raising=False)
        else:
            monkeypatch.setenv("MBB_EMCEE_TPU_NO_COMPILE_CACHE", val)
        return compilecache.enable_persistent_cache()

    # disabled only for truthy values
    assert probe("1") is False
    assert probe("true") is False
    # "0"/"false"/"" keep it on (returns True once configured)
    for v in (None, "0", "false", "no", ""):
        assert probe(v) is True, v


def test_limits_clip_chain():
    fit, _ = _fit(opthin=True, noalpha=True)
    fit.set_lowlim("T", 25.0).set_uplim("T", 40.0)
    fit.run(nburn=40, nsteps=150)
    t = fit.chain[:, :, 0]
    assert t.min() >= 25.0 and t.max() <= 40.0


def test_covariance_fit_runs():
    shape = MBBShape(opthin=True, noalpha=True)
    flux, unc = _mock(TRUE, shape)
    calib = 0.04 * flux
    cov = np.outer(calib, calib) + np.diag(unc ** 2)
    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)
    fit.set_data(WAVE, flux, unc, cov=cov)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.run(nburn=40, nsteps=150)
    _check_recovery(fit, [0, 1, 4])


def test_lnprob_call_surface():
    """mbb_fitter.__call__(theta) parity with a hand-computed chi^2."""
    fit, shape = _fit(opthin=False, noalpha=False)
    got = fit(TRUE)
    f_model = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                                 jnp.asarray(WAVE, jnp.float32), shape))
    want = -0.5 * np.sum(((f_model - fit.phot.flux) / fit.phot.unc) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_determinism_same_seed():
    fit1, _ = _fit(opthin=True, noalpha=True)
    fit1.run(nburn=20, nsteps=50)
    fit2, _ = _fit(opthin=True, noalpha=True)
    fit2.run(nburn=20, nsteps=50)
    np.testing.assert_array_equal(fit1.chain, fit2.chain)


def test_extend_continues_production():
    """run(n1) + extend(n2): chain grows, continuation is deterministic,
    and consuming the stream where run() left it means a repeat of the
    same call sequence reproduces the chain bitwise."""
    shape = MBBShape()
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    flux = f + unc * np.random.default_rng(2).standard_normal(f.size)

    def build():
        fit = MBBFitter(nwalkers=32, seed=9)
        fit.set_data(WAVE, flux, unc)
        fit.run(nburn=20, nsteps=40)
        fit.extend(40)
        return fit

    fit = build()
    assert fit.chain_free.shape[0] == 80
    assert fit.lnprobability.shape[0] == 80
    assert np.isfinite(np.asarray(fit.lnprobability)).all()
    # acceptance counters keep accumulating over the continuation
    assert np.all(fit.acceptance_fraction > 0)

    fit2 = build()
    np.testing.assert_array_equal(np.asarray(fit.chain_free),
                                  np.asarray(fit2.chain_free))


def test_multifit_gelman_rubin_and_converged():
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(5)
    S = 4
    trues = np.column_stack([
        rng.uniform(28, 36, S), rng.uniform(1.7, 2.1, S),
        np.full(S, 250.0), np.full(S, 3.5), rng.uniform(30, 60, S)])
    flux, unc = [], []
    for t in trues:
        fv = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                                jnp.asarray(WAVE, jnp.float32), shape),
                        np.float64)
        u = 0.05 * fv
        flux.append(fv + u * rng.standard_normal(fv.size))
        unc.append(u)

    from mbb_emcee_tpu import MultiFitter
    mf = MultiFitter(nwalkers=32, seed=3, opthin=True, noalpha=True)
    mf.set_data(WAVE, np.array(flux), np.array(unc))
    mf.run(nburn=60, nsteps=400)
    rhat = mf.gelman_rubin()
    assert rhat.shape == (S, mf.free_space.nfree)
    assert np.all(np.isfinite(rhat)) and np.all(rhat >= 0.99)
    conv = mf.converged(rhat_max=1.2)
    assert conv.shape == (S,)
    # a 400-step unimodal 3-param fit mixes
    assert conv.all(), rhat


def test_n_ensembles_merged_product():
    """K independent ensembles merge into one wider walker axis that every
    downstream consumer (results, R-hat, HDF5) handles."""
    shape = MBBShape()
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    flux = f + unc * np.random.default_rng(4).standard_normal(f.size)

    fit = MBBFitter(nwalkers=16, seed=5, n_ensembles=4)
    fit.set_data(WAVE, flux, unc)
    fit.run(nburn=20, nsteps=60)
    assert fit.chain.shape == (64, 60, 5)
    assert fit.acceptance_fraction.shape == (64,)
    assert np.isfinite(np.asarray(fit.lnprobability)).all()

    from mbb_emcee_tpu import MBBResults
    res = MBBResults(fit=fit, redshift=2.0)
    assert res.nwalkers == 64
    assert abs(res.par_cen("T")[0] - TRUE[0]) < 12
    rhat = fit.gelman_rubin()
    assert rhat.shape == (fit.free_space.nfree,)

    # covariance data cannot use the batched likelihood
    import pytest
    fit2 = MBBFitter(nwalkers=16, n_ensembles=2)
    fit2.set_data(WAVE, flux, unc, cov=np.diag(unc ** 2))
    with pytest.raises(ValueError, match="diagonal"):
        fit2.run(nburn=2, nsteps=4)


def test_n_ensembles_extend_on_xla_backend():
    """extend() with n_ensembles works on CPU now that the XLA batch
    backend is continuable (ADVICE r1 item 1: it used to raise)."""
    shape = MBBShape(opthin=True, noalpha=True)
    flux, unc = _mock(TRUE, shape)
    fit = MBBFitter(nwalkers=16, opthin=True, noalpha=True, seed=7,
                    n_ensembles=2)
    fit.set_data(WAVE, flux, unc)
    fit.run(nburn=15, nsteps=30)
    n0 = fit.chain_free.shape[0]
    w0 = fit.chain_free.shape[1]
    fit.extend(30)
    assert fit.chain_free.shape == (n0 * 2, w0, fit.free_space.nfree)
    assert np.all(np.isfinite(fit.gelman_rubin()))


def test_single_fit_guard_regressions():
    """Regression (review): run_hmc/run_pt refuse n_ensembles > 1
    (previously silently ran one ensemble), and set_data refuses a
    stale photometric upper-limit mask when the band count changes
    (previously failed with an opaque broadcast error in build_lnprob),
    leaving the old data bound."""
    import pytest
    shape = MBBShape(opthin=True, noalpha=True)
    flux, unc = _mock(TRUE, shape)
    fit = MBBFitter(nwalkers=16, opthin=True, noalpha=True,
                    n_ensembles=2)
    fit.set_data(WAVE, flux, unc)
    with pytest.raises(ValueError, match="n_ensembles"):
        fit.run_hmc(nwarmup=4, nsteps=8)
    with pytest.raises(ValueError, match="n_ensembles"):
        fit.run_pt(nrungs=3, nburn=4, nsteps=8)

    fit2 = MBBFitter(nwalkers=16, opthin=True, noalpha=True)
    fit2.set_data(WAVE, flux, unc)
    fit2.set_phot_upperlimits(np.array([0, 0, 0, 0, 1], bool))
    with pytest.raises(ValueError, match="set_phot_upperlimits"):
        fit2.set_data(WAVE[:3], flux[:3], unc[:3])
    assert fit2.phot.nbands == 5               # old data still bound
    fit2.set_phot_upperlimits(None)            # clearing unblocks
    fit2.set_data(WAVE[:3], flux[:3], unc[:3])
    assert fit2.phot.nbands == 3
