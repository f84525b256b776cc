"""MAP + Laplace quick fits (mapfit.py) and the unrolled small-SPD
linear algebra they run on (ops/smalllinalg.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mbb_emcee_tpu import MBBFitter, MultiFitter
from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu

NB = 5
WAVE = np.linspace(100.0, 500.0, NB)


def _mock(theta, shape, frac=0.03, seed=0):
    f = np.asarray(mbb_fnu(jnp.asarray(theta, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = frac * f
    rng = np.random.default_rng(seed)
    return f + unc * rng.standard_normal(NB), unc


def test_smalllinalg_matches_numpy():
    from mbb_emcee_tpu.ops.smalllinalg import (
        cholesky_small, spd_solve_small, spd_inverse_small)
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 5):
        A0 = rng.standard_normal((7, n, n))
        A = A0 @ np.swapaxes(A0, -1, -2) + n * np.eye(n)
        b = rng.standard_normal((7, n))
        L = np.asarray(cholesky_small(jnp.asarray(A)))
        np.testing.assert_allclose(L @ np.swapaxes(L, -1, -2), A,
                                   rtol=1e-5, atol=1e-6)
        x = np.asarray(spd_solve_small(jnp.asarray(A), jnp.asarray(b)))
        want = np.stack([np.linalg.solve(A[i], b[i]) for i in range(7)])
        np.testing.assert_allclose(x, want, rtol=2e-4, atol=1e-6)
        inv = np.asarray(spd_inverse_small(jnp.asarray(A)))
        winv = np.stack([np.linalg.inv(A[i]) for i in range(7)])
        np.testing.assert_allclose(inv, winv, rtol=2e-3, atol=1e-6)
    # indefinite input: floored factor stays finite (the regularization
    # the damped-Newton caller wants instead of NaNs)
    bad = np.array([[1.0, 0.0], [0.0, -2.0]])
    L = np.asarray(cholesky_small(jnp.asarray(bad)))
    assert np.all(np.isfinite(L))


def test_fit_map_matches_posterior():
    """Well-constrained problem: MAP lands on the truth, the Laplace
    sigmas track the MCMC posterior widths, and the mode is interior."""
    shape = MBBShape(opthin=True, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    flux, unc = _mock(true, shape, frac=0.02)
    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=5)
    fit.set_data(WAVE, flux, unc)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    r = fit.fit_map()
    assert r.interior
    assert r.grad_norm < 1.0
    assert np.all(np.isfinite(r.sigma))
    # MAP within ~3 sigma of truth on every free parameter
    truth_free = true[fit.free_space.free_idx]
    assert np.all(np.abs(r.x - truth_free) < 3.0 * r.sigma + 1e-3)

    fit.run(nburn=100, nsteps=400)
    # the optimizer's mode beats anything the chain sampled
    assert r.lnprob >= float(np.asarray(fit.lnprobability).max()) - 1e-3
    from mbb_emcee_tpu import MBBResults
    res = MBBResults(fit=fit)
    for k, name in enumerate(["T", "beta", "fnorm"]):
        cen = res.par_cen(name)
        mcmc_sig = 0.5 * (cen[1] + cen[2])
        assert 0.5 < r.sigma[k] / mcmc_sig < 2.0, (name, r.sigma[k],
                                                   mcmc_sig)


def test_fit_map_degenerate_flags_non_interior():
    """The exactly-determined full 5-parameter fit to 5 bands has a flat
    T-lambda0 ridge: the Laplace sigmas must come back finite (floored)
    and the result flagged non-interior -- 'run the MCMC'."""
    shape = MBBShape()
    true = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    flux, unc = _mock(true, shape)
    fit = MBBFitter(nwalkers=64, seed=5)
    fit.set_data(WAVE, flux, unc)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    r = fit.fit_map()
    assert np.all(np.isfinite(r.sigma))
    assert not r.interior


def test_run_map_batched_matches_single():
    """Batched triage equals the single-source fit per source, and works
    through the ragged encodings (missing band, per-source uplim)."""
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(8)
    S = 5
    trues = np.column_stack([
        rng.uniform(25.0, 40.0, S), rng.uniform(1.6, 2.1, S),
        np.full(S, 250.0), np.full(S, 4.0), rng.uniform(25.0, 55.0, S)])
    flux = np.stack([_mock(t, shape, seed=i)[0]
                     for i, t in enumerate(trues)])
    unc = np.stack([_mock(t, shape, seed=i)[1]
                    for i, t in enumerate(trues)])
    flux2 = flux.copy(); unc2 = unc.copy()
    flux2[2, 0] = np.nan; unc2[2, 0] = np.nan          # missing band
    m = np.zeros((S, NB), bool); m[3, NB - 1] = True   # per-source limit

    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)
    mf.set_data(WAVE, flux2, unc2)
    mf.set_phot_upperlimits(m)
    mf.run_map()
    assert mf.map_params.shape == (S, 5)
    assert np.all(np.isfinite(mf.map_lnprob))
    assert mf.map_cen("T").shape == (S, 2)
    # fixed-by-shape parameters report zero sigma
    assert np.all(mf.map_cen("lambda0")[:, 1] == 0.0)
    # sources with clean bands recover their truths
    clean = [0, 1, 4]
    assert np.all(np.abs(mf.map_params[clean, 0] - trues[clean, 0]) < 4.0)

    # per-source agreement with the single-source optimizer (well-
    # conditioned source, same data; starts differ so compare loosely
    # against the Laplace scale)
    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)
    fit.set_data(WAVE, flux[0], unc[0])
    r0 = fit.fit_map()
    d = np.abs(r0.x - mf.map_params[0, mf.free_space.free_idx])
    assert np.all(d < 0.2 * r0.sigma + 1e-3), (d, r0.sigma)


def test_run_map_with_correlation():
    """MAP triage under the correlated error model (the whitening
    operand feeds straight through)."""
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(9)
    S = 4
    trues = np.column_stack([
        rng.uniform(25.0, 40.0, S), rng.uniform(1.6, 2.1, S),
        np.full(S, 250.0), np.full(S, 4.0), rng.uniform(25.0, 55.0, S)])
    R = 0.3 * np.ones((NB, NB)) + 0.7 * np.eye(NB)
    L = np.linalg.cholesky(R)
    flux, unc = [], []
    for t in trues:
        f = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        u = 0.03 * f
        flux.append(f + u * (L @ rng.standard_normal(NB)))  # cov = D R D
        unc.append(u)
    flux, unc = np.array(flux), np.array(unc)
    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)
    mf.set_data(WAVE, flux, unc)
    mf.set_band_correlation(R)
    mf.run_map()
    assert np.all(np.isfinite(mf.map_lnprob))
    # pulls under the MATCHED error model
    sig_T = mf.map_cen("T")[:, 1]
    pulls = (mf.map_params[:, 0] - trues[:, 0]) / np.maximum(sig_T, 1e-3)
    assert np.all(np.abs(pulls) < 4.0), (mf.map_params[:, 0], trues[:, 0],
                                         sig_T)


def test_run_map_hdf5_roundtrip(tmp_path):
    shape = MBBShape(opthin=True, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    flux, unc = _mock(true, shape)
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=3)
    mf.set_data(WAVE, np.stack([flux, flux * 1.1]),
                np.stack([unc, unc]))
    mf.run_map(nstarts=4)

    # triage-only artifact
    p1 = str(tmp_path / "map.h5")
    mf.write_map_h5(p1)
    import h5py
    with h5py.File(p1) as f:
        np.testing.assert_allclose(np.asarray(f["MAPFit"]["Params"]),
                                   mf.map_params)

    # MAPFit rides the full results file and from_h5 restores it
    mf.run(nburn=20, nsteps=40)
    p2 = str(tmp_path / "full.h5")
    mf.writeToHDF5(p2)
    back = MultiFitter.from_h5(p2)
    np.testing.assert_allclose(back.map_params, mf.map_params)
    np.testing.assert_allclose(back.map_sigma, mf.map_sigma)
    np.testing.assert_array_equal(back.map_interior, mf.map_interior)
    assert back.map_cen("T").shape == (2, 2)


def test_map_seeded_mcmc():
    """run(init='map'): the triage-then-refine workflow -- walkers start
    in the typical set, so a SHORT burn already yields a converged-ish,
    truth-covering posterior."""
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(11)
    S = 4
    trues = np.column_stack([
        rng.uniform(25.0, 40.0, S), rng.uniform(1.6, 2.1, S),
        np.full(S, 250.0), np.full(S, 4.0), rng.uniform(25.0, 55.0, S)])
    flux = np.stack([_mock(t, shape, seed=20 + i)[0]
                     for i, t in enumerate(trues)])
    unc = np.stack([_mock(t, shape, seed=20 + i)[1]
                    for i, t in enumerate(trues)])
    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)
    mf.set_data(WAVE, flux, unc)
    with pytest.raises(RuntimeError, match="run_map"):
        mf.run(nburn=4, nsteps=8, init="map")
    mf.run_map(nstarts=4)
    mf.run(nburn=20, nsteps=150, init="map")
    cen = mf.par_cen("T")
    err = np.maximum(cen[:, 1], cen[:, 2])
    assert np.all(np.abs(cen[:, 0] - trues[:, 0]) < 5.0 * err)
    af = mf.acceptance_fraction.mean(axis=1)
    assert np.all(af > 0.15) and np.all(af < 0.8)


def test_map_importance_matches_mcmc():
    """Importance-refined Laplace posteriors agree with the MCMC on
    well-conditioned sources (the whole point: MCMC-quality summaries
    without MCMC), and ESS reflects Gaussian-ness."""
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(13)
    S = 4
    trues = np.column_stack([
        rng.uniform(27.0, 38.0, S), rng.uniform(1.7, 2.0, S),
        np.full(S, 250.0), np.full(S, 4.0), rng.uniform(30.0, 50.0, S)])
    flux = np.stack([_mock(t, shape, frac=0.02, seed=30 + i)[0]
                     for i, t in enumerate(trues)])
    unc = np.stack([_mock(t, shape, frac=0.02, seed=30 + i)[1]
                    for i, t in enumerate(trues)])
    mf = MultiFitter(nwalkers=96, opthin=True, noalpha=True, seed=3)
    mf.set_data(WAVE, flux, unc)
    mf.run_map()
    ess = mf.map_importance(nsamples=512)
    assert ess.shape == (S,)
    assert np.all(ess > 100), ess      # near-Gaussian posteriors
    cen_is = mf.map_par_cen("T")

    mf.run(nburn=120, nsteps=500, init="map")
    cen_mc = mf.par_cen("T")
    # medians agree within the Monte-Carlo scale, widths within ~30%
    sig = 0.5 * (cen_mc[:, 1] + cen_mc[:, 2])
    assert np.all(np.abs(cen_is[:, 0] - cen_mc[:, 0]) < 0.5 * sig), (
        cen_is[:, 0], cen_mc[:, 0], sig)
    w_is = 0.5 * (cen_is[:, 1] + cen_is[:, 2])
    assert np.all(np.abs(w_is / sig - 1.0) < 0.35), (w_is, sig)

    # fixed parameters report zero errors
    assert np.all(mf.map_par_cen("lambda0")[:, 1:] == 0.0)
    # guard: importance sampling needs run_map first
    mf2 = MultiFitter(nwalkers=16, opthin=True, noalpha=True)
    mf2.set_data(WAVE, flux, unc)
    with pytest.raises(RuntimeError, match="run_map"):
        mf2.map_importance()


def test_run_map_wave_change_not_stale():
    """Regression (review): the run_map compile cache must not bake in
    stale wavelengths -- same-shape new data with DIFFERENT wavelengths
    must produce different MAP fits."""
    shape = MBBShape(opthin=True, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 4.0, 45.0])
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=3)

    wave2 = WAVE * 1.6
    f1 = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                            jnp.asarray(WAVE, jnp.float32), shape),
                    np.float64)
    f2 = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                            jnp.asarray(wave2, jnp.float32), shape),
                    np.float64)
    mf.set_data(WAVE, f1[None, :], 0.03 * f1[None, :])
    mf.run_map(nstarts=4)
    t1 = float(mf.map_params[0, 0])
    mf.set_data(wave2, f2[None, :], 0.03 * f2[None, :])
    mf.run_map(nstarts=4)
    t2 = float(mf.map_params[0, 0])
    # same true T fits both, but a stale-wave program would return the
    # FIRST fit's numbers identically; with correct plumbing both land
    # near the truth from different data
    assert abs(t1 - true[0]) < 5.0 and abs(t2 - true[0]) < 5.0
    assert not np.allclose(mf._map_data[2], WAVE)


def test_map_importance_floored_source_gets_zero_ess():
    """Regression (review): an all-out-of-box Laplace proposal (floored
    degenerate covariance) must report ess ~ 0 and NaN errors, never a
    perfect certificate built from uniform floor weights."""
    shape = MBBShape(opthin=True, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 4.0, 45.0])
    flux, unc = _mock(true, shape)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=3)
    mf.set_data(WAVE, flux[None, :], unc[None, :])
    mf.run_map(nstarts=4)
    # sabotage: a proposal 1e9x too wide puts essentially every draw
    # outside the box
    mf.map_cov = mf.map_cov * 1e18
    ess = mf.map_importance(nsamples=64)
    assert ess[0] < 5.0, ess
    if ess[0] == 0.0:
        cen = mf.map_par_cen("T")
        assert np.isnan(cen[0, 1]) and cen[0, 0] == mf.map_params[0, 0]


def test_map_staleness_guards():
    """Regression (review): init='map' and map_importance refuse stored
    MAP results after the posterior or data changed -- including a
    same-nfree change of WHICH parameters are free."""
    shape = MBBShape(opthin=False, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 4.0, 45.0])
    flux, unc = _mock(true, shape)
    mf = MultiFitter(nwalkers=16, opthin=False, noalpha=True, seed=3)
    mf.set_data(WAVE, flux[None, :], unc[None, :])
    mf.fix_param("T", 32.0)            # free: beta, lambda0, fnorm
    mf.run_map(nstarts=4)
    mf.unfix_param("T")
    mf.fix_param("beta", 1.9)          # free: T, lambda0, fnorm (same nfree)
    with pytest.raises(RuntimeError, match="re-run"):
        mf.run(nburn=4, nsteps=8, init="map")
    with pytest.raises(RuntimeError, match="re-run"):
        mf.map_importance(nsamples=16)
    # data change is refused too
    mf2 = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=3)
    mf2.set_data(WAVE, flux[None, :], unc[None, :])
    mf2.run_map(nstarts=4)
    mf2.set_data(WAVE, flux[None, :] * 1.1, unc[None, :])
    with pytest.raises(RuntimeError, match="re-run"):
        mf2.run(nburn=4, nsteps=8, init="map")


def test_single_fit_map_importance():
    """MBBFitter.map_importance: MCMC-quality single-fit summaries
    without MCMC, covariance likelihood included."""
    shape = MBBShape(opthin=True, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 4.0, 45.0])
    flux, unc = _mock(true, shape, frac=0.02)
    cov = 0.3 * np.outer(unc, unc) + 0.7 * np.diag(unc ** 2)
    fit = MBBFitter(nwalkers=96, opthin=True, noalpha=True, seed=5)
    fit.set_data(WAVE, flux, unc, cov=cov)
    with pytest.raises(RuntimeError, match="fit_map"):
        fit.map_importance()
    fit.fit_map()
    x, logw, ess = fit.map_importance(nsamples=2048)
    assert ess > 400, ess
    cen_is = fit.map_par_cen("T")
    # fixed-by-shape parameter: carried value, zero errors
    np.testing.assert_allclose(fit.map_par_cen("lambda0")[1:], 0.0)

    fit.run(nburn=120, nsteps=500)
    from mbb_emcee_tpu import MBBResults
    cen_mc = MBBResults(fit=fit).par_cen("T")
    sig = 0.5 * (cen_mc[1] + cen_mc[2])
    assert abs(cen_is[0] - cen_mc[0]) < 0.5 * sig
    assert abs(0.5 * (cen_is[1] + cen_is[2]) / sig - 1.0) < 0.35


def test_single_fit_map_seeded_mcmc():
    """MBBFitter.run(init='map'): the single-fit triage-then-refine
    workflow (mirrors MultiFitter.run(init='map')), plus its guards --
    no fit_map yet, new data invalidating the mode, p0/resume conflicts,
    and a changed parameter space."""
    shape = MBBShape(opthin=True, noalpha=True)
    true = np.array([32.0, 1.9, 250.0, 4.0, 45.0])
    flux, unc = _mock(true, shape, seed=5)
    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=9)
    fit.set_data(WAVE, flux, unc)

    with pytest.raises(RuntimeError, match="fit_map"):
        fit.run(nburn=4, nsteps=8, init="map")
    with pytest.raises(ValueError, match="init"):
        fit.run(nburn=4, nsteps=8, init="bogus")

    fit.fit_map(nstarts=4)
    with pytest.raises(ValueError, match="p0"):
        fit.run(nburn=4, nsteps=8, init="map",
                p0=np.tile(true[[0, 1, 4]], (64, 1)))

    fit.run(nburn=20, nsteps=150, init="map")
    cen = fit.chain[..., 0]
    med = np.median(cen)
    assert abs(med - true[0]) < 6.0
    af = float(np.mean(fit.acceptance_fraction))
    assert 0.15 < af < 0.8
    assert fit.converged(rhat_max=2.0)          # loose smoke of the helper
    assert isinstance(fit.converged(rhat_max=1.0001, tau_mult=1e9), bool)

    # new data invalidates the stored mode (init='map' and
    # map_importance must not silently reuse it)
    fit.set_data(WAVE, flux * 1.5, unc * 1.5)
    with pytest.raises(RuntimeError, match="fit_map"):
        fit.run(nburn=4, nsteps=8, init="map")

    # changed parameter space since fit_map
    fit2 = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=9)
    fit2.set_data(WAVE, flux, unc)
    fit2.fit_map(nstarts=4)
    fit2.fix_param("beta", 1.9)
    with pytest.raises(RuntimeError, match="parameter space"):
        fit2.run(nburn=4, nsteps=8, init="map")

    # Regression (review): posterior edits that keep the free-parameter
    # COUNT unchanged -- a prior, a moved box limit, an uplim mask --
    # must also invalidate the stored mode (the size-only check missed
    # them; the Laplace ball would seed at the OLD posterior's mode)
    fit3 = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=9)
    fit3.set_data(WAVE, flux, unc)
    fit3.fit_map(nstarts=4)
    fit3.set_gaussian_prior("T", 20.0, 1.0)
    with pytest.raises(RuntimeError, match="re-run"):
        fit3.run(nburn=4, nsteps=8, init="map")
    with pytest.raises(RuntimeError, match="re-run"):
        fit3.map_importance(nsamples=16)
    fit3.fit_map(nstarts=4)                    # refresh clears the guard
    fit3.set_uplim("T", 38.0)
    with pytest.raises(RuntimeError, match="re-run"):
        fit3.run(nburn=4, nsteps=8, init="map")
    fit3.fit_map(nstarts=4)
    fit3.set_phot_upperlimits(np.array([0, 0, 0, 0, 1], bool))
    with pytest.raises(RuntimeError, match="re-run"):
        fit3.run(nburn=4, nsteps=8, init="map")
    fit3.fit_map(nstarts=4)
    fit3.run(nburn=4, nsteps=8, init="map")    # fresh: accepted
