"""HMC sampler tests. The gradient-based path is ADDITIVE capability
over the reference (upstream mbb_emcee samples only with emcee's
gradient-free stretch move; SURVEY.md C5): correctness is checked the
same way as the stretch sampler -- known-Gaussian moment recovery,
bitwise determinism, and posterior agreement with the stretch move on a
real MBB fit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.hmc import hmc_sample
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody
from mbb_emcee_tpu.results import MBBResults

MEAN = np.array([1.0, -2.0, 0.5])
SIG = np.array([0.8, 1.5, 0.3])
LOWER = MEAN - 12.0 * SIG
UPPER = MEAN + 12.0 * SIG


def _lnprob_gauss(theta):
    d = (theta - jnp.asarray(MEAN, jnp.float32)) / jnp.asarray(
        SIG, jnp.float32)
    return -0.5 * jnp.sum(d * d)


def _run_gauss(seed=0, nchains=32, nwarmup=300, nsteps=600):
    key = jax.random.PRNGKey(seed)
    key, kb = jax.random.split(key)
    x0 = MEAN + 0.1 * SIG * np.asarray(
        jax.random.normal(kb, (nchains, 3)))
    return hmc_sample(_lnprob_gauss, LOWER, UPPER, x0, key,
                      nwarmup=nwarmup, nsteps=nsteps)


def test_gaussian_moments():
    res = _run_gauss()
    flat = np.asarray(res.chain).reshape(-1, 3)
    assert np.all(np.abs(flat.mean(axis=0) - MEAN) < 0.08 * SIG)
    np.testing.assert_allclose(flat.std(axis=0), SIG, rtol=0.08)
    # The adapted diagonal metric should reflect the (logit-warped)
    # posterior scales: larger sigma -> smaller mass, monotonically.
    assert res.mass[2] > res.mass[0] > res.mass[1]


def test_acceptance_near_target():
    res = _run_gauss()
    af = res.acceptance_fraction
    assert 0.6 < af.mean() < 0.95
    assert af.min() > 0.3


def test_determinism_bitwise():
    c1 = np.asarray(_run_gauss(seed=5).chain)
    c2 = np.asarray(_run_gauss(seed=5).chain)
    c3 = np.asarray(_run_gauss(seed=6).chain)
    assert np.array_equal(c1, c2)
    assert not np.array_equal(c1, c3)


def test_thin_and_shapes():
    res = _run_gauss(nsteps=100)
    assert res.chain.shape == (100, 32, 3)
    key = jax.random.PRNGKey(0)
    x0 = np.tile(MEAN, (8, 1))
    res = hmc_sample(_lnprob_gauss, LOWER, UPPER, x0, key,
                     nwarmup=50, nsteps=60, thin=3)
    assert res.chain.shape == (20, 8, 3)
    assert res.lnprob.shape == (20, 8)
    with pytest.raises(ValueError, match="divisible"):
        hmc_sample(_lnprob_gauss, LOWER, UPPER, x0, key,
                   nwarmup=10, nsteps=10, thin=3)
    # Regression (review): nsteps=0 passed 0 % thin and produced an
    # empty chain with a divide-by-zero acceptance fraction
    with pytest.raises(ValueError, match="positive"):
        hmc_sample(_lnprob_gauss, LOWER, UPPER, x0, key,
                   nwarmup=10, nsteps=0)


def test_infinite_bounds_rejected():
    key = jax.random.PRNGKey(0)
    x0 = np.tile(MEAN, (4, 1))
    bad = np.array([-np.inf, LOWER[1], LOWER[2]])
    with pytest.raises(ValueError, match="finite box"):
        hmc_sample(_lnprob_gauss, bad, UPPER, x0, key,
                   nwarmup=10, nsteps=10)


def _mock_fit(**kw):
    rng = np.random.default_rng(11)
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0])
    true = ModifiedBlackbody(T=32.0, beta=1.9, lambda0=250.0, alpha=2.0,
                             fnorm=40.0, opthin=True, noalpha=True)
    flux = np.asarray(true(wave))
    unc = 0.05 * flux
    flux = flux + rng.normal(0.0, unc)
    f = MBBFitter(nwalkers=64, opthin=True, noalpha=True, **kw)
    f.set_data(wave, flux, unc)
    return f


def test_run_hmc_matches_stretch_posterior():
    """HMC and the stretch move target the identical posterior: medians
    and widths on a well-constrained 3-param opthin fit must agree to
    within MC error."""
    fh = _mock_fit(seed=3)
    fh.run_hmc(nwarmup=250, nsteps=500, nchains=32)
    rh = MBBResults(fit=fh)

    fs = _mock_fit(seed=4)
    fs.run(nburn=300, nsteps=800)
    rs = MBBResults(fit=fs)

    for p in ("T", "beta", "fnorm"):
        ch, cs = rh.par_cen(p), rs.par_cen(p)
        assert abs(ch[0] - cs[0]) < 0.35 * (cs[1] + cs[2]), p
        np.testing.assert_allclose(ch[1] + ch[2], cs[1] + cs[2],
                                   rtol=0.30, err_msg=p)
    assert 0.5 < fh.acceptance_fraction.mean() < 0.95


def test_run_hmc_downstream_analysis():
    f = _mock_fit(seed=9)
    f.run_hmc(nwarmup=120, nsteps=200, nchains=16, thin=2)
    assert f.chain_free.shape == (100, 16, 3)
    r = MBBResults(fit=f)
    # Regression (review): nchains != the configured nwalkers -- the
    # persisted walker count must match the stored Chain axis, not the
    # stale constructor value.
    assert r.nwalkers == 16
    assert r.chain.shape[0] == 16
    assert np.isfinite(r.best_fit[1])
    rhat = f.gelman_rubin()
    assert np.all(np.isfinite(rhat))
    tau = f.autocorrelation_time()
    assert np.all(np.isfinite(tau))
    with pytest.raises(RuntimeError, match="run_hmc"):
        f.extend(100)


def test_run_hmc_uplims_and_covariance():
    """HMC differentiates through the one-sided upper-limit penalty and
    the covariance whitening (paths the fused Pallas kernel refuses);
    posteriors must stay finite and the detection bands constrained."""
    rng = np.random.default_rng(21)
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0])
    true = ModifiedBlackbody(T=32.0, beta=1.9, lambda0=250.0, alpha=2.0,
                             fnorm=40.0, opthin=True, noalpha=True)
    flux = np.asarray(true(wave))
    unc = 0.05 * flux
    cov = np.diag(unc**2) + 0.2 * np.outer(unc, unc) * (
        1 - np.eye(5))
    flux = flux + rng.multivariate_normal(np.zeros(5), cov)
    flux[4] = 0.5 * flux[4]          # last band: upper limit only
    f = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=6)
    f.set_data(wave, flux, unc, cov=cov)
    f.set_phot_upperlimits([False, False, False, False, True])
    f.run_hmc(nwarmup=150, nsteps=250, nchains=24)
    r = MBBResults(fit=f)
    assert 0.3 < f.acceptance_fraction.mean() <= 1.0
    c = r.par_cen("T")
    assert np.all(np.isfinite(c)) and c[0] > 0


# -- batched serving path: MultiFitter.run_hmc ------------------------------

def _mock_batch(S=3, seed=7, **kw):
    from mbb_emcee_tpu.multifit import MultiFitter
    rng = np.random.default_rng(seed)
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0])
    T = np.linspace(26.0, 34.0, S)
    fn = np.linspace(30.0, 55.0, S)
    flux = np.stack([np.asarray(ModifiedBlackbody(
        T=T[i], beta=1.9, lambda0=250.0, alpha=2.0, fnorm=fn[i],
        opthin=True, noalpha=True)(wave)) for i in range(S)])
    unc = 0.05 * flux
    flux = flux + rng.normal(0.0, unc)
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True,
                     sampler_backend="xla", **kw)
    # Constrain T to the physical range: with >=250 um photometry only,
    # the default box to 1000 K leaves most prior volume on the
    # degenerate Rayleigh-Jeans ridge (DESIGN.md), making medians and
    # widths run-dependent ridge-mass estimates rather than sampler
    # fidelity checks.
    mf.set_uplim("T", 80.0)
    mf.set_data(wave, flux, unc)
    return mf, T, fn


def test_multifit_run_hmc_matches_plain_run():
    """Batched HMC targets each source's own posterior: per-source
    medians and CI widths must agree with the plain batched stretch run
    within MC error, and each source must adapt its OWN step size."""
    mh, T, fn = _mock_batch(seed=7)
    mh.run_hmc(nwarmup=250, nsteps=500)
    assert mh.chain_free.shape == (3, 500, 32, 3)
    assert mh.acceptance_fraction.shape == (3, 32)
    assert 0.5 < mh.acceptance_fraction.mean() < 0.95
    assert mh.hmc_step_size.shape == (3,)
    assert mh.hmc_mass.shape == (3, 3)
    assert np.all(mh.hmc_step_size > 0)

    ms, _, _ = _mock_batch(seed=7)
    ms.run(nburn=300, nsteps=700)

    for p in ("T", "fnorm"):
        ch, cs = mh.par_cen(p), ms.par_cen(p)   # (S, 3)
        assert np.all(np.abs(ch[:, 0] - cs[:, 0])
                      < 0.45 * (cs[:, 1] + cs[:, 2])), p
        wh, ws = ch[:, 1] + ch[:, 2], cs[:, 1] + cs[:, 2]
        np.testing.assert_allclose(wh, ws, rtol=0.35, err_msg=p)


def test_multifit_run_hmc_downstream(tmp_path):
    from mbb_emcee_tpu.multifit import MultiFitter
    mf, T, fn = _mock_batch(seed=11)
    mf.run_hmc(nwarmup=120, nsteps=150, thin=3)
    assert mf.chain_free.shape == (3, 50, 32, 3)
    assert np.all(np.isfinite(mf.gelman_rubin()))
    assert np.all(np.isfinite(mf.autocorrelation_time()))
    with pytest.raises(RuntimeError, match="extend"):
        mf.extend(100)
    r0 = mf.results(0, redshift=1.5)
    assert np.isfinite(r0.par_cen("T")[0])
    path = str(tmp_path / "batch_hmc.h5")
    mf.writeToHDF5(path)
    back = MultiFitter_from_h5(path)
    assert back.chain_free.shape == mf.chain_free.shape
    np.testing.assert_allclose(back.hmc_step_size, mf.hmc_step_size)
    np.testing.assert_allclose(back.hmc_mass, mf.hmc_mass)


def MultiFitter_from_h5(path):
    from mbb_emcee_tpu.multifit import MultiFitter
    return MultiFitter.from_h5(path)


@pytest.mark.slow
def test_multifit_run_hmc_mesh_statistical():
    """Source-sharded HMC over the virtual mesh samples the same
    posterior as the unsharded run. NOT bitwise: the dual-averaging
    statistic is a cross-chain float reduction whose XLA lowering
    differs between per-device batch sizes, and the adapted step size
    feeds chaotic dynamics -- so the contract is statistical."""
    from mbb_emcee_tpu.parallel import walker_mesh
    m1, _, _ = _mock_batch(S=4, seed=5)
    m1.run_hmc(nwarmup=250, nsteps=500)
    m2, _, _ = _mock_batch(S=4, seed=5, mesh=walker_mesh(4))
    m2.run_hmc(nwarmup=250, nsteps=500)
    np.testing.assert_allclose(m1.hmc_step_size, m2.hmc_step_size,
                               rtol=0.5)
    for p in ("T", "beta", "fnorm"):
        c1, c2 = m1.par_cen(p), m2.par_cen(p)
        assert np.all(np.abs(c1[:, 0] - c2[:, 0])
                      < 0.45 * (c1[:, 1] + c1[:, 2])), p
