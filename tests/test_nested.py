"""Nested-sampling tests (nested.py). ADDITIVE capability over the
reference (SURVEY.md C5/C6 offer no evidence computation): validated the
way evidence codes are validated -- analytic Gaussian evidences, Bayes
factors with known sign and magnitude, posterior-moment recovery from
the weighted dead points, and the fitter/HDF5 integration surface.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.nested import nested_sample, nested_sample_batch
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.multifit import MultiFitter
from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody
from mbb_emcee_tpu.results import MBBResults

MU = np.array([0.5, -0.3, 1.0])
SIG = np.array([0.1, 0.2, 0.15])
LOWER = np.array([-2.0, -2.0, -1.0])
UPPER = np.array([3.0, 2.0, 3.0])
LNV = float(np.log(np.prod(UPPER - LOWER)))


def _gauss_ll(mu=MU, sig=SIG):
    mu = jnp.asarray(mu, jnp.float32)
    sig = jnp.asarray(sig, jnp.float32)
    lognorm = jnp.sum(jnp.log(sig * np.sqrt(2.0 * np.pi)))

    def ll(x):
        return -0.5 * jnp.sum(((x - mu) / sig) ** 2) - lognorm

    return ll


def _run(seed=0, **kw):
    kw.setdefault("nlive", 400)
    kw.setdefault("nbatch", 32)
    kw.setdefault("nsteps", 24)
    return nested_sample(_gauss_ll(), LOWER, UPPER,
                         jax.random.PRNGKey(seed), **kw)


def test_truncated_run_flagged_and_warned():
    """Hitting max_iter before the termination bound must not pass
    silently: converged=False on the result plus a UserWarning (a
    truncated lnZ is biased low and poisons Bayes factors)."""
    with pytest.warns(UserWarning, match="max_iter"):
        r = _run(max_iter=3, nlive=64, nbatch=8, nsteps=4)
    assert r.converged is False
    assert r.n_iter == 3
    # a normal run converges and is flagged as such
    r = _run(nlive=64, nbatch=8, nsteps=8)
    assert r.converged is True

    # batch path: per-source flags + one aggregated warning
    data = (jnp.asarray(np.stack([MU, MU + 0.1]), jnp.float32),)

    def ll(x, mu):
        return -0.5 * jnp.sum(((x - mu) / 0.1) ** 2)

    with pytest.warns(UserWarning, match="2/2 sources"):
        rb = nested_sample_batch(ll, LOWER, UPPER, jax.random.PRNGKey(0),
                                 data, nlive=64, nbatch=8, nsteps=4,
                                 max_iter=3)
    assert rb.converged.tolist() == [False, False]
    assert rb[0].converged is False


def test_program_token_shares_ll_unit():
    """Two calls with the same program_token reuse ONE ll_unit closure
    (the static jit argument), so the max_iter while_loop traces once;
    a different token splits."""
    from mbb_emcee_tpu.sampler import _PROGRAM_LRU
    kw = dict(nlive=64, nbatch=8, nsteps=8)
    r1 = nested_sample(_gauss_ll(), LOWER, UPPER, jax.random.PRNGKey(3),
                       program_token="tok-a", **kw)
    n_entries = sum(1 for k in _PROGRAM_LRU
                    if isinstance(k, tuple) and k[0] == "nested-llunit")
    r2 = nested_sample(_gauss_ll(), LOWER, UPPER, jax.random.PRNGKey(3),
                       program_token="tok-a", **kw)
    assert sum(1 for k in _PROGRAM_LRU
               if isinstance(k, tuple)
               and k[0] == "nested-llunit") == n_entries
    assert r1.logz == r2.logz                   # bitwise same program
    nested_sample(_gauss_ll(), LOWER, UPPER, jax.random.PRNGKey(3),
                  program_token="tok-b", **kw)
    assert sum(1 for k in _PROGRAM_LRU
               if isinstance(k, tuple)
               and k[0] == "nested-llunit") == n_entries + 1


def test_gaussian_evidence_analytic():
    """The normalized Gaussian integrates to 1 well inside the box, so
    lnZ (w.r.t. the normalized uniform box prior) must be -ln V."""
    r = _run()
    assert r.logz_err < 0.25
    assert abs(r.logz - (-LNV)) < max(4.0 * r.logz_err, 0.05)
    # Skilling information for a Gaussian in this box: ln(V / (2*pi*e)^{d/2}
    # prod sig) -- check the estimate is in the right ballpark.
    h_true = LNV - np.sum(np.log(SIG * np.sqrt(2 * np.pi * np.e)))
    assert abs(r.h - h_true) < 1.0


def test_posterior_moments_from_weighted_samples():
    r = _run(seed=1)
    w = r.posterior_weights()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert np.all(w >= 0.0)
    mean = r.posterior_mean()
    np.testing.assert_allclose(mean, MU, atol=0.03)
    var = ((r.samples - mean) ** 2 * w[:, None]).sum(axis=0)
    np.testing.assert_allclose(np.sqrt(var), SIG, rtol=0.15)
    draws = r.resample(4000, seed=3)
    np.testing.assert_allclose(draws.mean(axis=0), MU, atol=0.04)


def test_bayes_factor_detects_wrong_model():
    """Fixed likelihood (data peaked at MU); model A's prior box contains
    the truth, model B's excludes it (starts 4 sigma above). The Bayes
    factor must be decisively (> 5 nats) in model A's favor."""
    key = jax.random.PRNGKey(2)
    ll = _gauss_ll()
    ra = nested_sample(ll, LOWER, UPPER, key,
                       nlive=400, nbatch=32, nsteps=24)
    rfar = nested_sample(ll, MU + 4.0 * SIG, MU + 24.0 * SIG, key,
                         nlive=400, nbatch=32, nsteps=24)
    assert ra.logz - rfar.logz > 5.0

    # Evidence is translation-invariant: recentering the Gaussian well
    # inside the same box leaves lnZ unchanged within the error bars.
    rb = nested_sample(_gauss_ll(mu=MU - 5.0 * SIG), LOWER, UPPER, key,
                       nlive=400, nbatch=32, nsteps=24)
    assert abs(ra.logz - rb.logz) < max(
        6.0 * np.hypot(ra.logz_err, rb.logz_err), 0.1)


def test_determinism_and_validation():
    r1, r2, r3 = _run(seed=7), _run(seed=7), _run(seed=8)
    assert r1.logz == r2.logz
    assert np.array_equal(r1.samples, r2.samples)
    assert r1.logz != r3.logz
    with pytest.raises(ValueError, match="finite"):
        nested_sample(_gauss_ll(), np.array([-np.inf, 0, 0]), UPPER,
                      jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="nbatch"):
        nested_sample(_gauss_ll(), LOWER, UPPER, jax.random.PRNGKey(0),
                      nlive=32, nbatch=32)


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
    # An honest, narrow prior box around the fit (evidence runs should
    # state their prior; the package default box is deliberately huge).
    f.set_lowlim("T", 15.0); f.set_uplim("T", 60.0)
    f.set_lowlim("beta", 0.5); f.set_uplim("beta", 4.0)
    f.set_lowlim("fnorm", 5.0); f.set_uplim("fnorm", 200.0)
    return f


def test_fitter_compute_evidence():
    f = _mock_fit(seed=5)
    ev = f.compute_evidence(nlive=256, nbatch=32, nsteps=16, seed=5)
    assert np.isfinite(ev.logz) and ev.logz_err > 0.0
    assert f.evidence is ev
    # samples come back in FULL 5-parameter space
    assert ev.samples.shape[1] == 5
    # The weighted dead points ARE posterior samples: their mean must
    # agree with the stretch-move MCMC posterior on the same data to
    # within a fraction of the posterior width.
    w = ev.posterior_weights()
    mean = (w[:, None] * ev.samples).sum(axis=0)
    fm = _mock_fit(seed=5)
    fm.run(nburn=100, nsteps=400)
    rm = MBBResults(fit=fm)
    for i, p in ((0, "T"), (1, "beta"), (4, "fnorm")):
        med, up, lo = rm.par_cen(p)
        assert abs(mean[i] - med) < 0.5 * (up + lo), p
    # determinism through the fitter surface
    ev2 = _mock_fit(seed=5).compute_evidence(nlive=256, nbatch=32,
                                             nsteps=16, seed=5)
    assert ev2.logz == ev.logz


def test_evidence_hdf5_roundtrip(tmp_path):
    f = _mock_fit(seed=6)
    f.run(nburn=40, nsteps=60)
    f.compute_evidence(nlive=128, nbatch=16, nsteps=12, seed=6)
    res = MBBResults(fit=f)
    assert res.evidence is f.evidence
    path = os.path.join(tmp_path, "fit.h5")
    res.writeToHDF5(path)
    back = MBBResults(h5file=path)
    assert back.evidence is not None
    np.testing.assert_allclose(back.evidence.logz, f.evidence.logz,
                               rtol=1e-6)
    np.testing.assert_allclose(back.evidence.samples, f.evidence.samples,
                               rtol=1e-6)
    assert back.evidence.n_like == f.evidence.n_like
    w = back.evidence.posterior_weights()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)


def _batch_ll():
    sig = jnp.asarray(SIG, jnp.float32)
    lognorm = float(np.sum(np.log(SIG * np.sqrt(2.0 * np.pi))))

    def ll(x, mu):
        return -0.5 * jnp.sum(((x - mu) / sig) ** 2) - lognorm

    return ll


def test_batch_gaussian_evidences():
    """S sources = S Gaussian centers; every per-source lnZ must match
    the analytic -ln V, and per-source posterior means the centers --
    including sources whose runs terminate at different iterations."""
    centers = np.stack([MU, MU + 0.8, MU - 0.5, MU * 0.0], axis=0)
    r = nested_sample_batch(_batch_ll(), LOWER, UPPER,
                            jax.random.PRNGKey(3),
                            (jnp.asarray(centers, jnp.float32),),
                            nlive=400, nbatch=32, nsteps=24)
    assert r.nsources == 4
    for s in range(4):
        assert abs(r.logz[s] - (-LNV)) < max(4.0 * r.logz_err[s], 0.06), s
    np.testing.assert_allclose(r.posterior_mean(), centers, atol=0.05)
    w = r.posterior_weights()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-6)
    # per-source extraction agrees with the batched summaries
    one = r[2]
    assert one.logz == float(r.logz[2])
    np.testing.assert_allclose(one.posterior_mean(), centers[2], atol=0.05)


def test_batch_matches_single_bitwise():
    """The vmapped while_loop keeps iterating until the SLOWEST source
    finishes; a finished source's masked body must be an exact identity,
    so a batched run reproduces each single-source run bitwise when fed
    the same per-source key. Source 1's much wider Gaussian makes its
    run terminates much EARLIER (a nearly-flat likelihood has little
    information to accumulate), forcing it through many masked
    iterations while source 0's narrow peak keeps shrinking."""
    widths = np.stack([0.3 * np.ones(3), 3.0 * np.ones(3)], axis=0)

    def ll(x, w):
        return -0.5 * jnp.sum(((x - jnp.asarray(MU, jnp.float32)) / w) ** 2)

    key = jax.random.PRNGKey(9)
    r = nested_sample_batch(ll, LOWER, UPPER, key,
                            (jnp.asarray(widths, jnp.float32),),
                            nlive=200, nbatch=16, nsteps=12)
    assert r.n_iter[1] < r.n_iter[0]
    # replicate the EARLY-finishing source 1 exactly (same derived key,
    # same data): it sat frozen for n_iter[0]-n_iter[1] masked
    # iterations in the batch, so equality proves the mask is identity
    keys = jax.random.split(key, 4)
    from mbb_emcee_tpu.nested import _nested_run
    u0 = jax.random.uniform(keys[1], (200, 3), jnp.float32)
    w0 = jnp.asarray(widths[1], jnp.float32)
    lo = np.asarray(LOWER, np.float32)
    wd = np.asarray(UPPER - LOWER, np.float32)

    def ll_unit(u, w):
        return ll(lo + wd * u, w)

    lnl0 = jax.vmap(lambda x: ll_unit(x, w0))(u0)
    out = _nested_run(keys[3], ll_unit, u0, lnl0, (w0,), 200, 16, 12,
                      3000, 2.0, float(np.log(1e-4)))
    it_single, done_single, lnz_single = (int(out[0]), bool(out[1]),
                                          float(out[2]))
    assert it_single == int(r.n_iter[1])
    assert done_single and bool(r.converged[1])
    assert lnz_single == float(r.logz[1])


def test_multifitter_compute_evidence():
    """Batched evidence through the serving surface: S=3 synthetic
    sources; per-source lnZ finite and the weighted dead points must
    reproduce each source's own MCMC posterior mean (T is genuinely
    weakly constrained by 4 bands here -- truth is NOT the posterior,
    the stretch-move chain is)."""
    rng = np.random.default_rng(21)
    wave = np.array([250.0, 350.0, 500.0, 850.0])
    Ts = np.array([25.0, 32.0, 40.0])
    fn = np.array([30.0, 50.0, 80.0])
    flux = np.empty((3, 4))
    for s in range(3):
        m = ModifiedBlackbody(T=Ts[s], beta=1.8, lambda0=250.0, alpha=2.0,
                              fnorm=fn[s], opthin=True, noalpha=True)
        flux[s] = np.asarray(m(wave))
    unc = 0.05 * flux
    flux = flux + rng.normal(0.0, unc)

    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True)
    mf.set_data(wave, flux, unc)
    mf.set_lowlim("T", 10.0); mf.set_uplim("T", 70.0)
    mf.set_lowlim("beta", 0.5); mf.set_uplim("beta", 4.0)
    mf.set_lowlim("fnorm", 5.0); mf.set_uplim("fnorm", 300.0)
    r = mf.compute_evidence(nlive=256, nbatch=32, nsteps=16, seed=4)
    assert r is mf.evidence
    assert r.logz.shape == (3,) and np.all(np.isfinite(r.logz))
    assert r.samples.shape[2] == 5   # full parameter space
    mean = r.posterior_mean()
    mf.run(nburn=150, nsteps=500)
    flat = np.asarray(mf.chain).reshape(3, -1, 5)
    mcmc_mean = flat.mean(axis=1)
    mcmc_std = flat.std(axis=1)
    for i in (0, 1, 4):   # T, beta, fnorm
        np.testing.assert_array_less(
            np.abs(mean[:, i] - mcmc_mean[:, i]), 0.35 * mcmc_std[:, i])
    # determinism through the serving surface
    r2 = mf.compute_evidence(nlive=256, nbatch=32, nsteps=16, seed=4)
    np.testing.assert_array_equal(r.logz, r2.logz)
    # results(i) forwards the per-source evidence exactly as a
    # single-source compute_evidence() would have left it
    res0 = mf.results(0)
    assert res0.evidence is not None
    assert res0.evidence.logz == pytest.approx(float(r.logz[0]))


@pytest.mark.slow
def test_mbb_model_comparison_thin_vs_thick():
    """Data generated from an optically THIN greybody: the Bayes factor
    between the thin model and the thick model (extra lambda0 parameter
    the data cannot constrain) must not favor thick -- the Occam penalty
    for the unconstrained lambda0 axis goes the thin model's way."""
    def make(opthin):
        f = _mock_fit(seed=9)
        if not opthin:
            g = MBBFitter(nwalkers=64, opthin=False, noalpha=True)
            g.set_data(f.phot.wave, f.phot.flux, f.phot.unc)
            g.set_lowlim("T", 15.0); g.set_uplim("T", 60.0)
            g.set_lowlim("beta", 0.5); g.set_uplim("beta", 4.0)
            g.set_lowlim("fnorm", 5.0); g.set_uplim("fnorm", 200.0)
            g.set_lowlim("lambda0", 10.0); g.set_uplim("lambda0", 2000.0)
            return g
        return f

    z_thin = make(True).compute_evidence(nlive=400, nbatch=32,
                                         nsteps=24, seed=1)
    z_thick = make(False).compute_evidence(nlive=400, nbatch=32,
                                           nsteps=24, seed=1)
    err = np.hypot(z_thin.logz_err, z_thick.logz_err)
    assert z_thin.logz - z_thick.logz > -3.0 * err
