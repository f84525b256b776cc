"""Parallel-tempering tests (tempering.py). ADDITIVE over the reference
(single-temperature emcee): validated on analytic targets -- cold-chain
moment recovery, decisive bimodal mixing where the plain stretch move
traps, thermodynamic-integration evidence against the analytic value
and against the nested sampler, determinism, and the single-program
trace guarantee.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.tempering import (
    ParallelTemperingSampler, pt_sample, geometric_ladder,
    thermodynamic_logz)
from mbb_emcee_tpu.sampler import EnsembleSampler

MU = np.array([1.0, -0.5, 2.0])
SIG = np.array([0.4, 0.8, 0.25])
LOWER = MU - 6.0 * SIG
UPPER = MU + 6.0 * SIG
LNV = float(np.sum(np.log(UPPER - LOWER)))
FLOOR = -1e30


def _boxed_gauss(mu=MU, sig=SIG, lower=LOWER, upper=UPPER):
    mu32 = jnp.asarray(mu, jnp.float32)
    sig32 = jnp.asarray(sig, jnp.float32)
    lo32 = jnp.asarray(lower, jnp.float32)
    hi32 = jnp.asarray(upper, jnp.float32)
    lognorm = float(np.sum(np.log(np.asarray(sig) * np.sqrt(2 * np.pi))))

    def lnprob(x):
        inbox = jnp.all((x >= lo32) & (x <= hi32))
        lnl = -0.5 * jnp.sum(((x - mu32) / sig32) ** 2) - lognorm
        return jnp.where(inbox, lnl, jnp.float32(FLOOR))

    return lnprob


def _ball(key, center, scatter, n):
    return center + scatter * np.asarray(
        jax.random.normal(key, (n, len(center))))


def test_cold_chain_moments_and_swaps():
    key = jax.random.PRNGKey(0)
    p0 = _ball(jax.random.PRNGKey(1), MU, 0.1 * SIG, 64)
    res = pt_sample(_boxed_gauss(), p0, key, nrungs=10,
                    nburn=300, nsteps=1200)
    flat = res.chain.reshape(-1, 3)
    assert np.all(np.abs(flat.mean(axis=0) - MU) < 0.1 * SIG)
    np.testing.assert_allclose(flat.std(axis=0), SIG, rtol=0.1)
    # every adjacent pair must actually exchange (a dead link would
    # disconnect the hot rungs from the cold chain)
    assert np.all(res.swap_fraction > 0.05)
    assert 0.1 < res.acceptance_fraction.mean() < 0.9


def test_evidence_analytic_and_vs_nested():
    """lnZ against the normalized uniform box prior is -ln V for a
    normalized Gaussian well inside the box: the stepping-stone
    estimator (headline), thermodynamic integration (diagnostic), and
    the nested sampler must all land on it."""
    key = jax.random.PRNGKey(2)
    p0 = _ball(jax.random.PRNGKey(3), MU, 0.1 * SIG, 64)
    res = pt_sample(_boxed_gauss(), p0, key, nrungs=16,
                    nburn=300, nsteps=1500)
    assert abs(res.logz - (-LNV)) < max(0.35, 5.0 * res.logz_err)
    assert abs(res.logz_ti - (-LNV)) < max(0.35, 3.0 * res.logz_ti_err)

    from mbb_emcee_tpu.nested import nested_sample
    rn = nested_sample(_boxed_gauss(), LOWER, UPPER,
                       jax.random.PRNGKey(4), nlive=400, nbatch=32,
                       nsteps=24)
    assert abs(res.logz - rn.logz) < max(
        0.4, 3.0 * np.hypot(res.logz_err, rn.logz_err))


def test_evidence_wide_prior():
    """The regression that motivated the adaptive ladder: a sharp
    Gaussian (sigma 1e-3) inside a +/-100 box has prior-corner lnL of
    order -1e10, so a fixed beta_min = 1e-3 ladder cannot bridge the
    beta ~ 0 end and stepping stone comes out low by thousands of nats
    (measured -1.8e4 vs -25.6 on the real MBB posterior). auto sizing
    must recover the analytic lnZ = -ln V."""
    d = 3
    sig = jnp.float32(1e-3)
    lo, hi = -100.0, 100.0
    lnz_true = -d * np.log(hi - lo)
    lognorm = d * float(np.log(1e-3 * np.sqrt(2 * np.pi)))

    def lnprob(x):
        inbox = jnp.all((x >= lo) & (x <= hi))
        lnl = -0.5 * jnp.sum((x / sig) ** 2) - lognorm
        return jnp.where(inbox, lnl, jnp.float32(FLOOR))

    p0 = 1e-4 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(13), (64, d)))
    res = pt_sample(lnprob, p0, jax.random.PRNGKey(14),
                    nburn=500, nsteps=1200)
    # auto must have extended the ladder far below the fixed default
    assert res.betas[-2] < 1e-6
    assert res.betas.size > 12
    assert abs(res.logz - lnz_true) < max(1.5, 5.0 * res.logz_err), (
        res.logz, lnz_true, res.logz_err)


def _bimodal(sep=8.0):
    """Two equal-weight Gaussians at +/- sep/2 along x, unit-ish sigma,
    in a finite box; the modes are far enough apart that a cold-only
    stretch ensemble started in one mode essentially never crosses."""
    s = jnp.float32(0.5)
    c = jnp.float32(sep / 2.0)
    lo, hi = -12.0, 12.0

    def lnprob(x):
        inbox = jnp.all((x >= lo) & (x <= hi))
        a = -0.5 * ((x[0] - c) ** 2 + x[1] ** 2) / s ** 2
        b = -0.5 * ((x[0] + c) ** 2 + x[1] ** 2) / s ** 2
        return jnp.where(inbox, jnp.logaddexp(a, b), jnp.float32(FLOOR))

    return lnprob


def test_bimodal_mixing_beats_cold_stretch():
    """Headline capability: started entirely in ONE mode of a
    well-separated bimodal target, the plain stretch ensemble stays
    trapped while parallel tempering recovers both modes at ~equal
    mass (DESIGN.md documents the same failure on the real T-lambda0
    bimodality of optically-thick fits)."""
    lnprob = _bimodal(sep=8.0)
    p0 = np.array([4.0, 0.0]) + 0.3 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (64, 2)))

    # cold-only ensemble: trapped
    samp = EnsembleSampler(64, 2, lnprob)
    st = samp.init_state(jax.random.PRNGKey(6), p0)
    st = samp.advance(st, 300)
    _, chain, _ = samp.run_mcmc(st, 1500)
    frac_cold = float((np.asarray(chain)[..., 0] < 0).mean())
    assert frac_cold < 0.05

    # tempered: mixed
    res = pt_sample(lnprob, p0, jax.random.PRNGKey(7), nrungs=10,
                    beta_min=3e-3, nburn=400, nsteps=1500)
    frac_pt = float((res.chain[..., 0] < 0).mean())
    assert 0.30 < frac_pt < 0.70, frac_pt


def test_determinism_and_single_trace():
    lnprob = _boxed_gauss()
    p0 = _ball(jax.random.PRNGKey(8), MU, 0.1 * SIG, 32)

    def run(seed):
        return pt_sample(lnprob, p0, jax.random.PRNGKey(seed), nrungs=6,
                         nburn=50, nsteps=100)

    r1, r2, r3 = run(11), run(11), run(12)
    np.testing.assert_array_equal(r1.chain, r2.chain)
    assert r1.logz_ti == r2.logz_ti
    assert not np.array_equal(r1.chain, r3.chain)

    # one compiled program serves burn, production and both geometries
    samp = ParallelTemperingSampler(32, 3, lnprob, geometric_ladder(6))
    st = samp.init_state(jax.random.PRNGKey(0),
                         jnp.broadcast_to(jnp.asarray(p0, jnp.float32),
                                          (6, 32, 3)))
    st = samp.advance(st, 37)
    st, _, _, _ = samp.run_mcmc(st, 100)
    st, _, _, _ = samp.run_mcmc(st, 60, thin=2)
    assert samp.trace_count == 1


def _mock_fit(**kw):
    from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody
    from mbb_emcee_tpu.fitter import MBBFitter
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


def test_run_pt_matches_stretch_posterior():
    """PT at beta=1 targets the identical posterior as the plain
    stretch ensemble: medians and widths on a well-constrained
    3-param opthin fit must agree within MC error, and the TI
    evidence must agree with the nested sampler's."""
    from mbb_emcee_tpu.results import MBBResults

    fp = _mock_fit(seed=3)
    fp.run_pt(nrungs=8, nburn=250, nsteps=600)
    rp = MBBResults(fit=fp)

    fs = _mock_fit(seed=4)
    fs.run(nburn=300, nsteps=800)
    rs = MBBResults(fit=fs)

    for p in ("T", "beta", "fnorm"):
        cp, cs = rp.par_cen(p), rs.par_cen(p)
        assert abs(cp[0] - cs[0]) < 0.35 * (cs[1] + cs[2]), p
        np.testing.assert_allclose(cp[1] + cp[2], cs[1] + cs[2],
                                   rtol=0.30, err_msg=p)

    lz, lz_err = fp.logz_pt
    ev = fs.compute_evidence(nlive=256, nbatch=32, nsteps=24)
    assert abs(lz - ev.logz) < max(1.0, 3.0 * np.hypot(lz_err, ev.logz_err))


def test_run_pt_downstream_analysis():
    from mbb_emcee_tpu.results import MBBResults
    f = _mock_fit(seed=9)
    f.run_pt(nrungs=6, nburn=100, nsteps=200, nchains=16, thin=2)
    assert f.chain_free.shape == (100, 16, 3)
    r = MBBResults(fit=f)
    assert np.isfinite(r.best_fit[1])
    assert np.all(np.isfinite(f.gelman_rubin()))
    assert np.all(np.isfinite(f.autocorrelation_time()))
    assert np.isfinite(f.logz_pt[0])
    assert np.all(f.pt_result.swap_fraction >= 0)
    with pytest.raises(RuntimeError, match="run_pt"):
        f.extend(100)


def _mock_batch(S=3, seed=7, **kw):
    from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody
    from mbb_emcee_tpu.multifit import MultiFitter
    rng = np.random.default_rng(seed)
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0])
    T = np.linspace(25.0, 38.0, S)
    fn = np.linspace(30.0, 55.0, S)
    flux = np.stack([np.asarray(ModifiedBlackbody(
        T=T[i], beta=1.9, lambda0=250.0, alpha=2.0, fnorm=fn[i],
        opthin=True, noalpha=True)(wave)) for i in range(S)])
    unc = 0.05 * flux
    flux = flux + rng.normal(0.0, unc)
    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True,
                     sampler_backend="xla", **kw)
    mf.set_data(wave, flux, unc)
    return mf, T, fn


def test_multifit_run_pt_matches_plain_run():
    """Batched PT cold chains target each source's own posterior: per-
    source medians must agree with the plain batched stretch run within
    MC error, and the per-source stepping-stone lnZ must agree with
    the batched nested-sampling evidence."""
    mp, T, fn = _mock_batch(seed=7)
    mp.run_pt(nrungs=8, nburn=200, nsteps=500)
    assert mp.chain_free.shape == (3, 500, 64, 3)
    assert mp.acceptance_fraction.shape == (3, 64)
    assert np.all(mp.swap_fraction > 0.02)

    ms, _, _ = _mock_batch(seed=7)
    ms.run(nburn=250, nsteps=700)

    for p in ("T", "fnorm"):
        cp, cs = mp.par_cen(p), ms.par_cen(p)   # (S, 3)
        assert np.all(np.abs(cp[:, 0] - cs[:, 0])
                      < 0.4 * (cs[:, 1] + cs[:, 2])), p

    lz, lz_err = mp.logz_pt
    ev = ms.compute_evidence(nlive=256, nbatch=32, nsteps=24)
    assert np.all(np.abs(lz - ev.logz)
                  < np.maximum(1.5, 4.0 * np.hypot(lz_err, ev.logz_err)))
    # per-source ladders were auto-sized (beta_min varies with the
    # source's own likelihood scale and every ladder ends at beta = 0)
    assert mp.pt_betas.shape[0] == 3
    assert np.all(mp.pt_betas[:, -1] == 0.0)
    assert np.all(mp.pt_betas[:, 0] == 1.0)


def test_multifit_run_pt_downstream_and_persistence(tmp_path):
    from mbb_emcee_tpu.multifit import MultiFitter
    mf, T, fn = _mock_batch(seed=11)
    mf.run_pt(nrungs=6, nburn=80, nsteps=150, thin=3)
    assert mf.chain_free.shape == (3, 50, 64, 3)
    assert np.all(np.isfinite(mf.gelman_rubin()))
    assert np.all(np.isfinite(mf.autocorrelation_time()))
    with pytest.raises(RuntimeError, match="extend"):
        mf.extend(100)
    # single-source view carries its slice of the PT evidence
    r0 = mf.results(0, redshift=1.5)
    assert np.isfinite(r0.logz_pt[0])
    # round-trip
    path = str(tmp_path / "batch_pt.h5")
    mf.writeToHDF5(path)
    back = MultiFitter.from_h5(path)
    np.testing.assert_allclose(back.logz_pt[0], mf.logz_pt[0])
    np.testing.assert_allclose(back.pt_betas, mf.pt_betas)
    np.testing.assert_allclose(back.swap_fraction, mf.swap_fraction)


@pytest.mark.slow
def test_multifit_run_pt_mesh_matches_single_device():
    """Source-sharded PT over the virtual mesh: with the
    partition-invariant threefry generator the sharded run must
    reproduce the unsharded chains bitwise."""
    from mbb_emcee_tpu.parallel import walker_mesh
    m1, _, _ = _mock_batch(S=4, seed=5, prng_impl="threefry2x32")
    m1.run_pt(nrungs=6, nburn=60, nsteps=120)
    m2, _, _ = _mock_batch(S=4, seed=5, prng_impl="threefry2x32",
                           mesh=walker_mesh(4))
    m2.run_pt(nrungs=6, nburn=60, nsteps=120)
    np.testing.assert_array_equal(np.asarray(m1.chain_free),
                                  np.asarray(m2.chain_free))
    np.testing.assert_allclose(np.asarray(m1.logz_pt[0]),
                               np.asarray(m2.logz_pt[0]), rtol=1e-5)


def test_ladder_and_validation():
    b = geometric_ladder(8, 1e-3)
    assert b[0] == 1.0 and b[-1] == 0.0 and b.size == 8
    assert np.all(np.diff(b) < 0)
    with pytest.raises(ValueError, match="betas"):
        ParallelTemperingSampler(32, 2, _boxed_gauss(), [0.5, 0.1, 0.0])
    with pytest.raises(ValueError, match="even"):
        ParallelTemperingSampler(33, 2, _boxed_gauss(), b)
    # trapezoid sanity: constant integrand integrates exactly
    lz, err = thermodynamic_logz(b, np.full(8, -3.0))
    np.testing.assert_allclose(lz, -3.0, rtol=1e-12)
    # Regression (review): the error proxy sums PER-INTERVAL
    # |trap - left| -- non-monotonic mean_lnp (noisy hot rungs) must
    # not cancel to a spuriously tiny reported error.
    m = np.full(8, -3.0)
    m[::2] += 1.0                       # alternating: signed terms cancel
    _, err_osc = thermodynamic_logz(b, m)
    per = np.abs(np.diff(b[::-1]) * 0.5 * np.diff(m[::-1])).sum() / 2.0
    np.testing.assert_allclose(err_osc, per, rtol=1e-12)
    assert err_osc > 0.05               # the cancelled form gave ~0


def test_betas_must_end_at_zero():
    """A user ladder stopping above beta=0 would silently bias the
    stepping-stone evidence by ln Z(beta_min); the sampler refuses it."""
    from mbb_emcee_tpu.tempering import ParallelTemperingSampler
    with pytest.raises(ValueError, match="end at exactly 0"):
        ParallelTemperingSampler(8, 2, lambda th: -jnp.sum(th ** 2),
                                 betas=np.geomspace(1.0, 1e-3, 6))


def test_multifit_run_pt_different_nrungs_reuses_process():
    """Two run_pt calls with different rung counts in one process must
    each compile/execute correctly (the scout program cache is keyed on
    the rung count, not just the run geometry)."""
    from mbb_emcee_tpu import MultiFitter
    rng = np.random.default_rng(3)
    wave = np.array([250.0, 350.0, 500.0])
    flux = np.array([[30.0, 25.0, 15.0], [50.0, 42.0, 26.0]])
    unc = 0.06 * flux
    flux = flux + unc * rng.standard_normal(flux.shape)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=5)
    mf.set_data(wave, flux, unc)
    mf.run_pt(nrungs=4, beta_min=1e-2, nburn=10, nsteps=20)
    lz4 = np.array(mf.logz_pt[0])
    mf.run_pt(nrungs=6, beta_min=1e-2, nburn=10, nsteps=20)
    assert np.all(np.isfinite(mf.logz_pt[0]))
    assert np.all(np.isfinite(lz4))
