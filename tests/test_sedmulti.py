"""Batched generic-model serving (sedmulti.SEDMultiFitter): lockstep
catalog fits for user JAX SEDs -- ragged data, uplim masks, mesh
sharding, continuation, batched derived quantities, PPC, persistence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu import log_mbb_fnu
from mbb_emcee_tpu.models.modified_blackbody import MBBShape
from mbb_emcee_tpu.sed import SEDModel, SEDFitter, build_sed_lnprob_data
from mbb_emcee_tpu.sedmulti import SEDMultiFitter

SHAPE = MBBShape(opthin=True, noalpha=True)
WAVE = np.array([60.0, 100.0, 160.0, 250.0, 350.0, 500.0, 850.0,
                 1100.0, 2000.0])
NAMES = ("T_cold", "T_warm", "beta", "fnorm_cold", "fnorm_warm")
INIT = np.array([18.0, 45.0, 1.8, 30.0, 1.0])


def _two_mbb(theta, wave):
    t_c, t_w, beta, f_c, f_w = theta
    p_c = jnp.stack([t_c, beta, 250.0, 4.0, f_c])
    p_w = jnp.stack([t_w, beta, 250.0, 4.0, f_w])
    return (jnp.exp(log_mbb_fnu(p_c, wave, SHAPE))
            + jnp.exp(log_mbb_fnu(p_w, wave, SHAPE)))


_MODEL = SEDModel(fnu=_two_mbb, param_names=NAMES,
                  lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
                  upper=[25.0, 80.0, 4.0, 1e3, 1e2], name="two-temp")


def _model():
    # ONE module-level model object: fitters sharing the same SEDModel
    # share traced programs through the engine's cross-instance cache
    # (the nonce-keyed identity), which is most of this file's former
    # wall-clock.
    return _MODEL


def _mock_batch(S=8, seed=5, frac=0.05):
    rng = np.random.default_rng(seed)
    truths = np.column_stack([
        rng.uniform(15, 22, S), rng.uniform(35, 55, S), np.full(S, 1.8),
        rng.uniform(10, 60, S), rng.uniform(0.3, 2.0, S)])
    f = np.stack([np.asarray(_two_mbb(jnp.asarray(t, jnp.float32),
                                      jnp.asarray(WAVE, jnp.float32)))
                  for t in truths])
    unc = frac * f
    return truths, f + unc * rng.standard_normal(f.shape), unc


def _fitter(flux, unc, seed=7, nwalkers=48, mesh=None, **kw):
    mf = SEDMultiFitter(_model(), nwalkers=nwalkers, seed=seed, mesh=mesh)
    mf.set_data(WAVE, flux, unc, **kw)
    for n, v in zip(NAMES, INIT):
        mf.set_param_init(n, v, 0.15 * abs(v))
    mf.set_gaussian_prior("beta", 1.8, 0.4)
    return mf


@pytest.fixture(scope="module")
def batch_fit():
    truths, flux, unc = _mock_batch()
    flux = flux.copy()
    flux[0, 3] = np.nan          # a missing band in a ragged catalog
    mf = _fitter(flux, unc, redshifts=np.full(8, 2.0))
    mf.run(nburn=100, nsteps=240)
    return truths, mf


def test_batch_recovers_truths(batch_fit):
    truths, mf = batch_fit
    assert mf.chain.shape == (8, 48, 240, 5)
    for j, name in [(0, "T_cold"), (1, "T_warm"), (3, "fnorm_cold")]:
        cen = mf.par_cen(name)
        sig = np.maximum(np.maximum(cen[:, 1], cen[:, 2]), 1e-6)
        assert np.all(np.abs(cen[:, 0] - truths[:, j]) < 6 * sig), name
    assert 0.2 < mf.acceptance_fraction.mean() < 0.8
    assert mf.free_param_names == list(NAMES)
    best, blnp = mf.best_fit()
    assert best.shape == (8, 5) and np.isfinite(blnp).all()
    rhat = mf.gelman_rubin()
    assert rhat.shape == (8, 5)
    tau = mf.autocorrelation_time()
    assert tau.shape == (8, 5) and np.all(tau > 0)
    assert mf.converged(rhat_max=10.0).all()


def test_matches_single_source_sedfitter(batch_fit):
    """Source 3's batched posterior agrees statistically with a
    single-source SEDFitter on the same data (different PRNG streams)."""
    truths, mf = batch_fit
    s = 3
    fit = SEDFitter(_model(), nwalkers=48, seed=101)
    fit.set_data(WAVE, np.asarray(mf.flux[s]), np.asarray(mf.unc[s]))
    for n, v in zip(NAMES, INIT):
        fit.set_param_init(n, v, 0.15 * abs(v))
    fit.set_gaussian_prior("beta", 1.8, 0.4)
    fit.run(nburn=100, nsteps=240)
    res = fit.results()
    for name in ("T_cold", "T_warm", "fnorm_cold"):
        c_b = mf.par_cen(name)[s]
        c_s = res.par_cen(name)
        width = c_s[1] + c_s[2]
        assert abs(c_b[0] - c_s[0]) < 0.6 * width, (name, c_b, c_s)


def test_lnprob_data_matches_single_builder():
    """build_sed_lnprob_data(theta, wave, flux, iunc) equals
    build_sed_lnprob on the same single-source posterior."""
    from mbb_emcee_tpu.sed import build_sed_lnprob
    from mbb_emcee_tpu.likelihood import Photometry, signed_iunc
    model = _model()
    truths, flux, unc = _mock_batch(S=1)
    mf = SEDMultiFitter(model, nwalkers=16, seed=1)
    mf.set_data(WAVE, flux, unc)
    spec = mf._effective_spec()
    ln_d, fs = build_sed_lnprob_data(model, spec)
    ln_s, fs2 = build_sed_lnprob(Photometry(WAVE, flux[0], unc[0]),
                                 model, spec)
    assert np.array_equal(fs.free_idx, fs2.free_idx)
    rng = np.random.default_rng(0)
    thetas = INIT[None, :] * rng.uniform(0.9, 1.1, (16, 5))
    iunc = jnp.asarray(signed_iunc(unc[0]), jnp.float32)
    a = np.asarray(jax.vmap(lambda th: ln_d(
        th, jnp.asarray(WAVE, jnp.float32),
        jnp.asarray(flux[0], jnp.float32), iunc))(
            jnp.asarray(thetas, jnp.float32)))
    b = np.asarray(jax.vmap(ln_s)(jnp.asarray(thetas, jnp.float32)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_missing_band_excluded(batch_fit):
    """The NaN-flagged band contributes nothing: its iunc slot is 0 and
    its PPC band_p is NaN."""
    truths, mf = batch_fit
    iunc = mf._iunc_operand()
    assert iunc[0, 3] == 0.0
    assert np.all(iunc[1:, 3] > 0)
    ppc = mf.posterior_predictive(thin=6)
    assert np.isnan(ppc.band_p[0, 3])
    assert np.isfinite(ppc.band_p[1, 3])
    assert ppc.ndata[0] == WAVE.size - 1
    # well-specified model: no extreme p anywhere
    assert np.all((ppc.p_value > 0.005) & (ppc.p_value < 0.995))


def test_uplim_masks():
    """Shared and per-source upper-limit masks ride the iunc sign; a
    model comfortably below the limit is not penalized."""
    truths, flux, unc = _mock_batch(S=4, seed=9)
    mf = _fitter(flux, unc, seed=3, nwalkers=16)
    m = np.zeros((4, WAVE.size), bool)
    m[2, -1] = True
    mf.set_phot_upperlimits(m)
    iunc = mf._iunc_operand()
    assert iunc[2, -1] < 0 and np.all(iunc[[0, 1, 3], -1] > 0)
    # shared mask also accepted
    mf.set_phot_upperlimits(np.zeros(WAVE.size, bool))
    assert np.all(mf._iunc_operand() > 0)
    with pytest.raises(ValueError, match="upper-limit mask"):
        mf.set_phot_upperlimits(np.zeros(3, bool))


def test_extend_matches_longer_run():
    """run(n1) + extend(n2) reproduces run(n1+n2) bitwise (threefry:
    the stored per-source key + last record IS the sampler state)."""
    truths, flux, unc = _mock_batch(S=4, seed=11)
    mf1 = _fitter(flux, unc, seed=13, nwalkers=32)
    mf1.run(nburn=30, nsteps=60)
    mf1.extend(40)
    mf2 = _fitter(flux, unc, seed=13, nwalkers=32)
    mf2.run(nburn=30, nsteps=100)
    np.testing.assert_array_equal(np.asarray(mf1.chain_free),
                                  np.asarray(mf2.chain_free))
    np.testing.assert_array_equal(np.asarray(mf1.lnprobability),
                                  np.asarray(mf2.lnprobability))


def test_extend_guards():
    truths, flux, unc = _mock_batch(S=4, seed=11)
    mf = _fitter(flux, unc, seed=13, nwalkers=16)
    with pytest.raises(RuntimeError, match="prior run"):
        mf.extend(10)
    mf.run(nburn=20, nsteps=40)
    mf.set_gaussian_prior("T_cold", 18.0, 0.1)
    with pytest.raises(RuntimeError, match="changed after run"):
        mf.extend(10)


def test_mesh_matches_unsharded():
    """Source-sharded run over the 8-device CPU mesh produces IDENTICAL
    chains (threefry PRNG; embarrassingly parallel)."""
    from mbb_emcee_tpu.parallel import walker_mesh
    truths, flux, unc = _mock_batch(S=8, seed=21)
    mf_a = _fitter(flux, unc, seed=29, nwalkers=32)
    mf_a.run(nburn=30, nsteps=60)
    mf_b = _fitter(flux, unc, seed=29, nwalkers=32, mesh=walker_mesh(8))
    mf_b.run(nburn=30, nsteps=60)
    np.testing.assert_array_equal(np.asarray(mf_a.chain_free),
                                  np.asarray(mf_b.chain_free))
    mf_b.extend(20)
    mf_a.extend(20)
    np.testing.assert_array_equal(np.asarray(mf_a.chain_free),
                                  np.asarray(mf_b.chain_free))
    with pytest.raises(ValueError, match="must divide"):
        bad = _fitter(flux[:6], unc[:6], mesh=walker_mesh(8))
        bad.run(nburn=2, nsteps=2)


def test_derived_match_single_results(batch_fit):
    """Batched L_IR / peak-lambda / SED bands equal the single-source
    SEDResults kernels applied per source to the same chains."""
    truths, mf = batch_fit
    z = np.full(8, 2.0)
    lir = mf.compute_lir(thin=16)
    pk = mf.compute_peaklambda(thin=16)
    grid = np.geomspace(50.0, 2000.0, 12)
    band = mf.sed_percentiles(grid, thin=16)

    # per-source oracle: the derived.py kernels on source s's own
    # thinned samples (exactly what _thinned hands the batch program)
    s = 2
    samples = np.asarray(mf._thinned(16))[s]          # (N, 5)
    from mbb_emcee_tpu import derived
    fnu = _two_mbb
    lam, w = derived.lir_nodes_weights(1.0 + z[s], 8.0, 1000.0)
    integ = np.asarray(jax.vmap(
        lambda th: jnp.sum(jnp.asarray(w, jnp.float32)
                           * fnu(th, jnp.asarray(lam, jnp.float32))))(
        jnp.asarray(samples, jnp.float32)), np.float64)
    ref_lir = derived.lir_prefactor(mf._dl_mpc(z))[s] * integ
    np.testing.assert_allclose(lir[s], ref_lir, rtol=3e-5)

    flx = np.asarray(jax.vmap(
        lambda th: fnu(th, jnp.asarray(grid, jnp.float32)))(
        jnp.asarray(samples, jnp.float32)), np.float64)
    ref_band = derived.sed_band(flx, 68.3, sample_axis=0)
    np.testing.assert_allclose(band[s], ref_band, rtol=2e-5)

    assert np.all((np.median(pk, axis=1) > 30.0)
                  & (np.median(pk, axis=1) < 500.0))
    assert mf.lir_cen().shape == (8, 3)
    assert mf.peaklambda_cen().shape == (8, 3)


def test_hdf5_roundtrip_and_continue(batch_fit, tmp_path):
    truths, mf = batch_fit
    mf.compute_lir(thin=32)
    path = str(tmp_path / "batch.h5")
    mf.writeToHDF5(path)
    mf2 = SEDMultiFitter.from_h5(path, _model())
    np.testing.assert_array_equal(np.asarray(mf2.chain_free),
                                  np.asarray(mf.chain_free))
    np.testing.assert_allclose(mf2.par_cen("T_warm"), mf.par_cen("T_warm"))
    assert mf2.redshifts is not None
    # computed derived chains persist
    np.testing.assert_allclose(mf2.lir_chain, mf.lir_chain)
    # reload continues the serving loop
    n0 = mf2.chain_free.shape[1]
    mf2.extend(24)
    assert mf2.chain_free.shape[1] == n0 + 24
    # mismatched model refused
    other = SEDModel(fnu=_two_mbb, param_names=("a",) + NAMES[1:],
                     lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
                     upper=[25.0, 80.0, 4.0, 1e3, 1e2], name="two-temp")
    with pytest.raises(ValueError, match="parameters"):
        SEDMultiFitter.from_h5(path, other)


def test_write_persists_run_spec_not_current(batch_fit, tmp_path):
    """Regression (review): writeToHDF5 must store the spec the RUN
    sampled under; a fix_param() between run() and save used to make
    from_h5 rebuild a 4-free-column space against a 5-column chain
    (wrong columns / fixed-value summaries)."""
    truths, mf = batch_fit
    before = mf.par_cen("T_warm").copy()
    mf.fix_param("T_warm", 40.0)            # intent: configure a LATER run
    try:
        path = str(tmp_path / "spec.h5")
        mf.writeToHDF5(path)
        back = SEDMultiFitter.from_h5(path, _model())
        assert back.free_space.nfree == mf.free_space.nfree
        np.testing.assert_allclose(back.par_cen("T_warm"), before)
    finally:
        mf.unfix_param("T_warm")


def test_user_init_flags_persist(tmp_path):
    """Regression (review): a reloaded fitter must keep remembering
    WHICH init centers the user set explicitly, so a re-run's
    apply_model_guess cannot overwrite them."""
    truths, flux, unc = _mock_batch()
    mf = _fitter(flux, unc, redshifts=np.full(8, 2.0))
    mf.set_param_init("T_cold", 17.5, 2.0)
    mf.run(nburn=10, nsteps=20)
    path = str(tmp_path / "ui.h5")
    mf.writeToHDF5(path)
    back = SEDMultiFitter.from_h5(path, _model())
    i = _model().param_index("T_cold")
    assert back._user_init[i] and back._user_scatter[i]
    assert back._init[i] == pytest.approx(17.5)


def test_response_mode_batch():
    """Named bands + response curves flow through the batched builder."""
    from mbb_emcee_tpu.response import ResponseSet
    truths, flux, unc = _mock_batch(S=4, seed=31)
    names = [f"b{i}" for i in range(WAVE.size)]
    rs = ResponseSet()
    for n, w in zip(names, WAVE):
        rs.add(n, f"box:{w}:{0.2 * w}:17")
    mf = _fitter(flux, unc, seed=3, nwalkers=16, band_names=names)
    mf.set_responses(rs)
    mf.run(nburn=10, nsteps=20)
    assert np.isfinite(np.asarray(mf.lnprobability)).all()
    # PPC in response mode: same band-integration as the likelihood
    ppc = mf.posterior_predictive(thin=4)
    assert ppc.p_value.shape == (4,)


def test_set_data_validation():
    model = _model()
    mf = SEDMultiFitter(model, nwalkers=16)
    with pytest.raises(RuntimeError, match="no data"):
        mf.run(nburn=2, nsteps=2)
    truths, flux, unc = _mock_batch(S=2)
    with pytest.raises(ValueError, match="must be"):
        mf.set_data(WAVE, flux[:, :3], unc)
    bad = flux.copy()
    bad[1, :] = np.nan
    with pytest.raises(ValueError, match="no bands at all"):
        mf.set_data(WAVE, bad, unc)
    u = unc.copy()
    u[0, 0] = 0.0
    with pytest.raises(ValueError, match="positive"):
        mf.set_data(WAVE, flux, u)
    with pytest.raises(ValueError, match="one redshift"):
        mf.set_data(WAVE, flux, unc, redshifts=[1.0])
    with pytest.raises(ValueError, match="one source name"):
        mf.set_data(WAVE, flux, unc, source_names=["x"])


# -- MAP triage tier -----------------------------------------------------------------------

def test_run_map_and_importance():
    """Batched MAP lands near the truths; importance refinement gives
    weighted summaries; init='map' seeds the MCMC; staleness guarded."""
    truths, flux, unc = _mock_batch(S=4, seed=41)
    mf = _fitter(flux, unc, seed=43, nwalkers=32)
    mf.run_map(nstarts=8)
    assert mf.map_params.shape == (4, 5)
    # the cold component is well constrained; check it at the mode
    assert np.all(np.abs(mf.map_params[:, 0] - truths[:, 0]) < 3.0)
    ess = mf.map_importance(nsamples=256)
    assert ess.shape == (4,) and np.all(ess >= 0)
    cen = mf.map_par_cen("T_cold")
    assert cen.shape == (4, 3)
    ok = np.isfinite(cen[:, 1])
    assert np.all(np.abs(cen[ok, 0] - truths[ok, 0])
                  < 6 * np.maximum(cen[ok, 1] + cen[ok, 2], 0.3))
    assert mf.map_cen("T_warm").shape == (4, 2)
    # triage-then-refine: the map-seeded MCMC runs and recovers
    mf.run(nburn=30, nsteps=60, init="map")
    assert mf.chain_free.shape[1] == 60
    # guards
    mf.set_gaussian_prior("T_cold", 18.0, 0.5)
    with pytest.raises(RuntimeError, match="different posterior"):
        mf.run(nburn=2, nsteps=2, init="map")
    with pytest.raises(RuntimeError, match="different posterior"):
        mf.map_importance(nsamples=16)
    mf2 = _fitter(flux, unc, nwalkers=16)
    with pytest.raises(RuntimeError, match="run_map"):
        mf2.run(nburn=2, nsteps=2, init="map")


@pytest.mark.slow
def test_run_map_mesh_matches_unsharded():
    from mbb_emcee_tpu.parallel import walker_mesh
    truths, flux, unc = _mock_batch(S=8, seed=47)
    mf_a = _fitter(flux, unc, seed=51, nwalkers=16)
    mf_a.run_map(nstarts=4, n_adam=60, n_newton=6)
    mf_b = _fitter(flux, unc, seed=51, nwalkers=16, mesh=walker_mesh(8))
    mf_b.run_map(nstarts=4, n_adam=60, n_newton=6)
    # shard_map compiles a different fp32 reduction order, so optimizer
    # endpoints agree to fp32 working precision, not bitwise
    np.testing.assert_allclose(mf_a.map_params, mf_b.map_params,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(mf_a.map_lnprob, mf_b.map_lnprob,
                               rtol=1e-3, atol=1e-3)


def test_uplim_mask_change_reuses_compiled_programs():
    """Sign-encoded masks: changing WHICH bands/sources are upper limits
    must not grow the generic batch tier's compile cache either."""
    truths, flux, unc = _mock_batch(S=4, seed=61)
    mf = _fitter(flux, unc, seed=2, nwalkers=16)
    mf.run(nburn=6, nsteps=12)
    n0 = len(mf._run_cache)
    mf.set_phot_upperlimits([False] * (WAVE.size - 1) + [True])
    mf.run(nburn=6, nsteps=12)
    m = np.zeros((4, WAVE.size), bool)
    m[0, 0] = True
    mf.set_phot_upperlimits(m)
    mf.run(nburn=6, nsteps=12)
    assert len(mf._run_cache) == n0, "mask change recompiled the run"
    # extend() likewise shares one continue-program across masks
    mf.extend(12)
    n1 = len(mf._run_cache)
    mf.set_phot_upperlimits(np.zeros(WAVE.size, bool))
    mf.run(nburn=6, nsteps=12)
    mf.extend(12)
    assert len(mf._run_cache) == n1, "mask change recompiled extend"


def test_checkpoint_resume_bitwise(tmp_path):
    """A checkpointed batch run killed between segments resumes to a
    chain bitwise-identical to an uninterrupted run (extend() is exact
    continuation; the flushes carry complete sampler state)."""
    truths, flux, unc = _mock_batch(S=4, seed=71)
    path = str(tmp_path / "ck.h5")

    # uninterrupted reference
    ref = _fitter(flux, unc, seed=19, nwalkers=32)
    ref.run(nburn=20, nsteps=80)

    # checkpointed run, "killed" after the first segment: emulate by
    # running only the first segment via the checkpoint machinery ...
    part = _fitter(flux, unc, seed=19, nwalkers=32)
    part.run(nburn=20, nsteps=40, checkpoint=path, checkpoint_interval=20)
    assert part.chain_free.shape[1] == 40

    # ... then a FRESH process resumes toward the full target
    res = _fitter(flux, unc, seed=19, nwalkers=32)
    res.run(nburn=20, nsteps=80, checkpoint=path, checkpoint_interval=20,
            resume=True)
    np.testing.assert_array_equal(np.asarray(res.chain_free),
                                  np.asarray(ref.chain_free))
    np.testing.assert_array_equal(np.asarray(res.lnprobability),
                                  np.asarray(ref.lnprobability))

    # geometry / posterior mismatches refuse
    bad = _fitter(flux, unc, seed=19, nwalkers=16)
    with pytest.raises(ValueError, match="geometry"):
        bad.run(nburn=20, nsteps=80, checkpoint=path, resume=True)
    bad2 = _fitter(flux, unc, seed=19, nwalkers=32)
    bad2.set_gaussian_prior("T_cold", 18.0, 0.1)
    with pytest.raises(RuntimeError, match="refusing to splice"):
        bad2.run(nburn=20, nsteps=80, checkpoint=path, resume=True)
    with pytest.raises(ValueError, match="requires checkpoint"):
        bad2.run(nburn=2, nsteps=4, resume=True)


@pytest.mark.slow
def test_compute_evidence_batch():
    """Batched generic evidence: per-source lnZ agree with the
    single-fit SEDFitter.compute_evidence on the same posterior (both
    wrap nested.py; the batch freezes each source at its own
    termination)."""
    truths, flux, unc = _mock_batch(S=4, seed=81)
    mf = _fitter(flux, unc, seed=3, nwalkers=16)
    ev = mf.compute_evidence(nlive=96, nbatch=8, nsteps=10, max_iter=800,
                             seed=11)
    assert ev.logz.shape == (4,) and np.isfinite(ev.logz).all()
    assert ev.samples.shape[-1] == 5
    # single-source cross-check on source 1
    fit = SEDFitter(_model(), nwalkers=16, seed=3)
    fit.set_data(WAVE, flux[1], unc[1])
    fit.set_gaussian_prior("beta", 1.8, 0.4)
    ev1 = fit.compute_evidence(nlive=96, nbatch=8, nsteps=10,
                               max_iter=800, seed=13)
    tol = 4.0 * np.hypot(ev.logz_err[1], ev1.logz_err) + 0.5
    assert abs(ev.logz[1] - ev1.logz) < tol, (ev.logz[1], ev1.logz)
    # mesh shards the independent runs
    from mbb_emcee_tpu.parallel import walker_mesh
    truths8, flux8, unc8 = _mock_batch(S=8, seed=83)
    mfm = _fitter(flux8, unc8, seed=3, nwalkers=16, mesh=walker_mesh(8))
    evm = mfm.compute_evidence(nlive=48, nbatch=8, nsteps=8, max_iter=300)
    assert evm.logz.shape == (8,) and np.isfinite(evm.logz).all()


@pytest.mark.slow
def test_run_hmc_matches_stretch_batch():
    """Batched generic HMC agrees with the stretch-move batch posterior
    (entirely different kernel on the same targets), and the mesh path
    runs."""
    truths, flux, unc = _mock_batch(S=4, seed=91)
    mf_h = _fitter(flux, unc, seed=23, nwalkers=16)
    mf_h.run_hmc(nwarmup=200, nsteps=300, thin=1)
    assert mf_h.chain.shape == (4, 16, 300, 5)
    assert 0.5 < mf_h.acceptance_fraction.mean() <= 1.0
    assert mf_h.hmc_step_size.shape == (4,)
    with pytest.raises(RuntimeError, match="prior run"):
        mf_h.extend(10)          # HMC runs are not continuable

    mf_s = _fitter(flux, unc, seed=29, nwalkers=32)
    mf_s.run(nburn=120, nsteps=300)
    for name in ("T_cold", "T_warm", "fnorm_cold"):
        c_h = mf_h.par_cen(name)
        c_s = mf_s.par_cen(name)
        width = c_s[:, 1] + c_s[:, 2]
        assert np.all(np.abs(c_h[:, 0] - c_s[:, 0]) < 0.9 * width), (
            name, c_h[:, 0], c_s[:, 0])

    from mbb_emcee_tpu.parallel import walker_mesh
    truths8, flux8, unc8 = _mock_batch(S=8, seed=93)
    mfm = _fitter(flux8, unc8, seed=23, nwalkers=16,
                  mesh=walker_mesh(8))
    mfm.run_hmc(nwarmup=60, nsteps=80)
    assert np.isfinite(np.asarray(mfm.lnprobability)).all()


@pytest.mark.slow
def test_run_pt_matches_stretch_batch():
    """Batched generic PT: cold-rung posterior agrees with the stretch
    batch; stepping-stone lnZ agrees with compute_evidence; the mesh
    path runs."""
    truths, flux, unc = _mock_batch(S=4, seed=95)

    def _narrow(mf):
        # a sane prior volume: evidence comparisons on a huge box are
        # dominated by the ladder's tail segment (same narrowing as the
        # single-fit test_run_pt_matches_stretch_and_evidence); beta is
        # FIXED so the cross-estimator check integrates a 4-parameter
        # posterior both estimators handle well at test scale
        mf.set_lowlim("fnorm_cold", 1.0).set_uplim("fnorm_cold", 120.0)
        mf.set_lowlim("fnorm_warm", 0.05).set_uplim("fnorm_warm", 10.0)
        mf.fix_param("beta", 1.8)
        return mf

    mf_p = _narrow(_fitter(flux, unc, seed=31, nwalkers=32))
    mf_p.run_pt(nrungs=8, nburn=200, nsteps=500)
    assert mf_p.chain.shape == (4, 32, 500, 5)
    assert np.all(mf_p.chain[..., 2] == 1.8)       # fixed beta pinned
    assert np.isfinite(mf_p.logz_pt[0]).all()
    with pytest.raises(RuntimeError, match="prior run"):
        mf_p.extend(10)

    mf_s = _narrow(_fitter(flux, unc, seed=29, nwalkers=32))
    mf_s.run(nburn=120, nsteps=240)
    for name in ("T_cold", "T_warm", "fnorm_cold"):
        c_p = mf_p.par_cen(name)
        c_s = mf_s.par_cen(name)
        width = c_s[:, 1] + c_s[:, 2]
        assert np.all(np.abs(c_p[:, 0] - c_s[:, 0]) < 0.9 * width), (
            name, c_p[:, 0], c_s[:, 0])

    # cross-estimator agreement at the MBB batch test's convention
    # (test_tempering.py: floor 1.5 nats or 4 sigma -- a 5-parameter
    # two-component evidence integral is genuinely hard at test scale)
    ev = mf_p.compute_evidence(nlive=200, nbatch=16, nsteps=12,
                               max_iter=1500, seed=7)
    tol = np.maximum(1.5, 4.0 * np.hypot(ev.logz_err, mf_p.logz_pt[1]))
    assert np.all(np.abs(ev.logz - mf_p.logz_pt[0]) < tol), (
        ev.logz, mf_p.logz_pt[0])

    from mbb_emcee_tpu.parallel import walker_mesh
    truths8, flux8, unc8 = _mock_batch(S=8, seed=97)
    mfm = _fitter(flux8, unc8, seed=31, nwalkers=16,
                  mesh=walker_mesh(8))
    mfm.run_pt(nrungs=4, nburn=40, nsteps=60)
    assert np.isfinite(np.asarray(mfm.lnprobability)).all()


def test_hmc_run_persists_without_continuation(tmp_path):
    """An HMC batch run (no stretch continuation state) persists and
    reloads; the reload refuses extend() instead of crashing."""
    truths, flux, unc = _mock_batch(S=2, seed=99)
    mf = _fitter(flux, unc, seed=23, nwalkers=16)
    mf.run_hmc(nwarmup=40, nsteps=60)
    path = str(tmp_path / "hmc.h5")
    mf.writeToHDF5(path)
    mf2 = SEDMultiFitter.from_h5(path, _model())
    np.testing.assert_array_equal(np.asarray(mf2.chain_free),
                                  np.asarray(mf.chain_free))
    with pytest.raises(RuntimeError, match="prior run"):
        mf2.extend(10)


def test_results_source_view(batch_fit, tmp_path):
    """results(i): a full SEDResults for one catalog member -- summaries
    match the batch reductions; derived / PPC / persistence all work,
    including on the ragged source (its missing band is excluded)."""
    truths, mf = batch_fit
    s = 2
    res = mf.results(s)
    assert res.redshift == 2.0                    # from the stored vector
    np.testing.assert_allclose(res.par_cen("T_warm"),
                               mf.par_cen("T_warm")[s], rtol=1e-6)
    b_best, b_lnp = mf.best_fit()
    r_best, r_lnp = res.best_fit
    np.testing.assert_allclose(r_best, b_best[s], rtol=1e-5)
    assert abs(r_lnp - b_lnp[s]) < 1e-3
    # thinned-sample ORDER differs between the surfaces (walker-major vs
    # record-major flattening), so compare summaries, not elementwise
    res.compute_lir(thin=16)
    mf.compute_lir(thin=16)
    c_v = res.lir_cen()
    c_b = mf.lir_cen()[s]
    assert abs(c_v[0] - c_b[0]) < 0.1 * c_b[0]
    assert np.isfinite(c_v).all()
    assert 0.001 < res.posterior_predictive(thin=8).p_value < 0.999
    path = str(tmp_path / "src2.h5")
    res.writeToHDF5(path)
    from mbb_emcee_tpu.sed import SEDResults
    r2 = SEDResults(h5file=path, model=mf.model)
    np.testing.assert_allclose(r2.par_cen("T_cold"), res.par_cen("T_cold"))

    # the ragged source: its missing band is excluded from the PPC
    res0 = mf.results(0)
    ppc0 = res0.posterior_predictive(thin=8)
    assert ppc0.ndata == WAVE.size - 1
    assert np.isnan(ppc0.band_p[3])
    with pytest.raises(IndexError, match="out of range"):
        mf.results(99)


# -- per-source Gaussian priors ------------------------------------------------------


def test_ps_prior_lnprob_matches_shared():
    """A per-source prior with every source at the SAME (mu, sigma) must
    equal the shared-spec prior term exactly (up to fp32 order): unit
    check of the operand-splitting wrapper against build_sed_lnprob_data
    with the prior in the spec."""
    truths, flux, unc = _mock_batch(S=3)
    mf = _fitter(flux, unc)
    mf.set_gaussian_prior("T_warm", np.full(3, 44.0), np.full(3, 5.0))
    spec_ps = mf._effective_spec()
    lnp_ps, fs = mf._build_lnprob_data(spec_ps)
    flux_ext, iunc_ext = mf._data_operands(fs)

    mf2 = _fitter(flux, unc)
    mf2.set_gaussian_prior("T_warm", 44.0, 5.0)
    spec_sh = mf2._effective_spec()
    lnp_sh, _ = mf2._build_lnprob_data(spec_sh)

    rng = np.random.default_rng(0)
    wave_j = jnp.asarray(WAVE, jnp.float32)
    for s in range(3):
        for _ in range(5):
            th = jnp.asarray(
                rng.uniform(fs.lower, fs.upper), jnp.float32)
            a = float(lnp_ps(th, wave_j, flux_ext[s], iunc_ext[s]))
            b = float(lnp_sh(th, wave_j,
                             jnp.asarray(flux[s], jnp.float32),
                             jnp.asarray(mf2._iunc_operand()[s],
                                         jnp.float32)))
            np.testing.assert_allclose(a, b, rtol=2e-5)


def test_ps_prior_anchors_one_source():
    """The serving story: one source carries a tight per-source prior
    (a 'spec-z anchor' analog on T_warm), the rest are unconstrained by
    it; exact extend() continuation and HDF5 reload both preserve it."""
    truths, flux, unc = _mock_batch(S=3, seed=11)
    mf = _fitter(flux, unc, nwalkers=32)
    anchor = 50.0
    mf.set_gaussian_prior(
        "T_warm", np.array([anchor, 0.0, 0.0]),
        np.array([0.05, np.inf, np.inf]))
    mf.run(nburn=40, nsteps=120)
    cen = mf.par_cen("T_warm")
    assert abs(cen[0, 0] - anchor) < 0.2
    assert 0.5 * (cen[0, 1] + cen[0, 2]) < 0.2
    assert 0.5 * (cen[1, 1] + cen[1, 2]) > 0.5   # others stay data-driven

    # run(n1) + extend(n2) == run(n1+n2) bitwise, with ps priors active
    mf.extend(40)
    mf2 = _fitter(flux, unc, nwalkers=32)
    mf2.set_gaussian_prior(
        "T_warm", np.array([anchor, 0.0, 0.0]),
        np.array([0.05, np.inf, np.inf]))
    mf2.run(nburn=40, nsteps=160)
    assert np.array_equal(np.asarray(mf.chain_free),
                          np.asarray(mf2.chain_free))


def test_ps_prior_hdf5_roundtrip_and_continuation(tmp_path):
    truths, flux, unc = _mock_batch(S=2, seed=13)
    mf = _fitter(flux, unc, nwalkers=32)
    mf.set_gaussian_prior("T_warm", np.array([50.0, 0.0]),
                          np.array([0.1, np.inf]))
    mf.run(nburn=20, nsteps=60)
    fn = str(tmp_path / "ps.h5")
    mf.writeToHDF5(fn)
    mf3 = SEDMultiFitter.from_h5(fn, _model())
    assert "t_warm" in mf3._ps_prior
    np.testing.assert_allclose(mf3._ps_prior["t_warm"][1],
                               mf._ps_prior["t_warm"][1])
    mf3.extend(40)
    mf.extend(40)
    assert np.array_equal(np.asarray(mf3.chain_free),
                          np.asarray(mf.chain_free))


def test_ps_prior_validation_and_clearing():
    truths, flux, unc = _mock_batch(S=3)
    mf = _fitter(flux, unc, nwalkers=24)
    # needs data first
    mf_no = SEDMultiFitter(_model(), nwalkers=24, seed=1)
    with pytest.raises(RuntimeError, match="set_data"):
        mf_no.set_gaussian_prior("T_warm", np.zeros(3), np.ones(3))
    # fixed parameter refuses at run time
    mf.set_gaussian_prior("T_warm", np.full(3, 44.0), np.full(3, 5.0))
    mf.fix_param("T_warm", 44.0)
    with pytest.raises(ValueError, match="fixed"):
        mf.run(nburn=5, nsteps=10)
    # scalar call clears the per-source entry (last call wins),
    # however the parameter is addressed (name or index)
    mf2 = _fitter(flux, unc, nwalkers=24)
    mf2.set_gaussian_prior("T_warm", np.full(3, 44.0), np.full(3, 5.0))
    assert "t_warm" in mf2._ps_prior
    mf2.set_gaussian_prior(NAMES.index("T_warm"), 44.0, 5.0)
    assert "t_warm" not in mf2._ps_prior
    # wrong catalog size refuses after new set_data
    mf3 = _fitter(flux, unc, nwalkers=24)
    mf3.set_gaussian_prior("T_warm", np.full(3, 44.0), np.full(3, 5.0))
    t4, f4, u4 = _mock_batch(S=4)
    mf3.set_data(WAVE, f4, u4)
    with pytest.raises(ValueError, match="sized for"):
        mf3.run(nburn=5, nsteps=10)
    # non-finite mean under an active sigma refuses immediately
    mf4 = _fitter(flux, unc, nwalkers=24)
    with pytest.raises(ValueError, match="finite"):
        mf4.set_gaussian_prior("T_warm", np.array([np.nan, 1.0, 1.0]),
                               np.full(3, 5.0))
    # arrays on the single-fit surface raise the targeted TypeError
    sf = SEDFitter(_model(), nwalkers=16)
    with pytest.raises(TypeError, match="batch surface"):
        sf.set_gaussian_prior("T_warm", np.zeros(3), np.ones(3))


def test_ps_prior_hierarchy_interim_division():
    """from_batch must divide PER-SOURCE interim priors out of the
    reweighting exactly like shared ones: ln_interim equals the manual
    per-source quadratic."""
    from mbb_emcee_tpu.hierarchy import HierarchicalFitter
    truths, flux, unc = _mock_batch(S=3, seed=17)
    mf = _fitter(flux, unc, nwalkers=32)
    mu_s = np.array([40.0, 45.0, 50.0])
    sig_s = np.array([4.0, 5.0, 6.0])
    mf.set_gaussian_prior("T_warm", mu_s, sig_s)
    mf.run(nburn=20, nsteps=60)
    hf = HierarchicalFitter.from_batch(mf, params=("T_warm",),
                                       nwalkers=8, max_samples=64)
    # manual: same strided flat chain, same quadratic
    chain = np.asarray(mf.chain_free)
    cols = [list(mf.free_param_names).index("T_warm")]
    flat = chain.reshape(3, -1, chain.shape[-1])[..., cols]
    nsamp = flat.shape[1]
    if nsamp > 64:
        stride = int(np.ceil(nsamp / 64))
        flat = flat[:, ::stride][:, :64]
    d = (flat[..., 0] - mu_s[:, None]) / sig_s[:, None]
    expected = -0.5 * d * d
    np.testing.assert_allclose(np.asarray(hf.ln_interim), expected,
                               rtol=1e-6)


# -- correlated calibration errors on the generic tier -----------------------

def _random_corr(nb, seed=7, strength=0.4):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((nb, nb))
    C = A @ A.T + nb * np.eye(nb)
    d = np.sqrt(np.diag(C))
    R = C / np.outer(d, d)
    return (1 - strength) * np.eye(nb) + strength * R


def test_correlated_sed_lnprob_matches_fp64_marginal():
    """The generic correlated likelihood equals the exact fp64 Gaussian
    -0.5 d^T C^-1 d with C = D R D, including EXACT marginalization of
    a missing band -- the same contract the MBB tier satisfies."""
    nb = WAVE.size
    model = _model()
    R = _random_corr(nb)
    truths, flux_b, unc_b = _mock_batch(S=2, seed=21)
    flux = flux_b.copy()
    unc = unc_b.copy()
    flux[1, 2] = np.nan          # source 1 misses band 2
    unc[1, 2] = np.nan

    mf = SEDMultiFitter(model, nwalkers=16)
    mf.set_data(WAVE, flux, unc)
    mf.set_band_correlation(R)
    lnp_corr, fs = mf._build_lnprob_data(mf._effective_spec())
    flux_op, W = mf._data_operands(fs)
    assert np.asarray(W).shape == (2, nb, nb)

    theta = np.array([17.0, 42.0, 1.9, 25.0, 0.8])
    th = jnp.asarray(theta[fs.free_idx], jnp.float32)
    wave = jnp.asarray(WAVE, jnp.float32)
    model32 = np.asarray(_two_mbb(jnp.asarray(theta, jnp.float32), wave),
                         np.float64)
    for s in range(2):
        p = np.isfinite(flux[s]) & np.isfinite(unc[s])
        got = float(lnp_corr(th, wave, flux_op[s],
                             jnp.asarray(W[s], jnp.float32)))
        d = (model32 - np.where(p, np.nan_to_num(flux[s]), 0.0))[p]
        C = R[np.ix_(p, p)] * np.outer(unc[s][p], unc[s][p])
        want = -0.5 * float(d @ np.linalg.solve(C, d))
        # the shared Gaussian prior on beta also applies
        spec = mf._effective_spec()
        dp = (theta - spec.prior_mean) * spec.prior_isigma
        want += -0.5 * float(dp @ dp)
        np.testing.assert_allclose(got, want, rtol=2e-4, err_msg=f"s={s}")


def test_correlated_identity_matches_diagonal_run():
    """R = identity whitens to exactly the diagonal likelihood (the
    whitening matvec adds exact zeros), so the sampled chains match the
    diagonal run's."""
    truths, flux, unc = _mock_batch(S=3, seed=31)

    def fresh(corr):
        mf = _fitter(flux, unc, seed=13, nwalkers=16)
        if corr is not None:
            mf.set_band_correlation(corr)
        return mf

    diag = fresh(None).run(nburn=10, nsteps=20)
    ident = fresh(np.eye(WAVE.size)).run(nburn=10, nsteps=20)
    np.testing.assert_allclose(np.asarray(diag.chain_free),
                               np.asarray(ident.chain_free),
                               rtol=0, atol=0)


def test_correlated_sed_matches_mbb_surface():
    """Wrapped-MBB equivalence (round-2 verdict task): an SEDModel
    wrapping the MBB flux, under the SAME correlated error model, box,
    init, seed and PRNG, produces the same correlated lnprob values as
    MultiFitter's path and statistically matching posteriors."""
    from mbb_emcee_tpu.multifit import MultiFitter
    from mbb_emcee_tpu.likelihood import build_lnprob_data

    shape = MBBShape(opthin=True, noalpha=True)
    wave5 = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
    nb = wave5.size
    truths = np.column_stack([
        np.array([28.0, 33.0]), np.array([1.7, 2.0]),
        np.full(2, 250.0), np.full(2, 4.0), np.array([40.0, 55.0])])
    f = np.stack([np.asarray(
        jnp.exp(log_mbb_fnu(jnp.asarray(t, jnp.float32),
                            jnp.asarray(wave5, jnp.float32), shape)))
        for t in truths])
    rng = np.random.default_rng(3)
    unc = 0.06 * f
    flux = f + unc * rng.standard_normal(f.shape)
    R = _random_corr(nb, strength=0.3)

    mbb = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=17,
                      prng_impl="threefry2x32", sampler_backend="xla")
    mbb.set_data(wave5, flux, unc)
    mbb.set_band_correlation(R)
    spec5 = mbb._effective_spec()
    fs5 = build_lnprob_data(shape, spec5, correlated=True)[1]
    free_names = ["T", "beta", "fnorm"]
    lo = spec5.lower[fs5.free_idx]
    hi = spec5.upper[fs5.free_idx]

    def wrapped(theta, wave):
        T, beta, fnorm = theta
        p = jnp.stack([T, beta, jnp.float32(250.0), jnp.float32(4.0),
                       fnorm])
        return jnp.exp(log_mbb_fnu(p, wave, shape))

    sed = SEDMultiFitter(
        SEDModel(fnu=wrapped, param_names=tuple(free_names),
                 lower=lo, upper=hi, name="wrapped-mbb"),
        nwalkers=32, seed=17, prng_impl="threefry2x32")
    sed.set_data(wave5, flux, unc)
    sed.set_band_correlation(R)

    # identical init geometry on both surfaces (MBB's data-driven
    # heuristic off via explicit set_param_init)
    for j, name in enumerate(free_names):
        v = [30.0, 1.8, 45.0][j]
        s = [3.0, 0.3, 5.0][j]
        mbb.set_param_init(name, v, s)
        sed.set_param_init(name, v, s)

    # lnprob equivalence on a theta grid, same whitening operands
    lnp_mbb, _ = mbb._engine_lnprob(spec5)
    lnp_sed, fs3 = sed._engine_lnprob(sed._effective_spec())
    _, W = mbb._engine_operands(fs5)
    w32 = jnp.asarray(wave5, jnp.float32)
    fx32 = jnp.asarray(flux, jnp.float32)
    for th in ([30.0, 1.8, 45.0], [25.0, 2.2, 50.0], [35.0, 1.5, 38.0]):
        th32 = jnp.asarray(th, jnp.float32)
        for s in range(2):
            a = float(lnp_mbb(th32, w32, fx32[s], W[s]))
            b = float(lnp_sed(th32, w32, fx32[s], W[s]))
            np.testing.assert_allclose(a, b, rtol=1e-5)

    # posterior equivalence, statistically
    mbb.run(nburn=60, nsteps=300)
    sed.run(nburn=60, nsteps=300)
    for name in free_names:
        cm = mbb.par_cen(name)
        cs = sed.par_cen(name)
        width = 0.5 * (cm[:, 1] + cm[:, 2] + cs[:, 1] + cs[:, 2])
        assert np.all(np.abs(cm[:, 0] - cs[:, 0]) < width), name


def test_correlated_sed_end_to_end(tmp_path):
    """Correlated generic-tier serving: run + extend continuation, HDF5
    round-trip of the correlation, PPC/LOO under the exact marginal
    whitening, evidence + HMC + PT smoke, and the uplim refusals."""
    truths, flux, unc = _mock_batch(S=4, seed=41)
    flux = flux.copy(); unc = unc.copy()
    flux[2, 5] = np.nan; unc[2, 5] = np.nan       # ragged catalog
    R = _random_corr(WAVE.size, strength=0.3)

    def fresh():
        mf = _fitter(flux, unc, seed=19, nwalkers=24,
                     redshifts=np.full(4, 2.0))
        mf.set_band_correlation(R)
        return mf

    whole = fresh().run(nburn=30, nsteps=60)
    split = fresh().run(nburn=30, nsteps=40).extend(20)
    np.testing.assert_array_equal(np.asarray(whole.chain_free),
                                  np.asarray(split.chain_free))

    cen = whole.par_cen("T_cold")
    sig = np.maximum(np.maximum(cen[:, 1], cen[:, 2]), 1e-6)
    assert np.all(np.abs(cen[:, 0] - truths[:, 0]) < 8 * sig)

    # HDF5 round-trip restores the correlation and can keep extending
    out = str(tmp_path / "sedcorr.h5")
    whole.writeToHDF5(out)
    back = SEDMultiFitter.from_h5(out, _model())
    np.testing.assert_allclose(back._band_corr, R)
    back.extend(20)
    assert back.chain_free.shape[1] == 80

    # PPC + LOO under the exact marginal whitening
    ppc = whole.posterior_predictive(thin=20)
    assert np.all((ppc.p_value >= 0) & (ppc.p_value <= 1))
    assert np.isnan(ppc.band_p[2, 5])             # missing slot excluded
    loo = whole.compute_loo(thin=20)
    assert np.isfinite(loo.elpd_loo).all()

    # evidence / HMC / PT accept the correlated likelihood
    ev = whole.compute_evidence(nlive=48, nbatch=8, nsteps=8,
                                max_iter=300)
    assert np.all(np.isfinite(ev.logz))
    mf2 = fresh()
    mf2.run_hmc(nwarmup=8, nsteps=8, n_leapfrog=4)
    assert np.all(np.isfinite(np.asarray(mf2.chain_free)))
    mf3 = fresh()
    mf3.run_pt(nrungs=4, nburn=8, nsteps=12)
    assert np.all(np.isfinite(mf3.logz_pt[0]))

    # refusals: uplims x correlation, stale shape
    mf4 = _fitter(flux, unc, seed=1, nwalkers=16)
    mf4.set_phot_upperlimits([True] + [False] * (WAVE.size - 1))
    with pytest.raises(ValueError, match="upper limits"):
        mf4.set_band_correlation(R)
    mf5 = _fitter(flux, unc, seed=1, nwalkers=16)
    mf5.set_band_correlation(R)
    with pytest.raises(ValueError, match="correlated"):
        mf5.set_phot_upperlimits([True] + [False] * (WAVE.size - 1))


def test_correlated_sed_with_per_source_priors():
    """Correlated errors compose with per-source Gaussian priors (the
    (W, pisig) pytree operands): the prior pulls the posterior of the
    anchored source, and the non-anchored source is unaffected by a
    disabled (inf-sigma) entry."""
    truths, flux, unc = _mock_batch(S=2, seed=51)
    R = _random_corr(WAVE.size, strength=0.25)
    anchor = np.array([truths[0, 0] - 2.0, np.nan])
    sig = np.array([0.2, np.inf])

    def fit(with_prior):
        mf = _fitter(flux, unc, seed=23, nwalkers=24)
        mf.set_band_correlation(R)
        if with_prior:
            mf.set_gaussian_prior("T_cold", anchor, sig)
        return mf.run(nburn=40, nsteps=120)

    free = fit(False)
    tied = fit(True)
    cf = free.par_cen("T_cold")
    ct = tied.par_cen("T_cold")
    # anchored source 0 pulled toward the anchor
    assert abs(ct[0, 0] - anchor[0]) < abs(cf[0, 0] - anchor[0])
    # disabled entry: source 1 statistically unchanged
    w = cf[1, 1] + cf[1, 2]
    assert abs(ct[1, 0] - cf[1, 0]) < w


# -- data-driven init via SEDModel.guess -------------------------------------

def _guess_two_mbb(wave, flux, unc):
    """Crude data-driven seed for the two-temperature model: cold T from
    the longest-wave peak, warm T fixed-ish, cold norm from the flux
    near 250um; NaN for beta (keep the default)."""
    w = np.asarray(wave)
    f = np.where(np.isfinite(unc), flux, 0.0)
    lam_pk = w[np.argmax(f)]
    t_cold = np.clip(2898.0 / lam_pk * 1.5, 6.0, 24.0)
    f250 = f[np.argmin(np.abs(w - 250.0))]
    return np.array([t_cold, 45.0, np.nan,
                     max(f250, 1e-2), max(0.02 * f250, 1e-3)])


def test_model_guess_seeds_batch_without_manual_init():
    """A model carrying a guess hook fits a catalog with NO
    set_param_init calls (round-2 verdict weak item: the serving
    surface used to sit at box centers without manual seeding)."""
    truths, flux, unc = _mock_batch(S=4, seed=71)
    model = SEDModel(fnu=_two_mbb, param_names=NAMES,
                     lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
                     upper=[25.0, 80.0, 4.0, 1e3, 1e2],
                     name="two-temp-guess", guess=_guess_two_mbb)
    mf = SEDMultiFitter(model, nwalkers=32, seed=5)
    mf.set_data(WAVE, flux, unc)
    mf.run(nburn=150, nsteps=300)
    cen = mf.par_cen("T_cold")
    sig = np.maximum(np.maximum(cen[:, 1], cen[:, 2]), 1e-6)
    assert np.all(np.abs(cen[:, 0] - truths[:, 0]) < 8 * sig)
    cenf = mf.par_cen("fnorm_cold")
    assert np.all(np.abs(cenf[:, 0] - truths[:, 3])
                  < 8 * np.maximum(np.maximum(cenf[:, 1], cenf[:, 2]),
                                   1e-6))


def test_model_guess_respects_user_init_and_nan():
    """Explicit set_param_init beats the guess; NaN guess entries keep
    the default; guessed centers land inside the box."""
    truths, flux, unc = _mock_batch(S=2, seed=73)
    model = SEDModel(fnu=_two_mbb, param_names=NAMES,
                     lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
                     upper=[25.0, 80.0, 4.0, 1e3, 1e2],
                     name="two-temp-guess", guess=_guess_two_mbb)
    mf = SEDMultiFitter(model, nwalkers=16, seed=5)
    mf.set_data(WAVE, flux, unc)
    mf.set_param_init("T_cold", 19.5, 0.5)
    spec = mf._effective_spec()
    from mbb_emcee_tpu.sed import build_sed_lnprob_data
    _, fs = build_sed_lnprob_data(model, spec)
    cen, sca = mf._engine_init_centers("auto", fs)
    names = [model.param_names[i] for i in fs.free_idx]
    jt = names.index("T_cold")
    jb = names.index("beta")
    # user-set init wins for every source
    np.testing.assert_allclose(cen[:, jt], 19.5)
    np.testing.assert_allclose(sca[:, jt], 0.5)
    # NaN guess entry -> default box-center seed for beta
    default_beta = 0.5 * (0.5 + 4.0)
    np.testing.assert_allclose(cen[:, jb], default_beta)
    # all guessed centers strictly inside the box
    lo = fs.lower
    hi = fs.upper
    assert np.all(cen > lo[None, :]) and np.all(cen < hi[None, :])


def test_single_fit_set_data_applies_guess():
    from mbb_emcee_tpu.sed import SEDFitter
    truths, flux, unc = _mock_batch(S=1, seed=77)
    model = SEDModel(fnu=_two_mbb, param_names=NAMES,
                     lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
                     upper=[25.0, 80.0, 4.0, 1e3, 1e2],
                     name="two-temp-guess", guess=_guess_two_mbb)
    fit = SEDFitter(model, nwalkers=16, seed=3)
    fit.set_data(WAVE, flux[0], unc[0])
    g = _guess_two_mbb(WAVE, flux[0], unc[0])
    assert fit._init[0] == pytest.approx(
        np.clip(g[0], 5.0 + 0.01 * 20.0, 25.0 - 0.01 * 20.0))
    # beta (NaN guess) keeps the box-center default
    assert fit._init[2] == pytest.approx(0.5 * (0.5 + 4.0))
