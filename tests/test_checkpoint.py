"""Checkpoint/resume: a checkpointed run equals an uncheckpointed one, and
an interrupted run resumes to the identical chain (same PRNG stream)."""

import os

import numpy as np
import jax.numpy as jnp

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.fitter import MBBFitter

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])


def _fit(seed=21):
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape), np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(0)
    fit = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=seed)
    fit.set_data(WAVE, f + unc * rng.standard_normal(f.size), unc)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    return fit


def test_checkpointed_run_matches_plain(tmp_path):
    plain = _fit().run(nburn=20, nsteps=120)
    ck = str(tmp_path / "run.ckpt.h5")
    chk = _fit().run(nburn=20, nsteps=120, checkpoint=ck,
                     checkpoint_interval=40)
    np.testing.assert_array_equal(plain.chain, chk.chain)
    np.testing.assert_array_equal(np.asarray(plain.lnprobability),
                                  np.asarray(chk.lnprobability))
    assert os.path.exists(ck)


def test_resume_after_interruption(tmp_path):
    ck = str(tmp_path / "run.ckpt.h5")
    # Full uninterrupted run (checkpointed, same segmenting).
    full = _fit().run(nburn=20, nsteps=120, checkpoint=ck,
                      checkpoint_interval=40)
    full_chain = full.chain.copy()

    # "Interrupted" run: only 40 of 120 steps, then resume to completion.
    ck2 = str(tmp_path / "run2.ckpt.h5")
    _fit().run(nburn=20, nsteps=40, checkpoint=ck2, checkpoint_interval=40)
    resumed = _fit().run(nburn=20, nsteps=120, checkpoint=ck2,
                         checkpoint_interval=40, resume=True)
    np.testing.assert_array_equal(resumed.chain, full_chain)


def test_resume_with_thinning(tmp_path):
    ck = str(tmp_path / "t.ckpt.h5")
    full = _fit().run(nburn=10, nsteps=120, thin=3, checkpoint=ck,
                      checkpoint_interval=10)
    assert full.chain.shape[1] == 40
    ck2 = str(tmp_path / "t2.ckpt.h5")
    _fit().run(nburn=10, nsteps=60, thin=3, checkpoint=ck2,
               checkpoint_interval=10)
    resumed = _fit().run(nburn=10, nsteps=120, thin=3, checkpoint=ck2,
                         checkpoint_interval=10, resume=True)
    np.testing.assert_array_equal(resumed.chain, full.chain)


def test_geometry_mismatch_rejected(tmp_path):
    import pytest
    ck = str(tmp_path / "g.ckpt.h5")
    _fit().run(nburn=5, nsteps=20, checkpoint=ck, checkpoint_interval=10)
    bad = _fit()
    bad.nwalkers = 64
    with pytest.raises(ValueError):
        bad.run(nburn=5, nsteps=40, checkpoint=ck, resume=True)


# -- engine identity + batched (MultiFitter) checkpointing -------------------

def test_resume_refuses_backend_mismatch(tmp_path):
    """A checkpoint records the engine that wrote it; resuming under a
    different lnprob backend must be refused (splicing chains from
    different streams silently breaks the determinism contract)."""
    import pytest
    ck = str(tmp_path / "run.ckpt.h5")
    _fit().run(nburn=10, nsteps=60, checkpoint=ck, checkpoint_interval=20)
    other = _fit()
    other.lnprob_backend = "pallas"
    with pytest.raises(ValueError, match="lnprob_backend"):
        other.run(nburn=10, nsteps=120, checkpoint=ck, resume=True)


def _multi_fitter(seed=5):
    from mbb_emcee_tpu.multifit import MultiFitter
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(3)
    S = 16
    trues = np.column_stack([
        rng.uniform(28, 40, S), rng.uniform(1.6, 2.2, S),
        np.full(S, 250.0), np.full(S, 3.5), rng.uniform(30, 60, S)])
    flux, unc = [], []
    for t in trues:
        f = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        u = 0.05 * f
        flux.append(f + u * rng.standard_normal(f.size))
        unc.append(u)
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=seed,
                     sampler_backend="fused", interpret=True)
    mf.set_data(WAVE, np.array(flux), np.array(unc))
    mf.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    return mf


def test_multifit_checkpoint_resume_bitwise(tmp_path):
    """Kill/resume for a 16-source fused batch: a run interrupted after
    the first flush and resumed must reproduce the straight-through
    checkpointed chain bitwise (state + PRNG key round-trip through the
    HDF5 checkpoint)."""
    ck_a = str(tmp_path / "a.ckpt.h5")
    ck_b = str(tmp_path / "b.ckpt.h5")

    # Straight through, flushing every 2 records.
    full = _multi_fitter().run(nburn=4, nsteps=6, checkpoint=ck_a,
                               checkpoint_interval=2)
    chain_full = np.asarray(full.chain_free)

    # Same run, "killed" after 2 records: emulate by running only the
    # first segment (nsteps=2 with the same interval writes exactly the
    # first flush), then resume to the full length.
    _multi_fitter().run(nburn=4, nsteps=2, checkpoint=ck_b,
                        checkpoint_interval=2)
    resumed = _multi_fitter().run(nburn=999, nsteps=6, checkpoint=ck_b,
                                  checkpoint_interval=2, resume=True)
    chain_res = np.asarray(resumed.chain_free)

    assert chain_full.shape == chain_res.shape == (16, 6, 32, 3)
    np.testing.assert_array_equal(chain_full, chain_res)
    np.testing.assert_array_equal(np.asarray(full.lnprobability),
                                  np.asarray(resumed.lnprobability))
    np.testing.assert_array_equal(
        np.asarray(full.final_state.pos), np.asarray(resumed.final_state.pos))


def test_multifit_checkpoint_works_on_xla_backend(tmp_path):
    """Both batch backends checkpoint: the fused path via checkpoint.py
    segments, the XLA path (mesh/CPU runs) via segmented full-state
    writeToHDF5 flushes (see test_multifit_xla_checkpoint_resume_bitwise
    for the bitwise resume contract)."""
    import os
    ck = str(tmp_path / "xla.ck.h5")
    mf = _multi_fitter()
    mf.sampler_backend = "xla"
    mf.run(nburn=2, nsteps=4, checkpoint=ck, checkpoint_interval=2)
    assert os.path.exists(ck)
    assert mf.chain_free.shape[1] == 4


def test_multifit_resume_refuses_geometry_mismatch(tmp_path):
    import pytest
    ck = str(tmp_path / "c.ckpt.h5")
    _multi_fitter().run(nburn=2, nsteps=2, checkpoint=ck,
                        checkpoint_interval=2)
    other = _multi_fitter()
    other.nwalkers = 64
    with pytest.raises(ValueError, match="geometry"):
        other.run(nburn=2, nsteps=4, checkpoint=ck, resume=True)


def test_resume_refuses_data_change(tmp_path):
    """A checkpoint fingerprints the photometry it was sampling; resuming
    after the data changed (same geometry, different fluxes) would splice
    chains from two different posteriors and must be refused."""
    import pytest
    ck = str(tmp_path / "d.ckpt.h5")
    _fit().run(nburn=10, nsteps=40, checkpoint=ck, checkpoint_interval=20)
    other = _fit()
    phot = other._require_data()
    other.set_data(WAVE, np.asarray(phot.flux) * 1.01, np.asarray(phot.unc))
    with pytest.raises(ValueError, match="data_fingerprint"):
        other.run(nburn=10, nsteps=80, checkpoint=ck, resume=True)


def test_multifit_resume_refuses_data_change(tmp_path):
    import pytest
    ck = str(tmp_path / "e.ckpt.h5")
    _multi_fitter().run(nburn=2, nsteps=2, checkpoint=ck,
                        checkpoint_interval=2)
    other = _multi_fitter()
    other.set_data(WAVE, np.asarray(other.flux) * 1.01,
                   np.asarray(other.unc))
    with pytest.raises(ValueError, match="data_fingerprint"):
        other.run(nburn=2, nsteps=4, checkpoint=ck, resume=True)


def test_single_load_refuses_multifit_checkpoint(tmp_path):
    """A MultiFitter checkpoint fed to the single-fit loader fails with a
    clear error, not a shape/KeyError deep in the resume path."""
    import pytest
    from mbb_emcee_tpu.checkpoint import load_checkpoint
    ck = str(tmp_path / "m.ckpt.h5")
    _multi_fitter().run(nburn=2, nsteps=2, checkpoint=ck,
                        checkpoint_interval=2)
    with pytest.raises(ValueError, match="MultiFitter"):
        load_checkpoint(ck)


def test_thin_mismatch_rejected_before_sampling(tmp_path):
    """nsteps % thin != 0 is validated up front, before any sampling or
    checkpoint I/O, so a checkpointed run can't silently truncate."""
    import pytest
    ck = str(tmp_path / "t.ckpt.h5")
    with pytest.raises(ValueError, match="divisible"):
        _fit().run(nburn=5, nsteps=7, thin=3, checkpoint=ck)
    assert not os.path.exists(ck)


def test_resume_refuses_changed_spec(tmp_path):
    """Changing priors/limits between runs changes the posterior; a
    resume must refuse to splice chains from two different targets."""
    import pytest
    ck = str(tmp_path / "spec.ckpt.h5")
    _fit().run(nburn=10, nsteps=40, checkpoint=ck, checkpoint_interval=20)
    changed = _fit()
    changed.set_gaussian_prior("beta", 1.9, 0.2)
    with pytest.raises(ValueError, match="spec_fingerprint"):
        changed.run(nburn=10, nsteps=80, checkpoint=ck,
                    checkpoint_interval=20, resume=True)


def test_fresh_run_overwrites_stale_checkpoint(tmp_path):
    """A fresh (resume=False) run writing to a path that still holds an
    old checkpoint must not adopt the old segments as a chain prefix."""
    ck = str(tmp_path / "stale.ckpt.h5")
    _fit(seed=1).run(nburn=10, nsteps=80, checkpoint=ck,
                     checkpoint_interval=20)
    fresh = _fit(seed=2).run(nburn=10, nsteps=40, checkpoint=ck,
                             checkpoint_interval=20)
    assert fresh.chain.shape[1] == 40
    plain = _fit(seed=2).run(nburn=10, nsteps=40)
    np.testing.assert_array_equal(fresh.chain, plain.chain)


def test_run_argument_validation(tmp_path):
    import pytest
    fit = _fit()
    with pytest.raises(ValueError, match="thin=0"):
        fit.run(nburn=2, nsteps=10, thin=0)
    with pytest.raises(ValueError, match="requires checkpoint"):
        fit.run(nburn=2, nsteps=10, resume=True)
    # p0 combined with an ACTUAL resume is ambiguous
    ck = str(tmp_path / "p0.ckpt.h5")
    fit2 = _fit()
    fit2.run(nburn=5, nsteps=20, checkpoint=ck, checkpoint_interval=10)
    p0 = np.asarray(fit2.chain_free)[-1]
    with pytest.raises(ValueError, match="p0"):
        _fit().run(nburn=5, nsteps=40, p0=p0, checkpoint=ck, resume=True)


def test_resume_refuses_response_swap(tmp_path):
    """Regression (review): the resume fingerprint must cover the filter
    response pack -- resuming after swapping a band's curve would splice
    chains sampled under different band-integration weights."""
    import pytest
    from mbb_emcee_tpu.response import ResponseSet

    def fit_with(width):
        rs = ResponseSet()
        for w in WAVE:
            rs.add(f"B{int(w)}", f"box:{w}:{width}")
        shape = MBBShape(opthin=True, noalpha=True)
        f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        unc = 0.05 * f
        rng = np.random.default_rng(0)
        fit = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=21,
                        responses=rs)
        fit.set_data(WAVE, f + unc * rng.standard_normal(f.size), unc,
                     band_names=[f"B{int(w)}" for w in WAVE])
        return fit

    ck = str(tmp_path / "r.ckpt.h5")
    fit_with(30.0).run(nburn=10, nsteps=40, checkpoint=ck,
                       checkpoint_interval=20)
    with pytest.raises(ValueError, match="data_fingerprint"):
        fit_with(60.0).run(nburn=10, nsteps=80, checkpoint=ck,
                           resume=True)
    # unchanged responses still resume
    fit_with(30.0).run(nburn=10, nsteps=80, checkpoint=ck, resume=True)


def test_multifit_xla_checkpoint_resume_bitwise(tmp_path):
    """XLA-backend batch checkpointing (the path that covers mesh and
    CPU runs, where the fused checkpoint format does not apply): a run
    killed between segments resumes bitwise, and a bare from_h5 reload
    of an unthinned dump can extend()."""
    import pytest
    import jax.numpy as jnp
    from mbb_emcee_tpu.multifit import MultiFitter
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    wave = np.linspace(100.0, 500.0, 5)
    true = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                           jnp.asarray(wave, jnp.float32), shape),
                   np.float64)
    rng = np.random.default_rng(3)
    flux = f[None, :] * rng.uniform(0.9, 1.1, (4, wave.size))
    unc = 0.05 * flux
    path = str(tmp_path / "batch_ck.h5")

    def make():
        mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=5,
                         sampler_backend="xla")
        mf.set_data(wave, flux, unc)
        return mf

    ref = make().run(nburn=20, nsteps=80)

    part = make().run(nburn=20, nsteps=40, checkpoint=path,
                      checkpoint_interval=20)
    assert part.chain_free.shape[1] == 40

    res = make().run(nburn=20, nsteps=80, checkpoint=path,
                     checkpoint_interval=20, resume=True)
    np.testing.assert_array_equal(np.asarray(res.chain_free),
                                  np.asarray(ref.chain_free))
    np.testing.assert_array_equal(np.asarray(res.lnprobability),
                                  np.asarray(ref.lnprobability))

    # a bare reload of the final (unthinned) dump continues the chain
    mf2 = MultiFitter.from_h5(path)
    n0 = mf2.chain_free.shape[1]
    mf2.extend(20)
    assert mf2.chain_free.shape[1] == n0 + 20

    # refusals: geometry, posterior, thinned dump
    bad = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=5,
                      sampler_backend="xla")
    bad.set_data(wave, flux, unc)
    with pytest.raises(ValueError, match="geometry"):
        bad.run(nburn=20, nsteps=80, checkpoint=path, resume=True)
    bad2 = make()
    bad2.set_gaussian_prior("T", 30.0, 0.5)
    with pytest.raises(RuntimeError, match="refusing to splice"):
        bad2.run(nburn=20, nsteps=80, checkpoint=path, resume=True)
    thinned = str(tmp_path / "thinned.h5")
    ref.writeToHDF5(thinned, thin=2)
    with pytest.raises(ValueError, match="no XLA continuation"):
        make().run(nburn=20, nsteps=80, checkpoint=thinned, resume=True)


# -- PT / HMC tier checkpointing (batch engine) ------------------------------

def _batch(S=3, seed=5):
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    rng = np.random.default_rng(seed)
    flux = f[None, :] * rng.uniform(0.8, 1.2, (S, WAVE.size))
    return flux, 0.05 * flux


def _mf(seed=11, **kw):
    from mbb_emcee_tpu.multifit import MultiFitter
    flux, unc = _batch()
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=seed,
                     sampler_backend="xla", **kw)
    mf.set_data(WAVE, flux, unc)
    return mf


def test_pt_checkpointed_run_matches_plain(tmp_path):
    """A checkpointed PT run produces EXACTLY the chain, acceptance
    counters, and stepping-stone evidence of an uncheckpointed one (the
    tempered transition is a pure function of the carried state)."""
    plain = _mf().run_pt(nrungs=4, nburn=20, nsteps=40)
    ck = str(tmp_path / "pt.ckpt.h5")
    chk = _mf().run_pt(nrungs=4, nburn=20, nsteps=40, checkpoint=ck,
                       checkpoint_interval=15)
    np.testing.assert_array_equal(np.asarray(plain.chain_free),
                                  np.asarray(chk.chain_free))
    np.testing.assert_array_equal(plain.acceptance_fraction,
                                  chk.acceptance_fraction)
    np.testing.assert_allclose(plain.logz_pt[0], chk.logz_pt[0],
                               rtol=0, atol=0)
    np.testing.assert_allclose(plain.logz_ti[0], chk.logz_ti[0],
                               rtol=0, atol=0)
    assert os.path.exists(ck)


def test_pt_resume_after_kill(tmp_path):
    """Kill a checkpointed PT run mid-production; resume= continues to
    the bitwise-identical final chain and evidence."""
    import pytest
    from mbb_emcee_tpu.checkpoint import save_tier_checkpoint  # noqa: F401
    ck = str(tmp_path / "pt.ckpt.h5")
    full = _mf().run_pt(nrungs=4, nburn=20, nsteps=60, checkpoint=ck,
                        checkpoint_interval=20)
    full_chain = np.asarray(full.chain_free).copy()
    full_logz = full.logz_pt[0].copy()

    # simulate the kill: run only the first 20 records, then resume
    ck2 = str(tmp_path / "pt2.ckpt.h5")
    _mf().run_pt(nrungs=4, nburn=20, nsteps=20, checkpoint=ck2,
                 checkpoint_interval=20)
    resumed = _mf().run_pt(nrungs=4, nburn=20, nsteps=60,
                           checkpoint=ck2, checkpoint_interval=20,
                           resume=True)
    np.testing.assert_array_equal(np.asarray(resumed.chain_free),
                                  full_chain)
    np.testing.assert_allclose(resumed.logz_pt[0], full_logz,
                               rtol=0, atol=0)

    # resume refusals: different posterior, different geometry
    mf = _mf()
    mf.set_uplim("T", 80.0)
    with pytest.raises(ValueError, match="posterior_fp"):
        mf.run_pt(nrungs=4, nburn=20, nsteps=60, checkpoint=ck2,
                  resume=True)
    mf2 = _mf(seed=99)
    with pytest.raises(ValueError, match="seed"):
        mf2.run_pt(nrungs=4, nburn=20, nsteps=60, checkpoint=ck2,
                   resume=True)
    # a different tier's file is not a PT checkpoint
    ckh = str(tmp_path / "hmcfile.ckpt.h5")
    _mf().run_hmc(nwarmup=4, nsteps=8, n_leapfrog=2, checkpoint=ckh,
                  checkpoint_interval=8)
    with pytest.raises(ValueError, match="not a 'pt' one"):
        _mf().run_pt(nrungs=4, nburn=4, nsteps=8, checkpoint=ckh,
                     resume=True)


def test_hmc_checkpointed_run_matches_plain_and_resumes(tmp_path):
    """HMC: checkpointed == plain bitwise, and a killed run resumes to
    the identical chain (production runs at fixed (eps, mass): the
    flushed state is complete -- no dual-averaging boundary issue)."""
    plain = _mf(seed=31).run_hmc(nwarmup=16, nsteps=40, n_leapfrog=4)
    ck = str(tmp_path / "hmc.ckpt.h5")
    chk = _mf(seed=31).run_hmc(nwarmup=16, nsteps=40, n_leapfrog=4,
                               checkpoint=ck, checkpoint_interval=15)
    np.testing.assert_array_equal(np.asarray(plain.chain_free),
                                  np.asarray(chk.chain_free))
    np.testing.assert_array_equal(plain.hmc_step_size, chk.hmc_step_size)
    np.testing.assert_array_equal(plain.hmc_mass, chk.hmc_mass)
    np.testing.assert_array_equal(plain.acceptance_fraction,
                                  chk.acceptance_fraction)

    ck2 = str(tmp_path / "hmc2.ckpt.h5")
    _mf(seed=31).run_hmc(nwarmup=16, nsteps=16, n_leapfrog=4,
                         checkpoint=ck2, checkpoint_interval=16)
    resumed = _mf(seed=31).run_hmc(nwarmup=16, nsteps=40, n_leapfrog=4,
                                   checkpoint=ck2,
                                   checkpoint_interval=16, resume=True)
    np.testing.assert_array_equal(np.asarray(resumed.chain_free),
                                  np.asarray(plain.chain_free))


def test_sed_pt_and_hmc_checkpoint_resume(tmp_path):
    """The generic tier gets PT/HMC checkpointing through the same
    engine: kill/resume is bitwise there too."""
    import jax.numpy as jnp
    from mbb_emcee_tpu.sed import SEDModel
    from mbb_emcee_tpu.sedmulti import SEDMultiFitter
    from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu

    shape = MBBShape(opthin=True, noalpha=True)

    def wrapped(theta, wave):
        T, beta, fnorm = theta
        p = jnp.stack([T, beta, jnp.float32(250.0), jnp.float32(4.0),
                       fnorm])
        return jnp.exp(log_mbb_fnu(p, wave, shape))

    model = SEDModel(fnu=wrapped, param_names=("T", "beta", "fnorm"),
                     lower=[5.0, 0.3, 1.0], upper=[80.0, 4.0, 200.0],
                     name="wrapped")
    flux, unc = _batch(S=2)

    def fresh(seed=7):
        mf = SEDMultiFitter(model, nwalkers=16, seed=seed)
        mf.set_data(WAVE, flux, unc)
        for n, v in (("T", 32.0), ("beta", 1.9), ("fnorm", 45.0)):
            mf.set_param_init(n, v, 0.1 * v)
        return mf

    full = fresh().run_pt(nrungs=4, nburn=16, nsteps=40)
    ck = str(tmp_path / "sedpt.ckpt.h5")
    fresh().run_pt(nrungs=4, nburn=16, nsteps=20, checkpoint=ck,
                   checkpoint_interval=20)
    resumed = fresh().run_pt(nrungs=4, nburn=16, nsteps=40,
                             checkpoint=ck, checkpoint_interval=20,
                             resume=True)
    np.testing.assert_array_equal(np.asarray(resumed.chain_free),
                                  np.asarray(full.chain_free))
    np.testing.assert_allclose(resumed.logz_pt[0], full.logz_pt[0],
                               rtol=0, atol=0)

    full_h = fresh().run_hmc(nwarmup=12, nsteps=30, n_leapfrog=4)
    ckh = str(tmp_path / "sedhmc.ckpt.h5")
    fresh().run_hmc(nwarmup=12, nsteps=10, n_leapfrog=4, checkpoint=ckh,
                    checkpoint_interval=10)
    res_h = fresh().run_hmc(nwarmup=12, nsteps=30, n_leapfrog=4,
                            checkpoint=ckh, checkpoint_interval=10,
                            resume=True)
    np.testing.assert_array_equal(np.asarray(res_h.chain_free),
                                  np.asarray(full_h.chain_free))


def test_pt_tier_resume_mesh_gate(tmp_path):
    """Tier-checkpoint mesh gate: threefry resumes are exact under ANY
    mesh (partition-independent streams); rbg resumes under a different
    mesh are refused with an actionable message."""
    import pytest
    from mbb_emcee_tpu.parallel import walker_mesh

    flux, unc = _batch(S=8)

    def mf(prng, mesh=None):
        from mbb_emcee_tpu.multifit import MultiFitter
        m = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=11,
                        sampler_backend="xla", prng_impl=prng, mesh=mesh)
        m.set_data(WAVE, flux, unc)
        return m

    # threefry: checkpoint on the 8-device mesh, resume unmeshed ->
    # bitwise-identical to the uninterrupted unmeshed run
    ck = str(tmp_path / "tf.ck.h5")
    mf("threefry2x32", walker_mesh(8)).run_pt(
        nrungs=4, nburn=8, nsteps=10, checkpoint=ck,
        checkpoint_interval=10)
    full = mf("threefry2x32").run_pt(nrungs=4, nburn=8, nsteps=20)
    resumed = mf("threefry2x32").run_pt(
        nrungs=4, nburn=8, nsteps=20, checkpoint=ck,
        checkpoint_interval=10, resume=True)
    np.testing.assert_array_equal(np.asarray(resumed.chain_free),
                                  np.asarray(full.chain_free))

    # rbg: a different mesh at resume time is refused
    ck2 = str(tmp_path / "rbg.ck.h5")
    mf("rbg", walker_mesh(8)).run_pt(
        nrungs=4, nburn=8, nsteps=10, checkpoint=ck2,
        checkpoint_interval=10)
    with pytest.raises(ValueError, match="partition"):
        mf("rbg").run_pt(nrungs=4, nburn=8, nsteps=20, checkpoint=ck2,
                         checkpoint_interval=10, resume=True)
