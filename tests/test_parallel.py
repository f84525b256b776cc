"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the
walker-sharded sampler compiles, runs, matches the single-device sampler
statistically, and a full sharded FIT recovers parameters."""

import numpy as np
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.sampler import EnsembleSampler, make_initial_ball
from mbb_emcee_tpu.parallel import walker_mesh, ShardedEnsembleSampler
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.likelihood import (
    Photometry, LikelihoodSpec, build_lnprob)

NDIM = 3
MEAN = np.array([1.0, -2.0, 0.5])
SIG = np.array([0.8, 1.5, 0.3])


def _lnprob(theta):
    d = (theta - jnp.asarray(MEAN, jnp.float32)) / jnp.asarray(SIG,
                                                               jnp.float32)
    return -0.5 * jnp.sum(d * d)


def test_mesh_has_8_devices():
    mesh = walker_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device_statistically():
    nwalkers = 128
    mesh = walker_mesh()
    key = jax.random.PRNGKey(0)
    key, kb = jax.random.split(key)
    p0 = make_initial_ball(kb, MEAN, SIG, nwalkers)

    sh = ShardedEnsembleSampler(nwalkers, NDIM, _lnprob, mesh)
    st = sh.init_state(key, p0)
    st = sh.advance(st, 200)
    st = sh.reset_counters(st)
    st, chain, lnp = sh.run_mcmc(st, 1200)
    flat = np.asarray(chain).reshape(-1, NDIM)

    assert chain.shape == (1200, nwalkers, NDIM)
    assert np.all(np.abs(flat.mean(axis=0) - MEAN) < 0.1 * SIG)
    np.testing.assert_allclose(flat.std(axis=0), SIG, rtol=0.1)

    af = np.asarray(ShardedEnsembleSampler.acceptance_fraction(st))
    assert 0.2 < af.mean() < 0.8

    # chain really is sharded over the walker axis
    shard_axes = {s.index[1] for s in chain.addressable_shards}
    assert len(shard_axes) == 8


def test_sharded_deterministic_fixed_devices():
    nwalkers = 64
    mesh = walker_mesh()
    key = jax.random.PRNGKey(5)
    p0 = make_initial_ball(jax.random.PRNGKey(6), MEAN, SIG, nwalkers)

    def run():
        s = ShardedEnsembleSampler(nwalkers, NDIM, _lnprob, mesh)
        st = s.init_state(key, p0)
        _, chain, _ = s.run_mcmc(st, 50)
        return np.asarray(chain)

    np.testing.assert_array_equal(run(), run())


def test_sharded_thinning():
    nwalkers = 32
    mesh = walker_mesh()
    s = ShardedEnsembleSampler(nwalkers, NDIM, _lnprob, mesh)
    st = s.init_state(jax.random.PRNGKey(1),
                      make_initial_ball(jax.random.PRNGKey(2), MEAN, SIG,
                                        nwalkers))
    _, c1, _ = s.run_mcmc(st, 40, thin=1)
    _, c4, _ = s.run_mcmc(st, 40, thin=4)
    np.testing.assert_array_equal(np.asarray(c1[3::4]), np.asarray(c4))


def test_sharded_mbb_fit_recovers():
    """Full MBB likelihood under the sharded sampler: the real multi-chip
    training-step equivalent (this is what __graft_entry__.dryrun_multichip
    exercises)."""
    wave = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
    true = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                           jnp.asarray(wave, jnp.float32), shape))
    unc = 0.05 * f
    rng = np.random.default_rng(0)
    phot = Photometry(wave, f + unc * rng.standard_normal(f.size), unc)
    spec = LikelihoodSpec.default()
    spec.upper[0] = 100.0
    spec.upper[1] = 5.0
    lnprob, fs = build_lnprob(phot, shape, spec)

    nwalkers = 64
    mesh = walker_mesh()
    s = ShardedEnsembleSampler(nwalkers, fs.nfree, lnprob, mesh)
    center = true[fs.free_idx]
    p0 = make_initial_ball(jax.random.PRNGKey(3), center,
                           0.1 * np.abs(center), nwalkers,
                           fs.lower, fs.upper)
    st = s.init_state(jax.random.PRNGKey(4), p0)
    st = s.advance(st, 100)
    st, chain, lnp = s.run_mcmc(st, 300)
    full = fs.expand(np.asarray(chain).reshape(-1, fs.nfree))
    for i in (0, 1, 4):
        med = np.median(full[:, i])
        std = full[:, i].std()
        assert abs(med - true[i]) < 4 * max(std, 1e-3)


def test_geometry_validation():
    import pytest
    mesh = walker_mesh()
    with pytest.raises(ValueError):
        ShardedEnsembleSampler(20, NDIM, _lnprob, mesh)  # 10 % 8 != 0

def test_mbbfitter_mesh_end_to_end():
    """MBBFitter(mesh=...) runs the full burn/recenter/production protocol
    with the walker axis sharded, and MBBResults consumes the product."""
    from mbb_emcee_tpu import MBBFitter, MBBResults
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
    import jax.numpy as jnp

    true = np.array([30.0, 2.0, 250.0, 3.2, 50.0])
    wave = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
    f = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                           jnp.asarray(wave, jnp.float32), MBBShape()),
                   np.float64)
    unc = 0.05 * f
    flux = f + unc * np.random.default_rng(0).standard_normal(5)

    fit = MBBFitter(nwalkers=64, seed=11, mesh=walker_mesh(8))
    fit.set_data(wave, flux, unc)
    fit.run(nburn=40, nsteps=150)
    assert fit._backend_used == "sharded"
    res = MBBResults(fit=fit, redshift=2.0)
    c = res.par_cen("T")
    assert abs(c[0] - true[0]) < 10.0
    assert np.isfinite(res.acceptance_fraction).all()

    # fused + mesh is a config error
    import pytest
    fit2 = MBBFitter(nwalkers=64, mesh=walker_mesh(8),
                     sampler_backend="fused")
    fit2.set_data(wave, flux, unc)
    with pytest.raises(ValueError):
        fit2.run(nburn=2, nsteps=4)


def test_sharded_single_trace_across_geometries():
    """One compiled shard_map program serves every (nburn, nsteps, thin)
    geometry (the capped dynamic-length treatment EnsembleSampler got):
    per-geometry recompiles cost 1-400 s each over the TPU tunnel."""
    mesh = walker_mesh()
    s = ShardedEnsembleSampler(16, NDIM, _lnprob, mesh)
    p0 = make_initial_ball(jax.random.PRNGKey(0), MEAN, 0.3 * SIG, 16)
    state = s.init_state(jax.random.PRNGKey(1), p0)
    state = s.advance(state, 7)
    state, c1, _ = s.run_mcmc(state, 12, thin=3)
    state = s.advance(state, 3)
    state, c2, _ = s.run_mcmc(state, 10, thin=2)
    assert c1.shape == (4, 16, NDIM) and c2.shape == (5, 16, NDIM)
    assert s.trace_count == 1


def test_mesh_checkpoint_resume_bitwise():
    """Checkpoint/resume through the SHARDED backend: the resumed chain
    is bitwise-identical to an uninterrupted checkpointed run, and the
    host-loaded state is re-sharded (shard_state) rather than paying an
    extra trace."""
    import tempfile, os
    from mbb_emcee_tpu import MBBFitter
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    true = np.array([30.0, 2.0, 250.0, 3.2, 50.0])
    wave = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
    f = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                           jnp.asarray(wave, jnp.float32), MBBShape()),
                   np.float64)
    unc = 0.05 * f
    flux = f + unc * np.random.default_rng(0).standard_normal(5)

    def fit():
        m = MBBFitter(nwalkers=16, seed=11, mesh=walker_mesh(8))
        m.set_data(wave, flux, unc)
        return m

    with tempfile.TemporaryDirectory() as d:
        ck1 = os.path.join(d, "full.ckpt.h5")
        full = fit().run(nburn=10, nsteps=60, checkpoint=ck1,
                         checkpoint_interval=20)
        full_chain = np.asarray(full.chain)

        ck2 = os.path.join(d, "part.ckpt.h5")
        fit().run(nburn=10, nsteps=20, checkpoint=ck2,
                  checkpoint_interval=20)
        resumed = fit().run(nburn=10, nsteps=60, checkpoint=ck2,
                            checkpoint_interval=20, resume=True)
        np.testing.assert_array_equal(np.asarray(resumed.chain),
                                      full_chain)


def test_multifit_mesh_checkpoint_resume_bitwise(tmp_path):
    """The XLA batch checkpoint covers MESH runs (the fused format
    cannot): kill/resume under the same mesh is bitwise, threefry
    cross-mesh resume is bitwise too (partition-independent streams)."""
    import jax.numpy as jnp
    from mbb_emcee_tpu.multifit import MultiFitter
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    wave = np.linspace(100.0, 500.0, 5)
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(
        jnp.asarray([32.0, 1.9, 250.0, 3.5, 45.0], jnp.float32),
        jnp.asarray(wave, jnp.float32), shape), np.float64)
    rng = np.random.default_rng(3)
    flux = f[None, :] * rng.uniform(0.9, 1.1, (8, wave.size))
    unc = 0.05 * flux
    path = str(tmp_path / "mesh_ck.h5")
    mesh = walker_mesh(8)

    def make(m):
        mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=5,
                         mesh=m, prng_impl="threefry2x32")
        mf.set_data(wave, flux, unc)
        return mf

    ref = make(mesh).run(nburn=10, nsteps=40)
    make(mesh).run(nburn=10, nsteps=20, checkpoint=path,
                   checkpoint_interval=10)
    res = make(mesh).run(nburn=10, nsteps=40, checkpoint=path,
                         checkpoint_interval=10, resume=True)
    np.testing.assert_array_equal(np.asarray(res.chain_free),
                                  np.asarray(ref.chain_free))
    # threefry streams are partition-independent: an UNSHARDED resume
    # of the mesh checkpoint reproduces the same chain
    res2 = make(None).run(nburn=10, nsteps=40, checkpoint=path,
                          checkpoint_interval=10, resume=True)
    np.testing.assert_array_equal(np.asarray(res2.chain_free),
                                  np.asarray(ref.chain_free))
    # ... and extend() keeps working after a resume
    res.extend(10)
    assert res.chain_free.shape[1] == 50
