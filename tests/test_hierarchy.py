"""Hierarchical population tier: importance-reweighted hyper-inference.

Validates the TruncatedGaussianPopulation normalization, the fused
hierarchical lnprob against a NumPy oracle, end-to-end hyper-parameter
recovery against the exact analytic marginal likelihood (the
importance-sampling machinery is the ONLY difference between the two
chains), the ESS diagnostic, the from_batch bridge off a MultiFitter
run, and the mesh-sharded evaluation path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mbb_emcee_tpu import MultiFitter
from mbb_emcee_tpu.hierarchy import (
    TruncatedGaussianPopulation, build_hier_lnprob, HierarchicalFitter,
    fit_population)
from mbb_emcee_tpu.likelihood import LikelihoodSpec
from mbb_emcee_tpu.sampler import EnsembleSampler, make_initial_ball
from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu


# ---------------------------------------------------------------- population

def test_truncnorm_normalization():
    """exp(ln_dist) integrates to 1 over the truncation box, including
    when the population presses against an edge (where the Phi-difference
    term does real work)."""
    pop = TruncatedGaussianPopulation.for_box(("a", "b"),
                                              [0.0, -3.0], [10.0, 3.0])
    grid_a = np.linspace(0.0, 10.0, 2001)
    grid_b = np.linspace(-3.0, 3.0, 2001)
    for mu, sig in [((5.0, 0.0), (1.0, 1.0)),
                    ((0.5, 2.8), (2.0, 0.7)),       # pressed to edges
                    ((9.9, -2.9), (5.0, 3.0))]:     # wide + at corner
        phi = jnp.asarray(np.concatenate([mu, sig]), jnp.float32)
        theta = jnp.asarray(
            np.stack(np.meshgrid(grid_a, grid_b, indexing="ij"), axis=-1),
            jnp.float32)
        p = np.asarray(jnp.exp(pop.ln_dist(phi, theta)), np.float64)
        integral = np.trapezoid(np.trapezoid(p, grid_b, axis=1), grid_a)
        assert abs(integral - 1.0) < 2e-3, (mu, sig, integral)


def test_population_validation():
    with pytest.raises(ValueError):
        TruncatedGaussianPopulation.for_box(("a",), [1.0], [0.0])
    with pytest.raises(ValueError):
        TruncatedGaussianPopulation.for_box(("a", "b"), [0.0], [1.0])
    with pytest.raises(ValueError):
        TruncatedGaussianPopulation.for_box(("a",), [0.0], [1.0],
                                            sigma_min=0.5, sigma_max=0.1)


# ------------------------------------------------------------------- lnprob

def test_lnprob_matches_numpy_oracle():
    """The fused device lnprob == a from-scratch NumPy evaluation of the
    reweighted hierarchical likelihood, including a Gaussian interim
    prior correction and the truncation normalization."""
    rng = np.random.default_rng(42)
    S, N, K = 12, 64, 2
    lo = np.array([0.0, -5.0])
    hi = np.array([20.0, 5.0])
    samples = rng.uniform(lo, hi, (S, N, K))
    # interim Gaussian prior on param 0
    mu0, sig0 = 8.0, 6.0
    ln_interim = -0.5 * ((samples[..., 0] - mu0) / sig0) ** 2

    pop = TruncatedGaussianPopulation.for_box(("x", "y"), lo, hi)
    spec = LikelihoodSpec.for_box(pop.lower, pop.upper)
    lnprob, fs = build_hier_lnprob(samples, pop, spec,
                                   ln_interim=ln_interim)

    def oracle(phi):
        from scipy.stats import norm
        mu, sig = phi[:K], phi[K:]
        z = (samples - mu) / sig
        trunc = norm.cdf((hi - mu) / sig) - norm.cdf((lo - mu) / sig)
        ld = np.sum(-0.5 * z * z - np.log(sig)
                    - 0.5 * np.log(2 * np.pi) - np.log(trunc), axis=-1)
        lw = ld - ln_interim
        m = lw.max(axis=-1, keepdims=True)
        per_src = np.log(np.exp(lw - m).mean(axis=-1)) + m[:, 0]
        return per_src.sum()

    for _ in range(5):
        phi = np.concatenate([rng.uniform(lo + 1, hi - 1),
                              rng.uniform(0.5, 4.0, K)])
        got = float(lnprob(jnp.asarray(phi, jnp.float32)))
        want = oracle(phi)
        assert np.isfinite(got)
        assert abs(got - want) < 2e-4 * max(1.0, abs(want)), (got, want)

    # out-of-box hyper vectors hit the package lnprob floor
    bad = np.concatenate([lo - 1.0, np.full(K, 1.0)])
    assert float(lnprob(jnp.asarray(bad, jnp.float32))) < -1e29


def test_ess_uniform_weights_and_custom_population():
    """A flat (bring-your-own) population model gives exactly uniform
    weights -> ESS == N for every source; also exercises the duck-typed
    population contract."""

    class FlatPop:
        hyper_names = ("c",)
        lower = np.array([0.0])
        upper = np.array([1.0])
        default_init = np.array([0.5])
        default_scatter = np.array([0.1])

        def ln_dist(self, phi, theta):
            return jnp.zeros(theta.shape[:-1], theta.dtype) + 0.0 * phi[0]

        def ln_hyper_prior(self, phi):
            return jnp.asarray(0.0, phi.dtype)

    rng = np.random.default_rng(1)
    S, N = 6, 128
    samples = rng.normal(0, 1, (S, N, 1))
    hf = HierarchicalFitter(samples, FlatPop(), nwalkers=8, seed=5)
    ess = hf.reweight_ess(phi=np.array([0.5]))
    assert ess.shape == (S,)
    np.testing.assert_allclose(ess, N, rtol=1e-4)


# ------------------------------------------------------- recovery vs oracle

def _population_setup(seed=7):
    rng = np.random.default_rng(seed)
    S, N = 64, int(256 * (4 if __import__("os").environ.get("MBB_RUNSLOW")
                          else 1))
    mu_true, sig_true, sig_obs = 35.0, 4.0, 1.5
    theta_s = rng.normal(mu_true, sig_true, S)
    x_s = theta_s + rng.normal(0, sig_obs, S)
    # exact per-source posterior draws under a flat interim prior:
    # theta | x_s ~ N(x_s, sig_obs)
    samples = (x_s[:, None] + rng.normal(0, sig_obs, (S, N)))[..., None]
    return samples, x_s, sig_obs


def test_recovery_matches_analytic_marginal():
    """Hyper-posterior via importance reweighting == hyper-posterior via
    the EXACT analytic marginal likelihood
        ln L(mu, sig) = sum_s ln N(x_s; mu, sqrt(sig^2 + sig_obs^2)),
    sampled with the same ensemble sampler over the same hyper box.  The
    stored-samples machinery is the only difference between the chains,
    so agreement here validates the reweighting construction itself."""
    # default lane at reduced chain length (tolerances are width-
    # relative); --runslow restores full scale
    sc = 2 if __import__("os").environ.get("MBB_RUNSLOW") else 1
    samples, x_s, sig_obs = _population_setup()
    lo, hi = 10.0, 60.0  # wide box: truncation term ~= 1 for both forms

    pop = TruncatedGaussianPopulation.for_box(("T",), [lo], [hi])
    hf = HierarchicalFitter(samples, pop, nwalkers=64, seed=11)
    hf.run(nburn=150 * sc, nsteps=600 * sc)

    # oracle chain on the analytic marginal over the same (mu, sigma) box
    def analytic_lnprob(phi):
        mu, sig = phi[0], phi[1]
        s2 = sig * sig + sig_obs * sig_obs
        lnl = jnp.sum(-0.5 * (x_s - mu) ** 2 / s2 - 0.5 * jnp.log(s2))
        inbox = ((mu >= lo) & (mu <= hi)
                 & (sig >= pop.sigma_min[0]) & (sig <= pop.sigma_max[0]))
        return jnp.where(inbox, lnl, -1e30)

    samp = EnsembleSampler(64, 2, analytic_lnprob)
    key = jax.random.PRNGKey(99)
    key, kb = jax.random.split(key)
    p0 = make_initial_ball(kb, np.array([35.0, 5.0]), np.array([3.0, 1.0]),
                           64, np.array([lo, pop.sigma_min[0]]),
                           np.array([hi, pop.sigma_max[0]]))
    st = samp.init_state(key, p0)
    st = samp.advance(st, 150 * sc)
    st = EnsembleSampler.reset_counters(st)
    st, chain, _ = samp.run_mcmc(st, 600 * sc)
    oracle_flat = np.asarray(chain).reshape(-1, 2)

    for i, name in enumerate(("mu_T", "sigma_T")):
        got = hf.par_cen(name)
        med_o = np.median(oracle_flat[:, i])
        width_o = np.subtract(*np.percentile(oracle_flat[:, i],
                                             [84.15, 15.85]))
        # medians agree within a third of the CI width (generous for the
        # two chains' independent MC error + fp32 + finite N reweighting)
        assert abs(got[0] - med_o) < 0.35 * width_o, (name, got, med_o)
        # CI widths agree to ~20%
        width_h = got[1] + got[2]
        assert abs(width_h - width_o) < 0.25 * width_o, (name, got, width_o)

    # ESS should be healthy: population sigma >> sig_obs means each
    # source's chain easily covers its population-weighted region
    ess = hf.reweight_ess()
    assert ess.min() > 0.2 * samples.shape[1]


def test_fixed_hyper_and_setters():
    samples, x_s, sig_obs = _population_setup(seed=3)
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples, pop, nwalkers=16, seed=2)
    hf.fix_param("sigma_T", 4.0)
    hf.set_gaussian_prior("mu_T", 35.0, 20.0)
    hf.run(nburn=100, nsteps=300)
    assert hf.chain_free.shape == (300, 16, 1)
    assert hf.free_hyper_names() == ["mu_T"]
    cen = hf.par_cen("mu_T")
    assert 25.0 < cen[0] < 45.0
    with pytest.raises(ValueError):
        hf.hyper_chain("sigma_T")
    names, rhat = hf.gelman_rubin()
    assert names == ["mu_T"] and rhat.shape == (1,)
    phi, lnp = hf.best_fit()
    assert phi.shape == (2,) and phi[1] == 4.0 and np.isfinite(lnp)
    # extend() continues and appends
    hf.extend(100)
    assert hf.chain_free.shape == (400, 16, 1)


def test_mesh_sharded_lnprob_matches_unsharded():
    """Same lnprob values with the sample tensor sharded over the 8-CPU
    source mesh (XLA inserts the source-sum collective)."""
    from jax.sharding import Mesh
    rng = np.random.default_rng(5)
    S, N = 16, 64
    samples = rng.uniform(15.0, 55.0, (S, N, 1))
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    spec = LikelihoodSpec.for_box(pop.lower, pop.upper)

    lnp_plain, _ = build_hier_lnprob(samples, pop, spec)
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("src",))
    lnp_mesh, _ = build_hier_lnprob(samples, pop, spec, mesh=mesh)

    for phi in ([35.0, 4.0], [20.0, 1.0], [50.0, 12.0]):
        a = float(lnp_plain(jnp.asarray(phi, jnp.float32)))
        b = float(lnp_mesh(jnp.asarray(phi, jnp.float32)))
        assert abs(a - b) < 1e-3 * max(1.0, abs(a)), (phi, a, b)

    with pytest.raises(ValueError):
        build_hier_lnprob(samples[:6], pop, spec, mesh=mesh)


def test_program_token_splits_on_mesh_shape():
    """Two meshes over the SAME devices/axis-names but different grid
    shapes lower to different shardings; their fitters must not share a
    traced run program (the token rides batchengine._mesh_token, which
    includes the device-grid shape)."""
    from jax.sharding import Mesh
    rng = np.random.default_rng(9)
    samples = rng.uniform(15.0, 55.0, (16, 32, 1))
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    devs = np.array(jax.devices()[:4])

    def token(mesh):
        hf = HierarchicalFitter(samples, pop, nwalkers=8, mesh=mesh)
        return hf._program_token(hf._effective_spec())

    t22 = token(Mesh(devs.reshape(2, 2), ("a", "b")))
    t41 = token(Mesh(devs.reshape(4, 1), ("a", "b")))
    assert t22 is not None and t41 is not None
    assert t22 != t41
    # identical meshes DO share
    assert token(Mesh(devs.reshape(2, 2), ("a", "b"))) == t22


# ------------------------------------------------------------ batch bridge

def test_from_batch_population_fit():
    """End-to-end: a MultiFitter catalog drawn from a known T-population,
    then fit_population recovers a sane mu_T and divides out an interim
    Gaussian prior.  Kept small for the fast lane; the statistical power
    test is the analytic-oracle parity above."""
    wave = np.linspace(100.0, 500.0, 5)
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(21)
    S = 8
    t_true = np.clip(rng.normal(35.0, 5.0, S), 20.0, 55.0)
    flux, unc = [], []
    for t in t_true:
        th = np.array([t, 1.8, 250.0, 4.0, 40.0])
        f = np.asarray(mbb_fnu(jnp.asarray(th, jnp.float32),
                               jnp.asarray(wave, jnp.float32), shape),
                       np.float64)
        u = 0.05 * f
        flux.append(f + u * rng.standard_normal(wave.size))
        unc.append(u)

    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=9)
    mf.set_data(wave, np.array(flux), np.array(unc))
    mf.set_uplim("T", 90.0)
    mf.set_gaussian_prior("T", 35.0, 25.0)    # weak interim prior
    mf.run(nburn=60, nsteps=200)

    hf = HierarchicalFitter.from_batch(mf, params=("T",), max_samples=2048)
    # the interim Gaussian prior on T must be divided out
    assert hf.ln_interim is not None
    assert hf.samples.shape[0] == S and hf.samples.shape[2] == 1
    assert hf.samples.shape[1] <= 2048

    hf = fit_population(mf, params=("T",), nburn=100, nsteps=400,
                        max_samples=2048)
    mu = hf.par_cen("mu_T")
    t_med = mf.par_cen("T")[:, 0]
    # the population mean lands near the catalog's per-source medians
    assert abs(mu[0] - t_med.mean()) < max(3.0 * mu[1], 5.0)
    ess = hf.reweight_ess()
    assert ess.shape == (S,) and np.all(ess > 1.0)

    with pytest.raises(ValueError):
        HierarchicalFitter.from_batch(mf, params=("lambda0",))


def test_from_batch_requires_run():
    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True)
    with pytest.raises(RuntimeError):
        HierarchicalFitter.from_batch(mf, params=("T",))


def test_hdf5_roundtrip(tmp_path):
    import h5py
    samples, _, _ = _population_setup(seed=13)
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples[:8], pop, nwalkers=16, seed=4)
    hf.run(nburn=50, nsteps=100)
    path = str(tmp_path / "hier.h5")
    hf.writeToHDF5(path)
    with h5py.File(path, "r") as f:
        assert f.attrs["kind"] == "hierarchy"
        names = [n.decode() for n in f.attrs["hyper_names"]]
        assert names == ["mu_T", "sigma_T"]
        assert f["chain_free"].shape == (100, 16, 2)
        assert f["reweight_ess"].shape == (8,)
        np.testing.assert_array_equal(f["hyper_lower"][...], pop.lower)


def test_from_batch_sedmulti():
    """The bridge is surface-agnostic: a generic-model SEDMultiFitter run
    feeds the same hierarchy (free names resolved from the model)."""
    from mbb_emcee_tpu.sed import SEDModel
    from mbb_emcee_tpu.sedmulti import SEDMultiFitter

    def powerlaw(theta, wave):
        amp, slope = theta[..., 0], theta[..., 1]
        return amp[..., None] * (wave / 100.0) ** (-slope[..., None])

    model = SEDModel(fnu=lambda th, w: th[0] * (w / 100.0) ** (-th[1]),
                     param_names=("amp", "slope"),
                     lower=[1.0, 0.1], upper=[100.0, 3.0], name="plaw")
    wave = np.array([60.0, 100.0, 250.0, 500.0])
    rng = np.random.default_rng(6)
    S = 4
    slopes = rng.uniform(0.8, 1.6, S)
    flux = np.stack([20.0 * (wave / 100.0) ** (-s) for s in slopes])
    unc = 0.05 * flux
    smf = SEDMultiFitter(model, nwalkers=16, seed=3)
    smf.set_data(wave, flux + unc * rng.standard_normal(flux.shape), unc)
    for nm, v in (("amp", 20.0), ("slope", 1.2)):
        smf.set_param_init(nm, v, 0.2 * v)
    smf.run(nburn=40, nsteps=120)

    hf = HierarchicalFitter.from_batch(smf, params=("slope",),
                                       nwalkers=16, max_samples=512)
    hf.run(nburn=50, nsteps=150)
    cen = hf.par_cen("mu_slope")
    assert 0.5 < cen[0] < 2.0
    assert hf.reweight_ess().shape == (S,)
    with pytest.raises(ValueError):
        HierarchicalFitter.from_batch(smf, params=("T",))


# ------------------------------------------------- correlated population

def test_corr_population_normalization():
    """The bivariate density integrates to 1 over the truncation box for
    benign, edge-pressed, high-|rho|, and near-sigma_min populations (the
    standardized-coordinate GL rule must resolve all of them)."""
    from mbb_emcee_tpu.hierarchy import CorrelatedGaussianPopulation
    pop = CorrelatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])
    ga = np.linspace(10.0, 60.0, 1200)
    gb = np.linspace(0.5, 3.5, 1200)
    theta = jnp.asarray(
        np.stack(np.meshgrid(ga, gb, indexing="ij"), axis=-1), jnp.float32)
    for phi in ([35.0, 2.0, 5.0, 0.4, 0.0],
                [35.0, 2.0, 5.0, 0.4, 0.9],
                [12.0, 0.7, 8.0, 0.8, 0.6],        # corner-pressed
                [35.0, 2.0, 0.6, 0.04, 0.9],       # near sigma_min
                [58.0, 3.4, 40.0, 2.9, -0.5]):     # huge sigma at corner
        p = np.asarray(jnp.exp(pop.ln_dist(
            jnp.asarray(phi, jnp.float32), theta)), np.float64)
        integral = np.trapezoid(np.trapezoid(p, gb, axis=1), ga)
        assert abs(integral - 1.0) < 5e-3, (phi, integral)


def test_corr_population_validation():
    from mbb_emcee_tpu.hierarchy import CorrelatedGaussianPopulation
    with pytest.raises(ValueError):
        CorrelatedGaussianPopulation.for_box(
            ("a", "b", "c"), [0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    with pytest.raises(ValueError):
        CorrelatedGaussianPopulation.for_box(
            ("a", "b"), [0.0, 0.0], [1.0, 1.0], rho_max=1.5)


def test_corr_population_recovers_correlation():
    """A catalog drawn from a rho=0.7 population: the rho posterior
    covers the truth and excludes zero (exact analytic per-source
    posterior draws, so the only machinery under test is the tier)."""
    from mbb_emcee_tpu.hierarchy import (
        CorrelatedGaussianPopulation, HierarchicalFitter)
    sc = 2 if __import__("os").environ.get("MBB_RUNSLOW") else 1
    rng = np.random.default_rng(23)
    S, N = 96, 128 * sc
    mu_t = np.array([35.0, 1.9])
    sig_t = np.array([5.0, 0.35])
    rho_t = 0.7
    cov = np.array([[sig_t[0] ** 2, rho_t * sig_t[0] * sig_t[1]],
                    [rho_t * sig_t[0] * sig_t[1], sig_t[1] ** 2]])
    theta_s = rng.multivariate_normal(mu_t, cov, S)
    sig_obs = np.array([1.2, 0.08])
    x_s = theta_s + rng.normal(0, sig_obs, (S, 2))
    samples = x_s[:, None, :] + rng.normal(0, sig_obs, (S, N, 2))

    pop = CorrelatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])
    hf = HierarchicalFitter(samples, pop, nwalkers=64, seed=31)
    hf.run(nburn=200 * sc, nsteps=600 * sc)

    rho = hf.par_cen("rho_T_beta")
    width = rho[1] + rho[2]
    assert abs(rho[0] - rho_t) < 1.5 * width, rho
    assert rho[0] - 2.0 * rho[2] > 0.0, rho      # excludes rho = 0
    mu_a = hf.par_cen("mu_T")
    assert abs(mu_a[0] - mu_t[0]) < 3.0 * (mu_a[1] + mu_a[2])
    ess = hf.reweight_ess()
    assert ess.min() > 10.0


def test_population_box_indicator():
    """Samples OUTSIDE the population's truncation box contribute zero
    weight (a narrowed population box must not see them)."""
    pop = TruncatedGaussianPopulation.for_box(("x",), [0.0], [1.0])
    theta = jnp.asarray([[0.5], [1.5]], jnp.float32)
    ld = np.asarray(pop.ln_dist(
        jnp.asarray([0.5, 0.3], jnp.float32), theta))
    assert np.isfinite(ld[0]) and ld[0] > -10.0
    assert ld[1] < -1e29


# ------------------------------------------------------- hyper evidence

def test_compute_evidence_smoke():
    samples, _, _ = _population_setup(seed=9)
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples[:16], pop, nwalkers=16, seed=2)
    res = hf.compute_evidence(nlive=64, nbatch=8, nsteps=8, max_iter=400)
    assert np.isfinite(res.logz) and res.logz_err < 1.0
    assert hf.evidence is res
    assert res.samples.shape[-1] == 2


@pytest.mark.slow
def test_evidence_selects_population_family():
    """Bayes factor between the independent and correlated families: a
    rho=0.7 catalog must prefer the correlated model decisively; a rho=0
    catalog must NOT (Occam penalty for the extra hyper-parameter)."""
    from mbb_emcee_tpu.hierarchy import CorrelatedGaussianPopulation

    def make(rho_t, seed):
        rng = np.random.default_rng(seed)
        S, N = 48, 128
        mu_t = np.array([35.0, 1.9])
        sig_t = np.array([5.0, 0.35])
        cov = np.array(
            [[sig_t[0] ** 2, rho_t * sig_t[0] * sig_t[1]],
             [rho_t * sig_t[0] * sig_t[1], sig_t[1] ** 2]])
        theta_s = rng.multivariate_normal(mu_t, cov, S)
        sig_obs = np.array([1.2, 0.08])
        x_s = theta_s + rng.normal(0, sig_obs, (S, 2))
        return x_s[:, None, :] + rng.normal(0, sig_obs, (S, N, 2))

    ind = TruncatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])
    corr = CorrelatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])

    kw = dict(nlive=256, nbatch=16, nsteps=16, max_iter=1500)
    for rho_t, want_corr in ((0.7, True), (0.0, False)):
        samples = make(rho_t, seed=int(100 * (1 + rho_t)))
        z_ind = HierarchicalFitter(samples, ind,
                                   seed=3).compute_evidence(**kw)
        z_corr = HierarchicalFitter(samples, corr,
                                    seed=3).compute_evidence(**kw)
        lnbf = z_corr.logz - z_ind.logz
        err = np.hypot(z_corr.logz_err, z_ind.logz_err)
        if want_corr:
            assert lnbf > 3.0 + 2 * err, (rho_t, lnbf, err)
        else:
            # rho=0 catalog: no decisive preference FOR the correlated
            # family (it nests the independent one, so lnZ can't be far
            # above; Occam should keep it at or below)
            assert lnbf < 2.0 + 2 * err, (rho_t, lnbf, err)


def test_marginal_pdf_matches_joint():
    """Closed-form box-truncated marginals == numeric marginalization of
    exp(ln_dist) for both families (incl. the bivariate conditional-box
    construction)."""
    from mbb_emcee_tpu.hierarchy import CorrelatedGaussianPopulation
    gb = np.linspace(0.5, 3.5, 4001)
    ga = np.linspace(10.0, 60.0, 301)

    corr = CorrelatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])
    phi = np.array([33.0, 1.2, 7.0, 0.6, 0.65])
    theta = jnp.asarray(
        np.stack(np.meshgrid(ga, gb, indexing="ij"), axis=-1), jnp.float32)
    joint = np.asarray(jnp.exp(corr.ln_dist(
        jnp.asarray(phi, jnp.float32), theta)), np.float64)
    numeric = np.trapezoid(joint, gb, axis=1)          # marginal in T
    closed = corr.marginal_pdf(phi, 0, ga)
    np.testing.assert_allclose(closed, numeric, rtol=5e-3, atol=1e-5)

    ind = TruncatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])
    phi_i = np.array([33.0, 1.2, 7.0, 0.6])
    joint_i = np.asarray(jnp.exp(ind.ln_dist(
        jnp.asarray(phi_i, jnp.float32), theta)), np.float64)
    numeric_i = np.trapezoid(joint_i, gb, axis=1)
    closed_i = ind.marginal_pdf(phi_i, 0, ga)
    np.testing.assert_allclose(closed_i, numeric_i, rtol=5e-3, atol=1e-5)


# ------------------------------------------------------ review-pass fixes

def test_from_h5_roundtrip_full():
    """writeToHDF5 -> from_h5 restores summaries, ESS, and the built-in
    population (both families), and a reload can re-run."""
    samples, _, _ = _population_setup(seed=17)
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples[:8], pop, nwalkers=16, seed=4)
    hf.fix_param("sigma_T", 4.0)
    hf.run(nburn=40, nsteps=100)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "h.h5")
        hf.writeToHDF5(path)
        back = HierarchicalFitter.from_h5(path)
        np.testing.assert_array_equal(back.chain_free, hf.chain_free)
        np.testing.assert_allclose(back.par_cen("mu_T"),
                                   hf.par_cen("mu_T"))
        np.testing.assert_allclose(back.reweight_ess(), hf.reweight_ess(),
                                   rtol=1e-5)
        assert back.free_hyper_names() == ["mu_T"]
        assert isinstance(back.population, TruncatedGaussianPopulation)
        # the reload re-fits reproducibly (same seed, same spec)
        back.run(nburn=40, nsteps=100)
        np.testing.assert_array_equal(back.chain_free, hf.chain_free)

    from mbb_emcee_tpu.hierarchy import CorrelatedGaussianPopulation
    rng = np.random.default_rng(2)
    s2 = rng.uniform([15.0, 1.0], [50.0, 3.0], (6, 64, 2))
    pop2 = CorrelatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 3.5])
    hf2 = HierarchicalFitter(s2, pop2, nwalkers=16, seed=1)
    hf2.run(nburn=30, nsteps=60)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "h2.h5")
        hf2.writeToHDF5(path)
        back2 = HierarchicalFitter.from_h5(path)
        assert isinstance(back2.population, CorrelatedGaussianPopulation)
        assert back2.population.rho_max == pop2.rho_max
        np.testing.assert_allclose(back2.par_cen("rho_T_beta"),
                                   hf2.par_cen("rho_T_beta"))


def test_dead_source_raises():
    """A source with NO samples inside the population box must raise at
    build time, not silently freeze the hyper-sampler at acceptance 0."""
    rng = np.random.default_rng(1)
    samples = rng.uniform(20.0, 40.0, (4, 32, 1))
    samples[2] = 80.0    # entirely outside the narrowed box below
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    spec = LikelihoodSpec.for_box(pop.lower, pop.upper)
    with pytest.raises(ValueError, match=r"source\(s\) \[2\]"):
        build_hier_lnprob(samples, pop, spec)


def test_dtype_not_prequantized():
    samples = np.random.default_rng(0).normal(35, 4, (4, 16, 1))
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf64 = HierarchicalFitter(samples, pop, dtype=jnp.float64, nwalkers=8)
    assert hf64.samples.dtype == np.float64
    hf32 = HierarchicalFitter(samples, pop, nwalkers=8)
    assert hf32.samples.dtype == np.float32


def test_tiny_verbose_run_survives(capsys):
    samples, _, _ = _population_setup(seed=5)
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples[:4], pop, nwalkers=8, seed=1)
    hf.run(nburn=5, nsteps=2, verbose=True)       # < 4 records
    assert "nan" in capsys.readouterr().out
    assert hf.chain_free.shape[0] == 2


def test_multi_axis_mesh_first_axis_divides():
    """Only the FIRST mesh axis shards sources; a (2, 4) mesh with S=12
    must be accepted (12 % 2 == 0) even though 12 % 8 != 0."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("src", "other"))
    rng = np.random.default_rng(3)
    samples = rng.uniform(15.0, 55.0, (12, 32, 1))
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    spec = LikelihoodSpec.for_box(pop.lower, pop.upper)
    lnp, _ = build_hier_lnprob(samples, pop, spec, mesh=mesh)
    assert np.isfinite(float(lnp(jnp.asarray([35.0, 4.0], jnp.float32))))
    with pytest.raises(ValueError, match="source count 10"):
        build_hier_lnprob(samples[:10], pop, spec,
                          mesh=Mesh(devs.reshape(8), ("src",)))


# ----------------------------------------------------------- selection

@pytest.mark.slow
def test_selection_corrects_malmquist_bias():
    """Threshold-selected catalog (keep sources with observed x > cut,
    which removes the faint half): the uncorrected fit is biased high by
    several CI widths; with Selection attached the hyper-posterior
    matches an MCMC over the EXACT analytic selection-corrected marginal
    (alpha has the closed form Phi((mu-cut)/sqrt(sig^2+sig_obs^2)) for
    this construction, so the oracle is exact)."""
    from scipy.special import ndtr as np_ndtr
    from jax.scipy.special import ndtr as j_ndtr
    from mbb_emcee_tpu.hierarchy import Selection

    # default lane runs at reduced scale (tolerances below are width-
    # relative, so they stay valid); --runslow restores full scale
    slow = bool(__import__("os").environ.get("MBB_RUNSLOW"))
    sc = 2 if slow else 1
    rng = np.random.default_rng(77)
    mu_t, sig_t, sig_obs, cut = 35.0, 4.0, 1.5, 35.0
    lo, hi = 10.0, 60.0
    theta_all = rng.normal(mu_t, sig_t, 400)
    x_all = theta_all + rng.normal(0, sig_obs, 400)
    x_s = x_all[x_all > cut][:64]
    S, N = x_s.size, 128 * sc
    assert S == 64
    samples = (x_s[:, None] + rng.normal(0, sig_obs, (S, N)))[..., None]

    pop = TruncatedGaussianPopulation.for_box(("T",), [lo], [hi])

    # naive (no selection): biased high by the construction
    naive = HierarchicalFitter(samples, pop, nwalkers=64, seed=11)
    naive.run(nburn=150 * sc, nsteps=400 * sc)
    mu_naive = naive.par_cen("mu_T")
    assert mu_naive[0] - mu_t > 2.0 * mu_naive[2], mu_naive

    # corrected: uniform injections over the box with analytic P_det
    M = 20480 * sc
    inj = rng.uniform(lo, hi, (M, 1))
    pdet = np_ndtr((inj[:, 0] - cut) / sig_obs)
    corr = HierarchicalFitter(samples, pop, nwalkers=64, seed=11)
    corr.set_selection(inj, pdet=pdet)
    corr.run(nburn=150 * sc, nsteps=600 * sc)
    assert corr.selection_neff() > 4 * S    # Farr 2019 rule of thumb

    # exact analytic oracle over the same hyper box
    def oracle_lnprob(phi):
        mu, sig = phi[0], phi[1]
        s2 = sig * sig + sig_obs * sig_obs
        lnl = jnp.sum(-0.5 * (x_s - mu) ** 2 / s2 - 0.5 * jnp.log(s2))
        alpha = j_ndtr((mu - cut) / jnp.sqrt(s2))
        lnl = lnl - S * jnp.log(jnp.maximum(alpha, 1e-30))
        inbox = ((mu >= lo) & (mu <= hi)
                 & (sig >= pop.sigma_min[0]) & (sig <= pop.sigma_max[0]))
        return jnp.where(inbox, lnl, -1e30)

    samp = EnsembleSampler(64, 2, oracle_lnprob)
    key = jax.random.PRNGKey(5)
    key, kb = jax.random.split(key)
    p0 = make_initial_ball(kb, np.array([35.0, 5.0]), np.array([3.0, 1.0]),
                           64, np.array([lo, pop.sigma_min[0]]),
                           np.array([hi, pop.sigma_max[0]]))
    st = samp.init_state(key, p0)
    st = samp.advance(st, 150 * sc)
    st = EnsembleSampler.reset_counters(st)
    st, chain, _ = samp.run_mcmc(st, 600 * sc)
    oracle_flat = np.asarray(chain).reshape(-1, 2)

    for i, name in enumerate(("mu_T", "sigma_T")):
        got = corr.par_cen(name)
        med_o = np.median(oracle_flat[:, i])
        width_o = np.subtract(*np.percentile(oracle_flat[:, i],
                                             [84.15, 15.85]))
        assert abs(got[0] - med_o) < 0.4 * width_o, (name, got, med_o)
        assert abs(got[1] + got[2] - width_o) < 0.3 * width_o, (name, got)
    # ... and the corrected mu_T actually covers the truth
    mu_c = corr.par_cen("mu_T")
    assert abs(mu_c[0] - mu_t) < 3.0 * max(mu_c[1], mu_c[2]), mu_c


def test_selection_found_injection_form():
    """The found-injection convention (only detected draws listed,
    n_total = campaign size, ln_pdet = 0) estimates the same alpha as
    the probability-weighted form: the two lnprobs differ by the same
    small MC offset at every phi."""
    from scipy.special import ndtr as np_ndtr
    from mbb_emcee_tpu.hierarchy import Selection
    rng = np.random.default_rng(3)
    lo, hi, sig_obs, cut = 10.0, 60.0, 1.5, 30.0
    M = 65536
    inj = rng.uniform(lo, hi, (M, 1))
    pdet = np_ndtr((inj[:, 0] - cut) / sig_obs)
    found = rng.uniform(0, 1, M) < pdet

    sel_w = Selection.from_injections(inj, pdet=pdet, box=([lo], [hi]))
    sel_f = Selection.from_injections(inj[found], n_total=M,
                                      box=([lo], [hi]))

    samples = rng.normal(40.0, 3.0, (8, 64, 1))
    pop = TruncatedGaussianPopulation.for_box(("T",), [lo], [hi])
    spec = LikelihoodSpec.for_box(pop.lower, pop.upper)
    lnp_w, _ = build_hier_lnprob(samples, pop, spec, selection=sel_w)
    lnp_f, _ = build_hier_lnprob(samples, pop, spec, selection=sel_f)
    diffs = []
    for phi in ([40.0, 3.0], [35.0, 6.0], [45.0, 2.0]):
        a = float(lnp_w(jnp.asarray(phi, jnp.float32)))
        b = float(lnp_f(jnp.asarray(phi, jnp.float32)))
        diffs.append(a - b)
    # same alpha in expectation: differences small and phi-stable
    assert np.max(np.abs(diffs)) < 0.5, diffs


def test_selection_validation_and_persistence():
    from mbb_emcee_tpu.hierarchy import Selection
    rng = np.random.default_rng(1)
    inj = rng.uniform(10.0, 60.0, (128, 1))
    with pytest.raises(ValueError, match="box"):
        Selection.from_injections(inj)
    with pytest.raises(ValueError, match="n_total"):
        Selection.from_injections(inj, n_total=5, box=([10.0], [60.0]))
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        Selection.from_injections(inj, pdet=np.full(128, 1.5),
                                  box=([10.0], [60.0]))

    # injections all outside the population box -> loud failure
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    spec = LikelihoodSpec.for_box(pop.lower, pop.upper)
    samples = rng.normal(35.0, 3.0, (4, 32, 1))
    bad = Selection.from_injections(np.full((16, 1), 99.0),
                                    box=([10.0], [60.0]))
    with pytest.raises(ValueError, match="injections"):
        build_hier_lnprob(samples, pop, spec, selection=bad)

    # round-trips through HDF5
    hf = HierarchicalFitter(samples, pop, nwalkers=8, seed=2)
    hf.set_selection(inj)
    hf.run(nburn=20, nsteps=40)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.h5")
        hf.writeToHDF5(path)
        back = HierarchicalFitter.from_h5(path)
        assert back.selection is not None
        np.testing.assert_allclose(back.selection.injections, inj)
        assert back.selection.n_total == 128
        assert np.isfinite(back.selection_neff(phi=[35.0, 5.0]))
