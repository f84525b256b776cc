"""Sampler statistics tests (SURVEY.md test plan items 3-4): the JAX
stretch-move sampler reproduces a known Gaussian target's moments, shows
emcee-typical acceptance, is bitwise-deterministic under a fixed key, and
agrees statistically with the NumPy oracle sampler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.sampler import (
    EnsembleSampler, make_initial_ball, autocorrelation_time)
from tests.reference_impl.gw_sampler import GoodmanWeareSampler

NDIM = 3
TARGET_MEAN = np.array([1.0, -2.0, 0.5])
TARGET_SIG = np.array([0.8, 1.5, 0.3])


def _lnprob_gauss(theta):
    d = (theta - jnp.asarray(TARGET_MEAN, jnp.float32)) \
        / jnp.asarray(TARGET_SIG, jnp.float32)
    return -0.5 * jnp.sum(d * d)


def _run(nwalkers=64, nburn=300, nsteps=1500, seed=0):
    s = EnsembleSampler(nwalkers, NDIM, _lnprob_gauss)
    key = jax.random.PRNGKey(seed)
    key, kb = jax.random.split(key)
    p0 = make_initial_ball(kb, TARGET_MEAN, TARGET_SIG, nwalkers)
    state = s.init_state(key, p0)
    state = s.advance(state, nburn)
    state = s.reset_counters(state)
    state, chain, lnp = s.run_mcmc(state, nsteps)
    return s, state, np.asarray(chain), np.asarray(lnp)


def test_gaussian_moments():
    s, state, chain, _ = _run()
    flat = chain.reshape(-1, NDIM)
    # MC error on the mean ~ sigma * sqrt(tau / N_total); loose 3-sigma-ish
    # tolerances.
    assert np.all(np.abs(flat.mean(axis=0) - TARGET_MEAN)
                  < 0.08 * TARGET_SIG)
    np.testing.assert_allclose(flat.std(axis=0), TARGET_SIG, rtol=0.08)


def test_acceptance_fraction_in_emcee_band():
    s, state, chain, _ = _run()
    af = np.asarray(EnsembleSampler.acceptance_fraction(state))
    assert 0.2 < af.mean() < 0.8
    assert af.min() > 0.05


def test_determinism_bitwise():
    _, _, c1, l1 = _run(seed=7)
    _, _, c2, l2 = _run(seed=7)
    assert np.array_equal(c1, c2)
    assert np.array_equal(l1, l2)
    _, _, c3, _ = _run(seed=8)
    assert not np.array_equal(c1, c3)


def test_thinning_matches_unthinned_endpoints():
    """thin=k must visit exactly the same states as thin=1 (same PRNG
    stream), just recording fewer."""
    s = EnsembleSampler(32, NDIM, _lnprob_gauss)
    key = jax.random.PRNGKey(3)
    key, kb = jax.random.split(key)
    p0 = make_initial_ball(kb, TARGET_MEAN, TARGET_SIG, 32)
    st0 = s.init_state(key, p0)
    _, chain1, _ = s.run_mcmc(st0, 40, thin=1)
    _, chain4, _ = s.run_mcmc(st0, 40, thin=4)
    np.testing.assert_array_equal(np.asarray(chain1[3::4]),
                                  np.asarray(chain4))


def test_stretch_z_distribution():
    """Acceptance factor detailed-balance spot check: with a flat target the
    move must leave a uniform-in-box ensemble uniform (mean/var preserved
    within MC error) -- catches a wrong z^(d-1) exponent."""
    nwalkers, ndim = 256, 2

    def lnflat(theta):
        inbox = jnp.all(jnp.abs(theta) < 10.0)
        return jnp.where(inbox, 0.0, -1e30)

    s = EnsembleSampler(nwalkers, ndim, lnflat)
    key = jax.random.PRNGKey(11)
    p0 = jax.random.uniform(key, (nwalkers, ndim), minval=-10.0, maxval=10.0)
    state = s.init_state(jax.random.PRNGKey(12), p0)
    state, chain, _ = s.run_mcmc(state, 400)
    flat = np.asarray(chain[200:]).reshape(-1, ndim)
    # Uniform on [-10, 10]: mean 0, std 20/sqrt(12) = 5.77.
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.5)
    np.testing.assert_allclose(flat.std(axis=0), 5.7735, rtol=0.05)


def test_matches_numpy_oracle_sampler():
    """Same Gaussian target: JAX sampler and the oracle GW sampler agree on
    posterior moments within MC error (different PRNGs, so statistical
    comparison only -- SURVEY.md 'parity is statistical, not bitwise')."""
    def lnp_np(theta):
        d = (theta - TARGET_MEAN) / TARGET_SIG
        return -0.5 * float(d @ d)

    rng = np.random.default_rng(5)
    p0 = TARGET_MEAN + TARGET_SIG * rng.standard_normal((64, NDIM))
    gw = GoodmanWeareSampler(64, NDIM, lnp_np, seed=5)
    pos, _ = gw.run_mcmc(p0, 300, store=False)
    gw.reset()
    gw.run_mcmc(pos, 1500)
    oracle_flat = gw.flatchain

    _, _, chain, _ = _run()
    jax_flat = chain.reshape(-1, NDIM)

    assert np.all(np.abs(jax_flat.mean(axis=0) - oracle_flat.mean(axis=0))
                  < 0.1 * TARGET_SIG)
    np.testing.assert_allclose(jax_flat.std(axis=0),
                               oracle_flat.std(axis=0), rtol=0.1)


def test_autocorrelation_time_sane():
    _, _, chain, _ = _run(nsteps=2000)
    tau = autocorrelation_time(chain)
    assert np.all(np.isfinite(tau))
    assert np.all(tau > 0.5) and np.all(tau < 200.0)


def test_rejects_bad_geometry():
    with pytest.raises(ValueError):
        EnsembleSampler(5, NDIM, _lnprob_gauss)   # odd
    with pytest.raises(ValueError):
        EnsembleSampler(4, NDIM, _lnprob_gauss)   # < 2*ndim


def test_initial_ball_no_fp32_quantization_at_far_bound():
    """Regression: the box reflection must not round in-box values to the
    fp32 quantum at the (huge) bound. A tight ball near 20 with an upper
    bound of 1e7 used to collapse onto exactly 20.0 (fp32 spacing at 1e7
    is 1.0), permanently freezing that ensemble coordinate."""
    import jax
    import numpy as np
    from mbb_emcee_tpu.sampler import make_initial_ball

    ball = make_initial_ball(jax.random.key(0),
                             center=np.array([20.0]),
                             scatter=np.array([0.16]),
                             nwalkers=64,
                             lower=np.array([1e-5]),
                             upper=np.array([1e7]))
    b = np.asarray(ball)[:, 0]
    assert b.std() > 0.1                      # not collapsed
    assert np.unique(b).size == 64            # and not quantized
    assert np.all(b > 1e-5) and np.all(b < 1e7)


def test_initial_ball_one_sided_bounds():
    """A lone lower (or upper) bound must still reflect — not silently
    skip boundary handling and start most of a tight ball out of
    support."""
    import jax
    import numpy as np
    from mbb_emcee_tpu.sampler import make_initial_ball

    ball = make_initial_ball(jax.random.key(1),
                             center=np.array([0.05]),
                             scatter=np.array([0.5]),
                             nwalkers=256,
                             lower=np.array([0.0]))
    b = np.asarray(ball)[:, 0]
    assert np.all(b > 0.0)
    assert b.std() > 0.1                      # reflected, not clipped
    ball = make_initial_ball(jax.random.key(1),
                             center=np.array([-0.05]),
                             scatter=np.array([0.5]),
                             nwalkers=256,
                             upper=np.array([0.0]))
    b = np.asarray(ball)[:, 0]
    assert np.all(b < 0.0) and b.std() > 0.1


def test_frozen_dimension_rhat_is_nan_not_converged():
    """A degenerate (constant) ensemble coordinate must read as
    pathological: NaN from both R-hat variants (so any rhat<thresh gate
    fails), matching effective_sample_size — never 0.0 ('perfectly
    converged')."""
    from mbb_emcee_tpu.sampler import (
        split_rhat, split_rhat_rank_normalized)
    rng = np.random.default_rng(0)
    chain = rng.normal(size=(64, 8, 2))
    chain[:, :, 1] = 3.25                   # frozen coordinate
    r = split_rhat(chain)
    assert np.isfinite(r[0]) and abs(r[0] - 1.0) < 0.2
    assert np.isnan(r[1])
    assert not (r[1] < 1.01)                # the gate fails
    rr = split_rhat_rank_normalized(chain)
    assert np.isfinite(rr[0]) and np.isnan(rr[1])
    # device twin agrees
    from mbb_emcee_tpu.batchengine import _batched_split_rhat
    rd = np.asarray(_batched_split_rhat(
        jnp.asarray(chain[None], jnp.float32)))[0]
    assert np.isfinite(rd[0]) and np.isnan(rd[1])


def test_single_trace_across_geometries():
    """ONE compiled program serves every (nsteps, thin) geometry: different
    burn/production lengths in one process must not retrace (the capped-grid
    dynamic run; a retrace here costs a full compile per new geometry)."""
    key = jax.random.PRNGKey(3)
    s = EnsembleSampler(32, NDIM, _lnprob_gauss)
    p0 = jax.random.normal(key, (32, NDIM))
    st = s.init_state(key, p0)
    st = s.advance(st, 7)
    st, c1, _ = s.run_mcmc(st, 20)
    st, c2, _ = s.run_mcmc(st, 30, thin=3)
    st = s.advance(st, 13)
    assert c1.shape == (20, 32, NDIM)
    assert c2.shape == (10, 32, NDIM)
    assert s.trace_count == 1


def test_run_mcmc_segments_past_rec_cap():
    """Requests longer than the record cap stream through segments and
    concatenate seamlessly; determinism is preserved vs a small-cap run."""
    key = jax.random.PRNGKey(5)
    p0 = jax.random.normal(key, (32, NDIM))
    a = EnsembleSampler(32, NDIM, _lnprob_gauss, rec_cap=8)
    b = EnsembleSampler(32, NDIM, _lnprob_gauss)
    sa, ca, _ = a.run_mcmc(a.init_state(key, p0), 20)
    sb, cb, _ = b.run_mcmc(b.init_state(key, p0), 20)
    assert ca.shape == (20, 32, NDIM)
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(sa.position),
                                  np.asarray(sb.position))


def test_zero_uniform_does_not_accept_out_of_box():
    """An acceptance uniform of exactly 0 (possible in fp32) must not
    accept an out-of-box proposal: log(0) = -inf compares below even the
    finite LNPROB_FLOOR, which is how emcee's true -inf floor behaves
    (-inf < -inf is False)."""
    from mbb_emcee_tpu.sampler import stretch_half_step_from_uniforms
    from mbb_emcee_tpu.likelihood import LNPROB_FLOOR

    def lnprob(x):   # support is x0 <= 1
        return jnp.where(x[:, 0] <= 1.0, 0.0, LNPROB_FLOOR)

    active = jnp.ones((4, 1))
    passive = jnp.full((4, 1), 0.9)
    # u3[0]=1 -> z=2 -> proposal 0.9 + 2*0.1 = 1.1 (out of box);
    # u3[2]=0 -> log(0) = -inf would accept without the support guard.
    u3 = jnp.stack([jnp.ones(4), jnp.zeros(4), jnp.zeros(4)])
    new, lnp, acc = stretch_half_step_from_uniforms(
        u3, active, passive, lnprob(active), lnprob)
    assert not bool(jnp.any(acc))
    assert float(jnp.max(new)) <= 1.0


# -- rank-normalized diagnostics (Vehtari et al. 2021) -----------------------

def test_inverse_normal_cdf_accuracy():
    from math import erf, sqrt
    from mbb_emcee_tpu.sampler import inverse_normal_cdf
    p = np.array([1e-6, 0.025, 0.3, 0.5, 0.7, 0.975, 1 - 1e-6])
    x = inverse_normal_cdf(p)
    assert abs(x[3]) < 1e-9
    np.testing.assert_allclose(x[1], -1.9599639845, atol=1e-6)
    np.testing.assert_allclose(x[5], 1.9599639845, atol=1e-6)
    # Round trip through the exact CDF.
    phi = np.array([0.5 * (1 + erf(v / sqrt(2.0))) for v in x])
    np.testing.assert_allclose(phi, p, rtol=1e-6, atol=1e-12)


def test_rank_normalize_properties():
    from mbb_emcee_tpu.sampler import rank_normalize
    rng = np.random.default_rng(2)
    x = rng.standard_cauchy((100, 8))           # heavy tails, no moments
    z = rank_normalize(x)
    assert z.shape == x.shape
    # Order-preserving and approximately standard normal.
    flat_x, flat_z = x.ravel(), z.ravel()
    order = np.argsort(flat_x)
    assert np.all(np.diff(flat_z[order]) > 0)
    assert abs(flat_z.mean()) < 0.05
    assert abs(flat_z.std() - 1.0) < 0.1


def test_rank_rhat_and_ess_on_iid_chains():
    from mbb_emcee_tpu.sampler import (
        split_rhat_rank_normalized, effective_sample_size)
    rng = np.random.default_rng(3)
    chain = rng.standard_normal((250, 16, 2))
    rhat = split_rhat_rank_normalized(chain)
    assert rhat.shape == (2,)
    assert np.all(rhat < 1.02)
    n_total = 250 * 16
    for kind in ("bulk", "tail"):
        ess = effective_sample_size(chain, kind=kind)
        assert np.all(ess > 0.4 * n_total) and np.all(ess < 2.0 * n_total)
    with pytest.raises(ValueError):
        effective_sample_size(chain, kind="nope")


def test_rank_rhat_flags_location_and_scale_mismatch():
    from mbb_emcee_tpu.sampler import split_rhat_rank_normalized, split_rhat
    rng = np.random.default_rng(4)
    # Location mismatch: half the walkers sample a shifted mode.
    loc = rng.standard_normal((200, 16, 1))
    loc[:, 8:, :] += 3.0
    assert split_rhat_rank_normalized(loc)[0] > 1.2
    # Scale mismatch, equal locations: the moment-based estimator is
    # blind (B ~ 0) but the FOLDED rank statistic catches it.
    scale = rng.standard_normal((200, 16, 1))
    scale[:, 8:, :] *= 5.0
    assert split_rhat(scale)[0] < 1.05          # classic misses it
    assert split_rhat_rank_normalized(scale)[0] > 1.1


def test_rank_rhat_calibrated_on_heavy_tails():
    """iid Cauchy chains ARE converged; the rank-normalized estimator
    must say so (the moment-based one is noise-dominated there)."""
    from mbb_emcee_tpu.sampler import (
        split_rhat_rank_normalized, effective_sample_size)
    rng = np.random.default_rng(5)
    chain = rng.standard_cauchy((300, 16, 1))
    assert split_rhat_rank_normalized(chain)[0] < 1.02
    assert np.isfinite(effective_sample_size(chain, kind="bulk")[0])


def test_ess_frozen_chain_reports_nan():
    """A zero-variance series must report ESS = NaN, not the maximum
    (a stuck ensemble carries no information about any summary)."""
    from mbb_emcee_tpu.sampler import effective_sample_size
    rng = np.random.default_rng(6)
    chain = np.stack([np.ones((200, 16)),                 # frozen dim
                      rng.standard_normal((200, 16))], axis=2)
    for kind in ("bulk", "tail"):
        ess = effective_sample_size(chain, kind=kind)
        assert np.isnan(ess[0]), kind
        assert np.isfinite(ess[1]), kind
