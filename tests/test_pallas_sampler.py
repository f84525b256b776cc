"""Fused Pallas sampler tests (interpret mode on CPU).

The TPU interpreter stubs the hardware PRNG (returns zeros), so these tests
drive the kernel in rng='external' mode with precomputed uniforms and check
it reproduces the XLA stretch-move implementation consuming the SAME
uniforms -- covering the proposal math, one-hot-matmul partner gather,
accept rule, in-kernel lnprob, chain recording, accept counting, and the
pad-lane isolation, all deterministically (no statistical tolerance).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu
from mbb_emcee_tpu.likelihood import Photometry, LikelihoodSpec
from mbb_emcee_tpu.sampler import (
    make_initial_ball, stretch_half_step_from_uniforms)
from mbb_emcee_tpu.ops.pallas_lnprob import build_pallas_lnprob
from mbb_emcee_tpu.ops.pallas_sampler import FusedPallasSampler

NW = 64
NB = 5
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
WAVE = np.linspace(100.0, 500.0, NB)


def _problem(opthin=False, noalpha=False):
    shape = MBBShape(opthin=opthin, noalpha=noalpha)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(7)
    phot = Photometry(WAVE, f + unc * rng.standard_normal(NB), unc)
    spec = LikelihoodSpec.default()
    spec.upper[0] = 100.0
    spec.upper[1] = 5.0
    return phot, shape, spec


def _reference_run(uniforms, p0, lnprob_batch, nfree, a=2.0):
    """Replay the fused kernel's schedule with the XLA stretch move: per
    step, half A updates against half B (u rows 0-2), then half B against
    the NEW half A (rows 3-5)."""
    half = p0.shape[0] // 2
    pos_a, pos_b = jnp.asarray(p0[:half]), jnp.asarray(p0[half:])
    lnp = lnprob_batch(jnp.asarray(p0))
    lnp_a, lnp_b = lnp[:half], lnp[half:]
    nrec, nthin6, _ = uniforms.shape
    thin = nthin6 // 6
    chain, lnpchain, nacc = [], [], np.zeros(2 * half, np.int64)
    for r in range(nrec):
        for t in range(thin):
            u = uniforms[r, 6 * t:6 * t + 6, :half]
            pos_a, lnp_a, acc_a = stretch_half_step_from_uniforms(
                jnp.asarray(u[0:3]), pos_a, pos_b, lnp_a, lnprob_batch, a)
            pos_b, lnp_b, acc_b = stretch_half_step_from_uniforms(
                jnp.asarray(u[3:6]), pos_b, pos_a, lnp_b, lnprob_batch, a)
            nacc += np.concatenate([np.asarray(acc_a), np.asarray(acc_b)])
        chain.append(np.concatenate([np.asarray(pos_a), np.asarray(pos_b)]))
        lnpchain.append(np.concatenate([np.asarray(lnp_a),
                                        np.asarray(lnp_b)]))
    return np.stack(chain), np.stack(lnpchain), nacc


@pytest.mark.parametrize("opthin,noalpha", [
    (False, False),                                      # full model
    pytest.param(True, False, marks=pytest.mark.slow),
    pytest.param(False, True, marks=pytest.mark.slow),
])
def test_fused_kernel_matches_xla_stretch_move(opthin, noalpha):
    phot, shape, spec = _problem(opthin, noalpha)
    samp = FusedPallasSampler(NW, phot, shape, spec,
                              interpret=True, rng="external")
    fs = samp.free_space
    center = TRUE[fs.free_idx]
    p0 = make_initial_ball(jax.random.key(2), center,
                           0.05 * np.abs(center), NW, fs.lower, fs.upper)
    state = samp.init_state(jax.random.key(3), p0)

    nrecord, thin = 3, 2
    rng = np.random.default_rng(11)
    uniforms = jnp.asarray(
        rng.uniform(0.001, 0.999, (nrecord, 6 * thin, samp.wp))
        .astype(np.float32))

    state, chain, lnpchain = samp.run_mcmc(state, nrecord * thin, thin,
                                           uniforms=uniforms)

    lnprob_batch, _ = build_pallas_lnprob(phot, shape, spec, interpret=True)
    ref_chain, ref_lnp, ref_nacc = _reference_run(
        np.asarray(uniforms), np.asarray(p0), lnprob_batch, fs.nfree)

    assert chain.shape == (nrecord, NW, fs.nfree)
    np.testing.assert_allclose(np.asarray(chain), ref_chain,
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lnpchain), ref_lnp,
                               rtol=2e-5, atol=1e-4)
    # Accept counters and the final state match the chain's last record.
    np.testing.assert_array_equal(np.asarray(state.naccept), ref_nacc)
    np.testing.assert_allclose(np.asarray(state.position),
                               ref_chain[-1], rtol=2e-5, atol=1e-5)
    assert int(state.nsteps) == nrecord * thin


def test_fused_sampler_state_roundtrip_and_reset():
    phot, shape, spec = _problem()
    samp = FusedPallasSampler(NW, phot, shape, spec,
                              interpret=True, rng="external")
    fs = samp.free_space
    center = TRUE[fs.free_idx]
    p0 = make_initial_ball(jax.random.key(0), center,
                           0.05 * np.abs(center), NW, fs.lower, fs.upper)
    state = samp.init_state(jax.random.key(1), p0)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.uniform(0.01, 0.99, (2, 6, samp.wp))
                    .astype(np.float32))
    state2, chain, _ = samp.run_mcmc(state, 2, uniforms=u)
    # advance == run_mcmc without the chain, same uniforms layout
    state3 = samp.advance(state, 2, uniforms=u.reshape(1, 12, samp.wp))
    np.testing.assert_allclose(np.asarray(state3.position),
                               np.asarray(state2.position),
                               rtol=2e-5, atol=1e-5)
    reset = FusedPallasSampler.reset_counters(state2)
    assert int(reset.nsteps) == 0
    assert int(jnp.sum(reset.naccept)) == 0
    af = FusedPallasSampler.acceptance_fraction(state2)
    assert np.all(np.asarray(af) >= 0) and np.all(np.asarray(af) <= 1)


def test_fused_sampler_rejects_bad_config():
    phot, shape, spec = _problem()
    with pytest.raises(ValueError):
        FusedPallasSampler(63, phot, shape, spec)   # odd
    with pytest.raises(ValueError):
        FusedPallasSampler(4, phot, shape, spec)    # < 2*ndim
    samp = FusedPallasSampler(NW, phot, shape, spec,
                              interpret=True, rng="external")
    state = samp.init_state(
        jax.random.key(0),
        jnp.zeros((NW, samp.ndim), jnp.float32) + jnp.asarray(
            TRUE[samp.free_space.free_idx], jnp.float32))
    with pytest.raises(ValueError):
        samp.run_mcmc(state, 2)   # external rng requires uniforms
