"""Simulation-based calibration of the full inference pipeline.

Draw many truths from the prior, generate data from the likelihood's own
noise model, run the batched fit, and evaluate each posterior's CDF at
its truth: under CORRECT inference F_post(theta_true) is exactly
Uniform(0,1) (probability integral transform), independent of the data
realization. Any systematic error -- biased medians, mis-scaled CI
widths (e.g. an fp32 likelihood floor), a broken prior/limit treatment,
an unconverged burn-in protocol -- shows up as non-uniform ranks.

This is stronger than the pull test in test_multifit.py: pulls only
check the first two moments against a Gaussian shape; SBC ranks check
the whole distribution, with no Gaussianity assumption.

Reference anchor: SURVEY.md section 4 (sampler statistics tests) and the
BASELINE accuracy contract. Runs in the slow lane.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu import MultiFitter
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])

# The SBC prior: uniform over this box (set as the fitter's limits so
# the sampled prior IS the drawing prior).
BOX = {"T": (15.0, 60.0), "beta": (0.8, 3.0), "fnorm": (10.0, 200.0)}


@pytest.mark.slow
def test_sbc_ranks_uniform():
    S = 48
    rng = np.random.default_rng(20260818)
    shape = MBBShape(opthin=True, noalpha=True)

    trues = np.column_stack([
        rng.uniform(*BOX["T"], S),
        rng.uniform(*BOX["beta"], S),
        np.full(S, 250.0),                 # inert under opthin
        np.full(S, 4.0),                   # inert under noalpha
        rng.uniform(*BOX["fnorm"], S),
    ])
    flux, unc = [], []
    for t in trues:
        f = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        u = 0.05 * f
        flux.append(f + u * rng.standard_normal(WAVE.size))
        unc.append(u)

    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=99)
    for name, (lo, hi) in BOX.items():
        mf.set_lowlim(name, lo)
        mf.set_uplim(name, hi)
    mf.set_data(WAVE, np.array(flux), np.array(unc))
    mf.run(nburn=250, nsteps=600, thin=2)

    # F_post(true) per source x free param. mf.chain is in the FULL
    # 5-parameter space (S, nwalkers, nrec, 5) -- index by full-space
    # position, not free-space order.
    chain = np.asarray(mf.chain)
    idx = {"T": 0, "beta": 1, "fnorm": 4}
    ranks = []
    for name in mf.free_param_names:
        true_p = trues[:, idx[name]]
        flat = chain[..., idx[name]].reshape(S, -1)
        ranks.append((flat < true_p[:, None]).mean(axis=1))
    ranks = np.concatenate(ranks)          # 3*S values in [0, 1]

    n = ranks.size
    # KS distance against U(0,1). Ranks of one source's params are
    # correlated (posterior correlations), so the effective n is below
    # 3*S; the threshold is set loose accordingly (~alpha << 1e-3 even
    # at n_eff = S).
    grid = np.sort(ranks)
    ks = np.max(np.abs(grid - (np.arange(1, n + 1) / n)))
    assert ks < 2.3 / np.sqrt(S), f"SBC ranks not uniform: KS={ks:.3f}"
    # First two moments as a diagnostic with direction information:
    # mean shift = biased medians; variance shift = CI widths wrong
    # (var < 1/12 means posteriors too WIDE, > means too narrow).
    assert abs(ranks.mean() - 0.5) < 0.10, ranks.mean()
    assert 0.6 / 12 < ranks.var() < 1.6 / 12, ranks.var()
    # No rank piled at the box edges (a broken limit/reflection would
    # concentrate truths outside the sampled support).
    assert (ranks < 0.02).mean() < 0.15
    assert (ranks > 0.98).mean() < 0.15
