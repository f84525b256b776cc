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
