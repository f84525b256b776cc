"""Cross-instance traced-program sharing (round 5).

The module-level LRU (sampler.shared_program) must share jitted run
programs ONLY between samplers whose computation is provably identical:
same geometry AND matching content fingerprints of every closure
constant. A wrong share would silently sample a different posterior, so
these tests pin the cache-key semantics, not just the speedup.
"""

import numpy as np
import pytest

from mbb_emcee_tpu import MBBFitter
from mbb_emcee_tpu.sampler import EnsembleSampler, shared_program, _PROGRAM_LRU

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
FLUX = np.array([10.0, 14.0, 12.0, 8.0, 4.0])
UNC = 0.05 * FLUX


def _fit(seed=1, flux=FLUX, **kw):
    f = MBBFitter(nwalkers=16, seed=seed, opthin=True, noalpha=True, **kw)
    f.set_data(WAVE, flux, UNC)
    return f


def test_same_configuration_shares_run_program():
    s1 = _fit(seed=1).build()[2]
    s2 = _fit(seed=2).build()[2]
    assert s1._program_token == s2._program_token
    assert s1._get_run() is s2._get_run()


def test_different_data_does_not_share():
    s1 = _fit().build()[2]
    s2 = _fit(flux=FLUX * 1.1).build()[2]
    assert s1._program_token != s2._program_token
    assert s1._get_run() is not s2._get_run()


def test_different_spec_does_not_share():
    f2 = _fit()
    f2.set_gaussian_prior("beta", 1.9, 0.3)
    s1 = _fit().build()[2]
    s2 = f2.build()[2]
    assert s1._program_token != s2._program_token
    assert s1._get_run() is not s2._get_run()


def test_different_geometry_does_not_share():
    """Same token, different nwalkers: the geometry rides the cache key
    inside _get_run, not the token."""
    f1, f2 = _fit(), _fit()
    s1 = f1.build()[2]
    lnprob, fs, _ = f2.build()
    s2 = EnsembleSampler(32, fs.nfree, lnprob,
                         program_token=s1._program_token)
    assert s1._get_run() is not s2._get_run()


def test_default_token_none_keeps_per_instance_tracing():
    lnprob, fs, _ = _fit().build()
    s1 = EnsembleSampler(16, fs.nfree, lnprob)
    s2 = EnsembleSampler(16, fs.nfree, lnprob)
    assert s1._get_run() is not s2._get_run()


def test_shared_program_runs_are_bitwise_deterministic():
    f1 = _fit(seed=7)
    f1.run(nburn=6, nsteps=8)
    f2 = _fit(seed=7)
    f2.run(nburn=6, nsteps=8)
    np.testing.assert_array_equal(np.asarray(f1.chain),
                                  np.asarray(f2.chain))


def test_lru_eviction_bounds_the_cache():
    keys_before = len(_PROGRAM_LRU)
    for i in range(5):
        shared_program(("test-evict", i), lambda: object())
    assert len(_PROGRAM_LRU) <= 256
    # re-fetch moves to end and returns the same object
    a = shared_program(("test-evict", 4), lambda: object())
    b = shared_program(("test-evict", 4), lambda: object())
    assert a is b
    assert len(_PROGRAM_LRU) >= min(keys_before, 1)


def test_fused_token_ignores_data_but_not_spec():
    """The fused sampler's run program takes data as jit ARGUMENTS, so
    its token must match across different data -- and still split on a
    spec change (different uplim mask -> different kernel)."""
    from mbb_emcee_tpu.ops.pallas_sampler import FusedPallasSampler
    from mbb_emcee_tpu.likelihood import Photometry, LikelihoodSpec
    from mbb_emcee_tpu.models.modified_blackbody import MBBShape

    shape = MBBShape(opthin=True, noalpha=True)
    spec = LikelihoodSpec.default()
    s1 = FusedPallasSampler(16, Photometry(WAVE, FLUX, UNC), shape, spec,
                            interpret=True)
    s2 = FusedPallasSampler(16, Photometry(WAVE, FLUX * 1.3, UNC), shape,
                            spec, interpret=True)
    assert s1._program_token == s2._program_token

    import dataclasses
    spec_up = dataclasses.replace(spec,
                                  uplim_bands=np.array([0, 0, 0, 0, 1],
                                                       bool))
    s3 = FusedPallasSampler(16, Photometry(WAVE, FLUX, UNC), shape,
                            spec_up, interpret=True)
    assert s1._program_token != s3._program_token
