"""BatchEngine hook-contract test (VERDICT r03 task 7).

MultiFitter and SEDMultiFitter are the two shipping adapters over
`batchengine.BatchEngine`; this file instantiates a THIRD, minimal
adapter -- a 2-parameter straight-line model written from scratch against
ONLY the documented hook surface (batchengine.py module docstring) -- and
runs it through the full tier matrix: run / bitwise extend / segmented
checkpoint-resume / PT (+ tier checkpoint resume) / HMC / MAP / nested
evidence / posterior summaries.

Two things are being pinned:
  * SUFFICIENCY -- the ~15 documented hooks are everything a new model
    family needs (nothing in the engine silently depends on
    MBB/SED-specific attributes);
  * STABILITY -- an engine change that alters a hook's name, signature,
    or calling discipline breaks this adapter loudly instead of drifting
    the docstring away from the implementation.

The linear-Gaussian toy also has an ANALYTIC evidence, so the PT
stepping-stone and nested-sampling tiers are checked against truth, not
just against each other.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.batchengine import BatchEngine
from mbb_emcee_tpu.checkpoint import (
    data_fingerprint, _key_from_np, _key_to_np)
from mbb_emcee_tpu.likelihood import (
    FreeSpace, LikelihoodSpec, LNPROB_FLOOR)
from mbb_emcee_tpu.paramspace import ParamSpaceMixin

X = np.linspace(1.0, 5.0, 8)          # "wavelengths" of the toy bands
TRUE_M, TRUE_B = 2.0, 1.0
LOWER = np.array([-10.0, -20.0])
UPPER = np.array([10.0, 20.0])


class LineFitter(BatchEngine, ParamSpaceMixin):
    """Minimal third adapter: y = m*x + b per source, diagonal Gaussian
    errors. Implements the documented hook surface and NOTHING else --
    every line here is what a new model family minimally owes the
    engine."""

    _PARAMS = ("m", "b")

    def __init__(self, nwalkers=16, seed=9, a=2.0, mesh=None,
                 prng_impl="threefry2x32"):
        self.nwalkers = int(nwalkers)
        self.seed = int(seed)
        self.a = float(a)
        self.mesh = mesh
        self.prng_impl = prng_impl
        self._spec = LikelihoodSpec.for_box(LOWER, UPPER)
        self._init = np.array([0.0, 0.0])
        self._scatter = np.array([0.5, 1.0])
        self._user_init = np.zeros(2, bool)
        self._user_scatter = np.zeros(2, bool)
        self.wave = self.flux = self.unc = None
        self.source_names = None
        self.redshifts = None
        self.chain_free = None
        self.lnprobability = None
        self.acceptance_fraction = None
        self.free_space = None
        self.thin = 1
        self._xla_keys = None
        self._xla_counters = None
        self._post_token = None
        self._run_cache = {}

    # -- ParamSpaceMixin hooks ------------------------------------------
    def _param_index(self, param):
        if isinstance(param, (int, np.integer)):
            return int(param)
        return self._PARAMS.index(str(param).lower())

    def _effective_spec(self):
        return self._spec

    # -- data -----------------------------------------------------------
    def set_data(self, x, flux, unc):
        self.wave = np.asarray(x, np.float64)
        self.flux = np.atleast_2d(np.asarray(flux, np.float64))
        self.unc = np.atleast_2d(np.asarray(unc, np.float64))
        return self

    # -- engine hooks (the documented contract) -------------------------
    def _engine_label(self):
        return "line"

    @property
    def _engine_param_names(self):
        return list(self._PARAMS)

    def _engine_lnprob(self, spec):
        fs = FreeSpace.from_spec(spec)
        template = jnp.asarray(fs.template, jnp.float32)
        scatter = jnp.asarray(fs.scatter_matrix(), jnp.float32)
        lo = jnp.asarray(fs.lower, jnp.float32)
        hi = jnp.asarray(fs.upper, jnp.float32)
        pm = jnp.asarray(spec.prior_mean, jnp.float32)
        pis = jnp.asarray(spec.prior_isigma, jnp.float32)

        def lnprob(theta_free, wave, flux_s, iunc_s):
            theta = template + scatter @ theta_free
            inbox = jnp.all((theta_free >= lo) & (theta_free <= hi))
            r = (theta[0] * wave + theta[1] - flux_s) * iunc_s
            lnl = -0.5 * jnp.sum(r * r)
            dp = (theta - pm) * pis
            lnp = lnl - 0.5 * jnp.sum(dp * dp)
            return jnp.where(inbox, lnp, jnp.float32(LNPROB_FLOOR))

        return lnprob, fs

    def _engine_operands(self, free_space):
        return (jnp.asarray(self.flux, jnp.float32),
                jnp.asarray(1.0 / self.unc, jnp.float32))

    def _engine_compile_token(self, spec):
        return data_fingerprint(spec.lower, spec.upper, spec.fixed,
                                spec.fixed_values, spec.prior_mean,
                                spec.prior_isigma)

    def _engine_init_centers(self, init, free_space):
        S = self.nsources
        idx = free_space.free_idx
        cen = np.broadcast_to(self._init[idx], (S, free_space.nfree))
        sca = np.broadcast_to(self._scatter[idx], (S, free_space.nfree))
        return cen, sca

    def _posterior_token(self):
        spec = self._effective_spec()
        return data_fingerprint(
            self.wave, self.flux, self.unc, spec.lower, spec.upper,
            spec.fixed, spec.fixed_values, spec.prior_mean,
            spec.prior_isigma, np.asarray([self.a]))

    def _engine_record_run(self, spec):
        self._post_token = self._posterior_token()

    def _engine_check_extend(self, spec):
        if self._posterior_token() != self._post_token:
            raise RuntimeError("posterior changed after run(); call "
                               "run() instead of extend()")

    def _engine_record_map(self, spec):
        self._map_token = self._posterior_token()

    def _engine_band_flux_eval(self):
        wave = jnp.asarray(self.wave, jnp.float32)

        def fluxes(theta_full):
            return theta_full[0] * wave + theta_full[1]

        return fluxes

    def _engine_posterior_repr(self):
        return self._posterior_token()

    # -- run surface (thin wrappers over the engine) --------------------
    def run(self, nburn=50, nsteps=200, thin=1, recenter_burn=True,
            verbose=False, init="auto", checkpoint=None,
            checkpoint_interval=100, resume=False):
        import os
        if checkpoint is not None:
            return self._engine_run_checkpointed(
                nburn, nsteps, thin, recenter_burn, verbose, init,
                checkpoint, int(checkpoint_interval),
                bool(resume and os.path.exists(checkpoint)))
        return self._engine_run_xla(nburn, nsteps, thin, recenter_burn,
                                    verbose, init)

    def extend(self, nsteps, verbose=False):
        return self._engine_extend_xla(nsteps, verbose)

    def writeToHDF5(self, path):
        """Segmented-checkpoint flush: the engine only requires a method
        of this NAME persisting enough state for
        _engine_adopt_checkpoint; the format is the adapter's business
        (npz here -- the toy owes the engine no HDF5)."""
        np.savez(
            path, chain_free=np.asarray(self.chain_free),
            lnprobability=np.asarray(self.lnprobability),
            acceptance_fraction=np.asarray(self.acceptance_fraction),
            keys=_key_to_np(self._xla_keys),
            naccept=np.asarray(self._xla_counters[0]),
            nsteps=np.asarray(self._xla_counters[1]),
            thin=self.thin, seed=self.seed, nwalkers=self.nwalkers,
            post_token=np.frombuffer(
                self._post_token.encode(), np.uint8))

    def _engine_adopt_checkpoint(self, path, thin_i):
        d = np.load(path if str(path).endswith(".npz")
                    else str(path) + ".npz")
        token = bytes(d["post_token"]).decode()
        if token != self._posterior_token():
            raise RuntimeError("checkpointed posterior differs")
        if int(d["nwalkers"]) != self.nwalkers \
                or int(d["thin"]) != thin_i or int(d["seed"]) != self.seed:
            raise ValueError("checkpoint geometry mismatch")
        self.chain_free = jnp.asarray(d["chain_free"])
        self.lnprobability = jnp.asarray(d["lnprobability"])
        self.acceptance_fraction = jnp.asarray(d["acceptance_fraction"])
        self.free_space = FreeSpace.from_spec(self._effective_spec())
        self.thin = int(d["thin"])
        self._xla_keys = _key_from_np(d["keys"], self.prng_impl)
        self._xla_counters = (jnp.asarray(d["naccept"]),
                              jnp.asarray(d["nsteps"]))
        self._post_token = token


def _make(S=3, seed=0, **kw):
    rng = np.random.default_rng(seed)
    m = TRUE_M + 0.2 * rng.standard_normal(S)
    b = TRUE_B + 0.5 * rng.standard_normal(S)
    y = m[:, None] * X[None, :] + b[:, None]
    unc = 0.1 * np.ones((S, X.size))
    flux = y + unc * rng.standard_normal(y.shape)
    lf = LineFitter(**kw)
    lf.set_data(X, flux, unc)
    return lf, m, b, flux, unc


def _wls(flux_s, unc_s):
    """Exact weighted least squares for one source: (mean, cov)."""
    A = np.stack([X, np.ones_like(X)], axis=1)
    W = np.diag(1.0 / unc_s ** 2)
    cov = np.linalg.inv(A.T @ W @ A)
    mean = cov @ A.T @ W @ flux_s
    return mean, cov


def test_run_recovers_wls_posterior():
    lf, m, b, flux, unc = _make()
    lf.run(nburn=150, nsteps=600)
    assert lf.chain_free.shape == (3, 600, 16, 2)
    for s in range(3):
        mean, cov = _wls(flux[s], unc[s])
        flat = np.asarray(lf.chain_free)[s].reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), mean,
                                   atol=4 * np.sqrt(np.diag(cov)).max())
        np.testing.assert_allclose(flat.std(axis=0), np.sqrt(np.diag(cov)),
                                   rtol=0.25)
    # summary surfaces run off the toy chains too
    cen = lf.par_cen("m")
    assert cen.shape == (3, 3)
    assert np.isfinite(lf.gelman_rubin()).all()


def test_extend_is_bitwise_continuation():
    full, *_ = _make(seed=1)
    full.run(nburn=40, nsteps=40)
    split, *_ = _make(seed=1)
    split.run(nburn=40, nsteps=20)
    split.extend(20)
    np.testing.assert_array_equal(np.asarray(split.chain_free),
                                  np.asarray(full.chain_free))
    # hook contract: posterior edits after run() must refuse extend()
    split.set_uplim("m", 9.0)
    with pytest.raises(RuntimeError, match="posterior changed"):
        split.extend(10)


def test_segmented_checkpoint_resume_bitwise(tmp_path):
    ck = str(tmp_path / "line.ck.npz")
    full, *_ = _make(seed=2)
    full.run(nburn=30, nsteps=40)
    part, *_ = _make(seed=2)
    part.run(nburn=30, nsteps=20, checkpoint=ck, checkpoint_interval=10)
    res, *_ = _make(seed=2)
    res.run(nburn=30, nsteps=40, checkpoint=ck, checkpoint_interval=10,
            resume=True)
    np.testing.assert_array_equal(np.asarray(res.chain_free),
                                  np.asarray(full.chain_free))


def _analytic_logz(flux_s, unc_s):
    """ln Z of the linear-Gaussian toy against the uniform box prior
    (posterior mass far inside the box -> Laplace is exact)."""
    mean, cov = _wls(flux_s, unc_s)
    r = (mean[0] * X + mean[1] - flux_s) / unc_s
    chi2_min = float(r @ r)
    vol = float(np.prod(UPPER - LOWER))
    return (-0.5 * chi2_min + 0.5 * np.log(np.linalg.det(2 * np.pi * cov))
            - np.log(vol))


def test_pt_tier_with_checkpoint_resume(tmp_path):
    lf, m, b, flux, unc = _make(seed=3)
    lf.run_pt(nrungs=10, nburn=150, nsteps=400)
    logz, logz_err = lf.logz_pt
    for s in range(3):
        want = _analytic_logz(flux[s], unc[s])
        assert abs(float(logz[s]) - want) < max(0.5, 4 * float(
            logz_err[s])), f"source {s}: {float(logz[s])} vs {want}"
    # tier checkpoint: interrupted-and-resumed == uninterrupted, chains
    # AND evidence (the engine's named-array tier format, toy adapter)
    ck = str(tmp_path / "pt.ck.h5")
    a, *_ = _make(seed=3)
    a.run_pt(nrungs=4, nburn=20, nsteps=20, checkpoint=ck,
             checkpoint_interval=20)
    fullpt, *_ = _make(seed=3)
    fullpt.run_pt(nrungs=4, nburn=20, nsteps=40)
    respt, *_ = _make(seed=3)
    respt.run_pt(nrungs=4, nburn=20, nsteps=40, checkpoint=ck,
                 checkpoint_interval=20, resume=True)
    np.testing.assert_array_equal(np.asarray(respt.chain_free),
                                  np.asarray(fullpt.chain_free))
    np.testing.assert_array_equal(np.asarray(respt.logz_pt[0]),
                                  np.asarray(fullpt.logz_pt[0]))


def test_hmc_tier():
    lf, m, b, flux, unc = _make(seed=4)
    lf.run_hmc(nwarmup=100, nsteps=300, n_leapfrog=8)
    assert lf.chain_free.shape[0] == 3
    for s in range(3):
        mean, cov = _wls(flux[s], unc[s])
        flat = np.asarray(lf.chain_free)[s].reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), mean,
                                   atol=4 * np.sqrt(np.diag(cov)).max())
    # PT/HMC tiers are not extend()-continuable; the engine must have
    # cleared the stretch-move continuation state
    with pytest.raises(RuntimeError):
        lf.extend(10)


def test_map_tier_matches_wls():
    lf, m, b, flux, unc = _make(seed=5)
    lf.run_map(nstarts=4, n_adam=60, n_newton=8)
    for s in range(3):
        mean, cov = _wls(flux[s], unc[s])
        np.testing.assert_allclose(lf.map_params[s], mean, atol=1e-2)
        np.testing.assert_allclose(
            lf.map_sigma[s], np.sqrt(np.diag(cov)), rtol=0.05)
    # and init='map' seeds a run through the same hook surface
    lf.run(nburn=20, nsteps=40, init="map")
    assert lf.chain_free.shape[1] == 40


def test_evidence_tier_matches_analytic():
    lf, m, b, flux, unc = _make(seed=6)
    ev = lf.compute_evidence(nlive=256, nbatch=32, nsteps=24)
    for s in range(3):
        want = _analytic_logz(flux[s], unc[s])
        tol = max(0.5, 4 * float(ev.logz_err[s]))
        assert abs(float(ev.logz[s]) - want) < tol, \
            f"source {s}: {float(ev.logz[s])} vs {want}"
