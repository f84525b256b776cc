"""Batched multi-source fitting: the production/serving path.

The reference fits ONE source per process; its only parallel axis is
walkers-within-a-fit via a multiprocessing pool (SURVEY.md section 2,
parallelism row). On TPU the natural serving axis is SOURCES: survey
pipelines fit thousands of objects with the same model configuration. Here
B independent photometry sets -- sharing the model shape, parameter
box/priors/fixed params, and band geometry, each with its own fluxes and
uncertainties (and later its own redshift for derived quantities) -- are
fit SIMULTANEOUSLY:

  * one device computation advances all B ensembles per step
    (vmap over sources of the vmapped stretch move);
  * burn-in re-centering happens per source on that source's best walker;
  * derived-quantity posteriors (L_IR, dust mass, peak wavelength) are one
    batched quadrature/optimization over all sources x samples.

Multi-chip: the source axis is embarrassingly parallel. Pass a 1-D
jax.sharding.Mesh and the batch state/data are sharded over it with
NamedSharding -- XLA partitions the whole run with zero collectives
(tested on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

import dataclasses as _dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mbb_emcee_tpu.constants import (
    PARAM_NAMES, NPARAMS, HCOK_UM_K)
from mbb_emcee_tpu.models.modified_blackbody import MBBShape
from mbb_emcee_tpu.likelihood import (
    LikelihoodSpec, FreeSpace, build_lnprob_data, param_index, Photometry,
    signed_iunc, SUPPORT_FLOOR as _SUPPORT_FLOOR)
from mbb_emcee_tpu.models.cosmology import Cosmology, luminosity_distance
from mbb_emcee_tpu.sampler import (
    SamplerState, ensemble_step, make_initial_ball)
from mbb_emcee_tpu.fitter import DEFAULT_INIT, DEFAULT_SCATTER
from mbb_emcee_tpu.paramspace import ParamSpaceMixin
from mbb_emcee_tpu.results import _percentile_summary
from mbb_emcee_tpu import derived

# Derived-quantity kernels + tuning constants are shared with the
# single-source path (results.MBBResults) via derived.py.
_PEAK_RANGE = derived.PEAK_RANGE


def _split_rhat_one(c):
    """Device split-R-hat for one source's (nrec, nw, nfree) chain --
    the batched on-device twin of sampler.split_rhat (same formula and
    variance floor)."""
    half = c.shape[0] // 2
    sp = jnp.concatenate([c[:half], c[half:2 * half]], axis=1)
    sp = jnp.transpose(sp, (1, 0, 2))          # (m, n, nfree)
    n = sp.shape[1]
    means = sp.mean(axis=1)
    w = sp.var(axis=1, ddof=1).mean(axis=0)
    b = n * means.var(axis=0, ddof=1)
    var_post = (n - 1) / n * w + b / n
    return jnp.sqrt(var_post / jnp.maximum(w, 1e-30))


_batched_split_rhat = jax.jit(jax.vmap(_split_rhat_one))


def _tau_one_dim(x, c=5.0):
    """Integrated autocorrelation time of one (nrec, nw) series batch --
    the device twin of sampler.autocorrelation_time (emcee-style FFT
    autocorrelation + Sokal adaptive window), vectorized so the Sokal
    window pick is an argmin instead of host control flow."""
    nsteps = x.shape[0]
    nfft = 1
    while nfft < 2 * nsteps:
        nfft <<= 1
    xd = x - x.mean(axis=0, keepdims=True)
    f = jnp.fft.rfft(xd, n=nfft, axis=0)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:nsteps].real
    acf = acf.mean(axis=1)
    rho = acf / jnp.where(acf[0] > 0, acf[0], 1.0)
    tau_run = 2.0 * jnp.cumsum(rho) - 1.0
    window = jnp.arange(nsteps) < c * tau_run
    idx = jnp.where(jnp.all(window), nsteps - 1, jnp.argmin(window))
    return jnp.where(acf[0] > 0, tau_run[idx], jnp.nan)


# (S, nrec, nw, nfree) -> (S, nfree): one device call for the whole batch.
_batched_tau = jax.jit(
    jax.vmap(jax.vmap(_tau_one_dim, in_axes=2), in_axes=0))


@_dataclasses.dataclass
class PPCBatchResult:
    """Batched posterior-predictive check (MultiFitter.posterior_predictive).

    Per-source p-values are ~uniform on (0,1) under a well-specified
    model; in a well-calibrated S-source catalog roughly S/100 sources
    will show p < 0.01 by chance -- flag OUTLIERS in the p histogram,
    not every small value. `band_p` localizes which band misfits for a
    flagged source (entries near 0 or 1)."""
    p_value: np.ndarray     # (S,) P[T_rep >= T_obs] per source
    band_p: np.ndarray      # (S, nb) tail prob; NaN at excluded slots
    chi2_obs: np.ndarray    # (S, nsamples) whitened chi-sq of observed data
    chi2_rep: np.ndarray    # (S, nsamples) chi-sq of replicated data
    ndata: np.ndarray       # (S,) bands entering each source's statistic
    nfree: int              # free parameters (dof ref: ndata - nfree)
    nsamples: int           # thinned samples per source
    excluded: np.ndarray    # (S, nb) bool: missing or upper-limit slots

    def __repr__(self):
        p = self.p_value
        return (f"PPCBatchResult(S={p.size}, nsamples={self.nsamples}, "
                f"p<0.01: {int((p < 0.01).sum())}, "
                f"p>0.99: {int((p > 0.99).sum())}, "
                f"median p={np.median(p):.3f})")


class MultiFitter(ParamSpaceMixin):
    """Fit many sources at once with a shared model configuration.

    Usage:
        mf = MultiFitter(nwalkers=250, opthin=True)
        mf.set_data(wave, flux_batch, unc_batch)   # (nb,), (S, nb), (S, nb)
        mf.set_uplim("T", 100.0)                   # shared across sources
        mf.run(nburn=100, nsteps=500)
        mf.par_cen("T")                            # (S, 3)
        mf.compute_lir(redshifts)                  # (S, 3) via lir_cen()
        res3 = mf.results(3, redshift=z3)          # full MBBResults view

    Shared across sources: model shape, box limits, Gaussian priors, fixed
    parameters, walker count, band geometry (wavelengths or instrument
    responses). Per source: fluxes, uncertainties, redshift, missing-band
    pattern, upper-limit flags. Errors are diagonal by default; a shared
    band-correlation matrix with per-source sigmas is supported on the
    XLA backend (set_band_correlation).
    """

    def __init__(self, nwalkers=250, wavenorm=500.0, noalpha=False,
                 opthin=False, responses=None, seed=1234, a=2.0,
                 prng_impl="rbg", mesh=None, sampler_backend="auto",
                 interpret=False):
        # 'fused' = ops/pallas_multifit.py: the whole batched run as one
        # Pallas kernel with sources on the SUBLANES (TPU-only; with a
        # mesh, source TILES shard over it via shard_map); 'xla' =
        # portable vmapped scan; 'auto' picks 'fused' on TPU when no mesh
        # is given (with a mesh, request 'fused' explicitly).
        if sampler_backend not in ("auto", "xla", "fused"):
            raise ValueError(
                "sampler_backend must be 'auto', 'xla' or 'fused'")
        from mbb_emcee_tpu.utils.compilecache import enable_persistent_cache
        enable_persistent_cache()
        self.sampler_backend = sampler_backend
        # interpret=True runs the fused kernel through the Pallas
        # interpreter (CPU tests of the fused-only code paths, e.g.
        # checkpointing; the interpreter stubs the hardware PRNG).
        self.interpret = bool(interpret)
        self.nwalkers = int(nwalkers)
        self.shape = MBBShape(opthin=bool(opthin), noalpha=bool(noalpha),
                              wavenorm=float(wavenorm))
        self.a = float(a)
        self.seed = int(seed)
        self.prng_impl = prng_impl
        self.responses = responses
        self.mesh = mesh
        self._spec = LikelihoodSpec.default()
        self._init = DEFAULT_INIT.copy()
        self._scatter = DEFAULT_SCATTER.copy()
        self._user_init = np.zeros(NPARAMS, bool)
        self._user_scatter = np.zeros(NPARAMS, bool)
        self.wave = None
        self.flux = None
        self.unc = None
        self._band_corr = None      # (nb, nb) shared band correlation
        self.band_names = None
        self.chain_free = None
        self.lnprobability = None
        self.acceptance_fraction = None
        self.free_space: FreeSpace | None = None
        self.thin = 1
        self._run_cache = {}
        self._xla_keys = None       # per-source PRNG keys, XLA extend()
        self.evidence = None    # NestedBatchResult from compute_evidence()
        self.loo_result = None  # LooBatchResult from compute_loo()
        self.logz_pt = None     # ((S,), (S,)) stepping-stone, run_pt()
        self.logz_ti = None     # ((S,), (S,)) TI cross-check, run_pt()
        self.swap_fraction = None
        self.pt_betas = None
        self.hmc_step_size = None   # (S,) adapted step sizes, run_hmc()
        self.hmc_mass = None        # (S, nfree) diagonal metric, run_hmc()
        self.source_names = None    # (S,) catalog identifiers, set_data()
        self.redshifts = None       # (S,) per-source z, set_data()
        self.lir_chain = None       # (S, nsamp), compute_lir()
        self.dustmass_chain = None  # (S, nsamp), compute_dustmass()
        self.peaklambda_chain = None  # (S, nsamp), compute_peaklambda()

    # -- data -----------------------------------------------------------------
    def set_data(self, wave, flux, unc, band_names=None, source_names=None,
                 redshifts=None):
        """wave: (nb,) shared wavelengths (um); flux/unc: (S, nb) mJy.

        MISSING bands (real catalogs are ragged -- not every source is
        detected in every band) are flagged with a NaN flux or a
        non-finite uncertainty in that slot: the band is carried as
        (flux=0, unc=inf), so its inverse uncertainty is exactly 0 and it
        contributes nothing to that source's likelihood (or its
        gradient) in any backend, while the batch keeps one static
        (S, nb) shape for the single compiled program.

        `source_names` ((S,) catalog identifiers) and `redshifts` ((S,)
        per-source z) are optional metadata: names label the summary /
        HDF5 output, and a stored redshift vector becomes the default for
        compute_lir/compute_dustmass (the batch CLI's catalog carries
        both)."""
        wave = np.atleast_1d(np.asarray(wave, np.float64))
        flux = np.atleast_2d(np.asarray(flux, np.float64))
        unc = np.atleast_2d(np.asarray(unc, np.float64))
        if flux.shape != unc.shape or flux.shape[1] != wave.size:
            raise ValueError(
                f"flux {flux.shape} / unc {unc.shape} must be (S, {wave.size})")
        missing = ~np.isfinite(flux) | ~np.isfinite(unc)
        if missing.any():
            flux = np.where(missing, 0.0, flux)
            unc = np.where(missing, np.inf, unc)
            if missing.all(axis=1).any():
                bad = int(np.argwhere(missing.all(axis=1))[0, 0])
                raise ValueError(
                    f"source index {bad} has no bands at all (every "
                    f"flux/unc pair is missing)")
        if np.any(unc[~missing] <= 0):
            raise ValueError("uncertainties must be positive")
        ub = self._spec.uplim_bands
        if ub is not None and ub.ndim == 2 and self.flux is not None:
            # A per-source mask binds to SOURCE IDENTITIES, not to the
            # batch geometry: carrying it onto a new same-shape catalog
            # would flag the wrong sources' bands one-sided. A shared
            # (nb,) mask is band-bound and carries over.
            raise ValueError(
                "a per-source upper-limit mask is set; it cannot carry "
                "over to a new batch -- call set_phot_upperlimits again "
                "after set_data")
        if ub is not None and ub.ndim == 1 and ub.size != wave.size:
            raise ValueError(
                f"existing upper-limit mask ({ub.size},) does not fit "
                f"the new data (nb={wave.size}); call "
                f"set_phot_upperlimits again")
        if (self._band_corr is not None
                and self._band_corr.shape != (wave.size, wave.size)):
            raise ValueError(
                f"existing band correlation {self._band_corr.shape} does "
                f"not fit the new data (nb={wave.size}); call "
                f"set_band_correlation again")
        self.wave, self.flux, self.unc = wave, flux, unc
        self.band_names = band_names
        if source_names is not None:
            source_names = [str(n) for n in source_names]
            if len(source_names) != flux.shape[0]:
                raise ValueError("need one source name per source")
        self.source_names = source_names
        if redshifts is not None:
            redshifts = np.asarray(redshifts, np.float64).ravel()
            if redshifts.size != flux.shape[0]:
                raise ValueError("need one redshift per source")
        self.redshifts = redshifts
        return self

    def set_phot_upperlimits(self, mask):
        """Flag bands whose flux column is an UPPER LIMIT. Mirrors
        MBBFitter.set_phot_upperlimits: an upper-limit band contributes
        to the likelihood only when the model EXCEEDS the quoted flux
        (one-sided Gaussian; likelihood.py), in both the XLA and the
        fused multi-source kernel paths.

        `mask` is either (nb,) -- shared across the batch -- or a
        PER-SOURCE (S, nb) matrix (ragged surveys where only some
        sources' bands are limits). Either way the mask rides the SIGN
        of the inverse-uncertainty operand (likelihood.signed_iunc), so
        changing it never changes the compiled program."""
        from mbb_emcee_tpu.paramspace import _replace
        if self.wave is None:
            raise RuntimeError("no data; call set_data first")
        mask = np.asarray(mask, bool)
        nb = self.wave.size
        if mask.shape not in ((nb,), (self.nsources, nb)):
            raise ValueError(
                f"upper-limit mask must be ({nb},) or "
                f"({self.nsources}, {nb}); got {mask.shape}")
        if mask.any() and self._band_corr is not None:
            raise ValueError(
                "a band correlation is set; one-sided upper limits do "
                "not compose with correlated band errors")
        self._spec = _replace(self._spec, uplim_bands=mask)
        return self

    def _iunc_operand(self):
        """(S, nb) float64 SIGNED inverse uncertainties: negative marks
        upper-limit slots, 0 marks missing bands (signed_iunc)."""
        return signed_iunc(self.unc, self._spec.uplim_bands)

    def set_band_correlation(self, corr):
        """Correlated band errors for the whole batch: a shared (nb, nb)
        CORRELATION matrix R (unit diagonal, positive definite), with each
        source's covariance C_s = D_s R D_s built from its own
        uncertainties D_s = diag(unc_s). This is the batch analog of the
        single-fit covariance mode (MBBFitter covfile; likelihood.py
        build_lnprob) for the realistic survey case -- one instrument
        calibration-floor correlation structure shared across the
        catalog, per-source error scales.

        Missing bands are marginalized EXACTLY: each source's whitening
        matrix comes from the Cholesky factor of R restricted to that
        source's observed-band pattern (computed once per unique
        pattern), so ragged catalogs stay one compiled program with a
        per-source (nb, nb) whitening operand.

        XLA batch backend only (run/run_hmc/run_pt/compute_evidence);
        the fused Pallas kernel keeps diagonal errors. Not composable
        with photometric upper limits (one-sided + correlated is
        ill-defined; the single-fit path refuses the combination too).
        Pass None to clear."""
        if corr is None:
            self._band_corr = None
            return self
        if self.wave is None:
            raise RuntimeError("no data; call set_data first")
        corr = np.asarray(corr, np.float64)
        nb = self.wave.size
        if corr.shape != (nb, nb):
            raise ValueError(
                f"correlation matrix must be ({nb}, {nb}); got {corr.shape}")
        if not np.allclose(corr, corr.T, atol=1e-10):
            raise ValueError("correlation matrix must be symmetric")
        if not np.allclose(np.diag(corr), 1.0, atol=1e-8):
            raise ValueError(
                "correlation matrix needs a unit diagonal (per-source "
                "error scales come from the catalog's unc columns); "
                "normalize a covariance with cov / sqrt(outer(d, d)), "
                "d = diag(cov)")
        try:
            np.linalg.cholesky(corr)
        except np.linalg.LinAlgError:
            raise ValueError("correlation matrix is not positive definite")
        if (self._spec.uplim_bands is not None
                and np.any(self._spec.uplim_bands)):
            raise ValueError(
                "photometric upper limits are set; one-sided likelihoods "
                "do not compose with correlated band errors")
        self._band_corr = corr.copy()
        return self

    def _whiten_operand(self):
        """(S, nb, nb) float64 per-source whitening matrices W_s with
        r_s = W_s @ (model - flux_s): rows/cols of missing bands are
        zero and the observed block is chol(R_pp)^-1 @ diag(iunc_p) --
        the EXACT marginal likelihood of each source's observed bands
        under C_s = D_s R D_s. One Cholesky per unique missing-band
        pattern, then a per-source column scaling."""
        S, nb = self.unc.shape
        iunc = signed_iunc(self.unc)                    # >= 0, 0 = missing
        present = iunc > 0
        out = np.zeros((S, nb, nb), np.float64)
        linv_cache = {}
        for s in range(S):
            p = present[s]
            key = p.tobytes()
            linv = linv_cache.get(key)
            if linv is None:
                sub = self._band_corr[np.ix_(p, p)]
                linv = np.linalg.inv(np.linalg.cholesky(sub))
                linv_cache[key] = linv
            w = linv * iunc[s, p][None, :]
            out[s][np.ix_(p, p)] = w
        return out

    def _data_operand(self):
        """The per-source likelihood operand + the `correlated` flag for
        build_lnprob_data: (S, nb) signed inverse uncertainties, or
        (S, nb, nb) whitening matrices when a band correlation is set."""
        if self._band_corr is None:
            return self._iunc_operand(), False
        return self._whiten_operand(), True

    def _posterior_token(self, spec, correlated):
        """Identity of the posterior a run sampled (extend() refuses to
        splice chains across a change): parameter space + mask + band
        correlation CONTENT + wavelengths + geometry."""
        return (self.nsources, self.nwalkers, int(self.thin), correlated,
                float(self.a),
                None if self._band_corr is None
                else self._band_corr.tobytes(),
                self.wave.tobytes(), _mesh_token(self.mesh),
                _spec_token(spec, self.shape), self._responses_token(),
                None if self.band_names is None
                else tuple(self.band_names))

    def _require_map_fresh(self, what):
        """Refuse to consume stored MAP results after the posterior or the
        data changed underneath them (same nfree does NOT mean the same
        free parameters -- the sigma columns would map onto the wrong
        axes)."""
        spec = self._effective_spec()
        _, correlated = (None, self._band_corr is not None)
        token = (self.nsources, _spec_token(spec, self.shape), correlated)
        data = getattr(self, "_map_data", None)
        if (getattr(self, "_map_token", None) != token
                or data is None
                or not (np.array_equal(data[0], self.flux)
                        and np.array_equal(data[1], self.unc)
                        and np.array_equal(data[2], self.wave))):
            raise RuntimeError(
                f"{what}: the stored MAP results are for a different "
                f"batch / parameter space / error model; re-run "
                f"run_map() first")

    def _require_diag_errors(self, what):
        if self._band_corr is not None:
            raise ValueError(
                f"{what} supports diagonal errors only; clear the band "
                f"correlation (set_band_correlation(None)) or use the "
                f"XLA batch backend")

    @property
    def nsources(self):
        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        return self.flux.shape[0]

    # -- shared parameter-space config: paramspace.ParamSpaceMixin ------------

    # -- the batched run --------------------------------------------------------
    def _response_pack(self):
        if self.responses is None:
            return None
        if self.band_names is None:
            raise ValueError("response mode requires band_names in set_data")
        return self.responses.pack(self.band_names)

    def _responses_token(self):
        """Content cache key for the response curves baked into compiled
        programs (see _pack_token)."""
        return None if self.responses is None else _pack_token(
            self._response_pack())

    def _shard(self, x):
        """Shard the leading (source) axis over the mesh, if given."""
        if self.mesh is None:
            return x
        axis = self.mesh.axis_names[0]
        def put(a):
            spec = P(axis) if a.ndim >= 1 else P()
            return jax.device_put(a, NamedSharding(self.mesh, spec))
        return jax.tree.map(put, x)

    def _init_centers(self, init="auto"):
        """Per-source initial centers: fnorm seeded from each source's flux
        nearest wavenorm, T from each source's brightest band (the batched
        analog of MBBFitter._auto_init_fnorm).

        init="map" seeds each source's walker ball at ITS OWN MAP point
        with ~2 Laplace-sigma scatter (run_map first) -- the
        triage-then-refine workflow: the ensemble starts in the typical
        set, so short burns suffice."""
        if init not in ("auto", "map"):
            # a typo ('MAP', 'map ') must not silently fall back to the
            # flux-heuristic seeding -- the short-burn-suffices
            # assumption of triage-then-refine would be violated quietly
            raise ValueError(f"init must be 'auto' or 'map'; got {init!r}")
        if init == "map":
            if getattr(self, "map_params", None) is None:
                raise RuntimeError(
                    "init='map' requires run_map() on this data first")
            self._require_map_fresh("init='map'")
            S = self.nsources
            centers = self.map_params.copy()
            scatters = np.broadcast_to(self._scatter, (S, NPARAMS)).copy()
            idx = self.free_space.free_idx
            sig = np.clip(2.0 * self.map_sigma, 1e-6, None)
            # huge floored-Laplace sigmas (degenerate modes) would throw
            # walkers across the whole box; cap at 10x the default scatter
            scatters[:, idx] = np.minimum(sig, scatters[:, idx] * 10.0)
            return centers, scatters
        S = self.nsources
        centers = np.broadcast_to(self._init, (S, NPARAMS)).copy()
        scatters = np.broadcast_to(self._scatter, (S, NPARAMS)).copy()
        if not self._user_init[4]:
            idx = int(np.argmin(np.abs(self.wave - self.shape.wavenorm)))
            fn = self.flux[:, idx]
            ok = fn > 0
            centers[ok, 4] = fn[ok]
            if not self._user_scatter[4]:
                scatters[ok, 4] = np.maximum(2.0 * self.unc[ok, idx],
                                             0.05 * fn[ok])
        if not self._user_init[0]:
            from mbb_emcee_tpu.fitter import MBBFitter
            lam_pk = self.wave[np.argmax(self.flux, axis=1)]
            t0 = np.clip(HCOK_UM_K / (MBBFitter._WIEN_X_PEAK * lam_pk),
                         self._spec.lower[0] * 1.02,
                         self._spec.upper[0] * 0.98)
            centers[:, 0] = t0
            if not self._user_scatter[0]:
                scatters[:, 0] = np.maximum(0.15 * t0, 1.0)
        return centers, scatters

    def run(self, nburn=50, nsteps=250, thin=1, recenter_burn=True,
            verbose=False, checkpoint=None, checkpoint_interval=100,
            resume=False, init="auto"):
        """Burn -> per-source re-center on its best walker -> re-burn ->
        reset -> production, all sources in lockstep on device.

        With `checkpoint=path` (fused backend), the production run is
        segmented and the per-source chain blocks plus the full batched
        sampler state are flushed to HDF5 every `checkpoint_interval`
        recorded steps; `resume=True` continues an interrupted run from
        that file -- the long-running batch path is exactly where a
        killed run hurts most (SURVEY.md section 5, checkpoint row).

        The whole run is one jitted program: a per-source body (ball init,
        burn, re-center, production scan) vmapped over sources and, with a
        mesh, shard_mapped over the source axis (embarrassingly parallel --
        no collectives). Per-source PRNG streams come from folding the
        global source index into replicated base keys; with
        prng_impl='threefry2x32' mesh and no-mesh runs produce IDENTICAL
        chains (the default 'rbg' generator is faster on TPU but its bit
        streams legitimately depend on the partitioning).
        """
        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        if int(thin) < 1:
            raise ValueError(f"thin={thin} must be >= 1")
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if resume and not checkpoint:
            raise ValueError(
                "resume=True requires checkpoint= (the path the previous "
                "run flushed state to); without it the run would silently "
                "restart from scratch")
        spec = self._effective_spec()
        backend = self.sampler_backend
        if backend == "auto":
            try:
                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            backend = ("fused" if (on_tpu and self.mesh is None
                                   and self._band_corr is None) else "xla")
        self._backend_used = backend
        if backend == "fused":
            self._require_diag_errors("the fused Pallas sampler backend")
            return self._run_fused(nburn, nsteps, thin, recenter_burn,
                                   verbose, spec, checkpoint=checkpoint,
                                   checkpoint_interval=checkpoint_interval,
                                   resume=resume, init=init)
        if checkpoint is not None or resume:
            # XLA-backend checkpointing: segmented run + exact extend()
            # continuation, flushing the COMPLETE batch state (chains +
            # per-source PRNG keys) via writeToHDF5 after each segment.
            # Each flush rewrites the whole file (simple and
            # self-contained; the fused backend's checkpoint.py format
            # appends O(new) instead -- prefer it for very long
            # single-device TPU runs). This path is what makes
            # checkpointing possible at all for mesh and CPU runs, which
            # the fused backend does not cover.
            import os
            if resume and not checkpoint:
                raise ValueError(
                    "resume=True requires checkpoint= (the path the "
                    "previous run flushed state to)")
            return self._run_checkpointed_xla(
                nburn, nsteps, thin, recenter_burn, verbose, init,
                checkpoint, int(checkpoint_interval),
                bool(resume and os.path.exists(checkpoint)))
        iunc_np, correlated = self._data_operand()
        lnprob_data, free_space = build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=correlated)
        self.free_space = free_space
        self.thin = int(thin)
        S, nw = self.nsources, self.nwalkers
        half = nw // 2
        a = self.a
        nrec = int(nsteps // thin)
        thin_i = int(thin)

        if self.mesh is not None:
            ndev = self.mesh.devices.size
            if S % ndev:
                raise ValueError(
                    f"the mesh size ({ndev} devices) must divide "
                    f"nsources={S}; pad the source batch to a multiple "
                    f"of {ndev}")

        wave = jnp.asarray(self.wave, jnp.float32)
        flux = jnp.asarray(self.flux, jnp.float32)
        iunc = jnp.asarray(iunc_np, jnp.float32)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        kball, kstate, krecenter = jax.random.split(key, 3)
        centers, scatters = self._init_centers(init)
        cen_f = jnp.asarray(centers[:, free_space.free_idx], jnp.float32)
        sca_f = jnp.asarray(scatters[:, free_space.free_idx], jnp.float32)
        lower, upper = free_space.lower, free_space.upper

        mesh_axis = (self.mesh.axis_names[0]
                     if self.mesh is not None else None)

        def _vary(x):
            """Mark constant-initialized values as device-varying under
            shard_map (vma type stability: loop carries must keep the same
            varying-axes type across iterations)."""
            if mesh_axis is None:
                return x
            return jax.lax.pcast(x, (mesh_axis,), to="varying")

        def one_source(idx, cen_s, sca_s, flux_s, iunc_s,
                       kball, kstate, krecenter, wave):
            batched = jax.vmap(
                lambda th: lnprob_data(th, wave, flux_s, iunc_s))

            def init_state(k, p0):
                lnp = batched(p0)
                return SamplerState(
                    key=k, pos_a=p0[:half], pos_b=p0[half:],
                    lnp_a=lnp[:half], lnp_b=lnp[half:],
                    naccept=_vary(jnp.zeros(nw, jnp.int32)),
                    nsteps=_vary(jnp.array(0, jnp.int32)))

            def adv(s, n):
                return jax.lax.fori_loop(
                    0, n, lambda i, x: ensemble_step(x, batched, a), s)

            p0 = make_initial_ball(jax.random.fold_in(kball, idx),
                                   cen_s, sca_s, nw, lower, upper)
            state = init_state(jax.random.fold_in(kstate, idx), p0)
            if nburn > 0:
                state = adv(state, nburn)
                if recenter_burn:
                    best = state.position[jnp.argmax(state.lnprob)]
                    kr = jax.random.fold_in(krecenter, idx)
                    kb2, ks2 = jax.random.split(kr)
                    p0b = make_initial_ball(kb2, best, 0.1 * sca_s, nw,
                                            lower, upper)
                    state = init_state(ks2, p0b)
                    state = adv(state, nburn)
                state = state._replace(
                    naccept=jnp.zeros_like(state.naccept),
                    nsteps=jnp.zeros_like(state.nsteps))

            def inner(carry, _):
                s = jax.lax.fori_loop(
                    0, thin_i, lambda i, x: ensemble_step(x, batched, a),
                    carry)
                return s, (s.position, s.lnprob)

            state, (chain, lnpchain) = jax.lax.scan(
                inner, state, None, length=nrec)
            # The final per-source PRNG key makes the run CONTINUABLE:
            # positions/lnprob of the final state are the last chain
            # record, so (key, last record) is a complete restart point
            # for extend() on this backend.
            return chain, lnpchain, state.naccept, state.nsteps, state.key

        # Cache the compiled program across run() calls with the same
        # static geometry + parameter-space config (a fresh jit here costs
        # ~10 s of recompilation per call; keys/wavelengths/data are
        # runtime arguments).
        cache_key = (S, nw, free_space.nfree, nrec, thin_i, int(nburn),
                     bool(recenter_burn), correlated,
                     # a is baked into ensemble_step as a closure constant
                     float(self.a),
                     _mesh_token(self.mesh),
                     # uplim masks excluded: they ride the iunc operand,
                     # so mask changes REUSE this program (_compile_token)
                     _compile_token(spec, self.shape),
                     # the response pack (if any) is baked into the jitted
                     # program as a constant
                     self._responses_token(),
                     None if self.band_names is None
                     else tuple(self.band_names))
        if cache_key not in self._run_cache:
            f = jax.vmap(one_source,
                         in_axes=(0, 0, 0, 0, 0, None, None, None, None))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None),
                              P(ax, None), P(ax, None),
                              P(), P(), P(), P(None)),
                    out_specs=(P(ax, None, None, None), P(ax, None, None),
                               P(ax, None), P(ax), P(ax)))
            self._run_cache[cache_key] = jax.jit(f)
        chain, lnpchain, naccept, nsteps_dev, keys = (
            self._run_cache[cache_key](
                self._shard(jnp.arange(S)), self._shard(cen_f),
                self._shard(sca_f), self._shard(flux), self._shard(iunc),
                kball, kstate, krecenter, wave))

        self.chain_free = chain                        # (S, nrec, nw, nfree)
        self.lnprobability = lnpchain                  # (S, nrec, nw)
        denom = np.maximum(np.asarray(nsteps_dev), 1)
        self.acceptance_fraction = (np.asarray(naccept)
                                    / denom[:, None])
        # Continuation state for extend() on this backend.
        self._sampler = None
        self.final_state = None
        self._xla_keys = keys
        self._xla_counters = (naccept, nsteps_dev)
        self._post_token = self._posterior_token(spec, correlated)
        self._run_data = (self.flux.copy(), self.unc.copy(),
                          self.wave.copy())
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"Mean acceptance fraction over {S} sources: "
                  f"{af.mean():.3f} (per-source min {af.mean(1).min():.3f}, "
                  f"max {af.mean(1).max():.3f})")
        return self

    def _run_checkpointed_xla(self, nburn, nsteps, thin, recenter_burn,
                              verbose, init, checkpoint, interval,
                              resuming):
        """Segmented XLA-backend production with full-state flushes (the
        batch analog of sedmulti's checkpointing; extend() is exact
        continuation, so the segmented chain is bitwise-identical to an
        uninterrupted run)."""
        thin_i = int(thin)
        target = int(nsteps) // thin_i
        interval = max(1, int(interval))
        if resuming:
            other = MultiFitter.from_h5(checkpoint)
            if getattr(other, "_xla_keys", None) is None:
                raise ValueError(
                    f"{checkpoint} carries no XLA continuation state "
                    f"(a thinned dump, or a fused-backend checkpoint -- "
                    f"resume that with sampler_backend='fused')")
            if (other.nwalkers != self.nwalkers or other.thin != thin_i
                    or other.seed != self.seed):
                raise ValueError(
                    "checkpoint geometry (nwalkers/thin/seed) does not "
                    "match this fitter")
            if other.prng_impl != self.prng_impl:
                raise ValueError(
                    f"checkpoint was sampled with "
                    f"prng_impl={other.prng_impl!r}; this fitter uses "
                    f"{self.prng_impl!r}")
            if (self.prng_impl != "threefry2x32"
                    and getattr(other, "_ck_mesh_token", "")
                    != str(_mesh_token(self.mesh))):
                raise ValueError(
                    f"{self.prng_impl!r} PRNG streams depend on the "
                    f"device partitioning; resume under the SAME mesh "
                    f"the checkpoint recorded, or run with "
                    f"prng_impl='threefry2x32' (partition-independent)")
            # Posterior identity under the RESUMING fitter's mesh/thin:
            # source sharding does not change the posterior (threefry
            # streams are partition-independent; rbg is gated above).
            other.mesh = self.mesh
            other.thin = thin_i
            spec = self._effective_spec()
            token = self._posterior_token(spec,
                                          self._band_corr is not None)
            if other._posterior_token(
                    other._effective_spec(),
                    other._band_corr is not None) != token:
                raise RuntimeError(
                    "checkpointed run's posterior (spec/data/responses) "
                    "differs from this fitter's; refusing to splice")
            for attr in ("chain_free", "lnprobability",
                         "acceptance_fraction", "free_space", "thin",
                         "_xla_keys", "_xla_counters",
                         "_run_data", "prng_impl", "a"):
                setattr(self, attr, getattr(other, attr))
            self._sampler = None
            self._backend_used = "xla"
            # token under THIS fitter's mesh (extend() compares to it)
            self._post_token = self._posterior_token(
                spec, self._band_corr is not None)
        else:
            first = min(interval, target)
            self.run(nburn=nburn, nsteps=first * thin_i, thin=thin_i,
                     recenter_burn=recenter_burn, verbose=verbose,
                     init=init)
            self.writeToHDF5(checkpoint)
        while int(self.chain_free.shape[1]) < target:
            step = min(interval, target - int(self.chain_free.shape[1]))
            self.extend(step * thin_i, verbose=verbose)
            self.writeToHDF5(checkpoint)
        return self

    def _run_fused(self, nburn, nsteps, thin, recenter_burn, verbose, spec,
                   checkpoint=None, checkpoint_interval=100, resume=False,
                   init="auto"):
        """Fused-kernel path: burn / per-source re-center / production, each
        phase one Pallas launch (ops/pallas_multifit.py)."""
        import os
        from mbb_emcee_tpu.ops.pallas_multifit import FusedMultiPallasSampler

        # The token covers everything COMPILED into the sampler (geometry,
        # spec, band setup); per-source flux/unc AND the upper-limit mask
        # are runtime operands (the mask rides the iunc sign) and are
        # refreshed below, so fitting successive same-shape batches --
        # including mask changes -- reuses the compiled kernel.
        token = ("fused", self.nwalkers, float(self.a),
                 _compile_token(spec, self.shape),
                 self.flux.shape, self.wave.tobytes(),
                 self._responses_token(), _mesh_token(self.mesh),
                 None if self.band_names is None
                 else tuple(self.band_names))
        if getattr(self, "_fused_token", None) != token:
            self._fused = FusedMultiPallasSampler(
                self.nwalkers, self.wave, self.flux, self.unc, self.shape,
                spec, response_pack=self._response_pack(), a=self.a,
                mesh=self.mesh, interpret=self.interpret)
            self._fused_token = token
        else:
            self._fused.set_data(self.flux, self.unc,
                                 uplim_bands=spec.uplim_bands)
        samp = self._fused
        self.free_space = samp.free_space
        self.thin = int(thin)
        S, nw = self.nsources, self.nwalkers
        fs = samp.free_space

        resuming = bool(checkpoint and resume and os.path.exists(checkpoint))
        data_fp = spec_fp = None
        if checkpoint is not None:
            from mbb_emcee_tpu.checkpoint import (
                data_fingerprint, spec_fingerprint)
            # Fingerprint the RAW user spec (as MBBFitter.run does): the
            # effective spec embeds _init values for shape-dropped params
            # that never enter the likelihood, and hashing those would
            # spuriously refuse a resume after a harmless init tweak.
            # The response pack is posterior identity too (see
            # MBBFitter.run): filter-curve swaps must refuse resume.
            pack = self._response_pack()
            data_fp = data_fingerprint(self.wave, self.flux, self.unc,
                                       *(() if pack is None else pack))
            spec_fp = spec_fingerprint(self._spec, self.shape, self.a)
        prev_chain = prev_lnp = None
        resume_run_id = None
        if resuming:
            from mbb_emcee_tpu.checkpoint import (
                load_multi_checkpoint, check_resume_meta)
            state, prev_chain, prev_lnp, meta = load_multi_checkpoint(
                checkpoint)
            resume_run_id = meta.get("run_id")
            if isinstance(resume_run_id, bytes):
                resume_run_id = resume_run_id.decode()
            if (int(meta.get("nwalkers", nw)) != nw
                    or int(meta.get("nsources", S)) != S
                    or int(meta.get("thin", thin)) != thin):
                raise ValueError(
                    "checkpoint geometry does not match this MultiFitter")
            check_resume_meta(
                meta, {"sampler_backend": "fused",
                       "prng_impl": self.prng_impl,
                       "data_fingerprint": data_fp,
                       "spec_fingerprint": spec_fp}, checkpoint)
        else:
            key = jax.random.key(self.seed, impl=self.prng_impl)
            kball, kstate, krecenter = jax.random.split(key, 3)
            centers, scatters = self._init_centers(init)
            cen_f = jnp.asarray(centers[:, fs.free_idx], jnp.float32)
            sca_f = jnp.asarray(scatters[:, fs.free_idx], jnp.float32)
            vball = jax.vmap(
                lambda k, c, s: make_initial_ball(k, c, s, nw, fs.lower,
                                                  fs.upper))
            p0 = vball(jax.random.split(kball, S), cen_f, sca_f)
            state = samp.init_state(kstate, p0)

            if nburn > 0:
                state = samp.advance(state, nburn)
                if recenter_burn:
                    best = jnp.take_along_axis(
                        state.pos,
                        jnp.argmax(state.lnp, axis=1)[:, None, None],
                        axis=1)[:, 0, :]
                    kb2, ks2 = jax.random.split(krecenter)
                    p0b = vball(jax.random.split(kb2, S), best, 0.1 * sca_f)
                    state = samp.init_state(ks2, p0b)
                    state = samp.advance(state, nburn)
                state = FusedMultiPallasSampler.reset_counters(state)

        if checkpoint is None:
            state, chain, lnpchain = samp.run_mcmc(state, nsteps, thin)
        else:
            from mbb_emcee_tpu.checkpoint import (
                save_multi_checkpoint, new_run_id)
            chain_blocks, lnp_blocks = [], []
            done = 0
            if resuming and prev_chain is not None:
                chain_blocks.append(prev_chain)
                lnp_blocks.append(prev_lnp)
                done = prev_chain.shape[1] * thin
            meta = {"nwalkers": nw, "nsources": S, "thin": thin,
                    "nsteps_target": nsteps, "sampler_backend": "fused",
                    "seed": self.seed,
                    "data_fingerprint": data_fp,
                    "spec_fingerprint": spec_fp,
                    "run_id": resume_run_id or new_run_id()}
            seg = max(int(checkpoint_interval), 1) * thin
            while done < nsteps:
                n = min(seg, nsteps - done)
                n -= n % thin
                if n == 0:
                    break
                state, c, l = samp.run_mcmc(state, n, thin)
                chain_blocks.append(np.asarray(c))
                lnp_blocks.append(np.asarray(l))
                done += n
                save_multi_checkpoint(checkpoint, state, chain_blocks,
                                      lnp_blocks, meta, self.prng_impl)
                if verbose:
                    from mbb_emcee_tpu.utils.log import enable_console
                    enable_console().info(
                        f"  checkpoint: {done}/{nsteps} steps x {S} "
                        f"sources -> {checkpoint}")
            chain = jnp.asarray(np.concatenate(chain_blocks, axis=1))
            lnpchain = jnp.asarray(np.concatenate(lnp_blocks, axis=1))
        self.final_state = state
        self._sampler = samp
        self._xla_keys = None
        # extend() continues against the data the sampler was built with;
        # remember the CONTENT (not object identity -- in-place mutation
        # or a set_data with an array that np.asarray returned unchanged
        # would slip through an `is` check) so a data change in between is
        # caught instead of silently sampling the old batch's posterior.
        self._run_data = (self.flux.copy(), self.unc.copy(),
                          self.wave.copy())
        # ... and the posterior identity (spec/mask/a): the retained
        # fused sampler holds the operands from run() time, so a
        # parameter-space edit in between must refuse extend() exactly
        # as the XLA twin does (fused backend is diag-errors-only).
        self._post_token = self._posterior_token(spec, False)
        self.thin = int(thin)
        self.chain_free = chain
        self.lnprobability = lnpchain
        denom = max(int(state.nsteps), 1)
        self.acceptance_fraction = np.asarray(state.naccept) / denom
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"Mean acceptance fraction over {S} sources: "
                  f"{af.mean():.3f} (per-source min {af.mean(1).min():.3f}, "
                  f"max {af.mean(1).max():.3f}) [fused kernel]")
        return self

    def run_pt(self, nrungs=12, beta_min="auto", nburn=300, nsteps=1000,
               thin=1, verbose=False):
        """Batched parallel tempering: the serving analog of
        MBBFitter.run_pt. Every source gets K temperature rungs x W
        walkers, and the WHOLE (S, K, W) block advances as one device
        program -- a per-source tempered body (tempering.pt_step: vmapped
        stretch move over rungs + alternating adjacent-rung replica
        exchange) vmapped over sources and, with a mesh, shard_mapped
        over the source axis (embarrassingly parallel, no collectives).

        Two phases, both compiled once per geometry: a SCOUT burn on a
        shared coarse ladder, then -- with beta_min="auto" -- per-source
        ladders rebuilt from each source's own worst sampled lnL
        (tempering.auto_ladder_batch; betas are runtime operands with
        one shared static K, so sources with very different likelihood
        scales share the program), seeded rung-by-nearest-rung from the
        scout state, re-burned, and sampled.

        The recorded chain is each source's cold rung -- chain_free /
        lnprobability / acceptance_fraction have exactly run()'s shapes,
        so every batched summary (par_cen, gelman_rubin, compute_lir,
        results(i), writeToHDF5) works unchanged. Per-source evidence:
        self.logz_pt = (lnZ (S,), err (S,)) by stepping stone, with
        thermodynamic integration in self.logz_ti as the cross-check of
        compute_evidence(). extend() does not apply; re-run with more
        nsteps."""
        from mbb_emcee_tpu.tempering import (
            PTState, pt_step, geometric_ladder, auto_ladder_batch,
            SSStats, thermodynamic_logz, ss_stream_update, _SUPPORT_FLOOR)

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if self.nwalkers % 2:
            raise ValueError("nwalkers must be even")
        spec = self._effective_spec()
        iunc_np, correlated = self._data_operand()
        lnprob_data, free_space = build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=correlated)
        self.free_space = free_space
        self.thin = int(thin)
        S, W = self.nsources, self.nwalkers
        d = free_space.nfree
        a = self.a
        nrec = int(nsteps // thin)
        thin_i = int(thin)
        adapt = beta_min == "auto"

        if self.mesh is not None:
            ndev = self.mesh.devices.size
            if S % ndev:
                raise ValueError(
                    f"the mesh size ({ndev} devices) must divide "
                    f"nsources={S}")
        mesh_axis = (self.mesh.axis_names[0]
                     if self.mesh is not None else None)

        def _vary(x):
            if mesh_axis is None:
                return x
            return jax.lax.pcast(x, (mesh_axis,), to="varying")

        wave = jnp.asarray(self.wave, jnp.float32)
        flux = jnp.asarray(self.flux, jnp.float32)
        iunc = jnp.asarray(iunc_np, jnp.float32)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        kball, kscout, kmain = jax.random.split(key, 3)
        centers, scatters = self._init_centers()
        cen_f = jnp.asarray(centers[:, free_space.free_idx], jnp.float32)
        sca_f = jnp.asarray(scatters[:, free_space.free_idx], jnp.float32)
        lower, upper = free_space.lower, free_space.upper

        def _pt_state(k, pos, bflat, K):
            lnp = bflat(pos.reshape(-1, d)).reshape(K, W)
            return PTState(
                key=k, pos=pos, lnp=lnp,
                naccept=_vary(jnp.zeros((K, W), jnp.int32)),
                nswap=_vary(jnp.zeros(K - 1, jnp.int32)),
                nswap_prop=_vary(jnp.zeros(K - 1, jnp.int32)),
                nsteps=_vary(jnp.array(0, jnp.int32)))

        def _advance(st, n, bflat, betas):
            return jax.lax.fori_loop(
                st.nsteps, st.nsteps + n,
                lambda i, s: pt_step(s, bflat, betas, a, swap_parity=i), st)

        K1 = int(nrungs)

        def scout_one(idx, cen_s, sca_s, flux_s, iunc_s, betas,
                      kball, kscout, wave):
            bflat = jax.vmap(
                lambda th: lnprob_data(th, wave, flux_s, iunc_s))
            p0 = make_initial_ball(jax.random.fold_in(kball, idx),
                                   cen_s, sca_s, W, lower, upper)
            st = _pt_state(jax.random.fold_in(kscout, idx),
                           jnp.broadcast_to(p0, (K1, W, d)), bflat, K1)
            st = _advance(st, nburn, bflat, betas)
            return st.pos, st.lnp

        def main_one(idx, pos0_s, flux_s, iunc_s, betas_s, kmain, wave,
                     nburn2, K2):
            bflat = jax.vmap(
                lambda th: lnprob_data(th, wave, flux_s, iunc_s))
            dbeta = (betas_s[:-1] - betas_s[1:]).astype(jnp.float32)
            st = _pt_state(jax.random.fold_in(kmain, idx), pos0_s,
                           bflat, K2)
            if nburn2 > 0:
                st = _advance(st, nburn2, bflat, betas_s)
                st = st._replace(
                    naccept=jnp.zeros_like(st.naccept),
                    nswap=jnp.zeros_like(st.nswap),
                    nswap_prop=jnp.zeros_like(st.nswap_prop),
                    nsteps=jnp.zeros_like(st.nsteps))

            def inner(carry, _):
                s, m, s1, s2, acc = carry
                s = _advance(s, thin_i, bflat, betas_s)
                m, s1, s2 = ss_stream_update(m, s1, s2, dbeta, s.lnp[1:])
                acc = acc + s.lnp.mean(axis=1).astype(jnp.float32)
                return (s, m, s1, s2, acc), (s.pos[0], s.lnp[0])

            carry0 = (st,
                      _vary(jnp.full((K2 - 1,), -jnp.inf, jnp.float32)),
                      _vary(jnp.zeros((K2 - 1,), jnp.float32)),
                      _vary(jnp.zeros((K2 - 1,), jnp.float32)),
                      _vary(jnp.zeros((K2,), jnp.float32)))
            (st, m, s1, s2, acc), (chain, lnpch) = jax.lax.scan(
                inner, carry0, None, length=nrec)
            return (chain, lnpch, st.naccept, st.nswap, st.nswap_prop,
                    st.nsteps, acc, m, s1, s2)

        def _compiled(tag, fn, in_axes, sharded_in, sharded_out, **static):
            ck = (tag, S, W, d, nrec, thin_i, int(nburn), K1, correlated,
                  float(self.a),
                  _compile_token(spec, self.shape), _mesh_token(self.mesh),
                  self._responses_token(),
                  None if self.band_names is None
                  else tuple(self.band_names),
                  tuple(sorted(static.items())))
            if ck not in self._run_cache:
                f = jax.vmap(lambda *args: fn(*args, **static),
                             in_axes=in_axes)
                if self.mesh is not None:
                    f = jax.shard_map(f, mesh=self.mesh,
                                      in_specs=sharded_in,
                                      out_specs=sharded_out)
                self._run_cache[ck] = jax.jit(f)
            return self._run_cache[ck]

        ax = mesh_axis
        # -- phase 1: scout burn on a shared coarse ladder ------------------
        scout_betas = geometric_ladder(
            K1, 1e-2 if adapt else float(beta_min))
        scout = _compiled(
            "pt_scout", scout_one,
            (0, 0, 0, 0, 0, None, None, None, None),
            (P(ax), P(ax, None), P(ax, None), P(ax, None), P(ax, None),
             P(None), P(), P(), P(None)),
            (P(ax, None, None, None), P(ax, None, None)))
        pos_sc, lnp_sc = scout(
            self._shard(jnp.arange(S)), self._shard(cen_f),
            self._shard(sca_f), self._shard(flux), self._shard(iunc),
            jnp.asarray(scout_betas, jnp.float32), kball, kscout, wave)

        # -- ladder adaptation (host, tiny) ---------------------------------
        if adapt:
            lnp_h = np.asarray(lnp_sc, np.float64)         # (S, K1, W)
            masked = np.where(lnp_h > _SUPPORT_FLOOR, lnp_h, np.nan)
            worst = np.nanmin(masked.reshape(S, -1), axis=1)
            worst = np.where(np.isfinite(worst), worst, -1e6)
            betas_b = auto_ladder_batch(worst, nrungs_min=K1)  # (S, K2)
            K2 = betas_b.shape[1]
            lb_new = np.log10(np.maximum(betas_b, 1e-30))
            lb_old = np.log10(np.maximum(scout_betas, 1e-30))
            nearest = np.abs(lb_new[:, :, None]
                             - lb_old[None, None, :]).argmin(axis=2)
            pos0 = np.asarray(pos_sc)[np.arange(S)[:, None], nearest]
            nburn2 = max(int(nburn) // 2, 50)
        else:
            betas_b = np.broadcast_to(scout_betas, (S, K1)).copy()
            K2 = K1
            pos0 = np.asarray(pos_sc)
            nburn2 = 0

        # -- phase 2: (re-)burn + production with evidence accumulators -----
        main = _compiled(
            "pt_main", main_one,
            (0, 0, 0, 0, 0, None, None),
            (P(ax), P(ax, None, None, None), P(ax, None), P(ax, None),
             P(ax, None), P(), P(None)),
            (P(ax, None, None, None), P(ax, None, None), P(ax, None, None),
             P(ax, None), P(ax, None), P(ax), P(ax, None), P(ax, None),
             P(ax, None), P(ax, None)),
            nburn2=nburn2, K2=K2)
        (chain, lnpch, naccept, nswap, nswap_prop, nsteps_dev,
         acc, ss_m, ss_s1, ss_s2) = main(
            self._shard(jnp.arange(S)),
            self._shard(jnp.asarray(pos0, jnp.float32)),
            self._shard(flux), self._shard(iunc),
            self._shard(jnp.asarray(betas_b, jnp.float32)),
            kmain, wave)

        self.chain_free = chain                        # (S, nrec, W, d)
        self.lnprobability = lnpch                     # (S, nrec, W)
        denom = np.maximum(np.asarray(nsteps_dev, np.int64), 1)
        self.acceptance_fraction = (np.asarray(naccept)[:, 0, :]
                                    / denom[:, None])  # cold rung (S, W)
        self.swap_fraction = (np.asarray(nswap)
                              / np.maximum(np.asarray(nswap_prop), 1))
        self.pt_betas = betas_b
        ss = SSStats(np.asarray(ss_m, np.float64),
                     np.asarray(ss_s1, np.float64),
                     np.asarray(ss_s2, np.float64), float(nrec * W))
        logz, logz_err = ss.logz()                     # (S,), (S,)
        mean_lnp = np.asarray(acc, np.float64) / nrec  # (S, K2)
        ti, ti_err = thermodynamic_logz(betas_b, mean_lnp)
        self.logz_pt = (logz, logz_err)
        self.logz_ti = (ti, ti_err)
        self._backend_used = "pt"
        self._sampler = None                           # extend() refuses
        self.final_state = None
        self._xla_keys = None
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"PT over {S} sources: {K2} rungs x {W} walkers, mean "
                f"cold acceptance {af.mean():.3f}, min adjacent swap "
                f"fraction {self.swap_fraction.min(axis=1).min():.2f}, "
                f"lnZ in [{logz.min():.2f}, {logz.max():.2f}] "
                f"(median err {np.median(logz_err):.3f})")
        return self

    def run_hmc(self, nwarmup=500, nsteps=1000, thin=1, n_leapfrog=16,
                target_accept=0.8, verbose=False):
        """Batched gradient-based sampling: the serving analog of
        MBBFitter.run_hmc. Every source runs W independent HMC chains
        and the WHOLE (S, W) block advances as one device program --
        hmc.hmc_core (dual-averaged step size + diagonal-mass two-phase
        warmup, leapfrog + MH production) vmapped over sources and,
        with a mesh, shard_mapped over the source axis (embarrassingly
        parallel, no collectives). Forces are jax.grad of the fused
        lnprob with each source's own flux/unc as runtime operands, so
        every source adapts its OWN step size (self.hmc_step_size,
        (S,)) and diagonal metric (self.hmc_mass, (S, nfree)) inside
        the shared compiled program.

        The recorded chains have exactly run()'s shapes -- chain_free /
        lnprobability / acceptance_fraction feed every batched summary
        (par_cen, gelman_rubin, compute_lir, results(i), writeToHDF5)
        unchanged. extend() does not apply; re-run with more nsteps.
        Uses the portable XLA likelihood (the Pallas lnprob kernel is
        not differentiable)."""
        from mbb_emcee_tpu.hmc import hmc_core, _to_unconstrained

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by "
                             f"thin={thin}")
        spec = self._effective_spec()
        iunc_np, correlated = self._data_operand()
        lnprob_data, free_space = build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=correlated)
        self.free_space = free_space
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError(
                "HMC requires finite box bounds on every free parameter "
                "(the defaults are finite; see set_lowlim/set_uplim)")
        self.thin = int(thin)
        S, W = self.nsources, self.nwalkers
        d = free_space.nfree
        nrec = int(nsteps) // int(thin)

        if self.mesh is not None:
            ndev = self.mesh.devices.size
            if S % ndev:
                raise ValueError(
                    f"the mesh size ({ndev} devices) must divide "
                    f"nsources={S}")
        mesh_axis = (self.mesh.axis_names[0]
                     if self.mesh is not None else None)

        def vary(x):
            # Idempotent: hmc_core applies it to loop-carry seeds that are
            # constants in warmup phase A but already device-varying in
            # phase B (pcast rejects varying -> varying).
            if mesh_axis in jax.typeof(x).vma:
                return x
            return jax.lax.pcast(x, (mesh_axis,), to="varying")

        if mesh_axis is None:
            vary = None

        flux = jnp.asarray(self.flux, jnp.float32)
        iunc = jnp.asarray(iunc_np, jnp.float32)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        kball, kmain = jax.random.split(key)
        centers, scatters = self._init_centers()
        cen_f = jnp.asarray(centers[:, free_space.free_idx], jnp.float32)
        sca_f = jnp.asarray(scatters[:, free_space.free_idx], jnp.float32)
        # Host numpy closures (never device-array constants).
        lower = np.asarray(free_space.lower, np.float32)
        width = np.asarray(free_space.upper - free_space.lower, np.float32)

        def hmc_one(idx, cen_s, sca_s, flux_s, iunc_s, kball, kmain, wave):
            lnprob = lambda th: lnprob_data(th, wave, flux_s, iunc_s)
            p0 = make_initial_ball(
                jax.random.fold_in(kball, idx), cen_s, sca_s, W,
                free_space.lower, free_space.upper)
            u0 = _to_unconstrained(jnp.asarray(p0, jnp.float32),
                                   lower, width)
            return hmc_core(
                jax.random.fold_in(kmain, idx), lnprob, lower, width, u0,
                int(nwarmup), int(nsteps), int(thin), int(n_leapfrog),
                float(target_accept), vary=vary)

        ax = mesh_axis
        ck = ("hmc", S, W, d, nrec, int(thin), int(nwarmup),
              int(n_leapfrog), float(target_accept), correlated,
              _compile_token(spec, self.shape), _mesh_token(self.mesh),
              self._responses_token(),
              None if self.band_names is None
              else tuple(self.band_names))
        if ck not in self._run_cache:
            f = jax.vmap(hmc_one,
                         in_axes=(0, 0, 0, 0, 0, None, None, None))
            if self.mesh is not None:
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None),
                              P(ax, None), P(ax, None), P(), P(),
                              P(None)),
                    out_specs=(P(ax, None, None, None),
                               P(ax, None, None), P(ax, None), P(ax),
                               P(ax, None)))
            self._run_cache[ck] = jax.jit(f)
        chain, lnpch, nacc, eps, mass = self._run_cache[ck](
            self._shard(jnp.arange(S)), self._shard(cen_f),
            self._shard(sca_f), self._shard(flux), self._shard(iunc),
            kball, kmain, jnp.asarray(self.wave, jnp.float32))

        self.chain_free = chain                        # (S, nrec, W, d)
        self.lnprobability = lnpch                     # (S, nrec, W)
        self.acceptance_fraction = (np.asarray(nacc, np.float64)
                                    / int(nsteps))     # (S, W)
        self.hmc_step_size = np.asarray(eps, np.float64)
        self.hmc_mass = np.asarray(mass, np.float64)
        self._backend_used = "hmc"
        self._sampler = None                           # extend() refuses
        self.final_state = None
        self._xla_keys = None
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"HMC over {S} sources: {W} chains x {nsteps} steps, "
                f"mean acceptance {af.mean():.3f} (per-source min "
                f"{af.mean(1).min():.3f}), step sizes in "
                f"[{self.hmc_step_size.min():.4g}, "
                f"{self.hmc_step_size.max():.4g}]")
        return self

    def run_map(self, nstarts=8, n_adam=150, n_newton=12, adam_lr=0.1,
                verbose=False):
        """Batched MAP + Laplace quick fits: S sources x `nstarts`
        multi-starts, each a fixed-iteration Adam-then-damped-Newton
        optimizer, in ONE device program (mapfit.py) -- survey triage
        before (or instead of) the full MCMC. Works with every data
        configuration the XLA batch likelihood supports: missing bands,
        per-source upper limits, correlated calibration errors, response
        mode.

        Stores per-source results (free-parameter space):
            map_params   (S, 5) full-space MAP points
            map_lnprob   (S,)   posterior log-density at the mode
            map_cov      (S, nfree, nfree) Laplace covariance
            map_sigma    (S, nfree) sqrt(diag)
            map_interior (S,) bool -- mode safely inside the box
                         (a False flag means the Laplace error bars are
                         not trustworthy; run the MCMC for that source)
        and returns self. `map_cen(param)` gives (S, 2) value +/- sigma
        summaries."""
        from mbb_emcee_tpu.mapfit import (
            map_core, neg_hessian, laplace_cov_host, interior_mask,
            _to_unconstrained)

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        spec = self._effective_spec()
        iunc_np, correlated = self._data_operand()
        lnprob_data, free_space = build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=correlated)
        self.free_space = free_space
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError(
                "MAP fitting requires finite box bounds on every free "
                "parameter (the defaults are finite)")
        S = self.nsources
        d = free_space.nfree
        lower = np.asarray(free_space.lower, np.float32)
        width = np.asarray(free_space.upper - free_space.lower, np.float32)

        if self.mesh is not None and S % self.mesh.devices.size:
            raise ValueError(
                f"the mesh size ({self.mesh.devices.size} devices) must "
                f"divide nsources={S}")
        centers, scatters = self._init_centers()
        cen_f = jnp.asarray(centers[:, free_space.free_idx], jnp.float32)
        sca_f = jnp.asarray(scatters[:, free_space.free_idx], jnp.float32)
        key = jax.random.key(self.seed, impl=self.prng_impl)

        def one_source(idx, cen_s, sca_s, flux_s, iunc_s, key, wave):
            lnp = lambda x: lnprob_data(x, wave, flux_s, iunc_s)
            x0 = make_initial_ball(
                jax.random.fold_in(key, idx), cen_s, sca_s, nstarts,
                free_space.lower, free_space.upper)
            u0 = _to_unconstrained(jnp.asarray(x0, jnp.float32),
                                   lower, width)
            u_map, lnp_map = map_core(lnp, lower, width, u0,
                                      int(n_adam), int(n_newton),
                                      float(adam_lr))
            x_map = lower + width * jax.nn.sigmoid(u_map)
            H = neg_hessian(lnp, x_map)
            g = jax.grad(lnp)(x_map)
            return x_map, lnp_map, H, jnp.sqrt(jnp.sum(g * g))

        # keys/wavelengths/data are runtime arguments, exactly as in the
        # sampler paths -- a cache hit must never reuse stale constants
        ck = ("map", S, d, int(nstarts), int(n_adam), int(n_newton),
              float(adam_lr), correlated, _mesh_token(self.mesh),
              _compile_token(spec, self.shape), self._responses_token(),
              None if self.band_names is None
              else tuple(self.band_names))
        if ck not in self._run_cache:
            f = jax.vmap(one_source,
                         in_axes=(0, 0, 0, 0, 0, None, None))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None),
                              P(ax, None), P(ax, None), P(), P(None)),
                    out_specs=(P(ax, None), P(ax), P(ax, None, None),
                               P(ax)))
            self._run_cache[ck] = jax.jit(f)
        x_map, lnp_map, H, gn = self._run_cache[ck](
            self._shard(jnp.arange(S)), self._shard(cen_f),
            self._shard(sca_f),
            self._shard(jnp.asarray(self.flux, jnp.float32)),
            self._shard(jnp.asarray(iunc_np, jnp.float32)),
            key, jnp.asarray(self.wave, jnp.float32))

        x_np = np.asarray(x_map, np.float64)
        self.map_params = free_space.expand(x_np)          # (S, 5)
        self.map_lnprob = np.asarray(lnp_map, np.float64)
        self.map_cov, h_ok = laplace_cov_host(np.asarray(H, np.float64))
        self.map_sigma = np.sqrt(np.maximum(
            np.diagonal(self.map_cov, axis1=1, axis2=2), 0.0))
        # a non-finite Hessian (saturated model at an extreme corner) is
        # never trustworthy, whatever the sigma-based check says
        self.map_interior = h_ok & np.asarray(interior_mask(
            x_np, self.map_sigma, np.asarray(free_space.lower, np.float64),
            np.asarray(free_space.upper, np.float64)))
        self.map_grad_norm = np.asarray(gn, np.float64)
        # staleness token for init='map' and map_importance: the MAP
        # results bind to this posterior AND this data
        self._map_token = (S, _spec_token(spec, self.shape), correlated)
        self._map_data = (self.flux.copy(), self.unc.copy(),
                          self.wave.copy())
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            n_bad = int((~self.map_interior).sum())
            enable_console().info(
                f"MAP triage over {S} sources x {nstarts} starts: "
                f"lnprob in [{self.map_lnprob.min():.1f}, "
                f"{self.map_lnprob.max():.1f}]; {n_bad} modes at the box "
                f"edge (Laplace suspect -- run the MCMC for those)")
        return self

    def map_importance(self, nsamples=512, seed=None, verbose=False):
        """Laplace IMPORTANCE SAMPLING: upgrade run_map()'s Gaussian
        approximation to real weighted posteriors without MCMC. Draws
        `nsamples` per source from each Laplace Gaussian, evaluates the
        true posterior in one batched device program, and keeps
        importance weights w = p/q (q known in closed form from the
        standard-normal draws -- no solves). Stores:

            map_samples (S, N, nfree), map_logw (S, N),
            map_ess (S,) -- effective sample size per source.

        map_par_cen() then gives weighted percentile summaries. The ESS
        is the triage signal importance sampling adds over the bare
        Laplace flag: ess/N near 1 means the posterior IS Gaussian-like
        and these summaries are trustworthy; a small ess means the
        Laplace proposal misses the posterior's shape -- run the MCMC
        for that source. Returns map_ess."""
        if getattr(self, "map_params", None) is None:
            raise RuntimeError("run_map() has not been called")
        self._require_map_fresh("map_importance()")
        spec = self._effective_spec()
        iunc_np, correlated = self._data_operand()
        lnprob_data, free_space = build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=correlated)
        S = self.nsources
        d = free_space.nfree
        N = int(nsamples)

        # host fp64 proposal pieces: Cholesky factors + log-normalizers
        L = np.linalg.cholesky(self.map_cov)            # (S, d, d)
        logdet = np.sum(np.log(np.diagonal(L, axis1=1, axis2=2)), axis=1)
        mu = self.map_params[:, free_space.free_idx]    # (S, d)

        key = jax.random.key(self.seed if seed is None else int(seed))
        eps = jax.random.normal(key, (S, N, d), jnp.float32)
        x = (jnp.asarray(mu, jnp.float32)[:, None, :]
             + jnp.einsum("snd,sed->sne", eps,
                          jnp.asarray(L, jnp.float32)))

        def one(x_s, flux_s, iunc_s, wave):
            return jax.vmap(
                lambda th: lnprob_data(th, wave, flux_s, iunc_s))(x_s)

        ck = ("map_is", S, d, N, correlated, _mesh_token(self.mesh),
              _compile_token(spec, self.shape), self._responses_token(),
              None if self.band_names is None
              else tuple(self.band_names))
        if ck not in self._run_cache:
            f = jax.vmap(one, in_axes=(0, 0, 0, None))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None), P(None)),
                    out_specs=P(ax, None))
            self._run_cache[ck] = jax.jit(f)
        lnp = self._run_cache[ck](
            self._shard(x),
            self._shard(jnp.asarray(self.flux, jnp.float32)),
            self._shard(jnp.asarray(iunc_np, jnp.float32)),
            jnp.asarray(self.wave, jnp.float32))        # (S, N)

        # q(x) from the draws themselves: -0.5|eps|^2 - logdet - d/2 ln2pi
        lnq = (-0.5 * np.sum(np.asarray(eps, np.float64) ** 2, axis=2)
               - logdet[:, None]
               - 0.5 * d * np.log(2.0 * np.pi))
        lnp = np.asarray(lnp, np.float64)
        logw = lnp - lnq                                # (S, N)
        # Out-of-box draws sit at the finite LNPROB_FLOOR, which ABSORBS
        # lnq in fp64 (-1e30 - O(10) == -1e30): without masking, an
        # all-out-of-box source gets UNIFORM weights and a perfect
        # ess = N -- a fake certificate for exactly the degenerate
        # sources this diagnostic exists to flag. Mask them to -inf.
        logw = np.where(lnp > _SUPPORT_FLOOR, logw, -np.inf)
        mx = logw.max(axis=1, keepdims=True)
        any_in = np.isfinite(mx[:, 0])
        logw = np.where(any_in[:, None], logw - np.where(
            np.isfinite(mx), mx, 0.0), -np.inf)
        w = np.exp(logw)
        w_sum = w.sum(axis=1, keepdims=True)
        ess = np.where(
            any_in,
            (w_sum[:, 0] ** 2) / np.maximum((w * w).sum(axis=1), 1e-300),
            0.0)

        self.map_samples = np.asarray(x, np.float64)
        self.map_logw = logw
        self.map_ess = ess
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            frac = ess / N
            enable_console().info(
                f"Laplace importance sampling: N={N}/source, ess/N "
                f"median {np.median(frac):.2f} (min {frac.min():.2f}); "
                f"{int((frac < 0.2).sum())} sources below 0.2 -- run "
                f"the MCMC for those")
        return ess

    def map_par_cen(self, param, percentile=68.3):
        """(S, 3) weighted (median, +err, -err) from the importance-
        refined Laplace posterior (map_importance first). Fixed
        parameters report zero errors."""
        if getattr(self, "map_samples", None) is None:
            raise RuntimeError("map_importance() has not been called")
        from mbb_emcee_tpu.likelihood import param_index
        i = param_index(param)
        free_idx = list(self.free_space.free_idx)
        if i not in free_idx:
            vals = self.map_params[:, i]
            return np.column_stack([vals, np.zeros_like(vals),
                                    np.zeros_like(vals)])
        col = self.map_samples[:, :, free_idx.index(i)]   # (S, N)
        w = np.exp(self.map_logw)
        p = float(percentile)
        qs = np.array([50.0 - p / 2, 50.0, 50.0 + p / 2]) / 100.0
        out = np.empty((self.nsources, 3))
        for s in range(self.nsources):
            order = np.argsort(col[s])
            cw = np.cumsum(w[s][order])
            if cw[-1] <= 0.0:
                # no draw landed in the prior box (ess = 0): report the
                # MAP point with NaN errors, never proposal noise
                out[s] = (self.map_params[s, i], np.nan, np.nan)
                continue
            cw /= cw[-1]
            lo, mid, hi = np.interp(qs, cw, col[s][order])
            out[s] = (mid, hi - mid, mid - lo)
        return out

    def map_cen(self, param):
        """(S, 2) MAP value +/- Laplace sigma for `param` (sigma = 0 for
        fixed parameters)."""
        if getattr(self, "map_params", None) is None:
            raise RuntimeError("run_map() has not been called")
        i = param_index(param)
        vals = self.map_params[:, i]
        free_idx = list(self.free_space.free_idx)
        sig = (self.map_sigma[:, free_idx.index(i)]
               if i in free_idx else np.zeros(self.nsources))
        return np.column_stack([vals, sig])

    # -- batched summaries -------------------------------------------------------
    def _require_run(self):
        if self.chain_free is None:
            raise RuntimeError("run() has not been called")

    @property
    def chain(self):
        """(S, nwalkers, nrec, 5) full-parameter chains (reference layout
        per source)."""
        self._require_run()
        free = np.asarray(self.chain_free)
        full = self.free_space.expand(free)            # (S, nrec, nw, 5)
        return np.transpose(full, (0, 2, 1, 3))

    def flatchain(self):
        """(S, nrec*nw, 5)"""
        self._require_run()
        free = np.asarray(self.chain_free)
        S = free.shape[0]
        return self.free_space.expand(free.reshape(S, -1,
                                                   self.free_space.nfree))

    def par_cen(self, param, percentile=68.3):
        """(S, 3): per-source (median, +err, -err).

        Computed ON DEVICE: a 256-source x 250-walker x 1000-step batch is
        a multi-GB chain, and pulling it to the host (which flatchain()
        does) costs far more than the percentile reduction -- especially
        over a tunneled device link."""
        self._require_run()
        i = param_index(param)
        spec = self._effective_spec()
        if spec.fixed[i]:
            v = float(spec.fixed_values[i])
            return np.tile([v, 0.0, 0.0], (self.nsources, 1))
        j = int(np.nonzero(self.free_space.free_idx == i)[0][0])
        data = jnp.reshape(self.chain_free[..., j], (self.nsources, -1))
        p = float(percentile)
        qs = jnp.percentile(data, jnp.asarray(
            [50.0 - p / 2, 50.0, 50.0 + p / 2]), axis=1)
        lo, mid, hi = np.asarray(qs, np.float64)
        return np.stack([mid, hi - mid, mid - lo], axis=1)

    def best_fit(self):
        """(params (S, 5), lnprob (S,)) at each source's max-lnp sample
        (device-side argmax/gather; see par_cen)."""
        self._require_run()
        S = self.nsources
        lnp = jnp.reshape(self.lnprobability, (S, -1))
        idx = jnp.argmax(lnp, axis=1)
        free = jnp.reshape(self.chain_free, (S, -1, self.free_space.nfree))
        best_free = jnp.take_along_axis(
            free, idx[:, None, None], axis=1)[:, 0, :]
        best_lnp = jnp.take_along_axis(lnp, idx[:, None], axis=1)[:, 0]
        return (self.free_space.expand(np.asarray(best_free, np.float64)),
                np.asarray(best_lnp, np.float64))

    def autocorrelation_time(self, window=None):
        """(S, nfree) integrated autocorrelation times: ONE batched device
        reduction (vmapped FFT autocorrelation over sources x dims),
        consistent with the rest of the class's keep-the-chain-on-device
        discipline (a host loop over S FFTs hauled the whole multi-GB
        chain over). `window` restricts to the last `window` records,
        keeping the compiled shape fixed inside an extend() loop."""
        self._require_run()
        ch = self.chain_free                   # (S, nrec, nw, nfree) dev
        if window is not None:
            ch = ch[:, -int(window):]
        return np.asarray(_batched_tau(jnp.asarray(ch)), np.float64)

    def extend(self, nsteps, verbose=False):
        """Continue the production run for all sources from the stored
        final state (pairs with converged() for run-until-converged
        serving loops). Works on both stretch-move backends: the fused
        kernel continues from its retained device state; the XLA backend
        restarts from (final PRNG key, last chain record), which IS the
        complete sampler state."""
        if getattr(self, "_sampler", None) is None:
            if getattr(self, "_xla_keys", None) is not None:
                return self._extend_xla(nsteps, verbose)
            raise RuntimeError(
                "extend() requires a prior stretch-move run() "
                "(run_hmc/run_pt runs are not continuable; re-run with "
                "more steps)")
        if getattr(self, "_run_data", None) is not None and not (
                np.array_equal(self._run_data[0], self.flux)
                and np.array_equal(self._run_data[1], self.unc)
                and np.array_equal(self._run_data[2], self.wave)):
            raise RuntimeError(
                "set_data() was called after run(); extend() would keep "
                "sampling the PREVIOUS batch's posterior -- call run() "
                "for the new data instead")
        # Posterior-identity guard (mirrors _extend_xla): the retained
        # fused sampler holds operands/spec from run() time, so a
        # parameter-space / uplim-mask / a= edit in between would be
        # silently ignored while par_cen interprets the spliced chain
        # under the NEW spec.
        spec = self._effective_spec()
        if self._posterior_token(spec, False) != self._post_token:
            raise RuntimeError(
                "the parameter space / error model / band configuration "
                "changed after run(); extend() would splice chains from "
                "different posteriors -- call run() instead")
        if nsteps % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}")
        state, chain, lnp = self._sampler.run_mcmc(
            self.final_state, int(nsteps), self.thin)
        self.chain_free = jnp.concatenate(
            [jnp.asarray(self.chain_free), chain], axis=1)
        self.lnprobability = jnp.concatenate(
            [jnp.asarray(self.lnprobability), lnp], axis=1)
        self.final_state = state
        denom = max(int(state.nsteps), 1)
        self.acceptance_fraction = np.asarray(state.naccept) / denom
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"  extended by {nsteps} steps -> "
                f"{self.chain_free.shape[1]} recorded per source")
        return self

    def _extend_xla(self, nsteps, verbose):
        """extend() on the XLA batch backend: the stretch-move state is
        (PRNG key, positions, lnprob) and the last chain record holds the
        positions/lnprob exactly, so continuation needs only the stored
        per-source keys (one compiled continue-program per extension
        geometry, cached like run()'s)."""
        if getattr(self, "_run_data", None) is not None and not (
                np.array_equal(self._run_data[0], self.flux)
                and np.array_equal(self._run_data[1], self.unc)
                and np.array_equal(self._run_data[2], self.wave)):
            raise RuntimeError(
                "set_data() was called after run(); extend() would keep "
                "sampling the PREVIOUS batch's posterior -- call run() "
                "for the new data instead")
        if nsteps % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}")
        spec = self._effective_spec()
        iunc_np, correlated = self._data_operand()
        S, nw = self.nsources, self.nwalkers
        half = nw // 2
        thin_i = int(self.thin)
        nrec_e = int(nsteps) // thin_i
        if nrec_e <= 0:
            raise ValueError(f"nsteps={nsteps} extends by zero records "
                             f"at thin={self.thin}")
        if self._posterior_token(spec, correlated) != self._post_token:
            raise RuntimeError(
                "the parameter space / error model / band configuration "
                "changed after run(); extend() would splice chains from "
                "different posteriors -- call run() instead")
        lnprob_data, _ = build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=correlated)
        a = self.a

        def one_source_cont(flux_s, iunc_s, key_s, pos_s, lnp_s,
                            nacc_s, nst_s, wave):
            batched = jax.vmap(
                lambda th: lnprob_data(th, wave, flux_s, iunc_s))
            state = SamplerState(
                key=key_s, pos_a=pos_s[:half], pos_b=pos_s[half:],
                lnp_a=lnp_s[:half], lnp_b=lnp_s[half:],
                naccept=nacc_s, nsteps=nst_s)

            def inner(carry, _):
                s = jax.lax.fori_loop(
                    0, thin_i, lambda i, x: ensemble_step(x, batched, a),
                    carry)
                return s, (s.position, s.lnprob)

            state, (chain, lnpchain) = jax.lax.scan(
                inner, state, None, length=nrec_e)
            return chain, lnpchain, state.naccept, state.nsteps, state.key

        cache_key = ("xla_extend", S, nw, self.free_space.nfree, nrec_e,
                     thin_i, correlated, float(self.a),
                     _mesh_token(self.mesh),
                     _compile_token(spec, self.shape),
                     self._responses_token(),
                     None if self.band_names is None
                     else tuple(self.band_names))
        if cache_key not in self._run_cache:
            f = jax.vmap(one_source_cont,
                         in_axes=(0, 0, 0, 0, 0, 0, 0, None))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax, None), P(ax, None), P(ax),
                              P(ax, None, None), P(ax, None),
                              P(ax, None), P(ax), P(None)),
                    out_specs=(P(ax, None, None, None), P(ax, None, None),
                               P(ax, None), P(ax), P(ax)))
            self._run_cache[cache_key] = jax.jit(f)

        naccept0, nsteps0 = self._xla_counters
        chain, lnpchain, naccept, nsteps_dev, keys = (
            self._run_cache[cache_key](
                self._shard(jnp.asarray(self.flux, jnp.float32)),
                self._shard(jnp.asarray(iunc_np, jnp.float32)),
                self._shard(self._xla_keys),
                self._shard(jnp.asarray(self.chain_free)[:, -1]),
                self._shard(jnp.asarray(self.lnprobability)[:, -1]),
                self._shard(jnp.asarray(naccept0)),
                self._shard(jnp.asarray(nsteps0)),
                jnp.asarray(self.wave, jnp.float32)))

        self.chain_free = jnp.concatenate(
            [jnp.asarray(self.chain_free), chain], axis=1)
        self.lnprobability = jnp.concatenate(
            [jnp.asarray(self.lnprobability), lnpchain], axis=1)
        self._xla_keys = keys
        self._xla_counters = (naccept, nsteps_dev)
        denom = np.maximum(np.asarray(nsteps_dev), 1)
        self.acceptance_fraction = np.asarray(naccept) / denom[:, None]
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"  extended by {nsteps} steps -> "
                f"{self.chain_free.shape[1]} recorded per source")
        return self

    @property
    def free_param_names(self):
        """Free-parameter names in chain-column order."""
        if self.free_space is None:
            raise RuntimeError("no fit yet (run()/run_map() set the "
                               "free-parameter space)")
        return [PARAM_NAMES[i] for i in self.free_space.free_idx]

    def gelman_rubin(self, window=None, stride=None):
        """(S, nfree) split-R-hat per source: ONE device reduction over
        the whole batch (see MBBResults.gelman_rubin for the statistic).
        In a serving pipeline this is the per-source convergence flag --
        optically-thick 5-band fits support a T/lambda0 bimodality, and a
        source whose chain is straddling modes (or stuck in one) shows
        R-hat >> 1 here while its percentile summaries look plausible.

        `window` restricts the statistic to the LAST `window` recorded
        steps. In an extend() loop this keeps the reduction's input shape
        fixed (one compiled program regardless of how long the chain has
        grown) and measures convergence of the RECENT chain rather than
        averaging in the early transient.

        `stride` subsamples every stride-th record FIRST (device-side).
        Passing stride=max(1, nrec//window) measures R-hat over (almost)
        the full chain span at the same fixed compiled shape -- the
        serving loop's predicate (cli_batch --extend-until): full-span
        R-hat is the standard diagnostic and has a lower noise floor
        than the tail-window variant at equal reduction cost. (Floor,
        not ceil: ceil can leave the strided chain shorter than the
        4-record minimum.)"""
        self._require_run()
        ch = self.chain_free                   # (S, nrec, nw, nfree) dev
        if stride is not None:
            ch = ch[:, ::max(int(stride), 1)]
        if window is not None:
            ch = ch[:, -int(window):]
        if int(ch.shape[1]) // 2 < 2:
            raise ValueError("need at least 4 recorded steps")
        # module-level jitted reduction: stable function identity, so the
        # convergence loop re-uses one compiled program per input shape
        return np.asarray(_batched_split_rhat(ch), np.float64)

    def converged(self, rhat_max=1.1, window=None, tau_mult=None,
                  stride=None):
        """(S,) boolean mask: every free parameter's split-R-hat below
        `rhat_max`. The serving loop's 'which sources need more steps'
        predicate (pair with extend(); pass a fixed `window` so the check
        compiles once no matter how long the chains grow, and
        stride=max(1, nrec//window) to measure the full chain span at
        that fixed shape -- see gelman_rubin).

        With `tau_mult` (emcee's rule of thumb is ~50), additionally
        require each source's recorded chain to be at least
        tau_mult x its largest autocorrelation time -- R-hat alone can
        look converged on a chain too short to estimate tails."""
        ok = np.all(self.gelman_rubin(window=window, stride=stride)
                    < float(rhat_max), axis=1)
        if tau_mult is not None:
            tau = self.autocorrelation_time(window=window)
            # The length criterion is about the WHOLE recorded chain (has
            # the run gathered >= tau_mult * tau samples?); only the tau
            # ESTIMATE uses the window. Capping the length at the window
            # would make the predicate unsatisfiable once
            # tau_mult * tau > window and an extend() loop never exits.
            nrec = int(self.chain_free.shape[1])
            ok = ok & (nrec >= float(tau_mult)
                       * np.nanmax(np.nan_to_num(tau, nan=1.0), axis=1))
        return ok

    # -- batched derived quantities ------------------------------------------------
    def _source_redshifts(self, redshifts):
        """Resolve the per-source redshift vector: explicit argument wins,
        otherwise the one stored by set_data()."""
        if redshifts is None:
            redshifts = self.redshifts
        if redshifts is None:
            raise ValueError(
                "no redshifts: pass redshifts= or store them via "
                "set_data(..., redshifts=...)")
        z = np.asarray(redshifts, np.float64).ravel()
        if z.size != self.nsources:
            raise ValueError("need one redshift per source")
        return z

    def _dl_mpc(self, redshifts, lumdists=None, cosmology="WMAP9"):
        if lumdists is not None:
            return np.asarray(lumdists, np.float64)
        cosmo = (Cosmology.named(cosmology)
                 if isinstance(cosmology, str) else cosmology)
        return np.array([luminosity_distance(float(z), cosmo)
                         for z in np.asarray(redshifts).ravel()])

    def _thinned(self, thin):
        """(S, nsamp, 5) thinned full-parameter samples, DEVICE-resident
        (expanding/thinning on device avoids hauling the multi-GB raw
        chain to the host)."""
        self._require_run()
        S = self.nsources
        nfree = self.free_space.nfree
        free = jnp.reshape(self.chain_free,
                           (S, -1, nfree))[:, ::max(int(thin), 1), :]
        template = jnp.asarray(self.free_space.template, jnp.float32)
        scat = np.zeros((NPARAMS, nfree), np.float32)
        scat[self.free_space.free_idx, np.arange(nfree)] = 1.0
        return template[None, None, :] + free @ jnp.asarray(scat).T

    @staticmethod
    def _chunked_samples(fn, samples, inner_elems):
        """Apply a jitted per-(source, sample) map over (S, N, 5) samples in
        sample-axis chunks, bounding device memory: an unthinned 256-source
        chain against 128 quadrature nodes would otherwise materialize
        tens of GB of intermediates. `inner_elems` = per-sample fan-out
        (e.g. quadrature nodes)."""
        S, N = samples.shape[:2]
        # ~256 MB of fp32 intermediates per pass
        chunk = max(1, (64 << 20) // max(S * inner_elems, 1))
        if N <= chunk:
            return np.asarray(fn(samples), np.float64)
        out = [np.asarray(fn(samples[:, i:i + chunk]), np.float64)
               for i in range(0, N, chunk)]
        return np.concatenate(out, axis=1)

    def compute_lir(self, redshifts=None, wavemin=8.0, wavemax=1000.0,
                    thin=1, lumdists=None, cosmology="WMAP9"):
        """(S, nsamp) L_IR posteriors in L_sun; one batched quadrature over
        sources x samples (per-source nodes scale with 1+z). `redshifts`
        defaults to the vector stored by set_data()."""
        self._require_run()
        z = self._source_redshifts(redshifts)
        lam_h, w_h = derived.lir_nodes_weights(1.0 + z, wavemin, wavemax)
        lam = jnp.asarray(lam_h, jnp.float32)                     # (S, K)
        w = jnp.asarray(w_h, jnp.float32)
        one = derived.lir_integrand(self.shape)

        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        batched = jax.jit(jax.vmap(jax.vmap(one, in_axes=(0, None, None)),
                                   in_axes=(0, 0, 0)))
        integ = self._chunked_samples(lambda s: batched(s, lam, w),
                                      samples, derived.LIR_NODES)
        prefac = derived.lir_prefactor(self._dl_mpc(z, lumdists, cosmology))
        self.lir_chain = prefac[:, None] * integ
        return self.lir_chain

    def lir_cen(self, percentile=68.3):
        if getattr(self, "lir_chain", None) is None:
            raise RuntimeError("call compute_lir(redshifts) first")
        return np.stack([_percentile_summary(c, percentile)
                         for c in self.lir_chain])

    def compute_dustmass(self, redshifts=None, kappa=2.64, kappa_wave=125.0,
                         thin=1, lumdists=None, cosmology="WMAP9"):
        """(S, nsamp) dust-mass posteriors in M_sun. `redshifts` defaults
        to the vector stored by set_data()."""
        self._require_run()
        z = self._source_redshifts(redshifts)
        opz = 1.0 + z
        lam_obs = jnp.asarray(kappa_wave * opz, jnp.float32)      # (S,)
        one = derived.dustmass_integrand(self.shape)

        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        batched = jax.jit(jax.vmap(jax.vmap(one, in_axes=(0, None)),
                                   in_axes=(0, 0)))
        g = self._chunked_samples(lambda s: batched(s, lam_obs),
                                  samples, 4)
        prefac = derived.dustmass_prefactor(
            self._dl_mpc(z, lumdists, cosmology), opz, kappa, kappa_wave)
        self.dustmass_chain = prefac[:, None] * g
        return self.dustmass_chain

    def dustmass_cen(self, percentile=68.3):
        if getattr(self, "dustmass_chain", None) is None:
            raise RuntimeError("call compute_dustmass(redshifts) first")
        return np.stack([_percentile_summary(c, percentile)
                         for c in self.dustmass_chain])

    def compute_peaklambda(self, thin=1, lo=_PEAK_RANGE[0],
                           hi=_PEAK_RANGE[1]):
        """(S, nsamp) observed peak-wavelength posteriors in um."""
        self._require_run()
        peak = derived.peak_finder(self.shape, lo, hi)
        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        batched = jax.jit(jax.vmap(jax.vmap(peak)))
        self.peaklambda_chain = self._chunked_samples(batched, samples, 8)
        return self.peaklambda_chain

    def sed_percentiles(self, waves, percentile=68.3, thin=1):
        """(S, 3, nwave) posterior-predictive SED bands for the whole
        batch: per-wavelength [median, upper, lower] f_nu percentiles in
        mJy at the OBSERVED wavelengths `waves` (micron). One batched
        device evaluation over (sources x samples x wavelengths) -- the
        serving-side QA surface (does each source's posterior band cover
        its photometry?); the batch analog of
        MBBResults.sed_percentiles."""
        self._require_run()
        waves_j = jnp.asarray(np.atleast_1d(waves), jnp.float32)
        sed = derived.sed_eval(self.shape, waves_j)
        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        batched = jax.jit(jax.vmap(jax.vmap(sed)))
        fluxes = self._chunked_samples(batched, samples,
                                       int(waves_j.size))  # (S, N, nwave)
        return derived.sed_band(fluxes, percentile, sample_axis=1)

    def posterior_predictive(self, thin=1, seed=0):
        """Batched posterior-predictive goodness-of-fit over the catalog.

        The batch analog of MBBResults.posterior_predictive (see there
        for the statistic): for every source s and (thinned) chain
        sample t, the whitened chi-square of the observed photometry
        T_obs is compared against replicated photometry drawn from the
        fitted error model, T_rep = |eps|^2 -- all (S x nsamples) pairs
        in one batched device program. Handles the full ragged-catalog
        error surface the batch likelihood samples under:

        - MISSING bands (NaN flux/unc) and photometric UPPER-LIMIT
          slots (shared or per-source masks) are excluded from the
          statistic and the replication (band_p NaN there);
        - correlated band errors (set_band_correlation): per-source
          whitening is the exact marginal over each source's observed
          bands (the same _whiten_operand the likelihood used), and
          replication draws through its inverse.

        Returns a PPCBatchResult with per-source p-values -- the
        serving-side QA sweep: which of 10,000 sources does the MBB
        model NOT describe?
        """
        self._require_run()
        flux = np.asarray(self.flux, np.float64)             # (S, nb)
        S, nb = flux.shape
        iunc = self._iunc_operand()          # signed: <0 uplim, 0 missing
        inc = iunc > 0
        ndata = inc.sum(axis=1).astype(np.int64)
        if np.any(ndata == 0):
            bad = int(np.argwhere(ndata == 0)[0, 0])
            raise RuntimeError(
                f"posterior_predictive: source {bad} has no detected "
                f"(non-missing, non-upper-limit) band")
        y_h = np.where(inc, np.nan_to_num(flux), 0.0)
        y = jnp.asarray(y_h.astype(np.float32))
        mask = jnp.asarray(inc.astype(np.float32))

        pack = self._response_pack()
        fluxes = derived.band_flux_eval(self.shape, self.wave, pack)

        if self._band_corr is None:
            iu = jnp.asarray(np.where(inc, iunc, 0.0).astype(np.float32))
            with np.errstate(divide="ignore"):
                sg = jnp.asarray(np.where(inc, 1.0 / np.where(inc, iunc, 1.0),
                                          0.0).astype(np.float32))

            def one(theta, key, y_s, a, b, m_s):
                m = fluxes(theta)
                d = (m - y_s) * a                 # excluded slots -> 0
                eps = jax.random.normal(key, (nb,), jnp.float32) * m_s
                return (jnp.sum(d * d), jnp.sum(eps * eps),
                        m + b * eps)
            op_a, op_b = iu, sg
        else:
            # (S, nb, nb) exact marginal whitening (zero rows/cols at
            # missing slots) + its inverse on the observed block for the
            # replication draw; host fp64 like the likelihood precompute.
            W = self._whiten_operand()
            L = np.zeros_like(W)
            for s in range(S):
                p = inc[s]
                L[s][np.ix_(p, p)] = np.linalg.inv(W[s][np.ix_(p, p)])

            def one(theta, key, y_s, a, b, m_s):
                m = fluxes(theta)
                d = a @ ((m - y_s) * m_s)
                eps = jax.random.normal(key, (nb,), jnp.float32) * m_s
                return (jnp.sum(d * d), jnp.sum(eps * eps),
                        m + b @ eps)
            op_a = jnp.asarray(W.astype(np.float32))
            op_b = jnp.asarray(L.astype(np.float32))

        samples = jnp.asarray(self._thinned(thin), jnp.float32)  # (S,N,5)
        N = int(samples.shape[1])
        keys = jax.random.split(jax.random.PRNGKey(int(seed)),
                                S * N).reshape(S, N, -1)
        batched = jax.jit(jax.vmap(
            jax.vmap(one, in_axes=(0, 0, None, None, None, None)),
            in_axes=(0, 0, 0, 0, 0, 0)))

        # Sample-axis chunking (same memory bound as _chunked_samples;
        # keys must slice alongside the samples, so inline the loop).
        # Per-sample fan-out includes the response-node intermediates.
        inner = nb * (pack[0].shape[1] if pack is not None else 1)
        chunk = max(1, (64 << 20) // max(S * inner, 1))
        co, cr, yr = [], [], []
        for i in range(0, N, chunk):
            a, b, c = batched(samples[:, i:i + chunk],
                              keys[:, i:i + chunk], y, op_a, op_b, mask)
            co.append(np.asarray(a, np.float64))
            cr.append(np.asarray(b, np.float64))
            yr.append(np.asarray(c, np.float64))
        chi2_obs = np.concatenate(co, axis=1)
        chi2_rep = np.concatenate(cr, axis=1)
        y_rep = np.concatenate(yr, axis=1)                  # (S, N, nb)

        band_p = np.where(inc, np.mean(y_rep >= y_h[:, None, :], axis=1),
                          np.nan)
        return PPCBatchResult(
            p_value=np.mean(chi2_rep >= chi2_obs, axis=1),
            band_p=band_p, chi2_obs=chi2_obs, chi2_rep=chi2_rep,
            ndata=ndata, nfree=self.free_space.nfree, nsamples=N,
            excluded=~inc)

    def compute_loo(self, thin=1):
        """Batched WAIC + PSIS-LOO predictive assessment over the catalog.

        The batch analog of MBBResults.compute_loo (see modelcheck.py
        for the estimators): the (S x nsamples x nb) pointwise
        log-likelihood tensor is a few chunked device programs over the
        stored chains; the PSIS tail smoothing runs host-side per
        source-band. Missing bands and photometric upper limits carry
        no proper pointwise density and are excluded (NaN in the
        pointwise arrays). With a band correlation set, pointwise
        factors are the exact conditional predictive densities
        p(y_i | y_-i, theta) through each source's marginal precision.

        Fit two model variants on the same catalog and difference their
        elpd_loo vectors for per-source predictive comparison -- the
        sampling-theory complement of compute_evidence's Bayes factors.

        Returns (and stores as .loo_result) a modelcheck.LooBatchResult.
        """
        from mbb_emcee_tpu import modelcheck
        self._require_run()
        flux = np.asarray(self.flux, np.float64)
        S, nb = flux.shape
        iunc = self._iunc_operand()          # signed: <0 uplim, 0 missing
        inc = iunc > 0
        if np.any(~inc.any(axis=1)):
            bad = int(np.argwhere(~inc.any(axis=1))[0, 0])
            raise RuntimeError(
                f"compute_loo: source {bad} has no detected "
                f"(non-missing, non-upper-limit) band")
        y = jnp.asarray(np.where(inc, np.nan_to_num(flux),
                                 0.0).astype(np.float32))
        pack = self._response_pack()
        fluxes = derived.band_flux_eval(self.shape, self.wave, pack)

        if self._band_corr is None:
            lam_diag = np.where(inc, iunc, np.nan) ** 2      # 1/sigma^2
            op = (jnp.asarray(np.where(inc, iunc, 0.0).astype(np.float32)),)

            def one(theta, y_s, op_s):
                d = (fluxes(theta) - y_s) * op_s[0]
                return -0.5 * d * d
        else:
            # Lambda_s = W_s^T W_s (exact marginal precision; zero
            # rows/cols at missing slots), fp64 host like the whitener.
            W = self._whiten_operand()
            lam_diag = np.where(inc, np.einsum("skb,skb->sb", W, W),
                                np.nan)
            idg = np.where(inc, 1.0 / np.where(inc, lam_diag, 1.0), 0.0)
            op = (jnp.asarray(W.astype(np.float32)),
                  jnp.asarray(idg.astype(np.float32)))

            def one(theta, y_s, op_s):
                w_s, ig = op_s
                d = fluxes(theta) - y_s
                g = w_s.T @ (w_s @ d)
                return -0.5 * g * g * ig

        samples = jnp.asarray(self._thinned(thin), jnp.float32)  # (S,N,5)
        batched = jax.jit(jax.vmap(
            jax.vmap(one, in_axes=(0, None, None)), in_axes=(0, 0, 0)))
        # Per-sample fan-out includes the response-node intermediates.
        inner = nb * (pack[0].shape[1] if pack is not None else 1)
        q = self._chunked_samples(lambda s: batched(s, y, op),
                                  samples, inner)           # (S, N, nb)
        with np.errstate(invalid="ignore"):
            lnnorm = 0.5 * (np.log(lam_diag) - np.log(2.0 * np.pi))
        self.loo_result = modelcheck.loo_batch_from_loglik(
            q + lnnorm[:, None, :], inc)
        return self.loo_result

    def compute_evidence(self, nlive=512, nbatch=32, nsteps=32,
                         max_iter=3000, tol=1e-4, seed=None, verbose=False):
        """Per-source Bayesian evidences ln Z for the whole batch in ONE
        device program (nested.nested_sample_batch): the S nested runs
        advance in lockstep -- each iteration an (S x B x K) batch of
        vmapped likelihood evaluations -- and each source freezes at its
        own termination. The batch analog of MBBFitter.compute_evidence
        (ADDITIVE; see there for prior conventions): run it once per
        model variant over the same batch and difference the (S,) logz
        vectors for per-source Bayes factors.

        Needs data (set_data) but not a prior run(). Returns
        NestedBatchResult; also stored as self.evidence.

        The compiled program is cached like every other batched entry
        point (geometry + posterior config key; data/keys are runtime
        operands), so chunked serving over same-shape tiles pays ONE
        compile, and a configured mesh shards the independent
        per-source runs over the source axis."""
        from mbb_emcee_tpu.nested import make_nested_batch_runner

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        spec = self._effective_spec()
        iunc_np, correlated = self._data_operand()
        S = self.nsources
        if self.mesh is not None and S % self.mesh.devices.size:
            raise ValueError(
                f"the mesh size ({self.mesh.devices.size} devices) must "
                f"divide nsources={S}")
        free_idx = spec.free_indices
        ck = ("nested", S, int(nlive), int(nbatch), int(nsteps),
              int(max_iter), float(tol), correlated,
              _mesh_token(self.mesh), _compile_token(spec, self.shape),
              self._responses_token(), self.wave.tobytes(),
              None if self.band_names is None
              else tuple(self.band_names))
        if ck not in self._run_cache:
            lnprob, _ = build_lnprob_data(
                self.shape, spec, response_pack=self._response_pack(),
                correlated=correlated)
            wave = np.asarray(self.wave, np.float32)

            def ll(theta_free, flux, iunc):
                return lnprob(theta_free, wave, flux, iunc)

            self._run_cache[ck] = make_nested_batch_runner(
                ll, spec.lower[free_idx], spec.upper[free_idx],
                nlive=nlive, nbatch=nbatch, nsteps=nsteps,
                max_iter=max_iter, tol=tol, mesh=self.mesh)
        data = (jnp.asarray(self.flux, jnp.float32),
                jnp.asarray(iunc_np, jnp.float32))
        key = jax.random.key(self.seed if seed is None else int(seed))
        res = self._run_cache[ck](key, data)
        # expand weighted samples to the full 5-parameter space
        fs = FreeSpace(free_idx=free_idx,
                       template=np.where(spec.fixed, spec.fixed_values, 0.0),
                       lower=spec.lower[free_idx].copy(),
                       upper=spec.upper[free_idx].copy())
        res.samples = fs.expand(res.samples)
        self.evidence = res
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"nested sampling over {self.nsources} sources: lnZ in "
                f"[{res.logz.min():.2f}, {res.logz.max():.2f}], median err "
                f"{np.median(res.logz_err):.3f}, iterations "
                f"{res.n_iter.min()}-{res.n_iter.max()}")
        return res

    def peaklambda_cen(self, percentile=68.3):
        if getattr(self, "peaklambda_chain", None) is None:
            raise RuntimeError("call compute_peaklambda() first")
        return np.stack([_percentile_summary(c, percentile)
                         for c in self.peaklambda_chain])

    # -- persistence ----------------------------------------------------------------
    def writeToHDF5(self, filename, thin=1):
        """Persist the whole batch to one HDF5 file (the batch analog of
        MBBResults.writeToHDF5). `thin` subsamples the stored chains --
        full 250-walker x 1000-step x 256-source chains are multi-GB, and
        pulling them off a tunneled device is the dominant cost.
        Reload with MultiFitter.from_h5."""
        import h5py
        self._require_run()
        spec = self._effective_spec()
        t = max(int(thin), 1)
        chain = np.asarray(self.chain_free[:, ::t], np.float32)
        lnp = np.asarray(self.lnprobability[:, ::t], np.float32)
        with h5py.File(filename, "w") as f:
            f.attrs["schema_version"] = 1
            f.attrs["package"] = "mbb_emcee_tpu.multifit"
            f.attrs["nwalkers"] = self.nwalkers
            f.attrs["nsources"] = self.nsources
            f.attrs["thin"] = self.thin * t
            f.attrs["opthin"] = self.shape.opthin
            f.attrs["noalpha"] = self.shape.noalpha
            f.attrs["wavenorm"] = self.shape.wavenorm
            f.create_dataset("ChainFree", data=chain, compression="gzip")
            f.create_dataset("LnProbability", data=lnp, compression="gzip")
            f.create_dataset("AcceptanceFraction",
                             data=self.acceptance_fraction)
            f.create_dataset("Wave", data=self.wave)
            f.create_dataset("Flux", data=self.flux)
            f.create_dataset("Unc", data=self.unc)
            if self.band_names is not None:
                f.attrs["band_names"] = np.array(
                    [n.encode() for n in self.band_names])
            if self.source_names is not None:
                f.create_dataset("SourceNames", data=np.array(
                    [n.encode() for n in self.source_names]))
            if self.redshifts is not None:
                f.create_dataset("Redshifts", data=self.redshifts)
            for ds, chain in (("LIRChain", self.lir_chain),
                              ("DustMassChain", self.dustmass_chain),
                              ("PeakLambdaChain", self.peaklambda_chain)):
                if chain is not None:
                    f.create_dataset(ds, data=np.asarray(chain, np.float32),
                                     compression="gzip")
            sp = f.create_group("ParamSpec")
            for name in ("lower", "upper", "fixed", "fixed_values",
                         "prior_mean", "prior_isigma"):
                sp.create_dataset(name, data=getattr(spec, name))
            if spec.uplim_bands is not None:
                sp.create_dataset("uplim_bands", data=spec.uplim_bands)
            if self._band_corr is not None:
                sp.create_dataset("band_correlation", data=self._band_corr)
            if self.evidence is not None:
                ev = self.evidence
                g = f.create_group("Evidence")
                g.attrs["nbatch"] = ev.nbatch
                g.attrs["nlive"] = ev.nlive
                for name, arr in (("LogZ", ev.logz),
                                  ("LogZErr", ev.logz_err), ("H", ev.h),
                                  ("NIter", ev.n_iter),
                                  ("NLike", ev.n_like)):
                    g.create_dataset(name, data=arr)
                for name, arr in (("Samples", ev.samples),
                                  ("LogLike", ev.loglike),
                                  ("LogWt", ev.logwt)):
                    g.create_dataset(name, data=np.asarray(arr, np.float32),
                                     compression="gzip")
            if self.logz_pt is not None:
                g = f.create_group("PTEvidence")
                g.create_dataset("LogZ", data=self.logz_pt[0])
                g.create_dataset("LogZErr", data=self.logz_pt[1])
                g.create_dataset("LogZTI", data=self.logz_ti[0])
                g.create_dataset("LogZTIErr", data=self.logz_ti[1])
                g.create_dataset("Betas", data=self.pt_betas)
                g.create_dataset("SwapFraction", data=self.swap_fraction)
            if self.loo_result is not None:
                from mbb_emcee_tpu.modelcheck import write_loo_batch_group
                write_loo_batch_group(f, self.loo_result)
            if self.hmc_step_size is not None:
                g = f.create_group("HMC")
                g.create_dataset("StepSize", data=self.hmc_step_size)
                g.create_dataset("Mass", data=self.hmc_mass)
            if getattr(self, "map_params", None) is not None:
                self._write_map_group(f)
            if getattr(self, "_xla_keys", None) is not None and t == 1:
                # Unthinned dumps carry the XLA backend's complete
                # continuation state: (final per-source PRNG key, last
                # chain record) restarts the stretch move exactly, so a
                # from_h5 reload can extend() -- and run(checkpoint=...)
                # on this backend flushes through here. Thinned dumps
                # drop it (the subsampled last record need not be the
                # true final state).
                from mbb_emcee_tpu.checkpoint import _key_to_np
                g = f.create_group("XLAContinuation")
                g.create_dataset("Keys", data=_key_to_np(self._xla_keys))
                naccept, nsteps_dev = self._xla_counters
                g.create_dataset("NAccept",
                                 data=np.asarray(naccept, np.int64))
                g.create_dataset("NSteps",
                                 data=np.asarray(nsteps_dev, np.int64))
                g.attrs["seed"] = self.seed
                g.attrs["a"] = self.a
                g.attrs["prng_impl"] = self.prng_impl.encode()
                # The mesh the run executed under: threefry streams are
                # partition-independent, but rbg bits legitimately depend
                # on the partitioning, so a resume under a DIFFERENT mesh
                # must be refused for non-threefry runs.
                g.attrs["mesh_token"] = str(
                    _mesh_token(self.mesh)).encode()
        return filename

    def _write_map_group(self, f):
        g = f.create_group("MAPFit")
        g.create_dataset("Params", data=self.map_params)
        g.create_dataset("LnProb", data=self.map_lnprob)
        g.create_dataset("Cov", data=self.map_cov)
        g.create_dataset("Sigma", data=self.map_sigma)
        g.create_dataset("Interior", data=self.map_interior)
        g.create_dataset("GradNorm", data=self.map_grad_norm)

    def write_map_h5(self, filename):
        """Persist a MAP-only triage result (no chains -- the --map CLI
        flow): data + config + the MAPFit group. Reload the arrays with
        h5py; this is a triage artifact, not a from_h5 input."""
        import h5py
        if getattr(self, "map_params", None) is None:
            raise RuntimeError("run_map() has not been called")
        with h5py.File(filename, "w") as f:
            f.attrs["nwalkers"] = self.nwalkers
            f.attrs["wavenorm"] = self.shape.wavenorm
            f.attrs["opthin"] = self.shape.opthin
            f.attrs["noalpha"] = self.shape.noalpha
            f.create_dataset("Wave", data=self.wave)
            f.create_dataset("Flux", data=self.flux)
            f.create_dataset("Unc", data=self.unc)
            if self.source_names is not None:
                f.create_dataset("SourceNames", data=np.array(
                    [n.encode() for n in self.source_names]))
            if self.redshifts is not None:
                f.create_dataset("Redshifts", data=self.redshifts)
            self._write_map_group(f)
        return filename

    @classmethod
    def from_h5(cls, filename):
        """Reload a persisted batch: summaries, derived quantities and
        per-source MBBResults views all work on the restored object."""
        import dataclasses
        import h5py
        with h5py.File(filename, "r") as f:
            mf = cls(nwalkers=int(f.attrs["nwalkers"]),
                     wavenorm=float(f.attrs["wavenorm"]),
                     noalpha=bool(f.attrs["noalpha"]),
                     opthin=bool(f.attrs["opthin"]))
            names = (None if "band_names" not in f.attrs else
                     [n.decode() for n in f.attrs["band_names"]])
            mf.set_data(np.asarray(f["Wave"]), np.asarray(f["Flux"]),
                        np.asarray(f["Unc"]), band_names=names,
                        source_names=(
                            None if "SourceNames" not in f else
                            [n.decode() for n in f["SourceNames"]]),
                        redshifts=(None if "Redshifts" not in f else
                                   np.asarray(f["Redshifts"])))
            for ds, attr in (("LIRChain", "lir_chain"),
                             ("DustMassChain", "dustmass_chain"),
                             ("PeakLambdaChain", "peaklambda_chain")):
                if ds in f:
                    setattr(mf, attr, np.asarray(f[ds], np.float64))
            sp = f["ParamSpec"]
            mf._spec = dataclasses.replace(
                mf._spec,
                lower=np.asarray(sp["lower"]),
                upper=np.asarray(sp["upper"]),
                fixed=np.asarray(sp["fixed"], bool),
                fixed_values=np.asarray(sp["fixed_values"]),
                prior_mean=np.asarray(sp["prior_mean"]),
                prior_isigma=np.asarray(sp["prior_isigma"]),
                uplim_bands=(np.asarray(sp["uplim_bands"], bool)
                             if "uplim_bands" in sp else None))
            if "band_correlation" in sp:
                mf._band_corr = np.asarray(sp["band_correlation"],
                                           np.float64)
            from mbb_emcee_tpu.likelihood import build_lnprob_data
            _, mf.free_space = build_lnprob_data(mf.shape,
                                                 mf._effective_spec())
            mf.chain_free = jnp.asarray(np.asarray(f["ChainFree"]))
            mf.lnprobability = jnp.asarray(np.asarray(f["LnProbability"]))
            mf.acceptance_fraction = np.asarray(f["AcceptanceFraction"])
            mf.thin = int(f.attrs["thin"])
            if "MAPFit" in f:
                g = f["MAPFit"]
                mf.map_params = np.asarray(g["Params"], np.float64)
                mf.map_lnprob = np.asarray(g["LnProb"], np.float64)
                mf.map_cov = np.asarray(g["Cov"], np.float64)
                mf.map_sigma = np.asarray(g["Sigma"], np.float64)
                mf.map_interior = np.asarray(g["Interior"], bool)
                mf.map_grad_norm = np.asarray(g["GradNorm"], np.float64)
                # the restored results bind to the restored spec + data
                mf._map_token = (mf.nsources,
                                 _spec_token(mf._effective_spec(),
                                             mf.shape),
                                 mf._band_corr is not None)
                mf._map_data = (mf.flux.copy(), mf.unc.copy(),
                                mf.wave.copy())
            if "Evidence" in f:
                from mbb_emcee_tpu.nested import NestedBatchResult
                g = f["Evidence"]
                mf.evidence = NestedBatchResult(
                    logz=np.asarray(g["LogZ"]),
                    logz_err=np.asarray(g["LogZErr"]),
                    h=np.asarray(g["H"]),
                    samples=np.asarray(g["Samples"], np.float64),
                    loglike=np.asarray(g["LogLike"], np.float64),
                    logwt=np.asarray(g["LogWt"], np.float64),
                    n_iter=np.asarray(g["NIter"]),
                    n_like=np.asarray(g["NLike"]),
                    nbatch=int(g.attrs["nbatch"]),
                    nlive=int(g.attrs["nlive"]))
            if "PTEvidence" in f:
                g = f["PTEvidence"]
                mf.logz_pt = (np.asarray(g["LogZ"]),
                              np.asarray(g["LogZErr"]))
                mf.logz_ti = (np.asarray(g["LogZTI"]),
                              np.asarray(g["LogZTIErr"]))
                mf.pt_betas = np.asarray(g["Betas"])
                mf.swap_fraction = np.asarray(g["SwapFraction"])
            if "LOO" in f:
                from mbb_emcee_tpu.modelcheck import read_loo_batch_group
                mf.loo_result = read_loo_batch_group(f["LOO"])
            if "HMC" in f:
                g = f["HMC"]
                mf.hmc_step_size = np.asarray(g["StepSize"])
                mf.hmc_mass = np.asarray(g["Mass"])
            if "XLAContinuation" in f:
                from mbb_emcee_tpu.checkpoint import _key_from_np
                g = f["XLAContinuation"]
                impl = g.attrs["prng_impl"]
                if isinstance(impl, bytes):
                    impl = impl.decode()
                mf.seed = int(g.attrs["seed"])
                mf.a = float(g.attrs["a"])
                mf.prng_impl = impl
                mf._xla_keys = _key_from_np(np.asarray(g["Keys"]), impl)
                mf._xla_counters = (
                    jnp.asarray(np.asarray(g["NAccept"]), jnp.int32),
                    jnp.asarray(np.asarray(g["NSteps"]), jnp.int32))
                tok = g.attrs.get("mesh_token", b"")
                mf._ck_mesh_token = (tok.decode()
                                     if isinstance(tok, bytes) else tok)
                mf._backend_used = "xla"
                mf._post_token = mf._posterior_token(
                    mf._effective_spec(), mf._band_corr is not None)
                mf._run_data = (mf.flux.copy(), mf.unc.copy(),
                                mf.wave.copy())
        return mf

    # -- single-source views -------------------------------------------------------
    def results(self, i, redshift=None, cosmology="WMAP9", lumdist=None):
        """Full MBBResults for source i (summaries, derived quantities,
        writeToHDF5 -- the complete single-source analysis surface).
        `redshift` defaults to the per-source vector stored by
        set_data()."""
        from mbb_emcee_tpu.results import MBBResults
        self._require_run()
        i = int(i)
        if redshift is None and self.redshifts is not None:
            redshift = float(self.redshifts[i])
        view = _SourceView(self, i)
        return MBBResults(fit=view, redshift=redshift, cosmology=cosmology,
                          lumdist=lumdist)


class _SourceView:
    """Adapter presenting one source of a MultiFitter as a finished
    MBBFitter (the attribute surface MBBResults._from_fit consumes)."""

    def __init__(self, mf: MultiFitter, i: int):
        self.chain_free = mf.chain_free[i]
        self.chain = np.transpose(
            mf.free_space.expand(np.asarray(mf.chain_free[i])), (1, 0, 2))
        self.lnprobability = np.asarray(mf.lnprobability[i])
        self.acceptance_fraction = mf.acceptance_fraction[i]
        self.shape = mf.shape
        self._pack = mf._response_pack()
        cov = None
        if mf._band_corr is not None:
            # this source's full covariance C = D R D (the error model
            # the batch actually sampled under); a missing band is an
            # infinite-variance row/col with zero cross terms -- the
            # exact limit the marginalized whitening implements
            d = mf.unc[i]
            cov = mf._band_corr * np.outer(d, d)
            miss = ~np.isfinite(d)
            if miss.any():
                cov[miss, :] = 0.0
                cov[:, miss] = 0.0
                cov[miss, miss] = np.inf
        self.phot = Photometry(mf.wave, mf.flux[i], mf.unc[i], cov=cov,
                               band_names=mf.band_names)
        self.spec = mf._effective_spec()
        if (self.spec.uplim_bands is not None
                and self.spec.uplim_bands.ndim == 2):
            # per-source mask: this view carries its own row
            from mbb_emcee_tpu.paramspace import _replace
            self.spec = _replace(self.spec,
                                 uplim_bands=self.spec.uplim_bands[i])
        self._init = mf._init.copy()
        self.thin = mf.thin
        self.nwalkers = mf.nwalkers
        if getattr(mf, "logz_pt", None) is not None:
            self.logz_pt = (float(mf.logz_pt[0][i]),
                            float(mf.logz_pt[1][i]))
            self.logz_ti = (float(mf.logz_ti[0][i]),
                            float(mf.logz_ti[1][i]))
        if getattr(mf, "hmc_step_size", None) is not None:
            self.hmc_step_size = float(mf.hmc_step_size[i])
            self.hmc_mass = mf.hmc_mass[i].copy()
        if getattr(mf, "evidence", None) is not None:
            # Per-source NestedResult so MBBResults picks up lnZ and
            # writeToHDF5 emits the Evidence group, exactly as a
            # single-source MBBFitter.compute_evidence() would.
            self.evidence = mf.evidence[i]

    def _response_pack(self):
        return self._pack


def _mesh_token(mesh):
    """Content key for a mesh. id(mesh) is unsafe in a cache key: a freed
    mesh's address can be recycled by a NEW mesh with different devices,
    silently reusing a program sharded for the old one."""
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), mesh.devices.shape,
            tuple(int(d.id) for d in mesh.devices.flat))


def _pack_token(pack):
    """Content key for a response pack (the (waves, weights) arrays baked
    into the compiled program as constants). id(self.responses) is unsafe
    for the same address-recycling reason as _mesh_token."""
    if pack is None:
        return None
    waves, wts = pack
    return (waves.tobytes(), wts.tobytes())


def _compile_token(spec: LikelihoodSpec, shape: MBBShape):
    """Hashable snapshot of everything that is baked into the compiled
    BATCH run as a constant (parameter-space config + model shape).
    Upper-limit masks are deliberately EXCLUDED: in the batch paths they
    ride the sign of the inverse-uncertainty operand (signed_iunc), so a
    mask change must reuse the compiled program -- that is the point of
    the encoding. Use _spec_token when identifying the POSTERIOR (extend
    guards), where the mask does matter."""
    return (spec.lower.tobytes(), spec.upper.tobytes(),
            spec.fixed.tobytes(), spec.fixed_values.tobytes(),
            spec.prior_mean.tobytes(), spec.prior_isigma.tobytes(),
            shape.opthin, shape.noalpha, shape.wavenorm)


def _spec_token(spec: LikelihoodSpec, shape: MBBShape):
    """Posterior-identity snapshot: _compile_token plus the upper-limit
    mask (an operand, not a compiled constant, but it changes WHICH
    posterior the chain samples -- extend() must refuse to splice)."""
    uplim = (None if spec.uplim_bands is None
             else np.asarray(spec.uplim_bands).tobytes())
    return _compile_token(spec, shape) + (uplim,)
