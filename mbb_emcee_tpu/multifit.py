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

from mbb_emcee_tpu.constants import (
    PARAM_NAMES, NPARAMS, HCOK_UM_K)
from mbb_emcee_tpu.models.modified_blackbody import MBBShape
from mbb_emcee_tpu.likelihood import (
    LikelihoodSpec, FreeSpace, build_lnprob_data, Photometry)
from mbb_emcee_tpu.sampler import make_initial_ball
from mbb_emcee_tpu.fitter import DEFAULT_INIT, DEFAULT_SCATTER
from mbb_emcee_tpu.paramspace import ParamSpaceMixin
from mbb_emcee_tpu.results import _percentile_summary
from mbb_emcee_tpu import derived
# The batched-run orchestration (stretch-move run/extend/checkpoint, PT,
# HMC, MAP+Laplace, nested evidence, PPC/LOO, device-side summaries)
# lives in the shared engine; this module keeps the MBB-specific pieces:
# the fused-Pallas backend, data-driven init, band-correlation
# whitening, derived MBB quantities, and HDF5 persistence.
# _mesh_token/_pack_token/_batched_* are re-exported for back-compat.
from mbb_emcee_tpu.batchengine import (      # noqa: F401  (re-exports)
    BatchEngine, _mesh_token, _pack_token, _batched_split_rhat,
    _batched_tau)

# Derived-quantity kernels + tuning constants are shared with the
# single-source path (results.MBBResults) via derived.py.
_PEAK_RANGE = derived.PEAK_RANGE


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


class MultiFitter(BatchEngine, ParamSpaceMixin):
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
    band-correlation matrix with per-source sigmas is supported on every
    backend, including the fused Pallas kernel (set_band_correlation).
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
        # Quadrature pack restored by from_h5 when the file carries a
        # ResponsePack group but this instance has no ResponseSet: the
        # reloaded batch must evaluate band-integrated fluxes exactly as
        # the fit sampled them (PPC/LOO/SED bands), not point fluxes.
        self._restored_pack = None
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

    # -- data: set_data / set_phot_upperlimits / set_band_correlation /
    # _iunc_operand / _whiten_operand live in BatchEngine ----------------------
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

    # -- shared parameter-space config: paramspace.ParamSpaceMixin ------------

    # -- engine hooks (batchengine.BatchEngine) -------------------------------
    def _engine_label(self):
        return "MultiFitter"

    def _engine_program_identity(self):
        # The compile token fingerprints everything baked into a traced
        # MBB batch body (shape, spec content, response pack, correlation
        # presence; data rides as operands), so programs are shareable
        # across MultiFitter instances (chunked serving over same-shape
        # tiles, reloads, the test suite) with no extra identity.
        return ()

    @property
    def _engine_param_names(self):
        return list(PARAM_NAMES)

    def _engine_lnprob(self, spec):
        return build_lnprob_data(
            self.shape, spec, response_pack=self._response_pack(),
            correlated=self._band_corr is not None)

    def _engine_operands(self, free_space):
        iunc_np, _ = self._data_operand()
        return (jnp.asarray(self.flux, jnp.float32),
                jnp.asarray(iunc_np, jnp.float32))

    def _engine_compile_token(self, spec):
        # uplim masks excluded: they ride the iunc operand, so mask
        # changes REUSE compiled programs (_compile_token)
        return (self._band_corr is not None,
                _compile_token(spec, self.shape),
                self._responses_token(),
                None if self.band_names is None
                else tuple(self.band_names))

    def _engine_init_centers(self, init, free_space):
        centers, scatters = self._init_centers(init)
        idx = free_space.free_idx
        return centers[:, idx], scatters[:, idx]

    def _engine_record_run(self, spec):
        # Continuation state for extend() on the XLA backend; content
        # (not identity) of the data so a set_data in between is caught.
        self._sampler = None
        self.final_state = None
        self._post_token = self._posterior_token(
            spec, self._band_corr is not None)
        self._run_data = (self.flux.copy(), self.unc.copy(),
                          self.wave.copy())

    def _engine_check_extend(self, spec):
        if getattr(self, "_run_data", None) is not None and not (
                np.array_equal(self._run_data[0], self.flux)
                and np.array_equal(self._run_data[1], self.unc)
                and np.array_equal(self._run_data[2], self.wave)):
            raise RuntimeError(
                "set_data() was called after run(); extend() would keep "
                "sampling the PREVIOUS batch's posterior -- call run() "
                "for the new data instead")
        if self._posterior_token(
                spec, self._band_corr is not None) != self._post_token:
            raise RuntimeError(
                "the parameter space / error model / band configuration "
                "changed after run(); extend() would splice chains from "
                "different posteriors -- call run() instead")

    def _engine_record_nonextendable(self, kind):
        self._backend_used = kind
        self._sampler = None
        self.final_state = None
        self._xla_keys = None
        self._xla_counters = None

    def _engine_record_map(self, spec):
        # staleness token for init='map' and map_importance: the MAP
        # results bind to this posterior AND this data
        self._map_token = (self.nsources, _spec_token(spec, self.shape),
                           self._band_corr is not None)
        self._map_data = (self.flux.copy(), self.unc.copy(),
                          self.wave.copy())

    def _engine_band_flux_eval(self):
        return derived.band_flux_eval(self.shape, self.wave,
                                      self._response_pack())

    def _engine_posterior_repr(self):
        # Mesh-free: tier-checkpoint resume under a different mesh is
        # gated separately (_tier_ck_check: threefry allowed, rbg
        # refused) -- baking the mesh into the posterior hash would
        # refuse valid threefry cross-mesh resumes with an unactionable
        # "posterior_fp" mismatch.
        mesh, self.mesh = self.mesh, None
        try:
            return repr(self._posterior_token(
                self._effective_spec(), self._band_corr is not None))
        finally:
            self.mesh = mesh

    # -- the batched run --------------------------------------------------------
    def _response_pack(self):
        if self.responses is None:
            return self._restored_pack
        if self.band_names is None:
            raise ValueError("response mode requires band_names in set_data")
        return self.responses.pack(self.band_names)

    def _responses_token(self):
        """Content cache key for the response curves baked into compiled
        programs (see _pack_token)."""
        pack = self._response_pack()
        return None if pack is None else _pack_token(pack)

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
        # Validate init UP FRONT (both backends' resume branches skip
        # _init_centers, which would otherwise let a typo through), and
        # refuse the ambiguous combination exactly as MBBFitter.run does:
        # on an actual resume the checkpointed state wins and init='map'
        # would be silently dropped.
        if init not in ("auto", "map"):
            raise ValueError(f"init must be 'auto' or 'map'; got {init!r}")
        import os
        if (resume and checkpoint and os.path.exists(checkpoint)
                and init == "map"):
            raise ValueError(
                "init='map' combined with an actual resume is ambiguous: "
                "the checkpointed state would silently win; drop init= "
                "(or the checkpoint file) to make the intent explicit")
        spec = self._effective_spec()
        backend = self.sampler_backend
        if backend == "auto":
            try:
                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            backend = ("fused" if (on_tpu and self.mesh is None)
                       else "xla")
        self._backend_used = backend
        if backend == "fused":
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
            return self._engine_run_checkpointed(
                nburn, nsteps, thin, recenter_burn, verbose, init,
                checkpoint, int(checkpoint_interval),
                bool(resume and os.path.exists(checkpoint)))
        return self._engine_run_xla(nburn, nsteps, thin, recenter_burn,
                                    verbose, init)

    def _engine_adopt_checkpoint(self, checkpoint, thin_i):
        """Resume branch of the segmented XLA run: reload the flushed
        state, refuse a mismatched geometry/PRNG/posterior, adopt."""
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
        correlated = self._band_corr is not None
        whiten = self._whiten_operand() if correlated else None
        token = ("fused", self.nwalkers, float(self.a), correlated,
                 _compile_token(spec, self.shape),
                 self.flux.shape, self.wave.tobytes(),
                 self._responses_token(), _mesh_token(self.mesh),
                 None if self.band_names is None
                 else tuple(self.band_names))
        if getattr(self, "_fused_token", None) != token:
            self._fused = FusedMultiPallasSampler(
                self.nwalkers, self.wave, self.flux, self.unc, self.shape,
                spec, response_pack=self._response_pack(), a=self.a,
                mesh=self.mesh, interpret=self.interpret, whiten=whiten)
            self._fused_token = token
        else:
            self._fused.set_data(self.flux, self.unc,
                                 uplim_bands=spec.uplim_bands,
                                 whiten=whiten)
        samp = self._fused
        self.free_space = samp.free_space
        self._run_spec = spec       # see batchengine: persisted spec
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
            # band correlation enters ONLY when set, so pre-feature
            # fused checkpoints keep resuming (the _ps_token convention)
            data_fp = data_fingerprint(
                self.wave, self.flux, self.unc,
                *(() if self._band_corr is None
                  else (self._band_corr,)),
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
        # ... and the posterior identity (spec/mask/a/correlation): the
        # retained fused sampler holds the operands from run() time, so a
        # parameter-space edit in between must refuse extend() exactly
        # as the XLA twin does.
        self._post_token = self._posterior_token(
            spec, self._band_corr is not None)
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

    # -- batched summaries -------------------------------------------------------
    def extend(self, nsteps, verbose=False):
        """Continue the production run for all sources from the stored
        final state (pairs with converged() for run-until-converged
        serving loops). Works on both stretch-move backends: the fused
        kernel continues from its retained device state; the XLA backend
        restarts from (final PRNG key, last chain record), which IS the
        complete sampler state."""
        if getattr(self, "_sampler", None) is None:
            if getattr(self, "_xla_keys", None) is not None:
                return self._engine_extend_xla(nsteps, verbose)
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
        if self._posterior_token(
                spec, self._band_corr is not None) != self._post_token:
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


    # -- batched derived quantities ------------------------------------------------
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
        # Persist the spec the RUN sampled under (recorded at run time),
        # not the current one: a fix_param()/set_gaussian_prior() edit
        # between run() and save would otherwise re-label or drop chain
        # columns on reload (from_h5 rebuilds free_space from this).
        spec = getattr(self, "_run_spec", None) or self._effective_spec()
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
            pack = self._response_pack()
            if pack is not None:
                # The per-band quadrature the fit sampled under: without
                # it a from_h5 reload would evaluate PPC/LOO/SED bands
                # by point evaluation -- a silently different model --
                # and an XLA-backend resume would refuse (the posterior
                # token includes the response curves).
                g = f.create_group("ResponsePack")
                g.create_dataset("Nodes", data=pack[0])
                g.create_dataset("Weights", data=pack[1])
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
            if "ResponsePack" in f:
                mf._restored_pack = (
                    np.asarray(f["ResponsePack"]["Nodes"]),
                    np.asarray(f["ResponsePack"]["Weights"]))
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


# _mesh_token/_pack_token: imported from batchengine at the top of the
# file (single source of truth; duplicating them here once silently
# desynchronized stretch-tier vs PT/HMC-tier checkpoint mesh gating).


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
