"""Fit orchestration: data ingest, priors/limits/fixed params, burn-in
protocol, production run.

Rebuild of the reference's mbb_fitter (ref: mbb_emcee/mbb_fit.py --
reconstructed, SURVEY.md C4). The host side is deliberately THIN: it builds
the likelihood closure and launches jitted device phases; the burn-in ->
re-center-on-best-walker -> re-burn -> reset -> production protocol of the
reference is preserved, with each phase a single on-device loop.

Parameters are observer frame: theta = (T/(1+z), beta, lambda0*(1+z),
alpha, fnorm), exactly as the reference samples them. `nthreads` is accepted
for API familiarity and ignored -- walker parallelism is vmap on device, not
a multiprocessing pool.
"""

from __future__ import annotations

import dataclasses as _dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.constants import PARAM_NAMES, NPARAMS
from mbb_emcee_tpu.models.modified_blackbody import MBBShape
from mbb_emcee_tpu.likelihood import (
    Photometry, LikelihoodSpec, build_lnprob, param_index,
    DEFAULT_LOWER, DEFAULT_UPPER)
from mbb_emcee_tpu.sampler import (
    EnsembleSampler, make_initial_ball, autocorrelation_time)
from mbb_emcee_tpu.response import ResponseSet
from mbb_emcee_tpu.paramspace import ParamSpaceMixin, _replace

# Default initial guess and ball scatter (observer frame), narrowed or
# overridden via set_param_init / an explicit p0. [MED] reconstruction of the
# reference defaults; the recenter-burn makes the fit insensitive to them.
DEFAULT_INIT = np.array([12.0, 2.0, 250.0, 4.0, 40.0])
DEFAULT_SCATTER = np.array([2.0, 0.3, 50.0, 0.8, 8.0])


class MBBFitter(ParamSpaceMixin):
    def __init__(self, nwalkers=250, photfile=None, covfile=None, covextn=0,
                 wavenorm=500.0, noalpha=False, opthin=False, *,
                 redshift=None,
                 responses: "ResponseSet | None" = None,
                 nthreads=None, seed=1234, a=2.0, dtype=jnp.float32,
                 prng_impl="rbg", lnprob_backend="xla",
                 sampler_backend="auto", mesh=None, n_ensembles=1):
        # Everything past `opthin` is keyword-only: the upstream
        # constructor puts nthreads in the next positional slot
        # (SURVEY.md L3 row), so accepting positionals here would bind an
        # upstream-style `nthreads=4` positional to redshift= and produce
        # silently wrong derived quantities. compat.mbb_fitter provides
        # the exact upstream positional order.
        del nthreads  # walker parallelism is on-device (see module docstring)
        from mbb_emcee_tpu.utils.compilecache import enable_persistent_cache
        enable_persistent_cache()
        self.nwalkers = int(nwalkers)
        self.shape = MBBShape(opthin=bool(opthin), noalpha=bool(noalpha),
                              wavenorm=float(wavenorm))
        # Stored for the results layer (upstream mbb_fitter carries the
        # source redshift too); MBBResults(fit=...) uses it as the default
        # when no explicit redshift= is given there.
        self.redshift = None if redshift is None else float(redshift)
        self.a = float(a)
        self.dtype = dtype
        self.seed = int(seed)
        # 'rbg' is the TPU-native counter PRNG: much cheaper per draw than
        # threefry and statistically fine for MCMC proposals (sampler
        # statistics tests cover it). Still deterministic per (seed, impl).
        self.prng_impl = prng_impl
        # 'xla' = portable fused likelihood; 'pallas' = single fused TPU
        # kernel (ops/pallas_lnprob.py), TPU-only.
        if lnprob_backend not in ("xla", "pallas"):
            raise ValueError("lnprob_backend must be 'xla' or 'pallas'")
        self.lnprob_backend = lnprob_backend
        # 'fused' = the whole sampling loop as ONE Pallas kernel
        # (ops/pallas_sampler.py, TPU-only, ~10x the per-step throughput of
        # the XLA scan); 'xla' = portable lax.scan sampler; 'auto' picks
        # 'fused' on TPU when the likelihood supports it.
        if sampler_backend not in ("auto", "xla", "fused"):
            raise ValueError(
                "sampler_backend must be 'auto', 'xla' or 'fused'")
        self.sampler_backend = sampler_backend
        # Optional 1-D jax.sharding.Mesh: shards the WALKER axis of this
        # single fit over the mesh (parallel/sharded_sampler.py); the
        # stretch move's only cross-device dependency is an all_gather of
        # the complementary half's positions per half-step, riding ICI.
        self.mesh = mesh
        # n_ensembles > 1 runs K INDEPENDENT ensembles of this fit through
        # the fused multi-source kernel (sources-on-sublanes packing makes
        # aggregate sampling ~2.6x faster per source than the single-fit
        # kernel) and merges their chains: K x the samples per wall-clock,
        # proper cross-ensemble split-R-hat, and independent burn-ins that
        # can discover separate posterior modes (the optically-thick model
        # supports a T/lambda0 bimodality). Diagonal uncertainties only.
        self.n_ensembles = int(n_ensembles)
        self.responses = responses

        self._spec = LikelihoodSpec.default()
        self._init = DEFAULT_INIT.copy()
        self._scatter = DEFAULT_SCATTER.copy()
        self._user_init = np.zeros(NPARAMS, bool)
        self._user_scatter = np.zeros(NPARAMS, bool)
        self.phot: Photometry | None = None

        # Run products (populated by run()).
        self.free_space = None
        self.chain_free = None      # (nrec, nwalkers, nfree) device array
        self.lnprobability = None   # (nrec, nwalkers)
        self.burn_chain_free = None
        self.acceptance_fraction = None
        self.thin = 1
        self.evidence = None        # NestedResult from compute_evidence()

        if photfile is not None:
            self.read_data(photfile)
        if covfile is not None:
            if self.phot is None:
                raise ValueError("covfile given without photometry")
            self.phot.read_cov(covfile, covextn=covextn)

    # -- data ingest ------------------------------------------------------------
    def read_data(self, photfile):
        """Load text photometry (ref: mbb_fitter.read_data)."""
        phot = Photometry.from_file(photfile)
        self._check_uplim_mask(phot)
        self.map_result = None     # MAP binds to data; see set_data
        self.phot = phot
        return self

    def set_data(self, wave, flux, unc, cov=None, band_names=None):
        # A MAP fit binds to the data it was run on; new data invalidates
        # it (init="map" and map_importance must not silently reuse the
        # old mode).
        phot = Photometry(wave, flux, unc, cov=cov,
                          band_names=band_names)
        self._check_uplim_mask(phot)
        self.map_result = None
        self.phot = phot
        return self

    def _check_uplim_mask(self, phot):
        """A photometric upper-limit mask binds to a band count; new
        data with a different count must refuse loudly here (leaving the
        old data bound), not fail with an opaque broadcast error deep in
        build_lnprob (the batch surface refuses stale masks the same
        way)."""
        ub = self._spec.uplim_bands
        if ub is not None and ub.size != phot.nbands:
            raise ValueError(
                f"the photometric upper-limit mask was set for {ub.size} "
                f"bands but the new data has {phot.nbands}; call "
                f"set_phot_upperlimits again (or clear it with None) "
                f"before binding this data")

    def read_cov(self, covfile, covextn=0, is_total=False):
        self._require_data().read_cov(covfile, covextn, is_total)
        return self

    def set_phot_upperlimits(self, mask):
        """Flag bands whose flux column is an upper limit (None
        clears the mask)."""
        if mask is None:
            self._spec = _replace(self._spec, uplim_bands=None)
            return self
        mask = np.asarray(mask, bool)
        if mask.size != self._require_data().nbands:
            raise ValueError("upper-limit mask length mismatch")
        self._spec = _replace(self._spec, uplim_bands=mask)
        return self

    def _require_data(self) -> Photometry:
        if self.phot is None:
            raise RuntimeError("no photometry loaded; call read_data/set_data")
        return self.phot

    # -- parameter-space configuration: see paramspace.ParamSpaceMixin
    #    (set_lowlim / set_uplim / fix_param / unfix_param /
    #     set_gaussian_prior / set_param_init / spec / _effective_spec)

    # f_nu of a greybody peaks near x = hc/(lambda k T) ~ 4 over the typical
    # beta range; T ~ HCOK / (4 lambda_peak) seeds the walkers within a
    # factor ~2 of the posterior for any plausible SED.
    _WIEN_X_PEAK = 4.0

    def _auto_init_fnorm(self):
        """Unless the user set them, seed fnorm from the flux of the band
        nearest wavenorm (ref: the reference seeds fnorm from the data
        [MED]) and T from the brightest band's wavelength (Wien-like); a
        data-driven start keeps the initial ball within a few sigma of the
        posterior so short burns converge."""
        if self.phot is None:
            return
        if not self._user_init[4]:
            idx = int(np.argmin(np.abs(self.phot.wave -
                                       self.shape.wavenorm)))
            fn = float(self.phot.flux[idx])
            if fn > 0:
                self._init[4] = fn
                if not self._user_scatter[4]:
                    self._scatter[4] = max(2.0 * float(self.phot.unc[idx]),
                                           0.05 * fn)
        if not self._user_init[0]:
            from mbb_emcee_tpu.constants import HCOK_UM_K
            lam_pk = float(self.phot.wave[int(np.argmax(self.phot.flux))])
            t0 = HCOK_UM_K / (self._WIEN_X_PEAK * lam_pk)
            t0 = float(np.clip(t0, self._spec.lower[0] * 1.02,
                               self._spec.upper[0] * 0.98))
            self._init[0] = t0
            if not self._user_scatter[0]:
                self._scatter[0] = max(0.15 * t0, 1.0)

    # -- likelihood --------------------------------------------------------------
    def _response_pack(self):
        phot = self._require_data()
        if self.responses is None:
            return None
        if phot.band_names is None:
            raise ValueError("response mode requires named photometry bands")
        return self.responses.pack(phot.band_names)

    def _resolve_sampler_backend(self, spec):
        """'auto' -> 'fused' on TPU (the fused kernel covers the full
        single-fit likelihood surface, including upper limits combined
        with a full covariance since round 4), else 'xla'."""
        if self.mesh is not None:
            if self.sampler_backend == "fused":
                raise ValueError(
                    "sampler_backend='fused' is single-chip; drop mesh= "
                    "or use the default backend")
            return "sharded"
        if self.sampler_backend != "auto":
            return self.sampler_backend
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        return "fused" if on_tpu else "xla"

    def build(self):
        """Build (lnprob, free_space, sampler). Called by run(); exposed for
        tests and benchmarking."""
        spec = self._effective_spec()
        backend = self._resolve_sampler_backend(spec)
        self._backend_used = backend
        if backend == "sharded":
            from mbb_emcee_tpu.parallel import ShardedEnsembleSampler
            lnprob, free_space = build_lnprob(
                self._require_data(), self.shape, spec,
                response_pack=self._response_pack(), dtype=self.dtype)
            sampler = ShardedEnsembleSampler(
                self.nwalkers, free_space.nfree, lnprob, self.mesh,
                a=self.a, dtype=self.dtype)
            return lnprob, free_space, sampler
        if backend == "fused":
            from mbb_emcee_tpu.ops.pallas_sampler import FusedPallasSampler
            sampler = FusedPallasSampler(
                self.nwalkers, self._require_data(), self.shape, spec,
                response_pack=self._response_pack(), a=self.a)
            return sampler.lnprob_batch, sampler.free_space, sampler
        if self.lnprob_backend == "pallas":
            from mbb_emcee_tpu.ops.pallas_lnprob import build_pallas_lnprob
            lnprob, free_space = build_pallas_lnprob(
                self._require_data(), self.shape, spec,
                response_pack=self._response_pack())
        else:
            lnprob, free_space = build_lnprob(
                self._require_data(), self.shape, spec,
                response_pack=self._response_pack(), dtype=self.dtype)
        # Cross-instance traced-program sharing (round 5): the run
        # program's closure constants are fully determined by the spec,
        # the data, and the response pack, so fitters with matching
        # content fingerprints reuse one traced program (the repeated
        # pattern in test suites and K-seed parity sweeps).
        from mbb_emcee_tpu.checkpoint import (
            data_fingerprint, spec_fingerprint)
        phot = self._require_data()
        pack = self._response_pack()
        token = (spec_fingerprint(spec, self.shape, self.a),
                 data_fingerprint(phot.wave, phot.flux, phot.unc,
                                  phot.cov),
                 None if pack is None else data_fingerprint(*pack),
                 self.lnprob_backend)
        sampler = EnsembleSampler(self.nwalkers, free_space.nfree, lnprob,
                                  a=self.a, dtype=self.dtype,
                                  program_token=token)
        return lnprob, free_space, sampler

    def __call__(self, params):
        """lnprob at a FULL 5-parameter vector (ref: mbb_fitter.__call__).
        Fixed-parameter values in `params` override the configured ones for
        this evaluation (the box/priors still apply)."""
        params = np.asarray(params, dtype=np.float64)
        if params.shape != (NPARAMS,):
            raise ValueError(f"expected {NPARAMS}-vector")
        spec = self._effective_spec()
        open_spec = _replace(
            spec, fixed=np.zeros(NPARAMS, bool),
            fixed_values=np.zeros(NPARAMS))
        # Cache the built (and jitted) closure on a content token: ported
        # upstream code calls this in per-sample loops, and rebuilding the
        # whole likelihood (covariance Cholesky included) per evaluation
        # is orders of magnitude slower than one cached compile.
        from mbb_emcee_tpu.checkpoint import (
            data_fingerprint, spec_fingerprint)
        phot = self._require_data()
        pack = self._response_pack()
        token = (spec_fingerprint(open_spec, self.shape, self.a),
                 data_fingerprint(phot.wave, phot.flux, phot.unc, phot.cov),
                 None if pack is None else data_fingerprint(*pack),
                 np.dtype(self.dtype).str)
        cache = getattr(self, "_call_cache", None)
        if cache is None or cache[0] != token:
            lnprob, _ = build_lnprob(phot, self.shape, open_spec,
                                     response_pack=pack, dtype=self.dtype)
            cache = (token, jax.jit(lnprob))
            self._call_cache = cache
        return float(cache[1](jnp.asarray(params, self.dtype)))

    # -- the run -------------------------------------------------------------------
    def run(self, nburn=50, nsteps=250, thin=1, p0=None,
            recenter_burn=True, verbose=False,
            checkpoint=None, checkpoint_interval=100, resume=False,
            init="auto"):
        """Burn-in -> re-center on best burn-in sample -> re-burn -> reset ->
        production (ref: mbb_fitter.run protocol, SURVEY.md section 3.1).

        With `checkpoint=path`, the production run is segmented and the chain
        plus full sampler state are flushed to HDF5 every
        `checkpoint_interval` recorded steps; `resume=True` continues an
        interrupted run from that file (the reference has no mid-sampling
        checkpointing -- SURVEY.md section 5).

        init="map" seeds the walker ball at the fit_map() mode with
        ~2 Laplace-sigma scatter (the triage-then-refine workflow, same
        semantics as MultiFitter.run(init="map")); requires fit_map()
        on this data first.

        Stores the production chain device-resident; wrap in MBBResults for
        analysis/persistence. Returns self.
        """
        import os

        if init not in ("auto", "map"):
            raise ValueError(f"init must be 'auto' or 'map'; got {init!r}")
        if init == "map":
            if p0 is not None:
                raise ValueError("init='map' conflicts with an explicit p0")
            if self.n_ensembles == 1:
                self._require_map_fresh("run(init='map')")
        self._mf = None       # a fresh run() invalidates any merged state
        if self.n_ensembles > 1:
            if p0 is not None:
                raise ValueError(
                    "n_ensembles > 1 does not combine with an explicit p0")
            if init == "map":
                raise ValueError(
                    "init='map' does not combine with n_ensembles > 1; "
                    "use MultiFitter.run(init='map') for batched "
                    "triage-then-refine")
            return self._run_ensembles(
                nburn, nsteps, thin, recenter_burn, verbose,
                checkpoint=checkpoint,
                checkpoint_interval=checkpoint_interval, resume=resume)

        self._auto_init_fnorm()
        lnprob, free_space, sampler = self.build()
        self.free_space = free_space
        if int(thin) < 1:
            raise ValueError(f"thin={thin} must be >= 1")
        self.thin = int(thin)
        if int(nsteps) % int(thin):
            # Validate up front so the checkpointed path can't silently
            # truncate a run the plain path would reject.
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if resume and not checkpoint:
            raise ValueError(
                "resume=True requires checkpoint= (the path the previous "
                "run flushed state to)")

        resuming = bool(checkpoint and resume and os.path.exists(checkpoint))
        if resuming and p0 is not None:
            raise ValueError(
                "p0= combined with an actual resume is ambiguous: the "
                "checkpointed state would silently win; drop p0 (or the "
                "checkpoint file) to make the intent explicit")
        if resuming and init == "map":
            raise ValueError(
                "init='map' combined with an actual resume is ambiguous: "
                "the checkpointed state would silently win; drop init= "
                "(or the checkpoint file) to make the intent explicit")
        phot = self._require_data()
        data_fp = spec_fp = None
        if checkpoint is not None:
            from mbb_emcee_tpu.checkpoint import (
                data_fingerprint, spec_fingerprint)
            # The response pack is posterior identity too: resuming
            # after swapping filter curves would splice chains sampled
            # under different band-integration weights.
            pack = self._response_pack()
            data_fp = data_fingerprint(phot.wave, phot.flux, phot.unc,
                                       phot.cov,
                                       *(() if pack is None else pack))
            spec_fp = spec_fingerprint(self._spec, self.shape, self.a)

        resume_run_id = None
        if resuming:
            from mbb_emcee_tpu.checkpoint import (
                load_checkpoint, check_resume_meta)
            state, prev_chain, prev_lnp, meta = load_checkpoint(checkpoint)
            resume_run_id = meta.get("run_id")
            if isinstance(resume_run_id, bytes):
                resume_run_id = resume_run_id.decode()
            if int(meta.get("nwalkers", self.nwalkers)) != self.nwalkers \
                    or int(meta.get("thin", thin)) != thin:
                raise ValueError(
                    "checkpoint geometry does not match this fitter")
            check_resume_meta(
                meta,
                {"sampler_backend": self._backend_used,
                 "lnprob_backend": self.lnprob_backend,
                 "prng_impl": self.prng_impl,
                 "data_fingerprint": data_fp,
                 # Priors/limits/fixed params and the stretch a are part
                 # of the posterior; resuming under a changed spec would
                 # splice chains from two different targets.
                 "spec_fingerprint": spec_fp},
                checkpoint)
            if self._backend_used == "sharded":
                # Host-loaded arrays are unsharded; re-applying the
                # init layout avoids an extra trace+compile of the
                # sharded run program (explicit-sharding avals).
                state = sampler.shard_state(state)
            self.burn_chain_free = None
        else:
            key = jax.random.key(self.seed, impl=self.prng_impl)
            key, kball = jax.random.split(key)
            if p0 is None:
                if init == "map":
                    # seed at the MAP mode with ~2 Laplace-sigma scatter;
                    # huge floored-Laplace sigmas (degenerate modes) would
                    # throw walkers across the whole box -- cap at 10x the
                    # default scatter (same rule as MultiFitter)
                    r = self.map_result
                    if r.x.size != free_space.nfree:
                        raise RuntimeError(
                            "the parameter space changed since fit_map() "
                            "(fixed/freed parameters); re-run fit_map "
                            "before init='map'")
                    center = np.asarray(r.x, np.float64)
                    base = self._scatter[free_space.free_idx]
                    scatter = np.minimum(
                        np.clip(2.0 * r.sigma, 1e-6, None), base * 10.0)
                else:
                    center = self._init[free_space.free_idx]
                    scatter = self._scatter[free_space.free_idx]
                p0 = make_initial_ball(kball, center, scatter, self.nwalkers,
                                       free_space.lower, free_space.upper,
                                       dtype=self.dtype)
            else:
                p0 = jnp.asarray(p0, self.dtype)
                if p0.shape[-1] == NPARAMS:
                    p0 = p0[..., free_space.free_idx]

            state = sampler.init_state(key, p0)

            if nburn > 0:
                state, bchain, blnp = sampler.run_mcmc(state, nburn)
                self.burn_chain_free = bchain
                if recenter_burn:
                    # Re-center the whole ensemble on the best burn-in
                    # sample with a tight ball, then burn again from there.
                    # Host-side argmax: the chain may be sharded over a
                    # mesh (walker axis), where a device-side flatten is
                    # not partitionable -- and the array is tiny.
                    flat = np.asarray(bchain).reshape(-1, free_space.nfree)
                    best = jnp.asarray(
                        flat[np.argmax(np.asarray(blnp).reshape(-1))],
                        self.dtype)
                    key2, kball2 = jax.random.split(state.key)
                    tight = self._scatter[free_space.free_idx] * 0.1
                    p0b = make_initial_ball(kball2, best, tight,
                                            self.nwalkers,
                                            free_space.lower,
                                            free_space.upper,
                                            dtype=self.dtype)
                    state = sampler.init_state(key2, p0b)
                    state = sampler.advance(state, nburn)
                state = sampler.reset_counters(state)

        if checkpoint is None:
            state, chain, lnpchain = sampler.run_mcmc(state, nsteps, thin)
        else:
            from mbb_emcee_tpu.checkpoint import (
                save_checkpoint, new_run_id)
            chain_blocks, lnp_blocks = [], []
            done = 0
            if resuming and prev_chain is not None:
                chain_blocks.append(prev_chain)
                lnp_blocks.append(prev_lnp)
                done = prev_chain.shape[0] * thin
            # Engine identity rides the checkpoint so a resume under a
            # different backend/PRNG is refused instead of silently
            # splicing chains from different streams (the determinism
            # contract documented on extend()).
            meta = {"nwalkers": self.nwalkers, "thin": thin,
                    "nsteps_target": nsteps,
                    "sampler_backend": self._backend_used,
                    "lnprob_backend": self.lnprob_backend,
                    "seed": self.seed,
                    "data_fingerprint": data_fp,
                    "spec_fingerprint": spec_fp,
                    # Ties this run's segment flushes together so a later
                    # unrelated run at the same path never adopts them.
                    "run_id": resume_run_id or new_run_id()}
            seg = max(int(checkpoint_interval), 1) * thin
            while done < nsteps:
                n = min(seg, nsteps - done)
                n -= n % thin
                if n == 0:
                    break
                state, c, l = sampler.run_mcmc(state, n, thin)
                chain_blocks.append(np.asarray(c))
                lnp_blocks.append(np.asarray(l))
                done += n
                save_checkpoint(checkpoint, state, chain_blocks, lnp_blocks,
                                meta, self.prng_impl)
                if verbose:
                    from mbb_emcee_tpu.utils.log import enable_console
                    enable_console().info(
                        f"  checkpoint: {done}/{nsteps} steps -> "
                        f"{checkpoint}")
            chain = jnp.asarray(np.concatenate(chain_blocks, axis=0))
            lnpchain = jnp.asarray(np.concatenate(lnp_blocks, axis=0))

        self.chain_free = chain
        self.lnprobability = lnpchain
        self.final_state = state
        self.acceptance_fraction = np.asarray(
            sampler.acceptance_fraction(state))
        self.sampler = sampler

        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            log = enable_console()
            af = self.acceptance_fraction
            log.info(f"Mean acceptance fraction: {af.mean():.3f} "
                     f"(min {af.min():.3f}, max {af.max():.3f})")
            tau = self.autocorrelation_time()
            names = [PARAM_NAMES[i] for i in free_space.free_idx]
            for n, t in zip(names, tau):
                log.info(f"  autocorrelation time [{n}]: {t:.1f} steps")
            if np.asarray(self.chain_free).shape[0] >= 4:
                rhat = self.gelman_rubin()
                flagged = [f"{n}={r:.3f}" for n, r in zip(names, rhat)]
                log.info("  split-R-hat: " + ", ".join(flagged))
            # emcee's own convergence rule of thumb: the chain should be
            # >= ~50 autocorrelation times long. (Split-R-hat on a SHORT
            # ensemble run is conservative by construction -- each
            # walker's half-series spans only a few tau -- so it reports,
            # but the warning keys off the tau criterion.)
            nrec = int(np.asarray(self.chain_free).shape[0])
            if nrec < 50 * float(np.max(tau)):
                log.info(
                    f"  note: chain length {nrec} < 50x the largest "
                    f"autocorrelation time ({np.max(tau):.0f}); consider "
                    f"a longer production run (the optically-thick model "
                    f"supports a T/lambda0 bimodality that needs long "
                    f"chains to mix)")
        return self

    def run_hmc(self, nwarmup=500, nsteps=1000, nchains=None, thin=1,
                n_leapfrog=16, target_accept=0.8, p0=None, verbose=False):
        """Gradient-based alternative to run(): Hamiltonian MC over the
        same posterior (hmc.py). ADDITIVE -- not in the reference, whose
        NumPy model is not differentiable; here `jax.grad` of the fused
        lnprob gives the forces for free. Useful for the curved,
        correlated T-lambda0 posteriors of optically-thick fits, where
        HMC needs far fewer steps per effective sample than the stretch
        move.

        Runs `nchains` (default nwalkers) independent chains as one
        vmapped device program: dual-averaged step size + diagonal mass
        warmup (`nwarmup` steps, discarded), then `nsteps` production
        steps recorded every `thin`. Downstream analysis is unchanged --
        MBBResults(fit=...), gelman_rubin, writeToHDF5 all see the usual
        (nrec, nchains, nfree) chain. extend() does not apply (re-run
        with more nsteps); uses the portable XLA likelihood (the Pallas
        lnprob kernel is not differentiable)."""
        from mbb_emcee_tpu.hmc import hmc_sample

        if self.n_ensembles > 1:
            raise ValueError(
                "n_ensembles > 1 applies to the stretch-move run() only; "
                "run_hmc samples one set of chains -- use nchains= for "
                "more HMC chains")
        nchains = self.nwalkers if nchains is None else int(nchains)
        self._auto_init_fnorm()
        spec = self._effective_spec()
        lnprob, free_space = build_lnprob(
            self._require_data(), self.shape, spec,
            response_pack=self._response_pack(), dtype=self.dtype)
        self.free_space = free_space
        self.thin = int(thin)

        key = jax.random.key(self.seed, impl=self.prng_impl)
        key, kball = jax.random.split(key)
        if p0 is None:
            center = self._init[free_space.free_idx]
            scatter = self._scatter[free_space.free_idx]
            p0 = make_initial_ball(kball, center, scatter, nchains,
                                   free_space.lower, free_space.upper,
                                   dtype=self.dtype)
        else:
            p0 = jnp.asarray(p0, self.dtype)
            if p0.shape[-1] == NPARAMS:
                p0 = p0[..., free_space.free_idx]

        res = hmc_sample(lnprob, free_space.lower, free_space.upper, p0,
                         key, nwarmup=nwarmup, nsteps=nsteps, thin=thin,
                         n_leapfrog=n_leapfrog, target_accept=target_accept,
                         dtype=self.dtype)
        self.chain_free = res.chain
        self.lnprobability = res.lnprob
        self.acceptance_fraction = res.acceptance_fraction
        self.burn_chain_free = None
        self.sampler = None          # extend() needs a stretch-move state
        self.final_state = None
        self._mf = None
        self._backend_used = "hmc"
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            log = enable_console()
            af = self.acceptance_fraction
            log.info(f"HMC: mean acceptance {af.mean():.3f}, step size "
                     f"{res.step_size:.4g}, {nchains} chains x "
                     f"{nsteps} steps")
            tau = self.autocorrelation_time()
            names = [PARAM_NAMES[i] for i in free_space.free_idx]
            for n, t in zip(names, tau):
                log.info(f"  autocorrelation time [{n}]: {t:.1f} steps")
        return self

    def run_pt(self, nrungs=12, beta_min="auto", nburn=300, nsteps=1000,
               nchains=None, thin=1, p0=None, verbose=False):
        """Parallel-tempering alternative to run(): K temperature rungs
        of the same posterior advance as one (K, W)-batched device
        program with replica exchange between adjacent rungs
        (tempering.py). ADDITIVE -- the reference's single-temperature
        emcee ensemble is exactly what traps on the REAL T-lambda0
        bimodality of optically-thick fits (DESIGN.md): here hot rungs
        cross between modes freely and hand mixed states down the
        ladder. The production run also yields the Bayesian evidence
        two ways: self.logz_pt = (lnZ, err) from the robust
        stepping-stone estimator (headline -- safe on wide prior
        boxes), and self.logz_ti from thermodynamic integration (a
        diagnostic that degrades on wide priors; see tempering.py).
        Both share compute_evidence's prior convention, so all three
        cross-check.

        The recorded chain is the COLD (beta=1) rung -- downstream
        analysis (MBBResults, gelman_rubin, writeToHDF5) is unchanged.
        extend() does not apply; re-run with more nsteps."""
        from mbb_emcee_tpu.tempering import pt_sample

        if self.n_ensembles > 1:
            raise ValueError(
                "n_ensembles > 1 applies to the stretch-move run() only; "
                "run_pt already advances K temperature rungs -- use "
                "nchains= for more walkers per rung")
        nchains = self.nwalkers if nchains is None else int(nchains)
        self._auto_init_fnorm()
        spec = self._effective_spec()
        lnprob, free_space = build_lnprob(
            self._require_data(), self.shape, spec,
            response_pack=self._response_pack(), dtype=self.dtype)
        self.free_space = free_space
        self.thin = int(thin)

        key = jax.random.key(self.seed, impl=self.prng_impl)
        key, kball = jax.random.split(key)
        if p0 is None:
            center = self._init[free_space.free_idx]
            scatter = self._scatter[free_space.free_idx]
            p0 = make_initial_ball(kball, center, scatter, nchains,
                                   free_space.lower, free_space.upper,
                                   dtype=self.dtype)
        else:
            p0 = jnp.asarray(p0, self.dtype)
            if p0.shape[-1] == NPARAMS:
                p0 = p0[..., free_space.free_idx]

        res = pt_sample(lnprob, p0, key, nrungs=nrungs, beta_min=beta_min,
                        nburn=nburn, nsteps=nsteps, thin=thin,
                        a=self.a, dtype=self.dtype)
        self.chain_free = jnp.asarray(res.chain)
        self.lnprobability = jnp.asarray(res.lnprob)
        self.acceptance_fraction = res.acceptance_fraction[0]  # cold rung
        self.logz_pt = (res.logz, res.logz_err)
        self.logz_ti = (res.logz_ti, res.logz_ti_err)
        self.pt_result = res
        self.burn_chain_free = None
        self.sampler = None
        self.final_state = None
        self._mf = None
        self._backend_used = "pt"
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            log = enable_console()
            log.info(f"PT: {res.betas.size} rungs x {nchains} walkers, cold "
                     f"acceptance {res.acceptance_fraction[0].mean():.3f}, "
                     f"swap fractions "
                     f"{np.array2string(res.swap_fraction, precision=2)}")
            log.info(f"  stepping-stone lnZ = {res.logz:.3f} "
                     f"+/- {res.logz_err:.3f}")
        return self

    def _require_map_fresh(self, what):
        """Refuse to consume stored MAP results after the posterior or
        the data changed underneath them (mirrors
        MultiFitter._require_map_fresh). A size-only check is not
        enough: the same nfree does NOT mean the same free parameters,
        and a prior/limit/uplim-mask edit moves the posterior while
        leaving the stored mode/Laplace sigmas in place -- a
        Laplace-scaled walker ball seeded at the OLD mode with the short
        burns this workflow advertises would bias the chain silently."""
        r = getattr(self, "map_result", None)
        if r is None:
            raise RuntimeError(f"{what} requires fit_map() on this data "
                               f"first")
        from mbb_emcee_tpu.checkpoint import (
            data_fingerprint, spec_fingerprint)
        spec = self._effective_spec()
        phot = self._require_data()
        pack = self._response_pack()
        token = (
            spec_fingerprint(spec, self.shape, self.a),
            data_fingerprint(phot.wave, phot.flux, phot.unc, phot.cov),
            None if pack is None else data_fingerprint(*pack))
        if getattr(self, "_map_token", None) != token:
            raise RuntimeError(
                f"{what}: the stored MAP fit is for a different "
                f"posterior -- the parameter space (priors / limits / "
                f"fixed / uplim mask), data, or responses changed since "
                f"fit_map(); re-run fit_map() first")

    def fit_map(self, nstarts=8, n_adam=150, n_newton=12, adam_lr=0.1,
                verbose=False):
        """MAP point + Laplace error bars in one device program
        (mapfit.py): `nstarts` multi-starts through a fixed-iteration
        Adam-then-damped-Newton optimizer, then the inverse Hessian at
        the mode. Seconds instead of an MCMC run -- the triage/starting
        point workflow the reference never had. Works with every
        likelihood configuration build_lnprob supports (full covariance
        included). Returns a MAPResult (free-parameter space; also
        stored as self.map_result); when `interior` is False the mode
        sits within ~2 Laplace sigmas of a box bound and the Gaussian
        error bars should not be trusted -- run the MCMC."""
        from mbb_emcee_tpu.mapfit import (
            MAPResult, map_core, neg_hessian, laplace_cov_host,
            interior_mask, _to_unconstrained)

        self._auto_init_fnorm()
        spec = self._effective_spec()
        lnprob, free_space = build_lnprob(
            self._require_data(), self.shape, spec,
            response_pack=self._response_pack(), dtype=self.dtype)
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError(
                "MAP fitting requires finite box bounds on every free "
                "parameter (the defaults are finite)")
        lower = np.asarray(free_space.lower, np.float32)
        width = np.asarray(free_space.upper - free_space.lower, np.float32)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        x0 = make_initial_ball(key, self._init[free_space.free_idx],
                               self._scatter[free_space.free_idx],
                               int(nstarts), free_space.lower,
                               free_space.upper)

        def compute(x0):
            u0 = _to_unconstrained(jnp.asarray(x0, jnp.float32),
                                   lower, width)
            u_map, lnp_map = map_core(lnprob, lower, width, u0,
                                      int(n_adam), int(n_newton),
                                      float(adam_lr))
            x_map = lower + width * jax.nn.sigmoid(u_map)
            H = neg_hessian(lnprob, x_map)
            g = jax.grad(lnprob)(x_map)
            return x_map, lnp_map, H, jnp.sqrt(jnp.sum(g * g))

        # One compiled program per (posterior, data, geometry): repeated
        # triage (set_data in a loop) must not pay a compile per call.
        # The content token mirrors __call__'s caching; the likelihood
        # closure bakes the data in, so data belongs in the token.
        from mbb_emcee_tpu.checkpoint import (
            data_fingerprint, spec_fingerprint)
        phot = self._require_data()
        pack = self._response_pack()
        post_token = (
            spec_fingerprint(spec, self.shape, self.a),
            data_fingerprint(phot.wave, phot.flux, phot.unc, phot.cov),
            None if pack is None else data_fingerprint(*pack))
        token = ("map", int(nstarts), int(n_adam), int(n_newton),
                 float(adam_lr)) + post_token
        cache = getattr(self, "_map_cache", None)
        if cache is None or cache[0] != token:
            cache = (token, jax.jit(compute))
            self._map_cache = cache
        x_map, lnp_map, H, gn = cache[1](x0)
        x_np = np.asarray(x_map, np.float64)
        cov_np, h_ok = laplace_cov_host(np.asarray(H, np.float64))
        sigma = np.sqrt(np.maximum(np.diag(cov_np), 0.0))
        interior = bool(h_ok) and bool(np.asarray(interior_mask(
            x_np, sigma, np.asarray(free_space.lower, np.float64),
            np.asarray(free_space.upper, np.float64))))
        self.map_result = MAPResult(
            x=x_np, lnprob=float(lnp_map), cov=cov_np, sigma=sigma,
            interior=interior, grad_norm=float(gn))
        self._map_token = post_token
        self.free_space = free_space
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            names = [PARAM_NAMES[i] for i in free_space.free_idx]
            parts = [f"{n}={v:.4g}+/-{s:.3g}"
                     for n, v, s in zip(names, x_np, sigma)]
            enable_console().info(
                f"MAP fit ({nstarts} starts): " + ", ".join(parts)
                + f"; lnprob={float(lnp_map):.2f}"
                + ("" if interior else
                   " [mode near a box bound -- Laplace suspect]"))
        return self.map_result

    def map_importance(self, nsamples=2048, seed=None):
        """Laplace importance sampling after fit_map(): weighted
        true-posterior summaries without MCMC (the single-fit analog of
        MultiFitter.map_importance; works with the full-covariance
        likelihood too). Returns (samples (N, nfree), logw (N,), ess);
        also stored as self.map_is = (samples, logw, ess). ess/nsamples
        near 1 certifies the Gaussian approximation; small ess (or an
        earlier interior=False flag) says run the MCMC."""
        self._require_map_fresh("map_importance")
        r = self.map_result
        spec = self._effective_spec()
        lnprob, free_space = build_lnprob(
            self._require_data(), self.shape, spec,
            response_pack=self._response_pack(), dtype=self.dtype)
        d = free_space.nfree
        N = int(nsamples)
        L = np.linalg.cholesky(r.cov)
        logdet = float(np.sum(np.log(np.diag(L))))
        key = jax.random.key(self.seed if seed is None else int(seed))
        eps = np.asarray(jax.random.normal(key, (N, d), jnp.float32),
                         np.float64)
        x = r.x[None, :] + eps @ L.T
        lnp = np.asarray(jax.jit(jax.vmap(lnprob))(
            jnp.asarray(x, self.dtype)), np.float64)
        lnq = (-0.5 * np.sum(eps ** 2, axis=1) - logdet
               - 0.5 * d * np.log(2.0 * np.pi))
        from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR
        logw = np.where(lnp > SUPPORT_FLOOR, lnp - lnq, -np.inf)
        mx = logw.max()
        if not np.isfinite(mx):
            self.map_is = (x, logw, 0.0)
            return self.map_is
        logw = logw - mx
        w = np.exp(logw)
        ess = float(w.sum() ** 2 / np.maximum((w * w).sum(), 1e-300))
        self.map_is = (x, logw, ess)
        return self.map_is

    def map_par_cen(self, param, percentile=68.3):
        """(median, +err, -err) from the importance-refined Laplace
        posterior (map_importance first). Fixed parameters report zero
        errors; an ess = 0 result reports the MAP point with NaN
        errors."""
        if getattr(self, "map_is", None) is None:
            raise RuntimeError("map_importance() has not been called")
        from mbb_emcee_tpu.likelihood import param_index
        i = param_index(param)
        r = self.map_result
        free_idx = list(self.free_space.free_idx)
        if i not in free_idx:
            # the value the RUN held fixed (free_space.template), not
            # the current spec's -- fix_param after the fit must not
            # re-label the stored result
            v = float(self.free_space.template[i])
            return np.array([v, 0.0, 0.0])
        x, logw, ess = self.map_is
        col = x[:, free_idx.index(i)]
        w = np.exp(logw)
        if w.sum() <= 0.0:
            return np.array([r.x[free_idx.index(i)], np.nan, np.nan])
        order = np.argsort(col)
        cw = np.cumsum(w[order])
        cw /= cw[-1]
        p = float(percentile)
        qs = np.array([50.0 - p / 2, 50.0, 50.0 + p / 2]) / 100.0
        lo, mid, hi = np.interp(qs, cw, col[order])
        return np.array([mid, hi - mid, mid - lo])

    def compute_evidence(self, nlive=512, nbatch=32, nsteps=32,
                         max_iter=3000, tol=1e-4, seed=None, verbose=False):
        """Bayesian evidence ln Z of THIS model configuration via nested
        sampling (nested.py). ADDITIVE -- the reference offers no way to
        compare the model variants it fits (opthin vs thick, noalpha);
        the Bayes factor exp(lnZ_A - lnZ_B) between two fitters with the
        same data and prior settings does that quantitatively:

            thick = MBBFitter(photfile=...);            zt = thick.compute_evidence()
            thin  = MBBFitter(photfile=..., opthin=True); zo = thin.compute_evidence()
            ln_bayes_thick_over_thin = zt.logz - zo.logz

        The evidence is taken w.r.t. the normalized uniform prior over
        the free-parameter box (set_uplim/set_lowlim), times any
        configured Gaussian prior factors exactly as the likelihood
        applies them (unnormalized, as in the reference) -- so Bayes
        factors are meaningful between fitters sharing prior settings on
        common parameters. Narrow the box to your genuine prior: a huge
        box both slows the run and (correctly) dilutes the evidence.

        Runs entirely as one jitted device program; returns a
        NestedResult (logz, logz_err, weighted posterior samples in
        FULL 5-parameter space via .samples/.posterior_weights())."""
        from mbb_emcee_tpu.nested import nested_sample

        self._auto_init_fnorm()
        spec = self._effective_spec()
        lnprob, free_space = build_lnprob(
            self._require_data(), self.shape, spec,
            response_pack=self._response_pack(), dtype=self.dtype)
        key = jax.random.key(self.seed if seed is None else int(seed))
        # Same content-token recipe as build(): K evidence calls across
        # model variants / seeds trace the nested while_loop once per
        # distinct (spec, data, response) configuration.
        from mbb_emcee_tpu.checkpoint import (
            data_fingerprint, spec_fingerprint)
        phot = self._require_data()
        pack = self._response_pack()
        token = ("evidence", spec_fingerprint(spec, self.shape, self.a),
                 data_fingerprint(phot.wave, phot.flux, phot.unc,
                                  phot.cov),
                 None if pack is None else data_fingerprint(*pack),
                 self.lnprob_backend)
        res = nested_sample(lnprob, free_space.lower, free_space.upper,
                            key, nlive=nlive, nbatch=nbatch, nsteps=nsteps,
                            max_iter=max_iter, tol=tol, dtype=self.dtype,
                            program_token=token)
        # Report samples in the full 5-parameter space like chain does.
        res = _dataclasses.replace(res, samples=free_space.expand(res.samples))
        self.evidence = res
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"nested sampling: lnZ = {res.logz:.3f} +/- "
                f"{res.logz_err:.3f} (H = {res.h:.2f} nats, "
                f"{res.n_iter} iterations, {res.n_like} likelihood evals)")
        return res

    def compute_loo_exact(self, bands=None, nburn=100, nsteps=400,
                          thin=1, seed=None, verbose=False):
        """EXACT leave-one-band-out elpd by refitting without each band.

        The escalation path when PSIS-LOO's k-hat diagnostic
        (MBBResults.compute_loo) flags a band as unreliable: instead of
        importance-reweighting one posterior, actually refit the
        posterior with band i removed and average p(y_i | theta) over
        that chain -- the estimand PSIS approximates, computed directly.

        TPU-shaped brute force: ALL K leave-one-out refits advance as
        ONE batched device program -- a MultiFitter whose K "sources"
        are K copies of this photometry, copy i with band i flagged
        missing (the ragged-catalog NaN encoding; multifit.py), sharing
        this fitter's box/priors/fixed params/initialization and
        response curves. The reference-equivalent workflow would be K
        sequential emcee runs.

        bands: band names or indices to assess (default: every
        detected, non-upper-limit band). Diagonal errors only (the
        batched tier has no covariance mode; a covariance fit should
        rely on compute_loo's exact conditional factors instead).

        Returns a modelcheck.ExactLooResult.
        """
        from mbb_emcee_tpu.multifit import MultiFitter
        from mbb_emcee_tpu.modelcheck import (
            ExactLooResult, gaussian_pointwise_constants)
        from mbb_emcee_tpu import derived

        phot = self._require_data()
        if phot.cov is not None:
            raise ValueError(
                "compute_loo_exact supports diagonal errors only (the "
                "batched refit tier has no covariance mode); use "
                "MBBResults.compute_loo -- its pointwise factors are "
                "already the exact conditional predictive densities "
                "under the covariance")
        nb = phot.nbands
        spec = self._spec
        uplim = (np.zeros(nb, bool) if spec.uplim_bands is None
                 else np.asarray(spec.uplim_bands, bool))

        def _band_idx(b):
            if isinstance(b, (int, np.integer)):
                i = int(b)
                if not 0 <= i < nb:
                    raise ValueError(f"band index {i} out of range")
                return i
            if phot.band_names is None:
                raise ValueError(
                    f"band {b!r} given by name but the photometry has "
                    f"no band names")
            return list(phot.band_names).index(b)

        if bands is None:
            idx = [i for i in range(nb) if not uplim[i]]
        else:
            idx = [_band_idx(b) for b in bands]
            bad = [i for i in idx if uplim[i]]
            if bad:
                raise ValueError(
                    f"bands {bad} are photometric upper limits; a "
                    f"censored band has no pointwise density to assess")
        idx = np.asarray(idx, np.int64)
        K = idx.size
        if K == 0:
            raise ValueError("no bands to assess")

        # K ragged copies: copy j misses band idx[j].
        flux_b = np.tile(phot.flux, (K, 1))
        unc_b = np.tile(phot.unc, (K, 1))
        flux_b[np.arange(K), idx] = np.nan
        unc_b[np.arange(K), idx] = np.nan

        mf = MultiFitter(nwalkers=self.nwalkers,
                         wavenorm=self.shape.wavenorm,
                         noalpha=self.shape.noalpha,
                         opthin=self.shape.opthin,
                         responses=self.responses,
                         a=self.a, prng_impl=self.prng_impl,
                         sampler_backend=self.sampler_backend,
                         seed=self.seed if seed is None else int(seed))
        mf._spec = _dataclasses.replace(spec)
        mf._init = self._init.copy()
        mf._scatter = self._scatter.copy()
        mf._user_init = self._user_init.copy()
        mf._user_scatter = self._user_scatter.copy()
        mf.set_data(phot.wave, flux_b, unc_b, band_names=phot.band_names)
        mf.run(nburn=int(nburn), nsteps=int(nsteps), verbose=verbose)

        # ln p(y_i | theta) over each refit's own chain, one batched
        # program: one-hot pick of the held-out band's pointwise term.
        isig32, _, _, lnnorm32 = gaussian_pointwise_constants(
            unc_det=phot.unc)
        y32 = np.asarray(phot.flux, np.float32)
        sel = np.zeros((K, nb), np.float32)
        sel[np.arange(K), idx] = 1.0
        pack = self._response_pack()
        fluxes = derived.band_flux_eval(self.shape, phot.wave, pack)

        def one(theta, sel_s):
            r = (fluxes(theta) - y32) * isig32
            return jnp.sum(sel_s * (lnnorm32 - 0.5 * r * r))

        samples = mf._thinned(thin)                     # (K, N, 5)
        n = int(samples.shape[1])
        lnp = np.asarray(jax.jit(jax.vmap(
            jax.vmap(one, in_axes=(0, None)), in_axes=(0, 0)))(
                samples, jnp.asarray(sel)), np.float64)  # (K, N)

        m = lnp.max(axis=1, keepdims=True)
        p = np.exp(lnp - m)
        mean_p = p.mean(axis=1)
        elpd = np.log(mean_p) + m[:, 0]
        se_mc = p.std(axis=1, ddof=1) / (np.sqrt(n) * mean_p)
        names = (None if phot.band_names is None
                 else [phot.band_names[i] for i in idx])
        return ExactLooResult(pointwise_loo=elpd, se_mc=se_mc,
                              point_index=idx, nsamples=n,
                              band_names=names)

    def _run_ensembles(self, nburn, nsteps, thin, recenter_burn, verbose,
                       checkpoint=None, checkpoint_interval=100,
                       resume=False):
        """K independent ensembles via MultiFitter with replicated data;
        merge the (K, nrec, nw, nfree) chains into one
        (nrec, K*nw, nfree) product so every downstream consumer
        (MBBResults, gelman_rubin, writeToHDF5) sees a single wider
        ensemble."""
        from mbb_emcee_tpu.multifit import MultiFitter

        phot = self._require_data()
        if phot.cov is not None:
            raise ValueError(
                "n_ensembles > 1 uses the batched likelihood (diagonal "
                "uncertainties only); drop the covariance or use "
                "n_ensembles=1")
        if self.mesh is not None:
            # the walker-sharding mesh does NOT transfer: MultiFitter
            # would reinterpret it as a source mesh over the K ensembles
            # (losing walker sharding, and K % ndev != 0 fails with a
            # confusing nsources error)
            raise ValueError(
                "mesh= cannot combine with n_ensembles > 1: the mesh "
                "shards the walker axis of a single fit, while "
                "n_ensembles runs through the batched multi-source path; "
                "drop mesh= (the fused multi kernel is single-chip) or "
                "use MultiFitter directly for source-axis sharding")
        import jax.numpy as _jnp
        if self.dtype != _jnp.float32 or self.lnprob_backend != "xla":
            from mbb_emcee_tpu.utils.log import logger as _log
            _log.warning(
                "n_ensembles > 1 runs the float32 batched likelihood; "
                "dtype=%s / lnprob_backend=%r are ignored on this path",
                self.dtype, self.lnprob_backend)
        K = self.n_ensembles
        mf = MultiFitter(nwalkers=self.nwalkers,
                         wavenorm=self.shape.wavenorm,
                         noalpha=self.shape.noalpha,
                         opthin=self.shape.opthin,
                         responses=self.responses, seed=self.seed,
                         a=self.a, prng_impl=self.prng_impl,
                         mesh=self.mesh,
                         sampler_backend=self.sampler_backend)
        mf._spec = self._spec
        mf._init = self._init.copy()
        mf._scatter = self._scatter.copy()
        mf._user_init = self._user_init.copy()
        mf._user_scatter = self._user_scatter.copy()
        flux = np.broadcast_to(phot.flux, (K, phot.nbands))
        unc = np.broadcast_to(phot.unc, (K, phot.nbands))
        mf.set_data(phot.wave, flux, unc, band_names=phot.band_names)
        mf.run(nburn=nburn, nsteps=nsteps, thin=thin,
               recenter_burn=recenter_burn, verbose=verbose,
               checkpoint=checkpoint,
               checkpoint_interval=checkpoint_interval, resume=resume)

        self._merge_ensembles(mf)
        self._mf = mf
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            log = enable_console()
            af = self.acceptance_fraction
            log.info(
                f"Merged {K} independent ensembles "
                f"({self.nwalkers} walkers each); mean acceptance "
                f"{af.mean():.3f}")
            if np.asarray(self.chain_free).shape[0] >= 4:
                names = [PARAM_NAMES[i]
                         for i in self.free_space.free_idx]
                rhat = self.gelman_rubin()
                log.info("  cross-ensemble split-R-hat: " + ", ".join(
                    f"{n}={r:.3f}" for n, r in zip(names, rhat)))
        return self

    def _merge_ensembles(self, mf):
        ch = np.asarray(mf.chain_free)          # (K, nrec, nw, nfree)
        K, nrec, nw, nfree = ch.shape
        self.free_space = mf.free_space
        self.thin = mf.thin
        self.chain_free = jnp.asarray(
            np.transpose(ch, (1, 0, 2, 3)).reshape(nrec, K * nw, nfree))
        lnp = np.asarray(mf.lnprobability)      # (K, nrec, nw)
        self.lnprobability = jnp.asarray(
            np.transpose(lnp, (1, 0, 2)).reshape(nrec, K * nw))
        self.acceptance_fraction = np.asarray(
            mf.acceptance_fraction).reshape(-1)
        self.nwalkers_total = K * nw

    def extend(self, nsteps, verbose=False):
        """Continue the production run for `nsteps` more updates from the
        stored final state (no re-burn), appending to the chain -- the
        run-until-converged loop:

            fit.run(nburn=100, nsteps=500)
            while (fit.gelman_rubin() > 1.05).any():
                fit.extend(500)

        Deterministic in the sense that repeating the SAME call sequence
        (seeds included) reproduces the chain bitwise. It is NOT sample-
        for-sample identical to a single longer run(): each launch
        derives a fresh PRNG stream from the state key, so run(n1) +
        extend(n2) and run(n1+n2) are two equally valid realizations of
        the same posterior.

        With n_ensembles > 1 this delegates to MultiFitter.extend (works
        on both stretch-move backends: the fused kernel continues from
        its retained device state; the XLA path restarts from the final
        key + last chain record, exactly the longer run's chain)."""
        if self.chain_free is None:
            raise RuntimeError("run() has not been called")
        if getattr(self, "_mf", None) is not None:
            self._mf.extend(nsteps, verbose=verbose)
            self._merge_ensembles(self._mf)
            return self
        if getattr(self, "_backend_used", None) in ("hmc", "pt"):
            raise RuntimeError(
                "extend() continues a plain stretch-move run; after "
                "run_hmc()/run_pt() re-run with a larger nsteps instead "
                "(neither keeps resumable sampler state here)")
        if nsteps % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}")
        state, chain, lnp = self.sampler.run_mcmc(
            self.final_state, int(nsteps), self.thin)
        self.chain_free = jnp.concatenate(
            [jnp.asarray(self.chain_free), chain], axis=0)
        self.lnprobability = jnp.concatenate(
            [jnp.asarray(self.lnprobability), lnp], axis=0)
        self.final_state = state
        self.acceptance_fraction = np.asarray(
            self.sampler.acceptance_fraction(state))
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"  extended by {nsteps} steps -> "
                f"{self.chain_free.shape[0]} recorded")
        return self

    # -- products ---------------------------------------------------------------
    @property
    def chain(self):
        """Full-parameter production chain, reference layout
        (nwalkers, nsteps, 5)."""
        if self.chain_free is None:
            raise RuntimeError("run() has not been called")
        free = np.asarray(self.chain_free)          # (nrec, nwalkers, nfree)
        full = self.free_space.expand(free)         # (nrec, nwalkers, 5)
        return np.transpose(full, (1, 0, 2))

    def autocorrelation_time(self):
        if self.chain_free is None:
            raise RuntimeError("run() has not been called")
        return autocorrelation_time(np.asarray(self.chain_free))

    @property
    def free_param_names(self):
        """Free-parameter names in chain-column order."""
        if self.free_space is None:
            raise RuntimeError("run() has not been called")
        return [PARAM_NAMES[i] for i in self.free_space.free_idx]

    def gelman_rubin(self):
        """Split-R-hat per free parameter, straight off the recorded
        free-space chain (cheap enough for a run-until-converged loop --
        no full-chain expansion; pair with free_param_names for
        labels)."""
        if self.chain_free is None:
            raise RuntimeError("run() has not been called")
        from mbb_emcee_tpu.sampler import split_rhat
        return split_rhat(np.asarray(self.chain_free))

    def converged(self, rhat_max=1.1, tau_mult=None, rhat=None):
        """bool: every free parameter's split-R-hat below `rhat_max` --
        the single-fit analog of MultiFitter.converged, so extend()
        serving loops share one predicate across both surfaces. With
        `tau_mult` (emcee's rule of thumb is ~50), additionally require
        the recorded chain length >= tau_mult x the largest integrated
        autocorrelation time (a NaN tau estimate counts as 1 -- too
        short to estimate is not the same as converged). Pass `rhat`
        (a gelman_rubin() result) to reuse an already-computed
        reduction instead of hauling the chain to host twice."""
        if rhat is None:
            rhat = self.gelman_rubin()
        ok = bool(np.all(np.asarray(rhat) < float(rhat_max)))
        if ok and tau_mult is not None:
            tau = np.nan_to_num(
                np.asarray(self.autocorrelation_time(), np.float64),
                nan=1.0)
            nrec = int(np.asarray(self.chain_free).shape[0])
            ok = bool(nrec >= float(tau_mult) * float(np.max(tau)))
        return ok
