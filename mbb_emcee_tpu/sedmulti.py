"""Batched catalog serving for GENERIC models: SEDMultiFitter.

The generic-model analog of multifit.MultiFitter: fit one user SEDModel
(sed.py) to S independent sources in lockstep -- the whole batch (ball
init, burn, per-source re-center, production scan) is ONE jitted device
program, vmapped over sources and optionally shard_mapped over an ICI
source mesh (embarrassingly parallel, no collectives). The serving
surface mirrors the MBB batch class: ragged catalogs via NaN-flagged
missing bands, shared or per-source photometric upper-limit masks
riding the sign of the inverse-uncertainty operand, device-side
summaries (par_cen / split-R-hat / tau / converged), the
extend()-until-converged loop from the stored per-source PRNG keys,
batched derived posteriors (L_IR, peak lambda, SED bands), the
posterior-predictive QA sweep, and one-file HDF5 persistence that can
resume the serving loop after a reload.

Orchestration (run/extend/checkpoint, PT, HMC, MAP+Laplace, nested
evidence, PPC/LOO, device summaries) is the ONE shared engine
(batchengine.BatchEngine); this module provides the generic-model
hooks: the SEDModel lnprob builder, per-source Gaussian priors riding
the operands, correlated calibration errors via per-source whitening
matrices (set_band_correlation -- same error model as
MultiFitter's), and the sed-batch HDF5 schema.

Scope bounds (documented, not implied): the XLA stretch-move tier only
(the fused Pallas kernels are specialized to the 5-parameter MBB
chain); no data-driven init heuristic (set_param_init supplies
centers). Dust mass is MBB physics and lives on MultiFitter.

ADDITIVE capability: the reference fits one photometry file per
process, with no user-model hook at all (SURVEY.md C4, provenance note).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.likelihood import LikelihoodSpec
from mbb_emcee_tpu.paramspace import ParamSpaceMixin
from mbb_emcee_tpu.sed import SEDModel, build_sed_lnprob_data
from mbb_emcee_tpu import derived
from mbb_emcee_tpu.batchengine import BatchEngine, _mesh_token
from mbb_emcee_tpu.checkpoint import data_fingerprint

_SEDBATCH_SCHEMA_VERSION = 1


class SEDMultiFitter(BatchEngine, ParamSpaceMixin):
    """Fit a user SEDModel to a whole catalog in one device program.

    Usage:
        model = SEDModel(fnu=my_fnu, param_names=(...), lower=..., upper=...)
        mf = SEDMultiFitter(model, nwalkers=128, seed=3)
        mf.set_data(wave, flux_SxNb, unc_SxNb, redshifts=z)
        for name, v in zip(model.param_names, guess):
            mf.set_param_init(name, v, 0.1 * abs(v))
        mf.run(nburn=200, nsteps=600)
        while not mf.converged(window=64).all():
            mf.extend(200)
        cen = mf.par_cen("T_cold")            # (S, 3)
        lir = mf.compute_lir()                # (S, nsamples)
    """

    def __init__(self, model: SEDModel, nwalkers=250, seed=207, a=2.0,
                 mesh=None, prng_impl="threefry2x32"):
        if not isinstance(model, SEDModel):
            raise TypeError("model must be an SEDModel")
        model.validate()
        from mbb_emcee_tpu.utils.compilecache import (
            enable_persistent_cache)
        enable_persistent_cache()
        self.model = model
        self.nwalkers = int(nwalkers)
        if self.nwalkers % 2:
            raise ValueError("nwalkers must be even")
        self.seed = int(seed)
        self.a = float(a)
        self.mesh = mesh
        # threefry by default: mesh and no-mesh runs produce IDENTICAL
        # chains (rbg is faster on TPU but partitioning-dependent).
        self.prng_impl = prng_impl
        self.responses = None
        # quadrature pack restored by from_h5 (see multifit: a reloaded
        # response-mode batch must keep band-integrated evaluation)
        self._restored_pack = None

        self._spec = LikelihoodSpec.for_box(model.lower, model.upper)
        center = 0.5 * (model.lower + model.upper)
        self._init = center.copy()
        self._scatter = np.where(np.abs(center) > 0,
                                 0.05 * np.abs(center),
                                 0.05 * (model.upper - model.lower))
        self._user_init = np.zeros(model.npar, bool)
        self._user_scatter = np.zeros(model.npar, bool)

        self.wave = self.flux = self.unc = None
        self._band_corr = None       # (nb, nb) shared band correlation
        self.band_names = None
        self.source_names = None
        self.redshifts = None
        self.chain_free = None            # (S, nrec, nw, nfree) device
        self.lnprobability = None         # (S, nrec, nw)
        self.acceptance_fraction = None   # (S, nw)
        self.free_space = None
        self.thin = 1
        self._xla_keys = None
        self._xla_counters = None
        self._post_token = None
        self._run_cache = {}
        self.loo_result = None            # LooBatchResult (compute_loo)
        # Per-source Gaussian priors: {param_name_lower: (mean (S,),
        # sigma (S,))}. Threaded through EVERY sampler tier as extra
        # pseudo-band columns on the flux/iunc operands (see
        # _data_operands) -- mixed spec-z/photo-z catalogs, per-source
        # calibration priors etc. share ONE compiled program.
        self._ps_prior = {}

    # -- ParamSpaceMixin hooks ---------------------------------------------------------
    def _param_index(self, param):
        return self.model.param_index(param)

    def _effective_spec(self):
        return self._spec

    # -- data --------------------------------------------------------------------------
    def set_responses(self, response_set):
        """Instrument response curves; requires named photometry bands."""
        self.responses = response_set
        return self

    def _response_pack(self):
        if self.responses is None:
            return self._restored_pack
        if self.band_names is None:
            raise ValueError("response mode requires named photometry bands")
        return self.responses.pack(self.band_names)

    # -- per-source Gaussian priors ------------------------------------------------------
    def set_gaussian_prior(self, param, mean, sigma):
        """Gaussian prior on a parameter. Scalars set the SHARED prior
        (all sources, ParamSpaceMixin semantics). (S,)-shaped mean
        and/or sigma set a PER-SOURCE prior instead -- e.g. spec-z
        anchors inside a photo-z catalog (`set_gaussian_prior("z",
        z_spec, z_err)` with NaN/inf sigma entries disabling the prior
        for sources without spectroscopy). A scalar call on the same
        parameter replaces its per-source entry (last call wins). The
        prior applies to FREE parameters; fixing the parameter later
        raises at run time."""
        if np.ndim(mean) == 0 and np.ndim(sigma) == 0:
            # canonical name (param may be an index): the per-source
            # entry must clear regardless of how it is addressed
            name = self.model.param_names[self._param_index(param)]
            self._ps_prior.pop(name.lower(), None)
            return super().set_gaussian_prior(param, mean, sigma)
        if self.flux is None:
            raise RuntimeError(
                "per-source priors need the catalog size; call set_data "
                "first")
        S = self.nsources
        name = self.model.param_names[self._param_index(param)].lower()
        mean = np.broadcast_to(
            np.asarray(mean, np.float64), (S,)).copy()
        sigma = np.broadcast_to(
            np.asarray(sigma, np.float64), (S,)).copy()
        # A non-finite or non-positive sigma disables the prior for that
        # source (isigma = 0); its mean is then inert (zeroed for a
        # stable fingerprint).
        on = np.isfinite(sigma) & (sigma > 0)
        if not np.isfinite(mean[on]).all():
            raise ValueError(
                f"per-source prior means for {param!r} must be finite "
                "wherever sigma is finite and positive")
        isig = np.where(on, 1.0 / np.where(on, sigma, 1.0), 0.0)
        self._ps_prior[name] = (np.where(on, mean, 0.0), isig)
        return self

    def _ps_prior_free(self, free_space):
        """(pmean, pisig) as (S, nfree) fp64 arrays in FREE-space column
        order, or None when no per-source priors are configured."""
        if not self._ps_prior:
            return None
        S = self.nsources
        nfree = free_space.nfree
        free_names = [self.model.param_names[i].lower()
                      for i in free_space.free_idx]
        pm = np.zeros((S, nfree), np.float64)
        pi = np.zeros((S, nfree), np.float64)
        for name, (mean, isig) in self._ps_prior.items():
            if name not in free_names:
                raise ValueError(
                    f"per-source prior on {name!r} needs that parameter "
                    "free, but it is fixed")
            if mean.shape[0] != S:
                raise ValueError(
                    f"per-source prior on {name!r} is sized for "
                    f"{mean.shape[0]} sources; the catalog has {S} -- "
                    "call set_gaussian_prior again after set_data")
            j = free_names.index(name)
            pm[:, j] = mean
            pi[:, j] = isig
        return pm, pi

    def _ps_token(self):
        """Fingerprint-ready tuple of per-source prior content; ()
        when unused so pre-feature tokens/checkpoints stay valid."""
        if not self._ps_prior:
            return ()
        return tuple(x for name in sorted(self._ps_prior)
                     for x in (np.frombuffer(name.encode(), np.uint8),
                               self._ps_prior[name][0],
                               self._ps_prior[name][1]))

    def _build_lnprob_data(self, spec):
        """build_sed_lnprob_data + the per-source prior wrapper: the
        trailing nfree columns of the flux operand (and of the iunc
        operand in diagonal mode) carry (prior mean, prior isigma) in
        free-space order, so every sampler tier gets per-source priors
        with NO signature change. With a band correlation set
        (set_band_correlation) the aux operand is the per-source
        whitening matrix -- priors then ride as a (W, pisig) pytree."""
        correlated = self._band_corr is not None
        lnprob_data, free_space = build_sed_lnprob_data(
            self.model, spec, response_pack=self._response_pack(),
            correlated=correlated)
        if not self._ps_prior:
            return lnprob_data, free_space
        self._ps_prior_free(free_space)   # validate (free, sized) early
        nb = int(self.wave.size)

        if correlated:
            def lnprob(theta_free, wave, flux_ext, aux):
                whiten, pisig = aux
                base = lnprob_data(theta_free, wave, flux_ext[:nb],
                                   whiten)
                dp = (theta_free - flux_ext[nb:]) * pisig
                return base - 0.5 * jnp.sum(dp * dp)
        else:
            def lnprob(theta_free, wave, flux_ext, iunc_ext):
                base = lnprob_data(theta_free, wave, flux_ext[:nb],
                                   iunc_ext[:nb])
                dp = (theta_free - flux_ext[nb:]) * iunc_ext[nb:]
                return base - 0.5 * jnp.sum(dp * dp)

        return lnprob, free_space

    def _data_operands(self, free_space):
        """(flux, aux) fp32 operands: aux is signed inverse
        uncertainties (diagonal mode) or the per-source (nb, nb)
        whitening matrices (correlated mode), extended with the
        per-source prior columns when configured."""
        flux = np.asarray(self.flux, np.float32)
        ps = self._ps_prior_free(free_space)
        if self._band_corr is None:
            iunc = np.asarray(self._iunc_operand(), np.float32)
            if ps is not None:
                flux = np.concatenate([flux, ps[0].astype(np.float32)],
                                      axis=1)
                iunc = np.concatenate([iunc, ps[1].astype(np.float32)],
                                      axis=1)
            return jnp.asarray(flux), jnp.asarray(iunc)
        whiten = jnp.asarray(self._whiten_operand().astype(np.float32))
        if ps is None:
            return jnp.asarray(flux), whiten
        flux = np.concatenate([flux, ps[0].astype(np.float32)], axis=1)
        return jnp.asarray(flux), (whiten,
                                   jnp.asarray(ps[1].astype(np.float32)))

    def _posterior_token(self):
        spec = self._effective_spec()
        uplim = (None if spec.uplim_bands is None
                 else np.asarray(spec.uplim_bands))
        pack = self._response_pack()
        return (data_fingerprint(
                    self.wave, self.flux, self.unc, uplim,
                    spec.lower, spec.upper, spec.fixed, spec.fixed_values,
                    spec.prior_mean, spec.prior_isigma,
                    np.asarray([self.a]),
                    *self._ps_token(),
                    *(() if self._band_corr is None
                      else (self._band_corr,)),
                    *(() if pack is None else pack)),
                self.model.name)

    def _spec_token(self, spec):
        """Compile-relevant spec content (uplim masks excluded: they ride
        the sign of the iunc operand, so mask edits REUSE the program).
        Per-source priors and band correlation enter as PRESENCE flags
        only: their values are operands (edits reuse the program); only
        adding or removing them changes the traced lnprob."""
        return (data_fingerprint(
                    spec.lower, spec.upper, spec.fixed, spec.fixed_values,
                    spec.prior_mean, spec.prior_isigma),
                bool(self._ps_prior), self._band_corr is not None)

    def _responses_token(self):
        pack = self._response_pack()
        return None if pack is None else data_fingerprint(*pack)

    # -- engine hooks (batchengine.BatchEngine) ----------------------------------------
    def _engine_label(self):
        return self.model.name

    def _engine_program_identity(self):
        # The user fnu is an arbitrary callable, so only fitters sharing
        # the same SEDModel OBJECT (construction nonce) may share traced
        # programs; the band count is baked into the per-source-prior
        # wrapper's slicing, so it is part of the identity too.
        return (self.model.nonce,
                None if self.wave is None else int(self.wave.size))

    @property
    def _engine_param_names(self):
        return list(self.model.param_names)

    def _engine_lnprob(self, spec):
        return self._build_lnprob_data(spec)

    def _engine_operands(self, free_space):
        return self._data_operands(free_space)

    def _engine_compile_token(self, spec):
        return (self._spec_token(spec), self._responses_token())

    def _engine_init_centers(self, init, free_space):
        if init == "map":
            self._require_map_fresh("run(init='map')")
            cen = self.map_params[:, free_space.free_idx]   # (S, nfree)
            base = self._scatter[free_space.free_idx]
            sca = np.minimum(
                np.clip(2.0 * self.map_sigma, 1e-6, None),
                base[None, :] * 10.0)
            return cen, sca
        S = self.nsources
        idx = free_space.free_idx
        if self.model.guess is not None:
            # Per-source data-driven seeds (SEDModel.guess; NaN entries
            # and explicit set_param_init calls fall through to the
            # shared defaults) -- the generic analog of MBBFitter's
            # flux-heuristic init, so a catalog fit no longer sits at
            # box centers when the user skips set_param_init.
            from mbb_emcee_tpu.sed import apply_model_guess
            cen = np.empty((S, free_space.nfree))
            sca = np.empty((S, free_space.nfree))
            for s in range(S):
                ini = self._init.copy()
                sc = self._scatter.copy()
                apply_model_guess(self.model, self.wave, self.flux[s],
                                  self.unc[s], ini, sc,
                                  self._user_init, self._user_scatter)
                cen[s] = ini[idx]
                sca[s] = sc[idx]
            return cen, sca
        cen = np.broadcast_to(self._init[idx], (S, free_space.nfree))
        sca = np.broadcast_to(self._scatter[idx], (S, free_space.nfree))
        return cen, sca

    def _engine_record_run(self, spec):
        self._post_token = self._posterior_token()

    def _engine_check_extend(self, spec):
        if self._posterior_token() != self._post_token:
            raise RuntimeError(
                "the parameter space / error model / data / band "
                "configuration changed after run(); extend() would splice "
                "chains from different posteriors -- call run() instead")

    def _engine_record_map(self, spec):
        self._map_token = self._posterior_token()

    def _engine_band_flux_eval(self):
        from mbb_emcee_tpu.sed import sed_band_flux_eval
        return sed_band_flux_eval(self.model.fnu, self.wave,
                                  self._response_pack())

    def _engine_posterior_repr(self):
        return repr(self._posterior_token())

    # -- the run -----------------------------------------------------------------------
    def run(self, nburn=50, nsteps=250, thin=1, recenter_burn=True,
            verbose=False, init="auto", checkpoint=None,
            checkpoint_interval=100, resume=False):
        """Burn -> per-source re-center on its best walker -> re-burn ->
        reset -> production, all sources in lockstep (one jitted program;
        compiled programs cached across run() calls with the same static
        geometry -- batchengine.BatchEngine). init='map' seeds each
        source's walker ball at its own run_map() mode with ~2
        Laplace-sigma scatter (whole-survey triage-then-refine).

        With checkpoint=path the production run proceeds in
        checkpoint_interval-record segments, flushing the COMPLETE fitter
        state (chains + per-source PRNG keys, via writeToHDF5) after each
        -- a killed batch run loses at most one segment. resume=True
        continues an interrupted run from that file toward the same
        nsteps target; extend()'s exact-continuation property makes the
        segmented chain bitwise-identical to an uninterrupted run.
        Returns self."""
        import os
        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        if int(thin) < 1:
            raise ValueError(f"thin={thin} must be >= 1")
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if init not in ("auto", "map"):
            raise ValueError(f"init must be 'auto' or 'map'; got {init!r}")
        if resume and not checkpoint:
            raise ValueError(
                "resume=True requires checkpoint= (the path the previous "
                "run flushed state to)")
        if (resume and checkpoint and os.path.exists(checkpoint)
                and init == "map"):
            raise ValueError(
                "init='map' combined with an actual resume is ambiguous: "
                "the checkpointed state would silently win; drop init= "
                "(or the checkpoint file) to make the intent explicit")
        if checkpoint is not None:
            return self._engine_run_checkpointed(
                nburn, nsteps, thin, recenter_burn, verbose, init,
                checkpoint, int(checkpoint_interval),
                bool(resume and os.path.exists(checkpoint)))
        return self._engine_run_xla(nburn, nsteps, thin, recenter_burn,
                                    verbose, init)

    def _engine_adopt_checkpoint(self, checkpoint, thin_i):
        """Resume branch of the segmented run: reload the flushed state
        (refusing a mismatched model/geometry/posterior) and adopt it."""
        other = SEDMultiFitter.from_h5(checkpoint, self.model,
                                       mesh=self.mesh)
        if (other.nwalkers != self.nwalkers
                or other.thin != thin_i
                or other.seed != self.seed):
            raise ValueError(
                "checkpoint geometry (nwalkers/thin/seed) does not "
                "match this fitter")
        if other.prng_impl != self.prng_impl:
            raise ValueError(
                f"checkpoint was sampled with "
                f"prng_impl={other.prng_impl!r}; this fitter uses "
                f"{self.prng_impl!r}")
        if other._posterior_token() != self._posterior_token():
            raise RuntimeError(
                "checkpointed run's posterior (spec/data/responses) "
                "differs from this fitter's; refusing to splice")
        # adopt the restored state wholesale
        for attr in ("chain_free", "lnprobability",
                     "acceptance_fraction", "free_space", "thin",
                     "_xla_keys", "_xla_counters"):
            setattr(self, attr, getattr(other, attr))
        self._post_token = self._posterior_token()

    def extend(self, nsteps, verbose=False):
        """Continue the production run for every source from (stored
        per-source PRNG key, last chain record) -- the complete sampler
        state on this backend. Pairs with converged() for
        run-until-converged serving loops; works after an HDF5 reload."""
        return self._engine_extend_xla(nsteps, verbose)

    # -- MAP triage tier (generic: mapfit sees only lnprob) -------------------------------
    def _require_map_fresh(self, what):
        if getattr(self, "map_params", None) is None:
            raise RuntimeError(f"{what} requires run_map() first")
        if self._posterior_token() != self._map_token:
            raise RuntimeError(
                f"{what}: the stored MAP fit is for a different posterior "
                f"-- the parameter space, data, or responses changed "
                f"since run_map(); re-run run_map() first")

    # -- batched derived quantities -------------------------------------------------------
    def compute_lir(self, redshifts=None, wavemin=8.0, wavemax=1000.0,
                    thin=1, lumdists=None, cosmology="WMAP9",
                    z_param=None):
        """(S, nsamples) L_IR posteriors in L_sun: per-source GL
        quadrature nodes (redshifted band), one batched device program.

        z_param: name/index of a SAMPLED redshift parameter (photo-z
        catalogs, photoz.photoz_mbb) -- every sample of every source is
        then integrated over its own observed window with its own
        luminosity distance (chunked vectorized fp64 D_L pass);
        redshifts=/lumdists= conflict with it and raise.
        """
        fnu = self.model.fnu
        samples = self._thinned(thin)                 # (S, N, npar)
        if z_param is None:
            z = self._source_redshifts(redshifts)
            lam, w = derived.lir_nodes_weights(1.0 + z, wavemin, wavemax)

            def one(theta, lam_s, w_s):
                return jnp.sum(w_s * fnu(theta, lam_s))

            batched = jax.jit(jax.vmap(jax.vmap(
                one, in_axes=(0, None, None)), in_axes=(0, 0, 0)))
            lam_j = jnp.asarray(lam, jnp.float32)
            w_j = jnp.asarray(w, jnp.float32)
            # sample-axis chunking bounds the (S, N, nodes) device
            # intermediates (see BatchEngine._chunked_samples; the MBB
            # batch twin routes the same computation through it)
            integ = self._chunked_samples(
                lambda s: batched(s, lam_j, w_j), samples,
                int(lam.shape[-1]))
            prefac = derived.lir_prefactor(
                self._dl_mpc(z, lumdists, cosmology))[:, None]
        else:
            if redshifts is not None or lumdists is not None:
                raise ValueError(
                    "z_param= cannot combine with redshifts=/lumdists=: "
                    "each sample carries its own redshift")
            zi = self.model.param_index(z_param)
            one_z = derived.lir_zparam_integrand(fnu, zi, wavemin,
                                                 wavemax)
            integ = self._chunked_samples(
                jax.jit(jax.vmap(jax.vmap(one_z))), samples,
                derived.LIR_NODES)
            zmat = np.asarray(samples[..., zi], np.float64)  # (S, N)
            from mbb_emcee_tpu.models.cosmology import (
                luminosity_distance_batch)
            dl = luminosity_distance_batch(
                zmat.ravel(), cosmology).reshape(zmat.shape)
            prefac = derived.lir_prefactor(dl)
        self.lir_chain = prefac * integ
        return self.lir_chain

    def lir_cen(self, percentile=68.3):
        if getattr(self, "lir_chain", None) is None:
            self.compute_lir()
        return _batch_percentiles(self.lir_chain, percentile)

    def compute_peaklambda(self, thin=1, lo=derived.PEAK_RANGE[0],
                           hi=derived.PEAK_RANGE[1]):
        """(S, nsamples) observed f_nu peak wavelengths (um): batched
        golden-section in ln-lambda on log f_nu."""
        from mbb_emcee_tpu.ops.rootfind import golden_max
        fnu = self.model.fnu
        ulo, uhi = float(np.log(lo)), float(np.log(hi))
        floor = jnp.float32(1e-30)

        def peak(theta):
            def logf(u):
                lam = jnp.exp(u)
                return jnp.log(jnp.maximum(
                    fnu(theta, lam[None] if jnp.ndim(lam) == 0 else lam),
                    floor)).reshape(())
            um, _ = golden_max(logf, ulo, uhi, iters=derived.PEAK_ITERS)
            return jnp.exp(um)

        samples = self._thinned(thin)
        self.peaklambda_chain = self._chunked_samples(
            jax.jit(jax.vmap(jax.vmap(peak))), samples, 8)
        return self.peaklambda_chain

    def peaklambda_cen(self, percentile=68.3):
        if getattr(self, "peaklambda_chain", None) is None:
            self.compute_peaklambda()
        return _batch_percentiles(self.peaklambda_chain, percentile)

    def sed_percentiles(self, waves, percentile=68.3, thin=1):
        """(S, 3, nwave) per-source posterior SED bands in mJy."""
        fnu = self.model.fnu
        waves_j = jnp.asarray(np.atleast_1d(waves), jnp.float32)
        samples = self._thinned(thin)
        fluxes = self._chunked_samples(
            jax.jit(jax.vmap(jax.vmap(lambda th: fnu(th, waves_j)))),
            samples, int(waves_j.size))
        return derived.sed_band(fluxes, percentile, sample_axis=1)

    # -- persistence -----------------------------------------------------------------------
    def writeToHDF5(self, filename):
        """One-file batch persistence (kind='sed-batch'); from_h5 restores
        a fitter that can summarize, compute derived quantities, AND
        continue the serving loop (per-source PRNG keys stored)."""
        import h5py
        from mbb_emcee_tpu.checkpoint import _key_to_np
        self._require_run()
        with h5py.File(filename, "w") as f:
            f.attrs["schema_version"] = _SEDBATCH_SCHEMA_VERSION
            f.attrs["package"] = "mbb_emcee_tpu"
            f.attrs["kind"] = "sed-batch"
            f.attrs["model_name"] = self.model.name.encode()
            f.attrs["param_names"] = np.array(
                [n.encode() for n in self.model.param_names])
            f.attrs["nwalkers"] = self.nwalkers
            f.attrs["thin"] = self.thin
            f.attrs["seed"] = self.seed
            f.attrs["a"] = self.a
            f.attrs["prng_impl"] = self.prng_impl.encode()
            # threefry streams are partition-independent; rbg bits depend
            # on the mesh, so resume gates on this token for non-threefry
            f.attrs["mesh_token"] = str(_mesh_token(self.mesh)).encode()
            f.create_dataset("ChainFree",
                             data=np.asarray(self.chain_free, np.float32),
                             compression="gzip")
            f.create_dataset("LnProbability",
                             data=np.asarray(self.lnprobability,
                                             np.float32),
                             compression="gzip")
            f.create_dataset("AcceptanceFraction",
                             data=np.asarray(self.acceptance_fraction,
                                             np.float32))
            if self._xla_keys is not None:
                # stretch-move runs persist their continuation state;
                # HMC/PT chains are not continuable and skip it
                f.create_dataset("Keys", data=_key_to_np(self._xla_keys))
                naccept, nsteps_dev = self._xla_counters
                f.create_dataset("NAccept",
                                 data=np.asarray(naccept, np.int64))
                f.create_dataset("NSteps",
                                 data=np.asarray(nsteps_dev, np.int64))
            f.create_dataset("Wave", data=self.wave)
            f.create_dataset("Flux", data=self.flux)
            f.create_dataset("Unc", data=self.unc)
            if self.band_names is not None:
                f.create_dataset("BandNames", data=np.array(
                    [str(n).encode() for n in self.band_names]))
            pack = self._response_pack()
            if pack is not None:
                g = f.create_group("ResponsePack")
                g.create_dataset("Nodes", data=pack[0])
                g.create_dataset("Weights", data=pack[1])
            if self.source_names is not None:
                f.create_dataset("SourceNames", data=np.array(
                    [n.encode() for n in self.source_names]))
            if self.redshifts is not None:
                f.create_dataset("Redshifts", data=self.redshifts)
            # the spec the RUN sampled under (see multifit.writeToHDF5:
            # post-run spec edits must not re-label reloaded columns)
            spec = getattr(self, "_run_spec", None) or self._spec
            pc = f.create_group("ParamConfig")
            pc.create_dataset("Lower", data=spec.lower)
            pc.create_dataset("Upper", data=spec.upper)
            pc.create_dataset("Fixed", data=spec.fixed.astype(np.uint8))
            pc.create_dataset("FixedValues", data=spec.fixed_values)
            pc.create_dataset("PriorMean", data=spec.prior_mean)
            pc.create_dataset("PriorInvSigma", data=spec.prior_isigma)
            pc.create_dataset("Initial", data=self._init)
            pc.create_dataset("InitScatter", data=self._scatter)
            # which init centers/scatters the USER set explicitly: a
            # reloaded fitter must not let apply_model_guess overwrite
            # them on a re-run (the guess hook defers to user values)
            pc.create_dataset("UserInit",
                              data=self._user_init.astype(np.uint8))
            pc.create_dataset("UserScatter",
                              data=self._user_scatter.astype(np.uint8))
            if spec.uplim_bands is not None:
                pc.create_dataset("PhotUpperLimits",
                                  data=np.asarray(spec.uplim_bands,
                                                  np.uint8))
            if self._band_corr is not None:
                pc.create_dataset("BandCorrelation",
                                  data=self._band_corr)
            if self._ps_prior:
                pg = pc.create_group("PerSourcePriors")
                pg.attrs["params"] = np.array(
                    [n.encode() for n in sorted(self._ps_prior)])
                pg.create_dataset("Mean", data=np.stack(
                    [self._ps_prior[n][0]
                     for n in sorted(self._ps_prior)]))
                pg.create_dataset("InvSigma", data=np.stack(
                    [self._ps_prior[n][1]
                     for n in sorted(self._ps_prior)]))
            if getattr(self, "lir_chain", None) is not None:
                f.create_dataset("LIRChain", data=self.lir_chain,
                                 compression="gzip")
            if getattr(self, "dustmass_chain", None) is not None:
                ds = f.create_dataset("DustMassChain",
                                      data=self.dustmass_chain,
                                      compression="gzip")
                for k, v in (getattr(self, "dustmass_meta", None)
                             or {}).items():
                    ds.attrs[k] = v
            if getattr(self, "peaklambda_chain", None) is not None:
                f.create_dataset("PeakLambdaChain",
                                 data=self.peaklambda_chain,
                                 compression="gzip")
            if self.loo_result is not None:
                from mbb_emcee_tpu.modelcheck import write_loo_batch_group
                write_loo_batch_group(f, self.loo_result)
        return filename

    @classmethod
    def from_h5(cls, filename, model: SEDModel, mesh=None):
        """Restore a finished batch fit (summaries + derived + PPC +
        extend all work). The model must match the stored parameter
        list and name."""
        import h5py
        from mbb_emcee_tpu.checkpoint import _key_from_np
        with h5py.File(filename, "r") as f:
            if f.attrs.get("kind", b"") not in (b"sed-batch", "sed-batch"):
                raise ValueError(f"{filename} is not an SEDMultiFitter "
                                 f"file")
            stored_names = tuple(
                n.decode() if isinstance(n, bytes) else str(n)
                for n in f.attrs["param_names"])
            stored_model = f.attrs["model_name"]
            if isinstance(stored_model, bytes):
                stored_model = stored_model.decode()
            if tuple(model.param_names) != stored_names:
                raise ValueError(
                    f"model {model.name!r} has parameters "
                    f"{model.param_names}; file stores {stored_names}")
            if model.name != stored_model:
                raise ValueError(
                    f"file was written by model {stored_model!r}, got "
                    f"{model.name!r}")
            prng_impl = f.attrs["prng_impl"]
            if isinstance(prng_impl, bytes):
                prng_impl = prng_impl.decode()
            mf = cls(model, nwalkers=int(f.attrs["nwalkers"]),
                     seed=int(f.attrs["seed"]), a=float(f.attrs["a"]),
                     mesh=mesh, prng_impl=prng_impl)
            tok = f.attrs.get("mesh_token", b"")
            mf._ck_mesh_token = (tok.decode()
                                 if isinstance(tok, bytes) else tok)
            if (prng_impl != "threefry2x32"
                    and mf._ck_mesh_token != str(_mesh_token(mesh))):
                raise ValueError(
                    f"{prng_impl!r} PRNG streams depend on the device "
                    f"partitioning; reload under the SAME mesh the file "
                    f"recorded (or run with prng_impl='threefry2x32')")
            pc = f["ParamConfig"]
            uplim = (np.asarray(pc["PhotUpperLimits"], bool)
                     if "PhotUpperLimits" in pc else None)
            mf._spec = LikelihoodSpec(
                lower=np.asarray(pc["Lower"], np.float64),
                upper=np.asarray(pc["Upper"], np.float64),
                fixed=np.asarray(pc["Fixed"], bool),
                fixed_values=np.asarray(pc["FixedValues"], np.float64),
                prior_mean=np.asarray(pc["PriorMean"], np.float64),
                prior_isigma=np.asarray(pc["PriorInvSigma"], np.float64),
                uplim_bands=uplim)
            mf._init = np.asarray(pc["Initial"], np.float64)
            mf._scatter = np.asarray(pc["InitScatter"], np.float64)
            if "UserInit" in pc:
                mf._user_init = np.asarray(pc["UserInit"], bool)
                mf._user_scatter = np.asarray(pc["UserScatter"], bool)
            if "BandCorrelation" in pc:
                mf._band_corr = np.asarray(pc["BandCorrelation"],
                                           np.float64)
            if "PerSourcePriors" in pc:
                pg = pc["PerSourcePriors"]
                names = [n.decode() if isinstance(n, bytes) else str(n)
                         for n in pg.attrs["params"]]
                pm = np.asarray(pg["Mean"], np.float64)
                pi = np.asarray(pg["InvSigma"], np.float64)
                mf._ps_prior = {n: (pm[k], pi[k])
                                for k, n in enumerate(names)}
            band_names = None
            if "BandNames" in f:
                band_names = [n.decode() if isinstance(n, bytes)
                              else str(n) for n in f["BandNames"][()]]
            source_names = None
            if "SourceNames" in f:
                source_names = [n.decode() if isinstance(n, bytes)
                                else str(n) for n in f["SourceNames"][()]]
            mf.wave = np.asarray(f["Wave"], np.float64)
            mf.flux = np.asarray(f["Flux"], np.float64)
            mf.unc = np.asarray(f["Unc"], np.float64)
            mf.band_names = band_names
            if "ResponsePack" in f:
                mf._restored_pack = (
                    np.asarray(f["ResponsePack"]["Nodes"]),
                    np.asarray(f["ResponsePack"]["Weights"]))
            mf.source_names = source_names
            mf.redshifts = (np.asarray(f["Redshifts"], np.float64)
                            if "Redshifts" in f else None)
            mf.thin = int(f.attrs["thin"])
            mf.chain_free = jnp.asarray(np.asarray(f["ChainFree"],
                                                   np.float32))
            mf.lnprobability = jnp.asarray(
                np.asarray(f["LnProbability"], np.float32))
            mf.acceptance_fraction = np.asarray(f["AcceptanceFraction"],
                                                np.float64)
            if "Keys" in f:
                mf._xla_keys = _key_from_np(np.asarray(f["Keys"]),
                                            prng_impl)
                mf._xla_counters = (
                    jnp.asarray(np.asarray(f["NAccept"]), jnp.int32),
                    jnp.asarray(np.asarray(f["NSteps"]), jnp.int32))
            if "LIRChain" in f:
                mf.lir_chain = np.asarray(f["LIRChain"], np.float64)
            if "DustMassChain" in f:
                mf.dustmass_chain = np.asarray(f["DustMassChain"],
                                               np.float64)
                mf.dustmass_meta = {k: f["DustMassChain"].attrs[k]
                                    for k in f["DustMassChain"].attrs}
            if "PeakLambdaChain" in f:
                mf.peaklambda_chain = np.asarray(f["PeakLambdaChain"],
                                                 np.float64)
            if "LOO" in f:
                from mbb_emcee_tpu.modelcheck import read_loo_batch_group
                mf.loo_result = read_loo_batch_group(f["LOO"])
        from mbb_emcee_tpu.sed import build_sed_lnprob_data as _b
        _, mf.free_space = _b(model, mf._effective_spec())
        mf._post_token = mf._posterior_token()
        return mf

    # -- single-source views -----------------------------------------------------------
    def results(self, i, redshift=None, cosmology="WMAP9", lumdist=None):
        """Full SEDResults for source i -- summaries, SED bands, L_IR /
        peak-lambda posteriors, PPC, plots, writeToHDF5: the complete
        single-source analysis surface on one catalog member (the
        generic analog of MultiFitter.results). `redshift` defaults to
        the per-source vector stored by set_data()."""
        from mbb_emcee_tpu.sed import SEDResults
        self._require_run()
        i = int(i)
        if not 0 <= i < self.nsources:
            raise IndexError(f"source index {i} out of range "
                             f"(nsources={self.nsources})")
        if redshift is None and self.redshifts is not None:
            redshift = float(self.redshifts[i])
        view = _SEDSourceView(self, i)
        return SEDResults(fit=view, redshift=redshift,
                          cosmology=cosmology, lumdist=lumdist)

    def __repr__(self):
        if self.flux is None:
            return (f"SEDMultiFitter[{self.model.name}] (no data)")
        run = ("not run" if self.chain_free is None
               else f"{self.chain_free.shape[1]} recorded steps")
        return (f"SEDMultiFitter[{self.model.name}]: "
                f"{self.nsources} sources x {self.nwalkers} walkers, "
                f"{run}")


class _SEDSourceView:
    """Adapter presenting one source of an SEDMultiFitter as a finished
    SEDFitter (the attribute surface SEDResults._from_fit consumes)."""

    def __init__(self, mf: SEDMultiFitter, i: int):
        import dataclasses
        self.model = mf.model
        self.redshift = (None if mf.redshifts is None
                         else float(mf.redshifts[i]))
        free = np.asarray(mf.chain_free[i])           # (nrec, nw, nfree)
        full = mf.free_space.expand(free)             # (nrec, nw, npar)
        self.chain = np.transpose(full, (1, 0, 2))    # (nw, nrec, npar)
        self.lnprobability = np.asarray(mf.lnprobability[i])  # (nrec, nw)
        self.acceptance_fraction = np.asarray(
            mf.acceptance_fraction[i])
        from mbb_emcee_tpu.likelihood import Photometry
        names = (list(mf.band_names)
                 if mf.band_names is not None else None)
        # missing bands were stored as (0, inf); Photometry accepts inf
        # unc and the analysis surface excludes non-finite-unc bands
        self.phot = Photometry(mf.wave, mf.flux[i], mf.unc[i],
                               band_names=names)
        spec = mf._effective_spec()
        ub = spec.uplim_bands
        if ub is not None and np.ndim(ub) == 2:
            spec = dataclasses.replace(
                spec, uplim_bands=np.asarray(ub[i], bool))
        if mf._ps_prior:
            # Fold source i's per-source Gaussian priors into the view's
            # spec (product of Gaussians with any shared prior: inverse
            # variances add, means precision-weight), so the per-source
            # analysis surface reports the posterior this source was
            # actually sampled under.
            pm = spec.prior_mean.copy()
            pi = spec.prior_isigma.copy()
            for name, (m_s, i_s) in mf._ps_prior.items():
                j = mf.model.param_index(name)
                v = pi[j] ** 2 + i_s[i] ** 2
                if v > 0:
                    pm[j] = ((pm[j] * pi[j] ** 2 + m_s[i] * i_s[i] ** 2)
                             / v)
                    pi[j] = np.sqrt(v)
            spec = dataclasses.replace(spec, prior_mean=pm,
                                       prior_isigma=pi)
        self._spec = spec
        self._init = mf._init.copy()
        self.thin = mf.thin
        self.nwalkers = mf.nwalkers
        self._pack = mf._response_pack()

    @property
    def spec(self):
        return self._spec

    def _require_run(self):
        pass

    def _response_pack(self):
        return self._pack


def _batch_percentiles(chains, percentile=68.3):
    """(S, 3) (median, +err, -err) per source from (S, nsamples)."""
    p = float(percentile)
    lo, mid, hi = np.percentile(
        np.asarray(chains, np.float64),
        [50.0 - p / 2, 50.0, 50.0 + p / 2], axis=1)
    return np.stack([mid, hi - mid, mid - lo], axis=1)
