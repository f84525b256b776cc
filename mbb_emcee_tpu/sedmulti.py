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

Scope bounds (documented, not implied): diagonal error models only
(correlated calibration errors stay on the MBB surface --
MultiFitter.set_band_correlation); the XLA stretch-move tier only (the
fused Pallas kernels are specialized to the 5-parameter MBB chain); no
data-driven init heuristic (set_param_init supplies centers). Dust
mass is MBB physics and lives on MultiFitter.

ADDITIVE capability: the reference fits one photometry file per
process, with no user-model hook at all (SURVEY.md C4, provenance note).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mbb_emcee_tpu.likelihood import LikelihoodSpec, signed_iunc
from mbb_emcee_tpu.paramspace import ParamSpaceMixin, _replace
from mbb_emcee_tpu.sampler import (
    SamplerState, ensemble_step, make_initial_ball)
from mbb_emcee_tpu.sed import SEDModel, build_sed_lnprob_data
from mbb_emcee_tpu.models.cosmology import Cosmology, luminosity_distance
from mbb_emcee_tpu import derived
from mbb_emcee_tpu.multifit import (
    _batched_split_rhat, _batched_tau, _mesh_token)
from mbb_emcee_tpu.checkpoint import data_fingerprint

_SEDBATCH_SCHEMA_VERSION = 1


class SEDMultiFitter(ParamSpaceMixin):
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

        self._spec = LikelihoodSpec.for_box(model.lower, model.upper)
        center = 0.5 * (model.lower + model.upper)
        self._init = center.copy()
        self._scatter = np.where(np.abs(center) > 0,
                                 0.05 * np.abs(center),
                                 0.05 * (model.upper - model.lower))
        self._user_init = np.zeros(model.npar, bool)
        self._user_scatter = np.zeros(model.npar, bool)

        self.wave = self.flux = self.unc = None
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
    def set_data(self, wave, flux, unc, band_names=None, source_names=None,
                 redshifts=None):
        """wave: (nb,) shared wavelengths (um); flux/unc: (S, nb) mJy.
        MISSING bands (ragged catalogs) are NaN flux or non-finite unc:
        carried as (0, inf) so their inverse uncertainty is exactly 0 --
        no likelihood contribution, one static compiled shape (same
        encoding as MultiFitter.set_data)."""
        wave = np.atleast_1d(np.asarray(wave, np.float64))
        flux = np.atleast_2d(np.asarray(flux, np.float64))
        unc = np.atleast_2d(np.asarray(unc, np.float64))
        if flux.shape != unc.shape or flux.shape[1] != wave.size:
            raise ValueError(
                f"flux {flux.shape} / unc {unc.shape} must be "
                f"(S, {wave.size})")
        missing = ~np.isfinite(flux) | ~np.isfinite(unc)
        if missing.any():
            flux = np.where(missing, 0.0, flux)
            unc = np.where(missing, np.inf, unc)
            if missing.all(axis=1).any():
                bad = int(np.argwhere(missing.all(axis=1))[0, 0])
                raise ValueError(
                    f"source index {bad} has no bands at all")
        if np.any(unc[~missing] <= 0):
            raise ValueError("uncertainties must be positive")
        ub = self._spec.uplim_bands
        if ub is not None and ub.ndim == 2 and self.flux is not None:
            raise ValueError(
                "a per-source upper-limit mask is set; it cannot carry "
                "over to a new batch -- call set_phot_upperlimits again "
                "after set_data")
        if ub is not None and ub.ndim == 1 and ub.size != wave.size:
            raise ValueError(
                f"existing upper-limit mask ({ub.size},) does not fit "
                f"the new data (nb={wave.size}); call "
                f"set_phot_upperlimits again")
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
        """(nb,) shared or (S, nb) per-source upper-limit mask; rides the
        sign of the iunc operand (no program change)."""
        if self.wave is None:
            raise RuntimeError("no data; call set_data first")
        mask = np.asarray(mask, bool)
        nb = self.wave.size
        if mask.shape not in ((nb,), (self.nsources, nb)):
            raise ValueError(
                f"upper-limit mask must be ({nb},) or "
                f"({self.nsources}, {nb}); got {mask.shape}")
        self._spec = _replace(self._spec, uplim_bands=mask)
        return self

    def set_responses(self, response_set):
        """Instrument response curves; requires named photometry bands."""
        self.responses = response_set
        return self

    def _response_pack(self):
        if self.responses is None:
            return None
        if self.band_names is None:
            raise ValueError("response mode requires named photometry bands")
        return self.responses.pack(self.band_names)

    def _iunc_operand(self):
        return signed_iunc(self.unc, self._spec.uplim_bands)

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
        trailing nfree columns of the flux/iunc operands carry
        (prior mean, prior isigma) in free-space order, so every sampler
        tier gets per-source priors with NO signature change."""
        lnprob_data, free_space = build_sed_lnprob_data(
            self.model, spec, response_pack=self._response_pack())
        if not self._ps_prior:
            return lnprob_data, free_space
        self._ps_prior_free(free_space)   # validate (free, sized) early
        nb = int(self.wave.size)

        def lnprob(theta_free, wave, flux_ext, iunc_ext):
            base = lnprob_data(theta_free, wave, flux_ext[:nb],
                               iunc_ext[:nb])
            dp = (theta_free - flux_ext[nb:]) * iunc_ext[nb:]
            return base - 0.5 * jnp.sum(dp * dp)

        return lnprob, free_space

    def _data_operands(self, free_space):
        """(flux, iunc) fp32 operands, extended with the per-source
        prior columns when configured."""
        flux = np.asarray(self.flux, np.float32)
        iunc = np.asarray(self._iunc_operand(), np.float32)
        ps = self._ps_prior_free(free_space)
        if ps is not None:
            flux = np.concatenate([flux, ps[0].astype(np.float32)],
                                  axis=1)
            iunc = np.concatenate([iunc, ps[1].astype(np.float32)],
                                  axis=1)
        return jnp.asarray(flux), jnp.asarray(iunc)

    @property
    def nsources(self):
        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        return self.flux.shape[0]

    def _shard(self, x):
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding
        spec = P(self.mesh.axis_names[0],
                 *([None] * (np.ndim(x) - 1)))
        return jax.device_put(jnp.asarray(x),
                              NamedSharding(self.mesh, spec))

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
                    *(() if pack is None else pack)),
                self.model.name)

    def _spec_token(self, spec):
        """Compile-relevant spec content (uplim masks excluded: they ride
        the sign of the iunc operand, so mask edits REUSE the program).
        Per-source priors enter as a PRESENCE flag only: their values
        are operands (prior edits reuse the program); only adding or
        removing them changes the traced lnprob (the operand-splitting
        wrapper)."""
        return (data_fingerprint(
                    spec.lower, spec.upper, spec.fixed, spec.fixed_values,
                    spec.prior_mean, spec.prior_isigma),
                bool(self._ps_prior))

    # -- the run -----------------------------------------------------------------------
    def run(self, nburn=50, nsteps=250, thin=1, recenter_burn=True,
            verbose=False, init="auto", checkpoint=None,
            checkpoint_interval=100, resume=False):
        """Burn -> per-source re-center on its best walker -> re-burn ->
        reset -> production, all sources in lockstep (one jitted program;
        compiled programs cached across run() calls with the same static
        geometry). init='map' seeds each source's walker ball at its own
        run_map() mode with ~2 Laplace-sigma scatter (whole-survey
        triage-then-refine); centers/scatters are runtime operands, so
        both init modes share the compiled program.

        With checkpoint=path the production run proceeds in
        checkpoint_interval-record segments, flushing the COMPLETE fitter
        state (chains + per-source PRNG keys, via writeToHDF5) after each
        -- a killed batch run loses at most one segment. resume=True
        continues an interrupted run from that file toward the same
        nsteps target; extend()'s exact-continuation property makes the
        segmented chain bitwise-identical to an uninterrupted one.
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
        if checkpoint is not None:
            return self._run_checkpointed(
                nburn, nsteps, thin, recenter_burn, verbose, init,
                checkpoint, int(checkpoint_interval),
                bool(resume and os.path.exists(checkpoint)))
        spec = self._effective_spec()
        lnprob_data, free_space = self._build_lnprob_data(spec)
        self.free_space = free_space
        self.thin = int(thin)
        S, nw = self.nsources, self.nwalkers
        if nw < 2 * free_space.nfree:
            raise ValueError(
                f"nwalkers={nw} < 2*nfree={2 * free_space.nfree}: the "
                f"stretch move needs at least twice the dimension "
                f"(prefer many more)")
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
        flux, iunc = self._data_operands(free_space)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        kball, kstate, krecenter = jax.random.split(key, 3)
        if init == "map":
            self._require_map_fresh("run(init='map')")
            cen_f = self.map_params[:, free_space.free_idx]   # (S, nfree)
            base = self._scatter[free_space.free_idx]
            sca_f = np.minimum(
                np.clip(2.0 * self.map_sigma, 1e-6, None),
                base[None, :] * 10.0)
        else:
            cen_f = np.broadcast_to(self._init[free_space.free_idx],
                                    (S, free_space.nfree))
            sca_f = np.broadcast_to(self._scatter[free_space.free_idx],
                                    (S, free_space.nfree))
        lower, upper = free_space.lower, free_space.upper
        mesh_axis = (self.mesh.axis_names[0]
                     if self.mesh is not None else None)

        def _vary(x):
            # vma type stability under shard_map (see multifit.run)
            if mesh_axis is None:
                return x
            return jax.lax.pcast(x, (mesh_axis,), to="varying")

        def one_source(idx, flux_s, iunc_s, kball, kstate, krecenter,
                       wave, cen, sca):
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
                                   cen, sca, nw, lower, upper)
            state = init_state(jax.random.fold_in(kstate, idx), p0)
            if nburn > 0:
                state = adv(state, nburn)
                if recenter_burn:
                    best = state.position[jnp.argmax(state.lnprob)]
                    kr = jax.random.fold_in(krecenter, idx)
                    kb2, ks2 = jax.random.split(kr)
                    p0b = make_initial_ball(kb2, best, 0.1 * sca, nw,
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
            # (final key, last record) is a complete restart point: see
            # extend().
            return chain, lnpchain, state.naccept, state.nsteps, state.key

        cache_key = ("run", S, nw, free_space.nfree, nrec, thin_i,
                     int(nburn), bool(recenter_burn), float(self.a),
                     _mesh_token(self.mesh), self._spec_token(spec),
                     self.prng_impl,
                     None if self.responses is None
                     else (self._responses_token(),))
        if cache_key not in self._run_cache:
            # centers/scatters are PER-SOURCE operands (in_axes 0): the
            # 'auto' and 'map' init modes share this compiled program.
            f = jax.vmap(one_source,
                         in_axes=(0, 0, 0, None, None, None, None, 0, 0))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None),
                              P(), P(), P(), P(None), P(ax, None),
                              P(ax, None)),
                    out_specs=(P(ax, None, None, None), P(ax, None, None),
                               P(ax, None), P(ax), P(ax)))
            self._run_cache[cache_key] = jax.jit(f)
        chain, lnpchain, naccept, nsteps_dev, keys = (
            self._run_cache[cache_key](
                self._shard(jnp.arange(S)), self._shard(flux),
                self._shard(iunc), kball, kstate, krecenter, wave,
                self._shard(jnp.asarray(cen_f, jnp.float32)),
                self._shard(jnp.asarray(sca_f, jnp.float32))))

        self.chain_free = chain
        self.lnprobability = lnpchain
        denom = np.maximum(np.asarray(nsteps_dev), 1)
        self.acceptance_fraction = np.asarray(naccept) / denom[:, None]
        self._xla_keys = keys
        self._xla_counters = (naccept, nsteps_dev)
        self._post_token = self._posterior_token()
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"SEDMultiFitter[{self.model.name}]: mean acceptance over "
                f"{S} sources: {af.mean():.3f} (per-source min "
                f"{af.mean(1).min():.3f}, max {af.mean(1).max():.3f})")
        return self

    def _responses_token(self):
        pack = self._response_pack()
        return None if pack is None else data_fingerprint(*pack)

    def _run_checkpointed(self, nburn, nsteps, thin, recenter_burn,
                          verbose, init, checkpoint, interval, resuming):
        """Segmented production with full-state flushes: burn + first
        segment through run(), then extend() segments, each followed by
        writeToHDF5(checkpoint). Resume reloads the file (refusing a
        mismatched model/posterior via from_h5 + the extend token) and
        continues toward the original record target."""
        thin_i = int(thin)
        target = int(nsteps) // thin_i          # records wanted
        interval = max(1, int(interval))
        if resuming:
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

    def extend(self, nsteps, verbose=False):
        """Continue the production run for every source from (stored
        per-source PRNG key, last chain record) -- the complete sampler
        state on this backend. Pairs with converged() for
        run-until-converged serving loops; works after an HDF5 reload."""
        if self._xla_keys is None:
            raise RuntimeError("extend() requires a prior run()")
        if self._posterior_token() != self._post_token:
            raise RuntimeError(
                "the parameter space / error model / data / band "
                "configuration changed after run(); extend() would splice "
                "chains from different posteriors -- call run() instead")
        if nsteps % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}")
        spec = self._effective_spec()
        lnprob_data, _fs_e = self._build_lnprob_data(spec)
        S, nw = self.nsources, self.nwalkers
        half = nw // 2
        thin_i = int(self.thin)
        nrec_e = int(nsteps) // thin_i
        if nrec_e <= 0:
            raise ValueError(f"nsteps={nsteps} extends by zero records "
                             f"at thin={self.thin}")
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

        cache_key = ("extend", S, nw, self.free_space.nfree, nrec_e,
                     thin_i, float(self.a), _mesh_token(self.mesh),
                     self._spec_token(spec), self.prng_impl,
                     None if self.responses is None
                     else (self._responses_token(),))
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
        flux_e, iunc_e = self._data_operands(_fs_e)
        chain, lnpchain, naccept, nsteps_dev, keys = (
            self._run_cache[cache_key](
                self._shard(flux_e),
                self._shard(iunc_e),
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

    # -- summaries (device-side; see MultiFitter for rationale) -------------------------
    def _require_run(self):
        if self.chain_free is None:
            raise RuntimeError("run() has not been called")

    @property
    def chain(self):
        """(S, nwalkers, nrec, npar) full-parameter chains."""
        self._require_run()
        free = np.asarray(self.chain_free)
        full = self.free_space.expand(free)           # (S, nrec, nw, npar)
        return np.transpose(full, (0, 2, 1, 3))

    def flatchain(self):
        """(S, nrec*nw, npar)"""
        self._require_run()
        free = np.asarray(self.chain_free)
        S = free.shape[0]
        return self.free_space.expand(
            free.reshape(S, -1, self.free_space.nfree))

    @property
    def free_param_names(self):
        if self.free_space is None:
            raise RuntimeError("no fit yet")
        return [self.model.param_names[i]
                for i in self.free_space.free_idx]

    def par_cen(self, param, percentile=68.3):
        """(S, 3) per-source (median, +err, -err), computed on device."""
        self._require_run()
        i = self._param_index(param)
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
        """(params (S, npar), lnprob (S,)) at each source's max-lnp
        sample (device-side argmax/gather)."""
        self._require_run()
        S = self.nsources
        lnp = jnp.reshape(self.lnprobability, (S, -1))
        idx = jnp.argmax(lnp, axis=1)
        free = jnp.reshape(self.chain_free,
                           (S, -1, self.free_space.nfree))
        best_free = jnp.take_along_axis(
            free, idx[:, None, None], axis=1)[:, 0, :]
        best_lnp = jnp.take_along_axis(lnp, idx[:, None], axis=1)[:, 0]
        return (self.free_space.expand(np.asarray(best_free, np.float64)),
                np.asarray(best_lnp, np.float64))

    def gelman_rubin(self, window=None, stride=None):
        """(S, nfree) split-R-hat per source (one device reduction; see
        MultiFitter.gelman_rubin for the window/stride serving-loop
        conventions)."""
        self._require_run()
        ch = self.chain_free
        if stride is not None:
            ch = ch[:, ::max(int(stride), 1)]
        if window is not None:
            ch = ch[:, -int(window):]
        if int(ch.shape[1]) // 2 < 2:
            raise ValueError("need at least 4 recorded steps")
        return np.asarray(_batched_split_rhat(ch), np.float64)

    def autocorrelation_time(self, window=None):
        """(S, nfree) integrated autocorrelation times (batched FFT)."""
        self._require_run()
        ch = self.chain_free
        if window is not None:
            ch = ch[:, -int(window):]
        return np.asarray(_batched_tau(jnp.asarray(ch)), np.float64)

    def converged(self, rhat_max=1.1, window=None, tau_mult=None,
                  stride=None):
        """(S,) convergence mask; same predicate as MultiFitter.converged
        (R-hat below rhat_max, optionally chain length >= tau_mult*tau)."""
        ok = np.all(self.gelman_rubin(window=window, stride=stride)
                    < float(rhat_max), axis=1)
        if tau_mult is not None:
            tau = self.autocorrelation_time(window=window)
            nrec = int(self.chain_free.shape[1])
            ok = ok & (nrec >= float(tau_mult)
                       * np.nanmax(np.nan_to_num(tau, nan=1.0), axis=1))
        return ok

    def run_pt(self, nrungs=12, beta_min="auto", nburn=300, nsteps=1000,
               thin=1, verbose=False):
        """Batched parallel tempering for the generic model: every
        source gets K temperature rungs x W walkers and the whole
        (S, K, W) block advances as one device program -- the design of
        MultiFitter.run_pt (scout burn on a shared coarse ladder, then
        per-source auto ladders as runtime operands, replica exchange,
        streaming stepping-stone evidence) applied to the generic
        data-parameterized lnprob. The multimodal posteriors PT exists
        for (component-swap degeneracies of multi-component user models)
        are exactly where the single-temperature stretch move traps.

        Records each source's COLD rung with run()'s shapes; per-source
        evidence in self.logz_pt (stepping stone) and self.logz_ti
        (thermodynamic check). extend() does not apply."""
        from mbb_emcee_tpu.tempering import (
            PTState, pt_step, geometric_ladder, auto_ladder_batch,
            SSStats, thermodynamic_logz, ss_stream_update, _SUPPORT_FLOOR)

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by "
                             f"thin={thin}")
        spec = self._effective_spec()
        lnprob_data, free_space = self._build_lnprob_data(spec)
        self.free_space = free_space
        self.thin = int(thin)
        S, W = self.nsources, self.nwalkers
        d = free_space.nfree
        a = self.a
        nrec = int(nsteps // thin)
        thin_i = int(thin)
        adapt = beta_min == "auto"
        if self.mesh is not None and S % self.mesh.devices.size:
            raise ValueError(
                f"the mesh size ({self.mesh.devices.size} devices) must "
                f"divide nsources={S}")
        mesh_axis = (self.mesh.axis_names[0]
                     if self.mesh is not None else None)

        def _vary(x):
            if mesh_axis is None:
                return x
            return jax.lax.pcast(x, (mesh_axis,), to="varying")

        wave = jnp.asarray(self.wave, jnp.float32)
        flux, iunc = self._data_operands(free_space)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        kball, kscout, kmain = jax.random.split(key, 3)
        cen_f = np.broadcast_to(self._init[free_space.free_idx],
                                (S, d)).astype(np.float32)
        sca_f = np.broadcast_to(self._scatter[free_space.free_idx],
                                (S, d)).astype(np.float32)
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
                lambda i, s: pt_step(s, bflat, betas, a, swap_parity=i),
                st)

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

        def _compiled(tag, fn, in_axes, sharded_in, sharded_out,
                      **static):
            ck = (tag, S, W, d, nrec, thin_i, int(nburn), K1,
                  float(self.a), self._spec_token(spec),
                  _mesh_token(self.mesh), self.prng_impl,
                  self._responses_token(),
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
            self._shard(jnp.arange(S)),
            self._shard(jnp.asarray(cen_f)),
            self._shard(jnp.asarray(sca_f)), self._shard(flux),
            self._shard(iunc), jnp.asarray(scout_betas, jnp.float32),
            kball, kscout, wave)

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
            (P(ax, None, None, None), P(ax, None, None),
             P(ax, None, None), P(ax, None), P(ax, None), P(ax),
             P(ax, None), P(ax, None), P(ax, None), P(ax, None)),
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
                                    / denom[:, None])  # cold rung
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
        self._xla_keys = None                          # extend() refuses
        self._xla_counters = None
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"PT [{self.model.name}] over {S} sources: {K2} rungs x "
                f"{W} walkers, mean cold acceptance {af.mean():.3f}, "
                f"lnZ in [{logz.min():.2f}, {logz.max():.2f}]")
        return self

    def run_hmc(self, nwarmup=500, nsteps=1000, thin=1, n_leapfrog=16,
                target_accept=0.8, verbose=False):
        """Batched gradient-based sampling for the generic model: every
        source runs W independent HMC chains and the whole (S, W) block
        advances as one device program (see MultiFitter.run_hmc for the
        warmup design) -- user models are pure JAX, so the forces are
        jax.grad of the generic lnprob with each source's flux/iunc as
        runtime operands; every source adapts its OWN step size
        (self.hmc_step_size, (S,)) and diagonal metric (self.hmc_mass).
        Recorded chains have run()'s shapes, so every batched summary
        and derived quantity works unchanged. extend() does not apply
        (re-run with more nsteps)."""
        from mbb_emcee_tpu.hmc import hmc_core, _to_unconstrained

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by "
                             f"thin={thin}")
        spec = self._effective_spec()
        lnprob_data, free_space = self._build_lnprob_data(spec)
        self.free_space = free_space
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError(
                "HMC requires finite box bounds on every free parameter")
        self.thin = int(thin)
        S, W = self.nsources, self.nwalkers
        d = free_space.nfree
        nrec = int(nsteps) // int(thin)
        if self.mesh is not None and S % self.mesh.devices.size:
            raise ValueError(
                f"the mesh size ({self.mesh.devices.size} devices) must "
                f"divide nsources={S}")
        mesh_axis = (self.mesh.axis_names[0]
                     if self.mesh is not None else None)

        def vary(x):
            # idempotent pcast; see MultiFitter.run_hmc
            if mesh_axis in jax.typeof(x).vma:
                return x
            return jax.lax.pcast(x, (mesh_axis,), to="varying")

        if mesh_axis is None:
            vary = None

        flux, iunc = self._data_operands(free_space)
        key = jax.random.key(self.seed, impl=self.prng_impl)
        kball, kmain = jax.random.split(key)
        cen_f = np.broadcast_to(self._init[free_space.free_idx],
                                (S, d)).astype(np.float32)
        sca_f = np.broadcast_to(self._scatter[free_space.free_idx],
                                (S, d)).astype(np.float32)
        lower = np.asarray(free_space.lower, np.float32)
        width = np.asarray(free_space.upper - free_space.lower,
                           np.float32)

        def hmc_one(idx, cen_s, sca_s, flux_s, iunc_s, kball, kmain,
                    wave):
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
              int(n_leapfrog), float(target_accept),
              self._spec_token(spec), _mesh_token(self.mesh),
              self.prng_impl, self._responses_token())
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
            self._shard(jnp.arange(S)),
            self._shard(jnp.asarray(cen_f)),
            self._shard(jnp.asarray(sca_f)), self._shard(flux),
            self._shard(iunc), kball, kmain,
            jnp.asarray(self.wave, jnp.float32))

        self.chain_free = chain
        self.lnprobability = lnpch
        self.acceptance_fraction = (np.asarray(nacc, np.float64)
                                    / int(nsteps))
        self.hmc_step_size = np.asarray(eps, np.float64)
        self.hmc_mass = np.asarray(mass, np.float64)
        self._xla_keys = None            # extend() is stretch-only
        self._xla_counters = None
        if verbose:
            af = self.acceptance_fraction
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"HMC [{self.model.name}] over {S} sources: {W} chains x "
                f"{nsteps} steps, mean acceptance {af.mean():.3f}")
        return self

    # -- MAP triage tier (generic: mapfit sees only lnprob) -------------------------------
    def run_map(self, nstarts=8, n_adam=150, n_newton=12, adam_lr=0.1,
                verbose=False):
        """Batched MAP + Laplace quick fits for the whole catalog in ONE
        device program (the survey-triage tier; see MultiFitter.run_map
        for the workflow). Stores map_params (S, npar), map_lnprob (S,),
        map_cov (S, nfree, nfree), map_sigma (S, nfree), map_interior
        (S,) and returns self; map_cen(param) gives (S, 2) value+/-sigma."""
        from mbb_emcee_tpu.mapfit import (
            map_core, neg_hessian, laplace_cov_host, interior_mask,
            _to_unconstrained)

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        spec = self._effective_spec()
        lnprob_data, free_space = self._build_lnprob_data(spec)
        self.free_space = free_space
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError(
                "MAP fitting requires finite box bounds on every free "
                "parameter")
        S = self.nsources
        d = free_space.nfree
        lower = np.asarray(free_space.lower, np.float32)
        width = np.asarray(free_space.upper - free_space.lower, np.float32)
        if self.mesh is not None and S % self.mesh.devices.size:
            raise ValueError(
                f"the mesh size ({self.mesh.devices.size} devices) must "
                f"divide nsources={S}")
        cen_f = jnp.asarray(self._init[free_space.free_idx], jnp.float32)
        sca_f = jnp.asarray(self._scatter[free_space.free_idx],
                            jnp.float32)
        key = jax.random.key(self.seed, impl=self.prng_impl)

        def one_source(idx, flux_s, iunc_s, key, wave, cen, sca):
            lnp = lambda x: lnprob_data(x, wave, flux_s, iunc_s)
            x0 = make_initial_ball(
                jax.random.fold_in(key, idx), cen, sca, nstarts,
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

        ck = ("map", S, d, int(nstarts), int(n_adam), int(n_newton),
              float(adam_lr), _mesh_token(self.mesh),
              self._spec_token(spec), self.prng_impl,
              self._responses_token())
        if ck not in self._run_cache:
            f = jax.vmap(one_source,
                         in_axes=(0, 0, 0, None, None, None, None))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None), P(),
                              P(None), P(None), P(None)),
                    out_specs=(P(ax, None), P(ax), P(ax, None, None),
                               P(ax)))
            self._run_cache[ck] = jax.jit(f)
        flux_m, iunc_m = self._data_operands(free_space)
        x_map, lnp_map, H, gn = self._run_cache[ck](
            self._shard(jnp.arange(S)),
            self._shard(flux_m),
            self._shard(iunc_m),
            key, jnp.asarray(self.wave, jnp.float32), cen_f, sca_f)

        x_np = np.asarray(x_map, np.float64)
        self.map_params = free_space.expand(x_np)
        self.map_lnprob = np.asarray(lnp_map, np.float64)
        self.map_cov, h_ok = laplace_cov_host(np.asarray(H, np.float64))
        self.map_sigma = np.sqrt(np.maximum(
            np.diagonal(self.map_cov, axis1=1, axis2=2), 0.0))
        self.map_interior = h_ok & np.asarray(interior_mask(
            x_np, self.map_sigma,
            np.asarray(free_space.lower, np.float64),
            np.asarray(free_space.upper, np.float64)))
        self.map_grad_norm = np.asarray(gn, np.float64)
        self._map_token = self._posterior_token()
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            n_bad = int((~self.map_interior).sum())
            enable_console().info(
                f"MAP triage [{self.model.name}] over {S} sources x "
                f"{nstarts} starts: lnprob in [{self.map_lnprob.min():.1f},"
                f" {self.map_lnprob.max():.1f}]; {n_bad} modes at the box "
                f"edge (Laplace suspect -- run the MCMC for those)")
        return self

    def _require_map_fresh(self, what):
        if getattr(self, "map_params", None) is None:
            raise RuntimeError(f"{what} requires run_map() first")
        if self._posterior_token() != self._map_token:
            raise RuntimeError(
                f"{what}: the stored MAP fit is for a different posterior "
                f"-- the parameter space, data, or responses changed "
                f"since run_map(); re-run run_map() first")

    def map_importance(self, nsamples=512, seed=None, verbose=False):
        """Laplace importance sampling over the catalog: weighted
        true-posterior summaries without MCMC (see
        MultiFitter.map_importance for the ESS triage semantics).
        Stores map_samples (S, N, nfree), map_logw (S, N), map_ess (S,);
        returns map_ess."""
        from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR
        self._require_map_fresh("map_importance()")
        spec = self._effective_spec()
        lnprob_data, free_space = self._build_lnprob_data(spec)
        S = self.nsources
        d = free_space.nfree
        N = int(nsamples)

        L = np.linalg.cholesky(self.map_cov)
        logdet = np.sum(np.log(np.diagonal(L, axis1=1, axis2=2)), axis=1)
        mu = self.map_params[:, free_space.free_idx]
        key = jax.random.key(self.seed if seed is None else int(seed))
        eps = jax.random.normal(key, (S, N, d), jnp.float32)
        x = (jnp.asarray(mu, jnp.float32)[:, None, :]
             + jnp.einsum("snd,sed->sne", eps, jnp.asarray(L, jnp.float32)))

        def one(x_s, flux_s, iunc_s, wave):
            return jax.vmap(
                lambda th: lnprob_data(th, wave, flux_s, iunc_s))(x_s)

        ck = ("map_is", S, d, N, _mesh_token(self.mesh),
              self._spec_token(spec), self._responses_token())
        if ck not in self._run_cache:
            f = jax.vmap(one, in_axes=(0, 0, 0, None))
            if self.mesh is not None:
                ax = self.mesh.axis_names[0]
                f = jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(ax), P(ax, None), P(ax, None), P(None)),
                    out_specs=P(ax, None))
            self._run_cache[ck] = jax.jit(f)
        flux_i, iunc_i = self._data_operands(free_space)
        lnp = self._run_cache[ck](
            self._shard(x),
            self._shard(flux_i),
            self._shard(iunc_i),
            jnp.asarray(self.wave, jnp.float32))

        lnq = (-0.5 * np.sum(np.asarray(eps, np.float64) ** 2, axis=2)
               - logdet[:, None] - 0.5 * d * np.log(2.0 * np.pi))
        lnp = np.asarray(lnp, np.float64)
        logw = np.where(lnp > SUPPORT_FLOOR, lnp - lnq, -np.inf)
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
                f"Laplace importance sampling: N={N}/source, ess/N median "
                f"{np.median(frac):.2f} (min {frac.min():.2f})")
        return ess

    def map_par_cen(self, param, percentile=68.3):
        """(S, 3) weighted (median, +err, -err) from the importance-
        refined Laplace posterior (map_importance first)."""
        if getattr(self, "map_samples", None) is None:
            raise RuntimeError("map_importance() has not been called")
        i = self._param_index(param)
        free_idx = list(self.free_space.free_idx)
        if i not in free_idx:
            vals = self.map_params[:, i]
            return np.column_stack([vals, np.zeros_like(vals),
                                    np.zeros_like(vals)])
        col = self.map_samples[:, :, free_idx.index(i)]
        w = np.exp(self.map_logw)
        p = float(percentile)
        qs = np.array([50.0 - p / 2, 50.0, 50.0 + p / 2]) / 100.0
        out = np.empty((self.nsources, 3))
        for s in range(self.nsources):
            order = np.argsort(col[s])
            cw = np.cumsum(w[s][order])
            if cw[-1] <= 0.0:
                out[s] = (self.map_params[s, i], np.nan, np.nan)
                continue
            cw /= cw[-1]
            lo, mid, hi = np.interp(qs, cw, col[s][order])
            out[s] = (mid, hi - mid, mid - lo)
        return out

    def map_cen(self, param):
        """(S, 2) MAP value +/- Laplace sigma (sigma = 0 for fixed)."""
        if getattr(self, "map_params", None) is None:
            raise RuntimeError("run_map() has not been called")
        i = self._param_index(param)
        vals = self.map_params[:, i]
        free_idx = list(self.free_space.free_idx)
        sig = (self.map_sigma[:, free_idx.index(i)]
               if i in free_idx else np.zeros(self.nsources))
        return np.column_stack([vals, sig])

    # -- batched derived quantities -------------------------------------------------------
    def _source_redshifts(self, redshifts):
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
        """(S, nsamp, npar) thinned full-parameter samples, device-side."""
        self._require_run()
        S = self.nsources
        nfree = self.free_space.nfree
        free = jnp.reshape(self.chain_free,
                           (S, -1, nfree))[:, ::max(int(thin), 1), :]
        template = jnp.asarray(self.free_space.template, jnp.float32)
        scat = np.zeros((self.model.npar, nfree), np.float32)
        scat[self.free_space.free_idx, np.arange(nfree)] = 1.0
        return template[None, None, :] + free @ jnp.asarray(scat).T

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

            integ = np.asarray(jax.jit(jax.vmap(jax.vmap(
                one, in_axes=(0, None, None)), in_axes=(0, 0, 0)))(
                    samples, jnp.asarray(lam, jnp.float32),
                    jnp.asarray(w, jnp.float32)), np.float64)
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
            integ = np.asarray(
                jax.jit(jax.vmap(jax.vmap(one_z)))(samples), np.float64)
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
        self.peaklambda_chain = np.asarray(
            jax.jit(jax.vmap(jax.vmap(peak)))(samples), np.float64)
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
        fluxes = np.asarray(jax.jit(jax.vmap(jax.vmap(
            lambda th: fnu(th, waves_j))))(samples), np.float64)
        return derived.sed_band(fluxes, percentile, sample_axis=1)

    def posterior_predictive(self, thin=1, seed=0):
        """Batched chi-square-discrepancy PPC over the catalog (diagonal
        errors; missing bands and upper-limit slots excluded). Returns a
        multifit.PPCBatchResult -- the same QA sweep as the MBB batch
        surface, with band fluxes from the generic model."""
        from mbb_emcee_tpu.multifit import PPCBatchResult
        self._require_run()
        flux = np.asarray(self.flux, np.float64)
        S, nb = flux.shape
        iunc = self._iunc_operand()
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
        iu = jnp.asarray(np.where(inc, iunc, 0.0).astype(np.float32))
        with np.errstate(divide="ignore"):
            sg = jnp.asarray(np.where(inc, 1.0 / np.where(inc, iunc, 1.0),
                                      0.0).astype(np.float32))

        from mbb_emcee_tpu.sed import sed_band_flux_eval
        pack = self._response_pack()
        fluxes_fn = sed_band_flux_eval(self.model.fnu, self.wave, pack)

        def one(theta, key, y_s, a, b, m_s):
            m = fluxes_fn(theta)
            d = (m - y_s) * a
            eps = jax.random.normal(key, (nb,), jnp.float32) * m_s
            return jnp.sum(d * d), jnp.sum(eps * eps), m + b * eps

        samples = self._thinned(thin)
        N = int(samples.shape[1])
        keys = jax.random.split(jax.random.PRNGKey(int(seed)),
                                S * N).reshape(S, N, -1)
        batched = jax.jit(jax.vmap(
            jax.vmap(one, in_axes=(0, 0, None, None, None, None)),
            in_axes=(0, 0, 0, 0, 0, 0)))
        # Per-sample fan-out includes the response-node intermediates.
        inner = nb * (pack[0].shape[1] if pack is not None else 1)
        chunk = max(1, (64 << 20) // max(S * inner, 1))
        co, cr, yr = [], [], []
        for i in range(0, N, chunk):
            a_, b_, c_ = batched(samples[:, i:i + chunk],
                                 keys[:, i:i + chunk], y, iu, sg, mask)
            co.append(np.asarray(a_, np.float64))
            cr.append(np.asarray(b_, np.float64))
            yr.append(np.asarray(c_, np.float64))
        chi2_obs = np.concatenate(co, axis=1)
        chi2_rep = np.concatenate(cr, axis=1)
        y_rep = np.concatenate(yr, axis=1)
        band_p = np.where(inc, np.mean(y_rep >= y_h[:, None, :], axis=1),
                          np.nan)
        return PPCBatchResult(
            p_value=np.mean(chi2_rep >= chi2_obs, axis=1),
            band_p=band_p, chi2_obs=chi2_obs, chi2_rep=chi2_rep,
            ndata=ndata, nfree=self.free_space.nfree, nsamples=N,
            excluded=~inc)

    def compute_loo(self, thin=1):
        """Batched WAIC + PSIS-LOO predictive assessment -- the
        generic-model analog of MultiFitter.compute_loo (see
        modelcheck.py for the estimators). Diagonal errors; missing
        bands and upper-limit slots are excluded (NaN in the pointwise
        arrays). Returns (and stores as .loo_result) a
        modelcheck.LooBatchResult."""
        from mbb_emcee_tpu import modelcheck
        self._require_run()
        flux = np.asarray(self.flux, np.float64)
        S, nb = flux.shape
        iunc = self._iunc_operand()
        inc = iunc > 0
        if np.any(~inc.any(axis=1)):
            bad = int(np.argwhere(~inc.any(axis=1))[0, 0])
            raise RuntimeError(
                f"compute_loo: source {bad} has no detected "
                f"(non-missing, non-upper-limit) band")
        y = jnp.asarray(np.where(inc, np.nan_to_num(flux),
                                 0.0).astype(np.float32))
        iu = jnp.asarray(np.where(inc, iunc, 0.0).astype(np.float32))
        lam_diag = np.where(inc, iunc, np.nan) ** 2

        from mbb_emcee_tpu.sed import sed_band_flux_eval
        pack = self._response_pack()
        fluxes_fn = sed_band_flux_eval(self.model.fnu, self.wave, pack)

        def one(theta, y_s, a):
            d = (fluxes_fn(theta) - y_s) * a
            return -0.5 * d * d

        samples = self._thinned(thin)
        N = int(samples.shape[1])
        batched = jax.jit(jax.vmap(
            jax.vmap(one, in_axes=(0, None, None)), in_axes=(0, 0, 0)))
        # Per-sample fan-out includes the response-node intermediates.
        inner = nb * (pack[0].shape[1] if pack is not None else 1)
        chunk = max(1, (64 << 20) // max(S * inner, 1))
        qs = []
        for i in range(0, N, chunk):
            qs.append(np.asarray(batched(samples[:, i:i + chunk], y, iu),
                                 np.float64))
        q = np.concatenate(qs, axis=1)
        with np.errstate(invalid="ignore"):
            lnnorm = 0.5 * (np.log(lam_diag) - np.log(2.0 * np.pi))
        self.loo_result = modelcheck.loo_batch_from_loglik(
            q + lnnorm[:, None, :], inc)
        return self.loo_result

    def compute_evidence(self, nlive=512, nbatch=32, nsteps=32,
                         max_iter=3000, tol=1e-4, seed=None,
                         verbose=False):
        """Per-source Bayesian evidences ln Z for the whole batch in ONE
        device program -- the generic-model analog of
        MultiFitter.compute_evidence (same prior convention: normalized
        uniform over the free box times configured Gaussian priors); run
        once per model variant over the same catalog and difference the
        (S,) logz vectors for per-source Bayes factors. Needs data but
        not a prior run(); a configured mesh shards the independent
        per-source runs. Returns NestedBatchResult (samples expanded to
        the full parameter space); stored as self.evidence."""
        from mbb_emcee_tpu.nested import make_nested_batch_runner

        if self.flux is None:
            raise RuntimeError("no data; call set_data")
        spec = self._effective_spec()
        S = self.nsources
        if self.mesh is not None and S % self.mesh.devices.size:
            raise ValueError(
                f"the mesh size ({self.mesh.devices.size} devices) must "
                f"divide nsources={S}")
        lnprob_data, free_space = self._build_lnprob_data(spec)
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError("nested sampling requires finite box bounds")
        ck = ("nested", S, int(nlive), int(nbatch), int(nsteps),
              int(max_iter), float(tol), _mesh_token(self.mesh),
              self._spec_token(spec), self._responses_token(),
              self.wave.tobytes())
        if ck not in self._run_cache:
            wave = np.asarray(self.wave, np.float32)

            def ll(theta_free, flux, iunc):
                return lnprob_data(theta_free, wave, flux, iunc)

            self._run_cache[ck] = make_nested_batch_runner(
                ll, free_space.lower, free_space.upper, nlive=nlive,
                nbatch=nbatch, nsteps=nsteps, max_iter=max_iter, tol=tol,
                mesh=self.mesh)
        data = self._data_operands(free_space)
        key = jax.random.key(self.seed if seed is None else int(seed))
        res = self._run_cache[ck](key, data)
        res.samples = free_space.expand(res.samples)
        self.evidence = res
        if verbose:
            from mbb_emcee_tpu.utils.log import enable_console
            enable_console().info(
                f"nested sampling [{self.model.name}] over {S} sources: "
                f"lnZ in [{res.logz.min():.2f}, {res.logz.max():.2f}], "
                f"median err {np.median(res.logz_err):.3f}")
        return res

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
            if self.source_names is not None:
                f.create_dataset("SourceNames", data=np.array(
                    [n.encode() for n in self.source_names]))
            if self.redshifts is not None:
                f.create_dataset("Redshifts", data=self.redshifts)
            spec = self._spec
            pc = f.create_group("ParamConfig")
            pc.create_dataset("Lower", data=spec.lower)
            pc.create_dataset("Upper", data=spec.upper)
            pc.create_dataset("Fixed", data=spec.fixed.astype(np.uint8))
            pc.create_dataset("FixedValues", data=spec.fixed_values)
            pc.create_dataset("PriorMean", data=spec.prior_mean)
            pc.create_dataset("PriorInvSigma", data=spec.prior_isigma)
            pc.create_dataset("Initial", data=self._init)
            pc.create_dataset("InitScatter", data=self._scatter)
            if spec.uplim_bands is not None:
                pc.create_dataset("PhotUpperLimits",
                                  data=np.asarray(spec.uplim_bands,
                                                  np.uint8))
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
