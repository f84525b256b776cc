"""Generic SED fitting: bring-your-own JAX model through the full stack.

The reference fits exactly one model family -- the modified blackbody
(ref: mbb_emcee/modified_blackbody.py, SURVEY.md C1). Everything around
that model (likelihood with covariance/limits/priors/fixed params, the
affine-invariant ensemble run protocol, response-curve band integration,
percentile summaries, derived-quantity posteriors, HDF5 persistence,
posterior-predictive checks) is model-agnostic, and this module exposes
it as a first-class surface: describe any SED as a pure JAX function

    fnu(theta, wave) -> f_nu  [mJy at observed-frame wave um]

and `SEDFitter`/`SEDResults` run the same TPU-first pipeline the MBB
classes do -- the whole ensemble update is one fused XLA step vmapped
over walkers, derived quantities are one batched device call over the
chain. The two-temperature greybody of examples/custom_model.py is the
canonical use; any jax-traceable parametric SED works (power laws, AGN
torus templates, polynomial continua, sums of components).

ADDITIVE capability: the reference has no user-model surface (its
fitter constructs `modified_blackbody` objects internally). This module
is the generalization of mbb_emcee_tpu.fitter/results, sharing their
machinery (FreeSpace reduced-space sampling, LikelihoodSpec, the
EnsembleSampler tier, derived.py quadrature rules) so the two surfaces
cannot drift. Intentional scope bounds, documented rather than implied:
dust mass is MBB physics (kappa B_nu(T) needs a temperature parameter)
and stays on MBBResults; the fused Pallas kernels are specialized to
the 5-parameter MBB chain, so SEDFitter runs the portable XLA sampler
tier (one compiled program per geometry; DESIGN.md section 2) -- for
single fits that tier already exceeds the 100x BASELINE target.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.likelihood import (
    Photometry, LikelihoodSpec, FreeSpace, LNPROB_FLOOR, spec_arrays)
from mbb_emcee_tpu.paramspace import ParamSpaceMixin
from mbb_emcee_tpu.sampler import (
    EnsembleSampler, make_initial_ball, split_rhat, autocorrelation_time)
from mbb_emcee_tpu.models.cosmology import (
    Cosmology, luminosity_distance, luminosity_distance_batch)
from mbb_emcee_tpu import derived
from mbb_emcee_tpu.results import _percentile_summary, PPCResult

_SED_SCHEMA_VERSION = 1

# see SEDModel.__post_init__ / batchengine._PROGRAM_CACHE
_SED_MODEL_NONCE = __import__("itertools").count()


@dataclasses.dataclass(frozen=True)
class SEDModel:
    """A parametric SED: a pure JAX flux function plus its parameter space.

    fnu(theta, wave): theta is a (npar,) jnp vector, wave an observed-frame
    wavelength array in um OF ANY SHAPE (scalars, the (nbands,) data grid,
    (nbands, nnodes) response-quadrature nodes, (nquad,) L_IR nodes);
    return f_nu in mJy with wave's shape. Implement it with broadcasting
    jnp ops (everything in models/modified_blackbody.py qualifies) and it
    holds automatically. Must be jax-traceable: jit/vmap/grad are applied
    to it, so no Python control flow on traced values.

    lower/upper form the default hard sampling box (narrow per-fit via
    SEDFitter.set_lowlim/set_uplim). `name` labels HDF5 persistence so a
    reload can refuse a mismatched model.

    `guess` (optional) is a HOST-side data-driven initializer -- the
    generic analog of MBBFitter's flux heuristics (T from the brightest
    band, fnorm from the flux near wavenorm), closing the
    manual-set_param_init footgun on the serving surface:
    guess(wave (nb,), flux (nb,), unc (nb,)) -> (npar,) numpy initial
    centers for ONE source (plain numpy in, numpy out; called once per
    source at init time, never traced). Entries returned as NaN fall
    back to the default (box-center) seed; values are clipped just
    inside the box; explicit set_param_init calls always win. Missing
    bands arrive as (flux=0, unc=inf) in batched catalogs.
    """
    fnu: Callable
    param_names: tuple
    lower: np.ndarray
    upper: np.ndarray
    name: str = "custom-sed"
    guess: Callable = None

    def __post_init__(self):
        names = tuple(str(n) for n in self.param_names)
        object.__setattr__(self, "param_names", names)
        lo = np.atleast_1d(np.asarray(self.lower, np.float64))
        hi = np.atleast_1d(np.asarray(self.upper, np.float64))
        object.__setattr__(self, "lower", lo)
        object.__setattr__(self, "upper", hi)
        if len(names) != len(set(n.lower() for n in names)):
            raise ValueError("parameter names must be unique "
                             "(case-insensitive)")
        if lo.shape != (len(names),) or hi.shape != (len(names),):
            raise ValueError(
                f"lower/upper must be ({len(names)},) arrays matching "
                f"param_names")
        if np.any(lo >= hi):
            raise ValueError("each lower limit must be < its upper limit")
        # Monotonic construction nonce: a collision-free identity for the
        # cross-instance traced-program cache (batchengine). Object
        # addresses recycle; this never does, so two models only share
        # programs when they literally ARE the same object.
        object.__setattr__(self, "nonce", next(_SED_MODEL_NONCE))

    @property
    def npar(self):
        return len(self.param_names)

    def param_index(self, name_or_idx):
        """Name (case-insensitive) or index -> index, mirroring
        likelihood.param_index for this model's parameter list."""
        if isinstance(name_or_idx, (int, np.integer)):
            idx = int(name_or_idx)
            if not 0 <= idx < self.npar:
                raise ValueError(f"parameter index {idx} out of range")
            return idx
        key = str(name_or_idx).lower()
        lowered = [n.lower() for n in self.param_names]
        if key in lowered:
            return lowered.index(key)
        raise ValueError(f"unknown parameter {name_or_idx!r}; "
                         f"known: {list(self.param_names)}")

    def validate(self, wave=None):
        """Evaluate fnu at the box center on a small grid and check
        shape/finiteness -- catches signature mistakes before they surface
        as an opaque trace error inside the sampler."""
        wave = np.array([100.0, 250.0, 500.0]) if wave is None \
            else np.atleast_1d(np.asarray(wave, np.float64))
        theta = jnp.asarray(0.5 * (self.lower + self.upper), jnp.float32)
        out = np.asarray(self.fnu(theta, jnp.asarray(wave, jnp.float32)))
        if out.shape != wave.shape:
            raise ValueError(
                f"{self.name}: fnu returned shape {out.shape} for wave "
                f"shape {wave.shape}; it must preserve wave's shape")
        if not np.all(np.isfinite(out)):
            raise ValueError(
                f"{self.name}: fnu is non-finite at the box center "
                f"(theta={np.asarray(theta)}) -- tighten lower/upper or "
                f"guard the model")
        return self


def apply_model_guess(model, wave, flux, unc, init, scatter,
                      user_init, user_scatter):
    """Fold one source's SEDModel.guess into (init, scatter) IN PLACE.

    Non-user-set entries take the guess (NaN entries keep the default),
    clipped 1% inside the box; their scatter becomes 10% of the guessed
    magnitude (floored at 2% of the box width) unless the user set one.
    Returns (init, scatter) for chaining."""
    if model.guess is None:
        return init, scatter
    g = np.asarray(model.guess(np.asarray(wave, np.float64),
                               np.asarray(flux, np.float64),
                               np.asarray(unc, np.float64)), np.float64)
    if g.shape != (model.npar,):
        raise ValueError(
            f"{model.name}.guess returned shape {g.shape}; need "
            f"({model.npar},)")
    lo, hi = model.lower, model.upper
    width = hi - lo
    gc = np.clip(g, lo + 0.01 * width, hi - 0.01 * width)
    take = ~np.asarray(user_init, bool) & np.isfinite(g)
    init[take] = gc[take]
    stake = take & ~np.asarray(user_scatter, bool)
    scatter[stake] = np.maximum(0.1 * np.abs(gc[stake]),
                                0.02 * width[stake])
    return init, scatter


def build_sed_lnprob(phot: Photometry, model: SEDModel,
                     spec: LikelihoodSpec, response_pack=None,
                     dtype=jnp.float32):
    """Generic-model twin of likelihood.build_lnprob: identical whitening /
    box / prior / upper-limit semantics (see there for the design notes --
    host-numpy closure constants, finite lnprob floor, reduced-space
    sampling), with the MBB eval swapped for `model.fnu`.

    Returns (lnprob_fn, free_space); lnprob_fn maps (nfree,) -> scalar.
    """
    if spec.lower.size != model.npar:
        raise ValueError(
            f"spec is sized for {spec.lower.size} parameters; model "
            f"{model.name!r} has {model.npar}")
    sa = spec_arrays(spec, dtype)
    free_space = sa.free_space
    (template, scatter, lo_free, hi_free, lo_full, hi_full,
     prior_mean, prior_isig) = sa[1:]

    data_flux = np.asarray(phot.flux, dtype)
    data_wave = np.asarray(phot.wave, dtype)

    if phot.cov is not None:
        whiten = np.asarray(np.linalg.inv(np.linalg.cholesky(phot.cov)),
                            dtype)
        diag_iunc = None
    else:
        whiten = None
        diag_iunc = np.asarray(1.0 / phot.unc, dtype)

    if spec.uplim_bands is not None and spec.uplim_bands.any():
        uplim_mask = np.asarray(spec.uplim_bands.astype(np.float32), dtype)
        det_mask = 1.0 - uplim_mask
    else:
        uplim_mask = det_mask = None

    if response_pack is not None:
        resp_waves = np.asarray(response_pack[0]).astype(dtype)
        resp_weights = np.asarray(response_pack[1]).astype(dtype)

    fnu = model.fnu

    def model_fluxes(theta):
        if response_pack is None:
            return fnu(theta, data_wave)
        return jnp.sum(resp_weights * fnu(theta, resp_waves), axis=-1)

    def lnprob(theta_free):
        theta = template + scatter @ theta_free
        inbox = jnp.all((theta_free >= lo_free) & (theta_free <= hi_free))
        theta_safe = jnp.clip(theta, lo_full, hi_full)
        delta = model_fluxes(theta_safe) - data_flux
        if uplim_mask is not None:
            delta = det_mask * delta + uplim_mask * jnp.maximum(delta, 0.0)
        if whiten is not None:
            r = whiten @ delta
        else:
            r = delta * diag_iunc
        lnl = -0.5 * jnp.sum(r * r)
        dp = (theta - prior_mean) * prior_isig
        lnpri = -0.5 * jnp.sum(dp * dp)
        return jnp.where(inbox, lnl + lnpri, dtype(LNPROB_FLOOR))

    return lnprob, free_space


def sed_band_flux_eval(fnu, wave, response_pack=None):
    """Per-sample device closure: the generic model's BAND fluxes --
    point evaluation at the data wavelengths, or response-integrated
    over a quadrature pack. The generic twin of derived.band_flux_eval
    and the ONE place this convention lives: posterior_predictive and
    compute_loo on both generic surfaces (SEDResults, SEDMultiFitter)
    reuse it, so the PPC and LOO band fluxes can never diverge from
    each other or from the fitted likelihood's evaluation mode."""
    if response_pack is None:
        wave32 = np.asarray(wave, np.float32)

        def fluxes(theta):
            return fnu(theta, wave32)
        return fluxes

    nodes = np.asarray(response_pack[0], np.float32)
    wts = np.asarray(response_pack[1], np.float32)

    def fluxes(theta):
        return jnp.sum(wts * fnu(theta, nodes), axis=-1)
    return fluxes


def build_sed_lnprob_data(model: SEDModel, spec: LikelihoodSpec,
                          response_pack=None, dtype=jnp.float32,
                          correlated=False):
    """Generic-model twin of likelihood.build_lnprob_data: the photometry
    arrives as ARGUMENTS so one traced function serves every source of a
    batch under vmap (sedmulti.SEDMultiFitter).

    Returns (lnprob_fn, free_space) with
        lnprob_fn(theta_free (nfree,), wave (nb,), flux (nb,), iunc (nb,))
    where iunc is SIGNED 1/sigma: negative marks a one-sided upper-limit
    band, exactly 0 a missing band (likelihood.signed_iunc).

    With correlated=True the 4th argument is instead a per-source
    (nb, nb) WHITENING matrix W with r = W @ delta (correlated band
    errors -- the generic-tier analog of likelihood.build_lnprob_data's
    covariance mode; SEDMultiFitter.set_band_correlation builds W
    host-side honoring each source's missing-band pattern). One-sided
    upper limits do not compose with correlated errors;
    spec.uplim_bands must be unset.
    """
    if spec.lower.size != model.npar:
        raise ValueError(
            f"spec is sized for {spec.lower.size} parameters; model "
            f"{model.name!r} has {model.npar}")
    if correlated and spec.uplim_bands is not None and np.any(
            np.asarray(spec.uplim_bands)):
        raise ValueError(
            "photometric upper limits (one-sided likelihood) do not "
            "compose with correlated band errors; unset one of them")
    sa = spec_arrays(spec, dtype)
    free_space = sa.free_space
    (template, scatter, lo_free, hi_free, lo_full, hi_full,
     prior_mean, prior_isig) = sa[1:]

    if response_pack is not None:
        resp_waves = np.asarray(response_pack[0]).astype(dtype)
        resp_weights = np.asarray(response_pack[1]).astype(dtype)

    fnu = model.fnu

    def lnprob(theta_free, wave, flux, iunc):
        theta = template + scatter @ theta_free
        inbox = jnp.all((theta_free >= lo_free) & (theta_free <= hi_free))
        theta_safe = jnp.clip(theta, lo_full, hi_full)
        if response_pack is None:
            model_flux = fnu(theta_safe, wave)
        else:
            model_flux = jnp.sum(resp_weights * fnu(theta_safe, resp_waves),
                                 axis=-1)
        delta = model_flux - flux
        if correlated:
            # iunc is a per-source (nb, nb) whitening matrix (zero
            # rows/cols at missing bands -- exact marginalization,
            # precomputed host-side from the pattern submatrices).
            r = iunc @ delta
        else:
            # Sign-encoded upper limits / missing bands ride the iunc
            # operand (see likelihood.build_lnprob_data).
            delta = jnp.where(iunc < 0, jnp.maximum(delta, 0.0), delta)
            r = delta * jnp.abs(iunc)
        lnl = -0.5 * jnp.sum(r * r)
        dp = (theta - prior_mean) * prior_isig
        lnpri = -0.5 * jnp.sum(dp * dp)
        return jnp.where(inbox, lnl + lnpri, dtype(LNPROB_FLOOR))

    return lnprob, free_space


class SEDFitter(ParamSpaceMixin):
    """Fit a user SEDModel to photometry with the reference's protocol.

    The orchestration mirrors MBBFitter (ref: mbb_fitter.run burn ->
    re-center on the best burn-in sample -> re-burn -> reset ->
    production; SURVEY.md section 3.1) on the portable XLA sampler tier.
    All the parameter-space setters (set_lowlim/set_uplim/fix_param/
    set_gaussian_prior/set_param_init) and the data surface
    (set_data/read_data/read_cov/set_responses/set_phot_upperlimits)
    keep the MBB fitter's names and semantics, addressed by the MODEL's
    parameter names.

    Unlike MBBFitter there is no data-driven auto-seed (a generic model
    has no 'temperature from the brightest band' heuristic): walkers
    start in a ball around the box center with 5%-of-center scatter
    unless set_param_init() says otherwise -- set it for anything beyond
    quick looks.
    """

    def __init__(self, model: SEDModel, nwalkers=250, photfile=None,
                 redshift=None, seed=207, a=2.0):
        if not isinstance(model, SEDModel):
            raise TypeError("model must be an SEDModel")
        model.validate()
        from mbb_emcee_tpu.utils.compilecache import (
            enable_persistent_cache)
        enable_persistent_cache()
        self.model = model
        self.nwalkers = int(nwalkers)
        self.redshift = None if redshift is None else float(redshift)
        self.seed = int(seed)
        self.a = float(a)
        self.responses = None

        self._spec = LikelihoodSpec.for_box(model.lower, model.upper)
        center = 0.5 * (model.lower + model.upper)
        self._init = center.copy()
        self._scatter = np.where(np.abs(center) > 0,
                                 0.05 * np.abs(center),
                                 0.05 * (model.upper - model.lower))
        self._user_init = np.zeros(model.npar, bool)
        self._user_scatter = np.zeros(model.npar, bool)

        self.phot = None
        self.chain_free = None
        self.lnprobability = None   # (nsteps, nwalkers)
        self.burn_chain_free = None
        self.free_space = None
        self.thin = 1
        self._state = None
        self._sampler = None
        self._run_token = None

        if photfile is not None:
            self.read_data(photfile)

    # -- ParamSpaceMixin hooks ---------------------------------------------------------
    def _param_index(self, param):
        return self.model.param_index(param)

    def _effective_spec(self):
        # No shape-implied fixing for generic models.
        return self._spec

    # -- data --------------------------------------------------------------------------
    def _refuse_uplim_cov(self):
        """The uplim-vs-covariance invariant must hold in BOTH setter
        orders: set_phot_upperlimits refuses when a covariance is
        attached, and attaching a covariance must equally refuse when
        limits are already set (the combination the generic tier
        declares ill-defined would otherwise compose silently)."""
        ul = self._spec.uplim_bands
        if ul is not None and np.asarray(ul).any():
            raise ValueError("photometric upper limits do not compose "
                             "with a full covariance")

    def set_data(self, wave, flux, unc, cov=None, band_names=None):
        if cov is not None:
            self._refuse_uplim_cov()
        self.phot = Photometry(wave, flux, unc, cov=cov,
                               band_names=band_names)
        apply_model_guess(self.model, self.phot.wave, self.phot.flux,
                          self.phot.unc, self._init, self._scatter,
                          self._user_init, self._user_scatter)
        return self

    def read_data(self, photfile):
        """Text photometry '[name] wave flux unc' (see
        Photometry.from_file)."""
        self.phot = Photometry.from_file(photfile)
        apply_model_guess(self.model, self.phot.wave, self.phot.flux,
                          self.phot.unc, self._init, self._scatter,
                          self._user_init, self._user_scatter)
        return self

    def read_cov(self, covfile, covextn=0, is_total=False):
        self._refuse_uplim_cov()
        self._require_data().read_cov(covfile, covextn, is_total=is_total)
        return self

    def set_responses(self, response_set):
        """Instrument response curves (response.ResponseSet); requires
        named photometry bands. Band fluxes are then response-integrated
        exactly as in MBBFitter's response mode."""
        self.responses = response_set
        return self

    def set_phot_upperlimits(self, mask):
        """Mark photometry bands as upper limits (one-sided penalty for
        model flux above the quoted value)."""
        phot = self._require_data()
        mask = np.asarray(mask, bool)
        if mask.shape != (phot.nbands,):
            raise ValueError(
                f"uplim mask shape {mask.shape} != ({phot.nbands},)")
        if phot.cov is not None and mask.any():
            raise ValueError("photometric upper limits do not compose "
                             "with a full covariance")
        self._spec = dataclasses.replace(self._spec, uplim_bands=mask)
        return self

    def _require_data(self):
        if self.phot is None:
            raise RuntimeError("no photometry; call set_data/read_data")
        return self.phot

    def _response_pack(self):
        if self.responses is None:
            return None
        phot = self._require_data()
        if phot.band_names is None:
            raise ValueError("response mode requires named photometry bands")
        return self.responses.pack(phot.band_names)

    # -- lnprob ------------------------------------------------------------------------
    def build(self):
        """(lnprob, free_space, sampler) for the current data + spec."""
        lnprob, free_space = build_sed_lnprob(
            self._require_data(), self.model, self.spec,
            response_pack=self._response_pack())
        sampler = EnsembleSampler(self.nwalkers, free_space.nfree, lnprob,
                                  a=self.a)
        return lnprob, free_space, sampler

    def __call__(self, params):
        """lnprob at a FULL parameter vector (MBBFitter.__call__
        semantics): fixed-parameter values in `params` override the
        configured ones for this evaluation; the box and priors still
        apply to every slot. The built+jitted closure is cached on a
        content token -- ported per-sample loops must not pay a rebuild
        per call."""
        params = np.asarray(params, np.float64)
        if params.shape != (self.model.npar,):
            raise ValueError(
                f"expected a ({self.model.npar},) full parameter vector")
        spec = self.spec
        n = self.model.npar
        open_spec = dataclasses.replace(
            spec, fixed=np.zeros(n, bool), fixed_values=np.zeros(n))
        token = self._posterior_token()
        cache = getattr(self, "_call_cache", None)
        if cache is None or cache[0] != token:
            lnprob, _ = build_sed_lnprob(
                self._require_data(), self.model, open_spec,
                response_pack=self._response_pack())
            cache = (token, jax.jit(lnprob))
            self._call_cache = cache
        return float(cache[1](jnp.asarray(params, jnp.float32)))

    # -- the run -----------------------------------------------------------------------
    def run(self, nburn=50, nsteps=250, thin=1, p0=None,
            recenter_burn=True, verbose=False, init="auto"):
        """Burn -> re-center on the best burn-in sample -> re-burn ->
        reset -> production (the reference protocol). Stores the
        production chain; wrap in SEDResults for analysis/persistence.
        init='map' seeds the walker ball at the fit_map() mode with
        ~2 Laplace-sigma scatter (triage-then-refine; requires fit_map
        on this data first). Returns self."""
        if int(thin) < 1:
            raise ValueError(f"thin={thin} must be >= 1")
        if int(nsteps) % int(thin):
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if init not in ("auto", "map"):
            raise ValueError(f"init must be 'auto' or 'map'; got {init!r}")
        if init == "map" and p0 is not None:
            raise ValueError("init='map' conflicts with an explicit p0")
        thin = int(thin)
        lnprob, free_space, sampler = self.build()
        self.free_space = free_space
        self.thin = thin

        key = jax.random.PRNGKey(self.seed)
        key, kball = jax.random.split(key)
        if p0 is None:
            if init == "map":
                self._require_map_fresh("run(init='map')")
                r = self.map_result
                if r.x.size != free_space.nfree:
                    raise RuntimeError(
                        "the parameter space changed since fit_map(); "
                        "re-run fit_map before init='map'")
                center = np.asarray(r.x, np.float64)
                base = self._scatter[free_space.free_idx]
                # cap degenerate Laplace sigmas (same rule as MBBFitter)
                scatter = np.minimum(
                    np.clip(2.0 * r.sigma, 1e-6, None), base * 10.0)
            else:
                center = self._init[free_space.free_idx]
                scatter = self._scatter[free_space.free_idx]
            p0 = make_initial_ball(kball, center, scatter, self.nwalkers,
                                   free_space.lower, free_space.upper)
        else:
            p0 = jnp.asarray(p0, jnp.float32)
            if p0.shape[-1] == self.model.npar:
                p0 = p0[..., free_space.free_idx]
        state = sampler.init_state(key, p0)

        if nburn > 0:
            state, bchain, blnp = sampler.run_mcmc(state, nburn)
            self.burn_chain_free = bchain
            if recenter_burn:
                flat = np.asarray(bchain).reshape(-1, free_space.nfree)
                best = jnp.asarray(
                    flat[np.argmax(np.asarray(blnp).reshape(-1))],
                    jnp.float32)
                key2, kball2 = jax.random.split(state.key)
                tight = self._scatter[free_space.free_idx] * 0.1
                p0b = make_initial_ball(kball2, best, tight, self.nwalkers,
                                        free_space.lower, free_space.upper)
                state = sampler.init_state(key2, p0b)
                state = sampler.advance(state, nburn)
            state = sampler.reset_counters(state)

        state, chain, lnp = sampler.run_mcmc(state, nsteps, thin)
        self.chain_free = chain                    # (nrec, nwalkers, nfree)
        self.lnprobability = np.asarray(lnp)       # (nrec, nwalkers)
        self._state = state
        self._sampler = sampler
        self._acceptance = np.asarray(
            EnsembleSampler.acceptance_fraction(state))
        self._run_token = self._posterior_token()
        if verbose:
            print(f"SEDFitter[{self.model.name}]: acceptance "
                  f"{np.mean(self.acceptance_fraction):.3f}, "
                  f"max split-R-hat {self.gelman_rubin()[1].max():.3f}")
        return self

    def extend(self, nsteps):
        """Continue the production run (same posterior, same PRNG stream)
        and append to the stored chain -- the run-until-converged loop."""
        if self._state is None:
            raise RuntimeError("extend() needs a finished run()")
        if self._posterior_token() != self._run_token:
            raise RuntimeError(
                "the posterior (spec/data/responses) changed since run(); "
                "re-run instead of extending across different targets")
        if int(nsteps) % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}")
        state, chain, lnp = self._sampler.run_mcmc(
            self._state, int(nsteps), self.thin)
        self.chain_free = jnp.concatenate(
            [self.chain_free, chain], axis=0)
        self.lnprobability = np.concatenate(
            [self.lnprobability, np.asarray(lnp)], axis=0)
        self._state = state
        self._acceptance = np.asarray(
            EnsembleSampler.acceptance_fraction(state))
        return self

    def _posterior_token(self):
        from mbb_emcee_tpu.checkpoint import data_fingerprint
        phot = self._require_data()
        pack = self._response_pack()
        spec = self.spec
        uplim = (None if spec.uplim_bands is None
                 else np.asarray(spec.uplim_bands))
        spec_fp = data_fingerprint(
            spec.lower, spec.upper, spec.fixed, spec.fixed_values,
            spec.prior_mean, spec.prior_isigma, uplim,
            np.asarray([self.a]))
        return (data_fingerprint(phot.wave, phot.flux, phot.unc, phot.cov,
                                 *(() if pack is None else pack)),
                spec_fp, self.model.name)

    # -- alternative sampler tiers (all generic: they see only lnprob) -------------------
    def run_hmc(self, nwarmup=500, nsteps=1000, thin=1, n_leapfrog=16,
                target_accept=0.8, nchains=None, p0=None, verbose=False):
        """Gradient-based HMC alternative to run() -- the user model is
        pure JAX, so jax.grad works with no extra code (same tier as
        MBBFitter.run_hmc). Downstream analysis (results(), gelman_rubin,
        writeToHDF5) is unchanged; extend() does not apply (re-run with
        more nsteps)."""
        from mbb_emcee_tpu.hmc import hmc_sample

        nchains = self.nwalkers if nchains is None else int(nchains)
        lnprob, free_space = build_sed_lnprob(
            self._require_data(), self.model, self.spec,
            response_pack=self._response_pack())
        self.free_space = free_space
        self.thin = int(thin)
        key = jax.random.PRNGKey(self.seed)
        key, kball = jax.random.split(key)
        if p0 is None:
            p0 = make_initial_ball(kball, self._init[free_space.free_idx],
                                   self._scatter[free_space.free_idx],
                                   nchains, free_space.lower,
                                   free_space.upper)
        else:
            p0 = jnp.asarray(p0, jnp.float32)
            if p0.shape[-1] == self.model.npar:
                p0 = p0[..., free_space.free_idx]
        res = hmc_sample(lnprob, free_space.lower, free_space.upper, p0,
                         key, nwarmup=nwarmup, nsteps=nsteps, thin=thin,
                         n_leapfrog=n_leapfrog,
                         target_accept=target_accept)
        self.chain_free = res.chain
        self.lnprobability = np.asarray(res.lnprob)
        self._acceptance = np.asarray(res.acceptance_fraction)
        self._state = self._sampler = None   # extend() is stretch-only
        self.burn_chain_free = None
        if verbose:
            print(f"HMC[{self.model.name}]: mean acceptance "
                  f"{self._acceptance.mean():.3f}, step size "
                  f"{res.step_size:.4g}, {nchains} chains x {nsteps} steps")
        return self

    def run_pt(self, nrungs=12, beta_min="auto", nburn=300, nsteps=1000,
               nchains=None, thin=1, p0=None, verbose=False):
        """Parallel-tempering alternative to run() for multimodal
        posteriors (same tier as MBBFitter.run_pt): K rungs advance as
        one batched device program with replica exchange; the recorded
        chain is the cold rung, and the run also yields the evidence
        (self.logz_pt stepping-stone, self.logz_ti thermodynamic
        check)."""
        from mbb_emcee_tpu.tempering import pt_sample

        nchains = self.nwalkers if nchains is None else int(nchains)
        lnprob, free_space = build_sed_lnprob(
            self._require_data(), self.model, self.spec,
            response_pack=self._response_pack())
        self.free_space = free_space
        self.thin = int(thin)
        key = jax.random.PRNGKey(self.seed)
        key, kball = jax.random.split(key)
        if p0 is None:
            p0 = make_initial_ball(kball, self._init[free_space.free_idx],
                                   self._scatter[free_space.free_idx],
                                   nchains, free_space.lower,
                                   free_space.upper)
        else:
            p0 = jnp.asarray(p0, jnp.float32)
            if p0.shape[-1] == self.model.npar:
                p0 = p0[..., free_space.free_idx]
        res = pt_sample(lnprob, p0, key, nrungs=nrungs, beta_min=beta_min,
                        nburn=nburn, nsteps=nsteps, thin=thin, a=self.a)
        self.chain_free = jnp.asarray(res.chain)
        self.lnprobability = np.asarray(res.lnprob)
        self._acceptance = np.asarray(res.acceptance_fraction[0])
        self.logz_pt = (res.logz, res.logz_err)
        self.logz_ti = (res.logz_ti, res.logz_ti_err)
        self.pt_result = res
        self._state = self._sampler = None
        self.burn_chain_free = None
        if verbose:
            print(f"PT[{self.model.name}]: {res.betas.size} rungs x "
                  f"{nchains} walkers, cold acceptance "
                  f"{self._acceptance.mean():.3f}, stepping-stone lnZ = "
                  f"{res.logz:.3f} +/- {res.logz_err:.3f}")
        return self

    def compute_evidence(self, nlive=512, nbatch=32, nsteps=32,
                         max_iter=3000, tol=1e-4, seed=None,
                         verbose=False):
        """Bayesian evidence ln Z of THIS model configuration via nested
        sampling -- Bayes factors between model variants (1- vs 2-
        component, free vs fixed parameters) on the same data and prior
        convention as MBBFitter.compute_evidence: normalized uniform
        prior over the free box times any configured Gaussian prior
        factors. Returns a NestedResult with samples expanded to the
        full parameter space."""
        from mbb_emcee_tpu.nested import nested_sample

        lnprob, free_space = build_sed_lnprob(
            self._require_data(), self.model, self.spec,
            response_pack=self._response_pack())
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError("nested sampling requires finite box bounds")
        key = jax.random.PRNGKey(self.seed if seed is None else int(seed))
        # Content token: the frozen model's construction nonce stands in
        # for the user fnu (same convention as batchengine's cross-
        # instance cache), so repeated evidence calls on one model
        # variant trace the nested program once.
        from mbb_emcee_tpu.checkpoint import data_fingerprint
        phot = self._require_data()
        pack = self._response_pack()
        sp = self.spec
        token = ("sed-evidence", self.model.nonce,
                 data_fingerprint(
                     sp.lower, sp.upper, sp.fixed, sp.fixed_values,
                     sp.prior_mean, sp.prior_isigma,
                     None if sp.uplim_bands is None
                     else np.asarray(sp.uplim_bands)),
                 data_fingerprint(phot.wave, phot.flux, phot.unc,
                                  phot.cov),
                 None if pack is None else data_fingerprint(*pack))
        res = nested_sample(lnprob, free_space.lower, free_space.upper,
                            key, nlive=nlive, nbatch=nbatch, nsteps=nsteps,
                            max_iter=max_iter, tol=tol,
                            program_token=token)
        res = dataclasses.replace(res,
                                  samples=free_space.expand(res.samples))
        self.evidence = res
        if verbose:
            print(f"nested[{self.model.name}]: lnZ = {res.logz:.3f} +/- "
                  f"{res.logz_err:.3f} ({res.n_iter} iterations)")
        return res

    def fit_map(self, nstarts=8, n_adam=150, n_newton=12, adam_lr=0.1,
                verbose=False):
        """MAP point + Laplace error bars in one device program (the
        triage tier, same machinery as MBBFitter.fit_map): multi-start
        Adam-then-damped-Newton in the sigmoid-unconstrained box, then
        the inverse Hessian at the mode. Returns a MAPResult (free
        space; stored as self.map_result); interior=False flags a mode
        near a box bound -- run the MCMC."""
        from mbb_emcee_tpu.mapfit import (
            MAPResult, map_core, neg_hessian, laplace_cov_host,
            interior_mask, _to_unconstrained)

        lnprob, free_space = build_sed_lnprob(
            self._require_data(), self.model, self.spec,
            response_pack=self._response_pack())
        if not (np.all(np.isfinite(free_space.lower))
                and np.all(np.isfinite(free_space.upper))):
            raise ValueError(
                "MAP fitting requires finite box bounds on every free "
                "parameter")
        lower = np.asarray(free_space.lower, np.float32)
        width = np.asarray(free_space.upper - free_space.lower, np.float32)
        key = jax.random.PRNGKey(self.seed)
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

        post_token = self._posterior_token()
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
            names = [self.model.param_names[i]
                     for i in free_space.free_idx]
            parts = [f"{n}={v:.4g}+/-{s:.3g}"
                     for n, v, s in zip(names, x_np, sigma)]
            print(f"MAP[{self.model.name}] ({nstarts} starts): "
                  + ", ".join(parts) + f"; lnprob={float(lnp_map):.2f}"
                  + ("" if interior else
                     " [mode near a box bound -- Laplace suspect]"))
        return self.map_result

    def _require_map_fresh(self, what):
        if getattr(self, "map_result", None) is None:
            raise RuntimeError(f"{what} requires fit_map() on this data "
                               f"first")
        if getattr(self, "_map_token", None) != self._posterior_token():
            raise RuntimeError(
                f"{what}: the stored MAP fit is for a different posterior "
                f"-- the parameter space, data, or responses changed "
                f"since fit_map(); re-run fit_map() first")

    def map_importance(self, nsamples=2048, seed=None):
        """Laplace importance sampling after fit_map(): weighted
        true-posterior summaries without MCMC (same semantics as
        MBBFitter.map_importance -- ess/nsamples near 1 certifies the
        Gaussian; small ess says run the MCMC). Returns (samples, logw,
        ess), also stored as self.map_is."""
        from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR
        self._require_map_fresh("map_importance")
        r = self.map_result
        lnprob, free_space = build_sed_lnprob(
            self._require_data(), self.model, self.spec,
            response_pack=self._response_pack())
        d = free_space.nfree
        N = int(nsamples)
        L = np.linalg.cholesky(r.cov)
        logdet = float(np.sum(np.log(np.diag(L))))
        key = jax.random.PRNGKey(self.seed if seed is None else int(seed))
        eps = np.asarray(jax.random.normal(key, (N, d), jnp.float32),
                         np.float64)
        x = r.x[None, :] + eps @ L.T
        lnp = np.asarray(jax.jit(jax.vmap(lnprob))(
            jnp.asarray(x, jnp.float32)), np.float64)
        lnq = (-0.5 * np.sum(eps ** 2, axis=1) - logdet
               - 0.5 * d * np.log(2.0 * np.pi))
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
        errors; ess = 0 reports the MAP point with NaN errors."""
        if getattr(self, "map_is", None) is None:
            raise RuntimeError("map_importance() has not been called")
        i = self._param_index(param)
        r = self.map_result
        free_idx = list(self.free_space.free_idx)
        if i not in free_idx:
            # the value the RUN held fixed, not the current spec's
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

    # -- chain views ---------------------------------------------------------------------
    def _require_run(self):
        if self.chain_free is None:
            raise RuntimeError("fitter has not been run")

    @property
    def chain(self):
        """(nwalkers, nsteps, npar) full-space production chain."""
        self._require_run()
        free = np.transpose(np.asarray(self.chain_free), (1, 0, 2))
        return self.free_space.expand(free)

    @property
    def acceptance_fraction(self):
        self._require_run()
        return self._acceptance

    def gelman_rubin(self):
        """(names, rhat) over the free parameters, MBBFitter convention."""
        self._require_run()
        names = [self.model.param_names[i]
                 for i in self.free_space.free_idx]
        return names, split_rhat(np.asarray(self.chain_free))

    def autocorrelation_time(self):
        self._require_run()
        return autocorrelation_time(np.asarray(self.chain_free))

    def results(self, **kw):
        """SEDResults for this finished run (analysis + persistence)."""
        return SEDResults(fit=self, **kw)


class SEDResults:
    """Analysis/persistence for an SEDFitter run -- the generic-model
    MBBResults (same summaries, same batched device derived quantities,
    same HDF5 dual constructor).

    Construct with fit= (a run SEDFitter) or h5file= (+ model= to
    re-enable model-dependent computations on a reload: chains and stored
    derived quantities load without it, but sed_percentiles / compute_lir
    / compute_peaklambda / posterior_predictive need the flux function).
    Dust mass is intentionally absent: kappa B_nu(T) is MBB physics
    (use MBBResults), not a generic-SED quantity.
    """

    def __init__(self, fit=None, h5file=None, model=None, redshift=None,
                 cosmology=None, lumdist=None):
        if (fit is None) == (h5file is None):
            raise ValueError("give exactly one of fit= or h5file=")
        self.redshift = None if redshift is None else float(redshift)
        self._cosmology_explicit = cosmology is not None
        if cosmology is None:
            cosmology = "WMAP9"
        self.cosmology_name = cosmology if isinstance(cosmology, str) else None
        self._cosmo = (Cosmology.named(cosmology)
                       if isinstance(cosmology, str) else cosmology)
        self.lumdist = None if lumdist is None else float(lumdist)
        self.response_pack = None
        self.lir_chain = None
        self.lir_meta = None
        self.dustmass_chain = None   # photo-z tier (photoz.compute_dustmass)
        self.dustmass_meta = None
        self.peaklambda_chain = None
        self.loo_result = None  # LooResult (compute_loo)

        if fit is not None:
            if model is not None and model is not fit.model:
                raise ValueError("model= conflicts with fit.model")
            self._from_fit(fit)
        else:
            self.model = model
            self._from_h5(h5file)

    # -- construction --------------------------------------------------------------------
    def _from_fit(self, fit):
        fit._require_run()
        self.model = fit.model
        if self.redshift is None and fit.redshift is not None:
            self.redshift = float(fit.redshift)
        self.chain = fit.chain                       # (nw, nsteps, npar)
        self.lnprobability = np.transpose(
            np.asarray(fit.lnprobability), (1, 0))   # (nw, nsteps)
        self.acceptance_fraction = np.asarray(fit.acceptance_fraction)
        self.phot = fit.phot
        self.param_spec = fit.spec
        self.param_init = fit._init.copy()
        self.thin = fit.thin
        self.nwalkers = fit.nwalkers
        self.response_pack = fit._response_pack()

    def _from_h5(self, h5file):
        import h5py
        explicit_z, explicit_dl = self.redshift, self.lumdist
        with h5py.File(h5file, "r") as f:
            if f.attrs.get("kind") != "sed":
                raise ValueError(
                    f"{h5file} is not an SEDResults file (MBB results load "
                    f"via MBBResults)")
            stored_names = tuple(
                n.decode() if isinstance(n, bytes) else str(n)
                for n in f.attrs["param_names"])
            stored_model = f.attrs.get("model_name", "")
            if isinstance(stored_model, bytes):
                stored_model = stored_model.decode()
            if self.model is not None:
                if tuple(self.model.param_names) != stored_names:
                    raise ValueError(
                        f"model {self.model.name!r} has parameters "
                        f"{self.model.param_names}; file stores "
                        f"{stored_names}")
                if self.model.name != stored_model:
                    raise ValueError(
                        f"file was written by model {stored_model!r}, "
                        f"got {self.model.name!r}")
            self._stored_param_names = stored_names
            self.model_name = stored_model
            self.chain = np.asarray(f["Chain"], np.float64)
            self.lnprobability = np.asarray(f["LogLike"], np.float64)
            self.acceptance_fraction = np.asarray(
                f["AcceptanceFraction"], np.float64)
            self.nwalkers = int(f.attrs["nwalkers"])
            self.thin = int(f.attrs["thin"])
            z = float(f.attrs["redshift"])
            if self.redshift is None and np.isfinite(z):
                self.redshift = z
            dl = float(f.attrs["lumdist"])
            if self.lumdist is None and np.isfinite(dl):
                self.lumdist = dl
            cname = f.attrs.get("cosmology", b"")
            if isinstance(cname, bytes):
                cname = cname.decode()
            if cname and not self._cosmology_explicit:
                self._cosmo = Cosmology.named(cname)
                self.cosmology_name = cname
            ph = f["Photometry"]
            names = None
            if "BandNames" in ph:
                names = [n.decode() if isinstance(n, bytes) else str(n)
                         for n in ph["BandNames"][()]]
            self.phot = Photometry(
                np.asarray(ph["Wave"]), np.asarray(ph["Flux"]),
                np.asarray(ph["FluxUnc"]),
                cov=np.asarray(ph["Cov"]) if "Cov" in ph else None,
                band_names=names)
            pc = f["ParamConfig"]
            uplim = (np.asarray(pc["PhotUpperLimits"], bool)
                     if "PhotUpperLimits" in pc else None)
            self.param_spec = LikelihoodSpec(
                lower=np.asarray(pc["Lower"], np.float64),
                upper=np.asarray(pc["Upper"], np.float64),
                fixed=np.asarray(pc["Fixed"], bool),
                fixed_values=np.asarray(pc["FixedValues"], np.float64),
                prior_mean=np.asarray(pc["PriorMean"], np.float64),
                prior_isigma=np.asarray(pc["PriorInvSigma"], np.float64),
                uplim_bands=uplim)
            self.param_init = np.asarray(pc["Initial"], np.float64)
            if "Response" in f:
                g = f["Response"]
                self.response_pack = (np.asarray(g["Nodes"], np.float64),
                                      np.asarray(g["Weights"], np.float64))
            if "LIRChain" in f:
                self.lir_chain = np.asarray(f["LIRChain"], np.float64)
                self.lir_meta = {k: f["LIRChain"].attrs[k]
                                 for k in f["LIRChain"].attrs}
            if "DustMassChain" in f:
                self.dustmass_chain = np.asarray(
                    f["DustMassChain"], np.float64)
                self.dustmass_meta = {k: f["DustMassChain"].attrs[k]
                                      for k in f["DustMassChain"].attrs}
            if "PeakLambdaChain" in f:
                self.peaklambda_chain = np.asarray(
                    f["PeakLambdaChain"], np.float64)
            if "LOO" in f:
                from mbb_emcee_tpu.modelcheck import read_loo_group
                self.loo_result = read_loo_group(f["LOO"])

        # Constructor arguments win over stored metadata.
        if explicit_z is not None:
            self.redshift = explicit_z
        if explicit_dl is not None:
            self.lumdist = explicit_dl

    # -- basic summaries -------------------------------------------------------------------
    @property
    def param_names(self):
        return (tuple(self.model.param_names) if self.model is not None
                else self._stored_param_names)

    @property
    def flatchain(self):
        return self.chain.reshape(-1, self.chain.shape[-1])

    @property
    def nsteps(self):
        return self.chain.shape[1]

    @property
    def data_wave(self):
        return self.phot.wave

    @property
    def data_flux(self):
        return self.phot.flux

    @property
    def data_flux_unc(self):
        return self.phot.unc

    def _param_index(self, param):
        if self.model is not None:
            return self.model.param_index(param)
        if isinstance(param, (int, np.integer)):
            return int(param)
        lowered = [n.lower() for n in self._stored_param_names]
        key = str(param).lower()
        if key in lowered:
            return lowered.index(key)
        raise ValueError(f"unknown parameter {param!r}; "
                         f"known: {list(self._stored_param_names)}")

    def parameter_chain(self, param):
        return self.flatchain[:, self._param_index(param)]

    def par_cen(self, param, percentile=68.3):
        return _percentile_summary(self.parameter_chain(param), percentile)

    def par_uplim(self, param, conf=0.683):
        return float(np.percentile(self.parameter_chain(param),
                                   100.0 * conf))

    def par_lowlim(self, param, conf=0.683):
        return float(np.percentile(self.parameter_chain(param),
                                   100.0 * (1.0 - conf)))

    @property
    def best_fit(self):
        idx = np.unravel_index(np.argmax(self.lnprobability),
                               self.lnprobability.shape)
        return self.chain[idx[0], idx[1]], float(self.lnprobability[idx])

    def best_fit_model(self):
        """Callable wave -> f_nu (mJy) at the maximum-probability sample."""
        fnu = self._require_model().fnu
        theta = jnp.asarray(self.best_fit[0], jnp.float32)
        jfnu = jax.jit(lambda w: fnu(theta, w))

        def sed(wave):
            return np.asarray(
                jfnu(jnp.asarray(np.asarray(wave, np.float32))), np.float64)
        return sed

    def par_cov(self):
        idx = self.param_spec.free_indices
        names = [self.param_names[i] for i in idx]
        cov = np.atleast_2d(
            np.cov(self.flatchain[:, idx].T.astype(np.float64)))
        return names, cov

    @property
    def free_param_names(self):
        return [self.param_names[i]
                for i in self.param_spec.free_indices]

    def gelman_rubin(self):
        idx = self.param_spec.free_indices
        chain = np.transpose(self.chain[:, :, idx], (1, 0, 2))
        return split_rhat(chain)

    def autocorrelation_time(self):
        free = self.chain[:, :, self.param_spec.free_indices]
        return autocorrelation_time(np.transpose(free, (1, 0, 2)))

    # -- model-dependent computations ---------------------------------------------------------
    def _require_model(self):
        if self.model is None:
            raise RuntimeError(
                "this computation evaluates the SED model; reload with "
                "SEDResults(h5file=..., model=<the SEDModel>)")
        return self.model

    def _thinned(self, thin):
        return self.flatchain[::max(int(thin), 1)]

    def sed_percentiles(self, waves, percentile=68.3, thin=1):
        """(3, nwave) [median, upper, lower] posterior SED band in mJy --
        one batched device evaluation (samples x wavelengths)."""
        fnu = self._require_model().fnu
        waves_j = jnp.asarray(np.atleast_1d(waves), jnp.float32)
        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        fluxes = np.asarray(
            jax.jit(jax.vmap(lambda th: fnu(th, waves_j)))(samples),
            np.float64)
        return derived.sed_band(fluxes, percentile, sample_axis=0)

    def _dl_mpc(self):
        if self.lumdist is not None:
            return self.lumdist
        if self.redshift is None:
            raise RuntimeError(
                "redshift (or explicit lumdist) required for derived "
                "physical quantities")
        return luminosity_distance(self.redshift, self._cosmo)

    def _opz(self):
        if self.redshift is None:
            raise RuntimeError("redshift required")
        return 1.0 + self.redshift

    def compute_lir(self, wavemin=8.0, wavemax=1000.0, thin=1,
                    z_param=None):
        """Posterior of L_IR(wavemin-wavemax um REST) in L_sun: the
        MBBResults formula (GL quadrature in ln-lambda, fp64 host
        prefactor) applied to the generic model.

        z_param: name (or index) of a SAMPLED redshift parameter
        (photo-z fits, photoz.photoz_mbb). Each chain sample is then
        integrated over its own observed window
        [wavemin, wavemax]*(1+z_i) with its own luminosity distance
        (one vectorized fp64 D_L pass, models/cosmology.py), i.e. the
        L_IR posterior is marginalized over the z posterior. Requires a
        cosmology; an explicit scalar lumdist= contradicts a per-sample
        z and raises.
        """
        model = self._require_model()
        fnu = model.fnu
        samples_np = self._thinned(thin)
        samples = jnp.asarray(samples_np, jnp.float32)
        if z_param is None:
            lam, w = derived.lir_nodes_weights(self._opz(), wavemin,
                                               wavemax)
            lam_j = jnp.asarray(lam, jnp.float32)
            w_j = jnp.asarray(w, jnp.float32)
            integ = np.asarray(
                jax.jit(jax.vmap(
                    lambda th: jnp.sum(w_j * fnu(th, lam_j))))(samples),
                np.float64)
            prefac = derived.lir_prefactor(self._dl_mpc())
        else:
            if self.lumdist is not None:
                raise ValueError(
                    "explicit lumdist= cannot combine with z_param: "
                    "each sample carries its own redshift")
            zi = model.param_index(z_param)
            one = derived.lir_zparam_integrand(fnu, zi, wavemin, wavemax)
            integ = np.asarray(jax.jit(jax.vmap(one))(samples),
                               np.float64)
            zvec = np.asarray(samples_np[:, zi], np.float64)
            dl = luminosity_distance_batch(zvec, self._cosmo)
            prefac = derived.lir_prefactor(dl)
        self.lir_chain = prefac * integ
        self.lir_meta = {"wavemin": float(wavemin),
                         "wavemax": float(wavemax), "thin": int(thin)}
        if z_param is not None:
            self.lir_meta["z_param"] = str(z_param)
        return self.lir_chain

    def lir_cen(self, percentile=68.3):
        if self.lir_chain is None:
            self.compute_lir()
        return _percentile_summary(self.lir_chain, percentile)

    @property
    def lir(self):
        return self.lir_cen()

    def compute_peaklambda(self, thin=1, lo=derived.PEAK_RANGE[0],
                           hi=derived.PEAK_RANGE[1]):
        """Posterior of the OBSERVED f_nu peak wavelength (um): batched
        golden-section in ln-lambda on log f_nu."""
        from mbb_emcee_tpu.ops.rootfind import golden_max
        fnu = self._require_model().fnu
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

        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        self.peaklambda_chain = np.asarray(
            jax.jit(jax.vmap(peak))(samples), np.float64)
        return self.peaklambda_chain

    def peaklambda_cen(self, percentile=68.3):
        if self.peaklambda_chain is None:
            self.compute_peaklambda()
        return _percentile_summary(self.peaklambda_chain, percentile)

    @property
    def peaklambda(self):
        return self.peaklambda_cen()

    def posterior_predictive(self, thin=1, seed=0):
        """Chi-square-discrepancy posterior-predictive check, exactly as
        MBBResults.posterior_predictive (see there for the statistic),
        with band fluxes from the generic model (point evaluation, or
        response-integrated when the fit used instrument curves)."""
        model = self._require_model()
        spec = self.param_spec
        wave = np.asarray(self.phot.wave, np.float64)
        y = np.asarray(self.phot.flux, np.float64)
        unc_all = np.asarray(self.phot.unc, np.float64)
        nb = wave.size
        uplim = (np.zeros(nb, bool) if spec.uplim_bands is None
                 else np.asarray(spec.uplim_bands, bool))
        present = np.isfinite(y) & np.isfinite(unc_all) & (unc_all > 0)
        det_idx = np.where(present & ~uplim)[0]
        ndet = int(det_idx.size)
        if ndet == 0:
            raise RuntimeError(
                "posterior_predictive needs at least one detected "
                "(non-upper-limit) band")

        if self.phot.cov is not None:
            chol = np.linalg.cholesky(
                np.asarray(self.phot.cov, np.float64)
                [np.ix_(det_idx, det_idx)])
            whiten = np.asarray(np.linalg.inv(chol), np.float32)
            lmat = np.asarray(chol, np.float32)
            sig32 = isig = None
        else:
            sig = unc_all[det_idx]
            whiten = lmat = None
            sig32 = np.asarray(sig, np.float32)
            isig = np.asarray(1.0 / sig, np.float32)

        fluxes = sed_band_flux_eval(model.fnu, wave, self.response_pack)
        y_det = np.asarray(y[det_idx], np.float32)

        def one(theta, key):
            m = fluxes(theta)[det_idx]
            d_obs = m - y_det
            eps = jax.random.normal(key, (ndet,), jnp.float32)
            if whiten is not None:
                r_obs = whiten @ d_obs
                noise = lmat @ eps
            else:
                r_obs = d_obs * isig
                noise = sig32 * eps
            return jnp.sum(r_obs * r_obs), jnp.sum(eps * eps), m + noise

        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        n = int(samples.shape[0])
        keys = jax.random.split(jax.random.PRNGKey(int(seed)), n)
        chi2_obs, chi2_rep, y_rep = jax.jit(jax.vmap(one))(samples, keys)
        chi2_obs = np.asarray(chi2_obs, np.float64)
        chi2_rep = np.asarray(chi2_rep, np.float64)
        y_rep = np.asarray(y_rep, np.float64)

        band_p = np.full(nb, np.nan)
        band_p[det_idx] = np.mean(y_rep >= y[det_idx][None, :], axis=0)
        return PPCResult(
            p_value=float(np.mean(chi2_rep >= chi2_obs)),
            band_p=band_p, chi2_obs=chi2_obs, chi2_rep=chi2_rep,
            ndata=ndet, nfree=len(spec.free_indices), nsamples=n,
            uplim_bands=uplim,
            band_names=(list(self.phot.band_names)
                        if self.phot.band_names is not None else None))

    def compute_loo(self, thin=1):
        """WAIC + PSIS-LOO predictive assessment, exactly as
        MBBResults.compute_loo (see modelcheck.py for the estimators),
        with band fluxes from the generic model. Censored (upper-limit)
        and missing bands are excluded; a full error covariance uses the
        exact conditional predictive factors. Returns (and stores as
        .loo_result, persisted under /LOO) a modelcheck.LooResult."""
        from mbb_emcee_tpu import modelcheck
        model = self._require_model()
        spec = self.param_spec
        wave = np.asarray(self.phot.wave, np.float64)
        y = np.asarray(self.phot.flux, np.float64)
        unc_all = np.asarray(self.phot.unc, np.float64)
        nb = wave.size
        uplim = (np.zeros(nb, bool) if spec.uplim_bands is None
                 else np.asarray(spec.uplim_bands, bool))
        present = np.isfinite(y) & np.isfinite(unc_all) & (unc_all > 0)
        det_idx = np.where(present & ~uplim)[0]
        if det_idx.size == 0:
            raise RuntimeError(
                "compute_loo needs at least one detected "
                "(non-upper-limit) band")

        fluxes = sed_band_flux_eval(model.fnu, wave, self.response_pack)
        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        cov_det = (None if self.phot.cov is None
                   else np.asarray(self.phot.cov, np.float64)[
                       np.ix_(det_idx, det_idx)])
        loglik = modelcheck.pointwise_loglik_matrix(
            fluxes, samples, y, det_idx,
            unc_det=None if cov_det is not None else unc_all[det_idx],
            cov_det=cov_det)
        names = (None if self.phot.band_names is None
                 else [self.phot.band_names[i] for i in det_idx])
        self.loo_result = modelcheck.loo_from_loglik(
            loglik, point_index=det_idx, band_names=names)
        return self.loo_result

    # -- plotting -------------------------------------------------------------------------------
    def plot_sed(self, **kw):
        from mbb_emcee_tpu import plotting
        return plotting.plot_sed(self, **kw)

    def plot_corner(self, **kw):
        from mbb_emcee_tpu import plotting
        return plotting.plot_corner(self, **kw)

    def plot_chain(self, **kw):
        from mbb_emcee_tpu import plotting
        return plotting.plot_chain(self, **kw)

    def plot_ppc(self, **kw):
        from mbb_emcee_tpu import plotting
        return plotting.plot_ppc(self, **kw)

    def plot_pz(self, **kw):
        """P(z) posterior figure for photo-z fits (plotting.plot_pz)."""
        from mbb_emcee_tpu import plotting
        return plotting.plot_pz(self, **kw)

    # -- persistence ------------------------------------------------------------------------------
    def writeToHDF5(self, filename):
        """Persist chains + settings (the MBB schema's logical layout,
        tagged kind='sed' with the model name and parameter list)."""
        import h5py
        with h5py.File(filename, "w") as f:
            f.attrs["schema_version"] = _SED_SCHEMA_VERSION
            f.attrs["package"] = "mbb_emcee_tpu"
            f.attrs["kind"] = "sed"
            f.attrs["model_name"] = self.model_name_str.encode()
            f.attrs["param_names"] = np.array(
                [n.encode() for n in self.param_names])
            f.attrs["nwalkers"] = self.nwalkers
            f.attrs["thin"] = self.thin
            f.attrs["redshift"] = (np.nan if self.redshift is None
                                   else self.redshift)
            f.attrs["lumdist"] = (np.nan if self.lumdist is None
                                  else self.lumdist)
            f.attrs["cosmology"] = (self.cosmology_name or "").encode()
            f.create_dataset("Chain",
                             data=np.asarray(self.chain, np.float32),
                             compression="gzip")
            f.create_dataset("LogLike",
                             data=np.asarray(self.lnprobability,
                                             np.float32),
                             compression="gzip")
            f.create_dataset("AcceptanceFraction",
                             data=np.asarray(self.acceptance_fraction,
                                             np.float32))
            ph = f.create_group("Photometry")
            ph.create_dataset("Wave", data=self.phot.wave)
            ph.create_dataset("Flux", data=self.phot.flux)
            ph.create_dataset("FluxUnc", data=self.phot.unc)
            if self.phot.cov is not None:
                ph.create_dataset("Cov", data=self.phot.cov)
            if self.phot.band_names is not None:
                ph.create_dataset("BandNames", data=np.array(
                    [n.encode() for n in self.phot.band_names]))
            if self.response_pack is not None:
                g = f.create_group("Response")
                g.create_dataset("Nodes",
                                 data=np.asarray(self.response_pack[0],
                                                 np.float64))
                g.create_dataset("Weights",
                                 data=np.asarray(self.response_pack[1],
                                                 np.float64))
            spec = self.param_spec
            pc = f.create_group("ParamConfig")
            pc.create_dataset("Lower", data=spec.lower)
            pc.create_dataset("Upper", data=spec.upper)
            pc.create_dataset("Fixed", data=spec.fixed.astype(np.uint8))
            pc.create_dataset("FixedValues", data=spec.fixed_values)
            pc.create_dataset("PriorMean", data=spec.prior_mean)
            pc.create_dataset("PriorInvSigma", data=spec.prior_isigma)
            pc.create_dataset("Initial", data=self.param_init)
            if spec.uplim_bands is not None:
                pc.create_dataset("PhotUpperLimits",
                                  data=np.asarray(spec.uplim_bands,
                                                  np.uint8))
            if self.lir_chain is not None:
                ds = f.create_dataset("LIRChain", data=self.lir_chain,
                                      compression="gzip")
                for k, v in (self.lir_meta or {}).items():
                    ds.attrs[k] = v
            if self.dustmass_chain is not None:
                ds = f.create_dataset("DustMassChain",
                                      data=self.dustmass_chain,
                                      compression="gzip")
                for k, v in (self.dustmass_meta or {}).items():
                    ds.attrs[k] = v
            if self.peaklambda_chain is not None:
                f.create_dataset("PeakLambdaChain",
                                 data=self.peaklambda_chain,
                                 compression="gzip")
            if self.loo_result is not None:
                from mbb_emcee_tpu.modelcheck import write_loo_group
                write_loo_group(f, self.loo_result)
        return filename

    @property
    def model_name_str(self):
        return (self.model.name if self.model is not None
                else getattr(self, "model_name", "custom-sed"))

    def __repr__(self):
        lines = [f"SEDResults[{self.model_name_str}]:"]
        fixed = self.param_spec.fixed
        for i, name in enumerate(self.param_names):
            if fixed[i]:
                lines.append(f"  {name:12s} fixed at "
                             f"{self.param_spec.fixed_values[i]:.5g}")
            else:
                c = self.par_cen(i)
                lines.append(f"  {name:12s} {c[0]:.5g} "
                             f"+{c[1]:.3g} -{c[2]:.3g}")
        if self.lir_chain is not None:
            c = _percentile_summary(self.lir_chain)
            lines.append(f"  L_IR        {c[0]:.4g} +{c[1]:.3g} -{c[2]:.3g} "
                         f"L_sun")
        if self.peaklambda_chain is not None:
            c = _percentile_summary(self.peaklambda_chain)
            lines.append(f"  peak lambda {c[0]:.5g} +{c[1]:.3g} -{c[2]:.3g} "
                         f"um (observed)")
        return "\n".join(lines)
