"""Posterior analysis and derived physical quantities.

Rebuild of the reference results layer (ref: mbb_emcee/mbb_results.py, class
mbb_results -- reconstructed, SURVEY.md C6). The reference loops over chain
samples calling adaptive scipy.integrate.quad / bounded scalar optimizers per
sample; here every derived quantity is ONE batched device computation over
the whole (thinned) chain:

  * L_IR(8-1000 um rest): fixed-node Gauss-Legendre quadrature in ln-lambda
    of f_nu * c/lambda^2 over observed lambda in [wmin, wmax]*(1+z),
    L = 4 pi D_L^2 * F_obs  (the integral over the redshifted band already
    carries the K-correction; node count validated against adaptive quad in
    tests/test_quadrature_convergence.py).
  * Dust mass: M = D_L^2 S_obs(lambda0_rest (1+z)) /
    ((1+z) kappa B_nu(nu_rest, T (1+z))), kappa = 2.64 m^2/kg at 125 um
    (Dunne et al. 2003), with the fitted (observer-frame) T scaled back to
    rest frame.
  * Peak wavelength: batched fixed-iteration golden-section maximization of
    f_nu in ln-lambda.

Large cosmological prefactors (4 pi D_L^2 ~ 1e53 m^2) overflow fp32, so each
formula is split into an fp32 device part (per-sample, shape-dependent) and
an fp64 host scalar prefactor.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.constants import PARAM_NAMES, NPARAMS
from mbb_emcee_tpu.models.cosmology import Cosmology, luminosity_distance
from mbb_emcee_tpu import derived
from mbb_emcee_tpu import hdf5io

# The per-sample kernels + tuning constants are shared with the batched
# serving path (multifit.MultiFitter) via derived.py.
_PEAK_RANGE = derived.PEAK_RANGE


def _is_native_results_file(h5file):
    """True when the file carries this package's own writer schema
    (hdf5io.write_results: 'nwalkers' root attr + 'ParamConfig' group);
    anything else goes through the upstream-layout reader."""
    import h5py
    with h5py.File(h5file, "r") as f:
        return "nwalkers" in f.attrs and "ParamConfig" in f


def _percentile_summary(samples, percentile=68.3):
    """(central, +err, -err): median and distance to the percentile bounds
    (ref: mbb_results.par_cen convention, 50 +- 34.15)."""
    p = float(percentile)
    lo, mid, hi = np.percentile(np.asarray(samples, np.float64),
                                [50.0 - p / 2, 50.0, 50.0 + p / 2])
    return np.array([mid, hi - mid, mid - lo])


@dataclasses.dataclass
class PPCResult:
    """Posterior-predictive check (MBBResults.posterior_predictive).

    `p_value` is ~uniform on (0,1) when the model describes the data;
    values below ~0.01 flag misfit (the fitted model cannot reproduce
    its own photometry), values above ~0.99 flag overestimated errors.
    `band_p` localizes which band misfits (entries near 0 or 1)."""
    p_value: float          # P[T_rep >= T_obs] over the thinned chain
    band_p: np.ndarray      # (nb,) tail prob per band; NaN for uplim bands
    chi2_obs: np.ndarray    # (nsamples,) whitened chi-sq of the observed data
    chi2_rep: np.ndarray    # (nsamples,) chi-sq of replicated data (~chi2_ndata)
    ndata: int              # detected bands entering the statistic
    nfree: int              # free parameters (dof reference: ndata - nfree)
    nsamples: int           # thinned chain samples used
    uplim_bands: np.ndarray  # (nb,) bool; True bands excluded from chi-sq
    band_names: list | None = None

    def __repr__(self):
        labels = (self.band_names if self.band_names is not None
                  else [f"band{i}" for i in range(self.band_p.size)])
        flagged = [f"{n}={p:.3f}" for n, p in zip(labels, self.band_p)
                   if np.isfinite(p) and (p < 0.01 or p > 0.99)]
        extra = ("; suspect bands: " + ", ".join(flagged)) if flagged else ""
        return (f"PPCResult(p_value={self.p_value:.3f}, "
                f"ndata={self.ndata}, nfree={self.nfree}, "
                f"nsamples={self.nsamples}{extra})")


class MBBResults:
    """Analysis of a finished fit, or a reload of a persisted one.

    Construct with EITHER a run MBBFitter (fit=...) or an HDF5 file written
    by writeToHDF5 (h5file=...), mirroring the reference's dual constructor.
    """

    def __init__(self, fit=None, h5file=None, redshift=None,
                 cosmology=None, lumdist=None):
        if (fit is None) == (h5file is None):
            raise ValueError("give exactly one of fit= or h5file=")
        self.redshift = None if redshift is None else float(redshift)
        # cosmology=None means "not specified": the WMAP9 default (ref
        # default cosmology) applies unless an h5 reload carries its own
        # stored name. An EXPLICIT argument -- including "WMAP9" -- always
        # wins over stored metadata (distinguishable only because the
        # default is a sentinel, not the name itself).
        self._cosmology_explicit = cosmology is not None
        if cosmology is None:
            cosmology = "WMAP9"
        self.cosmology_name = cosmology if isinstance(cosmology, str) else None
        self._cosmo = (Cosmology.named(cosmology)
                       if isinstance(cosmology, str) else cosmology)
        self.lumdist = None if lumdist is None else float(lumdist)

        # Instrument-response quadrature pack (None = point evaluation);
        # set by _from_fit / restored by _from_h5.
        self.response_pack = None

        # Derived-quantity chains (None until computed).
        self.lir_chain = None
        self.lir_meta = None
        self.dustmass_chain = None
        self.dustmass_meta = None
        self.peaklambda_chain = None
        self.evidence = None  # NestedResult (compute_evidence on the fitter)
        self.logz_pt = None   # (lnZ, err) stepping-stone, from run_pt()
        self.logz_ti = None   # (lnZ, err) thermodynamic-integration check
        self.loo_result = None  # LooResult (compute_loo)

        if fit is not None:
            self._from_fit(fit)
        else:
            self._from_h5(h5file)

    # -- construction ------------------------------------------------------------
    def _from_fit(self, fit):
        if fit.chain_free is None:
            raise RuntimeError("fitter has not been run")
        if self.redshift is None and getattr(fit, "redshift", None) is not None:
            self.redshift = float(fit.redshift)
        self.chain = fit.chain                    # (nwalkers, nsteps, 5)
        self.lnprobability = np.transpose(
            np.asarray(fit.lnprobability), (1, 0))  # (nwalkers, nsteps)
        self.acceptance_fraction = np.asarray(fit.acceptance_fraction)
        self.shape = fit.shape
        self.phot = fit.phot
        self.param_spec = fit.spec
        self.param_init = fit._init.copy()
        self.thin = fit.thin
        # The chain axis is authoritative, not the configured nwalkers:
        # run_hmc/run_pt may sample a different chain count (nchains/
        # nwalkers_pt), and n_ensembles>1 merges K ensembles into one
        # wider walker axis -- the persisted attr must match the stored
        # Chain dataset.
        self.nwalkers = int(np.asarray(self.chain).shape[0])
        self.evidence = getattr(fit, "evidence", None)
        self.logz_pt = getattr(fit, "logz_pt", None)
        self.logz_ti = getattr(fit, "logz_ti", None)
        # Tolerant lookup: adapter views (multifit._SourceView) predate
        # this attribute; anything exposing the fitter surface works.
        pack_fn = getattr(fit, "_response_pack", None)
        self.response_pack = pack_fn() if pack_fn is not None else None
        self._fit = fit

    def _from_h5(self, h5file):
        explicit_z, explicit_dl = self.redshift, self.lumdist
        chosen_cosmo, chosen_name = self._cosmo, self.cosmology_name
        if _is_native_results_file(h5file):
            payload = hdf5io.read_results(h5file)
        else:
            # A migrating user's file from upstream mbb_emcee: the
            # tolerant reconstructed-schema reader (legacy_h5) maps it
            # into the same payload, warning about every guessed name.
            from mbb_emcee_tpu.legacy_h5 import read_upstream_results
            payload = read_upstream_results(h5file)
        for k, v in payload.items():
            setattr(self, k, v)
        # Constructor arguments win over stored metadata.
        if explicit_z is not None:
            self.redshift = explicit_z
        if explicit_dl is not None:
            self.lumdist = explicit_dl
        if payload.get("cosmology_name") and not self._cosmology_explicit:
            self._cosmo = Cosmology.named(payload["cosmology_name"])
            self.cosmology_name = payload["cosmology_name"]
        elif (payload.get("cosmology_params")
                and not self._cosmology_explicit):
            # A custom (unnamed) Cosmology was stored parameter-by-
            # parameter; rebuild it rather than degrading to the default.
            h0, om0, ol0 = payload["cosmology_params"]
            self._cosmo = Cosmology(H0=h0, Om0=om0, Ol0=ol0)
            self.cosmology_name = None
        else:
            # restore the constructor's choice (the payload loop above
            # overwrote cosmology_name with the stored value)
            self._cosmo, self.cosmology_name = chosen_cosmo, chosen_name
        self._fit = None

    # -- basic summaries -----------------------------------------------------------
    @property
    def flatchain(self):
        return self.chain.reshape(-1, NPARAMS)

    @property
    def nsteps(self):
        return self.chain.shape[1]

    @property
    def data_wave(self):
        """Photometry wavelengths (um) the fit used (ref: mbb_results
        data accessors)."""
        return self.phot.wave

    @property
    def data_flux(self):
        return self.phot.flux

    @property
    def data_flux_unc(self):
        return self.phot.unc

    def parameter_chain(self, param):
        from mbb_emcee_tpu.likelihood import param_index
        return self.flatchain[:, param_index(param)]

    def par_cen(self, param, percentile=68.3):
        """(median, +err, -err) of a parameter (ref: mbb_results.par_cen)."""
        return _percentile_summary(self.parameter_chain(param), percentile)

    def par_uplim(self, param, conf=0.683):
        """One-sided upper limit at confidence conf."""
        return float(np.percentile(self.parameter_chain(param),
                                   100.0 * conf))

    def par_lowlim(self, param, conf=0.683):
        return float(np.percentile(self.parameter_chain(param),
                                   100.0 * (1.0 - conf)))

    @property
    def best_fit(self):
        """(params, lnprob) at the maximum-probability sample
        (ref: mbb_results.best_fit)."""
        idx = np.unravel_index(np.argmax(self.lnprobability),
                               self.lnprobability.shape)
        return self.chain[idx[0], idx[1]], float(self.lnprobability[idx])

    def best_fit_model(self):
        """ModifiedBlackbody at the maximum-probability sample -- evaluate
        it at any wavelength for a best-fit SED curve."""
        from mbb_emcee_tpu.models.modified_blackbody import ModifiedBlackbody
        theta, _ = self.best_fit
        return ModifiedBlackbody(
            *[float(v) for v in theta],
            wavenorm=self.shape.wavenorm,
            noalpha=self.shape.noalpha, opthin=self.shape.opthin)

    def par_cov(self):
        """Covariance matrix of the FREE parameters over the flattened
        chain (observer frame), with the free-parameter names.

        Returns (names, cov) where cov is (nfree, nfree)."""
        idx = self.param_spec.free_indices
        names = [PARAM_NAMES[i] for i in idx]
        cov = np.atleast_2d(
            np.cov(self.flatchain[:, idx].T.astype(np.float64)))
        return names, cov

    def sed_percentiles(self, waves, percentile=68.3, thin=1):
        """Posterior-predictive SED band: per-wavelength percentiles of
        f_nu over the (thinned) chain -- one batched device evaluation of
        (samples x wavelengths), replacing the per-sample model loop a
        reference user would write by hand.

        Returns (3, nwave): [median, upper, lower] in mJy at the OBSERVED
        wavelengths `waves` (micron)."""
        waves_j = jnp.asarray(np.atleast_1d(waves), jnp.float32)
        sed = derived.sed_eval(self.shape, waves_j)
        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        fluxes = np.asarray(jax.jit(jax.vmap(sed))(samples), np.float64)
        return derived.sed_band(fluxes, percentile, sample_axis=0)

    @property
    def free_param_names(self):
        """Names of the free parameters, in chain-column order (the same
        order gelman_rubin/autocorrelation_time report)."""
        return [PARAM_NAMES[i] for i in self.param_spec.free_indices]

    def gelman_rubin(self, rank_normalized=False):
        """Split-R-hat per free parameter: each walker's series is split
        in time halves and all halves treated as independent chains
        (Gelman et al., BDA3 sec. 11.4). Values near 1 indicate
        convergence; > ~1.05 means the ensemble has not mixed -- e.g. the
        T/lambda0 bimodality an optically-thick 5-band fit supports (see
        DESIGN.md section 5b) shows up here long before it is visible in
        percentile summaries.

        rank_normalized=True uses the Vehtari et al. (2021) estimator
        instead: max(bulk, folded-tail) split-R-hat of the
        rank-normalized samples -- calibrated even when the posterior is
        heavy-tailed or pressed against a box edge, and sensitive to
        chains agreeing in location but not scale.

        Returns the (nfree,) rhat array -- the same convention as
        MBBFitter.gelman_rubin and MultiFitter.gelman_rubin, so
        convergence loops compose across all three; pair with
        `free_param_names` for labels."""
        from mbb_emcee_tpu.sampler import (
            split_rhat, split_rhat_rank_normalized)
        idx = self.param_spec.free_indices
        chain = np.transpose(self.chain[:, :, idx], (1, 0, 2))
        if rank_normalized:
            return split_rhat_rank_normalized(chain)
        return split_rhat(chain)

    def effective_samples(self, kind="bulk"):
        """Per-free-parameter effective sample size of the stored chain
        (Vehtari et al. 2021 rank-normalized ESS; kind="bulk" for
        location summaries, "tail" for the 5%/95% interval endpoints,
        which mix slower). Returns the (nfree,) ESS array; pair with
        `free_param_names`. Rule of thumb: want ESS > ~400 for stable
        percentile reports."""
        from mbb_emcee_tpu.sampler import effective_sample_size
        idx = self.param_spec.free_indices
        chain = np.transpose(self.chain[:, :, idx], (1, 0, 2))
        return effective_sample_size(chain, kind=kind)

    def autocorrelation_time(self):
        """Per-free-parameter integrated autocorrelation time in steps,
        averaged over walkers (the emcee acor/get_autocorr_time analog the
        reference prints in verbose mode -- SURVEY.md section 5 metrics
        row)."""
        from mbb_emcee_tpu.sampler import autocorrelation_time
        free = self.chain[:, :, self.param_spec.free_indices]
        # (nwalkers, nsteps, nfree) -> sampler layout (nsteps, nwalkers, .)
        return autocorrelation_time(np.transpose(free, (1, 0, 2)))

    # -- goodness of fit -------------------------------------------------------------
    def posterior_predictive(self, thin=1, seed=0):
        """Posterior-predictive goodness-of-fit check (chi-sq discrepancy).

        ADDITIVE capability: the reference offers no absolute
        goodness-of-fit -- users eyeballed chi-square (SURVEY.md C6).
        For each (thinned) chain sample theta_t this compares the
        observed photometry against photometry REPLICATED from the
        fitted error model around that sample's model band fluxes
        m_t = m(theta_t):

            T_obs(t) = |W (m_t - y_obs)|^2
            y_rep(t) = m_t + L eps_t,  eps_t ~ N(0, I)
            T_rep(t) = |W (m_t - y_rep(t))|^2 = |eps_t|^2

        with L the Cholesky factor of the fit's error model (diag
        sigma^2 or the full calibration covariance) restricted to
        DETECTED bands, and W = L^-1 the whitening the likelihood used
        (the replicated discrepancy needs no matrix ops: W L eps = eps,
        exactly chi-square with ndata dof). The headline

            p_value = P[T_rep >= T_obs]

        is ~uniform under a well-specified model; p < ~0.01 flags
        misfit, p > ~0.99 overestimated errors. band_p[b] =
        P[y_rep,b >= y_obs,b] localizes which band misfits.

        Photometric upper-limit bands are EXCLUDED from the statistic
        and the replication (their one-sided penalty is not a proper
        sampling density to draw replicates from); their band_p is NaN.
        Model band fluxes use the same evaluation mode as the fitted
        likelihood -- band-integrated when the fit ran with instrument
        responses (the pack round-trips through HDF5), point evaluation
        otherwise -- in ONE batched device call over the thinned chain.

        Returns a PPCResult.
        """
        spec = self.param_spec
        wave = np.asarray(self.phot.wave, np.float64)
        y = np.asarray(self.phot.flux, np.float64)
        unc_all = np.asarray(self.phot.unc, np.float64)
        nb = wave.size
        uplim = (np.zeros(nb, bool) if spec.uplim_bands is None
                 else np.asarray(spec.uplim_bands, bool))
        # MISSING bands (ragged-catalog source views carry NaN flux/unc
        # and an inf-variance covariance row) are excluded like uplims.
        present = np.isfinite(y) & np.isfinite(unc_all) & (unc_all > 0)
        det_idx = np.where(present & ~uplim)[0]
        ndet = int(det_idx.size)
        if ndet == 0:
            raise RuntimeError(
                "posterior_predictive needs at least one detected "
                "(non-upper-limit) band")

        # Error model over the detected bands (marginal of the fit's
        # covariance), precomputed host fp64 like build_lnprob's whitener.
        if self.phot.cov is not None:
            chol = np.linalg.cholesky(np.asarray(self.phot.cov, np.float64)
                                      [np.ix_(det_idx, det_idx)])
            whiten = np.asarray(np.linalg.inv(chol), np.float32)
            lmat = np.asarray(chol, np.float32)
            sig32 = isig = None
        else:
            sig = np.asarray(self.phot.unc, np.float64)[det_idx]
            whiten = lmat = None
            sig32 = np.asarray(sig, np.float32)
            isig = np.asarray(1.0 / sig, np.float32)

        fluxes = derived.band_flux_eval(self.shape, wave,
                                        self.response_pack)
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
        y_rep = np.asarray(y_rep, np.float64)            # (n, ndet)

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
        """WAIC + PSIS-LOO predictive assessment over the stored chain.

        ADDITIVE capability (SURVEY.md C6: the reference has no
        predictive model checking): estimates the leave-one-band-out
        expected log predictive density elpd_loo, the WAIC twin, and the
        per-band Pareto k-hat reliability diagnostic -- the quantitative
        answer to "does the extra parameter actually predict better?"
        when comparing opthin/noalpha model variants on the same data
        (complementary to compute_evidence: elpd measures predictive
        accuracy, lnZ prior-weighted average fit).

        The (nsamples x nbands) pointwise log-likelihood matrix is ONE
        batched device program over the thinned chain (same evaluation
        mode as the fitted likelihood -- band-integrated when the fit
        used instrument responses); the PSIS tail smoothing runs
        host-side in fp64 (modelcheck.py). With a full error covariance
        the pointwise factors are the exact conditional predictive
        densities p(y_i | y_-i, theta) via the precision matrix.
        Censored (upper-limit) and missing bands carry no proper
        pointwise density and are excluded (modelcheck module
        docstring).

        Returns (and stores as .loo_result) a modelcheck.LooResult.
        """
        from mbb_emcee_tpu import modelcheck
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

        fluxes = derived.band_flux_eval(self.shape, wave,
                                        self.response_pack)
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

    # -- cosmology helpers -----------------------------------------------------------
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

    def _thinned(self, thin):
        flat = self.flatchain
        return flat[::max(int(thin), 1)]

    # -- L_IR ------------------------------------------------------------------------
    def compute_lir(self, wavemin=8.0, wavemax=1000.0, thin=1):
        """Posterior of L_IR(wavemin-wavemax um REST) in L_sun
        (ref: mbb_results.compute_lir). One batched GL quadrature over the
        thinned chain."""
        lam, w = derived.lir_nodes_weights(self._opz(), wavemin, wavemax)
        lam_j = jnp.asarray(lam, jnp.float32)
        w_j = jnp.asarray(w, jnp.float32)
        one = derived.lir_integrand(self.shape)

        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        integ = np.asarray(
            jax.jit(jax.vmap(lambda th: one(th, lam_j, w_j)))(samples),
            np.float64)
        self.lir_chain = derived.lir_prefactor(self._dl_mpc()) * integ
        self.lir_meta = {"wavemin": float(wavemin), "wavemax": float(wavemax),
                         "thin": int(thin)}
        return self.lir_chain

    def lir_cen(self, percentile=68.3):
        if self.lir_chain is None:
            self.compute_lir()
        return _percentile_summary(self.lir_chain, percentile)

    @property
    def lir(self):
        return self.lir_cen()

    # -- dust mass ---------------------------------------------------------------------
    def compute_dustmass(self, kappa=2.64, kappa_wave=125.0, thin=1):
        """Posterior of dust mass in M_sun (ref: mbb_results.compute_dustmass;
        kappa = 2.64 m^2 kg^-1 at rest 125 um, Dunne et al. 2003)."""
        opz = self._opz()
        lam_obs = jnp.asarray(kappa_wave * opz, jnp.float32)
        one = derived.dustmass_integrand(self.shape)

        samples = jnp.asarray(self._thinned(thin), jnp.float32)
        g = np.asarray(
            jax.jit(jax.vmap(lambda th: one(th, lam_obs)))(samples),
            np.float64)
        prefac = derived.dustmass_prefactor(self._dl_mpc(), opz, kappa,
                                            kappa_wave)
        self.dustmass_chain = prefac * g
        self.dustmass_meta = {"kappa": float(kappa),
                              "kappa_wave": float(kappa_wave),
                              "thin": int(thin)}
        return self.dustmass_chain

    def dustmass_cen(self, percentile=68.3):
        if self.dustmass_chain is None:
            self.compute_dustmass()
        return _percentile_summary(self.dustmass_chain, percentile)

    @property
    def dustmass(self):
        return self.dustmass_cen()

    # -- peak wavelength -----------------------------------------------------------------
    def compute_peaklambda(self, thin=1, lo=_PEAK_RANGE[0],
                           hi=_PEAK_RANGE[1]):
        """Posterior of the OBSERVED f_nu peak wavelength in um
        (ref: mbb_results.compute_peaklambda). Batched golden-section in
        ln-lambda replaces the reference's per-sample bounded optimizer."""
        peak = derived.peak_finder(self.shape, lo, hi)
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

    # -- plotting ----------------------------------------------------------------------------
    def plot_sed(self, **kw):
        """Photometry + posterior-predictive SED band (see
        plotting.plot_sed; batched device evaluation of the chain)."""
        from mbb_emcee_tpu import plotting
        return plotting.plot_sed(self, **kw)

    def plot_corner(self, **kw):
        """Corner plot of the free-parameter posteriors
        (see plotting.plot_corner)."""
        from mbb_emcee_tpu import plotting
        return plotting.plot_corner(self, **kw)

    def plot_chain(self, **kw):
        """Per-walker trace plots (see plotting.plot_chain)."""
        from mbb_emcee_tpu import plotting
        return plotting.plot_chain(self, **kw)

    def plot_ppc(self, **kw):
        """Posterior-predictive check figure: replicated vs observed
        chi-square with the p-value annotated (see plotting.plot_ppc)."""
        from mbb_emcee_tpu import plotting
        return plotting.plot_ppc(self, **kw)

    # -- persistence -------------------------------------------------------------------------
    def writeToHDF5(self, filename):
        """Persist everything needed to resume analysis
        (ref: mbb_results.writeToHDF5; same logical schema, SURVEY.md C7)."""
        hdf5io.write_results(filename, self)
        return filename

    # -- reporting ------------------------------------------------------------------------------
    def __repr__(self):
        lines = ["MBBResults:"]
        fixed = self.param_spec.fixed
        for i, name in enumerate(PARAM_NAMES):
            if fixed[i]:
                lines.append(f"  {name:8s} fixed at "
                             f"{self.param_spec.fixed_values[i]:.5g}")
            else:
                c = self.par_cen(i)
                lines.append(f"  {name:8s} {c[0]:.5g} +{c[1]:.3g} -{c[2]:.3g}")
        if self.lir_chain is not None:
            c = self.lir_cen()
            lines.append(f"  L_IR    {c[0]:.5g} +{c[1]:.3g} -{c[2]:.3g} Lsun")
        if self.dustmass_chain is not None:
            c = self.dustmass_cen()
            lines.append(f"  M_dust  {c[0]:.5g} +{c[1]:.3g} -{c[2]:.3g} Msun")
        if self.peaklambda_chain is not None:
            c = self.peaklambda_cen()
            lines.append(f"  l_peak  {c[0]:.5g} +{c[1]:.3g} -{c[2]:.3g} um")
        return "\n".join(lines)
