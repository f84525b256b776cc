"""Fisher-matrix observing forecasts: predicted parameter errors for a
PROPOSED observation, before any data exist.

ADDITIVE capability (absent upstream): survey design asks "which bands,
at what depth, pin T (or the photo-z z) to the precision I need?" The
Gaussian-likelihood Fisher matrix answers it in microseconds per
configuration:

    F_ij = sum_b  (dm_b/dth_i)(dm_b/dth_j) / sigma_b^2   +  P_ij

with m_b the model fluxes (point or response-integrated), evaluated at
a fiducial theta, and P the Gaussian-prior precision (priors are part
of the forecast: the photo-z T prior is exactly what makes sigma(z)
finite). The forecast covariance is F^-1 over the FREE parameters --
the Cramer-Rao floor, and for the near-Gaussian posteriors of
well-measured SEDs a good estimate of the MCMC widths (validated
against full fits in tests/test_forecast.py).

This is where autodiff earns its keep: the flux Jacobian dm/dtheta is
one `jax.jacfwd` of the SAME model code every sampler tier uses --
opacity pivot, Wien merge root-solve, CMB corrections, filter
quadrature and all -- so the forecast can never drift from the
likelihood it predicts. The reference's NumPy model has no derivatives;
forecasting there means brute-force mock fits.

Correlated band errors: pass `cov=` (the calibration-floor covariance)
and the Jacobian is whitened by the Cholesky inverse, F = J^T C^-1 J.

Caveats (stated, not hidden): the Fisher forecast assumes the posterior
is Gaussian at the fiducial point. Strong degeneracies that BEND in
parameter space (the T-z ridge with weak priors, T-lambda0 bimodality)
make it optimistic -- compare `ForecastResult.corr()` against 1 and run
a mock MCMC when correlations exceed ~0.97.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ForecastResult", "forecast", "forecast_mbb"]


@dataclasses.dataclass
class ForecastResult:
    """Fisher forecast at a fiducial theta: free-parameter errors."""
    param_names: tuple          # free parameter names, Fisher order
    theta0: np.ndarray          # (npar,) fiducial full-space vector
    fisher: np.ndarray          # (nfree, nfree)
    cov: np.ndarray             # (nfree, nfree) = fisher^-1
    fluxes: np.ndarray          # (nb,) model fluxes at theta0
    snr: np.ndarray             # (nb,) per-band S/N of the fiducial

    def _k(self, param):
        key = str(param).lower()
        names = [n.lower() for n in self.param_names]
        if key not in names:
            raise ValueError(
                f"{param!r} is not a free forecast parameter; "
                f"free: {list(self.param_names)}")
        return names.index(key)

    def sigma(self, param):
        """Forecast 1-sigma marginal error (Cramer-Rao floor)."""
        return float(np.sqrt(self.cov[self._k(param), self._k(param)]))

    def sigmas(self):
        return {n: float(np.sqrt(self.cov[k, k]))
                for k, n in enumerate(self.param_names)}

    def corr(self):
        """(nfree, nfree) forecast correlation matrix."""
        s = np.sqrt(np.diag(self.cov))
        return self.cov / np.outer(s, s)

    def __repr__(self):
        lines = ["ForecastResult:"]
        for n, s in self.sigmas().items():
            lines.append(f"  sigma({n}) = {s:.4g}")
        c = np.abs(self.corr() - np.eye(len(self.param_names))).max()
        lines.append(f"  max |corr| = {c:.3f}"
                     + ("  [near-degenerate: verify with a mock MCMC]"
                        if c > 0.97 else ""))
        return "\n".join(lines)


def _whiten_from(unc, cov, nb):
    """(whiten, band_sigma): the Cholesky-inverse whitening matrix (None
    for the diagonal fast path) and the per-band 1-sigma depths."""
    if cov is None and unc is None:
        raise ValueError(
            "a forecast needs the expected noise: pass unc= (per-band "
            "1-sigma depths) or cov= (full band covariance)")
    if cov is not None and unc is not None:
        # silently preferring one would compute every Fisher forecast
        # from the wrong noise model in a depth-scan that updates unc
        # but keeps a stale cov kwarg
        raise ValueError(
            "pass unc= OR cov=, not both (ambiguous noise model; fold "
            "the depths into the covariance diagonal if you mean both)")
    if cov is not None:
        cov = np.asarray(cov, np.float64)
        if cov.shape != (nb, nb):
            raise ValueError(f"cov must be ({nb}, {nb}); got {cov.shape}")
        try:
            chol = np.linalg.cholesky(cov)
        except np.linalg.LinAlgError:
            raise ValueError(
                "cov= must be a symmetric positive-definite band "
                "covariance") from None
        return np.linalg.inv(chol), np.sqrt(np.diag(cov))
    unc = np.atleast_1d(np.asarray(unc, np.float64))
    if unc.shape != (nb,):
        raise ValueError(f"unc must be ({nb},); got {unc.shape}")
    if np.any(~np.isfinite(unc) | (unc <= 0)):
        raise ValueError("forecast uncertainties must be positive and "
                         "finite (drop bands you will not observe)")
    return None, unc  # diagonal fast path


def forecast(model, theta0, wave, unc=None, cov=None, responses=None,
             priors=None, fixed=()):
    """Fisher forecast for a generic sed.SEDModel at fiducial `theta0`.

    wave/unc describe the PROPOSED bands (observed um, expected 1-sigma
    mJy); `cov=` replaces unc with a full band covariance. `responses=`
    is a ResponseSet pack over named bands exactly as in fitting (pass
    the (nodes, weights) pack from ResponseSet.pack, or None for point
    evaluation). `priors={"T": (mu, sigma), ...}` adds Gaussian-prior
    precision (the mean does not enter the Fisher matrix -- only sigma
    does). `fixed` names parameters held fixed (excluded from the
    forecast space).

    Returns a ForecastResult over the remaining free parameters.
    """
    from mbb_emcee_tpu.likelihood import FreeSpace

    theta0 = np.asarray(theta0, np.float64)
    if theta0.shape != (model.npar,):
        raise ValueError(
            f"theta0 must be ({model.npar},) for model {model.name!r}")
    wave = np.atleast_1d(np.asarray(wave, np.float64))
    nb = wave.size
    whiten, band_sigma = _whiten_from(unc, cov, nb)

    fixed_idx = sorted({model.param_index(p) for p in fixed})
    free_idx = np.array([i for i in range(model.npar)
                         if i not in fixed_idx], int)
    if free_idx.size == 0:
        raise ValueError("every parameter is fixed; nothing to forecast")
    names = tuple(model.param_names[i] for i in free_idx)
    # the SAME reduced-space embedding every lnprob builder uses
    # (likelihood.FreeSpace -- parallel copies of this mapping are
    # banned, see its docstring), with the FIDUCIAL at the fixed slots
    template = theta0.copy()
    template[free_idx] = 0.0
    fs = FreeSpace(free_idx=free_idx, template=template,
                   lower=np.asarray(model.lower)[free_idx].copy(),
                   upper=np.asarray(model.upper)[free_idx].copy())
    t_j = jnp.asarray(template, jnp.float32)
    s_j = jnp.asarray(fs.scatter_matrix(np.float32))
    w_j = jnp.asarray(wave, jnp.float32)
    if responses is not None:
        rw_np = np.asarray(responses[0])
        if rw_np.shape[0] != nb:
            raise ValueError(
                f"the response pack covers {rw_np.shape[0]} bands but "
                f"wave/unc describe {nb}; pack the same band list you "
                "are forecasting")
        rw = jnp.asarray(rw_np, jnp.float32)
        rwt = jnp.asarray(np.asarray(responses[1]), jnp.float32)

    def fluxes_free(th_free):
        th = t_j + s_j @ th_free
        if responses is None:
            return model.fnu(th, w_j)
        return jnp.sum(rwt * model.fnu(th, rw), axis=-1)

    # eager evaluation: each configuration is used exactly once, so jit
    # would pay a full compile for nothing -- the survey-scan speed claim
    # rests on NOT compiling per band set
    th_free0 = jnp.asarray(theta0[free_idx], jnp.float32)
    m0 = np.asarray(fluxes_free(th_free0), np.float64)
    jac = np.asarray(jax.jacfwd(fluxes_free)(th_free0),
                     np.float64)                      # (nb, nfree)
    if not np.isfinite(jac).all():
        raise ValueError(
            "non-finite flux derivatives at theta0 -- move the fiducial "
            "off the box edge / merge discontinuity")
    snr = m0 / band_sigma
    jw = (jac / band_sigma[:, None]) if whiten is None else whiten @ jac
    F = jw.T @ jw
    if priors:
        for p, (_, sig) in priors.items():
            key = str(p).lower()
            lnames = [n.lower() for n in names]
            if key not in lnames:
                raise ValueError(
                    f"prior on {p!r}: not a free forecast parameter")
            sig = float(sig)
            if not (np.isfinite(sig) and sig > 0):
                raise ValueError(f"prior sigma on {p!r} must be positive")
            k = lnames.index(key)
            F[k, k] += 1.0 / sig ** 2
    # guard singular Fisher (exact degeneracy, e.g. photo-z with no
    # prior): report cleanly instead of returning garbage covariances.
    # The test runs on the CORRELATION-normalized matrix: raw cond(F)
    # is not invariant under parameter units/rescaling, so a benign
    # scale disparity (mJy vs K derivatives) must not read as a
    # degeneracy -- only actual correlation structure should.
    d = np.diag(F)
    if np.any(d <= 0) or not np.isfinite(d).all():
        raise ValueError(
            "a forecast parameter carries no information at this "
            "configuration (zero Fisher diagonal) -- fix it or add a "
            "prior")
    dn = np.sqrt(d)
    cond = np.linalg.cond(F / np.outer(dn, dn))
    if not np.isfinite(cond) or cond > 1e10:
        raise ValueError(
            "the Fisher matrix is singular at this configuration "
            f"(normalized condition number {cond:.2e}): an exact "
            "degeneracy survives -- add a prior (photo-z: the T prior) "
            "or fix a parameter")
    cov_f = np.linalg.inv(F)
    return ForecastResult(param_names=names, theta0=theta0, fisher=F,
                          cov=cov_f, fluxes=m0, snr=snr)


def forecast_mbb(theta0, wave, unc=None, cov=None, opthin=False,
                 noalpha=False, wavenorm=500.0, priors=None, fixed=()):
    """Fisher forecast for the core observer-frame MBB (the reference's
    5-parameter model): builds the SEDModel wrapper over the same
    log-space kernel every sampler uses, then delegates to `forecast`.
    `fixed` defaults to the physics-implied set (lambda0 under opthin,
    alpha under noalpha are inert and are ALWAYS excluded)."""
    from mbb_emcee_tpu.sed import SEDModel
    from mbb_emcee_tpu.likelihood import DEFAULT_LOWER, DEFAULT_UPPER
    from mbb_emcee_tpu.models.modified_blackbody import (
        log_mbb_fnu, MBBShape)

    shape = MBBShape(opthin=bool(opthin), noalpha=bool(noalpha),
                     wavenorm=float(wavenorm))

    def fnu(th, w):
        return jnp.exp(log_mbb_fnu(th, w, shape))

    model = SEDModel(fnu=fnu,
                     param_names=("T", "beta", "lambda0", "alpha",
                                  "fnorm"),
                     lower=DEFAULT_LOWER.copy(), upper=DEFAULT_UPPER.copy(),
                     name="mbb-forecast")
    # normalize to indices so integer-addressed entries work exactly as
    # in forecast() itself
    fixed_idx = {model.param_index(p) for p in fixed}
    if opthin:
        fixed_idx.add(model.param_index("lambda0"))
    if noalpha:
        fixed_idx.add(model.param_index("alpha"))
    return forecast(model, theta0, wave, unc=unc, cov=cov,
                    priors=priors, fixed=sorted(fixed_idx))
