"""Photometry container and the fused lnprob builder.

Rebuild of the reference's likelihood (ref: mbb_emcee/mbb_fit.py,
mbb_fitter.__call__ -- reconstructed, SURVEY.md C3): Gaussian
lnL = -1/2 Delta^T C^-1 Delta with C = diag(sigma^2) or a full covariance
(optionally read from a FITS extension), hard box limits per parameter,
optional Gaussian priors, and fixed parameters.

TPU-first design decisions:
  * Fixed parameters are handled by sampling in the REDUCED free-parameter
    space and scattering into the full theta with a (5, nfree) 0/1 matrix --
    cleaner than the reference's identical-walker trick and it makes the
    stretch move's z^(d-1) factor use d = n_free, the statistically correct
    ensemble dimension (SURVEY.md "hard parts").
  * The covariance Cholesky factor is inverted ONCE host-side in fp64; the
    per-walker whitening is then a tiny matmul, so the whole lnprob --
    model eval, band quadrature, whitening, priors, box mask -- fuses into
    one XLA computation vmapped over walkers.
  * Out-of-box proposals are clamped before the model eval (keeps everything
    NaN-free) and masked to a large negative lnprob (finite, so
    lnp_new - lnp_old never produces inf - inf).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from mbb_emcee_tpu.constants import PARAM_NAMES, NPARAMS
from mbb_emcee_tpu.models.modified_blackbody import (
    mbb_fnu, log_mbb_fnu, MBBShape)
from mbb_emcee_tpu.utils.fits import read_fits_image

# Finite lnprob floor standing in for -inf (see module docstring).
LNPROB_FLOOR = -1e30

# Acceptance-guard threshold: any lnprob above this is "in support", any
# at/below it is the out-of-box floor. The guard exists because an
# acceptance uniform can be EXACTLY 0 in fp32 (P ~ 2^-23 per draw), and
# log(0) = -inf compares below even the finite LNPROB_FLOOR -- emcee's
# true -inf floor rejects that case (-inf < -inf is False), so samplers
# here must add `& (lnp_prop > SUPPORT_FLOOR)` to their accept masks or a
# production-scale run records out-of-box positions.
SUPPORT_FLOOR = -1e25

# Default hard box (observer frame). Wide enough to act as "no limit set",
# finite so clamping is always possible. Users narrow via set_lowlim/uplim.
DEFAULT_LOWER = np.array([0.1, 0.01, 1.0, 0.01, 1e-5], dtype=np.float64)
DEFAULT_UPPER = np.array([1e3, 20.0, 2e4, 60.0, 1e7], dtype=np.float64)


def param_index(name_or_idx):
    """Accept a parameter name (case-insensitive, 'T'/'beta'/...) or index."""
    if isinstance(name_or_idx, (int, np.integer)):
        idx = int(name_or_idx)
        if not 0 <= idx < NPARAMS:
            raise ValueError(f"parameter index {idx} out of range")
        return idx
    lowered = [p.lower() for p in PARAM_NAMES]
    key = str(name_or_idx).lower()
    if key in lowered:
        return lowered.index(key)
    # Friendly aliases.
    aliases = {"t/(1+z)": 0, "temperature": 0, "lambda_0": 2,
               "lambda0*(1+z)": 2, "f500": 4}
    if key in aliases:
        return aliases[key]
    raise ValueError(f"unknown parameter {name_or_idx!r}; "
                     f"known: {PARAM_NAMES}")


@dataclasses.dataclass
class Photometry:
    """Observed photometry: wavelengths (um), fluxes and errors (mJy),
    optional full covariance (mJy^2) and band names (for response mode)."""
    wave: np.ndarray
    flux: np.ndarray
    unc: np.ndarray
    cov: np.ndarray | None = None
    band_names: list[str] | None = None

    def __post_init__(self):
        self.wave = np.atleast_1d(np.asarray(self.wave, dtype=np.float64))
        self.flux = np.atleast_1d(np.asarray(self.flux, dtype=np.float64))
        self.unc = np.atleast_1d(np.asarray(self.unc, dtype=np.float64))
        n = self.wave.size
        if self.flux.size != n or self.unc.size != n:
            raise ValueError("photometry wave/flux/unc length mismatch")
        if np.any(self.unc <= 0):
            raise ValueError("photometric uncertainties must be positive")
        if self.cov is not None:
            self.cov = np.asarray(self.cov, dtype=np.float64)
            if self.cov.shape != (n, n):
                raise ValueError(
                    f"covariance shape {self.cov.shape} != ({n},{n})")
        if self.band_names is not None and len(self.band_names) != n:
            raise ValueError("band_names length mismatch")

    @property
    def nbands(self):
        return self.wave.size

    @classmethod
    def from_file(cls, photfile):
        """Text photometry: '[name] wave flux unc' per line, # comments.

        Mirrors the reference's read_data text format (3 numeric columns);
        an optional leading band-name column enables response mode.
        """
        waves, fluxes, uncs, names = [], [], [], []
        have_names = None
        with open(photfile) as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                parts = line.split()
                named = False
                try:
                    float(parts[0])
                except ValueError:
                    named = True
                if have_names is None:
                    have_names = named
                elif have_names != named:
                    raise ValueError(
                        f"{photfile}:{lineno}: inconsistent columns")
                if named:
                    if len(parts) < 4:
                        raise ValueError(
                            f"{photfile}:{lineno}: need 'name wave flux unc'")
                    names.append(parts[0])
                    parts = parts[1:]
                elif len(parts) < 3:
                    raise ValueError(
                        f"{photfile}:{lineno}: need 'wave flux unc'")
                waves.append(float(parts[0]))
                fluxes.append(float(parts[1]))
                uncs.append(float(parts[2]))
        if not waves:
            raise ValueError(f"{photfile}: no photometry found")
        return cls(np.array(waves), np.array(fluxes), np.array(uncs),
                   band_names=names if have_names else None)

    def read_cov(self, covfile, covextn=0, is_total=False):
        """Attach a covariance from a FITS extension (ref covfile/covextn
        semantics). Unless is_total, it is treated as ADDITIONAL calibration
        covariance on top of diag(unc^2)."""
        cov = np.asarray(read_fits_image(covfile, extn=covextn),
                         np.float64)
        # Validate HERE, not at first use: a wrong covextn otherwise
        # surfaces as an opaque cholesky/matmul shape error deep inside
        # build_lnprob (the constructor path gets the same checks from
        # __post_init__).
        n = self.wave.size
        if cov.shape != (n, n):
            raise ValueError(
                f"{covfile}[{covextn}]: covariance shape {cov.shape} "
                f"does not match the {n}-band photometry -- wrong "
                "extension (covextn) or wrong file?")
        if not np.allclose(cov, cov.T, rtol=1e-8, atol=0.0):
            raise ValueError(
                f"{covfile}[{covextn}]: covariance matrix is not "
                "symmetric")
        if not is_total:
            cov = cov + np.diag(self.unc ** 2)
        if np.linalg.eigvalsh(cov).min() <= 0:
            raise ValueError(
                f"{covfile}[{covextn}]: covariance is not positive "
                "definite" + ("" if is_total else
                              " (even after adding diag(unc^2))"))
        self.cov = cov
        return self


@dataclasses.dataclass(frozen=True)
class LikelihoodSpec:
    """Frozen parameter-space configuration the lnprob is built from."""
    lower: np.ndarray          # (5,) hard box
    upper: np.ndarray          # (5,)
    fixed: np.ndarray          # (5,) bool
    fixed_values: np.ndarray   # (5,) values used where fixed
    prior_mean: np.ndarray     # (5,)
    prior_isigma: np.ndarray   # (5,) 1/sigma, 0 disables the prior
    # Photometric upper limits: one-sided Gaussian penalty above the limit
    # for bands flagged here (flux column = limit value).
    uplim_bands: np.ndarray | None = None  # (nbands,) bool; the batched
    # serving path also accepts a per-source (S, nbands) mask

    @classmethod
    def default(cls):
        return cls(lower=DEFAULT_LOWER.copy(), upper=DEFAULT_UPPER.copy(),
                   fixed=np.zeros(NPARAMS, bool),
                   fixed_values=np.zeros(NPARAMS),
                   prior_mean=np.zeros(NPARAMS),
                   prior_isigma=np.zeros(NPARAMS))

    @classmethod
    def for_box(cls, lower, upper):
        """Generic-model variant of default(): an npar-sized spec from an
        explicit hard box (sed.SEDModel parameter spaces)."""
        lower = np.asarray(lower, np.float64).copy()
        upper = np.asarray(upper, np.float64).copy()
        if lower.shape != upper.shape or lower.ndim != 1:
            raise ValueError("lower/upper must be matching 1-D arrays")
        if np.any(lower >= upper):
            raise ValueError("each lower limit must be < its upper limit")
        n = lower.size
        return cls(lower=lower, upper=upper, fixed=np.zeros(n, bool),
                   fixed_values=np.zeros(n), prior_mean=np.zeros(n),
                   prior_isigma=np.zeros(n))

    @property
    def free_indices(self):
        return np.nonzero(~self.fixed)[0]

    @property
    def nfree(self):
        return int((~self.fixed).sum())


@dataclasses.dataclass(frozen=True)
class FreeSpace:
    """Mapping between the reduced sampling space and full theta."""
    free_idx: np.ndarray       # (nfree,)
    template: np.ndarray       # (5,) zeros at free slots, fixed values else
    lower: np.ndarray          # (nfree,)
    upper: np.ndarray          # (nfree,)

    @property
    def nfree(self):
        return self.free_idx.size

    @classmethod
    def from_spec(cls, spec):
        """The reduced space a LikelihoodSpec defines -- the ONE place
        this mapping is derived (build_lnprob, build_lnprob_data, and
        both Pallas twins share it; parallel copies drifted once)."""
        free_idx = spec.free_indices
        if free_idx.size == 0:
            raise ValueError("all parameters are fixed; nothing to sample")
        return cls(free_idx=free_idx,
                   template=np.where(spec.fixed, spec.fixed_values, 0.0),
                   lower=spec.lower[free_idx].copy(),
                   upper=spec.upper[free_idx].copy())

    def scatter_matrix(self, dtype=np.float64):
        """(npar, nfree) scatter: theta = template + scatter @ free.
        Sized from the template so generic models (sed.py) with npar != 5
        share this mapping."""
        s = np.zeros((self.template.size, self.nfree), dtype)
        s[self.free_idx, np.arange(self.nfree)] = 1.0
        return s

    def expand(self, free_vals):
        """(..., nfree) free-space -> (..., npar) full parameter vectors."""
        free_vals = np.asarray(free_vals)
        out = np.broadcast_to(self.template,
                              free_vals.shape[:-1]
                              + (self.template.size,)).copy()
        out[..., self.free_idx] = free_vals
        return out

    def reduce(self, full_vals):
        return np.asarray(full_vals)[..., self.free_idx]


class SpecArrays(NamedTuple):
    """Host-numpy closure constants every lnprob builder derives from a
    LikelihoodSpec. ONE derivation (likelihood/sed/hierarchy builders all
    use it; FreeSpace.from_spec's docstring records why parallel copies
    are banned). Closure constants stay HOST numpy: a jnp closure
    constant must be fetched device->host at trace time to inline as an
    MLIR constant (~1 s per array over this environment's TPU tunnel).
    """
    free_space: "FreeSpace"
    template: np.ndarray       # (npar,)
    scatter: np.ndarray        # (npar, nfree)
    lo_free: np.ndarray        # (nfree,) sampling box
    hi_free: np.ndarray
    lo_full: np.ndarray        # (npar,) NaN-safety clip window, widened
    hi_full: np.ndarray        # to contain out-of-box fixed values
    prior_mean: np.ndarray     # (npar,)
    prior_isig: np.ndarray


def spec_arrays(spec: LikelihoodSpec, dtype) -> SpecArrays:
    """Derive the reduced-space mapping + clip window + prior arrays.

    The clip bounds for the model eval must CONTAIN fixed values that sit
    outside the sampling box (fix_param('alpha', 0.0) with the default
    box lower of 0.01) -- clamping a fixed parameter to the box would
    silently evaluate a different model than the Pallas kernels, which
    widen their limits window around the fixed value
    (ops/pallas_lnprob.py)."""
    free_space = FreeSpace.from_spec(spec)
    free_idx = free_space.free_idx
    return SpecArrays(
        free_space=free_space,
        template=np.asarray(free_space.template, dtype),
        scatter=np.asarray(free_space.scatter_matrix(), dtype),
        lo_free=np.asarray(spec.lower[free_idx], dtype),
        hi_free=np.asarray(spec.upper[free_idx], dtype),
        lo_full=np.asarray(np.where(spec.fixed,
                                    np.minimum(spec.lower,
                                               spec.fixed_values),
                                    spec.lower), dtype),
        hi_full=np.asarray(np.where(spec.fixed,
                                    np.maximum(spec.upper,
                                               spec.fixed_values),
                                    spec.upper), dtype),
        prior_mean=np.asarray(spec.prior_mean, dtype),
        prior_isig=np.asarray(spec.prior_isigma, dtype))


def build_lnprob(phot: Photometry, shape: MBBShape, spec: LikelihoodSpec,
                 response_pack=None, dtype=jnp.float32):
    """Build the fused lnprob over the FREE parameter space.

    Returns (lnprob_fn, free_space). lnprob_fn maps a (nfree,) vector to a
    scalar log-probability; vmap it over walkers. If `response_pack` is a
    (waves, weights) pair from ResponseSet.pack, model fluxes are
    band-integrated; otherwise the SED is sampled at the data wavelengths
    (the reference's default point evaluation).
    """
    sa = spec_arrays(spec, dtype)
    free_space = sa.free_space
    (template, scatter, lo_free, hi_free, lo_full, hi_full,
     prior_mean, prior_isig) = sa[1:]

    data_flux = np.asarray(phot.flux, dtype)
    data_wave = np.asarray(phot.wave, dtype)

    # Whitening operator, precomputed host-side in fp64 (SURVEY.md C3
    # "Cholesky precomputed once").
    if phot.cov is not None:
        chol = np.linalg.cholesky(phot.cov)
        whiten_np = np.linalg.inv(chol)          # r = L^-1 Delta
        whiten = np.asarray(whiten_np, dtype)
        diag_iunc = None
    else:
        whiten = None
        diag_iunc = np.asarray(1.0 / phot.unc, dtype)

    if spec.uplim_bands is not None and spec.uplim_bands.any():
        uplim_mask = np.asarray(spec.uplim_bands.astype(np.float32), dtype)
        det_mask = 1.0 - uplim_mask
    else:
        uplim_mask = None
        det_mask = None

    if response_pack is not None:
        resp_waves, resp_weights = response_pack
        resp_waves = resp_waves.astype(dtype)
        resp_weights = resp_weights.astype(dtype)

    def model_fluxes(theta):
        if response_pack is None:
            return mbb_fnu(theta, data_wave, shape)
        vals = jnp.exp(log_mbb_fnu(theta, resp_waves, shape))
        return jnp.sum(resp_weights * vals, axis=-1)

    def lnprob(theta_free):
        theta = template + scatter @ theta_free
        inbox = jnp.all((theta_free >= lo_free) & (theta_free <= hi_free))
        theta_safe = jnp.clip(theta, lo_full, hi_full)
        delta = model_fluxes(theta_safe) - data_flux
        if uplim_mask is not None:
            # Upper-limit bands: penalize only flux above the limit.
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


def signed_iunc(unc, uplim_bands=None):
    """(..., nb) inverse uncertainties with NEGATIVE sign marking
    upper-limit slots (the sign encoding build_lnprob_data's batch
    likelihood reads). `uplim_bands` may be a shared (nb,) mask, a
    per-source (S, nb) mask, or None; non-finite unc (missing bands)
    maps to exactly 0 weight either way."""
    unc = np.asarray(unc, np.float64)
    if np.any(np.isfinite(unc) & (unc <= 0.0)):
        raise ValueError(
            "uncertainties must be positive; mark missing bands with "
            "NaN/inf, not 0 (1/0 = inf would silently floor every "
            "proposal's lnprob and freeze that source's chain)")
    with np.errstate(divide="ignore"):
        iunc = np.where(np.isfinite(unc), 1.0 / unc, 0.0)
    if uplim_bands is not None:
        m = np.broadcast_to(np.asarray(uplim_bands, bool), iunc.shape)
        iunc = np.where(m, -iunc, iunc)
    return iunc


def build_lnprob_data(shape: MBBShape, spec: LikelihoodSpec,
                      response_pack=None, dtype=jnp.float32,
                      correlated=False):
    """Data-parameterized variant of build_lnprob for BATCHED multi-source
    fitting (multifit.py): the photometry arrives as ARGUMENTS so one traced
    function serves every source under vmap.

    Returns (lnprob_fn, free_space) with
        lnprob_fn(theta_free (nfree,), wave (nb,), flux (nb,), iunc (nb,))
    Diagonal errors only; iunc is SIGNED 1/sigma (negative = that band's
    flux is a one-sided upper limit; see signed_iunc). Box/priors/fixed
    params are the shared static `spec`, exactly as in build_lnprob.

    With correlated=True the 4th argument is instead a per-source
    (nb, nb) WHITENING matrix W with r = W @ delta (correlated band
    errors -- the batch analog of build_lnprob's covariance mode; see
    MultiFitter.set_band_correlation, which builds W host-side honoring
    each source's missing-band pattern). One-sided upper limits do not
    compose with correlated errors, mirroring the single-fit refusal
    (ops/pallas_lnprob.py); spec.uplim_bands must be unset.
    """
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
        resp_waves, resp_weights = response_pack
        resp_waves = resp_waves.astype(dtype)
        resp_weights = resp_weights.astype(dtype)

    def lnprob(theta_free, wave, flux, iunc):
        theta = template + scatter @ theta_free
        inbox = jnp.all((theta_free >= lo_free) & (theta_free <= hi_free))
        theta_safe = jnp.clip(theta, lo_full, hi_full)
        if response_pack is None:
            model = mbb_fnu(theta_safe, wave, shape)
        else:
            vals = jnp.exp(log_mbb_fnu(theta_safe, resp_waves, shape))
            model = jnp.sum(resp_weights * vals, axis=-1)
        delta = model - flux
        if correlated:
            # iunc is a per-source (nb, nb) whitening matrix (zero
            # rows/cols at missing bands -- exact marginalization,
            # precomputed host-side from the pattern submatrices).
            r = iunc @ delta
        else:
            # Sign-encoded upper limits: iunc < 0 marks a band whose
            # flux is an upper limit for THIS source (one-sided
            # likelihood -- only model flux ABOVE the limit is
            # penalized); the magnitude is 1/sigma either way. Riding
            # the sign of an existing per-source operand keeps the
            # masks out of the compiled program: no extra operands, and
            # one program regardless of which sources have limits (see
            # signed_iunc).
            delta = jnp.where(iunc < 0, jnp.maximum(delta, 0.0), delta)
            r = delta * jnp.abs(iunc)
        lnl = -0.5 * jnp.sum(r * r)
        dp = (theta - prior_mean) * prior_isig
        lnpri = -0.5 * jnp.sum(dp * dp)
        return jnp.where(inbox, lnl + lnpri, dtype(LNPROB_FLOOR))

    return lnprob, free_space
