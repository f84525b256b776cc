"""CMB heating and background corrections for high-redshift greybody fits.

ADDITIVE capability (absent upstream): at z of a few and beyond, the CMB
is no longer negligible for cold dust -- it HEATS the grains (the dust
temperature cannot fall below T_CMB(z) = T_CMB,0 (1+z)) and it is the
BACKGROUND the photometry is measured against (only the contrast above
the CMB is observable). Ignoring both biases T low and the inferred dust
mass high for cold high-z sources. The standard treatment is
da Cunha et al. (2013, ApJ 766, 13):

  T_dust(z)   = [ T_intr^(4+beta) + T_CMB,0^(4+beta) ((1+z)^(4+beta) - 1)
                ]^(1/(4+beta))                                    (eq. 12)
  S_obs(nu)  /= 1 - B_nu(T_CMB(z)) / B_nu(T_dust(z))              (eq. 18)

where T_intr is the temperature starlight heating alone would produce.
The (4+beta) exponent balances the grain's absorbed CMB power against
its re-emission with a nu^beta emissivity.

This ships as a GENERIC-TIER model factory (`cmb_corrected_mbb` returns
a sed.SEDModel) rather than an MBBShape flag: the hot MBB Pallas kernels
stay untouched, and the model runs through every generic-surface tier
(SEDFitter/SEDResults, SEDMultiFitter, HMC/PT/nested/MAP, response
integration, L_IR/peak-lambda posteriors, PPC, LOO, HDF5, run_sed_tpu).

Parameterization note: unlike the core MBB surface (observer-frame
T/(1+z), lambda0*(1+z) -- the reference's convention), this model's
parameters are REST-FRAME: T is the intrinsic dust temperature and
lambda0 the rest-frame opacity pivot, because the CMB physics needs the
true temperatures and the redshift explicitly. fnorm remains the
OBSERVED flux at the observed `wavenorm` (default 500 um), so data
plumbing is unchanged. One factory instance carries one redshift; batch
fits through SEDMultiFitter therefore describe sources at a shared z
(a protocluster sample) -- fit per-z singles for a general catalog.

Everything is fp32-safe in log space: the Planck-occupation ratio
B(T_CMB)/B(T_dust) = expm1(x_dust)/expm1(x_cmb) is evaluated as a
difference of ln-expm1 terms (x_cmb reaches ~10^3 on the Wien side,
where e^x overflows fp32 but the ratio underflows harmlessly to 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from mbb_emcee_tpu.constants import HCOK_UM_K
from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu, MBBShape

# Fixsen (2009) CMB monopole temperature.
T_CMB0 = 2.72548


def cmb_temperature(z, t_cmb0=T_CMB0):
    """T_CMB at redshift z (adiabatic scaling)."""
    return t_cmb0 * (1.0 + z)


def dust_temperature_with_cmb(t_intrinsic, beta, z, t_cmb0=T_CMB0):
    """da Cunha et al. (2013) eq. 12: the equilibrium dust temperature
    when starlight heating (which alone would produce `t_intrinsic`)
    and CMB heating at redshift z both act on grains with a nu^beta
    emissivity. Always >= max(t_intrinsic, T_CMB(z) as t_intrinsic->0);
    reduces to t_intrinsic at z = 0.

    Evaluated in log space: T^(4+beta) overflows fp32 directly (500 K at
    beta = 10 is ~6e37)."""
    p = 4.0 + beta
    opz = 1.0 + z
    log_heat = (p * jnp.log(t_cmb0)
                + jnp.log(jnp.maximum(opz ** p - 1.0, 1e-30)))
    return jnp.exp(jnp.logaddexp(p * jnp.log(t_intrinsic), log_heat) / p)


# ln(e^x - 1): the package-wide helper (ops.special). cmb runs only
# through the generic XLA tiers, so the Mosaic no-expm1 restriction that
# forces pallas_lnprob's private copy does not apply here -- and the
# hand-rolled crossover branch this module once carried was ~16x less
# accurate near x = 1e-3.
from mbb_emcee_tpu.ops.special import log_expm1 as _log_expm1  # noqa: E402


def log_cmb_visibility(wave_rest, t_dust, z, t_cmb0=T_CMB0):
    """ln[1 - B_nu(T_CMB(z)) / B_nu(T_dust)] at rest wavelength (um).

    The observable fraction of the dust emission (da Cunha+13 eq. 18):
    -> 0 (fully visible) on the Wien side or for warm dust; -> -inf as
    T_dust -> T_CMB(z) (the source vanishes against the background).
    """
    x_d = HCOK_UM_K / (wave_rest * t_dust)
    x_c = HCOK_UM_K / (wave_rest * cmb_temperature(z, t_cmb0))
    log_ratio = jnp.minimum(_log_expm1(x_d) - _log_expm1(x_c), 0.0)
    # Clip just below 1 so a T_dust == T_CMB corner stays finite (the
    # box-floored lnprob then rejects it rather than NaN-ing).
    return jnp.log1p(-jnp.minimum(jnp.exp(log_ratio), 1.0 - 1e-7))


def cmb_corrected_mbb(z, opthin=False, noalpha=False, wavenorm=500.0,
                      t_cmb0=T_CMB0, name=None,
                      lower=None, upper=None):
    """sed.SEDModel: greybody with da Cunha+2013 CMB corrections at
    redshift z.

    Parameters (T, beta, lambda0, alpha, fnorm) with T the INTRINSIC
    rest-frame dust temperature (K) and lambda0 the REST-frame opacity
    pivot (um); fnorm is the observed flux (mJy) at the observed
    `wavenorm` (um). Drive it through SEDFitter / SEDMultiFitter /
    run_sed_tpu like any generic model; `opthin` drops the opacity
    term, `noalpha` the Wien-side power law (fix the unused parameter
    with fit.fix_param as usual).

    Identifiability: for T well below T_CMB(z), the equilibrium
    temperature saturates at the CMB floor and the SED stops depending
    on T at all -- the likelihood is exactly flat there, so single-
    temperature ensembles that wander onto the plateau mix very slowly
    (inflated R-hat, a spurious cold tail). Either exclude it with
    `fit.set_lowlim("T", ...)` at roughly 0.5-0.7 T_CMB(z) (CLI
    `--lowlim T <K>`) or sample with parallel tempering (`run_pt` /
    `--pt`), which crosses the plateau freely.
    """
    from mbb_emcee_tpu.sed import SEDModel
    from mbb_emcee_tpu.likelihood import DEFAULT_LOWER, DEFAULT_UPPER

    zf = float(z)
    if zf < 0.0:
        raise ValueError(f"redshift must be >= 0, got {zf}")
    opz = 1.0 + zf
    wn_rest = float(wavenorm) / opz
    # Internal MBB normalization point = the rest-frame equivalent of
    # wavenorm; its choice cancels in the self-normalization below.
    shape = MBBShape(opthin=bool(opthin), noalpha=bool(noalpha),
                     wavenorm=wn_rest)
    wn_rest_arr = jnp.asarray([wn_rest], jnp.float32)

    def fnu(theta, wave_obs):
        t_int, beta, lam0, alpha, fnorm = (theta[0], theta[1], theta[2],
                                           theta[3], theta[4])
        t_d = dust_temperature_with_cmb(t_int, beta, zf, t_cmb0)
        th = jnp.stack([t_d, beta, lam0, alpha, jnp.ones_like(t_d)])
        w_rest = wave_obs / opz
        log_s = (log_mbb_fnu(th, w_rest, shape)
                 + log_cmb_visibility(w_rest, t_d, zf, t_cmb0))
        # Self-normalize: S_obs(wavenorm_obs) = fnorm, CMB factor
        # included (what a real measurement at wavenorm sees).
        log_norm = (log_mbb_fnu(th, wn_rest_arr, shape)[0]
                    + log_cmb_visibility(wn_rest_arr, t_d, zf,
                                         t_cmb0)[0])
        return jnp.exp(log_s - log_norm + jnp.log(fnorm))

    return SEDModel(
        fnu=fnu,
        param_names=("T", "beta", "lambda0", "alpha", "fnorm"),
        lower=DEFAULT_LOWER.copy() if lower is None else lower,
        upper=DEFAULT_UPPER.copy() if upper is None else upper,
        name=name or f"cmb-mbb-z{zf:g}")
