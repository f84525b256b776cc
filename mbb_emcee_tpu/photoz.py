"""Photometric-redshift greybody fitting: z as a SAMPLED parameter.

ADDITIVE capability (absent upstream): the reference fixes the source
redshift and only uses it for derived quantities (ref:
mbb_emcee/mbb_fit.py observer-frame parameterization + mbb_results.py
compute_lir -- reconstructed, SURVEY.md C4/C6). Far-IR/submm surveys
routinely need the OPPOSITE workflow -- the dust SED itself is the only
redshift indicator available (submm photo-z), so z must be sampled
jointly with the dust parameters and every derived quantity must be
marginalized over the z posterior.

`photoz_mbb()` returns a generic-tier model (sed.SEDModel subclass) with
parameters (T, beta, lambda0, alpha, fnorm, z), REST-frame T/lambda0,
that runs through the entire generic surface unchanged: SEDFitter /
SEDMultiFitter serving, HMC / parallel tempering / nested evidence /
MAP triage, instrument responses, upper limits, PPC, WAIC/LOO, HDF5,
and the `run_sed_tpu` shell.

Identifiability -- read before fitting:

- Without CMB corrections the greybody obeys an EXACT scaling
  degeneracy: (T, lambda0, z) and (T/s, lambda0*s, z' with
  (1+z') = s(1+z)) produce identical observed SEDs. The data alone
  constrain T/(1+z), never T and z separately. A photo-z fit therefore
  REQUIRES outside information, exactly as in the submm photo-z
  literature: a Gaussian prior on T (`fit.set_gaussian_prior("T", mu,
  sigma)` -- the standard choice, e.g. a population temperature from a
  calibration sample), or tight priors on lambda0/beta. The joint
  posterior then propagates the full prior width into z -- which is the
  honest error bar the fixed-z workflow cannot give.
- With `cmb=True` (default) the da Cunha et al. (2013) corrections
  (models/cmb.py) break the degeneracy WEAKLY at high z: the CMB
  heating floor and background subtraction tie the SED shape to the
  absolute temperature scale. This sharpens the high-z tail but is no
  substitute for a T prior at moderate z.
- T here is the INTRINSIC (starlight-only) rest-frame temperature when
  cmb=True, the plain rest-frame temperature when cmb=False.

Derived quantities marginalize over z per sample:
`SEDResults.compute_lir(z_param="z")` (sed.py) integrates each sample
over its own rest [8, 1000] um window with its own D_L;
`photoz.compute_dustmass` applies the (CMB-aware) kappa B_nu mass
formula with per-sample z. Observed peak wavelength needs no z.
"""

from __future__ import annotations

import collections
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.constants import HCOK_UM_K
from mbb_emcee_tpu.likelihood import DEFAULT_LOWER, DEFAULT_UPPER
from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu, MBBShape
from mbb_emcee_tpu.models.cmb import (
    T_CMB0, dust_temperature_with_cmb, log_cmb_visibility)
from mbb_emcee_tpu.models.cosmology import luminosity_distance_batch
from mbb_emcee_tpu import derived
from mbb_emcee_tpu.sampler import shared_program
from mbb_emcee_tpu.sed import SEDModel

PARAM_NAMES = ("T", "beta", "lambda0", "alpha", "fnorm", "z")

# Bounded LRU (see photoz_mbb's memoization note): a hard insert cap
# would silently stop sharing traced programs after the capth distinct
# configuration while pinning the first cap forever.
_PHOTOZ_MODEL_MEMO = collections.OrderedDict()
_PHOTOZ_MODEL_MEMO_CAP = 64


@dataclasses.dataclass(frozen=True)
class PhotoZMBBModel(SEDModel):
    """sed.SEDModel carrying the photo-z MBB configuration, so derived-
    quantity helpers (compute_dustmass) can recover the physics flags
    instead of guessing from parameter names."""
    opthin: bool = False
    noalpha: bool = False
    cmb: bool = True
    t_cmb0: float = T_CMB0
    wavenorm: float = 500.0


def photoz_mbb(opthin=False, noalpha=False, wavenorm=500.0, cmb=True,
               t_cmb0=T_CMB0, z_lower=0.0, z_upper=12.0,
               name=None, lower=None, upper=None):
    """PhotoZMBBModel: greybody with redshift as the sixth parameter.

    Parameters (T, beta, lambda0, alpha, fnorm, z): T the rest-frame
    dust temperature in K (intrinsic/starlight-only when cmb=True),
    lambda0 the REST-frame opacity pivot in um, fnorm the OBSERVED flux
    in mJy at the observed `wavenorm` (default 500 um, the reference's
    convention), z the redshift. `opthin` drops the opacity term and
    `noalpha` the Wien power law from the physics (fix the unused
    parameter with fit.fix_param as usual). cmb=True applies the
    da Cunha+2013 heating + background corrections (models/cmb.py).

    The returned model runs through the whole generic tier; see the
    module docstring for the identifiability requirements (set a T
    prior).
    """
    zl, zu = float(z_lower), float(z_upper)
    if not (zl >= 0.0 and zu > zl):
        raise ValueError(f"need 0 <= z_lower < z_upper, got ({zl}, {zu})")
    # Memoize by configuration: the model is frozen, and returning the
    # SAME object for the same arguments lets fitters built from it
    # share traced programs (batchengine cross-instance cache keys on
    # the SEDModel construction nonce).
    memo_key = (bool(opthin), bool(noalpha), float(wavenorm), bool(cmb),
                float(t_cmb0), zl, zu, name,
                None if lower is None else tuple(np.asarray(lower, float)),
                None if upper is None else tuple(np.asarray(upper, float)))
    def _build(lower=lower, upper=upper):
        if lower is None:
            lower = np.concatenate([DEFAULT_LOWER, [zl]])
        if upper is None:
            upper = np.concatenate([DEFAULT_UPPER, [zu]])
        wn = float(wavenorm)
        use_cmb = bool(cmb)
        t0 = float(t_cmb0)
        # Internal normalization point is arbitrary: fnu self-normalizes
        # at the (traced) rest-frame image of `wavenorm` below, so the
        # static MBBShape wavenorm cancels exactly.
        shape = MBBShape(opthin=bool(opthin), noalpha=bool(noalpha),
                         wavenorm=500.0)

        def fnu(theta, wave_obs):
            t, beta, lam0, alpha, fnorm, zz = (
                theta[0], theta[1], theta[2], theta[3], theta[4],
                theta[5])
            opz = 1.0 + zz
            t_e = (dust_temperature_with_cmb(t, beta, zz, t0)
                   if use_cmb else t)
            th = jnp.stack([t_e, beta, lam0, alpha, jnp.ones_like(t_e)])
            w_rest = wave_obs / opz
            wn_rest = jnp.reshape(wn / opz, (1,))
            log_s = log_mbb_fnu(th, w_rest, shape)
            log_n = log_mbb_fnu(th, wn_rest, shape)[0]
            if use_cmb:
                log_s = log_s + log_cmb_visibility(w_rest, t_e, zz, t0)
                log_n = log_n + log_cmb_visibility(wn_rest, t_e, zz,
                                                   t0)[0]
            return jnp.exp(log_s - log_n + jnp.log(fnorm))

        return PhotoZMBBModel(
            fnu=fnu,
            param_names=PARAM_NAMES,
            lower=lower, upper=upper,
            name=name or ("photoz-cmb-mbb" if use_cmb else "photoz-mbb"),
            opthin=bool(opthin), noalpha=bool(noalpha),
            cmb=use_cmb, t_cmb0=t0, wavenorm=wn)

    return shared_program(memo_key, _build, cache=_PHOTOZ_MODEL_MEMO,
                          cap=_PHOTOZ_MODEL_MEMO_CAP)


def _require_photoz_model(model, what):
    if not isinstance(model, PhotoZMBBModel):
        raise TypeError(
            f"{what} needs a PhotoZMBBModel fit "
            f"(got {type(model).__name__}); for fixed-z MBB fits use "
            "MBBResults.compute_dustmass")
    return model


def _dustmass_g(model, kappa_wave):
    """Per-sample device closure for the photo-z mass inversion: returns
    S_obs / occupation-factor, where the occupation factor is the
    contrast B_nu(T_dust) - B_nu(T_CMB(z)) (cmb=True) or the plain
    B_nu(T) (cmb=False), both with the Planck amplitude factored into
    derived.dustmass_prefactor on the host."""
    zi = model.param_index("z")
    kw = float(kappa_wave)
    use_cmb = model.cmb
    t0 = model.t_cmb0
    fnu = model.fnu

    def one(theta):
        opz = 1.0 + theta[zi]
        lam_obs = jnp.reshape(kw * opz, (1,))
        s_mjy = fnu(theta, lam_obs)[0]
        t_e = (dust_temperature_with_cmb(theta[0], theta[1],
                                         theta[zi], t0)
               if use_cmb else theta[0])
        # Rest-frame Planck argument at the kappa wavelength.
        x_d = HCOK_UM_K / (kw * t_e)
        if use_cmb:
            x_c = HCOK_UM_K / (kw * t0 * opz)
            occ = (1.0 / jnp.expm1(jnp.minimum(x_d, derived.DUST_X_CLAMP))
                   - 1.0 / jnp.expm1(jnp.minimum(x_c,
                                                 derived.DUST_X_CLAMP)))
            return s_mjy / jnp.maximum(occ, 1e-20)
        return s_mjy * jnp.expm1(jnp.minimum(x_d, derived.DUST_X_CLAMP))

    return one


def compute_dustmass(res, kappa=2.64, kappa_wave=125.0, thin=1):
    """Dust-mass posterior in M_sun for a photo-z fit, marginalized over
    the per-sample redshift.

    Same physics as MBBResults.compute_dustmass (kappa = 2.64 m^2/kg at
    rest 125 um, Dunne et al. 2003), generalized two ways: (a) each
    chain sample uses ITS OWN z for the observed evaluation wavelength
    kappa_wave*(1+z), luminosity distance, and (1+z) factor; (b) with
    cmb=True the Planck factor is the CONTRAST emission
    B_nu(T_dust) - B_nu(T_CMB(z)) (da Cunha+13 eq. 18 applied to the
    mass inversion) -- the model's observed flux is contrast flux, so
    dividing by the full B_nu(T_dust) would bias the mass low at high z.

    `res` is a SEDResults over a PhotoZMBBModel. Stores/returns
    res.dustmass_chain like the core surface; summaries via
    `photoz.dustmass_cen(res)` or directly from the chain.
    """
    model = _require_photoz_model(res._require_model(),
                                  "photoz.compute_dustmass")
    if getattr(res, "lumdist", None) is not None:
        raise ValueError(
            "explicit lumdist= cannot combine with a photo-z dust mass: "
            "each sample carries its own redshift (same rule as "
            "compute_lir(z_param=...))")
    zi = model.param_index("z")
    one = _dustmass_g(model, kappa_wave)
    samples_np = res._thinned(thin)
    samples = jnp.asarray(samples_np, jnp.float32)
    g = np.asarray(jax.jit(jax.vmap(one))(samples), np.float64)
    zvec = np.asarray(samples_np[:, zi], np.float64)
    opz = 1.0 + zvec
    dl = luminosity_distance_batch(zvec, res._cosmo)
    prefac = derived.dustmass_prefactor(dl, opz, float(kappa),
                                        float(kappa_wave))
    res.dustmass_chain = prefac * g
    res.dustmass_meta = {"kappa": float(kappa),
                         "kappa_wave": float(kappa_wave),
                         "thin": int(thin), "z_param": "z"}
    return res.dustmass_chain


def compute_dustmass_batch(mf, kappa=2.64, kappa_wave=125.0, thin=1,
                           cosmology="WMAP9"):
    """(S, nsamples) photo-z dust-mass posteriors for a whole catalog
    (SEDMultiFitter over a PhotoZMBBModel): the compute_dustmass physics
    double-vmapped over sources x samples as one device program, with a
    chunked vectorized fp64 D_L pass over every (source, sample)
    redshift. Stores/returns mf.dustmass_chain."""
    model = _require_photoz_model(mf.model, "photoz.compute_dustmass_batch")
    zi = model.param_index("z")
    one = _dustmass_g(model, kappa_wave)
    samples = mf._thinned(thin)                     # (S, N, npar) device
    g = np.asarray(jax.jit(jax.vmap(jax.vmap(one)))(samples), np.float64)
    zmat = np.asarray(samples[..., zi], np.float64)  # (S, N)
    opz = 1.0 + zmat
    dl = luminosity_distance_batch(zmat.ravel(),
                                   cosmology).reshape(zmat.shape)
    prefac = derived.dustmass_prefactor(dl, opz, float(kappa),
                                        float(kappa_wave))
    mf.dustmass_chain = prefac * g
    mf.dustmass_meta = {"kappa": float(kappa),
                        "kappa_wave": float(kappa_wave),
                        "thin": int(thin), "z_param": "z"}
    return mf.dustmass_chain


def dustmass_cen(res, percentile=68.3):
    """(median, +err, -err) of the photo-z dust-mass posterior; runs
    compute_dustmass with defaults if needed."""
    if getattr(res, "dustmass_chain", None) is None:
        compute_dustmass(res)
    from mbb_emcee_tpu.sed import _percentile_summary
    return _percentile_summary(res.dustmass_chain, percentile)
