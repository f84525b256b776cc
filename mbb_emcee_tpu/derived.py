"""Shared derived-quantity kernels: L_IR, dust mass, SED peak, SED band.

The single-source analysis surface (results.MBBResults) and the batched
serving surface (multifit.MultiFitter) compute the SAME physics per chain
sample; only the batching differs (vmap over samples vs sources x samples)
plus the shape of the host-side fp64 prefactors (scalar vs per-source
vector). The per-sample device closures, the quadrature/optimizer tuning
constants, and the prefactor formulas live here ONCE so the two paths
cannot drift apart (ref: mbb_emcee/mbb_results.py compute_lir /
compute_dustmass / compute_peaklambda -- reconstructed, SURVEY.md C6).

Unit/precision conventions (see results.py module docstring): device parts
are fp32 per-sample closures over `log_mbb_fnu`; the large cosmological
prefactors (4 pi D_L^2 ~ 1e53 m^2) stay in fp64 on the host.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mbb_emcee_tpu.constants import (
    HCOK_UM_K, C_UM_HZ, MPC_M, LSUN_W, MSUN_KG, MJY_WM2HZ, H_JS)
from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu
from mbb_emcee_tpu.ops.quadrature import loglam_nodes
from mbb_emcee_tpu.ops.rootfind import golden_max

# Node count validated against adaptive quadrature over the prior box
# (tests/test_quadrature_convergence.py).
LIR_NODES = 128
# Observed-um search window + fixed iteration count for the SED peak.
PEAK_RANGE = (1.0, 5.0e4)
PEAK_ITERS = 64
# expm1 argument clamp in the dust-mass Planck factor: beyond x ~ 80 the
# occupation term overflows fp32 while the S_obs factor has already
# driven the product to ~0.
DUST_X_CLAMP = 80.0

# Speed of light in m/s (for the dust-mass rest-frequency prefactor).
_C_MS = 2.99792458e8


def lir_nodes_weights(opz, wavemin, wavemax, n=LIR_NODES):
    """Quadrature nodes/weights for the L_IR integral, HOST fp64.

    Returns (lam, w): observed-frame wavelengths in um spanning
    [wavemin, wavemax]*(1+z) log-spaced, and weights that already include
    the 1/lam^2 flux->F_nu Jacobian (the large c factor is left to
    `lir_prefactor` for fp32 headroom on device). `opz` scalar -> (n,)
    arrays; `opz` of shape (S,) -> (S, n) arrays.
    """
    opz = np.asarray(opz, np.float64)
    base_lam, base_w = loglam_nodes(n, wavemin, wavemax)
    # lambda -> lambda*(1+z) scales nodes AND log-spaced weights by (1+z);
    # with the 1/lam^2 factor the weights then carry 1/(1+z) net.
    lam = np.multiply.outer(opz, base_lam)
    w = np.multiply.outer(1.0 / opz, base_w / base_lam ** 2)
    return lam, w


def lir_zparam_integrand(fnu, zi, wavemin, wavemax, n=LIR_NODES):
    """Per-sample device closure for the PHOTO-Z L_IR integral (shared
    by SEDResults.compute_lir(z_param=...) and the SEDMultiFitter twin
    so the scaling algebra cannot drift): the z=0 log-lambda nodes scale
    by each sample's own (1+z) ON DEVICE -- nodes *= opz, weights /= opz,
    exactly the lir_nodes_weights map -- so no (nsamples, nodes) host
    arrays are built. Pair with per-sample D_L from
    cosmology.luminosity_distance_batch and `lir_prefactor`."""
    base_lam, base_w = lir_nodes_weights(1.0, wavemin, wavemax, n)
    lam_j = jnp.asarray(base_lam, jnp.float32)
    w_j = jnp.asarray(base_w, jnp.float32)

    def one(theta):
        opz = 1.0 + theta[zi]
        return jnp.sum(w_j / opz * fnu(theta, lam_j * opz))

    return one


def lir_integrand(shape):
    """Per-sample device closure: integral of f_nu dnu in mJy/um units
    (c folded into `lir_prefactor`). Call as one(theta, lam, w) with
    fp32 device arrays from `lir_nodes_weights`."""
    def one(theta, lam, w):
        f = jnp.exp(log_mbb_fnu(theta, lam, shape))
        return jnp.sum(w * f)
    return one


def lir_prefactor(dl_mpc):
    """HOST fp64 prefactor: 4 pi D_L^2 * (mJy->W/m^2/Hz) * c / L_sun.
    Broadcasts over a per-source D_L vector."""
    dl_m = np.asarray(dl_mpc, np.float64) * MPC_M
    return 4.0 * np.pi * dl_m ** 2 * MJY_WM2HZ * C_UM_HZ / LSUN_W


def dustmass_integrand(shape):
    """Per-sample device closure: S_obs(lam_obs)[mJy] * (e^x - 1), with
    x = h nu_rest / (k T_rest) -- identical to the observed-frame x at
    lam_obs = kappa_wave*(1+z) since both nu and T scale by (1+z).
    Call as one(theta, lam_obs) with lam_obs a scalar."""
    def one(theta, lam_obs):
        s_mjy = jnp.exp(log_mbb_fnu(theta, lam_obs[None], shape))[0]
        x = HCOK_UM_K / (lam_obs * theta[0])
        return s_mjy * jnp.expm1(jnp.minimum(x, DUST_X_CLAMP))
    return one


def dustmass_prefactor(dl_mpc, opz, kappa, kappa_wave):
    """HOST fp64 prefactor: D_L^2 / ((1+z) kappa B_nu-amplitude) / M_sun
    with kappa in m^2/kg at REST wavelength kappa_wave um
    (kappa = 2.64 at 125 um: Dunne et al. 2003). Broadcasts over
    per-source D_L / (1+z) vectors."""
    dl_m = np.asarray(dl_mpc, np.float64) * MPC_M
    nu_rest = _C_MS / (kappa_wave * 1e-6)
    planck_amp = 2.0 * H_JS * nu_rest ** 3 / _C_MS ** 2
    return (dl_m ** 2 * MJY_WM2HZ
            / (np.asarray(opz, np.float64) * kappa * planck_amp) / MSUN_KG)


def peak_finder(shape, lo=PEAK_RANGE[0], hi=PEAK_RANGE[1],
                iters=PEAK_ITERS):
    """Per-sample device closure: observed f_nu peak wavelength in um by
    fixed-iteration golden-section in ln-lambda."""
    ulo, uhi = float(np.log(lo)), float(np.log(hi))

    def peak(theta):
        def log_flux(u):
            return log_mbb_fnu(theta, jnp.exp(u), shape)
        um, _ = golden_max(log_flux, ulo, uhi, iters=iters)
        return jnp.exp(um)
    return peak


def sed_eval(shape, waves_j):
    """Per-sample device closure: f_nu in mJy at fixed observed
    wavelengths (fp32 device array)."""
    def sed(theta):
        return jnp.exp(log_mbb_fnu(theta, waves_j, shape))
    return sed


def band_flux_eval(shape, wave, response_pack=None):
    """Per-sample device closure: the model's BAND fluxes in mJy --
    point evaluation at the data wavelengths, or band-integrated over a
    response pack -- exactly the `model_fluxes` the fitted likelihood
    compared against the data (likelihood.build_lnprob), shared here so
    posterior-predictive checks test the same model the sampler saw."""
    if response_pack is None:
        waves_j = jnp.asarray(np.asarray(wave, np.float32))

        def fluxes(theta):
            return jnp.exp(log_mbb_fnu(theta, waves_j, shape))
        return fluxes

    nodes = jnp.asarray(np.asarray(response_pack[0], np.float32))
    wts = jnp.asarray(np.asarray(response_pack[1], np.float32))

    def fluxes(theta):
        vals = jnp.exp(log_mbb_fnu(theta, nodes, shape))
        return jnp.sum(wts * vals, axis=-1)
    return fluxes


def sed_band(fluxes, percentile, sample_axis):
    """[median, upper, lower] percentiles of per-sample SEDs along
    `sample_axis`, stacked where that axis was (results: (3, nwave);
    multifit: (S, 3, nwave))."""
    p = float(percentile)
    lo, mid, hi = np.percentile(
        fluxes, [50.0 - p / 2, 50.0, 50.0 + p / 2], axis=sample_axis)
    return np.stack([mid, hi, lo], axis=sample_axis)
