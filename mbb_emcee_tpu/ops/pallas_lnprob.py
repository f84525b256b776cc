"""Fused Pallas TPU kernel for the ensemble lnprob.

One kernel launch computes, for a whole walker block, everything the
reference does per lnprob call (SURVEY.md section 3.1 hot loop): box check,
greybody model with the Wien-merge bisection, (optionally band-integrated)
model fluxes, covariance whitening, Gaussian priors. Layout: walkers ride
the 128-wide lane dimension; every per-walker quantity is a (1, W) row and
the merge bisection is 30 branchless vector iterations in VMEM.

The XLA-fused path (likelihood.build_lnprob) is the portable default; this
kernel removes the remaining multi-kernel launch overhead inside the sampling
scan on real TPU hardware. Equivalence is tested in interpret mode on CPU
(tests/test_pallas.py).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mbb_emcee_tpu.constants import HCOK_UM_K, NPARAMS

_LOG_C2 = math.log(HCOK_UM_K)
# Hybrid merge solve on the analytic bracket x_m in (2+a, 3+a+b):
# 6 bisections + 2 bracket-clamped Newton steps reach fp32 exactness (the
# solve dominated the fused sampler's step cost at the original 30
# static-bracket bisections); same scheme as models/modified_blackbody.py.
_MERGE_BISECT = 6
_MERGE_NEWTON = 2
_TAU_BIG = 60.0
_EXP_CUT = 25.0
_LANE = 128
# Single source of truth: the samplers' accept guard compares proposals
# against likelihood.SUPPORT_FLOOR, which must stay above this floor.
from mbb_emcee_tpu.likelihood import LNPROB_FLOOR  # noqa: E402


# Mosaic (Pallas TPU) does not lower expm1/log1p; these use exp/log with a
# small-argument series guard, which keeps fp32 relative error below ~1e-6
# everywhere on the sampling box.
_SMALL = 0.01


def _log_expm1(x):
    """log(e^x - 1), x > 0."""
    em = jnp.exp(jnp.minimum(x, _EXP_CUT)) - 1.0
    # x < _SMALL: e^x - 1 = x (1 + x/2 + ...) -> log x + log(1 + x/2)
    small = jnp.log(x) + 0.5 * x
    return jnp.where(x < _SMALL, small,
                     jnp.where(x < _EXP_CUT, jnp.log(em), x))


def _log1mexp(x):
    """log(1 - e^-x), x > 0."""
    xc = jnp.maximum(x, 1e-35)
    big = jnp.log(1.0 - jnp.exp(-xc))
    # small x: 1 - e^-x = x (1 - x/2 + ...) -> log x - x/2
    small = jnp.log(xc) - 0.5 * xc
    return jnp.where(xc < _SMALL, small, big)


def _xoexpm1x(x):
    """x / (e^x - 1) -> 1 at 0, -> 0 at inf."""
    xc = jnp.clip(x, 1e-30, _EXP_CUT)
    val = xc / (jnp.exp(xc) - 1.0)
    val = jnp.where(xc < _SMALL, 1.0 - 0.5 * xc, val)
    return jnp.where(x > _EXP_CUT, 0.0, val)


def _qx(x):
    """x / (1 - e^-x) -> 1 at 0 (the Planck slope term)."""
    xc = jnp.maximum(x, 1e-30)
    val = xc / (1.0 - jnp.exp(-xc))
    return jnp.where(xc < _SMALL, 1.0 + 0.5 * xc, val)


def make_log_s_mbb(opthin):
    """Pallas-safe unnormalized ln S of the pure greybody at u = ln x
    (Mosaic-compatible expm1/log1p replacements; shared by the lnprob,
    fused-sampler and multi-source kernels)."""
    def log_s_mbb(log_x, beta, log_x0):
        x = jnp.exp(log_x)
        log_planck = 3.0 * log_x - _log_expm1(x)
        if opthin:
            return beta * log_x + log_planck
        tau = jnp.exp(beta * (log_x - log_x0))
        return _log1mexp(tau) + log_planck
    return log_s_mbb


def make_merge_g_gp(opthin):
    """(g, g') of the merge condition g = d ln S/d ln x + alpha; the
    derivative is nearly free via q(x) = x + h(x), dq/du = q(1 - h)
    (see models/modified_blackbody._merge_g_and_gp)."""
    def merge_g_gp(log_x, beta, log_x0, alpha):
        x = jnp.exp(log_x)
        q = _qx(x)
        gp_planck = -q * (1.0 - q + x)
        if opthin:
            return 3.0 + beta - q + alpha, gp_planck
        tau = jnp.exp(beta * (log_x - log_x0))
        ht = _xoexpm1x(tau)
        tau_c = jnp.minimum(tau, _TAU_BIG)   # inf*0 guard for huge tau
        gp = beta * beta * ht * (1.0 - tau_c - ht) + gp_planck
        return 3.0 + beta * ht - q + alpha, gp
    return merge_g_gp


def merge_log_x_pallas(beta, log_x0, alpha, opthin):
    """Batched merge solve inside a Pallas kernel: unrolled bisection +
    bracket-clamped Newton on the analytic bracket x_m in (2+a, 3+a+b),
    with finite floors for unphysical a/b (mirrors
    models/modified_blackbody.merge_log_x)."""
    merge_g_gp = make_merge_g_gp(opthin)
    lo_arg = jnp.maximum(2.0 + alpha, 1e-3)
    a_br = jnp.log(lo_arg)
    b_br = jnp.log(jnp.maximum(3.0 + alpha + beta, 1.01 * lo_arg))
    for _ in range(_MERGE_BISECT):
        m = 0.5 * (a_br + b_br)
        g, _ = merge_g_gp(m, beta, log_x0, alpha)
        pos = g > 0.0
        a_br = jnp.where(pos, m, a_br)
        b_br = jnp.where(pos, b_br, m)
    u_m = 0.5 * (a_br + b_br)
    for _ in range(_MERGE_NEWTON):
        g, gp = merge_g_gp(u_m, beta, log_x0, alpha)
        u_m = jnp.clip(u_m - g / jnp.minimum(gp, -1e-10), a_br, b_br)
    return u_m


def _make_lnp_compute(cfg):
    """cfg: dict with static shape/config info (see build_pallas_lnprob).

    Returns compute(theta, limits_ref, prior_ref, flux_ref, whiten_ref,
    waves_ref, rweights_ref) -> (1, W) lnprob, usable inside ANY Pallas
    kernel body (the plain lnprob kernel below and the fully-fused sampler
    kernel in ops/pallas_sampler.py both call it). `theta` is an (8, W)
    ARRAY of parameter rows (T, beta, lambda0, alpha, fnorm, 3 pad rows).
    """
    opthin = cfg["opthin"]
    noalpha = cfg["noalpha"]
    nb = cfg["nbands"]
    use_chol = cfg["use_chol"]
    log_wavenorm = math.log(cfg["wavenorm"])
    log_s_mbb = make_log_s_mbb(opthin)

    def compute(theta, limits_ref, prior_ref, flux_ref, whiten_ref,
                waves_ref, rweights_ref):
        # theta: (8, W) array -- rows T, beta, lambda0, alpha, fnorm, pad.
        # limits_ref: (2, 8) SMEM box. prior_ref: (2, 8) SMEM mean/isigma.
        # flux_ref: (nb,) SMEM data fluxes.
        # whiten_ref: (nb, nb) SMEM (L^-1, or diag 1/unc on the diagonal).
        # waves_ref: (nb, nnodes) VMEM wavelengths (nnodes=1 in point mode).
        # rweights_ref: (nb, nnodes) VMEM quadrature weights (point mode: 1).
        # returns: (1, W) lnprob.

        def row(i):
            return theta[i:i + 1, :]              # (1, W)

        # Box check + clip (the model must stay NaN-free for wild walkers).
        inbox = None
        rows = []
        for i in range(NPARAMS):
            v = row(i)
            lo = limits_ref[0, i]
            hi = limits_ref[1, i]
            ok = (v >= lo) & (v <= hi)
            inbox = ok if inbox is None else (inbox & ok)
            rows.append(jnp.clip(v, lo, hi))
        T, beta, lam0, alpha, fnorm = rows

        log_T = jnp.log(T)
        log_x0 = _LOG_C2 - jnp.log(lam0) - log_T

        if noalpha:
            u_m = None
        else:
            u_m = merge_log_x_pallas(beta, log_x0, alpha, opthin)
            ls_m = log_s_mbb(u_m, beta, log_x0)

        def log_s(log_x):
            base = log_s_mbb(log_x, beta, log_x0)
            if noalpha:
                return base
            return jnp.where(log_x > u_m, ls_m - alpha * (log_x - u_m),
                             base)

        log_fnorm = jnp.log(fnorm)

        # Model fluxes for ALL band nodes AND the normalization point in
        # ONE packed (R+1, W) evaluation: the VPU operates on full (8, 128)
        # tiles, so six separate (1, W) log_s chains waste 7/8 of the
        # sublanes; packing them is ~one tile-op chain total. Point mode is
        # the same contraction with a single unit-weight node per band.
        # waves_ref/rweights_ref arrive PRE-FLATTENED as (R, 1) -- Mosaic
        # cannot lower a general in-kernel reshape.
        nnodes = cfg["nnodes"]
        R = nb * nnodes
        lx_bands = _LOG_C2 - jnp.log(waves_ref[:, :]) - log_T  # (R, W)
        lx_norm = _LOG_C2 - log_wavenorm - log_T             # (1, W)
        ls = log_s(jnp.concatenate([lx_bands, lx_norm], axis=0))
        vals = jnp.exp(log_fnorm + ls[:R] - ls[R:R + 1])     # (R, W)
        wts = rweights_ref[:, :]                             # (R, 1)

        # Residual rows. Upper-limit bands (static per-band switch)
        # penalize only flux ABOVE the limit, matching
        # likelihood.build_lnprob.
        uplim = cfg.get("uplim") or (False,) * nb
        deltas = []
        for b in range(nb):
            sl = slice(b * nnodes, (b + 1) * nnodes)
            model = jnp.sum(wts[sl] * vals[sl], axis=0,
                            keepdims=True)                   # (1, W)
            d = model - flux_ref[b]
            if uplim[b]:
                d = jnp.maximum(d, 0.0)
            deltas.append(d)

        # Whiten and accumulate chi^2. diag mode: whiten is diagonal.
        chi2 = jnp.zeros_like(T)
        if use_chol:
            for i in range(nb):
                r = jnp.zeros_like(T)
                for j in range(i + 1):             # L^-1 is lower triangular
                    r = r + whiten_ref[i, j] * deltas[j]
                chi2 = chi2 + r * r
        else:
            for i in range(nb):
                r = whiten_ref[i, i] * deltas[i]
                chi2 = chi2 + r * r

        lnp = -0.5 * chi2
        for i in range(NPARAMS):
            isig = prior_ref[1, i]
            d = (rows[i] - prior_ref[0, i]) * isig
            lnp = lnp - 0.5 * d * d

        return jnp.where(inbox, lnp, LNPROB_FLOOR)

    return compute


def _make_kernel(cfg):
    compute = _make_lnp_compute(cfg)

    def kernel(theta_ref, limits_ref, prior_ref, flux_ref, whiten_ref,
               waves_ref, rweights_ref, out_ref):
        out_ref[:, :] = compute(theta_ref[:, :], limits_ref, prior_ref,
                                flux_ref, whiten_ref, waves_ref,
                                rweights_ref)

    return kernel


def prepare_lnprob_inputs(phot, shape, spec, response_pack=None):
    """Shared setup for the Pallas lnprob-based kernels: static config,
    constant kernel operands, and the free-space <-> full-theta maps.

    Returns (cfg, consts, free_space) where consts holds HOST numpy arrays
    (limits, priors, flux, whiten, waves, rweights, template, scatter) --
    numpy so that closing over them under jit inlines them as MLIR
    constants without a device->host fetch (~1 s per array over this
    environment's TPU tunnel); callers that pass them as jit ARGUMENTS
    (the fused samplers) device_put them once themselves.
    """
    from mbb_emcee_tpu.likelihood import FreeSpace

    free_space = FreeSpace.from_spec(spec)
    free_idx = free_space.free_idx
    nfree = free_idx.size
    template = np.asarray(free_space.template, np.float32)
    scatter = free_space.scatter_matrix(np.float32)

    nb = phot.nbands
    if response_pack is not None:
        waves, rweights = response_pack
        waves = np.asarray(waves, np.float32)
        rweights = np.asarray(rweights, np.float32)
        response = True
    else:
        waves = np.asarray(phot.wave, np.float32)[:, None]
        rweights = np.ones((nb, 1), np.float32)
        response = False

    if phot.cov is not None:
        whiten_np = np.linalg.inv(np.linalg.cholesky(phot.cov))
        use_chol = True
    else:
        whiten_np = np.diag(1.0 / phot.unc)
        use_chol = False

    # Box limits for FREE params. Fixed params get a FINITE window
    # CENTERED ON THE FIXED VALUE (the kernel uses the same rows for both
    # the inclusive in-box check and the NaN-safety clip, so the bounds
    # must stay finite AND contain the value -- a hardcoded [1e-6, 1e30]
    # window floored lnprob for fix_param('alpha', 0.0) while the XLA
    # backend accepted it).
    fv = np.asarray(spec.fixed_values, np.float64)
    lim = np.zeros((2, 8), np.float32)
    lim[0, :NPARAMS] = np.where(spec.fixed, fv - 1.0, spec.lower)
    lim[1, :NPARAMS] = np.where(spec.fixed, fv + 1.0, spec.upper)
    pri = np.zeros((2, 8), np.float32)
    pri[0, :NPARAMS] = spec.prior_mean
    pri[1, :NPARAMS] = spec.prior_isigma

    if spec.uplim_bands is not None and spec.uplim_bands.any():
        # Composes with use_chol: the per-band one-sided clamp is applied
        # to the raw band residuals BEFORE the whitening contraction,
        # exactly the XLA ordering (likelihood.build_lnprob: det/uplim
        # mask on delta, then whiten @ delta).
        uplim = tuple(bool(u) for u in spec.uplim_bands)
    else:
        uplim = (False,) * nb

    nnodes = int(waves.shape[1])
    cfg = dict(opthin=shape.opthin, noalpha=shape.noalpha, nbands=nb,
               nnodes=nnodes, use_chol=use_chol, response=response,
               wavenorm=shape.wavenorm, uplim=uplim)

    consts = dict(
        limits=lim, priors=pri,
        flux=np.asarray(phot.flux, np.float32),
        whiten=np.asarray(whiten_np, np.float32),
        # flattened (R, 1) node grids for the single-source kernels
        # (Mosaic cannot reshape in-kernel); the multi-source kernel uses
        # the (nb, nnodes) layout from its own constructor instead.
        waves=np.reshape(waves, (nb * nnodes, 1)),
        rweights=np.reshape(rweights, (nb * nnodes, 1)),
        template=template, scatter=scatter)
    return cfg, consts, free_space


def build_pallas_lnprob(phot, shape, spec, response_pack=None,
                        interpret=False):
    """Batched lnprob over the FREE space, fused into one Pallas kernel.

    Same semantics as likelihood.build_lnprob (which also documents the
    conventions); returns (lnprob_batched, free_space) where lnprob_batched
    maps (n, nfree) -> (n,) and carries .is_batched = True.
    """
    cfg, consts, free_space = prepare_lnprob_inputs(
        phot, shape, spec, response_pack=response_pack)
    kernel = _make_kernel(cfg)
    template = consts["template"]
    scatter = consts["scatter"]

    # Kernel operands are jit ARGUMENTS, never closure constants: a
    # pallas_call with XLA-constant operands is catastrophically slow both
    # to run (~600x/step, see pallas_sampler._make_run) and to COMPILE
    # (measured 381 s vs 1 s for this kernel on the tunneled TPU).
    dev_consts = tuple(
        jnp.asarray(consts[k])
        for k in ("limits", "priors", "flux", "whiten", "waves",
                  "rweights"))

    def call_kernel(theta_t, limits, priors, flux, whiten, waves,
                    rweights):
        w = theta_t.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, w), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),    # theta
                pl.BlockSpec(memory_space=pltpu.SMEM),    # limits
                pl.BlockSpec(memory_space=pltpu.SMEM),    # priors
                pl.BlockSpec(memory_space=pltpu.SMEM),    # flux
                pl.BlockSpec(memory_space=pltpu.SMEM),    # whiten
                pl.BlockSpec(memory_space=pltpu.VMEM),    # waves
                pl.BlockSpec(memory_space=pltpu.VMEM),    # rweights
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(theta_t, limits, priors, flux, whiten, waves, rweights)

    @jax.jit
    def _lnprob_jit(theta_free, limits, priors, flux, whiten, waves,
                    rweights):
        n = theta_free.shape[0]
        pad = (-n) % _LANE
        full = template[None, :] + theta_free @ scatter.T     # (n, 5)
        full = jnp.pad(full, ((0, pad), (0, 3)), constant_values=1.0)
        theta_t = full.T                                       # (8, n+pad)
        lnp = call_kernel(theta_t, limits, priors, flux, whiten, waves,
                          rweights)[0]
        return lnp[:n]

    def lnprob_batched(theta_free):
        """(n, nfree) -> (n,)"""
        return _lnprob_jit(theta_free, *dev_consts)

    lnprob_batched.is_batched = True
    return lnprob_batched, free_space
