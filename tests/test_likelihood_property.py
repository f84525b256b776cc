"""Randomized property sweep of the fused likelihood vs an fp64 oracle.

The targeted tests in test_likelihood.py pin each feature (fixed params,
priors, upper limits, covariance whitening) at one configuration; this
sweep samples RANDOM combinations of all of them and checks
build_lnprob's fp32 device value against a straightforward fp64 NumPy
computation built on tests/reference_impl's brentq oracle -- the
config-interaction bugs (e.g. a prior applied in the wrong space when a
parameter is fixed, or a mask composed wrongly with whitening) that
single-feature tests cannot see.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mbb_emcee_tpu.likelihood import (
    Photometry, LikelihoodSpec, build_lnprob, LNPROB_FLOOR)
from mbb_emcee_tpu.models.modified_blackbody import MBBShape
from mbb_emcee_tpu.paramspace import _replace
from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
NB = WAVE.size


def _oracle_lnprob(theta, wave, flux, unc, cov, spec, shape):
    """fp64 reference: box -> model -> one-sided masks -> whitening ->
    Gaussian priors, mirroring likelihood.build_lnprob's conventions
    (priors apply to the FULL theta, fixed entries included)."""
    theta = np.asarray(theta, np.float64)
    free = ~spec.fixed
    if np.any(theta[free] < spec.lower[free]) or np.any(
            theta[free] > spec.upper[free]):
        return LNPROB_FLOOR
    model = ModifiedBlackbodyOracle(
        *theta, wavenorm=shape.wavenorm, noalpha=shape.noalpha,
        opthin=shape.opthin)(wave)
    delta = model - flux
    if spec.uplim_bands is not None:
        m = np.asarray(spec.uplim_bands, bool)
        delta = np.where(m, np.maximum(delta, 0.0), delta)
    if cov is not None:
        r = np.linalg.solve(np.linalg.cholesky(cov), delta)
    else:
        r = delta / unc
    lnl = -0.5 * float(r @ r)
    dp = (theta - spec.prior_mean) * spec.prior_isigma
    return lnl - 0.5 * float(dp @ dp)


def _random_config(rng):
    shape = MBBShape(opthin=bool(rng.integers(2)),
                     noalpha=bool(rng.integers(2)))
    truth = np.array([rng.uniform(20.0, 45.0), rng.uniform(1.4, 2.2),
                      rng.uniform(180.0, 320.0), rng.uniform(2.8, 4.5),
                      rng.uniform(15.0, 70.0)])
    spec = LikelihoodSpec.default()
    spec = _replace(spec, upper=np.array([100.0, 5.0, 2e4, 60.0, 1e7]))

    # random fixed subset among the shape's live params (never all)
    live = [0, 1, 4]
    if not shape.opthin:
        live.append(2)
    if not shape.noalpha:
        live.append(3)
    nfix = int(rng.integers(0, len(live) - 1))
    fixed = np.asarray(spec.fixed).copy()
    fixed_values = np.asarray(spec.fixed_values).copy()
    for i in rng.permutation(live)[:nfix]:
        fixed[i] = True
        fixed_values[i] = truth[i]
    spec = _replace(spec, fixed=fixed, fixed_values=fixed_values)

    # random Gaussian priors on a subset
    pm = np.asarray(spec.prior_mean).copy()
    pis = np.asarray(spec.prior_isigma).copy()
    for i in live:
        if rng.random() < 0.4:
            pm[i] = truth[i] * rng.uniform(0.9, 1.1)
            pis[i] = 1.0 / (abs(truth[i]) * rng.uniform(0.05, 0.5))
    spec = _replace(spec, prior_mean=pm, prior_isigma=pis)

    # error model: diagonal, one-sided, or full covariance (never both)
    mode = rng.choice(["diag", "uplim", "cov"])
    uplim = None
    cov = None
    if mode == "uplim":
        uplim = rng.random(NB) < 0.4
        if not uplim.any():
            uplim[int(rng.integers(NB))] = True
        spec = _replace(spec, uplim_bands=uplim)
    elif mode == "cov":
        A = rng.standard_normal((NB, NB))
        corr = A @ A.T + NB * np.eye(NB)
        d = np.sqrt(np.diag(corr))
        corr = corr / np.outer(d, d)
    return shape, truth, spec, mode, (corr if mode == "cov" else None)


@pytest.mark.parametrize("seed", range(6))
def test_lnprob_matches_oracle_random_configs(seed):
    rng = np.random.default_rng(100 + seed)
    for trial in range(8):
        shape, truth, spec, mode, corr = _random_config(rng)
        oracle = ModifiedBlackbodyOracle(
            *truth, wavenorm=shape.wavenorm, noalpha=shape.noalpha,
            opthin=shape.opthin)
        f_true = oracle(WAVE)
        unc = 0.05 * f_true
        flux = f_true + unc * rng.standard_normal(NB)
        cov = None
        if corr is not None:
            cov = corr * np.outer(unc, unc)
        phot = Photometry(WAVE, flux, unc, cov=cov)
        lnprob, fs = build_lnprob(phot, shape, spec)

        for k in range(4):
            theta = truth * rng.uniform(0.9, 1.1, 5)
            theta = np.where(spec.fixed, spec.fixed_values, theta)
            want = _oracle_lnprob(theta, WAVE, flux, unc, cov, spec, shape)
            got = float(lnprob(jnp.asarray(theta[fs.free_idx],
                                           jnp.float32)))
            # fp32 model vs fp64 oracle: relative on the lnprob magnitude
            # with an absolute floor for near-zero values
            tol = max(2e-3 * abs(want), 0.05)
            assert abs(got - want) < tol, (
                f"seed={seed} trial={trial} k={k} mode={mode} "
                f"shape=({shape.opthin},{shape.noalpha}) "
                f"fixed={np.nonzero(spec.fixed)[0]} got={got} want={want}")

        # a free parameter pushed outside its box floors the lnprob
        free0 = fs.free_idx[0]
        theta_out = truth.copy()
        theta_out = np.where(spec.fixed, spec.fixed_values, theta_out)
        theta_out[free0] = spec.upper[free0] * 1.5
        got = float(lnprob(jnp.asarray(theta_out[fs.free_idx],
                                       jnp.float32)))
        assert got <= LNPROB_FLOOR / 2


@pytest.mark.parametrize("seed", range(4))
def test_batch_lnprob_matches_oracle_random_patterns(seed):
    """The BATCH likelihood's operand encodings (signed iunc for
    per-source one-sided limits, zero iunc for missing bands, per-source
    whitening matrices for correlated errors with exact pattern
    marginalization) against the fp64 oracle, over random ragged
    patterns."""
    from mbb_emcee_tpu.likelihood import build_lnprob_data, signed_iunc
    from mbb_emcee_tpu.multifit import MultiFitter

    rng = np.random.default_rng(300 + seed)
    shape = MBBShape(opthin=bool(rng.integers(2)),
                     noalpha=bool(rng.integers(2)))
    spec = LikelihoodSpec.default()
    spec = _replace(spec, upper=np.array([100.0, 5.0, 2e4, 60.0, 1e7]))
    wave_j = jnp.asarray(WAVE, jnp.float32)

    S = 6
    truths = np.column_stack([
        rng.uniform(22.0, 42.0, S), rng.uniform(1.5, 2.1, S),
        rng.uniform(200.0, 300.0, S), rng.uniform(3.0, 4.2, S),
        rng.uniform(15.0, 60.0, S)])
    flux, unc = [], []
    for t in truths:
        f = ModifiedBlackbodyOracle(
            *t, wavenorm=shape.wavenorm, noalpha=shape.noalpha,
            opthin=shape.opthin)(WAVE)
        u = 0.05 * f
        flux.append(f + u * rng.standard_normal(NB))
        unc.append(u)
    flux, unc = np.array(flux), np.array(unc)
    # ragged: random missing bands (at most 2 per source)
    missing = np.zeros((S, NB), bool)
    for s in range(S):
        for j in rng.permutation(NB)[:rng.integers(0, 3)]:
            missing[s, j] = True
    flux2 = np.where(missing, np.nan, flux)
    unc2 = np.where(missing, np.nan, unc)

    for mode in ("uplim", "corr"):
        mf = MultiFitter(nwalkers=16, opthin=shape.opthin,
                         noalpha=shape.noalpha)
        mf.set_data(WAVE, flux2, unc2)
        if mode == "uplim":
            m = (rng.random((S, NB)) < 0.3) & ~missing
            mf.set_phot_upperlimits(m)
        else:
            A = rng.standard_normal((NB, NB))
            corr = A @ A.T + NB * np.eye(NB)
            d = np.sqrt(np.diag(corr))
            corr = corr / np.outer(d, d)
            mf.set_band_correlation(corr)
        operand, correlated = mf._data_operand()
        lnp, fs = build_lnprob_data(
            mf.shape, mf._effective_spec(), correlated=correlated)

        for s in range(S):
            theta = truths[s] * rng.uniform(0.92, 1.08, 5)
            got = float(lnp(jnp.asarray(theta[fs.free_idx], jnp.float32),
                            wave_j,
                            jnp.asarray(mf.flux[s], jnp.float32),
                            jnp.asarray(operand[s], jnp.float32)))
            # fp64 oracle over this source's OBSERVED bands only
            p = ~missing[s]
            model = ModifiedBlackbodyOracle(
                *theta, wavenorm=shape.wavenorm, noalpha=shape.noalpha,
                opthin=shape.opthin)(WAVE)[p]
            delta = model - flux[s, p]
            if mode == "uplim":
                delta = np.where(m[s, p], np.maximum(delta, 0.0), delta)
                r = delta / unc[s, p]
            else:
                C = corr[np.ix_(p, p)] * np.outer(unc[s, p], unc[s, p])
                r = np.linalg.solve(np.linalg.cholesky(C), delta)
            want = -0.5 * float(r @ r)
            tol = max(2e-3 * abs(want), 0.05)
            assert abs(got - want) < tol, (
                f"seed={seed} mode={mode} s={s} got={got} want={want}")


def test_batch_lnprob_response_mode_with_correlation():
    """Instrument-response quadrature composes with the correlated error
    model and ragged patterns in the batch likelihood: band fluxes come
    from the pack contraction, whitening from the pattern submatrices."""
    from mbb_emcee_tpu import ResponseSet
    from mbb_emcee_tpu.likelihood import build_lnprob_data
    from mbb_emcee_tpu.multifit import MultiFitter

    rng = np.random.default_rng(77)
    shape = MBBShape(opthin=True, noalpha=True)
    rs = ResponseSet()
    names = []
    for w in WAVE:
        name = f"BOX{int(w)}"
        rs.add(name, f"box:{w}:{0.3 * w:.1f}")
        names.append(name)
    pack = rs.pack(names)
    pw, pwt = np.asarray(pack[0], np.float64), np.asarray(pack[1],
                                                          np.float64)

    S = 4
    truths = np.column_stack([
        rng.uniform(24.0, 40.0, S), rng.uniform(1.5, 2.1, S),
        np.full(S, 250.0), np.full(S, 4.0), rng.uniform(20.0, 55.0, S)])

    def band_model(theta):
        o = ModifiedBlackbodyOracle(*theta, opthin=True, noalpha=True)
        return np.array([(pwt[b] * o(pw[b])).sum() for b in range(NB)])

    flux = np.stack([band_model(t) for t in truths])
    unc = 0.05 * flux
    flux = flux + unc * rng.standard_normal(flux.shape)
    flux2 = flux.copy(); unc2 = unc.copy()
    flux2[2, 1] = np.nan; unc2[2, 1] = np.nan       # ragged

    A = rng.standard_normal((NB, NB))
    corr = A @ A.T + NB * np.eye(NB)
    d = np.sqrt(np.diag(corr))
    corr = corr / np.outer(d, d)

    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, responses=rs)
    mf.set_data(WAVE, flux2, unc2, band_names=names)
    mf.set_band_correlation(corr)
    operand, correlated = mf._data_operand()
    assert correlated
    spec = mf._effective_spec()
    lnp, fs = build_lnprob_data(mf.shape, spec, response_pack=pack,
                                correlated=True)

    for s in range(S):
        theta = truths[s] * rng.uniform(0.95, 1.05, 5)
        got = float(lnp(jnp.asarray(theta[fs.free_idx], jnp.float32),
                        jnp.asarray(WAVE, jnp.float32),
                        jnp.asarray(mf.flux[s], jnp.float32),
                        jnp.asarray(operand[s], jnp.float32)))
        p = np.isfinite(flux2[s])
        delta = band_model(theta)[p] - flux[s, p]
        C = corr[np.ix_(p, p)] * np.outer(unc[s, p], unc[s, p])
        r = np.linalg.solve(np.linalg.cholesky(C), delta)
        want = -0.5 * float(r @ r)
        assert abs(got - want) < max(2e-3 * abs(want), 0.05), (s, got, want)
