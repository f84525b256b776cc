"""Simulation-based calibration of the full inference pipeline.

Draw many truths from the prior, generate data from the likelihood's own
noise model, run the batched fit, and evaluate each posterior's CDF at
its truth: under CORRECT inference F_post(theta_true) is exactly
Uniform(0,1) (probability integral transform), independent of the data
realization. Any systematic error -- biased medians, mis-scaled CI
widths (e.g. an fp32 likelihood floor), a broken prior/limit treatment,
an unconverged burn-in protocol, a wrong whitening or quadrature -- shows
up as non-uniform ranks.

This is stronger than the pull test in test_multifit.py: pulls only
check the first two moments against a Gaussian shape; SBC ranks check
the whole distribution, with no Gaussianity assumption. Ten pipeline
variants are calibrated: plain diagonal errors, band-integrated
(instrument response) likelihoods, correlated calibration errors, the
gradient-based HMC tier, the parallel-tempering tier (same targets,
entirely different kernels -- a leapfrog/metric bug or a broken swap
acceptance would decalibrate these without touching the stretch move),
the MAP + Laplace-importance triage tier (weighted CDF at truth -- the
exact statistical claim map_par_cen makes), and the single-fit surface
both through its full burn -> re-center -> production protocol and
through the fit_map -> run(init='map') short-burn workflow (a seeding
that biased the stationary distribution would skew these ranks), the
GENERIC batch pipeline (sedmulti.SEDMultiFitter on the wrapped
MBB -- same targets, different orchestration code), the PHOTO-Z tier
(joint-(theta, z) sampling under a Gaussian T prior: calibration on the
degeneracy ridge itself), and the HIERARCHICAL population tier
(hyper-level ranks; see test_sbc_hierarchy_ranks_uniform).

Reference anchor: SURVEY.md section 4 (sampler statistics tests) and the
BASELINE accuracy contract. Runs in the slow lane.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu import MultiFitter, ResponseSet
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])

# The SBC prior: uniform over this box (set as the fitter's limits so
# the sampled prior IS the drawing prior).
BOX = {"T": (15.0, 60.0), "beta": (0.8, 3.0), "fnorm": (10.0, 200.0)}

SHAPE = MBBShape(opthin=True, noalpha=True)


def _point_flux(t):
    return np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                              jnp.asarray(WAVE, jnp.float32), SHAPE),
                      np.float64)


def _make_responses():
    rs = ResponseSet()
    rs.add("B100", "gauss:100:35")
    rs.add("B160", "gauss:160:60")
    rs.add("B250", "box:250:70")
    rs.add("B350", "box:350:90")
    rs.add("B500", "gauss:500:150")
    return rs


def _sbc_ranks(mode, S=48):
    rng = np.random.default_rng(20260818)
    trues = np.column_stack([
        rng.uniform(*BOX["T"], S),
        rng.uniform(*BOX["beta"], S),
        np.full(S, 250.0),                 # inert under opthin
        np.full(S, 4.0),                   # inert under noalpha
        rng.uniform(*BOX["fnorm"], S),
    ])

    kw = {}
    corr = None
    if mode == "response":
        rs = _make_responses()
        names = list(rs.keys())
        kw["responses"] = rs

        def forward(t):
            tj = jnp.asarray(t, jnp.float32)
            return np.array([rs[n](lambda w: mbb_fnu(tj, w, SHAPE))
                             for n in names])
    else:
        names = None
        forward = _point_flux
    if mode == "correlated":
        corr = 0.4 * np.ones((WAVE.size, WAVE.size)) \
            + 0.6 * np.eye(WAVE.size)
        L = np.linalg.cholesky(corr)

    flux, unc = [], []
    for t in trues:
        f = forward(t)
        u = 0.05 * f
        noise = (u * (L @ rng.standard_normal(WAVE.size))
                 if mode == "correlated"
                 else u * rng.standard_normal(WAVE.size))
        flux.append(f + noise)
        unc.append(u)

    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=99, **kw)
    for name, (lo, hi) in BOX.items():
        mf.set_lowlim(name, lo)
        mf.set_uplim(name, hi)
    mf.set_data(WAVE, np.array(flux), np.array(unc), band_names=names)
    if corr is not None:
        mf.set_band_correlation(corr)
    idx = {"T": 0, "beta": 1, "fnorm": 4}
    if mode in ("single", "single_map_init"):
        # The single-fit surface: S independent MBBFitter runs through
        # the full burn -> re-center -> re-burn -> production protocol
        # (all S share the compiled programs -- same geometry).
        # "single_map_init" additionally calibrates the
        # fit_map -> run(init='map') short-burn workflow: if the
        # Laplace-scaled seeding biased the stationary distribution,
        # these ranks would skew.
        from mbb_emcee_tpu import MBBFitter
        ranks = [[] for _ in range(3)]
        for s in range(S):
            fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True,
                            seed=1000 + s)
            for name, (lo, hi) in BOX.items():
                fit.set_lowlim(name, lo)
                fit.set_uplim(name, hi)
            fit.set_data(WAVE, flux[s], unc[s])
            if mode == "single_map_init":
                fit.fit_map(nstarts=4)
                fit.run(nburn=60, nsteps=600, thin=2, init="map")
            else:
                fit.run(nburn=250, nsteps=600, thin=2)
            chain = np.asarray(fit.chain)          # (nwalkers, nrec, 5)
            for p, name in enumerate(fit.free_param_names):
                flat = chain[..., idx[name]].ravel()
                ranks[p].append((flat < trues[s, idx[name]]).mean())
        return np.concatenate([np.asarray(r) for r in ranks]), S

    if mode == "map_is":
        # Triage tier: MAP + Laplace importance sampling. The WEIGHTED
        # CDF at truth must be uniform wherever the importance weights
        # are healthy -- this is exactly the statistical claim
        # map_par_cen() makes ("matches MCMC on well-conditioned
        # sources").
        mf.run_map(nstarts=4)
        ess = mf.map_importance(1024)
        assert np.median(ess) / 1024 > 0.3          # healthy proposals
        w = np.exp(mf.map_logw - mf.map_logw.max(axis=1, keepdims=True))
        w /= w.sum(axis=1, keepdims=True)           # (S, N)
        ranks = []
        for p, name in enumerate(mf.free_param_names):
            true_p = trues[:, idx[name]]
            below = mf.map_samples[:, :, p] < true_p[:, None]
            ranks.append((w * below).sum(axis=1))
        return np.concatenate(ranks), S

    if mode == "sedmulti":
        # The GENERIC batch pipeline (sedmulti.SEDMultiFitter) on the
        # wrapped MBB: same targets, same prior box, entirely different
        # orchestration code path -- a broken generic builder, init
        # ball, or continuation bookkeeping would decalibrate this
        # without touching the MBB classes.
        from mbb_emcee_tpu.sed import SEDModel
        from mbb_emcee_tpu.sedmulti import SEDMultiFitter
        from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu

        def fnu(theta, wave):
            return jnp.exp(log_mbb_fnu(theta, wave, SHAPE))

        model = SEDModel(
            fnu=fnu, param_names=("T", "beta", "lambda0", "alpha",
                                  "fnorm"),
            lower=[BOX["T"][0], BOX["beta"][0], 1.0, 0.01,
                   BOX["fnorm"][0]],
            upper=[BOX["T"][1], BOX["beta"][1], 2e4, 60.0,
                   BOX["fnorm"][1]], name="mbb-wrapped")
        smf = SEDMultiFitter(model, nwalkers=64, seed=99)
        smf.fix_param("lambda0", 250.0).fix_param("alpha", 4.0)
        smf.set_data(WAVE, np.array(flux), np.array(unc))
        smf.set_param_init("T", 37.5, 10.0)
        smf.set_param_init("fnorm", 105.0, 40.0)
        smf.run(nburn=250, nsteps=600, thin=2)
        chain = np.asarray(smf.chain)          # (S, nw, nrec, 5)
        ranks = []
        for name in smf.free_param_names:
            true_p = trues[:, idx[name]]
            flat = chain[..., idx[name]].reshape(S, -1)
            ranks.append((flat < true_p[:, None]).mean(axis=1))
        return np.concatenate(ranks), S

    if mode == "photoz":
        # The photo-z tier: z is SAMPLED under a Gaussian T prior. The
        # drawing prior must equal the sampling prior, so T truths are
        # rejection-drawn from the box-truncated N(38, 6) and z from
        # its uniform box. Calibration here certifies the whole
        # joint-(theta, z) machinery including the degeneracy ridge:
        # posteriors are WIDE (weak identifiability) but must still put
        # uniform mass at the truth.
        from mbb_emcee_tpu.photoz import photoz_mbb
        from mbb_emcee_tpu.sedmulti import SEDMultiFitter

        model = photoz_mbb(opthin=True, noalpha=True, cmb=True,
                           z_upper=10.0)
        zbox = (0.5, 6.0)
        t_draw = []
        while len(t_draw) < S:
            cand = rng.normal(38.0, 6.0)
            if BOX["T"][0] < cand < BOX["T"][1]:
                t_draw.append(cand)
        trues_pz = np.column_stack([
            np.asarray(t_draw),
            rng.uniform(*BOX["beta"], S),
            np.full(S, 250.0),             # inert (opthin)
            np.full(S, 4.0),               # inert (noalpha)
            rng.uniform(*BOX["fnorm"], S),
            rng.uniform(*zbox, S),
        ])
        flux_pz, unc_pz = [], []
        for t in trues_pz:
            f = np.asarray(model.fnu(jnp.asarray(t, jnp.float32),
                                     jnp.asarray(WAVE, jnp.float32)),
                           np.float64)
            u = 0.05 * f
            flux_pz.append(f + u * rng.standard_normal(WAVE.size))
            unc_pz.append(u)
        smf = SEDMultiFitter(model, nwalkers=64, seed=99)
        smf.fix_param("lambda0", 250.0).fix_param("alpha", 4.0)
        for name, (lo, hi) in BOX.items():
            smf.set_lowlim(name, lo)
            smf.set_uplim(name, hi)
        smf.set_lowlim("z", zbox[0])
        smf.set_uplim("z", zbox[1])
        smf.set_gaussian_prior("T", 38.0, 6.0)
        smf.set_data(WAVE, np.array(flux_pz), np.array(unc_pz))
        smf.set_param_init("T", 38.0, 5.0)
        smf.set_param_init("fnorm", 105.0, 40.0)
        smf.set_param_init("z", 3.25, 1.3)
        smf.run(nburn=400, nsteps=800, thin=2)
        chain = np.asarray(smf.chain)          # (S, nw, nrec, 6)
        idx_pz = {"T": 0, "beta": 1, "fnorm": 4, "z": 5}
        ranks = []
        for name in smf.free_param_names:
            true_p = trues_pz[:, idx_pz[name]]
            flat = chain[..., idx_pz[name]].reshape(S, -1)
            ranks.append((flat < true_p[:, None]).mean(axis=1))
        return np.concatenate(ranks), S

    if mode == "nested":
        # The nested-sampling tier (round 5): the weighted dead points
        # ARE posterior samples (importance weights exp(lnwt - lnZ)), so
        # the WEIGHTED CDF at truth must be uniform -- the same claim
        # map_is makes for the Laplace tier. This calibrates the whole
        # batched nested machinery (live-point seeding, batch shrinkage
        # schedule, constrained stretch steps, weight assembly), which
        # until now was validated against analytic evidences only.
        ev = mf.compute_evidence(nlive=512, nbatch=32, nsteps=16, seed=7)
        assert np.all(np.isfinite(ev.logz))
        w = ev.posterior_weights()                     # (S, n)
        ranks = []
        for name in BOX:    # the free params (needs no prior run())
            true_p = trues[:, idx[name]]
            # samples are expanded to the FULL 5-param space
            below = ev.samples[:, :, idx[name]] < true_p[:, None]
            ranks.append((w * below).sum(axis=1))
        return np.concatenate(ranks), S

    if mode == "hmc":
        mf.run_hmc(nwarmup=300, nsteps=600, thin=2)
    elif mode == "pt":
        mf.run_pt(nrungs=8, nburn=250, nsteps=600, thin=2)
    else:
        mf.run(nburn=250, nsteps=600, thin=2)

    # F_post(true) per source x free param. mf.chain is in the FULL
    # 5-parameter space (S, nwalkers, nrec, 5) -- index by full-space
    # position, not free-space order.
    chain = np.asarray(mf.chain)
    ranks = []
    for name in mf.free_param_names:
        true_p = trues[:, idx[name]]
        flat = chain[..., idx[name]].reshape(S, -1)
        ranks.append((flat < true_p[:, None]).mean(axis=1))
    return np.concatenate(ranks), S     # 3*S values in [0, 1]


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode", ["plain", "response", "correlated", "hmc", "pt", "map_is",
             "nested", "sedmulti", "single", "single_map_init", "photoz"])
def test_sbc_ranks_uniform(mode):
    # single-fit modes run S separate (program-cached) fits on the host
    # loop; a smaller S keeps the slow lane bounded
    ranks, S = _sbc_ranks(mode, S=32 if mode.startswith("single") else 48)
    n = ranks.size
    # KS distance against U(0,1). Ranks of one source's params are
    # correlated (posterior correlations), so the effective n is below
    # 3*S; the threshold is set loose accordingly (~alpha << 1e-3 even
    # at n_eff = S).
    grid = np.sort(ranks)
    ks = np.max(np.abs(grid - (np.arange(1, n + 1) / n)))
    assert ks < 2.3 / np.sqrt(S), f"[{mode}] ranks not uniform: KS={ks:.3f}"
    # First two moments as a diagnostic with direction information:
    # mean shift = biased medians; variance shift = CI widths wrong
    # (var < 1/12 means posteriors too WIDE, > means too narrow).
    assert abs(ranks.mean() - 0.5) < 0.10, (mode, ranks.mean())
    assert 0.6 / 12 < ranks.var() < 1.6 / 12, (mode, ranks.var())
    # No rank piled at the box edges (a broken limit/reflection would
    # concentrate truths outside the sampled support).
    assert (ranks < 0.02).mean() < 0.15, mode
    assert (ranks > 0.98).mean() < 0.15, mode


@pytest.mark.slow
def test_sbc_hierarchy_ranks_uniform():
    """SBC at the HYPER level: draw (mu, sigma) from the hyper-prior,
    draw a catalog from that population, hand the tier EXACT per-source
    posterior draws (analytic Gaussian measurement model), and rank the
    hyper-truth in the hyper chain. Uniform ranks certify the whole
    importance-reweighting construction -- weights, truncation
    normalization, logsumexp, hyper-box handling -- as a calibrated
    posterior, replication over replication (stronger than the one-shot
    analytic-marginal parity in test_hierarchy.py)."""
    from mbb_emcee_tpu.hierarchy import (
        TruncatedGaussianPopulation, HierarchicalFitter)

    rng = np.random.default_rng(20260819)
    M, S, N = 32, 32, 256
    lo, hi = 10.0, 60.0             # interim box (flat interim prior)
    mu_box = (25.0, 45.0)           # hyper-prior boxes: population kept
    sig_box = (2.0, 6.0)            # well inside the interim box
    sig_obs = 1.5

    pop = TruncatedGaussianPopulation.for_box(
        ("T",), [lo], [hi], sigma_min=sig_box[0], sigma_max=sig_box[1])

    mu_ranks, sig_ranks = [], []
    for m in range(M):
        mu_t = rng.uniform(*mu_box)
        sig_t = rng.uniform(*sig_box)
        theta_s = rng.normal(mu_t, sig_t, S)   # truncation negligible
        x_s = theta_s + rng.normal(0.0, sig_obs, S)
        samples = (x_s[:, None]
                   + rng.normal(0.0, sig_obs, (S, N)))[..., None]

        hf = HierarchicalFitter(samples, pop, nwalkers=32, seed=100 + m)
        # sampled hyper-prior == drawing prior (the SBC requirement)
        hf.set_lowlim("mu_T", mu_box[0]).set_uplim("mu_T", mu_box[1])
        hf.run(nburn=200, nsteps=500)
        flat = hf.flatchain
        mu_ranks.append(float((flat[:, 0] < mu_t).mean()))
        sig_ranks.append(float((flat[:, 1] < sig_t).mean()))

    ranks = np.asarray(mu_ranks + sig_ranks)
    n = ranks.size
    grid = np.sort(ranks)
    ks = np.max(np.abs(grid - (np.arange(1, n + 1) / n)))
    # mu and sigma ranks of one replication are correlated; threshold
    # keyed to M independent replications
    assert ks < 2.3 / np.sqrt(M), f"hierarchy ranks not uniform: KS={ks:.3f}"
    assert abs(ranks.mean() - 0.5) < 0.10, ranks.mean()
    assert 0.6 / 12 < ranks.var() < 1.6 / 12, ranks.var()
    assert (ranks < 0.02).mean() < 0.15
    assert (ranks > 0.98).mean() < 0.15
