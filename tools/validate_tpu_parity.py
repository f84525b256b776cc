"""On-hardware posterior parity at the BASELINE contract tolerance.

The BASELINE.json acceptance contract is "posterior means / credible
intervals within <=1% of reference on seeds-equivalent workloads". PRNGs
differ between the fp32 TPU pipeline and the fp64 NumPy/SciPy oracle, so
parity is statistical; the r01 harness held CI widths only to 10% because a
single chain per side left sigma_MC(width) at the several-percent level.
This version drives the Monte-Carlo error itself below the contract:

  * JAX side: K independent full fits per config (different seeds) on the
    fused TPU sampler -- cheap at 2e8 walker-steps/s -- giving an EMPIRICAL
    standard error of every posterior statistic (median + 68% CI width per
    free parameter).
  * Oracle side: M long fp64 Goodman-Weare runs per config; SE is the max
    of the empirical seed spread and the analytic tau-based estimate.
  * Verdict per statistic: |mean_J - mean_O| <= max(1% * scale,
    3 * sqrt(SE_J^2 + SE_O^2)).  With the chain lengths below the combined
    3*SE term sits near (mostly under) 1% for data-constrained parameters,
    so the 1% contract is demonstrated rather than assumed.

Config 4 (derived posteriors) compares L_IR / dust-mass / peak-lambda
posterior statistics computed by the batched GL device kernels on BOTH
pipelines' chains (kernel-vs-adaptive-quad elementwise parity is covered
separately by tests/test_parity.py and test_quadrature_convergence.py),
plus a direct elementwise adaptive-quad spot check.

This module is IMPORTABLE (no work at import time): the opt-in pytest lane
``MBB_HWPARITY=1 pytest -m hwparity`` (tests/test_hwparity.py) runs
``run_config``/``run_derived`` per config, and the default-lane drift
sentinel (tests/test_tpu_sentinel.py) runs ``--sentinel`` in a TPU
subprocess and compares against the recorded oracle moments in
tests/data/sentinel_reference.json (regenerate with ``--gen-sentinel``
whenever tests/reference_impl changes -- the fingerprint enforces this).

Run on a TPU host:  python tools/validate_tpu_parity.py
    [--fast]  (short chains, report only -- no contract assertions)
Writes a DESIGN.md-ready markdown table to stdout and exits nonzero on
any failed statistic.
"""

import argparse
import dataclasses
import hashlib
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
UNC_FRAC = 0.05
PARAM_NAMES = ("T", "beta", "lambda0", "alpha", "fnorm")

LOWER = np.array([0.1, 0.01, 1.0, 0.01, 1e-5])
UPPER = np.array([100.0, 5.0, 2e4, 60.0, 1e7])

CONFIGS = [
    dict(label="config0 opthin3", opthin=True, noalpha=True, priors=[],
         response=False),
    dict(label="config1 thick4", opthin=False, noalpha=True,
         priors=[(2, 250.0, 120.0)], response=False),
    dict(label="config2 full5", opthin=False, noalpha=False,
         priors=[(2, 250.0, 120.0), (3, 3.5, 1.5)], response=False),
    dict(label="config3 response", opthin=True, noalpha=True, priors=[],
         response=True),
    # config4 is the derived-quantity comparison (run_derived); this
    # placeholder keeps CONFIGS indices == config numbers.
    dict(label="config4 derived", derived=True),
    # configs 5/6 (round 5): the calibration-floor covariance named in
    # BASELINE's north-star prose, and its composition with a photometric
    # upper limit -- the one fused-kernel path (uplim x cov, enabled in
    # round 4) that had never faced the two-sided <=1% contract.
    dict(label="config5 thick4+cov", opthin=False, noalpha=True,
         priors=[(2, 250.0, 120.0)], response=False, cov=True),
    dict(label="config6 thick4+cov+uplim", opthin=False, noalpha=True,
         priors=[(2, 250.0, 120.0)], response=False, cov=True,
         uplim_band=4),
]

BANDS = ["PACS_100", "PACS_160", "SPIRE_250", "SPIRE_350", "SPIRE_500"]

# Calibration-floor covariance recipe for cov configs: diag(unc^2) plus a
# correlated calibration term rho_ij * (CAL_FRAC f_i)(CAL_FRAC f_j) with
# rho = 1 on the diagonal and 0.5 within an instrument (PACS bands 0-1,
# SPIRE bands 2-4) -- PSD by the Schur product theorem (PSD correlation
# Hadamard rank-1 outer product). f is the TRUE model flux so the matrix
# is deterministic given the config.
CAL_FRAC = 0.05
_INSTR = np.array([0, 0, 1, 1, 1])
CAL_CORR = np.where(_INSTR[:, None] == _INSTR[None, :], 0.5, 0.0)
np.fill_diagonal(CAL_CORR, 1.0)
# Upper-limit configs: the flagged band's flux column is a limit value
# this factor above the true flux (no noise draw on a quoted limit).
UPLIM_FACTOR = 1.3

SENTINEL_PATH = os.path.join(_REPO, "tests", "data",
                             "sentinel_reference.json")
ORACLE_PATH = os.path.join(_REPO, "tests", "data",
                           "hwparity_oracle.json")
# The sentinels exercise config1 (thick4: unlike config0 it runs the
# analytic-bracket merge solve, so a broken solve, accept rule, or
# whitening change shifts its posterior) and config6 (thick4 + full
# calibration covariance + photometric upper limit: the fused
# uplim-by-covariance kernel path enabled in round 4).
SENTINEL_CONFIG = 1
SENTINEL_CONFIGS = (1, 6)


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Chain geometry for one parity run.

    Full mode: oracle M runs of (64 x 16000) = 1.02M samples each; at
    tau ~ 20-35 that is ~30-50k effective samples per run, sigma_MC(width)
    ~ 0.8-1.2% per run -> ~0.5% on the M-run mean. JAX: K runs of
    (250 x 8000) = 2M samples each (the fused sampler makes the larger
    ensemble free), sigma on the K-run mean ~0.3%.
    """
    k_jax: int = 8
    m_oracle: int = 4
    nw_jax: int = 250
    nburn_jax: int = 1500
    nstep_jax: int = 8000
    nw_ora: int = 64
    nburn_ora: int = 1000
    nstep_ora: int = 16000
    require_fused: bool = True


FULL = Geometry()
FAST = Geometry(k_jax=2, m_oracle=1, nburn_jax=300, nstep_jax=1000,
                nburn_ora=300, nstep_ora=2000, require_fused=False)
# Sentinel: TPU side only (the oracle side is the recorded reference).
# Short chains -- 2 x (250 x 2000) = 1M samples, sigma_MC(median) ~ 0.5%
# -- the point is catching gross drift (broken solve / accept rule /
# whitening), not re-demonstrating the 1% contract.
SENTINEL = Geometry(k_jax=2, nburn_jax=500, nstep_jax=2000,
                    require_fused=False)


def free_indices(cfg):
    free = [0, 1, 4]
    if not cfg["opthin"]:
        free.insert(2, 2)
    if not cfg["noalpha"]:
        free.insert(-1, 3)
    return sorted(free)


def response_pack(nnodes=65):
    from mbb_emcee_tpu.response import ResponseSet
    rs = ResponseSet.builtin(BANDS, nnodes=nnodes)
    return rs, rs.pack(BANDS)


def mock_data(cfg, seed=42):
    """Mock photometry from the fp64 oracle model (identical for both
    pipelines). Returns (flux, unc, cov); cov is None for diagonal-error
    configs. Covariance configs draw the noise from N(0, C); an
    upper-limit band's flux column is the deterministic limit value
    (a quoted limit carries no noise draw)."""
    from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle
    oracle = ModifiedBlackbodyOracle(*TRUE, opthin=cfg["opthin"],
                                     noalpha=cfg["noalpha"])
    if cfg["response"]:
        _, (waves, wts) = response_pack()
        f = (np.asarray(wts, np.float64)
             * oracle(np.asarray(waves, np.float64))).sum(axis=-1)
    else:
        f = oracle(WAVE)
    unc = UNC_FRAC * f
    cov = None
    rng = np.random.default_rng(seed)
    if cfg.get("cov"):
        cal = CAL_FRAC * f
        cov = np.diag(unc ** 2) + CAL_CORR * np.outer(cal, cal)
        noise = np.linalg.cholesky(cov) @ rng.standard_normal(f.size)
    else:
        noise = unc * rng.standard_normal(f.size)
    flux = f + noise
    ub = cfg.get("uplim_band")
    if ub is not None:
        flux[ub] = UPLIM_FACTOR * f[ub]
    return flux, unc, cov


def jax_fit(cfg, flux, unc, seed, geom, cov=None):
    from mbb_emcee_tpu import MBBFitter
    responses = None
    band_names = None
    if cfg["response"]:
        responses, _ = response_pack()
        band_names = BANDS
    fit = MBBFitter(nwalkers=geom.nw_jax, seed=seed, opthin=cfg["opthin"],
                    noalpha=cfg["noalpha"], responses=responses)
    fit.set_data(WAVE, flux, unc, cov=cov, band_names=band_names)
    fit.set_uplim("T", UPPER[0]).set_uplim("beta", UPPER[1])
    ub = cfg.get("uplim_band")
    if ub is not None:
        mask = np.zeros(flux.size, bool)
        mask[ub] = True
        fit.set_phot_upperlimits(mask)
    for (pi, mean, sig) in cfg["priors"]:
        fit.set_gaussian_prior(pi, mean, sig)
    for i in range(5):
        fit.set_param_init(i, TRUE[i])
    fit.run(nburn=geom.nburn_jax, nsteps=geom.nstep_jax)
    if geom.require_fused:
        assert type(fit.sampler).__name__ == "FusedPallasSampler", \
            "fused TPU path not selected -- run this on a TPU host"
    return fit


def oracle_chain(cfg, flux, unc, seed, geom, cov=None):
    """fp64 oracle posterior; returns (full-5 flat chain, (ns, nw, nfree)
    chain for tau).

    The lnprob mirrors likelihood.build_lnprob exactly: the one-sided
    upper-limit penalty clamps delta at flagged bands BEFORE whitening,
    and covariance mode whitens with the fp64 inverse Cholesky factor
    (r = L^-1 delta)."""
    from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle
    from tests.reference_impl.gw_sampler import GoodmanWeareSampler
    free = free_indices(cfg)
    if cfg["response"]:
        _, (waves, wts) = response_pack()
        waves = np.asarray(waves, np.float64)
        wts = np.asarray(wts, np.float64)
    whiten = (np.linalg.inv(np.linalg.cholesky(cov))
              if cov is not None else None)
    ub = cfg.get("uplim_band")

    def lnprob(theta_free):
        theta = TRUE.copy()
        theta[free] = theta_free
        if (np.any(theta_free < LOWER[free])
                or np.any(theta_free > UPPER[free])):
            return -np.inf
        m = ModifiedBlackbodyOracle(*theta, opthin=cfg["opthin"],
                                    noalpha=cfg["noalpha"])
        model = ((wts * m(waves)).sum(axis=-1) if cfg["response"]
                 else m(WAVE))
        delta = model - flux
        if ub is not None:
            delta = delta.copy()
            delta[ub] = max(delta[ub], 0.0)
        r = (whiten @ delta) if whiten is not None else (delta / unc)
        val = -0.5 * float(r @ r)
        for (pi, mean, sig) in cfg["priors"]:
            if pi in free:
                val += -0.5 * ((theta[pi] - mean) / sig) ** 2
        return val

    rng = np.random.default_rng(seed)
    center = TRUE[free]
    p0 = center[None, :] * rng.uniform(0.97, 1.03, (geom.nw_ora, len(free)))
    gw = GoodmanWeareSampler(geom.nw_ora, len(free), lnprob, seed=seed)
    pos, _ = gw.run_mcmc(p0, geom.nburn_ora, store=False)
    gw.reset()
    gw.run_mcmc(pos, geom.nstep_ora)
    full = np.tile(TRUE, (gw.flatchain.shape[0], 1))
    full[:, free] = gw.flatchain
    return full, np.stack(gw.chain)


def stats(flat, free):
    """Per free param: (median, 68% CI width)."""
    q = np.percentile(flat[:, free], [15.85, 50.0, 84.15], axis=0)
    return q[1], q[2] - q[0]


def tau_se(chain_free, flat, free):
    """Analytic per-run SE of (median, width) from measured tau."""
    from mbb_emcee_tpu.sampler import autocorrelation_time
    tau = np.maximum(np.nan_to_num(autocorrelation_time(chain_free),
                                   nan=1.0), 1.0)
    n_eff = flat.shape[0] / tau
    std = flat[:, free].std(axis=0)
    se_med = 1.2533 * std / np.sqrt(n_eff)
    # Each 68% edge quantile: se ~ 1.087 sigma/sqrt(neff) for a Gaussian;
    # the width combines two (anti-correlated -> conservative quadrature).
    se_w = 1.54 * std / np.sqrt(n_eff)
    return se_med, se_w


def aggregate(per_run_meds, per_run_widths, per_run_se=None):
    """Mean and SE-of-mean over runs; SE floor from analytic per-run SEs."""
    meds = np.stack(per_run_meds)
    wids = np.stack(per_run_widths)
    n = meds.shape[0]
    if n > 1:
        se_med = meds.std(axis=0, ddof=1) / np.sqrt(n)
        se_wid = wids.std(axis=0, ddof=1) / np.sqrt(n)
    else:
        se_med = np.zeros(meds.shape[1])
        se_wid = np.zeros(wids.shape[1])
    if per_run_se is not None:
        a_med = np.stack([s[0] for s in per_run_se]).mean(axis=0) / np.sqrt(n)
        a_wid = np.stack([s[1] for s in per_run_se]).mean(axis=0) / np.sqrt(n)
        se_med = np.maximum(se_med, a_med)
        se_wid = np.maximum(se_wid, a_wid)
    return meds.mean(axis=0), wids.mean(axis=0), se_med, se_wid


def compare_rows(label, names, mj, wj, sj_m, sj_w, mo, wo, so_m, so_w):
    """Markdown rows + pass/fail for one config. Returns (rows, ok)."""
    rows, ok = [], True
    for i, name in enumerate(names):
        scale = max(abs(mo[i]), 1e-12)
        dmed = abs(mj[i] - mo[i])
        se_m = np.hypot(sj_m[i], so_m[i])
        tol_m = max(0.01 * scale, 3.0 * se_m)
        dwid = abs(wj[i] - wo[i])
        se_w = np.hypot(sj_w[i], so_w[i])
        tol_w = max(0.01 * wo[i], 3.0 * se_w)
        row_ok = dmed <= tol_m and dwid <= tol_w
        ok &= row_ok
        rows.append(
            f"| {label} | {name} | {100 * dmed / scale:.2f}% "
            f"| {100 * se_m / scale:.2f}% | {100 * dwid / wo[i]:.2f}% "
            f"| {100 * se_w / wo[i]:.2f}% "
            f"| {'PASS' if row_ok else 'FAIL'} |")
    return rows, ok


def jax_side(ci, geom, seed0=1000):
    """K independent TPU fits for config ci -> per-run (medians, widths)."""
    cfg = CONFIGS[ci]
    free = free_indices(cfg)
    flux, unc, cov = mock_data(cfg)
    j_meds, j_wids = [], []
    for k in range(geom.k_jax):
        fit = jax_fit(cfg, flux, unc, seed=seed0 + 17 * k, geom=geom,
                      cov=cov)
        m, w = stats(fit.chain.reshape(-1, 5), free)
        j_meds.append(m)
        j_wids.append(w)
    return j_meds, j_wids


def oracle_side(ci, geom, seed0=500):
    """M fp64 oracle runs for config ci -> (meds, wids, per-run SEs)."""
    cfg = CONFIGS[ci]
    free = free_indices(cfg)
    flux, unc, cov = mock_data(cfg)
    o_meds, o_wids, o_ses = [], [], []
    for m_i in range(geom.m_oracle):
        flat, chain = oracle_chain(cfg, flux, unc, seed=seed0 + 31 * m_i,
                                   geom=geom, cov=cov)
        mm, ww = stats(flat, free)
        o_meds.append(mm)
        o_wids.append(ww)
        o_ses.append(tau_se(chain, flat, free))
    return o_meds, o_wids, o_ses


def oracle_moments(ci, geom, seed0=500):
    """Aggregated fp64 oracle posterior moments for one config:
    (medians, widths, se_medians, se_widths) -- what run_config needs
    from the oracle side, and what ``--gen-oracle`` records."""
    o_meds, o_wids, o_ses = oracle_side(ci, geom, seed0=seed0)
    mo, wo, som, sow = aggregate(o_meds, o_wids,
                                 o_ses if geom.m_oracle > 1 else None)
    if geom.m_oracle == 1:
        som, sow = o_ses[0]
    return mo, wo, som, sow


def run_config(ci, geom, recorded=None):
    """Full parity comparison for one config.

    Returns (rows, ok): DESIGN-table markdown rows and the contract
    verdict. Importable entry for the ``pytest -m hwparity`` lane.

    With ``recorded`` (a fingerprint-verified entry from
    load_recorded_oracle), the fp64 oracle side is read from the recorded
    moments instead of being recomputed -- the SAME statistic table and
    tolerances, ~3x faster per config (the oracle chains are the long
    pole). Regenerate with ``--gen-oracle`` when tests/reference_impl or
    the recipe changes; the fingerprint enforces staleness."""
    cfg = CONFIGS[ci]
    free = free_indices(cfg)
    names = [PARAM_NAMES[i] for i in free]

    t0 = time.time()
    j_meds, j_wids = jax_side(ci, geom)
    t_jax = time.time() - t0
    t0 = time.time()
    if recorded is not None:
        mo = np.asarray(recorded["medians"])
        wo = np.asarray(recorded["widths"])
        som = np.asarray(recorded["se_medians"])
        sow = np.asarray(recorded["se_widths"])
        oracle_note = "recorded"
    else:
        mo, wo, som, sow = oracle_moments(ci, geom)
        oracle_note = f"{geom.m_oracle} runs in {time.time() - t0:.0f}s"

    mj, wj, sjm, sjw = aggregate(j_meds, j_wids)
    rows, cfg_ok = compare_rows(cfg["label"], names, mj, wj, sjm, sjw,
                                mo, wo, som, sow)
    print(f"{cfg['label']}: JAX {geom.k_jax} fits in {t_jax:.0f}s, oracle "
          f"{oracle_note} -> "
          f"{'OK' if cfg_ok else 'FAIL'}", flush=True)
    return rows, cfg_ok


DERIVED_Z = 2.0
DERIVED_THIN = 8
DERIVED_KINDS = ("lir", "dustmass", "peaklambda")


def derived_oracle(geom, seed=901):
    """Oracle side of config 4: percentiles of L_IR / dust-mass /
    peak-lambda computed by the batched GL kernels on the fp64 oracle
    chain. Returns {kind: [q15.85, q50, q84.15], ...} plus the thinned
    sample count (for the n_eff tolerance). A short CPU carrier fit
    supplies the MBBResults metadata (shape/photometry); its chain is
    replaced by the oracle chain before any computation."""
    import dataclasses as _dc
    from mbb_emcee_tpu import MBBResults
    cfg2 = CONFIGS[2]
    flux, unc, _ = mock_data(cfg2)
    o_flat, _ = oracle_chain(cfg2, flux, unc, seed=seed, geom=geom)
    carrier = _dc.replace(geom, nburn_jax=100, nstep_jax=50,
                          require_fused=False)
    fit = jax_fit(cfg2, flux, unc, seed=900, geom=carrier)
    res_o = MBBResults(fit=fit, redshift=DERIVED_Z)
    nw = geom.nw_jax
    pad = (-o_flat.shape[0]) % nw
    res_o.chain = o_flat[:o_flat.shape[0] - pad].reshape(nw, -1, 5)
    out = {}
    n = None
    for kind in DERIVED_KINDS:
        co = getattr(res_o, f"compute_{kind}")(thin=DERIVED_THIN)
        out[kind] = np.percentile(co, [15.85, 50.0, 84.15]).tolist()
        n = len(co)
    return out, n


def run_derived(geom, recorded=None):
    """Config 4: derived-quantity posterior parity (batched GL kernels on
    both pipelines' chains + elementwise adaptive-quad spot check).

    Returns (rows, ok). With ``recorded`` (fingerprint-verified entry
    from load_recorded_oracle) the oracle-chain derived percentiles are
    read instead of recomputed."""
    from mbb_emcee_tpu import MBBResults
    from mbb_emcee_tpu.constants import MPC_M, MJY_WM2HZ, LSUN_W
    from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle
    cfg2 = CONFIGS[2]
    flux, unc, _ = mock_data(cfg2)
    z = DERIVED_Z
    thin = DERIVED_THIN
    fit = jax_fit(cfg2, flux, unc, seed=900, geom=geom)
    res_j = MBBResults(fit=fit, redshift=z)
    if recorded is None:
        o_flat, _ = oracle_chain(cfg2, flux, unc, seed=901, geom=geom)
        res_o = MBBResults(fit=fit, redshift=z)
        nw = geom.nw_jax
        pad = (-o_flat.shape[0]) % nw
        res_o.chain = o_flat[:o_flat.shape[0] - pad].reshape(nw, -1, 5)

    ok = True
    rows = []
    for kind in DERIVED_KINDS:
        cj = getattr(res_j, f"compute_{kind}")(thin=thin)
        qj = np.percentile(cj, [15.85, 50.0, 84.15])
        if recorded is None:
            co = getattr(res_o, f"compute_{kind}")(thin=thin)
            qo = np.percentile(co, [15.85, 50.0, 84.15])
            n_o = len(co)
        else:
            qo = np.asarray(recorded["quantiles"][kind])
            n_o = recorded["n"]
        dmed = abs(qj[1] - qo[1]) / qo[1]
        wj, wo = qj[2] - qj[0], qo[2] - qo[0]
        dwid = abs(wj - wo) / wo
        # Derived chains inherit the parameter chains' MC error; hold to
        # the parameter-level resolution (3 x ~1.2%/sqrt(neff) per side).
        n_eff = min(len(cj), n_o) / 35.0
        tol = max(0.01, 4.5 / np.sqrt(n_eff))
        row_ok = dmed <= tol and dwid <= max(3 * tol, 0.10)
        ok &= row_ok
        rows.append(f"| config4 derived | {kind} | {100 * dmed:.2f}% | - "
                    f"| {100 * dwid:.2f}% | - "
                    f"| {'PASS' if row_ok else 'FAIL'} |")

    # Elementwise adaptive-quad spot check of the L_IR kernel.
    samples = res_j.flatchain[:: max(len(res_j.flatchain) // 12, 1)][:12]
    dl_m = res_j._dl_mpc() * MPC_M
    prefac = 4.0 * np.pi * dl_m ** 2 * MJY_WM2HZ / LSUN_W
    lir_k = res_j.compute_lir(thin=1)  # full chain; index matches samples
    stride = max(len(res_j.flatchain) // 12, 1)
    for n, s in enumerate(samples):
        o = ModifiedBlackbodyOracle(*s)
        want = prefac * o.freq_integrate(8.0 * (1 + z), 1000.0 * (1 + z))
        got = lir_k[n * stride]
        if abs(got - want) / want > 3e-3:
            ok = False
            rows.append(f"| config4 derived | lir elementwise #{n} | "
                        f"{100 * abs(got - want) / want:.3f}% | - | - | - "
                        f"| FAIL |")
    return rows, ok


HEADER_ROWS = [
    "| config | param | [d median] | sigma_MC | [d CI width] | "
    "sigma_MC | verdict |",
    "|---|---|---|---|---|---|---|",
]


# ----------------------------------------------------------------------
# Recorded fp64 oracle moments: fingerprints, generation, loading.
# ----------------------------------------------------------------------

def config_fingerprint(ci, extra=None):
    """Hash over everything a config's recorded oracle moments depend on:
    the oracle implementation files, the mock-data recipe (incl. the
    calibration-covariance and upper-limit constants), and the config
    itself. A mismatch means the recorded file is stale -- regenerate
    with ``--gen-sentinel`` / ``--gen-oracle``."""
    h = hashlib.sha256()
    ref_dir = os.path.join(_REPO, "tests", "reference_impl")
    for name in sorted(os.listdir(ref_dir)):
        if name.endswith(".py"):
            with open(os.path.join(ref_dir, name), "rb") as f:
                h.update(name.encode())
                h.update(f.read())
    recipe = dict(wave=WAVE.tolist(), true=TRUE.tolist(),
                  unc_frac=UNC_FRAC, config=CONFIGS[ci],
                  lower=LOWER.tolist(), upper=UPPER.tolist(),
                  data_seed=42, oracle_seed0=500,
                  cal_frac=CAL_FRAC, cal_corr=CAL_CORR.tolist(),
                  uplim_factor=UPLIM_FACTOR)
    if extra:
        recipe.update(extra)
    h.update(json.dumps(recipe, sort_keys=True).encode())
    return h.hexdigest()[:16]


# Back-compat alias (tests/test_tpu_sentinel.py imports this name).
def sentinel_fingerprint(ci=SENTINEL_CONFIG):
    return config_fingerprint(ci)


def _oracle_entry(ci, geom):
    """One recorded-oracle entry: aggregated fp64 moments + fingerprint."""
    cfg = CONFIGS[ci]
    free = free_indices(cfg)
    t0 = time.time()
    mo, wo, som, sow = oracle_moments(ci, geom)
    return {
        "config": ci,
        "label": cfg["label"],
        "fingerprint": config_fingerprint(ci),
        "param_names": [PARAM_NAMES[i] for i in free],
        "free_indices": free,
        "medians": mo.tolist(),
        "widths": wo.tolist(),
        "se_medians": som.tolist(),
        "se_widths": sow.tolist(),
        "geometry": dataclasses.asdict(geom),
        "wall_s": round(time.time() - t0, 1),
    }


ORACLE_CONFIGS = (0, 1, 2, 3, 5, 6)  # two-sided configs (4 = derived)


def gen_oracle(configs=None, path=ORACLE_PATH, geom=None,
               with_derived=None):
    """(Re)generate the recorded fp64 oracle moments for the hwparity
    lane (offline, CPU-only; the oracle chains are the expensive part).
    Updates per-config entries in place so a single config can be
    regenerated after a targeted recipe change."""
    geom = geom or FULL
    sel = list(configs) if configs is not None else list(ORACLE_CONFIGS)
    # config 4 *is* the derived entry (the validation lane maps {2,4} to
    # the derived run), so naming it must regenerate that entry rather
    # than silently no-op.
    if with_derived is None:
        with_derived = configs is None or bool({2, 4} & set(sel))
    data = {"version": 1, "configs": {}, "derived": None}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)

    def flush():
        # write after EVERY entry: the oracle chains cost minutes each,
        # and a crash in a later entry must not discard finished ones
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(data, f, indent=1)

    for ci in sel:
        if ci == 4:
            continue
        entry = _oracle_entry(ci, geom)
        data["configs"][str(ci)] = entry
        flush()
        print(f"{entry['label']}: oracle recorded in {entry['wall_s']}s",
              flush=True)
    if with_derived:
        t0 = time.time()
        quantiles, n = derived_oracle(geom)
        data["derived"] = {
            "fingerprint": config_fingerprint(
                2, extra={"derived_z": DERIVED_Z, "thin": DERIVED_THIN,
                          "nw": geom.nw_jax}),
            "quantiles": quantiles,
            "n": n,
            "geometry": dataclasses.asdict(geom),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"config4 derived: oracle recorded in "
              f"{data['derived']['wall_s']}s", flush=True)
    flush()
    print(f"wrote {path}")
    return data


def load_recorded_oracle(path=ORACLE_PATH):
    """Parsed recorded-oracle file, or None if absent."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def recorded_entry(ci, data=None):
    """Fingerprint-checked lookup of one config's recorded oracle moments.

    Returns (status, entry): status is 'ok' (entry usable), 'missing'
    (no file / no entry for this config -- fall back to computing the
    oracle), or 'stale' (entry exists but the fingerprint mismatches --
    the caller should FAIL with a regeneration message rather than
    silently recompute, so a recipe change cannot shadow-pass).
    ci='derived' selects the config-4 derived entry."""
    data = data if data is not None else load_recorded_oracle()
    if data is None:
        return "missing", None
    if ci == "derived":
        entry = data.get("derived")
        want = config_fingerprint(2, extra={"derived_z": DERIVED_Z,
                                            "thin": DERIVED_THIN,
                                            "nw": FULL.nw_jax})
    else:
        entry = data.get("configs", {}).get(str(ci))
        want = config_fingerprint(ci)
    if entry is None:
        return "missing", None
    if entry["fingerprint"] != want:
        return "stale", entry
    return "ok", entry


STALE_MSG = ("recorded oracle moments are STALE (tests/reference_impl or "
             "the mock-data recipe changed since they were generated) -- "
             "regenerate with: python tools/validate_tpu_parity.py "
             "--gen-oracle")


# ----------------------------------------------------------------------
# Drift sentinel: recorded fp64 oracle moments vs a cheap TPU re-fit.
# ----------------------------------------------------------------------

def gen_sentinel(path=SENTINEL_PATH, geom=None, configs=SENTINEL_CONFIGS):
    """Record fp64 oracle moments for the sentinel configs (offline,
    CPU-only, ~10 min/config). Writes medians/widths + SEs +
    per-config fingerprints."""
    geom = geom or dataclasses.replace(FULL, m_oracle=4, nstep_ora=12000)
    payload = {"version": 2, "configs": {}}
    for ci in configs:
        payload["configs"][str(ci)] = _oracle_entry(ci, geom)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    wall = sum(e["wall_s"] for e in payload["configs"].values())
    print(f"wrote {path} in {wall:.0f}s")
    return payload


def sentinel_payload(geom=SENTINEL, configs=SENTINEL_CONFIGS):
    """TPU side of the drift sentinel: K short fits of each sentinel
    config; emits platform + sampler provenance and per-run moments.
    Run in a fresh subprocess so the ambient (TPU) platform is visible
    even when the parent test process is CPU-forced. On a CPU-only box
    it short-circuits (platform only, no fits) so the default-lane test
    can auto-skip without paying minutes of CPU sampling."""
    import jax
    platform = jax.devices()[0].platform
    out = {"platform": platform, "configs": {}}
    if platform == "cpu":
        return out
    for ci in configs:
        cfg = CONFIGS[ci]
        free = free_indices(cfg)
        flux, unc, cov = mock_data(cfg)
        t0 = time.time()
        meds, wids, sampler_types = [], [], []
        for k in range(geom.k_jax):
            fit = jax_fit(cfg, flux, unc, seed=1000 + 17 * k, geom=geom,
                          cov=cov)
            sampler_types.append(type(fit.sampler).__name__)
            m, w = stats(fit.chain.reshape(-1, 5), free)
            meds.append(m)
            wids.append(w)
        mj, wj, sjm, sjw = aggregate(meds, wids)
        out["configs"][str(ci)] = {
            "sampler_types": sampler_types,
            "config": ci,
            "fingerprint": config_fingerprint(ci),
            "medians": mj.tolist(),
            "widths": wj.tolist(),
            "se_medians": sjm.tolist(),
            "se_widths": sjw.tolist(),
            "wall_s": round(time.time() - t0, 1),
        }
    return out


def check_sentinel(tpu, ref, med_tol=0.03, wid_tol=0.15):
    """Compare ONE config's TPU sentinel moments against its recorded
    oracle moments.

    Bounds are drift-detection bounds, NOT the 1% contract: wide enough
    for the short-chain MC noise (combined 3*SE is also floored in), tight
    enough that a broken merge solve, accept rule, or whitening change
    (which shift posteriors by >>5%) cannot pass. Returns (ok, lines)."""
    ok, lines = True, []
    names = ref["param_names"]
    for i, name in enumerate(names):
        scale = max(abs(ref["medians"][i]), 1e-12)
        dmed = abs(tpu["medians"][i] - ref["medians"][i])
        se_m = float(np.hypot(tpu["se_medians"][i], ref["se_medians"][i]))
        tol_m = max(med_tol * scale, 3.0 * se_m)
        wo = ref["widths"][i]
        dwid = abs(tpu["widths"][i] - wo)
        se_w = float(np.hypot(tpu["se_widths"][i], ref["se_widths"][i]))
        tol_w = max(wid_tol * wo, 3.0 * se_w)
        row_ok = dmed <= tol_m and dwid <= tol_w
        ok &= row_ok
        lines.append(
            f"{name}: |dmed| {100 * dmed / scale:.2f}% "
            f"(tol {100 * tol_m / scale:.2f}%), |dwidth| "
            f"{100 * dwid / wo:.2f}% (tol {100 * tol_w / wo:.2f}%) "
            f"{'PASS' if row_ok else 'FAIL'}")
    return ok, lines


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="short chains, no contract assertions (smoke)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated config indices (default all)")
    ap.add_argument("--recorded", action="store_true",
                    help="use the recorded fp64 oracle moments "
                         "(tests/data/hwparity_oracle.json) instead of "
                         "recomputing the oracle chains; FAILS on a stale "
                         "fingerprint")
    ap.add_argument("--sentinel", action="store_true",
                    help="run the cheap TPU drift sentinel and print one "
                         "JSON line (used by tests/test_tpu_sentinel.py)")
    ap.add_argument("--gen-sentinel", action="store_true",
                    help="(re)generate the recorded fp64 oracle moments "
                         "for the drift sentinel (CPU, ~10 min/config)")
    ap.add_argument("--gen-oracle", action="store_true",
                    help="(re)generate the recorded fp64 oracle moments "
                         "for the hwparity lane (CPU; honors --configs)")
    args = ap.parse_args(argv)

    sel = ([int(i) for i in args.configs.split(",")]
           if args.configs else list(ORACLE_CONFIGS))

    if args.gen_sentinel:
        gen_sentinel()
        return 0

    if args.gen_oracle:
        gen_oracle(configs=sel if args.configs else None)
        return 0

    if args.sentinel:
        print(json.dumps(sentinel_payload()))
        return 0

    geom = FAST if args.fast else FULL

    all_rows = list(HEADER_ROWS)
    ok = True
    for ci in sel:
        if ci == 4:
            continue
        rec = None
        if args.recorded:
            status, rec = recorded_entry(ci)
            if status == "stale":
                print(f"config{ci}: {STALE_MSG}")
                return 1
            if status == "missing":
                # Mirror the pytest lane (tests/test_hwparity.py): a
                # missing entry falls back to computing the oracle; only
                # a stale fingerprint is a hard failure.
                print(f"config{ci}: no recorded oracle entry -- "
                      "computing the fp64 oracle for this config "
                      "(record it with --gen-oracle)")
                rec = None
        rows, cfg_ok = run_config(ci, geom, recorded=rec)
        all_rows.extend(rows)
        ok &= cfg_ok

    if (args.configs is None) or ({2, 4} & set(sel)):
        rec = None
        if args.recorded:
            status, rec = recorded_entry("derived")
            if status == "stale":
                print(f"config4 derived: {STALE_MSG}")
                return 1
            if status == "missing":
                print("config4 derived: no recorded oracle entry -- "
                      "computing the fp64 oracle (record it with "
                      "--gen-oracle)")
                rec = None
        rows, d_ok = run_derived(geom, recorded=rec)
        all_rows.extend(rows)
        ok &= d_ok

    print()
    print("\n".join(all_rows))
    print()
    if args.fast:
        print("PARITY REPORT (fast mode -- not the contract run)")
        return 0
    print("PARITY PASS" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
