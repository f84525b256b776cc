"""Posterior-predictive goodness-of-fit checks (MBBResults.posterior_predictive).

Additive over the reference (which offers no absolute GOF; SURVEY.md C6):
p-value calibration on well-specified data, sensitivity to an injected
discrepant band, host-oracle chi-square agreement for the diagonal and
full-covariance whitenings, upper-limit exclusion, and the response-mode
HDF5 round-trip (the quadrature pack persists so a reloaded file PPCs
identically).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.results import MBBResults
from mbb_emcee_tpu.response import ResponseSet

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([30.0, 2.0, 250.0, 3.2, 50.0])


def _model_fluxes(shape=MBBShape()):
    return np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                              jnp.asarray(WAVE, jnp.float32), shape),
                      np.float64)


def _fit(flux, unc, cov=None, seed=3, **kw):
    fit = MBBFitter(nwalkers=32, seed=seed, **kw)
    fit.set_data(WAVE, flux, unc, cov=cov)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.set_gaussian_prior("lambda0", 250.0, 120.0)
    fit.set_gaussian_prior("alpha", 3.2, 1.5)
    fit.run(nburn=50, nsteps=100)
    return fit


@pytest.fixture(scope="module")
def good_fit():
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(0)
    return _fit(f + unc * rng.standard_normal(f.size), unc)


def test_ppc_well_specified(good_fit):
    res = MBBResults(fit=good_fit)
    ppc = res.posterior_predictive(thin=4)
    assert 0.02 < ppc.p_value < 0.98
    assert ppc.ndata == 5 and ppc.nfree == 5
    assert ppc.nsamples == res.flatchain[::4].shape[0]
    assert np.all(np.isfinite(ppc.band_p))
    assert np.all((ppc.band_p > 0.005) & (ppc.band_p < 0.995))
    # Replicated discrepancy is exactly chi-square with ndata dof.
    assert abs(np.mean(ppc.chi2_rep) - ppc.ndata) < 0.5
    # Determinism: same seed, same result.
    ppc2 = res.posterior_predictive(thin=4)
    assert ppc2.p_value == ppc.p_value
    np.testing.assert_array_equal(ppc2.chi2_obs, ppc.chi2_obs)


def test_ppc_flags_misfit_band():
    """A band displaced by 10 sigma must crater the p-value and show an
    extreme tail probability AT that band."""
    f = _model_fluxes()
    unc = 0.05 * f
    flux = f.copy()
    flux[2] += 10.0 * unc[2]
    fit = _fit(flux, unc, seed=5)
    ppc = MBBResults(fit=fit).posterior_predictive(thin=4)
    assert ppc.p_value < 0.01
    # The displaced band: observed far ABOVE replications (model cannot
    # follow a single 10-sigma outlier against 4 consistent bands).
    assert ppc.band_p[2] < 0.05


def test_ppc_chi2_matches_host_oracle(good_fit):
    """chi2_obs equals the host fp64 chi-square of the same thinned
    samples (point mode, diagonal errors) to fp32 tolerance."""
    res = MBBResults(fit=good_fit)
    thin = 40
    ppc = res.posterior_predictive(thin=thin)
    samples = res.flatchain[::thin]
    y = np.asarray(res.data_flux, np.float64)
    isig = 1.0 / np.asarray(res.data_flux_unc, np.float64)
    for t in range(0, samples.shape[0], 7):
        m = np.asarray(
            mbb_fnu(jnp.asarray(samples[t], jnp.float32),
                    jnp.asarray(WAVE, jnp.float32), res.shape), np.float64)
        want = np.sum(((m - y) * isig) ** 2)
        np.testing.assert_allclose(ppc.chi2_obs[t], want, rtol=2e-4)


def test_ppc_full_covariance_whitening():
    """With a band-correlated covariance, chi2_obs matches the host
    Mahalanobis distance under the full matrix."""
    f = _model_fluxes()
    sig = 0.05 * f
    C = 0.5 * np.outer(sig, sig) + np.diag(sig ** 2)
    rng = np.random.default_rng(2)
    flux = f + np.linalg.cholesky(C) @ rng.standard_normal(f.size)
    fit = _fit(flux, 0.05 * f, cov=C, seed=9)
    res = MBBResults(fit=fit)
    ppc = res.posterior_predictive(thin=40)
    Cinv = np.linalg.inv(C)
    samples = res.flatchain[::40]
    for t in range(0, samples.shape[0], 11):
        m = np.asarray(
            mbb_fnu(jnp.asarray(samples[t], jnp.float32),
                    jnp.asarray(WAVE, jnp.float32), res.shape), np.float64)
        d = m - flux
        np.testing.assert_allclose(ppc.chi2_obs[t], d @ Cinv @ d,
                                   rtol=5e-4)
    assert 0.001 < ppc.p_value <= 1.0


def test_ppc_excludes_upper_limit_bands():
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(4)
    flux = f + unc * rng.standard_normal(f.size)
    flux[-1] = 2.0 * f[-1]          # limit value, not a detection
    fit = MBBFitter(nwalkers=32, seed=13)
    fit.set_data(WAVE, flux, unc)
    fit.set_phot_upperlimits(np.array([0, 0, 0, 0, 1], bool))
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.set_gaussian_prior("lambda0", 250.0, 120.0)
    fit.set_gaussian_prior("alpha", 3.2, 1.5)
    fit.run(nburn=50, nsteps=100)
    ppc = MBBResults(fit=fit).posterior_predictive(thin=4)
    assert ppc.ndata == 4
    assert np.isnan(ppc.band_p[-1]) and np.all(np.isfinite(ppc.band_p[:4]))
    assert 0.005 < ppc.p_value < 0.995


def test_ppc_response_mode_h5_roundtrip(tmp_path):
    """Response-mode PPC works from a reloaded HDF5 file and reproduces
    the from-fit result exactly (the quadrature pack round-trips)."""
    rs = ResponseSet()
    names = []
    for w in WAVE:
        name = f"BOX{int(w)}"
        rs.add(name, f"box:{w}:{0.3 * w:.1f}")
        names.append(name)
    shape = MBBShape(opthin=True, noalpha=True)
    waves, weights = rs.pack(names)
    f_true = np.asarray(
        jnp.sum(weights * mbb_fnu(jnp.asarray(TRUE, jnp.float32), waves,
                                  shape), axis=-1), np.float64)
    unc = 0.05 * f_true
    rng = np.random.default_rng(6)
    flux = f_true + unc * rng.standard_normal(f_true.size)

    fit = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=17,
                    responses=rs)
    fit.set_data(WAVE, flux, unc, band_names=names)
    fit.run(nburn=50, nsteps=100)

    res = MBBResults(fit=fit)
    assert res.response_pack is not None
    ppc = res.posterior_predictive(thin=4)
    assert 0.005 < ppc.p_value < 0.995
    assert ppc.band_names == names

    path = str(tmp_path / "resp.h5")
    res.writeToHDF5(path)
    res2 = MBBResults(h5file=path)
    assert res2.response_pack is not None
    np.testing.assert_allclose(np.asarray(res2.response_pack[0]),
                               np.asarray(res.response_pack[0]))
    ppc2 = res2.posterior_predictive(thin=4)
    assert ppc2.p_value == ppc.p_value
    np.testing.assert_allclose(ppc2.chi2_obs, ppc.chi2_obs, rtol=1e-6)


@pytest.fixture(scope="module")
def batch_fit():
    """4-source batch: sources 0-2 well specified, source 3 carries a
    band displaced by 10 sigma."""
    from mbb_emcee_tpu.multifit import MultiFitter
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(7)
    flux = f[None, :] + unc[None, :] * rng.standard_normal((4, f.size))
    flux[3, 2] += 10.0 * unc[2]
    mf = MultiFitter(nwalkers=32, seed=19)
    mf.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    mf.set_gaussian_prior("lambda0", 250.0, 120.0)
    mf.set_gaussian_prior("alpha", 3.2, 1.5)
    mf.set_data(WAVE, flux, np.broadcast_to(unc, flux.shape))
    mf.run(nburn=50, nsteps=100)
    return mf, flux, unc


def test_ppc_batch_shapes_and_calibration(batch_fit):
    mf, flux, unc = batch_fit
    ppc = mf.posterior_predictive(thin=4)
    assert ppc.p_value.shape == (4,)
    assert ppc.band_p.shape == (4, 5)
    assert ppc.chi2_obs.shape == (4, ppc.nsamples)
    assert np.all(ppc.ndata == 5) and ppc.nfree == 5
    assert not ppc.excluded.any()
    # Well-specified sources: moderate p; replicated chi-sq ~ ndata.
    assert np.all(ppc.p_value[:3] > 0.02) and np.all(ppc.p_value[:3] < 0.98)
    assert np.allclose(np.mean(ppc.chi2_rep, axis=1), 5.0, atol=0.6)
    # The misfit source craters; its displaced band is flagged.
    assert ppc.p_value[3] < 0.01
    assert ppc.band_p[3, 2] < 0.05
    assert "p<0.01: 1" in repr(ppc)


def test_ppc_batch_chi2_matches_host_oracle(batch_fit):
    """Batched chi2_obs equals the host fp64 chi-square for spot-checked
    (source, sample) pairs."""
    mf, flux, unc = batch_fit
    thin = 40
    ppc = mf.posterior_predictive(thin=thin)
    samples = np.asarray(mf._thinned(thin))           # (S, N, 5)
    for s in (0, 3):
        for t in range(0, samples.shape[1], 9):
            m = np.asarray(
                mbb_fnu(jnp.asarray(samples[s, t], jnp.float32),
                        jnp.asarray(WAVE, jnp.float32), mf.shape),
                np.float64)
            want = np.sum(((m - flux[s]) / unc) ** 2)
            np.testing.assert_allclose(ppc.chi2_obs[s, t], want,
                                       rtol=3e-4)


def test_ppc_batch_missing_and_uplim_slots():
    """A missing band and a per-source upper-limit slot are excluded
    (band_p NaN; ndata drops) without disturbing the other sources."""
    from mbb_emcee_tpu.multifit import MultiFitter
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(11)
    flux = f[None, :] + unc[None, :] * rng.standard_normal((3, f.size))
    u = np.broadcast_to(unc, flux.shape).copy()
    flux[1, 4] = np.nan                        # missing band
    m = np.zeros((3, 5), bool)
    m[2, 0] = True                             # per-source upper limit
    flux[2, 0] = 2.0 * f[0]
    mf = MultiFitter(nwalkers=32, seed=23)
    mf.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    mf.set_gaussian_prior("lambda0", 250.0, 120.0)
    mf.set_gaussian_prior("alpha", 3.2, 1.5)
    mf.set_data(WAVE, flux, u)
    mf.set_phot_upperlimits(m)
    mf.run(nburn=50, nsteps=100)
    ppc = mf.posterior_predictive(thin=4)
    assert list(ppc.ndata) == [5, 4, 4]
    assert np.isnan(ppc.band_p[1, 4]) and np.isnan(ppc.band_p[2, 0])
    assert np.isfinite(ppc.band_p[0]).all()
    assert ppc.excluded[1, 4] and ppc.excluded[2, 0]
    assert np.all(ppc.p_value > 0.001)
    # Host oracle for the ragged source: chi-square over its 4 bands.
    samples = np.asarray(mf._thinned(40))
    mm = np.asarray(
        mbb_fnu(jnp.asarray(samples[1, 0], jnp.float32),
                jnp.asarray(WAVE, jnp.float32), mf.shape), np.float64)
    want = np.sum(((mm[:4] - flux[1, :4]) / unc[:4]) ** 2)
    ppc40 = mf.posterior_predictive(thin=40)
    np.testing.assert_allclose(ppc40.chi2_obs[1, 0], want, rtol=3e-4)


def test_ppc_batch_correlated_matches_host_oracle():
    """With a shared band correlation, chi2_obs is the Mahalanobis
    distance under each source's marginal covariance."""
    from mbb_emcee_tpu.multifit import MultiFitter
    f = _model_fluxes()
    unc = 0.05 * f
    R = 0.4 * np.ones((5, 5)) + 0.6 * np.eye(5)
    rng = np.random.default_rng(13)
    flux = f[None, :] + unc[None, :] * rng.standard_normal((2, f.size))
    flux[1, 3] = np.nan                        # ragged + correlated
    mf = MultiFitter(nwalkers=32, seed=29)
    mf.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    mf.set_gaussian_prior("lambda0", 250.0, 120.0)
    mf.set_gaussian_prior("alpha", 3.2, 1.5)
    mf.set_data(WAVE, flux, np.broadcast_to(unc, flux.shape))
    mf.set_band_correlation(R)
    mf.run(nburn=50, nsteps=100)
    ppc = mf.posterior_predictive(thin=40)
    samples = np.asarray(mf._thinned(40))
    # full-band source
    C = R * np.outer(unc, unc)
    m0 = np.asarray(
        mbb_fnu(jnp.asarray(samples[0, 0], jnp.float32),
                jnp.asarray(WAVE, jnp.float32), mf.shape), np.float64)
    d0 = m0 - flux[0]
    np.testing.assert_allclose(ppc.chi2_obs[0, 0],
                               d0 @ np.linalg.inv(C) @ d0, rtol=1e-3)
    # ragged source: marginal over its present bands
    p = np.isfinite(flux[1])
    Cp = (R * np.outer(unc, unc))[np.ix_(p, p)]
    m1 = np.asarray(
        mbb_fnu(jnp.asarray(samples[1, 0], jnp.float32),
                jnp.asarray(WAVE, jnp.float32), mf.shape), np.float64)
    d1 = (m1 - flux[1])[p]
    np.testing.assert_allclose(ppc.chi2_obs[1, 0],
                               d1 @ np.linalg.inv(Cp) @ d1, rtol=1e-3)
    assert np.isnan(ppc.band_p[1, 3])
    assert abs(np.mean(ppc.chi2_rep[0]) - 5.0) < 1.0
    assert abs(np.mean(ppc.chi2_rep[1]) - 4.0) < 1.0


def test_ppc_source_view_matches_batch(batch_fit):
    """MultiFitter.results(i).posterior_predictive works on the per-source
    view and covers the same sample set as the batched row (the two
    surfaces flatten the chain walker-major vs step-major, so compare
    the full thin=1 statistic as sorted multisets)."""
    mf, flux, unc = batch_fit
    ppc_b = mf.posterior_predictive(thin=1)
    ppc_s = mf.results(0).posterior_predictive(thin=1)
    assert ppc_s.nsamples == ppc_b.nsamples
    np.testing.assert_allclose(np.sort(ppc_s.chi2_obs),
                               np.sort(ppc_b.chi2_obs[0]),
                               rtol=2e-4, atol=1e-3)
    assert abs(ppc_s.p_value - ppc_b.p_value[0]) < 0.05


@pytest.mark.slow
def test_ppc_pvalue_calibration():
    """Calibration: across many independent noise realizations of a
    well-specified model, PPC p-values are broadly spread and
    non-extreme. (Posterior-predictive p-values are known to be
    CONSERVATIVE -- pulled toward 0.5 by the double use of the data --
    so this asserts spread + no false alarms, not exact uniformity.)
    One batched fit: the realizations ARE the source axis."""
    from mbb_emcee_tpu.multifit import MultiFitter
    M = 24
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(42)
    flux = f[None, :] + unc[None, :] * rng.standard_normal((M, f.size))
    mf = MultiFitter(nwalkers=32, seed=37)
    mf.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    mf.set_gaussian_prior("lambda0", 250.0, 120.0)
    mf.set_gaussian_prior("alpha", 3.2, 1.5)
    mf.set_data(WAVE, flux, np.broadcast_to(unc, flux.shape))
    mf.run(nburn=60, nsteps=120)
    p = mf.posterior_predictive(thin=4).p_value
    # No false alarm on any well-specified realization...
    assert p.min() > 0.001 and p.max() < 0.9999
    # ...and real spread (not all stuck at 0.5).
    assert np.ptp(p) > 0.2
    assert 0.2 < np.median(p) < 0.85


def test_ppc_batch_cli(tmp_path, capsys):
    """--ppc on the batch CLI prints the per-source sweep and names the
    misfit source."""
    from mbb_emcee_tpu.cli_batch import main as batch_main
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(31)
    lines = ["wave = " + " ".join(f"{w:g}" for w in WAVE)]
    for i in range(3):
        flux = f + unc * rng.standard_normal(f.size)
        if i == 2:
            flux[1] += 10.0 * unc[1]          # misfit source
        lines.append(f"SRC{i:03d} 2.0 " + " ".join(
            f"{flux[j]:.4f} {unc[j]:.4f}" for j in range(WAVE.size)))
    with open(cat, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    rc = batch_main([cat, out, "--opthin", "--noalpha",
                     "-w", "32", "-b", "40", "-n", "100",
                     "--uplim", "T", "100", "--uplim", "beta", "5",
                     "--ppc", "--derived-thin", "4", "--seed", "3"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "posterior predictive: median p" in text
    assert "SRC002=" in text and "SRC000" not in text.split("\n")[0]


def test_ppc_batch_cli_refuses_map(tmp_path):
    from mbb_emcee_tpu.cli_batch import main as batch_main
    cat = str(tmp_path / "cat.txt")
    with open(cat, "w") as fh:
        fh.write("wave = 100 250\nS0 1.0 10 1 20 2\n")
    with pytest.raises(SystemExit, match="--ppc"):
        batch_main([cat, str(tmp_path / "o.h5"), "--map", "--ppc"])


def test_ppc_point_mode_h5_roundtrip(tmp_path):
    """Point-mode files carry no ResponsePack group and reload with
    response_pack=None (backward compatible with pre-existing files)."""
    import h5py
    f = _model_fluxes()
    unc = 0.05 * f
    rng = np.random.default_rng(8)
    fit = _fit(f + unc * rng.standard_normal(f.size), unc, seed=21)
    res = MBBResults(fit=fit)
    assert res.response_pack is None
    path = str(tmp_path / "point.h5")
    res.writeToHDF5(path)
    with h5py.File(path, "r") as h:
        assert "ResponsePack" not in h
    res2 = MBBResults(h5file=path)
    assert res2.response_pack is None
    ppc = res2.posterior_predictive(thin=4)
    assert np.isfinite(ppc.p_value)
