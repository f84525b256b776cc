"""Results-layer tests: percentile math, derived quantities (L_IR, dust
mass, peak lambda) against the adaptive-quadrature oracle, cosmology, and
HDF5 round-trip (SURVEY.md test plan items 5-6; BASELINE config[4])."""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.models.cosmology import Cosmology, luminosity_distance
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.results import MBBResults
from mbb_emcee_tpu.constants import MPC_M, MJY_WM2HZ, LSUN_W
from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([30.0, 2.0, 250.0, 3.2, 50.0])
Z = 2.0


@pytest.fixture(scope="module")
def small_fit():
    shape = MBBShape()
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape), np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(0)
    flux = f + unc * rng.standard_normal(f.size)
    fit = MBBFitter(nwalkers=64, seed=11)
    fit.set_data(WAVE, flux, unc)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.set_gaussian_prior("lambda0", 250.0, 120.0)
    fit.set_gaussian_prior("alpha", 3.2, 1.5)
    fit.run(nburn=60, nsteps=120)
    return fit


def test_cosmology_against_known_values():
    """WMAP9 flat LCDM D_L spot checks (values computed with the standard
    comoving-distance integral; agree with astropy to <0.1%)."""
    c = Cosmology.named("WMAP9")
    # E(0)=1 sanity and monotonicity.
    assert abs(c.efunc(0.0) - 1.0) < 1e-12
    dl1 = c.luminosity_distance(1.0)
    dl2 = c.luminosity_distance(2.0)
    assert 6500.0 < dl1 < 6900.0      # ~6716 Mpc for WMAP9
    assert 15500.0 < dl2 < 16300.0    # ~15893 Mpc
    assert dl2 > 2 * dl1
    # Explicit lumdist override.
    assert luminosity_distance(5.0, 1234.5) == 1234.5


def test_percentiles_and_best_fit(small_fit):
    res = MBBResults(fit=small_fit, redshift=Z)
    c = res.par_cen("T")
    assert c.shape == (3,)
    assert c[1] > 0 and c[2] > 0
    assert abs(c[0] - TRUE[0]) < 6.0
    p, lnp = res.best_fit
    assert p.shape == (5,)
    assert np.isfinite(lnp)
    assert res.par_lowlim("T") < c[0] < res.par_uplim("T")


def test_lir_matches_adaptive_quad_oracle(small_fit):
    """Batched GL L_IR vs per-sample scipy adaptive quad on a handful of
    chain samples: <=0.1% (SURVEY.md test plan item 5)."""
    res = MBBResults(fit=small_fit, redshift=Z)
    lir = res.compute_lir(thin=50)
    samples = res.flatchain[::50]
    dl_m = res._dl_mpc() * MPC_M
    prefac = 4.0 * np.pi * dl_m ** 2 * MJY_WM2HZ / LSUN_W
    for i in range(0, min(len(samples), 8)):
        t = samples[i]
        oracle = ModifiedBlackbodyOracle(*t)
        want = prefac * oracle.freq_integrate(8.0 * (1 + Z), 1000.0 * (1 + Z))
        np.testing.assert_allclose(lir[i], want, rtol=2e-3)


def test_peaklambda_matches_oracle(small_fit):
    res = MBBResults(fit=small_fit, redshift=Z)
    pk = res.compute_peaklambda(thin=50)
    samples = res.flatchain[::50]
    for i in range(0, min(len(samples), 8)):
        oracle = ModifiedBlackbodyOracle(*samples[i])
        np.testing.assert_allclose(pk[i], oracle.peak_lambda(), rtol=1e-3)


def test_dustmass_hand_computed(small_fit):
    """Dust mass formula check on one sample against an independent
    hand-computed value."""
    res = MBBResults(fit=small_fit, redshift=Z)
    dm = res.compute_dustmass(thin=200)
    t = res.flatchain[::200][0]
    oracle = ModifiedBlackbodyOracle(*t)
    opz = 1.0 + Z
    lam_obs = 125.0 * opz
    s_obs = float(oracle(lam_obs)) * MJY_WM2HZ           # W/m^2/Hz
    dl_m = res._dl_mpc() * MPC_M
    c_ms = 2.99792458e8
    nu_rest = c_ms / 125e-6
    t_rest = t[0] * opz
    h, k = 6.62607015e-34, 1.380649e-23
    bnu = 2 * h * nu_rest ** 3 / c_ms ** 2 \
        / np.expm1(h * nu_rest / (k * t_rest))
    want = dl_m ** 2 * s_obs / (opz * 2.64 * bnu) / 1.98892e30
    np.testing.assert_allclose(dm[0], want, rtol=2e-3)


def test_requires_redshift(small_fit):
    res = MBBResults(fit=small_fit)
    with pytest.raises(RuntimeError):
        res.compute_lir()
    # but explicit lumdist + redshift=None still fails (opz needed)
    res2 = MBBResults(fit=small_fit, lumdist=15000.0)
    with pytest.raises(RuntimeError):
        res2.compute_lir()


def test_hdf5_roundtrip(tmp_path, small_fit):
    res = MBBResults(fit=small_fit, redshift=Z, cosmology="Planck13")
    res.compute_lir(thin=20)
    res.compute_dustmass(thin=20)
    res.compute_peaklambda(thin=20)
    path = str(tmp_path / "fit.h5")
    res.writeToHDF5(path)

    back = MBBResults(h5file=path)
    np.testing.assert_allclose(back.chain, res.chain, rtol=1e-6)
    np.testing.assert_allclose(back.lnprobability, res.lnprobability,
                               rtol=1e-6)
    assert back.redshift == Z
    assert back.cosmology_name == "Planck13"
    np.testing.assert_allclose(back.lir_chain, res.lir_chain)
    np.testing.assert_allclose(back.dustmass_chain, res.dustmass_chain)
    np.testing.assert_allclose(back.peaklambda_chain, res.peaklambda_chain)
    assert back.lir_meta["wavemin"] == 8.0
    np.testing.assert_allclose(back.phot.flux, small_fit.phot.flux)
    # percentile summaries must agree
    np.testing.assert_allclose(back.par_cen("beta"), res.par_cen("beta"),
                               rtol=1e-5)
    # shape/settings survive
    assert back.shape == small_fit.shape
    assert back.nwalkers == small_fit.nwalkers
    # repr works on a reloaded object
    assert "L_IR" in repr(back)


def test_summary_repr(small_fit):
    res = MBBResults(fit=small_fit, redshift=Z)
    s = repr(res)
    for name in ("T", "beta", "lambda0", "alpha", "fnorm"):
        assert name in s


def test_best_fit_model_and_autocorr(small_fit):
    res = MBBResults(fit=small_fit, redshift=Z)
    m = res.best_fit_model()
    theta, lnp = res.best_fit
    # the model object reproduces the best-fit sample's SED
    np.testing.assert_allclose(
        float(m(res.shape.wavenorm)[0]), theta[4], rtol=1e-5)
    tau = res.autocorrelation_time()
    assert tau.shape == (res.param_spec.free_indices.size,)
    assert np.all(np.isfinite(tau)) and np.all(tau > 0)


def test_par_cov_and_sed_percentiles(small_fit):
    res = MBBResults(fit=small_fit, redshift=Z)
    names, cov = res.par_cov()
    n = len(names)
    assert cov.shape == (n, n)
    # symmetric positive-semidefinite with per-parameter variances
    np.testing.assert_allclose(cov, cov.T, rtol=1e-12)
    assert np.all(np.linalg.eigvalsh(cov) > -1e-9)
    for k, name in enumerate(names):
        flat = res.parameter_chain(name)
        np.testing.assert_allclose(cov[k, k], np.var(flat, ddof=1),
                                   rtol=1e-6)

    waves = np.array([100.0, 250.0, 500.0, 1000.0])
    band = res.sed_percentiles(waves, thin=5)
    assert band.shape == (3, waves.size)
    # ordering: lower <= median <= upper, all positive
    assert np.all(band[2] <= band[0] + 1e-12)
    assert np.all(band[0] <= band[1] + 1e-12)
    assert np.all(band > 0)
    # the median SED at the normalization wavelength tracks fnorm's median
    mid500 = res.sed_percentiles(np.array([res.shape.wavenorm]))[0, 0]
    np.testing.assert_allclose(mid500, res.par_cen("fnorm")[0], rtol=0.02)


def test_gelman_rubin(small_fit):
    # A SHORT chain (length ~ a few autocorrelation times) must be
    # FLAGGED as unconverged -- each walker's half-series barely moves,
    # so the between-walker variance dominates.
    res = MBBResults(fit=small_fit, redshift=Z)
    rhat = res.gelman_rubin()
    names = res.free_param_names
    assert len(names) == rhat.size == res.param_spec.free_indices.size
    assert np.all(np.isfinite(rhat)) and np.all(rhat >= 0.99)
    assert np.any(rhat > 1.1)

    # A long well-mixed chain on the unimodal 3-parameter model converges
    # to R-hat ~ 1.
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(3)
    fit = MBBFitter(nwalkers=64, seed=21, opthin=True, noalpha=True)
    fit.set_data(WAVE, f + unc * rng.standard_normal(f.size), unc)
    fit.run(nburn=80, nsteps=800)
    rhat_long = MBBResults(fit=fit, redshift=Z).gelman_rubin()
    assert np.all(rhat_long < 1.1)

    # An intentionally unmixed "chain" (two walker groups at different
    # fixed points) must be flagged hard.
    bad = MBBResults(fit=small_fit, redshift=Z)
    ch = bad.chain.copy()
    ch[: ch.shape[0] // 2, :, 0] = 20.0
    ch[ch.shape[0] // 2:, :, 0] = 40.0
    ch += np.random.default_rng(0).normal(0, 0.01, ch.shape)
    bad.chain = ch
    rhat_bad = bad.gelman_rubin()
    assert rhat_bad[0] > 10.0


def test_par_cov_single_free_parameter():
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    fit = MBBFitter(nwalkers=16, seed=4, opthin=True, noalpha=True)
    fit.set_data(WAVE, f, unc)
    fit.fix_param("beta", 2.0)
    fit.fix_param("fnorm", 50.0)          # only T remains free
    fit.run(nburn=10, nsteps=30)
    res = MBBResults(fit=fit, redshift=Z)
    names, cov = res.par_cov()
    assert names == ["T"]
    assert cov.shape == (1, 1) and cov[0, 0] > 0


def test_verbose_short_run_does_not_crash(capsys):
    shape = MBBShape()
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    fit = MBBFitter(nwalkers=32, seed=4)
    fit.set_data(WAVE, f, 0.05 * f)
    fit.run(nburn=10, nsteps=100, thin=50, verbose=True)   # 2 records
    out = capsys.readouterr().out
    assert "acceptance" in out
    assert "split-R-hat" not in out      # too short to compute; no crash


def test_luminosity_distance_vs_adaptive_quad():
    """GL comoving-distance quadrature vs scipy adaptive quad for every
    named parameter set over the relevant redshift range."""
    import scipy.integrate as si
    from mbb_emcee_tpu.models.cosmology import PARAMETER_SETS
    from mbb_emcee_tpu.constants import C_KM_S

    for name, (H0, Om0) in PARAMETER_SETS.items():
        c = Cosmology.named(name)
        Ol = 1.0 - Om0
        for z in (0.1, 1.0, 2.2, 6.0):
            integ, _ = si.quad(
                lambda zp: 1.0 / np.sqrt(Om0 * (1 + zp) ** 3 + Ol),
                0.0, z, limit=200)
            want = (1 + z) * C_KM_S / H0 * integ
            got = c.luminosity_distance(z)
            assert abs(got - want) / want < 1e-8, (name, z)


def test_h5_cosmology_precedence(tmp_path, small_fit):
    """An EXPLICIT cosmology constructor argument -- including the default
    name WMAP9 -- wins over the cosmology stored in the file; with no
    argument, the stored name is used."""
    from mbb_emcee_tpu.models.cosmology import Cosmology
    path = str(tmp_path / "cosmo.h5")
    res = MBBResults(fit=small_fit, redshift=2.0, cosmology="Planck18")
    res.writeToHDF5(path)

    stored = MBBResults(h5file=path)
    assert stored.cosmology_name == "Planck18"

    explicit = MBBResults(h5file=path, cosmology="WMAP9")
    assert explicit.cosmology_name == "WMAP9"
    assert explicit._cosmo.H0 == Cosmology.named("WMAP9").H0


def test_h5_custom_cosmology_roundtrip(tmp_path, small_fit):
    """A custom (unnamed) Cosmology must survive the HDF5 round-trip
    instead of silently degrading to the WMAP9 default on reload."""
    from mbb_emcee_tpu.models.cosmology import Cosmology
    custom = Cosmology(H0=63.0, Om0=0.35)
    res = MBBResults(fit=small_fit, redshift=2.0, cosmology=custom)
    lir = res.compute_lir(thin=16).copy()
    path = str(tmp_path / "custom_cosmo.h5")
    res.writeToHDF5(path)

    back = MBBResults(h5file=path)
    assert back.cosmology_name is None
    assert back._cosmo.H0 == 63.0 and back._cosmo.Om0 == 0.35
    np.testing.assert_allclose(back.compute_lir(thin=16), lir, rtol=1e-6)
    # an explicit constructor choice still wins over the stored one
    named = MBBResults(h5file=path, cosmology="WMAP9")
    assert named.cosmology_name == "WMAP9"


def test_rank_normalized_diagnostics_surface(small_fit):
    """gelman_rubin(rank_normalized=True) and effective_samples on the
    results surface: free-parameter shapes, sane values on a short but
    mixed chain."""
    res = MBBResults(fit=small_fit, redshift=Z)
    nfree = len(res.free_param_names)
    rhat = res.gelman_rubin(rank_normalized=True)
    assert rhat.shape == (nfree,)
    assert np.all(np.isfinite(rhat)) and np.all(rhat > 0.9)
    ess_b = res.effective_samples()
    ess_t = res.effective_samples(kind="tail")
    assert ess_b.shape == (nfree,) and ess_t.shape == (nfree,)
    assert np.all(ess_b > 10) and np.all(ess_t > 10)
