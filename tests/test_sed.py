"""Generic-model surface (sed.SEDFitter/SEDResults): a user JAX SED runs
the full pipeline -- likelihood semantics identical to the MBB builders,
the reference run protocol, response integration, derived quantities,
persistence, and PPC."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu import log_mbb_fnu, mbb_fnu
from mbb_emcee_tpu.models.modified_blackbody import MBBShape
from mbb_emcee_tpu.likelihood import (
    Photometry, LikelihoodSpec, build_lnprob)
from mbb_emcee_tpu.sed import (
    SEDModel, SEDFitter, SEDResults, build_sed_lnprob)

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE5 = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
SHAPE5 = MBBShape()
SHAPE_THIN = MBBShape(opthin=True, noalpha=True)


def _mbb_wrapped(shape=SHAPE5):
    """The full 5-parameter MBB as a user SEDModel -- the apples-to-apples
    bridge between the generic surface and the native one."""
    def fnu(theta, wave):
        return jnp.exp(log_mbb_fnu(theta, wave, shape))
    return SEDModel(fnu=fnu,
                    param_names=("T", "beta", "lambda0", "alpha", "fnorm"),
                    lower=[0.1, 0.01, 1.0, 0.01, 1e-5],
                    upper=[100.0, 5.0, 2e4, 60.0, 1e7],
                    name="mbb-wrapped")


def _mock_flux(shape=SHAPE5, true=TRUE5, frac=0.05, seed=42):
    f = np.asarray(mbb_fnu(jnp.asarray(true, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = frac * f
    rng = np.random.default_rng(seed)
    return f + unc * rng.standard_normal(f.size), unc


# -- SEDModel validation ---------------------------------------------------------------

def test_sedmodel_validation():
    good = _mbb_wrapped()
    assert good.npar == 5
    assert good.param_index("LAMBDA0") == 2
    assert good.param_index(4) == 4
    with pytest.raises(ValueError, match="unknown parameter"):
        good.param_index("T_dust")
    with pytest.raises(ValueError, match="out of range"):
        good.param_index(5)
    with pytest.raises(ValueError, match="lower/upper"):
        SEDModel(fnu=good.fnu, param_names=("a", "b"),
                 lower=[0.0], upper=[1.0, 2.0])
    with pytest.raises(ValueError, match="unique"):
        SEDModel(fnu=good.fnu, param_names=("a", "A"),
                 lower=[0.0, 0.0], upper=[1.0, 1.0])
    with pytest.raises(ValueError, match="lower limit"):
        SEDModel(fnu=good.fnu, param_names=("a",), lower=[2.0], upper=[1.0])

    # validate() catches a wrong-shape fnu before any sampling starts.
    bad = SEDModel(fnu=lambda th, w: jnp.sum(w) * th[0],
                   param_names=("a",), lower=[0.5], upper=[1.5])
    with pytest.raises(ValueError, match="shape"):
        bad.validate()


def test_lnprob_matches_mbb_builder():
    """build_sed_lnprob on the wrapped MBB reproduces build_lnprob exactly
    (same whitening, priors, box floor, fixed-value widening) -- point
    mode, covariance mode, and upper-limit mode."""
    flux, unc = _mock_flux()
    model = _mbb_wrapped()

    # identical spec in both builders
    spec = LikelihoodSpec.default()
    spec.upper[0] = 100.0
    spec.upper[1] = 5.0
    spec = dataclasses.replace(
        spec,
        fixed=np.array([False, False, False, True, False]),
        fixed_values=np.array([0.0, 0.0, 0.0, 0.0, 0.0]),  # out-of-box alpha
        prior_mean=np.array([0.0, 1.9, 0.0, 0.0, 0.0]),
        prior_isigma=np.array([0.0, 1.0 / 0.3, 0.0, 0.0, 0.0]))

    rng = np.random.default_rng(0)
    for cov, uplim in [(None, None),
                       (np.diag(unc ** 2) + 0.2 * np.outer(unc, unc), None),
                       (None, np.array([False] * 4 + [True]))]:
        phot = Photometry(WAVE, flux, unc, cov=cov)
        sp = dataclasses.replace(spec, uplim_bands=uplim)
        ln_mbb, fs_mbb = build_lnprob(phot, SHAPE5, sp)
        ln_sed, fs_sed = build_sed_lnprob(phot, model, sp)
        assert np.array_equal(fs_mbb.free_idx, fs_sed.free_idx)
        thetas = rng.uniform(0.9, 1.1, (16, fs_mbb.nfree)) * np.array(
            [32.0, 1.9, 250.0, 45.0])
        a = np.asarray(jax.vmap(ln_mbb)(jnp.asarray(thetas, jnp.float32)))
        b = np.asarray(jax.vmap(ln_sed)(jnp.asarray(thetas, jnp.float32)))
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_uplim_cov_guard_is_bidirectional(tmp_path):
    """Regression (review): the uplim-vs-covariance refusal must hold in
    BOTH setter orders -- limits first, covariance second used to
    compose the forbidden combination silently."""
    from mbb_emcee_tpu.sed import SEDFitter
    from mbb_emcee_tpu.utils.fits import write_fits_image
    flux, unc = _mock_flux()
    model = _mbb_wrapped()
    cov = np.diag(unc ** 2)

    # order 1 (already guarded): cov first, uplims second
    f1 = SEDFitter(model, nwalkers=16)
    f1.set_data(WAVE, flux, unc, cov=cov)
    with pytest.raises(ValueError, match="do not compose"):
        f1.set_phot_upperlimits([True, False, False, False, False])

    # order 2 (the review gap): uplims first, covariance second
    f2 = SEDFitter(model, nwalkers=16)
    f2.set_data(WAVE, flux, unc)
    f2.set_phot_upperlimits([True, False, False, False, False])
    with pytest.raises(ValueError, match="do not compose"):
        f2.set_data(WAVE, flux, unc, cov=cov)
    covf = str(tmp_path / "c.fits")
    write_fits_image(covf, cov)
    with pytest.raises(ValueError, match="do not compose"):
        f2.read_cov(covf, is_total=True)
    # an all-False mask does not block covariance
    f3 = SEDFitter(model, nwalkers=16)
    f3.set_data(WAVE, flux, unc)
    f3.set_phot_upperlimits([False] * 5)
    f3.set_data(WAVE, flux, unc, cov=cov)


def test_spec_size_mismatch_raises():
    flux, unc = _mock_flux()
    model = _mbb_wrapped()
    with pytest.raises(ValueError, match="sized for"):
        build_sed_lnprob(Photometry(WAVE, flux, unc), model,
                         LikelihoodSpec.for_box([0.0, 1.0], [1.0, 2.0]))


# -- fitting ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wrapped_fit():
    """Wrapped-MBB SEDFitter run on thin 3-param mock data."""
    shape = SHAPE_THIN
    true = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    flux, unc = _mock_flux(shape, true)
    model = _mbb_wrapped(shape)
    fit = SEDFitter(model, nwalkers=64, redshift=2.5, seed=17)
    fit.set_data(WAVE, flux, unc)
    # the thin shape ignores lambda0/alpha; fix them to the conventional
    # values so the sampling space is the 3 live parameters
    fit.fix_param("lambda0", 250.0).fix_param("alpha", 3.5)
    fit.set_param_init("T", 30.0, 3.0)
    fit.set_param_init("fnorm", 40.0, 5.0)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.run(nburn=80, nsteps=300)
    return fit


def test_sedfitter_recovers_truth(wrapped_fit):
    fit = wrapped_fit
    chain = fit.chain                       # (nw, nsteps, 5)
    assert chain.shape == (64, 300, 5)
    # fixed params pinned exactly
    assert np.all(chain[:, :, 2] == 250.0)
    assert np.all(chain[:, :, 3] == 3.5)
    res = fit.results()
    for name, true_v in [("T", 32.0), ("beta", 1.9), ("fnorm", 45.0)]:
        c = res.par_cen(name)
        sigma = max(c[1], c[2])
        assert abs(c[0] - true_v) < 5 * sigma, (name, c)
    # acceptance in the healthy stretch-move band
    assert 0.2 < np.mean(fit.acceptance_fraction) < 0.8
    names, rhat = fit.gelman_rubin()
    assert names == ["T", "beta", "fnorm"]
    assert rhat.max() < 1.2
    assert np.all(fit.autocorrelation_time() > 0)


def test_sedfitter_matches_mbbfitter_posterior(wrapped_fit):
    """Same data, same posterior through the native MBB surface: the two
    pipelines agree statistically (not bitwise -- different PRNG
    bootstrap)."""
    from mbb_emcee_tpu import MBBFitter
    fit = wrapped_fit
    mfit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=23)
    mfit.set_data(WAVE, fit.phot.flux, fit.phot.unc)
    mfit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    mfit.run(nburn=80, nsteps=300)
    res_s = fit.results()
    res_m = mfit  # MBBFitter exposes chain directly
    flat_m = res_m.chain.reshape(-1, 5)
    for i, name in [(0, "T"), (1, "beta"), (4, "fnorm")]:
        med_s = res_s.par_cen(name)[0]
        med_m = np.median(flat_m[:, i])
        width_s = res_s.par_cen(name)[1] + res_s.par_cen(name)[2]
        width_m = np.diff(np.percentile(flat_m[:, i], [15.85, 84.15]))[0]
        assert abs(med_s - med_m) < 0.25 * width_m, (name, med_s, med_m)
        assert abs(width_s - width_m) < 0.5 * width_m, (name, width_s,
                                                        width_m)


def test_gaussian_prior_pulls_posterior():
    """A tight prior off the likelihood peak shifts the posterior -- the
    prior plumbing reaches the device program."""
    shape = SHAPE_THIN
    flux, unc = _mock_flux(shape)
    model = _mbb_wrapped(shape)

    def run(prior):
        fit = SEDFitter(model, nwalkers=48, seed=5)
        fit.set_data(WAVE, flux, unc)
        fit.fix_param("lambda0", 250.0).fix_param("alpha", 3.5)
        fit.set_param_init("T", 30.0, 3.0)
        fit.set_param_init("fnorm", 40.0, 5.0)
        if prior:
            fit.set_gaussian_prior("T", 25.0, 0.5)
        fit.run(nburn=60, nsteps=200)
        return fit.results().par_cen("T")[0]

    assert run(True) < run(False) - 1.0


def test_box_limits_respected():
    shape = SHAPE_THIN
    flux, unc = _mock_flux(shape)
    model = _mbb_wrapped(shape)
    fit = SEDFitter(model, nwalkers=48, seed=5)
    fit.set_data(WAVE, flux, unc)
    fit.fix_param("lambda0", 250.0).fix_param("alpha", 3.5)
    fit.set_param_init("T", 30.0, 3.0)
    fit.set_param_init("fnorm", 40.0, 5.0)
    fit.set_lowlim("T", 33.0).set_uplim("T", 40.0)
    fit.run(nburn=40, nsteps=120)
    t = fit.chain[:, :, 0]
    assert t.min() >= 33.0 and t.max() <= 40.0


def test_call_full_vector(wrapped_fit):
    """__call__ evaluates lnprob at a full theta; out-of-box free values
    floor; fixed slots accept their pinned values."""
    fit = wrapped_fit
    good = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
    v = fit(good)
    assert np.isfinite(v) and v > -1e20
    bad = good.copy()
    bad[0] = 1e4  # outside the T box
    assert fit(bad) <= -1e25
    with pytest.raises(ValueError, match="full parameter"):
        fit(np.array([32.0, 1.9]))


def test_extend_and_guard(wrapped_fit):
    shape = SHAPE_THIN
    flux, unc = _mock_flux(shape)
    model = _mbb_wrapped(shape)
    fit = SEDFitter(model, nwalkers=48, seed=9)
    fit.set_data(WAVE, flux, unc)
    fit.fix_param("lambda0", 250.0).fix_param("alpha", 3.5)
    fit.set_param_init("T", 30.0, 3.0)
    fit.set_param_init("fnorm", 40.0, 5.0)
    fit.run(nburn=30, nsteps=60)
    fit.extend(40)
    assert fit.chain.shape[1] == 100
    assert fit.lnprobability.shape[0] == 100
    # posterior changed -> extend refuses
    fit.set_gaussian_prior("T", 30.0, 1.0)
    with pytest.raises(RuntimeError, match="changed since run"):
        fit.extend(20)


def test_response_mode_matches_manual_quadrature():
    """Named bands + ResponseSet: the sed lnprob's band fluxes equal the
    hand-computed weights contraction."""
    from mbb_emcee_tpu.response import ResponseSet
    shape = SHAPE5
    flux, unc = _mock_flux()
    names = [f"b{i}" for i in range(WAVE.size)]
    rs = ResponseSet()
    for n, w in zip(names, WAVE):
        rs.add(n, f"box:{w}:{0.2 * w}:33")
    model = _mbb_wrapped()

    fit = SEDFitter(model, nwalkers=16, seed=3)
    fit.set_data(WAVE, flux, unc, band_names=names)
    fit.set_responses(rs)
    pack = fit._response_pack()
    theta = np.array([30.0, 2.0, 200.0, 3.0, 40.0])

    vals = np.asarray(model.fnu(jnp.asarray(theta, jnp.float32),
                                jnp.asarray(pack[0], jnp.float32)))
    manual = np.sum(np.asarray(pack[1]) * vals, axis=-1)

    lnp, fs = build_sed_lnprob(fit.phot, model, fit.spec,
                               response_pack=pack)
    # reconstruct lnl from the returned lnprob: compare against direct calc
    r = (manual - flux) / unc
    expect = -0.5 * np.sum(r * r)
    got = float(jax.jit(lnp)(jnp.asarray(theta[fs.free_idx], jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=2e-4)


def test_requires_named_bands_for_responses():
    from mbb_emcee_tpu.response import ResponseSet
    flux, unc = _mock_flux()
    fit = SEDFitter(_mbb_wrapped(), nwalkers=16, seed=3)
    fit.set_data(WAVE, flux, unc)
    fit.set_responses(ResponseSet())
    with pytest.raises(ValueError, match="named photometry bands"):
        fit.build()


# -- derived quantities ------------------------------------------------------------------

def test_derived_match_mbbresults(wrapped_fit):
    """On the SAME chain, generic L_IR / peak-lambda / sed band equal the
    MBBResults device kernels (the wrapped model IS the MBB)."""
    from mbb_emcee_tpu import derived
    res = wrapped_fit.results()
    shape = SHAPE_THIN

    samples = jnp.asarray(res._thinned(7), jnp.float32)

    # L_IR: generic vs derived.lir_integrand
    lam, w = derived.lir_nodes_weights(res._opz(), 8.0, 1000.0)
    one = derived.lir_integrand(shape)
    ref = np.asarray(jax.jit(jax.vmap(
        lambda th: one(th, jnp.asarray(lam, jnp.float32),
                       jnp.asarray(w, jnp.float32))))(samples), np.float64)
    ref *= derived.lir_prefactor(res._dl_mpc())
    got = res.compute_lir(thin=7)
    np.testing.assert_allclose(got, ref, rtol=3e-5)

    # peak lambda: generic vs derived.peak_finder
    peak = derived.peak_finder(shape)
    ref_p = np.asarray(jax.jit(jax.vmap(peak))(samples), np.float64)
    got_p = res.compute_peaklambda(thin=7)
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-4)

    # sed percentiles: generic vs derived.sed_eval
    grid = np.geomspace(50.0, 2000.0, 16)
    sed = derived.sed_eval(shape, jnp.asarray(grid, jnp.float32))
    fl = np.asarray(jax.jit(jax.vmap(sed))(
        jnp.asarray(res._thinned(1), jnp.float32)), np.float64)
    ref_band = derived.sed_band(fl, 68.3, sample_axis=0)
    got_band = res.sed_percentiles(grid)
    np.testing.assert_allclose(got_band, ref_band, rtol=2e-5)


def test_ppc_wellspecified(wrapped_fit):
    ppc = wrapped_fit.results().posterior_predictive(thin=5)
    assert 0.01 < ppc.p_value < 0.99
    det = np.isfinite(ppc.band_p)
    assert det.all()  # no uplim/missing bands here
    assert np.all((ppc.band_p > 0.001) & (ppc.band_p < 0.999))


# -- persistence ----------------------------------------------------------------------

def test_hdf5_roundtrip(wrapped_fit, tmp_path):
    res = wrapped_fit.results()
    res.compute_lir(thin=11)
    res.compute_peaklambda(thin=11)
    path = str(tmp_path / "sed.h5")
    res.writeToHDF5(path)

    r2 = SEDResults(h5file=path, model=wrapped_fit.model)
    np.testing.assert_array_equal(np.asarray(res.chain, np.float32),
                                  r2.chain.astype(np.float32))
    np.testing.assert_allclose(r2.lir_chain, res.lir_chain)
    np.testing.assert_allclose(r2.peaklambda_chain, res.peaklambda_chain)
    assert r2.redshift == res.redshift
    assert r2.thin == res.thin
    assert r2.param_spec.fixed.tolist() == res.param_spec.fixed.tolist()
    np.testing.assert_allclose(r2.par_cen("T"), res.par_cen("T"))
    # model-dependent computations work on the reload
    p1 = res.posterior_predictive(thin=17).p_value
    p2 = r2.posterior_predictive(thin=17).p_value
    assert abs(p1 - p2) < 0.05

    # without a model: summaries fine, model evals refuse with guidance
    r3 = SEDResults(h5file=path)
    np.testing.assert_allclose(r3.par_cen("beta"), res.par_cen("beta"))
    assert r3.free_param_names == ["T", "beta", "fnorm"]
    with pytest.raises(RuntimeError, match="model="):
        r3.compute_lir()

    # a mismatched model refuses
    other = SEDModel(fnu=wrapped_fit.model.fnu, param_names=("x", "y"),
                     lower=[0.0, 0.0], upper=[1.0, 1.0], name="other")
    with pytest.raises(ValueError, match="parameters"):
        SEDResults(h5file=path, model=other)


def test_mbb_file_refused(wrapped_fit, tmp_path):
    """An MBB results file is not an SED results file (and vice versa the
    kind attr keeps MBBResults loaders away from sed files)."""
    from mbb_emcee_tpu import MBBFitter, MBBResults
    flux, unc = _mock_flux(SHAPE_THIN)
    mfit = MBBFitter(nwalkers=16, opthin=True, noalpha=True, seed=2)
    mfit.set_data(WAVE, flux, unc)
    mfit.run(nburn=10, nsteps=20)
    path = str(tmp_path / "mbb.h5")
    MBBResults(fit=mfit).writeToHDF5(path)
    with pytest.raises(ValueError, match="not an SEDResults file"):
        SEDResults(h5file=path)


# -- a genuinely non-MBB model through the full stack -------------------------------------

def test_two_temperature_model_end_to_end(tmp_path):
    """The canonical custom model (two-temperature greybody) recovers its
    truth and flows through derived quantities + persistence + PPC."""
    shape = SHAPE_THIN

    def two_mbb(theta, wave):
        t_c, t_w, beta, f_c, f_w = theta
        p_c = jnp.stack([t_c, beta, 250.0, 4.0, f_c])
        p_w = jnp.stack([t_w, beta, 250.0, 4.0, f_w])
        return (jnp.exp(log_mbb_fnu(p_c, wave, shape))
                + jnp.exp(log_mbb_fnu(p_w, wave, shape)))

    model = SEDModel(
        fnu=two_mbb,
        param_names=("T_cold", "T_warm", "beta", "fnorm_cold",
                     "fnorm_warm"),
        lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
        upper=[25.0, 80.0, 4.0, 1e3, 1e2], name="two-temp")
    true = np.array([20.0, 45.0, 1.8, 30.0, 0.8])
    wave = np.array([60.0, 100.0, 160.0, 250.0, 350.0, 500.0, 850.0,
                     1100.0, 2000.0])
    f = np.asarray(two_mbb(jnp.asarray(true, jnp.float32),
                           jnp.asarray(wave, jnp.float32)), np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(3)
    fit = SEDFitter(model, nwalkers=64, redshift=2.0, seed=11)
    fit.set_data(wave, f + unc * rng.standard_normal(f.size), unc)
    for n, v in zip(model.param_names, true):
        fit.set_param_init(n, v, 0.1 * abs(v))
    fit.set_gaussian_prior("beta", 1.8, 0.5)
    fit.run(nburn=60, nsteps=150)
    res = fit.results()
    for name, v in zip(model.param_names, true):
        c = res.par_cen(name)
        assert abs(c[0] - v) < 6 * max(c[1], c[2]), (name, c, v)
    assert 0.01 < res.posterior_predictive(thin=5).p_value < 0.99
    lir = res.lir_cen()
    assert lir[0] > 0 and np.isfinite(lir).all()
    pk = res.peaklambda_cen()
    # peak between the warm and cold components' own peaks, observed frame
    assert 40.0 < pk[0] < 400.0
    path = str(tmp_path / "twotemp.h5")
    res.writeToHDF5(path)
    r2 = SEDResults(h5file=path, model=model)
    np.testing.assert_allclose(r2.par_cen("T_warm"), res.par_cen("T_warm"))


def test_plot_hooks(wrapped_fit, tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    res = wrapped_fit.results()
    fig = res.plot_sed(savefig=str(tmp_path / "sed.png"))
    assert fig.axes[0].get_xscale() == "log"
    fig2 = res.plot_corner(savefig=str(tmp_path / "corner.png"))
    assert len(fig2.axes) == 9  # 3 free params
    fig3 = res.plot_chain(savefig=str(tmp_path / "chain.png"))
    assert len(fig3.axes) == 3


# -- alternative sampler tiers -------------------------------------------------------------

def _thin_fit(nwalkers=48, seed=9):
    shape = SHAPE_THIN
    flux, unc = _mock_flux(shape)
    fit = SEDFitter(_mbb_wrapped(shape), nwalkers=nwalkers, seed=seed)
    fit.set_data(WAVE, flux, unc)
    fit.fix_param("lambda0", 250.0).fix_param("alpha", 3.5)
    fit.set_param_init("T", 30.0, 3.0)
    fit.set_param_init("fnorm", 40.0, 5.0)
    return fit


def test_run_hmc_matches_stretch():
    fit = _thin_fit()
    fit.run_hmc(nwarmup=150, nsteps=250, nchains=16)
    res_h = fit.results()
    assert 0.5 < np.mean(fit.acceptance_fraction) <= 1.0
    # extend() is stretch-only after an HMC run
    with pytest.raises(RuntimeError, match="finished run"):
        fit.extend(10)
    fit2 = _thin_fit()
    fit2.run(nburn=80, nsteps=250)
    res_s = fit2.results()
    for name in ("T", "beta", "fnorm"):
        c_h, c_s = res_h.par_cen(name), res_s.par_cen(name)
        width = c_s[1] + c_s[2]
        assert abs(c_h[0] - c_s[0]) < 0.75 * width, (name, c_h, c_s)


def test_run_pt_matches_stretch_and_evidence():
    fit = _thin_fit()
    # narrow box: a sane prior volume for the evidence comparison
    fit.set_lowlim("T", 5.0).set_uplim("T", 80.0)
    fit.set_lowlim("beta", 0.2).set_uplim("beta", 4.0)
    fit.set_lowlim("fnorm", 5.0).set_uplim("fnorm", 200.0)
    fit.run_pt(nrungs=8, nburn=120, nsteps=300, nchains=32)
    res_p = fit.results()
    assert np.isfinite(fit.logz_pt[0])
    fit2 = _thin_fit()
    fit2.run(nburn=80, nsteps=250)
    res_s = fit2.results()
    for name in ("T", "beta", "fnorm"):
        c_p, c_s = res_p.par_cen(name), res_s.par_cen(name)
        width = c_s[1] + c_s[2]
        assert abs(c_p[0] - c_s[0]) < 0.75 * width, (name, c_p, c_s)
    # nested evidence agrees with the PT stepping-stone lnZ
    ev = fit.compute_evidence(nlive=200, nbatch=16, nsteps=16,
                              max_iter=1500)
    assert ev.samples.shape[-1] == 5
    tol = 3.0 * np.hypot(ev.logz_err, fit.logz_pt[1]) + 0.5
    assert abs(ev.logz - fit.logz_pt[0]) < tol, (ev.logz, fit.logz_pt)


def test_fit_map_triage():
    fit = _thin_fit()
    r = fit.fit_map()
    assert r.interior
    # MAP lands near the truth within ~4 Laplace sigma
    names = [fit.model.param_names[i] for i in fit.free_space.free_idx]
    true = {"T": 32.0, "beta": 1.9, "fnorm": 45.0}
    for j, name in enumerate(names):
        assert abs(r.x[j] - true[name]) < 4 * max(r.sigma[j], 1e-3), (
            name, r.x[j], r.sigma[j])
    # MAP cache: a second call with identical config reuses the program
    r2 = fit.fit_map()
    np.testing.assert_allclose(r2.x, r.x)


def test_map_importance_and_seeded_run():
    """Single-fit triage-then-refine on the generic surface: importance
    summaries near the MCMC posterior; init='map' runs; stale guard."""
    fit = _thin_fit()
    fit.fit_map()
    x, logw, ess = fit.map_importance(nsamples=1024)
    assert ess > 50
    c_is = fit.map_par_cen("T")
    fit.run(nburn=60, nsteps=200, init="map")
    c_mc = fit.results().par_cen("T")
    assert abs(c_is[0] - c_mc[0]) < 2.0 * (c_mc[1] + c_mc[2])
    # fixed parameters report zero errors
    np.testing.assert_allclose(fit.map_par_cen("lambda0"),
                               [250.0, 0.0, 0.0])
    # staleness guard
    fit.set_gaussian_prior("T", 20.0, 0.5)
    with pytest.raises(RuntimeError, match="different posterior"):
        fit.map_importance(nsamples=16)
    with pytest.raises(RuntimeError, match="different posterior"):
        fit.run(nburn=2, nsteps=2, init="map")


def test_builder_equivalence_random_configs():
    """Property sweep: on RANDOM combinations of fixed params, priors,
    box edits, uplims and covariance, the generic builder equals the MBB
    builder exactly on the wrapped model -- inheriting the MBB builder's
    own fp64-oracle property sweep (test_likelihood_property.py)
    transitively."""
    model = _mbb_wrapped()
    rng = np.random.default_rng(7)
    flux, unc = _mock_flux()
    for trial in range(10):
        spec = LikelihoodSpec.default()
        spec.upper[0] = 100.0
        spec.upper[1] = 5.0
        fixed = rng.random(5) < 0.3
        if fixed.all():
            fixed[rng.integers(5)] = False
        fixed_vals = np.where(
            fixed, [30.0, 2.0, 250.0, 3.5, 40.0], 0.0)
        pm = np.where(rng.random(5) < 0.4,
                      [30.0, 1.9, 250.0, 3.5, 45.0], 0.0)
        pis = np.where(pm > 0, 1.0 / rng.uniform(0.2, 3.0, 5), 0.0)
        uplim = (rng.random(5) < 0.25) if rng.random() < 0.5 else None
        cov = None
        if uplim is None and rng.random() < 0.5:
            cov = np.diag(unc ** 2) + 0.15 * np.outer(unc, unc)
        spec = dataclasses.replace(
            spec, fixed=fixed, fixed_values=fixed_vals,
            prior_mean=pm, prior_isigma=pis, uplim_bands=uplim)
        phot = Photometry(WAVE, flux, unc, cov=cov)
        ln_mbb, fs = build_lnprob(phot, SHAPE5, spec)
        ln_sed, fs2 = build_sed_lnprob(phot, model, spec)
        assert np.array_equal(fs.free_idx, fs2.free_idx)
        thetas = (np.array([32.0, 1.9, 250.0, 3.5, 45.0])[fs.free_idx]
                  [None, :] * rng.uniform(0.85, 1.15, (8, fs.nfree)))
        a = np.asarray(jax.vmap(ln_mbb)(jnp.asarray(thetas, jnp.float32)))
        b = np.asarray(jax.vmap(ln_sed)(jnp.asarray(thetas, jnp.float32)))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5,
                                   err_msg=f"trial {trial}")
