"""Fisher forecasts (forecast.py): exactness on a linear model,
agreement with real MCMC widths, the photo-z degeneracy guard, and the
correlated/response/prior plumbing."""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.forecast import forecast, forecast_mbb
from mbb_emcee_tpu.sed import SEDModel

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])


def test_linear_model_is_exact():
    """For m(theta) = A theta the Fisher covariance IS the exact
    least-squares covariance (A^T C^-1 A)^-1 -- no Gaussian
    approximation involved, so equality is to machine precision."""
    rng = np.random.default_rng(0)
    A = rng.uniform(0.5, 2.0, (WAVE.size, 2))
    a_j = jnp.asarray(A, jnp.float32)

    model = SEDModel(fnu=lambda th, w: a_j @ th,
                     param_names=("a", "b"),
                     lower=[0.0, 0.0], upper=[10.0, 10.0],
                     name="linear")
    unc = rng.uniform(0.5, 1.5, WAVE.size)
    fr = forecast(model, [2.0, 3.0], WAVE, unc=unc)
    want = np.linalg.inv(A.T @ np.diag(1.0 / unc ** 2) @ A)
    np.testing.assert_allclose(fr.cov, want, rtol=1e-4)
    # full-covariance path with diag(unc^2) gives the same answer
    fr2 = forecast(model, [2.0, 3.0], WAVE, cov=np.diag(unc ** 2))
    np.testing.assert_allclose(fr2.cov, want, rtol=1e-4)
    # a prior adds precision on the diagonal
    fr3 = forecast(model, [2.0, 3.0], WAVE, unc=unc,
                   priors={"a": (2.0, 0.1)})
    want3 = np.linalg.inv(np.linalg.inv(want)
                          + np.diag([1.0 / 0.1 ** 2, 0.0]))
    np.testing.assert_allclose(fr3.cov, want3, rtol=1e-4)
    assert fr3.sigma("a") < fr.sigma("a")


def test_matches_mcmc_widths_mbb():
    """On a well-measured SED the posterior is near-Gaussian and the
    Fisher forecast must predict the real MCMC widths."""
    from mbb_emcee_tpu import MBBFitter, MBBResults
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    truth = np.array([30.0, 1.8, 250.0, 4.0, 40.0])
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(truth, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    fr = forecast_mbb(truth, WAVE, unc=unc, opthin=True, noalpha=True)
    assert set(n.lower() for n in fr.param_names) == \
        {"t", "beta", "fnorm"}

    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)
    fit.set_data(WAVE, f, unc)      # noiseless: posterior centered at truth
    fit.run(nburn=150, nsteps=800)
    res = MBBResults(fit=fit)
    for p in ("T", "beta", "fnorm"):
        cen = res.par_cen(p)
        width = 0.5 * (cen[1] + cen[2])
        assert abs(fr.sigma(p) - width) < 0.2 * width, \
            (p, fr.sigma(p), width)


def test_photoz_degeneracy_guard_and_prior():
    """Without CMB terms the (T, z) degeneracy is EXACT: the Fisher
    matrix is singular and the forecast must SAY so; the T prior is
    what makes sigma(z) finite -- and the forecast quantifies it."""
    from mbb_emcee_tpu.photoz import photoz_mbb

    truth = np.array([38.0, 1.9, 250.0, 4.0, 10.0, 4.0])
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0, 2000.0])
    m = photoz_mbb(cmb=False, opthin=True, noalpha=True, z_upper=8.0)
    unc = 0.07 * np.asarray(m.fnu(jnp.asarray(truth, jnp.float32),
                                  jnp.asarray(wave, jnp.float32)),
                            np.float64)
    with pytest.raises(ValueError, match="singular|degeneracy"):
        forecast(m, truth, wave, unc=unc,
                 fixed=("beta", "lambda0", "alpha"))
    fr = forecast(m, truth, wave, unc=unc,
                  fixed=("beta", "lambda0", "alpha"),
                  priors={"T": (38.0, 6.0)})
    sz = fr.sigma("z")
    assert np.isfinite(sz) and 0.2 < sz < 3.0
    # tightening the T prior tightens sigma(z): the submm photo-z story
    fr2 = forecast(m, truth, wave, unc=unc,
                   fixed=("beta", "lambda0", "alpha"),
                   priors={"T": (38.0, 2.0)})
    assert fr2.sigma("z") < 0.6 * sz


def test_photoz_forecast_matches_grid_width():
    """The CMB photo-z forecast with the T prior should land near the
    exact-grid marginal width of test_pz_matches_exact_grid_posterior's
    configuration (same fiducial, same bands, same prior)."""
    from mbb_emcee_tpu.photoz import photoz_mbb

    truth = np.array([38.0, 1.9, 250.0, 4.0, 10.0, 4.0])
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0, 2000.0])
    m = photoz_mbb(cmb=True, opthin=True, noalpha=True, z_upper=8.0)
    unc = 0.07 * np.asarray(m.fnu(jnp.asarray(truth, jnp.float32),
                                  jnp.asarray(wave, jnp.float32)),
                            np.float64)
    fr = forecast(m, truth, wave, unc=unc,
                  fixed=("beta", "lambda0", "alpha"),
                  priors={"T": (38.0, 6.0)})
    # grid/MCMC 68% half-width at this configuration is ~0.78 (see
    # test_photoz.py); Fisher is the Gaussian floor, so allow a band
    assert 0.4 < fr.sigma("z") < 1.2, fr.sigma("z")


def test_response_mode_and_snr():
    from mbb_emcee_tpu import ResponseSet
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    rs = ResponseSet()
    names = []
    for w in WAVE:
        nm = f"B{int(w)}"
        rs.add(nm, f"gauss:{w:g}:{0.3 * w:g}")
        names.append(nm)
    truth = np.array([30.0, 1.8, 250.0, 4.0, 40.0])
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(truth, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f

    from mbb_emcee_tpu.sed import SEDModel
    from mbb_emcee_tpu.models.modified_blackbody import log_mbb_fnu

    model = SEDModel(
        fnu=lambda th, w: jnp.exp(log_mbb_fnu(th, w, shape)),
        param_names=("T", "beta", "lambda0", "alpha", "fnorm"),
        lower=[0.1, 0.01, 1.0, 0.01, 1e-5],
        upper=[1e3, 20.0, 2e4, 60.0, 1e7], name="mbb-resp")
    fr_pt = forecast(model, truth, WAVE, unc=unc,
                     fixed=("lambda0", "alpha"))
    fr_rs = forecast(model, truth, WAVE, unc=unc,
                     responses=rs.pack(names),
                     fixed=("lambda0", "alpha"))
    # band integration shifts the information slightly, not wildly
    for p in ("T", "beta", "fnorm"):
        assert 0.5 < fr_rs.sigma(p) / fr_pt.sigma(p) < 2.0
    assert fr_pt.snr.shape == WAVE.shape and (fr_pt.snr > 10).all()


def test_validation_errors():
    model = SEDModel(fnu=lambda th, w: th[0] * w,
                     param_names=("a",), lower=[0.0], upper=[10.0])
    with pytest.raises(ValueError, match="positive"):
        forecast(model, [1.0], WAVE, unc=np.zeros(WAVE.size))
    with pytest.raises(ValueError, match="nothing to forecast"):
        forecast(model, [1.0], WAVE, unc=np.ones(WAVE.size),
                 fixed=("a",))
    with pytest.raises(ValueError, match="not a free"):
        forecast(model, [1.0], WAVE, unc=np.ones(WAVE.size),
                 priors={"nope": (0.0, 1.0)})
    with pytest.raises(ValueError, match="cov must be"):
        forecast(model, [1.0], WAVE, cov=np.eye(2))
    # Regression (review): unc= AND cov= together is an ambiguous noise
    # model (a depth scan with a stale cov kwarg would silently use the
    # wrong one) -- refuse, like modelcheck's pointwise constants do.
    with pytest.raises(ValueError, match="not both"):
        forecast(model, [1.0], WAVE, unc=np.ones(WAVE.size),
                 cov=np.eye(WAVE.size))


def test_scale_disparity_is_not_degeneracy():
    """cond() runs on the correlation-normalized Fisher: two independent
    parameters whose derivative scales differ by 1e8 are perfectly
    well-posed and must NOT trip the singularity guard."""
    A = np.array([[1e4, 0.0], [0.0, 1e-4]])
    a_j = jnp.asarray(A, jnp.float32)
    model = SEDModel(fnu=lambda th, w: a_j @ th,
                     param_names=("big", "small"),
                     lower=[0.0, 0.0], upper=[10.0, 10.0], name="scales")
    fr = forecast(model, [1.0, 1.0], WAVE[:2], unc=np.ones(2))
    np.testing.assert_allclose(fr.sigma("big"), 1e-4, rtol=1e-3)
    np.testing.assert_allclose(fr.sigma("small"), 1e4, rtol=1e-3)


def test_snr_and_errors_under_cov():
    """Per-band S/N is m_b / sqrt(C_bb) (NOT the order-dependent
    whitened components); bad cov inputs raise ValueErrors."""
    rng = np.random.default_rng(3)
    A = rng.uniform(0.5, 2.0, (2, 2))
    a_j = jnp.asarray(A, jnp.float32)
    model = SEDModel(fnu=lambda th, w: a_j @ th, param_names=("a", "b"),
                     lower=[0.0, 0.0], upper=[10.0, 10.0], name="c2")
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    fr = forecast(model, [2.0, 1.0], WAVE[:2], cov=cov)
    m = A @ np.array([2.0, 1.0])
    np.testing.assert_allclose(fr.snr, m / np.sqrt(np.diag(cov)),
                               rtol=1e-5)
    with pytest.raises(ValueError, match="positive-definite"):
        forecast(model, [2.0, 1.0], WAVE[:2],
                 cov=np.array([[1.0, 2.0], [2.0, 1.0]]))
    with pytest.raises(ValueError, match="unc= .*or cov="):
        forecast(model, [2.0, 1.0], WAVE[:2])


def test_response_pack_size_mismatch():
    from mbb_emcee_tpu import ResponseSet
    rs = ResponseSet()
    for w in WAVE[:3]:
        rs.add(f"B{int(w)}", f"gauss:{w:g}:{0.3 * w:g}")
    model = SEDModel(fnu=lambda th, w: th[0] * w, param_names=("a",),
                     lower=[0.0], upper=[10.0])
    with pytest.raises(ValueError, match="3 bands but wave/unc"):
        forecast(model, [1.0], WAVE, unc=np.ones(WAVE.size),
                 responses=rs.pack([f"B{int(w)}" for w in WAVE[:3]]))


def test_forecast_mbb_fixed_by_index():
    truth = np.array([30.0, 1.8, 250.0, 4.0, 40.0])
    unc = np.full(WAVE.size, 1.0)
    by_name = forecast_mbb(truth, WAVE, unc=unc, opthin=True,
                           noalpha=True, fixed=("beta",))
    by_idx = forecast_mbb(truth, WAVE, unc=unc, opthin=True,
                          noalpha=True, fixed=(1,))
    assert by_name.param_names == by_idx.param_names
    np.testing.assert_allclose(by_name.cov, by_idx.cov, rtol=1e-12)
