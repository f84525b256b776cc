"""Likelihood plumbing tests: chi^2 values, covariance whitening, box
limits, Gaussian priors, fixed-parameter reduction, FITS covariance IO."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.likelihood import (
    Photometry, LikelihoodSpec, build_lnprob, param_index, LNPROB_FLOOR)
from mbb_emcee_tpu.utils.fits import write_fits_image, read_fits_image

THETA = np.array([35.0, 1.8, 350.0, 3.0, 40.0])
WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])


def _mock_phot(theta=THETA, unc_frac=0.08, seed=0, cov=None):
    shape = MBBShape()
    f_true = np.asarray(mbb_fnu(jnp.array(theta, jnp.float32),
                                jnp.array(WAVE, jnp.float32), shape),
                        np.float64)
    unc = unc_frac * f_true
    rng = np.random.default_rng(seed)
    flux = f_true + unc * rng.standard_normal(WAVE.size)
    return Photometry(WAVE, flux, unc, cov=cov), f_true


def test_param_index():
    assert param_index("T") == 0
    assert param_index("BETA") == 1
    assert param_index("lambda0") == 2
    assert param_index(4) == 4
    with pytest.raises(ValueError):
        param_index("nope")


def test_chi2_diagonal():
    phot, f_true = _mock_phot()
    spec = LikelihoodSpec.default()
    lnprob, fs = build_lnprob(phot, MBBShape(), spec)
    got = float(lnprob(jnp.asarray(THETA, jnp.float32)))
    model = f_true  # evaluate at the true theta -> model == f_true
    want = -0.5 * np.sum(((model - phot.flux) / phot.unc) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_chi2_full_covariance():
    base_phot, f_true = _mock_phot()
    # Calibration-floor style covariance: correlated 5% + diagonal.
    calib = 0.05 * f_true
    cov = np.outer(calib, calib) + np.diag(base_phot.unc ** 2)
    phot = Photometry(WAVE, base_phot.flux, base_phot.unc, cov=cov)
    lnprob, _ = build_lnprob(phot, MBBShape(), LikelihoodSpec.default())
    got = float(lnprob(jnp.asarray(THETA, jnp.float32)))
    delta = f_true - phot.flux
    want = -0.5 * delta @ np.linalg.solve(cov, delta)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_box_limits():
    phot, _ = _mock_phot()
    spec = LikelihoodSpec.default()
    spec.lower[0] = 20.0
    spec.upper[0] = 50.0
    lnprob, _ = build_lnprob(phot, MBBShape(), spec)
    ok = float(lnprob(jnp.asarray(THETA, jnp.float32)))
    bad = THETA.copy()
    bad[0] = 55.0
    assert ok > 0.5 * LNPROB_FLOOR
    assert float(lnprob(jnp.asarray(bad, jnp.float32))) <= LNPROB_FLOOR / 2
    # out-of-box must still be finite (no inf - inf in the sampler)
    assert np.isfinite(float(lnprob(jnp.asarray(bad, jnp.float32))))


def test_gaussian_prior_shifts_lnprob():
    phot, _ = _mock_phot()
    spec = LikelihoodSpec.default()
    lnp0, _ = build_lnprob(phot, MBBShape(), spec)
    spec2 = LikelihoodSpec.default()
    spec2.prior_mean[1] = 2.0
    spec2.prior_isigma[1] = 1.0 / 0.1
    lnp1, _ = build_lnprob(phot, MBBShape(), spec2)
    t = jnp.asarray(THETA, jnp.float32)  # beta = 1.8, prior at 2.0 +- 0.1
    diff = float(lnp1(t)) - float(lnp0(t))
    np.testing.assert_allclose(diff, -0.5 * ((1.8 - 2.0) / 0.1) ** 2,
                               rtol=1e-4)


def test_fixed_params_reduce_space():
    phot, _ = _mock_phot()
    spec = LikelihoodSpec.default()
    spec.fixed[2] = True          # lambda0
    spec.fixed_values[2] = 350.0
    spec.fixed[3] = True          # alpha
    spec.fixed_values[3] = 3.0
    lnprob, fs = build_lnprob(phot, MBBShape(), spec)
    assert fs.nfree == 3
    free = jnp.asarray(THETA[[0, 1, 4]], jnp.float32)
    got = float(lnprob(free))
    # Must equal the full-space lnprob at the same full theta.
    lnp_full, _ = build_lnprob(phot, MBBShape(), LikelihoodSpec.default())
    want = float(lnp_full(jnp.asarray(THETA, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # expand round-trips
    full = fs.expand(np.asarray(free))
    np.testing.assert_allclose(full, THETA)


def test_phot_upper_limits_one_sided():
    phot, f_true = _mock_phot()
    # Pretend the bluest band is an upper limit set ABOVE the model.
    flux = phot.flux.copy()
    flux[0] = f_true[0] * 2.0
    phot2 = Photometry(WAVE, flux, phot.unc)
    spec = LikelihoodSpec.default()
    ul = np.zeros(WAVE.size, bool)
    ul[0] = True
    import dataclasses
    spec = dataclasses.replace(spec, uplim_bands=ul)
    lnp, _ = build_lnprob(phot2, MBBShape(), spec)
    got = float(lnp(jnp.asarray(THETA, jnp.float32)))
    # Model below the limit: band 0 contributes nothing.
    resid = (f_true[1:] - flux[1:]) / phot.unc[1:]
    np.testing.assert_allclose(got, -0.5 * np.sum(resid ** 2), rtol=1e-3)


def test_fits_covariance_roundtrip(tmp_path):
    cov = np.array([[4.0, 1.0], [1.0, 9.0]])
    path = str(tmp_path / "cov.fits")
    write_fits_image(path, cov)
    got = read_fits_image(path, extn=0)
    np.testing.assert_array_equal(got, cov)
    phot = Photometry([250.0, 350.0], [10.0, 12.0], [1.0, 2.0])
    phot.read_cov(path, covextn=0, is_total=True)
    np.testing.assert_array_equal(phot.cov, cov)
    phot2 = Photometry([250.0, 350.0], [10.0, 12.0], [1.0, 2.0])
    phot2.read_cov(path, covextn=0)  # additive calibration convention
    np.testing.assert_array_equal(phot2.cov, cov + np.diag([1.0, 4.0]))


def test_read_cov_validates_at_read_time(tmp_path):
    """A wrong covextn / broken matrix must fail HERE with a pointed
    message, not as an opaque cholesky shape error inside build_lnprob."""
    phot = Photometry([250.0, 350.0], [10.0, 12.0], [1.0, 2.0])
    # wrong shape (3x3 cov against 2-band photometry)
    bad_shape = str(tmp_path / "c3.fits")
    write_fits_image(bad_shape, np.eye(3))
    with pytest.raises(ValueError, match="does not match the 2-band"):
        phot.read_cov(bad_shape)
    # asymmetric
    asym = str(tmp_path / "asym.fits")
    write_fits_image(asym, np.array([[4.0, 1.0], [2.0, 9.0]]))
    with pytest.raises(ValueError, match="not symmetric"):
        phot.read_cov(asym)
    # symmetric but not PSD even after diag(unc^2)
    npsd = str(tmp_path / "npsd.fits")
    write_fits_image(npsd, np.array([[1.0, 9.0], [9.0, 1.0]]))
    with pytest.raises(ValueError, match="not positive definite"):
        phot.read_cov(npsd, is_total=True)
    # a valid matrix still attaches
    ok = str(tmp_path / "ok.fits")
    write_fits_image(ok, np.array([[4.0, 1.0], [1.0, 9.0]]))
    assert phot.read_cov(ok).cov is not None


def test_photfile_parsing(tmp_path):
    p = tmp_path / "phot.txt"
    p.write_text("# comment\n250.0 10.0 1.0\n350.0  8.0 0.9  # SPIRE\n")
    ph = Photometry.from_file(str(p))
    assert ph.nbands == 2 and ph.band_names is None
    p2 = tmp_path / "phot_named.txt"
    p2.write_text("PACS100 100.0 5.0 0.5\nSPIRE250 250.0 10.0 1.0\n")
    ph2 = Photometry.from_file(str(p2))
    assert ph2.band_names == ["PACS100", "SPIRE250"]
    p3 = tmp_path / "phot3.txt"
    p3.write_text("# only comments\n")
    with pytest.raises(ValueError):
        Photometry.from_file(str(p3))

def test_fixed_param_outside_box_evaluates_true_value():
    """Regression (review): fix_param to a value OUTSIDE the sampling box
    (alpha=0.0 below the default box lower of 0.01; T=0.05 below 0.1)
    must evaluate the model AT the fixed value in the XLA backends --
    not silently clamp to the box edge -- matching the Pallas kernels'
    widened-window behavior."""
    from mbb_emcee_tpu.likelihood import build_lnprob_data, signed_iunc

    phot, _ = _mock_phot()
    spec = LikelihoodSpec.default()
    spec.fixed[3] = True
    spec.fixed_values[3] = 0.0            # < box lower 0.01
    lnprob, fs = build_lnprob(phot, MBBShape(), spec)
    theta_free = np.array(THETA[fs.free_idx], np.float32)
    got = float(lnprob(jnp.asarray(theta_free)))

    # oracle: same posterior with a box that CONTAINS alpha=0 (no clamp)
    spec2 = LikelihoodSpec.default()
    spec2.lower[3] = -1.0
    spec2.fixed[3] = True
    spec2.fixed_values[3] = 0.0
    lnprob2, fs2 = build_lnprob(phot, MBBShape(), spec2)
    want = float(lnprob2(jnp.asarray(theta_free)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # the clamped evaluation (alpha=0.01) is genuinely different
    theta_clamped = THETA.copy(); theta_clamped[3] = 0.01
    m0 = np.asarray(mbb_fnu(jnp.asarray(theta_clamped, jnp.float32),
                            jnp.asarray(WAVE, jnp.float32), MBBShape()))
    theta0 = THETA.copy(); theta0[3] = 0.0
    m1 = np.asarray(mbb_fnu(jnp.asarray(theta0, jnp.float32),
                            jnp.asarray(WAVE, jnp.float32), MBBShape()))
    assert not np.allclose(m0, m1)

    # same contract on the batched builder
    lnp_d, fsd = build_lnprob_data(MBBShape(), spec)
    got_d = float(lnp_d(jnp.asarray(theta_free),
                        jnp.asarray(WAVE, jnp.float32),
                        jnp.asarray(phot.flux, jnp.float32),
                        jnp.asarray(signed_iunc(phot.unc), jnp.float32)))
    np.testing.assert_allclose(got_d, want, rtol=1e-6)


def test_signed_iunc_rejects_zero_unc():
    """Regression (review): a 0.0 'missing band' sentinel must raise, not
    map to 1/0 = inf and silently freeze the source's chain."""
    from mbb_emcee_tpu.likelihood import signed_iunc

    unc = np.array([[1.0, 0.0, 2.0]])
    with pytest.raises(ValueError, match="positive"):
        signed_iunc(unc)
    # NaN/inf still mean missing -> exactly zero weight
    out = signed_iunc(np.array([[1.0, np.nan, np.inf]]))
    np.testing.assert_array_equal(out, [[1.0, 0.0, 0.0]])
