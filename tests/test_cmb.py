"""CMB heating/background corrections (models/cmb.py): physics
invariants of the da Cunha+2013 equations, the plain-MBB limit, and an
end-to-end generic-tier fit at high z where the correction matters."""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.models.cmb import (
    T_CMB0, cmb_temperature, dust_temperature_with_cmb,
    log_cmb_visibility, cmb_corrected_mbb)
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape


def test_dust_temperature_invariants():
    f64 = np.float64
    # z = 0: exactly the intrinsic temperature.
    np.testing.assert_allclose(
        float(dust_temperature_with_cmb(f64(25.0), f64(2.0), 0.0)),
        25.0, rtol=1e-6)
    # Cold dust at high z: approaches the CMB floor from above.
    for z in (2.0, 5.0, 8.0):
        t_floor = cmb_temperature(z)
        t_d = float(dust_temperature_with_cmb(f64(1e-3), f64(2.0), z))
        np.testing.assert_allclose(t_d, t_floor, rtol=1e-3)  # fp32
        # Monotone in both arguments; always above intrinsic AND floor.
        t_warm = float(dust_temperature_with_cmb(f64(30.0), f64(2.0), z))
        assert t_warm > 30.0 and t_warm > t_floor * 0.0 + 30.0
        assert float(dust_temperature_with_cmb(f64(30.0), f64(2.0),
                                               z + 1.0)) > t_warm
    # Against the direct (non-log) formula in fp64.
    t, beta, z = 18.0, 1.8, 4.0
    p = 4.0 + beta
    direct = (t ** p + T_CMB0 ** p * ((1 + z) ** p - 1.0)) ** (1.0 / p)
    np.testing.assert_allclose(
        float(dust_temperature_with_cmb(f64(t), f64(beta), z)), direct,
        rtol=1e-6)
    # fp32-safety: warm dust at high beta (direct T^p overflows fp32).
    v = float(dust_temperature_with_cmb(jnp.float32(500.0),
                                        jnp.float32(10.0), 2.0))
    assert np.isfinite(v) and v >= 500.0


def test_cmb_visibility_limits():
    # Wien side / warm dust: fully visible (ln f -> 0).
    lv = float(log_cmb_visibility(jnp.asarray(100.0), 35.0, 1.0))
    assert -1e-4 < lv <= 0.0
    # T_dust -> T_CMB(z): the source vanishes (ln f << 0) but stays
    # finite (the clip guards the exact corner).
    t_floor = cmb_temperature(4.0)
    lv2 = float(log_cmb_visibility(jnp.asarray(2000.0),
                                   t_floor * 1.0001, 4.0))
    assert lv2 < -4.0 and np.isfinite(lv2)
    # Monotone: longer rest wavelength = less visible for cold dust.
    cold = 1.3 * t_floor
    a = float(log_cmb_visibility(jnp.asarray(500.0), cold, 4.0))
    b = float(log_cmb_visibility(jnp.asarray(3000.0), cold, 4.0))
    assert b < a < 0.0


def test_matches_plain_mbb_for_warm_dust():
    """Warm dust at moderate z: corrections are negligible and the model
    must reduce to the plain rest-frame MBB (same normalization
    convention), within fp32 tolerance."""
    z = 1.0
    model = cmb_corrected_mbb(z, wavenorm=500.0)
    theta = jnp.asarray([35.0, 2.0, 120.0, 3.0, 40.0], jnp.float32)
    w_obs = jnp.asarray([100.0, 250.0, 500.0, 850.0], jnp.float32)
    got = np.asarray(model.fnu(theta, w_obs), np.float64)
    # Plain MBB in the rest frame with the same self-normalization,
    # times the analytic visibility factor (a real ~0.3% background
    # term survives at rest 425 um even for 35 K dust at z=1) --
    # the heating term IS negligible for warm dust (t_d - 35 < 1e-4 K).
    shape = MBBShape(wavenorm=500.0 / (1 + z))
    w_rest = w_obs / (1 + z)
    vis = np.exp(np.asarray(log_cmb_visibility(w_rest, 35.0, z)))
    vis_norm = float(np.exp(np.asarray(
        log_cmb_visibility(jnp.asarray(500.0 / (1 + z)), 35.0, z))))
    plain = np.asarray(mbb_fnu(theta, w_rest, shape), np.float64)
    np.testing.assert_allclose(got, plain * vis / vis_norm, rtol=1e-3)
    # Exact normalization: S(wavenorm_obs) = fnorm.
    np.testing.assert_allclose(got[2], 40.0, rtol=1e-5)


def test_cold_high_z_flux_suppressed():
    """Cold dust at z = 5: the observed long-wavelength flux is a real
    fraction of the uncorrected prediction, and colder intrinsic dust
    is MORE suppressed (relative to its own uncorrected spectrum)."""
    z = 5.0

    def suppression(t_int):
        theta = jnp.asarray([t_int, 2.0, 100.0, 3.0, 1.0], jnp.float32)
        w = jnp.asarray([3000.0 * (1 + z)], jnp.float32)  # rest 3 mm
        model = cmb_corrected_mbb(z)
        got = float(model.fnu(theta, w)[0])
        # Uncorrected: plain MBB at the CORRECTED temperature, same
        # normalization point WITHOUT the visibility factor -- isolates
        # the background term from the heating term.
        t_d = float(dust_temperature_with_cmb(theta[0], theta[1], z))
        th = jnp.asarray([t_d, 2.0, 100.0, 3.0, 1.0], jnp.float32)
        shape = MBBShape(wavenorm=500.0 / (1 + z))
        plain = float(mbb_fnu(th, w / (1 + z), shape)[0])
        # got includes visibility at both the band and the norm point;
        # the band (rest 3 mm) is where it bites.
        return got / plain

    s_cold = suppression(20.0)
    s_warm = suppression(60.0)
    assert 0.0 < s_cold < s_warm <= 1.05


def test_end_to_end_recovery_at_high_z():
    """Generate from the CMB-corrected model at z=4 (cold dust, where
    the correction is tens of percent at long wavelengths) and recover
    the intrinsic temperature through the generic tier."""
    from mbb_emcee_tpu.sed import SEDFitter
    z = 4.0
    model = cmb_corrected_mbb(z, opthin=True, noalpha=True)
    true = jnp.asarray([22.0, 1.8, 100.0, 3.0, 8.0], jnp.float32)
    w_obs = np.array([450.0, 850.0, 1300.0, 2000.0, 3000.0])
    f = np.asarray(model.fnu(true, jnp.asarray(w_obs, jnp.float32)),
                   np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(12)
    flux = f + unc * rng.standard_normal(f.size)

    fit = SEDFitter(model, nwalkers=48, seed=6)
    fit.set_data(w_obs, flux, unc)
    fit.fix_param("lambda0", 100.0)
    fit.fix_param("alpha", 3.0)
    fit.set_uplim("T", 60.0)
    fit.set_uplim("beta", 4.0)
    for nm, v in (("T", 22.0), ("beta", 1.8), ("fnorm", 8.0)):
        fit.set_param_init(nm, v, 0.1 * v)
    fit.run(nburn=60, nsteps=150)
    res = fit.results()
    t_med, t_plus, t_minus = res.par_cen("T")
    assert abs(t_med - 22.0) < 4.0 * max(t_plus, t_minus)
    f_med = res.par_cen("fnorm")[0]
    assert abs(f_med - 8.0) < 3.0


def test_factory_validation():
    with pytest.raises(ValueError):
        cmb_corrected_mbb(-0.5)
    m = cmb_corrected_mbb(2.0, name="custom")
    assert m.name == "custom"
    assert cmb_corrected_mbb(2.0).name == "cmb-mbb-z2"
    m.validate(wave=np.array([250.0, 500.0]))
