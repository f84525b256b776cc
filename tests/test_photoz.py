"""Photo-z tier tests: model identities, batched D_L, joint-z recovery,
and z-marginalized derived quantities (photoz.py; ADDITIVE capability,
absent upstream -- SURVEY.md C4/C6 fix the reference's z at fit time).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.photoz import (
    photoz_mbb, PhotoZMBBModel, compute_dustmass, dustmass_cen)
from mbb_emcee_tpu.models.cmb import cmb_corrected_mbb
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.models.cosmology import (
    luminosity_distance, luminosity_distance_batch, Cosmology)
from mbb_emcee_tpu import derived
from mbb_emcee_tpu.sed import SEDFitter, SEDResults

WAVE = np.array([250.0, 350.0, 500.0, 850.0, 1100.0, 2000.0])
TRUTH6 = np.array([38.0, 1.9, 80.0, 3.0, 10.0, 4.0])


def _j(x):
    return jnp.asarray(np.asarray(x), jnp.float32)


def test_matches_fixed_z_cmb_factory():
    """photoz_mbb(cmb=True) at theta=(...,z) IS cmb_corrected_mbb(z) --
    the fixed-z factory is the z-slice of the photo-z model."""
    z = 3.0
    m_pz = photoz_mbb(cmb=True)
    m_fx = cmb_corrected_mbb(z=z)
    th5 = _j([35.0, 1.9, 80.0, 3.0, 12.0])
    th6 = _j([35.0, 1.9, 80.0, 3.0, 12.0, z])
    a = np.asarray(m_pz.fnu(th6, _j(WAVE)))
    b = np.asarray(m_fx.fnu(th5, _j(WAVE)))
    np.testing.assert_allclose(a, b, rtol=3e-6)


def test_degeneracy_identity_no_cmb():
    """Without CMB corrections the rest-frame photo-z model equals the
    core observer-frame MBB under (T, lambda0, z) -> (T/(1+z),
    lambda0*(1+z)) EXACTLY -- the scaling degeneracy the module
    docstring warns about, asserted as a cross-surface identity."""
    for z in (0.0, 1.5, 4.0, 8.0):
        opz = 1.0 + z
        m = photoz_mbb(cmb=False)
        th6 = _j([35.0, 1.9, 80.0, 3.0, 12.0, z])
        th_obs = _j([35.0 / opz, 1.9, 80.0 * opz, 3.0, 12.0])
        a = np.asarray(m.fnu(th6, _j(WAVE)))
        b = np.asarray(mbb_fnu(th_obs, _j(WAVE), MBBShape()))
        np.testing.assert_allclose(a, b, rtol=3e-6)


def test_opthin_noalpha_variants_finite():
    for opthin in (False, True):
        for noalpha in (False, True):
            m = photoz_mbb(opthin=opthin, noalpha=noalpha)
            m.validate(WAVE)


def test_zbounds_validation():
    with pytest.raises(ValueError):
        photoz_mbb(z_lower=5.0, z_upper=2.0)
    with pytest.raises(ValueError):
        photoz_mbb(z_lower=-1.0)
    m = photoz_mbb(z_lower=1.0, z_upper=6.0)
    assert m.lower[5] == 1.0 and m.upper[5] == 6.0


def test_luminosity_distance_batch_matches_scalar():
    zs = np.array([0.0, 0.25, 1.0, 4.0, 11.5])
    for cosmo in (None, "Planck18", Cosmology(H0=70.0, Om0=0.3, Ol0=0.6)):
        batch = luminosity_distance_batch(zs, cosmo)
        scal = np.array([
            (Cosmology() if cosmo is None else
             (Cosmology.named(cosmo) if isinstance(cosmo, str) else cosmo)
             ).luminosity_distance(zz) for zz in zs])
        np.testing.assert_allclose(batch, scal, rtol=1e-12, atol=1e-9)
    assert luminosity_distance_batch(np.array([0.0]))[0] == 0.0


def _tiny_fit(model, truth, seed=3, prior_t=(38.0, 6.0), nwalkers=64,
              nburn=120, nsteps=300, unc_frac=0.07):
    f = np.asarray(model.fnu(_j(truth), _j(WAVE)), np.float64)
    unc = unc_frac * f
    rng = np.random.default_rng(seed)
    flux = f + unc * rng.standard_normal(WAVE.size)
    fit = SEDFitter(model, nwalkers=nwalkers, seed=11)
    fit.set_data(WAVE, flux, unc)
    if prior_t is not None:
        fit.set_gaussian_prior("T", *prior_t)
    fit.fix_param("alpha", truth[3])
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.1 * abs(v) if v else 0.1)
    fit.run(nburn=nburn, nsteps=nsteps)
    return fit


def test_joint_z_recovery_with_t_prior():
    """The canonical submm photo-z workflow: sample z jointly under a
    Gaussian T prior; truth must sit inside the (wide, honest) z
    posterior, and the T-z degeneracy must show as a positive posterior
    correlation."""
    model = photoz_mbb(cmb=True, z_upper=8.0)
    fit = _tiny_fit(model, TRUTH6)
    res = fit.results()
    zc = res.par_cen("z")
    sigma = 0.5 * (zc[1] + zc[2])
    assert abs(zc[0] - TRUTH6[5]) < 3.0 * sigma
    assert 0.3 < sigma < 3.0  # wide but informative
    flat = res.flatchain
    it, iz = model.param_index("T"), model.param_index("z")
    r = np.corrcoef(flat[:, it], flat[:, iz])[0, 1]
    assert r > 0.3, f"expected the T-z degeneracy ridge, corr={r:.2f}"
    # derived quantities marginalized over z are finite and stored
    lir = res.compute_lir(z_param="z", thin=4)
    assert np.isfinite(lir).all() and lir.min() > 0
    dm = compute_dustmass(res, thin=4)
    assert np.isfinite(dm).all() and dm.min() > 0
    med = dustmass_cen(res)
    assert med[0] > 0 and np.isfinite(med).all()


def test_lir_zparam_reduces_to_fixed_z():
    """With z FIXED in the sampler, compute_lir(z_param='z') must equal
    the scalar-redshift path on the same chain (same nodes, same D_L) --
    the marginalized estimator reduces to the reference formula when
    there is nothing to marginalize."""
    z0 = 3.0
    model = photoz_mbb(cmb=True, z_upper=8.0)
    truth = TRUTH6.copy()
    truth[5] = z0
    f = np.asarray(model.fnu(_j(truth), _j(WAVE)), np.float64)
    unc = 0.07 * f
    fit = SEDFitter(model, nwalkers=32, seed=5)
    fit.set_data(WAVE, f + 0.5 * unc, unc)
    fit.fix_param("z", z0)
    fit.fix_param("alpha", truth[3])
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.05 * abs(v) if v else 0.05)
    fit.run(nburn=30, nsteps=60)
    res = fit.results()
    lir_margin = res.compute_lir(z_param="z", thin=2).copy()
    assert res.lir_meta["z_param"] == "z"
    res.redshift = z0
    lir_fixed = res.compute_lir(thin=2)
    np.testing.assert_allclose(lir_margin, lir_fixed, rtol=2e-4)


def test_dustmass_no_cmb_matches_core_formula():
    """Under the degeneracy map the no-CMB photo-z dust mass must equal
    the CORE surface's formula (derived.dustmass_integrand/prefactor on
    observer-frame theta) sample by sample."""
    z0 = 2.5
    opz = 1.0 + z0
    model = photoz_mbb(cmb=False, z_upper=8.0)
    truth = np.array([30.0, 1.8, 60.0, 3.2, 15.0, z0])
    f = np.asarray(model.fnu(_j(truth), _j(WAVE)), np.float64)
    unc = 0.07 * f
    fit = SEDFitter(model, nwalkers=32, seed=6)
    fit.set_data(WAVE, f + 0.3 * unc, unc)
    fit.fix_param("z", z0)
    fit.fix_param("alpha", truth[3])
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.05 * abs(v) if v else 0.05)
    fit.run(nburn=30, nsteps=60)
    res = fit.results()
    dm = compute_dustmass(res, thin=2)

    # Core-surface oracle on the mapped observer-frame chain.
    samples = res._thinned(2)
    th_obs = samples[:, :5].copy()
    th_obs[:, 0] /= opz          # T -> T/(1+z)
    th_obs[:, 2] *= opz          # lambda0 -> lambda0*(1+z)
    shape = MBBShape()
    one = derived.dustmass_integrand(shape)
    lam_obs = jnp.asarray(125.0 * opz, jnp.float32)
    g = np.asarray(jax.vmap(lambda t: one(t, lam_obs))(
        jnp.asarray(th_obs, jnp.float32)), np.float64)
    dl = luminosity_distance(z0)
    oracle = derived.dustmass_prefactor(dl, opz, 2.64, 125.0) * g
    np.testing.assert_allclose(dm, oracle, rtol=5e-4)


def test_dustmass_cmb_oracle_and_contrast_inequality():
    """The CMB-aware mass inversion: (a) equals an independent fp64
    NumPy oracle (da Cunha+13 eq. 12 temperature + contrast Planck
    factor) sample by sample; (b) always EXCEEDS the inversion that
    uses the emission temperature but ignores the background (part of
    the emission is hidden against the CMB, so more mass is needed for
    the same observed contrast flux)."""
    z0 = 5.0
    opz = 1.0 + z0
    m_c = photoz_mbb(cmb=True, z_upper=8.0)
    truth = np.array([22.0, 1.9, 60.0, 3.0, 8.0, z0])

    f = np.asarray(m_c.fnu(_j(truth), _j(WAVE)), np.float64)
    fit = SEDFitter(m_c, nwalkers=32, seed=8)
    fit.set_data(WAVE, f, 0.07 * f)
    fit.fix_param("z", z0)
    fit.fix_param("alpha", truth[3])
    for nm, v in zip(m_c.param_names, truth):
        fit.set_param_init(nm, v, 0.03 * abs(v) if v else 0.03)
    fit.run(nburn=20, nsteps=40)
    res = fit.results()
    dm_cmb = compute_dustmass(res, thin=2)

    # fp64 NumPy oracle from the same chain: the device kernel only
    # contributes S_obs; temperature/occupation/prefactor re-derived.
    from mbb_emcee_tpu.models.cmb import T_CMB0 as T0
    samples = res._thinned(2)
    t_int, beta = samples[:, 0], samples[:, 1]
    p = 4.0 + beta
    t_d = (t_int ** p + T0 ** p * (opz ** p - 1.0)) ** (1.0 / p)
    lam_obs = _j(np.array([125.0 * opz]))
    s_mjy = np.asarray(jax.vmap(
        lambda t: m_c.fnu(t, lam_obs)[0])(
            jnp.asarray(samples, jnp.float32)), np.float64)
    from mbb_emcee_tpu.constants import HCOK_UM_K
    x_d = HCOK_UM_K / (125.0 * t_d)
    x_c = HCOK_UM_K / (125.0 * T0 * opz)
    occ = 1.0 / np.expm1(x_d) - 1.0 / np.expm1(x_c)
    dl = luminosity_distance(z0)
    pref = derived.dustmass_prefactor(dl, opz, 2.64, 125.0)
    oracle = pref * s_mjy / occ
    np.testing.assert_allclose(dm_cmb, oracle, rtol=2e-3)

    # Contrast inequality at the SAME emission temperature.
    naive_td = pref * s_mjy * np.expm1(x_d)
    assert np.all(dm_cmb > naive_td)
    ratio = np.median(dm_cmb / naive_td)
    assert 1.0005 < ratio < 5.0, f"CMB contrast ratio {ratio:.4f}"


def test_dustmass_requires_photoz_model():
    from mbb_emcee_tpu.sed import SEDModel

    class FakeRes:
        def _require_model(self):
            return SEDModel(
                fnu=lambda th, w: w * 0 + th[0],
                param_names=("a",), lower=[0.0], upper=[1.0])

    with pytest.raises(TypeError):
        compute_dustmass(FakeRes())


def test_lir_zparam_rejects_explicit_lumdist():
    model = photoz_mbb(cmb=False)
    truth = TRUTH6.copy()
    f = np.asarray(model.fnu(_j(truth), _j(WAVE)), np.float64)
    fit = SEDFitter(model, nwalkers=16, seed=9)
    fit.set_data(WAVE, f, 0.07 * f)
    fit.fix_param("alpha", truth[3])
    fit.set_gaussian_prior("T", 38.0, 6.0)
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.05 * abs(v) if v else 0.05)
    fit.run(nburn=10, nsteps=20)
    res = SEDResults(fit=fit, lumdist=5000.0)
    with pytest.raises(ValueError):
        res.compute_lir(z_param="z")
    with pytest.raises(ValueError, match="lumdist"):
        compute_dustmass(res)                 # same conflict, mass side


@pytest.mark.slow
def test_batch_photoz_matches_single_surface():
    """Catalog photo-z: SEDMultiFitter.compute_lir(z_param) and
    photoz.compute_dustmass_batch must equal the single-surface
    formulas applied per source to the same samples."""
    from types import SimpleNamespace
    from mbb_emcee_tpu.sedmulti import SEDMultiFitter
    from mbb_emcee_tpu.photoz import compute_dustmass_batch

    model = photoz_mbb(cmb=True, z_upper=8.0)
    zs = np.array([2.0, 3.5, 5.0])
    rng = np.random.default_rng(12)
    flux = np.empty((zs.size, WAVE.size))
    for s, z0 in enumerate(zs):
        t = np.array([38.0, 1.9, 80.0, 3.0, 10.0, z0])
        f = np.asarray(model.fnu(_j(t), _j(WAVE)), np.float64)
        flux[s] = f * (1.0 + 0.05 * rng.standard_normal(WAVE.size))
    mf = SEDMultiFitter(model, nwalkers=16, seed=12)
    mf.set_data(WAVE, flux, 0.07 * flux)
    mf.set_gaussian_prior("T", 38.0, 6.0)
    mf.fix_param("alpha", 3.0)
    for nm, v in zip(model.param_names, [38.0, 1.9, 80.0, 3.0, 10.0, 3.0]):
        mf.set_param_init(nm, v, 0.1 * abs(v))
    mf.run(nburn=15, nsteps=30)

    lir_b = mf.compute_lir(z_param="z", thin=2)
    dm_b = compute_dustmass_batch(mf, thin=2)
    assert lir_b.shape[0] == zs.size and dm_b.shape == lir_b.shape
    assert np.isfinite(lir_b).all() and (lir_b > 0).all()
    assert np.isfinite(dm_b).all() and (dm_b > 0).all()
    with pytest.raises(ValueError):
        mf.compute_lir(z_param="z", redshifts=zs)
    with pytest.raises(ValueError):
        mf.compute_lir(z_param="z", lumdists=np.ones(zs.size))

    # N(z) population inference composes with photo-z out of the box:
    # z is just another free parameter to the hierarchy tier.
    from mbb_emcee_tpu.hierarchy import fit_population
    hf = fit_population(mf, params=("z",), nburn=20, nsteps=60,
                        nwalkers=8, max_samples=64)
    assert hf.chain_free.shape[-1] == 2          # (mu_z, sigma_z)
    mu_z = np.median(hf.flatchain[:, 0])
    assert 1.0 < mu_z < 7.0                      # sane N(z) center
    assert np.isfinite(hf.reweight_ess()).all()

    samples = np.asarray(mf._thinned(2), np.float64)   # (S, N, npar)
    for s in (0, 2):
        fake = SimpleNamespace(
            lumdist=None, _cosmo=Cosmology.named("WMAP9"),
            lir_chain=None, lir_meta=None,
            dustmass_chain=None, dustmass_meta=None,
            _require_model=lambda m=model: m,
            _thinned=lambda thin, s=s: samples[s])
        lir_s = SEDResults.compute_lir(fake, z_param="z")
        np.testing.assert_allclose(lir_s, lir_b[s], rtol=1e-4)
        dm_s = compute_dustmass(fake)
        np.testing.assert_allclose(dm_s, dm_b[s], rtol=1e-4)


def test_photoz_hdf5_roundtrip(tmp_path):
    model = photoz_mbb(cmb=True, z_upper=8.0)
    truth = TRUTH6.copy()
    f = np.asarray(model.fnu(_j(truth), _j(WAVE)), np.float64)
    fit = SEDFitter(model, nwalkers=16, seed=10)
    fit.set_data(WAVE, f, 0.07 * f)
    fit.fix_param("alpha", truth[3])
    fit.set_gaussian_prior("T", 38.0, 6.0)
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.05 * abs(v) if v else 0.05)
    fit.run(nburn=10, nsteps=20)
    res = fit.results()
    res.compute_lir(z_param="z", thin=2)
    compute_dustmass(res, thin=2)
    fn = str(tmp_path / "photoz.h5")
    res.writeToHDF5(fn)
    res2 = SEDResults(h5file=fn, model=model)
    np.testing.assert_allclose(res2.lir_chain, res.lir_chain)
    np.testing.assert_allclose(res2.dustmass_chain, res.dustmass_chain)
    assert res2.lir_meta["z_param"] == "z"
    assert res2.dustmass_meta["kappa"] == 2.64


def test_pz_matches_exact_grid_posterior():
    """Gold-standard oracle: with 3 free parameters (T, fnorm, z;
    opthin/noalpha, beta fixed) the joint posterior is cheap to evaluate
    EXACTLY on a dense grid with an independently-written likelihood.
    The MCMC marginal P(z) must match the grid marginal in median and
    width -- this validates the whole joint-z pipeline (likelihood
    builder, reduced-space sampling, box truncation, T prior) against
    ground truth rather than another sampler."""
    model = photoz_mbb(cmb=True, opthin=True, noalpha=True, z_upper=8.0)
    truth = np.array([38.0, 1.9, 250.0, 4.0, 10.0, 4.0])
    f = np.asarray(model.fnu(_j(truth), _j(WAVE)), np.float64)
    unc = 0.07 * f
    rng = np.random.default_rng(21)
    flux = f + unc * rng.standard_normal(WAVE.size)

    fit = SEDFitter(model, nwalkers=64, seed=13)
    fit.set_data(WAVE, flux, unc)
    fit.set_gaussian_prior("T", 38.0, 6.0)
    fit.fix_param("beta", 1.9)
    fit.fix_param("lambda0", 250.0)
    fit.fix_param("alpha", 4.0)
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.1 * abs(v))
    fit.run(nburn=250, nsteps=1200, thin=2)
    zc = fit.results().par_cen("z")

    # Exact (T, fnorm, z) grid with an INDEPENDENT likelihood expression.
    tg = np.linspace(10.0, 80.0, 96)
    fg = np.linspace(5.0, 18.0, 96)
    zg = np.linspace(0.8, 8.0, 144)
    tt, ff, zz = np.meshgrid(tg, fg, zg, indexing="ij")
    pts = np.column_stack([
        tt.ravel(), np.full(tt.size, 1.9), np.full(tt.size, 250.0),
        np.full(tt.size, 4.0), ff.ravel(), zz.ravel()]).astype(np.float32)
    wj, fj = _j(WAVE), _j(flux)
    ij = _j(1.0 / unc)

    def lnp(th):
        r = (model.fnu(th, wj) - fj) * ij
        return -0.5 * jnp.sum(r * r) - 0.5 * ((th[0] - 38.0) / 6.0) ** 2

    vals = np.asarray(jax.jit(jax.vmap(lnp))(jnp.asarray(pts)),
                      np.float64).reshape(tt.shape)
    post = np.exp(vals - vals.max())
    pz = post.sum(axis=(0, 1))
    # the grid must actually contain the posterior
    assert pz[0] < 1e-2 * pz.max() and pz[-1] < 1e-2 * pz.max()
    cdf = np.cumsum(pz)
    cdf /= cdf[-1]
    zmed = np.interp(0.5, cdf, zg)
    zlo = np.interp(0.1585, cdf, zg)
    zhi = np.interp(0.8415, cdf, zg)
    width_g = zhi - zlo
    width_m = zc[1] + zc[2]
    assert abs(zc[0] - zmed) < 0.08 * width_g, (zc, zmed)
    assert abs(width_m - width_g) < 0.12 * width_g, (width_m, width_g)
