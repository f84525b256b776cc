"""MultiFitter: batched multi-source fitting (the serving path).

Runs on the CPU conftest (virtual 8-device mesh for the sharding test).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mbb_emcee_tpu import MultiFitter, MBBFitter, MBBResults
from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu
from mbb_emcee_tpu.parallel import walker_mesh

NB = 5
WAVE = np.linspace(100.0, 500.0, NB)

# Four optically-thin sources with different temperatures/normalizations.
TRUES = np.array([
    [25.0, 1.6, 250.0, 4.0, 30.0],
    [32.0, 1.9, 250.0, 4.0, 45.0],
    [40.0, 2.2, 250.0, 4.0, 60.0],
    [50.0, 1.8, 250.0, 4.0, 20.0],
])


def _mock_batch(trues, opthin=True, noalpha=True, frac=0.04, seed=3):
    shape = MBBShape(opthin=opthin, noalpha=noalpha)
    rng = np.random.default_rng(seed)
    flux, unc = [], []
    for t in trues:
        f = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        u = frac * f
        flux.append(f + u * rng.standard_normal(NB))
        unc.append(u)
    return np.array(flux), np.array(unc)


@pytest.fixture(scope="module")
def fitted():
    flux, unc = _mock_batch(TRUES)
    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=11)
    mf.set_data(WAVE, flux, unc)
    mf.set_uplim("T", 100.0)
    mf.run(nburn=80, nsteps=400)
    return mf


def test_shapes_and_recovery(fitted):
    mf = fitted
    S = TRUES.shape[0]
    assert mf.chain_free.shape == (S, 400, 64, 3)   # T, beta, fnorm free
    assert mf.lnprobability.shape == (S, 400, 64)
    assert mf.acceptance_fraction.shape == (S, 64)
    af = mf.acceptance_fraction.mean(axis=1)
    assert np.all(af > 0.1) and np.all(af < 0.8)
    # Each source recovers ITS truth within a few posterior widths.
    for pi, name in ((0, "T"), (1, "beta"), (4, "fnorm")):
        cen = mf.par_cen(name)                       # (S, 3)
        err = np.maximum(cen[:, 1], cen[:, 2])
        pull = np.abs(cen[:, 0] - TRUES[:, pi]) / err
        assert np.all(pull < 5.0), (name, cen[:, 0], TRUES[:, pi])
    # Sources are actually DIFFERENT fits (T medians ordered like truths).
    t_med = mf.par_cen("T")[:, 0]
    assert np.all(np.argsort(t_med) == np.argsort(TRUES[:, 0]))


def test_matches_single_source_fitter(fitted):
    mf = fitted
    k = 1
    fit = MBBFitter(nwalkers=64, opthin=True, noalpha=True, seed=23)
    fit.set_data(WAVE, mf.flux[k], mf.unc[k])
    fit.set_uplim("T", 100.0)
    fit.run(nburn=80, nsteps=400)
    res = MBBResults(fit=fit)
    for name in ("T", "beta", "fnorm"):
        single = res.par_cen(name)
        multi = mf.par_cen(name)[k]
        err = max(single[1], single[2], multi[1], multi[2])
        assert abs(single[0] - multi[0]) < 1.5 * err, (name, single, multi)


def test_best_fit_and_autocorr(fitted):
    mf = fitted
    params, lnp = mf.best_fit()
    assert params.shape == (4, 5) and lnp.shape == (4,)
    assert np.all(np.isfinite(lnp))
    # best-fit lnp is the max over each source's recorded chain
    assert np.allclose(lnp, np.asarray(mf.lnprobability).reshape(4, -1)
                       .max(axis=1))
    tau = mf.autocorrelation_time()
    assert tau.shape == (4, 3)


def test_derived_quantities_batched(fitted):
    mf = fitted
    z = np.array([1.0, 2.0, 2.5, 3.0])
    lir = mf.compute_lir(z, thin=8)
    assert lir.shape[0] == 4 and np.all(lir > 0)
    lc = mf.lir_cen()
    assert lc.shape == (4, 3) and np.all(lc[:, 0] > 0)
    dm = mf.compute_dustmass(z, thin=8)
    assert np.all(dm > 0)
    pk = mf.compute_peaklambda(thin=8)
    assert pk.shape[0] == 4
    # hotter source peaks bluer (observed frame, same z ordering not needed:
    # peak depends only on theta) -- compare source 0 (25 K) vs 3 (50 K).
    assert np.median(pk[3]) < np.median(pk[0])
    # per-source L_IR matches the single-source MBBResults computation
    # (thin=1: thinned subsets differ in flatten order, so compare the
    # full-chain median, which is order-independent)
    res1 = mf.results(1, redshift=2.0)
    res1.compute_lir(thin=1)
    lir_full = mf.compute_lir(z, thin=1)
    np.testing.assert_allclose(np.median(res1.lir_chain),
                               np.median(lir_full[1]), rtol=1e-5)


def test_sed_percentiles_batched(fitted):
    mf = fitted
    waves = np.array([120.0, 300.0, 600.0])
    band = mf.sed_percentiles(waves, thin=1)
    assert band.shape == (4, 3, 3)
    # ordering: lower <= median <= upper at every wavelength
    assert np.all(band[:, 2] <= band[:, 0]) and np.all(band[:, 0] <= band[:, 1])
    # per-source agreement with the single-source MBBResults computation
    res2 = mf.results(2, redshift=2.5)
    np.testing.assert_allclose(res2.sed_percentiles(waves, thin=1),
                               band[2], rtol=2e-5)


def test_results_view_roundtrip(fitted, tmp_path):
    mf = fitted
    res = mf.results(2, redshift=2.5)
    cen_view = res.par_cen("T")
    # MultiFitter.par_cen reduces on DEVICE in fp32; the single-source view
    # reduces on host in fp64 -- agreement to fp32 interpolation precision.
    np.testing.assert_allclose(cen_view, mf.par_cen("T")[2], rtol=1e-5)
    out = str(tmp_path / "src2.h5")
    res.compute_peaklambda(thin=16)
    res.writeToHDF5(out)
    back = MBBResults(h5file=out)
    np.testing.assert_allclose(back.par_cen("T"), cen_view, rtol=1e-6)


def test_source_sharded_run_matches_unsharded():
    # threefry streams are partitioning-invariant, so the sharded run must
    # reproduce the unsharded chains exactly (rbg's hardware generator is
    # documented to depend on the partitioning).
    trues = np.repeat(TRUES, 2, axis=0)              # 8 sources
    flux, unc = _mock_batch(trues)
    mesh = walker_mesh(8)

    def fit(mesh_arg):
        mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=5,
                         prng_impl="threefry2x32", mesh=mesh_arg)
        mf.set_data(WAVE, flux, unc)
        mf.run(nburn=20, nsteps=40)
        return mf

    a = fit(None)
    b = fit(mesh)
    np.testing.assert_allclose(np.asarray(a.chain_free),
                               np.asarray(b.chain_free),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(a.acceptance_fraction,
                                  b.acceptance_fraction)
    # XLA extend() continues identically under the mesh too
    a.extend(20)
    b.extend(20)
    np.testing.assert_allclose(np.asarray(a.chain_free),
                               np.asarray(b.chain_free),
                               rtol=1e-5, atol=1e-5)


def test_multifit_validation():
    mf = MultiFitter(nwalkers=32)
    with pytest.raises(RuntimeError):
        mf.run()
    with pytest.raises(ValueError):
        mf.set_data(WAVE, np.ones((2, NB)), np.ones((2, NB + 1)))
    with pytest.raises(ValueError):
        mf.set_data(WAVE, np.ones((2, NB)), -np.ones((2, NB)))
    mf.set_data(WAVE, np.ones((2, NB)), np.ones((2, NB)))
    with pytest.raises(RuntimeError):
        mf.par_cen("T")


def test_multifit_response_mode():
    """Instrument-response quadrature likelihood in the batched path."""
    import jax.numpy as jnp
    from mbb_emcee_tpu import ResponseSet
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    rs = ResponseSet()
    names = []
    for w in WAVE:
        name = f"BOX{int(w)}"
        rs.add(name, f"box:{w}:{0.3 * w:.1f}")
        names.append(name)
    shape = MBBShape(opthin=True, noalpha=True)
    waves, weights = rs.pack(names)
    trues = TRUES[:2]
    rng = np.random.default_rng(2)
    flux, unc = [], []
    for t in trues:
        f = np.asarray(jnp.sum(weights * mbb_fnu(
            jnp.asarray(t, jnp.float32), waves, shape), axis=-1),
            np.float64)
        u = 0.04 * f
        flux.append(f + u * rng.standard_normal(f.size))
        unc.append(u)

    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=3,
                     responses=rs)
    mf.set_data(WAVE, np.array(flux), np.array(unc), band_names=names)
    mf.run(nburn=80, nsteps=300)
    for pi, name in ((0, "T"), (4, "fnorm")):
        cen = mf.par_cen(name)
        err = np.maximum(cen[:, 1], cen[:, 2])
        pull = np.abs(cen[:, 0] - trues[:, pi]) / np.maximum(err, 1e-9)
        assert np.all(pull < 5.0), (name, cen[:, 0], trues[:, pi])

    # Regression (review): the HDF5 roundtrip must preserve the response
    # quadrature -- a reloaded batch that silently fell back to POINT
    # evaluation gave different PPC/LOO/SED bands than the fitted model,
    # and an XLA resume was always refused (posterior token mismatch).
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "resp.h5")
        mf.writeToHDF5(path)
        back = MultiFitter.from_h5(path)
        pk_orig, pk_back = mf._response_pack(), back._response_pack()
        assert pk_back is not None
        np.testing.assert_array_equal(pk_back[0], pk_orig[0])
        np.testing.assert_array_equal(pk_back[1], pk_orig[1])
        assert back._responses_token() == mf._responses_token()
        # posterior identity now matches -> an XLA resume would be
        # accepted (mesh-free comparison, as _engine_adopt_checkpoint does)
        assert (back._posterior_token(back._effective_spec(), False)
                == mf._posterior_token(mf._effective_spec(), False))
        # PPC through the reloaded object exercises the band-integrated
        # eval path end-to-end
        p = back.posterior_predictive(thin=8, seed=5)
        assert np.all((0.0 <= p.p_value) & (p.p_value <= 1.0))


def test_write_persists_run_spec_not_current(fitted, tmp_path):
    """Regression (review): writeToHDF5 stores the spec the RUN sampled
    under, so fix_param() between run() and save cannot re-label the
    reloaded chain columns."""
    mf = fitted
    before = mf.par_cen("T").copy()
    mf.fix_param("T", 40.0)
    try:
        path = str(tmp_path / "runspec.h5")
        mf.writeToHDF5(path)
        back = MultiFitter.from_h5(path)
        assert back.free_space.nfree == mf.free_space.nfree
        np.testing.assert_allclose(back.par_cen("T"), before)
    finally:
        mf.unfix_param("T")


def test_batch_hdf5_roundtrip(fitted, tmp_path):
    mf = fitted
    path = str(tmp_path / "batch.h5")
    mf.writeToHDF5(path, thin=2)
    back = MultiFitter.from_h5(path)
    assert back.nsources == mf.nsources
    assert back.chain_free.shape[1] == mf.chain_free.shape[1] // 2
    # thinned summaries agree within MC error
    a = mf.par_cen("T")
    b = back.par_cen("T")
    np.testing.assert_allclose(b[:, 0], a[:, 0], rtol=0.05)
    # full analysis surface works on the restored object
    z = np.array([1.0, 2.0, 2.5, 3.0])
    lir = back.compute_lir(z, thin=4)
    assert np.all(lir > 0)
    res = back.results(1, redshift=2.0)
    assert np.isfinite(res.par_cen("beta")).all()
    # batch evidence persists and round-trips (stored float32)
    mf.compute_evidence(nlive=64, nbatch=8, nsteps=8, seed=2)
    path2 = str(tmp_path / "batch_ev.h5")
    mf.writeToHDF5(path2, thin=2)
    back2 = MultiFitter.from_h5(path2)
    assert back2.evidence is not None
    np.testing.assert_allclose(back2.evidence.logz, mf.evidence.logz,
                               rtol=1e-6)
    np.testing.assert_allclose(back2.evidence.posterior_mean(),
                               mf.evidence.posterior_mean(), rtol=1e-3)


def test_extend_after_set_data_raises_on_fused_state(monkeypatch):
    """extend() must refuse to continue when set_data() replaced the batch
    (the sampler would silently keep the old likelihood). Exercised via
    the state the fused path records; the XLA path raises its own
    'requires a prior run on the fused backend' error."""
    import pytest
    from mbb_emcee_tpu import MultiFitter

    mf = MultiFitter(nwalkers=16)
    wave = np.array([100.0, 250.0, 500.0])
    flux = np.ones((2, 3)) * 20.0
    mf.set_data(wave, flux, 0.05 * flux)
    # simulate a finished fused run's bookkeeping
    mf._sampler = object()
    mf._run_data = (mf.flux, mf.unc)
    mf.thin = 1
    mf.set_data(wave, flux * 2, 0.05 * flux)
    with pytest.raises(RuntimeError, match="set_data"):
        mf.extend(10)


def test_batched_tau_matches_host_oracle_s256():
    """S=256 autocorrelation times in ONE device call must equal the host
    FFT implementation (sampler.autocorrelation_time) per source."""
    from mbb_emcee_tpu.multifit import _batched_tau
    from mbb_emcee_tpu.sampler import autocorrelation_time as host_tau
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    S, nrec, nw, nfree = 256, 64, 8, 3
    # AR(1) series with per-source correlation -> nontrivial, varied taus.
    phi = rng.uniform(0.1, 0.8, S)
    eps = rng.standard_normal((S, nrec, nw, nfree))
    ch = np.empty_like(eps)
    ch[:, 0] = eps[:, 0]
    for t in range(1, nrec):
        ch[:, t] = phi[:, None, None] * ch[:, t - 1] + eps[:, t]

    dev = np.asarray(_batched_tau(jnp.asarray(ch, jnp.float32)))
    assert dev.shape == (S, nfree)
    for s in (0, 17, 100, 255):
        want = host_tau(ch[s].astype(np.float64))
        np.testing.assert_allclose(dev[s], want, rtol=2e-4,
                                   err_msg=f"source {s}")


def test_converged_length_criterion_uses_full_chain(fitted):
    """converged(tau_mult=..., window=w) judges chain LENGTH against the
    whole recorded chain, not the R-hat window: capping the length at the
    window would make the predicate unsatisfiable once tau_mult*tau > w
    and a run-until-converged extend() loop would never exit."""
    mf = fitted
    nrec = int(np.asarray(mf.chain_free).shape[1])
    w = 8
    tau = mf.autocorrelation_time(window=w)
    tmax = float(np.nanmax(np.nan_to_num(tau, nan=1.0)))
    # Required length for the worst source: just above the window but
    # well inside the recorded chain.
    tau_mult = (w + 1) / tmax
    assert tau_mult * tmax <= nrec
    ok = mf.converged(rhat_max=1e9, window=w, tau_mult=tau_mult)
    np.testing.assert_array_equal(ok, np.ones(mf.nsources, bool))


def test_compile_cache_tokens_are_content_based():
    """Cache keys must key on CONTENT, not id(): a freed ResponseSet/Mesh
    whose address is recycled by a new object must not silently reuse a
    program with the old curves/devices baked in as constants."""
    from mbb_emcee_tpu.multifit import _pack_token, _mesh_token
    a = (np.ones((2, 3), np.float32), np.ones((2, 3), np.float32))
    same = (a[0].copy(), a[1].copy())
    diff = (a[0], np.full((2, 3), 2.0, np.float32))
    assert _pack_token(a) == _pack_token(same)
    assert _pack_token(a) != _pack_token(diff)
    assert _pack_token(None) is None
    assert _mesh_token(None) is None
    m8 = walker_mesh(8)
    assert _mesh_token(m8) == _mesh_token(walker_mesh(8))


def test_resume_requires_checkpoint_path():
    """resume=True without checkpoint= must raise, not silently restart
    a multi-hour batch from scratch."""
    flux, unc = _mock_batch(TRUES[:2])
    for backend in ("xla", "fused"):
        mf = MultiFitter(nwalkers=8, opthin=True, noalpha=True,
                         sampler_backend=backend)
        mf.set_data(WAVE, flux, unc)
        with pytest.raises(ValueError, match="checkpoint"):
            mf.run(nburn=2, nsteps=4, resume=True)


def test_missing_bands_zero_weight():
    """NaN flux/unc slots (missing bands) carry exactly zero likelihood
    weight: the batched lnprob with a zeroed band equals the lnprob of
    the reduced band set."""
    import jax
    from mbb_emcee_tpu.likelihood import (
        LikelihoodSpec, build_lnprob_data)
    from mbb_emcee_tpu.models.modified_blackbody import MBBShape

    shape = MBBShape(opthin=True, noalpha=True)
    spec = LikelihoodSpec.default()
    lnp, fs = build_lnprob_data(shape, spec)
    th = jnp.asarray([31.0, 1.8, 250.0, 3.5, 42.0], jnp.float32)

    wave5 = jnp.asarray(WAVE, jnp.float32)
    flux5 = jnp.asarray([10.0, 30.0, 45.0, 38.0, 22.0], jnp.float32)
    iunc5 = jnp.asarray([0.5, 0.3, 0.0, 0.4, 0.6], jnp.float32)  # band 2 missing
    keep = np.array([0, 1, 3, 4])
    full = float(lnp(th, wave5, flux5, iunc5))
    red = float(lnp(th, wave5[keep], flux5[keep], iunc5[keep]))
    assert full == red


def test_multifit_missing_bands_end_to_end():
    """A ragged batch (one source missing a band) fits, stays finite,
    and the missing band is carried as (0, inf)."""
    flux, unc = _mock_batch(TRUES[:3])
    flux = flux.copy(); unc = unc.copy()
    flux[1, 2] = np.nan                       # source 1 not observed at 250um
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=4)
    mf.set_data(WAVE, flux, unc)
    assert mf.flux[1, 2] == 0.0 and np.isinf(mf.unc[1, 2])
    mf.run(nburn=40, nsteps=120)
    assert np.isfinite(np.asarray(mf.lnprobability)).all()
    cen = mf.par_cen("T")
    assert np.all(np.isfinite(cen))
    # an entirely-missing source is rejected up front
    allnan = flux.copy(); allnan[0, :] = np.nan
    mf2 = MultiFitter(nwalkers=16, opthin=True, noalpha=True)
    with pytest.raises(ValueError, match="no bands at all"):
        mf2.set_data(WAVE, allnan, unc)


def test_per_source_uplim_semantics():
    """Sign-encoded upper limits: a negative-iunc band penalizes only
    model flux ABOVE the limit, per source, with no change to the
    compiled program's operands."""
    from mbb_emcee_tpu.likelihood import (
        LikelihoodSpec, build_lnprob_data, signed_iunc)
    from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu

    shape = MBBShape(opthin=True, noalpha=True)
    spec = LikelihoodSpec.default()
    lnp, fs = build_lnprob_data(shape, spec)
    th5 = np.array([31.0, 1.8, 250.0, 3.5, 42.0])
    th = jnp.asarray(th5[fs.free_idx], jnp.float32)
    wave = jnp.asarray(WAVE, jnp.float32)
    model = np.asarray(mbb_fnu(jnp.asarray(th5, jnp.float32), wave, shape))

    flux = model.copy()
    unc = 0.1 * model
    base_iunc = signed_iunc(unc)

    # limit ABOVE the model -> zero contribution from that band
    lim_above = flux.copy(); lim_above[2] = model[2] * 2.0
    iu = base_iunc.copy(); iu[2] = -iu[2]
    v_lim = float(lnp(th, wave, jnp.asarray(lim_above, jnp.float32),
                      jnp.asarray(iu, jnp.float32)))
    keep = np.array([0, 1, 3, 4])
    v_wo = float(lnp(th, wave[keep],
                     jnp.asarray(flux[keep], jnp.float32),
                     jnp.asarray(base_iunc[keep], jnp.float32)))
    assert v_lim == v_wo

    # limit BELOW the model -> same penalty as a detection at the limit
    lim_below = flux.copy(); lim_below[2] = model[2] * 0.5
    v_onesided = float(lnp(th, wave, jnp.asarray(lim_below, jnp.float32),
                           jnp.asarray(iu, jnp.float32)))
    v_twosided = float(lnp(th, wave, jnp.asarray(lim_below, jnp.float32),
                           jnp.asarray(np.abs(iu), jnp.float32)))
    assert v_onesided == v_twosided


# -- correlated band errors (set_band_correlation) ---------------------------

def _random_corr(nb, seed=7, strength=0.4):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((nb, nb))
    C = A @ A.T + nb * np.eye(nb)
    d = np.sqrt(np.diag(C))
    R = C / np.outer(d, d)
    return (1 - strength) * np.eye(nb) + strength * R


def test_correlated_lnprob_matches_fp64_marginal():
    """The correlated batch likelihood equals the exact fp64 Gaussian
    -0.5 d^T C^-1 d with C = D R D, including EXACT marginalization of a
    missing band (submatrix of R, not of R^-1)."""
    from mbb_emcee_tpu.likelihood import (LikelihoodSpec, build_lnprob_data)

    shape = MBBShape(opthin=True, noalpha=True)
    spec = LikelihoodSpec.default()
    lnp_corr, fs = build_lnprob_data(shape, spec, correlated=True)
    lnp_diag, _ = build_lnprob_data(shape, spec)

    R = _random_corr(NB)
    th5 = np.array([31.0, 1.8, 250.0, 3.5, 42.0])
    th = jnp.asarray(th5[fs.free_idx], jnp.float32)
    wave = jnp.asarray(WAVE, jnp.float32)
    model = np.asarray(
        mbb_fnu(jnp.asarray(th5, jnp.float32), wave, shape), np.float64)

    rng = np.random.default_rng(5)
    unc = 0.08 * model
    flux = model * (1 + 0.1 * rng.standard_normal(NB))
    flux2 = flux.copy(); unc2 = unc.copy()
    flux2[1] = np.nan; unc2[1] = np.nan          # source 1 misses band 1

    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True)
    mf.set_data(WAVE, np.stack([flux, flux2]), np.stack([unc, unc2]))
    mf.set_band_correlation(R)
    W, corr = mf._data_operand()
    assert corr and W.shape == (2, NB, NB)

    # fp32 delta exactly as the device computes it, fp64 quadratic form
    model32 = np.asarray(mbb_fnu(jnp.asarray(th5, jnp.float32), wave,
                                 shape), np.float64)
    for s, (fx, p) in enumerate([(flux, np.ones(NB, bool)),
                                 (flux2, np.isfinite(flux2))]):
        got = float(lnp_corr(th, wave,
                             jnp.asarray(mf.flux[s], jnp.float32),
                             jnp.asarray(W[s], jnp.float32)))
        d = (model32 - np.where(p, fx, 0.0))[p]
        C = (R[np.ix_(p, p)]
             * np.outer(unc[p] if s == 0 else unc2[p],
                        unc[p] if s == 0 else unc2[p]))
        want = -0.5 * float(d @ np.linalg.solve(C, d))
        np.testing.assert_allclose(got, want, rtol=2e-4, err_msg=f"s={s}")

    # identity correlation reproduces the diagonal likelihood exactly
    mf.set_band_correlation(np.eye(NB))
    W_id, _ = mf._data_operand()
    for s in range(2):
        v_corr = float(lnp_corr(th, wave,
                                jnp.asarray(mf.flux[s], jnp.float32),
                                jnp.asarray(W_id[s], jnp.float32)))
        v_diag = float(lnp_diag(th, wave,
                                jnp.asarray(mf.flux[s], jnp.float32),
                                jnp.asarray(mf._iunc_operand()[s],
                                            jnp.float32)))
        np.testing.assert_allclose(v_corr, v_diag, rtol=1e-6)


def test_band_correlation_validation():
    flux, unc = _mock_batch(TRUES)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True)
    with pytest.raises(RuntimeError, match="set_data"):
        mf.set_band_correlation(np.eye(NB))
    mf.set_data(WAVE, flux, unc)
    with pytest.raises(ValueError, match="must be"):
        mf.set_band_correlation(np.eye(NB - 1))
    bad = np.eye(NB); bad[0, 1] = 0.5
    with pytest.raises(ValueError, match="symmetric"):
        mf.set_band_correlation(bad)
    with pytest.raises(ValueError, match="unit diagonal"):
        mf.set_band_correlation(2.0 * np.eye(NB))
    bad = np.ones((NB, NB))
    np.fill_diagonal(bad, 1.0)
    with pytest.raises(ValueError, match="positive definite"):
        mf.set_band_correlation(bad)
    # mutual exclusion with one-sided upper limits, both orders
    mf.set_phot_upperlimits([True] + [False] * (NB - 1))
    with pytest.raises(ValueError, match="upper limits"):
        mf.set_band_correlation(_random_corr(NB))
    mf.set_phot_upperlimits(np.zeros(NB, bool))
    mf.set_band_correlation(_random_corr(NB))
    with pytest.raises(ValueError, match="correlated"):
        mf.set_phot_upperlimits([True] + [False] * (NB - 1))
    # the fused backend now ACCEPTS correlated errors (the whitening
    # rides the error operand; ops/pallas_multifit.py use_chol mode)
    mf2 = MultiFitter(nwalkers=16, opthin=True, noalpha=True,
                      sampler_backend="fused", interpret=True)
    mf2.set_data(WAVE, flux, unc)
    mf2.set_band_correlation(_random_corr(NB))
    mf2.run(nburn=4, nsteps=8)
    assert np.isfinite(np.asarray(mf2.lnprobability)).all()
    # a stale correlation must not survive an incompatible set_data
    mf3 = MultiFitter(nwalkers=16, opthin=True, noalpha=True)
    mf3.set_data(WAVE, flux, unc)
    mf3.set_band_correlation(_random_corr(NB))
    with pytest.raises(ValueError, match="set_band_correlation"):
        mf3.set_data(WAVE[:3], flux[:, :3], unc[:, :3])


def test_correlated_run_end_to_end(tmp_path):
    """Stretch-move batch fit under a shared band correlation: posteriors
    stay sane, HDF5 round-trips the correlation, and the per-source
    results view carries the full covariance."""
    flux, unc = _mock_batch(TRUES)
    R = _random_corr(NB, strength=0.3)
    mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=11)
    mf.set_data(WAVE, flux, unc)
    mf.set_band_correlation(R)
    mf.run(nburn=60, nsteps=200)
    assert mf._backend_used == "xla"
    cen = mf.par_cen("T")
    assert np.all(np.abs(cen[:, 0] - TRUES[:, 0]) < 8.0)

    out = str(tmp_path / "corr.h5")
    mf.writeToHDF5(out)
    back = MultiFitter.from_h5(out)
    np.testing.assert_allclose(back._band_corr, R)
    res1 = back.results(1, redshift=2.0)
    np.testing.assert_allclose(res1.phot.cov,
                               R * np.outer(unc[1], unc[1]), rtol=1e-12)

    # evidence path accepts the correlated likelihood
    ev = mf.compute_evidence(nlive=64, nbatch=8, nsteps=8, max_iter=400)
    assert np.all(np.isfinite(ev.logz))


def test_correlated_hmc_and_pt_smoke():
    """The gradient-based and tempered batch paths accept the correlated
    likelihood (the whitening matmul is differentiable and
    temperature-independent)."""
    flux, unc = _mock_batch(TRUES[:2])
    R = _random_corr(NB, strength=0.3)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=4)
    mf.set_data(WAVE, flux[:2], unc[:2])
    mf.set_band_correlation(R)
    mf.run_hmc(nwarmup=10, nsteps=12, n_leapfrog=4)
    assert np.all(np.isfinite(np.asarray(mf.chain_free)))
    mf.run_pt(nrungs=4, nburn=10, nsteps=12)
    assert np.all(np.isfinite(np.asarray(mf.chain_free)))
    assert np.all(np.isfinite(mf.logz_pt[0]))


def test_xla_extend_matches_longer_run():
    """extend() on the XLA backend continues the EXACT chain the longer
    uninterrupted run would have produced (the continuation state --
    final key + last record -- is complete)."""
    flux, unc = _mock_batch(TRUES)

    def fresh(corr=None):
        mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=9,
                         sampler_backend="xla")
        mf.set_data(WAVE, flux, unc)
        if corr is not None:
            mf.set_band_correlation(corr)
        return mf

    whole = fresh().run(nburn=20, nsteps=60, thin=2)
    split = fresh().run(nburn=20, nsteps=40, thin=2).extend(20)
    np.testing.assert_array_equal(np.asarray(whole.chain_free),
                                  np.asarray(split.chain_free))
    np.testing.assert_array_equal(np.asarray(whole.lnprobability),
                                  np.asarray(split.lnprobability))
    np.testing.assert_array_equal(whole.acceptance_fraction,
                                  split.acceptance_fraction)

    # continuation under correlated errors (the case that FORCES the XLA
    # backend and motivated extend() support there)
    R = _random_corr(NB, strength=0.3)
    w2 = fresh(R).run(nburn=20, nsteps=40, thin=1)
    s2 = fresh(R).run(nburn=20, nsteps=20, thin=1).extend(10).extend(10)
    np.testing.assert_array_equal(np.asarray(w2.chain_free),
                                  np.asarray(s2.chain_free))

    # guards: stale data, changed parameter space, bad thin multiple
    mf = fresh().run(nburn=10, nsteps=20, thin=2)
    with pytest.raises(ValueError, match="divisible"):
        mf.extend(21)
    mf.set_uplim("T", 90.0)
    with pytest.raises(RuntimeError, match="configuration changed"):
        mf.extend(20)
    mf2 = fresh().run(nburn=10, nsteps=20)
    mf2.set_data(WAVE, flux + 0.01, unc)
    with pytest.raises(RuntimeError, match="set_data"):
        mf2.extend(20)
    # HMC/PT runs are not continuable
    mf3 = fresh()
    mf3.run_hmc(nwarmup=8, nsteps=8, n_leapfrog=4)
    with pytest.raises(RuntimeError, match="not continuable"):
        mf3.extend(8)


def test_uplim_mask_change_reuses_compiled_programs():
    """The central promise of the sign-encoded masks: changing WHICH
    bands/sources are upper limits must not grow the compile cache (XLA)
    or rebuild the fused sampler."""
    flux, unc = _mock_batch(TRUES)
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=2,
                     sampler_backend="xla")
    mf.set_data(WAVE, flux, unc)
    mf.run(nburn=10, nsteps=20)
    n0 = len(mf._run_cache)
    mf.set_phot_upperlimits([False] * (NB - 1) + [True])
    mf.run(nburn=10, nsteps=20)
    m = np.zeros((TRUES.shape[0], NB), bool)
    m[0, 0] = True
    mf.set_phot_upperlimits(m)
    mf.run(nburn=10, nsteps=20)
    assert len(mf._run_cache) == n0, "mask change recompiled the XLA run"

    mff = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=2,
                      sampler_backend="fused", interpret=True)
    mff.set_data(WAVE, flux, unc)
    mff.run(nburn=4, nsteps=8)
    samp_id = id(mff._fused)
    mff.set_phot_upperlimits(m)
    mff.run(nburn=4, nsteps=8)
    assert id(mff._fused) == samp_id, "mask change rebuilt the fused kernel"
    # ... and the refreshed mask actually reached the kernel operands
    assert float(np.asarray(mff._fused._iunc)[0, 0, 0]) < 0


def test_extend_refuses_changed_error_model():
    """extend() must refuse when the band correlation CONTENT (not just
    its presence) changed after run() -- else it splices chains from two
    different posteriors."""
    flux, unc = _mock_batch(TRUES)
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=2,
                     sampler_backend="xla")
    mf.set_data(WAVE, flux, unc)
    mf.set_band_correlation(_random_corr(NB, seed=1))
    mf.run(nburn=10, nsteps=20)
    mf.set_band_correlation(_random_corr(NB, seed=2))
    with pytest.raises(RuntimeError, match="changed after"):
        mf.extend(20)
    # unchanged correlation still extends
    mf.set_band_correlation(_random_corr(NB, seed=1))
    mf.extend(20)
    assert mf.chain_free.shape[1] == 40


def test_source_view_cov_with_missing_band():
    """results(i) for a ragged source under a band correlation carries
    the exact limiting covariance: missing band = infinite variance,
    zero cross terms."""
    flux, unc = _mock_batch(TRUES[:2])
    flux2 = flux.copy(); unc2 = unc.copy()
    flux2[1, 0] = np.nan; unc2[1, 0] = np.nan
    R = _random_corr(NB, strength=0.3)
    mf = MultiFitter(nwalkers=32, opthin=True, noalpha=True, seed=2)
    mf.set_data(WAVE, flux2, unc2)
    mf.set_band_correlation(R)
    mf.run(nburn=10, nsteps=20)
    cov = mf.results(1, redshift=2.0).phot.cov
    assert np.isinf(cov[0, 0])
    assert np.all(cov[0, 1:] == 0.0) and np.all(cov[1:, 0] == 0.0)
    sub = R[1:, 1:] * np.outer(mf.unc[1, 1:], mf.unc[1, 1:])
    np.testing.assert_allclose(cov[1:, 1:], sub, rtol=1e-12)


@pytest.mark.slow
def test_correlated_fit_statistically_calibrated():
    """End-to-end statistics of the correlated batch path: draw band
    noise from the TRUE covariance C_s = D_s R D_s for many sources,
    fit under the same R, and check the pooled parameter pulls
    (truth - median)/sigma_post are standard-normal-ish. A miscoded
    whitening (e.g. R^-1 submatrix instead of submatrix Cholesky, or a
    transposed factor) shows up as badly over/under-dispersed pulls."""
    S = 16
    rng = np.random.default_rng(42)
    trues = np.column_stack([
        rng.uniform(26.0, 42.0, S),
        rng.uniform(1.5, 2.1, S),
        np.full(S, 250.0),
        np.full(S, 4.0),
        rng.uniform(25.0, 55.0, S),
    ])
    shape = MBBShape(opthin=True, noalpha=True)
    R = _random_corr(NB, seed=8, strength=0.5)
    L = np.linalg.cholesky(R)
    flux, unc = [], []
    for t in trues:
        f = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        u = 0.05 * f
        noise = u * (L @ rng.standard_normal(NB))   # cov = D R D
        flux.append(f + noise)
        unc.append(u)
    mf = MultiFitter(nwalkers=96, opthin=True, noalpha=True, seed=77)
    mf.set_data(WAVE, np.array(flux), np.array(unc))
    mf.set_band_correlation(R)
    mf.run(nburn=150, nsteps=600)

    pulls = []
    for pi, name in ((0, "T"), (1, "beta"), (4, "fnorm")):
        cen = mf.par_cen(name)                       # (S, 3)
        sig = 0.5 * (cen[:, 1] + cen[:, 2])
        pulls.append((trues[:, pi] - cen[:, 0]) / sig)
    pulls = np.concatenate(pulls)                    # 48 pulls
    # pooled pulls: mean ~ 0 (se ~ 1/sqrt(48) ~ 0.14), std ~ 1
    assert abs(pulls.mean()) < 0.5, pulls.mean()
    assert 0.6 < pulls.std() < 1.6, pulls.std()


def test_fused_extend_refuses_changed_posterior():
    """Regression (review): the fused backend's extend() must refuse a
    parameter-space change made after run() -- the retained sampler
    holds run()-time operands, so the edit would be silently ignored
    while par_cen interprets the spliced chain under the NEW spec."""
    flux, unc = _mock_batch(TRUES[:2])
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2,
                     sampler_backend="fused", interpret=True)
    mf.set_data(WAVE, flux, unc)
    mf.run(nburn=4, nsteps=8)
    orig = float(mf._spec.upper[0])
    mf.set_uplim("T", 50.0)
    with pytest.raises(RuntimeError, match="changed after"):
        mf.extend(8)
    mf.set_uplim("T", orig)                 # restored -> extend works
    mf.extend(8)
    assert mf.chain_free.shape[1] == 16


def test_stretch_a_changes_invalidate_caches():
    """Regression (review): a= is baked into every compiled sampler
    program as a closure constant, so mutating mf.a must compile a new
    program (not silently reuse the old proposal law), and extend()
    must refuse to splice across the change."""
    flux, unc = _mock_batch(TRUES[:2])

    def fresh(a):
        mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2,
                         sampler_backend="xla", a=a)
        mf.set_data(WAVE, flux, unc)
        return mf

    mf = fresh(2.0)
    mf.run(nburn=4, nsteps=8)
    c_a2 = np.asarray(mf.chain_free).copy()
    mf.a = 3.0
    mf.run(nburn=4, nsteps=8)
    c_mut = np.asarray(mf.chain_free)
    ref = fresh(3.0)
    ref.run(nburn=4, nsteps=8)
    # the mutated-a run equals a fresh a=3.0 run bitwise, and differs
    # from the a=2.0 program it used to (wrongly) reuse
    np.testing.assert_array_equal(c_mut, np.asarray(ref.chain_free))
    assert not np.array_equal(c_mut, c_a2)
    mf.a = 2.5
    with pytest.raises(RuntimeError, match="changed after"):
        mf.extend(8)


def test_run_init_typo_rejected():
    """Regression (review): a typo in run(init=...) must raise, not
    silently fall back to the flux-heuristic seeding."""
    flux, unc = _mock_batch(TRUES[:2])
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2,
                     sampler_backend="xla")
    mf.set_data(WAVE, flux, unc)
    with pytest.raises(ValueError, match="init"):
        mf.run(nburn=2, nsteps=4, init="MAP")


def test_run_init_map_with_actual_resume_rejected(tmp_path):
    """Regression (review): init='map' + an existing checkpoint would
    silently drop the requested MAP seeding (the checkpointed state
    wins); refuse like MBBFitter.run does -- on BOTH backends, whose
    resume branches skip _init_centers (and with it init validation)."""
    flux, unc = _mock_batch(TRUES[:2])
    ck = tmp_path / "ck.h5"
    ck.write_bytes(b"")                     # an 'existing' checkpoint
    for backend in ("xla", "fused"):
        mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2,
                         sampler_backend=backend, interpret=True)
        mf.set_data(WAVE, flux, unc)
        with pytest.raises(ValueError, match="ambiguous"):
            mf.run(nburn=2, nsteps=4, checkpoint=str(ck), resume=True,
                   init="map")
        # a typo is rejected up front even on the resume path
        with pytest.raises(ValueError, match="init"):
            mf.run(nburn=2, nsteps=4, checkpoint=str(ck), resume=True,
                   init="mapp")


def test_par_cen_interprets_chain_under_run_spec(fitted):
    """Regression (review): par_cen must summarize the RUN's posterior.
    fix_param AFTER run() must not replace the sampled posterior with
    the new fixed value; unfixing a run-time-fixed param must return the
    run's value, not crash with IndexError."""
    import copy
    mf = copy.copy(fitted)
    mf._spec = fitted._spec             # share; we restore below
    before = mf.par_cen("T")
    try:
        mf.fix_param("T", 40.0)
        after = mf.par_cen("T")
        np.testing.assert_array_equal(after, before)   # not (40, 0, 0)
    finally:
        mf._spec = fitted._spec

    # run with beta fixed, then unfix: the stored chain has no beta
    # column -- report the run's fixed value
    flux, unc = _mock_batch(TRUES[:2])
    mf2 = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=5,
                      sampler_backend="xla")
    mf2.set_data(WAVE, flux, unc)
    mf2.fix_param("beta", 1.7)
    mf2.run(nburn=10, nsteps=20)
    mf2.unfix_param("beta")
    cen = mf2.par_cen("beta")
    np.testing.assert_array_equal(
        cen, np.tile([1.7, 0.0, 0.0], (2, 1)))


def test_evidence_runner_cached_across_same_shape_batches():
    """Regression (review): compute_evidence must reuse ONE compiled
    program across same-shape batches (chunked serving) -- data are
    runtime operands -- while still producing data-dependent results."""
    flux, unc = _mock_batch(TRUES[:2])
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2)
    mf.set_data(WAVE, flux, unc)
    r1 = mf.compute_evidence(nlive=64, nbatch=8, nsteps=8, max_iter=300,
                             seed=1)
    n0 = len(mf._run_cache)
    mf.set_data(WAVE, flux * 1.3, unc)
    r2 = mf.compute_evidence(nlive=64, nbatch=8, nsteps=8, max_iter=300,
                             seed=1)
    assert len(mf._run_cache) == n0         # runner reused, no rebuild
    assert np.all(np.isfinite(r2.logz))
    assert not np.allclose(r1.logz, r2.logz)  # new data took effect


def test_evidence_sharded_over_mesh_matches_unsharded():
    """compute_evidence on a mesh-configured MultiFitter shards the
    independent per-source runs over the source axis and reproduces the
    unsharded result (same seed, same draws)."""
    trues = np.tile(TRUES, (2, 1))                    # S=8 on 8 devices
    flux, unc = _mock_batch(trues)
    base = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2)
    base.set_data(WAVE, flux, unc)
    r0 = base.compute_evidence(nlive=48, nbatch=8, nsteps=6,
                               max_iter=300, seed=4)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2,
                     mesh=walker_mesh(8))
    mf.set_data(WAVE, flux, unc)
    r1 = mf.compute_evidence(nlive=48, nbatch=8, nsteps=6,
                             max_iter=300, seed=4)
    np.testing.assert_allclose(r1.logz, r0.logz, rtol=1e-5)
    np.testing.assert_allclose(r1.logz_err, r0.logz_err, rtol=1e-4)
