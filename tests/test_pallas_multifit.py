"""Fused multi-source Pallas sampler tests (interpret mode on CPU).

rng='external' mode drives the kernel with precomputed uniforms and checks
it reproduces, source by source, the XLA stretch-move implementation
consuming the same uniforms -- covering the sources-on-sublanes state
layout, the batched one-hot-matmul gather, the widened (S, W) lnprob, the
in-kernel lnp (re)computation at phase boundaries, chain recording, accept
counting, and source padding.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu
from mbb_emcee_tpu.likelihood import Photometry, LikelihoodSpec
from mbb_emcee_tpu.sampler import (
    make_initial_ball, stretch_half_step_from_uniforms)
from mbb_emcee_tpu.ops.pallas_lnprob import build_pallas_lnprob
from mbb_emcee_tpu.ops.pallas_multifit import FusedMultiPallasSampler

NW = 32
NB = 5
WAVE = np.linspace(100.0, 500.0, NB)
S_TILE = 8


def _problem(nsources, opthin=False, noalpha=False, seed=9, uplim=False):
    shape = MBBShape(opthin=opthin, noalpha=noalpha)
    rng = np.random.default_rng(seed)
    trues = np.column_stack([
        rng.uniform(25, 45, nsources), rng.uniform(1.4, 2.2, nsources),
        rng.uniform(200, 300, nsources), rng.uniform(3, 4.5, nsources),
        rng.uniform(20, 60, nsources)])
    flux, unc = [], []
    for t in trues:
        f = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        u = 0.04 * f
        flux.append(f + u * rng.standard_normal(NB))
        unc.append(u)
    spec = LikelihoodSpec.default()
    spec = dataclasses.replace(
        spec, upper=np.array([100.0, 5.0, 2e4, 60.0, 1e7]))
    if uplim == "per_source":
        # ragged limits: different sources go one-sided in different bands
        ul = np.zeros((nsources, NB), bool)
        ul[0, 0] = True
        ul[-1, NB - 1] = True
        spec = dataclasses.replace(spec, uplim_bands=ul)
    elif uplim:
        ul = np.zeros(NB, bool)
        ul[0] = True
        spec = dataclasses.replace(spec, uplim_bands=ul)
    return shape, spec, trues, np.array(flux), np.array(unc)


def _reference_source(uniforms, s, p0_s, lnprob_batch, half, thin, nrec,
                      s_tile=S_TILE, a=2.0):
    """Replay source s with the XLA stretch move consuming the SAME
    uniform rows the kernel uses (rows [role*S + s] per step)."""
    pos_a = jnp.asarray(p0_s[:half])
    pos_b = jnp.asarray(p0_s[half:])
    lnp = lnprob_batch(jnp.asarray(p0_s))
    lnp_a, lnp_b = lnp[:half], lnp[half:]
    chain, lnpchain = [], []
    nacc = np.zeros(2 * half, np.int64)
    for r in range(nrec):
        for t in range(thin):
            u = uniforms[0, r, 6 * s_tile * t:6 * s_tile * (t + 1), :half]
            u3a = jnp.asarray(np.stack([u[0 * s_tile + s],
                                        u[1 * s_tile + s],
                                        u[2 * s_tile + s]]))
            u3b = jnp.asarray(np.stack([u[3 * s_tile + s],
                                        u[4 * s_tile + s],
                                        u[5 * s_tile + s]]))
            pos_a, lnp_a, acc_a = stretch_half_step_from_uniforms(
                u3a, pos_a, pos_b, lnp_a, lnprob_batch, a)
            pos_b, lnp_b, acc_b = stretch_half_step_from_uniforms(
                u3b, pos_b, pos_a, lnp_b, lnprob_batch, a)
            nacc += np.concatenate([np.asarray(acc_a), np.asarray(acc_b)])
        chain.append(np.concatenate([np.asarray(pos_a), np.asarray(pos_b)]))
        lnpchain.append(np.concatenate([np.asarray(lnp_a),
                                        np.asarray(lnp_b)]))
    return np.stack(chain), np.stack(lnpchain), nacc


@pytest.mark.parametrize("nsources,opthin,noalpha,uplim", [
    # Default lane: one padded-tile reduced-model replay (interpret-mode
    # kernel equivalence is expensive; the full model is covered fast by
    # the packed-node response test below and the single-source suite,
    # and at full scale in the slow lane).
    (3, True, True, False),
    (3, True, True, "per_source"),
    pytest.param(3, False, False, True, marks=pytest.mark.slow),
    pytest.param(8, False, False, False, marks=pytest.mark.slow),
])
def test_multi_kernel_matches_per_source_xla(nsources, opthin, noalpha,
                                             uplim):
    shape, spec, trues, flux, unc = _problem(nsources, opthin, noalpha,
                                             uplim=uplim)
    samp = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                   interpret=True, rng="external")
    fs = samp.free_space
    p0 = np.stack([
        np.asarray(make_initial_ball(
            jax.random.key(50 + s), trues[s][fs.free_idx],
            0.05 * np.abs(trues[s][fs.free_idx]), NW,
            fs.lower, fs.upper))
        for s in range(nsources)])
    state = samp.init_state(jax.random.key(1), jnp.asarray(p0))

    nrec, thin = 2, 2
    rng = np.random.default_rng(4)
    uniforms = jnp.asarray(rng.uniform(
        0.001, 0.999,
        (samp.ntiles, nrec, 6 * thin * samp.s_tile, samp.wp))
        .astype(np.float32))
    state, chain, lnpchain = samp.run_mcmc(state, nrec * thin, thin,
                                           uniforms=uniforms)
    assert chain.shape == (nsources, nrec, NW, fs.nfree)

    half = NW // 2
    for s in range(nsources):
        spec_s = spec
        if spec.uplim_bands is not None and spec.uplim_bands.ndim == 2:
            # single-source oracle takes that source's own mask row
            spec_s = dataclasses.replace(spec,
                                         uplim_bands=spec.uplim_bands[s])
        lnprob_batch, _ = build_pallas_lnprob(
            Photometry(WAVE, flux[s], unc[s]), shape, spec_s,
            interpret=True)
        ref_chain, ref_lnp, ref_acc = _reference_source(
            np.asarray(uniforms), s, p0[s], lnprob_batch, half, thin,
            nrec)
        np.testing.assert_allclose(np.asarray(chain[s]), ref_chain,
                                   rtol=2e-5, atol=1e-4, err_msg=f"src {s}")
        np.testing.assert_allclose(np.asarray(lnpchain[s]), ref_lnp,
                                   rtol=2e-5, atol=1e-3, err_msg=f"src {s}")
        np.testing.assert_array_equal(np.asarray(state.naccept[s]),
                                      ref_acc, err_msg=f"src {s}")
    # final state == last record
    np.testing.assert_allclose(np.asarray(state.pos),
                               np.asarray(chain[:, -1]), rtol=1e-6)
    assert int(state.nsteps) == nrec * thin


def test_multi_kernel_validation():
    shape, spec, trues, flux, unc = _problem(4)
    with pytest.raises(ValueError):
        FusedMultiPallasSampler(31, WAVE, flux, unc, shape, spec)  # odd
    with pytest.raises(ValueError):
        FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                s_tile=4)                          # tile
    with pytest.raises(ValueError):
        FusedMultiPallasSampler(NW, WAVE, flux[:, :3], unc, shape, spec)
    samp = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                   interpret=True, rng="external")
    with pytest.raises(ValueError):
        samp.init_state(jax.random.key(0),
                        jnp.zeros((4, NW, 2), jnp.float32))  # wrong nfree
    st = samp.init_state(
        jax.random.key(0),
        jnp.broadcast_to(jnp.asarray(trues[:, samp.free_space.free_idx],
                                     jnp.float32)[:, None, :],
                         (4, NW, samp.ndim)))
    with pytest.raises(ValueError):
        samp.run_mcmc(st, 2)   # external rng needs uniforms
    # hw mode: a provided uniforms stream would be silently ignored --
    # refuse, like the single-source sampler (review regression)
    samp_hw = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                      interpret=True, rng="hw")
    st_hw = samp_hw.init_state(jax.random.key(0), jnp.zeros(
        (4, NW, samp_hw.ndim), jnp.float32))
    with pytest.raises(ValueError, match="silently ignore"):
        samp_hw.run_mcmc(st_hw, 2, uniforms=jnp.zeros((1,)))


def test_missing_band_flux_sanitized():
    """Regression (review): NaN flux at a missing band (non-finite unc)
    must not poison chi2 (NaN * 0 = NaN froze that source's chain);
    non-finite flux at a WEIGHTED band is a data error."""
    shape, spec, trues, flux, unc = _problem(3)
    flux, unc = flux.copy(), unc.copy()
    flux[1, 2] = np.nan
    unc[1, 2] = np.inf                    # properly marked missing
    samp = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                   interpret=True, rng="external")
    fs = samp.free_space
    p0 = np.stack([
        np.asarray(make_initial_ball(
            jax.random.key(60 + s), trues[s][fs.free_idx],
            0.05 * np.abs(trues[s][fs.free_idx]), NW,
            fs.lower, fs.upper))
        for s in range(3)])
    state = samp.init_state(jax.random.key(2), jnp.asarray(p0))
    rng = np.random.default_rng(8)
    uniforms = jnp.asarray(rng.uniform(
        0.001, 0.999,
        (samp.ntiles, 2, 6 * 1 * samp.s_tile, samp.wp)).astype(np.float32))
    state, chain, lnp = samp.run_mcmc(state, 2, 1, uniforms=uniforms)
    assert np.isfinite(np.asarray(lnp[1])).all()
    assert np.asarray(state.naccept[1]).sum() > 0   # chain actually moves
    # same sanitize on the set_data serving path
    samp.set_data(flux, unc)
    # NaN flux at a weighted band is refused with a pointed message
    bad_flux = flux.copy()
    bad_flux[0, 1] = np.nan
    with pytest.raises(ValueError, match="weighted band"):
        samp.set_data(bad_flux, unc)
    with pytest.raises(ValueError, match="weighted band"):
        FusedMultiPallasSampler(NW, WAVE, bad_flux, unc, shape, spec,
                                interpret=True, rng="external")


def test_set_data_refreshes_kernel_operands():
    """Regression: flux/unc are runtime kernel operands; set_data must
    change the computed lnprob without rebuilding (the serving loop's
    fit-next-batch path)."""
    shape, spec, trues, flux, unc = _problem(8)
    samp = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                   interpret=True, rng="external")
    fs = samp.free_space
    p0 = jnp.broadcast_to(
        jnp.asarray(trues[:, fs.free_idx], jnp.float32)[:, None, :],
        (8, NW, samp.ndim))
    state = samp.init_state(jax.random.key(0), p0)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(0.01, 0.99, (1, 1, 6 * samp.s_tile, samp.wp))
                    .astype(np.float32))
    _, _, lnp1 = samp.run_mcmc(state, 1, uniforms=u)
    samp.set_data(flux * 1.5, unc)          # same shapes, new values
    _, _, lnp2 = samp.run_mcmc(state, 1, uniforms=u)
    assert not np.allclose(np.asarray(lnp1), np.asarray(lnp2))
    with pytest.raises(ValueError):
        samp.set_data(flux[:, :3], unc[:, :3])   # wrong band count


@pytest.mark.slow
def test_mesh_sharded_fused_matches_single_device():
    """Source tiles shard over a mesh via shard_map around the kernel;
    with external uniforms the sharded run must reproduce the
    single-device kernel exactly."""
    from mbb_emcee_tpu.parallel import walker_mesh

    nsources = 64                      # 8 tiles -> 1 per device
    shape, spec, trues, flux, unc = _problem(nsources)
    mesh = walker_mesh(8)

    nw = 16                            # >= 2*ndim=10, with headroom
    def build(mesh_arg):
        samp = FusedMultiPallasSampler(nw, WAVE, flux, unc, shape, spec,
                                       interpret=True, rng="external",
                                       mesh=mesh_arg)
        p0 = jnp.broadcast_to(
            jnp.asarray(trues[:, samp.free_space.free_idx],
                        jnp.float32)[:, None, :],
            (nsources, nw, samp.ndim)) * jnp.linspace(
                0.9, 1.1, nw)[None, :, None]
        state = samp.init_state(jax.random.key(1), p0)
        rng = np.random.default_rng(6)
        u = jnp.asarray(rng.uniform(
            0.001, 0.999, (samp.ntiles, 2, 6 * samp.s_tile, samp.wp))
            .astype(np.float32))
        return samp.run_mcmc(state, 2, uniforms=u)

    st_a, chain_a, lnp_a = build(None)
    st_b, chain_b, lnp_b = build(mesh)
    np.testing.assert_allclose(np.asarray(chain_a), np.asarray(chain_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lnp_a), np.asarray(lnp_b),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_a.naccept),
                                  np.asarray(st_b.naccept))


@pytest.mark.parametrize("nnodes", [
    9,
    pytest.param(65, marks=pytest.mark.slow),   # realistic resolution
])
def test_multi_kernel_response_mode_packed_nodes(nnodes):
    """Packed-node response mode: built-in PACS/SPIRE curves x 5 bands
    (nb*nnodes packed wavelengths; 325 at the slow lane's realistic
    65-node resolution). The kernel's single (R, S, W) broadcast
    evaluation must reproduce, source by source, the single-source Pallas
    lnprob path consuming the same response pack and uniforms."""
    from mbb_emcee_tpu.response import ResponseSet

    names = ["PACS_100", "PACS_160", "SPIRE_250", "SPIRE_350", "SPIRE_500"]
    rs = ResponseSet.builtin(names, nnodes=nnodes)
    pack = rs.pack(names)
    nsources = 8
    shape, spec, trues, _, _ = _problem(nsources)
    # Band-integrated mock fluxes through the same pack.
    waves_j = jnp.asarray(pack[0])
    wts = np.asarray(pack[1], np.float64)
    flux, unc = [], []
    rng = np.random.default_rng(11)
    for t in trues:
        vals = np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32), waves_j,
                                  shape), np.float64)
        f = (wts * vals).sum(axis=-1)
        u = 0.04 * f
        flux.append(f + u * rng.standard_normal(NB))
        unc.append(u)
    flux, unc = np.array(flux), np.array(unc)

    samp = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                   response_pack=pack, interpret=True,
                                   rng="external")
    fs = samp.free_space
    p0 = np.stack([
        np.asarray(make_initial_ball(
            jax.random.key(70 + s), trues[s][fs.free_idx],
            0.05 * np.abs(trues[s][fs.free_idx]), NW,
            fs.lower, fs.upper))
        for s in range(nsources)])
    state = samp.init_state(jax.random.key(2), jnp.asarray(p0))

    nrec, thin = 1, 2
    u_rng = np.random.default_rng(8)
    uniforms = jnp.asarray(u_rng.uniform(
        0.001, 0.999,
        (samp.ntiles, nrec, 6 * thin * samp.s_tile, samp.wp))
        .astype(np.float32))
    state, chain, lnpchain = samp.run_mcmc(state, nrec * thin, thin,
                                           uniforms=uniforms)

    half = NW // 2
    for s in (0, 3, 7):
        lnprob_batch, _ = build_pallas_lnprob(
            Photometry(WAVE, flux[s], unc[s]), shape, spec,
            response_pack=pack, interpret=True)
        ref_chain, ref_lnp, ref_acc = _reference_source(
            np.asarray(uniforms), s, p0[s], lnprob_batch, half, thin,
            nrec)
        np.testing.assert_allclose(np.asarray(chain[s]), ref_chain,
                                   rtol=2e-5, atol=1e-4, err_msg=f"src {s}")
        np.testing.assert_allclose(np.asarray(lnpchain[s]), ref_lnp,
                                   rtol=2e-5, atol=1e-3, err_msg=f"src {s}")
        np.testing.assert_array_equal(np.asarray(state.naccept[s]),
                                      ref_acc, err_msg=f"src {s}")


def test_multi_kernel_correlated_matches_xla(tmp_path=None):
    """Correlated band errors IN the fused kernel (round-2 verdict: the
    fastest path used to exclude exactly the covfile workloads BASELINE
    names): the flattened per-source whitening operand reproduces,
    source by source, the XLA correlated stretch move consuming the
    same uniforms."""
    from mbb_emcee_tpu.likelihood import build_lnprob_data
    from mbb_emcee_tpu.multifit import MultiFitter

    nsources = 3
    shape, spec, trues, flux, unc = _problem(nsources, opthin=True,
                                             noalpha=True)
    rng = np.random.default_rng(17)
    A = rng.standard_normal((NB, NB))
    C = A @ A.T + NB * np.eye(NB)
    d = np.sqrt(np.diag(C))
    R = 0.6 * np.eye(NB) + 0.4 * (C / np.outer(d, d))

    # per-source whitening via the engine's builder (exact marginal)
    mf = MultiFitter(nwalkers=NW, opthin=True, noalpha=True)
    mf.set_data(WAVE, flux, unc)
    mf.set_band_correlation(R)
    W = mf._whiten_operand()                        # (S, NB, NB)

    samp = FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec,
                                   interpret=True, rng="external",
                                   whiten=W)
    assert samp.use_chol
    fs = samp.free_space
    p0 = np.stack([
        np.asarray(make_initial_ball(
            jax.random.key(50 + s), trues[s][fs.free_idx],
            0.05 * np.abs(trues[s][fs.free_idx]), NW,
            fs.lower, fs.upper))
        for s in range(nsources)])
    state = samp.init_state(jax.random.key(1), jnp.asarray(p0))

    nrec, thin = 2, 2
    uniforms = jnp.asarray(np.random.default_rng(4).uniform(
        0.001, 0.999,
        (samp.ntiles, nrec, 6 * thin * samp.s_tile, samp.wp))
        .astype(np.float32))
    state, chain, lnpchain = samp.run_mcmc(state, nrec * thin, thin,
                                           uniforms=uniforms)

    lnp_corr, _ = build_lnprob_data(shape, spec, correlated=True)
    wave32 = jnp.asarray(WAVE, jnp.float32)
    half = NW // 2
    for s in range(nsources):
        flux_s = jnp.asarray(flux[s], jnp.float32)
        W_s = jnp.asarray(W[s], jnp.float32)
        lnprob_batch = jax.vmap(
            lambda th: lnp_corr(th, wave32, flux_s, W_s))
        ref_chain, ref_lnp, ref_acc = _reference_source(
            np.asarray(uniforms), s, p0[s], lnprob_batch, half, thin,
            nrec)
        np.testing.assert_allclose(np.asarray(chain[s]), ref_chain,
                                   rtol=2e-5, atol=1e-4,
                                   err_msg=f"src {s}")
        np.testing.assert_allclose(np.asarray(lnpchain[s]), ref_lnp,
                                   rtol=2e-5, atol=1e-3,
                                   err_msg=f"src {s}")
        np.testing.assert_array_equal(np.asarray(state.naccept[s]),
                                      ref_acc, err_msg=f"src {s}")

    # uplims and whiten refuse to combine at the kernel level
    ul = np.zeros(NB, bool)
    ul[0] = True
    spec_ul = dataclasses.replace(spec, uplim_bands=ul)
    with pytest.raises(ValueError, match="upper limits"):
        FusedMultiPallasSampler(NW, WAVE, flux, unc, shape, spec_ul,
                                interpret=True, rng="external", whiten=W)


def test_multifitter_fused_correlated_interpret():
    """MultiFitter drives the correlated fused backend end-to-end (the
    NotImplementedError edge is gone): run + extend through the kernel,
    posterior-token guard fires when the correlation changes."""
    from mbb_emcee_tpu.multifit import MultiFitter

    nsources = 3
    shape, spec, trues, flux, unc = _problem(nsources, opthin=True,
                                             noalpha=True)
    R = 0.3 * np.ones((NB, NB)) + 0.7 * np.eye(NB)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=3,
                     sampler_backend="fused", interpret=True)
    mf.set_data(WAVE, flux, unc)
    mf.set_band_correlation(R)
    mf.run(nburn=8, nsteps=16)
    assert mf._backend_used == "fused"
    assert np.isfinite(np.asarray(mf.lnprobability)).all()
    cen = mf.par_cen("T")
    assert np.all(np.abs(cen[:, 0] - trues[:, 0]) < 15.0)
    mf.extend(8)
    assert mf.chain_free.shape[1] == 24
    mf.set_band_correlation(None)
    with pytest.raises(RuntimeError, match="changed"):
        mf.extend(8)
