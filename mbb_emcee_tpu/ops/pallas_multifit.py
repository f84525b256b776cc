"""Fused multi-source Pallas sampler: sources ride the SUBLANES.

The single-source fused kernel (ops/pallas_sampler.py) keeps walkers on the
128-wide lane axis but leaves 7/8 of the VPU's sublanes idle -- every
per-walker quantity is a (1, W) row of an (8, 128) hardware tile. This
kernel fills those sublanes with SOURCES: each per-walker quantity becomes
an (S, W) tile (S = 8 sources per tile), so one vector op advances eight
independent fits at once. Source tiles beyond the first stream through a
second grid dimension.

Layout per source tile, one (16*S, W) fp32 block:
    rows [h*8*S + q*S + s] = half h, quantity q, source s
    quantities: T, beta, lambda0, alpha, fnorm, lnp, acc, spare
so each quantity of a half is a sublane-aligned (S, W) slice.

The partner gather is a BATCHED one-hot matmul on the MXU
(sel[s,p,k] = 1_{p = partner(k) for source s}), at HIGHEST precision so
gathered positions are exact f32.

The kernel recomputes the walkers' lnprob from their positions at the
first grid step, so callers never need a separately-built lnprob for state
initialization, and phase transitions (burn -> re-center -> production)
just feed positions back in.

Same PRNG contract as the single-source kernel: hardware PRNG seeded per
(run-seed, tile, record) on TPU; rng='external' consumes a uniforms array
for CPU/interpret-mode equivalence tests (the TPU interpreter stubs the
hardware PRNG).

Error models: diagonal (signed inverse uncertainties ride the iunc
operand -- sign marks upper-limit bands) or CORRELATED band errors
(multifit.set_band_correlation): the per-source lower-triangular
whitening matrices W_s = chol(R_pp)^-1 diag(iunc_p) ride the SAME
operand slot flattened to (S, nb*nb), and the in-kernel chi^2 becomes
nb(nb+1)/2 per-sublane multiply-accumulates of (S, W) tiles -- cheap
next to the model evaluation. One-sided upper limits do not compose
with correlated errors (refused upstream), so the sign encoding is not
needed in that mode. Reference equivalent: one emcee process per source
(SURVEY.md section 2, parallelism row).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from mbb_emcee_tpu.constants import HCOK_UM_K, NPARAMS
from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR, signed_iunc
from mbb_emcee_tpu.ops.pallas_lnprob import (
    _LANE, LNPROB_FLOOR, make_log_s_mbb, merge_log_x_pallas)

_LOG_C2 = math.log(HCOK_UM_K)
_NQ = 8          # quantities per half: 5 params + lnp + acc + spare
_Q_LNP = 5
_Q_ACC = 6


def _round_up(n, m):
    return -(-n // m) * m


def _make_multi_lnp(cfg):
    """compute(rows5, limits_ref, prior_ref, flux_blk, iunc_blk, waves_ref,
    rweights_ref) -> (S, W) lnprob. rows5: list of 5 (S, W) parameter
    arrays; flux_blk/iunc_blk: (S, nb) arrays for this tile's sources.
    Same math as pallas_lnprob._make_lnp_compute (shared model/merge
    helpers), widened from (1, W) rows to (S, W) tiles with per-source
    data columns."""
    opthin = cfg["opthin"]
    noalpha = cfg["noalpha"]
    nb = cfg["nbands"]
    use_chol = cfg.get("use_chol", False)
    log_wavenorm = math.log(cfg["wavenorm"])
    log_s_mbb = make_log_s_mbb(opthin)

    def compute(rows, limits_ref, prior_ref, flux_blk, iunc_blk,
                wnodes_ref, rweights_ref):
        inbox = None
        clipped = []
        for i in range(NPARAMS):
            v = rows[i]
            lo = limits_ref[0, i]
            hi = limits_ref[1, i]
            ok = (v >= lo) & (v <= hi)
            inbox = ok if inbox is None else (inbox & ok)
            clipped.append(jnp.clip(v, lo, hi))
        T, beta, lam0, alpha, fnorm = clipped

        log_T = jnp.log(T)
        log_x0 = _LOG_C2 - jnp.log(lam0) - log_T

        if noalpha:
            u_m = None
        else:
            u_m = merge_log_x_pallas(beta, log_x0, alpha, opthin)
            ls_m = log_s_mbb(u_m, beta, log_x0)

        def log_s(log_x):
            base = log_s_mbb(log_x, beta, log_x0)
            if noalpha:
                return base
            return jnp.where(log_x > u_m, ls_m - alpha * (log_x - u_m),
                             base)

        log_fnorm = jnp.log(fnorm)
        ls_norm = log_s(_LOG_C2 - log_wavenorm - log_T)

        nnodes = cfg["nnodes"]
        # ALL nb*nnodes wavelengths in ONE packed (R, S, W) tile-op chain.
        # wnodes_ref is a VMEM (R, 1, 1) array of ln-space node constants
        # (_LOG_C2 - ln lambda, precomputed host-side) that broadcasts
        # against the (S, W) parameter tiles -- the per-node scalar-SMEM
        # loop this replaces serialized nb*nnodes full log_s chains per
        # lnprob (~325 at a realistic 65-node filter x 5 bands), which
        # degraded both step cost and Mosaic compile time; this is the
        # multi-source analog of the single-source kernel's packing
        # (ops/pallas_lnprob.py node packing).
        lx3 = wnodes_ref[:, :, :] - log_T              # (R, S, W)
        wv = rweights_ref[:, :, :] * jnp.exp(
            log_fnorm + log_s(lx3) - ls_norm)          # (R, S, W)
        chi2 = jnp.zeros_like(T)
        if use_chol:
            # Correlated errors: iunc_blk carries each source's flattened
            # (nb, nb) lower-triangular whitening matrix (rows/cols of
            # missing bands zero -- exact marginalization, precomputed
            # host-side). r_i = sum_{j<=i} W[s,i,j] d_j as per-sublane
            # scalar multiply-accumulates of (S, W) tiles.
            deltas = []
            for b in range(nb):
                model = jnp.sum(wv[b * nnodes:(b + 1) * nnodes], axis=0)
                deltas.append(model - flux_blk[:, b:b + 1])
            for i in range(nb):
                r = jnp.zeros_like(T)
                for j in range(i + 1):
                    r = r + iunc_blk[:, i * nb + j:i * nb + j + 1] \
                        * deltas[j]
                chi2 = chi2 + r * r
        else:
            for b in range(nb):
                model = jnp.sum(wv[b * nnodes:(b + 1) * nnodes], axis=0)
                d = model - flux_blk[:, b:b + 1]
                u = iunc_blk[:, b:b + 1]
                # Sign-encoded upper limits (likelihood.signed_iunc):
                # u < 0 marks a one-sided band for THIS source --
                # penalize only model flux above the limit. Mask changes
                # are operand changes, so every uplim configuration
                # shares one program.
                d = jnp.where(u < 0, jnp.maximum(d, 0.0), d)
                r = d * jnp.abs(u)
                chi2 = chi2 + r * r

        lnp = -0.5 * chi2
        for i in range(NPARAMS):
            isig = prior_ref[1, i]
            d = (clipped[i] - prior_ref[0, i]) * isig
            lnp = lnp - 0.5 * d * d
        return jnp.where(inbox, lnp, LNPROB_FLOOR)

    return compute


def _sanitize_missing_flux(flux, unc):
    """Zero the flux at missing bands (non-finite unc -> weight 0 via
    signed_iunc) BEFORE it reaches the kernel: NaN * 0 is NaN, so an
    unsanitized NaN flux poisons chi2 and silently freezes that source's
    chain (accept = log u < NaN is always False). A non-finite flux at a
    WEIGHTED band is a data error -- raise."""
    finite_w = np.isfinite(unc)
    bad = finite_w & ~np.isfinite(flux)
    if bad.any():
        s, b = np.argwhere(bad)[0]
        raise ValueError(
            f"non-finite flux at a weighted band (source {s}, band {b}); "
            "mark missing bands by setting unc to NaN/inf")
    return np.where(finite_w, flux, 0.0)


def _hash_uniforms(shape, seed0, seed1, step_index):
    """Deterministic in-kernel pseudo-uniforms for INTERPRET mode, where
    the TPU hardware PRNG primitives cannot lower on CPU. A Knuth-style
    integer hash of (seed words, global step index, lane/sublane index):
    statistically crude but well-scrambled, which is all the CPU tests of
    hw-rng-mode code paths (e.g. checkpoint resume) need -- real TPU runs
    never take this path."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1] \
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    h = idx + seed0 * jnp.int32(374761393) + seed1 * jnp.int32(668265263) \
        + step_index * jnp.int32(-2048144777)   # 2246822519 as int32
    h = (h ^ (h >> 15)) * jnp.int32(-1640531527)   # 2654435769 as int32
    h = (h ^ (h >> 13)) * jnp.int32(1274126177)
    h = h ^ (h >> 16)
    bits = jax.lax.shift_right_logical(h, 8)
    return bits.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)


def _make_multi_kernel(cfg, *, nfree, half, wp, s_tile, thin, a,
                       external_rng, stub_rng=False):
    # `thin` is static only in external-rng mode (the uniforms shape
    # depends on it); in hw mode the kernel reads it from SMEM so one
    # compiled program serves every burn length of a geometry.
    compute = _make_multi_lnp(cfg)
    d_exp = float(nfree - 1)
    inv_a = 1.0 / a
    am1 = a - 1.0
    S = s_tile
    HB = _NQ * S                      # rows per half block

    def kernel(seed_ref, thin_ref, toff_ref, state0_ref, limits_ref,
               prior_ref, flux_ref, iunc_ref, waves_ref, rweights_ref,
               *rest):
        if external_rng:
            u_ref, chain_ref, state_out_ref, state_scr, partner_scr = rest
        else:
            chain_ref, state_out_ref, state_scr, partner_scr = rest

        t = pl.program_id(0)
        i = pl.program_id(1)
        nrec = pl.num_programs(1)
        # thin_ref holds [thin, nrec_live]; hw-mode grid is a fixed cap
        # and record iterations at or beyond nrec_live do nothing.
        active = True if external_rng else (i < thin_ref[1])

        if not external_rng and not stub_rng:
            # toff = this device's GLOBAL tile offset (0 single-device;
            # axis_index * local tiles under shard_map), so every
            # (tile, record) worldwide gets a distinct stream.
            pltpu.prng_seed(seed_ref[0],
                            seed_ref[1] + (t + toff_ref[0]) * nrec + i)

        lane = jax.lax.broadcasted_iota(jnp.int32, (S, wp), 1)
        pmask = (lane < half).astype(jnp.float32)            # (S, wp)
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (S, wp, wp), 1)

        flux_blk = flux_ref[0]                               # (S, nb)
        iunc_blk = iunc_ref[0]

        def lnprob(rows):
            return compute(rows, limits_ref, prior_ref, flux_blk,
                           iunc_blk, waves_ref, rweights_ref)

        def q_of(block, q):
            return block[q * S:(q + 1) * S, :]               # (S, wp)

        @pl.when(i == 0)
        def _():
            # Load this tile's state; recompute lnp from the positions so
            # callers never have to supply consistent lnp values.
            st = state0_ref[0]
            for h in range(2):
                blk = st[h * HB:(h + 1) * HB, :]
                rows = [q_of(blk, q) for q in range(NPARAMS)]
                lnp = lnprob(rows)
                state_scr[h * HB + _Q_LNP * S:
                          h * HB + (_Q_LNP + 1) * S, :] = lnp
                for q in list(range(NPARAMS)) + [_Q_ACC, 7]:
                    state_scr[h * HB + q * S:h * HB + (q + 1) * S, :] = \
                        q_of(blk, q)

        def half_update(active, passive, u3):
            # active/passive: (8S, wp) half blocks; u3: (3S, wp).
            z = ((am1 * u3[0:S] + 1.0) ** 2) * inv_a          # (S, wp)
            j = jnp.minimum((u3[S:2 * S] * half).astype(jnp.int32),
                            half - 1)                          # (S, wp)
            sel = (p_iota == j[:, None, :]).astype(jnp.float32)
            # one batched gather for all 5 parameter rows: (S, 5, W) @
            # (S, W, W). HIGHEST precision keeps gathered positions exact
            # f32 (the MXU's default bf16 pass would round them; still a
            # valid MH kernel, but exact is cheap here).
            pq = jnp.stack([q_of(passive, q) * pmask
                            for q in range(NPARAMS)], axis=1)
            partners = jax.lax.dot_general(
                pq, sel,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (S, 5, W)
            # Round-trip the extracted rows through VMEM scratch:
            # middle-dim slices partners[:, q, :] carry sublane-offset
            # layouts (vpad {q,0}) that Mosaic cannot feed into the
            # packed-node 3D reduction in the likelihood ("unsupported
            # output implicit dimension" at 65 nodes); a ref store/load
            # renormalizes them to offset-0 for the cost of one small
            # VMEM copy per row.
            for q in range(NPARAMS):
                partner_scr[q * S:(q + 1) * S, :] = partners[:, q, :]
            props = []
            for q in range(NPARAMS):
                partner_q = partner_scr[q * S:(q + 1) * S, :]
                props.append(partner_q
                             + z * (q_of(active, q) - partner_q))
            lnp_prop = lnprob(props)
            lnp_active = q_of(active, _Q_LNP)
            log_ratio = d_exp * jnp.log(z) + lnp_prop - lnp_active
            # Support guard: u can be exactly 0 in fp32 and log(0) = -inf
            # would accept an out-of-box proposal sitting at the finite
            # LNPROB_FLOOR (see likelihood.SUPPORT_FLOOR).
            accept = ((jnp.log(u3[2 * S:3 * S]) < log_ratio)
                      & (lnp_prop > SUPPORT_FLOOR))            # (S, wp)
            new_rows = [jnp.where(accept, props[q],
                                  q_of(active, q))
                        for q in range(NPARAMS)]
            new_lnp = jnp.where(accept, lnp_prop, lnp_active)
            new_acc = q_of(active, _Q_ACC) + accept.astype(jnp.float32)
            return jnp.concatenate(
                new_rows + [new_lnp, new_acc, q_of(active, 7)], axis=0)

        def step(st, carry):
            if external_rng:
                u = u_ref[0, 0, pl.ds(6 * S * st, 6 * S), :]
            elif stub_rng:
                u = _hash_uniforms(
                    (6 * S, wp), seed_ref[0],
                    seed_ref[1] + (t + toff_ref[0]) * nrec + i, st)
            else:
                bits = pltpu.prng_random_bits((6 * S, wp))
                u = (jax.lax.shift_right_logical(bits, 8)
                     .astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25))
            blk_a = half_update(state_scr[0:HB, :], state_scr[HB:, :],
                                u[0:3 * S])
            state_scr[0:HB, :] = blk_a
            blk_b = half_update(state_scr[HB:, :], blk_a, u[3 * S:6 * S])
            state_scr[HB:, :] = blk_b
            return carry

        def work():
            jax.lax.fori_loop(0, thin if external_rng else thin_ref[0],
                              step, 0, unroll=False)
            state = state_scr[:, :]
            chain_ref[0, 0] = state
            state_out_ref[0] = state

        if external_rng:
            work()
        else:
            pl.when(active)(work)

    return kernel


class MultiSamplerState(NamedTuple):
    """Batched ensemble state over S sources (free parameter space)."""
    key: jax.Array
    pos: jax.Array        # (S, nwalkers, nfree)
    lnp: jax.Array        # (S, nwalkers)
    naccept: jax.Array    # (S, nwalkers) int32
    nsteps: jax.Array     # () int32


class FusedMultiPallasSampler:
    """Batched stretch-move sampler over S independent sources, the whole
    run loop fused into one Pallas kernel with sources on sublanes.

    Construct from the shared model/parameter config and per-source data;
    the likelihood is compiled INTO the kernel. Sources are padded to a
    multiple of s_tile internally (replicas of source 0; stripped from all
    outputs).
    """

    def __init__(self, nwalkers, wave, flux, unc, shape, spec,
                 response_pack=None, a=2.0, s_tile=8, interpret=False,
                 rng="hw", mesh=None, whiten=None):
        from mbb_emcee_tpu.likelihood import build_lnprob_data

        if nwalkers % 2:
            raise ValueError("nwalkers must be even")
        if whiten is not None and spec.uplim_bands is not None \
                and np.asarray(spec.uplim_bands).any():
            raise ValueError(
                "photometric upper limits do not compose with correlated "
                "band errors (whiten=)")
        if rng not in ("hw", "external"):
            raise ValueError("rng must be 'hw' or 'external'")
        if s_tile % 8:
            raise ValueError("s_tile must be a multiple of 8 (fp32 "
                             "sublane tile)")
        self.mesh = mesh
        flux = np.atleast_2d(np.asarray(flux, np.float64))
        unc = np.atleast_2d(np.asarray(unc, np.float64))
        wave = np.atleast_1d(np.asarray(wave, np.float64))
        if flux.shape != unc.shape or flux.shape[1] != wave.size:
            raise ValueError("flux/unc must be (S, nbands)")
        flux = _sanitize_missing_flux(flux, unc)

        self.nwalkers = int(nwalkers)
        self.nsources = flux.shape[0]
        self.s_tile = int(s_tile)
        self.a = float(a)
        self.interpret = interpret
        self.rng = rng
        self.half = self.nwalkers // 2
        self.wp = _round_up(self.half, _LANE)

        # free space + template/scatter from the shared batched-likelihood
        # contract (validates the spec; upper-limit masks ride the signed
        # iunc operand, so they are NOT compiled in)
        _, self.free_space = build_lnprob_data(shape, spec)
        self.ndim = self.free_space.nfree
        if nwalkers < 2 * self.ndim:
            raise ValueError("need nwalkers >= 2*ndim")

        nb = wave.size
        self.nbands = nb
        if response_pack is not None:
            waves_np, rweights_np = response_pack
            waves_np = np.asarray(waves_np, np.float64)
            rweights_np = np.asarray(rweights_np, np.float64)
        else:
            waves_np = np.asarray(wave, np.float64)[:, None]
            rweights_np = np.ones((nb, 1), np.float64)
        self.nnodes = int(waves_np.shape[1])
        R = nb * self.nnodes
        # Packed (R, 1, 1) node operands for the in-kernel broadcast
        # evaluation: ln-space wavelength constants and quadrature weights
        # (see _make_multi_lnp).
        self._wnodes = jnp.asarray(
            (_LOG_C2 - np.log(waves_np)).reshape(R, 1, 1), jnp.float32)
        self._rweights = jnp.asarray(
            rweights_np.reshape(R, 1, 1), jnp.float32)

        # pad sources to tile multiple with replicas of source 0 (and to a
        # multiple of s_tile * ndev under a mesh so tiles shard evenly)
        ndev = 1 if mesh is None else int(mesh.devices.size)
        unit = self.s_tile * ndev
        self.ntiles = (_round_up(self.nsources, unit) // self.s_tile)
        s_pad = self.ntiles * self.s_tile
        pad = s_pad - self.nsources
        self.s_pad = s_pad
        self._uplim_bands = spec.uplim_bands
        self.use_chol = whiten is not None
        flux_p = np.concatenate([flux, np.repeat(flux[:1], pad, 0)], 0)
        self._flux = jnp.asarray(
            flux_p.reshape(self.ntiles, self.s_tile, nb), jnp.float32)
        self._iunc = self._pack_errors(unc, whiten)

        lim = np.zeros((2, 8), np.float32)
        # Fixed params: finite window CENTERED ON THE FIXED VALUE (see
        # prepare_lnprob_inputs -- a value-independent window floors
        # lnprob for fixed values outside it, e.g. alpha fixed at 0).
        fv = np.asarray(spec.fixed_values, np.float64)
        lim[0, :NPARAMS] = np.where(spec.fixed, fv - 1.0, spec.lower)
        lim[1, :NPARAMS] = np.where(spec.fixed, fv + 1.0, spec.upper)
        pri = np.zeros((2, 8), np.float32)
        pri[0, :NPARAMS] = spec.prior_mean
        pri[1, :NPARAMS] = spec.prior_isigma
        self._limits = jnp.asarray(lim)
        self._priors = jnp.asarray(pri)
        # Closure-only constants stay HOST numpy (a jnp closure constant
        # is fetched device->host at trace time; ~1 s per array over the
        # TPU tunnel). _limits/_priors/_flux/... are jit ARGUMENTS.
        self._template = np.asarray(self.free_space.template, np.float32)
        self._scatter = self.free_space.scatter_matrix(np.float32)

        self.cfg = dict(opthin=shape.opthin, noalpha=shape.noalpha,
                        nbands=nb, nnodes=self.nnodes,
                        wavenorm=shape.wavenorm, use_chol=self.use_chol)
        self._run_cache = {}
        # Fixed per-launch record cap (hw mode): one compiled program per
        # geometry serves any run length via <=rec_cap-record segments.
        self.rec_cap = 256

    _KEEP = object()    # set_data sentinel: "mask not given, keep current"

    def _pack_errors(self, unc, whiten):
        """(ntiles, s_tile, nb | nb*nb) error operand: signed inverse
        uncertainties (diagonal mode) or flattened per-source whitening
        matrices (correlated mode). Pad sources replicate source 0."""
        pad = self.s_pad - self.nsources
        nb = self.nbands
        if not self.use_chol and whiten is not None:
            raise ValueError(
                "this sampler was built with diagonal errors; rebuild "
                "it with whiten= to switch error models (the chi^2 "
                "structure is compiled in)")
        if self.use_chol:
            if whiten is None:
                raise ValueError(
                    "this sampler was built with correlated errors; "
                    "set_data needs the matching whiten= operand")
            w = np.asarray(whiten, np.float64).reshape(
                self.nsources, nb * nb)
            w_p = np.concatenate([w, np.repeat(w[:1], pad, 0)], 0)
            return jnp.asarray(
                w_p.reshape(self.ntiles, self.s_tile, nb * nb),
                jnp.float32)
        si = signed_iunc(unc, self._uplim_bands)
        si_p = np.concatenate([si, np.repeat(si[:1], pad, 0)], 0)
        return jnp.asarray(
            si_p.reshape(self.ntiles, self.s_tile, nb), jnp.float32)

    def set_data(self, flux, unc, uplim_bands=_KEEP, whiten=None):
        """Replace the per-source photometry (same S and band count). Flux,
        uncertainties, the upper-limit mask AND the whitening matrices
        are RUNTIME kernel operands (the mask rides the iunc sign), so
        this does not recompile -- the serving path for fitting
        successive batches. Pass `uplim_bands` ((nb,) or (S, nb) or
        None) to also replace the mask; omitting it keeps the current
        one. A sampler built with correlated errors needs the new
        batch's whiten= matrices."""
        flux = np.atleast_2d(np.asarray(flux, np.float64))
        unc = np.atleast_2d(np.asarray(unc, np.float64))
        nb = self.nbands
        if flux.shape != (self.nsources, nb) or unc.shape != flux.shape:
            raise ValueError(
                f"flux/unc must be ({self.nsources}, {nb})")
        flux = _sanitize_missing_flux(flux, unc)
        if uplim_bands is not FusedMultiPallasSampler._KEEP:
            if (self.use_chol and uplim_bands is not None
                    and np.asarray(uplim_bands).any()):
                raise ValueError(
                    "photometric upper limits do not compose with "
                    "correlated band errors")
            self._uplim_bands = uplim_bands
        pad = self.s_pad - self.nsources
        flux_p = np.concatenate([flux, np.repeat(flux[:1], pad, 0)], 0)
        self._flux = jnp.asarray(
            flux_p.reshape(self.ntiles, self.s_tile, nb), jnp.float32)
        self._iunc = self._pack_errors(unc, whiten)
        return self

    # -- state ------------------------------------------------------------------
    def init_state(self, key, p0) -> MultiSamplerState:
        """p0: (S, nwalkers, nfree). lnp is computed by the kernel on the
        first step, so it starts as zeros here."""
        p0 = jnp.asarray(p0, jnp.float32)
        if p0.shape != (self.nsources, self.nwalkers, self.ndim):
            raise ValueError(
                f"p0 shape {p0.shape} != "
                f"({self.nsources},{self.nwalkers},{self.ndim})")
        return MultiSamplerState(
            key=key, pos=p0,
            lnp=jnp.zeros((self.nsources, self.nwalkers), jnp.float32),
            naccept=jnp.zeros((self.nsources, self.nwalkers), jnp.int32),
            nsteps=jnp.array(0, jnp.int32))

    @staticmethod
    def reset_counters(state: MultiSamplerState) -> MultiSamplerState:
        return state._replace(naccept=jnp.zeros_like(state.naccept),
                              nsteps=jnp.zeros_like(state.nsteps))

    @staticmethod
    def acceptance_fraction(state: MultiSamplerState):
        denom = jnp.maximum(state.nsteps, 1)
        return state.naccept / denom

    # -- layout -----------------------------------------------------------------
    def _pack(self, pos, acc):
        """(S, nw, nfree) + (S, nw) -> (ntiles*16*s_tile, wp) kernel state.
        Pad sources replicate source 0; pad lanes replicate walker 0."""
        S, T_, st = self.s_pad, self.ntiles, self.s_tile
        pad_s = S - self.nsources
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[:1], (pad_s,) + pos.shape[1:])], 0)
        acc = jnp.concatenate(
            [acc, jnp.broadcast_to(acc[:1], (pad_s,) + acc.shape[1:])],
            0).astype(jnp.float32)
        full = self._template[None, None, :] + pos @ self._scatter.T
        # (S, nw, 5) -> halves (2, S, half, 5) -> quantities
        halves = jnp.stack([full[:, :self.half], full[:, self.half:]], 0)
        acc_h = jnp.stack([acc[:, :self.half], acc[:, self.half:]], 0)
        zeros = jnp.zeros_like(acc_h)
        quant = jnp.concatenate(
            [halves.transpose(0, 3, 1, 2),          # (2, 5, S, half)
             zeros[:, None], acc_h[:, None], zeros[:, None]], axis=1)
        # lane-pad to wp replicating walker 0
        padw = self.wp - self.half
        quant = jnp.concatenate(
            [quant, jnp.broadcast_to(quant[..., :1],
                                     quant.shape[:-1] + (padw,))], -1)
        # (2, 8, S, wp) -> tile-major (ntiles, 2*8*s_tile, wp)
        quant = quant.reshape(2, _NQ, T_, st, self.wp)
        quant = quant.transpose(2, 0, 1, 3, 4)
        return quant.reshape(T_, 2 * _NQ * st, self.wp)

    def _unpack(self, state_rows):
        """Inverse of _pack: (ntiles, 16*s_tile, wp) -> pos/lnp/acc."""
        T_, st = self.ntiles, self.s_tile
        q = state_rows.reshape(T_, 2, _NQ, st, self.wp)
        q = q.transpose(1, 2, 0, 3, 4).reshape(2, _NQ, self.s_pad, self.wp)
        q = q[..., :self.half]                       # strip lane pad
        free_idx = self.free_space.free_idx          # host numpy index
        pos = jnp.concatenate([q[0, free_idx], q[1, free_idx]],
                              axis=-1)               # (nfree, S, nw)
        pos = pos.transpose(1, 2, 0)[:self.nsources]
        lnp = jnp.concatenate([q[0, _Q_LNP], q[1, _Q_LNP]],
                              axis=-1)[:self.nsources]
        acc = jnp.concatenate([q[0, _Q_ACC], q[1, _Q_ACC]],
                              axis=-1)[:self.nsources].astype(jnp.int32)
        return pos, lnp, acc

    # -- the fused run ------------------------------------------------------------
    def _make_run(self, nrecord, thin):
        external = self.rng == "external"
        S, T_, wp = self.s_tile, self.ntiles, self.wp
        rows_tile = 2 * _NQ * S
        kernel = _make_multi_kernel(
            self.cfg, nfree=self.ndim, half=self.half, wp=wp, s_tile=S,
            thin=thin, a=self.a, external_rng=external,
            stub_rng=self.interpret and not external)
        nb = self.nbands

        mesh = self.mesh
        ndev = 1 if mesh is None else int(mesh.devices.size)
        t_local = T_ // ndev

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),               # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),               # thin
            pl.BlockSpec(memory_space=pltpu.SMEM),               # toff
            pl.BlockSpec((1, rows_tile, wp), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),               # state0
            pl.BlockSpec(memory_space=pltpu.SMEM),               # limits
            pl.BlockSpec(memory_space=pltpu.SMEM),               # priors
            pl.BlockSpec((1, S, nb), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),               # flux
            pl.BlockSpec((1, S, nb * nb if self.use_chol else nb),
                         lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),               # iunc/whiten
            pl.BlockSpec(memory_space=pltpu.VMEM),               # wnodes
            pl.BlockSpec(memory_space=pltpu.VMEM),               # rweights
        ]
        if external:
            in_specs.append(
                pl.BlockSpec((1, 1, 6 * thin * S, wp),
                             lambda t, i: (t, i, 0, 0),
                             memory_space=pltpu.VMEM))           # uniforms

        def local_call(toff, seed, thin_arr, state0, limits, priors, flux,
                       iunc, waves, rweights, uniforms=None):
            """One device's pallas_call over its local tiles."""
            tl = state0.shape[0]
            out_shapes = (
                jax.ShapeDtypeStruct((nrecord, tl, rows_tile, wp),
                                     jnp.float32),
                jax.ShapeDtypeStruct((tl, rows_tile, wp), jnp.float32),
            )
            out_specs = (
                pl.BlockSpec((1, 1, rows_tile, wp),
                             lambda t, i: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_tile, wp), lambda t, i: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            )
            args = [seed, thin_arr, toff, state0, limits, priors, flux,
                    iunc, waves, rweights]
            if external:
                args.append(uniforms)
            return pl.pallas_call(
                kernel,
                grid=(tl, nrecord),
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((rows_tile, wp), jnp.float32),
                    pltpu.VMEM((NPARAMS * S, wp), jnp.float32),
                ],
                interpret=self.interpret,
            )(*args)

        if mesh is not None:
            ax = mesh.axis_names[0]

            def sharded_call(seed, thin_arr, state0, limits, priors, flux,
                             iunc, waves, rweights, uniforms=None):
                toff = (jax.lax.axis_index(ax) * t_local)[None]
                return local_call(toff.astype(jnp.int32), seed, thin_arr,
                                  state0, limits, priors, flux, iunc,
                                  waves, rweights, uniforms)

            u_specs = ((P(ax, None, None, None),) if external else ())
            dispatch = jax.shard_map(
                sharded_call, mesh=mesh,
                in_specs=(P(None), P(None), P(ax, None, None),
                          P(None, None), P(None, None),
                          P(ax, None, None), P(ax, None, None),
                          P(None, None, None), P(None, None, None))
                         + u_specs,
                out_specs=(P(None, ax, None, None), P(ax, None, None)),
                check_vma=False)
        else:
            def dispatch(seed, thin_arr, state0, limits, priors, flux,
                         iunc, waves, rweights, uniforms=None):
                return local_call(jnp.zeros(1, jnp.int32), seed, thin_arr,
                                  state0, limits, priors, flux, iunc,
                                  waves, rweights, uniforms)

        def run(state: MultiSamplerState, thin_arr, limits, priors, flux,
                iunc, waves, rweights, uniforms=None):
            key, sub = jax.random.split(state.key)
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(sub, (2,), jnp.uint32), jnp.int32)
            state0 = self._pack(state.pos, state.naccept)
            if external:
                chain_r, state_f = dispatch(seed, thin_arr, state0,
                                            limits, priors, flux, iunc,
                                            waves, rweights, uniforms)
            else:
                chain_r, state_f = dispatch(seed, thin_arr, state0,
                                            limits, priors, flux, iunc,
                                            waves, rweights)

            # chain: (nrecord, T_, rows_tile, wp) -> per-record unpack
            pos_c, lnp_c, _ = jax.vmap(self._unpack)(chain_r)
            # (nrecord, S, nw, nfree) -> source-major
            chain = pos_c.transpose(1, 0, 2, 3)
            lnpchain = lnp_c.transpose(1, 0, 2)

            pos_f, lnp_f, acc_f = self._unpack(state_f)
            new_state = MultiSamplerState(
                key=key, pos=pos_f, lnp=lnp_f, naccept=acc_f,
                nsteps=state.nsteps + thin_arr[1] * thin_arr[0])
            return new_state, chain, lnpchain

        return jax.jit(run)

    def run_mcmc(self, state: MultiSamplerState, nsteps: int, thin: int = 1,
                 uniforms=None):
        """Advance nsteps updates for every source, recording every
        thin-th. Returns (state, chain (S, nrec, nw, nfree), lnpchain)."""
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if nsteps <= 0:
            raise ValueError("nsteps must be positive")
        nrecord = nsteps // thin
        cargs = (self._limits, self._priors, self._flux, self._iunc,
                 self._wnodes, self._rweights)
        if self.rng == "external":
            # legacy static path (tests)
            ck = (nrecord, thin)
            if ck not in self._run_cache:
                self._run_cache[ck] = self._make_run(nrecord, thin)
            if uniforms is None:
                raise ValueError("rng='external' requires a uniforms array")
            thin_arr = jnp.asarray([thin, nrecord], jnp.int32)
            return self._run_cache[ck](state, thin_arr, *cargs, uniforms)

        # hw mode: ONE program (grid cap) serves every (nsteps, thin);
        # longer runs stream through segments of <= rec_cap records.
        if uniforms is not None:
            raise ValueError(
                "uniforms= requires rng='external' at construction; the "
                "hardware-PRNG sampler would silently ignore the "
                "provided stream")
        if () not in self._run_cache:
            self._run_cache[()] = self._make_run(self.rec_cap, thin)
        run = self._run_cache[()]
        chains, lnps = [], []
        done = 0
        while done < nrecord:
            n = min(self.rec_cap, nrecord - done)
            state, chain, lnp = run(
                state, jnp.asarray([thin, n], jnp.int32), *cargs)
            chains.append(chain[:, :n])
            lnps.append(lnp[:, :n])
            done += n
        if len(chains) == 1:
            return state, chains[0], lnps[0]
        return (state, jnp.concatenate(chains, axis=1),
                jnp.concatenate(lnps, axis=1))

    def advance(self, state: MultiSamplerState, nsteps: int,
                uniforms=None) -> MultiSamplerState:
        state, _, _ = self.run_mcmc(state, nsteps, thin=nsteps,
                                    uniforms=uniforms)
        return state
