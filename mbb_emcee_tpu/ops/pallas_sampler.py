"""Fully-fused Pallas TPU ensemble sampler: the ENTIRE MCMC run in one
kernel launch.

The XLA sampler (sampler.py) already fuses each ensemble update into one
XLA step, but at reference scale (250 walkers x 5 params) every update is
latency-bound: ~16 us/step of which most is op dispatch between the many
small HLOs inside the scan body. This kernel removes that floor by keeping
the whole sampling loop -- proposal RNG, partner gather, stretch move, the
fused MBB lnprob (ops/pallas_lnprob.py), accept/reject, and chain recording
-- resident in VMEM:

  * walkers ride the 128-wide lane dimension, one (8, W) block per half
    ensemble;
  * each half's ENTIRE state is packed into that one sublane-aligned tile:
    rows 0-4 the parameters, row 5 the walker's lnprob, row 6 its accept
    count. The step loop then carries exactly two aligned (8, W) tiles --
    narrow (1, W) values crossing the loop boundary lower to masked
    sub-tile read-modify-writes in Mosaic and cost MICROSECONDS each
    (measured: they dominated a naive version of this kernel);
  * proposal randomness comes from the TPU hardware PRNG
    (pltpu.prng_random_bits), seeded per (run-seed, grid-step) so chains
    are deterministic per seed;
  * the partner gather `passive[j]` is a one-hot matmul on the MXU
    (TPU-native gather: sel[j,k] = 1_{j = partner(k)}, partners =
    passive @ sel);
  * the step loop is an in-kernel fori_loop; the chain streams out through
    a 1-D grid, one (thin-step) record per grid index, so VMEM stays O(1)
    in chain length.

The reference's equivalent of this entire kernel is emcee's Python loop
over per-walker lnprob calls (ref: emcee.EnsembleSampler -- SURVEY.md C5).

For CPU/interpret-mode testing (the TPU interpreter stubs the hardware
PRNG), the kernel can instead consume a precomputed uniforms array
(rng="external"), which makes it reproducible against the XLA
stretch-move implementation consuming the same uniforms
(tests/test_pallas_sampler.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mbb_emcee_tpu.constants import NPARAMS
from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR
from mbb_emcee_tpu.ops.pallas_lnprob import (
    _make_lnp_compute, prepare_lnprob_inputs, _LANE)
from mbb_emcee_tpu.sampler import SamplerState

_NROWS = 8        # fp32 sublane tile: 5 params + lnp + acc + 1 spare
_ROW_LNP = 5      # packed row holding the walker's lnprob
_ROW_ACC = 6      # packed row holding the walker's accept count (f32)


def _round_up(n, m):
    return -(-n // m) * m


def _make_sampler_kernel(cfg, *, nfree, half, wp, thin, a, external_rng):
    """Kernel factory. Static: shape config `cfg` (see pallas_lnprob),
    free-dimension count (the z^{d-1} exponent), real walkers per half,
    padded lane width, stretch scale, RNG source.

    Steps per record AND record count: STATIC in external-rng mode (the
    uniforms/grid shapes depend on them), DYNAMIC in hw-rng mode -- the
    kernel reads `thin` and `nrec` from SMEM scalars, the grid is a fixed
    cap, and iterations at or beyond nrec do nothing. ONE compiled
    program therefore serves EVERY (nburn, nsteps, thin) of a geometry
    (each Mosaic compile costs minutes in this environment)."""
    compute_lnp = _make_lnp_compute(cfg)
    d_exp = float(nfree - 1)
    inv_a = 1.0 / a
    am1 = a - 1.0

    def kernel(seed_ref, thin_ref, state0_ref, limits_ref, prior_ref,
               flux_ref, whiten_ref, waves_ref, rweights_ref, *rest):
        if external_rng:
            u_ref, chain_ref, state_out_ref, state_scr = rest
        else:
            chain_ref, state_out_ref, state_scr = rest

        i = pl.program_id(0)
        # thin_ref holds [thin, nrec]; iterations past nrec are no-ops
        # (the fixed grid cap makes the program shape-independent of the
        # requested run length).
        active = True if external_rng else (i < thin_ref[1])

        if not external_rng:
            # Mosaic takes at most two seed words; fold the grid index into
            # the second so every record gets an independent stream.
            pltpu.prng_seed(seed_ref[0], seed_ref[1] + i)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        pmask = (lane < half).astype(jnp.float32)            # (1, wp)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (wp, wp), 0)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (_NROWS, wp), 0)
        is_lnp_row = row8 == _ROW_LNP
        is_acc_row = row8 == _ROW_ACC

        def lnprob(theta):
            return compute_lnp(theta, limits_ref, prior_ref, flux_ref,
                               whiten_ref, waves_ref, rweights_ref)

        @pl.when(i == 0)
        def _():
            # Load the initial state and recompute both halves' lnprob
            # IN-KERNEL, so callers never need the (expensive-to-compile)
            # standalone Pallas lnprob program to build a consistent state
            # -- init_state can store values from the cheap XLA likelihood.
            st = state0_ref[:, :]
            for h in range(2):
                blk = st[h * _NROWS:(h + 1) * _NROWS, :]
                lnp = lnprob(blk)                              # (1, wp)
                blk = jnp.where(is_lnp_row,
                                jnp.broadcast_to(lnp, (_NROWS, wp)), blk)
                state_scr[h * _NROWS:(h + 1) * _NROWS, :] = blk

        def half_update(active, passive, u3):
            """One half-ensemble stretch update on packed (8, wp) blocks.

            Rows 0-4 move; row 5 (lnp) / row 6 (acc) are recomputed and
            re-packed; the proposal garbage the move writes into rows 5-7
            is discarded by the pack-select. compute_lnp only reads rows
            0-4, so the packing never reaches the likelihood.
            """
            z = ((am1 * u3[0:1] + 1.0) ** 2) * inv_a
            j = jnp.minimum((u3[1:2] * half).astype(jnp.int32), half - 1)
            sel = (rows_iota == j).astype(jnp.float32)       # (wp, wp)
            # HIGHEST precision: the MXU's default bf16 pass would round
            # the gathered positions (still a valid MH kernel -- a rounded
            # partner is a deterministic function of the real one, so
            # reversibility holds -- but exactness keeps this gather
            # equivalent to the XLA sampler's).
            partners = jax.lax.dot_general(
                passive * pmask, sel,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # (8, wp)
            prop = partners + z * (active - partners)
            lnp_prop = lnprob(prop)
            lnp_active = active[_ROW_LNP:_ROW_LNP + 1, :]
            log_ratio = d_exp * jnp.log(z) + lnp_prop - lnp_active
            # Support guard: u can be exactly 0 in fp32 and log(0) = -inf
            # would accept an out-of-box proposal sitting at the finite
            # LNPROB_FLOOR (see likelihood.SUPPORT_FLOOR).
            accept = ((jnp.log(u3[2:3]) < log_ratio)
                      & (lnp_prop > SUPPORT_FLOOR))            # (1, wp)
            new_rows = jnp.where(accept, prop, active)
            new_lnp = jnp.where(accept, lnp_prop, lnp_active)
            new_acc = (active[_ROW_ACC:_ROW_ACC + 1, :]
                       + accept.astype(jnp.float32))
            return jnp.where(
                is_lnp_row, jnp.broadcast_to(new_lnp, (_NROWS, wp)),
                jnp.where(is_acc_row,
                          jnp.broadcast_to(new_acc, (_NROWS, wp)),
                          new_rows))

        # State lives in the (aligned) scratch tile across iterations with a
        # scalar loop carry: Mosaic keeps aligned full-tile ref reads/writes
        # cheap, while ARRAY loop carries (even aligned ones) are buffered
        # through memory at ~microseconds per iteration (measured).
        def step(t, carry):
            if external_rng:
                u = u_ref[0, pl.ds(6 * t, 6), :]              # (6, wp)
            else:
                bits = pltpu.prng_random_bits((6, wp))
                u = (jax.lax.shift_right_logical(bits, 8)
                     .astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25))
            block_a = half_update(state_scr[0:_NROWS, :],
                                  state_scr[_NROWS:, :], u[0:3])
            state_scr[0:_NROWS, :] = block_a
            block_b = half_update(state_scr[_NROWS:, :], block_a, u[3:6])
            state_scr[_NROWS:, :] = block_b
            return carry

        def work():
            jax.lax.fori_loop(0, thin if external_rng else thin_ref[0],
                              step, 0, unroll=False)
            state = state_scr[:, :]                           # (16, wp)
            chain_ref[0] = state
            # last ACTIVE iteration's write wins (the TPU grid runs
            # sequentially), so state_out holds the nrec-th record.
            state_out_ref[:, :] = state

        if external_rng:
            work()
        else:
            pl.when(active)(work)

    return kernel


class FusedPallasSampler:
    """Drop-in for sampler.EnsembleSampler (init_state / run_mcmc / advance
    / reset_counters / acceptance_fraction) whose whole run loop is a single
    pallas_call. Built from the likelihood problem directly (the lnprob is
    compiled INTO the kernel, so a callable cannot be swapped in).

    PRNG: the state's JAX key is split per launch to derive the kernel's
    hardware-PRNG seed, so the usual determinism contract holds (same seed
    -> bitwise-identical chains) but streams differ from the XLA sampler's.

    Accept counts ride a packed fp32 row, exact up to 2^24 steps per
    walker between reset_counters() calls.
    """

    # Fixed grid cap in hw mode: one compiled program per geometry serves
    # any run length; launches record at most this many chain blocks, and
    # run_mcmc segments longer requests across launches.
    REC_CAP = 512

    def __init__(self, nwalkers, phot, shape, spec, response_pack=None,
                 a=2.0, interpret=False, rng="hw", rec_cap=None):
        if nwalkers % 2:
            raise ValueError("nwalkers must be even")
        if rng not in ("hw", "external"):
            raise ValueError("rng must be 'hw' or 'external'")
        self.nwalkers = int(nwalkers)
        self.a = float(a)
        self.interpret = interpret
        self.rng = rng
        self.dtype = jnp.float32

        cfg, consts, free_space = prepare_lnprob_inputs(
            phot, shape, spec, response_pack=response_pack)
        self.cfg = cfg
        # Host copies feed closure constants (no trace-time device fetch);
        # the device copies are the kernel's jit ARGUMENTS (constant
        # operands to a pallas_call are poison -- see _make_run).
        self.np_consts = consts
        self.consts = {k: jnp.asarray(v) for k, v in consts.items()}
        self.free_space = free_space
        self.ndim = free_space.nfree
        if nwalkers < 2 * self.ndim:
            raise ValueError(
                f"nwalkers={nwalkers} < 2*ndim={2 * self.ndim}")

        self.half = self.nwalkers // 2
        self.wp = _round_up(self.half, _LANE)

        # Likelihood for init_state's stored lnp values: the portable XLA
        # build (compiles in ~1 s; the standalone Pallas lnprob program
        # took minutes of Mosaic compile on this TPU). The kernel
        # RECOMPUTES both halves' lnprob in-kernel at its first grid step,
        # so these values never enter the accept rule -- they exist for
        # user introspection and checkpointing.
        from mbb_emcee_tpu.likelihood import build_lnprob
        from mbb_emcee_tpu.checkpoint import (
            data_fingerprint, spec_fingerprint)
        from mbb_emcee_tpu.sampler import shared_program
        _lnprob_scalar, _ = build_lnprob(phot, shape, spec,
                                         response_pack=response_pack)
        # The init-state lnprob closes over the DATA, so its shared key
        # needs content fingerprints; the run program below does not
        # (data are jit arguments there).
        lnprob_tok = (
            "fused-init-lnprob",
            spec_fingerprint(spec, shape, a),
            data_fingerprint(phot.wave, phot.flux, phot.unc, phot.cov),
            None if response_pack is None
            else data_fingerprint(*response_pack))
        self.lnprob_batch = shared_program(
            lnprob_tok, lambda: jax.jit(jax.vmap(_lnprob_scalar)))

        self._run_cache = {}
        self.rec_cap = int(rec_cap) if rec_cap else self.REC_CAP
        # Cross-instance run-program identity (round 5): the kernel and
        # the surrounding jitted run are fully determined by the static
        # cfg, the free-space maps (closure constants of
        # _pack_half/_unpack_half), and the launch geometry -- the data
        # operands (flux/whiten/waves/...) are jit ARGUMENTS, so fused
        # samplers share traced programs even across DIFFERENT data.
        # Mosaic lowering over the tunneled TPU costs seconds per
        # instance; K-seed sweeps (the parity validator) and serving
        # loops pay it once.
        self._program_token = (
            "fused-run", tuple(sorted(self.cfg.items())),
            self.np_consts["template"].tobytes(),
            self.np_consts["scatter"].tobytes(),
            np.asarray(free_space.free_idx).tobytes(),
            self.nwalkers, self.a, self.rng, bool(interpret),
            self.rec_cap)

    # -- state management (mirrors EnsembleSampler) ---------------------------
    def init_state(self, key, p0) -> SamplerState:
        p0 = jnp.asarray(p0, self.dtype)
        if p0.shape != (self.nwalkers, self.ndim):
            raise ValueError(f"p0 shape {p0.shape} != "
                             f"({self.nwalkers},{self.ndim})")
        half = self.half
        lnp = self.lnprob_batch(p0)
        return SamplerState(
            key=key, pos_a=p0[:half], pos_b=p0[half:],
            lnp_a=lnp[:half], lnp_b=lnp[half:],
            naccept=jnp.zeros(self.nwalkers, jnp.int32),
            nsteps=jnp.array(0, jnp.int32))

    # -- layout helpers -------------------------------------------------------
    def _pack_half(self, pos_half, lnp_half, acc_half):
        """(half, nfree) free positions + (half,) lnp/acc -> packed (8, wp)
        block. Pad lanes replicate the LAST walker of the half (jnp.pad
        mode='edge'; they only need to stay finite through the kernel's
        matmul gather and are sliced off at unpack)."""
        template = self.np_consts["template"]
        scatter = self.np_consts["scatter"]
        full = template[None, :] + pos_half @ scatter.T        # (half, 5)
        pad = self.wp - self.half
        rows = jnp.concatenate(
            [full, lnp_half[:, None], acc_half[:, None],
             jnp.zeros((self.half, 1), jnp.float32)], axis=1)  # (half, 8)
        rows = jnp.pad(rows, ((0, pad), (0, 0)), mode="edge")
        return rows.T                                           # (8, wp)

    def _unpack_half(self, block):
        """Packed (8, wp) block -> (pos (half, nfree), lnp, acc)."""
        free_idx = self.free_space.free_idx          # host numpy index
        pos = block[free_idx, :self.half].T
        lnp = block[_ROW_LNP, :self.half]
        acc = block[_ROW_ACC, :self.half].astype(jnp.int32)
        return pos, lnp, acc

    # -- the fused run --------------------------------------------------------
    def _make_run(self, nrecord, thin):
        """Build the jitted run for `nrecord` chain records. `thin` is only
        compiled in for external-rng mode; in hw mode it is a runtime SMEM
        scalar and the returned callable takes it as its `thin` argument."""
        cfg = self.cfg
        wp, half, nfree = self.wp, self.half, self.ndim
        external = self.rng == "external"
        kernel = _make_sampler_kernel(
            cfg, nfree=nfree, half=half, wp=wp, thin=thin, a=self.a,
            external_rng=external)
        consts = self.np_consts
        nrows = int(consts["waves"].shape[0])   # flattened (R, 1) grids
        free_idx = self.free_space.free_idx     # host numpy index

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),               # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),               # thin
            pl.BlockSpec((2 * _NROWS, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),               # state0
            pl.BlockSpec(memory_space=pltpu.SMEM),               # limits
            pl.BlockSpec(memory_space=pltpu.SMEM),               # priors
            pl.BlockSpec(memory_space=pltpu.SMEM),               # flux
            pl.BlockSpec(memory_space=pltpu.SMEM),               # whiten
            pl.BlockSpec((nrows, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),               # waves
            pl.BlockSpec((nrows, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),               # rweights
        ]
        if external:
            in_specs.append(
                pl.BlockSpec((1, 6 * thin, wp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM))           # uniforms

        out_shapes = (
            jax.ShapeDtypeStruct((nrecord, 2 * _NROWS, wp), jnp.float32),
            jax.ShapeDtypeStruct((2 * _NROWS, wp), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, 2 * _NROWS, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _NROWS, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        )
        scratch = [pltpu.VMEM((2 * _NROWS, wp), jnp.float32)]

        def run(state: SamplerState, thin_arr, limits, priors, flux,
                whiten, waves, rweights, uniforms=None):
            # The constant operands arrive as jit ARGUMENTS, not closure
            # captures: XLA-constant operands to a pallas_call make the
            # in-kernel loop ~600x slower (measured 9 us/step vs 0.02 --
            # apparently constant operands get rematerialized against the
            # kernel rather than pinned in VMEM).
            key, sub = jax.random.split(state.key)
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(sub, (2,), jnp.uint32), jnp.int32)

            state0 = jnp.concatenate([
                self._pack_half(state.pos_a, state.lnp_a,
                                state.naccept[:half].astype(jnp.float32)),
                self._pack_half(state.pos_b, state.lnp_b,
                                state.naccept[half:].astype(jnp.float32)),
            ], axis=0)                                           # (16, wp)

            args = [seed, thin_arr, state0, limits, priors, flux, whiten,
                    waves, rweights]
            if external:
                args.append(uniforms)

            chain_r, state_f = pl.pallas_call(
                kernel,
                grid=(nrecord,),
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
                interpret=self.interpret,
            )(*args)

            # (nrecord, 16, wp) -> (nrecord, nwalkers, nfree) + lnp chain.
            ca = chain_r[:, :_NROWS, :]
            cb = chain_r[:, _NROWS:, :]
            chain = jnp.concatenate(
                [ca[:, free_idx, :half].transpose(0, 2, 1),
                 cb[:, free_idx, :half].transpose(0, 2, 1)], axis=1)
            lnpchain = jnp.concatenate(
                [ca[:, _ROW_LNP, :half], cb[:, _ROW_LNP, :half]], axis=1)

            pa, la, aa = self._unpack_half(state_f[:_NROWS, :])
            pb, lb, ab = self._unpack_half(state_f[_NROWS:, :])
            new_state = SamplerState(
                key=key, pos_a=pa, pos_b=pb, lnp_a=la, lnp_b=lb,
                naccept=jnp.concatenate([aa, ab]),
                nsteps=state.nsteps + thin_arr[1] * thin_arr[0])
            return new_state, chain, lnpchain

        return jax.jit(run)

    def _shared_run(self, cache_key, nrecord, thin):
        """Fetch-or-trace a run program through the module-level LRU
        (see _program_token); the per-instance _run_cache stays as an L1
        so the LRU is touched once per (instance, geometry)."""
        from mbb_emcee_tpu.sampler import shared_program
        return shared_program(self._program_token + (cache_key,),
                              lambda: self._make_run(nrecord, thin))

    def run_mcmc(self, state: SamplerState, nsteps: int, thin: int = 1,
                 uniforms=None):
        """Advance `nsteps` updates, recording every `thin`-th (same
        contract as EnsembleSampler.run_mcmc). `uniforms` (only in
        rng='external' mode): (nrecord, 6*thin, wp) in (0,1)."""
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if nsteps <= 0:
            raise ValueError("nsteps must be positive")
        if uniforms is not None and self.rng != "external":
            raise ValueError(
                "uniforms= requires rng='external'; the hardware-PRNG "
                "sampler would silently ignore the provided stream")
        nrecord = nsteps // thin
        c = self.consts
        cargs = (c["limits"], c["priors"], c["flux"], c["whiten"],
                 c["waves"], c["rweights"])

        if self.rng == "external":
            # legacy static path (tests): thin and nrecord are compiled in
            cache_key = (nrecord, thin)
            if cache_key not in self._run_cache:
                self._run_cache[cache_key] = self._shared_run(cache_key,
                                                              nrecord, thin)
            if uniforms is None:
                raise ValueError("rng='external' requires a uniforms array")
            thin_arr = jnp.asarray([thin, nrecord], jnp.int32)
            return self._run_cache[cache_key](state, thin_arr, *cargs,
                                              uniforms)

        # hw mode: ONE program (grid = rec_cap) serves every (nsteps,
        # thin); longer runs stream through segments of <= rec_cap
        # records. thin and the live record count ride an SMEM scalar.
        if () not in self._run_cache:
            self._run_cache[()] = self._shared_run((), self.rec_cap, thin)
        run = self._run_cache[()]
        chains, lnps = [], []
        done = 0
        while done < nrecord:
            n = min(self.rec_cap, nrecord - done)
            thin_arr = jnp.asarray([thin, n], jnp.int32)
            state, chain, lnp = run(state, thin_arr, *cargs)
            chains.append(chain[:n])
            lnps.append(lnp[:n])
            done += n
        if len(chains) == 1:
            return state, chains[0], lnps[0]
        return (state, jnp.concatenate(chains, axis=0),
                jnp.concatenate(lnps, axis=0))

    def advance(self, state: SamplerState, nsteps: int,
                uniforms=None) -> SamplerState:
        """Advance without keeping the chain (burn-in)."""
        state, _, _ = self.run_mcmc(state, nsteps, thin=nsteps,
                                    uniforms=uniforms)
        return state


# Share the stateless helpers with the XLA sampler (same SamplerState).
from mbb_emcee_tpu.sampler import EnsembleSampler as _ES  # noqa: E402

FusedPallasSampler.reset_counters = staticmethod(_ES.reset_counters)
FusedPallasSampler.acceptance_fraction = staticmethod(
    _ES.acceptance_fraction)
