"""Walker-sharded affine-invariant sampler over a device mesh.

Each half-ensemble's walker axis is sharded over the 1-D mesh; every device
proposes and accepts for its local walker block. The only communication is
the all_gather of the complementary half's positions before each half-step
(nhalf x ndim fp32 -- a few KB at reference scale), which XLA lowers to an
ICI collective. Chains are emitted shard-resident, so a long production run
never materializes unsharded state.

PRNG: the scan carries one replicated key; each device folds in its mesh
index for its local draws, so results are deterministic for a fixed
(seed, n_devices) pair. The chain is NOT bitwise-identical to the
single-device sampler (different pairing streams) -- agreement is
statistical, which tests/test_parallel.py checks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mbb_emcee_tpu.parallel.mesh import WALKER_AXIS
from mbb_emcee_tpu.sampler import SamplerState


def _sharded_half_step(key_rep, active, passive, lnp_active, lnprob_batch,
                       a):
    """Update the local shard of one half against the gathered other half.
    Runs INSIDE shard_map; `active`/`passive`/`lnp_active` are local blocks,
    `key_rep` is the replicated per-step key."""
    from mbb_emcee_tpu.sampler import stretch_half_step_from_uniforms

    widx = jax.lax.axis_index(WALKER_AXIS)
    key = jax.random.fold_in(key_rep, widx)
    passive_full = jax.lax.all_gather(passive, WALKER_AXIS, axis=0,
                                      tiled=True)
    u3 = jax.random.uniform(key, (3, active.shape[0]), dtype=active.dtype)
    return stretch_half_step_from_uniforms(u3, active, passive_full,
                                           lnp_active, lnprob_batch, a)


class ShardedEnsembleSampler:
    """Same sampling semantics as sampler.EnsembleSampler, walker axis
    sharded over `mesh`. nwalkers/2 must divide the mesh size."""

    # Record cap of the single compiled run program (see _get_run).
    REC_CAP = 512

    def __init__(self, nwalkers: int, ndim: int, lnprob_fn, mesh: Mesh,
                 a: float = 2.0, dtype=jnp.float32, rec_cap=None):
        ndev = mesh.devices.size
        if nwalkers % 2:
            raise ValueError("nwalkers must be even")
        if (nwalkers // 2) % ndev:
            raise ValueError(
                f"half-ensemble size {nwalkers // 2} must divide the mesh "
                f"size {ndev}")
        if nwalkers < 2 * ndim:
            raise ValueError("need nwalkers >= 2*ndim")
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        self.a = float(a)
        self.mesh = mesh
        self.dtype = dtype
        if getattr(lnprob_fn, "is_batched", False):
            self.lnprob_batch = lnprob_fn
        else:
            self.lnprob_batch = jax.vmap(lnprob_fn)
        self.rec_cap = int(rec_cap) if rec_cap else self.REC_CAP
        self._run_dyn = None
        self.trace_count = 0

        self._half_sharding = NamedSharding(mesh, P(WALKER_AXIS, None))
        self._lnp_sharding = NamedSharding(mesh, P(WALKER_AXIS))

        # Sharded batched lnprob for state init.
        self._eval = jax.jit(jax.shard_map(
            self.lnprob_batch, mesh=mesh,
            in_specs=P(WALKER_AXIS, None), out_specs=P(WALKER_AXIS)))

    # -- state ------------------------------------------------------------------
    def init_state(self, key, p0) -> SamplerState:
        p0 = jnp.asarray(p0, self.dtype)
        if p0.shape != (self.nwalkers, self.ndim):
            raise ValueError("p0 shape mismatch")
        half = self.nwalkers // 2
        pos_a = jax.device_put(p0[:half], self._half_sharding)
        pos_b = jax.device_put(p0[half:], self._half_sharding)
        zeros_half = jax.device_put(jnp.zeros(half, jnp.int32),
                                    self._lnp_sharding)
        # Replicate the key over the mesh NOW: the mesh's explicit axis
        # types put shardings in the jit trace signature, so a single-
        # device fresh key vs the mesh-replicated key a run returns would
        # cost one extra trace+compile of the run program.
        key = jax.device_put(key, NamedSharding(self.mesh, P()))
        # naccept is kept as a (half_a, half_b) TUPLE so the counters stay
        # shard-resident (a concatenated view would need cross-shard
        # slicing at every dispatch).
        return SamplerState(
            key=key, pos_a=pos_a, pos_b=pos_b,
            lnp_a=self._eval(pos_a), lnp_b=self._eval(pos_b),
            naccept=(zeros_half, zeros_half),
            nsteps=jnp.array(0, jnp.int32))

    @staticmethod
    def reset_counters(state: SamplerState) -> SamplerState:
        return state._replace(
            naccept=jax.tree.map(jnp.zeros_like, state.naccept),
            nsteps=jnp.zeros_like(state.nsteps))

    def shard_state(self, state: SamplerState) -> SamplerState:
        """Re-apply init_state's sharding layout to a host-loaded state
        (checkpoint resume): feeding unsharded arrays into the run would
        pay an extra trace+compile (explicit-sharding avals) -- exactly
        the cost the single-program design exists to avoid."""
        nacc_a, nacc_b = state.naccept
        put_h = lambda x: jax.device_put(jnp.asarray(x, self.dtype),
                                         self._half_sharding)
        put_vf = lambda x: jax.device_put(jnp.asarray(x, self.dtype),
                                          self._lnp_sharding)
        put_vi = lambda x: jax.device_put(jnp.asarray(x, jnp.int32),
                                          self._lnp_sharding)
        return SamplerState(
            key=jax.device_put(state.key,
                               NamedSharding(self.mesh, P())),
            pos_a=put_h(state.pos_a), pos_b=put_h(state.pos_b),
            lnp_a=put_vf(state.lnp_a), lnp_b=put_vf(state.lnp_b),
            naccept=(put_vi(nacc_a), put_vi(nacc_b)),
            nsteps=state.nsteps)

    # -- run --------------------------------------------------------------------
    def _get_run(self):
        """ONE compiled shard_map program serves every (nsteps, thin)
        geometry: record count and thin factor are traced replicated
        scalars driving dynamic-bound fori_loops over rec_cap-record
        preallocated SHARD-LOCAL chain buffers -- the same capped-grid
        treatment EnsembleSampler._get_run got (per-geometry recompiles
        cost 1-400 s each over this environment's TPU tunnel, and a
        standard run() dispatches at least three geometries)."""
        if self._run_dyn is not None:
            return self._run_dyn
        a = self.a
        lnprob_batch = self.lnprob_batch
        rec_cap = self.rec_cap

        def body(nrec, thin, key, pos_a, pos_b, lnp_a, lnp_b,
                 nacc_a, nacc_b):
            # Everything below sees LOCAL walker blocks. Constant-
            # initialized buffers must be marked device-varying so the
            # fori_loop carry keeps a stable vma type across iterations.
            def vary(x):
                return jax.lax.pcast(x, (WALKER_AXIS,), to="varying")

            half_loc = pos_a.shape[0]
            chain_a = vary(jnp.zeros((rec_cap, half_loc, self.ndim),
                                     self.dtype))
            chain_b = vary(jnp.zeros((rec_cap, half_loc, self.ndim),
                                     self.dtype))
            lnpc_a = vary(jnp.zeros((rec_cap, half_loc), self.dtype))
            lnpc_b = vary(jnp.zeros((rec_cap, half_loc), self.dtype))

            def one_step(i, carry):
                key, pa, pb, la, lb, na, nb = carry
                key, k0, k1 = jax.random.split(key, 3)
                pa, la, acc_a = _sharded_half_step(
                    k0, pa, pb, la, lnprob_batch, a)
                pb, lb, acc_b = _sharded_half_step(
                    k1, pb, pa, lb, lnprob_batch, a)
                return (key, pa, pb, la, lb,
                        na + acc_a.astype(jnp.int32),
                        nb + acc_b.astype(jnp.int32))

            def record(r, carry):
                inner, ca, cb, lca, lcb = carry
                inner = jax.lax.fori_loop(0, thin, one_step, inner)
                _, pa, pb, la, lb, _, _ = inner
                ca = jax.lax.dynamic_update_index_in_dim(ca, pa, r, 0)
                cb = jax.lax.dynamic_update_index_in_dim(cb, pb, r, 0)
                lca = jax.lax.dynamic_update_index_in_dim(lca, la, r, 0)
                lcb = jax.lax.dynamic_update_index_in_dim(lcb, lb, r, 0)
                return inner, ca, cb, lca, lcb

            inner = (key, pos_a, pos_b, lnp_a, lnp_b, nacc_a, nacc_b)
            inner, chain_a, chain_b, lnpc_a, lnpc_b = jax.lax.fori_loop(
                0, nrec, record,
                (inner, chain_a, chain_b, lnpc_a, lnpc_b))
            key, pa, pb, la, lb, na, nb = inner
            return key, pa, pb, la, lb, na, nb, chain_a, chain_b, \
                lnpc_a, lnpc_b

        w = P(WALKER_AXIS, None)
        v = P(WALKER_AXIS)
        cw = P(None, WALKER_AXIS, None)
        cv = P(None, WALKER_AXIS)
        fn = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(), P(), w, w, v, v, v, v),
            out_specs=(P(), w, w, v, v, v, v, cw, cw, cv, cv))

        def traced_run(nrec, thin, *args):
            self.trace_count += 1
            return fn(nrec, thin, *args)

        self._run_dyn = jax.jit(traced_run)
        return self._run_dyn

    def _dispatch(self, state: SamplerState, nrecord, thin, record):
        run = self._get_run()
        nacc_a, nacc_b = state.naccept
        chains, lnps = [], []
        done = 0
        k, pa, pb, la, lb = (state.key, state.pos_a, state.pos_b,
                             state.lnp_a, state.lnp_b)
        while True:
            n = min(self.rec_cap, nrecord - done)
            (k, pa, pb, la, lb, nacc_a, nacc_b, ca, cb, lca, lcb) = run(
                jnp.asarray(n, jnp.int32), jnp.asarray(thin, jnp.int32),
                k, pa, pb, la, lb, nacc_a, nacc_b)
            if record:
                chains.append(jnp.concatenate([ca[:n], cb[:n]], axis=1))
                lnps.append(jnp.concatenate([lca[:n], lcb[:n]], axis=1))
            done += n
            if done >= nrecord:
                break
        new_state = SamplerState(
            key=k, pos_a=pa, pos_b=pb, lnp_a=la, lnp_b=lb,
            naccept=(nacc_a, nacc_b),
            nsteps=state.nsteps + nrecord * thin)
        if record:
            chain = (chains[0] if len(chains) == 1
                     else jnp.concatenate(chains, axis=0))
            lnpchain = (lnps[0] if len(lnps) == 1
                        else jnp.concatenate(lnps, axis=0))
            return new_state, chain, lnpchain
        return new_state, None, None

    def run_mcmc(self, state: SamplerState, nsteps: int, thin: int = 1):
        if nsteps % thin:
            raise ValueError("nsteps must be divisible by thin")
        if nsteps <= 0:
            raise ValueError("nsteps must be positive")
        return self._dispatch(state, nsteps // thin, thin, record=True)

    def advance(self, state: SamplerState, nsteps: int) -> SamplerState:
        """Advance without recording (burn-in): the same single compiled
        program, one record of `nsteps` thinned-away updates."""
        state, _, _ = self._dispatch(state, 1, nsteps, record=False)
        return state

    @staticmethod
    def acceptance_fraction(state: SamplerState):
        counts = np.concatenate([np.asarray(c) for c in state.naccept])
        return counts / max(int(state.nsteps), 1)
