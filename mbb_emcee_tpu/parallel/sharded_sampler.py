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
                       a, ndim_free):
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

    def __init__(self, nwalkers: int, ndim: int, lnprob_fn, mesh: Mesh,
                 a: float = 2.0, dtype=jnp.float32):
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
        self._run_cache = {}

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

    # -- run --------------------------------------------------------------------
    def _make_run(self, nrecord: int, thin: int, record: bool):
        a, ndim = self.a, self.ndim
        lnprob_batch = self.lnprob_batch
        half = self.nwalkers // 2

        def body(key, pos_a, pos_b, lnp_a, lnp_b, nacc_a, nacc_b):
            # Everything below sees LOCAL walker blocks.
            def one_step(carry, _unused):
                key, pa, pb, la, lb, na, nb = carry
                key, k0, k1 = jax.random.split(key, 3)
                pa, la, acc_a = _sharded_half_step(
                    k0, pa, pb, la, lnprob_batch, a, ndim)
                pb, lb, acc_b = _sharded_half_step(
                    k1, pb, pa, lb, lnprob_batch, a, ndim)
                return (key, pa, pb, la, lb,
                        na + acc_a.astype(jnp.int32),
                        nb + acc_b.astype(jnp.int32)), None

            def record_block(carry, _unused):
                carry, _ = jax.lax.scan(one_step, carry, None, length=thin)
                _, pa, pb, la, lb, _, _ = carry
                return carry, (pa, pb, la, lb)

            carry = (key, pos_a, pos_b, lnp_a, lnp_b, nacc_a, nacc_b)
            if record:
                carry, (ca, cb, la_c, lb_c) = jax.lax.scan(
                    record_block, carry, None, length=nrecord)
            else:
                carry, _ = jax.lax.scan(one_step, carry, None,
                                        length=nrecord * thin)
                ca = cb = la_c = lb_c = jnp.zeros((0,), jnp.float32)
            key, pa, pb, la, lb, na, nb = carry
            return key, pa, pb, la, lb, na, nb, ca, cb, la_c, lb_c

        w = P(WALKER_AXIS, None)
        v = P(WALKER_AXIS)
        cw = P(None, WALKER_AXIS, None)
        cv = P(None, WALKER_AXIS)
        chain_specs = (cw, cw, cv, cv) if record else (P(), P(), P(), P())
        return jax.jit(jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), w, w, v, v, v, v),
            out_specs=(P(), w, w, v, v, v, v) + chain_specs))

    def _dispatch(self, state: SamplerState, nrecord, thin, record):
        key = (nrecord, thin, record)
        if key not in self._run_cache:
            self._run_cache[key] = self._make_run(nrecord, thin, record)
        nacc_a, nacc_b = state.naccept
        (k, pa, pb, la, lb, na, nb, ca, cb, lca, lcb) = self._run_cache[key](
            state.key, state.pos_a, state.pos_b, state.lnp_a, state.lnp_b,
            nacc_a, nacc_b)
        new_state = SamplerState(
            key=k, pos_a=pa, pos_b=pb, lnp_a=la, lnp_b=lb,
            naccept=(na, nb),
            nsteps=state.nsteps + nrecord * thin)
        if record:
            chain = jnp.concatenate([ca, cb], axis=1)
            lnpchain = jnp.concatenate([lca, lcb], axis=1)
            return new_state, chain, lnpchain
        return new_state, None, None

    def run_mcmc(self, state: SamplerState, nsteps: int, thin: int = 1):
        if nsteps % thin:
            raise ValueError("nsteps must be divisible by thin")
        return self._dispatch(state, nsteps // thin, thin, record=True)

    def advance(self, state: SamplerState, nsteps: int) -> SamplerState:
        state, _, _ = self._dispatch(state, nsteps, 1, record=False)
        return state

    @staticmethod
    def acceptance_fraction(state: SamplerState):
        counts = np.concatenate([np.asarray(c) for c in state.naccept])
        return counts / max(int(state.nsteps), 1)
