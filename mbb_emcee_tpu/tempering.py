"""Parallel tempering (replica exchange) over the ensemble sampler.

ADDITIVE capability, not in the reference: upstream mbb_emcee runs one
emcee ensemble at temperature 1 -- which is exactly what mixes poorly on
the REAL T-lambda0 bimodality of optically-thick fits documented in
DESIGN.md (5-band photometry supports a cold/thick vs warm/thin
degeneracy; a single-temperature ensemble gets trapped in one mode for
thousands of steps).

TPU-native design: K temperature rungs x W walkers advance as ONE
(K, W)-shaped batch -- the per-rung stretch move is the same
Goodman-Weare half-ensemble update as sampler.py (vmapped over rungs
with per-rung inverse temperature in the acceptance), and the
replica-exchange phase proposes W independent swaps between each
adjacent rung pair (even pairs one step, odd pairs the next) with
probability min(1, exp((b_i - b_j)(lnp_j - lnp_i))). Everything is
fixed-shape; the whole run -- burn, swaps, chain recording, and the
running per-rung <lnprob> accumulators -- is one jitted program with the
capped-grid record treatment (traced record/thin scalars; see
EnsembleSampler._get_run), so one compile serves every geometry.

The tempered run yields the evidence for free, two ways:

* STEPPING-STONE (headline, `logz`): ln Z = sum_k ln E_{beta_{k+1}}
  [exp((beta_k - beta_{k+1}) lnL)], each ratio estimated from the HOTTER
  rung's samples with a streaming log-sum-exp accumulated on device.
  This is robust on real fit posteriors, where E_prior[lnL] is
  astronomically negative (chi-square at remote corners of a wide prior
  box reaches ~1e18): the exp() weights those corners to zero instead
  of letting them dominate.
* THERMODYNAMIC INTEGRATION (diagnostic, `logz_ti`): trapezoid of the
  per-rung <lnprob> over beta. Cheap cross-check; on wide-prior
  problems the beta ~ 0 end of the quadrature is unresolvable and the
  value can be garbage -- compare against `logz` before trusting it.

Prior convention matches nested.py: Z is w.r.t. the normalized uniform
box prior times any Gaussian prior factors as the likelihood applies
them. tests/test_tempering.py cross-checks both against the nested
sampler and the analytic value on a boxed Gaussian.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Support threshold: lnprob below this means "outside the box"
# (likelihood.LNPROB_FLOOR is -1e30). The box indicator must be enforced
# UNtempered -- at beta = 0 the rung must sample uniform-on-box, not
# uniform-on-everything (beta * FLOOR is 0 exactly there, so without the
# explicit check the hottest rung would accept out-of-box proposals and
# poison the thermodynamic-integration accumulators).
from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR as _SUPPORT_FLOOR


class PTState(NamedTuple):
    """Tempered ensemble state. Positions (K, W, d); lnp is the UNtempered
    lnprob (tempering lives in the acceptance rules)."""
    key: jax.Array
    pos: jax.Array          # (K, W, d)
    lnp: jax.Array          # (K, W)
    naccept: jax.Array      # (K, W) int32 move acceptances
    nswap: jax.Array        # (K-1,) int32 accepted swaps per adjacent pair
    nswap_prop: jax.Array   # (K-1,) int32 proposed swaps per adjacent pair
    nsteps: jax.Array       # () int32


def auto_ladder_batch(worst_lnl, nrungs_min=12, nrungs_max=48, target=3.0):
    """Batched auto_ladder: per-source geometric ladders (S, K) sharing
    ONE static rung count K -- the largest any source needs -- so a
    whole batch of tempered fits stays a single fixed-shape device
    program while each source gets a beta_min matched to ITS likelihood
    scale (betas are runtime operands, not compiled constants)."""
    worst = np.clip(np.abs(np.asarray(worst_lnl, np.float64)),
                    1.0, 1e25).ravel()
    beta_min = np.minimum(1e-2, target / worst)          # (S,)
    decades = np.log10(1.0 / beta_min)
    nrungs = int(np.clip(2 + np.ceil(2.0 * decades.max()),
                         nrungs_min, nrungs_max))
    expo = np.linspace(0.0, 1.0, nrungs - 1)[None, :]    # 1 -> beta_min
    b = np.power(beta_min[:, None], expo)                # (S, K-1)
    return np.concatenate([b, np.zeros((b.shape[0], 1))], axis=1)


class SSStats(NamedTuple):
    """Streaming stepping-stone accumulators per adjacent rung pair
    (K-1,): running max M of v = dbeta * lnL over the hotter rung's
    recorded samples, scaled sums S1 = sum exp(v - M) and
    S2 = sum exp(2(v - M)), and the sample count n."""
    m: np.ndarray
    s1: np.ndarray
    s2: np.ndarray
    n: float

    def merge(self, other):
        m = np.maximum(self.m, other.m)
        sa, sb = np.exp(self.m - m), np.exp(other.m - m)
        return SSStats(m, self.s1 * sa + other.s1 * sb,
                       self.s2 * sa ** 2 + other.s2 * sb ** 2,
                       self.n + other.n)

    def logz(self):
        """(lnZ, naive MC error): sum of per-pair log ratios over the
        LAST axis (so (K-1,) accumulators give scalars and batched
        (S, K-1) accumulators give per-source (S,) vectors); the error
        propagates each ratio's variance-of-the-mean in quadrature
        (walker/step autocorrelation not corrected -- treat as a
        lower bound)."""
        m1 = self.s1 / self.n
        ln_r = self.m + np.log(self.s1) - np.log(self.n)
        var_mean = np.maximum(self.s2 / self.n - m1 ** 2, 0.0) / self.n
        rel = np.sqrt(var_mean) / m1
        return ln_r.sum(axis=-1), np.sqrt(np.sum(rel ** 2, axis=-1))


def ss_stream_update(m, s1, s2, dbeta, lnp_hot):
    """One streaming-logsumexp update of the stepping-stone accumulators.

    ``v = dbeta * lnL`` over the HOTTER rung's walkers; (m, s1, s2) are the
    running per-pair max / sum(e) / sum(e^2) that SSStats consumes. Shapes:
    dbeta (K-1,), lnp_hot (K-1, W), accumulators (K-1,). Traced-jnp and
    shared by the single-fit PT run and the batched MultiFitter.run_pt so
    the two evidence paths cannot drift numerically."""
    v = dbeta[:, None] * lnp_hot.astype(jnp.float32)
    newm = jnp.maximum(m, v.max(axis=1))
    scale = jnp.where(jnp.isfinite(m), jnp.exp(m - newm), 0.0)
    e = jnp.exp(v - newm[:, None])
    s1 = s1 * scale + e.sum(axis=1)
    s2 = s2 * scale ** 2 + (e * e).sum(axis=1)
    return newm, s1, s2


@dataclasses.dataclass
class PTResult:
    """Cold-chain samples + evidence (stepping-stone headline, TI check)."""
    chain: np.ndarray            # (nrec, W, d) cold (beta=1) rung
    lnprob: np.ndarray           # (nrec, W)
    betas: np.ndarray            # (K,) descending, betas[0] = 1, betas[-1]=0
    acceptance_fraction: np.ndarray   # (K, W)
    swap_fraction: np.ndarray    # (K-1,) accepted/proposed per pair
    mean_lnp: np.ndarray         # (K,) production <lnprob> per rung
    logz: float                  # stepping-stone evidence (robust)
    logz_err: float              # its naive MC error
    logz_ti: float               # trapezoid of mean_lnp over beta (check)
    logz_ti_err: float           # half the |trap - left-Riemann| spread


def geometric_ladder(nrungs, beta_min=1e-3):
    """(K,) descending inverse temperatures: 1 -> beta_min geometrically,
    plus an exact beta = 0 rung (the uniform-box prior end the TI
    quadrature needs)."""
    if nrungs < 3:
        raise ValueError("nrungs must be >= 3 (cold, >=1 warm, beta=0)")
    b = np.geomspace(1.0, beta_min, nrungs - 1)
    return np.concatenate([b, [0.0]])


def auto_ladder(worst_lnl, nrungs_min=12, nrungs_max=48, target=3.0):
    """Ladder sized so the evidence path is resolvable: beta_min such
    that beta_min * |worst sampled lnL| ~= `target` (the hottest
    nonzero rung still overlaps the uniform-box rung), and enough
    rungs that each geometric stone spans ~half a decade of beta --
    keeping every stepping-stone exponent spread O(1). With wide prior
    boxes |lnL| reaches 1e6..1e18 at the corners; a FIXED beta_min
    ladder leaves the beta ~ 0 end unbridgeable and the stepping-stone
    estimate biased low by thousands of nats (measured; see
    tests/test_tempering.py::test_evidence_wide_prior)."""
    worst = float(np.clip(abs(float(worst_lnl)), 1.0, 1e25))
    beta_min = float(min(1e-2, target / worst))
    decades = np.log10(1.0 / beta_min)
    nrungs = int(np.clip(2 + np.ceil(2.0 * decades),
                         nrungs_min, nrungs_max))
    return geometric_ladder(nrungs, beta_min)


def _tempered_half(u3, active, passive, lnp_active, lnprob_batch, betas, a):
    """Per-rung stretch half-step with tempered acceptance. Shapes:
    active/passive (K, n, d), lnp_active (K, n), betas (K,). Reuses the
    untempered kernel per-rung by folding beta into the lnprob values it
    compares (beta * lnp is the tempered log-density; the z^(d-1) factor
    is temperature-independent)."""
    K, n, ndim = active.shape
    z = ((a - 1.0) * u3[0] + 1.0) ** 2 / a          # (K, n)
    j = jnp.minimum((u3[1] * n).astype(jnp.int32), n - 1)
    partners = jnp.take_along_axis(passive, j[:, :, None], axis=1)
    proposal = partners + z[:, :, None] * (active - partners)
    lnp_prop = lnprob_batch(proposal.reshape(K * n, ndim)).reshape(K, n)
    log_ratio = ((ndim - 1) * jnp.log(z)
                 + betas[:, None] * (lnp_prop - lnp_active))
    accept = (jnp.log(u3[2]) < log_ratio) & (lnp_prop > _SUPPORT_FLOOR)
    new_active = jnp.where(accept[:, :, None], proposal, active)
    new_lnp = jnp.where(accept, lnp_prop, lnp_active)
    return new_active, new_lnp, accept


def pt_step(state: PTState, lnprob_batch, betas, a=2.0,
            swap_parity=0) -> PTState:
    """One tempered ensemble update (both half-ensembles across all rungs)
    followed by one replica-exchange phase over adjacent rung pairs of
    the given parity (even pairs (0,1),(2,3),... or odd (1,2),(3,4),...)."""
    K, W, ndim = state.pos.shape
    half = W // 2
    key, km, ks = jax.random.split(state.key, 3)

    u = jax.random.uniform(km, (3, K, W), dtype=state.pos.dtype)
    pos_a, lnp_a, acc_a = _tempered_half(
        u[:, :, :half], state.pos[:, :half], state.pos[:, half:],
        state.lnp[:, :half], lnprob_batch, betas, a)
    pos_b, lnp_b, acc_b = _tempered_half(
        u[:, :, half:], state.pos[:, half:], pos_a,
        state.lnp[:, half:], lnprob_batch, betas, a)
    pos = jnp.concatenate([pos_a, pos_b], axis=1)
    lnp = jnp.concatenate([lnp_a, lnp_b], axis=1)
    naccept = state.naccept + jnp.concatenate(
        [acc_a, acc_b], axis=1).astype(jnp.int32)

    # Replica exchange: pairs (i, i+1) with i of the step's parity. For
    # each pair, all W walkers propose independent swaps.
    us = jax.random.uniform(ks, (K - 1, W), dtype=state.pos.dtype)
    dbeta = betas[:-1] - betas[1:]                   # (K-1,)
    dlnp = lnp[1:] - lnp[:-1]                        # (K-1, W)
    pair_on = (jnp.arange(K - 1) % 2) == (swap_parity % 2)
    accept_swap = (jnp.log(us) < dbeta[:, None] * dlnp) & pair_on[:, None]

    # Apply swaps without in-place scatter: each rung i exchanges with
    # i+1 where accept_swap[i] (only non-overlapping pairs are active,
    # so a rung participates in at most one pair this step).
    take_up = jnp.zeros((K, W), bool)
    take_up = take_up.at[:-1].set(accept_swap)       # rung i takes from i+1
    take_dn = jnp.zeros((K, W), bool)
    take_dn = take_dn.at[1:].set(accept_swap)        # rung i+1 takes from i
    pos_up = jnp.concatenate([pos[1:], pos[-1:]], axis=0)
    pos_dn = jnp.concatenate([pos[:1], pos[:-1]], axis=0)
    lnp_up = jnp.concatenate([lnp[1:], lnp[-1:]], axis=0)
    lnp_dn = jnp.concatenate([lnp[:1], lnp[:-1]], axis=0)
    new_pos = jnp.where(take_up[:, :, None], pos_up,
                        jnp.where(take_dn[:, :, None], pos_dn, pos))
    new_lnp = jnp.where(take_up, lnp_up, jnp.where(take_dn, lnp_dn, lnp))

    nswap = state.nswap + accept_swap.sum(axis=1).astype(jnp.int32)
    nswap_prop = state.nswap_prop + (
        pair_on.astype(jnp.int32) * jnp.int32(W))
    return PTState(key=key, pos=new_pos, lnp=new_lnp, naccept=naccept,
                   nswap=nswap, nswap_prop=nswap_prop,
                   nsteps=state.nsteps + 1)


class ParallelTemperingSampler:
    """Driver owning the jitted tempered run (capped-grid records: one
    compiled program per (K, W, d) geometry serves every
    (nburn, nsteps, thin))."""

    REC_CAP = 256

    def __init__(self, nwalkers, ndim, lnprob_fn, betas, a=2.0,
                 dtype=jnp.float32, rec_cap=None):
        if nwalkers % 2:
            raise ValueError("nwalkers must be even")
        betas = np.asarray(betas, np.float64)
        if betas[0] != 1.0 or np.any(np.diff(betas) >= 0):
            raise ValueError("betas must start at 1.0 and strictly decrease")
        if betas[-1] != 0.0:
            # The stepping-stone sum telescopes to ln Z(1) - ln Z(beta_min);
            # only a terminal beta = 0 rung makes the reference term vanish
            # (Z(0) = 1 for the normalized box prior), which is the contract
            # PTResult.logz documents. A ladder stopping above 0 would be
            # silently biased by ln Z(beta_min) -- many nats on wide priors.
            raise ValueError(
                "betas must end at exactly 0.0 (the uniform-box prior rung "
                "the evidence is measured against); append a 0 rung or use "
                "geometric_ladder()/auto_ladder()")
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        self.nrungs = betas.size
        self.betas = betas
        self.a = float(a)
        self.dtype = dtype
        if getattr(lnprob_fn, "is_batched", False):
            self.lnprob_batch = lnprob_fn
        else:
            self.lnprob_batch = jax.vmap(lnprob_fn)
        self.rec_cap = int(rec_cap) if rec_cap else self.REC_CAP
        self._run_dyn = None
        self.trace_count = 0

    def init_state(self, key, p0) -> PTState:
        """p0: (K, W, d) initial positions, every rung populated."""
        p0 = jnp.asarray(p0, self.dtype)
        if p0.shape != (self.nrungs, self.nwalkers, self.ndim):
            raise ValueError(
                f"p0 shape {p0.shape} != "
                f"({self.nrungs},{self.nwalkers},{self.ndim})")
        lnp = self.lnprob_batch(
            p0.reshape(-1, self.ndim)).reshape(self.nrungs, self.nwalkers)
        return PTState(
            key=key, pos=p0, lnp=lnp,
            naccept=jnp.zeros((self.nrungs, self.nwalkers), jnp.int32),
            nswap=jnp.zeros(self.nrungs - 1, jnp.int32),
            nswap_prop=jnp.zeros(self.nrungs - 1, jnp.int32),
            nsteps=jnp.array(0, jnp.int32))

    @staticmethod
    def reset_counters(state: PTState) -> PTState:
        return state._replace(
            naccept=jnp.zeros_like(state.naccept),
            nswap=jnp.zeros_like(state.nswap),
            nswap_prop=jnp.zeros_like(state.nswap_prop),
            nsteps=jnp.zeros_like(state.nsteps))

    def set_betas(self, betas):
        """Swap the temperature ladder WITHOUT recompiling (betas is a
        traced argument of the jitted run). The rung count must match;
        for a different K build a new sampler."""
        betas = np.asarray(betas, np.float64)
        if betas.size != self.nrungs:
            raise ValueError(
                f"betas size {betas.size} != nrungs {self.nrungs}")
        if betas[0] != 1.0 or np.any(np.diff(betas) >= 0):
            raise ValueError("betas must start at 1.0 and strictly decrease")
        if betas[-1] != 0.0:
            # The stepping-stone sum telescopes to ln Z(1) - ln Z(beta_min);
            # only a terminal beta = 0 rung makes the reference term vanish
            # (Z(0) = 1 for the normalized box prior), which is the contract
            # PTResult.logz documents. A ladder stopping above 0 would be
            # silently biased by ln Z(beta_min) -- many nats on wide priors.
            raise ValueError(
                "betas must end at exactly 0.0 (the uniform-box prior rung "
                "the evidence is measured against); append a 0 rung or use "
                "geometric_ladder()/auto_ladder()")
        self.betas = betas

    def _get_run(self):
        if self._run_dyn is not None:
            return self._run_dyn
        rec_cap, W, K, d = self.rec_cap, self.nwalkers, self.nrungs, self.ndim

        def run(state, nrec, thin, betas):
            dbeta = (betas[:-1] - betas[1:]).astype(jnp.float32)  # (K-1,)
            chain_buf = jnp.zeros((rec_cap, W, d), self.dtype)
            lnp_buf = jnp.zeros((rec_cap, W), self.dtype)
            # per-rung running sums of lnprob over recorded states (TI)
            lnp_sum = jnp.zeros((K,), jnp.float32)
            # stepping-stone streaming logsumexp per adjacent pair
            ss_m = jnp.full((K - 1,), -jnp.inf, jnp.float32)
            ss_s1 = jnp.zeros((K - 1,), jnp.float32)
            ss_s2 = jnp.zeros((K - 1,), jnp.float32)

            def one(i, s):
                return pt_step(s, self.lnprob_batch, betas, self.a,
                               swap_parity=i)

            def record(r, carry):
                s, cb, lb, acc, m, s1, s2 = carry
                s = jax.lax.fori_loop(s.nsteps, s.nsteps + thin,
                                      lambda i, ss: one(i, ss), s)
                cb = jax.lax.dynamic_update_index_in_dim(cb, s.pos[0], r, 0)
                lb = jax.lax.dynamic_update_index_in_dim(lb, s.lnp[0], r, 0)
                acc = acc + s.lnp.mean(axis=1).astype(jnp.float32)
                m, s1, s2 = ss_stream_update(m, s1, s2, dbeta, s.lnp[1:])
                return s, cb, lb, acc, m, s1, s2

            state, chain_buf, lnp_buf, lnp_sum, ss_m, ss_s1, ss_s2 = (
                jax.lax.fori_loop(
                    0, nrec, record,
                    (state, chain_buf, lnp_buf, lnp_sum,
                     ss_m, ss_s1, ss_s2)))
            return state, chain_buf, lnp_buf, lnp_sum, ss_m, ss_s1, ss_s2

        def traced_run(state, nrec, thin, betas):
            self.trace_count += 1
            return run(state, nrec, thin, betas)

        self._run_dyn = jax.jit(traced_run)
        return self._run_dyn

    def _betas_dev(self):
        return jnp.asarray(self.betas, self.dtype)

    def run_mcmc(self, state: PTState, nsteps, thin=1):
        """Advance `nsteps` tempered updates recording every `thin`-th cold
        state; returns (state, chain, lnpchain, (lnp_mean_per_rung,
        SSStats))."""
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if nsteps <= 0:
            raise ValueError("nsteps must be positive")
        nrecord = nsteps // thin
        run = self._get_run()
        chains, lnps = [], []
        lnp_sum = np.zeros(self.nrungs)
        ss = SSStats(np.full(self.nrungs - 1, -np.inf),
                     np.zeros(self.nrungs - 1),
                     np.zeros(self.nrungs - 1), 0.0)
        done = 0
        while done < nrecord:
            n = min(self.rec_cap, nrecord - done)
            state, cb, lb, ls, sm, s1, s2 = run(
                state, jnp.asarray(n, jnp.int32),
                jnp.asarray(thin, jnp.int32), self._betas_dev())
            chains.append(cb[:n])
            lnps.append(lb[:n])
            lnp_sum += np.asarray(ls, np.float64)
            ss = ss.merge(SSStats(np.asarray(sm, np.float64),
                                  np.asarray(s1, np.float64),
                                  np.asarray(s2, np.float64),
                                  float(n * self.nwalkers)))
            done += n
        chain = (chains[0] if len(chains) == 1
                 else jnp.concatenate(chains, axis=0))
        lnp = lnps[0] if len(lnps) == 1 else jnp.concatenate(lnps, axis=0)
        return state, chain, lnp, (lnp_sum / nrecord, ss)

    def advance(self, state: PTState, nsteps):
        state = self._get_run()(
            state, jnp.asarray(1, jnp.int32),
            jnp.asarray(nsteps, jnp.int32), self._betas_dev())[0]
        return state


def thermodynamic_logz(betas, mean_lnp):
    """Trapezoid of E_beta[lnprob] d(beta) over the descending ladder
    (last axis; batched leading axes broadcast, so (S, K) inputs give
    per-source (S,) results). Error proxy: |trapezoid - left-Riemann|
    / 2 per interval, summed -- a discretization-scale bound, not an
    MC error."""
    b = np.asarray(betas, np.float64)[..., ::-1]     # ascending 0 -> 1
    m = np.asarray(mean_lnp, np.float64)[..., ::-1]
    db = np.diff(b, axis=-1)
    per_trap = 0.5 * (m[..., 1:] + m[..., :-1]) * db
    trap = np.sum(per_trap, axis=-1)
    # Sum of PER-INTERVAL |trap - left| (as documented): summing first
    # and differencing lets opposite-signed interval errors cancel,
    # under-reporting the discretization error whenever mean_lnp is
    # non-monotonic in beta (noisy hot rungs on wide-prior fits).
    err = np.sum(np.abs(per_trap - m[..., :-1] * db), axis=-1) / 2.0
    return trap, err


def pt_sample(lnprob, p0, key, betas=None, nrungs=12, beta_min="auto",
              nburn=200, nsteps=1000, thin=1, a=2.0,
              dtype=jnp.float32) -> PTResult:
    """Convenience front end: temper `lnprob` (scalar, free space) over a
    geometric ladder, burn, then sample. p0: (W, d) cold-start positions
    replicated to every rung (hot rungs disperse during burn-in).

    beta_min="auto" (default) sizes the ladder from the data in two
    phases: burn on a scouting ladder, read the worst lnL the hot rungs
    actually visit, rebuild via auto_ladder() so the beta ~ 0 end of
    the evidence path is resolvable (see auto_ladder), re-burn, then
    sample. Pass a float to pin beta_min (nrungs then fixed too)."""
    p0 = jnp.asarray(p0, dtype)
    W, d = p0.shape
    adapt = betas is None and beta_min == "auto"
    if betas is None:
        betas = geometric_ladder(nrungs, 1e-2 if adapt else beta_min)
    samp = ParallelTemperingSampler(W, d, lnprob, betas, a=a, dtype=dtype)
    state = samp.init_state(key, jnp.broadcast_to(p0, (samp.nrungs, W, d)))
    state = samp.advance(state, int(nburn))
    if adapt:
        lnp = np.asarray(state.lnp, np.float64)
        inside = lnp[lnp > _SUPPORT_FLOOR]
        # every walker at/below the support floor (pathological data in
        # fp32): fall back to a conservative ladder instead of crashing
        # on an empty .min() -- same guard as MultiFitter.run_pt's
        # batched twin
        worst = inside.min() if inside.size else -1e6
        new_betas = auto_ladder(worst, nrungs_min=nrungs)
        if new_betas.size == samp.nrungs:
            samp.set_betas(new_betas)        # no recompile
            betas = new_betas
        else:
            # K changed (different-size ladders are never equal):
            # seed the new ladder's rungs from the nearest
            # old rung's walkers (each is ~equilibrated at a nearby
            # temperature), then a short re-burn settles the rest.
            nearest = np.abs(
                np.log10(np.maximum(new_betas, 1e-30))[:, None]
                - np.log10(np.maximum(betas, 1e-30))[None, :]).argmin(1)
            pos0 = jnp.asarray(np.asarray(state.pos)[nearest])
            betas = new_betas
            samp = ParallelTemperingSampler(W, d, lnprob, betas, a=a,
                                            dtype=dtype)
            key = jax.random.split(state.key)[0]
            state = samp.init_state(key, pos0)
        state = samp.advance(state, max(int(nburn) // 2, 50))
    state = samp.reset_counters(state)
    state, chain, lnp, (mean_lnp, ss) = samp.run_mcmc(
        state, int(nsteps), thin)
    logz_ss, dz_ss = ss.logz()
    logz_ti, dz_ti = thermodynamic_logz(betas, mean_lnp)
    denom = np.maximum(np.asarray(state.nswap_prop), 1)
    return PTResult(
        chain=np.asarray(chain), lnprob=np.asarray(lnp),
        betas=np.asarray(betas),
        acceptance_fraction=np.asarray(state.naccept)
        / max(int(state.nsteps), 1),
        swap_fraction=np.asarray(state.nswap) / denom,
        mean_lnp=np.asarray(mean_lnp), logz=float(logz_ss),
        logz_err=float(dz_ss), logz_ti=float(logz_ti),
        logz_ti_err=float(dz_ti))
