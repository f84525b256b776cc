"""JAX-native affine-invariant ensemble sampler (Goodman & Weare 2010).

First-class rebuild of the external engine the reference wraps
(ref: emcee.EnsembleSampler stretch move -- SURVEY.md C5): the reference
drives per-walker Python lnprob calls through an optional multiprocessing
pool; here ONE full-ensemble update is a single fused XLA step and a whole
run is one lax.scan with the chain written to a preallocated HBM buffer.

Move (red-black half-ensemble update, a = 2 by default):
    split ensemble into halves A, B
    for each walker k in the active half, pick random j in the other half,
    draw z ~ g(z) propto 1/sqrt(z) on [1/a, a] via inverse CDF
        z = ((a-1) u + 1)^2 / a
    propose Y = X_j + z (X_k - X_j)
    accept with min(1, z^(d-1) e^(lnP(Y) - lnP(X_k))),  d = n_free dims

Both halves update per step (B sees A's already-updated positions, exactly
as emcee orders it). PRNG is jax.random key-splitting: a fixed seed gives a
bitwise-deterministic chain (SURVEY.md test plan item 4).

Multi-chip scaling lives in parallel/sharded_sampler.py; this module is the
single-device core it reuses.
"""

from __future__ import annotations

import collections
from functools import partial
from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mbb_emcee_tpu.likelihood import SUPPORT_FLOOR


# Cross-instance traced-program LRU (round 5, mirroring
# batchengine._PROGRAM_CACHE): tracing + lowering a run loop is pure
# single-threaded Python work that re-runs for EVERY sampler instance
# even when the XLA persistent cache makes the backend compile free
# (~1 s per MBBFitter on CPU; several seconds of Mosaic work per fused
# sampler over the TPU tunnel). Callers opt in by passing a
# program_token that, together with the sampler's own geometry key,
# FULLY determines the traced computation -- for closures over data
# that means a content fingerprint of every closure constant
# (checkpoint.data_fingerprint / spec_fingerprint). Bounded LRU:
# traced programs pin their closure constants on device.
_PROGRAM_LRU = collections.OrderedDict()
_PROGRAM_LRU_CAP = 256


def shared_program(key, build, cache=None, cap=None):
    """Fetch-or-build in a bounded module-level LRU.

    Default cache is the traced-program LRU above; batchengine's
    _PROGRAM_CACHE and photoz's model memo reuse this helper (same
    eviction semantics everywhere) by passing their own OrderedDict."""
    if cache is None:
        cache = _PROGRAM_LRU
    if cap is None:
        cap = _PROGRAM_LRU_CAP
    hit = cache.get(key)
    if hit is not None:
        cache.move_to_end(key)
        return hit
    fn = build()
    cache[key] = fn
    while len(cache) > cap:
        cache.popitem(last=False)
    return fn


class SamplerState(NamedTuple):
    """Ensemble state. Positions are in the sampling (free-parameter) space.

    Stored as the two half-ensembles so the multi-chip path can shard each
    half over the walker mesh axis independently.
    """
    key: jax.Array
    pos_a: jax.Array       # (nhalf_a, ndim)
    pos_b: jax.Array       # (nhalf_b, ndim)
    lnp_a: jax.Array       # (nhalf_a,)
    lnp_b: jax.Array       # (nhalf_b,)
    naccept: jax.Array     # (nwalkers,) int32, per-walker accept counts
    nsteps: jax.Array      # () int32, steps taken since reset

    @property
    def position(self):
        return jnp.concatenate([self.pos_a, self.pos_b], axis=0)

    @property
    def lnprob(self):
        return jnp.concatenate([self.lnp_a, self.lnp_b], axis=0)


def stretch_half_step_from_uniforms(u3, active, passive, lnp_active,
                                    lnprob_batch, a=2.0):
    """Update one half-ensemble against the (frozen) other half, consuming
    pre-drawn uniforms u3 of shape (3, n) -- z-draw, partner pick, accept.

    Fully vectorized: one partner gather, one batched lnprob, one select.
    Returns (new_active, new_lnp, accepted_bool). Taking the uniforms as an
    argument lets the caller generate ALL of a step's randomness in a single
    PRNG call (threefry on tiny shapes otherwise dominates the step cost on
    TPU -- measured ~2/3 of the per-step time at 250 walkers)."""
    n, ndim = active.shape
    z = ((a - 1.0) * u3[0] + 1.0) ** 2 / a
    npass = passive.shape[0]
    # floor(u * n) partner pick: fp32 quantization bias is O(n * 2^-24),
    # negligible against Monte-Carlo error for any sane ensemble size.
    j = jnp.minimum((u3[1] * npass).astype(jnp.int32), npass - 1)
    partners = passive[j]
    proposal = partners + z[:, None] * (active - partners)
    lnp_prop = lnprob_batch(proposal)
    log_ratio = (ndim - 1) * jnp.log(z) + lnp_prop - lnp_active
    # The support guard matters: u3[2] can be exactly 0 (fp32), and
    # log(0) = -inf would accept an out-of-box proposal whose lnprob is
    # only the finite LNPROB_FLOOR (likelihood.SUPPORT_FLOOR docs).
    accept = (jnp.log(u3[2]) < log_ratio) & (lnp_prop > SUPPORT_FLOOR)
    new_active = jnp.where(accept[:, None], proposal, active)
    new_lnp = jnp.where(accept, lnp_prop, lnp_active)
    return new_active, new_lnp, accept


def stretch_half_step(key, active, passive, lnp_active, lnprob_batch,
                      a=2.0):
    """Keyed convenience wrapper around stretch_half_step_from_uniforms."""
    u3 = jax.random.uniform(key, (3, active.shape[0]), dtype=active.dtype)
    return stretch_half_step_from_uniforms(u3, active, passive, lnp_active,
                                           lnprob_batch, a)


def ensemble_step(state: SamplerState, lnprob_batch, a=2.0) -> SamplerState:
    """One full ensemble update (both half-steps). All randomness for the
    step comes from ONE uniform draw."""
    key, k = jax.random.split(state.key)
    na = state.pos_a.shape[0]
    nb = state.pos_b.shape[0]
    u = jax.random.uniform(k, (3, na + nb), dtype=state.pos_a.dtype)
    pos_a, lnp_a, acc_a = stretch_half_step_from_uniforms(
        u[:, :na], state.pos_a, state.pos_b, state.lnp_a, lnprob_batch, a)
    pos_b, lnp_b, acc_b = stretch_half_step_from_uniforms(
        u[:, na:], state.pos_b, pos_a, state.lnp_b, lnprob_batch, a)
    naccept = state.naccept + jnp.concatenate(
        [acc_a, acc_b]).astype(jnp.int32)
    return SamplerState(key=key, pos_a=pos_a, pos_b=pos_b,
                        lnp_a=lnp_a, lnp_b=lnp_b,
                        naccept=naccept, nsteps=state.nsteps + 1)


class EnsembleSampler:
    """Driver owning the jitted run loops.

    Mirrors the conceptual API of the engine the reference wraps
    (run_mcmc / reset / acceptance_fraction) but the entire sampling loop --
    burn-in included -- executes on device; the host only launches phases.
    """

    # Record cap of the single compiled run program: the chain buffer is
    # preallocated at this many records and longer requests stream through
    # segments (mirrors FusedPallasSampler.REC_CAP).
    REC_CAP = 512

    def __init__(self, nwalkers: int, ndim: int,
                 lnprob_fn: Callable, a: float = 2.0,
                 dtype=jnp.float32, rec_cap=None, program_token=None):
        if nwalkers < 2 * ndim:
            raise ValueError(
                f"nwalkers={nwalkers} < 2*ndim={2 * ndim}: the stretch move "
                "needs at least twice the dimension (prefer many more)")
        if nwalkers % 2:
            raise ValueError("nwalkers must be even")
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        self.a = float(a)
        self.dtype = dtype
        # A pre-batched lnprob (e.g. the fused Pallas kernel, marked with
        # .is_batched) is used directly; scalar lnprobs get vmapped.
        if getattr(lnprob_fn, "is_batched", False):
            self.lnprob_batch = lnprob_fn
        else:
            self.lnprob_batch = jax.vmap(lnprob_fn)
        self.rec_cap = int(rec_cap) if rec_cap else self.REC_CAP
        self._run_dyn = None
        # None (default) -> the run program is traced per instance (safe
        # for arbitrary lnprob closures). A hashable token -> the traced
        # program is SHARED through the module LRU with any sampler whose
        # (geometry key + token) matches; the token must fully determine
        # lnprob_fn's computation (content-fingerprint its closure
        # constants -- see fitter.build / hierarchy.build).
        self._program_token = program_token
        self.trace_count = 0   # programs traced (asserted in tests)

    # -- state management -----------------------------------------------------
    def init_state(self, key, p0) -> SamplerState:
        """p0: (nwalkers, ndim) initial positions (free space)."""
        p0 = jnp.asarray(p0, self.dtype)
        if p0.shape != (self.nwalkers, self.ndim):
            raise ValueError(f"p0 shape {p0.shape} != "
                             f"({self.nwalkers},{self.ndim})")
        half = self.nwalkers // 2
        lnp = self.lnprob_batch(p0)
        return SamplerState(
            key=key, pos_a=p0[:half], pos_b=p0[half:],
            lnp_a=lnp[:half], lnp_b=lnp[half:],
            naccept=jnp.zeros(self.nwalkers, jnp.int32),
            nsteps=jnp.array(0, jnp.int32))

    @staticmethod
    def reset_counters(state: SamplerState) -> SamplerState:
        """Zero acceptance/step counters (emcee's sampler.reset() between
        burn-in and production)."""
        return state._replace(
            naccept=jnp.zeros_like(state.naccept),
            nsteps=jnp.zeros_like(state.nsteps))

    # -- run loops --------------------------------------------------------------
    def _get_run(self):
        """ONE compiled program serves every (nsteps, thin) geometry: the
        record count and thin factor are traced scalars driving
        dynamic-bound fori_loops over a rec_cap-record preallocated chain
        buffer (capped-grid treatment, mirroring the fused Pallas
        sampler's SMEM-scalar scheme -- without it every new burn /
        production length paid a fresh trace+compile, which on CPU and any
        non-TPU user dominated short runs)."""
        if self._run_dyn is not None:
            return self._run_dyn
        if self._program_token is not None:
            key = ("ensemble-run", self.nwalkers, self.ndim, self.a,
                   np.dtype(self.dtype).str, self.rec_cap,
                   self._program_token)
            self._run_dyn = shared_program(key, self._build_run)
        else:
            self._run_dyn = self._build_run()
        return self._run_dyn

    def _build_run(self):
        rec_cap = self.rec_cap
        nw = self.nwalkers

        def run(state: SamplerState, nrec, thin):
            chain_buf = jnp.zeros((rec_cap, nw, self.ndim), self.dtype)
            lnp_buf = jnp.zeros((rec_cap, nw), self.dtype)

            def one(i, s):
                return ensemble_step(s, self.lnprob_batch, self.a)

            def record(r, carry):
                s, cb, lb = carry
                s = jax.lax.fori_loop(0, thin, one, s)
                cb = jax.lax.dynamic_update_index_in_dim(
                    cb, s.position, r, 0)
                lb = jax.lax.dynamic_update_index_in_dim(
                    lb, s.lnprob, r, 0)
                return s, cb, lb

            state, chain_buf, lnp_buf = jax.lax.fori_loop(
                0, nrec, record, (state, chain_buf, lnp_buf))
            return state, chain_buf, lnp_buf

        def traced_run(state, nrec, thin):
            self.trace_count += 1
            return run(state, nrec, thin)

        return jax.jit(traced_run)

    def run_mcmc(self, state: SamplerState, nsteps: int, thin: int = 1):
        """Advance `nsteps` ensemble updates, recording every `thin`-th.

        Returns (state, chain, lnpchain) with chain shape
        (nsteps//thin, nwalkers, ndim) -- recorded AFTER each thin block,
        all device-resident.
        """
        if nsteps % thin:
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        if nsteps <= 0:
            raise ValueError("nsteps must be positive")
        nrecord = nsteps // thin
        run = self._get_run()
        chains, lnps = [], []
        done = 0
        while done < nrecord:
            n = min(self.rec_cap, nrecord - done)
            state, cb, lb = run(state, jnp.asarray(n, jnp.int32),
                                jnp.asarray(thin, jnp.int32))
            chains.append(cb[:n])
            lnps.append(lb[:n])
            done += n
        if len(chains) == 1:
            return state, chains[0], lnps[0]
        return (state, jnp.concatenate(chains, axis=0),
                jnp.concatenate(lnps, axis=0))

    def advance(self, state: SamplerState, nsteps: int) -> SamplerState:
        """Advance without recording (burn-in): the same single compiled
        program, one record of `nsteps` thinned-away updates."""
        state, _, _ = self._get_run()(
            state, jnp.asarray(1, jnp.int32),
            jnp.asarray(nsteps, jnp.int32))
        return state

    # -- diagnostics ------------------------------------------------------------
    @staticmethod
    def acceptance_fraction(state: SamplerState):
        """Per-walker acceptance fraction since last reset."""
        denom = jnp.maximum(state.nsteps, 1)
        return state.naccept / denom


def make_initial_ball(key, center, scatter, nwalkers, lower=None, upper=None,
                      dtype=jnp.float32):
    """Gaussian ball of walkers around `center` (free space), REFLECTED at
    the box bounds. Mirrors the reference's walker initialization
    (ref: mbb_fitter.run p0 generation -- ball around the initial guess).

    Reflection (not clipping) matters: clipping collapses every out-of-box
    walker onto the same boundary plane, and a stretch-move ensemble that is
    degenerate in a coordinate can NEVER leave that hyperplane
    (proposal = x_j + z (x_k - x_j) stays inside the ensemble's affine
    span). Reflection preserves the ball's spread in every dimension.
    """
    center = jnp.asarray(center, dtype)
    scatter = jnp.asarray(scatter, dtype)
    eps = jax.random.normal(key, (nwalkers, center.size), dtype=dtype)
    ball = center + eps * scatter
    if lower is not None or upper is not None:
        lo = None if lower is None else jnp.asarray(lower, dtype)
        hi = None if upper is None else jnp.asarray(upper, dtype)
        if lo is not None and hi is not None:
            tiny = 1e-9 * (hi - lo)
        else:
            # one-sided constraint (e.g. positivity with no ceiling):
            # still reflect at the bound that exists
            ref = lo if hi is None else hi
            tiny = 1e-9 * jnp.maximum(jnp.abs(ref),
                                      jnp.asarray(1.0, dtype))
        # Reflect ONLY out-of-box values (jnp.where, not the algebraic
        # lo + |x - lo| / hi - |hi - x| form): the algebraic form rounds
        # in-box values to the fp32 quantum AT THE BOUND -- with the default
        # fnorm ceiling of 1e7 that quantum is 1.0, which collapsed tight
        # re-center balls onto a single value and permanently froze that
        # ensemble coordinate (the stretch move cannot leave a degenerate
        # hyperplane).
        if lo is not None:
            lo_m = lo + tiny
            ball = jnp.where(ball < lo_m, 2.0 * lo_m - ball, ball)
        if hi is not None:
            hi_m = hi - tiny
            ball = jnp.where(ball > hi_m, 2.0 * hi_m - ball, ball)
        # pathological double-overshoot
        if lo is not None and hi is not None:
            ball = jnp.clip(ball, lo_m, hi_m)
        elif lo is not None:
            ball = jnp.maximum(ball, lo_m)
        else:
            ball = jnp.minimum(ball, hi_m)
    return ball


def split_rhat(chain):
    """Split-R-hat per dimension (Gelman et al., BDA3 sec. 11.4): each
    walker's series is split in time halves and all halves treated as
    independent chains. chain: (nsteps, nwalkers, ndim) host numpy.
    The single host implementation behind MBBResults/MBBFitter;
    MultiFitter.gelman_rubin is its batched on-device twin (same
    formula and floor)."""
    chain = np.asarray(chain, np.float64)
    ns = chain.shape[0]
    half = ns // 2
    if half < 2:
        raise ValueError("need at least 4 recorded steps")
    sp = np.concatenate([chain[:half], chain[half:2 * half]], axis=1)
    sp = np.transpose(sp, (1, 0, 2))            # (m, n, ndim)
    n = sp.shape[1]
    means = sp.mean(axis=1)
    w = sp.var(axis=1, ddof=1).mean(axis=0)
    b = n * means.var(axis=0, ddof=1)
    var_post = (n - 1) / n * w + b / n
    rhat = np.sqrt(var_post / np.maximum(w, 1e-30))
    # A frozen dimension (zero within- AND between-half variance -- a
    # degenerate ensemble coordinate the stretch move can never leave)
    # must read as pathological, not "perfectly converged": return NaN,
    # matching effective_sample_size, so any `rhat < threshold` gate
    # fails. (w tiny with b large already yields a huge rhat.)
    return np.where(var_post <= 1e-30, np.nan, rhat)


# Acklam's rational approximation to the inverse normal CDF (published
# algorithm, |relative error| < 1.2e-9) -- scipy-free so the package's
# runtime dependency set stays jax/numpy/h5py.
_NDTRI_A = (-3.969683028665376e+01, 2.209460984245205e+02,
            -2.759285104469687e+02, 1.383577518672690e+02,
            -3.066479806614716e+01, 2.506628277459239e+00)
_NDTRI_B = (-5.447609879822406e+01, 1.615858368580409e+02,
            -1.556989798598866e+02, 6.680131188771972e+01,
            -1.328068155288572e+01)
_NDTRI_C = (-7.784894002430293e-03, -3.223964580411365e-01,
            -2.400758277161838e+00, -2.549732539343734e+00,
            4.374664141464968e+00, 2.938163982698783e+00)
_NDTRI_D = (7.784695709041462e-03, 3.224671290700398e-01,
            2.445134137142996e+00, 3.754408661907416e+00)


def _poly(coeffs, x):
    out = np.full_like(x, coeffs[0], dtype=np.float64)
    for c in coeffs[1:]:
        out = out * x + c
    return out


def inverse_normal_cdf(p):
    """Phi^-1(p) elementwise, host fp64 (Acklam's approximation)."""
    p = np.asarray(p, np.float64)
    x = np.empty_like(p)
    lo, hi = 0.02425, 1.0 - 0.02425
    low = p < lo
    high = p > hi
    mid = ~(low | high)
    if np.any(mid):
        q = p[mid] - 0.5
        r = q * q
        x[mid] = _poly(_NDTRI_A, r) * q / (_poly(_NDTRI_B, r) * r + 1.0)
    if np.any(low):
        q = np.sqrt(-2.0 * np.log(p[low]))
        x[low] = _poly(_NDTRI_C, q) / (_poly(_NDTRI_D, q) * q + 1.0)
    if np.any(high):
        q = np.sqrt(-2.0 * np.log1p(-p[high]))
        x[high] = -_poly(_NDTRI_C, q) / (_poly(_NDTRI_D, q) * q + 1.0)
    return x


def rank_normalize(x):
    """Rank-normalize samples along ALL axes jointly: fractional ranks
    (rank - 3/8) / (S + 1/4) mapped through the inverse normal CDF
    (Vehtari et al. 2021 eq. 14). Shape-preserving; rank statistics make
    the downstream R-hat/ESS estimators calibrated for heavy-tailed
    targets whose moments may not exist."""
    x = np.asarray(x, np.float64)
    flat = x.reshape(-1)
    n = flat.size
    order = np.argsort(flat, kind="stable")
    sv = flat[order]
    # AVERAGE ranks over ties: equal values must map to equal z (a
    # frozen series must rank-normalize to a constant, not to a
    # manufactured 1..n pattern that fakes variance).
    new_group = np.empty(n, bool)
    new_group[0] = True
    new_group[1:] = sv[1:] != sv[:-1]
    gid = np.cumsum(new_group) - 1
    base = np.arange(1.0, n + 1.0)
    avg = (np.bincount(gid, weights=base) / np.bincount(gid))[gid]
    ranks = np.empty(n, np.float64)
    ranks[order] = avg
    return inverse_normal_cdf(
        ((ranks - 0.375) / (n + 0.25)).reshape(x.shape))


def split_rhat_rank_normalized(chain):
    """Rank-normalized split-R-hat (Vehtari et al. 2021): the max of the
    BULK statistic (split-R-hat of the rank-normalized samples) and the
    TAIL statistic (the same on the rank-normalized folded samples
    |x - median|, which catches chains agreeing in location but not in
    scale). chain: (nsteps, nwalkers, ndim) host numpy; values near 1 =
    converged, > ~1.01 at this estimator's calibration = keep sampling.

    Upgrade over the classic `split_rhat` for heavy-tailed or strongly
    skewed posteriors (fnorm near a box edge, the optically-thick
    T-lambda0 ridge) where moment-based R-hat is itself noisy."""
    chain = np.asarray(chain, np.float64)
    ndim = chain.shape[2]
    bulk = np.empty(ndim)
    tail = np.empty(ndim)
    for d in range(ndim):
        x = chain[:, :, d]
        bulk[d] = split_rhat(rank_normalize(x)[:, :, None])[0]
        folded = np.abs(x - np.median(x))
        tail[d] = split_rhat(rank_normalize(folded)[:, :, None])[0]
    return np.maximum(bulk, tail)


def effective_sample_size(chain, kind="bulk", c=5.0):
    """Per-dimension effective sample size of the ensemble chain.

    kind="bulk": ESS of the rank-normalized samples -- reliability of
    location summaries (medians, means). kind="tail": the minimum ESS
    of the 5% and 95% indicator functions -- reliability of interval
    endpoints, which mix slower than the bulk (Vehtari et al. 2021
    sec. 4.3). ESS = nsteps*nwalkers / tau with tau from the same
    Sokal-window autocorrelation estimator `autocorrelation_time` uses
    (emcee's convention), tau floored at 1. A FROZEN series (zero
    variance -- collapsed ensemble, or a tail indicator the chain never
    crosses) reports NaN, never a large ESS: the chain carries no
    information about that summary.

    chain: (nsteps, nwalkers, ndim) host numpy -> (ndim,) ESS.
    """
    chain = np.asarray(chain, np.float64)
    nsteps, nwalkers, ndim = chain.shape
    total = nsteps * nwalkers

    def _ess_of(x):      # (nsteps, nwalkers, ndim) transformed samples
        tau = autocorrelation_time(x, c=c)   # NaN where variance = 0
        return np.where(np.isfinite(tau),
                        total / np.maximum(np.nan_to_num(tau, nan=1.0),
                                           1.0), np.nan)

    if kind == "bulk":
        z = np.stack([rank_normalize(chain[:, :, d])
                      for d in range(ndim)], axis=2)
        return _ess_of(z)
    if kind == "tail":
        out = np.full(ndim, np.inf)
        for q in (0.05, 0.95):
            quant = np.quantile(chain.reshape(-1, ndim), q, axis=0)
            ind = (chain <= quant[None, None, :]).astype(np.float64)
            out = np.minimum(out, _ess_of(ind))
        return out
    raise ValueError(f"kind must be 'bulk' or 'tail', got {kind!r}")


def autocorrelation_time(chain, c=5.0):
    """Integrated autocorrelation time per dimension, emcee-style
    (Sokal's adaptive window). chain: (nsteps, nwalkers, ndim), host numpy.

    The reference surfaces this through emcee's acor property
    (SURVEY.md section 5, metrics row)."""
    x = np.asarray(chain, dtype=np.float64)
    nsteps, nwalkers, ndim = x.shape
    taus = np.empty(ndim)
    for d in range(ndim):
        xd = x[:, :, d] - x[:, :, d].mean(axis=0, keepdims=True)
        nfft = 1
        while nfft < 2 * nsteps:
            nfft <<= 1
        f = np.fft.rfft(xd, n=nfft, axis=0)
        acf = np.fft.irfft(f * np.conj(f), n=nfft, axis=0)[:nsteps].real
        acf = acf.mean(axis=1)
        if acf[0] <= 0:
            taus[d] = np.nan
            continue
        rho = acf / acf[0]
        tau_run = 2.0 * np.cumsum(rho) - 1.0
        window = np.arange(nsteps) < c * tau_run
        idx = np.argmin(window) if not window.all() else nsteps - 1
        taus[d] = tau_run[idx]
    return taus
