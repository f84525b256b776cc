"""Nested sampling: Bayesian evidence (ln Z) for model comparison.

ADDITIVE capability, not in the reference: upstream mbb_emcee offers no
way to compare the models it fits (optically thin vs thick, with or
without the Wien-side power law) -- users eyeballed chi-square. Nested
sampling (Skilling 2006) computes the marginal likelihood
Z = integral L(theta) pi(theta) dtheta, whose ratio between two model
variants is the Bayes factor.

TPU-native design (cf. GPU nested-sampling literature, e.g.
arXiv:2509.13307): the classic algorithm retires ONE live point per
iteration and replaces it by a constrained prior draw -- a serial,
scalar loop. Here each iteration retires the worst B points of N at
once (deterministic expected shrinkage: removing the k-th lowest of a
set with N-k points still alive shrinks ln X by 1/(N-k)), and the B
replacements evolve IN PARALLEL by K affine-invariant stretch moves
over the surviving ensemble, constrained to L > L* -- the same
Goodman-Weare proposal the production sampler uses, which for a uniform
target over {L > L*} has acceptance min(1, z^(d-1)) 1[inside]. That
makes every iteration a fixed-shape batch of B x K fused lnprob
evaluations -- exactly the shape the TPU wants -- and the whole run ONE
jitted lax.while_loop program with preallocated dead-point buffers.

Affine-invariant constrained replacement needs no tuned step scale or
ellipsoid decomposition (MultiNest-style), and inherits the ensemble's
shape adaptation for the curved T-lambda0 degeneracies of
optically-thick fits.

Evidence error follows Skilling's information-based estimate
sqrt(H / N). Weighted dead points are returned, so posterior summaries
come for free (importance weights exp(lnwt - lnZ)).
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.scipy.special import logsumexp


def _np_dtype(dtype):
    return np.dtype(jnp.dtype(dtype).name)


@dataclasses.dataclass
class NestedResult:
    """Evidence + weighted posterior samples from one nested run."""
    logz: float                 # ln Z (evidence w.r.t. the box prior)
    logz_err: float             # sqrt(H / nlive)
    h: float                    # information (nats)
    samples: np.ndarray         # (ndead, ndim) dead points, box space
    loglike: np.ndarray         # (ndead,)
    logwt: np.ndarray           # (ndead,) ln(prior mass x L); sums to ~Z
    n_iter: int                 # batch iterations used
    n_like: int                 # likelihood evaluations
    # False iff the run hit max_iter before the termination bound fired:
    # logz is then truncated (biased low) and Bayes factors against a
    # converged run are not trustworthy -- raise max_iter or tol.
    converged: bool = True

    def posterior_weights(self):
        """Normalized importance weights over `samples`."""
        w = np.exp(self.logwt - self.logz)
        return w / w.sum()

    def posterior_mean(self):
        w = self.posterior_weights()
        return (w[:, None] * self.samples).sum(axis=0)

    def resample(self, nsamples, seed=0):
        """Equal-weight posterior draws (multinomial resampling)."""
        rng = np.random.default_rng(seed)
        idx = rng.choice(self.samples.shape[0], size=nsamples,
                         p=self.posterior_weights())
        return self.samples[idx]


@partial(jax.jit, static_argnames=("loglike", "nlive", "nbatch", "nsteps",
                                   "max_iter"))
def _nested_run(key, loglike, u0, lnl0, data, nlive, nbatch,
                nsteps, max_iter, a, logtol):
    dtype = u0.dtype
    ndim = u0.shape[1]
    nsurv = nlive - nbatch
    d_exp = jnp.asarray(float(ndim - 1), dtype)
    inv_a, am1 = 1.0 / a, a - 1.0
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    # Deterministic expected ln-shrinkage of the k-th removal in a batch
    # (k-th lowest removed while N-k points remain): static host table.
    shr = np.cumsum(1.0 / (nlive - np.arange(nbatch)))
    # ln(X_{k-1} - X_k) relative to the batch-entry lnX: X_k = exp(-shr_k).
    xk = np.exp(-np.concatenate([[0.0], shr]))
    lnw_rel = jnp.asarray(np.log(xk[:-1] - xk[1:]), dtype)
    lnshrink = jnp.asarray(-shr[-1], dtype)

    batch_ll = jax.vmap(lambda y: loglike(y, *data))

    def replace(key, live, lnl, order, lstar):
        """Evolve B copies of random survivors by K constrained stretch
        moves over the survivor ensemble; returns the B new points."""
        surv_idx = order[nbatch:]                       # (nsurv,)
        surv = live[surv_idx]                           # (nsurv, d)
        key, kseed = jax.random.split(key)
        seed_idx = jax.random.randint(kseed, (nbatch,), 0, nsurv)
        x = surv[seed_idx]
        fx = lnl[surv_idx][seed_idx]

        def step(carry, k):
            x, fx = carry
            kp, kz, ku = jax.random.split(k, 3)
            partner = surv[jax.random.randint(kp, (nbatch,), 0, nsurv)]
            # z ~ g(z) proportional to 1/sqrt(z) on [1/a, a] (inverse CDF).
            v = jax.random.uniform(kz, (nbatch,), dtype)
            z = (inv_a) * (1.0 + v * am1) ** 2
            y = partner + z[:, None] * (x - partner)
            inbox = jnp.all((y >= 0.0) & (y <= 1.0), axis=1)
            fy = jnp.where(inbox, batch_ll(y), neg_inf)
            accept = (inbox & (fy > lstar)
                      & (jnp.log(jax.random.uniform(ku, (nbatch,), dtype))
                         < d_exp * jnp.log(z)))
            x = jnp.where(accept[:, None], y, x)
            fx = jnp.where(accept, fy, fx)
            return (x, fx), None

        keys = jax.random.split(key, nsteps)
        (x, fx), _ = jax.lax.scan(step, (x, fx), keys)
        return x, fx

    def cond(c):
        it, done = c[0], c[1]
        return (it < max_iter) & jnp.logical_not(done)

    def body(c):
        # Under vmap (nested_sample_batch) the while_loop runs until ALL
        # sources are done and the body executes for every source each
        # iteration -- so it must be an exact identity for sources whose
        # `done` flag is already set (the final tree_map masks every
        # carry update, key included: a finished source's state is
        # bitwise-frozen, which test_batch_matches_single relies on).
        new_c = _body_inner(c)
        done = c[1]
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(done, o, n), new_c, c)

    def _body_inner(c):
        (it, _, key, live, lnl, lnx, lnz, dead_x, dead_l, dead_w) = c
        order = jnp.argsort(lnl)                        # ascending
        worst = order[:nbatch]
        lstar = lnl[order[nbatch - 1]]

        lnw = lnx + lnw_rel                             # (B,) batch weights
        dl = lnl[worst]                                 # sorted ascending
        dead_x = jax.lax.dynamic_update_slice(
            dead_x, live[worst], (it * nbatch, 0))
        dead_l = jax.lax.dynamic_update_slice(dead_l, dl, (it * nbatch,))
        dead_w = jax.lax.dynamic_update_slice(dead_w, lnw, (it * nbatch,))
        lnz = jnp.logaddexp(lnz, logsumexp(lnw + dl))

        key, krep = jax.random.split(key)
        newx, newl = replace(krep, live, lnl, order, lstar)
        live = live.at[worst].set(newx)
        lnl = lnl.at[worst].set(newl)
        lnx = lnx + lnshrink

        # Stop when the best remaining live point can no longer move lnZ
        # by more than tol.
        done = (jnp.max(lnl) + lnx) < (lnz + logtol)
        return (it + 1, done, key, live, lnl, lnx, lnz,
                dead_x, dead_l, dead_w)

    cap = max_iter * nbatch
    c0 = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
          key, u0, lnl0,
          jnp.asarray(0.0, dtype), neg_inf,
          jnp.zeros((cap, ndim), dtype),
          jnp.full((cap,), neg_inf, dtype),
          jnp.full((cap,), neg_inf, dtype))
    (it, done, key, live, lnl, lnx, lnz,
     dead_x, dead_l, dead_w) = jax.lax.while_loop(cond, body, c0)

    # Close out: surviving live points get equal shares of the final X.
    live_w = lnx - jnp.log(jnp.asarray(float(nlive), dtype))
    lnz = jnp.logaddexp(lnz, logsumexp(live_w + lnl))
    # `done` False here means the loop exited on max_iter with live mass
    # still able to move lnZ by more than tol: a truncated evidence.
    return (it, done, lnz, live, lnl,
            jnp.full((nlive,), live_w, dtype), dead_x, dead_l, dead_w)


def nested_sample(loglike, lower, upper, key, nlive=512, nbatch=32,
                  nsteps=32, max_iter=3000, a=2.0, tol=1e-4,
                  dtype=jnp.float32, program_token=None) -> NestedResult:
    """Compute the evidence of `loglike` against a uniform prior over the
    finite box [lower, upper].

    loglike: scalar function of one parameter vector in BOX space
    (vmapped internally). The whole run -- constrained replacement,
    shrinkage bookkeeping, termination -- is one jitted program; only the
    final buffers come back to host. Returns evidence w.r.t. the
    normalized uniform box prior (the 1/V prior factor is INCLUDED via
    sampling in the unit cube).

    `program_token`: opt-in cross-call traced-program sharing (the same
    contract as EnsembleSampler): a hashable token that, together with
    the box, FULLY determines `loglike`'s computation. Without it every
    call builds a fresh closure, whose identity is a static jit
    argument, so looping nested_sample over model variants retraces the
    whole max_iter while_loop each call.
    """
    lower = np.asarray(lower, np.float64)
    upper = np.asarray(upper, np.float64)
    if not (np.all(np.isfinite(lower)) and np.all(np.isfinite(upper))):
        raise ValueError("nested sampling requires a finite prior box")
    if nbatch >= nlive:
        raise ValueError(f"nbatch={nbatch} must be < nlive={nlive}")
    width = upper - lower
    # host-numpy closures (device constants cost trace-time fetches here)
    lo = np.asarray(lower, _np_dtype(dtype))
    wd = np.asarray(width, _np_dtype(dtype))

    def make_ll_unit():
        def ll_unit(u):
            return loglike(lo + wd * u)
        return ll_unit

    if program_token is not None:
        from mbb_emcee_tpu.sampler import shared_program
        ll_unit = shared_program(
            ("nested-llunit", program_token, lo.tobytes(), wd.tobytes(),
             jnp.dtype(dtype).name), make_ll_unit)
    else:
        ll_unit = make_ll_unit()

    key, kinit = jax.random.split(key)
    u0 = jax.random.uniform(kinit, (nlive, lower.size), dtype)
    lnl0 = jax.vmap(ll_unit)(u0)

    (it, done, lnz, live, lnl, live_w, dead_x, dead_l, dead_w) = \
        _nested_run(
            key, ll_unit, u0, lnl0, (), int(nlive), int(nbatch),
            int(nsteps), int(max_iter), float(a), float(np.log(tol)))

    converged = bool(done)
    if not converged:
        warnings.warn(
            f"nested sampling hit max_iter={max_iter} before the "
            f"termination bound (tol={tol}) fired: logz is truncated "
            "(biased low). Raise max_iter or loosen tol; the result "
            "carries converged=False.", UserWarning, stacklevel=2)
    it = int(it)
    ndead = it * nbatch
    # Assemble dead + final live points, all in physical box space.
    xs = np.concatenate([np.asarray(dead_x)[:ndead], np.asarray(live)])
    ls = np.concatenate([np.asarray(dead_l)[:ndead], np.asarray(lnl)])
    ws = np.concatenate([np.asarray(dead_w)[:ndead], np.asarray(live_w)])
    xs = lower + width * np.asarray(xs, np.float64)
    logz = float(lnz)
    lw = np.asarray(ws, np.float64) + np.asarray(ls, np.float64)
    p = np.exp(lw - logz)
    p = p / p.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        h = float(np.nansum(p * (np.asarray(ls, np.float64) - logz)))
    return NestedResult(
        logz=logz, logz_err=float(np.sqrt(max(h, 0.0) / nlive)), h=h,
        samples=xs, loglike=np.asarray(ls, np.float64), logwt=lw,
        n_iter=it, n_like=nlive + it * nbatch * nsteps,
        converged=converged)


@dataclasses.dataclass
class NestedBatchResult:
    """Per-source evidences from one batched nested run over S sources.

    Arrays are padded to the slowest source's iteration count; padded
    dead-point slots carry -inf log-weights (zero posterior weight), so
    summaries need no masking. Index with [s] for a per-source
    NestedResult (trimmed to that source's own dead points)."""
    logz: np.ndarray            # (S,)
    logz_err: np.ndarray        # (S,)
    h: np.ndarray               # (S,)
    samples: np.ndarray         # (S, ndead_max + nlive, ndim)
    loglike: np.ndarray         # (S, ndead_max + nlive)
    logwt: np.ndarray           # (S, ndead_max + nlive)
    n_iter: np.ndarray          # (S,)
    n_like: np.ndarray          # (S,)
    nbatch: int
    nlive: int
    # (S,) bool; False = that source hit max_iter (truncated logz)
    converged: np.ndarray | None = None

    @property
    def nsources(self):
        return self.logz.shape[0]

    def __getitem__(self, s):
        s = int(s)
        ndead = int(self.n_iter[s]) * self.nbatch
        keep = np.concatenate([np.arange(ndead),
                               np.arange(self.samples.shape[1] - self.nlive,
                                         self.samples.shape[1])])
        return NestedResult(
            logz=float(self.logz[s]), logz_err=float(self.logz_err[s]),
            h=float(self.h[s]), samples=self.samples[s][keep],
            loglike=self.loglike[s][keep], logwt=self.logwt[s][keep],
            n_iter=int(self.n_iter[s]), n_like=int(self.n_like[s]),
            converged=(True if self.converged is None
                       else bool(self.converged[s])))

    def posterior_weights(self):
        """(S, n) normalized importance weights (padded slots are 0)."""
        w = np.exp(self.logwt - self.logz[:, None])
        return w / w.sum(axis=1, keepdims=True)

    def posterior_mean(self):
        w = self.posterior_weights()
        return (w[:, :, None] * self.samples).sum(axis=1)


def make_nested_batch_runner(loglike, lower, upper, nlive=512, nbatch=32,
                             nsteps=32, max_iter=3000, a=2.0, tol=1e-4,
                             dtype=jnp.float32, mesh=None):
    """Compile-once batched nested-sampling runner: returns
    ``run_batch(key, data) -> NestedBatchResult`` for S-source data
    tuples of fixed shape. The whole (init + max_iter-step while_loop)
    device program is built ONCE and reused across calls -- rebuilding
    the loglike closures per call (as a bare nested_sample_batch call
    does) makes the static-jit-argument identity change every time, so
    chunked serving would retrace/recompile per chunk. With `mesh`, the
    independent per-source runs shard over the source axis
    (embarrassingly parallel -- no collectives)."""
    lower = np.asarray(lower, np.float64)
    upper = np.asarray(upper, np.float64)
    if not (np.all(np.isfinite(lower)) and np.all(np.isfinite(upper))):
        raise ValueError("nested sampling requires a finite prior box")
    if nbatch >= nlive:
        raise ValueError(f"nbatch={nbatch} must be < nlive={nlive}")
    width = upper - lower
    ndim = int(lower.size)
    # host-numpy closures (device constants cost trace-time fetches here)
    lo = np.asarray(lower, _np_dtype(dtype))
    wd = np.asarray(width, _np_dtype(dtype))

    def ll_unit(u, *d):
        return loglike(lo + wd * u, *d)

    def one(kinit, krun, *d):
        u0 = jax.random.uniform(kinit, (nlive, ndim), dtype)
        lnl0 = jax.vmap(lambda x: ll_unit(x, *d))(u0)
        return _nested_run(
            krun, ll_unit, u0, lnl0, d, int(nlive), int(nbatch),
            int(nsteps), int(max_iter), float(a), float(np.log(tol)))

    # The shard_map in_specs depend on the data ranks, which only the
    # first run_batch call knows -- build (and jit) the core lazily,
    # once, and hold it in the closure so every later call reuses it.
    core_cache = {}

    def _core(data):
        if "f" not in core_cache:
            f = jax.vmap(one)
            if mesh is not None:
                from jax.sharding import PartitionSpec as P
                ax = mesh.axis_names[0]
                dspec = tuple(P(ax, *([None] * (d.ndim - 1)))
                              for d in data)
                out_specs = (
                    P(ax), P(ax), P(ax),             # it, done, lnz
                    P(ax, None, None), P(ax, None),  # live, lnl
                    P(ax, None),                     # live_w
                    P(ax, None, None), P(ax, None),  # dead_x, dead_l
                    P(ax, None))                     # dead_w
                # check_vma=False: the while_loop carry seeds scalar
                # accumulators from replicated constants while the body
                # makes them shard-varying; the run is embarrassingly
                # parallel (no collectives), so the varying-axis checker
                # only adds false positives here.
                f = jax.shard_map(f, mesh=mesh,
                                  in_specs=(P(ax), P(ax)) + dspec,
                                  out_specs=out_specs, check_vma=False)
            core_cache["f"] = jax.jit(f)
        return core_cache["f"]

    def run_batch(key, data):
        data = tuple(jnp.asarray(d) for d in data)
        if not data:
            raise ValueError(
                "data must be a non-empty tuple of (S, ...) arrays")
        S = data[0].shape[0]
        if mesh is not None and S % mesh.devices.size:
            raise ValueError(
                f"the mesh size ({mesh.devices.size} devices) must "
                f"divide nsources={S}")
        keys = jax.random.split(key, 2 * S)
        (it, done, lnz, live, lnl, live_w, dead_x, dead_l, dead_w) = \
            _core(data)(keys[:S], keys[S:], *data)
        return _batch_postprocess(it, done, lnz, live, lnl, live_w,
                                  dead_x, dead_l, dead_w, lower, width,
                                  nlive, nbatch, nsteps, max_iter, tol)

    return run_batch


def nested_sample_batch(loglike, lower, upper, key, data, nlive=512,
                        nbatch=32, nsteps=32, max_iter=3000, a=2.0,
                        tol=1e-4, dtype=jnp.float32) -> NestedBatchResult:
    """Evidence for S independent sources sharing one likelihood FORM in
    a single device program: `loglike(theta, *data_s)` where `data` is a
    tuple of arrays with leading source axis S (e.g. per-source flux and
    1/sigma). The S nested runs advance in lockstep under vmap -- every
    iteration is an (S x nbatch x nsteps)-shaped batch of likelihood
    evaluations, the shape the TPU wants -- and each source freezes
    bitwise at ITS OWN termination iteration (the loop body is masked to
    identity once a source's stopping rule fires, so a batched run
    reproduces the single-source run exactly, key for key).

    The prior box is shared across sources (it is part of the model
    being compared). Returns NestedBatchResult with (S,)-shaped
    summaries and padded per-source sample sets. Repeated same-shape
    calls should build the runner once via make_nested_batch_runner."""
    return make_nested_batch_runner(
        loglike, lower, upper, nlive=nlive, nbatch=nbatch, nsteps=nsteps,
        max_iter=max_iter, a=a, tol=tol, dtype=dtype)(key, data)


def _batch_postprocess(it, done, lnz, live, lnl, live_w, dead_x, dead_l,
                       dead_w, lower, width, nlive, nbatch, nsteps,
                       max_iter, tol):
    converged = np.asarray(done, bool)
    if not converged.all():
        bad = int((~converged).sum())
        warnings.warn(
            f"{bad}/{converged.size} sources hit max_iter={max_iter} "
            f"before the termination bound (tol={tol}) fired: their "
            "logz is truncated (biased low); see result.converged.",
            UserWarning, stacklevel=3)
    it = np.asarray(it)
    ndead_max = int(it.max()) * nbatch
    xs = np.concatenate([np.asarray(dead_x)[:, :ndead_max],
                         np.asarray(live)], axis=1)
    ls = np.concatenate([np.asarray(dead_l)[:, :ndead_max],
                         np.asarray(lnl)], axis=1).astype(np.float64)
    ws = np.concatenate([np.asarray(dead_w)[:, :ndead_max],
                         np.asarray(live_w)], axis=1).astype(np.float64)
    xs = lower + width * xs.astype(np.float64)
    logz = np.asarray(lnz, np.float64)
    lw = ws + ls
    p = np.exp(lw - logz[:, None])
    p = p / p.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.nansum(p * (ls - logz[:, None]), axis=1)
    return NestedBatchResult(
        logz=logz, logz_err=np.sqrt(np.maximum(h, 0.0) / nlive), h=h,
        samples=xs, loglike=ls, logwt=lw,
        n_iter=it.astype(np.int64),
        n_like=nlive + it.astype(np.int64) * nbatch * nsteps,
        nbatch=int(nbatch), nlive=int(nlive), converged=converged)
