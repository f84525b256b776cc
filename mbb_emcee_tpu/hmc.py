"""Gradient-based (Hamiltonian) MCMC over the MBB posterior.

ADDITIVE capability, not in the reference: upstream mbb_emcee samples
with emcee's gradient-free stretch move because its NumPy/SciPy model
(object construction + scipy brentq per call, SURVEY.md section 3.5) is
not differentiable. Here the whole lnprob -- greybody, Wien-merge
root-solve (bracket-clamped Newton polish, ops/rootfind.py), band
quadrature, priors -- is a pure JAX function, so `jax.grad` provides
exact-enough forces for free and HMC becomes one `vmap`-over-chains,
`lax.scan`-over-steps device program. For the correlated, curved
T-lambda0 posteriors of optically-thick fits, HMC decorrelates in far
fewer likelihood evaluations per effective sample than the stretch move.

Correctness notes:
- Sampling runs in an UNCONSTRAINED space: the free-parameter box
  (always finite -- likelihood.DEFAULT_LOWER/UPPER) maps to R^nfree via
  a logit transform with its log-Jacobian added to the target, so the
  hard box bounds can never reject a trajectory.
- Leapfrog + Metropolis-Hastings stays an EXACT MCMC scheme even where
  autodiff through the fixed-iteration merge solve is approximate: any
  deterministic force field gives a reversible, volume-preserving
  integrator, and acceptance uses true target evaluations. Gradient
  error only costs acceptance rate (measured: none observable).
- Step size is dual-averaged (Hoffman & Gelman 2014, Alg. 5) to a
  target acceptance statistic during warmup; a diagonal mass matrix is
  estimated from the late-warmup samples (two-phase warmup). Per-step
  step-size jitter (+/-20%, drawn state-independently) breaks
  trajectory-length resonances.

Everything (both warmup phases + production) is ONE jitted program per
(nchains, nwarmup, nsteps, thin, n_leapfrog) geometry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Dual-averaging constants (Hoffman & Gelman 2014).
_DA_T0 = 10.0
_DA_GAMMA = 0.05
_DA_KAPPA = 0.75


@dataclasses.dataclass
class HMCResult:
    """Production output: thinned chain in the ORIGINAL free space."""
    chain: jax.Array            # (nrec, nchains, nfree)
    lnprob: jax.Array           # (nrec, nchains) -- target lnprob (no Jacobian)
    acceptance_fraction: np.ndarray  # (nchains,)
    step_size: float
    mass: np.ndarray            # (nfree,) diagonal metric in u-space


# The SAME logit transform MAP optimization uses (mapfit is the single
# definition; init='map' seeding and the Laplace covariance assume the
# two tiers share it exactly).
from mbb_emcee_tpu.mapfit import _to_unconstrained  # noqa: E402


def _make_lnpost(lnprob, lower, width):
    """u-space target: lnprob(x(u)) + log|dx/du|, plus the raw lnprob as aux."""
    log_width = jnp.sum(jnp.log(width))

    def lnpost(u):
        x = lower + width * jax.nn.sigmoid(u)
        logjac = log_width + jnp.sum(jax.nn.log_sigmoid(u)
                                     + jax.nn.log_sigmoid(-u))
        lp = lnprob(x)
        return lp + logjac, lp

    return lnpost


def _make_stepper(lnprob, lower, width, n_leapfrog, dtype, nchains,
                  nfree):
    """(vg, hmc_step): the value-and-grad oracle and one MH-corrected
    leapfrog transition, shared by the warmup and production cores so a
    checkpointed production segment advances EXACTLY the chain the
    one-program run would."""
    lnpost = _make_lnpost(lnprob, lower, width)
    vg = jax.vmap(jax.value_and_grad(lnpost, has_aux=True))

    def leapfrog(u, g, p, eps, inv_mass):
        # eps: (nchains, 1) jittered per chain; inv_mass: (nfree,).
        # fori over the interior steps keeps TWO copies of the gradient
        # graph in the program (body + final step) instead of n_leapfrog.
        p = p + 0.5 * eps * g

        def body(_, c):
            u, g, p = c
            u = u + eps * inv_mass * p
            (_, _), g = vg(u)
            return (u, g, p + eps * g)

        u, g, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (u, g, p))
        u = u + eps * inv_mass * p
        (lp, raw), g = vg(u)
        p = p + 0.5 * eps * g
        return u, g, lp, raw, p

    def hmc_step(key, u, g, lp, raw, eps, mass):
        inv_mass = 1.0 / mass
        kp, kj, ka = jax.random.split(key, 3)
        p = (jax.random.normal(kp, (nchains, nfree), dtype)
             * jnp.sqrt(mass))
        jitter = jax.random.uniform(kj, (nchains, 1), dtype, 0.8, 1.2)
        u2, g2, lp2, raw2, p2 = leapfrog(u, g, p, eps * jitter, inv_mass)
        k_old = 0.5 * jnp.sum(p * p * inv_mass, axis=-1)
        k_new = 0.5 * jnp.sum(p2 * p2 * inv_mass, axis=-1)
        logr = (lp2 - k_new) - (lp - k_old)
        logr = jnp.where(jnp.isnan(logr), -jnp.inf, logr)
        alpha = jnp.exp(jnp.minimum(logr, 0.0))       # per-chain accept stat
        acc = (jax.random.uniform(ka, (nchains,), dtype)
               < alpha)[:, None]
        u = jnp.where(acc, u2, u)
        g = jnp.where(acc, g2, g)
        lp = jnp.where(acc[:, 0], lp2, lp)
        raw = jnp.where(acc[:, 0], raw2, raw)
        return u, g, lp, raw, acc[:, 0], jnp.mean(alpha)

    return vg, hmc_step


def hmc_warmup_core(key, lnprob, lower, width, u0, nwarmup, n_leapfrog,
                    target_accept, vary=None):
    """Warmup phases only: dual-averaged step size (+ diagonal mass from
    the late phase-A samples). Returns the complete post-warmup
    production state (key, u, g, lp, raw, eps, mass) -- everything
    hmc_prod_core needs, and everything a mid-production checkpoint must
    persist."""
    if vary is None:
        vary = lambda x: x
    dtype = u0.dtype
    nchains, nfree = u0.shape
    vg, hmc_step = _make_stepper(lnprob, lower, width, n_leapfrog,
                                 dtype, nchains, nfree)

    def da_update(da, m, alpha_mean):
        # Dual averaging on ln eps; m is the 1-based iteration number.
        log_eps, log_eps_bar, h_bar, mu = da
        mf = m.astype(dtype)
        h_bar = ((1.0 - 1.0 / (mf + _DA_T0)) * h_bar
                 + (target_accept - alpha_mean) / (mf + _DA_T0))
        log_eps = mu - jnp.sqrt(mf) / _DA_GAMMA * h_bar
        eta = mf ** (-_DA_KAPPA)
        log_eps_bar = eta * log_eps + (1.0 - eta) * log_eps_bar
        return (log_eps, log_eps_bar, h_bar, mu)

    def warmup_phase(key, u, g, lp, raw, mass, eps0, niter, collect):
        mu = jnp.log(10.0 * eps0)
        da0 = jax.tree.map(vary, (jnp.log(eps0), jnp.log(eps0),
                                  jnp.asarray(0.0, dtype), mu))
        # Moment accumulators for the diagonal mass (second half only).
        acc0 = jax.tree.map(vary, (jnp.zeros((), dtype),
                                   jnp.zeros((nfree,), dtype),
                                   jnp.zeros((nfree,), dtype)))

        def body(carry, m):
            key, u, g, lp, raw, da, acc = carry
            key, ks = jax.random.split(key)
            eps = jnp.exp(da[0])
            u, g, lp, raw, _, alpha_mean = hmc_step(ks, u, g, lp, raw,
                                                    eps, mass)
            da = da_update(da, m, alpha_mean)
            if collect:
                take = (m > niter // 2).astype(dtype)
                n, s1, s2 = acc
                n = n + take * nchains
                s1 = s1 + take * jnp.sum(u, axis=0)
                s2 = s2 + take * jnp.sum(u * u, axis=0)
                acc = (n, s1, s2)
            return (key, u, g, lp, raw, da, acc), None

        (key, u, g, lp, raw, da, acc), _ = jax.lax.scan(
            body, (key, u, g, lp, raw, da0, acc0),
            jnp.arange(1, niter + 1))
        eps_bar = jnp.exp(da[1])
        if collect:
            n, s1, s2 = acc
            n = jnp.maximum(n, 2.0)
            var = jnp.maximum(s2 / n - (s1 / n) ** 2, 1e-8)
            return key, u, g, lp, raw, eps_bar, var
        return key, u, g, lp, raw, eps_bar, None

    (lp, raw), g = vg(u0)
    u = u0
    mass0 = jnp.ones((nfree,), dtype)
    eps0 = jnp.asarray(0.1, dtype)

    if nwarmup <= 0:
        # Honor "no warmup" literally: fixed eps0 + unit mass (for users
        # supplying pre-tuned expectations), instead of silently running
        # 2 noisy adaptation steps.
        eps_b, mass = eps0, mass0
    elif nwarmup < 4:
        # Too few samples for a variance-based metric; adapt eps only.
        key, u, g, lp, raw, eps_b, _ = warmup_phase(
            key, u, g, lp, raw, mass0, eps0, int(nwarmup), collect=False)
        mass = mass0
    else:
        # Phase A: unit metric; adapt eps, estimate u-space variances.
        na = int(0.6 * nwarmup)
        nb = nwarmup - na
        key, u, g, lp, raw, eps_a, var = warmup_phase(
            key, u, g, lp, raw, mass0, eps0, na, collect=True)
        # Phase B: mass = 1/var (metric ~ inverse posterior covariance),
        # so momenta p ~ N(0, mass) give position updates eps * var * p
        # with the posterior's per-dimension scales; re-adapt eps under
        # the new metric.
        mass = 1.0 / var
        key, u, g, lp, raw, eps_b, _ = warmup_phase(
            key, u, g, lp, raw, mass, eps_a, nb, collect=False)
    return key, u, g, lp, raw, eps_b, mass


def hmc_prod_core(key, lnprob, lower, width, u, g, lp, raw, nacc, eps,
                  mass, nsteps, thin, n_leapfrog):
    """Production at fixed (eps, mass), recording every thin-th state.
    A pure function of the carried state, so a run segmented for
    checkpointing advances exactly the chain an uninterrupted run
    would. Returns (chain, lnp_chain, key, u, g, lp, raw, nacc)."""
    dtype = u.dtype
    nchains, nfree = u.shape
    vg, hmc_step = _make_stepper(lnprob, lower, width, n_leapfrog,
                                 dtype, nchains, nfree)
    nrec = nsteps // thin

    def prod_record(carry, _):
        def prod_step(_, c):
            key, u, g, lp, raw, nacc = c
            key, ks = jax.random.split(key)
            u, g, lp, raw, acc, _ = hmc_step(ks, u, g, lp, raw, eps, mass)
            return (key, u, g, lp, raw, nacc + acc.astype(jnp.int32))

        carry = jax.lax.fori_loop(0, thin, prod_step, carry)
        _, u, _, _, raw, _ = carry
        x = lower + width * jax.nn.sigmoid(u)
        return carry, (x, raw)

    (key, u, g, lp, raw, nacc), (chain, lnp_chain) = jax.lax.scan(
        prod_record, (key, u, g, lp, raw, nacc), None, length=nrec)
    return chain, lnp_chain, key, u, g, lp, raw, nacc


def hmc_core(key, lnprob, lower, width, u0, nwarmup, nsteps, thin,
             n_leapfrog, target_accept, vary=None):
    """Traceable HMC program body (both warmup phases + production),
    composed from hmc_warmup_core + hmc_prod_core.

    Pure function of its inputs -- `hmc_sample` jits it directly for the
    single-fit path, and the batch engine vmaps the two cores over
    sources. `vary` marks the constant-initialized loop carries
    device-varying when the caller runs under shard_map (lax.scan/fori
    carries must match the varying state they join)."""
    if vary is None:
        vary = lambda x: x
    key, u, g, lp, raw, eps_b, mass = hmc_warmup_core(
        key, lnprob, lower, width, u0, nwarmup, n_leapfrog,
        target_accept, vary=vary)
    nchains = u.shape[0]
    nacc0 = vary(jnp.zeros((nchains,), jnp.int32))
    chain, lnp_chain, key, u, g, lp, raw, nacc = hmc_prod_core(
        key, lnprob, lower, width, u, g, lp, raw, nacc0, eps_b, mass,
        nsteps, thin, n_leapfrog)
    return chain, lnp_chain, nacc, eps_b, mass


_hmc_run = jax.jit(hmc_core, static_argnames=(
    "lnprob", "nwarmup", "nsteps", "thin", "n_leapfrog", "target_accept",
    "vary"))


def hmc_sample(lnprob, lower, upper, x0, key, nwarmup=500, nsteps=1000,
               thin=1, n_leapfrog=16, target_accept=0.8,
               dtype=jnp.float32) -> HMCResult:
    """Run HMC chains on `lnprob` over the finite box [lower, upper].

    lnprob: scalar function of one free-parameter vector (vmapped and
    differentiated internally). x0: (nchains, nfree) initial positions
    strictly inside the box. Returns the thinned production chain in the
    original (constrained) space plus diagnostics.
    """
    lower = jnp.asarray(lower, dtype)
    upper = jnp.asarray(upper, dtype)
    if not (np.all(np.isfinite(np.asarray(lower)))
            and np.all(np.isfinite(np.asarray(upper)))):
        raise ValueError("HMC requires finite box bounds on every free "
                         "parameter (the defaults are finite; see "
                         "set_lowlim/set_uplim)")
    if int(nsteps) <= 0:
        # 0 % thin == 0 would pass the divisibility check and produce an
        # empty chain with a divide-by-zero acceptance fraction
        raise ValueError(f"nsteps={nsteps} must be positive")
    if int(nsteps) % max(int(thin), 1):
        raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
    width = upper - lower
    u0 = _to_unconstrained(jnp.asarray(x0, dtype), lower, width)
    chain, lnp, nacc, eps, mass = _hmc_run(
        key, lnprob, lower, width, u0, int(nwarmup), int(nsteps),
        max(int(thin), 1), int(n_leapfrog), float(target_accept))
    return HMCResult(
        chain=chain, lnprob=lnp,
        acceptance_fraction=np.asarray(nacc, np.float64) / int(nsteps),
        step_size=float(eps), mass=np.asarray(mass))
