"""Hierarchical population inference over fitted catalogs.

The reference fits every source independently and stops there
(ref: mbb_emcee has no population tier -- SURVEY.md C4/C6 describe
per-source fits and per-source derived posteriors only [reconstructed;
/root/reference was an empty mount]).  Serving a whole survey begs the
next question: what is the *population* distribution of T, beta, ... that
the catalog was drawn from?  This module answers it with the standard
posterior-importance-reweighting construction (Hogg, Myers & Bovy 2010;
Thrane & Talbot 2019 review), which is exactly TPU-shaped:

    ln L(phi) = sum_s ln [ (1/N) sum_n  p(theta_sn | phi) / pi0(theta_sn) ]

where theta_sn are the stored per-source posterior samples (the batched
chains MultiFitter / SEDMultiFitter already hold on device) drawn under
the interim per-source prior pi0.  For each hyper-parameter vector phi
the likelihood is one fused (S, N) evaluation + logsumexp -- vmapped over
the hyper-ensemble's walkers it becomes a (W, S, N) tensor contraction
that the MXU eats, and the stretch-move hyper-sampler is the same
EnsembleSampler every other tier uses.  Multi-chip: the sample tensor
shards over sources on a provided Mesh (NamedSharding on the leading
axis); XLA inserts the psum for the source sum.

The importance construction is only as good as its weights; the
effective sample size per source, ESS_s = (sum_n w_sn)^2 / sum_n w_sn^2,
is the published diagnostic and `reweight_ess()` reports it at any phi
(by default the hyper-posterior median).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp, ndtr
from jax.sharding import NamedSharding, PartitionSpec as P

from mbb_emcee_tpu import batchengine
from mbb_emcee_tpu.likelihood import (
    LikelihoodSpec, FreeSpace, LNPROB_FLOOR, spec_arrays)
from mbb_emcee_tpu.paramspace import ParamSpaceMixin
from mbb_emcee_tpu.sampler import (
    EnsembleSampler, make_initial_ball, split_rhat, autocorrelation_time)

__all__ = [
    "TruncatedGaussianPopulation", "CorrelatedGaussianPopulation",
    "Selection", "build_hier_lnprob", "HierarchicalFitter",
    "fit_population",
]


@dataclasses.dataclass(frozen=True)
class TruncatedGaussianPopulation:
    """Independent truncated normals per population parameter.

    The population density for the K selected parameters is a product of
    normals N(mu_k, sigma_k) truncated to the interim sampling box
    [lo_k, hi_k] and renormalized there -- the truncation term
    ln(Phi(b) - Phi(a)) matters whenever the population presses against a
    box edge, and dropping it (a classic shortcut) biases sigma low.

    Hyper-parameter vector layout: phi = (mu_1..mu_K, sigma_1..sigma_K).
    The default hyper box keeps mu inside the interim box and sigma in
    [width/200, width]; `sigma_log_uniform=True` adds the scale-invariant
    -sum ln(sigma) hyper-prior.

    Any object with `hyper_names`, `lower`, `upper`, `default_init`,
    `default_scatter`, `ln_dist(phi, theta)` and `ln_hyper_prior(phi)`
    plugs into HierarchicalFitter the same way (bring-your-own population
    model, mirroring sed.SEDModel's contract).
    """
    param_names: tuple
    box_lower: np.ndarray      # (K,) interim sampling box of the params
    box_upper: np.ndarray      # (K,)
    sigma_min: np.ndarray      # (K,)
    sigma_max: np.ndarray      # (K,)
    sigma_log_uniform: bool = False

    @classmethod
    def for_box(cls, param_names, lower, upper,
                sigma_min=None, sigma_max=None, sigma_log_uniform=False):
        lower = np.asarray(lower, np.float64)
        upper = np.asarray(upper, np.float64)
        if lower.ndim != 1 or lower.shape != upper.shape:
            raise ValueError("lower/upper must be matching 1-D arrays")
        if len(param_names) != lower.size:
            raise ValueError("param_names length must match the box")
        if np.any(lower >= upper):
            raise ValueError("each lower limit must be < its upper limit")
        width = upper - lower
        smin = (width / 200.0 if sigma_min is None
                else np.broadcast_to(np.asarray(sigma_min, np.float64),
                                     width.shape).copy())
        smax = (width if sigma_max is None
                else np.broadcast_to(np.asarray(sigma_max, np.float64),
                                     width.shape).copy())
        if np.any(smin <= 0) or np.any(smax <= smin):
            raise ValueError("need 0 < sigma_min < sigma_max per parameter")
        return cls(param_names=tuple(param_names), box_lower=lower.copy(),
                   box_upper=upper.copy(), sigma_min=np.asarray(smin),
                   sigma_max=np.asarray(smax),
                   sigma_log_uniform=bool(sigma_log_uniform))

    @property
    def nparams(self):
        return len(self.param_names)

    @property
    def hyper_names(self):
        return tuple(f"mu_{p}" for p in self.param_names) + tuple(
            f"sigma_{p}" for p in self.param_names)

    @property
    def lower(self):
        return np.concatenate([self.box_lower, self.sigma_min])

    @property
    def upper(self):
        return np.concatenate([self.box_upper, self.sigma_max])

    @property
    def default_init(self):
        width = self.box_upper - self.box_lower
        return np.concatenate([0.5 * (self.box_lower + self.box_upper),
                               np.minimum(0.25 * width, self.sigma_max)])

    @property
    def default_scatter(self):
        width = self.box_upper - self.box_lower
        return np.concatenate([0.1 * width, 0.05 * width])

    def ln_dist(self, phi, theta):
        """ln p(theta | phi), normalized over the truncation box.

        phi: (2K,); theta: (..., K) -> (...).  Pure JAX; safe for any phi
        inside the (possibly clip-widened) hyper box.
        """
        k = self.nparams
        mu, sigma = phi[:k], phi[k:]
        lo = jnp.asarray(self.box_lower, theta.dtype)
        hi = jnp.asarray(self.box_upper, theta.dtype)
        z = (theta - mu) / sigma
        # truncation normalization: Phi((hi-mu)/s) - Phi((lo-mu)/s);
        # mu is box-bounded and sigma >= sigma_min so the difference never
        # degenerates, but clamp against fp32 underflow anyway.
        trunc = ndtr((hi - mu) / sigma) - ndtr((lo - mu) / sigma)
        ln_norm = (-jnp.log(sigma) - 0.5 * np.log(2.0 * np.pi)
                   - jnp.log(jnp.maximum(trunc, 1e-30)))
        ln_p = jnp.sum(-0.5 * z * z + ln_norm, axis=-1)
        # a truncated density is ZERO outside its box: samples beyond it
        # (possible when a user narrows the population box below the
        # interim sampling box) must not contribute weight
        inside = jnp.all((theta >= lo) & (theta <= hi), axis=-1)
        return jnp.where(inside, ln_p, theta.dtype.type(-1e30))

    def ln_hyper_prior(self, phi):
        if not self.sigma_log_uniform:
            return jnp.asarray(0.0, phi.dtype)
        return -jnp.sum(jnp.log(phi[self.nparams:]))

    def marginal_pdf(self, phi, k, x):
        """Exact box-truncated marginal density of parameter k at grid
        `x`, host-side numpy (plotting / summaries; the independent
        family's marginals are 1-D truncated normals)."""
        from scipy.special import ndtr as _ndtr
        phi = np.asarray(phi, np.float64)
        x = np.asarray(x, np.float64)
        mu, sig = phi[k], phi[self.nparams + k]
        lo, hi = self.box_lower[k], self.box_upper[k]
        z = (x - mu) / sig
        trunc = _ndtr((hi - mu) / sig) - _ndtr((lo - mu) / sig)
        pdf = (np.exp(-0.5 * z * z)
               / (sig * np.sqrt(2 * np.pi) * max(trunc, 1e-30)))
        return np.where((x >= lo) & (x <= hi), pdf, 0.0)


@dataclasses.dataclass(frozen=True)
class CorrelatedGaussianPopulation:
    """Bivariate normal population with a free correlation -- the
    headline two-parameter science case (is the survey's T--beta
    anticorrelation a population property or just the per-source
    degeneracy?).

    Hyper vector: phi = (mu_a, mu_b, sigma_a, sigma_b, rho).  The density
    is normalized over the truncation rectangle; the normalization
    Z(phi) = P(box | mu, Sigma) has no closed form, so it is computed by
    Gauss--Legendre quadrature IN THE STANDARDIZED coordinate of the
    first parameter:

        Z = int phi(u) [Phi(h2(u)) - Phi(h1(u))] du,

    with the conditional-normal limits h(u) of the second parameter.
    Integrating in u (not x) keeps the integrand O(1)-scaled for ANY
    sigma, so a fixed 64-node rule resolves even near-delta populations
    that a box-coordinate rule would alias between nodes.  Branchless and
    vmappable over the hyper ensemble.
    """
    param_names: tuple
    box_lower: np.ndarray       # (2,)
    box_upper: np.ndarray       # (2,)
    sigma_min: np.ndarray       # (2,)
    sigma_max: np.ndarray       # (2,)
    rho_max: float = 0.95
    sigma_log_uniform: bool = False

    _GL_NODES = 64

    @classmethod
    def for_box(cls, param_names, lower, upper, sigma_min=None,
                sigma_max=None, rho_max=0.95, sigma_log_uniform=False):
        lower = np.asarray(lower, np.float64)
        upper = np.asarray(upper, np.float64)
        if lower.shape != (2,) or upper.shape != (2,):
            raise ValueError(
                "CorrelatedGaussianPopulation is the two-parameter "
                "family; give 2-element boxes (use "
                "TruncatedGaussianPopulation or a custom model for "
                "other dimensionalities)")
        if len(param_names) != 2:
            raise ValueError("param_names must name exactly 2 parameters")
        if np.any(lower >= upper):
            raise ValueError("each lower limit must be < its upper limit")
        if not 0.0 < rho_max < 1.0:
            raise ValueError("rho_max must be in (0, 1)")
        width = upper - lower
        smin = (width / 100.0 if sigma_min is None
                else np.broadcast_to(np.asarray(sigma_min, np.float64),
                                     (2,)).copy())
        smax = (width if sigma_max is None
                else np.broadcast_to(np.asarray(sigma_max, np.float64),
                                     (2,)).copy())
        if np.any(smin <= 0) or np.any(smax <= smin):
            raise ValueError("need 0 < sigma_min < sigma_max per parameter")
        return cls(param_names=tuple(param_names), box_lower=lower.copy(),
                   box_upper=upper.copy(), sigma_min=smin, sigma_max=smax,
                   rho_max=float(rho_max),
                   sigma_log_uniform=bool(sigma_log_uniform))

    @property
    def hyper_names(self):
        a, b = self.param_names
        return (f"mu_{a}", f"mu_{b}", f"sigma_{a}", f"sigma_{b}",
                f"rho_{a}_{b}")

    @property
    def lower(self):
        return np.concatenate([self.box_lower, self.sigma_min,
                               [-self.rho_max]])

    @property
    def upper(self):
        return np.concatenate([self.box_upper, self.sigma_max,
                               [self.rho_max]])

    @property
    def default_init(self):
        width = self.box_upper - self.box_lower
        return np.concatenate([0.5 * (self.box_lower + self.box_upper),
                               np.minimum(0.25 * width, self.sigma_max),
                               [0.0]])

    @property
    def default_scatter(self):
        width = self.box_upper - self.box_lower
        return np.concatenate([0.1 * width, 0.05 * width, [0.2]])

    def _ln_z(self, mu, sigma, rho, dtype):
        """ln P(box | mu, Sigma) by 64-node GL in the standardized first
        coordinate (see class docstring)."""
        nodes, weights = np.polynomial.legendre.leggauss(self._GL_NODES)
        nodes = jnp.asarray(nodes, dtype)
        weights = jnp.asarray(weights, dtype)
        lo = jnp.asarray(self.box_lower, dtype)
        hi = jnp.asarray(self.box_upper, dtype)
        a1 = jnp.clip((lo[0] - mu[0]) / sigma[0], -8.0, 8.0)
        a2 = jnp.clip((hi[0] - mu[0]) / sigma[0], -8.0, 8.0)
        u = 0.5 * (a2 - a1) * nodes + 0.5 * (a2 + a1)      # (n,)
        # conditional second parameter given first = mu_a + sigma_a u
        cmean = mu[1] + rho * sigma[1] * u
        csd = sigma[1] * jnp.sqrt(jnp.maximum(1.0 - rho * rho, 1e-6))
        inner = (ndtr((hi[1] - cmean) / csd)
                 - ndtr((lo[1] - cmean) / csd))
        dens = jnp.exp(-0.5 * u * u) / np.sqrt(2.0 * np.pi)
        z = 0.5 * (a2 - a1) * jnp.sum(weights * dens * inner)
        return jnp.log(jnp.maximum(z, 1e-30))

    def ln_dist(self, phi, theta):
        """ln p(theta | phi), normalized over the truncation rectangle.
        phi: (5,); theta: (..., 2) -> (...)."""
        mu, sigma, rho = phi[:2], phi[2:4], phi[4]
        za = (theta[..., 0] - mu[0]) / sigma[0]
        zb = (theta[..., 1] - mu[1]) / sigma[1]
        om = jnp.maximum(1.0 - rho * rho, 1e-6)
        q = (za * za - 2.0 * rho * za * zb + zb * zb) / om
        ln_n = (-0.5 * q - jnp.log(sigma[0]) - jnp.log(sigma[1])
                - 0.5 * jnp.log(om) - np.log(2.0 * np.pi))
        ln_p = ln_n - self._ln_z(mu, sigma, rho, theta.dtype)
        lo = jnp.asarray(self.box_lower, theta.dtype)
        hi = jnp.asarray(self.box_upper, theta.dtype)
        inside = jnp.all((theta >= lo) & (theta <= hi), axis=-1)
        return jnp.where(inside, ln_p, theta.dtype.type(-1e30))

    def ln_hyper_prior(self, phi):
        if not self.sigma_log_uniform:
            return jnp.asarray(0.0, phi.dtype)
        return -jnp.sum(jnp.log(phi[2:4]))

    def marginal_pdf(self, phi, k, x):
        """Exact box-truncated marginal of parameter k: the bivariate
        restricted to the rectangle marginalizes in closed form --
        normal marginal in k times the conditional box probability of
        the other coordinate, over Z. Host-side numpy."""
        from scipy.special import ndtr as _ndtr
        phi = np.asarray(phi, np.float64)
        x = np.asarray(x, np.float64)
        j = 1 - k
        mu, sig, rho = phi[:2], phi[2:4], phi[4]
        lo, hi = self.box_lower, self.box_upper
        u = (x - mu[k]) / sig[k]
        cmean = mu[j] + rho * sig[j] * u
        csd = sig[j] * np.sqrt(max(1.0 - rho * rho, 1e-6))
        inner = (_ndtr((hi[j] - cmean) / csd)
                 - _ndtr((lo[j] - cmean) / csd))
        # Z from the SAME rule ln_dist divides by (one implementation;
        # a drifted copy would desynchronize density and marginal). Note
        # _ln_z integrates in the FIRST parameter's standardized
        # coordinate regardless of k -- Z is a property of (mu, Sigma,
        # box), not of the marginalized coordinate.
        z_norm = float(np.exp(self._ln_z(
            jnp.asarray(mu, jnp.float32), jnp.asarray(sig, jnp.float32),
            jnp.float32(rho), jnp.float32)))
        pdf = (np.exp(-0.5 * u * u) * inner
               / (sig[k] * np.sqrt(2 * np.pi) * max(z_norm, 1e-30)))
        return np.where((x >= lo[k]) & (x <= hi[k]), pdf, 0.0)


@dataclasses.dataclass(frozen=True)
class Selection:
    """Survey selection function, Monte-Carlo form (the injection-
    campaign construction of Mandel, Farr & Gair 2019; Farr 2019's
    N_eff diagnostic): the detection fraction under population phi,

        alpha(phi) = int P_det(theta) p(theta|phi) dtheta
                   ~ (1/n_total) sum_m P_det(theta_m)
                                        p(theta_m|phi) / p_draw(theta_m),

    enters the hyper-likelihood as -S ln alpha(phi) and corrects the
    Malmquist bias a flux/threshold-limited catalog otherwise imprints
    on the inferred population.  On device this is one more fused
    (M,)-reduction per hyper vector, sharing the population ln_dist.

    injections: (M, K) reference draws theta_m; ln_pdet: (M,)
    ln P_det(theta_m) (0 = the found-injection convention where only
    detected injections are listed and n_total counts ALL draws);
    ln_draw: (M,) ln p_draw(theta_m); n_total: total draws including
    undetected ones.
    """
    injections: np.ndarray
    ln_pdet: np.ndarray
    ln_draw: np.ndarray
    n_total: int

    @classmethod
    def from_injections(cls, injections, pdet=None, ln_draw=None,
                        n_total=None, box=None):
        """Build from an injection campaign.

        injections: (M, K).  pdet: (M,) detection probabilities in
        [0, 1] (omit for found-only injection lists).  ln_draw: (M,)
        ln p_draw; omit if the draws are uniform over `box` (a
        (lower, upper) pair -- e.g. the population box), in which case
        the constant -ln V is used.  n_total defaults to M (set it to
        the full campaign size when `injections` lists only the found
        ones)."""
        injections = np.asarray(injections, np.float64)
        if injections.ndim != 2:
            raise ValueError(
                f"injections must be (M, K); got {injections.shape}")
        m = injections.shape[0]
        if pdet is None:
            ln_pdet = np.zeros(m)
        else:
            pdet = np.asarray(pdet, np.float64)
            if pdet.shape != (m,):
                raise ValueError(f"pdet must be (M,)=({m},)")
            if np.any(pdet < 0) or np.any(pdet > 1):
                raise ValueError("pdet values must be in [0, 1]")
            with np.errstate(divide="ignore"):
                ln_pdet = np.where(pdet > 0, np.log(np.maximum(pdet,
                                                               1e-300)),
                                   -745.0)   # exp(-745) underflows to 0
        if ln_draw is None:
            if box is None:
                raise ValueError(
                    "give ln_draw (per-draw ln p_draw) or box=(lower, "
                    "upper) for uniform draws")
            lo = np.asarray(box[0], np.float64)
            hi = np.asarray(box[1], np.float64)
            ln_draw = np.full(m, -float(np.sum(np.log(hi - lo))))
        else:
            ln_draw = np.asarray(ln_draw, np.float64)
            if ln_draw.shape != (m,):
                raise ValueError(f"ln_draw must be (M,)=({m},)")
        n_total = m if n_total is None else int(n_total)
        if n_total < m:
            raise ValueError(
                f"n_total={n_total} < number of listed injections {m}")
        return cls(injections=injections, ln_pdet=np.asarray(ln_pdet),
                   ln_draw=ln_draw, n_total=n_total)


def build_hier_lnprob(samples, population, spec: LikelihoodSpec,
                      ln_interim=None, selection=None, dtype=jnp.float32,
                      mesh=None):
    """Fused hierarchical lnprob over the FREE hyper-parameter space.

    samples: (S, N, K) per-source posterior draws of the K population
    parameters; ln_interim: optional (S, N) interim ln-prior values at
    those draws (phi-independent offsets cancel -- only per-sample
    variation, e.g. Gaussian interim priors, matters; flat-box interim
    priors pass None).  Returns (lnprob_fn, free_space); lnprob_fn maps a
    (nfree,) hyper vector to a scalar and follows the package's box-floor
    / clip-widening / reduced-space conventions exactly
    (likelihood.build_lnprob design notes).

    Under `mesh` the sample tensor (and ln_interim) is placed with a
    NamedSharding over the leading source axis; the source sum inside jit
    then rides ICI via an XLA-inserted psum.
    """
    samples = jnp.asarray(samples, dtype)
    if samples.ndim != 3:
        raise ValueError(f"samples must be (S, N, K); got {samples.shape}")
    S, N, K = samples.shape
    nhyper = spec.lower.size
    if np.asarray(population.lower).size != nhyper:
        raise ValueError(
            f"spec is sized for {nhyper} hyper-parameters; population "
            f"model declares {np.asarray(population.lower).size}")

    if ln_interim is not None:
        ln_interim = jnp.asarray(ln_interim, dtype)
        if ln_interim.shape != (S, N):
            raise ValueError(
                f"ln_interim must be (S, N)={S, N}; got {ln_interim.shape}")

    # A source whose stored chain lies ENTIRELY outside the population's
    # truncation box would floor the hyper-lnprob for every phi (zero
    # weight everywhere), freezing the sampler with acceptance 0 and no
    # error. Catch it host-side with a clear message instead.
    pop_lo = getattr(population, "box_lower", None)
    pop_hi = getattr(population, "box_upper", None)
    if pop_lo is not None and pop_hi is not None:
        host = np.asarray(samples)
        inside = np.all((host >= np.asarray(pop_lo))
                        & (host <= np.asarray(pop_hi)), axis=-1)  # (S, N)
        dead = np.nonzero(~inside.any(axis=1))[0]
        if dead.size:
            raise ValueError(
                f"source(s) {dead.tolist()} have NO samples inside the "
                f"population truncation box [{np.asarray(pop_lo)}, "
                f"{np.asarray(pop_hi)}]; every hyper vector would get "
                "zero weight there. Widen the population box or drop "
                "those sources")
        if selection is not None:
            inj_host = np.asarray(selection.injections)
            inj_in = np.all((inj_host >= np.asarray(pop_lo))
                            & (inj_host <= np.asarray(pop_hi)), axis=-1)
            if not inj_in.any():
                raise ValueError(
                    "no selection injections fall inside the population "
                    "truncation box; alpha(phi) would underflow for "
                    "every phi (and its log-penalty would blow up the "
                    "hyper-lnprob). Draw injections over the population "
                    "box")

    if mesh is not None:
        ax0 = mesh.axis_names[0]
        n_shard = int(mesh.shape[ax0])
        if S % n_shard:
            raise ValueError(
                f"mesh axis {ax0!r} size {n_shard} must divide the "
                f"source count {S}")
        # Auto-mode view of the caller's mesh: walker_mesh() builds
        # explicit-axis meshes (jax.make_mesh), whose shardings demand a
        # set_mesh context inside jit; plain auto sharding propagates
        # through the vmapped hyper-lnprob with no context management.
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(mesh.devices), mesh.axis_names)
        ax = mesh.axis_names[0]
        samples = jax.device_put(
            samples, NamedSharding(mesh, P(ax, None, None)))
        if ln_interim is not None:
            ln_interim = jax.device_put(
                ln_interim, NamedSharding(mesh, P(ax, None)))

    sa = spec_arrays(spec, dtype)
    free_space = sa.free_space
    (template, scatter, lo_free, hi_free, lo_full, hi_full,
     prior_mean, prior_isig) = sa[1:]
    log_n = float(np.log(N))

    if selection is not None:
        inj = jnp.asarray(selection.injections, dtype)
        if inj.ndim != 2 or inj.shape[1] != K:
            raise ValueError(
                f"selection.injections must be (M, {K}); got {inj.shape}")
        inj_lnw = np.asarray(selection.ln_pdet - selection.ln_draw, dtype)
        log_m = float(np.log(selection.n_total))

    def lnprob(phi_free):
        phi = template + scatter @ phi_free
        inbox = jnp.all((phi_free >= lo_free) & (phi_free <= hi_free))
        phi_safe = jnp.clip(phi, lo_full, hi_full)
        lw = population.ln_dist(phi_safe, samples)       # (S, N)
        if ln_interim is not None:
            lw = lw - ln_interim
        lnl = jnp.sum(logsumexp(lw, axis=-1) - log_n)    # sum over sources
        if selection is not None:
            # -S ln alpha(phi): one more fused (M,) reduction
            ln_alpha = logsumexp(
                population.ln_dist(phi_safe, inj) + inj_lnw) - log_m
            lnl = lnl - S * ln_alpha
        dp = (phi - prior_mean) * prior_isig
        lnpri = -0.5 * jnp.sum(dp * dp) + population.ln_hyper_prior(phi_safe)
        return jnp.where(inbox, lnl + lnpri, dtype(LNPROB_FLOOR))

    return lnprob, free_space


class HierarchicalFitter(ParamSpaceMixin):
    """Hyper-parameter sampler over a catalog's stored posteriors.

    Construct directly from a (S, N, K) sample tensor + population model,
    or via `from_batch(mf, params=...)` on a finished MultiFitter /
    SEDMultiFitter run.  The run protocol, setter surface
    (set_lowlim/set_uplim/fix_param/set_gaussian_prior/set_param_init on
    HYPER-parameters, addressed by the population model's names), extend()
    continuation and summary accessors mirror the other fitter tiers.
    """

    def __init__(self, samples, population, ln_interim=None, nwalkers=64,
                 seed=3033, a=2.0, dtype=jnp.float32, mesh=None):
        host_dt = np.dtype(dtype)      # honor dtype=float64: don't
        self.samples = np.asarray(samples, host_dt)  # pre-quantize to fp32
        if self.samples.ndim != 3:
            raise ValueError(
                f"samples must be (S, N, K); got {self.samples.shape}")
        self.population = population
        self.ln_interim = (None if ln_interim is None
                           else np.asarray(ln_interim, host_dt))
        self.nwalkers = int(nwalkers)
        self.seed = int(seed)
        self.a = float(a)
        self.dtype = dtype
        self.mesh = mesh
        self._spec = LikelihoodSpec.for_box(population.lower,
                                            population.upper)
        self._init = np.asarray(population.default_init, np.float64).copy()
        self._scatter = np.asarray(population.default_scatter,
                                   np.float64).copy()
        self._user_init = np.zeros(self._init.size, bool)
        self._user_scatter = np.zeros(self._init.size, bool)
        self.free_space = None
        self.chain_free = None     # (nrec, nwalkers, nfree)
        self.lnprobability = None  # (nrec, nwalkers)
        self.thin = 1
        self._state = None
        self._sampler = None
        self._acceptance = None
        self.evidence = None       # NestedResult, compute_evidence()
        self.selection = None      # Selection, set_selection()

    # -- ParamSpaceMixin plumbing ------------------------------------------
    def _param_index(self, param):
        if isinstance(param, (int, np.integer)):
            i = int(param)
            if not 0 <= i < len(self.population.hyper_names):
                raise ValueError(f"hyper-parameter index {i} out of range")
            return i
        names = [n.lower() for n in self.population.hyper_names]
        try:
            return names.index(str(param).lower())
        except ValueError:
            raise ValueError(
                f"unknown hyper-parameter {param!r}; "
                f"known: {self.population.hyper_names}") from None

    def _effective_spec(self):
        return self._spec

    @classmethod
    def from_batch(cls, batch, params, population=None, max_samples=4096,
                   sigma_log_uniform=False, correlated=False, **kw):
        """Build the hyper-fitter from a finished batched fit.

        `batch` is a MultiFitter or SEDMultiFitter after run(); `params`
        names the population parameters (must be free in the fit).  The
        per-source chains are flattened and strided down to at most
        `max_samples` draws per source (deterministic stride, so rebuilds
        are reproducible).  Gaussian interim priors on the selected
        parameters are divided out automatically; the flat-box factor is
        phi-independent and cancels.  The default population family is
        independent truncated normals; `correlated=True` (exactly two
        params) switches to the bivariate family with a free rho.
        """
        chain = getattr(batch, "chain_free", None)
        if chain is None:
            raise RuntimeError("from_batch needs a finished run()")
        chain = np.asarray(chain)       # (S, nrec, nw, nfree)
        free_names = [n.lower() for n in batch.free_param_names]
        cols = []
        for p in params:
            key = str(p).lower()
            if key not in free_names:
                raise ValueError(
                    f"population parameter {p!r} is not free in the fit; "
                    f"free parameters: {batch.free_param_names}")
            cols.append(free_names.index(key))
        cols = np.asarray(cols)
        S = chain.shape[0]
        flat = chain.reshape(S, -1, chain.shape[-1])[..., cols]  # (S,nsamp,K)
        nsamp = flat.shape[1]
        if nsamp > max_samples:
            stride = int(np.ceil(nsamp / max_samples))
            flat = flat[:, ::stride][:, :max_samples]

        spec = batch.spec
        free_idx = spec.free_indices[cols]
        lo = spec.lower[free_idx]
        hi = spec.upper[free_idx]
        if population is None:
            names = tuple(str(p) for p in params)
            if correlated:
                if len(names) != 2:
                    raise ValueError(
                        "correlated=True uses the bivariate family; give "
                        "exactly 2 params (or pass a custom population)")
                population = CorrelatedGaussianPopulation.for_box(
                    names, lo, hi, sigma_log_uniform=sigma_log_uniform)
            else:
                population = TruncatedGaussianPopulation.for_box(
                    names, lo, hi, sigma_log_uniform=sigma_log_uniform)
        elif correlated:
            raise ValueError("correlated=True conflicts with an explicit "
                             "population model")

        # interim Gaussian priors on the selected params (if any): the
        # quadratic term varies per sample and must be divided out of the
        # weights; normalization constants are phi-independent and drop.
        # Per-source priors on non-selected params are part of the
        # factorized pi(theta_other) and stay, like shared ones.
        isig = spec.prior_isigma[free_idx]
        if np.any(isig > 0):
            mu0 = spec.prior_mean[free_idx]
            d = (flat - mu0) * isig
            ln_interim = -0.5 * np.sum(d * d, axis=-1)
        else:
            ln_interim = None
        # ... and PER-SOURCE interim priors (sedmulti.set_gaussian_prior
        # with (S,) arrays, e.g. spec-z anchors): same division, with the
        # mean/isigma varying along the source axis.
        ps = getattr(batch, "_ps_prior", None) or {}
        if ps:
            for k, p in enumerate(params):
                entry = ps.get(str(p).lower())
                if entry is None:
                    continue
                m_s, i_s = entry
                d = (flat[..., k] - m_s[:, None]) * i_s[:, None]
                q = -0.5 * d * d
                ln_interim = q if ln_interim is None else ln_interim + q
        return cls(flat, population, ln_interim=ln_interim, **kw)

    def set_selection(self, injections, pdet=None, ln_draw=None,
                      n_total=None, box=None):
        """Attach the survey selection function as an injection campaign
        (see Selection.from_injections); the hyper-likelihood gains the
        -S ln alpha(phi) Malmquist correction. `box` defaults to the
        population's truncation box when the draws are uniform.
        Passing an existing Selection via `injections` keeps it as-is."""
        if isinstance(injections, Selection):
            self.selection = injections
        else:
            if ln_draw is None and box is None:
                box = (self.population.box_lower, self.population.box_upper)
            self.selection = Selection.from_injections(
                injections, pdet=pdet, ln_draw=ln_draw, n_total=n_total,
                box=box)
        return self

    def selection_neff(self, phi=None):
        """Effective number of injections behind alpha(phi) (Farr 2019):
        N_eff = (sum w)^2 / sum w^2 with w_m = P_det p(theta_m|phi) /
        p_draw. The published rule of thumb wants N_eff >= 4 S, otherwise
        the Monte-Carlo noise of the selection integral contaminates the
        hyper-posterior -- run more injections. Default phi = the
        hyper-posterior median."""
        if self.selection is None:
            raise RuntimeError("set_selection() first")
        if phi is None:
            self._require_run()
            phi = self.free_space.expand(np.median(self.flatchain, axis=0))
        phi = jnp.asarray(phi, self.dtype)
        inj = jnp.asarray(self.selection.injections, self.dtype)
        lw = (self.population.ln_dist(phi, inj)
              + jnp.asarray(self.selection.ln_pdet
                            - self.selection.ln_draw, self.dtype))
        lw = lw - logsumexp(lw)
        return float(jnp.exp(-logsumexp(2.0 * lw)))

    # -- sampling -----------------------------------------------------------
    def _program_token(self, spec):
        """Cross-instance traced-program token (round 5), or None when
        the hyper-lnprob closure cannot be safely fingerprinted. The
        builtin populations and Selection are frozen dataclasses of
        scalars + arrays, so their content (plus the sample tensor,
        interim-prior weights, spec box, and mesh) fully determines the
        traced computation; a user-supplied population model is an
        arbitrary object -> trace per instance (the safe default)."""
        from mbb_emcee_tpu.checkpoint import data_fingerprint

        def dataclass_fp(obj):
            parts = [type(obj).__module__, type(obj).__qualname__]
            for f in dataclasses.fields(obj):
                v = getattr(obj, f.name)
                if isinstance(v, (np.ndarray, list, tuple, float, int,
                                  bool, str)) or v is None:
                    parts.append((f.name, data_fingerprint(
                        np.asarray(v) if v is not None else None)))
                else:
                    return None
            return tuple(parts)

        if type(self.population) not in (TruncatedGaussianPopulation,
                                         CorrelatedGaussianPopulation):
            return None
        pop_fp = dataclass_fp(self.population)
        if pop_fp is None:
            return None
        if self.selection is not None:
            if type(self.selection) is not Selection:
                return None
            sel_fp = dataclass_fp(self.selection)
            if sel_fp is None:
                return None
        else:
            sel_fp = None
        # batchengine's token includes the device-grid SHAPE: two meshes
        # over the same devices/axis-names but different shapes lower to
        # different shardings and must not share a traced program.
        mesh_fp = (batchengine._mesh_token(self.mesh)
                   if self.mesh is not None else None)
        return ("hier", pop_fp, sel_fp, mesh_fp,
                data_fingerprint(self.samples, self.ln_interim,
                                 spec.lower, spec.upper, spec.fixed,
                                 spec.fixed_values, spec.prior_mean,
                                 spec.prior_isigma))

    def build(self):
        spec = self._effective_spec()
        lnprob, free_space = build_hier_lnprob(
            self.samples, self.population, spec,
            ln_interim=self.ln_interim, selection=self.selection,
            dtype=self.dtype, mesh=self.mesh)
        sampler = EnsembleSampler(self.nwalkers, free_space.nfree, lnprob,
                                  a=self.a, dtype=self.dtype,
                                  program_token=self._program_token(spec))
        return lnprob, free_space, sampler

    def run(self, nburn=200, nsteps=1000, thin=1, p0=None,
            recenter_burn=True, verbose=False):
        """Burn -> re-center on the best burn-in sample -> re-burn ->
        reset -> production, over the hyper space.  Returns self."""
        if int(thin) < 1:
            raise ValueError(f"thin={thin} must be >= 1")
        if int(nsteps) % int(thin):
            raise ValueError(f"nsteps={nsteps} not divisible by thin={thin}")
        thin = int(thin)
        lnprob, free_space, sampler = self.build()
        self.free_space = free_space
        self.thin = thin

        key = jax.random.PRNGKey(self.seed)
        key, kball = jax.random.split(key)
        if p0 is None:
            center = self._init[free_space.free_idx]
            scatter = self._scatter[free_space.free_idx]
            p0 = make_initial_ball(kball, center, scatter, self.nwalkers,
                                   free_space.lower, free_space.upper)
        else:
            p0 = jnp.asarray(p0, jnp.float32)
            if p0.shape[-1] == self._spec.lower.size:
                p0 = p0[..., free_space.free_idx]
        state = sampler.init_state(key, p0)

        if nburn > 0:
            state, bchain, blnp = sampler.run_mcmc(state, nburn)
            if recenter_burn:
                flat = np.asarray(bchain).reshape(-1, free_space.nfree)
                best = jnp.asarray(
                    flat[np.argmax(np.asarray(blnp).reshape(-1))],
                    jnp.float32)
                key2, kball2 = jax.random.split(state.key)
                tight = self._scatter[free_space.free_idx] * 0.1
                p0b = make_initial_ball(kball2, best, tight, self.nwalkers,
                                        free_space.lower, free_space.upper)
                state = sampler.init_state(key2, p0b)
                state = sampler.advance(state, nburn)
            state = sampler.reset_counters(state)

        state, chain, lnp = sampler.run_mcmc(state, nsteps, thin)
        self.chain_free = np.asarray(chain)
        self.lnprobability = np.asarray(lnp)
        self._state = state
        self._sampler = sampler
        self._acceptance = np.asarray(
            EnsembleSampler.acceptance_fraction(state))
        if verbose:
            # R-hat needs >= 4 records; a tiny verbose run must not crash
            # AFTER the sampling finished (same rule as the batch CLI)
            rhat = (float(self.gelman_rubin()[1].max())
                    if self.chain_free.shape[0] >= 4 else float("nan"))
            print(f"HierarchicalFitter: acceptance "
                  f"{float(np.mean(self._acceptance)):.3f}, max split-R-hat "
                  f"{rhat:.3f}")
        return self

    def extend(self, nsteps):
        """Continue production (same PRNG stream) and append."""
        if self._state is None:
            raise RuntimeError("extend() needs a finished run()")
        if int(nsteps) % self.thin:
            raise ValueError(
                f"nsteps={nsteps} not divisible by thin={self.thin}")
        state, chain, lnp = self._sampler.run_mcmc(
            self._state, int(nsteps), self.thin)
        self.chain_free = np.concatenate(
            [self.chain_free, np.asarray(chain)], axis=0)
        self.lnprobability = np.concatenate(
            [self.lnprobability, np.asarray(lnp)], axis=0)
        self._state = state
        self._acceptance = np.asarray(
            EnsembleSampler.acceptance_fraction(state))
        return self

    # -- summaries ----------------------------------------------------------
    def _require_run(self):
        if self.chain_free is None:
            raise RuntimeError("run() first")

    def free_hyper_names(self):
        names = self.population.hyper_names
        self._require_run()
        return [names[i] for i in self.free_space.free_idx]

    @property
    def flatchain(self):
        """(nsamp, nfree) flattened hyper chain."""
        self._require_run()
        return self.chain_free.reshape(-1, self.chain_free.shape[-1])

    def hyper_chain(self, param):
        self._require_run()
        i = self._param_index(param)
        cols = list(self.free_space.free_idx)
        if i not in cols:
            raise ValueError(
                f"hyper-parameter {param!r} is fixed; no chain for it")
        return self.flatchain[:, cols.index(i)]

    def par_cen(self, param, percentile=68.3):
        """(central, +err, -err) hyper-posterior summary (the package's
        par_cen convention)."""
        c = self.hyper_chain(param)
        q = 0.5 * (100.0 - percentile)
        lo, med, hi = np.percentile(c, [q, 50.0, 100.0 - q])
        return np.array([med, hi - med, med - lo])

    def best_fit(self):
        """(phi_full, lnprob) at the maximum-lnprob hyper sample."""
        self._require_run()
        flat_lnp = self.lnprobability.reshape(-1)
        i = int(np.argmax(flat_lnp))
        phi = self.free_space.expand(self.flatchain[i])
        return phi, float(flat_lnp[i])

    @property
    def acceptance_fraction(self):
        self._require_run()
        return self._acceptance

    def gelman_rubin(self):
        self._require_run()
        return (self.free_hyper_names(),
                np.asarray(split_rhat(self.chain_free)))

    def autocorrelation_time(self):
        self._require_run()
        return autocorrelation_time(self.chain_free)

    def compute_evidence(self, nlive=512, nbatch=32, nsteps=32,
                         max_iter=3000, tol=1e-4, seed=None, verbose=False):
        """Bayesian evidence ln Z of THIS population model via nested
        sampling over the hyper box -- the population-family selection
        tool: difference two runs on the same catalog for the Bayes
        factor between, e.g., the independent and correlated families
        ("is the T-beta population correlation real?") or free vs fixed
        sigma. Prior convention matches the other fitters'
        compute_evidence: normalized uniform over the free hyper box
        times any Gaussian hyper-priors and the model's ln_hyper_prior.
        Returns a NestedResult with samples expanded to the full hyper
        space.

        (The sampling tiers stop at the stretch move here: hyper spaces
        are <= a handful of dimensions, where it mixes fine; evidence is
        the capability the tier actually lacks.)
        """
        from mbb_emcee_tpu.nested import nested_sample

        lnprob, free_space = build_hier_lnprob(
            self.samples, self.population, self._effective_spec(),
            ln_interim=self.ln_interim, selection=self.selection,
            dtype=self.dtype, mesh=self.mesh)
        key = jax.random.PRNGKey(self.seed if seed is None else int(seed))
        tok = self._program_token(self._effective_spec())
        res = nested_sample(lnprob, free_space.lower, free_space.upper,
                            key, nlive=nlive, nbatch=nbatch, nsteps=nsteps,
                            max_iter=max_iter, tol=tol, dtype=self.dtype,
                            program_token=(None if tok is None
                                           else ("evidence",) + tuple(tok)))
        res = dataclasses.replace(res,
                                  samples=free_space.expand(res.samples))
        self.evidence = res
        if verbose:
            print(f"HierarchicalFitter ln Z = {res.logz:.4f} "
                  f"+- {res.logz_err:.4f}")
        return res

    # -- importance-weight diagnostics --------------------------------------
    def reweight_ess(self, phi=None):
        """(S,) effective sample size of the per-source importance weights
        at hyper vector `phi` (full, nhyper-sized; default = the
        hyper-posterior median).  ESS_s near N means the reweighting is
        benign; ESS_s of a few means source s's stored chain barely covers
        the population and the hyper-posterior is untrustworthy there --
        refit that source with a tighter interim prior or more samples.
        One batched device call."""
        if phi is None:
            self._require_run()
            med = np.median(self.flatchain, axis=0)
            phi = self.free_space.expand(med)
        phi = jnp.asarray(phi, self.dtype)
        samples = jnp.asarray(self.samples, self.dtype)
        lw = self.population.ln_dist(phi, samples)
        if self.ln_interim is not None:
            lw = lw - jnp.asarray(self.ln_interim, self.dtype)
        lw = lw - logsumexp(lw, axis=-1, keepdims=True)
        return np.asarray(jnp.exp(-logsumexp(2.0 * lw, axis=-1)))

    def plot_population(self, param, **kw):
        """Population band + per-source-median histogram for one
        parameter (see plotting.plot_population)."""
        from mbb_emcee_tpu.plotting import plot_population
        self._require_run()
        return plot_population(self, param, **kw)

    # -- persistence ---------------------------------------------------------
    def writeToHDF5(self, path):
        """Persist the FULL tier state: hyper chain, the (S, N, K) sample
        tensor + interim-prior values, and the population configuration
        (round-trips via from_h5 for the built-in families; custom
        population models are re-supplied at load)."""
        self._require_run()
        import h5py
        pop = self.population
        with h5py.File(path, "w") as f:
            f.attrs["kind"] = "hierarchy"
            f.attrs["hyper_names"] = np.array(
                [n.encode() for n in pop.hyper_names])
            f.attrs["free_idx"] = self.free_space.free_idx
            f.attrs["nwalkers"] = self.nwalkers
            f.attrs["seed"] = self.seed
            f.attrs["a"] = self.a
            f.attrs["thin"] = self.thin
            f.create_dataset("chain_free", data=self.chain_free)
            f.create_dataset("lnprobability", data=self.lnprobability)
            f.create_dataset("hyper_lower", data=np.asarray(pop.lower))
            f.create_dataset("hyper_upper", data=np.asarray(pop.upper))
            f.create_dataset("reweight_ess", data=self.reweight_ess())
            f.create_dataset("samples", data=self.samples,
                             compression="gzip")
            if self.ln_interim is not None:
                f.create_dataset("ln_interim", data=self.ln_interim,
                                 compression="gzip")
            # spec (hyper-space setter state) so a reload can re-run
            spec = self._spec
            g = f.create_group("Spec")
            for name in ("lower", "upper", "fixed", "fixed_values",
                         "prior_mean", "prior_isigma"):
                g.create_dataset(name, data=np.asarray(getattr(spec, name)))
            if self.selection is not None:
                g = f.create_group("Selection")
                g.create_dataset("injections",
                                 data=self.selection.injections,
                                 compression="gzip")
                g.create_dataset("ln_pdet", data=self.selection.ln_pdet)
                g.create_dataset("ln_draw", data=self.selection.ln_draw)
                g.attrs["n_total"] = self.selection.n_total
            if isinstance(pop, (TruncatedGaussianPopulation,
                                CorrelatedGaussianPopulation)):
                g = f.create_group("Population")
                g.attrs["class"] = type(pop).__name__
                g.attrs["param_names"] = np.array(
                    [n.encode() for n in pop.param_names])
                g.attrs["sigma_log_uniform"] = pop.sigma_log_uniform
                g.create_dataset("box_lower", data=pop.box_lower)
                g.create_dataset("box_upper", data=pop.box_upper)
                g.create_dataset("sigma_min", data=pop.sigma_min)
                g.create_dataset("sigma_max", data=pop.sigma_max)
                if isinstance(pop, CorrelatedGaussianPopulation):
                    g.attrs["rho_max"] = pop.rho_max
        return self

    @classmethod
    def from_h5(cls, path, population=None):
        """Reload a persisted population fit: summaries, plots and ESS
        work immediately; run()/compute_evidence() re-fit from the stored
        samples (extend() needs a fresh run -- the sampler state is not
        persisted). Built-in population families reconstruct themselves;
        a custom model must be passed back via `population`."""
        import h5py
        with h5py.File(path, "r") as f:
            if f.attrs.get("kind") != "hierarchy":
                raise ValueError(f"{path} is not a hierarchy HDF5 file")
            if population is None:
                if "Population" not in f:
                    raise ValueError(
                        "this file was written with a custom population "
                        "model; pass it back via population=")
                g = f["Population"]
                names = tuple(n.decode() for n in g.attrs["param_names"])
                kw = dict(sigma_min=g["sigma_min"][...],
                          sigma_max=g["sigma_max"][...],
                          sigma_log_uniform=bool(
                              g.attrs["sigma_log_uniform"]))
                if g.attrs["class"] == "CorrelatedGaussianPopulation":
                    population = CorrelatedGaussianPopulation.for_box(
                        names, g["box_lower"][...], g["box_upper"][...],
                        rho_max=float(g.attrs["rho_max"]), **kw)
                else:
                    population = TruncatedGaussianPopulation.for_box(
                        names, g["box_lower"][...], g["box_upper"][...],
                        **kw)
            ln_interim = (f["ln_interim"][...] if "ln_interim" in f
                          else None)
            hf = cls(f["samples"][...], population,
                     ln_interim=ln_interim,
                     nwalkers=int(f.attrs["nwalkers"]),
                     seed=int(f.attrs["seed"]), a=float(f.attrs["a"]))
            g = f["Spec"]
            hf._spec = LikelihoodSpec(
                lower=g["lower"][...], upper=g["upper"][...],
                fixed=g["fixed"][...].astype(bool),
                fixed_values=g["fixed_values"][...],
                prior_mean=g["prior_mean"][...],
                prior_isigma=g["prior_isigma"][...])
            hf.free_space = FreeSpace.from_spec(hf._spec)
            hf.chain_free = f["chain_free"][...]
            hf.lnprobability = f["lnprobability"][...]
            hf.thin = int(f.attrs["thin"])
            if "Selection" in f:
                g = f["Selection"]
                hf.selection = Selection(
                    injections=g["injections"][...],
                    ln_pdet=g["ln_pdet"][...],
                    ln_draw=g["ln_draw"][...],
                    n_total=int(g.attrs["n_total"]))
        return hf


def fit_population(batch, params, nburn=200, nsteps=1000, thin=1,
                   verbose=False, **kw):
    """One-call population fit over a finished batched run: build the
    hyper-fitter with `HierarchicalFitter.from_batch(batch, params, **kw)`
    and run it.  Returns the fitted HierarchicalFitter."""
    hf = HierarchicalFitter.from_batch(batch, params, **kw)
    return hf.run(nburn=nburn, nsteps=nsteps, thin=thin, verbose=verbose)


def run_population_stage(mf, args, outfile):
    """The CLIs' shared --population stage: fit the hyper-posterior over
    the just-finished batch, write the hyper chain (the caller has
    already written the batch file, so a failure here loses nothing),
    render optional figures, and return the report text to print.

    `args` carries the CLI's population_* namespace fields
    (cli_batch.py / cli_sed.py build identical flags)."""
    hf = fit_population(
        mf, params=tuple(args.population),
        nburn=args.population_burn, nsteps=args.population_steps,
        nwalkers=args.population_walkers,
        sigma_log_uniform=args.population_sigma_log_uniform,
        correlated=args.population_correlated,
        verbose=args.verbose)
    ess = hf.reweight_ess()
    lines = [f"population ({mf.nsources} sources, "
             f"{hf.samples.shape[1]} samples/source):"]
    for p in args.population:
        mu = hf.par_cen(f"mu_{p}")
        sig = hf.par_cen(f"sigma_{p}")
        lines.append(f"  {p}: mu {mu[0]:.4g} +{mu[1]:.2g} -{mu[2]:.2g}"
                     f"   sigma {sig[0]:.4g} +{sig[1]:.2g} -{sig[2]:.2g}")
    if args.population_correlated:
        a, b = args.population
        rho = hf.par_cen(f"rho_{a}_{b}")
        lines.append(f"  rho({a},{b}) {rho[0]:.3f} +{rho[1]:.2g} "
                     f"-{rho[2]:.2g}")
    lines.append(f"  reweight ESS min {ess.min():.0f} / median "
                 f"{np.median(ess):.0f} of {hf.samples.shape[1]}")
    popfile = getattr(args, "population_out", None)
    if popfile is None:
        base = outfile[:-3] if outfile.endswith(".h5") else outfile
        popfile = base + ".pop.h5"
    hf.writeToHDF5(popfile)
    lines.append(f"  hyper chain written to {popfile}")
    plot_spec = getattr(args, "plot_population", None)
    if plot_spec:
        base, ext = (plot_spec.rsplit(".", 1) if "." in plot_spec
                     else (plot_spec, "png"))
        for p in args.population:
            path = (f"{base}.{ext}" if len(args.population) == 1
                    else f"{base}_{p}.{ext}")
            hf.plot_population(p, savefig=path)
            lines.append(f"  population figure -> {path}")
    return "\n".join(lines)
