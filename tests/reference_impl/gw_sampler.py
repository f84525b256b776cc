"""Minimal NumPy Goodman & Weare (2010) affine-invariant ensemble sampler,
semantically equivalent to emcee.EnsembleSampler's stretch move with the
red-black (half-ensemble) update order (ref: emcee, the external engine the
reference wraps -- SURVEY.md C5). Used as the CPU baseline and statistical
parity oracle for the JAX-native sampler."""

import numpy as np


class GoodmanWeareSampler:
    def __init__(self, nwalkers, ndim, lnprob_fn, a=2.0, seed=0):
        assert nwalkers >= 2 * ndim and nwalkers % 2 == 0
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        self.lnprob_fn = lnprob_fn
        self.a = float(a)
        self.rng = np.random.default_rng(seed)
        self.reset()

    def reset(self):
        self.chain = []       # list of (nwalkers, ndim)
        self.lnprob = []      # list of (nwalkers,)
        self.naccepted = np.zeros(self.nwalkers, dtype=np.int64)
        self.iterations = 0

    def _lnprob_batch(self, pos):
        return np.array([self.lnprob_fn(p) for p in pos], dtype=np.float64)

    def run_mcmc(self, p0, nsteps, store=True):
        pos = np.array(p0, dtype=np.float64).copy()
        lnp = self._lnprob_batch(pos)
        half = self.nwalkers // 2
        halves = [np.arange(half), np.arange(half, self.nwalkers)]
        for _ in range(nsteps):
            for h in (0, 1):
                act, pas = halves[h], halves[1 - h]
                n = act.size
                z = ((self.a - 1.0) * self.rng.random(n) + 1.0) ** 2 / self.a
                j = self.rng.integers(0, pas.size, size=n)
                partners = pos[pas[j]]
                prop = partners + z[:, None] * (pos[act] - partners)
                lnp_prop = self._lnprob_batch(prop)
                log_ratio = (self.ndim - 1) * np.log(z) + lnp_prop - lnp[act]
                accept = np.log(self.rng.random(n)) < log_ratio
                pos[act[accept]] = prop[accept]
                lnp[act[accept]] = lnp_prop[accept]
                self.naccepted[act[accept]] += 1
            self.iterations += 1
            if store:
                self.chain.append(pos.copy())
                self.lnprob.append(lnp.copy())
        return pos, lnp

    @property
    def flatchain(self):
        return np.concatenate(self.chain, axis=0)

    @property
    def acceptance_fraction(self):
        return self.naccepted / max(self.iterations, 1)
