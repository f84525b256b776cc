"""Batched serving: fit many sources per device computation.

A survey pipeline fits thousands of objects with one model configuration.
MultiFitter treats the SOURCE axis as the batch axis; on TPU the fused
multi-source kernel packs 8 sources onto the VPU sublanes, so a full
256-source x 250-walker fit (burn + re-center + 1000 recorded steps) takes
~0.5 s on one v5e chip (sampling itself runs at ~565M aggregate
walker-steps/s) -- and successive same-shape batches reuse the compiled
kernel (photometry is a runtime operand).
"""

import os
import sys
import time

import numpy as np

# runnable as `python examples/<name>.py` from anywhere
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from mbb_emcee_tpu import MultiFitter

# MBB_EXAMPLE_QUICK=1 shrinks the run for the suite's example smoke test.
QUICK = os.environ.get("MBB_EXAMPLE_QUICK", "") not in ("", "0")
NSOURCES, NBATCHES = (8, 1) if QUICK else (256, 3)
NWALKERS, NBURN, NSTEPS = (64, 30, 60) if QUICK else (250, 150, 1000)

rng = np.random.default_rng(0)
wave = np.array([100.0, 160.0, 250.0, 350.0, 500.0])

mf = MultiFitter(nwalkers=NWALKERS, seed=1)
mf.set_uplim("T", 100.0).set_uplim("beta", 5.0)


def fake_batch(nsources):
    """Stand-in for 'read the next batch from the survey catalog':
    greybody SEDs with randomized parameters + 5% noise."""
    import jax.numpy as jnp
    from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape

    trues = np.column_stack([
        rng.uniform(20.0, 45.0, nsources),    # T/(1+z)
        rng.uniform(1.4, 2.2, nsources),      # beta
        rng.uniform(150.0, 350.0, nsources),  # lambda0 (1+z)
        rng.uniform(2.5, 4.5, nsources),      # alpha
        rng.uniform(10.0, 80.0, nsources),    # fnorm
    ])
    flux = np.stack([
        np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                           jnp.asarray(wave, jnp.float32), MBBShape()),
                   np.float64)
        for t in trues])
    unc = 0.05 * flux
    return flux + unc * rng.standard_normal(flux.shape), unc


for batch_idx in range(NBATCHES):
    flux, unc = fake_batch(NSOURCES)
    mf.set_data(wave, flux, unc)
    t0 = time.perf_counter()
    mf.run(nburn=NBURN, nsteps=NSTEPS)
    dt = time.perf_counter() - t0
    t_cen = mf.par_cen("T")                # (S, 3) per-source summaries
    print(f"batch {batch_idx}: {NSOURCES} sources in {dt:.2f}s  "
          f"(median T = {np.median(t_cen[:, 0]):.1f} K)")

# Batched derived-quantity posteriors with per-source redshifts. Thin the
# chains for derived quantities: 256 sources x 250k samples x 128
# quadrature nodes unthinned is ~33 GB of intermediates; every ~50th
# sample is statistically equivalent for percentile summaries.
redshifts = rng.uniform(1.0, 3.5, NSOURCES)
mf.compute_lir(redshifts, thin=10 if QUICK else 50)
print("L_IR percentiles per source:", mf.lir_cen().shape)   # (S, 3)

# Any single source still gets the full single-source analysis surface:
pick = min(17, NSOURCES - 1)
res = mf.results(pick, redshift=float(redshifts[pick]))
res.compute_dustmass(thin=10 if QUICK else 50)
res.writeToHDF5("source17.h5")
print(res)

# Multi-chip: pass a 1-D jax.sharding.Mesh to shard the source axis --
# embarrassingly parallel, zero collectives:
#   from mbb_emcee_tpu.parallel import walker_mesh
#   mf = MultiFitter(nwalkers=250, mesh=walker_mesh(), sampler_backend="xla")
