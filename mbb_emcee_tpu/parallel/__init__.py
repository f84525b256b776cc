"""Multi-chip scaling: walker-axis sharding over an ICI device mesh.

The reference's only parallelism is a multiprocessing pool over per-walker
lnprob calls (SURVEY.md section 2, parallelism table). The TPU-native
equivalent shards the walker axis of each half-ensemble over a
jax.sharding.Mesh with shard_map; the stretch move's cross-half dependency
is one small all_gather (nhalf x ndim fp32) per half-step, riding ICI.
"""

from mbb_emcee_tpu.parallel.mesh import walker_mesh
from mbb_emcee_tpu.parallel.sharded_sampler import ShardedEnsembleSampler

__all__ = ["walker_mesh", "ShardedEnsembleSampler"]
