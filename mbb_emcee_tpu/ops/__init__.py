"""Numeric building blocks: stable special functions, fixed-iteration
root-finding / optimization, and fixed-node quadrature.

These replace the native kernels the reference leans on in scipy
(QUADPACK `quad`, Brent `brentq`) with branchless, batched, XLA-compilable
equivalents that vmap over walkers / chain samples (SURVEY.md C1/C6
TPU-native equivalents).
"""

from mbb_emcee_tpu.ops.special import log_expm1, log1mexp, xoexpm1x
from mbb_emcee_tpu.ops.rootfind import bisect_decreasing, golden_max
from mbb_emcee_tpu.ops.quadrature import gauss_legendre, loglam_nodes

__all__ = [
    "log_expm1", "log1mexp", "xoexpm1x",
    "bisect_decreasing", "golden_max",
    "gauss_legendre", "loglam_nodes",
]
