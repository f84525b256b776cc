"""mbb_emcee_tpu: TPU-native modified-blackbody SED fitting.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of aconley/mbb_emcee:
  * greybody SED model (opacity term, optically-thick pivot, Wien-side
    power-law merge) as a pure, vmappable function
  * filter-response band integration via fixed-node quadrature
  * Gaussian likelihood with covariance + box limits + Gaussian priors
  * JAX-native affine-invariant stretch-move ensemble sampler (whole-ensemble
    update = one XLA step; chains HBM-resident)
  * gradient-based HMC alternative (jax.grad of the fused lnprob; additive
    over the reference, whose NumPy model is not differentiable)
  * nested sampling for Bayesian evidence / model comparison (batched
    constrained stretch-move replacement, one jitted program; additive)
  * parallel tempering with replica exchange for multimodal posteriors
    (K rungs x W walkers as one batch; thermodynamic lnZ; additive)
  * MAP + Laplace triage with importance-sampling refinement (whole
    catalogs of quick fits in one device program; additive)
  * WAIC + PSIS-LOO predictive model assessment from the stored chains
    (batched pointwise log-likelihoods on device, Pareto-smoothed
    importance sampling with the k-hat reliability diagnostic; additive)
  * derived-quantity posteriors (L_IR, dust mass, peak wavelength) as batched
    on-device quadrature / optimization over stored chains
  * HDF5 persistence with round-trip loading
  * a generic-model surface (sed.SEDFitter/SEDResults): any pure-JAX
    fnu(theta, wave) runs the same pipeline end-to-end (additive)
  * hierarchical population inference over fitted catalogs
    (hierarchy.fit_population): importance-reweighted hyper-likelihood as
    one fused (walkers x sources x samples) device evaluation (additive)
  * submm photometric redshifts: z as a sampled parameter with
    z-marginalized derived posteriors (photoz.photoz_mbb; additive)
  * per-source Gaussian priors on the batch tier -- spec-z anchors in a
    photo-z survey share one compiled program (additive)
  * post-hoc prior swaps by PSIS-smoothed reweighting of stored chains
    (reweight.reweight_prior; additive)
  * Fisher-matrix observing forecasts from jax.jacfwd of the fused
    model (forecast.forecast; additive)

See SURVEY.md for the reference layer map this mirrors.
"""

from mbb_emcee_tpu.constants import PARAM_NAMES, NPARAMS
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, log_mbb_fnu, ModifiedBlackbody
from mbb_emcee_tpu.models.cosmology import Cosmology, luminosity_distance
from mbb_emcee_tpu.models.cmb import cmb_corrected_mbb
from mbb_emcee_tpu.response import Response, ResponseSet
from mbb_emcee_tpu.likelihood import Photometry, LikelihoodSpec, build_lnprob
from mbb_emcee_tpu.sampler import EnsembleSampler, SamplerState
from mbb_emcee_tpu.hmc import hmc_sample, HMCResult
from mbb_emcee_tpu.nested import (
    nested_sample, nested_sample_batch, NestedResult, NestedBatchResult)
from mbb_emcee_tpu.tempering import (
    pt_sample, PTResult, ParallelTemperingSampler, geometric_ladder)
from mbb_emcee_tpu.mapfit import MAPResult
from mbb_emcee_tpu.modelcheck import (
    LooResult, LooBatchResult, LooComparison, compare_loo)
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.results import MBBResults, PPCResult
from mbb_emcee_tpu.multifit import MultiFitter, PPCBatchResult
from mbb_emcee_tpu.catalog import Catalog, read_catalog
from mbb_emcee_tpu.sed import SEDModel, SEDFitter, SEDResults
from mbb_emcee_tpu.sedmulti import SEDMultiFitter
from mbb_emcee_tpu.hierarchy import (
    HierarchicalFitter, TruncatedGaussianPopulation,
    CorrelatedGaussianPopulation, Selection, fit_population)
from mbb_emcee_tpu.photoz import photoz_mbb, PhotoZMBBModel
from mbb_emcee_tpu.reweight import (
    reweight_prior, reweight_prior_batch, ReweightResult,
    ReweightBatchResult)
from mbb_emcee_tpu.forecast import forecast, forecast_mbb, ForecastResult

__version__ = "1.0.1"

__all__ = [
    "PARAM_NAMES", "NPARAMS",
    "mbb_fnu", "log_mbb_fnu", "ModifiedBlackbody",
    "Cosmology", "luminosity_distance", "cmb_corrected_mbb",
    "Response", "ResponseSet",
    "Photometry", "LikelihoodSpec", "build_lnprob",
    "EnsembleSampler", "SamplerState",
    "hmc_sample", "HMCResult",
    "nested_sample", "nested_sample_batch",
    "NestedResult", "NestedBatchResult",
    "pt_sample", "PTResult", "ParallelTemperingSampler",
    "geometric_ladder", "MAPResult", "LooResult", "LooBatchResult",
    "LooComparison", "compare_loo",
    "MBBFitter", "MBBResults", "PPCResult", "PPCBatchResult",
    "MultiFitter",
    "Catalog", "read_catalog",
    "SEDModel", "SEDFitter", "SEDResults", "SEDMultiFitter",
    "HierarchicalFitter", "TruncatedGaussianPopulation",
    "CorrelatedGaussianPopulation", "Selection", "fit_population",
    "photoz_mbb", "PhotoZMBBModel",
    "reweight_prior", "reweight_prior_batch",
    "ReweightResult", "ReweightBatchResult",
    "forecast", "forecast_mbb", "ForecastResult",
    "__version__",
]
