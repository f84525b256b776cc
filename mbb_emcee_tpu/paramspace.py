"""Shared parameter-space configuration surface.

Both the single-source MBBFitter and the batched MultiFitter expose the
reference's limit/prior/fixed-parameter setters
(ref: mbb_emcee mbb_fitter.set_lowlim / set_uplim / fix_param /
set_gaussian_prior -- SURVEY.md C4); this mixin is the one implementation.
Host classes provide `self._spec` (LikelihoodSpec), `self._init`,
`self._scatter`, `self._user_init` and `self.shape` (MBBShape).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mbb_emcee_tpu.likelihood import LikelihoodSpec, param_index


def _replace(spec: LikelihoodSpec, **kw) -> LikelihoodSpec:
    return dataclasses.replace(spec, **kw)


class ParamSpaceMixin:
    def _param_index(self, param):
        """Name/index -> index. The MBB hosts use the package-wide
        5-parameter lookup; generic-model hosts (sed.SEDFitter) override
        this with their model's own names."""
        return param_index(param)

    def set_lowlim(self, param, value):
        """Hard lower box limit (ref: mbb_fitter.set_lowlim)."""
        i = self._param_index(param)
        lo = self._spec.lower.copy()
        lo[i] = float(value)
        self._spec = _replace(self._spec, lower=lo)
        return self

    def set_uplim(self, param, value):
        i = self._param_index(param)
        hi = self._spec.upper.copy()
        hi[i] = float(value)
        self._spec = _replace(self._spec, upper=hi)
        return self

    def fix_param(self, param, value=None):
        """Fix a parameter (at `value`, or its current initial value).
        Unlike the reference's identical-walker trick, fixed params are
        REMOVED from the sampling space (statistically cleaner; SURVEY.md
        'hard parts')."""
        i = self._param_index(param)
        fixed = self._spec.fixed.copy()
        fv = self._spec.fixed_values.copy()
        fixed[i] = True
        fv[i] = float(value) if value is not None else float(self._init[i])
        self._spec = _replace(self._spec, fixed=fixed, fixed_values=fv)
        return self

    def unfix_param(self, param):
        i = self._param_index(param)
        fixed = self._spec.fixed.copy()
        fixed[i] = False
        self._spec = _replace(self._spec, fixed=fixed)
        return self

    def set_gaussian_prior(self, param, mean, sigma):
        """(ref: mbb_fitter.set_gaussian_prior)"""
        import numpy as _np
        if _np.ndim(mean) != 0 or _np.ndim(sigma) != 0:
            raise TypeError(
                "per-source (array-valued) Gaussian priors are supported "
                "on the generic batch surface only "
                "(SEDMultiFitter.set_gaussian_prior); this surface takes "
                "scalar mean/sigma")
        i = self._param_index(param)
        pm = self._spec.prior_mean.copy()
        ps = self._spec.prior_isigma.copy()
        if not _np.isfinite(mean):
            raise ValueError(f"prior mean must be finite; got {mean!r}")
        pm[i] = float(mean)
        # NOT `sigma <= 0`: NaN compares False and would silently set
        # prior_isigma = NaN, making every lnprob NaN (stuck chains)
        if not (_np.isfinite(sigma) and sigma > 0):
            raise ValueError(
                f"prior sigma must be positive and finite; got {sigma!r}")
        ps[i] = 1.0 / float(sigma)
        self._spec = _replace(self._spec, prior_mean=pm, prior_isigma=ps)
        return self

    def set_param_init(self, param, value=None, scatter=None):
        """Set a parameter's initial walker-ball center and/or scatter.

        value=None changes only the scatter and leaves the data-driven
        auto-seed (T from the brightest band, fnorm from the flux near
        wavenorm) active -- the user asked to change the spread, not the
        center."""
        i = self._param_index(param)
        if value is not None:
            self._init[i] = float(value)
            self._user_init[i] = True
        if scatter is not None:
            self._scatter[i] = float(scatter)
            self._user_scatter[i] = True
        return self

    @property
    def spec(self) -> LikelihoodSpec:
        return self._effective_spec()

    def _effective_spec(self) -> LikelihoodSpec:
        """Apply the model-shape implied fixing: opthin drops lambda0,
        noalpha drops alpha (ref: mbb_fitter constructor behavior)."""
        spec = self._spec
        fixed = spec.fixed.copy()
        fv = spec.fixed_values.copy()
        if self.shape.opthin and not fixed[2]:
            fixed[2] = True
            fv[2] = self._init[2]
        if self.shape.noalpha and not fixed[3]:
            fixed[3] = True
            fv[3] = self._init[3]
        return _replace(spec, fixed=fixed, fixed_values=fv)
