"""HDF5 persistence for fit results.

Same logical schema as the reference (ref: mbb_results.writeToHDF5 /
mbb_results(h5file=...) -- SURVEY.md C7): the full chain, lnprob, photometry,
fit settings as attrs, and any computed derived-quantity chains, so that
analysis resumes exactly from the file. Layout:

    / attrs: version, nwalkers, thin, opthin, noalpha, wavenorm,
             redshift (NaN if unset), cosmology, lumdist (NaN if unset)
    /Chain            (nwalkers, nsteps, 5)
    /LogLike          (nwalkers, nsteps)
    /AcceptanceFraction (nwalkers,)
    /Photometry/{Wave,Flux,FluxUnc[,Cov][,BandNames]}
    /ResponsePack/{Nodes,Weights}  (optional: the per-band quadrature the
              response-mode likelihood used, so reloaded results evaluate
              model band fluxes the same way -- additive)
    /ParamConfig/{Lower,Upper,Fixed,FixedValues,PriorMean,PriorInvSigma,
                  Initial[,PhotUpperLimits]}
    /LIR, /DustMass, /PeakLambda  (optional derived chains, attrs = meta)
    /Evidence/{Samples,LogLike,LogWt}  (optional nested-sampling run,
              attrs = logz, logz_err, h, n_iter, n_like -- additive)
    /LOO/{PointwiseLoo,PointwiseWaic,PointwiseLpd,ParetoK,PointIndex
          [,BandNames]}  (optional WAIC/PSIS-LOO assessment, attrs =
              elpd_loo, se_elpd_loo, p_loo, elpd_waic, se_elpd_waic,
              p_waic, nsamples -- additive)
"""

from __future__ import annotations

import numpy as np
import h5py

from mbb_emcee_tpu.constants import PARAM_NAMES

_SCHEMA_VERSION = 1


def write_results(filename, res):
    with h5py.File(filename, "w") as f:
        _write_results(f, res)


def _write_results(f, res):
    f.attrs["schema_version"] = _SCHEMA_VERSION
    f.attrs["package"] = "mbb_emcee_tpu"
    f.attrs["param_names"] = np.array(
        [n.encode() for n in PARAM_NAMES])
    f.attrs["nwalkers"] = res.nwalkers
    f.attrs["thin"] = res.thin
    f.attrs["opthin"] = res.shape.opthin
    f.attrs["noalpha"] = res.shape.noalpha
    f.attrs["wavenorm"] = res.shape.wavenorm
    f.attrs["redshift"] = (np.nan if res.redshift is None
                           else res.redshift)
    f.attrs["lumdist"] = np.nan if res.lumdist is None else res.lumdist
    f.attrs["cosmology"] = (res.cosmology_name or "").encode()
    # Numeric cosmology parameters ride along so a CUSTOM Cosmology
    # object (no name) survives the round-trip instead of silently
    # degrading to the WMAP9 default on reload. Best-effort: a
    # duck-typed cosmology (anything exposing luminosity_distance but
    # not these attributes) must not make persistence fail.
    cosmo = getattr(res, "_cosmo", None)
    if cosmo is not None:
        try:
            h0, om0 = float(cosmo.H0), float(cosmo.Om0)
            ol0 = getattr(cosmo, "Ol0", None)
            ol0 = np.nan if ol0 is None else float(ol0)
        except (AttributeError, TypeError, ValueError):
            pass
        else:
            f.attrs["cosmology_H0"] = h0
            f.attrs["cosmology_Om0"] = om0
            f.attrs["cosmology_Ol0"] = ol0

    f.create_dataset("Chain", data=np.asarray(res.chain, np.float32),
                     compression="gzip", compression_opts=4)
    f.create_dataset("LogLike",
                     data=np.asarray(res.lnprobability, np.float32),
                     compression="gzip", compression_opts=4)
    f.create_dataset("AcceptanceFraction",
                     data=np.asarray(res.acceptance_fraction, np.float32))

    ph = f.create_group("Photometry")
    ph.create_dataset("Wave", data=res.phot.wave)
    ph.create_dataset("Flux", data=res.phot.flux)
    ph.create_dataset("FluxUnc", data=res.phot.unc)
    if res.phot.cov is not None:
        ph.create_dataset("Cov", data=res.phot.cov)
    if res.phot.band_names is not None:
        ph.create_dataset("BandNames", data=np.array(
            [n.encode() for n in res.phot.band_names]))

    pack = getattr(res, "response_pack", None)
    if pack is not None:
        g = f.create_group("ResponsePack")
        g.create_dataset("Nodes", data=np.asarray(pack[0], np.float64))
        g.create_dataset("Weights", data=np.asarray(pack[1], np.float64))

    pc = f.create_group("ParamConfig")
    spec = res.param_spec
    pc.create_dataset("Lower", data=spec.lower)
    pc.create_dataset("Upper", data=spec.upper)
    pc.create_dataset("Fixed", data=spec.fixed.astype(np.uint8))
    pc.create_dataset("FixedValues", data=spec.fixed_values)
    pc.create_dataset("PriorMean", data=spec.prior_mean)
    pc.create_dataset("PriorInvSigma", data=spec.prior_isigma)
    pc.create_dataset("Initial", data=res.param_init)
    if spec.uplim_bands is not None:
        pc.create_dataset("PhotUpperLimits",
                          data=spec.uplim_bands.astype(np.uint8))

    for name, chain, meta in (
            ("LIR", res.lir_chain, res.lir_meta),
            ("DustMass", res.dustmass_chain, res.dustmass_meta),
            ("PeakLambda", res.peaklambda_chain, None)):
        if chain is not None:
            ds = f.create_dataset(name, data=np.asarray(chain,
                                                        np.float64),
                                  compression="gzip", compression_opts=4)
            for k, v in (meta or {}).items():
                ds.attrs[k] = v

    ev = getattr(res, "evidence", None)
    if ev is not None:
        g = f.create_group("Evidence")
        g.attrs["logz"] = ev.logz
        g.attrs["logz_err"] = ev.logz_err
        g.attrs["h"] = ev.h
        g.attrs["n_iter"] = ev.n_iter
        g.attrs["n_like"] = ev.n_like
        g.attrs["converged"] = bool(getattr(ev, "converged", True))
        g.create_dataset("Samples", data=np.asarray(ev.samples, np.float64),
                         compression="gzip", compression_opts=4)
        g.create_dataset("LogLike", data=np.asarray(ev.loglike, np.float64),
                         compression="gzip", compression_opts=4)
        g.create_dataset("LogWt", data=np.asarray(ev.logwt, np.float64),
                         compression="gzip", compression_opts=4)

    lz = getattr(res, "logz_pt", None)
    if lz is not None:
        g = f.create_group("PTEvidence")
        g.attrs["logz"], g.attrs["logz_err"] = lz
        lzti = getattr(res, "logz_ti", None)
        if lzti is not None:
            g.attrs["logz_ti"], g.attrs["logz_ti_err"] = lzti

    loo = getattr(res, "loo_result", None)
    if loo is not None:
        from mbb_emcee_tpu.modelcheck import write_loo_group
        write_loo_group(f, loo)


def read_results(filename):
    """Read back into a dict of MBBResults attribute values."""
    with h5py.File(filename, "r") as f:
        return _read_results(f)


def _read_results(f):
    from mbb_emcee_tpu.models.modified_blackbody import MBBShape
    from mbb_emcee_tpu.likelihood import Photometry, LikelihoodSpec

    out = {}
    out["nwalkers"] = int(f.attrs["nwalkers"])
    out["thin"] = int(f.attrs["thin"])
    out["shape"] = MBBShape(opthin=bool(f.attrs["opthin"]),
                            noalpha=bool(f.attrs["noalpha"]),
                            wavenorm=float(f.attrs["wavenorm"]))
    z = float(f.attrs["redshift"])
    out["redshift"] = None if np.isnan(z) else z
    dl = float(f.attrs["lumdist"])
    out["lumdist"] = None if np.isnan(dl) else dl
    cname = f.attrs["cosmology"]
    cname = cname.decode() if isinstance(cname, bytes) else str(cname)
    out["cosmology_name"] = cname or None
    if "cosmology_H0" in f.attrs:
        ol0 = float(f.attrs["cosmology_Ol0"])
        out["cosmology_params"] = (float(f.attrs["cosmology_H0"]),
                                   float(f.attrs["cosmology_Om0"]),
                                   None if np.isnan(ol0) else ol0)

    out["chain"] = np.asarray(f["Chain"], np.float64)
    out["lnprobability"] = np.asarray(f["LogLike"], np.float64)
    out["acceptance_fraction"] = np.asarray(f["AcceptanceFraction"],
                                            np.float64)

    ph = f["Photometry"]
    names = None
    if "BandNames" in ph:
        names = [n.decode() for n in np.asarray(ph["BandNames"])]
    out["phot"] = Photometry(
        np.asarray(ph["Wave"]), np.asarray(ph["Flux"]),
        np.asarray(ph["FluxUnc"]),
        cov=np.asarray(ph["Cov"]) if "Cov" in ph else None,
        band_names=names)

    if "ResponsePack" in f:
        g = f["ResponsePack"]
        out["response_pack"] = (np.asarray(g["Nodes"]),
                                np.asarray(g["Weights"]))

    pc = f["ParamConfig"]
    out["param_spec"] = LikelihoodSpec(
        lower=np.asarray(pc["Lower"]),
        upper=np.asarray(pc["Upper"]),
        fixed=np.asarray(pc["Fixed"]).astype(bool),
        fixed_values=np.asarray(pc["FixedValues"]),
        prior_mean=np.asarray(pc["PriorMean"]),
        prior_isigma=np.asarray(pc["PriorInvSigma"]),
        uplim_bands=(np.asarray(pc["PhotUpperLimits"]).astype(bool)
                     if "PhotUpperLimits" in pc else None))
    out["param_init"] = np.asarray(pc["Initial"])

    for name, attr, meta_attr in (
            ("LIR", "lir_chain", "lir_meta"),
            ("DustMass", "dustmass_chain", "dustmass_meta"),
            ("PeakLambda", "peaklambda_chain", None)):
        if name in f:
            out[attr] = np.asarray(f[name])
            if meta_attr:
                out[meta_attr] = dict(f[name].attrs)

    if "Evidence" in f:
        from mbb_emcee_tpu.nested import NestedResult
        g = f["Evidence"]
        out["evidence"] = NestedResult(
            logz=float(g.attrs["logz"]), logz_err=float(g.attrs["logz_err"]),
            h=float(g.attrs["h"]),
            samples=np.asarray(g["Samples"]),
            loglike=np.asarray(g["LogLike"]),
            logwt=np.asarray(g["LogWt"]),
            n_iter=int(g.attrs["n_iter"]), n_like=int(g.attrs["n_like"]),
            converged=bool(g.attrs.get("converged", True)))
    if "PTEvidence" in f:
        g = f["PTEvidence"]
        out["logz_pt"] = (float(g.attrs["logz"]), float(g.attrs["logz_err"]))
        if "logz_ti" in g.attrs:
            out["logz_ti"] = (float(g.attrs["logz_ti"]),
                              float(g.attrs["logz_ti_err"]))
    if "LOO" in f:
        from mbb_emcee_tpu.modelcheck import read_loo_group
        out["loo_result"] = read_loo_group(f["LOO"])
    return out
