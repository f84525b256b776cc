"""Batch-serving command-line driver.

The reference CLI fits ONE photometry file per process (SURVEY.md C8);
survey pipelines fit thousands. This driver reads a source CATALOG
(catalog.py format: shared bands, one row per source) and fits the whole
batch as ONE device program through MultiFitter -- on TPU the fused
multi-source kernel advances 8 sources per vector op, so a 256-source x
250-walker fit costs ~0.5 s, not 256 CLI invocations.

Usage example:
    run_mbb_emcee_tpu_batch catalog.txt batch.h5 -b 150 -n 1000 \
        --get-lir --get-peaklambda --summary

The option surface mirrors the single-source CLI (cli.py) wherever the
concept carries over: model shape, per-parameter limits / priors /
fixing, response mode, sampler choice (stretch / --hmc / --pt),
checkpoint/resume, evidence, derived quantities (using the catalog's
per-source redshift column). Additive over the reference: the serving
loop `--extend-until RHAT` keeps extending the production run until every
source's split-R-hat converges.
"""

from __future__ import annotations

import argparse
import sys

from mbb_emcee_tpu.constants import PARAM_NAMES


def build_parser():
    p = argparse.ArgumentParser(
        prog="run_mbb_emcee_tpu_batch",
        description="Fit a catalog of modified-blackbody sources as one "
                    "batched device program.")
    p.add_argument("catalog", help="catalog file: 'wave = ...' header + "
                                   "'name z flux unc [flux unc ...]' rows")
    p.add_argument("outfile", help="output HDF5 file (whole batch; reload "
                                   "with MultiFitter.from_h5)")

    g = p.add_argument_group("sampler")
    g.add_argument("-w", "--nwalkers", type=int, default=250)
    g.add_argument("-b", "--burn", type=int, default=50,
                   help="burn-in steps (default 50)")
    g.add_argument("-n", "--nsteps", type=int, default=250,
                   help="production steps per walker (default 250)")
    g.add_argument("--thin", type=int, default=1,
                   help="record every THIN-th step")
    g.add_argument("--no-recenter-burn", action="store_true",
                   help="skip the per-source re-center-on-best-walker "
                        "re-burn phase")
    g.add_argument("--seed", type=int, default=1234)
    g.add_argument("--stretch-a", type=float, default=2.0,
                   help="stretch-move scale parameter a (default 2)")
    g.add_argument("--sampler-backend", choices=["auto", "xla", "fused"],
                   default="auto",
                   help="'fused' = whole batched run as one Pallas TPU "
                        "kernel with sources on the sublanes; 'auto' "
                        "(default) picks it on TPU")
    g.add_argument("--mesh-devices", type=int, default=None, metavar="N",
                   help="shard the source axis over an N-device mesh "
                        "(embarrassingly parallel, zero collectives; N "
                        "must divide the source count; omit for "
                        "single-chip)")
    g.add_argument("--checkpoint", default=None,
                   help="HDF5 file to flush per-source chain blocks + "
                        "the complete batched sampler state to during "
                        "production (every backend and tier: stretch, "
                        "--hmc, --pt)")
    g.add_argument("--checkpoint-interval", type=int, default=100,
                   help="recorded steps between checkpoint flushes")
    g.add_argument("--resume", action="store_true",
                   help="resume an interrupted run from --checkpoint")
    g.add_argument("--hmc", action="store_true",
                   help="gradient-based Hamiltonian MC instead of the "
                        "stretch move (--burn becomes the warmup length)")
    g.add_argument("--hmc-leapfrog", type=int, default=16,
                   help="leapfrog steps per HMC trajectory (default 16)")
    g.add_argument("--hmc-target-accept", type=float, default=0.8,
                   help="dual-averaging target acceptance (default 0.8)")
    g.add_argument("--pt", action="store_true",
                   help="parallel tempering with replica exchange "
                        "(mixes the optically-thick T-lambda0 bimodality; "
                        "also reports per-source stepping-stone lnZ)")
    g.add_argument("--pt-rungs", type=int, default=12,
                   help="temperature rungs for --pt (default 12)")
    g.add_argument("--pt-beta-min", type=float, default=None,
                   help="hottest nonzero inverse temperature "
                        "(default: auto)")
    g.add_argument("--map", action="store_true",
                   help="TRIAGE mode: MAP point + Laplace error bars per "
                        "source instead of MCMC (seconds for a whole "
                        "catalog; sources flagged 'edge' need the full "
                        "run). Writes a MAPFit-only HDF5")
    g.add_argument("--map-starts", type=int, default=8,
                   help="optimizer multi-starts per source (default 8)")
    g.add_argument("--init-map", action="store_true",
                   help="triage-then-refine: MAP-fit the batch first and "
                        "seed each source's walker ball at its own mode "
                        "with Laplace-scaled scatter (short burns "
                        "suffice); stretch move only")

    g = p.add_argument_group(
        "serving loop",
        "run-until-converged: after the production run, keep extending "
        "until every source's split-R-hat is below the threshold "
        "(fused backend; stretch move only)")
    g.add_argument("--extend-until", type=float, default=None,
                   metavar="RHAT",
                   help="extend production until max per-source split-"
                        "R-hat < RHAT (e.g. 1.05)")
    g.add_argument("--extend-step", type=int, default=None,
                   help="steps per extension (default: --nsteps)")
    g.add_argument("--max-steps", type=int, default=None,
                   help="stop extending after this many total production "
                        "steps (default: 10x --nsteps)")
    g.add_argument("--tau-mult", type=float, default=None,
                   help="additionally require chain length >= TAU_MULT x "
                        "the largest autocorrelation time (emcee's rule "
                        "of thumb is ~50)")

    g = p.add_argument_group("model")
    g.add_argument("--opthin", action="store_true",
                   help="optically thin model (drops lambda0)")
    g.add_argument("--noalpha", action="store_true",
                   help="no Wien-side power-law merge (drops alpha)")
    g.add_argument("--wavenorm", type=float, default=500.0,
                   help="observer-frame normalization wavelength, um")

    g = p.add_argument_group("parameters",
                             f"PARAM is one of {', '.join(PARAM_NAMES)}; "
                             "applied to every source in the batch")
    g.add_argument("--initval", nargs=2, action="append", default=[],
                   metavar=("PARAM", "VALUE"))
    g.add_argument("--initscatter", nargs=2, action="append", default=[],
                   metavar=("PARAM", "SCATTER"))
    g.add_argument("--lowlim", nargs=2, action="append", default=[],
                   metavar=("PARAM", "VALUE"))
    g.add_argument("--uplim", nargs=2, action="append", default=[],
                   metavar=("PARAM", "VALUE"))
    g.add_argument("--fixed", nargs=2, action="append", default=[],
                   metavar=("PARAM", "VALUE"))
    g.add_argument("--prior", nargs=3, action="append", default=[],
                   metavar=("PARAM", "MEAN", "SIGMA"),
                   help="Gaussian prior")

    g = p.add_argument_group("data")
    g.add_argument("--responsefile", default=None,
                   help="filter list file ('band spec' lines) enabling "
                        "response-integrated fluxes (catalog needs a "
                        "'bands = ...' header row)")
    g.add_argument("--responsedir", default=None,
                   help="directory filter files are relative to")
    g.add_argument("--builtin-responses", action="store_true",
                   help="resolve the catalog's 'bands' header against the "
                        "built-in instrument library (PACS/SPIRE/SCUBA2/"
                        "...) and fit with response-integrated fluxes")
    g.add_argument("--photon-counter", action="store_true",
                   help="photon-counting detector convention for responses")
    g.add_argument("--phot-uplim", action="append", default=[],
                   metavar="BAND",
                   help="flag this band (name or 0-based index) as an "
                        "UPPER LIMIT for every source, in addition to "
                        "any 'uplims' catalog header row (repeatable)")
    g.add_argument("--corrfile", default=None,
                   help="FITS image with the shared (nb, nb) band "
                        "CORRELATION matrix (correlated calibration "
                        "errors; each source's covariance is D_s R D_s "
                        "with its own catalog uncertainties). A "
                        "covariance matrix is accepted and normalized "
                        "to its correlation. Works on every backend, "
                        "the fused Pallas kernel included; not "
                        "combinable with upper limits")
    g.add_argument("--corrextn", type=int, default=0,
                   help="FITS extension of --corrfile (default 0)")

    g = p.add_argument_group(
        "derived quantities",
        "computed for the whole batch in one device program, using the "
        "catalog's per-source redshift column")
    g.add_argument("--cosmology", default="WMAP9",
                   help="named cosmology (WMAP5/7/9, Planck13/15/18)")
    g.add_argument("--get-lir", action="store_true",
                   help="compute per-source L_IR(8-1000um rest) posteriors")
    g.add_argument("--lir-wavemin", type=float, default=8.0)
    g.add_argument("--lir-wavemax", type=float, default=1000.0)
    g.add_argument("--get-dustmass", action="store_true")
    g.add_argument("--kappa", type=float, default=2.64,
                   help="dust opacity m^2/kg (default 2.64)")
    g.add_argument("--kappa-wave", type=float, default=125.0,
                   help="rest wavelength of kappa, um (default 125)")
    g.add_argument("--get-peaklambda", action="store_true")
    g.add_argument("--derived-thin", type=int, default=1,
                   help="thin factor for derived-quantity chains")
    g.add_argument("--get-evidence", action="store_true",
                   help="per-source Bayesian evidence lnZ by batched "
                        "nested sampling (compare two runs for per-source "
                        "Bayes factors between model variants)")
    g.add_argument("--ppc", action="store_true",
                   help="batched posterior-predictive goodness-of-fit "
                        "sweep: per-source chi-square discrepancy "
                        "p-values (lists sources with p < 0.01 -- the "
                        "ones the MBB model does not describe)")
    g.add_argument("--loo", action="store_true",
                   help="batched WAIC + PSIS-LOO predictive assessment: "
                        "per-source elpd_loo with the Pareto k-hat "
                        "reliability diagnostic (difference two model "
                        "variants' runs for per-source predictive "
                        "comparison)")
    g.add_argument("--nlive", type=int, default=512,
                   help="nested-sampling live points (default 512)")

    g = p.add_argument_group(
        "population (hierarchical hyper-inference over the fitted batch)")
    g.add_argument("--population", nargs="+", default=None, metavar="PARAM",
                   help="after the batch fit, infer the population "
                        "distribution of these free parameters (e.g. "
                        "'--population T beta'): box-truncated-normal "
                        "population via importance reweighting of the "
                        "stored chains; prints mu/sigma posteriors + the "
                        "min per-source ESS and writes the hyper chain "
                        "to --population-out")
    g.add_argument("--population-burn", type=int, default=200,
                   help="hyper-sampler burn-in steps (default 200)")
    g.add_argument("--population-steps", type=int, default=1000,
                   help="hyper-sampler production steps (default 1000)")
    g.add_argument("--population-walkers", type=int, default=64,
                   help="hyper-ensemble walkers (default 64)")
    g.add_argument("--population-out", default=None, metavar="FILE",
                   help="hyper-chain HDF5 (default: OUTFILE with a "
                        ".pop.h5 suffix)")
    g.add_argument("--population-sigma-log-uniform", action="store_true",
                   help="scale-invariant 1/sigma hyper-prior on the "
                        "population widths (default: uniform in sigma)")
    g.add_argument("--population-correlated", action="store_true",
                   help="bivariate population with a free correlation "
                        "rho (exactly two --population params): is the "
                        "catalog's T-beta trend a population property?")
    g.add_argument("--plot-population", default=None, metavar="PNG",
                   help="save the population-band figure (deconvolved "
                        "density over the per-source-median histogram; "
                        "one panel per --population parameter, suffixed "
                        "for >1)")

    g = p.add_argument_group("output")
    g.add_argument("--chunk-size", type=int, default=None, metavar="C",
                   help="process the catalog in fixed C-source chunks "
                        "(bounds host/HBM memory for huge catalogs; every "
                        "chunk reuses ONE compiled program because the "
                        "batch shape never changes). The final chunk "
                        "overlaps the previous one so it is exactly C "
                        "sources. Writes OUTFILE.partNNN.h5 per chunk "
                        "(each a normal MultiFitter file; with --map, "
                        "each a MAPFit-only file)")
    g.add_argument("--store-thin", type=int, default=1,
                   help="thin the STORED chains by this factor (full "
                        "multi-source chains are multi-GB; summaries "
                        "printed here always use the full chain)")
    g.add_argument("--summary", action="store_true",
                   help="print a per-source summary table (median +/- "
                        "errors, R-hat, lnZ when computed)")

    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the batch fit")
    # test-only: run the fused kernel through the Pallas interpreter
    p.add_argument("--interpret", action="store_true",
                   help=argparse.SUPPRESS)
    return p


def _safe_rhat(mf):
    """(S,) max split-R-hat per source, NaN when too few steps are
    recorded for the diagnostic (< 4): a tiny -n / aggressive --thin run
    must still write its HDF5 and print a summary, not crash after the
    fit completed (and, chunked, abort every remaining chunk)."""
    import numpy as np
    try:
        return mf.gelman_rubin().max(axis=1)
    except ValueError:
        return np.full(mf.nsources, np.nan)


def _summary_table(mf, offset=0, ppc=None):
    """Per-source summary lines: free-parameter medians +/- 1 sigma,
    split-R-hat, and lnZ/PPC columns when computed. `offset` shifts the
    printed indices to catalog-global positions (chunked serving).
    Shared with cli_sed (getattr: a SEDMultiFitter that never ran
    PT/evidence has no such attributes)."""
    names = mf.free_param_names
    cen = {p: mf.par_cen(p) for p in names}          # (S, 3) each
    rhat = _safe_rhat(mf)
    logz_pt = getattr(mf, "logz_pt", None)
    evidence = getattr(mf, "evidence", None)
    lines = ["#   source            " +
             "".join(f"{p:>24}" for p in names) +
             f"{'max-Rhat':>10}" +
             ("" if logz_pt is None else f"{'lnZ(PT)':>12}") +
             ("" if evidence is None else f"{'lnZ':>12}") +
             ("" if ppc is None else f"{'PPC p':>8}")]
    srcnames = mf.source_names or [f"src{i + offset}"
                                   for i in range(mf.nsources)]
    for i, nm in enumerate(srcnames):
        cells = "".join(
            f"  {cen[p][i, 0]:>10.4g} +{cen[p][i, 1]:.3g}/-{cen[p][i, 2]:.3g}"
            .rjust(24) for p in names)
        line = f"{i + offset:>3} {nm:<16}{cells}{rhat[i]:>10.3f}"
        if logz_pt is not None:
            line += f"{logz_pt[0][i]:>12.2f}"
        if evidence is not None:
            line += f"{evidence.logz[i]:>12.2f}"
        if ppc is not None:
            line += f"{ppc.p_value[i]:>8.3f}"
        lines.append(line)
    return "\n".join(lines)


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Import lazily so --help works instantly (no JAX init).
    import numpy as np
    from mbb_emcee_tpu.catalog import read_catalog
    from mbb_emcee_tpu.multifit import MultiFitter
    from mbb_emcee_tpu.response import ResponseSet

    cat = read_catalog(args.catalog)

    responses = None
    if args.responsefile is not None or args.builtin_responses:
        if cat.band_names is None:
            raise SystemExit(
                "response mode requires a 'bands = ...' header row in the "
                "catalog naming each column")
        if args.responsefile is not None:
            responses = ResponseSet.from_file(
                args.responsefile, dir=args.responsedir,
                photon_counter=args.photon_counter)
        else:
            kw = {"photon_counter": True} if args.photon_counter else {}
            responses = ResponseSet.builtin(cat.band_names, **kw)

    mesh = None
    if args.mesh_devices is not None:
        from mbb_emcee_tpu.parallel import walker_mesh
        mesh = walker_mesh(args.mesh_devices)
        # with --chunk-size the per-program batch is the chunk, not the
        # whole catalog
        eff = (args.chunk_size
               if args.chunk_size and args.chunk_size < cat.nsources
               else cat.nsources)
        if eff % args.mesh_devices:
            what = ("--chunk-size" if eff != cat.nsources
                    else f"the source count ({cat.nsources})")
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices} must divide "
                f"{what}; pad the catalog or change the mesh size")

    mf = MultiFitter(nwalkers=args.nwalkers, wavenorm=args.wavenorm,
                     noalpha=args.noalpha, opthin=args.opthin,
                     responses=responses, seed=args.seed,
                     a=args.stretch_a, mesh=mesh,
                     sampler_backend=args.sampler_backend,
                     interpret=args.interpret)
    # With --chunk-size, never bind the whole catalog -- the chunk loop
    # binds each C-source tile; binding 500k sources here just to discard
    # them would defeat the flag's purpose. The first tile is bound now
    # so data-dependent setters (set_band_correlation needs wave) work.
    C = args.chunk_size
    if C is not None and C <= 0:
        raise SystemExit("--chunk-size must be positive")
    chunked = C is not None and C < cat.nsources
    first = slice(0, C) if chunked else slice(None)
    mf.set_data(cat.wave, cat.flux[first], cat.unc[first],
                band_names=cat.band_names,
                source_names=list(cat.names[first]),
                redshifts=cat.redshifts[first] if cat.has_redshifts
                else None)
    # None, shared (nb,), or per-source (S, nb) when the catalog used
    # '<flux' tokens; --phot-uplim bands OR in (broadcasting over sources)
    uplims = cat.uplim_mask()
    if args.phot_uplim:
        from mbb_emcee_tpu.cli import _uplim_mask
        shared = _uplim_mask(args.phot_uplim, cat.wave.size,
                             cat.band_names)
        uplims = shared if uplims is None else (uplims | shared)
    if uplims is not None and uplims.any():
        # chunked mode applies the per-tile slice inside the loop
        mf.set_phot_upperlimits(
            uplims[first] if uplims.ndim == 2 else uplims)

    if args.corrfile is not None:
        from mbb_emcee_tpu.utils.fits import read_band_correlation
        try:
            mf.set_band_correlation(
                read_band_correlation(args.corrfile, extn=args.corrextn))
        except ValueError as e:
            raise SystemExit(f"--corrfile: {e}")

    for param, v in args.initval:
        mf.set_param_init(param, float(v))
    for param, v in args.initscatter:
        mf.set_param_init(param, scatter=float(v))
    for param, v in args.lowlim:
        mf.set_lowlim(param, float(v))
    for param, v in args.uplim:
        mf.set_uplim(param, float(v))
    for param, v in args.fixed:
        mf.fix_param(param, float(v))
    for param, m, s in args.prior:
        mf.set_gaussian_prior(param, float(m), float(s))

    import logging

    from mbb_emcee_tpu.utils.log import enable_console

    log = enable_console(logging.INFO if args.verbose else logging.WARNING)

    if args.map:
        if (args.hmc or args.pt or args.extend_until is not None
                or args.init_map):
            raise SystemExit("--map is a triage mode; drop --hmc/--pt/"
                             "--extend-until/--init-map")
        if args.checkpoint or args.resume:
            raise SystemExit("--map runs in seconds; checkpointing does "
                             "not apply")
        if args.get_lir or args.get_dustmass or args.get_peaklambda \
                or args.get_evidence or args.ppc or args.loo \
                or args.population:
            raise SystemExit("derived-quantity posteriors, --ppc, --loo "
                             "and --population need chains; run without "
                             "--map for them")
        if not chunked:
            return _map_and_write(mf, args, log, args.outfile)
        # chunked triage: the huge-catalog case --map exists for; every
        # tile reuses the one compiled MAP program
        return _serve_chunked(mf, cat, args, log, uplims, C,
                              _map_and_write, what="MAP-triaged")

    if args.hmc and args.pt:
        raise SystemExit("--hmc and --pt are mutually exclusive")
    if args.extend_until is not None and (args.hmc or args.pt):
        raise SystemExit("--extend-until works with the stretch-move "
                         "sampler only")
    if (args.extend_until is not None
            and args.nsteps // max(args.thin, 1) < 4):
        # Catch this BEFORE burning+sampling: the split-R-hat predicate
        # needs >= 4 recorded steps, and discovering that after the full
        # production run would abort exactly when the user asked to extend.
        raise SystemExit(
            f"--extend-until needs at least 4 recorded steps per pass; "
            f"--nsteps {args.nsteps} / --thin {args.thin} records only "
            f"{args.nsteps // max(args.thin, 1)}")
    if args.extend_until is not None:
        from mbb_emcee_tpu.cli import _validate_extend_flags
        _validate_extend_flags(args)
    if args.init_map and (args.hmc or args.pt or args.resume):
        raise SystemExit("--init-map seeds the stretch-move walker "
                         "ball; drop --hmc/--pt/--resume")
    if (args.get_lir or args.get_dustmass) and not cat.has_redshifts:
        # catch BEFORE burning+sampling: failing in compute_lir after
        # the batch run would discard every chunk's chains unpersisted
        raise SystemExit("--get-lir/--get-dustmass need finite "
                         "redshifts in the catalog's z column")

    if args.population_correlated and (args.population is None
                                       or len(args.population) != 2):
        raise SystemExit("--population-correlated needs exactly two "
                         "--population parameters (e.g. "
                         "'--population T beta --population-correlated')")
    if not chunked:
        return _fit_and_write(mf, args, log, args.outfile)
    if args.population:
        raise SystemExit(
            "--population needs every source's chain at once; run it on "
            "an unchunked fit (or load the part files and call "
            "hierarchy.HierarchicalFitter yourself)")
    if args.checkpoint or args.resume:
        raise SystemExit(
            "--chunk-size is not combinable with --checkpoint/--resume "
            "(chunks are already bounded; checkpoint a single-chunk run "
            "instead)")
    return _serve_chunked(mf, cat, args, log, uplims, C, _fit_and_write,
                          what="served")


def _serve_chunked(mf, cat, args, log, uplims, C, serve_fn, what):
    """Chunked serving: fixed C-source tiles so every chunk reuses the
    SAME compiled programs (the batch shape never changes -- data are
    runtime operands). The final chunk OVERLAPS the previous one
    instead of padding, so every written part holds real sources.
    `serve_fn(mf, args, log, outfile, offset)` fits whatever is bound
    (full MCMC serving or MAP triage) and writes one part file."""
    import os as _os

    import numpy as np

    starts = list(range(0, cat.nsources - C + 1, C))
    if starts[-1] + C < cat.nsources:
        starts.append(cat.nsources - C)
    base, ext = _os.path.splitext(args.outfile)
    nb = cat.wave.size
    for ci, s0 in enumerate(starts):
        sl = slice(s0, s0 + C)
        if uplims is not None and uplims.ndim == 2 and uplims.any():
            # a per-source mask binds to source identities; clear before
            # re-binding data (set_data refuses a stale 2-D mask)
            mf.set_phot_upperlimits(np.zeros(nb, bool))
        mf.set_data(cat.wave, cat.flux[sl], cat.unc[sl],
                    band_names=cat.band_names,
                    source_names=list(cat.names[s0:s0 + C]),
                    redshifts=(cat.redshifts[sl]
                               if cat.has_redshifts else None))
        if uplims is not None and uplims.any():
            mf.set_phot_upperlimits(
                uplims[sl] if uplims.ndim == 2 else uplims)
        part = f"{base}.part{ci:03d}{ext or '.h5'}"
        if args.verbose:
            log.info(f"chunk {ci + 1}/{len(starts)}: sources "
                     f"{s0}..{s0 + C - 1} -> {part}")
        serve_fn(mf, args, log, part, offset=s0)
    print(f"{cat.nsources} sources {what} in {len(starts)} chunks of {C} "
          f"(fixed batch shape; final chunk overlaps its predecessor) "
          f"-> {base}.part*{ext or '.h5'}")
    return 0


def _map_and_write(mf, args, log, outfile, offset=0):
    """MAP-triage the currently-bound batch and write `outfile` (a
    MAPFit-only HDF5) + the per-source summary print. `offset` shifts
    printed indices to catalog-global positions (chunked serving)."""
    import time as _time

    t0 = _time.time()
    mf.run_map(nstarts=args.map_starts, verbose=args.verbose)
    dt = _time.time() - t0
    mf.write_map_h5(outfile)
    names = mf.free_param_names
    cols = {p: mf.map_cen(p) for p in names}   # (S, 2) each, ONCE
    hdr = ("#   source            "
           + "".join(f"{p:>20}" for p in names) + "      lnp  flag")
    lines = [hdr]
    srcnames = (mf.source_names
                or [f"src{i + offset}" for i in range(mf.nsources)])
    for i, nm in enumerate(srcnames):
        cells = "".join(
            f"{cols[p][i, 0]:>12.4g} +-{cols[p][i, 1]:<.2g}"
            .rjust(20) for p in names)
        flag = "" if mf.map_interior[i] else "edge"
        lines.append(f"{i + offset:>3} {nm:<16}{cells}"
                     f"{mf.map_lnprob[i]:>9.2f}  {flag}")
    print("\n".join(lines))
    n_edge = int((~mf.map_interior).sum())
    print(f"{mf.nsources} sources MAP-fit in {dt:.1f}s "
          f"({args.map_starts} starts each); {n_edge} flagged 'edge' "
          f"(run the MCMC for those); written to {outfile}")
    return 0


def _fit_and_write(mf, args, log, outfile, offset=0):
    """Fit the currently-bound batch and write `outfile`: run (stretch /
    HMC / PT), the --extend-until serving loop, evidence, derived
    posteriors, HDF5, and the summary print. Factored out of main() so
    chunked serving (--chunk-size) drives it once per source tile."""
    import numpy as np

    from mbb_emcee_tpu.utils.profiling import StepTimer, trace

    if args.verbose:
        log.info(f"Batch fit: {mf.nsources} sources x {args.nwalkers} "
                 f"walkers, burn={args.burn}, steps={args.nsteps}")
    timer = StepTimer(args.nwalkers * mf.nsources)
    with trace(args.profile_dir):
        if args.pt:
            with timer.phase("batch fit (tempered burn + production)",
                             args.burn + args.nsteps):
                mf.run_pt(nrungs=args.pt_rungs,
                          beta_min=(args.pt_beta_min
                                    if args.pt_beta_min is not None
                                    else "auto"),
                          nburn=args.burn, nsteps=args.nsteps,
                          thin=args.thin, verbose=args.verbose,
                          checkpoint=args.checkpoint,
                          checkpoint_interval=args.checkpoint_interval,
                          resume=args.resume)
        elif args.hmc:
            with timer.phase("batch fit (warmup + production)",
                             args.burn + args.nsteps):
                mf.run_hmc(nwarmup=args.burn, nsteps=args.nsteps,
                           thin=args.thin,
                           n_leapfrog=args.hmc_leapfrog,
                           target_accept=args.hmc_target_accept,
                           verbose=args.verbose,
                           checkpoint=args.checkpoint,
                           checkpoint_interval=args.checkpoint_interval,
                           resume=args.resume)
        else:
            if args.init_map:
                with timer.phase("MAP triage", args.map_starts):
                    mf.run_map(nstarts=args.map_starts,
                               verbose=args.verbose)
            total = args.nsteps + (
                args.burn if args.no_recenter_burn else 2 * args.burn)
            with timer.phase("batch fit (burn + production)", total):
                mf.run(nburn=args.burn, nsteps=args.nsteps, thin=args.thin,
                       recenter_burn=not args.no_recenter_burn,
                       verbose=args.verbose,
                       init="map" if args.init_map else "auto",
                       checkpoint=args.checkpoint,
                       checkpoint_interval=args.checkpoint_interval,
                       resume=args.resume)

        if args.extend_until is not None:
            if (getattr(mf, "_sampler", None) is None
                    and getattr(mf, "_xla_keys", None) is None):
                raise SystemExit(
                    "--extend-until requires a continuable stretch-move "
                    "run (fused or XLA backend)")
            step = args.extend_step or args.nsteps
            max_steps = args.max_steps or 10 * args.nsteps
            # Fixed window + floor stride: the reduction measures the
            # full chain span (the standard R-hat diagnostic, lower
            # noise floor than a tail window) yet keeps a fixed compiled
            # shape as the chain grows -- when step is a multiple of
            # nsteps, every iteration reuses one compiled program.
            window = max(4, args.nsteps // max(args.thin, 1))

            def _converged():
                # stride = floor(nrec/window) guarantees the subsampled
                # record count stays >= window (ceil could leave < 4
                # records and fail the R-hat minimum mid-loop)
                nrec = int(mf.chain_free.shape[1])
                return mf.converged(rhat_max=args.extend_until,
                                    window=window,
                                    stride=max(1, nrec // window),
                                    tau_mult=args.tau_mult)

            total = args.nsteps
            while total < max_steps:
                ok = _converged()
                n_bad = int(np.sum(~ok))
                if n_bad == 0:
                    break
                if args.verbose:
                    log.info(f"  {n_bad}/{mf.nsources} sources above "
                             f"full-span R-hat {args.extend_until}; "
                             f"extending by {step} steps")
                with timer.phase(f"extend +{step}", step):
                    mf.extend(step, verbose=args.verbose)
                total += step
            else:
                ok = _converged()
            if args.verbose:
                log.info(f"serving loop done at {total} production steps: "
                         f"{int(np.sum(ok))}/{mf.nsources} sources "
                         f"converged")

    if args.verbose:
        log.info(timer.report())

    if args.get_evidence:
        ev = mf.compute_evidence(nlive=args.nlive, verbose=args.verbose)
        print(f"ln Z: median {np.median(ev.logz):.4f} over "
              f"{mf.nsources} sources (median err "
              f"{np.median(ev.logz_err):.4f})")

    if mf.redshifts is None and (args.get_lir or args.get_dustmass):
        raise SystemExit("--get-lir/--get-dustmass need finite redshifts "
                         "in the catalog's z column")
    if args.get_lir:
        mf.compute_lir(wavemin=args.lir_wavemin, wavemax=args.lir_wavemax,
                       thin=args.derived_thin, cosmology=args.cosmology)
    if args.get_dustmass:
        mf.compute_dustmass(kappa=args.kappa, kappa_wave=args.kappa_wave,
                            thin=args.derived_thin,
                            cosmology=args.cosmology)
    if args.get_peaklambda:
        mf.compute_peaklambda(thin=args.derived_thin)
    if args.ppc:
        ppc = mf.posterior_predictive(thin=args.derived_thin)
        flagged = np.where(ppc.p_value < 0.01)[0]
        names = mf.source_names
        print(f"posterior predictive: median p "
              f"{np.median(ppc.p_value):.3f} over {mf.nsources} sources; "
              f"{flagged.size} with p < 0.01"
              + ("" if not flagged.size else ": " + ", ".join(
                  (names[i] if names is not None else f"src{i + offset}")
                  + f"={ppc.p_value[i]:.4f}" for i in flagged[:20])
                  + (" ..." if flagged.size > 20 else "")))
    if args.loo:
        loo = mf.compute_loo(thin=args.derived_thin)
        bad = np.where(loo.n_bad_k > 0)[0]
        print(f"PSIS-LOO: total elpd_loo {np.sum(loo.elpd_loo):.2f} over "
              f"{mf.nsources} sources (total p_loo "
              f"{np.sum(loo.p_loo):.1f}); {bad.size} source(s) with "
              f"unreliable tail fits (k-hat > 0.7)")

    mf.writeToHDF5(outfile, thin=args.store_thin)

    if args.summary:
        print(_summary_table(mf, offset=offset))
    else:
        rhat = _safe_rhat(mf)
        print(f"{mf.nsources} sources fit; max split-R-hat "
              f"{rhat.max():.3f} (median {np.median(rhat):.3f}); "
              f"batch written to {outfile}")

    if args.population:
        # hierarchical hyper-inference AFTER the batch file is safely on
        # disk: a population-stage failure must not lose the fits
        from mbb_emcee_tpu.hierarchy import run_population_stage
        print(run_population_stage(mf, args, outfile))
    return 0


if __name__ == "__main__":
    sys.exit(main())
