"""Command-line driver.

Rebuild of the reference's run_mbb_emcee script (ref: repo-root CLI,
SURVEY.md C8 -- reconstructed option surface): positional photometry file +
output HDF5, sampler geometry, model-shape flags, per-parameter limits /
priors / initial values / fixing, covariance file, instrument-response mode,
and derived-quantity switches.

Usage example:
    run_mbb_emcee_tpu phot.txt fit.h5 -z 2.2 --nwalkers 250 -b 100 -n 500 \
        --get-lir --get-dustmass --get-peaklambda
"""

from __future__ import annotations

import argparse
import sys

from mbb_emcee_tpu.constants import PARAM_NAMES


def _validate_extend_flags(args):
    """--extend-step/--max-steps sanity, shared with the batch CLI.
    extend() continues with the production `thin`, so the extension
    length must satisfy the same positivity/divisibility rules -- catch
    them BEFORE burning+sampling (an uncaught ValueError after the full
    production run would abort exactly when the user asked to extend,
    losing the fit)."""
    thin = max(args.thin, 1)
    step = args.extend_step if args.extend_step is not None else args.nsteps
    if step <= 0:
        raise SystemExit(f"--extend-step must be positive; got {step}")
    if step % thin:
        raise SystemExit(
            f"--extend-step {step} must be divisible by --thin {thin} "
            f"(extensions record every thin-th step)")
    if args.max_steps is not None and args.max_steps <= 0:
        raise SystemExit("--max-steps must be positive")


def build_parser():
    p = argparse.ArgumentParser(
        prog="run_mbb_emcee_tpu",
        description="Fit a modified blackbody to photometry with a "
                    "TPU-native affine-invariant MCMC ensemble sampler.")
    p.add_argument("photfile", help="text photometry: '[band] wave_um "
                                    "flux_mJy unc_mJy' per line")
    p.add_argument("outfile", help="output HDF5 file")

    g = p.add_argument_group("sampler")
    g.add_argument("-w", "--nwalkers", type=int, default=250)
    g.add_argument("-b", "--burn", type=int, default=50,
                   help="burn-in steps (default 50)")
    g.add_argument("-n", "--nsteps", type=int, default=250,
                   help="production steps per walker (default 250)")
    g.add_argument("--thin", type=int, default=1,
                   help="record every THIN-th step")
    g.add_argument("--no-recenter-burn", action="store_true",
                   help="skip the re-center-on-best-walker re-burn phase")
    g.add_argument("--seed", type=int, default=1234)
    g.add_argument("--n-ensembles", type=int, default=1,
                   help="run N independent ensembles via the fused "
                        "multi-source kernel and merge their chains "
                        "(faster aggregate sampling + cross-ensemble "
                        "convergence; diagonal uncertainties only)")
    g.add_argument("--stretch-a", type=float, default=2.0,
                   help="stretch-move scale parameter a (default 2)")
    g.add_argument("--nthreads", type=int, default=None,
                   help="accepted for reference compatibility; ignored "
                        "(walker parallelism is on-device)")
    g.add_argument("--checkpoint", default=None,
                   help="HDF5 file to flush chain + sampler state to during "
                        "the production run")
    g.add_argument("--checkpoint-interval", type=int, default=100,
                   help="recorded steps between checkpoint flushes")
    g.add_argument("--resume", action="store_true",
                   help="resume an interrupted run from --checkpoint")
    g.add_argument("--lnprob-backend", choices=["xla", "pallas"],
                   default="xla",
                   help="likelihood kernel: XLA-fused (portable) or the "
                        "single fused Pallas TPU kernel")
    g.add_argument("--sampler-backend", choices=["auto", "xla", "fused"],
                   default="auto",
                   help="'fused' runs the whole sampling loop as one Pallas "
                        "TPU kernel (~10x per-step throughput); 'auto' "
                        "(default) picks it on TPU when supported")
    g.add_argument("--hmc", action="store_true",
                   help="sample with gradient-based Hamiltonian MC instead "
                        "of the stretch move (jax.grad of the fused lnprob; "
                        "--burn becomes the warmup length; additive over "
                        "the reference)")
    g.add_argument("--hmc-leapfrog", type=int, default=16,
                   help="leapfrog steps per HMC trajectory (default 16)")
    g.add_argument("--hmc-target-accept", type=float, default=0.8,
                   help="dual-averaging target acceptance (default 0.8)")
    g.add_argument("--pt", action="store_true",
                   help="parallel tempering: K temperature rungs with "
                        "replica exchange (mixes the T-lambda0 bimodality "
                        "of optically-thick fits that traps a "
                        "single-temperature ensemble; also reports the "
                        "thermodynamic-integration lnZ; additive)")
    g.add_argument("--pt-rungs", type=int, default=12,
                   help="temperature rungs for --pt (default 12)")
    g.add_argument("--pt-beta-min", type=float, default=None,
                   help="hottest nonzero inverse temperature (default: "
                        "auto -- sized after burn-in so the evidence "
                        "ladder bridges the prior box)")
    g.add_argument("--map", action="store_true",
                   help="TRIAGE: print the MAP point + Laplace error "
                        "bars (seconds; no chains/HDF5) and exit. A "
                        "'mode near a box bound' note means run the "
                        "full MCMC")
    g.add_argument("--map-starts", type=int, default=8,
                   help="optimizer multi-starts for --map (default 8)")
    g.add_argument("--init-map", action="store_true",
                   help="triage-then-refine: run the MAP fit first and "
                        "seed the walker ball at the mode with "
                        "Laplace-scaled scatter (short burns suffice); "
                        "stretch move only")

    g = p.add_argument_group(
        "serving loop",
        "run-until-converged: after the production run, keep extending "
        "until split-R-hat is below the threshold (stretch move only; "
        "same flags as the batch CLI)")
    g.add_argument("--extend-until", type=float, default=None,
                   metavar="RHAT",
                   help="extend production until max split-R-hat < RHAT "
                        "(e.g. 1.05)")
    g.add_argument("--extend-step", type=int, default=None,
                   help="steps per extension (default: --nsteps)")
    g.add_argument("--max-steps", type=int, default=None,
                   help="stop extending after this many total production "
                        "steps (default: 10x --nsteps)")
    g.add_argument("--tau-mult", type=float, default=None,
                   help="additionally require recorded chain length >= "
                        "TAU_MULT x the integrated autocorrelation time")

    g = p.add_argument_group("model")
    g.add_argument("--opthin", action="store_true",
                   help="optically thin model (drops lambda0)")
    g.add_argument("--noalpha", action="store_true",
                   help="no Wien-side power-law merge (drops alpha)")
    g.add_argument("--wavenorm", type=float, default=500.0,
                   help="observer-frame normalization wavelength, um")

    g = p.add_argument_group("parameters",
                             f"PARAM is one of {', '.join(PARAM_NAMES)}")
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
    g.add_argument("--covfile", default=None,
                   help="FITS file with a photometric covariance matrix")
    g.add_argument("--covextn", type=int, default=0,
                   help="FITS extension of the covariance (default 0)")
    g.add_argument("--cov-is-total", action="store_true",
                   help="covariance already includes diag(unc^2)")
    g.add_argument("--responsefile", default=None,
                   help="filter list file ('band spec' lines) enabling "
                        "response-integrated fluxes")
    g.add_argument("--responsedir", default=None,
                   help="directory filter files are relative to")
    g.add_argument("--builtin-responses", action="store_true",
                   help="resolve the photometry band names against the "
                        "built-in instrument library (PACS_70/100/160, "
                        "SPIRE_250/350/500, SCUBA2_450/850, ...) and fit "
                        "with response-integrated fluxes")
    g.add_argument("--photon-counter", action="store_true",
                   help="photon-counting detector convention for responses")
    g.add_argument("--phot-uplim", action="append", default=[],
                   metavar="BAND",
                   help="flag this photometry band (name or 0-based "
                        "index) as an UPPER LIMIT: one-sided likelihood, "
                        "no penalty for models below the quoted flux "
                        "(repeatable)")

    g = p.add_argument_group("derived quantities")
    g.add_argument("-z", "--redshift", type=float, default=None)
    g.add_argument("--cosmology", default="WMAP9",
                   help="named cosmology (WMAP5/7/9, Planck13/15/18)")
    g.add_argument("--lumdist", type=float, default=None,
                   help="explicit luminosity distance in Mpc (overrides "
                        "cosmology)")
    g.add_argument("--get-lir", action="store_true",
                   help="compute L_IR(8-1000um rest) posterior")
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
    g.add_argument("--ppc", action="store_true",
                   help="posterior-predictive goodness-of-fit check: "
                        "print the chi-square discrepancy p-value and "
                        "per-band tail probabilities (p < ~0.01 flags "
                        "misfit; additive over the reference)")
    g.add_argument("--loo", action="store_true",
                   help="WAIC + PSIS-LOO predictive assessment over the "
                        "chain: per-band leave-one-out elpd with the "
                        "Pareto k-hat reliability diagnostic, persisted "
                        "to /LOO (additive; compare two model variants' "
                        "elpd_loo on the same data)")
    g.add_argument("--loo-exact", action="store_true",
                   help="after --loo, settle any k-hat-flagged bands by "
                        "brute force: refit without each flagged band "
                        "(all refits one batched device program) and "
                        "report the exact leave-one-out elpd (implies "
                        "--loo; diagonal errors only)")
    g.add_argument("--get-evidence", action="store_true",
                   help="also compute the Bayesian evidence lnZ by nested "
                        "sampling over the parameter box (additive over "
                        "the reference; compare two runs' lnZ for a Bayes "
                        "factor between model variants)")
    g.add_argument("--nlive", type=int, default=512,
                   help="nested-sampling live points (default 512)")

    g = p.add_argument_group("plots")
    g.add_argument("--plot-sed", default=None, metavar="PNG",
                   help="save a photometry + posterior-SED-band figure")
    g.add_argument("--plot-corner", default=None, metavar="PNG",
                   help="save a corner plot of the free parameters")
    g.add_argument("--plot-chain", default=None, metavar="PNG",
                   help="save per-walker trace plots")
    g.add_argument("--plot-ppc", default=None, metavar="PNG",
                   help="save the posterior-predictive chi-square "
                        "figure (implies the --ppc computation)")

    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the fit into this "
                        "directory (view in TensorBoard/Perfetto)")
    return p


def _uplim_mask(specs, nbands, band_names):
    """Resolve repeated --phot-uplim values (band name or 0-based index)
    into an (nbands,) boolean mask."""
    import numpy as np
    mask = np.zeros(nbands, bool)
    for b in specs:
        # NAME match first: photometry band names are often numeric
        # ('850', '450' for SCUBA-2), and int-first parsing would make
        # those bands unaddressable by name.
        if band_names is not None and b in band_names:
            i = band_names.index(b)
        else:
            try:
                i = int(b)
            except ValueError:
                known = ", ".join(band_names) if band_names else "none"
                raise SystemExit(
                    f"--phot-uplim {b!r}: unknown band name "
                    f"(known: {known}); use a 0-based index instead")
        if not 0 <= i < nbands:
            raise SystemExit(f"--phot-uplim {b}: index out of range "
                             f"(have {nbands} bands)")
        mask[i] = True
    return mask


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Import lazily so --help works instantly (no JAX init).
    from mbb_emcee_tpu.fitter import MBBFitter
    from mbb_emcee_tpu.results import MBBResults
    from mbb_emcee_tpu.response import ResponseSet

    responses = None
    if args.responsefile is not None:
        responses = ResponseSet.from_file(
            args.responsefile, dir=args.responsedir,
            photon_counter=args.photon_counter)
    elif args.builtin_responses:
        # Peek at the band-name column only (the fitter re-reads the
        # photometry as the canonical parse; names are all we need here).
        from mbb_emcee_tpu.likelihood import Photometry
        names = Photometry.from_file(args.photfile).band_names
        if names is None:
            raise SystemExit(
                "--builtin-responses requires a leading band-name column "
                "in the photometry file ('name wave flux unc' per line)")
        # Forward an explicit --photon-counter; otherwise each band keeps
        # its instrument's own detector convention.
        kw = {"photon_counter": True} if args.photon_counter else {}
        responses = ResponseSet.builtin(names, **kw)

    if args.n_ensembles > 1 and args.covfile is not None:
        raise SystemExit(
            "--n-ensembles runs through the batched likelihood, which "
            "supports diagonal uncertainties only; drop --covfile or "
            "--n-ensembles")
    if args.loo_exact and args.covfile is not None:
        # Knowable now -- do not discover it AFTER the sampling run.
        raise SystemExit(
            "--loo-exact refits run through the batched likelihood "
            "(diagonal uncertainties only); with --covfile use --loo, "
            "whose pointwise factors are already the exact conditional "
            "predictive densities under the covariance")
    fit = MBBFitter(nwalkers=args.nwalkers, photfile=args.photfile,
                    wavenorm=args.wavenorm, noalpha=args.noalpha,
                    opthin=args.opthin, responses=responses,
                    seed=args.seed, a=args.stretch_a,
                    lnprob_backend=args.lnprob_backend,
                    sampler_backend=args.sampler_backend,
                    n_ensembles=args.n_ensembles)
    if args.covfile is not None:
        fit.read_cov(args.covfile, args.covextn, args.cov_is_total)
    if args.phot_uplim:
        phot = fit._require_data()
        fit.set_phot_upperlimits(
            _uplim_mask(args.phot_uplim, phot.nbands, phot.band_names))

    for param, v in args.initval:
        fit.set_param_init(param, float(v))
    for param, v in args.initscatter:
        # scatter-only: leaves the data-driven T/fnorm auto-seed active
        fit.set_param_init(param, scatter=float(v))
    for param, v in args.lowlim:
        fit.set_lowlim(param, float(v))
    for param, v in args.uplim:
        fit.set_uplim(param, float(v))
    for param, v in args.fixed:
        fit.fix_param(param, float(v))
    for param, m, s in args.prior:
        fit.set_gaussian_prior(param, float(m), float(s))

    from mbb_emcee_tpu.utils.profiling import trace, StepTimer
    from mbb_emcee_tpu.utils.log import enable_console

    import logging
    log = enable_console(logging.INFO if args.verbose else logging.WARNING)

    if args.map:
        if (args.hmc or args.pt or args.checkpoint or args.resume
                or args.extend_until is not None or args.init_map):
            raise SystemExit("--map is a triage mode; drop "
                             "--hmc/--pt/--checkpoint/--resume/"
                             "--extend-until/--init-map")
        if (args.get_lir or args.get_dustmass or args.get_peaklambda
                or args.get_evidence or args.loo or args.loo_exact
                or args.ppc or args.plot_sed or args.plot_corner
                or args.plot_chain or args.plot_ppc):
            raise SystemExit("derived-quantity posteriors, --ppc and the "
                             "--plot-* figures need chains; run without "
                             "--map for them")
        import time as _time
        from mbb_emcee_tpu.constants import PARAM_NAMES as _PN
        t0 = _time.time()
        r = fit.fit_map(nstarts=args.map_starts)
        names = [_PN[i] for i in fit.free_space.free_idx]
        for n, v, s in zip(names, r.x, r.sigma):
            print(f"  {n:8s} {v:.5g} +/- {s:.3g}  (MAP, Laplace)")
        print(f"  lnprob   {r.lnprob:.3f}   "
              f"({_time.time() - t0:.1f}s, {args.map_starts} starts)"
              + ("" if r.interior else
                 "\n  note: mode near a box bound -- Laplace error bars "
                 "are not trustworthy; run the full MCMC"))
        # the mandatory outfile gets the triage artifact (MAPFit-only
        # layout, matching the batch CLI's --map output)
        import h5py
        with h5py.File(args.outfile, "w") as f:
            f.attrs["wavenorm"] = fit.shape.wavenorm
            f.attrs["opthin"] = fit.shape.opthin
            f.attrs["noalpha"] = fit.shape.noalpha
            f.create_dataset("Wave", data=fit.phot.wave)
            f.create_dataset("Flux", data=fit.phot.flux)
            f.create_dataset("Unc", data=fit.phot.unc)
            g = f.create_group("MAPFit")
            g.create_dataset("Params",
                             data=fit.free_space.expand(r.x))
            g.create_dataset("LnProb", data=r.lnprob)
            g.create_dataset("Cov", data=r.cov)
            g.create_dataset("Sigma", data=r.sigma)
            g.create_dataset("Interior", data=r.interior)
            g.create_dataset("GradNorm", data=r.grad_norm)
        return 0

    if args.verbose:
        log.info(f"Running fit: {args.nwalkers} walkers, burn={args.burn}, "
                 f"steps={args.nsteps}, thin={args.thin}")
    timer = StepTimer(args.nwalkers)
    # actual ensemble updates: burn (+ re-burn after re-centering) +
    # production; a resumed run skips burn entirely
    if args.resume and args.checkpoint:
        total_steps = args.nsteps
    else:
        total_steps = args.nsteps + (
            args.burn if args.no_recenter_burn else 2 * args.burn)
    if args.extend_until is not None:
        if args.hmc or args.pt:
            raise SystemExit("--extend-until works with the stretch-move "
                             "sampler only")
        if args.nsteps // max(args.thin, 1) < 4:
            # catch BEFORE burning+sampling: split-R-hat needs >= 4
            # recorded steps, and failing after the production run would
            # abort exactly when the user asked to extend
            raise SystemExit(
                f"--extend-until needs at least 4 recorded steps per "
                f"pass; --nsteps {args.nsteps} / --thin {args.thin} "
                f"records only {args.nsteps // max(args.thin, 1)}")
        _validate_extend_flags(args)
    if args.init_map and (args.hmc or args.pt or args.resume
                          or args.n_ensembles > 1):
        raise SystemExit("--init-map seeds the stretch-move walker "
                         "ball of a single ensemble; drop "
                         "--hmc/--pt/--resume/--n-ensembles")
    if (args.get_lir or args.get_dustmass) and args.redshift is None:
        # catch BEFORE burning+sampling: failing in compute_lir after
        # the production run would discard the whole fit unpersisted
        raise SystemExit(
            "--get-lir/--get-dustmass need the source redshift: pass "
            "-z/--redshift (add --lumdist to override the luminosity "
            "distance)")
    with trace(args.profile_dir):
        if args.hmc and args.pt:
            raise SystemExit("--hmc and --pt are mutually exclusive")
        if args.n_ensembles > 1 and (args.hmc or args.pt):
            raise SystemExit("--n-ensembles applies to the stretch-move "
                             "sampler only; drop --hmc/--pt")
        if args.pt:
            if args.checkpoint or args.resume:
                raise SystemExit(
                    "--pt does not support --checkpoint/--resume")
            with timer.phase("fit (tempered burn + production)",
                             args.burn + args.nsteps):
                fit.run_pt(nrungs=args.pt_rungs,
                           beta_min=(args.pt_beta_min
                                     if args.pt_beta_min is not None
                                     else "auto"),
                           nburn=args.burn, nsteps=args.nsteps,
                           thin=args.thin, verbose=args.verbose)
        elif args.hmc:
            if args.checkpoint or args.resume:
                raise SystemExit(
                    "--hmc does not support --checkpoint/--resume")
            with timer.phase("fit (warmup + production)",
                             args.burn + args.nsteps):
                fit.run_hmc(nwarmup=args.burn, nsteps=args.nsteps,
                            thin=args.thin,
                            n_leapfrog=args.hmc_leapfrog,
                            target_accept=args.hmc_target_accept,
                            verbose=args.verbose)
        else:
            if args.init_map:
                with timer.phase("MAP triage", args.map_starts):
                    fit.fit_map(nstarts=args.map_starts,
                                verbose=args.verbose)
            with timer.phase("fit (burn + production)", total_steps):
                fit.run(nburn=args.burn, nsteps=args.nsteps, thin=args.thin,
                        recenter_burn=not args.no_recenter_burn,
                        verbose=args.verbose,
                        checkpoint=args.checkpoint,
                        checkpoint_interval=args.checkpoint_interval,
                        resume=args.resume,
                        init="map" if args.init_map else "auto")

        if args.extend_until is not None:
            import numpy as _np
            step = args.extend_step or args.nsteps
            max_steps = args.max_steps or 10 * args.nsteps

            def _converged():
                # one predicate shared with MultiFitter.converged
                # semantics (NaN tau counts as 1, not as converged);
                # the R-hat reduction runs ONCE and feeds both the
                # display and the predicate
                rhat = fit.gelman_rubin()
                ok = fit.converged(rhat_max=args.extend_until,
                                   tau_mult=args.tau_mult, rhat=rhat)
                return ok, float(_np.max(rhat))

            total = args.nsteps
            while total < max_steps:
                ok, rhat = _converged()
                if ok:
                    break
                if args.verbose:
                    log.info(f"  split-R-hat {rhat:.4f} >= "
                             f"{args.extend_until}; extending by {step}")
                with timer.phase(f"extend +{step}", step):
                    fit.extend(step, verbose=args.verbose)
                total += step
            else:
                ok, rhat = _converged()
            if args.verbose:
                log.info(f"  serving loop done at {total} production "
                         f"steps: split-R-hat {rhat:.4f} "
                         f"({'converged' if ok else 'max-steps cap hit'})")
    if args.verbose:
        log.info(timer.report())
        if args.profile_dir:
            log.info(f"profiler trace written to {args.profile_dir}")

    if args.get_evidence:
        ev = fit.compute_evidence(nlive=args.nlive, verbose=args.verbose)
        print(f"ln Z = {ev.logz:.4f} +/- {ev.logz_err:.4f} "
              f"({ev.n_like} likelihood evaluations)")

    res = MBBResults(fit=fit, redshift=args.redshift,
                     cosmology=args.cosmology, lumdist=args.lumdist)
    if args.get_lir:
        res.compute_lir(args.lir_wavemin, args.lir_wavemax,
                        thin=args.derived_thin)
    if args.get_dustmass:
        res.compute_dustmass(args.kappa, args.kappa_wave,
                             thin=args.derived_thin)
    if args.get_peaklambda:
        res.compute_peaklambda(thin=args.derived_thin)
    if args.ppc:
        import math
        ppc = res.posterior_predictive(thin=args.derived_thin)
        labels = (ppc.band_names if ppc.band_names is not None
                  else [f"{w:.0f}um" for w in res.data_wave])
        bands = "  ".join(
            f"{n}:{p:.3f}" if math.isfinite(p) else f"{n}:uplim"
            for n, p in zip(labels, ppc.band_p))
        print(f"posterior predictive p = {ppc.p_value:.3f} "
              f"(ndata={ppc.ndata}, nfree={ppc.nfree}); "
              f"band tail probs: {bands}")
    loo = None
    if args.loo or args.loo_exact:
        loo = res.compute_loo(thin=args.derived_thin)
        k_max = float(max(loo.pareto_k))
        print(f"elpd_loo = {loo.elpd_loo:.3f} +/- {loo.se_elpd_loo:.3f} "
              f"(p_loo={loo.p_loo:.2f}); elpd_waic = {loo.elpd_waic:.3f} "
              f"+/- {loo.se_elpd_waic:.3f}; max Pareto k-hat = {k_max:.2f}"
              + (f"  [{loo.n_bad_k} band(s) with k>0.7: unreliable]"
                 if loo.n_bad_k else ""))

    # Persist BEFORE the optional exact-LOO refits: the chain must be on
    # disk before any post-hoc computation gets a chance to fail.
    res.writeToHDF5(args.outfile)

    if args.loo_exact:
        from mbb_emcee_tpu.modelcheck import PARETO_K_WARN
        if loo.n_bad_k:
            flagged = loo.point_index[loo.pareto_k > PARETO_K_WARN]
            exact = fit.compute_loo_exact(
                bands=[int(b) for b in flagged],
                nburn=args.burn, nsteps=args.nsteps,
                thin=args.derived_thin)
            labels = (exact.band_names if exact.band_names is not None
                      else [f"band{i}" for i in exact.point_index])
            terms = "  ".join(
                f"{n}: {v:.3f}+/-{s:.3f} (psis {p:.3f})"
                for n, v, s, p in zip(
                    labels, exact.pointwise_loo, exact.se_mc,
                    loo.pointwise_loo[loo.pareto_k > PARETO_K_WARN]))
            print(f"exact LOO refits for {flagged.size} flagged "
                  f"band(s): {terms}")
        else:
            print("exact LOO refits: nothing flagged (all k-hat <= "
                  f"{PARETO_K_WARN})")

    if (args.plot_sed or args.plot_corner or args.plot_chain
            or args.plot_ppc):
        import matplotlib
        matplotlib.use("Agg")
        if args.plot_sed:
            res.plot_sed(savefig=args.plot_sed)
        if args.plot_corner:
            res.plot_corner(savefig=args.plot_corner)
        if args.plot_chain:
            res.plot_chain(savefig=args.plot_chain)
        if args.plot_ppc:
            res.plot_ppc(thin=args.derived_thin, savefig=args.plot_ppc)

    print(res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
