"""CLI end-to-end: photometry file in -> HDF5 out -> reload and summarize
(SURVEY.md section 3.1 call stack, L5 entry point)."""

import numpy as np
import jax.numpy as jnp
import h5py

from mbb_emcee_tpu.cli import main, build_parser
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.results import MBBResults

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])


def _write_photfile(path, shape, names=None):
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape), np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(3)
    flux = f + unc * rng.standard_normal(f.size)
    with open(path, "w") as fh:
        fh.write("# mock herschel photometry\n")
        for i in range(WAVE.size):
            prefix = f"{names[i]} " if names else ""
            fh.write(f"{prefix}{WAVE[i]} {flux[i]:.4f} {unc[i]:.4f}\n")


def test_cli_help():
    p = build_parser()
    assert p.prog == "run_mbb_emcee_tpu"


def test_cli_full_run(tmp_path, capsys):
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit.h5")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    rc = main([phot, out,
               "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "120",
               "-z", "2.0",
               "--uplim", "T", "100", "--uplim", "beta", "5",
               "--get-lir", "--get-dustmass", "--get-peaklambda",
               "--loo-exact", "--derived-thin", "4",
               "--seed", "5", "-v"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "acceptance" in captured
    assert "L_IR" in captured
    assert "elpd_loo" in captured      # --loo-exact implies --loo
    assert "exact LOO refits" in captured

    # Reload and sanity-check.
    res = MBBResults(h5file=out)
    assert res.redshift == 2.0
    assert res.chain.shape[0] == 64
    c = res.par_cen("T")
    assert abs(c[0] - TRUE[0]) < 10.0
    assert res.lir_chain is not None and np.all(res.lir_chain > 0)
    assert res.dustmass_chain is not None
    assert res.peaklambda_chain is not None
    # Order-of-magnitude check: this mock is a very luminous z=2 source
    # (T_rest ~ 96 K, S_100 ~ 2 Jy) -> L_IR of order 1e14-1e15 Lsun.
    lir_med = np.median(res.lir_chain)
    assert 1e13 < lir_med < 1e16

    # The LOO assessment persisted and round-trips.
    assert res.loo_result is not None
    assert np.isfinite(res.loo_result.elpd_loo)

    with h5py.File(out) as f:
        assert "Chain" in f and "LIR" in f and "LOO" in f
        assert f.attrs["opthin"]


def test_cli_response_mode(tmp_path):
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit.h5")
    names = [f"BOX{int(w)}" for w in WAVE]
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True), names=names)
    filt = tmp_path / "filters.txt"
    filt.write_text("".join(
        f"BOX{int(w)} box:{w}:{0.3 * w:.1f}\n" for w in WAVE))
    rc = main([phot, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "30", "-n", "80",
               "--responsefile", str(filt),
               "--uplim", "T", "100", "--seed", "6"])
    assert rc == 0
    res = MBBResults(h5file=out)
    assert res.phot.band_names == names


def test_cli_fixed_and_prior(tmp_path):
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit.h5")
    _write_photfile(phot, MBBShape())
    rc = main([phot, out,
               "-w", "64", "-b", "30", "-n", "80",
               "--fixed", "lambda0", "250", "--fixed", "alpha", "3.5",
               "--prior", "beta", "2.0", "0.3",
               "--uplim", "T", "100", "--seed", "8"])
    assert rc == 0
    res = MBBResults(h5file=out)
    assert np.all(res.chain[:, :, 2] == np.float32(250.0))
    assert np.all(res.chain[:, :, 3] == np.float32(3.5))


def test_step_timer_and_trace_noop(tmp_path):
    import time
    from mbb_emcee_tpu.utils.profiling import StepTimer, trace

    t = StepTimer(nwalkers=100)
    with t.phase("burn", 10):
        time.sleep(0.01)
    with t.phase("production", 30):
        time.sleep(0.01)
    assert t.rate("burn") > 0
    assert t.rate() > 0
    rep = t.report()
    assert "burn" in rep and "production" in rep
    with trace(None):        # no-op path
        pass
    with trace(str(tmp_path / "trace")):
        import jax.numpy as jnp
        jnp.ones(4).sum().block_until_ready()


def test_initscatter_alone_keeps_auto_seed(tmp_path):
    """--initscatter must only change the ball spread; the data-driven
    T/fnorm auto-seed stays active (regression: it used to pin the
    current default init as a user value)."""
    from mbb_emcee_tpu.fitter import MBBFitter
    fit = MBBFitter(nwalkers=16, opthin=True, noalpha=True)
    fit.set_data([100.0, 250.0, 500.0], [10.0, 40.0, 30.0],
                 [1.0, 2.0, 1.5])
    fit.set_param_init("fnorm", scatter=3.0)
    assert not fit._user_init[4]          # auto-seed still active
    assert fit._user_scatter[4]
    fit._auto_init_fnorm()
    assert fit._init[4] == 30.0           # seeded from the 500um flux
    assert fit._scatter[4] == 3.0         # user scatter preserved


def test_cli_hmc(tmp_path, capsys):
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit_hmc.h5")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    rc = main([phot, out,
               "--opthin", "--noalpha", "--hmc",
               "-w", "32", "-b", "120", "-n", "150",
               "--seed", "5", "-v"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "HMC" in captured
    res = MBBResults(h5file=out)
    assert res.chain.shape[0] == 32
    assert abs(res.par_cen("T")[0] - TRUE[0]) < 10.0


def test_cli_pt(tmp_path, capsys):
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit_pt.h5")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    rc = main([phot, out,
               "--opthin", "--noalpha", "--pt", "--pt-rungs", "6",
               "-w", "32", "-b", "80", "-n", "120",
               "--seed", "5", "-v"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "PT" in captured and "lnZ" in captured
    res = MBBResults(h5file=out)
    assert res.chain.shape[0] == 32
    assert abs(res.par_cen("T")[0] - TRUE[0]) < 10.0
    # stepping-stone evidence round-trips through the HDF5 file
    assert res.logz_pt is not None and np.isfinite(res.logz_pt[0])
    assert res.logz_ti is not None


def test_cli_pt_rejects_checkpoint_and_hmc(tmp_path):
    phot = str(tmp_path / "phot.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    import pytest
    with pytest.raises(SystemExit):
        main([phot, str(tmp_path / "o.h5"), "--pt",
              "--checkpoint", str(tmp_path / "c.h5")])
    with pytest.raises(SystemExit):
        main([phot, str(tmp_path / "o.h5"), "--pt", "--hmc"])


def test_cli_hmc_rejects_checkpoint(tmp_path):
    phot = str(tmp_path / "phot.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    import pytest
    with pytest.raises(SystemExit):
        main([phot, str(tmp_path / "o.h5"), "--hmc",
              "--checkpoint", str(tmp_path / "c.h5")])


def test_cli_map_triage(tmp_path, capsys):
    phot = tmp_path / "phot.txt"
    phot.write_text("100.0 11.2 0.8\n160.0 32.1 1.9\n250.0 44.8 2.4\n"
                    "350.0 38.2 2.1\n500.0 22.9 1.5\n")
    rc = main([str(phot), str(tmp_path / "x.h5"), "--opthin", "--noalpha",
               "--map"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MAP, Laplace" in out and "lnprob" in out
    with h5py.File(tmp_path / "x.h5") as f:       # triage artifact written
        assert "MAPFit" in f and f["MAPFit"]["Params"].shape == (5,)
    import pytest
    with pytest.raises(SystemExit, match="triage"):
        main([str(phot), "x.h5", "--map", "--hmc"])
    with pytest.raises(SystemExit, match="chains"):
        main([str(phot), "x.h5", "--map", "--get-lir"])


def test_cli_extend_until(tmp_path, capsys):
    """Single-fit serving loop: --extend-until keeps extending production
    until split-R-hat converges (the batch CLI's loop, same flags)."""
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit.h5")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    rc = main([phot, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "40",
               "--extend-until", "1.05", "--extend-step", "40",
               "--max-steps", "400", "--seed", "5", "-v"])
    assert rc == 0
    res = MBBResults(h5file=out)
    # the loop either converged below threshold or hit the 400-step cap
    nrec = res.nsteps
    assert nrec >= 40
    if nrec < 400:
        assert float(np.max(res.gelman_rubin())) < 1.05
    # guards: wrong sampler / too few records per pass
    import pytest
    with pytest.raises(SystemExit, match="stretch-move"):
        main([phot, out, "--hmc", "--extend-until", "1.05"])
    with pytest.raises(SystemExit, match="4 recorded"):
        main([phot, out, "-n", "9", "--thin", "3",
              "--extend-until", "1.05"])


def test_cli_extend_flag_validation(tmp_path):
    """--extend-step/--max-steps are validated BEFORE burning+sampling
    (an uncaught divisibility error after production would lose the
    fit), and --map refuses the serving-loop flags."""
    phot = str(tmp_path / "phot.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    out = str(tmp_path / "o.h5")
    import pytest
    with pytest.raises(SystemExit, match="divisible"):
        main([phot, out, "-n", "100", "--thin", "2",
              "--extend-until", "1.05", "--extend-step", "25"])
    with pytest.raises(SystemExit, match="positive"):
        main([phot, out, "-n", "100",
              "--extend-until", "1.05", "--extend-step", "-50"])
    with pytest.raises(SystemExit, match="positive"):
        main([phot, out, "-n", "100",
              "--extend-until", "1.05", "--max-steps", "0"])
    with pytest.raises(SystemExit, match="triage"):
        main([phot, out, "--map", "--extend-until", "1.05"])


def test_cli_derived_z_checked_before_fit(tmp_path):
    """Regression (review): --get-lir/--get-dustmass without -z used to
    crash in compute_lir AFTER the full MCMC and before the HDF5 write,
    losing the fit. Must be a pointed SystemExit before sampling."""
    phot = str(tmp_path / "phot.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    out = str(tmp_path / "o.h5")
    import os
    import pytest
    for flag in ("--get-lir", "--get-dustmass"):
        with pytest.raises(SystemExit, match="redshift"):
            main([phot, out, "-n", "50000", flag])   # huge n: must not run
        assert not os.path.exists(out)


def test_cli_map_rejects_ppc_and_plots(tmp_path):
    """Regression (review): --map silently ignored --ppc and --plot-*
    (requested outputs never produced); now refused like the other
    chains-needed flags."""
    phot = str(tmp_path / "phot.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    out = str(tmp_path / "o.h5")
    import pytest
    with pytest.raises(SystemExit, match="chains"):
        main([phot, out, "--map", "--ppc"])
    with pytest.raises(SystemExit, match="chains"):
        main([phot, out, "--map", "--plot-sed", str(tmp_path / "f.png")])


def test_cli_init_map(tmp_path, capsys):
    """--init-map: MAP triage seeds the walker ball (triage-then-refine
    as one command), with the sampler-conflict guards."""
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit.h5")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    rc = main([phot, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "20", "-n", "120",
               "--init-map", "--map-starts", "4", "--seed", "5", "-v"])
    assert rc == 0
    res = MBBResults(h5file=out)
    assert abs(res.par_cen("T")[0] - TRUE[0]) < 10.0
    import pytest
    with pytest.raises(SystemExit, match="init-map"):
        main([phot, out, "--hmc", "--init-map"])
    with pytest.raises(SystemExit, match="triage"):
        main([phot, out, "--map", "--init-map"])


def test_cli_n_ensembles_conflicts(tmp_path):
    """Regression (review): --n-ensembles conflicts (--hmc/--pt/--covfile/
    --init-map) exit with a clear message BEFORE any device work, not a
    raw ValueError traceback after the MAP triage ran."""
    import pytest
    phot = str(tmp_path / "p.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    out = str(tmp_path / "o.h5")
    with pytest.raises(SystemExit, match="stretch-move"):
        main([phot, out, "--n-ensembles", "4", "--hmc"])
    with pytest.raises(SystemExit, match="n-ensembles"):
        main([phot, out, "--n-ensembles", "4", "--init-map"])
    cov = str(tmp_path / "cov.fits")
    from mbb_emcee_tpu.utils.fits import write_fits_image
    write_fits_image(cov, np.eye(5) * 0.01)
    with pytest.raises(SystemExit, match="diagonal"):
        main([phot, out, "--n-ensembles", "4", "--covfile", cov])


def test_cli_plot_flags(tmp_path):
    """--plot-sed/--plot-corner/--plot-chain/--plot-ppc write figures."""
    import os
    import pytest
    pytest.importorskip("matplotlib")
    phot = str(tmp_path / "phot.txt")
    out = str(tmp_path / "fit.h5")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    pngs = {flag: str(tmp_path / f"{flag}.png")
            for flag in ("sed", "corner", "chain", "ppc")}
    rc = main([phot, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "10", "-n", "30", "--seed", "4",
               "--plot-sed", pngs["sed"],
               "--plot-corner", pngs["corner"],
               "--plot-chain", pngs["chain"],
               "--plot-ppc", pngs["ppc"]])
    assert rc == 0
    for flag, path in pngs.items():
        assert os.path.exists(path) and os.path.getsize(path) > 0, flag


def test_cli_loo_exact_rejects_covfile(tmp_path):
    """--loo-exact + --covfile must be rejected BEFORE sampling (the
    refit tier is diagonal-only; discovering that after an hours-long
    run would lose the chain)."""
    phot = str(tmp_path / "phot.txt")
    _write_photfile(phot, MBBShape(opthin=True, noalpha=True))
    import pytest
    cov = str(tmp_path / "cov.fits")
    from mbb_emcee_tpu.utils.fits import write_fits_image
    write_fits_image(cov, np.diag(np.full(5, 0.1)))
    with pytest.raises(SystemExit, match="diagonal"):
        main([phot, str(tmp_path / "out.h5"), "--opthin", "--noalpha",
              "--covfile", cov, "--loo-exact", "-w", "16", "-b", "4",
              "-n", "8"])
