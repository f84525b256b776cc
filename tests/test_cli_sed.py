"""Generic-model CLI end-to-end: a user model file + catalog in -> one
batched fit -> HDF5 out (the shell surface of sedmulti.SEDMultiFitter;
ADDITIVE -- the reference has no user-model hook at all)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.cli_sed import build_parser, load_model, main
from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu
from mbb_emcee_tpu.sedmulti import SEDMultiFitter

WAVE = np.array([60.0, 100.0, 250.0, 500.0, 1100.0])

MODEL_SRC = '''
import jax.numpy as jnp
from mbb_emcee_tpu import SEDModel, log_mbb_fnu
from mbb_emcee_tpu.models.modified_blackbody import MBBShape

_SHAPE = MBBShape(opthin=True, noalpha=True)


def _two_mbb(theta, wave):
    t_c, t_w, beta, f_c, f_w = theta
    p_c = jnp.stack([t_c, beta, 250.0, 4.0, f_c])
    p_w = jnp.stack([t_w, beta, 250.0, 4.0, f_w])
    return (jnp.exp(log_mbb_fnu(p_c, wave, _SHAPE))
            + jnp.exp(log_mbb_fnu(p_w, wave, _SHAPE)))


MODEL = SEDModel(fnu=_two_mbb,
                 param_names=("T_cold", "T_warm", "beta", "fc", "fw"),
                 lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
                 upper=[25.0, 80.0, 4.0, 1e3, 1e2], name="two-temp-cli")
OTHER = 42
'''


def _write_model(tmp_path):
    path = tmp_path / "mymodel.py"
    path.write_text(MODEL_SRC)
    return str(path)


def _write_catalog(tmp_path, S=3, seed=0):
    model_shape = MBBShape(opthin=True, noalpha=True)

    def two(theta):
        t_c, t_w, beta, f_c, f_w = theta
        p_c = np.array([t_c, beta, 250.0, 4.0, f_c])
        p_w = np.array([t_w, beta, 250.0, 4.0, f_w])
        return (np.asarray(mbb_fnu(jnp.asarray(p_c, jnp.float32),
                                   jnp.asarray(WAVE, jnp.float32),
                                   model_shape), np.float64)
                + np.asarray(mbb_fnu(jnp.asarray(p_w, jnp.float32),
                                     jnp.asarray(WAVE, jnp.float32),
                                     model_shape), np.float64))

    rng = np.random.default_rng(seed)
    trues = np.column_stack([
        rng.uniform(15, 22, S), rng.uniform(38, 52, S), np.full(S, 1.8),
        rng.uniform(15, 60, S), rng.uniform(0.5, 3.0, S)])
    z = rng.uniform(1.5, 2.5, S)
    lines = ["# two-component mock catalog",
             "wave = " + " ".join(f"{w:g}" for w in WAVE)]
    for i in range(S):
        f = two(trues[i])
        unc = 0.05 * f
        flux = f + unc * rng.standard_normal(f.size)
        lines.append(f"SRC{i:02d} {z[i]:.3f} " + " ".join(
            f"{flux[j]:.5f} {unc[j]:.5f}" for j in range(WAVE.size)))
    path = tmp_path / "cat.txt"
    path.write_text("\n".join(lines) + "\n")
    return str(path), trues


def test_parser_and_model_loading(tmp_path):
    assert build_parser().prog == "run_sed_tpu"
    mpath = _write_model(tmp_path)
    model = load_model(mpath)
    assert model.name == "two-temp-cli" and model.npar == 5
    # alternate attribute name and failure modes
    with pytest.raises(SystemExit, match="not an SEDModel"):
        load_model(mpath + ":OTHER")
    with pytest.raises(SystemExit, match="no attribute"):
        load_model(mpath + ":MISSING")
    with pytest.raises(SystemExit, match="not found"):
        load_model(str(tmp_path / "nope.py"))
    bad = tmp_path / "broken.py"
    bad.write_text("raise RuntimeError('boom')\n")
    with pytest.raises(SystemExit, match="importing"):
        load_model(str(bad))


def test_cli_sed_full_run(tmp_path, capsys):
    mpath = _write_model(tmp_path)
    cat, trues = _write_catalog(tmp_path)
    out = str(tmp_path / "out.h5")
    rc = main([mpath, cat, out, "-w", "48", "-b", "60", "-n", "160",
               "--seed", "5",
               "--initval", "T_cold", "18", "--initval", "T_warm", "45",
               "--initval", "fc", "30", "--initval", "fw", "1.5",
               "--prior", "beta", "1.8", "0.4",
               "--get-lir", "--get-peaklambda", "--ppc",
               "--derived-thin", "4", "--summary"])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "posterior predictive [two-temp-cli]" in txt
    assert "max-Rhat" in txt and "PPC p" in txt

    # reload with the model and check recovery
    mf = SEDMultiFitter.from_h5(out, load_model(mpath))
    cen = mf.par_cen("T_cold")
    sig = np.maximum(np.maximum(cen[:, 1], cen[:, 2]), 0.2)
    assert np.all(np.abs(cen[:, 0] - trues[:, 0]) < 6 * sig)
    assert mf.lir_chain is not None      # derived chains persisted
    # ... and the serving loop continues after the reload
    n0 = mf.chain_free.shape[1]
    mf.extend(20)
    assert mf.chain_free.shape[1] == n0 + 20


def test_cli_sed_map_triage(tmp_path, capsys):
    import h5py
    mpath = _write_model(tmp_path)
    cat, trues = _write_catalog(tmp_path, seed=3)
    out = str(tmp_path / "map.h5")
    rc = main([mpath, cat, out, "-w", "16", "--map", "--map-starts", "6",
               "--initval", "T_cold", "18", "--initval", "T_warm", "45",
               "--initval", "fc", "30", "--initval", "fw", "1.5",
               "--summary"])
    assert rc == 0
    assert "MAP triage [two-temp-cli]" in capsys.readouterr().out
    with h5py.File(out) as f:
        assert f.attrs["kind"] == "sed-map"
        assert f["Params"].shape == (3, 5)
    # triage refuses chain-only extras
    with pytest.raises(SystemExit, match="need"):
        main([mpath, cat, out, "--map", "--get-lir"])


def test_cli_sed_checkpoint_and_guards(tmp_path):
    mpath = _write_model(tmp_path)
    cat, trues = _write_catalog(tmp_path, seed=7)
    out = str(tmp_path / "o.h5")
    ck = str(tmp_path / "ck.h5")
    rc = main([mpath, cat, out, "-w", "32", "-b", "10", "-n", "40",
               "--initval", "T_cold", "18", "--initval", "T_warm", "45",
               "--initval", "fc", "30", "--initval", "fw", "1.5",
               "--checkpoint", ck, "--checkpoint-interval", "20"])
    assert rc == 0
    mf = SEDMultiFitter.from_h5(ck, load_model(mpath))
    assert mf.chain_free.shape[1] == 40
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main([mpath, cat, out, "--hmc", "--pt"])
    with pytest.raises(SystemExit, match="stretch-move"):
        main([mpath, cat, out, "--hmc", "--extend-until", "1.1"])
    with pytest.raises(SystemExit, match="unknown parameter"):
        main([mpath, cat, out, "--lowlim", "T_dust", "5"])
    # Regression (review): extend preconditions are validated BEFORE
    # the production run (a post-run SystemExit lost the fit)
    with pytest.raises(SystemExit, match="4 recorded steps"):
        main([mpath, cat, out, "-n", "6", "--thin", "2",
              "--extend-until", "1.05"])
    with pytest.raises(SystemExit, match="divisible"):
        main([mpath, cat, out, "-n", "100", "--thin", "2",
              "--extend-until", "1.05", "--extend-step", "7"])
    # --plot-population is accepted (the shared population stage
    # handles it; it was missing from this CLI's parser)
    from mbb_emcee_tpu.cli_sed import build_parser
    a = build_parser().parse_args(
        [mpath, cat, out, "--population", "T_cold",
         "--plot-population", "p.png"])
    assert a.plot_population == "p.png"


def test_cli_sed_hmc_and_uplim(tmp_path):
    mpath = _write_model(tmp_path)
    cat, trues = _write_catalog(tmp_path, seed=9)
    out = str(tmp_path / "h.h5")
    rc = main([mpath, cat, out, "-w", "16", "-b", "30", "-n", "60",
               "--hmc",
               "--initval", "T_cold", "18", "--initval", "T_warm", "45",
               "--initval", "fc", "30", "--initval", "fw", "1.5",
               "--phot-uplim", "4"])
    assert rc == 0
    mf = SEDMultiFitter.from_h5(out, load_model(mpath))
    assert np.asarray(mf._spec.uplim_bands)[4]
    assert mf.chain_free.shape[1] == 60


def test_shipped_model_file(tmp_path):
    """The examples/two_temp_model.py file drives the CLI as shipped."""
    import os
    mpath = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "two_temp_model.py")
    model = load_model(mpath)
    assert model.name == "two-temp-greybody"
    cat, trues = _write_catalog(tmp_path, S=2, seed=13)
    out = str(tmp_path / "ship.h5")
    rc = main([mpath, cat, out, "-w", "16", "-b", "10", "-n", "20",
               "--initval", "T_cold", "18",
               "--initval", "T_warm", "45",
               "--initval", "fnorm_cold", "30",
               "--initval", "fnorm_warm", "1.5"])
    assert rc == 0 and os.path.exists(out)


def test_cli_sed_population(tmp_path, capsys):
    """--population works on the generic-model shell with the model's own
    parameter names, writes the hyper chain, and refuses the bad combos."""
    import h5py
    mpath = _write_model(tmp_path)
    cat, trues = _write_catalog(tmp_path, S=4, seed=3)
    out = str(tmp_path / "out.h5")
    rc = main([mpath, cat, out, "-w", "48", "-b", "40", "-n", "120",
               "--seed", "5",
               "--initval", "T_cold", "18", "--initval", "T_warm", "45",
               "--initval", "fc", "30", "--initval", "fw", "1.5",
               "--population", "T_cold",
               "--population-burn", "60", "--population-steps", "150",
               "--population-walkers", "16"])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "population (4 sources" in txt
    assert "T_cold: mu " in txt
    pop = str(tmp_path / "out.pop.h5")
    assert f"hyper chain written to {pop}" in txt
    with h5py.File(pop) as f:
        names = [n.decode() for n in f.attrs["hyper_names"]]
        assert names == ["mu_T_cold", "sigma_T_cold"]
    with pytest.raises(SystemExit):
        main([mpath, cat, "x.h5", "--map", "--population", "T_cold"])
    with pytest.raises(SystemExit):
        main([mpath, cat, "x.h5", "--population", "T_cold",
              "--population-correlated"])


def test_cli_sed_photoz_serving(tmp_path):
    """The shipped photo-z model file drives the shell end to end:
    joint-z catalog fit, z-marginalized L_IR (--lir-zparam) and dust
    mass (--get-dustmass), both persisted; bad combos pre-validated."""
    import os
    import h5py
    from mbb_emcee_tpu.photoz import photoz_mbb

    ppath = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "photoz_model.py")
    model = load_model(ppath)
    assert model.param_names[-1] == "z"

    # photo-z mock catalog: per-source z only generates the fluxes; the
    # catalog z column is a placeholder (the fit samples z itself).
    gen = photoz_mbb(cmb=True, z_upper=10.0)
    wave_pz = np.array([250.0, 350.0, 500.0, 850.0, 1100.0, 2000.0])
    rng = np.random.default_rng(7)
    lines = ["wave = " + " ".join(f"{w:g}" for w in wave_pz)]
    for i, z0 in enumerate([2.5, 4.0]):
        t = np.array([38.0, 1.9, 80.0, 3.0, 10.0, z0])
        f = np.asarray(gen.fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(wave_pz, jnp.float32)),
                       np.float64)
        unc = 0.07 * f
        flux = f + unc * rng.standard_normal(f.size)
        lines.append(f"PZ{i:02d} 0.0 " + " ".join(
            f"{flux[j]:.6f} {unc[j]:.6f}" for j in range(wave_pz.size)))
    cat = tmp_path / "pzcat.txt"
    cat.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "pz.h5")
    rc = main([ppath, str(cat), out, "-w", "32", "-b", "20", "-n", "40",
               "--seed", "4",
               "--fixed", "alpha", "3", "--prior", "T", "38", "6",
               "--initval", "T", "38", "--initval", "beta", "1.9",
               "--initval", "lambda0", "80", "--initval", "fnorm", "10",
               "--initval", "z", "3",
               "--get-lir", "--lir-zparam", "z", "--get-dustmass",
               "--derived-thin", "2"])
    assert rc == 0
    with h5py.File(out) as f:
        assert "LIRChain" in f and "DustMassChain" in f
        assert np.isfinite(np.asarray(f["LIRChain"])).all()
        assert np.isfinite(np.asarray(f["DustMassChain"])).all()
        assert f["DustMassChain"].attrs["z_param"] == "z"
    mf = SEDMultiFitter.from_h5(out, model)
    assert mf.dustmass_chain is not None and mf.lir_chain is not None

    # pre-validation: unknown z parameter; dustmass on a non-photo-z model
    with pytest.raises(SystemExit, match="lir-zparam"):
        main([ppath, str(cat), "x.h5", "--get-lir",
              "--lir-zparam", "bogus"])
    mpath = _write_model(tmp_path)
    with pytest.raises(SystemExit, match="photo-z"):
        main([mpath, str(cat), "x.h5", "--get-dustmass"])


def test_cli_sed_anchor_z(tmp_path):
    """--anchor-z: the catalog z column becomes a per-source prior on
    the sampled z -- spec-z rows pinned, NaN rows free -- in one
    compiled program."""
    import os
    import h5py
    from mbb_emcee_tpu.photoz import photoz_mbb

    ppath = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "photoz_model.py")
    gen = photoz_mbb(cmb=True, z_upper=10.0)
    wave_pz = np.array([250.0, 350.0, 500.0, 850.0, 1100.0, 2000.0])
    rng = np.random.default_rng(9)
    lines = ["wave = " + " ".join(f"{w:g}" for w in wave_pz)]
    # source 0 has spectroscopy (z column finite); source 1 does not
    for i, (z0, zcol) in enumerate([(2.5, "2.5"), (4.0, "nan")]):
        t = np.array([38.0, 1.9, 80.0, 3.0, 10.0, z0])
        f = np.asarray(gen.fnu(jnp.asarray(t, jnp.float32),
                               jnp.asarray(wave_pz, jnp.float32)),
                       np.float64)
        unc = 0.07 * f
        flux = f + unc * rng.standard_normal(f.size)
        lines.append(f"MX{i:02d} {zcol} " + " ".join(
            f"{flux[j]:.6f} {unc[j]:.6f}" for j in range(wave_pz.size)))
    cat = tmp_path / "mixed.txt"
    cat.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "mx.h5")
    rc = main([ppath, str(cat), out, "-w", "32", "-b", "120", "-n", "240",
               "--seed", "4", "--fixed", "alpha", "3",
               "--prior", "T", "38", "6", "--anchor-z", "0.02",
               "--initval", "T", "38", "--initval", "beta", "1.9",
               "--initval", "lambda0", "80", "--initval", "fnorm", "10",
               "--initval", "z", "3"])
    assert rc == 0
    model = load_model(ppath)
    mf = SEDMultiFitter.from_h5(out, model)
    cen = mf.par_cen("z")
    assert abs(cen[0, 0] - 2.5) < 0.05          # anchored at spec-z
    assert 0.5 * (cen[0, 1] + cen[0, 2]) < 0.05
    assert 0.5 * (cen[1, 1] + cen[1, 2]) > 0.2  # NaN row stays free
    assert "z" in mf._ps_prior                  # prior persisted

    # pre-validation: a model without 'z', all-NaN z, bad sigma
    mpath = _write_model(tmp_path)
    cat2, _ = _write_catalog(tmp_path, S=2, seed=1)
    with pytest.raises(SystemExit, match="sampled 'z'"):
        main([mpath, cat2, "x.h5", "--anchor-z", "0.1"])
    lines[1] = lines[1].replace("2.5 ", "nan ", 1)
    allnan = tmp_path / "allnan.txt"
    allnan.write_text("\n".join(lines) + "\n")
    with pytest.raises(SystemExit, match="finite redshift"):
        main([ppath, str(allnan), "x.h5", "--anchor-z", "0.1"])
    with pytest.raises(SystemExit, match="positive"):
        main([ppath, str(cat), "x.h5", "--anchor-z", "-1"])
    # spec-z outside the model's z box refuses before any device work
    oob = tmp_path / "oob.txt"
    oob.write_text("\n".join(
        [lines[0], lines[2].replace("nan ", "11.5 ", 1)]) + "\n")
    with pytest.raises(SystemExit, match="z box"):
        main([ppath, str(oob), "x.h5", "--anchor-z", "0.1"])


def test_cli_sed_corrfile(tmp_path):
    """--corrfile: correlated calibration errors through the generic
    CLI, given as a covariance FITS (normalized to its correlation) --
    round-2 verdict task: the generic tier gets the same shared-
    calibration error model the MBB batch CLI has."""
    from mbb_emcee_tpu.utils.fits import write_fits_image

    mpath = _write_model(tmp_path)
    cat, trues = _write_catalog(tmp_path)
    out = str(tmp_path / "corr.h5")
    sig = np.array([1.0, 2.0, 2.5, 2.0, 1.5])
    C = 0.3 * np.outer(sig, sig) + 0.7 * np.diag(sig ** 2)
    corr = str(tmp_path / "cov.fits")
    write_fits_image(corr, C)
    rc = main([mpath, cat, out, "-w", "24", "-b", "20", "-n", "60",
               "--seed", "5",
               "--initval", "T_cold", "18", "--initval", "T_warm", "45",
               "--initval", "beta", "1.8", "--initval", "fc", "30",
               "--initval", "fw", "1.0",
               "--corrfile", corr])
    assert rc == 0
    back = SEDMultiFitter.from_h5(out, load_model(mpath))
    want = C / np.sqrt(np.outer(np.diag(C), np.diag(C)))
    np.testing.assert_allclose(back._band_corr, want, rtol=1e-12)
    assert back.chain_free.shape[1] == 60

    # upper limits and correlation refuse to combine, at the CLI level
    with pytest.raises(SystemExit, match="corrfile"):
        main([mpath, cat, out, "-w", "24", "-b", "4", "-n", "8",
              "--corrfile", corr, "--phot-uplim", "4"])


def test_cli_sed_pt_checkpoint_resume(tmp_path):
    """--pt + --checkpoint/--resume on the generic CLI: an interrupted
    tempered serving run resumes to the same target through the engine's
    tier checkpointing."""
    import h5py
    mpath = _write_model(tmp_path)
    cat, _ = _write_catalog(tmp_path)
    ck = str(tmp_path / "pt.ck.h5")
    common = [mpath, cat, "-w", "16", "-b", "10", "--pt",
              "--pt-rungs", "4", "--seed", "5",
              "--initval", "T_cold", "18", "--initval", "T_warm", "45",
              "--initval", "beta", "1.8", "--initval", "fc", "30",
              "--initval", "fw", "1.0",
              "--checkpoint", ck, "--checkpoint-interval", "10"]
    rc = main(common[:2] + [str(tmp_path / "pt1.h5")] + common[2:]
              + ["-n", "10"])
    assert rc == 0
    with h5py.File(ck, "r") as f:
        assert f.attrs["tier"] == "pt"
    rc = main(common[:2] + [str(tmp_path / "pt2.h5")] + common[2:]
              + ["-n", "30", "--resume"])
    assert rc == 0
    back = SEDMultiFitter.from_h5(str(tmp_path / "pt2.h5"),
                                  load_model(mpath))
    assert back.chain_free.shape[1] == 30
