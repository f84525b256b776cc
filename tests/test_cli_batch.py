"""Batch CLI end-to-end: catalog file in -> one batched fit -> HDF5 out
(the serving analog of the SURVEY.md section 3.1 call stack; additive over
the reference, whose CLI fits one source per process)."""

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from mbb_emcee_tpu.catalog import read_catalog
from mbb_emcee_tpu.cli_batch import build_parser, main
from mbb_emcee_tpu.models.modified_blackbody import MBBShape, mbb_fnu
from mbb_emcee_tpu.multifit import MultiFitter

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])


def _write_catalog(path, nsources=3, shape=None, bands=None, seed=0):
    shape = shape or MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(seed)
    trues = np.column_stack([
        rng.uniform(25.0, 40.0, nsources),     # T
        rng.uniform(1.5, 2.2, nsources),       # beta
        np.full(nsources, 250.0),              # lambda0 (unused if opthin)
        np.full(nsources, 3.5),                # alpha (unused if noalpha)
        rng.uniform(20.0, 60.0, nsources),     # fnorm
    ])
    z = rng.uniform(1.0, 3.0, nsources)
    lines = ["# mock survey catalog", "wave = " +
             " ".join(f"{w:g}" for w in WAVE)]
    if bands:
        lines.append("bands = " + " ".join(bands))
    for i in range(nsources):
        f = np.asarray(mbb_fnu(jnp.asarray(trues[i], jnp.float32),
                               jnp.asarray(WAVE, jnp.float32), shape),
                       np.float64)
        unc = 0.05 * f
        flux = f + unc * rng.standard_normal(f.size)
        row = f"SRC{i:03d} {z[i]:.3f} " + " ".join(
            f"{flux[j]:.4f} {unc[j]:.4f}" for j in range(WAVE.size))
        lines.append(row)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return trues, z


def test_batch_parser():
    assert build_parser().prog == "run_mbb_emcee_tpu_batch"


def test_read_catalog(tmp_path):
    path = str(tmp_path / "cat.txt")
    trues, z = _write_catalog(path, nsources=4,
                              bands=["B1", "B2", "B3", "B4", "B5"])
    cat = read_catalog(path)
    assert cat.nsources == 4
    assert cat.names == [f"SRC{i:03d}" for i in range(4)]
    np.testing.assert_allclose(cat.redshifts, z, atol=5e-4)
    np.testing.assert_array_equal(cat.wave, WAVE)
    assert cat.band_names == ["B1", "B2", "B3", "B4", "B5"]
    assert cat.flux.shape == cat.unc.shape == (4, 5)
    assert cat.has_redshifts


def test_read_catalog_errors(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("SRC0 1.0 1 0.1\n")           # source row before wave
    with pytest.raises(ValueError, match="wave"):
        read_catalog(str(p))
    p.write_text("wave = 100 200\nSRC0 1.0 1 0.1\n")   # wrong column count
    with pytest.raises(ValueError, match="columns"):
        read_catalog(str(p))
    p.write_text("wave = 100\nSRC0 1.0 1 -0.1\n")      # bad uncertainty
    with pytest.raises(ValueError, match="uncertainty"):
        read_catalog(str(p))


def test_read_catalog_per_source_uplims(tmp_path):
    p = tmp_path / "cat.txt"
    p.write_text("wave = 100 200\n"
                 "uplims = 0 1\n"
                 "SRC0 1.0  10.0 1.0  <5.0 0.5\n"
                 "SRC1 2.0  <3.0 0.3  4.0 0.4\n")
    cat = read_catalog(str(p))
    # '<' strips to the limit value in the flux matrix
    np.testing.assert_allclose(cat.flux, [[10.0, 5.0], [3.0, 4.0]])
    np.testing.assert_array_equal(cat.uplim_src,
                                  [[False, True], [True, False]])
    # effective mask ORs the shared 'uplims' row with per-source flags
    np.testing.assert_array_equal(cat.uplim_mask(),
                                  [[False, True], [True, True]])

    # shared row only -> 1-D mask passes through
    p.write_text("wave = 100 200\nuplims = 0 1\nSRC0 1.0 10 1 5 .5\n")
    assert read_catalog(str(p)).uplim_mask().shape == (2,)

    # '<' needs a finite limit and a present band
    p.write_text("wave = 100\nSRC0 1.0 <nan 0.5\n")
    with pytest.raises(ValueError, match="finite"):
        read_catalog(str(p))
    p.write_text("wave = 100 200\nSRC0 1.0 <5.0 nan 4.0 0.4\n")
    with pytest.raises(ValueError, match="MISSING"):
        read_catalog(str(p))
    p.write_text("wave = 100\nSRC0 1.0 abc 0.5\n")
    with pytest.raises(ValueError, match="bad number"):
        read_catalog(str(p))


def test_set_data_stale_uplim_mask_guard():
    mf = MultiFitter(nwalkers=16)
    mf.set_data(WAVE, np.ones((3, 5)), np.full((3, 5), 0.1))
    mf.set_phot_upperlimits(np.zeros((3, 5), bool))
    with pytest.raises(ValueError, match="set_phot_upperlimits"):
        mf.set_data(WAVE, np.ones((2, 5)), np.full((2, 5), 0.1))
    # a shared (nb,) mask survives a source-count change
    mf.set_phot_upperlimits(np.zeros(5, bool))
    mf.set_data(WAVE, np.ones((2, 5)), np.full((2, 5), 0.1))


def test_batch_cli_full_run(tmp_path, capsys):
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    trues, z = _write_catalog(cat, nsources=3)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "120",
               "--uplim", "T", "100", "--uplim", "beta", "5",
               "--get-lir", "--get-peaklambda", "--loo",
               "--derived-thin", "8",
               "--seed", "5", "--summary"])
    assert rc == 0
    table = capsys.readouterr().out
    assert "SRC000" in table and "max-Rhat" in table
    assert "elpd_loo" in table

    back = MultiFitter.from_h5(out)
    assert back.nsources == 3
    assert back.source_names == ["SRC000", "SRC001", "SRC002"]
    np.testing.assert_allclose(back.redshifts, z, atol=5e-4)
    # recovered temperatures near truth
    t_cen = back.par_cen("T")
    assert np.all(np.abs(t_cen[:, 0] - trues[:, 0]) < 10.0)
    # derived chains persisted and reusable after reload
    assert back.lir_chain is not None and np.all(back.lir_chain > 0)
    assert back.peaklambda_chain is not None
    assert back.lir_cen().shape == (3, 3)
    # stored redshifts drive a fresh derived computation
    dm = back.compute_dustmass(thin=16)
    assert dm.shape[0] == 3 and np.all(dm > 0)
    with h5py.File(out) as f:
        assert "SourceNames" in f and "Redshifts" in f and "LIRChain" in f


def test_batch_cli_fixed_prior_and_store_thin(tmp_path):
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=2)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "20", "-n", "64",
               "--fixed", "beta", "2.0",
               "--prior", "T", "30", "5",
               "--store-thin", "4", "--seed", "7"])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    np.testing.assert_allclose(back.chain[..., 1], 2.0)   # beta fixed
    assert back.chain_free.shape[1] == 64 // 4            # stored thin


def test_batch_cli_flag_conflicts(tmp_path):
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=2)
    with pytest.raises(SystemExit):
        main([cat, "x.h5", "--hmc", "--pt"])
    with pytest.raises(SystemExit):
        main([cat, "x.h5", "--hmc", "--extend-until", "1.1"])
    # --pt/--hmc + --checkpoint is now SUPPORTED (engine tier
    # checkpointing): a tempered CLI run flushes a resumable file
    ckpt = str(tmp_path / "pt.ck.h5")
    rc = main([cat, str(tmp_path / "pt.h5"), "--opthin", "--noalpha",
               "-w", "16", "-b", "10", "-n", "20", "--pt",
               "--pt-rungs", "4", "--sampler-backend", "xla",
               "--checkpoint", ckpt, "--checkpoint-interval", "10"])
    assert rc == 0
    import h5py
    with h5py.File(ckpt, "r") as f:
        assert f.attrs["tier"] == "pt"
        assert "Segments" in f
    # extend-until WORKS on the XLA backend (continuation from the final
    # key + last chain record); loose threshold so one pass suffices
    out = str(tmp_path / "y.h5")
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "20", "-n", "40",
               "--sampler-backend", "xla", "--extend-until", "3.0",
               "--max-steps", "120"])
    assert rc == 0


def test_batch_cli_no_redshift_guard(tmp_path):
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=2)
    # blank out the z column
    lines = open(cat).read().splitlines()
    lines = [(" ".join([l.split()[0], "nan"] + l.split()[2:])
              if l.startswith("SRC") else l) for l in lines]
    open(cat, "w").write("\n".join(lines))
    with pytest.raises(SystemExit, match="redshift"):
        main([cat, str(tmp_path / "z.h5"), "--opthin", "--noalpha",
              "-w", "16", "-b", "8", "-n", "16", "--get-lir"])


def test_batch_cli_uplims(tmp_path):
    """The catalog's 'uplims' header flags one-sided photometry bands and
    survives the HDF5 round-trip."""
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=2)
    lines = open(cat).read().splitlines()
    lines.insert(2, "uplims = 0 0 0 0 1")
    open(cat, "w").write("\n".join(lines) + "\n")
    parsed = read_catalog(cat)
    np.testing.assert_array_equal(parsed.uplim_bands,
                                  [False, False, False, False, True])
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "16", "-n", "48", "--seed", "4"])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    np.testing.assert_array_equal(back._spec.uplim_bands,
                                  [False, False, False, False, True])
    # the one-sided band relaxes the likelihood: a model BELOW the quoted
    # flux in the uplim band pays no penalty there, so the posterior must
    # admit lower fnorm values than the two-sided fit of the same data
    assert np.all(np.isfinite(back.par_cen("T")))


def test_phot_uplim_flag_resolution():
    from mbb_emcee_tpu.cli import _uplim_mask
    mask = _uplim_mask(["4", "SPIRE_500"], 5,
                       ["PACS_100", "PACS_160", "SPIRE_250", "SPIRE_350",
                        "SPIRE_500"])
    np.testing.assert_array_equal(mask, [False] * 4 + [True])
    with pytest.raises(SystemExit, match="unknown band"):
        _uplim_mask(["NOPE"], 5, ["A", "B", "C", "D", "E"])
    with pytest.raises(SystemExit, match="out of range"):
        _uplim_mask(["7"], 5, None)


def test_batch_cli_phot_uplim_flag(tmp_path):
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=2)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "16", "-n", "48",
               "--phot-uplim", "4", "--seed", "4"])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    np.testing.assert_array_equal(back._spec.uplim_bands,
                                  [False, False, False, False, True])


def test_multifit_set_phot_upperlimits_validation():
    mf = MultiFitter(nwalkers=16)
    with pytest.raises(RuntimeError, match="set_data"):
        mf.set_phot_upperlimits([True])
    mf.set_data(WAVE, np.ones((2, 5)), np.full((2, 5), 0.1))
    with pytest.raises(ValueError, match="upper-limit mask"):
        mf.set_phot_upperlimits([True, False])
    with pytest.raises(ValueError, match="upper-limit mask"):
        mf.set_phot_upperlimits(np.zeros((3, 5), bool))  # wrong S
    mf.set_phot_upperlimits([False] * 4 + [True])
    assert mf._effective_spec().uplim_bands[-1]
    # per-source (S, nb) masks are accepted and ride the iunc sign
    m = np.zeros((2, 5), bool)
    m[1, 0] = True
    mf.set_phot_upperlimits(m)
    iunc = mf._iunc_operand()
    assert iunc[1, 0] < 0 and iunc[0, 0] > 0


def test_batch_cli_mesh(tmp_path):
    """--mesh-devices shards the source axis over the virtual 8-CPU mesh
    (conftest forces xla_force_host_platform_device_count=8)."""
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=8)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "16", "-n", "48",
               "--mesh-devices", "8", "--seed", "2"])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    assert back.nsources == 8
    assert back.chain_free.shape[1] == 48
    # mesh size must divide the source count
    with pytest.raises(SystemExit, match="divide"):
        main([cat, str(tmp_path / "m.h5"), "--opthin", "--noalpha",
              "-w", "16", "-b", "8", "-n", "16", "--mesh-devices", "3"])


def test_batch_cli_extend_until_interpret(tmp_path, capsys):
    """The run-until-converged serving loop through the fused kernel
    (Pallas interpreter on CPU)."""
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=2)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "16", "-n", "32",
               "--sampler-backend", "fused", "--interpret",
               "--extend-until", "1.5", "--extend-step", "32",
               "--max-steps", "96", "--seed", "3", "-v"])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    # at least one extension happened or it converged immediately; the
    # chain length is 32, 64, or 96 records
    assert back.chain_free.shape[1] in (32, 64, 96)


def test_read_catalog_header_rules(tmp_path):
    p = tmp_path / "cat.txt"
    # a duplicate header row must not silently rebind the band grid
    p.write_text("wave = 100 200\nwave = 100 300\nS0 1.0 1 0.1 2 0.2\n")
    with pytest.raises(ValueError, match="duplicate 'wave'"):
        read_catalog(str(p))
    # a source that happens to be NAMED like a header keyword after data
    # rows started is parsed as data, not swallowed as a header
    p.write_text("wave = 100 200\n"
                 "S0     1.0 1.0 0.1 2.0 0.2\n"
                 "uplims 1.5 3.0 0.2 4.0 0.3\n")
    cat = read_catalog(str(p))
    assert cat.names == ["S0", "uplims"]
    assert cat.uplim_bands is None
    np.testing.assert_allclose(cat.flux[1], [3.0, 4.0])


def test_extend_until_needs_enough_records(tmp_path):
    """--extend-until with < 4 recorded steps must abort BEFORE the fit,
    not crash in the R-hat predicate after burn+production already ran."""
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=2)
    with pytest.raises(SystemExit, match="at least 4 recorded"):
        main([cat, str(tmp_path / "o.h5"), "--opthin", "--noalpha",
              "-w", "16", "-b", "8", "-n", "100", "--thin", "50",
              "--sampler-backend", "fused", "--interpret",
              "--extend-until", "1.1"])


def test_summary_table_error_bar_order():
    """The +/- columns must match par_cen's (median, +err, -err) order;
    a skewed posterior printed with swapped bars is silently wrong
    scientific output."""
    from mbb_emcee_tpu.cli_batch import _summary_table
    shape = MBBShape(opthin=True, noalpha=True)
    rng = np.random.default_rng(7)
    trues = np.array([[30.0, 1.8, 250.0, 3.5, 40.0],
                      [38.0, 2.0, 250.0, 3.5, 55.0]])
    flux = np.stack([
        np.asarray(mbb_fnu(jnp.asarray(t, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64) for t in trues])
    unc = 0.05 * flux
    flux = flux + unc * rng.standard_normal(flux.shape)
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=9,
                     sampler_backend="xla")
    mf.set_data(WAVE, flux, unc)
    mf.run(nburn=20, nsteps=40)
    table = _summary_table(mf)
    cen = mf.par_cen("T")
    assert f"+{cen[0, 1]:.3g}/-{cen[0, 2]:.3g}" in table


def test_catalog_missing_band_pairs(tmp_path):
    """'nan nan' pairs mark missing bands; they parse and fit (zero
    likelihood weight) instead of erroring."""
    p = tmp_path / "ragged.txt"
    p.write_text("wave = 160 250 500\n"
                 "S0 2.0 30.0 1.5 45.0 2.2 22.0 1.1\n"
                 "S1 1.5 28.0 1.4 nan nan 20.0 1.0\n")
    cat = read_catalog(str(p))
    assert np.isnan(cat.flux[1, 1]) and np.isnan(cat.unc[1, 1])
    mf = MultiFitter(nwalkers=16, opthin=True, noalpha=True, seed=2)
    mf.set_data(cat.wave, cat.flux, cat.unc, redshifts=cat.redshifts)
    mf.run(nburn=10, nsteps=20)
    assert np.isfinite(np.asarray(mf.lnprobability)).all()


def test_batch_cli_corrfile(tmp_path):
    """--corrfile: correlated calibration errors through the batch CLI,
    given as a covariance FITS (normalized to its correlation)."""
    from mbb_emcee_tpu.utils.fits import write_fits_image

    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "corr.h5")
    _write_catalog(cat, nsources=3)
    # covariance with a common 30% calibration floor
    sig = np.array([1.0, 2.0, 2.5, 2.0, 1.5])
    C = 0.3 * np.outer(sig, sig) + 0.7 * np.diag(sig ** 2)
    corr = str(tmp_path / "cov.fits")
    write_fits_image(corr, C)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "32", "-b", "20", "-n", "60", "--seed", "5",
               "--corrfile", corr])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    want = C / np.sqrt(np.outer(np.diag(C), np.diag(C)))
    np.testing.assert_allclose(back._band_corr, want, rtol=1e-12)

    # upper limits and correlation refuse to combine, at the CLI level
    with pytest.raises(SystemExit, match="corrfile"):
        main([cat, out, "--opthin", "--noalpha", "-w", "32",
              "-b", "4", "-n", "8", "--corrfile", corr,
              "--phot-uplim", "4"])

    # --corrfile composes with checkpointing (the XLA-backend segmented
    # checkpoint; this combination was refused while checkpointing was
    # fused-only)
    ck = str(tmp_path / "corr.ck.h5")
    out2 = str(tmp_path / "corr2.h5")
    rc = main([cat, out2, "--opthin", "--noalpha",
               "-w", "32", "-b", "10", "-n", "40", "--seed", "5",
               "--corrfile", corr, "--checkpoint", ck,
               "--checkpoint-interval", "20"])
    assert rc == 0
    back2 = MultiFitter.from_h5(ck)
    assert back2.chain_free.shape[1] == 40
    assert back2._band_corr is not None


def test_batch_cli_map_triage(tmp_path, capsys):
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "map.h5")
    trues, z = _write_catalog(cat, nsources=3)
    rc = main([cat, out, "--opthin", "--noalpha", "--map", "--seed", "3"])
    assert rc == 0
    table = capsys.readouterr().out
    assert "SRC000" in table and "MAP-fit" in table
    import h5py
    with h5py.File(out) as f:
        p = np.asarray(f["MAPFit"]["Params"])
    assert np.all(np.abs(p[:, 0] - trues[:, 0]) < 8.0)
    # triage refuses chain-only options
    with pytest.raises(SystemExit, match="chains"):
        main([cat, out, "--map", "--get-lir"])
    with pytest.raises(SystemExit, match="triage"):
        main([cat, out, "--map", "--hmc"])


def test_batch_cli_map_chunked(tmp_path, capsys):
    """Regression (review): --map combined with --chunk-size must triage
    the WHOLE catalog (it used to fit only the first tile and exit 0),
    writing one MAPFit part per chunk with global indices."""
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "map.h5")
    trues, z = _write_catalog(cat, nsources=5)
    rc = main([cat, out, "--opthin", "--noalpha", "--map",
               "--chunk-size", "2", "--seed", "3"])
    assert rc == 0
    table = capsys.readouterr().out
    assert "3 chunks of 2" in table
    assert "  4 SRC004" in table          # global index in last chunk
    parts = sorted(tmp_path.glob("map.part*.h5"))
    assert [p.name for p in parts] == [
        "map.part000.h5", "map.part001.h5", "map.part002.h5"]
    # chunk slices: [0:2], [2:4], overlap [3:5] -- every source covered
    expected = [range(0, 2), range(2, 4), range(3, 5)]
    for p, idxs in zip(parts, expected):
        with h5py.File(str(p)) as f:
            prm = np.asarray(f["MAPFit"]["Params"])
            names = [s.decode() for s in f["SourceNames"][()]]
        assert names == [f"SRC{i:03d}" for i in idxs]
        assert np.all(np.abs(prm[:, 0] - trues[list(idxs), 0]) < 8.0)


def test_batch_cli_chunked(tmp_path, capsys):
    """--chunk-size: a 10-source catalog served in three 4-source tiles
    (final tile overlaps), one part file per chunk, global indices in
    each summary, and every part a normal MultiFitter file."""
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    trues, z = _write_catalog(cat, nsources=10)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "120",
               "--chunk-size", "4", "--seed", "5", "--summary"])
    assert rc == 0
    table = capsys.readouterr().out
    assert "3 chunks of 4" in table
    parts = sorted(tmp_path.glob("batch.part*.h5"))
    assert [p.name for p in parts] == [
        "batch.part000.h5", "batch.part001.h5", "batch.part002.h5"]
    # chunk slices: [0:4], [4:8], overlap [6:10]
    expected = [range(0, 4), range(4, 8), range(6, 10)]
    for p, idxs in zip(parts, expected):
        back = MultiFitter.from_h5(str(p))
        assert back.nsources == 4
        assert back.source_names == [f"SRC{i:03d}" for i in idxs]
        np.testing.assert_allclose(back.redshifts, z[list(idxs)],
                                   atol=5e-4)
        t_cen = back.par_cen("T")
        assert np.all(np.abs(t_cen[:, 0] - trues[list(idxs), 0]) < 10.0)
    # global indices in the summary
    assert "  9 SRC009" in table
    # chunk >= nsources falls back to the single-program path
    rc = main([cat, str(tmp_path / "one.h5"), "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "120",
               "--chunk-size", "64", "--seed", "5"])
    assert rc == 0
    assert MultiFitter.from_h5(str(tmp_path / "one.h5")).nsources == 10


def test_batch_cli_chunked_per_source_uplims(tmp_path, capsys):
    """Chunking slices a per-source '<flux' mask to each tile (the 2-D
    mask binds to source identities, so it is cleared and re-bound per
    chunk)."""
    cat = str(tmp_path / "cat.txt")
    trues, z = _write_catalog(cat, nsources=6)
    # rewrite source 5's 500um flux as an upper limit token
    lines = open(cat).read().splitlines()
    toks = lines[-1].split()
    toks[-2] = "<" + toks[-2]
    lines[-1] = " ".join(toks)
    open(cat, "w").write("\n".join(lines) + "\n")

    out = str(tmp_path / "b.h5")
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "30", "-n", "80",
               "--chunk-size", "3", "--seed", "5"])
    assert rc == 0
    back0 = MultiFitter.from_h5(str(tmp_path / "b.part000.h5"))
    back1 = MultiFitter.from_h5(str(tmp_path / "b.part001.h5"))
    assert back0.nsources == back1.nsources == 3
    # both chunks produced finite posteriors with the mask applied
    assert np.isfinite(back0.par_cen("T")).all()
    assert np.isfinite(back1.par_cen("T")).all()


def test_batch_cli_chunked_guards(tmp_path):
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=10)
    with pytest.raises(SystemExit, match="checkpoint"):
        main([cat, str(tmp_path / "o.h5"), "--chunk-size", "4",
              "--checkpoint", str(tmp_path / "c.h5")])
    with pytest.raises(SystemExit, match="chunk-size"):
        main([cat, str(tmp_path / "o.h5"), "--chunk-size", "0"])
    with pytest.raises(SystemExit, match="divide"):
        main([cat, str(tmp_path / "o.h5"), "--chunk-size", "6",
              "--mesh-devices", "4"])


def test_batch_extend_until_small_steps_stride(tmp_path):
    """Regression: with tiny -n/--extend-step the floor-stride full-span
    R-hat subsampling must never drop below the 4-record minimum
    (ceil-stride left 3 records at nrec=6 and crashed mid-loop)."""
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=3)
    rc = main([cat, str(tmp_path / "o.h5"), "--opthin", "--noalpha",
               "-w", "64", "-b", "30", "-n", "4",
               "--extend-until", "1.0001", "--extend-step", "2",
               "--max-steps", "12", "--seed", "5"])
    assert rc == 0                      # hits max-steps without crashing


def test_batch_extend_flag_validation(tmp_path):
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=3)
    with pytest.raises(SystemExit, match="divisible"):
        main([cat, str(tmp_path / "o.h5"), "-n", "100", "--thin", "2",
              "--extend-until", "1.05", "--extend-step", "25"])
    with pytest.raises(SystemExit, match="positive"):
        main([cat, str(tmp_path / "o.h5"), "-n", "100",
              "--extend-until", "1.05", "--extend-step", "-50"])


def test_batch_cli_init_map(tmp_path):
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "b.h5")
    trues, z = _write_catalog(cat, nsources=3)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "20", "-n", "120",
               "--init-map", "--map-starts", "4", "--seed", "5"])
    assert rc == 0
    back = MultiFitter.from_h5(out)
    t_cen = back.par_cen("T")
    assert np.all(np.abs(t_cen[:, 0] - trues[:, 0]) < 10.0)
    with pytest.raises(SystemExit, match="init-map"):
        main([cat, out, "--pt", "--init-map"])


def test_catalog_header_colon_no_space(tmp_path):
    """Regression (review): 'wave: 100 ...' (no space before the colon)
    must parse as a header row, not fall into the source-row branch with
    a misleading missing-header error."""
    path = str(tmp_path / "cat.txt")
    with open(path, "w") as fh:
        fh.write("wave: 100 250 500\n")
        fh.write("SRC:A 1.5 10.0 1.0 20.0 1.0 15.0 1.0\n")
    cat = read_catalog(path)
    np.testing.assert_array_equal(cat.wave, [100.0, 250.0, 500.0])
    assert cat.names == ["SRC:A"]          # colons in names survive


def test_batch_cli_tiny_run_still_writes(tmp_path, capsys):
    """Regression (review): a run recording < 4 steps (too few for
    split-R-hat) must still write its HDF5 and print a summary with
    R-hat as nan -- not crash after the fit completed."""
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "tiny.h5")
    _write_catalog(cat, nsources=2)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "16", "-b", "4", "-n", "3", "--seed", "5"])
    assert rc == 0
    assert "nan" in capsys.readouterr().out
    assert MultiFitter.from_h5(out).nsources == 2
    rc = main([cat, str(tmp_path / "t2.h5"), "--opthin", "--noalpha",
               "-w", "16", "-b", "4", "-n", "3", "--seed", "5",
               "--summary"])
    assert rc == 0


def test_batch_cli_population(tmp_path, capsys):
    """--population runs the hierarchical tier after the batch fit,
    prints mu/sigma posteriors + ESS, and writes the hyper-chain file."""
    import h5py
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=4, seed=8)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "120", "--seed", "5",
               "--population", "T",
               "--population-burn", "60", "--population-steps", "200",
               "--population-walkers", "16"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "population (4 sources" in text
    assert "T: mu " in text and "sigma " in text
    assert "reweight ESS min" in text
    pop = str(tmp_path / "batch.pop.h5")
    assert f"hyper chain written to {pop}" in text
    with h5py.File(pop) as f:
        assert f.attrs["kind"] == "hierarchy"
        names = [n.decode() for n in f.attrs["hyper_names"]]
        assert names == ["mu_T", "sigma_T"]
        assert f["chain_free"].shape == (200, 16, 2)
        assert f["reweight_ess"].shape == (4,)
    # the batch file itself is untouched by the population stage
    back = MultiFitter.from_h5(out)
    assert back.nsources == 4


def test_batch_cli_population_conflicts(tmp_path):
    cat = str(tmp_path / "cat.txt")
    _write_catalog(cat, nsources=4)
    with pytest.raises(SystemExit):
        main([cat, "x.h5", "--map", "--population", "T"])
    with pytest.raises(SystemExit):
        main([cat, "x.h5", "--chunk-size", "2", "--population", "T"])


def test_batch_cli_population_correlated(tmp_path, capsys):
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=4, seed=12)
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "40", "-n", "120", "--seed", "5",
               "--population", "T", "beta", "--population-correlated",
               "--population-burn", "60", "--population-steps", "150",
               "--population-walkers", "16"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "rho(T,beta)" in text
    import h5py
    with h5py.File(str(tmp_path / "batch.pop.h5")) as f:
        names = [n.decode() for n in f.attrs["hyper_names"]]
        assert names == ["mu_T", "mu_beta", "sigma_T", "sigma_beta",
                         "rho_T_beta"]
    with pytest.raises(SystemExit):
        main([cat, "x.h5", "--population", "T", "--population-correlated"])


def test_batch_cli_plot_population(tmp_path):
    pytest.importorskip("matplotlib").use("Agg")
    cat = str(tmp_path / "cat.txt")
    out = str(tmp_path / "batch.h5")
    _write_catalog(cat, nsources=4, seed=8)
    png = str(tmp_path / "pop.png")
    rc = main([cat, out, "--opthin", "--noalpha",
               "-w", "64", "-b", "30", "-n", "100", "--seed", "5",
               "--population", "T", "beta",
               "--population-burn", "40", "--population-steps", "120",
               "--population-walkers", "16",
               "--plot-population", png])
    assert rc == 0
    import os
    assert os.path.exists(str(tmp_path / "pop_T.png"))
    assert os.path.exists(str(tmp_path / "pop_beta.png"))
