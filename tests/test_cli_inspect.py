"""mbb_tpu_inspect: shell summaries of stored HDF5 artifacts of every
kind, without refitting or model files (cli_inspect.py; the reference's
equivalent is an interactive mbb_results(h5file=...) session,
SURVEY.md §3.4)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from mbb_emcee_tpu.cli_inspect import inspect_file, main
from mbb_emcee_tpu.fitter import MBBFitter
from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu.multifit import MultiFitter
from mbb_emcee_tpu.results import MBBResults

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])


def _mock_flux(shape, seed=0):
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape),
                   np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(seed)
    return f + unc * rng.standard_normal(f.size), unc


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """One small fit of each flavor, written once for the module."""
    d = tmp_path_factory.mktemp("inspect")
    shape = MBBShape(opthin=True, noalpha=True)
    flux, unc = _mock_flux(shape)

    # single MBB fit with a fixed param and a derived chain
    fit = MBBFitter(nwalkers=32, seed=7, opthin=True, noalpha=True)
    fit.set_data(WAVE, flux, unc)
    fit.fix_param("beta", 1.9)
    fit.run(nburn=20, nsteps=40)
    res = MBBResults(fit=fit, redshift=2.0)
    res.compute_peaklambda(thin=4)
    single = str(d / "single.h5")
    res.writeToHDF5(single)

    # 3-source batch + MAP triage on the same problem
    mf = MultiFitter(nwalkers=16, seed=3, opthin=True, noalpha=True)
    fl = np.stack([flux, 1.2 * flux, 0.8 * flux])
    un = np.stack([unc, unc, unc])
    mf.set_data(WAVE, fl, un, source_names=["a", "b", "c"])
    mf.run(nburn=8, nsteps=12)
    batch = str(d / "batch.h5")
    mf.writeToHDF5(batch)
    mf.run_map(nstarts=2)
    maph5 = str(d / "map.h5")
    mf.write_map_h5(maph5)

    return {"single": single, "batch": batch, "map": maph5}


def test_single_summary(artifacts):
    info = inspect_file(artifacts["single"])
    assert info["kind"] == "single"
    assert info["nwalkers"] == 32 and info["nsteps"] == 40
    assert info["redshift"] == 2.0
    by_name = {r["name"]: r for r in info["params"]}
    # fixed param reported as fixed, free params as central intervals
    assert by_name["beta"]["fixed"] == pytest.approx(1.9)
    assert abs(by_name["T"]["median"] - TRUE[0]) < 8.0
    assert by_name["T"]["uperr"] > 0 and by_name["T"]["lowerr"] > 0
    # stored derived chain summarized
    dnames = [r["name"] for r in info["derived"]]
    assert "peak lambda" in dnames
    # diagnostics on free dims only (fixed column would divide by zero)
    assert info["max_rhat"] > 0.9
    assert info["min_bulk_ess"] > 1


def test_batch_summary_and_selection(artifacts):
    info = inspect_file(artifacts["batch"])
    assert info["kind"] == "batch"
    assert info["nsources"] == 3 and info["shown"] == 3
    assert info["free_params"] == ["T", "beta", "fnorm"]
    assert [r["source"] for r in info["sources"]] == ["a", "b", "c"]
    t_meds = [
        {p["name"]: p for p in r["params"]}["T"]["median"]
        for r in info["sources"]]
    assert all(abs(t - TRUE[0]) < 10.0 for t in t_meds)
    assert info.get("continuable")  # unthinned XLA dump can extend()

    # name + index selection resolve to the same rows
    byname = inspect_file(artifacts["batch"], sources=["c"])
    byidx = inspect_file(artifacts["batch"], sources=["2"])
    assert byname["sources"][0]["index"] == 2
    assert byname["sources"][0]["params"] == byidx["sources"][0]["params"]
    with pytest.raises(ValueError, match="unknown source"):
        inspect_file(artifacts["batch"], sources=["nope"])


def test_single_fit_map_artifact(tmp_path):
    """Regression (review): the single-fit CLI's --map artifact stores a
    1-D Params vector and scalar LnProb; the inspector must normalize it
    instead of failing on the unpack."""
    from mbb_emcee_tpu.cli import main as cli_main
    shape = MBBShape(opthin=True, noalpha=True)
    flux, unc = _mock_flux(shape)
    phot = str(tmp_path / "phot.txt")
    with open(phot, "w") as fh:
        for i in range(WAVE.size):
            fh.write(f"{WAVE[i]} {flux[i]:.4f} {unc[i]:.4f}\n")
    out = str(tmp_path / "map1.h5")
    rc = cli_main([phot, out, "--opthin", "--noalpha", "--map",
                   "--map-starts", "2"])
    assert rc == 0
    info = inspect_file(out)
    assert info["kind"] == "map"
    assert info["nsources"] == 1
    row = info["sources"][0]
    assert np.isfinite(row["lnprob"])
    by_name = {p["name"]: p for p in row["params"]}
    assert set(by_name) == {"T", "beta", "lambda0", "alpha", "fnorm"}
    assert main([out]) == 0                 # shell render works too


def test_map_summary(artifacts):
    info = inspect_file(artifacts["map"])
    assert info["kind"] == "map"
    assert info["nsources"] == 3
    row = info["sources"][0]
    assert row["source"] == "a"
    by_name = {p["name"]: p for p in row["params"]}
    # full-space values; Laplace sigmas paired onto the free subset
    assert set(by_name) == {"T", "beta", "lambda0", "alpha", "fnorm"}
    for free in ("T", "beta", "fnorm"):
        assert by_name[free]["sigma"] > 0
    assert "sigma" not in by_name["lambda0"]       # opthin: not sampled
    assert np.isfinite(row["lnprob"])


def test_main_text_and_json(artifacts, capsys):
    rc = main([artifacts["single"], "--no-diag"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "single" in out and "T = " in out and "(fixed)" in out

    rc = main([artifacts["single"], artifacts["batch"], "--json",
               "--no-diag"])
    assert rc == 0
    docs = json.loads(capsys.readouterr().out)
    assert [doc["kind"] for doc in docs] == ["single", "batch"]

    # a non-HDF5 file reports an error without stopping the walk
    rc = main(["/etc/hostname", artifacts["map"]])
    err = capsys.readouterr()
    assert rc == 1
    assert "ERROR" in err.err
    assert "MAP triage" in err.out


def test_json_with_zero_results(capsys):
    """--json with every file failing must exit rc=1 without a
    traceback (advisor: results[0] used to raise IndexError)."""
    rc = main(["/etc/hostname", "--json"])
    err = capsys.readouterr()
    assert rc == 1
    assert "ERROR" in err.err
    assert err.out.strip() == ""


def test_hierarchy_free_idx_labels(tmp_path):
    """A fixed hyper NOT at the tail: chain_free columns must be labeled
    via the stored free_idx mapping, not hyper_names[:nfree] (advisor:
    fixing mu_T used to label the sigma_T column 'mu_T')."""
    from mbb_emcee_tpu.hierarchy import (
        TruncatedGaussianPopulation, HierarchicalFitter)
    rng = np.random.default_rng(0)
    samples = 35.0 + 4.0 * rng.standard_normal((6, 64, 1))
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples, pop, nwalkers=16, seed=2)
    hf.fix_param("mu_T", 35.0)          # index 0 fixed; free = sigma_T
    hf.run(nburn=20, nsteps=30)
    path = str(tmp_path / "hier.h5")
    hf.writeToHDF5(path)
    info = inspect_file(path, diag=False)
    assert info["kind"] == "hierarchy"
    assert [r["name"] for r in info["params"]] == ["sigma_T"]


def test_checkpoint_chain_so_far(tmp_path):
    """Checkpoint inspection reports recorded-steps-so-far from the v2
    Segments layout (advisor: probed root 'Chain' which the package
    never writes)."""
    import jax
    from mbb_emcee_tpu.checkpoint import save_checkpoint
    from mbb_emcee_tpu.sampler import SamplerState
    key = jax.random.PRNGKey(0)
    state = SamplerState(
        key=key,
        pos_a=jnp.zeros((8, 3)), pos_b=jnp.zeros((8, 3)),
        lnp_a=jnp.zeros(8), lnp_b=jnp.zeros(8),
        naccept=jnp.zeros(16, jnp.int32),
        nsteps=jnp.array(12, jnp.int32))
    path = str(tmp_path / "ckpt.h5")
    blocks = [np.zeros((5, 16, 3)), np.zeros((7, 16, 3))]
    lnps = [np.zeros((5, 16)), np.zeros((7, 16))]
    save_checkpoint(path, state, blocks, lnps,
                    meta={"run_id": "deadbeef"}, prng_impl="threefry2x32")
    info = inspect_file(path, diag=False)
    assert info["kind"] == "checkpoint"
    assert info["chain_shape"][0] == 12    # 5 + 7 records so far
    assert info["chain_shape"][1:] == [16, 3]


def test_percentile_width_ordering(artifacts):
    wide = inspect_file(artifacts["single"], pct=95.0, diag=False)
    narrow = inspect_file(artifacts["single"], pct=50.0, diag=False)
    gw = {r["name"]: r for r in wide["params"]}["T"]
    gn = {r["name"]: r for r in narrow["params"]}["T"]
    assert gw["uperr"] > gn["uperr"]
    assert gw["median"] == pytest.approx(gn["median"])
