"""Upstream-schema HDF5 import (legacy_h5; VERDICT r03 task 3).

The reference mount is empty, so these tests SYNTHESIZE files in the
reconstructed upstream `mbb_emcee.mbb_results.writeToHDF5` layout
(SURVEY.md C7 [MED schema confidence]): chain (nwalkers, nsteps, 5),
lnprob, photometry arrays, z/opthin/noalpha/wavenorm attrs -- plus
deliberately mangled variants (alternate names, nesting, flattened /
transposed / reduced-column chains) that the tolerant reader must map,
and an unrecognizable file that must fail naming what it looked for.
"""

import warnings

import h5py
import numpy as np
import pytest

from mbb_emcee_tpu import MBBResults
from mbb_emcee_tpu.legacy_h5 import (
    UpstreamSchemaError, read_upstream_results)

NW, NS = 16, 40
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])
SCATTER = np.array([1.5, 0.1, 20.0, 0.3, 2.0])


def _chain(rng, fixed_cols=()):
    chain = TRUE + SCATTER * rng.standard_normal((NW, NS, 5))
    for c in fixed_cols:
        chain[:, :, c] = TRUE[c]
    return chain


def _write_canonical(path, rng):
    """The highest-confidence layout guess: flat root datasets with the
    upstream's own names, settings as root attrs."""
    chain = _chain(rng)
    with h5py.File(path, "w") as f:
        f.attrs["z"] = 2.5
        f.attrs["opthin"] = False
        f.attrs["noalpha"] = False
        f.attrs["wavenorm"] = 500.0
        f.create_dataset("chain", data=chain)
        f.create_dataset("lnprobability",
                         data=-0.5 * rng.chisquare(3, (NW, NS)))
        f.create_dataset("wave", data=[100.0, 250.0, 500.0])
        f.create_dataset("flux", data=[10.0, 40.0, 20.0])
        f.create_dataset("flux_unc", data=[1.0, 2.0, 1.5])
    return chain


def test_canonical_layout_loads_with_audit_warning(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "legacy.h5")
    chain = _write_canonical(path, rng)
    with pytest.warns(UserWarning, match="UPSTREAM-layout"):
        res = MBBResults(h5file=path)
    assert res.chain.shape == (NW, NS, 5)
    np.testing.assert_allclose(res.chain, chain)
    assert res.redshift == 2.5
    assert res.nwalkers == NW
    # posterior summaries work
    med, up, dn = res.par_cen("T")
    assert abs(med - TRUE[0]) < 1.0
    # best_fit uses the imported lnprob
    params, lnp = res.best_fit
    assert np.isfinite(lnp)
    # photometry came through
    np.testing.assert_allclose(res.data_wave, [100.0, 250.0, 500.0])
    # diagnostics on the free columns
    assert np.isfinite(res.gelman_rubin()).all()


def test_derived_quantities_compute_from_imported_chain(tmp_path):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "legacy.h5")
    _write_canonical(path, rng)
    with pytest.warns(UserWarning):
        res = MBBResults(h5file=path)
    lir = res.compute_lir(thin=4)
    assert lir.shape[0] == NW * NS // 4
    assert np.all(np.isfinite(lir)) and np.all(lir > 0)
    pl = res.compute_peaklambda(thin=4)
    assert np.all((pl > 50.0) & (pl < 500.0))


def test_alternate_names_and_nesting(tmp_path):
    """Lower-confidence guesses: different dataset names, nested groups,
    flattened chain; the audit warning must mark guessed mappings."""
    rng = np.random.default_rng(3)
    chain = _chain(rng)
    path = str(tmp_path / "odd.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("mcmc")
        g.create_dataset("samples", data=chain.reshape(-1, 5))
        g.create_dataset("lnlike", data=-0.5 * rng.chisquare(3, (NW, NS)))
        d = f.create_group("data")
        d.create_dataset("wavelength", data=[250.0, 350.0])
        d.create_dataset("fnu", data=[40.0, 30.0])
        d.create_dataset("sigma", data=[2.0, 2.0])
        f.attrs["redshift"] = 1.2
    with pytest.warns(UserWarning, match="guessed"):
        payload = read_upstream_results(path)
    # walker count recovered from the matching lnprob shape
    assert payload["chain"].shape == (NW, NS, 5)
    np.testing.assert_allclose(payload["chain"], chain)
    assert payload["redshift"] == 1.2
    np.testing.assert_allclose(payload["phot"].wave, [250.0, 350.0])


def test_flatchain_with_nwalkers_attr_recovers_walker_axis(tmp_path):
    """An emcee-style flatchain (no lnprob) carrying an nwalkers attr
    must fold into the true (nwalkers, nsteps, 5) geometry so walker-wise
    diagnostics (R-hat, ESS, autocorrelation) stay meaningful
    (VERDICT r04 task 5)."""
    rng = np.random.default_rng(9)
    chain = _chain(rng)
    path = str(tmp_path / "flat_nw.h5")
    with h5py.File(path, "w") as f:
        f.attrs["nwalkers"] = NW
        f.attrs["z"] = 2.0
        f.create_dataset("chain", data=chain.reshape(-1, 5))
    with pytest.warns(UserWarning, match="nwalkers attr"):
        res = MBBResults(h5file=path)
    assert res.chain.shape == (NW, NS, 5)
    np.testing.assert_allclose(res.chain, chain)
    rhat = res.gelman_rubin()
    assert np.isfinite(rhat).all()
    assert np.isfinite(res.effective_samples()).all()


def test_flatchain_with_iterations_attr_recovers_walker_axis(tmp_path):
    rng = np.random.default_rng(10)
    chain = _chain(rng)
    path = str(tmp_path / "flat_it.h5")
    with h5py.File(path, "w") as f:
        f.attrs["iterations"] = NS
        f.create_dataset("samples", data=chain.reshape(-1, 5))
    with pytest.warns(UserWarning, match="iterations attr"):
        payload = read_upstream_results(path)
    assert payload["chain"].shape == (NW, NS, 5)
    np.testing.assert_allclose(payload["chain"], chain)


def test_mismatched_photometry_lengths_degrade_with_note(tmp_path):
    """flux/unc arrays whose length disagrees with wave must degrade to
    NaN placeholders with an audit note, not crash in the Photometry
    constructor (tolerant-reader contract; matches the cov handling)."""
    rng = np.random.default_rng(11)
    path = str(tmp_path / "badphot.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("chain", data=_chain(rng))
        f.create_dataset("wave", data=[100.0, 250.0, 500.0])
        f.create_dataset("flux", data=[10.0, 40.0])          # 2 != 3
        f.create_dataset("flux_unc", data=[1.0, 2.0, 1.5, 0.9])  # 4 != 3
    with pytest.warns(UserWarning, match="does not match"):
        payload = read_upstream_results(path)
    phot = payload["phot"]
    assert phot.wave.size == 3
    assert np.isnan(phot.flux).all() and np.isnan(phot.unc).all()


def test_transposed_chain_axis_located(tmp_path):
    rng = np.random.default_rng(4)
    chain = _chain(rng)
    path = str(tmp_path / "transposed.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("chain", data=np.moveaxis(chain, 2, 0))
    with pytest.warns(UserWarning, match="moved last"):
        payload = read_upstream_results(path)
    np.testing.assert_allclose(payload["chain"], chain)


def test_reduced_columns_expand_via_model_flags(tmp_path):
    """An opthin+noalpha file storing only the 3 free columns maps onto
    the full 5-parameter layout with the fixed mask set."""
    rng = np.random.default_rng(5)
    free = [0, 1, 4]
    chain3 = (TRUE[free]
              + SCATTER[free] * rng.standard_normal((NW, NS, 3)))
    path = str(tmp_path / "reduced.h5")
    with h5py.File(path, "w") as f:
        f.attrs["opthin"] = True
        f.attrs["noalpha"] = True
        f.attrs["z"] = 3.0
        f.create_dataset("chain", data=chain3)
    with pytest.warns(UserWarning, match="expanded"):
        res = MBBResults(h5file=path)
    assert res.chain.shape == (NW, NS, 5)
    np.testing.assert_allclose(res.chain[:, :, free], chain3)
    assert res.param_spec.fixed[2] and res.param_spec.fixed[3]
    assert res.free_param_names == ["T", "beta", "fnorm"]


def test_zero_variance_columns_marked_fixed(tmp_path):
    rng = np.random.default_rng(6)
    path = str(tmp_path / "fixedcol.h5")
    chain = _chain(rng, fixed_cols=(3,))
    with h5py.File(path, "w") as f:
        f.create_dataset("chain", data=chain)
    with pytest.warns(UserWarning, match="fixed parameters inferred"):
        res = MBBResults(h5file=path)
    assert res.param_spec.fixed[3]
    assert res.param_spec.fixed_values[3] == pytest.approx(TRUE[3])
    assert "alpha" not in res.free_param_names


def test_unrecognizable_file_names_what_was_wanted(tmp_path):
    path = str(tmp_path / "junk.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("unrelated", data=np.arange(4.0))
    with pytest.raises(UpstreamSchemaError) as ei:
        read_upstream_results(path)
    msg = str(ei.value)
    assert "chain" in msg and "unrelated" in msg and "ParamConfig" in msg
    # and through the public constructor too
    with pytest.raises(UpstreamSchemaError):
        MBBResults(h5file=path)


def test_native_files_bypass_the_legacy_reader(tmp_path):
    """A file this package wrote must load through hdf5io with NO
    upstream-import warning (regression guard on the sniffing)."""
    from mbb_emcee_tpu import MBBFitter
    fit = MBBFitter(nwalkers=12, seed=0, opthin=True, noalpha=True)
    fit.set_data(np.array([100.0, 250.0, 500.0]),
                 np.array([10.0, 40.0, 20.0]), np.array([1.0, 2.0, 1.5]))
    fit.run(nburn=8, nsteps=12)
    path = str(tmp_path / "native.h5")
    res = MBBResults(fit=fit, redshift=2.0)
    res.writeToHDF5(path)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        res2 = MBBResults(h5file=path)
    np.testing.assert_allclose(res2.chain, res.chain)


def test_compat_surface_reads_upstream_files(tmp_path):
    """The migration story end-to-end: upstream-named compat class,
    upstream-layout file."""
    from mbb_emcee_tpu.compat import mbb_results
    rng = np.random.default_rng(7)
    path = str(tmp_path / "legacy.h5")
    _write_canonical(path, rng)
    with pytest.warns(UserWarning, match="UPSTREAM-layout"):
        res = mbb_results(h5file=path)
    med, _, _ = res.par_cen("beta")
    assert abs(med - TRUE[1]) < 0.2


def test_cli_inspect_reports_upstream_kind(tmp_path, capsys):
    from mbb_emcee_tpu.cli_inspect import inspect_file, main
    rng = np.random.default_rng(8)
    path = str(tmp_path / "legacy.h5")
    with h5py.File(path, "w") as f:
        f.attrs["z"] = 2.5
        f.create_dataset("chain", data=_chain(rng))
        f.create_dataset("lnprobability",
                         data=-0.5 * rng.chisquare(3, (NW, NS)))
        f.create_dataset("lir", data=rng.lognormal(29, 0.2, NW * NS))
    info = inspect_file(path)
    assert info["kind"] == "upstream"
    assert info["nwalkers"] == NW and info["nsteps"] == NS
    names = [row["name"] for row in info["params"]]
    assert names == ["T", "beta", "lambda0", "alpha", "fnorm"]
    assert info["derived"][0]["name"] == "L_IR"
    assert main([path]) == 0
    out = capsys.readouterr().out
    assert "upstream" in out and "T = " in out
