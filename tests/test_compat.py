"""The upstream-API compat layer: code written against `mbb_emcee`
(ref: SURVEY.md layer map, reconstructed) runs after changing only the
import line."""

import numpy as np
import pytest

from mbb_emcee_tpu.compat import (
    mbb_fitter, mbb_results, modified_blackbody, response, response_set)


@pytest.fixture(scope="module")
def photfile(tmp_path_factory):
    p = tmp_path_factory.mktemp("compat") / "phot.txt"
    p.write_text("100.0  11.2  0.8\n160.0  32.1  1.9\n250.0  44.8  2.4\n"
                 "350.0  38.2  2.1\n500.0  22.9  1.5\n")
    return str(p)


def test_upstream_fit_and_results_flow(photfile, tmp_path):
    # Constructor shape of the reference: photfile + options in __init__,
    # nthreads accepted (ignored), redshift carried to the results layer.
    fit = mbb_fitter(nwalkers=64, photfile=photfile, redshift=2.2,
                     opthin=True, noalpha=True, nthreads=4, seed=11)
    fit.set_gaussian_prior("beta", 1.9, 0.4)
    fit.set_uplim("T", 80.0)
    fit.run(40, 120)

    # __call__ / like() give lnprob at a full parameter vector.
    theta = np.array([30.0, 1.8, 250.0, 3.5, 40.0])
    assert np.isfinite(float(fit(theta)))
    assert float(fit.like(theta)) == float(fit(theta))

    res = mbb_results(fit=fit)
    # redshift flowed from the fitter -- no explicit redshift= needed for
    # the derived quantities, exactly as upstream.
    assert res.redshift == 2.2
    lir = res.compute_lir()
    assert np.all(np.isfinite(lir)) and np.all(lir > 0)
    c, plus, minus = res.par_cen("T")
    assert plus > 0 and minus > 0

    out = str(tmp_path / "fit.h5")
    res.writeToHDF5(out)
    back = mbb_results(h5file=out)
    np.testing.assert_allclose(back.par_cen("T"), res.par_cen("T"),
                               rtol=1e-6)


def test_upstream_positional_order(photfile):
    """Upstream positional calls put nthreads in slot 8; it must bind to
    nthreads (ignored), never to redshift."""
    fit = mbb_fitter(64, photfile, None, 0, 500.0, False, True, 4)
    assert fit.redshift is None
    fit2 = mbb_fitter(64, photfile, None, 0, 500.0, False, True, 4, 2.5)
    assert fit2.redshift == 2.5
    # The native class refuses the ambiguity outright.
    from mbb_emcee_tpu import MBBFitter
    with pytest.raises(TypeError):
        MBBFitter(64, photfile, None, 0, 500.0, False, True, 4)


def test_cosmo_type_keyword(photfile):
    fit = mbb_fitter(nwalkers=32, photfile=photfile, redshift=1.5,
                     opthin=True, noalpha=True, seed=3)
    fit.run(10, 40)
    r = mbb_results(fit=fit, cosmo_type="Planck18")
    assert r.cosmology_name == "Planck18"
    with pytest.raises(ValueError, match="not both"):
        mbb_results(fit=fit, cosmo_type="WMAP9", cosmology="Planck18")


def test_physics_and_response_aliases():
    mbb = modified_blackbody(32.0, 1.9, 250.0, 3.5, 45.0)
    f = np.asarray(mbb(np.array([250.0, 500.0])))
    assert np.all(np.isfinite(f)) and f.size == 2
    # normalization convention: S(wavenorm=500) = fnorm
    assert f[1] == pytest.approx(45.0, rel=1e-5)

    rs = response_set()
    rs.add("B1", "box:250:50")
    assert rs["B1"].name == "B1"
    assert response is not None
