"""Plot helpers: each figure builds headless (Agg), contains the expected
artists, and saves to disk; upper-limit bands render as arrows."""

import numpy as np
import jax.numpy as jnp
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape
from mbb_emcee_tpu import MBBFitter, MBBResults

WAVE = np.array([100.0, 160.0, 250.0, 350.0, 500.0])
TRUE = np.array([32.0, 1.9, 250.0, 3.5, 45.0])


@pytest.fixture(scope="module")
def results():
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape), np.float64)
    unc = 0.05 * f
    rng = np.random.default_rng(1)
    fit = MBBFitter(nwalkers=32, opthin=True, noalpha=True, seed=7)
    fit.set_data(WAVE, f + unc * rng.standard_normal(f.size), unc)
    fit.set_uplim("T", 100.0).set_uplim("beta", 5.0)
    fit.set_phot_upperlimits([False, False, False, False, True])
    fit.run(nburn=20, nsteps=60)
    return MBBResults(fit=fit)


def test_plot_sed(results, tmp_path):
    out = tmp_path / "sed.png"
    fig = results.plot_sed(savefig=str(out))
    ax = fig.axes[0]
    assert ax.get_xscale() == "log" and ax.get_yscale() == "log"
    # Band fill + median + best-fit lines + data + uplim arrows all drew.
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert any("posterior band" in t for t in labels)
    assert "upper limits" in labels
    assert out.exists() and out.stat().st_size > 0
    matplotlib.pyplot.close(fig)


def test_plot_corner(results, tmp_path):
    out = tmp_path / "corner.png"
    fig = results.plot_corner(savefig=str(out))
    nfree = len(results.free_param_names)
    visible = [a for a in fig.axes if a.get_visible()]
    assert len(visible) == nfree * (nfree + 1) // 2
    assert out.exists() and out.stat().st_size > 0
    matplotlib.pyplot.close(fig)


def test_plot_corner_param_subset(results):
    fig = results.plot_corner(params=["T", "beta"])
    assert len([a for a in fig.axes if a.get_visible()]) == 3
    matplotlib.pyplot.close(fig)


def test_plot_chain(results, tmp_path):
    out = tmp_path / "chain.png"
    fig = results.plot_chain(savefig=str(out))
    assert len(fig.axes) == len(results.free_param_names)
    assert out.exists() and out.stat().st_size > 0
    matplotlib.pyplot.close(fig)


def test_cli_plot_flags(tmp_path):
    from mbb_emcee_tpu.cli import main
    shape = MBBShape(opthin=True, noalpha=True)
    f = np.asarray(mbb_fnu(jnp.asarray(TRUE, jnp.float32),
                           jnp.asarray(WAVE, jnp.float32), shape), np.float64)
    phot = tmp_path / "phot.txt"
    phot.write_text("".join(f"{w} {fl:.4f} {0.05 * fl:.4f}\n"
                            for w, fl in zip(WAVE, f)))
    sed = tmp_path / "sed.png"
    corner = tmp_path / "corner.png"
    rc = main([str(phot), str(tmp_path / "out.h5"), "--opthin", "--noalpha",
               "-w", "16", "-b", "10", "-n", "20", "--uplim", "T", "100",
               "--plot-sed", str(sed), "--plot-corner", str(corner)])
    assert rc == 0
    assert sed.exists() and sed.stat().st_size > 0
    assert corner.exists() and corner.stat().st_size > 0


def test_plot_ppc(results, tmp_path):
    out = tmp_path / "ppc.png"
    fig = results.plot_ppc(thin=4, savefig=str(out))
    ax = fig.axes[0]
    assert "posterior predictive: p =" in ax.get_title()
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert any("replicated" in t for t in labels)
    assert out.exists()
    # also accepts a precomputed PPCResult
    ppc = results.posterior_predictive(thin=4)
    fig2 = results.plot_ppc(ppc=ppc)
    assert f"{ppc.p_value:.3f}" in fig2.axes[0].get_title()


def test_plot_population(tmp_path):
    from mbb_emcee_tpu.hierarchy import (TruncatedGaussianPopulation,
                                         HierarchicalFitter)
    rng = np.random.default_rng(5)
    S, N = 24, 128
    x = rng.normal(35.0, 4.0, S)
    samples = (x[:, None] + rng.normal(0, 1.5, (S, N)))[..., None]
    pop = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    hf = HierarchicalFitter(samples, pop, nwalkers=16, seed=2)
    hf.run(nburn=50, nsteps=150)
    out = tmp_path / "pop.png"
    fig = hf.plot_population("T", savefig=str(out))
    assert out.exists()
    ax = fig.axes[0]
    # band + median line + histogram patches present
    assert len(ax.lines) >= 1 and len(ax.collections) >= 1
    assert len(ax.patches) > 0
    with pytest.raises(ValueError):
        hf.plot_population("beta")
    matplotlib.pyplot.close("all")


class _NoMarginalPop:
    """A 'user' population model: the fitting contract only (ln_dist
    etc.), NO marginal_pdf -- plot_population must fall back to the
    Monte-Carlo band instead of raising (VERDICT r03 task 6)."""

    def __init__(self, inner):
        object.__setattr__(self, "_inner", inner)

    def __getattr__(self, name):
        if name == "marginal_pdf":
            raise AttributeError(name)
        return getattr(self._inner, name)


def test_plot_population_without_marginal_pdf(tmp_path):
    from mbb_emcee_tpu.hierarchy import (TruncatedGaussianPopulation,
                                         HierarchicalFitter)
    rng = np.random.default_rng(6)
    S, N = 16, 96
    x = rng.normal(35.0, 4.0, S)
    samples = (x[:, None] + rng.normal(0, 1.5, (S, N)))[..., None]
    pop = _NoMarginalPop(
        TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0]))
    assert not hasattr(pop, "marginal_pdf")
    hf = HierarchicalFitter(samples, pop, nwalkers=16, seed=2)
    hf.run(nburn=40, nsteps=120)
    out = tmp_path / "pop_fallback.png"
    fig = hf.plot_population("T", n_draw=64, savefig=str(out))
    assert out.exists()
    ax = fig.axes[0]
    assert len(ax.lines) >= 1 and len(ax.collections) >= 1
    matplotlib.pyplot.close("all")


def test_mc_marginal_matches_exact():
    """The fallback's numerics against the built-in exact marginals:
    grid evaluation is exact for 1-parameter populations; the
    uniform-importance marginalization converges for 2-parameter ones."""
    from mbb_emcee_tpu.hierarchy import TruncatedGaussianPopulation
    from mbb_emcee_tpu.plotting import _mc_marginal

    x = np.linspace(12.0, 58.0, 101)

    pop1 = TruncatedGaussianPopulation.for_box(("T",), [10.0], [60.0])
    phi1 = np.array([35.0, 4.0])
    np.testing.assert_allclose(
        _mc_marginal(pop1, 0)(phi1, x), pop1.marginal_pdf(phi1, 0, x),
        rtol=2e-4, atol=1e-7)

    pop2 = TruncatedGaussianPopulation.for_box(
        ("T", "beta"), [10.0, 0.5], [60.0, 4.0])
    phi2 = np.array([35.0, 1.9, 4.0, 0.3])
    got = _mc_marginal(pop2, 0, n_mc=4096)(phi2, x)
    want = pop2.marginal_pdf(phi2, 0, x)
    # MC marginalization over the beta box: ~1/sqrt(4096) relative error
    np.testing.assert_allclose(got, want, rtol=0.08, atol=5e-4)


def test_plot_pz(tmp_path):
    """The photo-z P(z) figure: histogram curve + interval markers,
    reweighted overlay, truth marker; unreliable overlays say so."""
    from mbb_emcee_tpu.photoz import photoz_mbb
    from mbb_emcee_tpu.sed import SEDFitter
    from mbb_emcee_tpu.reweight import reweight_prior

    model = photoz_mbb(cmb=True, z_upper=8.0)
    wave = np.array([250.0, 350.0, 500.0, 850.0, 1100.0, 2000.0])
    truth = np.array([38.0, 1.9, 80.0, 3.0, 10.0, 4.0])
    f = np.asarray(model.fnu(jnp.asarray(truth, jnp.float32),
                             jnp.asarray(wave, jnp.float32)), np.float64)
    fit = SEDFitter(model, nwalkers=32, seed=4)
    fit.set_data(wave, f, 0.07 * f)
    fit.set_gaussian_prior("T", 38.0, 6.0)
    fit.fix_param("alpha", 3.0)
    for nm, v in zip(model.param_names, truth):
        fit.set_param_init(nm, v, 0.1 * abs(v))
    fit.run(nburn=40, nsteps=120)
    res = fit.results()

    rw = reweight_prior(res, "T", 36.0, 6.0)
    out = tmp_path / "pz.png"
    fig = res.plot_pz(reweight=rw, z_true=4.0, savefig=str(out))
    assert out.exists()
    ax = fig.axes[0]
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert any(lab.startswith("P(z)") for lab in labels)
    assert any("reweighted" in lab for lab in labels)
    assert any("z = 4" in lab for lab in labels)
    # median + two interval + truth vlines drew
    assert len(ax.lines) >= 4
    matplotlib.pyplot.close("all")
