"""Recorded-oracle machinery of the hardware-parity validator (round 5).

The TPU lanes exercise these paths end-to-end on hardware; these tests
pin the host-side semantics cheaply on CPU: fingerprint stability and
sensitivity, recorded_entry's ok/stale/missing triage (a stale entry
must FAIL loudly, never silently recompute or compare), the
calibration-covariance recipe (PSD, deterministic), and the sentinel
bound arithmetic.
"""

import copy
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools import validate_tpu_parity as vp


def test_fingerprint_stable_and_sensitive():
    a = vp.config_fingerprint(1)
    assert a == vp.config_fingerprint(1)
    assert a != vp.config_fingerprint(0)
    assert a != vp.config_fingerprint(6)
    # extras split the key (the derived entry uses them)
    assert vp.config_fingerprint(2) != vp.config_fingerprint(
        2, extra={"derived_z": 2.0})
    # back-compat alias used by the sentinel test
    assert vp.sentinel_fingerprint(1) == a


def test_mock_data_cov_recipe_psd_and_deterministic():
    flux1, unc1, cov1 = vp.mock_data(vp.CONFIGS[5])
    flux2, unc2, cov2 = vp.mock_data(vp.CONFIGS[5])
    np.testing.assert_array_equal(flux1, flux2)
    np.testing.assert_array_equal(cov1, cov2)
    assert np.linalg.eigvalsh(cov1).min() > 0
    # diagonal configs carry no covariance
    assert vp.mock_data(vp.CONFIGS[1])[2] is None


def test_mock_data_uplim_band_is_deterministic_limit():
    cfg = vp.CONFIGS[6]
    flux, unc, cov = vp.mock_data(cfg)
    from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle
    f_true = ModifiedBlackbodyOracle(
        *vp.TRUE, opthin=cfg["opthin"], noalpha=cfg["noalpha"])(vp.WAVE)
    ub = cfg["uplim_band"]
    assert flux[ub] == pytest.approx(vp.UPLIM_FACTOR * f_true[ub])


def test_oracle_lnprob_clamps_before_whitening():
    """The uplim band's positive residual must be penalized through the
    FULL whitening (clamp-then-whiten, as likelihood.build_lnprob), and
    negative residuals at the limit band must contribute nothing
    directly."""
    cfg = vp.CONFIGS[6]
    flux, unc, cov = vp.mock_data(cfg)
    geom = vp.FAST
    # Build the lnprob closure exactly as oracle_chain does.
    from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle
    free = vp.free_indices(cfg)
    whiten = np.linalg.inv(np.linalg.cholesky(cov))
    ub = cfg["uplim_band"]

    def lnprob_manual(theta_free, clamp):
        theta = vp.TRUE.copy()
        theta[free] = theta_free
        m = ModifiedBlackbodyOracle(*theta, opthin=cfg["opthin"],
                                    noalpha=cfg["noalpha"])
        delta = m(vp.WAVE) - flux
        if clamp:
            delta = delta.copy()
            delta[ub] = max(delta[ub], 0.0)
        r = whiten @ delta
        val = -0.5 * float(r @ r)
        for (pi, mean, sig) in cfg["priors"]:
            if pi in free:
                val += -0.5 * ((theta[pi] - mean) / sig) ** 2
        return val

    # the oracle path executes without error at a tiny geometry
    vp.oracle_chain(cfg, flux, unc, seed=3,
                    geom=vp.Geometry(nw_ora=16, nburn_ora=5, nstep_ora=5),
                    cov=cov)
    # Dropping the negative-direction residual at the limit band can
    # only RAISE lnL (the one-sided likelihood is never harsher than
    # the two-sided one); at truth the model sits below the 1.3x limit
    # so the clamp genuinely fires.
    theta0 = vp.TRUE[free]
    fired = False
    for scale in (1.0, 0.98, 1.02):
        tf = theta0 * scale
        assert lnprob_manual(tf, True) >= lnprob_manual(tf, False) - 1e-9
        fired |= lnprob_manual(tf, True) > lnprob_manual(tf, False) + 1e-9
    assert fired, "clamp never fired -- the limit band is inert"


def _fake_recorded(tmp_path):
    data = {"version": 1, "configs": {}, "derived": None}
    for ci in (0, 1):
        data["configs"][str(ci)] = {
            "config": ci, "label": vp.CONFIGS[ci]["label"],
            "fingerprint": vp.config_fingerprint(ci),
            "param_names": ["T"], "free_indices": [0],
            "medians": [32.0], "widths": [2.0],
            "se_medians": [0.01], "se_widths": [0.02],
        }
    path = str(tmp_path / "oracle.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path, data


def test_recorded_entry_triage(tmp_path):
    path, data = _fake_recorded(tmp_path)
    loaded = vp.load_recorded_oracle(path)
    status, entry = vp.recorded_entry(0, data=loaded)
    assert status == "ok" and entry["medians"] == [32.0]
    # missing entry
    status, entry = vp.recorded_entry(3, data=loaded)
    assert status == "missing" and entry is None
    # missing file -> load gives None (data=None then falls back to the
    # repo's own recorded file by design, so triage the no-entry case
    # through an explicit empty dataset)
    assert vp.load_recorded_oracle(str(tmp_path / "nope.json")) is None
    assert vp.recorded_entry(0, data={"configs": {}})[0] == "missing"
    # stale fingerprint must be reported, not silently accepted
    stale = copy.deepcopy(loaded)
    stale["configs"]["0"]["fingerprint"] = "deadbeefdeadbeef"
    status, entry = vp.recorded_entry(0, data=stale)
    assert status == "stale" and entry is not None
    assert "regenerate" in vp.STALE_MSG or "--gen-oracle" in vp.STALE_MSG


def test_gen_oracle_config4_regenerates_derived(tmp_path, monkeypatch):
    """--gen-oracle --configs 4 must regenerate the derived entry (the
    validation lane maps {2,4} to the derived run), not silently no-op."""
    calls = {"entry": [], "derived": 0}
    monkeypatch.setattr(vp, "_oracle_entry", lambda ci, geom: (
        calls["entry"].append(ci) or {
            "config": ci, "label": f"c{ci}", "fingerprint": "fp",
            "wall_s": 0.0}))

    def fake_derived(geom):
        calls["derived"] += 1
        return {"T": [1.0, 2.0, 3.0]}, 10

    monkeypatch.setattr(vp, "derived_oracle", fake_derived)
    path = str(tmp_path / "oracle.json")
    vp.gen_oracle(configs=[4], path=path)
    assert calls["derived"] == 1
    assert calls["entry"] == []        # no two-sided entry for 4
    with open(path) as f:
        assert json.load(f)["derived"]["n"] == 10
    # naming only a two-sided config must NOT touch derived
    calls["derived"] = 0
    vp.gen_oracle(configs=[1], path=path)
    assert calls["derived"] == 0 and calls["entry"] == [1]


def test_main_recorded_missing_falls_back(monkeypatch, capsys):
    """CLI --recorded with a MISSING entry computes the oracle (like the
    pytest lane); only a STALE fingerprint hard-fails."""
    seen = {}

    def fake_run_config(ci, geom, recorded=None):
        seen["recorded"] = recorded
        return [], True

    monkeypatch.setattr(vp, "run_config", fake_run_config)
    monkeypatch.setattr(vp, "recorded_entry",
                        lambda ci, data=None: ("missing", None))
    rc = vp.main(["--recorded", "--configs", "0"])
    assert rc == 0
    assert seen["recorded"] is None
    assert "no recorded oracle entry" in capsys.readouterr().out

    monkeypatch.setattr(vp, "recorded_entry",
                        lambda ci, data=None: ("stale", {"x": 1}))
    rc = vp.main(["--recorded", "--configs", "0"])
    assert rc == 1
    assert "STALE" in capsys.readouterr().out


def test_check_sentinel_bounds():
    ref = {"param_names": ["T"], "medians": [32.0], "widths": [2.0],
           "se_medians": [0.01], "se_widths": [0.02]}
    good = {"medians": [32.05], "widths": [2.02],
            "se_medians": [0.02], "se_widths": [0.03]}
    ok, lines = vp.check_sentinel(good, ref)
    assert ok and "PASS" in lines[0]
    drifted = {"medians": [34.0], "widths": [2.02],   # 6.2% median shift
               "se_medians": [0.02], "se_widths": [0.03]}
    ok, lines = vp.check_sentinel(drifted, ref)
    assert not ok and "FAIL" in lines[0]
    too_wide = {"medians": [32.0], "widths": [2.5],   # 25% width shift
                "se_medians": [0.02], "se_widths": [0.03]}
    ok, _ = vp.check_sentinel(too_wide, ref)
    assert not ok


def test_repo_recorded_oracle_is_fresh():
    """The checked-in hwparity oracle must match the CURRENT recipe --
    a drift here means someone changed tests/reference_impl or the
    mock-data constants without regenerating (--gen-oracle)."""
    data = vp.load_recorded_oracle()
    assert data is not None, "tests/data/hwparity_oracle.json missing"
    for ci in vp.ORACLE_CONFIGS:
        status, _ = vp.recorded_entry(ci, data=data)
        assert status == "ok", f"config{ci}: {status} -- {vp.STALE_MSG}"
    status, _ = vp.recorded_entry("derived", data=data)
    assert status == "ok", f"derived: {status}"


def test_repo_sentinel_reference_is_fresh():
    with open(vp.SENTINEL_PATH) as f:
        ref = json.load(f)
    assert ref.get("version") == 2
    for ci in vp.SENTINEL_CONFIGS:
        entry = ref["configs"][str(ci)]
        assert entry["fingerprint"] == vp.config_fingerprint(ci)
