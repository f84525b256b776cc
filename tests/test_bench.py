"""bench.py orchestration: the driver-facing JSON artifact must be
machine-unambiguous about WHICH backend produced the number (round-2
verdict: a CPU fallback value was parseable as a TPU result). The
expensive measurement functions are stubbed -- these tests exercise the
probe/fallback/persistence logic, not throughput."""

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


@pytest.fixture
def stubbed(monkeypatch, tmp_path):
    """Stub every measurement; redirect the last-good file to tmp."""
    monkeypatch.setattr(bench, "bench_cpu", lambda *a, **k: 5000.0)
    monkeypatch.setattr(bench, "bench_xla_cpu", lambda *a, **k: 6.4e5)
    monkeypatch.setattr(bench, "_mock_data", lambda: (None, None))
    lg = str(tmp_path / "last_good.json")
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", lg)
    monkeypatch.setenv("BENCH_TPU_WAIT_S", "0")
    # Secondary block off unless a test opts back in (it would spawn a
    # real measurement subprocess).
    monkeypatch.setenv("BENCH_SECONDARY", "0")
    return lg


def _run_main(capsys):
    rc = bench.main()
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line)


def test_simulated_tunnel_down_emits_fallback(stubbed, monkeypatch,
                                              capsys):
    """Tunnel down for the whole window: backend is cpu-fallback, the
    note says so, and the persisted last-good TPU number rides along."""
    with open(stubbed, "w") as fh:
        json.dump({"value": 2.2e8,
                   "measured_at": "2026-08-20T00:00:00Z"}, fh)
    monkeypatch.setenv("BENCH_SIMULATE_TPU_DOWN", "1")
    out = _run_main(capsys)
    assert out["backend"] == "cpu-fallback"
    assert out["value"] == pytest.approx(6.4e5)
    assert out["vs_baseline"] == pytest.approx(128.0)
    assert "NOT a TPU measurement" in out["note"]
    assert out["last_good_tpu"]["value"] == pytest.approx(2.2e8)
    assert out["last_good_tpu"]["measured_at"] == "2026-08-20T00:00:00Z"


def test_fallback_without_history_omits_last_good(stubbed, monkeypatch,
                                                  capsys):
    monkeypatch.setenv("BENCH_SIMULATE_TPU_DOWN", "1")
    out = _run_main(capsys)
    assert out["backend"] == "cpu-fallback"
    assert "last_good_tpu" not in out


def test_healthy_tpu_emits_tpu_and_persists(stubbed, monkeypatch,
                                            capsys):
    """Probe passes, measurement succeeds: backend=tpu, value is the TPU
    rate, and the last-good file is refreshed for future fallbacks."""
    monkeypatch.delenv("BENCH_SIMULATE_TPU_DOWN", raising=False)
    monkeypatch.setattr(bench, "_tpu_responsive", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_bench_tpu_subprocess",
                        lambda *a, **k: 2.2e8)
    out = _run_main(capsys)
    assert out["backend"] == "tpu"
    assert out["value"] == pytest.approx(2.2e8)
    assert out["vs_baseline"] == pytest.approx(44000.0)
    assert "note" not in out
    with open(stubbed) as fh:
        persisted = json.load(fh)
    assert persisted["value"] == pytest.approx(2.2e8)
    assert persisted["measured_at"].endswith("Z")


SECONDARY_STUB = {
    "multisource": {"value": 1.15e9, "unit": "aggregate walker-steps/s",
                    "geometry": "256 sources x 250 walkers", "backend":
                    "tpu", "bench_s": 11.3},
    "pt_tier": {"value": 3.1e7, "unit": "tempered walker-steps/s",
                "geometry": "8 rungs x 64 walkers", "backend": "tpu",
                "bench_s": 30.2},
    "warm_fit": {"value": 1.7, "unit": "s", "geometry": "complete warm "
                 "fit", "backend": "tpu", "bench_s": 17.3},
}


def _healthy_tpu(monkeypatch):
    monkeypatch.delenv("BENCH_SIMULATE_TPU_DOWN", raising=False)
    monkeypatch.setattr(bench, "_tpu_responsive", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_bench_tpu_subprocess",
                        lambda *a, **k: 2.2e8)


def test_secondary_block_schema(stubbed, monkeypatch, capsys):
    """Healthy TPU: the secondary block rides along and every non-error
    entry carries the full provenance schema (value/unit/geometry/
    backend/bench_s) -- the machine-readable replacement for DESIGN
    section-6 prose (VERDICT r03 task 2)."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "1")
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: SECONDARY_STUB)
    out = _run_main(capsys)
    assert out["backend"] == "tpu"
    sec = out["secondary"]
    assert set(sec) == set(SECONDARY_STUB)
    for name, entry in sec.items():
        assert set(entry) == {"value", "unit", "geometry", "backend",
                              "bench_s"}, name
        assert entry["backend"] == "tpu"
        assert isinstance(entry["value"], (int, float))


def test_secondary_failure_keeps_headline(stubbed, monkeypatch, capsys):
    """Secondary subprocess timeout/crash: headline unaffected, no
    secondary key, and the note says what happened."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "1")
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: None)
    out = _run_main(capsys)
    assert out["backend"] == "tpu"
    assert out["value"] == pytest.approx(2.2e8)
    assert "secondary" not in out
    assert "secondary" in out["note"]


def test_secondary_opt_out(stubbed, monkeypatch, capsys):
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "0")
    monkeypatch.setattr(
        bench, "_bench_secondary_subprocess",
        lambda timeout: pytest.fail("secondary ran despite opt-out"))
    out = _run_main(capsys)
    assert out["backend"] == "tpu"
    assert "secondary" not in out


def test_fallback_has_no_secondary(stubbed, monkeypatch, capsys):
    """CPU fallback: the Pallas-only secondary workloads cannot run, so
    the block must be absent rather than carrying CPU numbers."""
    monkeypatch.setenv("BENCH_SIMULATE_TPU_DOWN", "1")
    monkeypatch.setattr(
        bench, "_bench_secondary_subprocess",
        lambda timeout: pytest.fail("secondary ran on cpu-fallback"))
    out = _run_main(capsys)
    assert out["backend"] == "cpu-fallback"
    assert "secondary" not in out


def test_regression_gate_flags_and_preserves_last_good(stubbed,
                                                       monkeypatch,
                                                       capsys):
    """Headline at half the last-good rate: the artifact self-reports the
    regression machine-readably, the note names it, and the last-good
    waterline is NOT overwritten (VERDICT r04 task 3)."""
    _healthy_tpu(monkeypatch)
    with open(stubbed, "w") as fh:
        json.dump({"value": 4.4e8,
                   "measured_at": "2026-08-20T00:00:00Z"}, fh)
    out = _run_main(capsys)
    assert out["backend"] == "tpu"
    reg = out["regression"]
    assert set(reg) == {"headline"}
    assert reg["headline"]["value"] == pytest.approx(2.2e8)
    assert reg["headline"]["last_good"] == pytest.approx(4.4e8)
    assert reg["headline"]["ratio"] == pytest.approx(0.5)
    assert "regression threshold" in out["note"]
    with open(stubbed) as fh:
        assert json.load(fh)["value"] == pytest.approx(4.4e8)


def test_regression_gate_covers_secondary_and_wall_times(stubbed,
                                                         monkeypatch,
                                                         capsys):
    """Secondary entries are gated too, with wall times (warm_fit)
    compared in the lower-is-better direction against their LOOSER
    per-entry threshold (tunnel wall-times legitimately vary 2-6x)."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "1")
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: SECONDARY_STUB)
    with open(stubbed, "w") as fh:
        json.dump({"value": 2.2e8, "measured_at": "2026-08-20T00:00:00Z",
                   "secondary": {"multisource": 3.0e9,   # now 1.15e9
                                 "pt_tier": 3.1e7,       # unchanged
                                 "warm_fit": 0.3}}, fh)  # now 1.7 s
    out = _run_main(capsys)
    reg = out["regression"]
    assert set(reg) == {"multisource", "warm_fit"}
    assert reg["multisource"]["ratio"] == pytest.approx(1.15e9 / 3.0e9,
                                                        rel=1e-3)
    assert reg["warm_fit"]["ratio"] == pytest.approx(0.3 / 1.7, abs=5e-4)


def test_wall_time_noise_band_not_flagged(stubbed, monkeypatch, capsys):
    """A 1.7 s warm fit against a 1.0 s waterline is tunnel noise, not a
    regression -- the per-entry 0.25x threshold must not fire (the
    default 0.7x would have)."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "1")
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: SECONDARY_STUB)
    with open(stubbed, "w") as fh:
        json.dump({"value": 2.2e8, "measured_at": "2026-08-20T00:00:00Z",
                   "secondary": {"warm_fit": 1.0}}, fh)  # now 1.7 s
    out = _run_main(capsys)
    assert "regression" not in out


def test_clean_run_persists_secondary_waterline(stubbed, monkeypatch,
                                                capsys):
    """A non-regressed run refreshes the last-good file INCLUDING the
    secondary rates, so the next run gates against them."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "1")
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: SECONDARY_STUB)
    out = _run_main(capsys)
    assert "regression" not in out
    with open(stubbed) as fh:
        persisted = json.load(fh)
    assert persisted["secondary"]["multisource"] == pytest.approx(1.15e9)
    assert persisted["secondary"]["warm_fit"] == pytest.approx(1.7)


def test_accept_regression_env_updates_waterline(stubbed, monkeypatch,
                                                 capsys):
    """BENCH_ACCEPT_REGRESSION=1 (an intentional perf tradeoff): still
    reported, but the waterline moves."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_ACCEPT_REGRESSION", "1")
    with open(stubbed, "w") as fh:
        json.dump({"value": 4.4e8,
                   "measured_at": "2026-08-20T00:00:00Z"}, fh)
    out = _run_main(capsys)
    assert "regression" in out
    with open(stubbed) as fh:
        assert json.load(fh)["value"] == pytest.approx(2.2e8)


def test_secondary_outage_does_not_erase_waterline(stubbed, monkeypatch,
                                                   capsys):
    """A run whose secondary subprocess times out passes the headline
    gate but must CARRY FORWARD the previous secondary waterline --
    otherwise the next real slowdown in e.g. pt_tier would ship against
    an empty baseline."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_SECONDARY", "1")
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: None)
    with open(stubbed, "w") as fh:
        json.dump({"value": 2.2e8, "measured_at": "2026-08-20T00:00:00Z",
                   "secondary": {"multisource": 1.15e9,
                                 "pt_tier": 3.1e7,
                                 "warm_fit": 1.7}}, fh)
    out = _run_main(capsys)
    assert "regression" not in out
    with open(stubbed) as fh:
        persisted = json.load(fh)
    assert persisted["secondary"] == {"multisource": 1.15e9,
                                      "pt_tier": 3.1e7, "warm_fit": 1.7}
    # A fresh measurement for an entry still wins over the carried one.
    monkeypatch.setattr(bench, "_bench_secondary_subprocess",
                        lambda timeout: {
                            "pt_tier": dict(SECONDARY_STUB["pt_tier"],
                                            value=3.5e7)})
    _run_main(capsys)
    with open(stubbed) as fh:
        persisted = json.load(fh)
    assert persisted["secondary"]["pt_tier"] == pytest.approx(3.5e7)
    assert persisted["secondary"]["multisource"] == pytest.approx(1.15e9)


def test_accept_regression_note_says_updated(stubbed, monkeypatch,
                                             capsys):
    """The artifact's provenance note must match what actually happened
    to the waterline under BENCH_ACCEPT_REGRESSION=1."""
    _healthy_tpu(monkeypatch)
    monkeypatch.setenv("BENCH_ACCEPT_REGRESSION", "1")
    with open(stubbed, "w") as fh:
        json.dump({"value": 4.4e8,
                   "measured_at": "2026-08-20T00:00:00Z"}, fh)
    out = _run_main(capsys)
    assert "updated anyway" in out["note"]
    assert "NOT updated" not in out["note"]


def test_regression_ratio_env_tunable(monkeypatch):
    monkeypatch.setenv("BENCH_REGRESSION_RATIO", "0.95")
    reg = bench.check_regression(2.0e8, None, {"value": 2.2e8})
    assert "headline" in reg
    monkeypatch.setenv("BENCH_REGRESSION_RATIO", "0.7")
    assert bench.check_regression(2.0e8, None, {"value": 2.2e8}) == {}


def test_wedge_midbench_falls_back_then_recovers(stubbed, monkeypatch,
                                                 capsys):
    """First measurement attempt wedges (probe ok, subprocess None);
    the loop measures the fallback, re-probes, and a late-returning
    tunnel still yields a real TPU number -- whichever is best last."""
    monkeypatch.delenv("BENCH_SIMULATE_TPU_DOWN", raising=False)
    monkeypatch.setenv("BENCH_TPU_WAIT_S", "120")
    monkeypatch.setattr(bench, "_tpu_responsive", lambda *a, **k: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    attempts = []

    def tpu_bench(timeout):
        attempts.append(timeout)
        return None if len(attempts) == 1 else 2.1e8

    monkeypatch.setattr(bench, "_bench_tpu_subprocess", tpu_bench)
    out = _run_main(capsys)
    assert out["backend"] == "tpu"
    assert out["value"] == pytest.approx(2.1e8)
    assert len(attempts) == 2
    assert "wedge" in out.get("note", "")
