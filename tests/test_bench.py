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
