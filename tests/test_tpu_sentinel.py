"""Default-lane TPU drift sentinel (VERDICT r03 task 1).

The full hardware-parity contract run is ~45 min and opt-in
(tests/test_hwparity.py); this is the cheap always-on guard: a fresh
subprocess (so the ambient TPU platform is visible even though the test
process is CPU-forced by conftest) runs TWO short fused-sampler fits of
the sentinel config (config1 thick4 -- it exercises the analytic-bracket
merge solve) and compares the posterior medians / 68% CI widths against
RECORDED fp64 oracle moments (tests/data/sentinel_reference.json).

Bounds are drift bounds, not the 1% contract: wide enough for short-chain
MC noise, tight enough that a broken merge solve, accept rule, or
whitening change (>>5% posterior shifts) cannot pass. A sampler-touching
commit therefore cannot pass the default TPU lane with drifted
posteriors.

Auto-skips when no TPU is visible (tunnel down / plain CPU box). The
recorded moments carry a fingerprint over tests/reference_impl and the
mock-data recipe; on mismatch the test FAILS with a regeneration message
(python tools/validate_tpu_parity.py --gen-sentinel) rather than
comparing against stale numbers.
"""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_PATH = os.path.join(REPO, "tests", "data", "sentinel_reference.json")


def _clean_env():
    """Subprocess env with the conftest CPU forcing undone."""
    env = os.environ.copy()
    env.pop("JAX_PLATFORMS", None)
    env.pop("MBB_RUNSLOW", None)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   flags).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_tpu_drift_sentinel():
    if not os.path.exists(REF_PATH):
        pytest.fail(
            f"{REF_PATH} missing -- generate the recorded oracle moments "
            "with: python tools/validate_tpu_parity.py --gen-sentinel")
    with open(REF_PATH) as f:
        ref = json.load(f)
    assert ref.get("version") == 2 and "configs" in ref, (
        "sentinel_reference.json is the pre-round-5 single-config format "
        "-- regenerate with: python tools/validate_tpu_parity.py "
        "--gen-sentinel")

    try:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "validate_tpu_parity.py"),
             "--sentinel"],
            capture_output=True, text=True, env=_clean_env(), cwd=REPO,
            timeout=900)
    except subprocess.TimeoutExpired:
        # A hung/slow tunnel is an environment problem, not a drift
        # verdict; the hwparity lane is the authoritative fallback.
        pytest.skip("sentinel subprocess exceeded 900s (TPU tunnel slow "
                    "or recompiling) -- run MBB_HWPARITY=1 pytest -m "
                    "hwparity for the full contract")
    assert proc.returncode == 0, (
        f"sentinel subprocess failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    line = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    tpu = json.loads(line)

    if tpu["platform"] == "cpu":
        pytest.skip("no TPU visible -- drift sentinel needs the hardware "
                    "path (run MBB_HWPARITY=1 pytest -m hwparity on a "
                    "TPU host for the full contract)")

    from tools.validate_tpu_parity import (
        SENTINEL_CONFIGS, check_sentinel, sentinel_fingerprint)
    failures = []
    for ci in SENTINEL_CONFIGS:
        ref_c = ref["configs"].get(str(ci))
        assert ref_c is not None, (
            f"sentinel_reference.json has no entry for config {ci} -- "
            "regenerate with: python tools/validate_tpu_parity.py "
            "--gen-sentinel")
        assert ref_c["fingerprint"] == sentinel_fingerprint(ci), (
            "recorded oracle moments are STALE (tests/reference_impl or "
            "the mock-data recipe changed since they were generated) -- "
            "regenerate with: python tools/validate_tpu_parity.py "
            "--gen-sentinel")
        tpu_c = tpu["configs"][str(ci)]
        assert tpu_c["fingerprint"] == ref_c["fingerprint"]

        # On hardware the auto backend must have picked the fused
        # kernels; a silent fall-off to the XLA tier is itself a
        # regression (config 6 additionally guards the fused
        # uplim-by-covariance path enabled in round 4).
        assert all(s == "FusedPallasSampler"
                   for s in tpu_c["sampler_types"]), (
            f"fused TPU path not selected on {tpu['platform']} for "
            f"config {ci}: {tpu_c['sampler_types']}")

        ok, lines = check_sentinel(tpu_c, ref_c)
        if not ok:
            failures.append(f"config {ci}:\n" + "\n".join(lines))
    assert not failures, (
        "TPU posterior drift vs recorded fp64 oracle moments:\n"
        + "\n\n".join(failures))
