"""Opt-in pytest lane for the on-hardware <=1% posterior-parity contract.

This is `tools/validate_tpu_parity.py` as a test lane (VERDICT r03 task 1):
the same statistic table PARITY_r0N.md records, importable and runnable as

    MBB_HWPARITY=1 python -m pytest -m hwparity tests/test_hwparity.py -v

on a TPU host. The env var tells conftest.py to NOT force the CPU
platform, so the fused TPU sampler path is what gets validated. Off-TPU
or without the env var every test here skips -- the default lane's cheap
drift protection is tests/test_tpu_sentinel.py instead.

Oracle modes (VERDICT r04 task 2): by default each config compares
against the RECORDED fp64 oracle moments (tests/data/hwparity_oracle.json
-- the sentinel pattern generalized), so the lane runs only the JAX side
(~13 min instead of ~35): same statistics, same tolerances. A stale
fingerprint FAILS with a regeneration message (--gen-oracle); a missing
entry falls back to computing the oracle in-process. Set
MBB_HWPARITY_FULL=1 to force the full two-sided run.

Each config is its own test so a failure names the config, and a partial
run (e.g. ``-k config1``) is possible after a targeted change.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = [
    pytest.mark.hwparity,
    pytest.mark.skipif(
        not os.environ.get("MBB_HWPARITY"),
        reason="hardware-parity lane: set MBB_HWPARITY=1 and run on a "
               "TPU host (MBB_HWPARITY=1 pytest -m hwparity)"),
]


def _require_tpu():
    import jax
    platform = jax.devices()[0].platform
    if platform == "cpu":
        pytest.skip("no TPU visible -- the contract run needs the fused "
                    "TPU sampler path")


def _recorded(ci):
    """Recorded oracle entry for ci, None (-> compute in-process) when
    absent or when MBB_HWPARITY_FULL=1; FAIL on a stale fingerprint."""
    if os.environ.get("MBB_HWPARITY_FULL"):
        return None
    from tools.validate_tpu_parity import recorded_entry, STALE_MSG
    status, rec = recorded_entry(ci)
    if status == "stale":
        pytest.fail(STALE_MSG)
    return rec if status == "ok" else None


@pytest.mark.parametrize("ci", [0, 1, 2, 3, 5, 6])
def test_config_contract(ci):
    """Parity for one BASELINE config at the 1% contract (configs 5/6:
    calibration covariance and uplim-by-covariance, VERDICT r04 task 1)."""
    _require_tpu()
    from tools.validate_tpu_parity import FULL, run_config
    rows, ok = run_config(ci, FULL, recorded=_recorded(ci))
    print("\n".join(rows))      # PARITY_r0N.md table rows (run with -s)
    assert ok, "contract FAIL:\n" + "\n".join(rows)


def test_derived_contract():
    """Config 4: L_IR / dust-mass / peak-lambda posterior parity."""
    _require_tpu()
    from tools.validate_tpu_parity import FULL, run_derived
    rows, ok = run_derived(FULL, recorded=_recorded("derived"))
    print("\n".join(rows))
    assert ok, "contract FAIL:\n" + "\n".join(rows)
