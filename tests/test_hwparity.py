"""Opt-in pytest lane for the on-hardware <=1% posterior-parity contract.

This is `tools/validate_tpu_parity.py` as a test lane (VERDICT r03 task 1):
the same 18-statistic comparison PARITY_r03.md records, importable and
runnable as

    MBB_HWPARITY=1 python -m pytest -m hwparity tests/test_hwparity.py -v

on a TPU host (~45 min wall; the fp64 oracle chains are the long pole).
The env var tells conftest.py to NOT force the CPU platform, so the fused
TPU sampler path is what gets validated. Off-TPU or without the env var
every test here skips -- the default lane's cheap drift protection is
tests/test_tpu_sentinel.py instead.

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


@pytest.mark.parametrize("ci", [0, 1, 2, 3])
def test_config_contract(ci):
    """Full two-sided parity for one BASELINE config at the 1% contract."""
    _require_tpu()
    from tools.validate_tpu_parity import FULL, run_config
    rows, ok = run_config(ci, FULL)
    assert ok, "contract FAIL:\n" + "\n".join(rows)


def test_derived_contract():
    """Config 4: L_IR / dust-mass / peak-lambda posterior parity."""
    _require_tpu()
    from tools.validate_tpu_parity import FULL, run_derived
    rows, ok = run_derived(FULL)
    assert ok, "contract FAIL:\n" + "\n".join(rows)
