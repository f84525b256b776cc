"""Smoke-run every example script so the documented workflows cannot rot.

Each example honors MBB_EXAMPLE_QUICK=1 (tiny walker/step/source counts)
so a full end-to-end run -- fit, derived quantities, HDF5 round-trip,
triage, evidence -- completes in seconds on the CPU backend.  The
examples are run as real subprocesses from a temp directory, exactly the
way a user would invoke them (``python examples/<name>.py``).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

FAST = ["fit_single_source.py"]
SLOW = [
    "fit_covariance_uplims.py",
    "fit_with_responses.py",
    "serve_batches.py",
    "serve_ragged_catalog.py",
    "serve_correlated_tempered.py",
    "model_comparison.py",
    "custom_model.py",
    "population_inference.py",
    "photoz_fit.py",
    "survey_forecast.py",
]


# The ambient TPU plugin ignores the JAX_PLATFORMS env var (see
# tests/conftest.py), so the child must force the CPU backend through
# jax.config BEFORE any backend initializes, then run the example
# exactly as `python examples/<name>.py` would (runpy, __main__).
_BOOTSTRAP = (
    "import jax, runpy, sys\n"
    "jax.config.update('jax_platforms', 'cpu')\n"
    "runpy.run_path(sys.argv[1], run_name='__main__')\n"
)


def _run(name, tmp_path):
    env = dict(os.environ)
    env["MBB_EXAMPLE_QUICK"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c", _BOOTSTRAP, os.path.join(EXAMPLES, name)],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, (
        f"{name} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}")
    return proc.stdout


@pytest.mark.parametrize("name", FAST)
def test_example_quick(name, tmp_path):
    out = _run(name, tmp_path)
    assert "round-trip T:" in out


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_example_slow_lane(name, tmp_path):
    _run(name, tmp_path)
