"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the ambient environment points JAX at a tunneled TPU ('axon') and its
plugin ignores the JAX_PLATFORMS env var, so the platform is forced through
jax.config before any backend initializes."""

import os

# The hardware-parity lane (MBB_HWPARITY=1 pytest -m hwparity) must see the
# real TPU, so the CPU forcing below is skipped in that mode. Everything
# else runs on the virtual 8-device CPU mesh.
_HWPARITY = bool(os.environ.get("MBB_HWPARITY"))

if not _HWPARITY:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _HWPARITY:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the TEST process: the package deliberately
# leaves the cache off on CPU (XLA:CPU AOT results are machine-specific),
# but test runs always happen on this machine, and re-runs otherwise pay
# every CPU compile again -- a large fraction of suite wall-clock.
if not _HWPARITY:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "mbb_emcee_tpu", "jax-test-cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

# Environment resilience: this box intermittently loses disk blocks to
# I/O errors (EIO), and the stdlib codec module files are among the
# casualties. pytest's parametrize-ID escaping calls
# str.encode("unicode_escape"), whose codec lookup imports
# encodings.unicode_escape from disk -- if that file is unreadable the
# WHOLE suite fails at collection. The codec itself is implemented in C
# (_codecs); register it directly when the module import fails so
# collection never depends on those disk blocks.
try:
    import encodings.unicode_escape  # noqa: F401
except OSError:
    # Seed sys.modules so the stdlib encodings search function finds the
    # codec without touching the unreadable file (it __import__s
    # 'encodings.unicode_escape'; a pre-seeded entry short-circuits the
    # disk read). Only the encode/decode pair matters for .encode().
    import _codecs
    import codecs
    import sys
    import types

    _m = types.ModuleType("encodings.unicode_escape")

    def _getregentry():
        return codecs.CodecInfo(
            encode=_codecs.unicode_escape_encode,
            decode=_codecs.unicode_escape_decode,
            name="unicode-escape")

    _m.getregentry = _getregentry
    sys.modules["encodings.unicode_escape"] = _m

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the full (slow) lane: long parity chains and the "
             "large interpret-mode kernel equivalence cases")


# The SMOKE lane (`pytest -m smoke`, < ~2 min single-core): the fast,
# deterministic core for inner-loop work -- physics goldens, likelihood
# algebra, sampler statistics, instrument responses + color corrections,
# results/percentile math, artifact inspection, the compat surface, and
# the bench orchestration -- plus anything explicitly marked
# @pytest.mark.smoke (e.g. the one tiny end-to-end fit in test_fit_e2e).
# The default lane (~20 min on one core) adds the statistical fits,
# batch/serving surfaces and interpret-mode kernels; --runslow adds
# full-scale parity chains on top.
_SMOKE_MODULES = {
    "test_physics", "test_likelihood", "test_response", "test_sampler",
    "test_results", "test_compat", "test_instruments_colorcorr",
    "test_bench", "test_cli_inspect", "test_cmb",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-scale test kept out of the default lane "
                   "(run with --runslow)")
    config.addinivalue_line(
        "markers", "smoke: fast deterministic core lane "
                   "(pytest -m smoke, < ~2 min single-core)")
    config.addinivalue_line(
        "markers", "hwparity: on-hardware <=1% posterior-parity contract "
                   "(MBB_HWPARITY=1 pytest -m hwparity on a TPU host; "
                   "~45 min -- the fp64 oracle chains are the long pole)")
    if config.getoption("--runslow"):
        # Module-level knob: statistical tests scale their chain lengths
        # up (tolerances are MC-error-aware, so the default lane stays
        # valid at reduced scale).
        os.environ["MBB_RUNSLOW"] = "1"


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow lane (use --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
