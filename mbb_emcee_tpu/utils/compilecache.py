"""Persistent JAX compilation cache, enabled by default.

The fused Pallas sampler programs take minutes to compile on TPU (the
Mosaic pass dominates; XLA itself is ~1 s), while the cached executable
reloads in ~1 s. The reference has no compile step at all, so a cold-start
penalty of minutes per process would be a real regression for CLI users —
this module points JAX's persistent compilation cache at a per-user
directory so only the FIRST run of a given program shape ever pays it.

Respects user configuration:
  * if `jax_compilation_cache_dir` is already set (via jax.config or the
    JAX_COMPILATION_CACHE_DIR env var), nothing is touched;
  * MBB_EMCEE_TPU_COMPILE_CACHE overrides the default location;
  * MBB_EMCEE_TPU_NO_COMPILE_CACHE=1 disables entirely.

The min-compile-time threshold is lowered because the slow Mosaic pass is
NOT part of the XLA wall-clock JAX compares against its default 1 s
threshold — the executables that matter here report <1 s compiles and
would otherwise never be written.
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache(path: str | None = None) -> bool:
    """Idempotently enable the persistent compilation cache.

    Returns True if the cache is active (whether enabled here or already
    configured by the user), False if disabled or unavailable.
    """
    global _done
    # "=1 disables": "0"/"false"/"" must keep the cache ON (a wrapper
    # exporting VAR=0 means enabled, not disabled)
    if os.environ.get("MBB_EMCEE_TPU_NO_COMPILE_CACHE",
                      "").strip().lower() not in ("", "0", "false", "no"):
        return False
    if _done:
        return True
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:      # very old/new jax: don't fight it
        return False
    if current:
        _done = True            # user already configured a cache
        return True

    # Only auto-enable where it pays: TPU program compiles take minutes
    # here (the Mosaic pass), CPU compiles take seconds -- and XLA:CPU's
    # cached AOT results warn loudly about machine-feature mismatches.
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False

    cache_dir = (path
                 or os.environ.get("MBB_EMCEE_TPU_COMPILE_CACHE")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "mbb_emcee_tpu", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # Keep caller stack frames OUT of MLIR location metadata: the
        # Pallas kernel body is embedded in the XLA module as an opaque
        # serialized payload, so call-site locations inside it defeat the
        # cache key (the same fit launched from the CLI vs a script vs a
        # notebook cell would each recompile from scratch, minutes per
        # program here). Op locations still carry the defining source
        # line, just not the user-side call stack. This IS process-global
        # -- an embedding application that wants full stack locations in
        # its own traces can set MBB_EMCEE_TPU_KEEP_TRACEBACK_LOCS=1
        # (cache keys then depend on the call site, so each entry point
        # pays its own first compile).
        if not os.environ.get("MBB_EMCEE_TPU_KEEP_TRACEBACK_LOCS"):
            jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:
        return False
    _done = True
    return True
