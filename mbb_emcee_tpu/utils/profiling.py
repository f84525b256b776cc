"""Tracing / profiling hooks and step-rate timing.

The reference has no tracing or profiling subsystem (SURVEY.md section 5:
only wall-clock prints in verbose mode). The TPU rebuild exposes:

  * `trace(dir)` -- context manager around jax.profiler.trace; the captured
    trace opens in TensorBoard / Perfetto and shows the fused sampling
    kernels on the device timeline. Wired to the CLI as --profile-dir.
  * `StepTimer` -- wall-clock walker-steps/sec meter used by bench.py and
    the CLI verbose summary (the SURVEY.md section 6 north-star metric).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a JAX profiler trace into log_dir (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(str(log_dir)):
        yield


class StepTimer:
    """Walker-steps/sec meter.

    >>> t = StepTimer(nwalkers=250)
    >>> with t.phase("production", nsteps=1000):
    ...     run()               # doctest: +SKIP
    >>> t.report()              # doctest: +SKIP
    """

    def __init__(self, nwalkers: int):
        self.nwalkers = int(nwalkers)
        self.phases: list[tuple[str, int, float]] = []

    @contextlib.contextmanager
    def phase(self, name: str, nsteps: int):
        t0 = time.perf_counter()
        yield
        self.phases.append((name, int(nsteps), time.perf_counter() - t0))

    def rate(self, name: str | None = None):
        """walker-steps/sec for one phase (or all phases combined)."""
        rows = [p for p in self.phases if name is None or p[0] == name]
        steps = sum(n for _, n, _ in rows)
        secs = sum(s for _, _, s in rows)
        return self.nwalkers * steps / secs if secs > 0 else float("nan")

    def report(self):
        lines = []
        for name, nsteps, secs in self.phases:
            rate = self.nwalkers * nsteps / secs if secs > 0 else 0.0
            lines.append(f"  {name}: {nsteps} steps in {secs:.2f}s "
                         f"({rate:,.0f} walker-steps/s)")
        return "\n".join(lines)
