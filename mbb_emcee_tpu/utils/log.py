"""Package logging (SURVEY.md section 5, metrics/observability row).

The reference prints diagnostics in verbose mode; here the same messages
flow through the standard `logging` module under the "mbb_emcee_tpu"
logger so pipelines can route/filter them, while `enable_console()` keeps
the reference-like behavior of plain lines on stdout for the CLI and for
`verbose=True` library calls.
"""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger("mbb_emcee_tpu")


class _DynamicStdoutHandler(logging.StreamHandler):
    """StreamHandler that always writes to the CURRENT sys.stdout (so
    stdout redirection/capture after handler creation still works)."""

    def __init__(self):
        super().__init__(sys.stdout)

    @property
    def stream(self):
        return sys.stdout

    @stream.setter
    def stream(self, value):   # base __init__ assigns; ignore
        pass


_console: _DynamicStdoutHandler | None = None
# Levels set by enable_console itself (vs by the user through the logging
# API directly): enable_console may freely adjust a level it owns, so a
# quiet CLI call (WARNING) followed by run(verbose=True) in the same
# process correctly lowers back to INFO -- but never fights an explicit
# user configuration.
_level_set_here: int | None = None


def enable_console(level=logging.INFO):
    """Idempotently attach a plain-format stdout handler. Returns the
    package logger. Propagation to the root logger is disabled while our
    handler is attached (otherwise applications with configured root
    logging would see every line twice), and an explicitly user-set
    package level is respected (only levels this function itself set are
    ever overridden)."""
    global _console, _level_set_here
    if _console is None:
        _console = _DynamicStdoutHandler()
        _console.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(_console)
        logger.propagate = False
    if logger.level == logging.NOTSET or logger.level == _level_set_here:
        logger.setLevel(level)
        _level_set_here = level
    return logger
