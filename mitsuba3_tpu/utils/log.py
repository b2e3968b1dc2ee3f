"""Logging / progress / profiling — counterpart of
``include/mitsuba/core/logger.h`` (Logger/Formatter/Appender),
``progress.cpp`` (ProgressReporter) and ``profiler.h`` (ScopedPhase).

Host-side by design: device work is traced+compiled, so the meaningful
phases are trace / compile / execute (the reference's record / codegen /
render split, integrator.cpp:361-388), surfaced by ``phase()`` scopes
that also emit ``jax.profiler`` trace annotations for the TPU profiler.
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager

TRACE, DEBUG, INFO, WARN, ERROR = 0, 10, 20, 30, 40
_LEVEL_NAMES = {TRACE: "TRACE", DEBUG: "DEBUG", INFO: "INFO",
                WARN: "WARN", ERROR: "ERROR"}

_state = {"level": WARN, "appenders": None}


def set_log_level(level: int):
    """mi.set_log_level analog (logger.h:61)."""
    _state["level"] = level


def log_level() -> int:
    return _state["level"]


def add_appender(fn):
    """Register an extra sink fn(level, line) (logger.h Appender)."""
    if _state["appenders"] is None:
        _state["appenders"] = []
    _state["appenders"].append(fn)


def _default_format(level, msg):
    t = time.strftime("%H:%M:%S")
    return f"{t} {_LEVEL_NAMES.get(level, level):5s} [mitsuba3_tpu] {msg}"


def log(level: int, msg: str):
    if level < _state["level"]:
        return
    line = _default_format(level, msg)
    print(line, file=sys.stderr if level >= WARN else sys.stdout)
    for fn in _state["appenders"] or ():
        fn(level, line)


def log_info(msg):
    log(INFO, msg)


def log_warn(msg):
    log(WARN, msg)


@contextmanager
def phase(name: str, level: int = DEBUG):
    """ScopedPhase (profiler.h:87): wall-time the scope, report at
    `level`, and annotate the jax profiler trace (the ITT/NVTX role)."""
    import jax
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    log(level, f"{name}: {(time.perf_counter() - t0) * 1e3:.1f} ms")


class ProgressReporter:
    """progress.cpp: throttled textual progress with ETA."""

    def __init__(self, label: str, total: int, stream=None,
                 min_interval: float = 0.25):
        self.label = label
        self.total = max(total, 1)
        self.start = time.perf_counter()
        self.last = 0.0
        self.stream = stream or sys.stdout
        self.min_interval = min_interval
        self.enabled = _state["level"] <= INFO

    def update(self, done: int):
        if not self.enabled:
            return
        now = time.perf_counter()
        if now - self.last < self.min_interval and done < self.total:
            return
        self.last = now
        frac = min(done / self.total, 1.0)
        elapsed = now - self.start
        eta = elapsed / max(frac, 1e-9) - elapsed
        bar = "=" * int(32 * frac) + " " * (32 - int(32 * frac))
        end = "\n" if done >= self.total else "\r"
        self.stream.write(f"{self.label} [{bar}] {frac * 100:5.1f}% "
                          f"(ETA {eta:5.1f}s){end}")
        self.stream.flush()
