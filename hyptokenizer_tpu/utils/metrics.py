"""Observability: structured metrics, profiling traces, NaN debugging.

SURVEY §5.1/5.2/5.5 — the reference has ad-hoc time.time() spans and tqdm
postfix dicts only. Here: a JSONL metrics writer (the source of
training_stats.json and the BASELINE metrics), a ``jax.profiler`` trace
context for device-time attribution, and a debug-NaN toggle standing in for
sanitizers (there is no shared-memory concurrency to race-detect in this
design; XLA owns the schedule).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


class MetricsWriter:
    """Append-only JSONL metrics stream + in-memory history."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history = []
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, metrics: Dict) -> None:
        record = {"time": time.time(), **metrics}
        self.history.append(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")

    def summary(self) -> Dict:
        if not self.history:
            return {}
        last = self.history[-1]
        return {k: v for k, v in last.items() if k != "time"}


@contextlib.contextmanager
def span(name: str, metrics: Optional[MetricsWriter] = None) -> Iterator[None]:
    """Host-side timing span; logs `<name>_seconds`."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        logger.debug("%s took %.3fs", name, dt)
        if metrics is not None:
            metrics.log({f"{name}_seconds": dt})


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """``jax.profiler`` trace (view in TensorBoard / xprof).

    Splits device time from host time — the reference's loop is host-bound and
    cannot even ask this question (SURVEY §5.1).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    """Global debug-NaN mode: any NaN produced under jit raises with a
    traceback to the producing op (moral equivalent of a sanitizer)."""
    jax.config.update("jax_debug_nans", enable)
