"""Observability utilities (utils/metrics.py)."""

import json

from hyptokenizer_tpu.utils import metrics as M


def test_metrics_writer_jsonl_and_summary(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    w = M.MetricsWriter(path)
    w.log({"step": 1, "loss": 2.5})
    w.log({"step": 2, "loss": 1.5})
    records = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in records] == [1, 2]
    assert all("time" in r for r in records)
    assert w.summary() == {"step": 2, "loss": 1.5}


def test_metrics_writer_memory_only():
    w = M.MetricsWriter(None)
    assert w.summary() == {}
    w.log({"a": 1})
    assert w.summary() == {"a": 1}
    assert len(w.history) == 1


def test_span_logs_duration():
    w = M.MetricsWriter(None)
    with M.span("work", w):
        pass
    assert "work_seconds" in w.history[-1]
    assert w.history[-1]["work_seconds"] >= 0
    # No-writer span is a no-op context.
    with M.span("unlogged"):
        pass


def test_nan_checks_toggle():
    import jax
    import jax.numpy as jnp
    import pytest

    M.enable_nan_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)).block_until_ready()
    finally:
        M.enable_nan_checks(False)
    # Off again: NaN passes through silently.
    assert bool(jnp.isnan(jnp.log(jnp.asarray(-1.0))))
