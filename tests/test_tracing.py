"""Direct tests for utils/tracing.py (SURVEY.md §5 observability): event
accounting, counters, rates, the stage_timer context manager, the JSON
sink, and the nan_guard toggle. Previously only exercised implicitly by
the engine."""

import json

import jax
import jax.numpy as jnp
import pytest

from misinfo_tpu.utils.tracing import (MAX_EVENTS, RESERVOIR, Tracer,
                                       nan_guard, stage_timer)


def test_event_counters_and_rate():
    t = Tracer()
    t.event("analyze", 0.5, n_requests=8)
    t.event("analyze", 0.5, n_requests=8)
    assert t.counters["analyze_seconds"] == 1.0
    assert t.counters["analyze_count"] == 2
    assert t.counters["analyze_n_requests"] == 16
    assert t.rate("analyze") == 2.0
    s = t.summary()
    assert s["verdicts_per_sec"] == 16.0
    assert Tracer().rate("missing") == 0.0


def test_non_numeric_fields_logged_not_counted():
    t = Tracer()
    t.event("vault", 0.1, variant="full")
    assert t.events[0]["variant"] == "full"
    assert "vault_variant" not in t.counters


def test_sink_receives_json_lines():
    lines = []
    t = Tracer(sink=lines.append)
    t.event("stage", 0.25, batch=4)
    ev = json.loads(lines[0])
    assert ev["stage"] == "stage" and ev["batch"] == 4


def test_stage_timer_records_elapsed():
    t = Tracer()
    with stage_timer("work", tracer=t, batch=2):
        pass
    assert t.counters["work_count"] == 1
    assert t.counters["work_seconds"] >= 0.0
    assert t.events[0]["batch"] == 2


def test_latency_percentiles_nearest_rank():
    t = Tracer()
    for ms in range(1, 101):  # 1..100 ms, uniform
        t.event("analyze", ms / 1e3)
    q = t.quantiles("analyze")
    assert q["analyze_p50_ms"] == pytest.approx(50.0)
    assert q["analyze_p95_ms"] == pytest.approx(95.0)
    assert q["analyze_p99_ms"] == pytest.approx(99.0)
    s = t.summary()  # summary carries the same keys for /metrics
    assert s["analyze_p50_ms"] == q["analyze_p50_ms"]
    assert Tracer().quantiles("missing") == {}


def test_percentiles_track_rolling_window_and_memory_is_bounded():
    t = Tracer()
    # fill the reservoir with slow events, then displace them with fast
    # ones: percentiles must reflect only the recent window, while the
    # cumulative counters keep the exact totals
    for _ in range(RESERVOIR):
        t.event("analyze", 1.0)
    for _ in range(RESERVOIR):
        t.event("analyze", 0.001)
    assert t.quantiles("analyze")["analyze_p99_ms"] == pytest.approx(1.0)
    assert t.counters["analyze_seconds"] == pytest.approx(RESERVOIR * 1.001)
    # the event log is a rolling window too (no per-request growth in a
    # long-running server)
    assert len(t.events) == min(2 * RESERVOIR, MAX_EVENTS)
    assert t.events.maxlen == MAX_EVENTS


def test_concurrent_event_and_summary_do_not_race():
    # ADVICE r2: /metrics scrapes (summary/quantiles) run on the HTTP-server
    # thread while request threads mutate the deques via event(); without
    # the tracer lock this raised "deque mutated during iteration".
    import threading

    t = Tracer()
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            t.event("analyze", 0.001 * (i % 7 + 1), n_requests=1)
            i += 1

    def reader():
        try:
            while not stop.is_set():
                t.summary()
                t.quantiles("analyze")
        except RuntimeError as e:  # pragma: no cover - the race itself
            errors.append(e)

    threads = [threading.Thread(target=writer) for _ in range(2)] + [
        threading.Thread(target=reader) for _ in range(2)]
    for th in threads:
        th.start()
    import time
    time.sleep(0.5)
    stop.set()
    for th in threads:
        th.join()
    assert not errors
    assert t.summary()["analyze_count"] > 0


def test_nan_guard_raises_then_restores():
    before = jax.config.jax_debug_nans
    with nan_guard(True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            # a FRESH jit function: its executable is traced UNDER the
            # guard, so the nan check is baked in deterministically —
            # the bare eager `0/0` form intermittently failed to raise
            # late in the full suite (a mature-process dispatch-cache
            # state; never reproducible in isolation)
            jax.jit(lambda x: x / x)(jnp.zeros(()))
    assert jax.config.jax_debug_nans == before
    jax.jit(lambda x: x / x)(jnp.zeros(()))  # outside the guard: no raise
