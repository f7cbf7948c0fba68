"""Connector seam: credential refresh, bounded retries, and the remote
source driving the scheduler unchanged. The reference has neither retries
nor token-refresh (its own TODO, reference __init__.py:19); these tests pin
the engine's fix."""

from __future__ import annotations

import pytest

from flusher_spark.control.model import Job
from flusher_spark.control.scheduler import Scheduler
from flusher_spark.control.store import JobStore
from flusher_spark.sinks.table import Warehouse
from flusher_spark.sources.connector import (
    AuthExpiredError,
    CredentialProvider,
    DictTransport,
    PermanentError,
    RemoteSheetSource,
    RetryPolicy,
    Token,
    TransientError,
    with_retries,
)
from flusher_spark.sources.sheet import SheetGrid

GRID = SheetGrid("s1", [["a", "b"], ["1", "x"], ["2", "y"]])


def _provider(clock, ttl=100.0):
    fetches = []

    def fetch():
        fetches.append(clock.now)
        return Token(f"tok{len(fetches)}", clock.now + ttl)

    class Clock:
        pass

    return CredentialProvider(fetch, refresh_skew_s=10.0, clock=lambda: clock.now), fetches


class FakeClock:
    def __init__(self):
        self.now = 1000.0


def test_token_cached_until_near_expiry():
    clock = FakeClock()
    prov, fetches = _provider(clock, ttl=100.0)
    assert prov.token() == "tok1"
    clock.now += 50
    assert prov.token() == "tok1"  # still fresh: one fetch total
    assert len(fetches) == 1
    clock.now += 41  # inside the 10 s refresh skew of the 100 s ttl
    assert prov.token() == "tok2"  # refreshed before expiry
    assert len(fetches) == 2


def test_invalidate_forces_reauth():
    clock = FakeClock()
    prov, fetches = _provider(clock)
    assert prov.token() == "tok1"
    prov.invalidate()
    assert prov.token() == "tok2"


def test_with_retries_backs_off_then_succeeds():
    calls, sleeps = [], []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise TransientError("rate limited")
        return "ok"

    policy = RetryPolicy(max_attempts=4, base_delay_s=0.5, multiplier=2.0)
    assert with_retries(fn, policy, sleep=sleeps.append) == "ok"
    assert len(calls) == 3
    assert sleeps == [0.5, 1.0]  # deterministic exponential backoff


def test_with_retries_exhausts_and_raises():
    sleeps = []

    def fn():
        raise TransientError("still down")

    with pytest.raises(TransientError):
        with_retries(fn, RetryPolicy(max_attempts=3), sleep=sleeps.append)
    assert len(sleeps) == 2  # max_attempts - 1 backoffs


def test_permanent_error_not_retried():
    calls = []

    def fn():
        calls.append(1)
        raise PermanentError("forbidden")

    with pytest.raises(PermanentError):
        with_retries(fn, RetryPolicy(max_attempts=5), sleep=lambda s: None)
    assert len(calls) == 1


def test_plain_transient_keeps_cached_token():
    """A 429/5xx says nothing about the credential: the cached token must
    survive the retry (no per-retry auth exchange)."""
    invalidations = []
    calls = []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise TransientError("429")
        return "ok"

    assert (
        with_retries(
            fn,
            RetryPolicy(max_attempts=4),
            sleep=lambda s: None,
            on_auth_error=lambda: invalidations.append(1),
        )
        == "ok"
    )
    assert invalidations == []


def test_auth_expired_invalidates_then_retries():
    calls = []

    def fn():
        calls.append(1)
        if len(calls) == 1:
            raise AuthExpiredError("401")
        return "ok"

    invalidations = []
    assert (
        with_retries(
            fn,
            RetryPolicy(max_attempts=3),
            sleep=lambda s: None,
            on_auth_error=lambda: invalidations.append(1),
        )
        == "ok"
    )
    assert invalidations == [1]


def test_remote_source_reauths_only_on_auth_expiry():
    """End-to-end through RemoteSheetSource: a 401-then-healthy endpoint
    triggers exactly one re-auth; the retried call presents the NEW token."""
    clock = FakeClock()
    prov, fetches = _provider(clock)
    transport = DictTransport({"doc": {"s1": GRID}}, {"doc/s1": [AuthExpiredError("401")]})
    src = RemoteSheetSource(
        transport, prov, RetryPolicy(max_attempts=3, base_delay_s=0.01), sleep=lambda s: None
    )
    assert src.worksheet("doc", "s1").rows == GRID.rows
    assert len(fetches) == 2  # initial fetch + the forced re-auth, nothing more
    tokens = [c[2] for c in transport.calls if c[0] == "fetch"]
    assert tokens == ["tok1", "tok2"]


def test_token_refresh_is_thread_safe():
    """Scheduler(max_concurrency>1) hits token() from worker threads; an
    expired cache must refresh exactly once, not once per racer."""
    import threading

    clock = FakeClock()
    started = threading.Barrier(8)
    fetches = []

    def fetch():
        fetches.append(1)
        return Token("tok", clock.now + 100.0)

    prov = CredentialProvider(fetch, refresh_skew_s=10.0, clock=lambda: clock.now)
    results = []

    def grab():
        started.wait()
        results.append(prov.token())

    threads = [threading.Thread(target=grab) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == ["tok"] * 8
    assert len(fetches) == 1


def _remote(docs, fail_script=None):
    clock = FakeClock()
    prov, _ = _provider(clock)
    transport = DictTransport(docs, fail_script or {})
    src = RemoteSheetSource(
        transport, prov, RetryPolicy(max_attempts=4, base_delay_s=0.01), sleep=lambda s: None
    )
    return src, transport


def test_remote_source_retries_flaky_fetch():
    src, transport = _remote(
        {"doc": {"s1": GRID}},
        {"doc/s1": [TransientError("503"), TransientError("reset")]},
    )
    grid = src.worksheet("doc", "s1")
    assert grid.rows == GRID.rows
    assert len([c for c in transport.calls if c[0] == "fetch"]) == 3


def test_remote_source_translates_permanent_to_keyerror():
    src, _ = _remote({"doc": {"s1": GRID}})
    with pytest.raises(KeyError, match="worksheet not found"):
        src.worksheet("doc", "nope")
    with pytest.raises(KeyError, match="document not found"):
        src.worksheet("missing", "s1")
    assert src.available_sheets("doc") == ["s1"]


def test_scheduler_runs_jobs_through_remote_source(spark, tmp_path):
    """End-to-end: the scheduler executes a job against a flaky remote
    backend (two transient faults, then healthy) and the state machine
    records a plain Success — retries are invisible above the seam."""
    NOW = "2024-06-01T12:00:00"
    store = JobStore(spark, str(tmp_path / "ctrl"))
    src, transport = _remote(
        {"doc": {"s1": GRID}},
        {"doc/s1": [TransientError("503"), TransientError("429")]},
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sched = Scheduler(spark, store, src, wh, str(tmp_path / "exports"), clock=lambda: NOW)
    store.put(Job(1, "doc", "s1", target_system="warehouse", destination="t1",
                  refresh_now=True))
    results = sched.tick(NOW)
    assert results == [(1, "Success", "g_sheets.t1")]
    assert wh.read("t1").count() == 2
    assert len([c for c in transport.calls if c[0] == "fetch"]) == 3


def test_scheduler_translates_remote_worksheet_error(spark, tmp_path):
    """Worksheet-not-found from the remote backend gets the same enriched
    message (candidate listing) as the local source path."""
    NOW = "2024-06-01T12:00:00"
    store = JobStore(spark, str(tmp_path / "ctrl"))
    src, _ = _remote({"doc": {"s1": GRID}})
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sched = Scheduler(spark, store, src, wh, str(tmp_path / "exports"), clock=lambda: NOW)
    store.put(Job(1, "doc", "missing_sheet", refresh_now=True))
    results = sched.tick(NOW)
    assert results[0][1] == "Failure"
    assert "s1" in store.get(1).last_result  # candidates listed


def test_remote_source_open_matches_sheetsource_contract():
    """r14 review: the module docstring promises the exact SheetSource
    interface (open/worksheet/available_sheets) but open() was missing —
    any consumer written against the documented drop-in contract hit
    AttributeError."""
    g2 = SheetGrid("s2", [["c"], ["9"]])
    src, _ = _remote({"doc": {"s1": GRID, "s2": g2}})
    got = src.open("doc")
    assert set(got) == {"s1", "s2"} and got["s1"].rows == GRID.rows


def test_remote_source_retries_flaky_list():
    """r14 review: list_worksheets now consults fail_script (key = bare
    document name), so available_sheets' retry path is testable with the
    double."""
    src, transport = _remote(
        {"doc": {"s1": GRID}}, {"doc": [TransientError("429")]}
    )
    assert src.available_sheets("doc") == ["s1"]
    assert [c[0] for c in transport.calls].count("list") == 2  # fail + retry
