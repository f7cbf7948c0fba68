"""Connector seam: credentials, retries, and transports for remote sources.

The reference's identity is HTTP sources/sinks with auth: a service-account
Sheets client created at import (reference flusher/__init__.py:15-20), a
BigQuery client (reference load/bigquery.py:11), and an ACKNOWLEDGED
unhandled token-expiry hazard (reference __init__.py:19 "TODO: handle token
expiry"). It has no retry logic anywhere. This module is the abstraction a
real deployment slots those clients into, with both hazards fixed:

- :class:`CredentialProvider` — lazily fetches a token and transparently
  refreshes it before expiry (with a safety skew), so a long-lived scheduler
  daemon never presents a stale credential.
- :class:`RetryPolicy` / :func:`with_retries` — bounded exponential backoff
  around transient faults (the 429/5xx/connection-reset shapes every hosted
  API emits). Permanent faults (not-found, forbidden) propagate immediately
  so the scheduler's error translation still sees them.
- :class:`Transport` — the minimal fetch interface a Sheets/HTTP client must
  implement. :class:`DictTransport` is the in-memory test double (optionally
  scripted with failures); a production gspread/REST client implements the
  same two methods and nothing else changes.
- :class:`RemoteSheetSource` — plugs a Transport + credentials + retries
  behind the exact ``SheetSource`` interface (open/worksheet/
  available_sheets), so ``control.scheduler.Scheduler`` and
  ``translate_error`` run unchanged against a remote backend.

No network library is imported here: the seam is the contract, and the
container has no HTTP client anyway. Everything is driver-side by design —
control-plane fetches are spreadsheet-scale (≤10M cells by the service's own
limit); the 100 TB data path lives in the lake tables, not here.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from flusher_spark.sources.sheet import SheetGrid


class TransientError(Exception):
    """A fault worth retrying: rate limit, 5xx, connection reset."""


class AuthExpiredError(TransientError):
    """A 401-shaped transient: the presented credential was rejected.
    Retryable like any transient, but ALSO the only fault that should
    invalidate a cached token — a plain 429/5xx says nothing about the
    credential, and discarding a still-valid token on every retry would
    force a fresh auth exchange per attempt. The token fetch runs INSIDE
    the retried closure (``credentials.token()`` in RemoteSheetSource's
    lambdas), so a transient fault in the auth exchange itself is retried
    on the same budget as the data call — the provider's cache means only
    an invalidated or expired token actually pays the exchange (r14
    review: this docstring used to claim the opposite)."""


class PermanentError(Exception):
    """A fault retries cannot fix: not found, forbidden, bad request."""


@dataclass
class Token:
    value: str
    expires_at: float  # epoch seconds


@dataclass
class CredentialProvider:
    """Lazily-fetched, auto-refreshing credential.

    ``fetch`` performs the actual auth exchange (service-account JWT grant,
    metadata-server lookup, …) and returns a :class:`Token`. ``token()``
    refreshes when the cached token is within ``refresh_skew_s`` of expiry —
    fixing the reference's acknowledged unhandled-expiry TODO
    (reference __init__.py:19) without callers ever seeing auth state.
    """

    fetch: Callable[[], Token]
    refresh_skew_s: float = 60.0
    clock: Callable[[], float] = time.time
    _cached: Token | None = field(default=None, repr=False)
    # Scheduler(max_concurrency>1) calls token() from worker threads; the
    # lock makes refresh atomic so concurrent expiry can't double-fetch.
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False, compare=False)

    def token(self) -> str:
        with self._lock:
            if (
                self._cached is None
                or self.clock() >= self._cached.expires_at - self.refresh_skew_s
            ):
                self._cached = self.fetch()
            return self._cached.value

    def invalidate(self) -> None:
        """Drop the cached token (after an AuthExpiredError: force re-auth)."""
        with self._lock:
            self._cached = None


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded exponential backoff. Delays are deterministic (no jitter):
    the single-driver control plane has no thundering-herd problem, and
    deterministic schedules keep tests exact."""

    max_attempts: int = 4
    base_delay_s: float = 0.5
    multiplier: float = 2.0
    max_delay_s: float = 30.0

    def delay(self, attempt: int) -> float:
        """Backoff before retry ``attempt`` (1-based)."""
        return min(self.base_delay_s * self.multiplier ** (attempt - 1), self.max_delay_s)


def with_retries(
    fn: Callable[[], "SheetGrid | list[str]"],
    policy: RetryPolicy,
    sleep: Callable[[float], None] = time.sleep,
    on_auth_error: Callable[[], None] | None = None,
):
    """Run ``fn``, retrying TransientError up to ``policy.max_attempts``
    times with exponential backoff. PermanentError (and anything else)
    propagates immediately. ``on_auth_error`` runs before the retry only
    when the fault was :class:`AuthExpiredError` — a rate limit or 5xx says
    nothing about the credential, so the cached token survives those."""
    attempt = 0
    while True:
        attempt += 1
        try:
            return fn()
        except TransientError as exc:
            if attempt >= policy.max_attempts:
                raise
            if on_auth_error is not None and isinstance(exc, AuthExpiredError):
                on_auth_error()
            sleep(policy.delay(attempt))


class Transport:
    """What a real HTTP client must implement. ``token`` is the bearer
    credential for the call — the provider refreshes it per request."""

    def fetch_worksheet(self, document: str, sheet: str, token: str) -> SheetGrid:
        raise NotImplementedError

    def list_worksheets(self, document: str, token: str) -> list[str]:
        raise NotImplementedError


@dataclass
class DictTransport(Transport):
    """In-memory transport double. ``fail_script`` maps a call key
    ("document/sheet") to a queue of exceptions raised before success —
    letting tests script flaky-then-healthy endpoints deterministically."""

    documents: dict[str, dict[str, SheetGrid]] = field(default_factory=dict)
    fail_script: dict[str, list[Exception]] = field(default_factory=dict)
    calls: list[tuple[str, str, str]] = field(default_factory=list)

    def _maybe_fail(self, key: str) -> None:
        queue = self.fail_script.get(key)
        if queue:
            raise queue.pop(0)

    def fetch_worksheet(self, document: str, sheet: str, token: str) -> SheetGrid:
        self.calls.append(("fetch", f"{document}/{sheet}", token))
        self._maybe_fail(f"{document}/{sheet}")
        if document not in self.documents:
            raise PermanentError(f"document not found: {document!r}")
        doc = self.documents[document]
        if not sheet:
            if not doc:
                raise PermanentError(f"worksheet not found: document {document!r} has no sheets")
            return next(iter(doc.values()))
        if sheet not in doc:
            raise PermanentError(f"worksheet not found: {sheet!r}")
        return doc[sheet]

    def list_worksheets(self, document: str, token: str) -> list[str]:
        self.calls.append(("list", document, token))
        # fail_script key for the list endpoint is the bare document name
        # (fetch uses "document/sheet") — without this the retry behavior
        # of available_sheets was untestable with the double (r14 review).
        self._maybe_fail(document)
        if document not in self.documents:
            raise PermanentError(f"document not found: {document!r}")
        return sorted(self.documents[document])


@dataclass
class RemoteSheetSource:
    """The ``SheetSource`` interface over a Transport, with per-call token
    refresh and transient-fault retries. Drop-in for ``SheetSource`` in
    ``Scheduler`` — ``run_job`` and ``translate_error`` are agnostic to
    which one they hold.

    PermanentError is re-raised as KeyError with the same message shape
    SheetSource uses, so the scheduler's error enrichment (worksheet
    candidates, sharing hint — reference manager.py:69-80) works identically
    for remote and local sources."""

    transport: Transport
    credentials: CredentialProvider
    retry: RetryPolicy = RetryPolicy()
    sleep: Callable[[float], None] = time.sleep

    def _call(self, fn: Callable[[], "SheetGrid | list[str]"]):
        try:
            return with_retries(
                fn, self.retry, sleep=self.sleep, on_auth_error=self.credentials.invalidate
            )
        except PermanentError as exc:
            raise KeyError(str(exc)) from exc

    def open(self, document: str) -> dict[str, SheetGrid]:
        """Every sheet of the document — the third leg of the documented
        drop-in ``SheetSource`` interface (r14 review: the module docstring
        promised open/worksheet/available_sheets but open was missing, so a
        consumer written against the contract hit AttributeError). One list
        call plus one fetch per sheet, each through the same retry/auth
        machinery; control-plane sized by the service's own cell limits."""
        return {
            sheet: self.worksheet(document, sheet)
            for sheet in self.available_sheets(document)
        }

    def worksheet(self, document: str, sheet: str = "") -> SheetGrid:
        return self._call(
            lambda: self.transport.fetch_worksheet(document, sheet, self.credentials.token())
        )

    def available_sheets(self, document: str) -> list[str]:
        return self._call(
            lambda: self.transport.list_worksheets(document, self.credentials.token())
        )
