"""Custom stateful streaming operators (applyInPandasWithState).

Built-in windowed aggs (streaming/windows.py) cover time-bucketed state;
these cover the semantics they can't express:

- ``running_user_totals``: per-user lifetime counters that emit an updated
  row every micro-batch the user is active in — the streaming twin of a
  batch groupBy, but with incremental emission (a dashboard/feature-store
  feed). State per key is O(1) (three numbers), so state-store size is
  bounded by |users|, not |events|.

- ``streaming_dedup_first_seen``: exactly-once pass-through of the FIRST
  occurrence of each key — streaming exact dedup. State per key is a single
  marker. (Spark's built-in ``dropDuplicates`` on a stream keeps state per
  key too but can't emit which row won; this one emits the surviving row.)

Both run on the shuffled-by-key micro-batch model: state lives in the state
store, partitioned by the grouping key, so a 1000-executor cluster splits
the key space 1000 ways. No watermark is required for NoTimeout state, but
production deployments should add one (``withWatermark`` upstream) so the
store can evict idle keys via timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

#: State schema carries n_vals (count of NON-NULL values) so an all-NULL
#: user emits NULL sum/max exactly like the batch groupBy twin — the old
#: (-inf seed, skipna sum) state emitted max_value=-Infinity / sum=0.0 for
#: such users, diverging from F.max/F.sum's NULL and leaking -Infinity to
#: downstream consumers (r12 review). Widening the state schema restarts
#: existing checkpoints fresh — deliberate: the old state could not
#: distinguish "no values yet" from a genuine 0.0 sum.
_TOTALS_STATE_SCHEMA = "n_events long, n_vals long, sum_value double, max_value double"


def _accumulate_totals(
    n: int, nv: int, s: float, m: float, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, int, float, float]:
    """Fold a batch's frames into the (n_events, n_vals, sum_value,
    max_value) running state — ONE implementation shared by the
    applyInPandasWithState operator and its transformWithState twin, so
    the module's "the processor logic is identical" claim is structural,
    not a comment that drifts (the two copies had already diverged in
    guard placement, r10 review). NULL values count toward n_events but
    not the aggregates (the F.sum/F.max convention).

    DOCUMENTED DIVERGENCE for genuine double NaN on disk (r14 review):
    Arrow→pandas conversion renders SQL NULL as NaN in this frame, so a
    stored NaN value is indistinguishable from NULL here and is treated
    as NULL (skipped), whereas batch F.sum/F.max PROPAGATE NaN. Exact
    parity would need nullable extension dtypes end-to-end; skipping is
    the safer side (a single NaN event cannot permanently poison a user's
    lifetime totals)."""
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                nv += len(vals)
                s += float(vals.sum())
                m = max(m, float(vals.max()))
    return n, nv, s, m


def _totals_row(key, n: int, nv: int, s: float, m: float) -> pd.DataFrame:
    """Emission row shared by both twins: NULL aggregates until the user
    has a non-NULL value (batch-twin parity)."""
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s if nv else None],
            "max_value": [m if nv else None],
        }
    )


def _canon(v) -> tuple:
    """A total order over arbitrary Arrow-decoded cell values. pandas
    ``sort_values`` over all columns crashed on any non-orderable payload
    type — array columns arrive as numpy arrays ('truth value is
    ambiguous'), map columns as dicts ('<' unsupported) — breaking the
    full-schema pass-through contract (r14 review). Keys are typed tuples
    so mixed/NULL cells compare by type tag first, values second; floats
    render via repr (deterministic digits), nested values recurse."""
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((str(k), _canon(x)) for k, x in v.items())))
    if v is None or (isinstance(v, float) and v != v):  # None / float NaN
        return ("nul",)
    if isinstance(v, bytes):
        return ("bin", v.hex())
    return ("val", type(v).__name__, repr(v))


def _pick_first_row(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Deterministic in-batch winner for first-seen dedup. Row order inside
    a shuffled group is NOT source order, so "first within this batch" is
    undefined; take the row that is smallest under a canonical total order
    over ALL columns (in schema order, ``_canon`` per cell) so the admitted
    payload is deterministic across retries and partitionings — replays
    with identical payloads (the common at-least-once case) are unaffected.
    The group is one key's duplicates within one micro-batch, so the
    Python-side keying is batch-bounded. Shared by both API twins."""
    batch = pd.concat(frames, ignore_index=True)
    if len(batch) == 1:
        return batch
    keys = [
        tuple(_canon(v) for v in row)
        for row in batch.itertuples(index=False, name=None)
    ]
    return batch.iloc[[min(range(len(keys)), key=keys.__getitem__)]]


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value, max_value), updated each batch.

    Output mode must be ``update``/``append`` (applyInPandasWithState does
    its own emission); each active user emits one row per batch with their
    lifetime totals so far.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, nv, s, m = state.get if state.exists else (0, 0, 0.0, float("-inf"))
        n, nv, s, m = _accumulate_totals(n, nv, s, m, pdfs)
        state.update((n, nv, s, m))
        yield _totals_row(key, n, nv, s, m)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_first_seen(events: DataFrame, key_col: str = "event_id") -> DataFrame:
    """Emit only the first-ever occurrence of each key across the stream.

    Replays of the same key in later batches (or later in the same batch)
    are dropped. The canonical LLM-pipeline ingestion guard: exactly-once
    document admission over an at-least-once feed. The surviving row
    passes through with the FULL input schema — a hardcoded projection
    here used to silently drop the admitted document's ts/props payload
    (and contradicted the generic ``key_col`` parameter, r10 review)."""

    def first_only(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            state.update((True,))
            yield _pick_first_row(frames)

    return events.groupBy(key_col).applyInPandasWithState(
        first_only,
        outputStructType=events.schema,
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas twins (Spark 4's successor API)
#
# Same semantics as the two operators above, expressed as StatefulProcessor
# classes — the API the ecosystem is migrating to (typed per-key state
# handles, timers, RocksDB-backed stores). The PROCESSOR LOGIC is identical
# and unit-tested in-container through a fake handle; LIVE execution needs
# two things this environment cannot provide: the RocksDB state-store
# provider config (set by the builders below) and the google.protobuf
# package the TWS Python state-server protocol imports (absent here, and
# installs are not possible). tws_available() probes for it; tests skip the
# end-to-end path when the probe fails and always run the logic tests.
# ---------------------------------------------------------------------------

TWS_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


try:  # the processor base class exists from Spark 4.0 on
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _TWS_API_PRESENT = True
except ImportError:  # pragma: no cover - older Spark

    class StatefulProcessor:  # type: ignore[no-redef]
        pass

    StatefulProcessorHandle = Any  # type: ignore[assignment]
    _TWS_API_PRESENT = False


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually execute: the
    Spark-4 StatefulProcessor API must have imported (on Spark 3.x the
    fallback base class above exists precisely because it does NOT — a
    protobuf-only probe returned True there and the live path crashed with
    'GroupedData has no attribute transformWithStateInPandas', r10 review)
    AND the Python state-server protocol's protobuf dependency must be
    present. The RocksDB native library is a third requirement this probe
    cannot see without starting a query; end-to-end tests treat a
    provider-load failure as environmental."""
    if not _TWS_API_PRESENT:  # pragma: no cover - older Spark
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of running_user_totals: one ValueState
    tuple per user, updated per batch, lifetime totals emitted every batch
    the user is active in."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _TOTALS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, nv, s, m = (
            self._totals.get() if self._totals.exists() else (0, 0, 0.0, float("-inf"))
        )
        n, nv, s, m = _accumulate_totals(n, nv, s, m, rows)
        self._totals.update((n, nv, s, m))
        yield _totals_row(key, n, nv, s, m)

    def close(self) -> None:
        pass


class FirstSeenProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of streaming_dedup_first_seen: a
    single marker per key; only the first-ever row passes."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        frames = [pdf for pdf in rows if len(pdf)]
        if frames:
            self._seen.update((True,))
            yield _pick_first_row(frames)

    def close(self) -> None:
        pass


def _with_tws_provider(events: DataFrame):
    """SESSION-WIDE side effect, by necessity: transformWithState refuses
    the default HDFS-backed state store, and the provider class is a
    SparkSession conf read at query START (not a writeStream option), so
    merely BUILDING a tws query here switches every streaming query
    started afterwards on this session to RocksDB — a different checkpoint
    format, and a failure if the native library is absent. Callers mixing
    tws and non-tws streaming queries on one session should snapshot
    ``spark.conf.get("spark.sql.streaming.stateStore.providerClass")``
    and restore it after starting the tws query."""
    spark = events.sparkSession
    if spark.conf.get("spark.sql.streaming.stateStore.providerClass", "") != TWS_PROVIDER:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", TWS_PROVIDER)
    return events


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """running_user_totals on the transformWithStateInPandas API.

    SESSION-WIDE SIDE EFFECT: building this query sets the session's
    state-store provider to RocksDB (a SparkSession conf read at query
    start, not a writeStream option — see _with_tws_provider). Other
    streaming queries started on the same session afterwards inherit it:
    a different checkpoint format, and a hard failure if the native
    library is absent. Mixing tws and non-tws queries on one session?
    Snapshot ``spark.sql.streaming.stateStore.providerClass`` before
    calling and restore it after the tws query starts."""
    return _with_tws_provider(events).groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def streaming_dedup_first_seen_tws(events: DataFrame, key_col: str = "event_id") -> DataFrame:
    """streaming_dedup_first_seen on the transformWithStateInPandas API
    (full-schema pass-through, like its twin).

    SESSION-WIDE SIDE EFFECT: building this query switches the session's
    state-store provider to RocksDB — see running_user_totals_tws's
    docstring for the mixing caveat and the snapshot/restore recipe."""
    return _with_tws_provider(events).groupBy(key_col).transformWithStateInPandas(
        FirstSeenProcessor(),
        outputStructType=events.schema,
        outputMode="Update",
        timeMode="None",
    )
