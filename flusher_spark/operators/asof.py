"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (no UDFs): union the
two sides, shuffle once on the join keys, and carry the most recent right-side
row forward with a running ``max(payload struct)`` (or ``max_by`` on the
narrow tie key) over an unbounded-preceding window — ORDER-INSENSITIVE among
equal sort keys, unlike the ``last(..., ignorenulls)`` formulation this
module used before r8 and whose description the docstring wrongly kept until
r14: equal-timestamp right rows resolve deterministically to the LARGEST
payload struct, not to whichever row the sort happened to place last. This
is the scalable formulation — one shuffle + one in-partition sort, no range
explosion, no driver-side work — equivalent to DuckDB's ASOF JOIN
(``left.ts >= right.ts``, most recent right row wins; ties on identical
timestamps resolve to the right side, i.e. an equal-timestamp right row is
visible to the left row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_FWDKEY = "__asof_fwdkey"
_ORDKEY = "__asof_ordkey"
_BACK = "__asof_back"
_FWD = "__asof_fwd"


def _check_suffix_collisions(left_cols, out_cols) -> None:
    """Raise when a suffixed output column collides with an existing left
    column (r14 review — the collision class rangejoin guards with
    _rename_collisions): without the check the join succeeds silently with
    DUPLICATE column names and the caller's next select dies with
    AMBIGUOUS_REFERENCE (or positionally picks one)."""
    clash = sorted(set(out_cols) & set(left_cols))
    if clash:
        raise ValueError(
            f"as-of output column(s) {clash} collide with left columns;"
            " pass a different suffix"
        )


def _align_to_left(lhs: DataFrame, rhs: DataFrame) -> DataFrame:
    """Give ``rhs`` the full lhs column set (missing left columns as typed
    NULLs) in ONE select — the per-column withColumn loop this replaces
    rebuilt the dtype dict and nested one projection per column, O(cols²)
    driver work on wide frames, and was pasted in both asof variants
    (r13 review)."""
    dtypes = dict(lhs.dtypes)
    have = set(rhs.columns)
    return rhs.select(
        *[
            F.col(c) if c in have else F.lit(None).cast(dtypes[c]).alias(c)
            for c in lhs.columns
        ]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` within the same ``on`` keys.

    Right rows that tie on timestamp among themselves resolve to the LARGEST
    payload struct, i.e. the highest ``value_cols`` tuple wins (deterministic;
    pick the column order accordingly — e.g. put a change id first to make the
    latest change win). Left rows with no prior right row get nulls. Output:
    all left columns + ``value_cols`` (default: every non-key, non-ts right
    column) renamed with ``suffix``.

    ``tie_cols`` (optional) is the WIDE-PAYLOAD fast path: name the narrow
    columns (e.g. a change id) that already order equal-timestamp right rows,
    and the running aggregate becomes ``max_by(payload, (ts, *tie_cols))`` —
    the per-row comparison touches only the timestamp and the tie columns,
    never the carried payload (a wide string column in the compared struct
    was a measured drag on the r9 SCD2 bench). Semantics are unchanged from
    the default WHEN ``(right_ts, *tie_cols)`` orders right rows within a
    key exactly as ``(right_ts, *value_cols)`` would — i.e. ``tie_cols`` is
    a prefix of ``value_cols`` that is unique per (key, timestamp); with a
    non-unique tie the pick among tied rows is not defined.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]

    out_cols = [f"{c}{suffix}" for c in value_cols]
    _check_suffix_collisions(left.columns, [*out_cols, f"{right_ts}{suffix}"])
    payload = F.struct(*[F.col(c).alias(c) for c in [right_ts, *value_cols]])

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn(_PAYLOAD, F.lit(None).cast(
        right.select(payload.alias(_PAYLOAD)).schema[_PAYLOAD].dataType
    ))
    rhs_extra = {_PAYLOAD: payload}
    if tie_cols:
        ordkey = F.struct(*[F.col(c).alias(c) for c in [right_ts, *tie_cols]])
        otype = right.select(ordkey.alias(_ORDKEY)).schema[_ORDKEY].dataType
        # NULL ord on left rows: max_by skips them, so a left row never
        # displaces the latest prior right row (mirrors max() ignoring the
        # left side's NULL payload on the default path).
        lhs = lhs.withColumn(_ORDKEY, F.lit(None).cast(otype))
        rhs_extra[_ORDKEY] = ordkey
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(_SIDE),
        *[e.alias(name) for name, e in rhs_extra.items()],
    )
    # Align schemas: left keeps all its columns; right rows carry nulls there.
    rhs = _align_to_left(lhs, rhs)

    # Right rows sort before left rows at equal timestamps (side 0 < 1), so an
    # equal-ts right row is already visible — matching ASOF '>=' semantics.
    # Running max(struct) — NOT payload-in-the-sort-key + last(): the struct
    # leads with right_ts, so the max over the frame IS the latest prior row,
    # ties resolved to the largest payload, and it is order-insensitive among
    # equal sort keys. Keeping the payload out of the ORDER BY matters: r8
    # sorted by the full struct and the asof family drifted ~1.5× (struct
    # compares in the sort's hot loop); an incremental unbounded-preceding
    # max does one struct compare per row instead (max_by over the narrow
    # (ts, tie) key when tie_cols is given — see above).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    agg = (
        F.max_by(F.col(_PAYLOAD), F.col(_ORDKEY)) if tie_cols else F.max(_PAYLOAD)
    )
    merged = lhs.unionByName(rhs).withColumn(_PAYLOAD, agg.over(w))
    out = merged.where(F.col(_SIDE) == 1).select(
        *[c for c in left.columns],
        *[F.col(f"{_PAYLOAD}.{src}").alias(dst) for src, dst in zip(value_cols, out_cols)],
        F.col(f"{_PAYLOAD}.{right_ts}").alias(f"{right_ts}{suffix}"),
    )
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row whose timestamp is NEAREST
    (either direction) within ``tolerance_us`` — pandas
    ``merge_asof(direction='nearest')``, scalably. The tolerance is in
    microseconds for TIMESTAMP columns and in the column's own units for
    numeric timestamps (matching asof_join, which is type-agnostic too).

    Same shape as :func:`asof_join` — union both sides, ONE shuffle on the
    keys, ONE in-partition sort on (ts, side) — with TWO running window
    aggregates over it (Spark plans them as one Window node): the latest
    prior right row as max(payload struct), and the earliest following
    right row as max(struct(-ts, payload)) so the min-timestamp /
    max-payload preference folds into one order-insensitive aggregate.
    BOTH candidates therefore resolve equal-timestamp right rows to the
    largest payload struct — the tie-break convention :func:`asof_join`
    documents — and the payload never enters a sort key (see asof_join on
    why that matters). Each left row then picks the closer candidate (ties
    prefer the prior row; equal-timestamp right rows count as prior with
    distance 0) and drops it if beyond tolerance. No range explosion: cost
    is the one shuffle, not tolerance-proportional fan-out.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]

    lt = dict(left.dtypes).get(left_ts, "")
    rt = dict(right.dtypes).get(right_ts, "")

    def _ts_kind(t: str) -> str | None:
        # Exact base-type match, not startswith: a prefix test on "int"
        # also accepts "interval day to second", which would sail past the
        # guard and then hit exactly the opaque analysis-time
        # DATATYPE_MISMATCH this check exists to prevent.
        base = t.split("(", 1)[0].strip()
        if base in ("timestamp", "timestamp_ntz"):
            return base
        if base in (
            "tinyint", "smallint", "int", "bigint", "long",
            "float", "double", "decimal",
        ):
            return "numeric"
        return None

    lk, rk = _ts_kind(lt), _ts_kind(rt)
    for name, t, k in ((left_ts, lt, lk), (right_ts, rt, rk)):
        if k is None:
            # Fail HERE with the real story, not at analysis: the forward
            # key negates the timestamp, and negating e.g. a string or
            # interval column surfaces as an opaque DATATYPE_MISMATCH deep
            # in the plan. (r9 removed a silent cast('long') that used to
            # mask this by flooring fractional timestamps — truncation
            # made "nearest" pick the farther row.)
            raise ValueError(
                f"asof_join_nearest timestamp column {name!r} has type {t!r}; "
                "expected timestamp, timestamp_ntz or numeric — cast it "
                "explicitly upstream"
            )
    if lk != rk:
        # Also rejects timestamp vs timestamp_ntz: the two sides are
        # unioned into one column, and unionByName cannot reconcile the
        # flavors any more than it can timestamp-vs-numeric.
        raise ValueError(
            f"asof_join_nearest timestamp columns disagree: {left_ts!r} is "
            f"{lt!r} but {right_ts!r} is {rt!r} — both sides must be the "
            "same timestamp flavor, or both numeric in the same units"
        )

    # TIMESTAMP columns map to exact microsecond longs (TIMESTAMP_NTZ via a
    # wall-clock diff from the ntz epoch — monotonic and exact, where a cast
    # to TIMESTAMP would route through the session time zone and fold DST
    # transitions); numeric timestamp columns stay in their NATIVE type —
    # negation and subtraction are exact for long, double and decimal alike,
    # and a cast('long') here would truncate fractional timestamps,
    # colliding distinct sub-unit right rows in the forward key and
    # computing distances on floored values (so "nearest" could pick the
    # farther row — a confirmed defect, r9 review).
    def tnum(c):
        if lk == "timestamp":
            return F.unix_micros(c)
        if lk == "timestamp_ntz":
            return F.timestamp_diff(
                "MICROSECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                c,
            )
        return c

    out_cols = [f"{c}{suffix}" for c in value_cols]
    _check_suffix_collisions(left.columns, [*out_cols, f"{right_ts}{suffix}"])
    payload = F.struct(*[F.col(c).alias(c) for c in [right_ts, *value_cols]])
    fwdkey = F.struct((-tnum(F.col(right_ts))).alias("negts"), payload.alias("p"))
    ptype = right.select(payload.alias(_PAYLOAD)).schema[_PAYLOAD].dataType
    ftype = right.select(fwdkey.alias(_FWDKEY)).schema[_FWDKEY].dataType

    lhs = (
        left.withColumn(_SIDE, F.lit(1))
        .withColumn(_PAYLOAD, F.lit(None).cast(ptype))
        .withColumn(_FWDKEY, F.lit(None).cast(ftype))
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
        fwdkey.alias(_FWDKEY),
    )
    rhs = _align_to_left(lhs, rhs)

    order = [F.col(left_ts).asc(), F.col(_SIDE).asc()]
    w_back = (
        Window.partitionBy(*on).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on).orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # Namespaced temps (r13 review): bare '__back'/'__fwd' silently
    # OVERWROTE a left column of the same name and returned the candidate
    # struct under the user's column in the final select(*left.columns).
    merged = (
        lhs.unionByName(rhs)
        .withColumn(_BACK, F.max(_PAYLOAD).over(w_back))
        .withColumn(_FWD, F.max(_FWDKEY).over(w_fwd).getField("p"))
    )

    ts_us = tnum(F.col(left_ts))
    back_diff = ts_us - tnum(F.col(f"{_BACK}.{right_ts}"))
    fwd_diff = tnum(F.col(f"{_FWD}.{right_ts}")) - ts_us
    back_ok = F.col(_BACK).isNotNull() & (back_diff <= tolerance_us)
    fwd_ok = F.col(_FWD).isNotNull() & (fwd_diff <= tolerance_us)
    chosen = (
        F.when(back_ok & (~fwd_ok | (back_diff <= fwd_diff)), F.col(_BACK))
        .when(fwd_ok, F.col(_FWD))
        .otherwise(F.lit(None).cast(ptype))
    )
    return (
        merged.where(F.col(_SIDE) == 1)
        .withColumn(_PAYLOAD, chosen)
        .select(
            *[c for c in left.columns],
            *[F.col(f"{_PAYLOAD}.{src}").alias(dst) for src, dst in zip(value_cols, out_cols)],
            F.col(f"{_PAYLOAD}.{right_ts}").alias(f"{right_ts}{suffix}"),
        )
    )
