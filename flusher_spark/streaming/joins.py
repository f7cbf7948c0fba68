"""Streaming joins: stream-static enrichment and stream-stream interval
joins — the two join capabilities a streaming pipeline needs beyond windowed
aggregation (streaming/windows.py).

- ``enrich_with_dim``: micro-batch stream ⋈ static dimension. The dim is a
  plain DataFrame; Spark re-plans it per micro-batch, so broadcast hints
  work exactly as in batch — the streaming twin of join_broadcast_dim.

- ``join_purchases_to_views``: watermarked stream-stream inner join with an
  event-time range condition (view within [purchase−Δ, purchase]). Both
  sides buffer state bounded by their watermarks + the range bound — the
  streaming twin of the batch as-of/range joins (operators/asof.py,
  operators/rangejoin.py). State eviction needs BOTH watermarks and the
  time-bound condition; without the range condition state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Enrich a stream with a static dimension (broadcast per micro-batch)."""
    return events.join(F.broadcast(dim), on, "left")


def _purchases_views_join(
    events: DataFrame, how: str, max_gap: str, watermark: str
) -> DataFrame:
    """Shared core of the four purchase/view stream-stream joins: both
    sides are ALWAYS aliased (p_user_id / v_user_id) and the output picks
    the orientation-correct user_id, so a fix to the range condition or
    watermarking lands once — the four hand-expanded copies this replaces
    had already drifted in their incidental aliasing (r10 review). The
    event-time range condition + watermarks on both sides are what bound
    the join state; without the range condition state grows forever."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    joined = purchases.join(
        views,
        (purchases.p_user_id == views.v_user_id)
        & (views.view_ts <= purchases.purchase_ts)
        & (views.view_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {max_gap}")),
        how,
    )
    # user_id per orientation: the purchase side where it can't be NULL
    # (inner/left), the view side on the right join, coalesced on full.
    user = {
        "inner": F.col("p_user_id"),
        "leftOuter": F.col("p_user_id"),
        "rightOuter": F.col("v_user_id"),
        "fullOuter": F.coalesce("p_user_id", "v_user_id"),
    }[how]
    return joined.select(
        "purchase_id", user.alias("user_id"), "purchase_ts", "view_id", "view_ts"
    )


def join_purchases_to_views(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream join: each purchase paired with every prior view by the
    same user within ``max_gap``. Event-time range condition + watermarks on
    both sides bound the join state."""
    return _purchases_views_join(events, "inner", max_gap, watermark)


def join_purchases_to_views_left(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase emits — paired with its
    prior views within ``max_gap``, or once with NULL view columns if none
    arrived. The outer semantics are the streaming-specific part: a NULL
    row can only be emitted when the (global, min-of-both-sides) watermark
    has passed the purchase's match window, proving no matching view can
    still arrive — so unmatched results trail the inner ones by exactly the
    watermark delay, and a bounded run needs the watermark pushed past the
    last purchase before its final NULLs flush (see the catalog entry's
    sentinel file)."""
    return _purchases_views_join(events, "leftOuter", max_gap, watermark)


def join_purchases_to_views_full(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL OUTER stream-stream join — both outer directions at once:
    matched (purchase, view) pairs emit on match; a match-less purchase
    emits once with NULL view columns, and a view that no later purchase
    ever claims emits once with NULL purchase columns. BOTH null
    directions wait on the global watermark (a view's no-purchase verdict
    needs the watermark past view_ts + max_gap — only then can no
    claiming purchase still arrive), so state on each side is bounded by
    watermark + range exactly as in the inner join, and a bounded run
    needs the sentinel flush on both sides. ``user_id`` is coalesced
    across sides since either may be NULL."""
    return _purchases_views_join(events, "fullOuter", max_gap, watermark)


def join_purchases_to_views_right(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """RIGHT OUTER stream-stream join — the mirror of the left join, outer
    on the VIEW side: matched (purchase, view) pairs emit on match; a view
    that no purchase ever claims emits once with NULL purchase columns.
    This is the subtle outer direction (shared with the full join's view
    half): a view's no-purchase verdict points FORWARD in time — the
    claiming purchase may arrive up to ``max_gap`` later, so the NULL row
    can only flush once the global watermark passes view_ts + max_gap.
    State on both sides stays watermark+range bounded exactly as in the
    inner join; a bounded run needs the sentinel flush on both sides.
    ``user_id`` comes from the view side (never NULL on the right join)."""
    return _purchases_views_join(events, "rightOuter", max_gap, watermark)
