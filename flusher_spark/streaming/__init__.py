from flusher_spark.streaming.joins import (
    enrich_with_dim,
    join_purchases_to_views,
    join_purchases_to_views_full,
    join_purchases_to_views_left,
    join_purchases_to_views_right,
)
from flusher_spark.streaming.stateful import (
    running_user_totals,
    running_user_totals_tws,
    streaming_dedup_first_seen,
    streaming_dedup_first_seen_tws,
    tws_available,
)
from flusher_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_events,
    tumbling_window_agg,
)

__all__ = [
    "enrich_with_dim",
    "join_purchases_to_views",
    "join_purchases_to_views_full",
    "join_purchases_to_views_left",
    "join_purchases_to_views_right",
    "running_user_totals",
    "running_user_totals_tws",
    "session_window_agg",
    "sliding_window_agg",
    "stream_events",
    "streaming_dedup_first_seen",
    "streaming_dedup_first_seen_tws",
    "tumbling_window_agg",
    "tws_available",
]
