"""Structured Streaming variants of the window operators."""

from mapreduce6240project_spark.streaming.jobs import (
    run_streaming_batch,
    streaming_click_purchase_left,
    streaming_click_purchase_pairs,
    streaming_dedup_bounded_state,
    streaming_dedup_counts,
    streaming_enrich_static,
    streaming_foreach_batch_sink,
    streaming_sessions,
    streaming_sliding,
    streaming_stateful_counts,
    streaming_tws_running_sum,
    streaming_tumbling,
)

__all__ = [
    "run_streaming_batch",
    "streaming_click_purchase_left",
    "streaming_click_purchase_pairs",
    "streaming_dedup_bounded_state",
    "streaming_dedup_counts",
    "streaming_enrich_static",
    "streaming_foreach_batch_sink",
    "streaming_sliding",
    "streaming_sessions",
    "streaming_stateful_counts",
    "streaming_tws_running_sum",
    "streaming_tumbling",
]
