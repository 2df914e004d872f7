"""Streaming forms of the stateful reference operators
(applyInPandasWithState-based) plus query-lifecycle utilities (Valve, Timed)."""

from akka_stream_contrib_spark.streaming.stateful import (
    token_throttle_stream,
    keep_alive_stream,
    accumulate_while_unchanged_stream,
    sessionize_stream,
    heavy_hitters_stream,
    merge_by_index_stream,
    CLOSE_INDEX,
    delay_strategy_stream,
    linear_increasing_delay_strategy,
    preference_pairs_stream,
    interleave_stream,
)
from akka_stream_contrib_spark.streaming.dedup import dedup_within_watermark
from akka_stream_contrib_spark.streaming.funnel import (
    funnel_stream,
    funnel_milestones,
    funnel_summary,
)
from akka_stream_contrib_spark.streaming.joins import stream_interval_join
from akka_stream_contrib_spark.streaming.valve import Valve
from akka_stream_contrib_spark.streaming.sinks import (
    idempotent_parquet_sink,
    incremental_dedup_sink,
    read_sink,
    scd2_sink,
    read_scd2,
)
from akka_stream_contrib_spark.streaming.rollup import incremental_rollup, read_rollup, expire_buckets
from akka_stream_contrib_spark.streaming.metrics import embedding_drift_sink

__all__ = [
    "token_throttle_stream",
    "funnel_stream",
    "funnel_milestones",
    "funnel_summary",
    "keep_alive_stream",
    "accumulate_while_unchanged_stream",
    "sessionize_stream",
    "merge_by_index_stream",
    "CLOSE_INDEX",
    "delay_strategy_stream",
    "preference_pairs_stream",
    "interleave_stream",
    "embedding_drift_sink",
    "linear_increasing_delay_strategy",
    "dedup_within_watermark",
    "stream_interval_join",
    "Valve",
    "idempotent_parquet_sink",
    "incremental_dedup_sink",
    "read_sink",
    "scd2_sink",
    "read_scd2",
    "incremental_rollup",
    "read_rollup",
    "expire_buckets",
]
