"""Operator library: one module per reference-operator family.

Every operator is a ``DataFrame -> DataFrame`` function usable via
``df.transform(op(...))`` — the Spark analogue of ``Flow[I, O]``.
"""

from akka_stream_contrib_spark.operators.sample import (sample_nth, sample_step, sample_random, reservoir_sample, sample_step_replay)
from akka_stream_contrib_spark.operators.partition import partition_with, pass_through
from akka_stream_contrib_spark.operators.accumulate import (
    accumulate,
    accumulate_while_unchanged,
    last_element,
)
from akka_stream_contrib_spark.operators.merge import merge_by_index
from akka_stream_contrib_spark.operators.windows import (
    time_window,
    sliding_window,
    session_window_agg,
    pulse,
    interval_based_rate_limiter,
)
from akka_stream_contrib_spark.operators.throttle import token_throttle
from akka_stream_contrib_spark.operators.delay import delay_flow
from akka_stream_contrib_spark.operators.keepalive import keep_alive_concat
from akka_stream_contrib_spark.operators.timed import (
    timed_interval_between,
    with_ingest_ts,
    latency_columns,
    observed,
    timed_section,
)
from akka_stream_contrib_spark.operators.retry import retry, retry_concat
from akka_stream_contrib_spark.operators.feedback import (
    feedback_loop,
    unfold_flow,
    unfold_flow_with,
)
from akka_stream_contrib_spark.operators.asof import as_of_join
from akka_stream_contrib_spark.operators.scd2 import scd2_intervals, scd2_as_of
from akka_stream_contrib_spark.operators.zorder import zorder_key, zorder_write
from akka_stream_contrib_spark.operators.timeseries import (
    rolling_zscore,
    ewma_smooth,
    ewma_weights,
    holt_linear,
    sessionize,
    znorm_motif_topk,
    znorm_query,
)
from akka_stream_contrib_spark.operators.resample import resample_ffill, resample_interpolate, ohlc_resample
from akka_stream_contrib_spark.operators.cdc import apply_changes, snapshot_diff
from akka_stream_contrib_spark.operators.bucketing import (
    write_bucketed,
    write_partitioned,
    bucketed_join,
    assert_no_shuffle_join,
)
from akka_stream_contrib_spark.operators.skew import salted_aggregate, salted_join
from akka_stream_contrib_spark.operators.compaction import compact_parquet, parquet_file_stats
from akka_stream_contrib_spark.operators.windows import windowed_fold
from akka_stream_contrib_spark.operators.interval_join import interval_overlap_join
from akka_stream_contrib_spark.operators.global_order import (
    global_rank,
    global_running_sum,
    global_running_agg,
    global_lag,
)

__all__ = [
    "interval_overlap_join",
    "global_rank", "global_running_sum", "global_running_agg", "global_lag",
    "scd2_intervals", "scd2_as_of", "zorder_key", "zorder_write", "rolling_zscore", "ewma_smooth", "ewma_weights", "sessionize", "znorm_motif_topk", "znorm_query",
    "sample_nth", "sample_step", "sample_random", "reservoir_sample", "sample_step_replay",
    "partition_with", "pass_through",
    "accumulate", "accumulate_while_unchanged", "last_element",
    "merge_by_index",
    "time_window", "sliding_window", "session_window_agg", "pulse",
    "interval_based_rate_limiter", "windowed_fold",
    "token_throttle", "delay_flow", "keep_alive_concat",
    "timed_interval_between", "with_ingest_ts", "latency_columns",
    "retry", "retry_concat", "feedback_loop", "unfold_flow", "unfold_flow_with",
    "as_of_join", "resample_ffill", "resample_interpolate", "ohlc_resample", "snapshot_diff",
    "apply_changes", "holt_linear",
    "write_bucketed", "write_partitioned", "bucketed_join", "assert_no_shuffle_join",
    "salted_aggregate", "salted_join",
    "compact_parquet", "parquet_file_stats", "observed", "timed_section",
]
