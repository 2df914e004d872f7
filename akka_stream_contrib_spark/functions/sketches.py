"""Mergeable distinct-count sketches (Apache DataSketches HLL, Spark-native).

The 100 TB pattern for distinct counts: you cannot afford to re-scan raw
events for every (day, month, quarter, all-time) distinct-user question, and
exact distinct state at that scale is a shuffle of every key. Instead,
aggregate each fine-grained bucket ONCE into an HLL sketch (a few KB,
`hll_sketch_agg` — map-side partial aggregation like any hash agg), persist
the sketches, and answer every coarser rollup by UNIONING sketches
(`hll_union_agg`) — no raw-data access, error a few permille at lg_k=12+.
Union is associative/commutative, so rollups compose: daily → monthly →
all-time each read only the previous level's sketch table.

Reference anchor: none (approximate aggregation is a BASELINE.json
extension; the reference has no aggregation surface at all). Uses only
public Spark 4 `pyspark.sql.functions` sketch builtins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_rollup(df: DataFrame, keys: Sequence[str], item: str,
                      lgk: int = 12, sketch_col: str = "sketch") -> DataFrame:
    """Aggregate one HLL sketch of ``item`` per ``keys`` group — the
    fine-grained sketch table you persist (binary column, a few KB/row)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(item), F.lit(lgk)).alias(sketch_col))


def hll_merge(sketch_df: DataFrame, keys: Sequence[str],
              sketch_col: str = "sketch",
              estimate_col: str = "approx_distinct") -> DataFrame:
    """Roll sketches up to coarser ``keys`` by union-merging, returning the
    distinct-count estimate. Reads ONLY the sketch table — this is the step
    that makes multi-granularity distinct counts O(buckets), not O(events).
    """
    return (sketch_df.groupBy(*keys)
            .agg(F.hll_union_agg(F.col(sketch_col)).alias("_merged"),
                 F.count(F.lit(1)).alias("n_buckets"))
            .withColumn(estimate_col,
                        F.hll_sketch_estimate(F.col("_merged")))
            .drop("_merged"))
