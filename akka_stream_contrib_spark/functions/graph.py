"""Graph analytics over DataFrames: PageRank by power iteration.

Complements `functions/dedup.py::dup_clusters` (connected components via
min-label propagation) as the second iterative-algorithm family: cyclic
dataflow expressed as a driver-side loop over DataFrames, the Spark
re-expression of the reference's feedback wiring
(`FeedbackLoop.scala:18-38` — outputs re-injected as inputs, bounded by an
explicit iteration budget instead of a buffer).

Scale shape: each iteration is one shuffle (the contribution aggregation on
dst); the edge table is computed once, its out-degrees joined once, and the
per-iteration lineage is truncated with `localCheckpoint` so the plan does
not grow with iterations. Rank state is one row per node — the same
footprint any MPP PageRank carries. Dangling mass (nodes with no out-edges)
is redistributed uniformly each iteration, keeping the rank vector summing
to 1 (up to FP) like the textbook formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Power-iteration PageRank over the directed edge list ``edges``
    (duplicate edges are collapsed). Returns (id, rank) for every node that
    appears as a source or destination. Fixed ``iterations`` (the driver-loop
    analogue of the reference's bounded feedback buffer); ranks are rounded
    to 6 dp only by callers that need engine-portable output.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .distinct().localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (e.join(ranks.join(out_deg, ranks.id == out_deg.src)
                          .select("id", (F.col("rank") / F.col("out_deg"))
                                  .alias("share")),
                          e.src == F.col("id"))
                   .groupBy("dst").agg(F.sum("share").alias("inflow")))
        # dangling mass: rank held by nodes with no out-edges
        dangling = (ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
                    .head().m)
        ranks = (nodes.join(contrib, nodes.id == contrib.dst, "left")
                 .select("id",
                         (F.lit(base + damping * dangling / n)
                          + F.lit(damping)
                          * F.coalesce(F.col("inflow"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks
