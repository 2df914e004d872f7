"""Distributed k-means clustering over embedding columns.

Third member of the iterative-algorithm family (with
`functions/graph.py::pagerank` and `functions/dedup.py::dup_clusters`):
cyclic dataflow as a bounded driver loop — the Spark re-expression of the
reference's feedback wiring (`FeedbackLoop.scala:18-38`), where only the
k-row centroid table crosses the loop boundary.

Unlike `similarity.py::_train_centroids` (driver-side numpy on a bounded
sample, used to seed IVF cells), this is FULL-corpus Lloyd's: every
iteration assigns all N vectors (map-side broadcast-centroid argmin, no
shuffle) and recomputes centroids with one shuffle of k*dim partial sums
(posexplode → groupBy(cluster, dim) with map-side combine). Per-iteration
cost at 100 TB: one scan + one k*dim-row aggregate — the same shape any
MPP k-means runs; no step ever materializes more than k*dim rows off the
scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col: str, centroid: list[float]):
    """Squared L2 distance vector→literal centroid as a codegen expression."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), carr,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def _assign(df: DataFrame, vec_col: str, cents: list[list[float]]):
    """Nearest-centroid id (ties → lowest id) as one map-side expression."""
    dists = F.array(*[_dist2(vec_col, c) for c in cents])
    return df.withColumn(
        "_d", dists).withColumn(
        "cluster", (F.array_position(F.col("_d"), F.array_min("_d")) - 1
                    ).cast("int")).drop("_d")


def kmeans_assign(df: DataFrame, k: int = 8, iterations: int = 5,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  ) -> DataFrame:
    """Lloyd's k-means: returns (id, cluster, dist) for every input row,
    with ``dist`` the final distance to the assigned centroid (6 dp).

    Deterministic structure: centroids seed from the k lowest ids; each
    round every vector joins the broadcast centroid literals in a pure
    argmin expression; re-centering averages member vectors per dimension.
    (Unordered double averaging makes last-digit centroid bits engine-
    dependent — assignments of points near a Voronoi boundary can differ
    across engines, which is why the gate query for this family is
    rows-only; the pytest model pins well-separated fixtures exactly.)
    """
    if k <= 0 or iterations < 0:
        raise ValueError(f"kmeans_assign needs k>=1, iterations>=0")
    seed_rows = (df.select(id_col, vec_col).orderBy(id_col).limit(k).collect())
    if not seed_rows:
        return df.select(F.col(id_col), F.lit(0).alias("cluster"),
                         F.lit(0.0).alias("dist")).limit(0)
    cents = [[float(x) for x in r[vec_col]] for r in seed_rows]
    dim = len(cents[0])
    base = df.select(id_col, vec_col)
    for _ in range(iterations):
        assigned = _assign(base, vec_col, cents)
        parts = (assigned
                 .select("cluster", F.posexplode(
                     F.col(vec_col).cast("array<double>")).alias("_i", "_x"))
                 .groupBy("cluster", "_i")
                 .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n")))
        rows = (parts.groupBy("cluster")
                .agg(F.map_from_arrays(F.collect_list("_i"),
                                       F.collect_list(F.col("_s") / F.col("_n"))
                                       ).alias("_m"))
                .collect())
        new_cents = list(cents)
        for r in rows:  # clusters that lost all members keep their centroid
            new_cents[r["cluster"]] = [r["_m"][i] for i in range(dim)]
        cents = new_cents
    dists = F.array(*[_dist2(vec_col, c) for c in cents])
    out = (base.withColumn("_d", dists)
           .withColumn("cluster",
                       (F.array_position(F.col("_d"), F.array_min("_d")) - 1
                        ).cast("int")))
    return out.select(
        F.col(id_col), "cluster",
        F.round(F.sqrt(F.element_at(F.col("_d"), F.col("cluster") + 1)), 6)
        .alias("dist"))
