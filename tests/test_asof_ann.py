"""As-of join edge semantics + LSH ANN recall sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from akka_stream_contrib_spark.functions.similarity import ann_lsh_topk, ann_topk_all
from akka_stream_contrib_spark.operators import as_of_join


def test_as_of_join_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:10:00"), (2, 1, "2024-01-01 00:30:00"),
         (3, 2, "2024-01-01 00:05:00")],
        "event_id int, user_id int, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 100.0),   # exact tie → matched (>= rule)
         (1, "2024-01-01 00:20:00", 200.0),
         (2, "2024-01-01 00:06:00", 999.0)],  # after left row → no match
        "user_id int, ts string, value double").withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_id: r.value_asof
           for r in as_of_join(left, right, on=["user_id"], ts="ts",
                               right_cols=["value"]).collect()}
    assert out == {1: 100.0, 2: 200.0, 3: None}


def test_ann_lsh_neighbors_are_real_neighbors(spark):
    import numpy as np
    rng = np.random.RandomState(5)
    # planted clusters: pairs (2i, 2i+1) are tiny perturbations of each other
    rows = []
    for i in range(30):
        v = rng.uniform(-1, 1, 64)
        rows.append((2 * i, v.astype("float32").tolist()))
        rows.append((2 * i + 1, (v + rng.uniform(-0.01, 0.01, 64)).astype("float32").tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = ann_lsh_topk(df, k=1)
    top1 = {r.vec_id: r.neighbor_id for r in got.collect()}
    # near-identical twins hash to the same bucket and rank first
    hits = sum(1 for a, b in top1.items() if b == (a ^ 1))
    assert hits >= 50  # ≥ ~83% of the 60 vectors find their twin
