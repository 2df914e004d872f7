"""Round-10 scale probes (SCALE.md "Round-10 10x probe"):

1. ``pack_training_rows`` — the new packing op, via the registry (same
   harness as tools/scale_probe.py).
2. ``chat_training_text`` at REALISTIC conversation cardinality — the r9
   verdict asked for a number behind the "fixture cardinality-5 conv key"
   argument: the gate query keys conversations by ``source`` (5 distinct),
   so 10x documents = 10x-LONGER conversations and the probe read 10.56x.
   Here conversations are keyed by ``doc_id // 10`` (~10^4 convs at sf0.1,
   ~10^5 at 10x): 10x data = 10x MORE conversations of the same length,
   the real-corpus shape, and the per-conv fold parallelizes.

Usage: python tools/probe_r10.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from tools.scale_probe import DST, SRC, build  # noqa: E402
from akka_stream_contrib_spark import get_spark, tables  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def q_chat_conv10(spark, sf_dir):
    """q_chat_training_text with a realistic conv key: doc_id // 10."""
    from akka_stream_contrib_spark.functions.corpus import chat_to_training_text
    docs = tables.load(spark, "documents", sf_dir)
    turns = (docs.filter(F.col("text").isNotNull())
             .select((F.col("doc_id") / 10).cast("long").alias("conv_id"),
                     "doc_id",
                     F.when(F.col("doc_id") % 2 == 0, "user")
                     .otherwise("assistant").alias("role"),
                     F.substring("text", 1, 80).alias("content")))
    convs = (turns.groupBy("conv_id")
             .agg(F.array_sort(F.collect_list(
                 F.struct("doc_id", "role", "content"))).alias("_t"))
             .select("conv_id",
                     F.transform("_t", lambda x: F.struct(
                         x.role.alias("role"),
                         x.content.alias("content"))).alias("turns")))
    out = convs.transform(chat_to_training_text(id_col="conv_id"))
    sp = out.select("conv_id", "text",
                    F.explode("assistant_spans").alias("_sp"))
    return sp.select(
        "conv_id", F.col("_sp.s").alias("s"), F.col("_sp.e").alias("e"),
        F.substring(F.col("text"), (F.col("_sp.s") + 1).cast("int"),
                    (F.col("_sp.e") - F.col("_sp.s")).cast("int"))
        .alias("span_text"))


def main() -> None:
    spark = get_spark("probe_r10")
    import os
    if not os.path.exists(os.path.join(DST, "documents.parquet")):
        build(spark)
    qs = dict(entry.queries())
    qs["chat_conv10"] = q_chat_conv10

    def run(fn, sf):
        fn(spark, sf).write.mode("overwrite").format("noop").save()

    def best_of(fn, sf, k=2):
        best = float("inf")
        for _ in range(k):
            t0 = time.monotonic()
            run(fn, sf)
            best = min(best, time.monotonic() - t0)
        return best

    for n in ["pack_training_rows", "chat_training_text", "chat_conv10"]:
        fn = qs[n]
        run(fn, "/root/testdata/sf0.01")  # compile warm
        a = best_of(fn, SRC)
        b = best_of(fn, DST)
        print(f"{n:24s} sf0.1 {a:6.2f}s  10x {b:6.2f}s  "
              f"ratio {b / a:5.2f}x", flush=True)


if __name__ == "__main__":
    main()


def q_chat_tree_conv50(spark, sf_dir):
    """q_chat_tree_paths re-keyed at realistic tree size: conv = doc_id
    // 50 (fixed ~50-node trees), so 10x documents = 10x MORE trees of
    the same size — the real-corpus shape (reply trees are
    conversation-sized; the 5-key fixture makes one tree grow with the
    corpus, which compounds the O(N) in-row map lookup into N^2)."""
    from pyspark.sql import Window
    from akka_stream_contrib_spark.functions.corpus import chat_tree_paths
    docs = (tables.load(spark, "documents", sf_dir)
            .filter(F.col("text").isNotNull()))
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    tree = (docs.select((F.col("doc_id") / 50).cast("long").alias("conv_id"),
                        "doc_id",
                        F.substring("text", 1, 40).alias("content"))
            .withColumn("node_id", F.row_number().over(w).cast("long"))
            .select("conv_id", "node_id",
                    F.when(F.col("node_id") > 1,
                           F.floor(F.col("node_id") / 2)).cast("long")
                    .alias("parent_id"),
                    F.when(F.col("node_id") % 2 == 1, "user")
                    .otherwise("assistant").alias("role"),
                    "content"))
    out = tree.transform(chat_tree_paths(max_depth=16))
    return out.select(
        "conv_id", "leaf_id", "depth",
        F.expr("array_join(transform(turns, "
               "x -> x.role || ':' || x.content), '|')").alias("path_text"),
        "truncated")


def probe_tree() -> None:
    spark = get_spark("probe_r10_tree")
    import os
    if not os.path.exists(os.path.join(DST, "documents.parquet")):
        build(spark)

    def best_of(fn, sf, k=2):
        best = float("inf")
        for _ in range(k):
            t0 = time.time()
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    q_chat_tree_conv50(spark, "/root/testdata/sf0.01") \
        .write.mode("overwrite").format("noop").save()
    a = best_of(q_chat_tree_conv50, SRC)
    b = best_of(q_chat_tree_conv50, DST)
    print(f"chat_tree_conv50         sf0.1 {a:6.2f}s  10x {b:6.2f}s  "
          f"ratio {b / a:5.2f}x", flush=True)
