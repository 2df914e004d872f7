"""10x scale probe: replicate the sf0.1 fixtures tenfold (disjoint key
ranges; replica-perturbed document text so near-dup structure is real) into
.scratch/sf1/, then time representative heavy queries at both scales.

The probe answers the "would this survive 100x?" question EMPIRICALLY one
decade at a time: a query whose wall-clock grows ~linearly (10x) has a
data-bound plan; sublinear growth means fixed cost still dominates and the
plan has headroom. Results are recorded in SCALE.md ("Measured 10x beyond
the bench SF"); the scratch dataset is disposable (gitignored) — rerun this
script to recreate it.

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from akka_stream_contrib_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf1"
REP = 10
PASS_THROUGH = ["region", "nation", "customer", "supplier", "part",
                "orders"]
DEFAULT_QUERIES = [
    "q1_pricing_summary", "q6_forecast_revenue", "quality_score",
    "bm25_search", "auc_roc", "active_users", "dedup_exact",
    "minhash_lsh_dedup", "hits_scores", "bigram_logprob",
]


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in PASS_THROUGH:
        p = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(p):
            shutil.copy(os.path.join(SRC, f"{t}.parquet"), p)

    def scale(table, key_offsets, text_perturb=None):
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        reps = []
        for k in range(REP):
            r = df
            for col, span in key_offsets.items():
                r = r.withColumn(col, F.col(col) + F.lit(k * span))
            if text_perturb and k > 0:
                # replicas become genuine near-dups of their original —
                # dedup probes run against 10x data AND ~10x dup density
                r = r.withColumn(text_perturb,
                                 F.concat(F.col(text_perturb),
                                          F.lit(f" rep{k}")))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        # 32 output files: scan parallelism matches the core count (the
        # single-file sf0.1 fixtures cap split parallelism — see SCALE.md)
        (out.repartition(32).write.mode("overwrite")
         .parquet(os.path.join(DST, f"{table}.parquet")))

    scale("events", {"event_id": 10_000_000, "user_id": 100_000})
    scale("documents", {"doc_id": 10_000_000}, text_perturb="text")
    scale("lineitem", {"l_orderkey": 100_000_000})
    # replicas carry IDENTICAL vectors under offset ids, so cross-replica
    # near-dup pairs are REAL (cos = 1 twins plus every original pair at
    # 10x multiplicity): threshold-join OUTPUT grows ~quadratically in
    # replication by construction — the probe's wall-clock reads compute
    # growth, its row count reads that inherent output blow-up
    scale("embeddings", {"vec_id": 10_000})


def main() -> None:
    spark = get_spark("scale_probe")
    emb = os.path.join(DST, "embeddings.parquet")
    if os.path.isfile(emb):  # pre-r8 probe trees copied embeddings verbatim
        os.remove(emb)
    if (not os.path.exists(os.path.join(DST, "lineitem.parquet"))
            or not os.path.exists(emb)):
        build(spark)
    queries = sys.argv[1:] or DEFAULT_QUERIES
    qs = entry.queries()

    def run(n, sf):
        qs[n](spark, sf).write.mode("overwrite").format("noop").save()

    def best_of(n, sf, k=2):
        best = float("inf")
        for _ in range(k):
            t0 = time.monotonic()
            run(n, sf)
            best = min(best, time.monotonic() - t0)
        return best

    for n in queries:
        run(n, "/root/testdata/sf0.01")  # compile warm
        a = best_of(n, SRC)
        b = best_of(n, DST)
        print(f"{n:24s} sf0.1 {a:6.2f}s  10x {b:6.2f}s  "
              f"ratio {b / a:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
