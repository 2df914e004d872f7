"""Document ingestion from JSONL with explicit corrupt-record routing.

The front door of a 100 TB text pipeline is billions of JSONL lines of
uneven quality; silently dropping malformed records (DROPMALFORMED) loses
data and silently nulling them (default PERMISSIVE without inspection)
poisons downstream stats. `read_jsonl_docs` reads with an EXPLICIT schema
(never inference — schema inference is a full extra pass over 100 TB) plus
a corrupt-record capture column, and splits the frame into (good, bad) so
the pipeline can quarantine and count failures — the same
valid-path/error-path split as `functions/errors.py::try_transform`,
applied at the source.

Reference anchor: source-shaped like `FileTailSource`/`DirectoryChanges`
(sources feeding a typed stream); error routing mirrors the reference's
divertTo pattern in its test suites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_jsonl_docs(spark: SparkSession, path: str, schema: str,
                    multiline: bool = False) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with the given DDL ``schema``; returns
    ``(good, bad)``: good rows typed to the schema (corrupt column
    dropped), bad rows as (raw ``_corrupt_record`` text) for quarantine.

    Scale notes: explicit schema = single scan, predicate/column pruning
    intact; the corrupt column materializes only for rows that fail to
    parse. Spark requires the corrupt frame to be materialized before
    filtering on the corrupt column alone — handled with a per-batch
    cache (see inline note)."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (spark.read.schema(full_schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CORRUPT_COL)
          .option("multiLine", "true" if multiline else "false")
          .json(path))
    # Spark disallows queries referencing ONLY the corrupt column of a raw
    # json scan (SPARK-21610 / QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    # documented pattern is to materialize the parsed frame first. The
    # cache is per-ingest-batch working state registered with
    # pipeline_cache (a bare .cache() pinned it for the session); a
    # continuous 100 TB ingest does this split inside foreachBatch where
    # the batch is already materialized.
    from akka_stream_contrib_spark.util import pipeline_cache
    df = pipeline_cache(df)
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = (df.filter(df[CORRUPT_COL].isNotNull())
           .select(df[CORRUPT_COL].alias("raw")))
    return good, bad


def ingest_report(good: DataFrame, bad: DataFrame) -> DataFrame:
    """One-row ingest summary (n_good, n_bad, bad_rate) — run it as the
    gate on every ingest batch."""
    from pyspark.sql import functions as F
    g = good.agg(F.count(F.lit(1)).alias("n_good"))
    b = bad.agg(F.count(F.lit(1)).alias("n_bad"))
    # an EMPTY batch is 0/0 — a plain `/` raises under ANSI, and a NULL
    # rate would make a `bad_rate > t` gate silently pass. try_divide +
    # coalesce pins it to 0.0 so the gate is well-defined on empty input.
    return (g.crossJoin(b)
            .select("n_good", "n_bad",
                    F.coalesce(
                        F.round(F.try_divide(
                            F.col("n_bad"),
                            F.col("n_good") + F.col("n_bad")), 6),
                        F.lit(0.0)).alias("bad_rate")))
