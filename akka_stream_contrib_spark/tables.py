"""Loaders for the driver-generated parquet fixtures (see /root/repo/TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings. Each loader is a plain ``spark.read.parquet`` so Catalyst gets full
predicate pushdown / column pruning on the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: memoized analyzed plans per (app, dir, table, file identity, tz): a
#: DataFrame is an immutable logical plan, so reusing one across queries is
#: safe and skips the per-load parquet footer/schema read plus the py4j
#: round-trips of the normalization selects — measured ~0.1 s per query of
#: the bench's per-query floor (build-side). File mtime+size in the key
#: drops stale entries when a fixture tree is regenerated in-process.
_LOAD_CACHE: dict[tuple, DataFrame] = {}


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        ident = (st.st_mtime_ns, st.st_size)
    except OSError:
        ident = None
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name,
           ident, spark.conf.get("spark.sql.session.timeZone", "UTC"))
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark cannot represent:
        # without this (runtime-settable) flag the scan throws
        # PARQUET_TYPE_ILLEGAL. Set here, not only in session.py — the driver
        # gate runs these loaders under ITS OWN SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    # Normalize every datetime column to TIMESTAMP_NTZ — the canonical type
    # for these fixtures. The driver's session reads the parquet TIMESTAMP
    # logical type as NTZ already; the casts below only fire on the fallback
    # paths (nanos-as-long bigint, or an LTZ read under a legacy conf) so the
    # engine sees ONE dtype everywhere regardless of the hosting session.
    # DuckDB reads the same files as naive TIMESTAMP, so NTZ wall-clock
    # values compare 1:1 with the oracle with no session-timezone term.
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    if any(t == "timestamp" for _, t in df.dtypes) and tz not in ("UTC", "Etc/UTC", "GMT"):
        import warnings
        warnings.warn(
            f"tables.load: session timeZone={tz!r} — the LTZ→NTZ fallback "
            "casts below render wall-clock in THAT zone, shifting every "
            "timestamp relative to the UTC-naive oracle values; set "
            "spark.sql.session.timeZone=UTC for oracle parity",
            RuntimeWarning, stacklevel=2)
    for col, dtype in df.dtypes:
        if name == "events" and col == "ts" and dtype == "bigint":
            # nanos-as-long: truncate to microseconds (oracle CASTs identically)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000"))
                               .cast("timestamp_ntz"))
        elif dtype == "timestamp":
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    _LOAD_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load(spark, t, sf_dir) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql(...) use."""
    for t in TABLE_NAMES:
        load(spark, t, sf_dir).createOrReplaceTempView(t)
