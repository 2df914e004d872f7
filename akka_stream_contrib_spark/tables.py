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


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark cannot represent:
        # without this (runtime-settable) flag the scan throws
        # PARQUET_TYPE_ILLEGAL. Set here, not only in session.py — the driver
        # gate runs these loaders under ITS OWN SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # truncate the nanos-as-long column to microsecond TimestampType. The
    # DuckDB oracle side truncates identically with CAST(ts AS TIMESTAMP).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load(spark, t, sf_dir) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql(...) use."""
    for t in TABLE_NAMES:
        load(spark, t, sf_dir).createOrReplaceTempView(t)
