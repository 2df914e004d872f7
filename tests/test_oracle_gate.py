"""Full driver-gate replica as a pytest (opt-in: slow).

Run with ``SPARK_GRAFT_FULL=1 python -m pytest tests/test_oracle_gate.py`` to
execute every queries() entry against its DuckDB oracle at sf0.001 — exactly
what the driver does at sf0.01.
"""

from __future__ import annotations

import os

import pytest

from tests.oracle_check import run_all


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_FULL") != "1",
                    reason="slow full-gate check; set SPARK_GRAFT_FULL=1")
def test_all_queries_match_oracles():
    failures = run_all("/root/testdata/sf0.001")
    assert not failures, f"oracle mismatches: {failures}"


def test_replica_catches_unpinned_integer_sum(spark):
    """The r1/r3 blind spot: DuckDB SUM(int) is HUGEINT → pandas float64,
    Spark gives int64, and the driver hashes the pandas rendering (5.0 != 5).
    The replica must go RED on an unpinned SUM and GREEN once pinned, even
    though fetchall() values are identical either way."""
    from tests.oracle_check import compare_query

    def q(spark, sf_dir):
        from pyspark.sql import functions as F
        return (spark.read.parquet(f"{sf_dir}/events.parquet")
                .groupBy("event_type")
                .agg(F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
                     .alias("n_high")))

    unpinned = """
        SELECT event_type,
               sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS n_high
        FROM events GROUP BY event_type
    """
    pinned = """
        SELECT event_type,
               CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_high
        FROM events GROUP BY event_type
    """
    sf = "/root/testdata/sf0.001"
    ok_red, msg_red = compare_query(spark, "unpinned_sum", q, unpinned, sf)
    assert not ok_red and "PANDAS-DTYPE" in msg_red, msg_red
    ok_green, msg_green = compare_query(spark, "pinned_sum", q, pinned, sf)
    assert ok_green, msg_green
