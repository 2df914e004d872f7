"""Repeated-evaluation source.

Re-expresses ``SourceRepeatEval`` (reference SourceRepeatEval.scala:39-60):
repeatedly invoke ``gen_element`` producing an infinite stream; cancellable
via the materialized handle. Spark form: the ``rate`` streaming source
provides the infinite tick stream (backpressure = rowsPerSecond); a
deterministic generator expression/UDF maps each tick to an element; the
reference's ``Cancellable`` is the ``StreamingQuery`` handle (``stop()``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def repeat_eval_stream(spark: SparkSession, gen: Callable[[Column], Column],
                       rows_per_second: int = 100) -> DataFrame:
    """Streaming DataFrame of generated elements: schema
    (seq bigint, ts timestamp, element <gen's type>). ``gen`` receives the
    tick index column — keep it a pure Column expression so generation stays
    JVM-side; wrap a pandas_udf for Python generators."""
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "seq")
        .withColumnRenamed("timestamp", "ts")
    )
    return ticks.withColumn("element", gen(F.col("seq")))
