"""Time-series regularization: resample each key onto a fixed-step grid and
forward-fill the last observation.

The standard feature-engineering prep for event streams feeding training
pipelines (models want regular time steps; events arrive irregularly).
Scale shape: grid generation is per-key `sequence()` + explode (map-side
after one tiny bounds aggregate), and the fill is ONE window pass over a
single hash shuffle on the key — the same union trick as
`operators/asof.py::as_of_join` (reference analogue: KeepAliveConcat's
extrapolate-on-idle, `KeepAliveConcat.scala:54-61`, with event-time grid
ticks instead of wall-clock timers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import epoch_micros


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    step: str = "interval 1 day",
    align: str = "day",
) -> DataFrame:
    """Per ``key``: emit one row per ``step`` from ``date_trunc(align,
    min(ts))`` through ``max(ts)``, carrying the most recent observation at
    or before each grid instant (null until the first observation).

    Output: (key, grid_ts, value_ffill). Observations sort before the grid
    tick at the same instant, so an exact-time observation fills its own
    tick; ties among observations break on the ordering of ``value`` rows'
    original positions being irrelevant — supply unique (key, ts) or accept
    the max-position row.
    """
    bounds = df.groupBy(key).agg(
        F.date_trunc(align, F.min(ts)).alias("_mn"), F.max(ts).alias("_mx"))
    grid = bounds.select(
        key, F.explode(F.expr(f"sequence(_mn, _mx, {step})")).alias(ts))
    obs = df.select(key, ts, F.col(value).alias("_v"), F.lit(0).alias("_src"))
    ticks = grid.select(key, ts, F.lit(None).cast(obs.schema["_v"].dataType).alias("_v"),
                        F.lit(1).alias("_src"))
    w = (Window.partitionBy(key).orderBy(ts, "_src")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        obs.unionByName(ticks)
        .withColumn("_fill", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select(key, F.col(ts).alias("grid_ts"), F.col("_fill").alias("value_ffill"))
    )


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    step: str = "interval 1 day",
    align: str = "day",
) -> DataFrame:
    """Per ``key``: resample onto the same grid as :func:`resample_ffill` but
    fill interior gaps by LINEAR interpolation between the surrounding
    observations (grid ticks before the first / after the last observation
    carry the nearest observation, matching pandas ``interpolate`` +
    edge-fill). Output: (key, grid_ts, value_interp).

    Same single-shuffle scale shape as ``resample_ffill``: the union of
    observations and grid ticks makes TWO window passes over ONE hash
    partitioning on ``key`` (backward pass = last-non-null + its timestamp;
    forward pass = the mirrored first-following), then the blend is a pure
    row-local expression — epoch-second arithmetic, no UDFs, no re-shuffle
    between the passes (same partitioning, Spark reuses the exchange).
    """
    bounds = df.groupBy(key).agg(
        F.date_trunc(align, F.min(ts)).alias("_mn"), F.max(ts).alias("_mx"))
    grid = bounds.select(
        key, F.explode(F.expr(f"sequence(_mn, _mx, {step})")).alias(ts))
    obs = df.select(key, ts, F.col(value).cast("double").alias("_v"),
                    F.lit(0).alias("_src"))
    ticks = grid.select(key, ts, F.lit(None).cast("double").alias("_v"),
                        F.lit(1).alias("_src"))
    wb = (Window.partitionBy(key).orderBy(ts, "_src")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key).orderBy(ts, "_src")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_ts = F.when(F.col("_src") == 0, F.col(ts))
    sec = lambda c: epoch_micros(c).cast("double")  # noqa: E731  (NTZ-safe)
    u = (obs.unionByName(ticks)
         .withColumn("_pv", F.last("_v", ignorenulls=True).over(wb))
         .withColumn("_pt", F.last(obs_ts, ignorenulls=True).over(wb))
         .withColumn("_nv", F.first("_v", ignorenulls=True).over(wf))
         .withColumn("_nt", F.first(obs_ts, ignorenulls=True).over(wf)))
    frac = ((sec(F.col(ts)) - sec(F.col("_pt")))
            / (sec(F.col("_nt")) - sec(F.col("_pt"))))
    interp = (F.when(F.col("_pt").isNull(), F.col("_nv"))
              .when(F.col("_nt").isNull(), F.col("_pv"))
              .when(F.col("_nt") == F.col("_pt"), F.col("_pv"))
              .otherwise(F.col("_pv")
                         + frac * (F.col("_nv") - F.col("_pv"))))
    return (u.filter(F.col("_src") == 1)
            .select(key, F.col(ts).alias("grid_ts"),
                    F.round(interp, 6).alias("value_interp")))


def ohlc_resample(key: str = "user_id", ts: str = "ts", value: str = "value",
                  seq: str = "event_id", bucket_s: int = 3600,
                  ) -> Callable[[DataFrame], DataFrame]:
    """Downsample a value stream into OHLC candles per key and time bucket:
    (key, bucket_start, open, high, low, close, n) — the canonical
    time-series compaction (tick → bar) that turns an unbounded event
    stream into a bounded summary table.

    Open/close are order-sensitive: they pick the value at the min/max of
    (ts, seq) inside the bucket — expressed as min/max over a packed
    struct, so the whole operator is ONE partial-aggregated groupBy on
    (key, bucket): no windows, no second shuffle, streaming-friendly (the
    same aggregate runs under a watermark). High/low/count are plain
    aggregates. Money values go through the exact decimal cast per the repo
    convention.
    """

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import epoch_micros
        bucket = (epoch_micros(ts) / F.lit(1_000_000)).cast("bigint")
        bucket = (bucket - bucket % F.lit(bucket_s)).alias("bucket_start_s")
        v = F.col(value).cast("decimal(18,4)")
        packed = F.struct(F.col(ts).alias("_t"), F.col(seq).alias("_q"),
                          v.alias("_v"))
        return (df.groupBy(F.col(key).alias("key"), bucket)
                .agg(F.min(packed).alias("_first"),
                     F.max(packed).alias("_last"),
                     F.max(v).alias("high"),
                     F.min(v).alias("low"),
                     F.count(F.lit(1)).alias("n"))
                .select("key", "bucket_start_s",
                        F.col("_first._v").cast("double").alias("open"),
                        "high", "low",
                        F.col("_last._v").cast("double").alias("close"),
                        "n")
                .withColumn("high", F.col("high").cast("double"))
                .withColumn("low", F.col("low").cast("double")))

    return _apply


def vwap_resample(key: str = "user_id", ts: str = "ts", price: str = "value",
                  qty: str | None = None, bucket_s: int = 3600,
                  ) -> Callable[[DataFrame], DataFrame]:
    """Volume-weighted average price per key and bucket —
    ``Σ(price·qty)/Σ(qty)`` with exact decimal numerator/denominator (the
    money-sum convention), one partial-aggregated groupBy like
    :func:`ohlc_resample`. ``qty=None`` weights every tick equally (plain
    time-bucket mean, but order-independent-exact unlike avg())."""

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import epoch_micros
        bucket = (epoch_micros(ts) / F.lit(1_000_000)).cast("bigint")
        bucket = (bucket - bucket % F.lit(bucket_s)).alias("bucket_start_s")
        p = F.col(price).cast("decimal(18,4)")
        q = F.col(qty).cast("decimal(18,4)") if qty else F.lit(1).cast(
            "decimal(18,4)")
        return (df.groupBy(F.col(key).alias("key"), bucket)
                .agg(F.sum(p * q).alias("_pq"), F.sum(q).alias("_q"),
                     F.count(F.lit(1)).alias("n"))
                .select("key", "bucket_start_s",
                        (F.round(F.col("_pq") / F.col("_q"), 6)
                         .cast("double")).alias("vwap"),
                        F.col("_q").cast("double").alias("total_qty"), "n"))

    return _apply


def dedup_within(key_cols, ts: str = "ts", within_s: int = 60,
                 seq: str = "event_id") -> Callable[[DataFrame], DataFrame]:
    """Time-windowed event dedup (debounce) — drop repeats of the same key
    arriving within ``within_s`` seconds of the last KEPT occurrence: the
    at-most-once-per-interval hygiene filter in front of metrics/alerting.

    The recurrence (the threshold anchor resets only on kept events) is
    inherently sequential, so this is a grouped Arrow state-machine scan —
    the same shape as the `streaming/stateful.py` operators' batch twins:
    ONE shuffle on the key, a per-key ordered pass in numpy, state = a
    single anchor timestamp. Emits every row with a ``kept`` flag (filter
    on it to drop); exact, not a lag approximation (a lag filter re-admits
    a burst's third event when the second was dropped).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def _apply(df: DataFrame) -> DataFrame:
        from akka_stream_contrib_spark.util import epoch_micros

        us = within_s * 1_000_000
        d = (df.withColumn("_t", epoch_micros(ts))
             .repartition(*key_cols)
             .sortWithinPartitions(*key_cols, "_t", seq))
        fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in d.schema.fields)

        # mapInPandas over key-partitioned, key-sorted rows instead of
        # applyInPandas-per-group: one python scan per BATCH (anchor state
        # carried across batches inside the partition iterator), not one
        # pandas frame per key — measured 8.6 s -> ~1 s at sf0.1 with 1000
        # keys. Arrow batches arrive in partition order, so the carry is
        # sound; a key never spans partitions (hash repartition on the key).
        def _scan(batches):
            import pandas as pd  # noqa: F401 (arrow worker import)
            prev_key = None
            anchor = 0
            for pdfb in batches:
                n = len(pdfb)
                if n == 0:
                    continue
                # canonicalize missing keys: Spark NULL arrives as NaN in
                # numeric pandas columns, and NaN != NaN would make every
                # NULL-key row open a fresh anchor (no debounce at all)
                keys = list(zip(*(
                    [None if pd.isna(x) else x for x in pdfb[k].tolist()]
                    for k in key_cols)))
                t = pdfb["_t"].tolist()
                kept = [False] * n
                for i in range(n):
                    ki = keys[i]
                    if ki != prev_key:
                        prev_key = ki
                        anchor = t[i]
                        kept[i] = True
                    elif t[i] - anchor >= us:
                        anchor = t[i]
                        kept[i] = True
                pdfb = pdfb.copy()
                pdfb["kept"] = kept
                yield pdfb

        out = d.mapInPandas(_scan, schema=f"{fields}, kept boolean")
        return out.drop("_t")

    return _apply
