"""Interval-overlap join: pair rows whose half-open time intervals
[start, end) intersect, without a cross join.

Reference anchor: none directly — the reference has no joins at all
(SURVEY.md §2.7); this extends the engine's join family (range join,
as-of join) with the two-sided interval case every event-log /
availability / campaign workload needs.

Scale shape (100 TB): the naive formulation ``l JOIN r ON ls < re AND
rs < le`` has no equi conjunct, so Spark plans BroadcastNestedLoopJoin /
cartesian — quadratic and unusable. The bucketed form explodes each
interval into coarse time buckets of width ``w`` and joins on the bucket
id (plus any user equi keys), turning the overlap join into a standard
hash-partitioned equi join whose fan-out is ``interval_length / w`` per
row. Each overlapping pair would match in every shared bucket, so the
join keeps only the bucket containing ``greatest(l_start, r_start)`` —
the *match-once trick*: exactly one surviving bucket per pair, no
post-join ``distinct`` (a full extra shuffle saved).

Pick ``w`` near the typical interval length: fan-out stays O(1) while
bucket population stays bounded. Skewed buckets (one hot day) are
ordinary join skew — AQE skew-split applies.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from akka_stream_contrib_spark.util import epoch_micros


def _bucket(col: Column, width_s: int) -> Column:
    # integer bucket id from wall-clock epoch micros (NTZ-safe; unix_timestamp
    # rejects/coerces TIMESTAMP_NTZ); floor division handles negatives
    return F.floor(epoch_micros(col) / F.lit(width_s * 1_000_000)).cast("bigint")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width_s: int = 86400,
    equi_keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on half-open interval overlap
    (``l_start < r_end AND r_start < l_end``), optionally ANDed with
    equality on ``equi_keys`` (columns present in both sides).

    Both inputs keep all their columns (name collisions other than
    ``equi_keys`` must be resolved by the caller). Zero-length or inverted
    intervals (start >= end) never match — consistent with half-open
    semantics. Only ``how='inner'`` is supported (outer overlap joins
    need the unmatched-row union; compose with an anti join if needed).
    """
    if how != "inner":
        raise ValueError("interval_overlap_join supports only how='inner'")
    lb = F.sequence(_bucket(F.col(l_start), bucket_width_s),
                    _bucket(F.col(l_end), bucket_width_s))
    rb = F.sequence(_bucket(F.col(r_start), bucket_width_s),
                    _bucket(F.col(r_end), bucket_width_s))
    # inverted intervals can never match (half-open) — drop them BEFORE the
    # explode so a descending F.sequence can't fan out garbage rows
    l = (left.filter(F.col(l_start) < F.col(l_end))
         .withColumn("_ivj_bucket", F.explode(lb)))
    r = (right.filter(F.col(r_start) < F.col(r_end))
         .withColumn("_ivj_bucket", F.explode(rb)))
    cond = (F.col(f"l.{l_start}") < F.col(f"r.{r_end}")) \
        & (F.col(f"r.{r_start}") < F.col(f"l.{l_end}"))
    # match-once trick: keep the pair only in the bucket that contains the
    # later of the two starts — each overlapping pair survives exactly once
    cond = cond & (
        F.col("l._ivj_bucket")
        == _bucket(F.greatest(F.col(f"l.{l_start}"), F.col(f"r.{r_start}")),
                   bucket_width_s))
    on = F.col("l._ivj_bucket") == F.col("r._ivj_bucket")
    for k in equi_keys:
        on = on & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    out = (
        l.alias("l").join(r.alias("r"), on, how="inner")
        .filter(cond)
        .drop("_ivj_bucket")  # drops both sides' helper column
    )
    # a Column join condition keeps BOTH sides' equi-key columns with the
    # same name — selecting the key downstream would raise
    # AMBIGUOUS_REFERENCE; keep the left one (values are equal by the join)
    for k in equi_keys:
        out = out.drop(F.col(f"r.{k}"))
    return out
