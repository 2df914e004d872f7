"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL. Column names and
rounding are aligned on both sides (the driver hash-compares values).

Numeric-determinism conventions used throughout:
- unordered SUM over doubles is engine-order-dependent → money sums are cast
  to DECIMAL(18,4) per row (exact, associative) and the exact decimal result
  is cast back to double; derived averages divide the two exact values.
- ordered running sums are sequential in both engines → plain double + round.
- modulo / casts avoid engine differences (DuckDB CAST(double AS INT) rounds,
  Spark truncates) by flooring first.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from akka_stream_contrib_spark import tables
from akka_stream_contrib_spark.operators import (
    accumulate,
    accumulate_while_unchanged,
    delay_flow,
    interval_based_rate_limiter,
    keep_alive_concat,
    last_element,
    merge_by_index,
    partition_with,
    pass_through,
    pulse,
    retry,
    sample_nth,
    sample_step,
    session_window_agg,
    sliding_window,
    time_window,
    timed_interval_between,
    token_throttle,
    unfold_flow,
    feedback_loop,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, "events", sf_dir).withColumn("seq", F.col("event_id"))


def _dec(col):
    """Exact-sum path for money columns (see module docstring)."""
    return col.cast("decimal(18,4)")


def _ts(s: str):
    """Date literal as TIMESTAMP_NTZ — the fixtures' datetime columns are NTZ
    (see tables.load), so an LTZ (``cast("timestamp")``) literal would compare
    through an implicit session-timezone conversion and shift boundaries under
    a non-UTC hosting session. NTZ vs NTZ has no timezone term at all."""
    return F.lit(s).cast("timestamp_ntz")


def _money(name: str):
    """2-decimal money/quantity column cast to decimal BEFORE arithmetic:
    casting the raw 2-dp value is boundary-safe in both engines, and decimal
    multiplication/addition is exact, so aggregate results are bit-identical
    regardless of summation order. Casting a double *product* instead would
    hit engine-specific half-way rounding (Spark shortest-string HALF_UP vs
    DuckDB binary-value rounding)."""
    return F.col(name).cast("decimal(12,2)")


def _pct(name: str):
    """2-dp fraction column (discount/tax) as exact decimal."""
    return F.col(name).cast("decimal(4,2)")


# ---------------------------------------------------------------------------
# §2.2 per-element transforms
# ---------------------------------------------------------------------------

def q_sample_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(sample_nth(10, seq="seq"))
        .select("event_id", "user_id", "event_type", "value")
    )


def q_sample_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(sample_step(10, seq="seq"))
        .select("event_id", "user_id", "value")
    )


def q_sample_step_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sequential Sample(next) replay (operators/sample.py::
    sample_step_replay — closes the one documented Sample deviation): the
    i-th LCG draw consumes ((i*48271) % 65536) % 40 + 1 elements of the
    event_id order and emits the one it lands on; positions replayed
    driver-side, data side = global rank + broadcast semi-join. The
    oracle replays the same recurrence as a DuckDB recursive CTE."""
    from akka_stream_contrib_spark.operators import sample_step_replay
    ev = tables.load(spark, "events", sf_dir)
    step = lambda i: ((i * 48271) % 65536) % 40 + 1  # noqa: E731
    return (ev.transform(sample_step_replay(step, seq="event_id"))
            .select("event_id", "user_id", "value"))


def q_motif_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence similarity search over each user's value
    series (operators/timeseries.py::znorm_motif_topk; EDBT-2019
    streaming-similarity family): top-50 length-8 windows best matching an
    up-down query shape — one key shuffle, lead-column windows, codegen
    distance, TakeOrdered."""
    from akka_stream_contrib_spark.operators import znorm_motif_topk
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(znorm_motif_topk(_MOTIF_PATTERN, k=50))


_MOTIF_PATTERN = [0.0, 1.0, 2.0, 1.0, 0.0, -1.0, -2.0, -1.0]


def _motif_oracle(k: int = 50) -> str:
    """DuckDB mirror of q_motif_search: the SAME z-normalized query doubles
    (repr round-trips exactly) and the SAME left-associated mean/variance/
    distance chains, so the rounded distances are bit-identical."""
    from akka_stream_contrib_spark.operators import znorm_query
    q = znorm_query(_MOTIF_PATTERN)
    L = len(q)
    leads = ",\n                       ".join(
        f"lead(value, {j}) OVER (PARTITION BY user_id ORDER BY event_id) AS v{j}"
        if j else "value AS v0"
        for j in range(L))
    mean = "v0"
    for j in range(1, L):
        mean += f" + v{j}"
    var = "(v0 - m) * (v0 - m)"
    for j in range(1, L):
        var += f" + (v{j} - m) * (v{j} - m)"
    # CAST('<repr>' AS DOUBLE) = correctly-rounded parse (bare 17-digit
    # literals go through DECIMAL and can land 1 ulp off)
    dist = " + ".join(
        f"((v{j} - m) / sd - CAST('{q[j]!r}' AS DOUBLE))"
        f" * ((v{j} - m) / sd - CAST('{q[j]!r}' AS DOUBLE))"
        for j in range(L))
    return f"""
        WITH lagged AS (
            SELECT user_id, event_id,
                       {leads}
            FROM events
        ), stats AS (
            SELECT user_id, event_id, v0{"".join(f", v{j}" for j in range(1, L))},
                   ({mean}) / {float(L)!r} AS m
            FROM lagged WHERE v{L-1} IS NOT NULL
        ), sds AS (
            SELECT *, sqrt(({var}) / {float(L)!r}) AS sd FROM stats
        )
        SELECT user_id, event_id, round({dist}, 6) + 0.0 AS dist
        FROM sds WHERE sd > 0
        ORDER BY dist, user_id, event_id
        LIMIT {k}
    """


def q_partition_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.transform(
        partition_with(
            F.col("value") >= 100,
            left={"left_val": F.col("value") * 2},
            right={"right_tag": F.upper(F.col("event_type"))},
        )
    ).select("event_id", "side", "left_val", "right_tag")


def q_pass_through(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.transform(
        pass_through({"out_tag": F.concat_ws(":", "event_type", F.col("user_id").cast("string"))})
    ).select("event_id", "user_id", "event_type", "value", "out_tag")


def q_delay_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    delay_s = F.pmod(F.floor(F.col("value")), F.lit(10))
    return ev.transform(delay_flow(delay_s, ts="ts")).select(
        "event_id", "ts", "deliver_ts"
    )


# ---------------------------------------------------------------------------
# §2.3 accumulation / grouping / windowing
# ---------------------------------------------------------------------------

def q_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # decimal input: the unkeyed fold runs on the distributed range-prefix
    # path (global_running_agg), whose per-range grouping must not perturb
    # IEEE association — decimal sums are associative, so the result is
    # exact and engine-independent
    return (
        _events(spark, sf_dir)
        .withColumn("value_dec", _dec(F.col("value")))
        .transform(accumulate(F.sum("value_dec"), out="running_sum", seq="seq"))
        .select("event_id",
                F.round("running_sum", 4).cast("double").alias("running_sum"))
    )


def q_accumulate_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(accumulate(F.sum("value"), out="running_sum", seq="seq",
                              partition_by=["user_id"]))
        .select("event_id", "user_id", F.round("running_sum", 4).alias("running_sum"))
    )


def q_accumulate_while_unchanged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(
            accumulate_while_unchanged(
                "event_type",
                [
                    F.count(F.lit(1)).alias("cnt"),
                    # unordered double sum inside each island → decimal-exact
                    # per the module's money-sum convention (driver hash-safe)
                    F.round(F.sum(_dec(F.col("value"))), 4).cast("double").alias("sum_value"),
                    F.min("seq").alias("first_seq"),
                ],
                seq="seq",
            )
        )
        .select("grp", "event_type", "cnt", "sum_value", "first_seq")
    )


def q_last_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(last_element(seq="seq"))
        .select("event_id", "user_id", "event_type", "value")
    )


def q_timed_interval_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(timed_interval_between(F.col("event_type") == "click", ts="ts", seq="seq"))
        .select("event_id", "interval_us")
    )


def q_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(
            time_window(
                "1 hour",
                [F.count(F.lit(1)).alias("cnt"), F.round(F.sum(_dec(F.col("value"))), 4).cast("double").alias("sum_value")],
                ts="ts",
            )
        )
        .select("window_start", "cnt", "sum_value")
    )


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(
            sliding_window(
                "1 hour",
                "30 minutes",
                [F.count(F.lit(1)).alias("cnt"), F.round(F.sum(_dec(F.col("value"))), 4).cast("double").alias("sum_value")],
                ts="ts",
            )
        )
        .select("window_start", "cnt", "sum_value")
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(
            session_window_agg(
                "10 minutes",
                [F.count(F.lit(1)).alias("cnt"), F.round(F.sum(_dec(F.col("value"))), 4).cast("double").alias("sum_value")],
                ts="ts",
                partition_by=["user_id"],
            )
        )
        .select("user_id", "session_start", "cnt", "sum_value")
    )


def q_rate_limiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(interval_based_rate_limiter("1 minute", 50, ts="ts", seq="seq"))
        .select("bucket_start", "batch_no", "batch_size", "first_seq", "last_seq")
    )


def q_pulse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(pulse("1 minute", ts="ts", tiebreak="seq"))
        .select(F.col("bucket_start"), "event_id", "value")
    )


def q_keep_alive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .transform(
            keep_alive_concat(21600, ["value"], ts="ts", partition_by=["user_id"])
        )
        .select("user_id", "ts", "value", "is_heartbeat")
    )


# ---------------------------------------------------------------------------
# §2.4 fan-in + §2.5 control flow
# ---------------------------------------------------------------------------

def q_merge_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("branch", F.pmod(F.col("event_id"), F.lit(3)).cast("int"))
    branches = [ev.filter(F.col("branch") == k) for k in range(3)]
    merged = merge_by_index(branches, index="event_id", validate="raise", rank_col="rnk")
    return merged.select("event_id", "branch", "rnk")


def q_token_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # explicit bigint pinning on both cost and cum_cost so no engine/session
    # type-coercion wiggle survives into the driver hash (VERDICT r1 §4)
    cost = (F.pmod(F.floor(F.col("value")), F.lit(5)) + F.lit(1)).cast("bigint")
    return (
        ev.transform(token_throttle(cost, total_tokens=15000, seq="seq"))
        .select("event_id",
                F.col("cost").cast("bigint").alias("cost"),
                F.col("cum_cost").cast("bigint").alias("cum_cost"))
    )


def q_token_throttle_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed form (per-user token budget): the scale-showcase variant — the
    cumulative window partitions on user_id, so there is no single-partition
    global sort anywhere in the plan (VERDICT r1 §10)."""
    ev = _events(spark, sf_dir)
    cost = (F.pmod(F.floor(F.col("value")), F.lit(5)) + F.lit(1)).cast("bigint")
    return (
        ev.transform(token_throttle(cost, total_tokens=200, seq="seq",
                                    partition_by=["user_id"]))
        .select("event_id", "user_id",
                F.col("cost").cast("bigint").alias("cost"),
                F.col("cum_cost").cast("bigint").alias("cum_cost"))
    )


def q_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic retry fixture from RetrySpec.scala:16-41: flow fails on even
    i and succeeds with i+1 on odd i; retryWith(s) = (s+1, s+1) while s < 500,
    else give up. Closed form (the oracle): odd → (true, i+1, 1 attempt);
    even < 500 → (true, i+2, 2); even ≥ 500 → (false, null, 1)."""
    ev = _events(spark, sf_dir).select(
        F.col("event_id"),
        F.col("event_id").alias("i"),
        F.col("event_id").alias("state"),
        F.lit(False).alias("ok"),
        F.lit(None).cast("bigint").alias("value"),
    )

    def flow(df: DataFrame) -> DataFrame:
        return df.withColumn("ok", F.pmod(F.col("i"), F.lit(2)) == 1).withColumn(
            "value", F.when(F.pmod(F.col("i"), F.lit(2)) == 1, F.col("i") + 1)
        )

    def retry_with(failed: DataFrame) -> DataFrame:
        return (
            failed.withColumn("give_up", F.col("state") >= 500)
            .withColumn("i", F.when(F.col("state") < 500, F.col("state") + 1).otherwise(F.col("i")))
            .withColumn("state", F.when(F.col("state") < 500, F.col("state") + 1).otherwise(F.col("state")))
        )

    out = retry(ev, flow, retry_with, max_rounds=8)
    return out.select("event_id", "ok", "value", "attempts")


def q_unfold_collatz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collatz trajectories for seeds 1..100, distributed per-seed
    (golden fixture UnfoldFlowSpec.scala:22-27 is seed 27)."""
    # few, fat partitions: 100 seeds don't amortize 32 python workers
    seeds = spark.range(1, 101, 1, 8).select(F.col("id").alias("seed"))

    def step(v):
        if v <= 1:
            return None
        nxt = v // 2 if v % 2 == 0 else 3 * v + 1
        return (nxt, nxt)

    return unfold_flow(seeds, step, max_steps=1000)


def q_feedback_fibonacci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 40 Fibonacci numbers via the feedback-loop pattern
    (FeedbackLoopSpec.scala:166): state row (n, a, b) → emit (n, a), feed back
    (n+1, b, a+b). Fixed iteration count → fully lazy, one Spark job."""
    initial = spark.createDataFrame([(0, 0, 1)], "n int, a bigint, b bigint")

    def forward(fb: DataFrame):
        out = fb.select(F.col("n"), F.col("a").alias("fib"))
        nxt = fb.select((F.col("n") + 1).alias("n"), F.col("b").alias("a"),
                        (F.col("a") + F.col("b")).alias("b"))
        return out, nxt

    return feedback_loop(initial, forward, max_iters=40)


def q_retry_concat_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Retry.concat`` gate (Retry.scala:84-95): the retryWith may emit
    SEVERAL retry elements per failure. Fixture: v = floor(value) "succeeds"
    iff v <= 100; a failure splits into the two halves (floor(v/2),
    v - floor(v/2)) and both re-enter the flow. Closed form = the leaves of
    the halving tree, with ``attempts`` = flow applications along the path
    (root = 1) — expressible as a recursive CTE for the DuckDB oracle."""
    from akka_stream_contrib_spark.operators import retry_concat

    ev = _events(spark, sf_dir).select(
        "event_id", F.floor(F.col("value")).cast("bigint").alias("v"))

    def flow(df: DataFrame) -> DataFrame:
        return (df.withColumn("ok", F.col("v") <= 100)
                  .withColumn("value", F.when(F.col("v") <= 100, F.col("v"))))

    def retry_with(failed: DataFrame) -> DataFrame:
        half = F.floor(F.col("v") / F.lit(2)).cast("bigint")
        halves = F.array(half, (F.col("v") - half).cast("bigint"))
        return failed.withColumn("v", F.explode(halves)).select(
            "event_id", "v", "attempts")

    out = retry_concat(ev, flow, retry_with, max_rounds=16)
    return out.select("event_id",
                      F.col("value").cast("bigint").alias("value"),
                      "attempts")


def q_unfold_flow_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SourceGen.unfoldFlowWith`` gate (SourceGen.scala:70-95): flow
    ``S => O`` doubles the state; the separate decision fn stops once the
    flow output exceeds 10000, else re-enters and emits it. Closed form:
    seed s emits s*2^j (step j-1) while s*2^j <= 10000."""
    from akka_stream_contrib_spark.operators import unfold_flow_with

    seeds = spark.range(1, 101, 1, 8).select(F.col("id").alias("seed"))

    def flow(state):
        return state * 2

    def unfold_with(o):
        return None if o > 10000 else (o, o)

    return unfold_flow_with(seeds, flow, unfold_with, max_steps=100)


# ---------------------------------------------------------------------------
# Relational coverage (Catalyst join/agg plans; also the bench headliners)
# ---------------------------------------------------------------------------

def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, "lineitem", sf_dir)
    disc = _money("l_extendedprice") * (1 - _pct("l_discount"))
    charge = _money("l_extendedprice") * (1 - _pct("l_discount")) * (1 + _pct("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("2000-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn("avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6))
    )


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = tables.load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < _ts("1998-03-15"))
    li = tables.load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_money("l_extendedprice") * (1 - _pct("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tables.load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = tables.load(spark, "nation", sf_dir)
    cust = tables.load(spark, "customer", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    orders = tables.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01")))
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_money("l_extendedprice") * (1 - _pct("l_discount"))).cast("double").alias("revenue"))
    )


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_money("l_extendedprice") * _pct("l_discount")).cast("double").alias("revenue"))
    )


def q_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS family): customers that placed an urgent order."""
    cust = tables.load(spark, "customer", sf_dir)
    orders = tables.load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS family): customers with no orders at all."""
    cust = tables.load(spark, "customer", sf_dir)
    orders = tables.load(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function family: rank orders per customer, keep top 3 by price
    (row_number with deterministic tie-break)."""
    orders = tables.load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function family (JSON): extract events.props['k'] and aggregate
    per extracted value."""
    ev = tables.load(spark, "events", sf_dir)
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum(_dec(F.col("value"))), 4).cast("double").alias("sum_value"))
    )


def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse events.props once into
    a VARIANT column, extract typed fields with variant_get — the
    schema-on-read shape for heterogeneous JSON at scale (parse once,
    extract many, no per-extract re-parse)."""
    ev = tables.load(spark, "events", sf_dir)
    v = ev.withColumn("_v", F.parse_json("props"))
    return (v.select(
        "event_id",
        F.try_variant_get(F.col("_v"), "$.k", "int").alias("k"))
        .filter(F.col("k") > 50))


def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family: revenue per calendar month of ship date."""
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(F.sum(_money("l_extendedprice") * (1 - _pct("l_discount")))
             .cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("cnt"))
    )


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-aggregation family: exact count(distinct) per group (two-phase
    partial/final under Catalyst)."""
    ev = tables.load(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"))


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-distinct CONTRACT audit (HyperLogLog++ via
    approx_count_distinct, rsd=0.02). The raw sketch estimate is
    engine-specific and can never hash-match another engine, but its
    published accuracy contract can: per event_type we emit the exact
    distinct count plus ``est_ok`` = |estimate − exact| ≤ 4·rsd·exact
    (a ≥4-sigma bound on the HLL++ relative standard deviation — the
    estimate violating it means the sketch is broken, not unlucky). The
    oracle asserts the same exact counts and est_ok ≡ TRUE, upgrading
    this entry from rows-only to hash-checked. Production reads the
    estimate alone (one map-combined sketch agg, no distinct shuffle);
    the exact twin exists here only to audit the bound."""
    ev = tables.load(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.countDistinct("user_id").alias("exact_users"))
    return agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("_approx") - F.col("exact_users"))
         <= F.lit(4 * 0.02) * F.col("exact_users")).alias("est_ok"))


def q_as_of_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the value of the user's most recent purchase at or
    before the click (time-travel feature join; see operators/asof.py for why
    the union-trick plan is the one that scales)."""
    from akka_stream_contrib_spark.operators import as_of_join
    ev = tables.load(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = as_of_join(clicks, purchases, on=["user_id"], ts="ts", right_cols=["value"])
    return out.select("event_id", "user_id", F.col("value_asof"))


def q_as_of_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every click, the user's NEXT purchase value at or
    after the click (reversed-order window, same single key shuffle)."""
    from akka_stream_contrib_spark.operators import as_of_join
    ev = tables.load(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = as_of_join(clicks, purchases, on=["user_id"], ts="ts",
                     right_cols=["value"], direction="forward")
    return out.select("event_id", "user_id", F.col("value_asof"))


def q_as_of_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour tolerance: a latest purchase older than
    the bound yields NULL (pandas merge_asof tolerance semantics)."""
    from akka_stream_contrib_spark.operators import as_of_join
    ev = tables.load(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = as_of_join(clicks, purchases, on=["user_id"], ts="ts",
                     right_cols=["value"], tolerance_s=3600)
    return out.select("event_id", "user_id", F.col("value_asof"))


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (§2.7: grouping-set family via Catalyst
    built-ins): revenue by returnflag × linestatus with rollup totals."""
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import text_stats
    return tables.load(spark, "documents", sf_dir).transform(text_stats())


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import lang_id
    return tables.load(spark, "documents", sf_dir).transform(lang_id())


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import token_count_bpe
    return tables.load(spark, "documents", sf_dir).transform(token_count_bpe())


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import doc_fingerprint
    return tables.load(spark, "documents", sf_dir).transform(doc_fingerprint())


def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-sorted batch packing via the distributed global rank: per-batch
    padding-waste stats for a pad-to-longest collator (batch_size=32)."""
    from akka_stream_contrib_spark.functions import length_sorted_batches
    return tables.load(spark, "documents", sf_dir).transform(
        length_sorted_batches(batch_size=32))


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling: 4 md5-hash-picked partner
    docs per doc, self-pairs wrapped to the next ordinal."""
    from akka_stream_contrib_spark.functions import negative_sampling
    return tables.load(spark, "documents", sf_dir).transform(
        negative_sampling(k=4))


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the shipped 8-merge tokenizer (FIXTURE_MERGES, learned once from
    this corpus) to every document: per-doc word + BPE token counts."""
    from akka_stream_contrib_spark.functions import bpe_encode
    return tables.load(spark, "documents", sf_dir).transform(bpe_encode())


def q_bpe_token_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus token frequencies under the shipped merge table."""
    from akka_stream_contrib_spark.functions import bpe_encode_tokens
    return tables.load(spark, "documents", sf_dir).transform(bpe_encode_tokens(k=20))


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2022 dedup, Spark-first):
    maximal per-doc token ranges covered by non-canonical occurrences of any
    duplicated 8-gram."""
    from akka_stream_contrib_spark.functions import duplicate_spans
    return duplicate_spans(tables.load(spark, "documents", sf_dir), k=8)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the duplicated-span cut: per-doc cleaned text + removed-token
    count (docs without duplicated spans pass through unchanged)."""
    from akka_stream_contrib_spark.functions import span_dedup
    return span_dedup(tables.load(spark, "documents", sf_dir), k=8)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import dedup_exact
    return tables.load(spark, "documents", sf_dir).transform(dedup_exact())


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import minhash_lsh_dedup
    return minhash_lsh_dedup(tables.load(spark, "documents", sf_dir), threshold=0.5)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-selection dedup: per exact-content cluster keep the BEST
    copy (here: longest, tie on lowest id) with its duplicate count — the
    post-detection step of a real dedup pipeline."""
    from akka_stream_contrib_spark.functions import dedup_keep_best
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.transform(dedup_keep_best(F.col("n_chars"), id_col="doc_id"))
            .select("doc_id", "dup_count"))


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (anti-domination guard): keep a deterministic
    hash-ordered sample of at most 25 docs per source."""
    from akka_stream_contrib_spark.functions import domain_cap
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.transform(domain_cap(25, domain_col="source"))
            .select("doc_id", "source", "dom_rank"))


def q_unpivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational breadth: UNPIVOT (melt) — the inverse of pivot_revenue,
    via the native DataFrame.unpivot (Catalyst Expand, zero shuffles over
    the already-aggregated 3-row input)."""
    wide = q_pivot_revenue(spark, sf_dir)
    return (wide.unpivot("l_returnflag", ["qty_f", "qty_o"],
                         "linestatus_col", "qty")
            .filter(F.col("qty").isNotNull()))


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in LONG form (label, pos, value): the
    class-prototype computation behind nearest-centroid classification and
    centroid-seeded clustering. posexplode + one (label, pos) hash agg —
    no array column in the output, so the driver canonicalizer and the
    DuckDB replay both hash it exactly."""
    emb = tables.load(spark, "embeddings", sf_dir)
    agg = (emb.select(
               "label",
               F.posexplode(F.col("embedding").cast("array<double>"))
               .alias("pos", "v"))
           .groupBy("label", "pos")
           .agg(F.count(F.lit(1)).alias("_n"),
                # sorted left-fold (repo float-sum convention, cf.
                # token_entropy): an unordered avg() would be
                # partition-order-dependent
                F.sort_array(F.collect_list("v")).alias("_vs")))
    s = F.expr("aggregate(_vs, cast(0.0 as double), (a, x) -> a + x)")
    return agg.select(
        "label", "pos",
        (F.round(s / F.col("_n"), 6) + F.lit(0.0)).alias("centroid_v"))


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy LM filter: per-doc mean add-k bigram log-probability
    with the corpus itself as the LM (functions/text.py::
    bigram_logprob_score). Decimal-exact term sums → engine-stable."""
    from akka_stream_contrib_spark.functions import bigram_logprob_score
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(bigram_logprob_score(k=0.5))


def q_cm_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch round trip: build a 4×128 sketch over document
    tokens, then answer point-frequency queries for the 20 most frequent
    tokens FROM THE SKETCH ONLY (functions/sketches.py::cm_sketch /
    cm_estimate). Deterministic md5 cell hashing → the whole sketch and
    every estimate replay exactly in the oracle."""
    from akka_stream_contrib_spark.functions import cm_estimate, cm_sketch
    docs = tables.load(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
    sketch = cm_sketch(toks, "token", depth=4, width=128)
    top = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("_n"))
           .orderBy(F.desc("_n"), "token").limit(20).select("token"))
    return cm_estimate(sketch, top, "token", depth=4, width=128)


def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: 64-bucket md5 feature hashing, L2-normalized,
    long-form (doc_id, bucket, weight) — no vocabulary, O(1) memory in corpus
    size (functions/text.py::hashed_features)."""
    from akka_stream_contrib_spark.functions import hashed_features
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(hashed_features(dim=64))


def q_frame_sample_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing, driver-verified: documents stand
    in as video payloads (deterministic md5-derived metadata — see
    functions/multimodal.py), exploded onto a 60 s frame grid. The decode
    stays stubbed; the row multiplication, grid arithmetic, and metadata
    derivation are the real Spark-side machinery."""
    from akka_stream_contrib_spark.functions.multimodal import (
        frame_sample, with_media_columns)
    docs = tables.load(spark, "documents", sf_dir)
    media = docs.transform(with_media_columns(
        payload=F.col("text").cast("binary"), modality=F.lit("video")))
    return (media.transform(frame_sample(every_ms=60000))
            .select("doc_id", "frame_no", "frame_ts_ms",
                    F.col("media_meta.duration_ms").alias("duration_ms")))


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screen: docs with id < 250 are the historical
    LSH band index, docs >= 250 the new batch; each new doc is flagged if
    any of its minhash bands collides with the index
    (functions/dedup.py::minhash_incremental_dedup)."""
    from akka_stream_contrib_spark.functions import (
        minhash_band_table, minhash_incremental_dedup)
    docs = tables.load(spark, "documents", sf_dir)
    index = minhash_band_table(docs.filter(F.col("doc_id") < 250))
    new = docs.filter(F.col("doc_id") >= 250)
    return minhash_incremental_dedup(new, index)


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: logistic over five text features with
    injected literal weights — the fastText-classifier plan shape as one
    codegen pass (functions/quality.py::quality_score)."""
    from akka_stream_contrib_spark.functions import quality_score
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(quality_score())


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup fixture: docs with id < 250 are the historical
    index (hashes only), docs with id >= 250 are the new batch; survivors
    are first-seen content."""
    from akka_stream_contrib_spark.functions import dedup_incremental
    docs = tables.load(spark, "documents", sf_dir)
    seen = (docs.filter(F.col("doc_id") < 250)
            .select(F.md5(F.col("text")).alias("text_hash")).distinct())
    new = docs.filter(F.col("doc_id") >= 250)
    return (dedup_incremental(new, seen)
            .select("doc_id", "text_hash"))


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline as ONE lazy plan — the composition
    story: boilerplate strip → exact dedup keeping the copy with the most
    surviving content → minimum-content quality gate → context-window
    chunking (16 tokens, overlap 2). Four curation stages, each individually
    oracle-gated elsewhere, composed here and replayed as one DuckDB CTE
    chain. Catalyst sees the WHOLE pipeline, so column pruning and stage
    fusion cross operator boundaries — the advantage of operators that are
    DataFrame->DataFrame transforms rather than materialization barriers."""
    from akka_stream_contrib_spark.functions import (
        chunk_documents, dedup_keep_best, remove_boilerplate)
    docs = tables.load(spark, "documents", sf_dir)
    clean = docs.transform(remove_boilerplate(max_doc_frac=0.9, delim=" "))
    best = clean.transform(dedup_keep_best(
        F.col("n_kept"), id_col="doc_id", text_col="clean_text"))
    kept = best.filter(F.col("n_kept") >= 3)
    return (kept.select("doc_id", F.col("clean_text").alias("text"))
            .transform(chunk_documents(chunk_size=16, overlap=2))
            .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens"))


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-segment removal (CCNet-style boilerplate cleanup): drop
    segments present in > 90% of documents, reassemble in order. (The
    synthetic corpus vocabulary is bimodal — shared filler vs rare tokens —
    so 0.9 strips exactly the filler while every document survives.)"""
    from akka_stream_contrib_spark.functions import remove_boilerplate
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(remove_boilerplate(max_doc_frac=0.9, delim=" "))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import simhash
    return tables.load(spark, "documents", sf_dir).transform(simhash())


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions import cosine_topk
    emb = tables.load(spark, "embeddings", sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb.filter(F.col("vec_id") != 0), qvec, k=10)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions.similarity import ann_lsh_topk
    return ann_lsh_topk(tables.load(spark, "embeddings", sf_dir), k=3)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, fully value-oracled: portable_round=6 rounds the trained
    cell centroids after every Lloyd round (the kmeans_assign convention),
    so _ivf_topk_oracle can replay training, probe selection, cell
    assignment, and the probed-cell cosine scan in DuckDB — exact at
    sf0.001/0.01/0.1. Exact-recall twin is ann_cosine_topk."""
    from akka_stream_contrib_spark.functions.similarity import ivf_topk
    emb = tables.load(spark, "embeddings", sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_topk(emb.filter(F.col("vec_id") != 0), qvec, k=10,
                    portable_round=6)


def q_ann_ivf_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-vectors ANN through the distributed IVF composition — the default
    past the broadcast budget: NO full-corpus driver collect, one cell-id
    shuffle (see functions/similarity.py::ann_topk_all_ivf). portable_round=6
    makes the centroid literals engine-identical, so _ann_ivf_all_oracle
    value-checks the whole pipeline (probe fan-out, home-cell join, per-query
    top-k) — exact at sf0.001/0.01/0.1; recall vs the exact kernel is
    additionally asserted in tests."""
    from akka_stream_contrib_spark.functions import ann_topk_all_ivf
    emb = tables.load(spark, "embeddings", sf_dir)
    return ann_topk_all_ivf(emb, k=3, nlist=16, nprobe=4, portable_round=6)


def q_ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions.dedup import ngram_jaccard_dedup
    return ngram_jaccard_dedup(tables.load(spark, "documents", sf_dir),
                               n=4, threshold=0.2, max_doc_freq=250)


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment (functions/dedup.py::ngram_containment):
    the asymmetric near-dup detector — |A∩B| / |A| catches a small document
    embedded in a big one where symmetric Jaccard reads ~0. Same df-pruned
    posting-list plan as ngram_jaccard_dedup (Broder 1997 containment)."""
    from akka_stream_contrib_spark.functions import ngram_containment
    docs = tables.load(spark, "documents", sf_dir)
    return ngram_containment(docs, n=4, threshold=0.3, max_doc_freq=250)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs via the blocked plan (functions/similarity.py::
    near_dup_pairs_blocked): sound IVF cell-pair pruning + per-block float64
    GEMM verify — identical output to the quadratic audit kernel
    (near_dup_pairs, kept for candidate verification), scale-shaped plan."""
    from akka_stream_contrib_spark.functions import near_dup_pairs_blocked
    emb = tables.load(spark, "embeddings", sf_dir)
    return near_dup_pairs_blocked(emb, threshold=0.4)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from akka_stream_contrib_spark.functions.multimodal import with_media_columns
    docs = tables.load(spark, "documents", sf_dir)
    out = docs.transform(with_media_columns(
        payload=F.col("text").cast("binary"),
        modality=F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("n_chars"), F.lit(3)) + 1).cast("int"),
        ),
    ))
    return out.select(
        "doc_id", "modality",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# §2.7 deep relational families — adapted TPC-H over the trimmed fixture
# schemas (no partsupp/l_shipmode/c_phone columns in the driver's tables),
# plus set ops, CUBE, and a range join. All broadcast-annotated dims stay
# broadcast-able at 100 TB (region/nation/part/customer are the small side).
# ---------------------------------------------------------------------------

def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (EXISTS-with-correlated-predicate family): orders per priority
    that had at least one line shipped after the order date. The correlated
    EXISTS becomes a left-semi join with a non-equi conjunct — Catalyst keeps
    the equi part hashable."""
    orders = tables.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01")))
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        orders.join(li, (orders.o_orderkey == li.l_orderkey)
                    & (li.l_shipdate > orders.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returned items per customer (4-way join,
    one quarter of orders, returnflag filter pushed to the lineitem scan)."""
    cust = tables.load(spark, "customer", sf_dir)
    nation = tables.load(spark, "nation", sf_dir)
    orders = tables.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01")))
    li = tables.load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_money("l_extendedprice") * (1 - _pct("l_discount")))
             .cast("double").alias("revenue"))
    )


def q_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no l_shipmode in fixtures): per ship year, how many
    lines belong to high- vs low-priority orders (conditional counts)."""
    orders = tables.load(spark, "orders", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
    )


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share. Both exact decimal sums are cast to
    double BEFORE the division so both engines run the identical IEEE ops."""
    part = tables.load(spark, "part", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01")))
    disc = _money("l_extendedprice") * (1 - _pct("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(12,2)")))
            .cast("double").alias("_promo"),
            F.sum(disc).cast("double").alias("_total"),
        )
        .select(F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6)
                .alias("promo_pct"))
    )


def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (correlated scalar-subquery family): yearly revenue that
    would be lost by dropping small-quantity orders for one brand. The
    per-part average becomes an aggregate + equi-join (no correlated rescans
    — this is the form that scales: one partial agg + one shuffle)."""
    part = tables.load(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#6")
    li = tables.load(spark, "lineitem", sf_dir)
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = (
        brand_li.groupBy(F.col("l_partkey").alias("_pk"))
        .agg((F.sum(_money("l_quantity")).cast("double") / F.count(F.lit(1)))
             .alias("_avg_qty"))
    )
    return (
        brand_li.join(F.broadcast(avg_qty), brand_li.l_partkey == avg_qty._pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(F.round(F.sum(_money("l_extendedprice")).cast("double") / 7.0, 6)
             .alias("avg_yearly"))
    )


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (HAVING-subquery family): customers whose orders exceed 300
    total quantity. Aggregate-then-join: the heavy groupBy runs on lineitem
    alone; only the tiny surviving key set joins back."""
    li = tables.load(spark, "lineitem", sf_dir)
    orders = tables.load(spark, "orders", sf_dir)
    cust = tables.load(spark, "customer", sf_dir)
    big = (
        li.groupBy(F.col("l_orderkey").alias("_ok"))
        .agg(F.sum(_money("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big._ok)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
    )


def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (OR-of-ANDs predicate family): revenue from three disjoint
    brand/size/quantity bands. The whole disjunction is one Catalyst filter
    after a broadcast join — no union-of-three-scans."""
    part = tables.load(spark, "part", sf_dir)
    li = tables.load(spark, "lineitem", sf_dir)
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(5, 30))
        | ((F.col("p_brand") == "Brand#16") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(10, 40))
    )
    return j.filter(band).agg(
        F.sum(_money("l_extendedprice") * (1 - _pct("l_discount")))
        .cast("double").alias("revenue"))


def q_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no c_phone): per nation, count + total balance of
    above-average-balance customers with no order since 2000. Scalar subquery
    → broadcast cross join (one row); NOT EXISTS → left-anti join."""
    cust = tables.load(spark, "customer", sf_dir)
    recent = tables.load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= _ts("2000-01-01"))
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(_money("c_acctbal")).cast("double") / F.count(F.lit(1)))
             .alias("_avg_bal"))
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"))
    )


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations per year, both
    directions. Two broadcast copies of nation (supplier side / customer
    side); the pair filter collapses to an OR-of-ANDs on broadcast keys."""
    li = tables.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    orders = tables.load(spark, "orders", sf_dir)
    cust = tables.load(spark, "customer", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    n1 = tables.load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    n2 = tables.load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_money("l_extendedprice") * (1 - _pct("l_discount")))
             .cast("double").alias("revenue"))
    )


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's promo-part import volume
    per year. The share divides two exact decimal sums cast to double."""
    li = tables.load(spark, "lineitem", sf_dir)
    orders = tables.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01")))
    cust = tables.load(spark, "customer", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    part = tables.load(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    n1 = tables.load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_ck"), F.col("n_regionkey").alias("_crk"))
    n2 = tables.load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    region = tables.load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    vol = _money("l_extendedprice") * (1 - _pct("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_ck"))
        .join(F.broadcast(region), F.col("_crk") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero))
            .cast("double").alias("_nat"),
            F.sum(vol).cast("double").alias("_tot"),
        )
        .select("o_year", F.round(F.col("_nat") / F.col("_tot"), 6).alias("mkt_share"))
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    aggregate-vs-its-own-max pattern (the view + scalar subquery form).
    Revenue per supplier aggregates once; the 1-row max broadcasts back."""
    li = tables.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01")))
    supp = tables.load(spark, "supplier", sf_dir)
    rev = (
        li.groupBy(F.col("l_suppkey").alias("_sk"))
        .agg(F.sum(_money("l_extendedprice") * (1 - _pct("l_discount")))
             .cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("_sk") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, zero-order
    customers included via the left outer join (count of a null key = 0) —
    the double-aggregation histogram pattern."""
    cust = tables.load(spark, "customer", sf_dir)
    orders = tables.load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no receipt/commit dates): per supplier, count late
    lines (shipped >30 days after order date) on finished multi-supplier
    orders where that supplier was the ONLY late one. The double correlated
    EXISTS / NOT EXISTS decorrelates into one per-order aggregate
    (distinct-supplier and distinct-late-supplier counts) joined back — one
    extra aggregation pass instead of two correlated rescans; the DuckDB
    oracle keeps the textbook EXISTS form, so the gate also proves the
    rewrite's equivalence."""
    orders = tables.load(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F")
    li = tables.load(spark, "lineitem", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("_late", F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    per_order = base.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late"),
    )
    return (
        base.filter(F.col("_late"))
        .join(per_order, base.l_orderkey == per_order._ok)
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
        .join(F.broadcast(supp), base.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp view — the fixtures ship no partsupp table, so the
    TPC-H queries that need one (Q2/Q9/Q11/Q16/Q20) run over the same
    lineitem-derived substitute on BOTH engines: one row per observed
    (part, supplier) pair, ``ps_cost`` = cheapest observed line price
    (exact decimal pick, no arithmetic) and ``ps_avail`` = total quantity
    ever shipped by the pair (exact decimal sum). One map-side-combined
    groupBy on (l_partkey, l_suppkey); at 100 TB this is the canonical
    shrink-then-join reduction (51k pairs from 60k rows at sf0.01; pair
    cardinality grows ~sqrt-ish vs lineitem, never wider than part x supp)."""
    li = tables.load(spark, "lineitem", sf_dir)
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money("l_extendedprice")).alias("ps_cost"),
        F.sum(_money("l_quantity")).alias("ps_avail"),
    )


_PS_SQL = """partsupp_v AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_cost,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS ps_avail
            FROM lineitem GROUP BY 1, 2)"""


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (correlated-min family; `/root/reference` has no
    relational ops — this extends SURVEY §2's engine surface): cheapest
    EUROPE supplier per small part. The correlated scalar subquery
    decorrelates into a per-part window-min over the region-filtered pair
    table — one shuffle on l_partkey; supplier/nation/region and the part
    filter are broadcast. Deterministic LIMIT via a total order
    (s_name, p_partkey unique per row).

    r10 opt (guide §2.3 — shuffle fewer bytes): the small-part filter
    semi-joins LINEITEM before the pair aggregation instead of filtering
    after the window. Both the (l_partkey, l_suppkey) aggregation shuffle
    and the window shuffle now carry only qualifying parts' rows; the pair
    aggregate and the per-part min are group-key-local, so filtering by
    the group key first is output-identical."""
    region = tables.load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    nation = tables.load(spark, "nation", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    part = tables.load(spark, "part", sf_dir).filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))
    eur = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = tables.load(spark, "lineitem", sf_dir).join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money("l_extendedprice")).alias("ps_cost"),
        F.sum(_money("l_quantity")).alias("ps_avail"),
    )
    cand = ps.join(F.broadcast(eur), ps.l_suppkey == eur.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        cand.withColumn("_min_cost", F.min("ps_cost").over(w))
        .filter(F.col("ps_cost") == F.col("_min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                F.col("ps_cost").cast("double").alias("supplycost"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit by supplier nation and order year for 'blue'
    parts, cost term from the derived partsupp view. All money terms stay
    decimal end-to-end (exact, order-independent sums). The part filter
    semi-joins lineitem BEFORE the pair-table join, and the pair table is
    itself built from the filtered lineitem — both join inputs shrink ~8x
    up front; supplier/nation/part are broadcast, the only big shuffle is
    the (l_partkey, l_suppkey) pair join."""
    part = tables.load(spark, "part", sf_dir).filter(F.col("p_name").like("%blue%"))
    li = tables.load(spark, "lineitem", sf_dir).join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey")).drop("p_partkey")
    orders = tables.load(spark, "orders", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    nation = tables.load(spark, "nation", sf_dir)
    ps = li.groupBy(
        F.col("l_partkey").alias("_pk"), F.col("l_suppkey").alias("_sk")).agg(
        F.min(_money("l_extendedprice")).alias("ps_cost"))
    amount = (_money("l_extendedprice") * (1 - _pct("l_discount"))
              - F.col("ps_cost") * _money("l_quantity"))
    return (
        li.join(ps, (li.l_partkey == F.col("_pk")) & (li.l_suppkey == F.col("_sk")))
        .join(F.broadcast(orders.select("o_orderkey", "o_orderdate")),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: per-part stock value (cost x availqty, exact
    decimal) held by ASIA suppliers, keeping parts above 0.05% of the
    global total. The HAVING-vs-global-scalar subquery becomes a 1-row
    broadcast crossJoin — no second scan of the pair table at scale, and
    the grand total reuses the per-part aggregate.

    r10 opt (guide §2.3, the q2 discipline): the ASIA supplier filter
    broadcast-SEMI-joins LINEITEM before the (l_partkey, l_suppkey) pair
    aggregation instead of joining the aggregated pair table — the pair
    shuffle now carries only ASIA suppliers' rows (~1/5 of lineitem).
    The filter key is a group key of the pair aggregate, so min/sum per
    surviving group are untouched: output-identical."""
    region = tables.load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = tables.load(spark, "nation", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    asia = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    li = tables.load(spark, "lineitem", sf_dir).join(
        F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money("l_extendedprice")).alias("ps_cost"),
        F.sum(_money("l_quantity")).alias("ps_avail"),
    )
    from akka_stream_contrib_spark.util import drop_stale_caches, pipeline_cache
    drop_stale_caches()
    per_part = pipeline_cache(
        ps.groupBy("l_partkey")
        .agg(F.sum(F.col("ps_cost") * F.col("ps_avail")).alias("_value"))
        # both consumers (grand total + threshold filter) read this subtree;
        # without materialization the lineitem scan + pair aggregation run
        # TWICE (plan shows 2 scans, no ReusedExchange under AQE). persist
        # beats localCheckpoint here — the cached relation serves both
        # consumers without the checkpoint's write barrier (measured
        # 2.3 s → 0.6 s warm at sf0.1). Distributed cache, not a driver
        # collect: scale-safe at any part cardinality; released by the
        # next pipeline's drop_stale_caches.
    )
    total = per_part.agg(F.sum("_value").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_value") * 2000 > F.col("_total"))
        .select(F.col("l_partkey").alias("ps_partkey"),
                F.col("_value").cast("double").alias("stock_value"))
    )


def q_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct-supplier counts per (brand, type, size)
    for non-PROMO parts in 8 size buckets, excluding negative-balance
    suppliers (the fixtures carry no s_comment for the complaints filter).
    Shape (r10, guide §2.3 — the q2/q11 discipline): BOTH filters are
    group-key predicates of the pair aggregation (p_partkey ↔ l_partkey,
    s_suppkey ↔ l_suppkey), so they broadcast-semi/anti-join LINEITEM
    before the pair shuffle instead of the aggregated pair table — the
    pair aggregation carries only qualifying rows (~13% at TPC-H
    distribution), output-identical. Then the broadcast attribute join
    and a two-level distinct aggregation that Spark runs as
    partial-distinct + final count — no row explosion."""
    part = tables.load(spark, "part", sf_dir).filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    supp_bad = tables.load(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    li = (tables.load(spark, "lineitem", sf_dir)
          .join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
          .join(F.broadcast(supp_bad),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money("l_extendedprice")).alias("ps_cost"),
        F.sum(_money("l_quantity")).alias("ps_avail"),
    )
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: AMERICA suppliers holding excess stock of 'red'
    parts — pairs whose lifetime quantity is more than half the quantity
    shipped in 1997 (2 x avail > shipped, exact decimals). The nested
    IN-subquery chain becomes ONE pair aggregation over the red-pruned
    lineitem scan (r10, guide §2.4): lifetime quantity and the
    1997-shipped quantity are two sums of the SAME group — the shipped
    sum conditional on the year — so the former second aggregation and
    the pair-key join are gone. A pair with no 1997 shipment sums the
    conditional to NULL and the strict > comparison drops it, exactly
    as the former INNER join did. The qualifying supplier set
    (<= |supplier|) joins back broadcast."""
    part_red = tables.load(spark, "part", sf_dir).filter(
        F.col("p_name").like("red%")).select("p_partkey")
    li = tables.load(spark, "lineitem", sf_dir).join(
        F.broadcast(part_red), F.col("l_partkey") == F.col("p_partkey")).drop("p_partkey")
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_money("l_quantity")).alias("ps_avail"),
        F.sum(F.when(F.year("l_shipdate") == 1997,
                     _money("l_quantity"))).alias("_sh"))
    qual = (
        pair.filter(F.col("ps_avail") * 2 > F.col("_sh"))
        .select(F.col("l_suppkey").alias("_qs")).distinct()
    )
    region = tables.load(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    nation = tables.load(spark, "nation", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(qual), supp.s_suppkey == F.col("_qs"))
        .select("s_suppkey", "s_name", "n_name")
    )


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-uniform sample (operators/sample.py::reservoir_sample):
    multiplicative-hash rank + TakeOrdered(k) — the engine-portable,
    partition-layout-independent form of the reference's random sampling
    (Sample.scala:32-44). No shuffle: each partition ships only its local
    top-k to the driver merge."""
    ev = tables.load(spark, "events", sf_dir)
    from akka_stream_contrib_spark.operators import reservoir_sample
    return (ev.transform(reservoir_sample(500, id_col="event_id"))
            .select("event_id", "user_id", "event_type"))


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-motif family: exact triangle + wedge counts over the user
    co-activity graph (functions/graph.py::triangle_count, compact-forward
    degree ordering — wedges fan out from low-degree endpoints only, the
    scale-safe shape under Zipf degrees). Edges = consecutive distinct users
    within an hour bucket, as in pagerank_users — but this op is
    non-iterative, so it gets a full SQL oracle."""
    from akka_stream_contrib_spark.functions import triangle_count
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy(F.date_trunc("hour", "ts")).orderBy("event_id")
    edges = (ev.withColumn("src", F.lag("user_id").over(w))
             .filter(F.col("src").isNotNull()
                     & (F.col("src") != F.col("user_id")))
             .select("src", F.col("user_id").alias("dst")))
    return triangle_count(edges)


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust standardization (functions/corpus.py::robust_scale):
    (x − median)/(1.4826·MAD) — the outlier-immune z-score; mad_by_type's
    statistics broadcast back over the rows, map-side scale."""
    from akka_stream_contrib_spark.functions import robust_scale
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(robust_scale("event_type"))
            .select("event_id", "event_type", "value",
                    "median", "mad", "robust_z"))


def q_frequent_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent user journeys (operators/timeseries.py::frequent_journeys):
    global top-20 event-type TRIGRAMS in per-user event order — the paths
    users actually take, one level above event_transitions' bigram matrix.
    Size-guarded collect per key, in-row HOF k-gram explode, TakeOrdered."""
    from akka_stream_contrib_spark.operators.timeseries import (
        frequent_journeys)
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(frequent_journeys(k=3, top_k=20, max_events=1000))


def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-algebra (functions/sketches.py::hll_overlap): pairwise
    distinct-user overlap between event types via inclusion-exclusion over
    HLL union-merges — overlaps read kilobyte sketches, never the raw
    events. Like the other sketch gates, the hash-checked surface is the
    CONTRACT: exact pair counts plus est_ok = |est − exact| ≤
    5σ·(|A|+|B|+|A∪B|), σ = 1.04/√2¹² (published HLL RSE); the oracle
    recomputes the exact columns and pins est_ok ≡ TRUE."""
    from akka_stream_contrib_spark.functions import (hll_overlap,
                                                     hll_sketch_rollup)
    ev = tables.load(spark, "events", sf_dir)
    sk = hll_sketch_rollup(ev, keys=["event_type"], item="user_id", lgk=12)
    est = hll_overlap(sk, key="event_type")
    from akka_stream_contrib_spark.util import pipeline_cache
    # the exact-audit frame feeds three consumers (per-type counts + both
    # intersection sides) — materialize the distinct once
    du = pipeline_cache(ev.select("event_type", "user_id").distinct())
    per = du.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_n"))
    ua = du.select(F.col("event_type").alias("k_a"),
                   F.col("user_id").alias("_u"))
    ub = du.select(F.col("event_type").alias("k_b"),
                   F.col("user_id").alias("_u"))
    inter = (ua.join(ub, ["_u"]).filter(F.col("k_a") < F.col("k_b"))
             .groupBy("k_a", "k_b")
             .agg(F.count(F.lit(1)).alias("exact_overlap")))
    pa = per.select(F.col("event_type").alias("k_a"),
                    F.col("exact_n").alias("exact_a"))
    pb = per.select(F.col("event_type").alias("k_b"),
                    F.col("exact_n").alias("exact_b"))
    sigma = 1.04 / (2 ** 12) ** 0.5
    ex_union = F.col("exact_a") + F.col("exact_b") - F.col("exact_overlap")
    return (est.join(F.broadcast(inter), ["k_a", "k_b"])
            .join(F.broadcast(pa), "k_a").join(F.broadcast(pb), "k_b")
            .select("k_a", "k_b", "exact_a", "exact_b", "exact_overlap",
                    (F.abs(F.col("est_overlap") - F.col("exact_overlap"))
                     <= F.lit(5 * sigma) * (F.col("exact_a")
                                            + F.col("exact_b") + ex_union))
                    .alias("est_ok"))
            .orderBy("k_a", "k_b"))


def q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe group-aware split (functions/corpus.py::grouped_split):
    every event of a user lands in the SAME split via a portable hash of
    the GROUP key — the defense train_test_split's row hash cannot give
    against near-duplicate leakage across splits. Zero shuffles."""
    from akka_stream_contrib_spark.functions import grouped_split
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(grouped_split("user_id"))
            .select("event_id", "user_id", "split"))


def q_purged_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal backtest split with an embargo gap (functions/corpus.py::
    purged_time_split, de Prado 2018 ch. 7): train | dropped embargo |
    test by fractions of the observed time span — one 1-row min/max
    broadcast, no data shuffle."""
    from akka_stream_contrib_spark.functions import purged_time_split
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(purged_time_split("ts", train_frac=0.7,
                                           embargo_frac=0.1))
            .select("event_id", "split"))


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the user co-activity graph (functions/graph.py::
    adamic_adar): common neighbors weighted 1/ln(deg) (Adamic & Adar 2003),
    top-50 predicted links among NON-adjacent pairs. q_triangle_count's
    edges; degree-capped posting-list fan-out, per-term 9-dp decimal sums."""
    from akka_stream_contrib_spark.functions.graph import adamic_adar
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy(F.date_trunc("hour", "ts")).orderBy("event_id")
    edges = (ev.withColumn("src", F.lag("user_id").over(w))
             .filter(F.col("src").isNotNull()
                     & (F.col("src") != F.col("user_id")))
             .select("src", F.col("user_id").alias("dst")))
    return adamic_adar(edges, top_k=50, max_degree=200)


def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality family: Flesch reading-ease per document
    (functions/text.py::readability_score) — regexp counts + one arithmetic
    expression, zero shuffles; composes with quality_score/perplexity as a
    curation filter column."""
    from akka_stream_contrib_spark.functions import readability_score
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(readability_score())


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent token pairs by PMI with support
    >= 5 (functions/text.py::pmi_bigrams) — the phrase-vocabulary prep for
    tokenizer/embedding training; counts aggregate map-side, marginals join
    on uniform token keys, N is a 1-row broadcast."""
    from akka_stream_contrib_spark.functions import pmi_bigrams
    docs = tables.load(spark, "documents", sf_dir)
    return pmi_bigrams(docs, min_count=5, top_n=50)


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, step statistic: top-20 adjacent character pairs
    (functions/bpe.py::bpe_pair_counts) — the argmax source for the first
    BPE merge. Pair stats are computed over the DISTINCT-WORD table weighted
    by word frequency (vocabulary collapse): the only corpus-sized shuffle
    is the word-frequency partial agg; the pair explode fans out over the
    vocabulary alone, so the plan is corpus-size-independent past the first
    aggregation — the shape that matters at 100 TB."""
    from akka_stream_contrib_spark.functions import bpe_pair_counts
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(bpe_pair_counts(k=20))


def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, full loop: 10 BPE merge rules learned from the
    corpus (functions/bpe.py::bpe_learn_merges). Iterative driver loop like
    k-means/pagerank, oracled merge-for-merge by _bpe_learn_oracle (the
    loop unrolled as 10 chained argmax+rewrite CTEs — all-integer, exact);
    the loop semantics are also pinned by the classic
    low/lower/newest/widest worked example in tests/test_bpe.py. Every
    iteration is vocabulary-sized — the corpus is read once."""
    from akka_stream_contrib_spark.functions import bpe_learn_merges
    docs = tables.load(spark, "documents", sf_dir)
    return bpe_learn_merges(docs, n_merges=10)


def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill by linear interpolation on a daily per-user grid
    (operators/resample.py::resample_interpolate): two window passes over
    ONE hash shuffle on the key, blend is row-local NTZ-safe epoch math.
    Complements resample_ffill (step fill) for model-feature prep."""
    from akka_stream_contrib_spark.operators import resample_interpolate
    ev = tables.load(spark, "events", sf_dir)
    return resample_interpolate(ev, key="user_id", ts="ts", value="value",
                                step="interval 1 day", align="day")


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-corpus Lloyd k-means over the embeddings table
    (functions/clustering.py::kmeans_assign): per-iteration broadcast-argmin
    assignment (no shuffle) + k*dim-row partial-sum re-centering.
    portable_round=6 rounds centroids after every re-centering so both
    engines carry identical centroid literals, making the full loop
    oracle-expressible (_kmeans_oracle: 3 Lloyd rounds unrolled as
    assignment/mean/carry CTEs — exact at sf0.001/0.01/0.1); the numpy-model
    pytest on separated fixtures pins the loop independently."""
    from akka_stream_contrib_spark.functions import kmeans_assign
    emb = tables.load(spark, "embeddings", sf_dir)
    return (kmeans_assign(emb, k=8, iterations=3, portable_round=6)
            .select("vec_id", "cluster", "dist"))


def q_customers_retained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation family (INTERSECT): customers ordering in both 1996 and
    2000. Spark rewrites INTERSECT to a left-semi join under distinct."""
    orders = tables.load(spark, "orders", sf_dir)
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y00 = orders.filter(F.year("o_orderdate") == 2000).select("o_custkey")
    return y96.intersect(y00)


def q_customers_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation family (EXCEPT): customers ordering in 1996 but not 2000
    (left-anti join under distinct)."""
    orders = tables.load(spark, "orders", sf_dir)
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y00 = orders.filter(F.year("o_orderdate") == 2000).select("o_custkey")
    return y96.subtract(y00)  # EXCEPT DISTINCT


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family (CUBE): revenue across all 4 combinations of
    (returnflag, linestatus) rollups, with grouping indicator columns so
    subtotal rows are distinguishable from data NULLs."""
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping("l_returnflag").cast("int").alias("g_rf"),
             F.grouping("l_linestatus").cast("int").alias("g_ls"),
             F.count(F.lit(1)).alias("cnt"),
             F.sum(_money("l_extendedprice")).cast("double").alias("gross"))
    )


def q_range_join_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join family: for each error event, count same-user events in the
    following hour. Equi conjunct on user_id keeps the join hash-partitioned;
    the range predicate filters within each user's partition (at 100 TB this
    is the scalable shape — never a pure cross range join)."""
    ev = tables.load(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("_eid"), F.col("user_id").alias("_u"),
        F.col("ts").alias("_t"))
    return (
        errors.join(
            ev,
            (ev.user_id == errors._u) & (ev.ts > errors._t)
            & (ev.ts <= F.col("_t") + F.expr("INTERVAL 1 HOUR")))
        .groupBy(F.col("_eid").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


def q_attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch backtest of ``streaming/joins.py::stream_interval_join`` — the
    SAME call the streaming attribution pipeline makes (watermarks are a
    no-op on batch frames, so this gate pins the exact join semantics the
    stream runs): each view event paired with the same user's clicks in the
    following hour, inclusive bounds. One key hash shuffle per side; the
    time bound is what keeps the streaming form's state bounded."""
    from akka_stream_contrib_spark.streaming import stream_interval_join
    ev = tables.load(spark, "events", sf_dir)
    imps = (ev.filter(F.col("event_type") == "view")
            .select("user_id", F.col("event_id").alias("imp_id"),
                    F.col("ts").alias("imp_ts")))
    clks = (ev.filter(F.col("event_type") == "click")
            .select("user_id", F.col("event_id").alias("clk_id"),
                    F.col("ts").alias("clk_ts")))
    return stream_interval_join(
        imps, clks, on="user_id", l_ts="imp_ts", r_ts="clk_ts",
        lower_s=0, upper_s=3600)


def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL family (`functions/web.py`): deterministic synthetic
    URLs from the documents table (two shapes: a bare host with trailing
    slash, and a full path with an occasional #fragment, mixed-case
    scheme/host) → parse_url host extraction, registered-domain key, and
    normalized-URL dedup counts per host. Everything before the final
    groupBy is codegen expressions — the one hash shuffle (plus the
    count-distinct expand) is the whole cost at any corpus size."""
    from akka_stream_contrib_spark.functions.web import (
        normalize_url, registered_domain, with_url_parts)
    docs = tables.load(spark, "documents", sf_dir)
    ids = F.col("doc_id").cast("string")
    url = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("HTTPS://"), F.col("source"),
                 F.lit(".Example.COM/"))
    ).otherwise(F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/"), ids,
        F.when(F.col("doc_id") % 3 == 0, F.lit("#frag")).otherwise(F.lit(""))))
    d = (docs.select("doc_id", url.alias("url"))
         .transform(with_url_parts())
         .withColumn("reg_domain", registered_domain(F.col("host")))
         .withColumn("norm_url", normalize_url(F.col("url"))))
    return (d.groupBy("host", "reg_domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("norm_url").alias("n_norm"),
                 F.min("doc_id").alias("first_doc")))


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function family (strings): case, slice, pad, replace, reverse —
    all Catalyst built-ins, verified char-exact against DuckDB."""
    part = tables.load(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("u_brand"),
        F.lower("p_type").alias("l_type"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function family (dates): extraction, truncation, month-end,
    day arithmetic — per order row."""
    orders = tables.load(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.col("o_orderdate"), _ts("1995-01-01"))
        .alias("days_since_epoch95"),
    )


def q_user_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity: Pearson correlation between users' daily
    value series (pairs sharing ≥ 10 days). corr() itself is engine-order-
    dependent over doubles, so the five sufficient statistics are exact
    decimal sums (daily sums stay decimal end-to-end) cast to double once,
    and the correlation combines them with the identical IEEE expression on
    both engines — deterministic to the bit.

    Scale shape: daily aggregation is one (user, day) shuffle; the pair join
    keys on the day (users-per-day sized buckets), and the per-pair stats
    reuse one shuffle on the pair key."""
    ev = tables.load(spark, "events", sf_dir)
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("_day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)"))
             .cast("decimal(18,4)").alias("_ds"))
    )
    a = daily.select(F.col("user_id").alias("user_a"), F.col("_day"),
                     F.col("_ds").alias("_da"))
    b = daily.select(F.col("user_id").alias("user_b"), F.col("_day"),
                     F.col("_ds").alias("_db"))
    stats = (
        a.join(b, ["_day"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("_da").cast("double").alias("_sx"),
            F.sum("_db").cast("double").alias("_sy"),
            F.sum(F.col("_da") * F.col("_db")).cast("double").alias("_sxy"),
            F.sum(F.col("_da") * F.col("_da")).cast("double").alias("_sxx"),
            F.sum(F.col("_db") * F.col("_db")).cast("double").alias("_syy"),
        )
        .filter(F.col("n_days") >= 10)
    )
    n = F.col("n_days").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt((n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
                 * (n * F.col("_syy") - F.col("_sy") * F.col("_sy")))
    # + 0.0 normalizes IEEE negative zero: round() can yield -0.0 whose repr
    # differs between engines even though the value compares equal
    return stats.select(
        "user_a", "user_b", "n_days",
        (F.round(num / den, 6) + F.lit(0.0)).alias("corr"))


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation family: confusion counts of the lang-ID heuristic against
    the fixture's ground-truth lang column (zh/fr have no marker list, so
    real misclassification shows up — the query a pipeline uses to decide
    whether a classifier stage is good enough)."""
    from akka_stream_contrib_spark.functions import lang_id
    docs = tables.load(spark, "documents", sf_dir)
    pred = docs.transform(lang_id()).select("doc_id", "predicted_lang")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation family: kNN label vote — labels of the 20 nearest
    neighbors of query vector 0 (majority vote = the kNN classifier's
    prediction). Deterministic ranking: unrounded cosine, vec_id tie-break."""
    from akka_stream_contrib_spark.functions import cosine_topk
    emb = tables.load(spark, "embeddings", sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    topk = cosine_topk(emb.filter(F.col("vec_id") != 0), qvec, k=20)
    labels = emb.select("vec_id", "label")
    return (
        topk.join(F.broadcast(labels), "vec_id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )


def q_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data prep pipeline — the operators composed the way
    a real corpus pass runs them: exact-dedup to canonical docs (hash
    groupBy), per-doc quality stats, language tag, then the quality gate.
    Stats and language are per-row projections of the same scan, so they
    are computed INLINE in one wide projection (r11 — the shared
    `text_stat_cols` / `lang_score_cols` expression builders the
    text_stats / lang_id transforms themselves use); the old
    transform-then-rejoin form paid two corpus-to-corpus doc_id shuffle
    joins and two extra scans for identical values. One shuffle remains:
    the canonical-doc hash groupBy + semi join."""
    from akka_stream_contrib_spark.functions.text import (
        lang_argmax, lang_score_cols, text_stat_cols)
    docs = tables.load(spark, "documents", sf_dir)
    canon = (docs.groupBy(F.md5("text").alias("_h"))
             .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    scored = docs.select("doc_id", *text_stat_cols(), *lang_score_cols())
    return (
        scored.withColumn("predicted_lang", lang_argmax())
        .join(canon, "doc_id", "left_semi")
        .filter((F.col("n_tokens") >= 20) & (F.col("stopword_ratio") <= 0.2))
        .select("doc_id", "predicted_lang", "n_tokens", "stopword_ratio")
    )


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: daily grid per user, forward-filled."""
    from akka_stream_contrib_spark.operators.resample import resample_ffill
    ev = tables.load(spark, "events", sf_dir)
    return resample_ffill(ev, key="user_id", ts="ts", value="value",
                          step="interval 1 day", align="day")


def q_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot family: return-flag rows × line-status columns. Spark's pivot
    compiles to conditional aggregates — written with an explicit value list
    so the plan needs no distinct-values pre-pass (the scale form)."""
    li = tables.load(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_money("l_quantity")).cast("double"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
    )


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function (UDTF) family: tokens with their positions via
    posexplode — the generator runs inside codegen, one output row per
    token, no Python."""
    docs = tables.load(spark, "documents", sf_dir)
    return (
        docs.select(F.col("doc_id"), F.split("text", " ").alias("_toks"))
        .select("doc_id", F.posexplode("_toks").alias("pos", "token"))
        .filter(F.col("pos") < 5)
    )


def q_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function family breadth: lead/lag, ntile, percent_rank,
    cume_dist, first/last over a deterministic order (tie-broken by key).
    percent_rank/cume_dist are exact rational divisions — bit-identical
    across engines."""
    orders = tables.load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/IQR family) per group. Both
    engines define p-quantile as linear interpolation on the sorted values;
    rounding to 6 dp absorbs any last-ulp interpolation difference."""
    li = tables.load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75_price"),
    )


def q_array_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family: per-user event values as a deterministically
    ordered array (sort_array over (ts, event_id) structs — collect_list
    alone is order-nondeterministic), then size / slice / min / max."""
    ev = tables.load(spark, "events", sf_dir)
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("ts"), F.col("event_id"),
                                             F.col("value")))),
        lambda s: s["value"])
    return (
        ev.groupBy("user_id")
        .agg(ordered.alias("_vals"))
        .select(
            "user_id",
            F.size("_vals").alias("n_events"),
            # array emitted as a fixed-format scalar: the driver's row
            # canonicalizer cannot sort/hash a list cell (r1 err), and the
            # 2-dp values render identically under %.2f on both engines
            F.array_join(
                F.transform(F.slice("_vals", 1, 3),
                            lambda x: F.format_string("%.2f", x)),
                ",").alias("first3"),
            F.array_min("_vals").alias("v_min"),
            F.array_max("_vals").alias("v_max"),
        )
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture family: deterministic hash-stratified sampling with
    per-language keep rates — the data-mixing step of a corpus build (e.g.
    downsample English, upsample Chinese). The keep decision is a pure
    function of doc_id (portable 32-bit md5 prefix), so the sample is
    reproducible across engines/runs and the filter runs scan-side with no
    shuffle at any scale."""
    docs = tables.load(spark, "documents", sf_dir)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint"),
        F.lit(10000))
    rate = (F.when(F.col("lang") == "en", 3000)
            .when(F.col("lang") == "zh", 8000)
            .otherwise(5000))
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function family: filter / transform / aggregate
    lambdas running entirely inside codegen (zero Python). The token array
    is projected ONCE as a column — putting split() inside the lambdas would
    re-evaluate it per element (no CSE inside HOFs; measured 3x on
    shingles)."""
    docs = tables.load(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    return toks.select(
        "doc_id",
        F.size(F.filter("_toks", lambda t: F.length(t) > 5))
         .cast("bigint").alias("n_long"),
        F.aggregate("_toks", F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)).alias("total_chars"),
        F.array_join(F.transform(F.slice("_toks", 1, 3), F.upper), "_")
         .alias("head_upper"),
    )


def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp-function family: extract-all + count, first match, and a
    pattern predicate — all JVM-side expressions on the scan (no shuffle)."""
    docs = tables.load(spark, "documents", sf_dir)
    nums = F.regexp_extract_all("text", F.lit("([0-9]+)"), 1)
    return docs.select(
        "doc_id",
        F.size(nums).cast("bigint").alias("n_numbers"),
        F.try_element_at(nums, F.lit(1)).alias("first_number"),
        F.col("text").rlike("the ").alias("has_the"),
    )


def q_moving_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window family: per-customer trailing-7-day revenue. The
    frame is value-based (6 days preceding by calendar, not 6 rows), the
    complement of window_breadth's ROWS frames. Decimal sum keeps the frame
    total exact; one shuffle on o_custkey."""
    orders = tables.load(spark, "orders", sf_dir)
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (Window.partitionBy("o_custkey").orderBy(day.alias("day"))
         .rangeBetween(-6, 0))
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.sum(_money("o_totalprice")).over(w).cast("double").alias("rev_7d"),
    )


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup): revenue
    by region, by nation, and grand total in ONE pass — Catalyst expands to
    a single shuffle with grouping-id, not three scans.

    Star-schema discipline: the dimension chain customer->nation->region is
    pre-joined into ONE (custkey, n_name, r_name) frame, so the fact stream
    (orders — the table that is 100 TB-scale) passes through a single
    broadcast hash join instead of three; the dimension pre-join touches
    only dimension-sized inputs. At sf0.1 the two shapes measure the same
    (~1.0 s, all per-stage fixed cost — a plain scan+agg of orders is
    0.23 s; see SCALE.md), so the pre-join is a scale-shape choice, not a
    local win."""
    cust = tables.load(spark, "customer", sf_dir)
    nat = tables.load(spark, "nation", sf_dir)
    reg = tables.load(spark, "region", sf_dir)
    orders = tables.load(spark, "orders", sf_dir)
    dim = (cust
           .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
           .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
           .select("c_custkey", "n_name", "r_name"))
    joined = orders.join(F.broadcast(dim),
                         orders.o_custkey == dim.c_custkey)
    return (
        joined.groupingSets([["r_name"], ["n_name"], []], "r_name", "n_name")
        .agg(F.grouping("r_name").cast("int").alias("g_r"),
             F.grouping("n_name").cast("int").alias("g_n"),
             F.count(F.lit(1)).alias("cnt"),
             F.sum(_money("o_totalprice")).cast("double").alias("revenue"))
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel family: strictly-ordered view -> click -> purchase conversion
    counts. One shuffle on user_id (conditional-min aggregation), then a
    single-row reduction — the standard product-analytics query at any
    scale."""
    ev = tables.load(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("n_view_then_click"),
        F.sum(F.when(purchased, 1).otherwise(0)).alias("n_full_funnel"),
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep: overlapping 64-token chunks (stride 56) per document —
    the context-window split before tokenization. Pure generator expression,
    zero shuffle."""
    from akka_stream_contrib_spark.functions import chunk_documents
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(chunk_documents(chunk_size=64, overlap=8))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep: concatenate-then-cut packing of documents into 256-token
    bins per source (exclusive-prefix-sum bin assignment; deterministic)."""
    from akka_stream_contrib_spark.functions import pack_sequences
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(pack_sequences(budget=256))


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep: top-50 vocabulary by frequency (count desc, token asc) —
    explode + partial-agg count + TakeOrderedAndProject."""
    from akka_stream_contrib_spark.functions import vocab_topk
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(vocab_topk(k=50))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep: 3-word-shingle containment of each training doc
    (doc_id >= 20) against the eval set (doc_id < 20) — the train/test
    decontamination pass; eval shingle set is broadcast."""
    from akka_stream_contrib_spark.functions import decontaminate
    docs = tables.load(spark, "documents", sf_dir)
    return decontaminate(docs.filter(F.col("doc_id") >= 20),
                         docs.filter(F.col("doc_id") < 20), k=3)


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval family: batch kNN join — 5 nearest corpus neighbors for
    every query vector (vec_id < 50 = queries, rest = corpus). Broadcast
    corpus matrix + GEMM over the query stream; zero shuffles; rank is a
    rounded-similarity total order the oracle replays."""
    from akka_stream_contrib_spark.functions import knn_join
    emb = tables.load(spark, "embeddings", sf_dir)
    return knn_join(emb.filter(F.col("vec_id") < 50),
                    emb.filter(F.col("vec_id") >= 50), k=5)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pipeline #2 (semantic dedup end-to-end): embedding near-dup
    pairs -> connected components -> join document text -> keep the
    highest-quality member (most tokens, doc_id tie-break) as the cluster
    canonical. The full replace-N-near-dups-with-one-doc pass of a corpus
    build, with every stage from this engine."""
    from akka_stream_contrib_spark.functions import (dup_clusters,
                                                      near_dup_pairs_blocked)
    emb = tables.load(spark, "embeddings", sf_dir)
    docs = tables.load(spark, "documents", sf_dir)
    clusters = dup_clusters(near_dup_pairs_blocked(emb, threshold=0.4),
                            "id_a", "id_b")
    joined = (clusters.join(docs, clusters.id == docs.doc_id)
              .select("cluster_id", "doc_id",
                      F.size(F.split("text", " ")).alias("n_tok")))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tok"), "doc_id")
    ranked = joined.withColumn("rn", F.row_number().over(w))
    members = ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"))
    return (ranked.filter(F.col("rn") == 1)
            .select("cluster_id", F.col("doc_id").alias("canonical_doc_id"),
                    F.col("n_tok").cast("bigint").alias("canonical_tokens"))
            .join(members, "cluster_id"))


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram family: equi-width bins with share-of-total — a window
    function OVER an aggregation result (the post-agg window runs on the
    already-tiny bin table, so the unpartitioned window is safe at any
    scale)."""
    ev = tables.load(spark, "events", sf_dir)
    binned = (ev.groupBy((F.floor(F.col("value") / 50) * 50)
                         .cast("bigint").alias("bin_lo"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy()
    return binned.select(
        "bin_lo", "cnt",
        (F.round(F.col("cnt") / F.sum("cnt").over(w), 6) + F.lit(0.0))
        .alias("share"))


def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: bit_and/bit_or/bit_xor aggregates + bit_count scalar
    over per-event flag words — the flag-column idiom (feature bitsets,
    permission masks) aggregated per group in one shuffle."""
    ev = tables.load(spark, "events", sf_dir)
    flags = F.floor(F.col("value")).cast("bigint") % 256
    return (
        ev.select("event_type", flags.alias("_f"),
                  F.bit_count(flags).alias("_bc"))
        .groupBy("event_type")
        .agg(F.bit_and("_f").alias("flags_and"),
             F.bit_or("_f").alias("flags_or"),
             F.bit_xor("_f").alias("flags_xor"),
             F.sum("_bc").alias("total_bits"))
    )


def q_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-handling family: try_divide / try_cast yield NULL instead
    of failing the job — the hardened-expression surface a pipeline uses on
    dirty data under ANSI mode (Spark 4 default). DuckDB's native semantics
    (x/0 -> NULL, TRY_CAST) replay them exactly."""
    ev = tables.load(spark, "events", sf_dir)
    divisor = F.floor(F.col("value")) % 7
    parsed_src = F.when(F.col("value") > 100,
                        F.floor(F.col("value")).cast("string")
                        ).otherwise(F.col("event_type"))
    return ev.select(
        "event_id",
        (F.round(F.try_divide(F.col("value"), divisor), 6) + F.lit(0.0))
        .alias("safe_ratio"),
        parsed_src.try_cast("bigint").alias("parsed"),
    )


def q_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS placement family: rank each customer's orders by the
    gap-from-previous-order date with ASC NULLS LAST — the first order (NULL
    lag) sorts last, not first (Spark's ASC default is NULLS FIRST, so the
    modifier is load-bearing and the oracle pins it)."""
    orders = tables.load(spark, "orders", sf_dir)
    w_lag = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    with_prev = orders.select(
        "o_custkey", "o_orderkey",
        F.lag("o_orderdate").over(w_lag).alias("prev_date"))
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("prev_date").asc_nulls_last(), "o_orderkey")
    return with_prev.select(
        "o_custkey", "o_orderkey", "prev_date",
        F.row_number().over(w_rank).alias("rnk"))


def q_ann_all_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval family, corpus form: top-4 neighbors (self included — rank 1
    at cos 1.0 — keeping the semantics trivially oracle-replayable) for EVERY
    vector via the same broadcast-GEMM kernel. The oracle-checked upgrade of
    the rows-only ``ann_topk_all`` path."""
    from akka_stream_contrib_spark.functions import knn_join
    emb = tables.load(spark, "embeddings", sf_dir)
    return knn_join(emb, emb, k=4)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus hygiene: email/phone redaction with removal counts. Scan-side
    regexp only — the semantics are proven on synthetic PII in
    tests/test_functions.py; here the oracle pins cross-engine regex
    parity over the whole corpus."""
    from akka_stream_contrib_spark.functions import redact_pii
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(redact_pii())


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter inputs per document (most-frequent
    token share); distributed word-count shape."""
    from akka_stream_contrib_spark.functions import repetition_stats
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(repetition_stats())


def q_lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join family: per-nation top-2 customers by balance via a
    correlated LATERAL subquery with ORDER BY ... LIMIT — Catalyst
    decorrelates it into a ranked window join (same plan class as the
    window-function form, so it scales identically; this entry pins the SQL
    surface)."""
    tables.register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n_name, c_name, c_acctbal FROM nation,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
    """)


def q_priority_shift_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-op family (EXCEPT ALL): order-priority occurrences in
    1995+ minus those before 1995, with duplicates preserved — the bag
    semantics that DISTINCT set ops (customers_retained/churned) don't
    exercise. Catalyst plans it as a single hash aggregation of counted
    multiplicities."""
    orders = tables.load(spark, "orders", sf_dir)
    after = (orders.filter(F.col("o_orderdate") >= "1995-01-01")
             .select("o_orderpriority"))
    before = (orders.filter(F.col("o_orderdate") < "1995-01-01")
              .select("o_orderpriority"))
    return after.exceptAll(before)


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer-join family: per-nation customer account balance vs
    supplier account balance, reconciled — nations appearing on only one
    side keep nulls on the other (the audit/reconciliation join shape).
    Both sides pre-aggregate BEFORE the join, so the full outer join runs
    on ~25 rows however large the base tables are."""
    cust = tables.load(spark, "customer", sf_dir)
    supp = tables.load(spark, "supplier", sf_dir)
    nat = tables.load(spark, "nation", sf_dir)
    c = (cust.groupBy("c_nationkey")
         .agg(F.sum(_money("c_acctbal")).cast("double").alias("cust_bal"),
              F.count(F.lit(1)).alias("n_cust"))
         .withColumnRenamed("c_nationkey", "nationkey"))
    s = (supp.groupBy("s_nationkey")
         .agg(F.sum(_money("s_acctbal")).cast("double").alias("supp_bal"),
              F.count(F.lit(1)).alias("n_supp"))
         .withColumnRenamed("s_nationkey", "nationkey"))
    return (
        c.join(s, "nationkey", "full_outer")
        .join(F.broadcast(nat), F.col("nationkey") == nat.n_nationkey, "left")
        .select("n_name", "n_cust", "cust_bal", "n_supp", "supp_bal")
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup endgame: near-dup pairs resolved into connected components
    (cluster id = min member id) via iterative min-label propagation — the
    pairs→clusters→canonical step of a real dedup pipeline. The iteration is
    a driver loop over the (tiny) edge set; the oracle is a recursive-CTE
    transitive closure."""
    from akka_stream_contrib_spark.functions import (dup_clusters,
                                                      near_dup_pairs_blocked)
    emb = tables.load(spark, "embeddings", sf_dir)
    pairs = near_dup_pairs_blocked(emb, threshold=0.4)
    return (dup_clusters(pairs, "id_a", "id_b")
            .select(F.col("id").alias("vec_id"), "cluster_id"))


def q_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew family: two-phase salted aggregation over events, whose 5
    event_type values are exactly the hot-key regime (~N/5 rows per key) that
    melts a reducer at 100 TB. Result is identical to the direct groupBy —
    the oracle proves it — while phase 1 spreads each hot key over 16
    reducers."""
    from akka_stream_contrib_spark.operators import salted_aggregate
    ev = tables.load(spark, "events", sf_dir)
    out = salted_aggregate(
        ev.withColumn("_v", F.col("value").cast("decimal(18,4)")),
        keys=["event_type"],
        aggs={"n": ("count", "event_id"), "sum_value": ("sum", "_v"),
              "max_value": ("max", "value")},
    )
    return out.select("event_type", "n",
                      F.col("sum_value").cast("double").alias("sum_value"),
                      "max_value")


def q_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/max family (min_by / max_by): each user's first and last
    event attributes in one hash aggregation — no window, no sort, one
    shuffle. Order key is the unique event_id, so results are
    deterministic."""
    ev = tables.load(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-20 over documents for a 3-term query.
    Two corpus passes (single-row stats aggregate broadcast back over the
    scan) + TakeOrdered top-k — no global sort shuffle. Ranking is by the
    6-dp-rounded score then doc_id, so both engines pick the same set."""
    from akka_stream_contrib_spark.functions import bm25_topk
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(bm25_topk(["spark", "join", "window"], k=20))


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals over the events stream: one row per run of an
    unchanged event_type per user with half-open [valid_from, valid_to) and
    is_current. The warehouse dual of AccumulateWhileUnchanged
    (AccumulateWhileUnchanged.scala:26-126): same run detection, interval
    contract output. One hash shuffle on user_id shared by both windows."""
    from akka_stream_contrib_spark.operators import scd2_intervals
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(scd2_intervals("user_id", "event_type", "ts", "event_id"))


def q_scd2_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time state lookup over the SCD2 interval table
    (operators/scd2.py::scd2_as_of): every user's event_type in effect at
    2024-01-15 12:00 under the half-open [valid_from, valid_to) contract —
    a pure map-side filter over the intervals, no join or window."""
    from akka_stream_contrib_spark.operators import scd2_as_of, scd2_intervals
    ev = tables.load(spark, "events", sf_dir)
    iv = ev.transform(scd2_intervals("user_id", "event_type", "ts", "event_id"))
    return iv.transform(scd2_as_of(_ts("2024-01-15 12:00:00"), key="user_id"))


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by a portable md5 bucket of doc_id —
    stable across reruns/backfills/engines (randomSplit is neither), pure
    map-side, zero shuffles."""
    from akka_stream_contrib_spark.functions import train_test_split
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.transform(train_test_split((80, 90)))
            .select("doc_id", "source", "split"))


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted mixture sampling with fractional repeat: src0 2.5x
    upsampled, src1 1x, src2 0.25x downsampled, everything else 0.5x; the
    fractional copy is decided by a portable hash of doc_id so the sample is
    deterministic. Map-side generator explode — zero shuffles."""
    from akka_stream_contrib_spark.functions import mixture_sample
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.transform(mixture_sample(
        {"src0": 2.5, "src1": 1.0, "src2": 0.25}, default=0.5))
        .select("doc_id", "source",
                F.col("copy_id").cast("bigint").alias("copy_id")))


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: each event's value z-scored against its user's
    trailing 10 observations. Exact decimal frame sums (order-independent)
    combined into mean/var with one identical IEEE expression — the
    engine-portable way to do rolling moments. One shuffle on user_id."""
    from akka_stream_contrib_spark.operators import rolling_zscore
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(rolling_zscore("user_id", "value", "event_id", n=10))
            .select("event_id", "user_id", "value", "roll_mean", "zscore"))


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA smoothing per user (alpha=0.3, depth=8): the recursive
    filter unrolled into a finite literal-weighted lag sum — pure window
    expression, no recursive state, bit-reproducible across engines."""
    from akka_stream_contrib_spark.operators import ewma_smooth
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(ewma_smooth("user_id", "value", "event_id",
                                     alpha=0.3, depth=8))
            .select("event_id", "user_id", "value", "ewma"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (30-min inactivity gap): session_id and
    position-in-session as columns ON the events, the shape downstream joins
    need. Single shuffle on user_id — session_pos derives from the session
    start's rank, not a second (user, session) partitioning."""
    from akka_stream_contrib_spark.operators import sessionize
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(sessionize("user_id", "ts", "event_id", gap_s=1800))
            .select("event_id", "user_id", "session_id",
                    F.col("session_pos").cast("bigint").alias("session_pos")))


def q_pagerank_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user-interaction graph (edges = consecutive events
    within an hour bucket, deduped). Iterative power method as a driver loop
    with per-iteration lineage truncation — the FeedbackLoop-style cyclic
    dataflow (FeedbackLoop.scala:18-38) at analytics scale. Oracled by
    _pagerank_oracle (the power iteration unrolled as chained CTEs,
    dangling-mass redistribution included; FP drift ~1e-16 absorbed by the
    6-dp rounding); the python-model test in tests/test_functions.py pins
    the same semantics independently."""
    from akka_stream_contrib_spark.functions import pagerank
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy(F.date_trunc("hour", "ts")).orderBy("event_id")
    edges = (ev.withColumn("src", F.lag("user_id").over(w))
             .filter(F.col("src").isNotNull() & (F.col("src") != F.col("user_id")))
             .select("src", F.col("user_id").alias("dst")))
    return (pagerank(edges, iterations=3, damping=0.85)
            .select(F.col("id").alias("user_id"),
                    (F.round("rank", 6) + F.lit(0.0)).alias("rank"))
            .orderBy("user_id"))


def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-check report: predicate checks over lineitem compiled into
    ONE conditional-sum aggregate over one scan, plus referential-integrity
    anti-join counts (orders without customer, lineitem without order) — the
    quality gate an ingest pipeline runs before publishing a table."""
    from akka_stream_contrib_spark.functions import expect
    li = tables.load(spark, "lineitem", sf_dir)
    orders = tables.load(spark, "orders", sf_dir)
    cust = tables.load(spark, "customer", sf_dir)
    rep = li.transform(expect({
        "qty_out_of_range": ~F.col("l_quantity").between(1, 50),
        "suspicious_high_qty": F.col("l_quantity") > 45,
        "nonpositive_price": F.col("l_extendedprice") <= 0,
        "null_shipdate": F.col("l_shipdate").isNull(),
        "discount_out_of_range": ~F.col("l_discount").between(0, 0.1),
    }))
    orphan_orders = (orders.join(cust, orders.o_custkey == cust.c_custkey,
                                 "left_anti")
                     .agg(F.count(F.lit(1)).alias("n_violations"))
                     .select(F.lit("orphan_orders").alias("check_name"),
                             "n_violations"))
    orphan_li = (li.join(orders, li.l_orderkey == orders.o_orderkey,
                         "left_anti")
                 .agg(F.count(F.lit(1)).alias("n_violations"))
                 .select(F.lit("orphan_lineitems").alias("check_name"),
                         "n_violations"))
    return rep.unionByName(orphan_orders).unionByName(orphan_li)


def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-tail clamping: events.value winsorized to its
    event_type's exact [p05, p95] percentiles (bounds rounded to 6 dp so
    both engines clamp identically; the clamp itself is least/greatest with
    no further FP arithmetic). One group aggregate + broadcast join back."""
    from akka_stream_contrib_spark.functions import winsorize
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(winsorize("event_type", "value", 0.05, 0.95))
            .select("event_id", "event_type", "value", "value_wins"))


def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct rollup: per-(event_type, day) HLL sketches
    union-merged to per-type distinct-user estimates. The 100 TB pattern —
    coarser granularities read only the sketch table, never the raw events.

    Like q_approx_distinct_users, the DataSketches estimate itself is
    engine-specific, so the hash-checked surface is its CONTRACT:
    ``n_buckets`` (how many day-sketches merged per type — exact),
    ``exact_users``, and ``est_ok`` = |estimate − exact| ≤ 5σ·exact with
    σ = 1.04/√(2^lgk) ≈ 1.6 % at lgk=12 (the published HLL relative
    standard error; exceeding 5σ means a broken merge, not variance).
    The oracle recomputes both exact columns and pins est_ok ≡ TRUE.
    Estimate accuracy and exact mergeability are additionally pinned in
    tests/test_functions.py."""
    from akka_stream_contrib_spark.functions import hll_merge, hll_sketch_rollup
    ev = tables.load(spark, "events", sf_dir)
    daily = hll_sketch_rollup(
        ev.withColumn("day", F.to_date("ts")),
        keys=["event_type", "day"], item="user_id", lgk=12)
    merged = hll_merge(daily, keys=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"))
    bound = 5 * 1.04 / (2 ** 12) ** 0.5
    return (merged.join(F.broadcast(exact), "event_type")
            .select("event_type", "n_buckets", "exact_users",
                    (F.abs(F.col("approx_distinct") - F.col("exact_users"))
                     <= F.lit(bound) * F.col("exact_users")).alias("est_ok"))
            .orderBy("event_type"))


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity scoring: per-document unigram Shannon entropy.
    The float fold runs in sorted-token order on both engines, making an
    otherwise order-dependent sum deterministic."""
    from akka_stream_contrib_spark.functions import token_entropy
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(token_entropy())


def q_shipping_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap counting by sweep line: orders in flight on each date
    ([o_orderdate, last l_shipdate) intervals) via +1/-1 boundary events,
    aggregated per date FIRST (shuffles over the fact tables) so the running
    sum runs over the tiny date spine, not the 100 TB interval set — the
    scalable form of 'max concurrent sessions'."""
    li = tables.load(spark, "lineitem", sf_dir)
    orders = tables.load(spark, "orders", sf_dir)
    done = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done_d"))
    j = orders.join(done, orders.o_orderkey == done.l_orderkey) \
              .select("o_orderdate", "done_d")
    deltas = (j.select(F.col("o_orderdate").alias("d"), F.lit(1).alias("delta"))
              .unionAll(j.select(F.col("done_d").alias("d"),
                                 F.lit(-1).alias("delta"))))
    per_date = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("net"))
    w = (Window.orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per_date.withColumn(
        "concurrent", F.sum("net").over(w).cast("bigint"))


def q_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion (median absolute deviation) per event type: exact
    interpolated median broadcast back over the scan, then the median of
    absolute deviations. Two group aggregates + one broadcast join — the
    outlier-robust alternative to stddev for quality monitoring."""
    ev = tables.load(spark, "events", sf_dir)
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median"))
    return (ev.join(F.broadcast(med), "event_type")
            .groupBy("event_type", "median")
            .agg(F.round(F.expr("percentile(abs(value - median), 0.5)"), 6)
                 .alias("mad"),
                 F.count(F.lit(1)).alias("n")))


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, counted per
    months-since-cohort offset. Two hash aggregates (first-order month per
    customer, then cohort x offset distinct count) + one key join on
    o_custkey — the first aggregate's output is customer-sized, so the join
    broadcast-qualifies under AQE at any realistic cohort cardinality."""
    orders = tables.load(spark, "orders", sf_dir)
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month"))
    return (
        orders.join(first, "o_custkey")
        .select(
            "o_custkey", "cohort_month",
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.col("cohort_month"))
            .cast("int").alias("month_offset"))
        .groupBy("cohort_month", "month_offset")
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event bigram counts with transition probability: the
    Markov-chain view of user behavior. One key shuffle for the lead()
    window; the probability denominator is a window over the (tiny)
    aggregated transition table, not a second scan."""
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    pairs = (
        ev.select("user_id", "event_id", "event_type",
                  F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = Window.partitionBy("event_type")
    return pairs.select(
        "event_type", "next_type", "cnt",
        (F.round(F.col("cnt").cast("double")
                 / F.sum("cnt").over(tot).cast("double"), 6)
         + F.lit(0.0)).alias("p_transition"))


def q_login_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak detection: per user, the longest run of
    consecutive active days. The anchor trick (epoch-day - row_number is
    constant within a consecutive run) turns streaks into a plain groupBy —
    one user-keyed shuffle for the distinct-day window, aggregates stay on
    the same partitioning. Arithmetic is integer day numbers (datediff from
    a fixed epoch) — no engine-specific date-interval behavior."""
    ev = tables.load(spark, "events", sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = (
        days.select(
            "user_id", "d",
            (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
             - F.row_number().over(w)).alias("anchor"))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("len"), F.min("d").alias("start"))
    )
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("start").alias("first_active_day"),
    )


def q_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC analysis: customers ranked by revenue with cumulative
    share and A/B/C class (80/95 cuts). Revenue sums are exact decimal, so
    the cumulative prefix runs as the two-phase range prefix sum
    (``global_order.global_running_sum`` — range shuffle + K-row driver
    summary), never a single-partition window: the customer aggregate is
    corpus-sized (15B rows at SF100k), unlike the repo's bounded post-agg
    windows. Ordering is (revenue DESC, custkey) via an exact decimal
    negation; decimal prefix combine is associative, so the result is
    bit-identical to the sequential window. The total is read back off the
    CHECKPOINTED prefix frame (max of the monotone cumulative — revenues
    are positive TPC-H prices, so the last prefix IS the sum; an
    independent ``rev.agg`` would re-scan and re-aggregate the fact table
    a second time, the corpus.py:849 anti-pattern); the share division
    casts both exact decimals to double first — one identical IEEE op on
    both engines."""
    from akka_stream_contrib_spark.operators.global_order import (
        global_running_sum,
    )
    orders = tables.load(spark, "orders", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_money("o_totalprice")).alias("_rev"))
    cum = global_running_sum(
        rev.withColumn("_negrev", -F.col("_rev")),
        ["_negrev", "o_custkey"], "_rev", "_cum")
    total = cum.agg(F.max("_cum").alias("_tot"))
    share = (F.round(
        F.col("_cum").cast("double") / F.col("_tot").cast("double"), 6)
        + F.lit(0.0))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "o_custkey", F.col("_rev").cast("double").alias("revenue"),
            share.alias("cum_share"))
        .withColumn(
            "pareto_class",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B").otherwise("C"))
    )


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance-≤1 similarity self-join over customer names via
    the deletion neighborhood (functions/dedup.py::edit1_pairs) — upgraded
    from prefix blocking, which was quadratic inside each block AND missed
    pairs differing within the prefix. O(Σ len) key rows, one posting-list
    shuffle, threshold-bounded levenshtein verification on candidates only."""
    from akka_stream_contrib_spark.functions.dedup import edit1_pairs
    cust = tables.load(spark, "customer", sf_dir)
    return (edit1_pairs(cust, "c_custkey", "c_name")
            .select(F.col("id_a").alias("a_custkey"),
                    F.col("id_b").alias("b_custkey"),
                    "edit_distance"))


def q_regr_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares daily revenue trend per customer segment: slope and
    intercept from the five sufficient statistics, each an exact sum
    (integer day numbers / decimal revenue) cast to double once and
    combined with one identical IEEE expression — the regr_slope()
    builtin is order-dependent over doubles, this is deterministic to the
    bit (same recipe as q_user_correlation). Two hash aggregates: daily
    revenue per segment, then one row per segment."""
    orders = tables.load(spark, "orders", sf_dir)
    cust = tables.load(spark, "customer", sf_dir)
    daily = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
                    orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", F.to_date("o_orderdate").alias("_d"))
        .agg(F.sum(_money("o_totalprice")).alias("_rev"))
        .select(
            "c_mktsegment",
            F.datediff(F.col("_d"), F.lit("1995-01-01").cast("date"))
            .cast("bigint").alias("_x"),
            F.col("_rev").cast("decimal(18,2)").alias("_y"))
    )
    stats = daily.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum(F.col("_x").cast("decimal(10,0)") * F.col("_y"))
        .cast("double").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
    )
    n = F.col("n_days").cast("double")
    slope = ((n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
             / (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")))
    return stats.select(
        "c_mktsegment", "n_days",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round((F.col("_sy") - slope * F.col("_sx")) / n, 6)
         + F.lit(0.0)).alias("intercept"),
    )


def q_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-20 over documents for a 3-term query — the vector-space
    complement to q_bm25_search with the same two-pass scale shape (stats
    row broadcast over the scan, TakeOrdered top-k, no global sort)."""
    from akka_stream_contrib_spark.functions import tfidf_topk
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(tfidf_topk(["spark", "join", "window"], k=20))


def q_campaign_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via the bucketed match-once operator
    (operators/interval_join.py): order fulfilment windows [orderdate,
    +7d) × campaign windows [month start, +10d) — orders and revenue
    reached by each campaign. A naive overlap join has no equi conjunct
    (cartesian at scale); the bucket id gives Catalyst a hash join key and
    the greatest-start bucket rule keeps each pair exactly once, so no
    post-join distinct. The campaign side is month-cardinality → AQE
    broadcasts it."""
    from akka_stream_contrib_spark.operators import interval_overlap_join
    orders = tables.load(spark, "orders", sf_dir)
    fulfil = orders.select(
        "o_orderkey", _money("o_totalprice").alias("_p"),
        F.col("o_orderdate").alias("f_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("f_end"))
    camps = (
        orders.select(
            F.date_trunc("month", "o_orderdate").alias("camp_start"))
        .distinct()
        .withColumn("camp_end",
                    F.col("camp_start") + F.expr("INTERVAL 10 DAYS")))
    joined = interval_overlap_join(
        fulfil, camps, "f_start", "f_end", "camp_start", "camp_end",
        bucket_width_s=7 * 86400)
    return joined.groupBy("camp_start").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("_p").cast("double").alias("revenue"))


def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items via Misra-Gries candidates + exact recount
    (functions/sketches.py::mg_heavy_hitters): top-20 corpus tokens without
    shuffling the tail. Exact (== the full groupBy) whenever the k-th item
    clears the 1/(capacity+1) share bound — amply true here, so the DuckDB
    exact-top-k oracle applies."""
    from akka_stream_contrib_spark.functions import mg_heavy_hitters
    docs = tables.load(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token"))
    return mg_heavy_hitters(toks, "token", k=20, capacity=4096)


def q_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 over int8-quantized embeddings (storage scale path:
    4× smaller scan than float32, integer dot products — exact, no FP
    order sensitivity). Quantization is engine-replayable bit-for-bit
    (floor(x*scale + 0.5), see functions/similarity.py); accuracy vs the
    exact ranking is asserted in tests (recall@10)."""
    from akka_stream_contrib_spark.functions import quantized_cosine_topk
    emb = tables.load(spark, "embeddings", sf_dir)
    qvec = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    return quantized_cosine_topk(emb, qvec, k=10)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based corpus filter (Gopher/MassiveText heuristics): per-doc rule
    inputs + combined keep verdict; everything except the top-bigram share is
    a zero-shuffle projected expression (functions/quality.py::gopher_rules).
    min_stopword_hits=1: the synthetic vocabulary carries only 'the' from the
    canonical stopword list."""
    from akka_stream_contrib_spark.functions.quality import gopher_rules
    return tables.load(spark, "documents", sf_dir).transform(
        gopher_rules(min_words=10, min_stopword_hits=1))


def q_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc contamination audit table: containment of every training doc
    (doc_id >= 20) against the eval shingle set (doc_id < 20), including the
    zero-hit docs `decontaminate` omits, plus the >= 0.8 threshold verdict."""
    from akka_stream_contrib_spark.functions.corpus import contamination_score
    docs = tables.load(spark, "documents", sf_dir)
    return contamination_score(docs.filter(F.col("doc_id") >= 20),
                               docs.filter(F.col("doc_id") < 20), k=3)


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture weights (p_d ∝ n_d^0.5) over the
    documents table — one groupBy on the domain key + a 1-row broadcast for
    the normalizers (functions/corpus.py::mixture_weights)."""
    from akka_stream_contrib_spark.functions.corpus import mixture_weights
    return tables.load(spark, "documents", sf_dir).transform(
        mixture_weights(alpha=0.5))


def q_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss ±1 random projection of the embedding column to
    16 dims — zero-shuffle codegen arithmetic, micro-unit-exact bigint sums
    so the oracle hashes bit-identically (functions/projection.py)."""
    from akka_stream_contrib_spark.functions.projection import rp_project
    return rp_project(tables.load(spark, "embeddings", sf_dir),
                      out_dim=16, in_dim=64)


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, two-stage production shape (Jégou et al.
    2011): bounded-sample codebook training → map-side per-subspace encode
    (the scannable small index) → ADC shortlist via a driver-literal lookup
    table (pure codegen array indexing) → exact cosine re-rank of the
    shortlist only. The shortlist (400) is wide enough that the output IS
    the exact top-10 on the fixtures (worst observed true-top-10 ADC rank is
    218 at sf0.1, 16 at the gate SFs; tests assert the margin), so the
    oracle is the exact-cosine SQL — a full hash check on an ANN pipeline.

    Cold-chain discipline (the r5 3.19 s regression): ONE bounded driver
    collect serves both codebook training and the query-row extraction
    (vec_id 0 is in the id-sorted training sample whenever it exists), and
    the embedding frame is persisted across its two plan consumers (encode
    side + exact-rerank side) — 2 driver jobs total instead of 4."""
    from akka_stream_contrib_spark.functions.similarity import (
        pq_encode, pq_sample_size, pq_topk_rerank, pq_train_pdf)
    from akka_stream_contrib_spark.util import drop_stale_caches, pipeline_cache
    drop_stale_caches()
    emb = pipeline_cache(
        tables.load(spark, "embeddings", sf_dir).select("vec_id", "embedding"))
    sample = (emb.orderBy("vec_id").limit(pq_sample_size(64))).toPandas()
    books = pq_train_pdf(sample, m=16, ksub=64)
    qhit = sample[sample["vec_id"] == 0] if len(sample) else sample
    if len(qhit):
        qvec = list(qhit["embedding"].iloc[0])
    else:  # id-sorted sample covers vec_id 0 unless it's absent or the
        # corpus outgrew the sample without an id-0 row — fall back to a scan
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
        qvec = qrow[0] if qrow is not None else None
    if books is None or qvec is None:  # empty corpus: empty output schema
        return emb.select("vec_id", F.lit(0.0).alias("cos_sim")).limit(0)
    rest = emb.filter(F.col("vec_id") != 0)
    codes = pq_encode(rest, books)
    return pq_topk_rerank(rest, codes, qvec, books, k=10, shortlist=400)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming radius 3 via pigeonhole band
    bucketing (functions/dedup.py::simhash_pairs): band equi-join candidates,
    integer bit_count(xor) verification — no all-pairs comparison. 32-bit
    signatures: at 16 bits a radius-3 ball over a clustered corpus matches
    ~half of all pairs (measured 138k pairs / 5000 docs and a 3× slower
    band fan-out); 8-bit bands re-spread the posting lists."""
    from akka_stream_contrib_spark.functions.dedup import simhash_pairs
    return simhash_pairs(tables.load(spark, "documents", sf_dir),
                         max_hamming=3, bits=32)


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest canonicalization (functions/text.py::normalize_text):
    lowercase + control-strip + whitespace-collapse as pure regexp
    expressions — zero shuffles, ASCII classes so Java regex and RE2
    compile identically."""
    from akka_stream_contrib_spark.functions.text import normalize_text
    return tables.load(spark, "documents", sf_dir).transform(normalize_text())


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF keywords (functions/text.py::doc_keywords):
    word-count reductions + corpus-size broadcast + per-doc ranking window
    with deterministic (score, token) order the oracle replays."""
    from akka_stream_contrib_spark.functions.text import doc_keywords
    return tables.load(spark, "documents", sf_dir).transform(
        doc_keywords(top_n=3))


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning (functions/sketches.py::bloom_build/
    bloom_probe): build a word-table filter over orders.o_custkey (one
    map-side position expansion + bit_or aggregation), broadcast it, probe
    every customer — (key, member) with zero false negatives. Bit-exact in
    any engine: portable md5-affine positions, 32-bit words."""
    from akka_stream_contrib_spark.functions.sketches import (
        bloom_build, bloom_probe)
    orders = tables.load(spark, "orders", sf_dir)
    cust = tables.load(spark, "customer", sf_dir)
    bloom = bloom_build(orders, "o_custkey")
    return bloom_probe(bloom, cust, "c_custkey")


def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick→bar OHLC downsampling (operators/resample.py::ohlc_resample):
    hourly candles per user in ONE partial-aggregated groupBy — open/close
    via min/max over a (ts, seq, value) struct, no window pass."""
    from akka_stream_contrib_spark.operators.resample import ohlc_resample
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(ohlc_resample(bucket_s=3600))


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis over events.user_id
    (functions/quality.py::skew_report): heaviest keys + distribution stats
    from one key aggregation and a 1-row broadcast — the pre-flight check
    before keying a 100 TB join."""
    from akka_stream_contrib_spark.functions.quality import skew_report
    return tables.load(spark, "events", sf_dir).transform(
        skew_report("user_id", top_n=10))


def q_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (functions/corpus.py::kfold_split):
    md5-hash mod k, zero shuffles, engine-stable."""
    from akka_stream_contrib_spark.functions.corpus import kfold_split
    return (tables.load(spark, "documents", sf_dir)
            .transform(kfold_split(k=5)).select("doc_id", "fold"))


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group rank normalization (functions/corpus.py::
    quantile_normalize): percent rank of value within event_type, seq
    tie-break for a deterministic total order; one group-key shuffle."""
    from akka_stream_contrib_spark.functions.corpus import quantile_normalize
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(quantile_normalize("event_type", "value",
                                            seq="event_id"))
            .select("event_id", "event_type", "value", "pct"))


def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end in-engine classifier loop (functions/ml.py): featurize
    documents map-side, TRAIN logistic regression with Arrow gradient
    partials (one scan per iteration, no shuffle), then SCORE every doc
    with the learned weights as literals inside codegen — the fastText-
    style quality-filter workflow. Oracle: the full 15-iteration GD loop
    unrolled as chained DuckDB CTEs (_logreg_oracle), so training AND
    scoring are value-checked; convergence/accuracy additionally pinned by
    tests on separable data."""
    from akka_stream_contrib_spark.functions.ml import (
        logreg_predict, logreg_train, text_feature_vector)
    docs = tables.load(spark, "documents", sf_dir)
    feat = docs.select(
        "doc_id", text_feature_vector().alias("features"),
        (F.col("lang") == "en").cast("int").alias("label"))
    # materialize the featurized frame ONCE so the 15 GD passes replay
    # neither the scan nor the featurization (distributed checkpoint, not
    # a driver collect; full-batch GD is partition-independent so the
    # coalesce changes nothing but task overhead — measured 8.0 s → 3.5 s
    # at sf0.1 with bit-identical weights; 15 iterations × per-task floor
    # makes 2 partitions the local sweet spot). At cluster scale size the
    # partition count to the data instead of 2.
    # dim=5 (text_feature_vector's fixed width) skips the probing head();
    # a SINGLE checkpoint partition makes each GD iteration's global
    # aggregate exchange-free (partial+final collapse into one task), so
    # the 15 driver round-trips cost one job each instead of an AQE
    # stage pair — r11, guide §1.2; weights bit-identical (same per-task
    # partial fold, one task). At cluster scale size partitions to the
    # data instead.
    train_frame = feat.coalesce(1).localCheckpoint(eager=True)
    w, b = logreg_train(train_frame, iters=15, lr=0.5, dim=5)
    return (feat.select(
        "doc_id", "label",
        (F.round(logreg_predict(w, b), 6) + F.lit(0.0)).alias("prob"))
        .withColumn("predicted", (F.col("prob") >= 0.5).cast("int")))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between snapshots (operators/cdc.py::snapshot_diff): old = events
    with event_id % 10 != 0, new = events with event_id % 7 != 0 and value
    bumped where event_id % 3 == 0 — exercising added, removed, and changed
    in one co-partitioned full outer join."""
    from akka_stream_contrib_spark.operators.cdc import snapshot_diff
    ev = tables.load(spark, "events", sf_dir)
    old = ev.filter(F.col("event_id") % 10 != 0)
    new = (ev.filter(F.col("event_id") % 7 != 0)
           .withColumn("value",
                       F.when(F.col("event_id") % 3 == 0,
                              F.round(F.col("value") + 1.0, 2))
                       .otherwise(F.col("value"))))
    return snapshot_diff(old, new, ["event_id"], ["value", "event_type"])


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution composition: exact distance-≤1 name pairs
    (functions/dedup.py::edit1_pairs) → connected components
    (dup_clusters min-label propagation) → canonical id per entity. The
    standard record-linkage pipeline (candidate generation → match →
    cluster) with every stage scale-shaped; components checked against a
    recursive-CTE oracle."""
    from akka_stream_contrib_spark.functions.dedup import (
        dup_clusters, edit1_pairs)
    cust = tables.load(spark, "customer", sf_dir).filter(
        F.col("c_custkey") < 400)
    pairs = edit1_pairs(cust, "c_custkey", "c_name")
    return (dup_clusters(pairs, "id_a", "id_b")
            .select(F.col("id").alias("c_custkey"), "cluster_id"))


def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join — the 100 TB pattern the filter exists for: build
    the filter over high-balance customers (the small side), probe the
    orders stream map-side, and aggregate revenue ONLY over rows that pass
    the filter (false positives included by construction — the oracle
    replays the identical bit pattern, so the result is deterministic).
    At scale this drops most of the fact table before any shuffle."""
    from akka_stream_contrib_spark.functions.sketches import (
        bloom_build, bloom_probe)
    cust = tables.load(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 5000)
    orders = tables.load(spark, "orders", sf_dir)
    bloom = bloom_build(cust, "c_custkey")
    member = bloom_probe(bloom, orders.select("o_custkey").distinct(),
                         "o_custkey").filter("member").select(
                             F.col("key").alias("o_custkey"))
    return (orders.join(F.broadcast(member), "o_custkey", "left_semi")
            .groupBy(F.year("o_orderdate").alias("year"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(_money("o_totalprice")).cast("double")
                 .alias("revenue")))


def q_vwap_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per return flag and 30-day bucket over
    lineitem (operators/resample.py::vwap_resample): exact decimal
    numerator/denominator, one partial-aggregated groupBy."""
    from akka_stream_contrib_spark.operators.resample import vwap_resample
    li = (tables.load(spark, "lineitem", sf_dir)
          .withColumn("_ts", F.col("l_shipdate").cast("timestamp_ntz")))
    return li.transform(vwap_resample(
        key="l_returnflag", ts="_ts", price="l_extendedprice",
        qty="l_quantity", bucket_s=86400 * 30))


def q_dedup_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce dedup (operators/resample.py::dedup_within): at most one
    kept event per (user, type) per hour, anchor resetting only on KEPT
    events — grouped Arrow state machine, one key shuffle; oracle is the
    same recurrence as a recursive CTE."""
    from akka_stream_contrib_spark.operators.resample import dedup_within
    ev = tables.load(spark, "events", sf_dir)
    return (ev.transform(dedup_within(["user_id", "event_type"],
                                      within_s=3600))
            .select("event_id", "ts", "user_id", "event_type", "value",
                    "props", "kept"))


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation report — the dashboard aggregate a data
    team reads before a training run, composed from the engine's own
    scoring ops in ONE pass over the corpus plus one source rollup:
    doc/token counts, mean model quality (quality_score's logistic,
    decimal-exact mean of 6-dp scores), exact-dup rate (distinct content
    hashes vs docs), and mean entropy-free repetition proxy (top-token
    share). Every term is engine-portable arithmetic."""
    from akka_stream_contrib_spark.functions.quality import (
        DEFAULT_QUALITY_WEIGHTS)
    docs = tables.load(spark, "documents", sf_dir)
    w = DEFAULT_QUALITY_WEIGHTS
    txt = F.col("text")
    toks = F.split(txt, " ")
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(txt).cast("double")
    mean_len = (n_chars - (n_tok - 1)) / n_tok
    digit_ratio = (n_chars - F.length(F.regexp_replace(txt, "[0-9]", ""))) / n_chars
    upper_ratio = (n_chars - F.length(F.regexp_replace(txt, "[A-Z]", ""))) / n_chars
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    z = (F.lit(float(w["bias"]))
         + F.lit(float(w["log_n_tokens"])) * F.log(n_tok + 1.0)
         + F.lit(float(w["mean_token_len"])) * mean_len
         + F.lit(float(w["digit_ratio"])) * digit_ratio
         + F.lit(float(w["upper_ratio"])) * upper_ratio
         + F.lit(float(w["distinct_ratio"])) * distinct_ratio)
    score = (F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
             .cast("decimal(10,6)"))
    per_doc = docs.select(
        "source", F.md5("text").alias("_h"),
        F.size(toks).cast("bigint").alias("_nt"),
        score.alias("_q"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_nt").alias("n_tokens"),
                 (F.round(F.sum("_q") / F.count(F.lit(1)), 6)
                  .cast("double")).alias("mean_quality"),
                 F.count_distinct("_h").alias("n_distinct"),
                 (F.round((F.count(F.lit(1)) - F.count_distinct("_h"))
                          / F.count(F.lit(1)), 6) + F.lit(0.0))
                 .alias("dup_rate")))


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement
    (functions/corpus.py::weighted_sample): 100 docs with probability ∝
    length, deterministic hash-derived uniforms, TakeOrdered selection."""
    from akka_stream_contrib_spark.functions.corpus import weighted_sample
    return (tables.load(spark, "documents", sf_dir)
            .transform(weighted_sample(100, "n_chars"))
            .select("doc_id", "n_chars", "sample_key"))


def q_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation (functions/ml.py::classification_report):
    confusion counts + precision/recall/F1/accuracy in ONE conditional-sum
    pass, over a deterministic rule pair (label = lang=='en', predicted =
    length>250) so the oracle replays it exactly."""
    from akka_stream_contrib_spark.functions.ml import classification_report
    docs = tables.load(spark, "documents", sf_dir)
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("label"),
        (F.col("n_chars") > 250).cast("int").alias("predicted"))
    return scored.transform(classification_report())


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-drift monitor (functions/ml.py::psi_drift): PSI between
    even-id events and odd-id events with values scaled 1.1× — fixed
    equal-width buckets, per-bucket decimal-exact terms, two bucket-count
    aggregations regardless of corpus size."""
    # single-scan split form (r11, guide §2.3): both slices come from one
    # events scan, so the side-dependent value (odd ids scaled 1.1×) rides
    # as a conditional column and ONE conditional-count groupBy replaces
    # two filtered scans + the full-outer bucket join — value-identical
    # (same integer bucket counts feed the same share divisions)
    from akka_stream_contrib_spark.functions.ml import psi_drift_split
    ev = tables.load(spark, "events", sf_dir)
    is_old = F.col("event_id") % 2 == 0
    d = ev.select(is_old.alias("_is_old"),
                  F.when(is_old, F.col("value"))
                  .otherwise(F.col("value") * 1.1).alias("value"))
    return psi_drift_split(d, F.col("_is_old"), "value",
                           n_buckets=10, lo=0.0, hi=1000.0)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (functions/corpus.py::dsir_weights; Xie et al.
    2023): hashed unigram+bigram importance weights tilting the corpus
    toward the lang='en' target slice; top 50 docs by log weight. The two
    bucket LMs reduce to ≤128-row broadcast lookups — the gram stream
    shuffles exactly twice regardless of corpus size."""
    from akka_stream_contrib_spark.functions.corpus import dsir_weights
    docs = tables.load(spark, "documents", sf_dir)
    w = docs.transform(dsir_weights(F.col("lang") == "en",
                                    n_buckets=128, k=0.5))
    return w.orderBy(F.desc("logweight"), "doc_id").limit(50)


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing last-touch attribution: every purchase's revenue credited
    to the day of the user's most recent click within 7 days (NULL day =
    organic/unattributed). Pure composition of the as-of join
    (operators/asof.py — one key shuffle, no range blow-up) with an exact
    decimal revenue rollup."""
    from akka_stream_contrib_spark.operators import as_of_join
    ev = tables.load(spark, "events", sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.to_date("ts").alias("click_day")))
    j = as_of_join(purchases, clicks, on=["user_id"], ts="ts",
                   right_cols=["click_day"], tolerance_s=7 * 86400)
    return (j.groupBy(F.col("click_day_asof").alias("click_day"))
            .agg(F.sum(_money("value")).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_purchases")))


def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles per event type
    (functions/sketches.py::histogram_quantiles): p50/p90/p99 of value via
    a 64-bin histogram — one map-combined shuffle, windows over ≤64 rows
    per key, no sort of the raw values at any scale."""
    from akka_stream_contrib_spark.functions.sketches import histogram_quantiles
    ev = tables.load(spark, "events", sf_dir)
    return histogram_quantiles(ev, key="event_type", value="value",
                               lo=0.0, hi=1000.0, n_bins=64,
                               qs=(0.5, 0.9, 0.99))


def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs
    (functions/multimodal.py::media_phash + phash_near_dup): Arrow-batched
    DCT hash over the (fake-decoded) payloads, pigeonhole band join,
    exact bit_count verify. 20 payloads are duplicated under shifted ids
    so the detector provably fires. Oracle: byte-identical texts (planted
    clones plus any natural fixture duplicates) at hamming 0 are the
    complete ground truth — no non-identical fixture pair falls within the
    radius — so the driver value-checks the detector output; the
    hamming-nearness property is pinned by pytest on gradient images."""
    from akka_stream_contrib_spark.functions.multimodal import (
        media_phash, phash_near_dup)
    docs = tables.load(spark, "documents", sf_dir)
    media = docs.select("doc_id", F.col("text").cast("binary").alias("media"))
    dup = (media.filter(F.col("doc_id") < 20)
           .withColumn("doc_id", F.col("doc_id") + 1000000))
    hashed = media.unionByName(dup).transform(media_phash(fake_decode=True))
    return (hashed.transform(phash_near_dup(radius=4))
            .orderBy("id_a", "id_b"))


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each event's value against its
    (event_type, hour-of-day) mean — the seasonal-naive residual monitor
    for metric streams. Baselines reduce to ≤ types×24 rows (decimal-exact
    means) and broadcast back over one scan; top 20 |residual| via
    TakeOrdered, no global sort."""
    ev = tables.load(spark, "events", sf_dir)
    base = (ev.groupBy(F.col("event_type").alias("etype"),
                       F.hour("ts").alias("_bh"))
            .agg((F.sum(_money("value")).cast("double")
                  / F.count(F.lit(1))).alias("_mu")))
    scored = (ev.select("event_id", "event_type",
                        F.hour("ts").alias("hod"), "value")
              .join(F.broadcast(base),
                    (F.col("event_type") == F.col("etype"))
                    & (F.col("hod") == F.col("_bh")), "inner"))
    resid = F.round(F.col("value") - F.col("_mu"), 6)
    return (scored
            .select("event_id", "event_type", "hod", "value",
                    resid.alias("residual"))
            .orderBy(F.abs(F.col("residual")).desc(), "event_id")
            .limit(20))


def q_blocking_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking quality audit on the distinct part names:
    reduction ratio (pairs pruned by the first-4-chars block) and pair
    completeness (share of true JW≥0.86 matches the blocking keeps).
    The all-pairs ground truth runs on the DISTINCT-name sample — the
    audit-scale check you run before trusting a blocking scheme on the
    full corpus (where all-pairs is never an option)."""
    from akka_stream_contrib_spark.functions.text import jaro_winkler_col
    from akka_stream_contrib_spark.util import drop_stale_caches, pipeline_cache
    drop_stale_caches()
    part = tables.load(spark, "part", sf_dir)
    names = pipeline_cache(part.select("p_name").distinct())
    a = names.select(F.col("p_name").alias("w1"))
    b = names.select(F.col("p_name").alias("w2"))
    pairs = (a.join(b, F.col("w1") < F.col("w2"))
             .withColumn("_blocked",
                         (F.substring("w1", 1, 4)
                          == F.substring("w2", 1, 4)).cast("int"))
             .withColumn("_match",
                         (F.round(jaro_winkler_col(F.col("w1"),
                                                   F.col("w2")), 6)
                          >= 0.86).cast("int")))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("total_pairs"),
        F.sum("_blocked").alias("candidate_pairs"),
        F.sum("_match").alias("true_matches"),
        F.sum(F.col("_blocked") * F.col("_match"))
        .alias("matched_in_candidates"))
    return agg.select(
        "total_pairs", "candidate_pairs", "true_matches",
        "matched_in_candidates",
        (F.round(F.lit(1.0) - F.col("candidate_pairs")
                 / F.col("total_pairs"), 6) + F.lit(0.0))
        .alias("reduction_ratio"),
        (F.round(F.col("matched_in_candidates")
                 / F.col("true_matches"), 6) + F.lit(0.0))
        .alias("pair_completeness"))


def q_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified allocation over event types
    (functions/corpus.py::neyman_allocation): variance-minimizing budget
    split from ONE pass of decimal-exact moments, deterministic hash
    selection, and an integer id-sum checksum of the sample per stratum."""
    from akka_stream_contrib_spark.functions.corpus import neyman_allocation
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(neyman_allocation(1000))


def q_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration (reliability) report: a fixed-literal-weight
    logistic scorer over document length binned into 10 probability
    deciles, with per-bin mean prediction, observed rate, and Brier
    contribution — the is-the-probability-meaningful audit run on every
    quality classifier before its scores gate a corpus. One partial-agg
    shuffle to ≤10 rows; decimal-exact bin sums."""
    docs = tables.load(spark, "documents", sf_dir)
    z = (F.size(F.split("text", " ")) - F.lit(60)) / F.lit(30.0)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    d = docs.select(prob.alias("_p"),
                    (F.col("lang") == "en").cast("int").alias("_y"))
    bin_ = F.least(F.floor(F.col("_p") * 10), F.lit(9)).cast("int")
    pd_ = F.col("_p").cast("decimal(10,6)")
    sq = F.round((F.col("_p") - F.col("_y"))
                 * (F.col("_p") - F.col("_y")), 9).cast("decimal(12,9)")
    return (d.groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.round(F.sum(pd_).cast("double") / F.count(F.lit(1)), 6)
                  + F.lit(0.0)).alias("avg_pred"),
                 (F.round(F.sum("_y") / F.count(F.lit(1)), 6)
                  + F.lit(0.0)).alias("obs_rate"),
                 (F.round(F.sum(sq).cast("double") / F.count(F.lit(1)), 6)
                  + F.lit(0.0)).alias("brier")))


def q_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-form silhouette per label over the embeddings table
    (functions/clustering.py::cluster_silhouette): O(n·k) quality metric —
    broadcast centroids, one corpus scan, fixed-order distance folds."""
    from akka_stream_contrib_spark.functions.clustering import (
        cluster_silhouette)
    emb = tables.load(spark, "embeddings", sf_dir)
    return cluster_silhouette(emb)


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per source, the share of token
    occurrences outside the top-30 corpus vocabulary — the OOV report run
    before committing to a tokenizer vocab. The vocabulary is tiny by
    construction and broadcasts; the token stream shuffles once."""
    from akka_stream_contrib_spark.functions import vocab_topk
    docs = tables.load(spark, "documents", sf_dir)
    vocab = (docs.transform(vocab_topk(k=30))
             .select("token").withColumn("_in", F.lit(1)))
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    return (toks.join(F.broadcast(vocab), "token", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
                 .alias("n_oov"))
            .withColumn("oov_rate",
                        F.round(F.col("n_oov") / F.col("n_tokens"), 6)
                        + F.lit(0.0)))


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-corpus exact segment dedup
    (functions/corpus.py::segment_dedup): 8-token segments, keep-first by
    (doc, position), documents reassembled from surviving segments. Two
    shuffles: segment-content window + doc reassembly."""
    from akka_stream_contrib_spark.functions.corpus import segment_dedup
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(segment_dedup(seg_tokens=8))


def q_quantile_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: the histogram quantile estimate next to the
    exact interpolated percentile per event type, with absolute error —
    the check you run before trusting a sketch at 100 TB (where the exact
    side becomes a sampled audit, not a full sort)."""
    from akka_stream_contrib_spark.functions.sketches import histogram_quantiles
    qs = (0.5, 0.9, 0.99)
    ev = tables.load(spark, "events", sf_dir)
    sk = histogram_quantiles(ev, key="event_type", value="value",
                             lo=0.0, hi=1000.0, n_bins=64, qs=qs)
    exact = ev.groupBy(F.col("event_type").alias("key")).agg(
        *[F.round(F.expr(f"percentile(value, {q})"), 6).alias(f"_e{i}")
          for i, q in enumerate(qs)])
    exact_long = exact.select(
        "key",
        F.explode(F.array(*[
            F.struct(F.lit(float(q)).alias("q"),
                     F.col(f"_e{i}").alias("exact"))
            for i, q in enumerate(qs)])).alias("s")
    ).select("key", "s.q", "s.exact")
    return (sk.join(exact_long, ["key", "q"])
            .select("key", "q", "est", "exact",
                    F.round(F.abs(F.col("est") - F.col("exact")), 6)
                    .alias("abs_err"), "n"))


def q_fuzzy_vocab_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-cluster detection over the corpus vocabulary with Jaro-Winkler
    similarity (functions/text.py::jaro_winkler_col — validated char-for-
    char against DuckDB's native jaro_winkler_similarity): first-char +
    length-band blocking bounds the candidate pairs, the Arrow-batched
    similarity runs on candidates only, never all-pairs."""
    from akka_stream_contrib_spark.functions.text import jaro_winkler_col
    part = tables.load(spark, "part", sf_dir)
    names = part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("w1"))
    b = names.select(F.col("p_name").alias("w2"))
    cand = a.join(
        b,
        (F.substring("w1", 1, 4) == F.substring("w2", 1, 4))
        & (F.col("w1") < F.col("w2")))
    jw = F.round(jaro_winkler_col(F.col("w1"), F.col("w2")), 6)
    return (cand.withColumn("jw", jw)
            .filter(F.col("jw") >= 0.86)
            .select("w1", "w2", "jw"))


def q_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus redundancy diagnostic (functions/dedup.py::novelty_score):
    share of each doc's distinct trigrams first seen in that doc —
    duplicates of earlier docs score 0. Three bounded shuffles; integer
    counts only."""
    from akka_stream_contrib_spark.functions.dedup import novelty_score
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(novelty_score(n=3))


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning order (functions/corpus.py::curriculum_order):
    4 difficulty stages by descending length with a deterministic hash
    shuffle inside each stage — both total orders via the distributed
    global-rank primitive, no single-partition window."""
    from akka_stream_contrib_spark.functions.corpus import curriculum_order
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(curriculum_order(4, F.col("n_chars")))


def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (operators/cdc.py::apply_changes): replay a changeset —
    deletes for event_id%7==0, value-bumped upserts for event_id%3==0
    (delete wins on overlap; upserts include brand-new keys the %10 base
    snapshot never had) — one broadcast anti join + union, the snapshot is
    never sorted and shuffles at most once."""
    from akka_stream_contrib_spark.operators.cdc import apply_changes
    ev = tables.load(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value")
    snapshot = ev.filter(F.col("event_id") % 10 != 0)
    changes = (ev.filter((F.col("event_id") % 7 == 0)
                         | (F.col("event_id") % 3 == 0))
               .withColumn("op", F.when(F.col("event_id") % 7 == 0,
                                        F.lit("delete"))
                           .otherwise(F.lit("upsert")))
               .withColumn("value", F.when(F.col("op") == "upsert",
                                           F.col("value") + 1.0)
                           .otherwise(F.col("value"))))
    return apply_changes(snapshot, changes, ["event_id"])


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding (functions/ml.py::target_encoding):
    event_type encoded by the out-of-fold smoothed mean of value — two
    map-side-collapsing groupBys + broadcast joins, decimal-exact sums."""
    from akka_stream_contrib_spark.functions.ml import target_encoding
    ev = tables.load(spark, "events", sf_dir).select(
        "event_id", "event_type", "value")
    return ev.transform(target_encoding(
        "event_type", "value", "event_id", n_folds=5, smoothing=20))


def q_pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated payment-card PII scan (functions/text.py::
    luhn_scan): 16-digit candidates synthesized deterministically from
    doc_id are appended to each document, and only Luhn-valid ones are
    reported (last4 + length, never the number) — zero-shuffle map-side
    expressions end to end."""
    from akka_stream_contrib_spark.functions.text import luhn_scan
    docs = tables.load(spark, "documents", sf_dir)
    card = F.concat(
        F.lpad((F.col("doc_id") * 48271 % 100000000).cast("string"), 8, "0"),
        F.lpad((F.col("doc_id") * 16807 % 100000000).cast("string"), 8, "0"))
    aug = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" card "), card).alias("text"))
    return aug.transform(luhn_scan())


def q_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive boolean retrieval (functions/retrieval.py::
    boolean_and_search): documents containing ALL of spark/join/window
    with per-term frequencies — ONE codegen scan, no explode/join."""
    from akka_stream_contrib_spark.functions.retrieval import (
        boolean_and_search)
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(
        boolean_and_search(["spark", "join", "window"]))


def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing per user (operators/timeseries.py::
    holt_linear): grouped Arrow fold, one key shuffle. The DuckDB
    recursive-CTE oracle replays the recurrence step-for-step with the
    same double factors; α/β are deliberately NON-dyadic (0.45/0.35) —
    halving factors would land results exactly on 6-dp rounding ties,
    where engines' round-on-double algorithms disagree (see
    holt_linear's rounding note)."""
    from akka_stream_contrib_spark.operators.timeseries import holt_linear
    ev = tables.load(spark, "events", sf_dir).select(
        "event_id", "user_id", "value")
    return ev.transform(holt_linear(alpha=0.45, beta=0.35))


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 and TF-IDF
    top-100 rankings for the spark/join/window query (functions/
    retrieval.py::rrf_fusion — ONE cached tf scan scores both rankers,
    rank 0 = absent from that list)."""
    from akka_stream_contrib_spark.functions.retrieval import rrf_fusion
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(
        rrf_fusion(["spark", "join", "window"], k=20, depth=100))


def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-greedy token-budget curation (functions/corpus.py::
    token_budget_fill): keep the highest distinct-token-ratio documents
    until 30% of the corpus's tokens are spent; the global greedy prefix
    is the two-phase range running sum (operators/global_order.py) — no
    single-partition window."""
    from akka_stream_contrib_spark.functions.corpus import token_budget_fill
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(token_budget_fill(budget_num=3, budget_den=10))


def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation plumbing (functions/multimodal.py::
    audio_segments): documents stand in as audio payloads, per-frame
    energy is the hash-derived decode stub (JVM md5 — fully
    oracle-mirrorable), and contiguous active frames merge into segments
    via gaps-and-islands."""
    from akka_stream_contrib_spark.functions.multimodal import (
        audio_segments, with_media_columns)
    docs = tables.load(spark, "documents", sf_dir)
    media = docs.transform(with_media_columns(
        payload=F.col("text").cast("binary"), modality=F.lit("audio")))
    return media.transform(audio_segments(frame_ms=1000, threshold=0.6))


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining (functions/similarity.py::
    hard_negatives): for every embedding, the top-3 most-similar vectors
    with a DIFFERENT label — broadcast-GEMM kernel, rounded-sim +
    id tie-break rank, zero shuffles."""
    from akka_stream_contrib_spark.functions import hard_negatives
    emb = tables.load(spark, "embeddings", sf_dir)
    return hard_negatives(emb, k=3)


def q_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced training-shard assignment (functions/corpus.py::
    balanced_shards): round-robin over size-descending documents via the
    two-phase global rank — 16 shards of near-equal token totals."""
    from akka_stream_contrib_spark.functions.corpus import balanced_shards
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(balanced_shards(n_shards=16))


def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of doc length as a predictor of lang=='en' (functions/ml.py::
    auc_roc): distinct-score collapse, two-phase range prefix of the
    negatives, exact-integer Mann–Whitney numerator — bit-identical AUC on
    any engine/partitioning."""
    from akka_stream_contrib_spark.functions.ml import auc_roc
    docs = tables.load(spark, "documents", sf_dir)
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("label"),
        F.col("n_chars").alias("score"))
    return scored.transform(auc_roc())


def q_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed level-shift changepoints on each user's value series
    (operators/timeseries.py::mean_shift_detect): |mean(next 5) −
    mean(prev 5)| > 100, exact cents-integer test, one key shuffle."""
    from akka_stream_contrib_spark.operators.timeseries import (
        mean_shift_detect,
    )
    ev = tables.load(spark, "events", sf_dir).select(
        "event_id", "user_id", "value")
    return ev.transform(mean_shift_detect(w=5, threshold=100.0))


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type autocorrelation at lags 1–3 (operators/timeseries.py::
    autocorrelation): cents-integer moment sums, one Pearson combination
    per (type, lag) — the seasonality probe."""
    from akka_stream_contrib_spark.operators.timeseries import (
        autocorrelation,
    )
    ev = tables.load(spark, "events", sf_dir).select(
        "event_id", "event_type", "value")
    return ev.transform(autocorrelation(key="event_type", lags=(1, 2, 3)))


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank–frequency fit over the top-300 corpus tokens
    (functions/corpus.py::zipf_fit): TakeOrdered vocabulary, two-phase
    global rank, decimal-exact regression moments."""
    from akka_stream_contrib_spark.functions.corpus import zipf_fit
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(zipf_fit(top_k=300))


def q_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes language ID, trained AND scored in-engine (functions/
    ml.py::nb_train/nb_predict): top-300 vocabulary, Laplace smoothing,
    decimal-exact posteriors, label-asc tie-break; resubstitution
    confusion matrix (truth × predicted counts)."""
    from akka_stream_contrib_spark.functions.ml import nb_predict, nb_train
    docs = tables.load(spark, "documents", sf_dir)
    matrix, priors = nb_train(docs, vocab_size=300)
    pred = nb_predict(docs, matrix, priors)
    truth = docs.select("doc_id", F.col("lang").alias("truth"))
    return (pred.join(truth, "doc_id")
            .groupBy("truth", "predicted")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_tok").alias("sum_tok")))


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation (functions/retrieval.py::ndcg_at_k):
    nDCG@10 of the BM25 top-10 for the spark/join/window query, graded by
    how many of the three query terms each hit actually contains —
    9-dp-literal discounts, decimal-exact DCG sums."""
    from akka_stream_contrib_spark.functions import bm25_topk
    from akka_stream_contrib_spark.functions.retrieval import ndcg_at_k
    terms = ["spark", "join", "window"]
    docs = tables.load(spark, "documents", sf_dir)
    top = docs.transform(bm25_topk(terms, k=10))
    toks = F.split(F.col("text"), " ")
    rel = sum((F.array_contains(toks, t).cast("int") for t in terms),
              F.lit(0))
    graded = (F.broadcast(top)
              .join(docs.select("doc_id", rel.alias("rel")), "doc_id"))
    return graded.transform(ndcg_at_k(rel_col="rel", k=10,
                                      order_by=["score"]))


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort mean comparison (functions/ml.py::welch_ttest): purchase vs
    click event values — one conditional-sum pass, exact cents-integer
    moments, Welch–Satterthwaite df."""
    from akka_stream_contrib_spark.functions.ml import welch_ttest
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(welch_ttest("event_type", "value",
                                    "purchase", "click"))


def q_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford audit of lineitem extended prices (functions/
    quality.py::benford_check): string-derived leading digit (no
    cross-engine pow/log boundary), 9-group exact counts, χ² vs the
    9-dp-literal Benford shares."""
    from akka_stream_contrib_spark.functions.quality import benford_check
    li = tables.load(spark, "lineitem", sf_dir)
    return li.transform(benford_check("l_extendedprice"))


def q_sliced_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice classifier evaluation (functions/ml.py::
    classification_report with group_by): a deterministic rule pair
    (label = n_chars>250, predicted = n_tokens>45 — correlated, so every
    language slice populates all four confusion cells) reported PER
    LANGUAGE — the fairness/regression view; one map-combined slice
    shuffle."""
    from akka_stream_contrib_spark.functions.ml import classification_report
    docs = tables.load(spark, "documents", sf_dir)
    # NULL stats carry no confusion evidence, and Spark's three-valued
    # cast would drop them where a SQL CASE..ELSE buckets them — exclude
    # explicitly on both sides (no NULLs in today's fixtures; this guards
    # regeneration)
    scored = (docs
              .filter(F.col("n_chars").isNotNull()
                      & F.col("text").isNotNull())
              .select(
                  F.col("lang"),
                  (F.col("n_chars") > 250).cast("int").alias("label"),
                  (F.size(F.split(F.col("text"), " ")) > 45).cast("int")
                  .alias("predicted")))
    return scored.transform(classification_report(group_by=["lang"]))


def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-separation monitor (functions/ml.py::ks_statistic): KS of doc
    length vs lang=='en' — distinct-score collapse, two range-prefix CDFs,
    exact-integer max, smallest-score tie-break."""
    from akka_stream_contrib_spark.functions.ml import ks_statistic
    docs = tables.load(spark, "documents", sf_dir)
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("label"),
        F.col("n_chars").alias("score"))
    return scored.transform(ks_statistic())


def q_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² token selection for the lang=='en' class (functions/ml.py::
    chi2_tokens): document-presence contingency, exact-count cells,
    top-30 by (6-dp χ² desc, token asc)."""
    from akka_stream_contrib_spark.functions.ml import chi2_tokens
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(
        chi2_tokens(F.col("lang") == "en", top_k=30, min_docs=5))


def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node clustering coefficient over the user co-activity graph
    (functions/graph.py::local_clustering): q_triangle_count's edges, each
    closed wedge credited to its three vertices, exact-integer counts to
    the one coefficient division."""
    from akka_stream_contrib_spark.functions.graph import local_clustering
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy(F.date_trunc("hour", "ts")).orderBy("event_id")
    edges = (ev.withColumn("src", F.lag("user_id").over(w))
             .filter(F.col("src").isNotNull()
                     & (F.col("src") != F.col("user_id")))
             .select("src", F.col("user_id").alias("dst")))
    return local_clustering(edges)


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining (functions/basket.py::association_rules):
    brand pairs co-ordered in the same order — support / confidence /
    lift from exact counts, top-25 by lift. ONE basket-key self-join;
    oversized baskets excluded up front."""
    from akka_stream_contrib_spark.functions.basket import association_rules
    li = tables.load(spark, "lineitem", sf_dir)
    part = tables.load(spark, "part", sf_dir)
    baskets = (li.join(part, li.l_partkey == part.p_partkey)
               .select(F.col("l_orderkey").alias("basket"),
                       F.col("p_brand").alias("item")))
    return baskets.transform(association_rules(
        "basket", "item", min_pair_count=3, top_k=25))


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Censoring-aware time-to-first-purchase curve (functions/ml.py::
    kaplan_meier): subject = user, duration = days from first activity to
    first purchase, administratively right-censored at a deterministic
    per-user observation window of ``user_id % 7`` days (the uniform
    fixtures have no natural churn, so the censoring device is explicit —
    at sf0.01 this yields 121 events / 29 censored over 5 event times, a
    real mixed curve). Distinct-duration collapse, range-prefix at-risk
    set, log-space product with 9-dp decimal terms."""
    from akka_stream_contrib_spark.functions.ml import kaplan_meier
    ev = tables.load(spark, "events", sf_dir)
    g = ev.groupBy("user_id").agg(
        F.min("ts").alias("_first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("_buy"))
    pdays = F.datediff(F.to_date("_buy"), F.to_date("_first"))
    cday = (F.col("user_id") % 7).cast("int")
    observed = pdays.isNotNull() & (pdays <= cday)
    subj = g.select(
        F.when(observed, pdays).otherwise(cday).alias("duration"),
        observed.cast("int").alias("event"))
    return subj.transform(kaplan_meier())


#: deterministic unit anchor for q_embedding_drift: the quantized_ann
#: synthetic query direction, L2-normalized in python so BOTH engines
#: receive the identical double literals
def _drift_anchor() -> list[float]:
    import math as _m
    qv = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    n = _m.sqrt(sum(v * v for v in qv))
    return [v / n for v in qv]


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-population drift monitor: PSI between two corpus slices
    (labels 0–4 vs 5–9) of the distance-to-anchor distribution — the
    embedding-ops analogue of q_psi_drift (did the new batch's vectors
    move relative to a fixed reference direction?). The distance is ONE
    parsed left-assoc expression over the 64 components with python
    anchor literals — `<repr>D` double literals here, and the oracle
    mirrors each as CAST('<repr>' AS DOUBLE) because DuckDB's
    VARCHAR->DOUBLE parse is correctly rounded while its bare-literal
    DECIMAL(18,17)->DOUBLE path can be 1 ulp off (fixtures are unit
    vectors, so anchor distance is the discriminative scalar); then
    functions/ml.py::psi_drift's fixed-bucket machinery. Map-side
    distance + two bucket-count aggregations at any corpus size."""
    # single-scan split form (r11, guide §2.3): the 64-term anchor
    # distance is evaluated ONCE per row and one conditional-count groupBy
    # replaces two filtered scans + the full-outer bucket join —
    # value-identical (same integer bucket counts, same share divisions)
    from akka_stream_contrib_spark.functions.ml import psi_drift_split
    a = _drift_anchor()
    dist = "sqrt(0.0D" + "".join(
        f" + (CAST(embedding[{i}] AS DOUBLE) - {a[i]!r}D)"
        f" * (CAST(embedding[{i}] AS DOUBLE) - {a[i]!r}D)"
        for i in range(64)) + ")"
    emb = tables.load(spark, "embeddings", sf_dir)
    d = emb.selectExpr("label < 5 AS _is_old", f"{dist} AS value")
    return psi_drift_split(d, F.col("_is_old"), "value",
                           n_buckets=10, lo=1.0, hi=1.8)


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification audit (functions/quality.py::k_anonymity):
    customer groups under the (nation, segment, coarse account-balance)
    quasi-identifier with fewer than k=5 members — the groups a
    pseudonymized release would expose. One map-combined groupBy."""
    from akka_stream_contrib_spark.functions.quality import k_anonymity
    cust = tables.load(spark, "customer", sf_dir)
    quasi = cust.select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 1000)
        .cast("int").alias("bal_band"))
    return quasi.transform(k_anonymity(
        ["c_nationkey", "c_mktsegment", "bal_band"], k=5))


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift between two corpus slices (functions/ml.py::
    js_divergence): JSD of the token distributions of English vs
    non-English documents — symmetric, always ≤ ln 2, no epsilon floor.
    ONE conditional-count groupBy on the token key (the slices share a
    corpus, so the split form replaces two filtered scans + a full-outer
    vocabulary join — the oracle's shape); 9-dp decimal term sums (the
    psi_drift device)."""
    from akka_stream_contrib_spark.functions.ml import js_divergence_split
    docs = tables.load(spark, "documents", sf_dir)
    tok = (docs.filter(F.col("lang").isNotNull())
           .select("lang",
                   F.explode(F.split(F.lower("text"), " ")).alias("item")))
    return js_divergence_split(tok, F.col("lang") == "en", "item")


def q_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable is the next user event (functions/ml.py::
    conditional_entropy): H(next), H(next|cur), and their difference —
    the mutual information of the event-type transition table. One lead
    window on user_id + one map-combined pair groupBy; the entropy sums
    run over the |types|²-row pair table."""
    from akka_stream_contrib_spark.functions.ml import conditional_entropy
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    pairs = ev.select("event_type",
                      F.lead("event_type").over(w).alias("next_type"))
    return conditional_entropy(pairs, "event_type", "next_type")


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bars for an eval metric (functions/ml.py::bootstrap_ci):
    deterministic multiplicative-hash bootstrap (b=200 resamples) of the
    mean n_chars over the fixed doc_id<400 panel — exact integer draws
    and sums, one double division per resample mean, rank-selected 2.5 %
    CI bounds."""
    from akka_stream_contrib_spark.functions.ml import bootstrap_ci
    docs = tables.load(spark, "documents", sf_dir)
    return bootstrap_ci(docs, "n_chars", "doc_id", n=400, b=200)


def q_gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-concentration audit (functions/quality.py::
    gini_concentration): Gini coefficient of event counts across users —
    exact integer rank·count sums over the two-phase range rank (key
    cardinality is unbounded at 100 TB; no single-partition window)."""
    from akka_stream_contrib_spark.functions.quality import gini_concentration
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(gini_concentration("user_id"))


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-evaluation fertility (functions/text.py::
    tokenizer_fertility): BPE-ish subword tokens per whitespace word, per
    language — the under-served-language detector. One map-combined
    groupBy, exact integer sums, one try_divide."""
    from akka_stream_contrib_spark.functions.text import tokenizer_fertility
    docs = tables.load(spark, "documents", sf_dir)
    return docs.transform(tokenizer_fertility())


def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation #2 (functions/retrieval.py::
    average_precision_at_k): AP@20 of the BM25 top-20 for the
    spark/join/window query against an INDEPENDENT editorial-style label
    (document length > 300 chars) — binary relevance, so AP measures
    whether the labeled docs rank early; term containment would be
    degenerate here (BM25's own signal ⇒ all-relevant top-k)."""
    from akka_stream_contrib_spark.functions import bm25_topk
    from akka_stream_contrib_spark.functions.retrieval import (
        average_precision_at_k,
    )
    docs = tables.load(spark, "documents", sf_dir)
    top = docs.transform(bm25_topk(["spark", "join", "window"], k=20))
    graded = F.broadcast(top).join(
        docs.select("doc_id",
                    (F.col("n_chars") > 300).cast("int").alias("rel")),
        "doc_id")
    return graded.transform(
        average_precision_at_k(rel_col="rel", k=20, order_by=["score"]))


def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware retrieval (functions/similarity.py::mmr_select):
    Maximal Marginal Relevance top-5 from the int8-quantized shortlist-20
    — relevance and redundancy as EXACT integer inner products, λ=7/10 as
    a rational, so every greedy round's objective is an exact integer the
    unrolled DuckDB oracle replays bit-for-bit. The distributed part is
    the shortlist preselect (TakeOrdered on the quantized query dot);
    the greedy loop runs on the bounded collected shortlist."""
    from akka_stream_contrib_spark.functions.similarity import mmr_select
    emb = tables.load(spark, "embeddings", sf_dir)
    qvec = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    return mmr_select(emb, qvec, k=5, shortlist=20)


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus split (functions/corpus.py::perplexity_split over
    functions/text.py::bigram_logprob_score): rank every scored doc by LM
    log-probability and cut into 3 equal-count buckets (tail/middle/head)
    by exact integer rank arithmetic — the quality-tiering step before
    mixture sampling. Two-phase range rank, no quantile estimation."""
    from akka_stream_contrib_spark.functions import bigram_logprob_score
    from akka_stream_contrib_spark.functions.corpus import perplexity_split
    docs = tables.load(spark, "documents", sf_dir)
    scored = docs.transform(bigram_logprob_score(k=0.5))
    return scored.transform(perplexity_split(n_buckets=3))


def q_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral feature table (functions/ml.py::rfm_features): per-user
    recency (days to the corpus max timestamp), frequency, and exact
    decimal monetary sum — one map-combined groupBy + a broadcast 1-row
    anchor."""
    from akka_stream_contrib_spark.functions.ml import rfm_features
    ev = tables.load(spark, "events", sf_dir)
    return rfm_features(ev)


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph mixing structure (functions/graph.py::degree_assortativity):
    Pearson correlation of endpoint degrees over the co-activity graph's
    undirected edges (both orientations) — hubs-link-to-hubs vs
    hubs-link-to-leaves. Exact decimal moment sums, one double Pearson
    combination. Same deterministic lag-edge graph as pagerank_users."""
    from akka_stream_contrib_spark.functions.graph import degree_assortativity
    ev = tables.load(spark, "events", sf_dir)
    return degree_assortativity(_interaction_edges(ev))


def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit report: the near-dup connected components of
    q_dup_clusters reduced to a cluster-size histogram plus the corpus
    totals a dedup run reports (members in clusters, clusters, removable
    docs = members − clusters). Two tiny aggregations over the cluster
    table + a broadcast 1-row totals frame.

    Scope: rides the same exact-pair path as dup_clusters /
    semantic_dedup — quadratic BY DESIGN (near_dup_pairs' documented
    audit/candidate-set contract); at corpus scale feed it clusters built
    from the banded generators (minhash_lsh_dedup / ann_lsh_topk)
    instead. The histogram/totals stages themselves are
    cluster-cardinality aggregations at any scale."""
    from akka_stream_contrib_spark.functions import (dup_clusters,
                                                      near_dup_pairs_blocked)
    emb = tables.load(spark, "embeddings", sf_dir)
    pairs = near_dup_pairs_blocked(emb, threshold=0.4)
    clusters = dup_clusters(pairs, "id_a", "id_b")
    sizes = (clusters.groupBy("cluster_id")
             .agg(F.count(F.lit(1)).alias("cluster_size")))
    hist = (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters")))
    tot = sizes.agg(
        F.sum("cluster_size").alias("total_members"),
        F.count(F.lit(1)).alias("total_clusters"))
    return (hist.crossJoin(F.broadcast(tot))
            .select("cluster_size", "n_clusters", "total_members",
                    "total_clusters",
                    (F.col("total_members") - F.col("total_clusters"))
                    .alias("removable_docs")))


def q_psi_probe_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed sketch-based drift monitor (functions/sketches.py::psi_probe
    over histogram_build): per-event-type PSI of the odd-id slice (values
    scaled 1.1×, the synthetic drift) against the even-id reference,
    computed ENTIRELY from the two mergeable (key, bin, cnt) sketches —
    the batch twin of the histogram_stream + psi_probe streaming monitor
    (tests/test_streaming.py proves the streamed sketch probes to the
    identical PSI). Probe cost is sketch-cardinality at any stream
    volume."""
    from akka_stream_contrib_spark.functions.sketches import (
        histogram_build_split, psi_probe)
    ev = tables.load(spark, "events", sf_dir)
    # one tagged conditional-count scan builds BOTH sketches (the %2
    # parity predicate prunes no row groups, so two histogram_build
    # calls each read the whole table) — histogram_build_split docstring
    # has the value-identity argument
    live, ref = histogram_build_split(
        ev, F.col("event_id") % 2 == 1, key="event_type",
        ref_value=F.col("value"), live_value=F.col("value") * F.lit(1.1),
        lo=0.0, hi=1000.0, n_bins=10)
    return psi_probe(live, ref)


def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement (functions/ml.py::cohen_kappa) between two
    heuristic document raters — a char-length rubric vs a token-count
    rubric, both 3-class — chance-corrected by the marginal product. The
    label-quality audit run before trusting any annotation pass."""
    from akka_stream_contrib_spark.functions.ml import cohen_kappa
    docs = tables.load(spark, "documents", sf_dir)
    rater_a = F.when(
        F.col("n_chars").isNotNull(),
        F.when(F.col("n_chars") < 300, F.lit("short"))
        .when(F.col("n_chars") < 900, F.lit("mid"))
        .otherwise(F.lit("long")))
    ntok = F.size(F.split(F.col("text"), " "))
    rater_b = F.when(
        F.col("text").isNotNull(),
        F.when(ntok < 50, F.lit("short"))
        .when(ntok < 150, F.lit("mid"))
        .otherwise(F.lit("long")))
    return docs.transform(cohen_kappa(rater_a, rater_b))


def q_wilson_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty-aware leaderboard (functions/ml.py::wilson_rank): users
    ranked by the Wilson 95% lower bound of their purchase rate — one
    conditional-count groupBy, closed-form bound from exact counts."""
    from akka_stream_contrib_spark.functions.ml import wilson_rank
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(wilson_rank(
        (F.col("event_type") == "purchase"), "user_id",
        min_trials=5, top_k=20))


def q_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision threshold (functions/ml.py::f1_threshold_sweep) for
    doc length predicting lang=='en' — the auc_roc fixture swept for the
    F1-max cut: distinct-score collapse, shared two-phase prefix of both
    classes, exact-integer confusion counts at every candidate."""
    from akka_stream_contrib_spark.functions.ml import f1_threshold_sweep
    docs = tables.load(spark, "documents", sf_dir)
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("label"),
        F.col("n_chars").alias("score"))
    return scored.transform(f1_threshold_sweep())


_MRR_QUERIES = {
    "q1": ["spark", "join", "window"],
    "q2": ["hash", "merge", "sort"],
    "q3": ["filter", "customer", "vector"],
}


def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank (functions/retrieval.py::mrr_at_k) of three
    BM25 runs, a hit being a doc containing ALL the query's terms —
    per-query bounded rank windows, 9-dp-decimal reciprocal ranks, one
    final double division.

    r10 shape: ONE shared tf pass scores all three queries — the term
    frequencies of every query's terms are projected in a single cached
    frame, corpus stats (N, Σdl, per-term df) come from ONE 1-row
    aggregate broadcast back, and each query's top-10 is a
    TakeOrderedAndProject branch over the shared scored frame with its
    relevance bit computed in place (tf > 0 for every term ⟺ the old
    array_contains conjunction). Score expression = the exact
    `_bm25_score` shape `bm25_topk` uses, so the per-query results are
    bit-identical to three independent runs; the old form paid 3 stats
    scans + 3 scored scans + 3 broadcast rel joins (9 corpus scans)."""
    from akka_stream_contrib_spark.functions.retrieval import (
        _bm25_score, _term_tf, mrr_at_k)
    from akka_stream_contrib_spark.util import pipeline_cache
    docs = tables.load(spark, "documents", sf_dir)
    qterms = list(_MRR_QUERIES.items())
    toks = (docs.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
            .filter(F.col("_toks").isNotNull()))
    tf = pipeline_cache(toks.select(
        "doc_id", F.size("_toks").alias("dl"),
        *[_term_tf(t).alias(f"tf_{qi}_{j}")
          for qi, (_, terms) in enumerate(qterms)
          for j, t in enumerate(terms)]))
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl"),
        *[F.sum((F.col(f"tf_{qi}_{j}") > 0).cast("long"))
          .alias(f"df_{qi}_{j}")
          for qi, (_, terms) in enumerate(qterms)
          for j in range(len(terms))])
    scored = tf.crossJoin(F.broadcast(stats))
    parts = []
    for qi, (name, terms) in enumerate(qterms):
        nt = len(terms)
        sub = scored.select(
            "doc_id", "dl", "n", "sdl",
            *[F.col(f"tf_{qi}_{j}").alias(f"tf{j}") for j in range(nt)],
            *[F.col(f"df_{qi}_{j}").alias(f"df{j}") for j in range(nt)])
        rel = F.when(
            sum(((F.col(f"tf{j}") > 0).cast("int") for j in range(nt)),
                F.lit(0)) == nt, 1).otherwise(0)
        parts.append(
            sub.select(F.lit(name).alias("query"), "doc_id",
                       (F.round(_bm25_score(nt), 6) + F.lit(0.0))
                       .alias("score"), rel.alias("rel"))
            .orderBy(F.desc("score"), "doc_id").limit(10))
    allq = parts[0]
    for p in parts[1:]:
        allq = allq.unionByName(p)
    return allq.transform(mrr_at_k(k=10))


def q_item_cf_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (functions/basket.py::item_cf_topk)
    over order baskets: per part, the top-5 co-ordered parts by cosine —
    one basket self-join, per-item bounded rank window."""
    from akka_stream_contrib_spark.functions.basket import item_cf_topk
    li = tables.load(spark, "lineitem", sf_dir)
    return li.transform(item_cf_topk(
        "l_orderkey", "l_partkey", k=5, min_pair_count=3))


def _interaction_edges(ev: DataFrame) -> DataFrame:
    """The pagerank_users edge fixture: consecutive-user transitions inside
    each hour bucket, self-loops dropped (dedup happens inside the graph
    functions)."""
    w = Window.partitionBy(F.date_trunc("hour", "ts")).orderBy("event_id")
    return (ev.withColumn("src", F.lag("user_id").over(w))
            .filter(F.col("src").isNotNull()
                    & (F.col("src") != F.col("user_id")))
            .select("src", F.col("user_id").alias("dst")))


def _min_seed_edges(ev: DataFrame):
    """Shared seed derivation for the seed-parameterized graph fixtures
    (q_bfs_hops / q_ppr_related): the pipeline-cached interaction edges
    plus the smallest endpoint id (None on an empty graph — callers return
    their empty frame). The seed aggregate is the one driver action; it
    fully materializes the edge cache the downstream loop reuses (the old
    eager checkpoint paid a separate materialization job first)."""
    from akka_stream_contrib_spark.util import pipeline_cache

    edges = pipeline_cache(_interaction_edges(ev))
    seed_row = edges.agg(
        F.least(F.min("src"), F.min("dst")).alias("m")).head()
    return edges, seed_row.m


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (functions/graph.py::hits_scores) over the
    user-interaction graph — 3 L1-normalized power iterations, oracled by
    the same unrolled-CTE pattern as pagerank."""
    from akka_stream_contrib_spark.functions.graph import hits_scores
    ev = tables.load(spark, "events", sf_dir)
    return (hits_scores(_interaction_edges(ev), iterations=3)
            .select(F.col("id").alias("user_id"),
                    (F.round("hub", 6) + F.lit(0.0)).alias("hub"),
                    (F.round("auth", 6) + F.lit(0.0)).alias("auth"))
            .orderBy("user_id"))


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the undirected user-interaction graph (functions/graph.py::
    k_core): synchronous peel rounds, all-integer degrees, the DuckDB
    oracle replaying the identical unrolled rounds."""
    from akka_stream_contrib_spark.functions.graph import k_core
    ev = tables.load(spark, "events", sf_dir)
    return (k_core(_interaction_edges(ev), k=3, rounds=8)
            .select(F.col("id").alias("user_id"), "degree", "in_core")
            .orderBy("user_id"))


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (functions/graph.py::lpa_communities)
    over the user-interaction graph — two synchronous min-tie-break
    rounds, all-integer, oracled by the identical unrolled CTEs."""
    from akka_stream_contrib_spark.functions.graph import lpa_communities
    ev = tables.load(spark, "events", sf_dir)
    return (lpa_communities(_interaction_edges(ev), rounds=2)
            .select(F.col("id").alias("user_id"), "label")
            .orderBy("user_id"))


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (functions/graph.py::bfs_hops) from the smallest
    user id in the interaction graph, out to 4 hops — frontier/settled
    joins, all-integer, unrolled-CTE oracle."""
    from akka_stream_contrib_spark.functions.graph import bfs_hops
    ev = tables.load(spark, "events", sf_dir)
    edges, seed = _min_seed_edges(ev)
    if seed is None:  # empty graph -> empty reachability frame
        return spark.createDataFrame([], "user_id long, dist int")
    return (bfs_hops(edges, seed, max_hops=4)
            .select(F.col("id").alias("user_id"), "dist")
            .orderBy("user_id"))


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement (functions/ml.py::rolling_active_users): per-day
    DAU / trailing-7d WAU / trailing-28d MAU distinct users and the
    DAU/MAU stickiness ratio — (user, day) collapse first, bounded offset
    explodes, exact integer counts."""
    from akka_stream_contrib_spark.functions.ml import rolling_active_users
    ev = tables.load(spark, "events", sf_dir)
    return rolling_active_users(ev)


def q_ppr_related(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (functions/graph.py::personalized_pagerank)
    from the smallest user id over the interaction graph — seed-relative
    relevance, one job per iteration, unrolled-CTE oracle."""
    from akka_stream_contrib_spark.functions.graph import (
        personalized_pagerank)
    ev = tables.load(spark, "events", sf_dir)
    edges, seed = _min_seed_edges(ev)
    if seed is None:
        return spark.createDataFrame([], "user_id long, rank double")
    return (personalized_pagerank(edges, seed, iterations=3)
            .select(F.col("id").alias("user_id"),
                    (F.round("rank", 6) + F.lit(0.0)).alias("rank"))
            .orderBy("user_id"))


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal interval (functions/ml.py::split_conformal) for a
    fixed linear chars-per-token rule on documents: even ids calibrate,
    odd ids test, 90% target — exact integer rank index via the two-phase
    global rank, distribution-free coverage check."""
    from akka_stream_contrib_spark.functions.ml import split_conformal
    docs = tables.load(spark, "documents", sf_dir)
    ntok = F.size(F.split(F.col("text"), " "))
    score = F.abs(F.col("n_chars").cast("double")
                  - F.lit(6.1) * ntok.cast("double"))
    return docs.transform(split_conformal(
        score, (F.col("doc_id") % 2 == 0), keep_num=9, keep_den=10))


def q_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead EWMA forecast backtest (operators/timeseries.py::
    ewma_forecast_eval): MAE / MASE vs the naive lag-1 forecast / sMAPE
    over each user's value series — 9-dp decimal error sums on the shared
    window pass."""
    from akka_stream_contrib_spark.operators.timeseries import (
        ewma_forecast_eval)
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(ewma_forecast_eval())


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user value trend (operators/timeseries.py::
    theil_sen_trend): exact lower median of all pairwise slopes — the
    outlier-immune companion to q_regr_trend's least squares. One key
    shuffle, size-guarded collect_list, pairs generated in-row by nested
    higher-order functions (never shuffled), array_sort median."""
    from akka_stream_contrib_spark.operators.timeseries import (
        theil_sen_trend)
    ev = tables.load(spark, "events", sf_dir)
    return ev.transform(theil_sen_trend(max_points=500))


def q_bleu_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-2 (functions/text.py::bleu2_corpus) of odd-id documents
    against their even-id predecessors — clipped-count inner joins on
    (pair, gram), exact integers to three final divisions."""
    from akka_stream_contrib_spark.functions.text import bleu2_corpus
    docs = tables.load(spark, "documents", sf_dir)
    cands = (docs.filter(F.col("doc_id") % 2 == 1)
             .select((F.col("doc_id") - 1).alias("doc_id"), "text"))
    refs = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    return cands.transform(bleu2_corpus(refs))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def q_cross_lingual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transliteration-robust near-dup detection (functions/dedup.py::
    cross_lingual_dedup): odd documents are planted with ACCENTED vowels
    (a→á … u→ú via translate) so their raw n-gram overlap with even
    documents collapses; the translit fold (text.py::translit_normalize —
    lowercase, 1:1 diacritic fold, punctuation strip, whitespace collapse)
    must recover the same pair set the plain detector finds on unaccented
    text. Same df-pruned posting-list plan as ngram_jaccard_dedup — the
    fold is free map-side codegen on the scan."""
    from akka_stream_contrib_spark.functions import cross_lingual_dedup
    docs = tables.load(spark, "documents", sf_dir)
    accented = F.when(F.col("doc_id") % 2 == 1,
                      F.translate(F.col("text"), "aeiou", "\u00e1\u00e9\u00ed\u00f3\u00fa")
                      ).otherwise(F.col("text"))
    d = docs.select("doc_id", accented.alias("text"))
    return cross_lingual_dedup(d, n=4, threshold=0.2, max_doc_freq=250)


def q_embedding_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding drift monitor (functions/ml.py::
    embedding_dim_drift): reference slice = labels 0-4, current slice =
    labels 5-9; top-10 dimensions by |standardized mean difference| —
    the encoder-swap detector. Two width-sized partial-agg shuffles
    (64 dim keys) regardless of corpus size; exact-decimal moment sums."""
    from akka_stream_contrib_spark.functions import embedding_dim_drift
    emb = tables.load(spark, "embeddings", sf_dir)
    return embedding_dim_drift(emb.filter(F.col("label") < 5),
                               emb.filter(F.col("label") >= 5), top_k=10)


def q_url_recrawl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL re-crawl dedup (functions/web.py::normalize_url):
    synthetic crawl where doc pairs (2k, 2k+1) fetched the same logical
    page under different surface forms (mixed-case scheme/host + #fragment
    vs clean); normalization collapses each pair to one canonical URL and
    the dedup keeps the first-crawled doc. One hash shuffle on the
    canonical key — the exact-dedup discipline applied to the web front
    of the pipeline."""
    from akka_stream_contrib_spark.functions.web import normalize_url
    docs = tables.load(spark, "documents", sf_dir)
    page = F.floor(F.col("doc_id") / 2).cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("HTTPS://WWW.Example.COM/doc/"), page, F.lit("#ref"))
    ).otherwise(F.concat(F.lit("https://www.example.com/doc/"), page))
    return (docs.select("doc_id", url.alias("url"))
            .withColumn("norm_url", normalize_url(F.col("url")))
            .groupBy("norm_url")
            .agg(F.count(F.lit(1)).alias("n_crawls"),
                 F.min("doc_id").alias("keep_doc")))


def _synth_html():
    """The deterministic HTML wrapper shared by q_html_extract and its
    oracle: nav + script/style/comment boilerplate around the document
    text, a per-doc anchor, a footer."""
    return (
        "<html><head><title>D</title><script>var x = 1 < 2;</script>"
        "<style>.nav{color:red}</style></head><body><!-- build 42 -->"
        "<div id=nav><a href=/>Home</a> <a href=/about>About&nbsp;Us</a></div>"
        "<h1>Doc</h1><p>", "</p><div class=footer>"
        "<a href=/tos>Terms &amp; Conditions</a></div></body></html>")


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (functions/web.py::html_text_extract):
    documents wrapped in a deterministic crawl-page template (script/style/
    comment boilerplate, nav + footer anchors, entities); the extractor
    must recover the body text, count chars, and score link density --
    the jusText/CCNet boilerplate gate input. Pure regexp codegen chain,
    zero shuffles."""
    from akka_stream_contrib_spark.functions.web import html_text_extract
    docs = tables.load(spark, "documents", sf_dir)
    pre, post = _synth_html()
    html = F.concat(F.lit(pre), F.col("text"), F.lit(post))
    return (docs.filter(F.col("text").isNotNull())
            .select("doc_id", html.alias("html"))
            .transform(html_text_extract()))


def q_common_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate line removal (functions/corpus.py::
    common_line_filter): every document carries the same synthetic cookie
    banner and copyright footer around its own body line; lines verbatim-
    shared by > 5 documents are condemned by the hash-keyed frequency
    table and stripped everywhere. Two key shuffles + one join -- no
    all-pairs, no driver state."""
    from akka_stream_contrib_spark.functions.corpus import common_line_filter
    docs = tables.load(spark, "documents", sf_dir)
    wrapped = F.concat(
        F.lit("We use cookies to improve your experience\n"),
        F.col("text"),
        F.lit("\nCopyright 2026 Example Corp All rights reserved"))
    return (docs.select("doc_id", wrapped.alias("text"))
            .transform(common_line_filter(max_doc_freq=5)))


def q_chat_training_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template SFT flattening (functions/corpus.py::
    chat_to_training_text): synthetic conversations (one per source,
    turns = that source's documents in doc_id order, roles alternating by
    doc_id parity, content = first 80 chars) rendered to training text
    with LOSS-MASK SPANS; output is one row per assistant span with the
    span text sliced back out of the rendered string — the self-proving
    form (a wrong offset produces wrong span_text and fails the hash).
    One groupBy shuffle; the render+span fold is array codegen."""
    from akka_stream_contrib_spark.functions.corpus import chat_to_training_text
    docs = tables.load(spark, "documents", sf_dir)
    turns = (docs.filter(F.col("text").isNotNull())
             .select(F.col("source").alias("conv_id"), "doc_id",
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


def q_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion pair mining (functions/similarity.py::margin_mine;
    Artetxe & Schwenk 2019 — the LASER/CCMatrix bitext recipe): mine
    aligned pairs between the label<5 and label>=5 embedding slices;
    cosine normalized by each side's k-NN neighborhood density, argmax
    per source vector above the margin bar. Two broadcast-GEMM kNN
    passes + two tiny id-keyed aggs + one per-query window."""
    from akka_stream_contrib_spark.functions.similarity import margin_mine
    emb = tables.load(spark, "embeddings", sf_dir)
    return margin_mine(emb.filter(F.col("label") < 5),
                       emb.filter(F.col("label") >= 5),
                       k=4, threshold=1.0)


def q_web_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END web-corpus front end — the round-9 stages chained the way
    a Common-Crawl pipeline runs them: every document and its ACCENTED
    TWIN (doc_id + 10M, vowels translated) arrive as crawl pages in the
    shared HTML template; html_text_extract recovers text + link density;
    the density/length gate drops nav-only shells; common_line_filter
    strips the template's nav and footer lines (they appear in every
    page); the translit fold is the dedup key, so each accented twin
    collapses onto its original. Output: one row per surviving logical
    document — (keep_doc, n_variants, clean_text) — n_variants == 2
    everywhere IS the proof the fold undid the accents, and clean_text
    carrying no nav/footer is the proof the line filter fired.

    Scale: each stage keeps its own audited budget (extract 0, line
    filter ≤3, dedup 1) — composition adds no new exchanges."""
    from akka_stream_contrib_spark.functions.corpus import common_line_filter
    from akka_stream_contrib_spark.functions.text import translit_normalize
    from akka_stream_contrib_spark.functions.web import html_text_extract
    docs = (tables.load(spark, "documents", sf_dir)
            .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    crawl = docs.union(
        docs.select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                    F.translate(F.col("text"), "aeiou",
                                "\u00e1\u00e9\u00ed\u00f3\u00fa")
                    .alias("text")))
    pre, post = _synth_html()
    pages = crawl.select(
        "doc_id", F.concat(F.lit(pre), F.col("text"), F.lit(post))
        .alias("html"))
    extracted = (pages.transform(html_text_extract())
                 .filter((F.col("link_density") <= 0.5)
                         & (F.col("n_chars") >= 20)))
    cleaned = extracted.select("doc_id", "text").transform(
        common_line_filter(max_doc_freq=5))
    # the fold GROUP KEY is md5 of the folded text (the dedup_exact 16-byte
    # pattern, dedup.py:35) — never the multi-KB text itself: the shuffle
    # sort/hash comparator must see constant-width keys at corpus scale
    # (r9 verdict "What's wrong #2"). The key is not emitted, so the hash
    # substitution is output-invariant.
    return (cleaned
            .groupBy(F.md5(translit_normalize(F.col("text"))).alias("_k"))
            .agg(F.min("doc_id").alias("keep_doc"),
                 F.count(F.lit(1)).alias("n_variants"))
            .select("keep_doc", "n_variants"))


def q_generation_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate generation-loop detection (functions/text.py::
    generation_loops): every tenth document gets a planted decoding loop
    (a 2-token block repeated four times at the tail); the detector must
    report period 2 / 4 repeats for exactly those docs and NULL elsewhere.
    Unrolled in-row slice equality — zero shuffles."""
    from akka_stream_contrib_spark.functions.text import generation_loops
    docs = tables.load(spark, "documents", sf_dir)
    planted = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.col("text"),
                 F.lit(" spam loop spam loop spam loop spam loop"))
    ).otherwise(F.col("text"))
    return (docs.select("doc_id", planted.alias("text"))
            .transform(generation_loops()))


def q_pack_training_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing with loss-mask carry (functions/corpus.py::
    pack_training_rows): every third document carries a synthetic
    assistant span [0, min(40, len)); documents pack into 128-token
    training rows by harmonic size class (longest-first, closed-form
    floor(rank/k) assignment — no row ever exceeds the budget) and the
    spans are remapped into packed coordinates. Output is the self-proving
    form: span_concat re-slices every remapped span out of the PACKED
    text, so a wrong offset produces wrong text and fails the hash."""
    from akka_stream_contrib_spark.functions.corpus import pack_training_rows
    docs = tables.load(spark, "documents", sf_dir)
    spans = F.when(
        F.col("doc_id") % 3 == 0,
        F.array(F.struct(
            F.lit(0).cast("bigint").alias("s"),
            F.least(F.lit(40), F.length("text")).cast("bigint").alias("e"))),
    ).otherwise(F.expr("CAST(array() AS array<struct<s: bigint, e: bigint>>)"))
    base = (docs.filter(F.col("text").isNotNull())
            .select(F.col("doc_id").alias("conv_id"), "text",
                    spans.alias("assistant_spans")))
    packed = base.transform(pack_training_rows(budget=128))
    return packed.select(
        "pack_id", "n_docs", "n_tokens", "overflow",
        F.size("assistant_spans").cast("bigint").alias("n_spans"),
        F.expr("array_join(transform(assistant_spans, x -> "
               "substr(text, CAST(x.s + 1 AS INT), "
               "CAST(x.e - x.s AS INT))), '|')").alias("span_concat"),
        # doc_spans self-proof: re-slicing every member boundary out of
        # the packed text must reproduce the member texts verbatim
        F.md5(F.expr("array_join(transform(doc_spans, x -> "
                     "substr(text, CAST(x.s + 1 AS INT), "
                     "CAST(x.e - x.s AS INT))), '\u001f')"))
        .alias("doc_concat_md5"),
        F.length("text").cast("bigint").alias("text_len"))


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair construction (functions/corpus.py::
    preference_pairs): documents group into 8-candidate prompts
    (prompt = doc_id DIV 8), score = length(text) % 997; per prompt the
    top/bottom scored candidates become the (chosen, rejected) pair,
    kept when the score gap clears margin=50. One partial-aggregated
    prompt-key shuffle — the argmax/argmin are lexicographic struct
    MIN/MAX, no window sort."""
    from akka_stream_contrib_spark.functions.corpus import preference_pairs
    docs = tables.load(spark, "documents", sf_dir)
    cands = (docs.filter(F.col("text").isNotNull())
             .select(F.expr("CAST(doc_id DIV 8 AS BIGINT)")
                     .alias("prompt_id"),
                     F.col("doc_id").alias("cand_id"), "text",
                     (F.length("text") % 997).cast("double").alias("score")))
    return cands.transform(preference_pairs(margin=50.0))


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (functions/corpus.py::fim_transform,
    Bavarian 2022 PSM): md5-gated 50% of documents re-render as
    <PRE>prefix<SUF>suffix<MID>middle with md5-derived split points —
    deterministic, portable, zero shuffles (pure scan-side codegen)."""
    from akka_stream_contrib_spark.functions.corpus import fim_transform
    docs = tables.load(spark, "documents", sf_dir)
    return docs.select("doc_id", "text").transform(fim_transform(rate=50))


def q_near_dup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split fuzzy decontamination (functions/dedup.py::
    near_dup_decontaminate): every seventh document leaks into the
    benchmark with a trailing-token paraphrase (ids offset by 20M); the
    MinHash-LSH cross join must flag exactly those training docs with
    their benchmark twin as the argmax-Jaccard match — no within-split
    pairs. Same bit-exact hash family as minhash_lsh_dedup, replayed by
    the oracle."""
    from akka_stream_contrib_spark.functions.dedup import near_dup_decontaminate
    docs = (tables.load(spark, "documents", sf_dir)
            .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    ev = (docs.filter(F.col("doc_id") % 7 == 0)
          .select((F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
                  F.concat(F.col("text"), F.lit(" trailing eval marker"))
                  .alias("text")))
    return near_dup_decontaminate(docs, ev, threshold=0.5)


def q_chat_tree_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-tree flattening (functions/corpus.py::chat_tree_paths):
    each source's documents form a binary reply tree (node = per-source
    rank, parent = rank DIV 2 — the heap shape), roles alternate by rank
    parity; every leaf yields its root→leaf path. Output renders the turn
    sequence as role:content joined by '|' (hash-comparable), so a wrong
    walk order or wrong parent produces wrong text. The oracle replays the
    walk as a recursive CTE."""
    from pyspark.sql import Window
    from akka_stream_contrib_spark.functions.corpus import chat_tree_paths
    docs = (tables.load(spark, "documents", sf_dir)
            .filter(F.col("text").isNotNull()))
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    tree = (docs.select(F.col("source").alias("conv_id"), "doc_id",
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


def q_rejection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection sampling (functions/corpus.py::rejection_sample):
    the same 8-candidate prompt groups as q_preference_pairs, but the SFT
    selection side — per prompt keep only the reward argmax, and only when
    it clears the prompt's own exact median by delta=100 (prompts the
    reward model cannot discriminate on are dropped entirely). One
    partial-aggregated prompt-key shuffle; argmax via struct MIN, median
    via exact percentile."""
    from akka_stream_contrib_spark.functions.corpus import rejection_sample
    docs = tables.load(spark, "documents", sf_dir)
    cands = (docs.filter(F.col("text").isNotNull())
             .select(F.expr("CAST(doc_id DIV 8 AS BIGINT)")
                     .alias("prompt_id"),
                     F.col("doc_id").alias("cand_id"), "text",
                     (F.length("text") % 997).cast("double").alias("score")))
    return cands.transform(rejection_sample(delta=100.0, min_candidates=2))


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (functions/corpus.py::epoch_shuffle):
    md5-keyed shard + intra-shard position over documents, n_shards=8,
    seed='epoch-0'. The permutation is a pure function of (seed, doc_id)
    — the oracle replays it bit-for-bit — and the plan's only exchange is
    the shard-partitioned window (no global sort)."""
    from akka_stream_contrib_spark.functions.corpus import epoch_shuffle
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.select("doc_id")
            .transform(epoch_shuffle(n_shards=8, seed="epoch-0"))
            .select("doc_id", "shard", "pos"))


def q_context_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sizing study (functions/corpus.py::
    context_fit_report): per (source, candidate limit in 32/64/96/128
    whitespace tokens) — how many documents truncate and what fraction of
    the slice's tokens falls past the limit. Constant 4x map-side explode
    into ONE partial-aggregated (source, limit) groupBy."""
    from akka_stream_contrib_spark.functions.corpus import context_fit_report
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.transform(context_fit_report(limits=(32, 64, 96, 128),
                                              group_col="source"))
            .withColumnRenamed("group", "source")
            .orderBy("source", "context_limit"))


def q_elo_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry arena ratings (functions/ml.py::bradley_terry_ratings,
    Hunter 2004 MM / Zermelo): 8 synthetic models play deterministic
    pairwise matches derived from documents (model_a = doc_id mod 8,
    opponent offset by 1 + (doc_id DIV 8) mod 7 so a != b by construction;
    wins from text-length / id parity), 3 unrolled MM iterations with
    add-half smoothing, mean-1 normalization. The oracle replays the
    identical unrolled iteration — the pagerank/hits convention."""
    from akka_stream_contrib_spark.functions.ml import bradley_terry_ratings
    docs = tables.load(spark, "documents", sf_dir)
    m = F.col("doc_id") % 8
    opp = (m + 1 + F.expr("doc_id DIV 8") % 7) % 8
    games = (docs.filter(F.col("text").isNotNull())
             .select(F.concat(F.lit("m"), m.cast("string")).alias("model_a"),
                     F.concat(F.lit("m"), opp.cast("string"))
                     .alias("model_b"),
                     (F.length("text") % 3).cast("double").alias("wins_a"),
                     (F.col("doc_id") % 2).cast("double").alias("wins_b")))
    return (bradley_terry_ratings(games, iterations=3, smoothing=0.5)
            .orderBy("model"))


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attribution (functions/quality.py::filter_funnel):
    a four-stage curation chain over documents (has_text, min_chars >=
    150, >= 30 whitespace tokens, a deterministic id-hash stand-in for a
    classifier gate), attributed per source by FIRST failing stage —
    entering/killed/surviving counts, conditional and cumulative survival.
    One wide groupBy; stage rows inline-explode with unrolled prefix
    arithmetic."""
    from akka_stream_contrib_spark.functions.quality import filter_funnel
    docs = tables.load(spark, "documents", sf_dir)
    stages = [
        ("has_text", F.col("text").isNotNull()),
        ("min_chars", F.col("n_chars") >= 150),
        ("token_floor", F.size(F.split(F.col("text"), " ")) >= 30),
        ("quality_hash", F.col("doc_id") % 7 != 0),
    ]
    return (docs.transform(filter_funnel(stages, group_col="source"))
            .withColumnRenamed("group", "source")
            .orderBy("source", "stage_idx"))


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span corruption (functions/corpus.py::span_corrupt, Raffel 2020):
    rate 0.15, mean span 3 → 20-token blocks each contributing one
    md5-placed masked span; input keeps numbered sentinels, target lists
    the masked spans. Pure array codegen on the scan — zero shuffles —
    and every choice replays from md5(doc_id, block) in any engine."""
    from akka_stream_contrib_spark.functions.corpus import span_corrupt
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.select("doc_id", "text")
            .transform(span_corrupt(corruption_rate=0.15, mean_span=3)))


def q_interleave_by_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave (functions/corpus.py::
    interleave_by_weight, stride scheduling): source srcN carries weight
    1 + N mod 3; the p-th row of a source lands at slot (p - phase)/w
    with an md5 phase, md5 within-source order. ONE source-partitioned
    window exchange; slot is a pure function of (seed, source, doc_id)."""
    from akka_stream_contrib_spark.functions.corpus import interleave_by_weight
    docs = tables.load(spark, "documents", sf_dir)
    weights = {f"src{i}": 1.0 + i % 3 for i in range(20)}
    return (docs.select("doc_id", "source")
            .transform(interleave_by_weight(weights, seed="mix-0"))
            .select("doc_id", "source", "src_pos", "slot"))


def q_template_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-template mining (functions/corpus.py::template_mine):
    80% of documents re-render as slotted task prompts (quoted excerpt +
    numeric budget, template keyed by source), 20% stay raw free text;
    the miner must recover exactly the 5 language templates and filter the
    singletons out. Skeleton = regexp codegen; ONE md5-keyed groupBy with
    the skeleton as struct payload (dedup_exact key discipline)."""
    from akka_stream_contrib_spark.functions.corpus import template_mine
    docs = tables.load(spark, "documents", sf_dir)
    prompts = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source",
        F.when(F.col("doc_id") % 5 != 0,
               F.concat(F.col("lang"), F.lit(' task: write about "'),
                        F.substring("text", 1, 20), F.lit('" in '),
                        (F.col("n_chars") % 50).cast("string"),
                        F.lit(" words")))
        .otherwise(F.col("text")).alias("text"))
    return prompts.transform(template_mine(min_count=2,
                                           source_col="source"))


def q_bitext_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext hygiene (functions/corpus.py::bitext_filter): synthetic
    translation pairs from documents — by doc_id mod 4 the "translation"
    is a 3-token truncation (ratio kill), a verbatim copy (identity
    kill), the text plus a spurious number (digit-parity kill), or the
    token-reversed text (clean pair). Pure scan-side flags, zero
    shuffles; per-rule kill flags feed filter_funnel downstream."""
    from akka_stream_contrib_spark.functions.corpus import bitext_filter
    docs = tables.load(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    pairs = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("pair_id"),
        F.col("text").alias("src_text"),
        F.when(F.col("doc_id") % 4 == 0,
               F.array_join(F.slice(toks, 1, 3), " "))
        .when(F.col("doc_id") % 4 == 1, F.col("text"))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.col("text"), F.lit(" 42")))
        .otherwise(F.array_join(F.reverse(toks), " "))
        .alias("tgt_text"))
    return pairs.transform(bitext_filter(max_len_ratio=2.0, min_tokens=2))


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest (functions/corpus.py::shard_manifest) over the
    epoch_shuffle permutation: per-shard row/token totals plus the
    contiguity proof (min_pos = 1, max_pos = n_rows). The manifest agg
    groups on the SAME shard key the position window hashed on, so the
    composed plan pays one exchange total."""
    from akka_stream_contrib_spark.functions.corpus import (epoch_shuffle,
                                                            shard_manifest)
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.select("doc_id", "text")
            .transform(epoch_shuffle(n_shards=8, seed="epoch-0"))
            .transform(shard_manifest(text_col="text"))
            .orderBy("shard"))


def q_prefix_cache_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-cache sizing (functions/corpus.py::prefix_cache_report):
    prompts carry a per-language 8-token system header before the document
    text, so depth 4/8 share per language and depth 16 mostly diverges —
    the report quantifies the cache hit profile at each depth. md5 prefix
    keys (dedup_exact discipline), constant 3x explode, two shrinking
    aggregates."""
    from akka_stream_contrib_spark.functions.corpus import prefix_cache_report
    docs = tables.load(spark, "documents", sf_dir)
    prompts = (docs.filter(F.col("text").isNotNull())
               .select(F.concat(
                   F.col("lang"),
                   F.lit(" system prompt tokens one two three four "),
                   F.col("text")).alias("text")))
    return (prompts.transform(prefix_cache_report(depths=(4, 8, 16)))
            .orderBy("prefix_len"))


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (functions/ml.py::fleiss_kappa): five consecutive
    documents form one "item", their language labels are the judge
    votes — chance-corrected N-rater agreement in three shrinking
    aggregates, oracled by the identical closed form."""
    from akka_stream_contrib_spark.functions.ml import fleiss_kappa
    docs = tables.load(spark, "documents", sf_dir)
    ratings = docs.select(F.expr("CAST(doc_id DIV 5 AS BIGINT)")
                          .alias("item_id"),
                          F.col("lang").alias("category"))
    return fleiss_kappa(ratings)


def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k (functions/ml.py::pass_at_k, HumanEval estimator): eight
    documents form one task's samples, a sample "passes" when
    (n_chars + doc_id) mod 3 = 0; mean unbiased pass@{1,2,4} over tasks.
    The binomial ratio is an exact telescoping product inside an array
    fold — bit-identical in both engines."""
    from akka_stream_contrib_spark.functions.ml import pass_at_k
    docs = tables.load(spark, "documents", sf_dir)
    samples = (docs.filter(F.col("text").isNotNull())
               .select(F.expr("CAST(doc_id DIV 8 AS BIGINT)")
                       .alias("task_id"),
                       ((F.col("n_chars") + F.col("doc_id")) % 3 == 0)
                       .alias("correct")))
    return pass_at_k(samples, ks=(1, 2, 4))


def q_lsh_design_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH design study (functions/dedup.py::lsh_design_report):
    deterministic pair-similarity sample (sim = (doc_id * 37 mod 101) /
    100) histogrammed at 0.05 buckets; three candidate (bands, rows)
    configs scored against it — collision S-curve as exact in-row
    telescoping folds, expected candidates / FP / FN mass per config.
    Complements lsh_tune (the single-threshold analytic inverse)."""
    from akka_stream_contrib_spark.functions.dedup import lsh_design_report
    docs = tables.load(spark, "documents", sf_dir)
    sims = docs.select(
        F.col("doc_id").alias("pair_id"),
        (((F.col("doc_id") * 37) % 101) / 100.0).alias("sim"))
    return sims.transform(lsh_design_report(
        configs=((8, 8), (16, 4), (32, 2)), target_threshold=0.5))


def q_epoch_shuffle_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-preserving epoch shuffle (functions/corpus.py::epoch_shuffle
    with group_col): ten consecutive documents form one conversation;
    every conversation lands whole in one shard and its rows stay
    adjacent — the multi-turn contract. Same single-exchange plan as the
    row shuffle, keys derived from the group."""
    from akka_stream_contrib_spark.functions.corpus import epoch_shuffle
    docs = tables.load(spark, "documents", sf_dir)
    rows = docs.select("doc_id",
                       F.expr("CAST(doc_id DIV 10 AS BIGINT)")
                       .alias("conv_id"))
    return (rows.transform(epoch_shuffle(n_shards=8, seed="epoch-0",
                                         group_col="conv_id"))
            .select("doc_id", "conv_id", "shard", "pos"))


def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (functions/text.py::distinct_ngrams, Li 2016):
    per source, the fraction of {1,2,3}-gram occurrences that are
    distinct — the mode-collapse detector for synthetic slices. N-grams
    materialize in-row and shuffle as 16-byte md5 keys; one (source, n)
    count-distinct aggregate."""
    from akka_stream_contrib_spark.functions.text import distinct_ngrams
    docs = tables.load(spark, "documents", sf_dir)
    return (docs.transform(distinct_ngrams(ns=(1, 2, 3),
                                           group_col="source"))
            .withColumnRenamed("group", "source")
            .orderBy("source", "n"))


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (functions/ml.py::spearman_corr): two
    deterministic scorers over documents (text-length and char-count
    residues) rank-correlated per language with the fractional-rank tie
    correction — the leaderboard-stability statistic. One slice-key
    exchange shared by all four windows and the corr aggregate."""
    from akka_stream_contrib_spark.functions.ml import spearman_corr
    docs = tables.load(spark, "documents", sf_dir)
    scored = (docs.filter(F.col("text").isNotNull()
                          & F.col("n_chars").isNotNull())
              .select("lang",
                      (F.length("text") % 101).cast("double").alias("sx"),
                      ((F.col("n_chars") * 7) % 89).cast("double")
                      .alias("sy")))
    return (scored.transform(spearman_corr("sx", "sy", group_col="lang"))
            .withColumnRenamed("group", "lang")
            .orderBy("lang"))


def q_position_bias_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judge position-bias probe (functions/ml.py::position_bias_probe):
    synthetic pairwise verdicts whose first-position win propensity
    varies by language (threshold keyed on the lang initial), binomial z
    against the fair 0.5 per lang — the MT-Bench-style judge QA check.
    One slice-key groupBy."""
    from akka_stream_contrib_spark.functions.ml import position_bias_probe
    docs = tables.load(spark, "documents", sf_dir)
    verdicts = docs.select(
        "lang",
        ((F.col("doc_id") % 97)
         < (40 + F.ascii(F.substring("lang", 1, 1)) % 25))
        .alias("first_won"))
    return (verdicts.transform(position_bias_probe(group_col="lang"))
            .withColumnRenamed("group", "lang")
            .orderBy("lang"))


def q_win_rate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise win-rate matrix (functions/ml.py::win_rate_matrix): the
    SAME deterministic arena games as q_elo_ratings, reported as raw
    per-pair evidence with Wilson lower bounds — which matchups carry
    statistical weight behind the BT ratings. One canonical-pair
    groupBy; Wilson arithmetic post-aggregate."""
    from akka_stream_contrib_spark.functions.ml import win_rate_matrix
    docs = tables.load(spark, "documents", sf_dir)
    m = F.col("doc_id") % 8
    opp = (m + 1 + F.expr("doc_id DIV 8") % 7) % 8
    games = (docs.filter(F.col("text").isNotNull())
             .select(F.concat(F.lit("m"), m.cast("string")).alias("model_a"),
                     F.concat(F.lit("m"), opp.cast("string"))
                     .alias("model_b"),
                     (F.length("text") % 3).cast("double").alias("wins_a"),
                     (F.col("doc_id") % 2).cast("double").alias("wins_b")))
    return win_rate_matrix(games).orderBy("model_lo", "model_hi")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return q_q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver's correctness gate records ~50 rows per round, taken from
    # the FRONT of this dict. _PRIORITY pins that window to the queries that
    # need driver evidence most this round (see its comment for the round-6
    # grouping: the 38 never-driver-verified first, then this round's
    # changed queries, then the two HLL rows+schema checks). Everything
    # else follows in authoring order and is covered by the local oracle
    # replica (tests/test_oracle_gate.py).
    base = {
        "accumulate_while_unchanged": q_accumulate_while_unchanged,
        "timed_interval_between": q_timed_interval_between,
        "token_throttle": q_token_throttle,
        "q12_priority_shipping": q_q12_priority_shipping,
        "array_agg_events": q_array_agg_events,
        "retry_concat_split": q_retry_concat_split,
        "unfold_flow_with": q_unfold_flow_with,
        "token_throttle_keyed": q_token_throttle_keyed,
        "duplicate_spans": q_duplicate_spans,
        "span_dedup": q_span_dedup,
        "bpe_encode": q_bpe_encode,
        "bpe_token_freqs": q_bpe_token_freqs,
        "length_batches": q_length_batches,
        "negative_samples": q_negative_samples,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "q9_product_profit": q_q9_product_profit,
        "q11_important_stock": q_q11_important_stock,
        "q16_supplier_part_counts": q_q16_supplier_part_counts,
        "q20_promotion_suppliers": q_q20_promotion_suppliers,
        "reservoir_sample": q_reservoir_sample,
        "triangle_count": q_triangle_count,
        "adamic_adar": q_adamic_adar,
        "robust_scale": q_robust_scale,
        "frequent_journeys": q_frequent_journeys,
        "hll_overlap": q_hll_overlap,
        "grouped_split": q_grouped_split,
        "purged_time_split": q_purged_time_split,
        "readability_scores": q_readability_scores,
        "pmi_collocations": q_pmi_collocations,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_learn_merges": q_bpe_learn_merges,
        "interpolate_linear": q_interpolate_linear,
        "kmeans_clusters": q_kmeans_clusters,
        "ann_ivf_all": q_ann_ivf_all,
        "dedup_keep_best": q_dedup_keep_best,
        "domain_cap": q_domain_cap,
        "remove_boilerplate": q_remove_boilerplate,
        "training_pipeline": q_training_pipeline,
        "dedup_incremental": q_dedup_incremental,
        "quality_score": q_quality_score,
        "hashed_features": q_hashed_features,
        "cm_frequency": q_cm_frequency,
        "bigram_logprob": q_bigram_logprob,
        "unpivot_revenue": q_unpivot_revenue,
        "label_centroids": q_label_centroids,
        "as_of_join_forward": q_as_of_join_forward,
        "as_of_join_tolerance": q_as_of_join_tolerance,
        "minhash_incremental": q_minhash_incremental,
        "frame_sample_grid": q_frame_sample_grid,
        "props_variant": q_props_variant,
        "training_prep": q_training_prep,
        "lang_confusion": q_lang_confusion,
        "knn_label_vote": q_knn_label_vote,
        "user_correlation": q_user_correlation,
        "as_of_join": q_as_of_join,
        "rollup_revenue": q_rollup_revenue,
        "distinct_users": q_distinct_users,
        "approx_distinct_users": q_approx_distinct_users,
        "semi_join_customers": q_semi_join_customers,
        "anti_join_customers": q_anti_join_customers,
        "top_orders_per_customer": q_top_orders_per_customer,
        "props_json_extract": q_props_json_extract,
        "monthly_revenue": q_monthly_revenue,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "token_count_bpe": q_token_count_bpe,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_exact": q_dedup_exact,
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
        "doc_containment": q_doc_containment,
        "embedding_near_dup": q_embedding_near_dup,
        "multimodal_meta": q_multimodal_meta,
        "stratified_sample": q_stratified_sample,
        "array_hof": q_array_hof,
        "regexp_funcs": q_regexp_funcs,
        "moving_revenue_7d": q_moving_revenue_7d,
        "grouping_sets_revenue": q_grouping_sets_revenue,
        "funnel_conversion": q_funnel_conversion,
        "user_journey": q_user_journey,
        "chunk_documents": q_chunk_documents,
        "pack_sequences": q_pack_sequences,
        "vocab_topk": q_vocab_topk,
        "decontaminate": q_decontaminate,
        "dup_clusters": q_dup_clusters,
        "salted_event_stats": q_salted_event_stats,
        "nation_trade_balance": q_nation_trade_balance,
        "lateral_top_customers": q_lateral_top_customers,
        "priority_shift_except_all": q_priority_shift_except_all,
        "knn_join": q_knn_join,
        "ann_all_topk": q_ann_all_topk,
        "semantic_dedup": q_semantic_dedup,
        "value_histogram": q_value_histogram,
        "bitwise_agg": q_bitwise_agg,
        "safe_arithmetic": q_safe_arithmetic,
        "nulls_ordering": q_nulls_ordering,
        "pii_redact": q_pii_redact,
        "repetition_stats": q_repetition_stats,
        "bm25_search": q_bm25_search,
        "scd2_user_state": q_scd2_user_state,
        "train_test_split": q_train_test_split,
        "mixture_sample": q_mixture_sample,
        "rolling_zscore": q_rolling_zscore,
        "ewma_smooth": q_ewma_smooth,
        "sessionize": q_sessionize,
        "pagerank_users": q_pagerank_users,
        "data_quality_report": q_data_quality_report,
        "winsorize_values": q_winsorize_values,
        "hll_daily_users": q_hll_daily_users,
        "token_entropy": q_token_entropy,
        "shipping_concurrency": q_shipping_concurrency,
        "mad_by_type": q_mad_by_type,
        "cohort_retention": q_cohort_retention,
        "event_transitions": q_event_transitions,
        "login_streaks": q_login_streaks,
        "pareto_customers": q_pareto_customers,
        "fuzzy_name_match": q_fuzzy_name_match,
        "regr_trend": q_regr_trend,
        "tfidf_search": q_tfidf_search,
        "quantized_ann": q_quantized_ann,
        "campaign_overlap": q_campaign_overlap,
        "heavy_hitter_tokens": q_heavy_hitter_tokens,
        "sample_nth": q_sample_nth,
        "sample_step": q_sample_step,
        "partition_with": q_partition_with,
        "pass_through": q_pass_through,
        "delay_flow": q_delay_flow,
        "accumulate": q_accumulate,
        "accumulate_keyed": q_accumulate_keyed,
        "last_element": q_last_element,
        "time_window": q_time_window,
        "sliding_window": q_sliding_window,
        "session_window": q_session_window,
        "rate_limiter": q_rate_limiter,
        "pulse": q_pulse,
        "keep_alive": q_keep_alive,
        "merge_by_index": q_merge_by_index,
        "retry": q_retry,
        "unfold_collatz": q_unfold_collatz,
        "feedback_fibonacci": q_feedback_fibonacci,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_shipping_priority": q_q3_shipping_priority,
        "q5_local_supplier_volume": q_q5_local_supplier_volume,
        "q6_forecast_revenue": q_q6_forecast_revenue,
        "q4_order_priority": q_q4_order_priority,
        "q10_returned_items": q_q10_returned_items,
        "q14_promo_revenue": q_q14_promo_revenue,
        "q17_small_qty_revenue": q_q17_small_qty_revenue,
        "q18_large_orders": q_q18_large_orders,
        "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
        "q22_idle_balance": q_q22_idle_balance,
        "q7_nation_volume": q_q7_nation_volume,
        "q8_market_share": q_q8_market_share,
        "q15_top_supplier": q_q15_top_supplier,
        "q21_waiting_supplier": q_q21_waiting_supplier,
        "q13_order_distribution": q_q13_order_distribution,
        "customers_retained": q_customers_retained,
        "customers_churned": q_customers_churned,
        "cube_revenue": q_cube_revenue,
        "range_join_follows": q_range_join_follows,
        "attribution_window_join": q_attribution_window_join,
        "url_domain_stats": q_url_domain_stats,
        "string_funcs": q_string_funcs,
        "date_parts": q_date_parts,
        "window_breadth": q_window_breadth,
        "quantiles": q_quantiles,
        "pivot_revenue": q_pivot_revenue,
        "posexplode_tokens": q_posexplode_tokens,
        "resample_ffill": q_resample_ffill,
        "gopher_rules": q_gopher_rules,
        "contamination_score": q_contamination_score,
        "mixture_weights": q_mixture_weights,
        "rp_project": q_rp_project,
        "pq_ann": q_pq_ann,
        "simhash_pairs": q_simhash_pairs,
        "normalize_text": q_normalize_text,
        "doc_keywords": q_doc_keywords,
        "bloom_membership": q_bloom_membership,
        "ohlc_resample": q_ohlc_resample,
        "skew_report": q_skew_report,
        "kfold_split": q_kfold_split,
        "quantile_normalize": q_quantile_normalize,
        "logreg_quality": q_logreg_quality,
        "snapshot_diff": q_snapshot_diff,
        "entity_resolution": q_entity_resolution,
        "bloom_pruned_revenue": q_bloom_pruned_revenue,
        "vwap_resample": q_vwap_resample,
        "dedup_within": q_dedup_within,
        "corpus_report": q_corpus_report,
        "weighted_sample": q_weighted_sample,
        "classification_report": q_classification_report,
        "psi_drift": q_psi_drift,
        "dsir_select": q_dsir_select,
        "attribution_last_touch": q_attribution_last_touch,
        "value_quantile_sketch": q_value_quantile_sketch,
        "curriculum_order": q_curriculum_order,
        "phash_near_dup": q_phash_near_dup,
        "novelty_score": q_novelty_score,
        "fuzzy_vocab_jw": q_fuzzy_vocab_jw,
        "quantile_error_report": q_quantile_error_report,
        "segment_dedup": q_segment_dedup,
        "oov_rate": q_oov_rate,
        "cluster_silhouette": q_cluster_silhouette,
        "calibration_report": q_calibration_report,
        "neyman_sample": q_neyman_sample,
        "blocking_report": q_blocking_report,
        "seasonal_anomalies": q_seasonal_anomalies,
        "cdc_apply_changes": q_cdc_apply_changes,
        "target_encoding": q_target_encoding,
        "pii_luhn": q_pii_luhn,
        "boolean_retrieval": q_boolean_retrieval,
        "holt_trend": q_holt_trend,
        "rrf_fusion": q_rrf_fusion,
        "token_budget_fill": q_token_budget_fill,
        "audio_segments": q_audio_segments,
        "hard_negatives": q_hard_negatives,
        "balanced_shards": q_balanced_shards,
        "scd2_as_of": q_scd2_as_of,
        "sample_step_replay": q_sample_step_replay,
        "motif_search": q_motif_search,
        "auc_roc": q_auc_roc,
        "mean_shift": q_mean_shift,
        "acf_lags": q_acf_lags,
        "zipf_fit": q_zipf_fit,
        "nb_lang_confusion": q_nb_lang_confusion,
        "ndcg_eval": q_ndcg_eval,
        "welch_ttest": q_welch_ttest,
        "benford_check": q_benford_check,
        "sliced_eval": q_sliced_eval,
        "ks_statistic": q_ks_statistic,
        "chi2_tokens": q_chi2_tokens,
        "local_clustering": q_local_clustering,
        "association_rules": q_association_rules,
        "kaplan_meier": q_kaplan_meier,
        "embedding_drift": q_embedding_drift,
        "k_anonymity": q_k_anonymity,
        "js_divergence": q_js_divergence,
        "conditional_entropy": q_conditional_entropy,
        "bootstrap_ci": q_bootstrap_ci,
        "gini_user_activity": q_gini_user_activity,
        "tokenizer_fertility": q_tokenizer_fertility,
        "average_precision": q_average_precision,
        "mmr_diverse_topk": q_mmr_diverse_topk,
        "perplexity_buckets": q_perplexity_buckets,
        "rfm_features": q_rfm_features,
        "degree_assortativity": q_degree_assortativity,
        "dup_cluster_sizes": q_dup_cluster_sizes,
        "psi_probe_drift": q_psi_probe_drift,
        "cohen_kappa": q_cohen_kappa,
        "wilson_rank": q_wilson_rank,
        "f1_threshold_sweep": q_f1_threshold_sweep,
        "mrr_eval": q_mrr_eval,
        "item_cf_recs": q_item_cf_recs,
        "hits_scores": q_hits_scores,
        "k_core": q_k_core,
        "bleu_eval": q_bleu_eval,
        "lpa_communities": q_lpa_communities,
        "bfs_hops": q_bfs_hops,
        "active_users": q_active_users,
        "ppr_related": q_ppr_related,
        "conformal_interval": q_conformal_interval,
        "forecast_eval": q_forecast_eval,
        "theil_sen": q_theil_sen,
        # round-9 additions
        "cross_lingual_dedup": q_cross_lingual_dedup,
        "embedding_dim_drift": q_embedding_dim_drift,
        "url_recrawl_dedup": q_url_recrawl_dedup,
        "html_extract": q_html_extract,
        "common_line_filter": q_common_line_filter,
        "chat_training_text": q_chat_training_text,
        "margin_mine": q_margin_mine,
        "web_corpus_prep": q_web_corpus_prep,
        "generation_loops": q_generation_loops,
        "pack_training_rows": q_pack_training_rows,
        "preference_pairs": q_preference_pairs,
        "fim_transform": q_fim_transform,
        "near_dup_decontaminate": q_near_dup_decontaminate,
        "chat_tree_paths": q_chat_tree_paths,
        "rejection_sample": q_rejection_sample,
        "epoch_shuffle": q_epoch_shuffle,
        "context_fit_report": q_context_fit_report,
        "elo_ratings": q_elo_ratings,
        "filter_funnel": q_filter_funnel,
        "span_corrupt": q_span_corrupt,
        "interleave_by_weight": q_interleave_by_weight,
        "template_mine": q_template_mine,
        "bitext_filter": q_bitext_filter,
        "shard_manifest": q_shard_manifest,
        "prefix_cache_report": q_prefix_cache_report,
        "fleiss_kappa": q_fleiss_kappa,
        "pass_at_k": q_pass_at_k,
        "lsh_design_report": q_lsh_design_report,
        "epoch_shuffle_grouped": q_epoch_shuffle_grouped,
        "distinct_ngrams": q_distinct_ngrams,
        "spearman_corr": q_spearman_corr,
        "position_bias_probe": q_position_bias_probe,
        "win_rate_matrix": q_win_rate_matrix,
    }
    front = [k for k in _PRIORITY if k in base]
    return {**{k: base[k] for k in front},
            **{k: v for k, v in base.items() if k not in set(front)}}


#: the ~50-query driver-evidence window (see queries() comment). The
#: registry closed at 260/260 in round 7, so the window's job is now
#: FRESHNESS. Round-10 grouping: (1) the seven round-9 queries that were
#: local-gated only (sweep + the r9 judge's independent sf0.01 run) take
#: their promised first-evidence slots (r9 verdict #1); (2) queries whose
#: implementation or oracle changed this round — remove_boilerplate
#: (budget-guarded condemned-set broadcast; common_line_filter,
#: web_corpus_prep and margin_mine also changed but already sit in (1));
#: (3) round-10 first-evidence additions; (4) the complete 42-row cohort
#: last driver-hashed in ROUND 4 (the stalest evidence in the registry:
#: accumulate_while_unchanged ... value_quantile_sketch). Rows past the
#: ~50 cap roll to round 11 with the r5 cohort; every row is additionally
#: replayed against the local DuckDB-oracle replica each session
#: (tests/test_oracle_gate.py).
_PRIORITY = [
    # r11 evidence rotation (verdict r10 item 7): the ~50-row driver window
    # moves to (1) every query path this round's optimizations touched and
    # (2) the r10-optimized paths the r10 window never sampled
    # (hits_scores, the global_order family, bleu_eval, the LSH/posting
    # rewrites, dup_clusters) — so the driver hashes the optimized plans,
    # not just the local oracle replica.
    # (1) r11-touched query paths
    "dup_clusters", "semantic_dedup", "dup_cluster_sizes",
    "entity_resolution", "psi_drift", "embedding_drift", "logreg_quality",
    "simhash_pairs", "chat_tree_paths", "near_dup_decontaminate",
    "k_core", "bfs_hops", "ppr_related", "elo_ratings", "fleiss_kappa",
    "template_mine",
    # r11 continuation (session 2): skew rewrites + the kmeans cache
    "neyman_sample", "spearman_corr", "interleave_by_weight",
    "kmeans_clusters", "bigram_logprob",
    # r11 continuation (session 3): scan-census single-pass rewrites +
    # the hazard-census hot-key sort fixes
    "psi_probe_drift", "target_encoding", "cohen_kappa",
    "merge_by_index", "training_prep", "triangle_count",
    "fuzzy_vocab_jw", "blocking_report",
    "quantile_normalize", "domain_cap", "acf_lags",
    # (2) r10-optimized, never driver-hashed on the optimized plan
    "hits_scores", "bleu_eval", "minhash_lsh_dedup", "phash_near_dup",
    "pagerank_users", "lpa_communities", "curriculum_order",
    "kaplan_meier", "auc_roc", "ks_statistic", "f1_threshold_sweep",
    "pareto_customers", "gini_user_activity", "balanced_shards",
    "token_budget_fill", "sample_step_replay", "negative_samples",
    "length_batches", "perplexity_buckets", "conformal_interval",
    "active_users", "nb_lang_confusion", "novelty_score",
    "duplicate_spans", "span_dedup", "fuzzy_name_match",
    "association_rules", "item_cf_recs", "doc_keywords", "mrr_eval",
    "frequent_journeys", "theil_sen", "adamic_adar", "bpe_encode",
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_supplier_part_counts", "q20_promotion_suppliers",
    # (3) former front (r9/r10 first-evidence cohorts) — already
    # driver-hashed in r10's window, rotate behind
    "url_recrawl_dedup", "html_extract", "common_line_filter",
    "chat_training_text", "margin_mine", "web_corpus_prep",
    "generation_loops", "remove_boilerplate",
    "pack_training_rows", "preference_pairs", "fim_transform",
    "rejection_sample", "epoch_shuffle", "context_fit_report",
    "filter_funnel", "span_corrupt",
    "bitext_filter",
    "shard_manifest", "prefix_cache_report", "pass_at_k",
    "lsh_design_report", "epoch_shuffle_grouped", "distinct_ngrams",
    "position_bias_probe", "win_rate_matrix",
]


def _html_pipeline_ctes() -> str:
    """The noscript/stripped CTE pair mirroring web.py::html_text_extract —
    ONE definition reused by _html_extract_oracle and
    _web_corpus_prep_oracle (expects an upstream CTE `raw(doc_id, h)`)."""
    return """noscript AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(h,
                       '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                       '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                       '(?s)<!--.*?-->', ' ', 'g') AS t
            FROM raw
        ), stripped AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       replace(replace(replace(replace(replace(replace(
                           regexp_replace(regexp_replace(t,
                               '(?i)<(br|/p|/div|/h[1-6]|/li|/tr)[^>]*>',
                               chr(10), 'g'),
                               '<[^>]*>', ' ', 'g'),
                           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                           '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
                       '[ ' || chr(9) || chr(11) || chr(12) || chr(13) || ']+',
                       ' ', 'g'),
                       ' ?' || chr(10) || ' ?', chr(10), 'g'),
                       chr(10) || '{2,}', chr(10), 'g'),
                       '^' || chr(10) || '+|' || chr(10) || '+$', '', 'g'))
                       AS text,
                   coalesce(list_sum(list_transform(
                       regexp_extract_all(t,
                           '(?is)<a[^>]*>(.*?)</a>', 1),
                       a -> length(trim(regexp_replace(
                           replace(replace(replace(replace(replace(replace(
                               regexp_replace(a, '<[^>]*>', ' ', 'g'),
                               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                               '&quot;', '"'), '&#39;', chr(39)),
                               '&amp;', '&'),
                           '[ ' || chr(9) || chr(10) || chr(11) || chr(12)
                               || chr(13) || ']+',
                           ' ', 'g'))))), 0)
                       AS anchor_chars
            FROM noscript
        )"""


def _html_extract_oracle() -> str:
    """DuckDB mirror of q_html_extract: the SAME wrapper literals
    (_synth_html — one definition, two engines) and the regexp chain of
    web.py::html_text_extract step for step ('g' flags where Spark
    replaces globally by default)."""
    pre, post = _synth_html()
    pre_sql = pre.replace("'", "''")
    post_sql = post.replace("'", "''")
    return f"""
        WITH raw AS (
            SELECT doc_id, '{pre_sql}' || text || '{post_sql}' AS h
            FROM documents WHERE text IS NOT NULL
        ), {_html_pipeline_ctes()}
        SELECT doc_id, text,
               CAST(length(text) AS BIGINT) AS n_chars,
               round(least(CASE WHEN length(text) > 0
                                THEN anchor_chars / length(text)
                                ELSE 0.0 END, 1.0), 6) + 0.0
                   AS link_density
        FROM stripped
    """


def _web_corpus_prep_oracle() -> str:
    """DuckDB mirror of q_web_corpus_prep: the accented-twin crawl union,
    the shared HTML pipeline CTEs, the density/length gate, the
    common_line_filter SQL, and the translit-fold dedup group — every
    stage the same literals as its standalone oracle."""
    from akka_stream_contrib_spark.functions.text import translit_map
    src, dst = translit_map()
    pre, post = _synth_html()
    pre_sql = pre.replace("'", "''")
    post_sql = post.replace("'", "''")
    return f"""
        WITH crawl AS (
            SELECT doc_id, text FROM documents WHERE text IS NOT NULL
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id,
                   translate(text, 'aeiou',
                             '\u00e1\u00e9\u00ed\u00f3\u00fa') AS text
            FROM documents WHERE text IS NOT NULL
        ), raw AS (
            SELECT doc_id, '{pre_sql}' || text || '{post_sql}' AS h
            FROM crawl
        ), {_html_pipeline_ctes()}, gated AS (
            SELECT doc_id, text
            FROM stripped
            WHERE round(least(CASE WHEN length(text) > 0
                                   THEN anchor_chars / length(text)
                                   ELSE 0.0 END, 1.0), 6) + 0.0 <= 0.5
              AND length(text) >= 20
        ), lines AS (
            SELECT doc_id, i - 1 AS pos, ln[i] AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS ln,
                         unnest(range(1, len(string_split(text, chr(10)))
                                      + 1)) AS i
                  FROM gated)
        ), cond AS (
            SELECT line FROM lines WHERE length(line) >= 10
            GROUP BY line HAVING count(DISTINCT doc_id) > 5
        ), cleaned AS (
            SELECT doc_id,
                   coalesce(string_agg(
                       CASE WHEN NOT (c.line IS NOT NULL
                                      AND length(l.line) >= 10)
                            THEN l.line END,
                       chr(10) ORDER BY pos), '') AS text
            FROM lines l LEFT JOIN cond c ON l.line = c.line
            GROUP BY doc_id
        ), folded AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                       translate(lower(text), '{src}', '{dst}'),
                       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS _k
            FROM cleaned
        )
        SELECT min(doc_id) AS keep_doc,
               CAST(count(*) AS BIGINT) AS n_variants
        FROM folded GROUP BY _k
    """


def _generation_loops_oracle(max_period: int = 8, min_repeats: int = 3,
                             max_repeats: int = 12) -> str:
    """DuckDB mirror of q_generation_loops: the same unrolled tail-block
    slice equalities (1-based inclusive list slicing), smallest period
    first, consecutive-run repeat count by descending all-equal CASE."""
    def block(pp, k):
        return f"ln[n - {k * pp} + 1 : n - {(k - 1) * pp}]"

    def loops_at(pp):
        eqs = " AND ".join(
            f"{block(pp, 1)} = {block(pp, k)}"
            for k in range(2, min_repeats + 1))
        return f"(n >= {min_repeats * pp} AND {eqs})"

    period = ("CASE " + " ".join(
        f"WHEN {loops_at(pp)} THEN {pp}"
        for pp in range(1, max_period + 1)) + " END")

    def reps_for(pp):
        whens = []
        for k in range(max_repeats, min_repeats - 1, -1):
            eqs = " AND ".join(
                f"{block(pp, 1)} = {block(pp, j)}" for j in range(2, k + 1))
            whens.append(f"WHEN n >= {k * pp} AND {eqs} THEN {k}")
        return "CASE " + " ".join(whens) + " END"

    reps = ("CASE " + " ".join(
        f"WHEN loop_period = {pp} THEN ({reps_for(pp)})"
        for pp in range(1, max_period + 1)) + " END")

    return f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0
                        THEN text ||
                             ' spam loop spam loop spam loop spam loop'
                        ELSE text END AS text
            FROM documents WHERE text IS NOT NULL
        ), toks AS (
            SELECT doc_id, string_split(text, ' ') AS ln,
                   len(string_split(text, ' ')) AS n
            FROM planted
        ), scored AS (
            SELECT doc_id, ln, n, {period} AS loop_period FROM toks
        )
        SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
               CAST(loop_period AS INTEGER) AS loop_period,
               CAST({reps} AS INTEGER) AS n_repeats
        FROM scored
    """


def _cross_lingual_oracle() -> str:
    """DuckDB mirror of q_cross_lingual_dedup: the accent plant, the
    translit fold (SAME src/dst literals via text.py::translit_map — one
    definition, two engines), then the ngram_jaccard posting-list SQL on
    the folded text."""
    from akka_stream_contrib_spark.functions.text import translit_map
    src, dst = translit_map()
    return f"""
        WITH folded AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                       translate(lower(
                           CASE WHEN doc_id % 2 = 1
                                THEN translate(text, 'aeiou', '\u00e1\u00e9\u00ed\u00f3\u00fa')
                                ELSE text END),
                           '{src}', '{dst}'),
                       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS lc
            FROM documents WHERE text IS NOT NULL
        ),
        g AS (
            SELECT DISTINCT doc_id, substr(lc, i, 4) AS ngram
            FROM (SELECT doc_id, lc, unnest(range(1, length(lc) - 2)) AS i
                  FROM folded WHERE length(lc) >= 4)
        ),
        sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
        rare AS (
            SELECT doc_id, ngram FROM (
                SELECT doc_id, ngram,
                       count(*) OVER (PARTITION BY ngram) AS _df FROM g)
            WHERE _df <= 250
        ),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS _shared
            FROM rare a JOIN rare b
              ON a.ngram = b.ngram AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(_shared / (sa.n_grams + sb.n_grams - _shared), 6) AS jaccard
        FROM shared
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE round(_shared / (sa.n_grams + sb.n_grams - _shared), 6) >= 0.2
    """


def _ewma_oracle(alpha: float = 0.3, depth: int = 8) -> str:
    """DuckDB mirror of operators/timeseries.py::ewma_smooth, built from the
    SAME weight doubles (repr round-trips exactly) and the same left-assoc
    conditional sums so the IEEE result is bit-identical."""
    from akka_stream_contrib_spark.operators import ewma_weights
    ws = ewma_weights(alpha, depth)
    xs = ["value"] + [
        f"lag(value, {j}) OVER (PARTITION BY user_id ORDER BY event_id)"
        for j in range(1, depth)
    ]
    # CAST('<repr>' AS DOUBLE): DuckDB's VARCHAR->DOUBLE parse is correctly
    # rounded (matches the python double exactly); a bare 17-digit literal
    # parses as wide DECIMAL whose double conversion can be 1 ulp off.
    num = " + ".join(
        f"CASE WHEN {x} IS NOT NULL"
        f" THEN CAST('{w!r}' AS DOUBLE) * {x} ELSE 0.0 END"
        for w, x in zip(ws, xs))
    den = " + ".join(
        f"CASE WHEN {x} IS NOT NULL"
        f" THEN CAST('{w!r}' AS DOUBLE) ELSE 0.0 END"
        for w, x in zip(ws, xs))
    return f"""
        SELECT event_id, user_id, value,
               round(({num}) / ({den}), 6) + 0.0 AS ewma
        FROM events
    """


_EWMA_ORACLE = _ewma_oracle()


def _ndcg_oracle(k: int = 10) -> str:
    """DuckDB mirror of q_ndcg_eval: the bm25_search score CTE cut at
    top-k, term-containment relevance grades, and the SAME 9-dp discount
    literals (retrieval.py::ndcg_weights) applied by both rank
    permutations — decimal-exact DCG sums, one final double division."""
    from akka_stream_contrib_spark.functions.retrieval import ndcg_weights
    wcases = " ".join(
        f"WHEN {i + 1} THEN CAST({w!r} AS DECIMAL(18,9))"
        for i, w in enumerate(ndcg_weights(k)))
    score = """
                   round(
                     ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * 2.2)
                       / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * 2.2)
                       / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * 2.2)
                       / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   , 6) + 0.0"""
    return f"""
        WITH tf AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS dl,
                   len(list_filter(string_split(text, ' '), x -> x = 'spark'))  AS tf0,
                   len(list_filter(string_split(text, ' '), x -> x = 'join'))   AS tf1,
                   len(list_filter(string_split(text, ' '), x -> x = 'window')) AS tf2
            FROM documents WHERE text IS NOT NULL
        ), stats AS (
            SELECT count(*) AS n, sum(dl) AS sdl,
                   CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                   CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                   CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
            FROM tf
        ), top AS (
            SELECT doc_id, {score} AS score
            FROM tf, stats
            ORDER BY score DESC, doc_id
            LIMIT {k}
        ), graded AS (
            SELECT t.doc_id, t.score,
                   CAST(CAST(list_contains(string_split(d.text, ' '), 'spark') AS INT)
                      + CAST(list_contains(string_split(d.text, ' '), 'join') AS INT)
                      + CAST(list_contains(string_split(d.text, ' '), 'window') AS INT)
                      AS BIGINT) AS rel
            FROM top t JOIN documents d USING (doc_id)
        ), ranked AS (
            SELECT rel,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS r,
                   row_number() OVER (ORDER BY rel DESC, score DESC, doc_id)
                       AS ir
            FROM graded
        ), agg AS (
            SELECT sum(rel * CASE r {wcases} END) AS dcg,
                   sum(rel * CASE ir {wcases} END) AS idcg
            FROM ranked
        )
        SELECT CAST({k} AS INT) AS k,
               CAST(dcg AS DOUBLE) + 0.0 AS dcg,
               CAST(idcg AS DOUBLE) + 0.0 AS idcg,
               round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) + 0.0
                   AS ndcg
        FROM agg
    """


def _ap_oracle(k: int = 20) -> str:
    """DuckDB mirror of q_average_precision: the _ndcg_oracle score CTE cut
    at top-k, the independent length label (n_chars > 300), per-hit
    precision@i as round-9 decimals summed exactly, one guarded final
    division (NULL when the top-k has no relevant hit — try_divide)."""
    score = """
                   round(
                     ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * 2.2)
                       / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * 2.2)
                       / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * 2.2)
                       / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   , 6) + 0.0"""
    return f"""
        WITH tf AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS dl,
                   len(list_filter(string_split(text, ' '), x -> x = 'spark'))  AS tf0,
                   len(list_filter(string_split(text, ' '), x -> x = 'join'))   AS tf1,
                   len(list_filter(string_split(text, ' '), x -> x = 'window')) AS tf2
            FROM documents WHERE text IS NOT NULL
        ), stats AS (
            SELECT count(*) AS n, sum(dl) AS sdl,
                   CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                   CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                   CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
            FROM tf
        ), top AS (
            SELECT doc_id, {score} AS score
            FROM tf, stats
            ORDER BY score DESC, doc_id
            LIMIT {k}
        ), graded AS (
            SELECT t.doc_id, t.score,
                   CASE WHEN d.n_chars > 300 THEN 1 ELSE 0 END AS rel
            FROM top t JOIN documents d USING (doc_id)
        ), ranked AS (
            SELECT rel,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS i,
                   sum(rel) OVER (ORDER BY score DESC, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
            FROM graded
        ), agg AS (
            SELECT sum(CAST(CASE WHEN rel = 1 THEN
                         round(CAST(cum AS DOUBLE) / CAST(i AS DOUBLE), 9)
                       ELSE 0.0 END AS DECIMAL(15,9))) AS sp,
                   CAST(sum(rel) AS BIGINT) AS nrel
            FROM ranked
        )
        SELECT CAST({k} AS INT) AS k, nrel AS n_rel,
               CASE WHEN nrel > 0 THEN
                 round(CAST(sp AS DOUBLE) / CAST(nrel AS DOUBLE), 6) + 0.0
               END AS ap
        FROM agg
    """


def _mmr_oracle(k: int = 5, shortlist: int = 20, lam_num: int = 7,
                lam_den: int = 10, dim: int = 64) -> str:
    """DuckDB mirror of q_mmr_diverse_topk's full greedy loop, unrolled as
    chained CTEs (the _pagerank_oracle pattern): the quantized_ann int8
    CTE chain builds the shortlist by exact integer query dots, then each
    round r computes lam_num·rel − (lam_den−lam_num)·max_sim over the
    not-yet-selected candidates (all exact integers) and picks the max
    (ties → smaller vec_id)."""
    qvec = [((i * 37) % 19 - 9) / 9.0 for i in range(dim)]
    amax = max(abs(v) for v in qvec)
    qscale = 127.0 / amax if amax > 0 else 0.0
    import math as _m
    qq = [int(_m.floor(v * qscale + 0.5)) for v in qvec]
    qq_sql = "[" + ", ".join(str(v) for v in qq) + "]"
    mu = lam_den - lam_num
    pairdot = ("list_sum(list_transform(generate_series(1, %d), "
               "i -> CAST(c.qvec[i] AS BIGINT) * CAST(s.qvec[i] AS BIGINT)))"
               % dim)
    parts = [f"""
m AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           list_max(list_transform(embedding,
                                   x -> abs(CAST(x AS DOUBLE)))) AS amax
    FROM embeddings
), s0 AS (
    SELECT vec_id, e,
           CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END AS scale
    FROM m
), q8 AS (
    SELECT vec_id,
           list_transform(e, x -> CAST(floor(x * scale + 0.5) AS INT))
               AS qvec
    FROM s0
), short AS (
    SELECT vec_id, qvec,
           CAST(list_sum(list_transform(generate_series(1, {dim}),
                i -> CAST(qvec[i] AS BIGINT)
                     * ({qq_sql})[i])) AS BIGINT) AS rel
    FROM q8 ORDER BY rel DESC, vec_id LIMIT {shortlist}
), sel1 AS (
    SELECT 1 AS rank, vec_id, qvec, rel,
           CAST({lam_num} AS BIGINT) * rel AS score
    FROM short ORDER BY rel DESC, vec_id LIMIT 1
)"""]
    for r in range(2, k + 1):
        p = r - 1
        parts.append(f"""
cand{r} AS (
    SELECT c.vec_id, c.qvec, c.rel,
           max({pairdot}) AS msim
    FROM short c CROSS JOIN sel{p} s
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{p})
    GROUP BY c.vec_id, c.qvec, c.rel
), pick{r} AS (
    SELECT {r} AS rank, vec_id, qvec, rel,
           CAST({lam_num} AS BIGINT) * rel
               - CAST({mu} AS BIGINT) * msim AS score
    FROM cand{r}
    ORDER BY score DESC, vec_id LIMIT 1
), sel{r} AS (
    SELECT * FROM sel{p} UNION ALL SELECT * FROM pick{r}
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT CAST(rank AS INT) AS rank, vec_id,
       CAST(rel AS BIGINT) AS rel_dot, CAST(score AS BIGINT) AS mmr_score
FROM sel{k} ORDER BY rank
""")


def _welch_oracle(g1: str = "purchase", g2: str = "click") -> str:
    """DuckDB mirror of q_welch_ttest: identical conditional cents-integer
    moment sums and the identical double expression trees for mean /
    variance / t / Welch–Satterthwaite df (python-composed so both engines
    share ONE formula text)."""
    sides = []
    for tag, g in ((1, g1), (2, g2)):
        m = f"event_type = '{g}'"
        sides.append(f"""
            CAST(sum(CASE WHEN {m} AND cl IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n{tag},
            sum(CASE WHEN {m} THEN CAST(cl AS DECIMAL(19,0)) END) AS s{tag},
            CAST(sum(CASE WHEN {m} THEN CAST(cl * cl AS DECIMAL(38,0)) END)
                 AS DECIMAL(38,0)) AS q{tag}""")
    # the SAME guard structure as the Spark side: every division behind a
    # CASE, so degenerate cohorts yield NULL on both engines
    stats = {}
    for tag in (1, 2):
        n = f"CAST(n{tag} AS DOUBLE)"
        s = f"CAST(s{tag} AS DOUBLE)"
        q = f"CAST(q{tag} AS DOUBLE)"
        mean = f"(CASE WHEN n{tag} > 0 THEN {s} / (100.0 * {n}) END)"
        var = (f"(CASE WHEN n{tag} > 1 THEN "
               f"((({q} - ({s} * {s}) / {n}) / ({n} - 1.0)) / 10000.0) END)")
        stats[tag] = (n, mean, var)
    n1, m1, v1 = stats[1]
    n2, m2, v2 = stats[2]
    se2 = f"({v1} / {n1} + {v2} / {n2})"
    t = f"(CASE WHEN {se2} > 0 THEN ({m1} - {m2}) / sqrt({se2}) END)"
    dfw_den = (f"(({v1} / {n1}) * ({v1} / {n1}) / ({n1} - 1.0)"
               f" + ({v2} / {n2}) * ({v2} / {n2}) / ({n2} - 1.0))")
    dfw = (f"(CASE WHEN {dfw_den} > 0 THEN ({se2} * {se2}) / {dfw_den} END)")
    return f"""
        WITH m AS (
            SELECT {",".join(sides)}
            FROM (SELECT event_type,
                         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                             AS cl
                  FROM events)
        )
        SELECT n1, n2,
               round({m1}, 6) + 0.0 AS mean1,
               round({m2}, 6) + 0.0 AS mean2,
               round({v1}, 6) + 0.0 AS var1,
               round({v2}, 6) + 0.0 AS var2,
               round({t}, 6) + 0.0 AS t_stat,
               round({dfw}, 6) + 0.0 AS df_welch
        FROM m
    """


def _embedding_drift_oracle() -> str:
    """DuckDB mirror of q_embedding_drift: the SAME left-assoc anchor
    distance (1-based list indexing) and psi_drift's fixed-bucket CTE
    chain with lo=1.0, 10 buckets over [1.0, 1.8)."""
    a = _drift_anchor()
    # CAST('<repr>' AS DOUBLE): DuckDB's VARCHAR->DOUBLE parse is correctly
    # rounded and matches the python float exactly, whereas a bare literal
    # parses as DECIMAL(18,17) whose double conversion can be 1 ulp off
    # (7 of 64 anchors differ) — enough to flip a PSI bucket boundary.
    dist = "sqrt(0.0" + "".join(
        f" + (CAST(embedding[{i + 1}] AS DOUBLE) - CAST('{a[i]!r}' AS DOUBLE))"
        f" * (CAST(embedding[{i + 1}] AS DOUBLE) - CAST('{a[i]!r}' AS DOUBLE))"
        for i in range(64)) + ")"
    w = (1.8 - 1.0) / 10
    bucket = (f"CASE WHEN value < CAST(1.0 AS DOUBLE) THEN -1 "
              f"ELSE least(CAST(floor((value - CAST(1.0 AS DOUBLE)) "
              f"/ CAST('{w!r}' AS DOUBLE)) AS INT), 9) END")
    return f"""
        WITH d AS (
            SELECT label, {dist} AS value FROM embeddings
        ), oldv AS (
            SELECT value FROM d WHERE label < 5 AND value IS NOT NULL
        ), newv AS (
            SELECT value FROM d WHERE label >= 5 AND value IS NOT NULL
        ), pb AS (
            SELECT {bucket} AS bucket, count(*) AS c FROM oldv GROUP BY 1
        ), pt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM pb),
        p AS (SELECT bucket, c / t AS p FROM pb, pt),
        qb AS (
            SELECT {bucket} AS bucket, count(*) AS c FROM newv GROUP BY 1
        ), qt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM qb),
        q AS (SELECT bucket, c / t AS q FROM qb, qt),
        j AS (
            SELECT COALESCE(p.bucket, q.bucket) AS bucket,
                   COALESCE(p.p, CAST(0.0 AS DOUBLE)) AS p,
                   COALESCE(q.q, CAST(0.0 AS DOUBLE)) AS q
            FROM p FULL OUTER JOIN q ON p.bucket = q.bucket
        ), terms AS (
            SELECT bucket, p, q,
                   CAST(round((greatest(p, 1e-6) - greatest(q, 1e-6))
                        * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 9)
                        AS DECIMAL(15,9)) AS term
            FROM j
        ), tot AS (
            SELECT round(CAST(sum(term) AS DOUBLE), 6) AS psi FROM terms
        )
        SELECT bucket, round(p, 6) + 0.0 AS p, round(q, 6) + 0.0 AS q,
               CAST(term AS DOUBLE) + 0.0 AS psi_term, psi + 0.0 AS psi
        FROM terms, tot
    """


def _benford_oracle(col: str = "l_extendedprice",
                    table: str = "lineitem") -> str:
    """DuckDB mirror of q_benford_check: string-derived leading digit of
    the cents integer, exact 9-group counts, and the SAME 9-dp Benford
    share literals (quality.py::benford_expected) in the χ² terms."""
    from akka_stream_contrib_spark.functions.quality import benford_expected
    ecase = ("CASE digit "
             + " ".join(f"WHEN {d} THEN {e!r}"
                        for d, e in enumerate(benford_expected(), start=1))
             + " END")
    return f"""
        WITH d AS (
            SELECT CAST(substr(CAST(cl AS VARCHAR), 1, 1) AS INT) AS digit
            FROM (SELECT CAST(CAST({col} AS DECIMAL(12,2)) * 100 AS BIGINT)
                      AS cl FROM {table})
            WHERE cl > 0
        ), spine AS (
            SELECT CAST(unnest(range(1, 10)) AS INT) AS digit
        ), per AS (
            SELECT spine.digit,
                   CAST(coalesce(cnt.n, 0) AS BIGINT) AS n
            FROM spine LEFT JOIN (
                SELECT digit, count(*) AS n FROM d GROUP BY digit) cnt
              ON spine.digit = cnt.digit
        ), tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS t FROM per
        ), scored AS (
            SELECT digit, n, t, {ecase} AS expected,
                   {ecase} * CAST(t AS DOUBLE) AS en
            FROM per CROSS JOIN tot
        ), pd AS (
            SELECT digit, n,
                   round(CASE WHEN t > 0
                              THEN CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
                         END, 6) + 0.0 AS share,
                   expected,
                   CAST(CASE WHEN en > 0
                             THEN round((CAST(n AS DOUBLE) - en)
                                        * (CAST(n AS DOUBLE) - en) / en, 9)
                        END AS DECIMAL(28,9)) AS chi_term
            FROM scored
        ), total AS (
            SELECT round(CAST(sum(chi_term) AS DOUBLE), 6) AS chi2 FROM pd
        )
        SELECT digit, n, share, expected,
               CAST(chi_term AS DOUBLE) + 0.0 AS chi_term,
               chi2 + 0.0 AS chi2
        FROM pd CROSS JOIN total
    """


def _logreg_oracle(iters: int = 15, lr: float = 0.5) -> str:
    """DuckDB mirror of q_logreg_quality's full training+scoring loop:
    15 full-batch GD iterations unrolled as chained single-row weight CTEs
    (w_j ← w_j − lr·mean(err·f_j), zero init — functions/ml.py::logreg_train)
    over the same five quality features, then the same left-associated
    literal-weight sigmoid scorer. Float sums associate differently between
    numpy batch partials and DuckDB's aggregate, so weights agree to ~1e-14
    — far inside the 6-dp rounding of the emitted probabilities."""
    feats = ["f1", "f2", "f3", "f4", "f5"]
    ctes = [
        # MATERIALIZED: the Spark side featurizes ONCE (localCheckpoint
        # before the GD loop); without it DuckDB inlines feat into every
        # iteration CTE and re-scans documents 15x - 1.35 s vs 0.15 s at
        # sf0.1, and not the equivalent work
        """feat AS MATERIALIZED (
            SELECT doc_id, CAST(lang = 'en' AS INT) AS label,
                   ln(n_tok + 1.0) AS f1,
                   (n_chars - (n_tok - 1)) / n_tok AS f2,
                   (n_chars - n_nodigit) / n_chars AS f3,
                   (n_chars - n_noupper) / n_chars AS f4,
                   n_distinct / n_tok AS f5
            FROM (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE) AS n_distinct,
                       CAST(length(regexp_replace(text, '[0-9]', '', 'g'))
                            AS DOUBLE) AS n_nodigit,
                       CAST(length(regexp_replace(text, '[A-Z]', '', 'g'))
                            AS DOUBLE) AS n_noupper
                FROM documents)
        )""",
        "it0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in range(1, 6))
        + ", 0.0 AS b)",
    ]
    # z matches logreg_predict's left fold: ((((0+f1w1)+f2w2)+...)+f5w5)+b
    z = "(0.0 + " + " + ".join(f"{f}*w{j+1}" for j, f in enumerate(feats)) + ") + b"
    for k in range(1, iters + 1):
        err = f"(1.0 / (1.0 + exp(-({z}))) - label)"
        ups = ", ".join(
            f"min(w{j}) - {lr!r} * (sum({err} * f{j}) / count(*)) AS w{j}"
            for j in range(1, 6))
        ctes.append(
            f"it{k} AS (SELECT {ups}, "
            f"min(b) - {lr!r} * (sum({err}) / count(*)) AS b "
            f"FROM feat CROSS JOIN it{k-1})")
    prob = f"round(1.0 / (1.0 + exp(-({z}))), 6) + 0.0"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT doc_id, label, {prob} AS prob,
               CAST(({prob}) >= 0.5 AS INT) AS predicted
        FROM feat CROSS JOIN it{iters}
    """)


_LOGREG_ORACLE = _logreg_oracle()


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """DuckDB mirror of q_pagerank_users' full power iteration, unrolled as
    chained CTEs (the _logreg_oracle pattern for iterative driver loops).
    Each round k mirrors functions/graph.py::pagerank exactly: d{k} = the
    dangling mass (rank held by nodes with no out-edges), c{k} = the inflow
    aggregation, r{k} = the rank update with the SAME expression ordering
    the Spark side folds into its literal — ((1-d)/n + d*m/n) + d*inflow.
    Float sums associate differently across engines (~1e-16 drift), far
    inside the 6-dp output rounding; verified exact at sf0.001/0.01/0.1."""
    d = repr(float(damping))
    parts = ["""
e AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM (
        SELECT lag(user_id) OVER (
                   PARTITION BY date_trunc('hour', ts) ORDER BY event_id
               ) AS src,
               user_id AS dst
        FROM events)
    WHERE src IS NOT NULL AND src <> dst
),
nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT id, 1.0 / nn.n AS rank FROM nodes, nn)
"""]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(f"""
d{k} AS MATERIALIZED (
    SELECT coalesce(sum(rank), 0.0) AS m
    FROM r{p} WHERE NOT EXISTS (
        SELECT 1 FROM outdeg WHERE outdeg.src = r{p}.id)
),
c{k} AS MATERIALIZED (
    SELECT e.dst, sum(r{p}.rank / outdeg.out_deg) AS inflow
    FROM e JOIN r{p} ON r{p}.id = e.src
           JOIN outdeg ON outdeg.src = e.src
    GROUP BY e.dst
),
r{k} AS MATERIALIZED (
    SELECT nodes.id,
           ((1.0 - {d}) / nn.n + {d} * d{k}.m / nn.n)
           + {d} * coalesce(c{k}.inflow, 0.0) AS rank
    FROM nodes
    LEFT JOIN c{k} ON c{k}.dst = nodes.id
    CROSS JOIN nn CROSS JOIN d{k}
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT id AS user_id, round(rank, 6) + 0.0 AS rank
FROM r{iterations} ORDER BY user_id
""")


_PAGERANK_ORACLE = _pagerank_oracle()


def _bpe_learn_oracle(n_merges: int = 10) -> str:
    """DuckDB mirror of q_bpe_learn_merges' full training loop, unrolled as
    chained CTEs. Vocabulary state is the flat PER-SYMBOL-WRAPPED string
    (every symbol carries its own leading AND trailing separator — see
    functions/bpe.py::_encode_expr for why both boundaries must anchor and
    why a shared separator breaks chained merges): plain replace of
    SEP+a+SEP+SEP+b+SEP with SEP+ab+SEP equals the left-to-right
    non-overlapping merge fold of functions/bpe.py::_merge_pair. Each
    round: adjacent-pair counts over the weighted vocab (p{{k}}), the
    lexically tie-broken argmax (t{{k}}), and the rewrite (v{{k}}).
    All-integer — exact by construction; verified merge-for-merge at
    sf0.001/0.01/0.1 plus the adversarial prefix-symbol corpus in
    tests."""
    parts = ["""
v0 AS MATERIALIZED (
    SELECT array_to_string(list_transform(string_split_regex(w, ''),
               c -> chr(31) || c || chr(31)), '') AS s,
           f
    FROM (
        SELECT w, count(*) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY w)
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f"""
p{k} AS MATERIALIZED (
    SELECT l[i] AS a, l[i + 1] AS b, CAST(sum(f) AS BIGINT) AS c
    FROM (
        SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS l, f,
               unnest(generate_series(1,
                   len(list_filter(string_split(s, chr(31)),
                                   x -> x <> '')) - 1)) AS i
        FROM v{p})
    GROUP BY a, b
),
t{k} AS MATERIALIZED (SELECT a, b, c FROM p{k} ORDER BY c DESC, a, b LIMIT 1),
v{k} AS MATERIALIZED (
    SELECT replace(v{p}.s,
                   chr(31) || t{k}.a || chr(31) || chr(31) || t{k}.b
                       || chr(31),
                   chr(31) || t{k}.a || t{k}.b || chr(31)) AS s,
           v{p}.f
    FROM v{p} CROSS JOIN t{k}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, a AS left, b AS right, c AS pair_count"
        f" FROM t{k}"
        for k in range(1, n_merges + 1))
    return "WITH " + ",".join(parts) + "\n" + sel + "\nORDER BY step"


_BPE_LEARN_ORACLE = _bpe_learn_oracle()


def _kmeans_oracle(k: int = 8, iterations: int = 3, dim: int = 64) -> str:
    """DuckDB mirror of q_kmeans_clusters' full Lloyd loop (portable_round=6),
    unrolled as chained CTEs: a{it} = full-precision argmin assignment
    (ties → lowest cid, like numpy argmin), m{it} = per-dimension member
    means rounded to 6 dp, c{it} = carry (empty clusters keep the prior
    centroid, rounded — matching the Spark side's round-after-update).
    Rounded centroids make the literals identical across engines each
    round; the residual risk is a point whose two nearest centroids are
    equidistant to ~1e-13 (measure-zero, the logreg-oracle acceptance).
    Verified exact at sf0.001/0.01/0.1."""
    d2 = "list_sum(list_transform(list_zip(x, c), p -> (p[1] - p[2])^2))"
    parts = [f"""
emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
c0 AS MATERIALIZED (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
           x AS c
    FROM (SELECT vec_id, x FROM emb ORDER BY vec_id LIMIT {k})
)"""]
    for it in range(1, iterations + 1):
        p = it - 1
        parts.append(f"""
a{it} AS MATERIALIZED (
    SELECT vec_id, x, cid FROM (
        SELECT emb.vec_id, emb.x, c{p}.cid,
               row_number() OVER (
                   PARTITION BY emb.vec_id
                   ORDER BY {d2}, c{p}.cid) AS rn
        FROM emb CROSS JOIN c{p})
    WHERE rn = 1
),
m{it} AS MATERIALIZED (
    SELECT cid, list(mv ORDER BY i) AS c
    FROM (
        SELECT cid, i, round(avg(x[i]), 6) + 0.0 AS mv
        FROM a{it},
             (SELECT unnest(generate_series(1, {dim})) AS i) s
        GROUP BY cid, i)
    GROUP BY cid
),
c{it} AS MATERIALIZED (
    SELECT c{p}.cid,
           coalesce(m{it}.c,
                    list_transform(c{p}.c, v -> round(v, 6) + 0.0)) AS c
    FROM c{p} LEFT JOIN m{it} ON m{it}.cid = c{p}.cid
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT vec_id, cid AS cluster, round(sqrt(d2), 6) + 0.0 AS dist
FROM (
    SELECT vec_id, cid, d2 FROM (
        SELECT emb.vec_id, c{iterations}.cid,
               {d2} AS d2,
               row_number() OVER (
                   PARTITION BY emb.vec_id
                   ORDER BY {d2}, c{iterations}.cid) AS rn
        FROM emb CROSS JOIN c{iterations})
    WHERE rn = 1)
""")


_KMEANS_ORACLE = _kmeans_oracle()

#: squared L2 / dot product between DOUBLE[] lists — DuckDB fragments shared
#: by the IVF oracles below
_SQL_D2 = "list_sum(list_transform(list_zip(s.x, c.c), p -> (p[1] - p[2])^2))"
_SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def _ivf_train_ctes(src: str, nlist: int, iters: int, dim: int,
                    cap: int) -> str:
    """CTE chain ending in c{iters} (cid, c) — the DuckDB unroll of
    functions/similarity.py::_train_centroids with portable_round=6:
    bounded id-sorted sample, seeds = first nlist normalized rows, then per
    round argmin assignment (ties → lowest cid), per-dimension member means
    (empty cells carry the prior centroid), re-normalization of EVERY
    centroid (numpy divides kept cells by their ≈1.0 norm too), and 6-dp
    rounding so both engines enter the next round with identical literals.
    ``src`` is a (vec_id, x) relation of L2-normalized DOUBLE[] vectors."""
    parts = [f"""
samp AS MATERIALIZED (SELECT vec_id, x FROM {src} ORDER BY vec_id LIMIT {cap}),
c0 AS MATERIALIZED (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
           x AS c
    FROM (SELECT vec_id, x FROM samp ORDER BY vec_id LIMIT {nlist})
)"""]
    for r in range(1, iters + 1):
        p = r - 1
        parts.append(f"""
a{r} AS MATERIALIZED (
    SELECT vec_id, x, cid FROM (
        SELECT s.vec_id, s.x, c.cid,
               row_number() OVER (
                   PARTITION BY s.vec_id ORDER BY {_SQL_D2}, c.cid) AS rn
        FROM samp s CROSS JOIN c{p} c)
    WHERE rn = 1
),
m{r} AS MATERIALIZED (
    SELECT cid, list(mv ORDER BY i) AS c
    FROM (
        SELECT cid, i, avg(x[i]) AS mv
        FROM a{r}, (SELECT unnest(generate_series(1, {dim})) AS i) g
        GROUP BY cid, i)
    GROUP BY cid
),
k{r} AS MATERIALIZED (
    SELECT p.cid, coalesce(m{r}.c, p.c) AS c
    FROM c{p} p LEFT JOIN m{r} ON m{r}.cid = p.cid
),
c{r} AS MATERIALIZED (
    SELECT cid,
           list_transform(c, v -> round(
               v / sqrt(list_sum(list_transform(c, w -> w * w))), 6) + 0.0)
               AS c
    FROM k{r}
)""")
    return ",".join(parts)


def _ivf_topk_oracle(k: int = 10, nlist: int = 16, nprobe: int = 4,
                     iters: int = 5, dim: int = 64) -> str:
    """DuckDB mirror of q_ivf_ann_topk (portable_round=6): centroid training
    unrolled (_ivf_train_ctes over the vec_id<>0 corpus), probe cells = top
    nprobe by centroid·query dot (ties → lowest cid, numpy stable argsort),
    home-cell assignment for every vector, exact cosine over probed cells
    only, top-k by (rounded cos DESC, vec_id). Residual cross-engine risk is
    an argmin/probe tie at ~1e-13 — the kmeans-oracle acceptance. Verified
    exact at sf0.001/0.01/0.1."""
    cap = max(nlist * 64, 1024)
    dot_cq = _SQL_DOT.format(a="c.c", b="qv.q")
    dot_xq = _SQL_DOT.format(a="a.x", b="qv.q")
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw
             FROM embeddings),
nv AS MATERIALIZED (
    SELECT vec_id,
           list_transform(raw, v -> v / sqrt(
               list_sum(list_transform(raw, w -> w * w)))) AS x
    FROM emb WHERE vec_id <> 0
),
{_ivf_train_ctes("nv", nlist, iters, dim, cap)},
qv AS MATERIALIZED (
    SELECT list_transform(raw, v -> v / sqrt(
               list_sum(list_transform(raw, w -> w * w)))) AS q
    FROM emb WHERE vec_id = 0
),
probes AS MATERIALIZED (
    SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY {dot_cq} DESC, c.cid) AS rn
        FROM c{iters} c CROSS JOIN qv)
    WHERE rn <= {nprobe}
),
assigned AS MATERIALIZED (
    SELECT vec_id, x, cid FROM (
        SELECT s.vec_id, s.x, c.cid,
               row_number() OVER (
                   PARTITION BY s.vec_id ORDER BY {_SQL_D2}, c.cid) AS rn
        FROM nv s CROSS JOIN c{iters} c)
    WHERE rn = 1
)
SELECT a.vec_id, round({dot_xq}, 6) + 0.0 AS cos_sim
FROM assigned a CROSS JOIN qv
WHERE a.cid IN (SELECT cid FROM probes)
ORDER BY cos_sim DESC, a.vec_id
LIMIT {k}
"""


def _ann_ivf_all_oracle(k: int = 3, nlist: int = 16, nprobe: int = 4,
                        iters: int = 5, dim: int = 64) -> str:
    """DuckDB mirror of q_ann_ivf_all (portable_round=6): after the shared
    training unroll, every vector gets its nprobe nearest cells (stable
    ties), candidates = probe-cell × home-cell equi-join minus self, and
    the per-query top-k windows on UNROUNDED cosine with neighbor_id
    tie-break — exactly the Spark composition's window. The Spark side's
    per-cell top-(k+1) pre-pruning is a pure optimization (it always
    contains the per-query global top-k), so the SQL can skip it. Verified
    exact at sf0.001/0.01/0.1."""
    cap = max(nlist * 64, 1024)
    dot_qc = _SQL_DOT.format(a="q.x", b="r.x")
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw
             FROM embeddings),
nv AS MATERIALIZED (
    SELECT vec_id,
           list_transform(raw, v -> v / sqrt(
               list_sum(list_transform(raw, w -> w * w)))) AS x
    FROM emb
),
{_ivf_train_ctes("nv", nlist, iters, dim, cap)},
ranked AS MATERIALIZED (
    SELECT vec_id, x, cid, rn FROM (
        SELECT s.vec_id, s.x, c.cid,
               row_number() OVER (
                   PARTITION BY s.vec_id ORDER BY {_SQL_D2}, c.cid) AS rn
        FROM nv s CROSS JOIN c{iters} c)
    WHERE rn <= {nprobe}
),
home AS MATERIALIZED (SELECT vec_id, x, cid FROM ranked WHERE rn = 1),
cand AS MATERIALIZED (
    SELECT q.vec_id AS vec_id, r.vec_id AS neighbor_id,
           {dot_qc} AS cos
    FROM ranked q JOIN home r ON r.cid = q.cid
    WHERE r.vec_id <> q.vec_id
)
SELECT vec_id, neighbor_id, round(cos, 6) + 0.0 AS cos_sim
FROM (
    SELECT vec_id, neighbor_id, cos,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn
    FROM cand)
WHERE rn <= {k}
"""


_IVF_TOPK_ORACLE = _ivf_topk_oracle()
_ANN_IVF_ALL_ORACLE = _ann_ivf_all_oracle()

from akka_stream_contrib_spark.functions.projection import (  # noqa: E402
    rp_project_sql as _rp_project_sql)

#: JL projection oracle — the literal ±1 sign matrix is rebuilt from the
#: same md5 derivation the Spark side uses (functions/projection.py).
_RP_ORACLE = _rp_project_sql(out_dim=16, in_dim=64)

#: exact cosine top-10 for query vec_id=0 — oracle for BOTH the exact kernel
#: (ann_cosine_topk) and the two-stage PQ pipeline (pq_ann), whose rerank
#: output equals the exact ranking when the ADC shortlist covers the top-10.
_COS_TOP10_ORACLE = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    c AS (
        SELECT e.vec_id,
               list_sum(list_transform(generate_series(1, len(e.embedding)),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qe,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM embeddings e, q WHERE e.vec_id <> 0
    )
    SELECT vec_id, round(cos, 6) AS cos_sim
    FROM c ORDER BY cos DESC, vec_id LIMIT 10
"""


#: DuckDB mirror of functions/text.py::bigram_logprob_score — shared by the
#: bigram_logprob gate and the perplexity_buckets split built on top of it
_BIGRAM_LP_SQL = """
            WITH toks AS (
                SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(t[1 : len(t) - 1]) AS w1,
                       unnest(t[2 : len(t)]) AS w2
                FROM toks WHERE len(t) >= 2
            ), bgc AS (
                SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
            ), uc AS (
                SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
            ), v AS (
                SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vv FROM (
                    SELECT w1 AS w FROM bg UNION ALL SELECT w2 AS w FROM bg)
            )
            SELECT b.doc_id, count(*) AS n_bigrams,
                   round(CAST(sum(CAST(round(ln((c.c12 + 0.5) / (u.c1 + 0.5 * v.vv)), 9)
                                       AS DECIMAL(15,9))) AS DOUBLE) / count(*), 6) + 0.0
                       AS logprob
            FROM bg b
            JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
            JOIN uc u ON b.w1 = u.w1
            CROSS JOIN v
            GROUP BY b.doc_id
        """


_KAPPA_SQL = """
    WITH rated AS (
        SELECT CASE WHEN n_chars IS NULL THEN NULL
                    WHEN n_chars < 300 THEN 'short'
                    WHEN n_chars < 900 THEN 'mid'
                    ELSE 'long' END AS _a,
               CASE WHEN text IS NULL THEN NULL
                    WHEN len(string_split(text, ' ')) < 50 THEN 'short'
                    WHEN len(string_split(text, ' ')) < 150 THEN 'mid'
                    ELSE 'long' END AS _b
        FROM documents
    ), cells AS (
        SELECT _a, _b, count(*) AS _n FROM rated
        WHERE _a IS NOT NULL AND _b IS NOT NULL GROUP BY _a, _b
    ), rowm AS (SELECT _a AS _c, CAST(sum(_n) AS BIGINT) AS _ra
                FROM cells GROUP BY _a),
    colm AS (SELECT _b AS _c, CAST(sum(_n) AS BIGINT) AS _rb
             FROM cells GROUP BY _b),
    pe AS (SELECT sum(CAST(_ra AS DECIMAL(19,0)) * _rb) AS _pe_num
           FROM rowm JOIN colm USING (_c)),
    obs AS (SELECT CAST(sum(_n) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN _a = _b THEN _n ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM cells)
    SELECT n, n_agree,
           round(CASE WHEN n > 0
                 THEN CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
               + 0.0 AS p_o,
           round(CASE WHEN n > 0
                 THEN CAST(_pe_num AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) END, 6)
               + 0.0 AS p_e,
           round(CASE WHEN CAST(_pe_num AS DOUBLE)
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
                 THEN (CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(_pe_num AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                      / (1.0 - CAST(_pe_num AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) END, 6)
               + 0.0 AS kappa
    FROM obs CROSS JOIN pe
"""


def _wilson_oracle(z: float = 1.96, min_trials: int = 5,
                   top_k: int = 20) -> str:
    """DuckDB mirror of q_wilson_rank: identical conditional counts, the
    identical double expression tree with z/z² injected as the SAME
    python-literal doubles (CAST-from-VARCHAR parse — correctly rounded,
    see the r6 1-ulp advice), ranked (wilson_lb desc, group asc)."""
    zf = float(z)
    zs = f"CAST('{zf!r}' AS DOUBLE)"
    z2s = f"CAST('{zf * zf!r}' AS DOUBLE)"
    n = "CAST(n_trials AS DOUBLE)"
    p = f"(CAST(n_success AS DOUBLE) / {n})"
    lb = (f"(({p} + {z2s} / (2.0 * {n})"
          f" - {zs} * sqrt(({p} * (1.0 - {p}) + {z2s} / (4.0 * {n})) / {n}))"
          f" / (1.0 + {z2s} / {n}))")
    return f"""
        WITH per AS (
            SELECT user_id AS "group",
                   CAST(sum(CAST(event_type = 'purchase' AS INT))
                        AS BIGINT) AS n_success,
                   CAST(count(CAST(event_type = 'purchase' AS INT))
                        AS BIGINT) AS n_trials
            FROM events GROUP BY user_id
            HAVING count(CAST(event_type = 'purchase' AS INT))
                   >= {int(min_trials)}
        )
        SELECT "group", n_success, n_trials,
               round({p}, 6) + 0.0 AS rate,
               round({lb}, 6) + 0.0 AS wilson_lb
        FROM per
        ORDER BY wilson_lb DESC, "group"
        LIMIT {int(top_k)}
    """


_F1_SWEEP_SQL = """
    WITH per AS (
        SELECT n_chars AS threshold,
               CAST(sum(CAST(lang = 'en' AS INT)) AS BIGINT) AS pos,
               CAST(count(*) - sum(CAST(lang = 'en' AS INT))
                    AS BIGINT) AS neg
        FROM documents
        WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        GROUP BY n_chars
    ), c AS (
        SELECT *,
               sum(pos) OVER (ORDER BY threshold
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cp,
               sum(neg) OVER (ORDER BY threshold
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cn,
               sum(pos) OVER () AS _tp_all,
               sum(neg) OVER () AS _tn_all
        FROM per
    ), m AS (
        SELECT threshold,
               CAST(_tp_all - _cp + pos AS BIGINT) AS tp,
               CAST(_tn_all - _cn + neg AS BIGINT) AS fp,
               CAST(_tp_all - (_tp_all - _cp + pos) AS BIGINT) AS fn,
               CAST(_tp_all AS BIGINT) AS _p
        FROM c
    )
    SELECT threshold, tp, fp, fn,
           round(CASE WHEN tp + fp > 0
                 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6)
               + 0.0 AS precision,
           round(CASE WHEN _p > 0
                 THEN CAST(tp AS DOUBLE) / CAST(_p AS DOUBLE) END, 6)
               + 0.0 AS recall,
           round(CASE WHEN tp + fp + _p > 0
                 THEN CAST(2 * tp AS DOUBLE)
                      / CAST(tp + fp + _p AS DOUBLE) END, 6)
               + 0.0 AS f1
    FROM m
    ORDER BY f1 DESC NULLS LAST, threshold
    LIMIT 1
"""


def _mrr_oracle(k: int = 10) -> str:
    """DuckDB mirror of q_mrr_eval: one _ndcg_oracle-style BM25 score CTE
    per query cut at top-k, all-terms binary relevance, per-query first
    relevant rank, 9-dp-decimal reciprocal ranks summed exactly, one
    final double division."""
    blocks = []
    for name, terms in _MRR_QUERIES.items():
        tfs = ",\n".join(
            f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
            f" AS tf{i}" for i, t in enumerate(terms))
        dfs = ", ".join(
            f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS df{i}" for i in range(len(terms)))
        score = " + ".join(
            f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
            f" * (CAST(tf{i} AS DOUBLE) * 2.2)"
            f" / (CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 *"
            f" (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE)"
            f" / CAST(n AS DOUBLE)))))"
            for i in range(len(terms)))
        rel = " AND ".join(
            f"list_contains(string_split(d.text, ' '), '{t}')"
            for t in terms)
        blocks.append(f"""
        SELECT '{name}' AS query, t.doc_id, t.score,
               CASE WHEN {rel} THEN 1 ELSE 0 END AS rel
        FROM (
            SELECT doc_id, round({score}, 6) + 0.0 AS score
            FROM (
                SELECT doc_id, len(string_split(text, ' ')) AS dl, {tfs}
                FROM documents WHERE text IS NOT NULL
            ) tf, (
                SELECT count(*) AS n, sum(dl) AS sdl, {dfs}
                FROM (
                    SELECT len(string_split(text, ' ')) AS dl, {tfs}
                    FROM documents WHERE text IS NOT NULL)
            ) stats
            ORDER BY score DESC, doc_id
            LIMIT {k}
        ) t JOIN documents d USING (doc_id)""")
    union = "\nUNION ALL\n".join(blocks)
    return f"""
        WITH allq AS ({union}),
        ranked AS (
            SELECT query, rel,
                   row_number() OVER (PARTITION BY query
                       ORDER BY score DESC, doc_id) AS _i
            FROM allq
        ), first AS (
            SELECT query,
                   min(CASE WHEN rel = 1 THEN _i END) AS _fr
            FROM ranked WHERE _i <= {k} GROUP BY query
        ), agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_queries,
                   CAST(count(_fr) AS BIGINT) AS n_hit,
                   sum(CAST(CASE WHEN _fr IS NOT NULL
                            THEN round(1.0 / CAST(_fr AS DOUBLE), 9)
                            ELSE 0.0 END AS DECIMAL(15,9))) AS _srr
            FROM first
        )
        SELECT n_queries, n_hit,
               round(CASE WHEN n_queries > 0
                     THEN CAST(_srr AS DOUBLE)
                          / CAST(n_queries AS DOUBLE) END, 6)
                   + 0.0 AS mrr
        FROM agg
    """


def _item_cf_oracle(k: int = 5, min_pair_count: int = 3,
                    max_basket_size: int = 100) -> str:
    """DuckDB mirror of q_item_cf_recs: the association_rules basket
    machinery (dedup, size cap, x<y self-join, exact counts) mirrored to
    both directions, cosine = one double division of a sqrt of the exact
    decimal count product, per-item rank (cosine desc, neighbor asc)."""
    return f"""
        WITH items AS (
            SELECT basket, item FROM (
                SELECT l_orderkey AS basket, l_partkey AS item,
                       count(*) OVER (PARTITION BY l_orderkey) AS _sz
                FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                      WHERE l_orderkey IS NOT NULL
                        AND l_partkey IS NOT NULL))
            WHERE _sz <= {max_basket_size}
        ), item_n AS (
            SELECT item AS _i, CAST(count(*) AS BIGINT) AS _n
            FROM items GROUP BY item
        ), pairs AS (
            SELECT a.item AS x, b.item AS y,
                   CAST(count(*) AS BIGINT) AS n_xy
            FROM items a JOIN items b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY a.item, b.item
            HAVING count(*) >= {min_pair_count}
        ), mirrored AS (
            SELECT x, y, n_xy FROM pairs
            UNION ALL
            SELECT y AS x, x AS y, n_xy FROM pairs
        ), scored AS (
            SELECT b.x AS item, b.y AS neighbor, b.n_xy,
                   round(CAST(b.n_xy AS DOUBLE)
                         / sqrt(CAST(CAST(nx._n AS DECIMAL(19,0)) * ny._n
                                     AS DOUBLE)), 6) + 0.0 AS cosine
            FROM mirrored b JOIN item_n nx ON b.x = nx._i
                        JOIN item_n ny ON b.y = ny._i
        )
        SELECT item, neighbor, n_xy, cosine, CAST(rank AS INT) AS rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY item
                       ORDER BY cosine DESC, neighbor) AS rank
            FROM scored)
        WHERE rank <= {k}
        ORDER BY item, rank
    """


_EDGES_CTE = """
e AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM (
        SELECT lag(user_id) OVER (
                   PARTITION BY date_trunc('hour', ts) ORDER BY event_id
               ) AS src,
               user_id AS dst
        FROM events)
    WHERE src IS NOT NULL AND src <> dst
)"""


def _hits_oracle(iterations: int = 3) -> str:
    """DuckDB mirror of q_hits_scores: the UNNORMALIZED HITS half-steps
    unrolled as chained CTEs (the _pagerank_oracle pattern) with ONE
    final L1 normalization — mirroring functions/graph.py::hits_scores'
    deferred-norm loop exactly (per-half-step norms are scalar factors
    that cancel under linearity). Float-sum association drift ~1e-16
    relative, absorbed by the 6-dp round."""
    parts = [_EDGES_CTE + """,
nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
s0 AS MATERIALIZED (SELECT id, 1.0 AS hub, 1.0 AS auth FROM nodes)"""]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(f"""
ar{t} AS MATERIALIZED (
    SELECT e.dst, sum(s{p}.hub) AS _a
    FROM e JOIN s{p} ON s{p}.id = e.src GROUP BY e.dst
),
a{t} AS MATERIALIZED (
    SELECT nodes.id, coalesce(ar{t}._a, 0.0) AS auth
    FROM nodes LEFT JOIN ar{t} ON ar{t}.dst = nodes.id
),
hr{t} AS MATERIALIZED (
    SELECT e.src, sum(a{t}.auth) AS _h
    FROM e JOIN a{t} ON a{t}.id = e.dst GROUP BY e.src
),
s{t} AS MATERIALIZED (
    SELECT nodes.id, coalesce(hr{t}._h, 0.0) AS hub, a{t}.auth
    FROM nodes JOIN a{t} ON a{t}.id = nodes.id
    LEFT JOIN hr{t} ON hr{t}.src = nodes.id
)""")
    return ("WITH " + ",".join(parts) + f""",
norms AS (SELECT sum(hub) AS hn, sum(auth) AS an FROM s{iterations})
SELECT id AS user_id, round(hub / hn, 6) + 0.0 AS hub,
       round(auth / an, 6) + 0.0 AS auth
FROM s{iterations} CROSS JOIN norms ORDER BY user_id
""")


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    """DuckDB mirror of q_k_core: the synchronous peel unrolled as chained
    CTEs over the undirected view — all-integer degree arithmetic, so the
    result is exact on both engines; the Spark side's early fixpoint exit
    is sound because peeling is monotone (an unchanged keep-count is an
    unchanged keep-set) and extra unrolled rounds are no-ops."""
    parts = [_EDGES_CTE + """,
und AS MATERIALIZED (
    SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e
        UNION ALL
        SELECT dst AS a, src AS b FROM e)
)"""]
    prev = "und"
    for r in range(1, rounds + 1):
        parts.append(f"""
keep{r} AS MATERIALIZED (
    SELECT a FROM {prev} GROUP BY a HAVING count(*) >= {k}
),
al{r} AS MATERIALIZED (
    SELECT t.a, t.b FROM {prev} t
    JOIN keep{r} ka ON t.a = ka.a
    JOIN keep{r} kb ON t.b = kb.a
)""")
        prev = f"al{r}"
    return ("WITH " + ",".join(parts) + f"""
SELECT a AS user_id, CAST(count(*) AS BIGINT) AS degree, true AS in_core
FROM {prev} GROUP BY a HAVING count(*) >= {k}
ORDER BY user_id
""")


def _lpa_oracle(rounds: int = 2) -> str:
    """DuckDB mirror of q_lpa_communities: the synchronous label sweeps
    unrolled as chained CTEs — neighbor-label vote counts and the
    (count desc, label asc) argmax rank, all-integer, so the result is
    exact on both engines."""
    parts = [_EDGES_CTE + """,
und AS MATERIALIZED (
    SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e
        UNION ALL
        SELECT dst AS a, src AS b FROM e)
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS label FROM und)"""]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(f"""
v{k} AS MATERIALIZED (
    SELECT u.a, l.label, count(*) AS _n
    FROM und u JOIN l{p} l ON l.id = u.b
    GROUP BY u.a, l.label
),
l{k} AS MATERIALIZED (
    SELECT a AS id, label FROM (
        SELECT a, label,
               row_number() OVER (PARTITION BY a
                   ORDER BY _n DESC, label) AS _r
        FROM v{k})
    WHERE _r = 1
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT id AS user_id, label FROM l{rounds} ORDER BY user_id
""")


def _bfs_oracle(max_hops: int = 4) -> str:
    """DuckDB mirror of q_bfs_hops: the frontier/settled BFS rounds
    unrolled as chained CTEs from the min-node seed — all-integer; the
    Spark side's empty-frontier early exit is sound because an empty
    frontier makes every later unrolled round a no-op."""
    parts = [_EDGES_CTE + """,
und AS MATERIALIZED (
    SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e
        UNION ALL
        SELECT dst AS a, src AS b FROM e)
),
s0 AS MATERIALIZED (
    SELECT id, CAST(0 AS INT) AS dist FROM (
        SELECT min(id) AS id FROM (
            SELECT src AS id FROM e UNION ALL SELECT dst FROM e))
    WHERE id IS NOT NULL
),
f0 AS MATERIALIZED (SELECT id FROM s0)"""]
    for r in range(1, max_hops + 1):
        p = r - 1
        parts.append(f"""
f{r} AS MATERIALIZED (
    SELECT DISTINCT u.b AS id
    FROM und u JOIN f{p} ON f{p}.id = u.a
    WHERE NOT EXISTS (SELECT 1 FROM s{p} WHERE s{p}.id = u.b)
),
s{r} AS MATERIALIZED (
    SELECT id, dist FROM s{p}
    UNION ALL
    SELECT id, CAST({r} AS INT) AS dist FROM f{r}
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT id AS user_id, dist FROM s{max_hops} ORDER BY user_id
""")


def _active_users_oracle(wau_days: int = 7, mau_days: int = 28) -> str:
    """DuckDB mirror of q_active_users: identical (user, day) collapse,
    per-window offset explode + re-distinct, max-day cut, exact counts,
    one rounded stickiness division."""
    def wc(w, out):
        return f"""
    {out}c AS (
        SELECT day, CAST(count(*) AS BIGINT) AS {out} FROM (
            SELECT DISTINCT u, d + CAST(i AS INT) AS day
            FROM ud, (SELECT unnest(generate_series(0, {w - 1})) AS i)
        ), maxd WHERE day <= m GROUP BY day
    )"""
    return f"""
        WITH ud AS (
            SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        maxd AS (SELECT max(d) AS m FROM ud),
        dauc AS (
            SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
            FROM ud GROUP BY d
        ),{wc(wau_days, "wau")},{wc(mau_days, "mau")}
        SELECT mauc.day,
               CAST(coalesce(dau, 0) AS BIGINT) AS dau,
               CAST(coalesce(wau, 0) AS BIGINT) AS wau,
               mau,
               round(CAST(coalesce(dau, 0) AS DOUBLE)
                     / CAST(mau AS DOUBLE), 6) + 0.0 AS stickiness
        FROM mauc
        LEFT JOIN wauc ON mauc.day = wauc.day
        LEFT JOIN dauc ON mauc.day = dauc.day
        ORDER BY mauc.day
    """


def _ppr_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """DuckDB mirror of q_ppr_related: the personalized power iteration
    unrolled as chained CTEs — seed-indicator teleport (the (1-d) and d
    literals injected via the correctly-rounded VARCHAR->DOUBLE parse so
    0.15000000000000002 matches F.lit(1.0-d) exactly), dangling mass to
    the seed, identical expression ordering."""
    d = f"CAST('{float(damping)!r}' AS DOUBLE)"
    base = f"CAST('{1.0 - float(damping)!r}' AS DOUBLE)"
    parts = [_EDGES_CTE + """,
nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
seedc AS (SELECT min(id) AS s FROM nodes),
outdeg AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
r0 AS MATERIALIZED (
    SELECT id, CASE WHEN id = seedc.s THEN 1.0 ELSE 0.0 END AS rank
    FROM nodes, seedc
)"""]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(f"""
d{k} AS MATERIALIZED (
    SELECT coalesce(sum(rank), 0.0) AS m
    FROM r{p} WHERE NOT EXISTS (
        SELECT 1 FROM outdeg WHERE outdeg.src = r{p}.id)
),
c{k} AS MATERIALIZED (
    SELECT e.dst, sum(r{p}.rank / outdeg.out_deg) AS inflow
    FROM e JOIN r{p} ON r{p}.id = e.src
           JOIN outdeg ON outdeg.src = e.src
    GROUP BY e.dst
),
r{k} AS MATERIALIZED (
    SELECT nodes.id,
           (CASE WHEN nodes.id = seedc.s THEN 1.0 ELSE 0.0 END)
               * ({base} + {d} * d{k}.m)
           + {d} * coalesce(c{k}.inflow, 0.0) AS rank
    FROM nodes
    LEFT JOIN c{k} ON c{k}.dst = nodes.id
    CROSS JOIN seedc CROSS JOIN d{k}
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT id AS user_id, round(rank, 6) + 0.0 AS rank
FROM r{iterations} ORDER BY user_id
""")


_CONFORMAL_SQL = """
    WITH scored AS (
        SELECT abs(CAST(n_chars AS DOUBLE)
                   - 6.1 * CAST(len(string_split(text, ' ')) AS DOUBLE))
                   AS _s,
               doc_id % 2 = 0 AS _c, doc_id AS _id
        FROM documents
    ), cal AS (
        SELECT _s, _id,
               row_number() OVER (ORDER BY _s, _id) AS _r
        FROM scored WHERE _c AND _s IS NOT NULL
    ), nc AS (SELECT CAST(count(*) AS BIGINT) AS n_calib FROM cal),
    q AS (
        SELECT n_calib,
               CAST(least(greatest(((n_calib + 1) * 9 + 10 - 1) // 10, 1),
                          n_calib) AS BIGINT) AS k,
               _s AS q_hat
        FROM cal, nc
        WHERE _r = least(greatest(((n_calib + 1) * 9 + 10 - 1) // 10, 1),
                         n_calib)
    )
    SELECT first(n_calib) AS n_calib, first(k) AS k,
           round(first(q_hat), 6) + 0.0 AS q_hat,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN _s <= q_hat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           round(CASE WHEN count(*) > 0 THEN
                 CAST(sum(CASE WHEN _s <= q_hat THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE) END, 6) + 0.0
               AS coverage
    FROM (SELECT * FROM scored WHERE NOT _c) CROSS JOIN q
"""


def _forecast_eval_oracle() -> str:
    """DuckDB mirror of q_forecast_eval: the _ewma_oracle frame as a CTE,
    the identical lag forecasts, 9-dp decimal error sums, three guarded
    final divisions."""
    return f"""
        WITH ew AS ({_EWMA_ORACLE}),
        l AS (
            SELECT value,
                   lag(ewma) OVER (PARTITION BY user_id ORDER BY event_id)
                       AS _f,
                   lag(value) OVER (PARTITION BY user_id ORDER BY event_id)
                       AS _nv
            FROM ew
        ), rows_ AS (
            SELECT CAST(round(abs(value - _f), 9) AS DECIMAL(15,9)) AS _e,
                   CAST(round(abs(value - _nv), 9) AS DECIMAL(15,9)) AS _ne,
                   CAST(CASE WHEN abs(_f) + abs(value) > 0
                        THEN round(2.0 * abs(value - _f)
                                   / (abs(_f) + abs(value)), 9)
                        ELSE 0.0 END AS DECIMAL(15,9)) AS _sm
            FROM l WHERE _f IS NOT NULL
        ), agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(_e) AS _se, sum(_ne) AS _sne, sum(_sm) AS _ssm
            FROM rows_
        )
        SELECT n,
               round(CASE WHEN n > 0
                     THEN CAST(_se AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
                   + 0.0 AS mae,
               round(CASE WHEN n > 0
                     THEN CAST(_sne AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
                   + 0.0 AS naive_mae,
               round(CASE WHEN CAST(_sne AS DOUBLE) / CAST(n AS DOUBLE) > 0
                     THEN (CAST(_se AS DOUBLE) / CAST(n AS DOUBLE))
                          / (CAST(_sne AS DOUBLE) / CAST(n AS DOUBLE)) END,
                     6) + 0.0 AS mase,
               round(CASE WHEN n > 0
                     THEN CAST(_ssm AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
                   + 0.0 AS smape
        FROM agg
    """


_THEIL_SEN_SQL = """
    WITH pts AS (
        SELECT k, x, v FROM (
            SELECT user_id AS k, event_id AS x, value AS v,
                   count(*) OVER (PARTITION BY user_id) AS _n
            FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL)
        WHERE _n <= 500 AND _n >= 2
    ), pairs AS (
        SELECT a.k, a.x AS xi, b.x AS xj,
               (b.v - a.v) / CAST(b.x - a.x AS DOUBLE) AS _s
        FROM pts a JOIN pts b ON a.k = b.k AND a.x < b.x
    ), ranked AS (
        SELECT k, _s,
               row_number() OVER (PARTITION BY k ORDER BY _s, xi, xj)
                   AS _r,
               CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS _np
        FROM pairs
    ), med AS (
        SELECT k, _s, _np FROM ranked WHERE _r = (_np + 1) // 2
    ), counts AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n_points
        FROM pts GROUP BY k
    )
    SELECT med.k AS user_id, n_points, _np AS n_pairs,
           round(_s, 6) + 0.0 AS theil_slope
    FROM med JOIN counts ON med.k = counts.k
    ORDER BY user_id
"""


_BLEU_SQL = """
    WITH cands AS (
        SELECT doc_id - 1 AS _id, string_split(lower(text), ' ') AS ct
        FROM documents WHERE doc_id % 2 = 1
    ), refs AS (
        SELECT doc_id AS _id, string_split(lower(text), ' ') AS rt
        FROM documents WHERE doc_id % 2 = 0
    ), paired AS (
        SELECT c._id, ct, rt FROM cands c JOIN refs r ON c._id = r._id
    ), cc1 AS (
        SELECT _id, g, count(*) AS _c FROM (
            SELECT _id, unnest(ct) AS g FROM paired) GROUP BY _id, g
    ), rc1 AS (
        SELECT _id, g, count(*) AS _r FROM (
            SELECT _id, unnest(rt) AS g FROM paired) GROUP BY _id, g
    ), m1t AS (
        SELECT CAST(coalesce(sum(least(_c, _r)), 0) AS BIGINT) AS m1
        FROM cc1 JOIN rc1 USING (_id, g)
    ), cc2 AS (
        SELECT _id, w1 || chr(31) || w2 AS g, count(*) AS _c FROM (
            SELECT _id, unnest(ct[1 : len(ct) - 1]) AS w1,
                        unnest(ct[2 : len(ct)]) AS w2
            FROM paired WHERE len(ct) >= 2) GROUP BY _id, g
    ), rc2 AS (
        SELECT _id, w1 || chr(31) || w2 AS g, count(*) AS _r FROM (
            SELECT _id, unnest(rt[1 : len(rt) - 1]) AS w1,
                        unnest(rt[2 : len(rt)]) AS w2
            FROM paired WHERE len(rt) >= 2) GROUP BY _id, g
    ), m2t AS (
        SELECT CAST(coalesce(sum(least(_c, _r)), 0) AS BIGINT) AS m2
        FROM cc2 JOIN rc2 USING (_id, g)
    ), lens AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(len(ct)) AS BIGINT) AS d1,
               CAST(sum(greatest(len(ct) - 1, 0)) AS BIGINT) AS d2,
               CAST(sum(len(rt)) AS BIGINT) AS r_len
        FROM paired
    )
    SELECT n_pairs, m1, d1, m2, d2,
           round(CASE WHEN d1 >= r_len THEN 1.0
                 ELSE exp(1.0 - CAST(r_len AS DOUBLE)
                          / CAST(d1 AS DOUBLE)) END, 6) + 0.0 AS bp,
           round(CASE WHEN d1 > 0
                 THEN CAST(m1 AS DOUBLE) / CAST(d1 AS DOUBLE) END, 6)
               + 0.0 AS p1,
           round(CASE WHEN d2 > 0
                 THEN CAST(m2 AS DOUBLE) / CAST(d2 AS DOUBLE) END, 6)
               + 0.0 AS p2,
           round((CASE WHEN d1 >= r_len THEN 1.0
                  ELSE exp(1.0 - CAST(r_len AS DOUBLE)
                           / CAST(d1 AS DOUBLE)) END)
                 * sqrt((CASE WHEN d1 > 0 THEN CAST(m1 AS DOUBLE)
                              / CAST(d1 AS DOUBLE) END)
                        * (CASE WHEN d2 > 0 THEN CAST(m2 AS DOUBLE)
                               / CAST(d2 AS DOUBLE) END)), 6)
               + 0.0 AS bleu2
    FROM lens CROSS JOIN m1t CROSS JOIN m2t
"""


def _bt_oracle(iterations: int = 3) -> str:
    """DuckDB mirror of q_elo_ratings: the canonical-pair aggregate,
    add-half smoothing, and ``iterations`` unrolled Hunter-2004 MM steps
    (each = endpoint joins + per-model denominator sum + mean-1
    renormalization), chained CTEs in the _hits_oracle/_pagerank_oracle
    style. Per-model sums run over <= |models|-1 pair terms, so float
    association drift is ~1e-16 relative — absorbed by the 6-dp round."""
    head = """
        WITH g AS (
            SELECT concat('m', CAST(doc_id % 8 AS VARCHAR)) AS a,
                   concat('m', CAST((doc_id % 8 + 1 + (doc_id // 8) % 7) % 8
                                    AS VARCHAR)) AS b,
                   CAST(length(text) % 3 AS DOUBLE) AS wa,
                   CAST(doc_id % 2 AS DOUBLE) AS wb
            FROM documents WHERE text IS NOT NULL
        ), p2 AS (
            SELECT lo, hi, rw_lo, rw_hi,
                   rw_lo + 0.5 AS w_lo, rw_hi + 0.5 AS w_hi,
                   rw_lo + rw_hi + 1.0 AS n
            FROM (
                SELECT least(a, b) AS lo, greatest(a, b) AS hi,
                       sum(CASE WHEN a <= b THEN wa ELSE wb END) AS rw_lo,
                       sum(CASE WHEN a <= b THEN wb ELSE wa END) AS rw_hi
                FROM g WHERE a <> b GROUP BY 1, 2)
        ), totals AS (
            SELECT model, sum(w) AS wins, sum(gms) AS games,
                   sum(w) + 0.5 * count(*) AS w_sm
            FROM (SELECT lo AS model, rw_lo AS w, rw_lo + rw_hi AS gms
                  FROM p2
                  UNION ALL
                  SELECT hi, rw_hi, rw_lo + rw_hi FROM p2)
            GROUP BY model
        ), r0 AS (SELECT model, 1.0 AS rating FROM totals)"""
    parts = [head]
    for i in range(1, iterations + 1):
        parts.append(f""", j{i} AS (
            SELECT p2.lo, p2.hi, p2.n, rl.rating AS r_lo, rh.rating AS r_hi
            FROM p2 JOIN r{i - 1} rl ON p2.lo = rl.model
                    JOIN r{i - 1} rh ON p2.hi = rh.model
        ), d{i} AS (
            SELECT model, sum(c) AS den FROM (
                SELECT lo AS model, n / (r_lo + r_hi) AS c FROM j{i}
                UNION ALL
                SELECT hi, n / (r_lo + r_hi) FROM j{i})
            GROUP BY model
        ), raw{i} AS (
            SELECT t.model, t.w_sm / d.den AS p
            FROM totals t JOIN d{i} d USING (model)
        ), r{i} AS (
            SELECT model, p / (SELECT avg(p) FROM raw{i}) AS rating
            FROM raw{i}
        )""")
    parts.append(f"""
        SELECT t.model, round(r{iterations}.rating, 6) + 0.0 AS rating,
               t.wins, t.games
        FROM totals t JOIN r{iterations} USING (model)
        ORDER BY t.model""")
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    # quantized-ANN query literals: same int8 quantization of the synthetic
    # query vector as q_quantized_ann (pure python — deterministic), embedded
    # as exact int literals + the shortest-roundtrip repr of the query norm
    # (repr(float) parses back to the identical double in DuckDB).
    _qvec = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    _amax = max(abs(v) for v in _qvec)
    _qscale = 127.0 / _amax if _amax > 0 else 0.0
    import math as _math
    _qq = [int(_math.floor(v * _qscale + 0.5)) for v in _qvec]
    _qn = _math.sqrt(sum(v * v for v in _qq))
    _qq_sql = "[" + ", ".join(str(v) for v in _qq) + "]"
    return {
        "sample_nth": """
            SELECT event_id, user_id, event_type, value
            FROM events WHERE event_id % 10 = 0
        """,
        "sample_step": """
            SELECT event_id, user_id, value
            FROM events
            WHERE (((event_id * 48271) % 65536) + 65536) % 65536 < 6553
        """,
        "motif_search": _motif_oracle(),
        "cohen_kappa": _KAPPA_SQL,
        "wilson_rank": _wilson_oracle(),
        "f1_threshold_sweep": _F1_SWEEP_SQL,
        "mrr_eval": _mrr_oracle(),
        "item_cf_recs": _item_cf_oracle(),
        "hits_scores": _hits_oracle(),
        "k_core": _kcore_oracle(),
        "lpa_communities": _lpa_oracle(),
        "bfs_hops": _bfs_oracle(),
        "active_users": _active_users_oracle(),
        "ppr_related": _ppr_oracle(),
        "conformal_interval": _CONFORMAL_SQL,
        "forecast_eval": _forecast_eval_oracle(),
        "theil_sen": _THEIL_SEN_SQL,
        "bleu_eval": _BLEU_SQL,
        "sample_step_replay": """
            WITH RECURSIVE tgt(i, pos) AS (
                SELECT 1, ((1 * 48271) % 65536) % 40 + 1
                UNION ALL
                SELECT i + 1,
                       pos + ((((i + 1) * 48271) % 65536) % 40) + 1
                FROM tgt
                WHERE pos <= (SELECT count(*) FROM events)
            ), r AS (
                SELECT event_id, user_id, value,
                       row_number() OVER (ORDER BY event_id) AS rn
                FROM events
            )
            SELECT event_id, user_id, value
            FROM r JOIN tgt ON r.rn = tgt.pos
        """,
        "partition_with": """
            SELECT event_id,
                   CASE WHEN value >= 100 THEN 0 ELSE 1 END AS side,
                   CASE WHEN value >= 100 THEN value * 2 END AS left_val,
                   CASE WHEN value < 100 THEN upper(event_type) END AS right_tag
            FROM events
        """,
        "pass_through": """
            SELECT event_id, user_id, event_type, value,
                   event_type || ':' || CAST(user_id AS VARCHAR) AS out_tag
            FROM events
        """,
        "delay_flow": """
            SELECT event_id, ts,
                   ts + to_seconds(((CAST(floor(value) AS BIGINT) % 10) + 10) % 10) AS deliver_ts
            FROM events
        """,
        "accumulate": """
            SELECT event_id,
                   CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER (ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_sum
            FROM events
        """,
        "accumulate_keyed": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
            FROM events
        """,
        "accumulate_while_unchanged": """
            WITH marked AS (
                SELECT *, CASE WHEN lag(event_type) OVER (ORDER BY event_id) IS NULL
                                 OR event_type <> lag(event_type) OVER (ORDER BY event_id)
                               THEN 1 ELSE 0 END AS chg
                FROM events
            ), runs AS (
                SELECT *, sum(chg) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM marked
            )
            SELECT CAST(grp AS BIGINT) AS grp, event_type, count(*) AS cnt,
                   CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value,
                   min(event_id) AS first_seq
            FROM runs GROUP BY grp, event_type
        """,
        "last_element": """
            SELECT event_id, user_id, event_type, value
            FROM events WHERE event_id = (SELECT max(event_id) FROM events)
        """,
        "timed_interval_between": """
            SELECT event_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (ORDER BY event_id) AS interval_us
            FROM events WHERE event_type = 'click'
        """,
        "time_window": """
            SELECT count(*) AS cnt,
                   CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value,
                   date_trunc('hour', ts) AS window_start
            FROM events GROUP BY window_start
        """,
        "sliding_window": """
            WITH b AS (
                SELECT time_bucket(INTERVAL '30 minutes', ts) AS tb, value FROM events
            )
            SELECT count(*) AS cnt,
                   CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value,
                   tb - k * INTERVAL '30 minutes' AS window_start
            FROM b CROSS JOIN (VALUES (0), (1)) t(k)
            GROUP BY window_start
        """,
        "session_window": """
            WITH marked AS (
                SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                               THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sessions AS (
                SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
            )
            SELECT user_id, min(ts) AS session_start, count(*) AS cnt,
                   CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
            FROM sessions GROUP BY user_id, sid
        """,
        "rate_limiter": """
            WITH positioned AS (
                SELECT *, time_bucket(INTERVAL '1 minute', ts) AS bucket_start,
                       row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 minute', ts)
                                          ORDER BY event_id) AS rn
                FROM events
            )
            SELECT bucket_start, (rn - 1) // 50 AS batch_no, count(*) AS batch_size,
                   min(event_id) AS first_seq, max(event_id) AS last_seq
            FROM positioned GROUP BY bucket_start, batch_no
        """,
        "pulse": """
            WITH ranked AS (
                SELECT *, time_bucket(INTERVAL '1 minute', ts) AS bucket_start,
                       row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 minute', ts)
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            )
            SELECT bucket_start, event_id, value FROM ranked WHERE rn = 1
        """,
        "keep_alive": """
            WITH nexted AS (
                SELECT user_id, ts, value,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS next_ts
                FROM events
            )
            SELECT user_id, ts, value, FALSE AS is_heartbeat FROM nexted
            UNION ALL
            SELECT n.user_id, g.hb AS ts, n.value, TRUE AS is_heartbeat
            FROM nexted n, LATERAL (
                SELECT unnest(generate_series(n.ts + INTERVAL '21600 seconds',
                                              n.next_ts - INTERVAL '1 microsecond',
                                              INTERVAL '21600 seconds')) AS hb
            ) g
            WHERE n.next_ts IS NOT NULL
        """,
        "merge_by_index": """
            SELECT event_id, CAST(((event_id % 3) + 3) % 3 AS INT) AS branch,
                   row_number() OVER (ORDER BY event_id) AS rnk
            FROM events
        """,
        "token_throttle": """
            WITH costed AS (
                SELECT event_id,
                       CAST(((CAST(floor(value) AS BIGINT) % 5) + 5) % 5 + 1 AS BIGINT) AS cost
                FROM events
            ), cum AS (
                SELECT event_id, cost,
                       CAST(sum(cost) OVER (ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost
                FROM costed
            )
            SELECT event_id, cost, cum_cost FROM cum WHERE cum_cost <= 15000
        """,
        "token_throttle_keyed": """
            WITH costed AS (
                SELECT event_id, user_id,
                       CAST(((CAST(floor(value) AS BIGINT) % 5) + 5) % 5 + 1 AS BIGINT) AS cost
                FROM events
            ), cum AS (
                SELECT event_id, user_id, cost,
                       CAST(sum(cost) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost
                FROM costed
            )
            SELECT event_id, user_id, cost, cum_cost FROM cum WHERE cum_cost <= 200
        """,
        "retry_concat_split": """
            WITH RECURSIVE s AS (
                SELECT event_id, CAST(floor(value) AS BIGINT) AS v, 1 AS attempts
                FROM events
                UNION ALL
                SELECT event_id,
                       CASE WHEN t.k = 0 THEN v // 2 ELSE v - v // 2 END AS v,
                       attempts + 1
                FROM s CROSS JOIN (VALUES (0), (1)) t(k)
                WHERE v > 100
            )
            SELECT event_id, v AS value, attempts FROM s WHERE v <= 100
        """,
        "unfold_flow_with": """
            SELECT seed, CAST(j - 1 AS INT) AS step,
                   CAST(seed * power(2, j) AS BIGINT) AS value
            FROM (SELECT unnest(generate_series(1, 100)) AS seed) s
            CROSS JOIN (SELECT unnest(generate_series(1, 14)) AS j) js
            WHERE seed * power(2, j) <= 10000
        """,
        "retry": """
            SELECT event_id,
                   CASE WHEN ((event_id % 2) + 2) % 2 = 1 THEN TRUE
                        WHEN event_id < 500 THEN TRUE ELSE FALSE END AS ok,
                   CASE WHEN ((event_id % 2) + 2) % 2 = 1 THEN event_id + 1
                        WHEN event_id < 500 THEN event_id + 2 END AS value,
                   CASE WHEN ((event_id % 2) + 2) % 2 = 1 THEN 1
                        WHEN event_id < 500 THEN 2 ELSE 1 END AS attempts
            FROM events
        """,
        "unfold_collatz": """
            WITH RECURSIVE c(seed, step, value) AS (
                SELECT s.seed, -1, s.seed
                FROM (SELECT unnest(generate_series(1, 100)) AS seed) s
                UNION ALL
                SELECT seed, step + 1,
                       CASE WHEN value % 2 = 0 THEN value // 2 ELSE 3 * value + 1 END
                FROM c WHERE value > 1
            )
            SELECT seed, CAST(step AS INT) AS step, value FROM c WHERE step >= 0
        """,
        "feedback_fibonacci": """
            WITH RECURSIVE f(n, a, b) AS (
                SELECT 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
                UNION ALL
                SELECT n + 1, b, a + b FROM f WHERE n < 39
            )
            SELECT n, a AS fib FROM f
        """,
        "reservoir_sample": """
            SELECT event_id, user_id, event_type FROM (
                SELECT event_id, user_id, event_type,
                       ((((event_id % 2147483648) + 2147483648) % 2147483648)
                        * 2654435761) % 2147483648 AS _rk
                FROM events)
            ORDER BY _rk, event_id
            LIMIT 500
        """,
        "triangle_count": """
            WITH e0 AS (
                SELECT lag(user_id) OVER (
                           PARTITION BY date_trunc('hour', ts)
                           ORDER BY event_id) AS src,
                       user_id AS dst
                FROM events),
            edges AS (SELECT src, dst FROM e0
                      WHERE src IS NOT NULL AND src <> dst),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM edges WHERE src <> dst),
            deg AS (SELECT v, count(*) AS d FROM (
                        SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
                    GROUP BY v),
            oriented AS (
                SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                            THEN a ELSE b END AS lo,
                       CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                            THEN b ELSE a END AS hi
                FROM und
                JOIN deg da ON a = da.v
                JOIN deg db ON b = db.v),
            wedges AS (
                SELECT e1.lo AS u, e1.hi AS w1, e2.hi AS w2
                FROM oriented e1 JOIN oriented e2
                  ON e1.lo = e2.lo AND e1.hi < e2.hi)
            SELECT (SELECT count(*) FROM wedges) AS n_wedges,
                   (SELECT count(*) FROM wedges w
                    WHERE EXISTS (SELECT 1 FROM und
                                  WHERE a = w.w1 AND b = w.w2)) AS n_triangles
        """,
        "robust_scale": """
            WITH med AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.5), 6) AS median
                FROM events GROUP BY event_type
            ), mad AS (
                SELECT e.event_type, median,
                       round(quantile_cont(abs(value - median), 0.5), 6)
                           AS mad
                FROM events e JOIN med USING (event_type)
                GROUP BY e.event_type, median
            )
            SELECT event_id, e.event_type, value, median, mad,
                   round(CASE WHEN mad > 0 THEN (value - median)
                              / (CAST('1.4826' AS DOUBLE) * mad) END, 6)
                       + 0.0 AS robust_z
            FROM events e JOIN mad USING (event_type)
        """,
        "frequent_journeys": """
            WITH s AS (
                SELECT user_id,
                       list(event_type ORDER BY event_id, event_type) AS l
                FROM events
                WHERE event_id IS NOT NULL AND event_type IS NOT NULL
                GROUP BY user_id
                HAVING count(*) <= 1000
            ),
            g AS (
                SELECT array_to_string(l[i:i+2], '>') AS journey
                FROM s, LATERAL (
                    SELECT unnest(range(1, len(l) - 1)) AS i) t
                WHERE len(l) >= 3
            )
            SELECT journey, CAST(count(*) AS BIGINT) AS n
            FROM g GROUP BY journey
            ORDER BY n DESC, journey
            LIMIT 20
        """,
        "hll_overlap": """
            WITH du AS (
                SELECT DISTINCT event_type, user_id FROM events),
            per AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
                FROM du GROUP BY event_type),
            inter AS (
                SELECT a.event_type AS k_a, b.event_type AS k_b,
                       CAST(count(*) AS BIGINT) AS exact_overlap
                FROM du a JOIN du b
                  ON a.user_id = b.user_id AND a.event_type < b.event_type
                GROUP BY a.event_type, b.event_type)
            SELECT k_a, k_b, pa.exact_n AS exact_a, pb.exact_n AS exact_b,
                   exact_overlap, TRUE AS est_ok
            FROM inter
            JOIN per pa ON pa.event_type = k_a
            JOIN per pb ON pb.event_type = k_b
            ORDER BY k_a, k_b
        """,
        "grouped_split": """
            SELECT event_id, user_id,
                   CASE WHEN CAST(concat('0x',
                             substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                             AS BIGINT) % 100 < 80 THEN 'train'
                        WHEN CAST(concat('0x',
                             substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                             AS BIGINT) % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM events
        """,
        "purged_time_split": """
            WITH b AS (
                SELECT min(epoch_us(ts)) AS _lo, max(epoch_us(ts)) AS _hi
                FROM events)
            SELECT event_id,
                   CASE WHEN ts IS NULL THEN NULL
                        WHEN epoch_us(ts) <= _lo + CAST(floor(
                             CAST(_hi - _lo AS DOUBLE)
                             * CAST('0.7' AS DOUBLE)) AS BIGINT)
                        THEN 'train'
                        WHEN epoch_us(ts) <= _lo + CAST(floor(
                             CAST(_hi - _lo AS DOUBLE)
                             * CAST('0.7999999999999999' AS DOUBLE)) AS BIGINT)
                        THEN 'embargo'
                        ELSE 'test' END AS split
            FROM events CROSS JOIN b
        """,
        "adamic_adar": """
            WITH e0 AS (
                SELECT lag(user_id) OVER (
                           PARTITION BY date_trunc('hour', ts)
                           ORDER BY event_id) AS src,
                       user_id AS dst
                FROM events),
            edges AS (SELECT src, dst FROM e0
                      WHERE src IS NOT NULL AND src <> dst),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM edges),
            nbrs AS (SELECT a AS v, b AS n FROM und
                     UNION ALL SELECT b AS v, a AS n FROM und),
            deg AS (SELECT v, count(*) AS d FROM nbrs GROUP BY v),
            ctr AS (SELECT v,
                           CAST(round(1.0 / ln(d), 9) AS DECIMAL(28,9)) AS term
                    FROM deg WHERE d >= 2 AND d <= 200),
            pairs AS (
                SELECT n1.n AS x, n2.n AS y, ctr.term
                FROM nbrs n1
                JOIN nbrs n2 ON n1.v = n2.v AND n1.n < n2.n
                JOIN ctr ON ctr.v = n1.v),
            agg AS (
                SELECT x, y, CAST(count(*) AS BIGINT) AS n_common,
                       sum(term) AS _aa
                FROM pairs GROUP BY x, y),
            cand AS (
                SELECT * FROM agg
                WHERE NOT EXISTS (SELECT 1 FROM und
                                  WHERE a = agg.x AND b = agg.y))
            SELECT x, y, n_common,
                   round(CAST(_aa AS DOUBLE), 6) + 0.0 AS adamic_adar
            FROM cand
            ORDER BY adamic_adar DESC, x, y
            LIMIT 50
        """,
        "readability_scores": """
            WITH c AS (
                SELECT doc_id,
                       len(string_split_regex(trim(lower(text)), ' +')) AS n_words,
                       greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1)
                           AS n_sentences,
                       len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg
                FROM documents)
            SELECT doc_id, n_words, n_sentences,
                   greatest(vg, n_words) AS n_syllables,
                   floor((CAST(206.835 AS DOUBLE)
                          - CAST(1.015 AS DOUBLE) * n_words / n_sentences
                          - CAST(84.6 AS DOUBLE) * greatest(vg, n_words)
                            / n_words)
                         * 10000.0 + 0.5) / 10000.0 AS flesch
            FROM c
        """,
        "pmi_collocations": """
            WITH toks AS (
                SELECT string_split(lower(text), ' ') AS t FROM documents),
            bg AS (
                SELECT unnest(t[1 : len(t) - 1]) AS w1,
                       unnest(t[2 : len(t)]) AS w2
                FROM toks WHERE len(t) >= 2),
            pc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
            hc AS (SELECT w1, count(*) AS _c1 FROM bg GROUP BY 1),
            tc AS (SELECT w2, count(*) AS _c2 FROM bg GROUP BY 1),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS _n FROM bg)
            SELECT pc.w1, pc.w2, c12,
                   round(ln(c12 * _n / (_c1 * _c2)), 6) AS pmi
            FROM pc
            JOIN hc ON pc.w1 = hc.w1
            JOIN tc ON pc.w2 = tc.w2
            CROSS JOIN n
            WHERE c12 >= 5
            ORDER BY pmi DESC, pc.w1, pc.w2
            LIMIT 50
        """,
        "bpe_pair_counts": """
            WITH words AS (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            ), wf AS (
                SELECT w, count(*) AS f FROM words
                WHERE len(w) >= 2 GROUP BY w
            ), pairs AS (
                SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, f
                FROM (SELECT w, f, unnest(generate_series(1, len(w) - 1)) AS i
                      FROM wf)
            )
            SELECT a, b, CAST(sum(f) AS BIGINT) AS pair_count
            FROM pairs GROUP BY a, b
            ORDER BY pair_count DESC, a, b
            LIMIT 20
        """,
        "interpolate_linear": """
            WITH bounds AS (
                SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS mn,
                       max(ts) AS mx
                FROM events GROUP BY user_id),
            grid AS (
                SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS ts
                FROM bounds),
            unioned AS (
                SELECT user_id, ts, CAST(value AS DOUBLE) AS v, 0 AS _src FROM events
                UNION ALL
                SELECT user_id, ts, NULL, 1 FROM grid),
            marked AS (
                SELECT user_id, ts, _src,
                       last_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, _src
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                       last_value(CASE WHEN _src = 0 THEN ts END IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, _src
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
                       first_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, _src
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                       first_value(CASE WHEN _src = 0 THEN ts END IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, _src
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
                FROM unioned)
            SELECT user_id, ts AS grid_ts,
                   round(CASE WHEN pt IS NULL THEN nv
                              WHEN nt IS NULL THEN pv
                              WHEN nt = pt THEN pv
                              ELSE pv + (epoch_us(ts) - epoch_us(pt))
                                        / (CAST(epoch_us(nt) AS DOUBLE)
                                           - epoch_us(pt)) * (nv - pv)
                         END, 6) AS value_interp
            FROM marked WHERE _src = 1
        """,
        "q2_min_cost_supplier": """
            WITH """ + _PS_SQL + """,
            eur AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
            cand AS (
              SELECT l_partkey, ps_cost, s_name, s_acctbal, n_name,
                     min(ps_cost) OVER (PARTITION BY l_partkey) AS min_cost
              FROM partsupp_v JOIN eur ON l_suppkey = s_suppkey)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                   CAST(ps_cost AS DOUBLE) AS supplycost
            FROM cand JOIN part ON l_partkey = p_partkey
            WHERE ps_cost = min_cost AND p_size <= 10 AND p_type = 'SMALL'
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "q9_product_profit": """
            WITH li AS (
              SELECT * FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')),
            ps AS (
              SELECT l_partkey AS _pk, l_suppkey AS _sk,
                     min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_cost
              FROM li GROUP BY 1, 2)
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))
                            - ps_cost * CAST(l_quantity AS DECIMAL(12,2)))
                        AS DOUBLE) AS sum_profit
            FROM li
            JOIN ps ON l_partkey = _pk AND l_suppkey = _sk
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        "q11_important_stock": """
            WITH """ + _PS_SQL + """,
            asia AS (
              SELECT s_suppkey FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'),
            per_part AS (
              SELECT l_partkey, sum(ps_cost * ps_avail) AS _value
              FROM partsupp_v JOIN asia ON l_suppkey = s_suppkey
              GROUP BY 1)
            SELECT l_partkey AS ps_partkey, CAST(_value AS DOUBLE) AS stock_value
            FROM per_part
            WHERE _value * 2000 > (SELECT sum(_value) FROM per_part)
        """,
        "q16_supplier_part_counts": """
            WITH """ + _PS_SQL + """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM partsupp_v JOIN part ON l_partkey = p_partkey
            WHERE p_type <> 'PROMO'
              AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
              AND NOT EXISTS
                  (SELECT 1 FROM supplier
                   WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
            GROUP BY 1, 2, 3
        """,
        "q20_promotion_suppliers": """
            WITH li AS (
              SELECT * FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')),
            avail AS (
              SELECT l_partkey, l_suppkey,
                     sum(CAST(l_quantity AS DECIMAL(12,2))) AS ps_avail
              FROM li GROUP BY 1, 2),
            shipped AS (
              SELECT l_partkey AS _pk, l_suppkey AS _sk,
                     sum(CAST(l_quantity AS DECIMAL(12,2))) AS _sh
              FROM li WHERE year(l_shipdate) = 1997 GROUP BY 1, 2),
            qual AS (
              SELECT DISTINCT l_suppkey AS _qs
              FROM avail JOIN shipped ON l_partkey = _pk AND l_suppkey = _sk
              WHERE ps_avail * 2 > _sh)
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            JOIN qual ON s_suppkey = _qs
            WHERE r_name = 'AMERICA'
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
                   count(*) AS count_order,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-06-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "q6_forecast_revenue": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
            FROM lineitem, orders, customer, nation
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n_nationkey
              AND l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
        """,
        "q12_priority_shipping": """
            SELECT year(l_shipdate) AS ship_year,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY year(l_shipdate)
        """,
        "q14_promo_revenue": """
            SELECT round((100.0 * _promo) / _total, 6) AS promo_pct FROM (
                SELECT
                    CAST(sum(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS _promo,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS _total
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-09-01'
                  AND l_shipdate < TIMESTAMP '1996-10-01')
        """,
        "q17_small_qty_revenue": """
            WITH b AS (
                SELECT l_partkey AS _pk,
                       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS _avg_qty
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#6'
                GROUP BY l_partkey)
            SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN b ON l_partkey = _pk
            WHERE p_brand = 'Brand#6' AND l_quantity < 0.2 * _avg_qty
        """,
        "q18_large_orders": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
            FROM orders
            JOIN (SELECT l_orderkey AS _ok,
                         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300) big
              ON o_orderkey = _ok
            JOIN customer ON o_custkey = c_custkey
        """,
        "q19_disjunctive_revenue": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 30)
               OR (p_brand = 'Brand#16' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 10 AND 40)
        """,
        "q22_idle_balance": """
            SELECT c_nationkey, count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                               FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
        """,
        "q7_nation_volume": """
            SELECT supp_nation, cust_nation, l_year,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
            FROM (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                       year(l_shipdate) AS l_year, l_extendedprice, l_discount
                FROM supplier, lineitem, orders, customer, nation n1, nation n2
                WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
                  AND c_nationkey = n2.n_nationkey
                  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01')
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "q8_market_share": """
            SELECT o_year, round(_nat / _tot, 6) AS mkt_share FROM (
                SELECT year(o_orderdate) AS o_year,
                       CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS _nat,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS _tot
                FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
                WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
                  AND o_custkey = c_custkey AND l_suppkey = s_suppkey
                  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
                  AND s_nationkey = n2.n_nationkey
                  AND r_name = 'ASIA' AND p_type = 'PROMO'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
                GROUP BY year(o_orderdate))
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN rev ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q13_order_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT OUTER JOIN orders
                    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
                  GROUP BY c_custkey)
            GROUP BY c_count
        """,
        "q21_waiting_supplier": """
            SELECT s_name, count(*) AS numwait
            FROM lineitem l1
            JOIN orders ON l1.l_orderkey = o_orderkey
            JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
            GROUP BY s_name
        """,
        "customers_retained": """
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        """,
        "customers_churned": """
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            EXCEPT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                   CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                   count(*) AS cnt,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "range_join_follows": """
            SELECT a.event_id, count(*) AS n_follow
            FROM events a JOIN events b
              ON b.user_id = a.user_id
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
            WHERE a.event_type = 'error'
            GROUP BY a.event_id
        """,
        "url_domain_stats": """
            WITH u AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN 'HTTPS://' || source || '.Example.COM/'
                            ELSE 'https://www.' || source || '.example.com/'
                                 || lang || '/' || CAST(doc_id AS VARCHAR)
                                 || CASE WHEN doc_id % 3 = 0
                                         THEN '#frag' ELSE '' END
                       END AS url
                FROM documents
            ), p AS (
                SELECT doc_id, url,
                       lower(regexp_extract(url,
                           '^[a-zA-Z]+://([^/?#]+)', 1)) AS host,
                       regexp_replace(url, '#.*$', '') AS _nf
                FROM u
            ), n AS (
                SELECT doc_id, host,
                       CASE WHEN regexp_matches(host, '^[0-9.]+$')
                                 OR NOT contains(host, '.')
                            THEN host
                            ELSE regexp_extract(host,
                                '([^.]+\\.[^.]+)$', 1) END AS reg_domain,
                       regexp_replace(
                           lower(regexp_extract(_nf,
                               '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
                           || regexp_replace(_nf,
                               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                           '^([a-z][a-z0-9+.-]*://[^/?#]+)/$', '\\1')
                           AS norm_url
                FROM p
            )
            SELECT host, reg_domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT norm_url) AS BIGINT) AS n_norm,
                   min(doc_id) AS first_doc
            FROM n GROUP BY host, reg_domain
        """,
        "attribution_window_join": """
            SELECT l.user_id, l.imp_id, l.imp_ts, r.clk_id, r.clk_ts
            FROM (SELECT user_id, event_id AS imp_id, ts AS imp_ts
                  FROM events WHERE event_type = 'view') l
            JOIN (SELECT user_id, event_id AS clk_id, ts AS clk_ts
                  FROM events WHERE event_type = 'click') r
              ON r.user_id = l.user_id
             AND r.clk_ts >= l.imp_ts
             AND r.clk_ts <= l.imp_ts + INTERVAL 1 HOUR
        """,
        "string_funcs": """
            SELECT p_partkey,
                   upper(p_brand) AS u_brand,
                   lower(p_type) AS l_type,
                   length(p_name) AS name_len,
                   substring(p_name, 1, 8) AS name_prefix,
                   concat_ws('-', p_brand, p_type) AS brand_type,
                   lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
                   replace(p_name, ' ', '_') AS name_snake,
                   reverse(p_brand) AS brand_rev
            FROM part
        """,
        "date_parts": """
            SELECT o_orderkey,
                   year(o_orderdate) AS o_year,
                   quarter(o_orderdate) AS o_quarter,
                   month(o_orderdate) AS o_month,
                   day(o_orderdate) AS o_day,
                   last_day(CAST(o_orderdate AS DATE)) AS month_end,
                   date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch95
            FROM orders
        """,
        "window_breadth": """
            SELECT o_custkey, o_orderkey,
                   lag(o_totalprice) OVER w AS prev_price,
                   lead(o_totalprice) OVER w AS next_price,
                   ntile(4) OVER w AS quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cum_dist,
                   first_value(o_totalprice) OVER w AS first_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
                   round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
                   round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "array_agg_events": """
            SELECT user_id,
                   len(vals) AS n_events,
                   array_to_string(list_transform(vals[1:3], x -> printf('%.2f', x)), ',') AS first3,
                   list_min(vals) AS v_min,
                   list_max(vals) AS v_max
            FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                  FROM events GROUP BY user_id)
        """,
        "pivot_revenue": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN l_linestatus = 'F'
                                 THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
                   CAST(sum(CASE WHEN l_linestatus = 'O'
                                 THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
            FROM lineitem GROUP BY l_returnflag
        """,
        "posexplode_tokens": """
            SELECT doc_id, i - 1 AS pos, toks[i] AS token
            FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
                  FROM documents)
            WHERE i - 1 < 5
        """,
        "user_correlation": """
            WITH daily AS (
                SELECT user_id, date_trunc('day', ts) AS _day,
                       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS _ds
                FROM events GROUP BY user_id, date_trunc('day', ts)),
            stats AS (
                SELECT a.user_id AS user_a, b.user_id AS user_b,
                       count(*) AS n_days,
                       CAST(sum(a._ds) AS DOUBLE) AS _sx,
                       CAST(sum(b._ds) AS DOUBLE) AS _sy,
                       CAST(sum(a._ds * b._ds) AS DOUBLE) AS _sxy,
                       CAST(sum(a._ds * a._ds) AS DOUBLE) AS _sxx,
                       CAST(sum(b._ds * b._ds) AS DOUBLE) AS _syy
                FROM daily a JOIN daily b
                  ON a._day = b._day AND a.user_id < b.user_id
                GROUP BY a.user_id, b.user_id
                HAVING count(*) >= 10)
            SELECT user_a, user_b, n_days,
                   round((CAST(n_days AS DOUBLE) * _sxy - _sx * _sy)
                         / sqrt((CAST(n_days AS DOUBLE) * _sxx - _sx * _sx)
                                * (CAST(n_days AS DOUBLE) * _syy - _sy * _sy)), 6)
                   + 0.0 AS corr
            FROM stats
        """,
        "lang_confusion": """
            WITH p AS (
                SELECT doc_id,
                       CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
                            WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS predicted_lang
                FROM (SELECT doc_id,
                             len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) AS score_en,
                             len(list_filter(string_split(text,' '), x -> x IN ('der','die','das'))) AS score_de,
                             len(list_filter(string_split(text,' '), x -> x IN ('el','la','los'))) AS score_es
                      FROM documents))
            SELECT d.lang, p.predicted_lang, count(*) AS n
            FROM documents d JOIN p USING (doc_id)
            GROUP BY d.lang, p.predicted_lang
        """,
        "knn_label_vote": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            c AS (
                SELECT e.vec_id,
                       list_sum(list_transform(generate_series(1, len(e.embedding)),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(q.qe,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
                FROM embeddings e, q WHERE e.vec_id <> 0
            ),
            topk AS (SELECT vec_id FROM c ORDER BY cos DESC, vec_id LIMIT 20)
            SELECT label, count(*) AS votes
            FROM topk JOIN embeddings USING (vec_id)
            GROUP BY label
        """,
        "training_prep": """
            WITH canon AS (
                SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
            s AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS n_tokens,
                       round(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a'))
                             / len(string_split(text, ' ')), 6) AS stopword_ratio
                FROM documents),
            l AS (
                SELECT doc_id,
                       CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
                            WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS predicted_lang
                FROM (SELECT doc_id,
                             len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) AS score_en,
                             len(list_filter(string_split(text,' '), x -> x IN ('der','die','das'))) AS score_de,
                             len(list_filter(string_split(text,' '), x -> x IN ('el','la','los'))) AS score_es
                      FROM documents))
            SELECT s.doc_id, l.predicted_lang, s.n_tokens, s.stopword_ratio
            FROM s JOIN l USING (doc_id) JOIN canon USING (doc_id)
            WHERE s.n_tokens >= 20 AND s.stopword_ratio <= 0.2
        """,
        "resample_ffill": """
            WITH bounds AS (
                SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS mn,
                       max(ts) AS mx
                FROM events GROUP BY user_id),
            grid AS (
                SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS ts
                FROM bounds),
            unioned AS (
                SELECT user_id, ts, value AS v, 0 AS _src FROM events
                UNION ALL
                SELECT user_id, ts, NULL, 1 FROM grid),
            filled AS (
                SELECT user_id, ts, _src,
                       last_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, _src
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
                FROM unioned)
            SELECT user_id, ts AS grid_ts, f AS value_ffill
            FROM filled WHERE _src = 1
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        # sketch CONTRACT oracles: the HLL estimates are engine-specific,
        # so the hash-checked surface is the exact counts plus the
        # estimate-within-published-error-bound boolean, which the Spark
        # side computes from the live sketch and the oracle pins to TRUE
        "approx_distinct_users": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS est_ok
            FROM events GROUP BY event_type
        """,
        "hll_daily_users": """
            SELECT event_type,
                   CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                       AS n_buckets,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS est_ok
            FROM events GROUP BY event_type
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "top_orders_per_customer": """
            WITH ranked AS (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders
            )
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM ranked WHERE rk <= 3
        """,
        "props_json_extract": """
            SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   count(*) AS cnt,
                   CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
            FROM events GROUP BY k
        """,
        "monthly_revenue": """
            SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
                   count(*) AS cnt
            FROM lineitem GROUP BY month
        """,
        "as_of_join": """
            SELECT l.event_id, l.user_id, r.value AS value_asof
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "as_of_join_forward": """
            SELECT l.event_id, l.user_id, r.value AS value_asof
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts <= r.ts
        """,
        "as_of_join_tolerance": """
            SELECT l.event_id, l.user_id,
                   CASE WHEN r.ts IS NOT NULL
                             AND l.ts - r.ts <= INTERVAL '3600 seconds'
                        THEN r.value END AS value_asof
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "rollup_revenue": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   count(*) AS cnt
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "text_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
                   round(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
                         / len(string_split(text, ' ')), 4) AS avg_token_len,
                   round(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a'))
                         / len(string_split(text, ' ')), 6) AS stopword_ratio
            FROM documents
        """,
        "lang_id": """
            WITH s AS (
                SELECT doc_id,
                       len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) AS score_en,
                       len(list_filter(string_split(text,' '), x -> x IN ('der','die','das'))) AS score_de,
                       len(list_filter(string_split(text,' '), x -> x IN ('el','la','los'))) AS score_es
                FROM documents
            )
            SELECT doc_id, score_en, score_de, score_es,
                   CASE WHEN score_en IS NULL THEN NULL
                        WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
                        WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS predicted_lang
            FROM s
        """,
        "token_count_bpe": """
            SELECT doc_id,
                   CAST(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
                            x -> greatest(1, (length(x) + 3) // 4))) AS BIGINT) AS est_tokens
            FROM documents
        """,
        "doc_fingerprint": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
            SELECT doc_id,
                   CAST(list_sum(list_transform(generate_series(1, len(l)),
                       i -> (CAST(concat('0x', substr(md5(l[i]), 1, 8)) AS BIGINT) * i) % 1000003)
                   ) % 1000003 AS BIGINT) AS fingerprint
            FROM t
        """,
        "dedup_exact": """
            -- NULL text never merges: each such doc is its own cluster
            SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
                   count(*) AS dup_count
            FROM documents
            GROUP BY md5(text),
                     CASE WHEN text IS NULL THEN doc_id END
        """,
        "length_batches": """
            WITH d AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                FROM documents
            ), r AS (
                SELECT doc_id, n_tokens,
                       row_number() OVER (ORDER BY n_tokens, doc_id) AS rnk
                FROM d
            ), b AS (
                SELECT n_tokens, CAST((rnk - 1) // 32 AS BIGINT) AS batch_id
                FROM r
            )
            SELECT batch_id, count(*) AS n_docs, max(n_tokens) AS max_tokens,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
                       AS padding_waste
            FROM b GROUP BY batch_id
        """,
        "negative_samples": """
            WITH ords AS (
                SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS ord
                FROM documents
            ), nn AS (SELECT count(*) AS n FROM documents),
            slots AS (
                SELECT doc_id, ord, unnest(generate_series(1, 4)) AS slot
                FROM ords
            ), cand AS (
                SELECT doc_id, ord, slot,
                       CAST(concat('0x', substr(md5(concat(
                           CAST(doc_id AS VARCHAR), '#',
                           CAST(slot AS VARCHAR))), 1, 8)) AS BIGINT)
                           % nn.n + 1 AS c,
                       nn.n AS n
                FROM slots, nn
            ), adj AS (
                SELECT doc_id, slot,
                       CASE WHEN c = ord THEN c % n + 1 ELSE c END AS neg_ord
                FROM cand
            )
            SELECT a.doc_id, CAST(a.slot AS BIGINT) AS slot,
                   o.doc_id AS neg_doc_id
            FROM adj a JOIN ords o ON o.ord = a.neg_ord
        """,
        "bpe_encode": """
            WITH words AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ), vocab AS (
                SELECT DISTINCT w FROM words WHERE w <> ''
            ), enc AS (
                SELECT w,
                  replace(replace(replace(replace(replace(replace(replace(replace(
                    array_to_string(list_transform(string_split_regex(w, ''),
                        c -> chr(31) || c || chr(31)), ''),
                    chr(31)||'e'||chr(31)||chr(31)||'r'||chr(31), chr(31)||'er'||chr(31)),
                    chr(31)||'i'||chr(31)||chr(31)||'n'||chr(31), chr(31)||'in'||chr(31)),
                    chr(31)||'o'||chr(31)||chr(31)||'w'||chr(31), chr(31)||'ow'||chr(31)),
                    chr(31)||'o'||chr(31)||chr(31)||'r'||chr(31), chr(31)||'or'||chr(31)),
                    chr(31)||'s'||chr(31)||chr(31)||'t'||chr(31), chr(31)||'st'||chr(31)),
                    chr(31)||'m'||chr(31)||chr(31)||'er'||chr(31), chr(31)||'mer'||chr(31)),
                    chr(31)||'a'||chr(31)||chr(31)||'t'||chr(31), chr(31)||'at'||chr(31)),
                    chr(31)||'l'||chr(31)||chr(31)||'u'||chr(31), chr(31)||'lu'||chr(31)) AS e
                FROM vocab
            ), counts AS (
                SELECT w, (len(string_split(e, chr(31))) - 1) // 2 AS n_tok FROM enc
            )
            SELECT doc_id, count(*) AS n_words,
                   CAST(sum(n_tok) AS BIGINT) AS bpe_tokens
            FROM words JOIN counts USING (w)
            GROUP BY doc_id
        """,
        "bpe_token_freqs": """
            WITH words AS (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            ), wf AS (
                SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w
            ), enc AS (
                SELECT w, f,
                  replace(replace(replace(replace(replace(replace(replace(replace(
                    array_to_string(list_transform(string_split_regex(w, ''),
                        c -> chr(31) || c || chr(31)), ''),
                    chr(31)||'e'||chr(31)||chr(31)||'r'||chr(31), chr(31)||'er'||chr(31)),
                    chr(31)||'i'||chr(31)||chr(31)||'n'||chr(31), chr(31)||'in'||chr(31)),
                    chr(31)||'o'||chr(31)||chr(31)||'w'||chr(31), chr(31)||'ow'||chr(31)),
                    chr(31)||'o'||chr(31)||chr(31)||'r'||chr(31), chr(31)||'or'||chr(31)),
                    chr(31)||'s'||chr(31)||chr(31)||'t'||chr(31), chr(31)||'st'||chr(31)),
                    chr(31)||'m'||chr(31)||chr(31)||'er'||chr(31), chr(31)||'mer'||chr(31)),
                    chr(31)||'a'||chr(31)||chr(31)||'t'||chr(31), chr(31)||'at'||chr(31)),
                    chr(31)||'l'||chr(31)||chr(31)||'u'||chr(31), chr(31)||'lu'||chr(31)) AS e
                FROM wf
            ), toks AS (
                SELECT unnest(string_split(e, chr(31))) AS token, f FROM enc
            )
            SELECT token, CAST(sum(f) AS BIGINT) AS freq
            FROM toks WHERE token <> ''
            GROUP BY token ORDER BY freq DESC, token LIMIT 20
        """,
        "duplicate_spans": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), occ AS (
                -- position range derived from the doc itself (no fixed cap:
                -- the Spark side enumerates every window), canonical key as
                -- (doc_id, pos) order, not a doc_id*2^32 pack that overflows
                -- BIGINT past doc_id 2^31 (the Spark side orders structs)
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(t[i:i+7], ' ')) AS g
                FROM toks, LATERAL (
                    SELECT unnest(generate_series(1, len(t) - 7)) AS i) s
            ), marked AS (
                -- drop exactly ONE canonical occurrence per duplicated gram
                -- (rank > 1), mirroring the Spark side's sorted-array slice
                SELECT doc_id, pos AS s, pos + 7 AS e FROM (
                    SELECT g, doc_id, pos,
                           count(*) OVER (PARTITION BY g) AS n,
                           row_number() OVER (PARTITION BY g
                               ORDER BY doc_id, pos) AS rn
                    FROM occ)
                WHERE n > 1 AND rn > 1
            ), flagged AS (
                SELECT doc_id, s, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS pmax
                FROM marked
            ), isl AS (
                SELECT doc_id, s, e,
                       sum(CASE WHEN pmax IS NULL OR s > pmax + 1
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY s) AS isl_id
                FROM flagged
            )
            SELECT doc_id, min(s) AS span_start, max(e) AS span_end
            FROM isl GROUP BY doc_id, isl_id
        """,
        "span_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), occ AS (
                -- position range derived from the doc itself (no fixed cap:
                -- the Spark side enumerates every window), canonical key as
                -- (doc_id, pos) order, not a doc_id*2^32 pack that overflows
                -- BIGINT past doc_id 2^31 (the Spark side orders structs)
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(t[i:i+7], ' ')) AS g
                FROM toks, LATERAL (
                    SELECT unnest(generate_series(1, len(t) - 7)) AS i) s
            ), marked AS (
                -- drop exactly ONE canonical occurrence per duplicated gram
                -- (rank > 1), mirroring the Spark side's sorted-array slice
                SELECT doc_id, pos AS s, pos + 7 AS e FROM (
                    SELECT g, doc_id, pos,
                           count(*) OVER (PARTITION BY g) AS n,
                           row_number() OVER (PARTITION BY g
                               ORDER BY doc_id, pos) AS rn
                    FROM occ)
                WHERE n > 1 AND rn > 1
            ), flagged AS (
                SELECT doc_id, s, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS pmax
                FROM marked
            ), isl AS (
                SELECT doc_id, s, e,
                       sum(CASE WHEN pmax IS NULL OR s > pmax + 1
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY s) AS isl_id
                FROM flagged
            ), spans AS (
                SELECT doc_id, min(s) AS span_start, max(e) AS span_end
                FROM isl GROUP BY doc_id, isl_id
            ), tok_rows AS (
                SELECT doc_id, i - 1 AS pos, t[i] AS tok
                FROM toks, LATERAL (
                    SELECT unnest(generate_series(1, len(t))) AS i) s
            ), kept AS (
                SELECT tr.doc_id, tr.pos, tr.tok
                FROM tok_rows tr
                WHERE NOT EXISTS (
                    SELECT 1 FROM spans sp
                    WHERE sp.doc_id = tr.doc_id
                      AND tr.pos BETWEEN sp.span_start AND sp.span_end)
            ), rebuilt AS (
                SELECT doc_id,
                       coalesce(string_agg(tok, ' ' ORDER BY pos), '')
                           AS clean_text,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(r.clean_text, '') AS clean_text,
                   coalesce(len(string_split(d.text, ' '))
                            - coalesce(r.n_kept, 0), 0) AS removed_tokens
            FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        """,
        "dedup_keep_best": """
            WITH ranked AS (
                SELECT doc_id,
                       row_number() OVER (
                           PARTITION BY md5(text),
                               CASE WHEN text IS NULL THEN doc_id END
                           ORDER BY n_chars DESC, doc_id) AS rn,
                       count(*) OVER (
                           PARTITION BY md5(text),
                               CASE WHEN text IS NULL THEN doc_id END
                           ) AS dup_count
                FROM documents
            )
            SELECT doc_id, dup_count FROM ranked WHERE rn = 1
        """,
        "domain_cap": """
            WITH ranked AS (
                SELECT doc_id, source,
                       CAST(row_number() OVER (
                           PARTITION BY source
                           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                                    doc_id) AS INT) AS dom_rank
                FROM documents
            )
            SELECT doc_id, source, dom_rank FROM ranked WHERE dom_rank <= 25
        """,
        "unpivot_revenue": """
            WITH wide AS (
                SELECT l_returnflag,
                       CAST(sum(CASE WHEN l_linestatus = 'F'
                                     THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
                       CAST(sum(CASE WHEN l_linestatus = 'O'
                                     THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, linestatus_col, qty FROM (
                SELECT l_returnflag, 'qty_f' AS linestatus_col, qty_f AS qty FROM wide
                UNION ALL
                SELECT l_returnflag, 'qty_o' AS linestatus_col, qty_o AS qty FROM wide
            ) WHERE qty IS NOT NULL
        """,
        "label_centroids": """
            WITH e AS (
                SELECT label, unnest(embedding) AS v,
                       unnest(range(0, len(embedding))) AS pos
                FROM embeddings
            ), a AS (
                SELECT label, pos, count(*) AS n,
                       list(CAST(v AS DOUBLE) ORDER BY CAST(v AS DOUBLE)) AS vs
                FROM e GROUP BY label, pos
            )
            SELECT label, CAST(pos AS INT) AS pos,
                   round(list_reduce(vs, (x, y) -> x + y) / n, 6) + 0.0 AS centroid_v
            FROM a
        """,
        "bigram_logprob": _BIGRAM_LP_SQL,
        "cm_frequency": """
            WITH toks AS (
                SELECT unnest(string_split(lower(text), ' ')) AS token
                FROM documents
            ), cells AS (
                SELECT token, r.i AS row,
                       CAST(CAST(concat('0x', substr(md5(concat(r.i, ':', token)), 1, 8)) AS BIGINT) % 128 AS INT) AS bucket
                FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) r(i)
            ), sketch AS (
                SELECT row, bucket, count(*) AS cnt
                FROM cells GROUP BY row, bucket
            ), top AS (
                SELECT token FROM toks GROUP BY token
                ORDER BY count(*) DESC, token LIMIT 20
            ), probes AS (
                SELECT DISTINCT c.token, c.row, c.bucket
                FROM cells c JOIN top t ON c.token = t.token
            )
            SELECT p.token, min(coalesce(s.cnt, 0)) AS est_count
            FROM probes p LEFT JOIN sketch s
              ON p.row = s.row AND p.bucket = s.bucket
            GROUP BY p.token
        """,
        "hashed_features": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS tok
                FROM documents
            ), counts AS (
                SELECT doc_id,
                       CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS INT) AS bucket,
                       count(*) AS tf
                FROM toks GROUP BY doc_id, bucket
            )
            SELECT doc_id, bucket,
                   round(tf / sqrt(CAST(sum(tf * tf) OVER (PARTITION BY doc_id) AS DOUBLE)), 6) + 0.0 AS weight
            FROM counts
        """,
        "quality_score": """
            WITH f AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
                       CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_nodigit,
                       CAST(length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) AS n_noupper
                FROM documents
            ), z AS (
                SELECT doc_id, n_tok,
                       -1.0 + 0.6 * ln(n_tok + 1.0)
                            + 0.25 * ((n_chars - (n_tok - 1)) / n_tok)
                            + -3.0 * ((n_chars - n_nodigit) / n_chars)
                            + -2.0 * ((n_chars - n_noupper) / n_chars)
                            + 1.5 * (n_distinct / n_tok) AS zz
                FROM f
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
                   round(1.0 / (1.0 + exp(-zz)), 6) + 0.0 AS quality_score,
                   (round(1.0 / (1.0 + exp(-zz)), 6) + 0.0) >= 0.5 AS keep
            FROM z
        """,
        "dedup_incremental": """
            WITH seen AS (
                SELECT DISTINCT md5(text) AS text_hash
                FROM documents WHERE doc_id < 250
            ), batch AS (
                SELECT doc_id, md5(text) AS text_hash,
                       row_number() OVER (
                           PARTITION BY md5(text),
                               CASE WHEN text IS NULL THEN doc_id END
                           ORDER BY doc_id) AS rn
                FROM documents WHERE doc_id >= 250
            )
            SELECT doc_id, text_hash FROM batch b
            WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM seen s
                                         WHERE s.text_hash = b.text_hash)
        """,
        "training_pipeline": """
            WITH toks AS (
                SELECT doc_id, unnest(l) AS seg,
                       unnest(range(1, len(l) + 1)) AS pos
                FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
            ), boiler AS (
                SELECT seg FROM (
                    SELECT seg, count(DISTINCT doc_id) AS n FROM toks GROUP BY seg
                ) WHERE n > (SELECT count(*) FROM documents) * 0.9
            ), cleaned AS (
                SELECT k.doc_id,
                       string_agg(k.seg, ' ' ORDER BY k.pos) AS clean_text,
                       count(*) AS n_kept
                FROM (SELECT * FROM toks
                      WHERE seg NOT IN (SELECT seg FROM boiler)) k
                GROUP BY k.doc_id
            ), best AS (
                SELECT doc_id, clean_text, n_kept,
                       row_number() OVER (PARTITION BY md5(clean_text)
                                          ORDER BY n_kept DESC, doc_id) AS rn
                FROM cleaned
            ), kept AS (
                SELECT doc_id, clean_text AS text FROM best
                WHERE rn = 1 AND n_kept >= 3
            ), t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM kept
            ), c AS (
                SELECT doc_id, toks,
                       unnest(range(0, greatest(
                           CAST(ceil((len(toks) - 2) / 14.0) AS BIGINT), 1)))
                           AS chunk_id
                FROM t
            )
            SELECT doc_id, chunk_id,
                   array_to_string(toks[chunk_id*14+1 : chunk_id*14+16], ' ')
                       AS chunk_text,
                   CAST(len(toks[chunk_id*14+1 : chunk_id*14+16]) AS BIGINT)
                       AS n_chunk_tokens
            FROM c
        """,
        "remove_boilerplate": """
            WITH toks AS (
                SELECT doc_id, unnest(l) AS seg,
                       unnest(range(1, len(l) + 1)) AS pos
                FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
            ), df AS (
                SELECT seg, count(DISTINCT doc_id) AS n
                FROM toks GROUP BY seg
            ), boiler AS (
                SELECT seg FROM df
                WHERE n > (SELECT count(*) FROM documents) * 0.9
            ), kept AS (
                SELECT t.doc_id, t.seg, t.pos FROM toks t
                WHERE t.seg NOT IN (SELECT seg FROM boiler)
            ), totals AS (
                SELECT doc_id, count(*) AS n_total FROM toks GROUP BY doc_id
            )
            SELECT k.doc_id,
                   string_agg(k.seg, ' ' ORDER BY k.pos) AS clean_text,
                   count(*) AS n_kept,
                   any_value(t.n_total) - count(*) AS n_removed
            FROM kept k JOIN totals t ON k.doc_id = t.doc_id
            GROUP BY k.doc_id
        """,
        "ngram_jaccard_dedup": """
            WITH g AS (
                SELECT DISTINCT doc_id, substr(lc, i, 4) AS ngram
                FROM (SELECT doc_id, lower(text) AS lc,
                             unnest(range(1, length(text) - 2)) AS i
                      FROM documents WHERE length(text) >= 4)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
            rare AS (
                SELECT doc_id, ngram FROM (
                    SELECT doc_id, ngram, count(*) OVER (PARTITION BY ngram) AS _df FROM g)
                WHERE _df <= 250
            ),
            shared AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS _shared
                FROM rare a JOIN rare b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b,
                   round(_shared / (sa.n_grams + sb.n_grams - _shared), 6) AS jaccard
            FROM shared
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(_shared / (sa.n_grams + sb.n_grams - _shared), 6) >= 0.2
        """,
        "doc_containment": """
            WITH g AS (
                SELECT DISTINCT doc_id, substr(lc, i, 4) AS ngram
                FROM (SELECT doc_id, lower(text) AS lc,
                             unnest(range(1, length(text) - 2)) AS i
                      FROM documents WHERE length(text) >= 4)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
            rare AS (
                SELECT doc_id, ngram FROM (
                    SELECT doc_id, ngram, count(*) OVER (PARTITION BY ngram) AS _df FROM g)
                WHERE _df <= 250
            ),
            shared AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS _shared
                FROM rare a JOIN rare b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            scored AS (
                SELECT doc_a, doc_b,
                       round(_shared / sa.n_grams, 6) AS cont_a_in_b,
                       round(_shared / sb.n_grams, 6) AS cont_b_in_a
                FROM shared
                JOIN sizes sa ON doc_a = sa.doc_id
                JOIN sizes sb ON doc_b = sb.doc_id
            )
            SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a,
                   greatest(cont_a_in_b, cont_b_in_a) AS containment,
                   CASE WHEN cont_a_in_b >= cont_b_in_a THEN 'a_in_b'
                        ELSE 'b_in_a' END AS direction
            FROM scored
            WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.3
        """,
        "props_variant": """
            -- TRY_CAST of the unquoted string: a plain CAST(json_extract(..)
            -- AS INT) errors out on a non-numeric (or quoted-string) k where
            -- Spark's try_variant_get returns NULL and the row is filtered
            SELECT event_id,
                   TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events
            WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) > 50
        """,
        "frame_sample_grid": """
            WITH m AS (
                SELECT doc_id,
                       CAST(CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 600000 + 1 AS INT)
                           AS duration_ms
                FROM documents
            )
            SELECT doc_id, CAST(f AS INT) AS frame_no,
                   CAST(f * 60000 AS INT) AS frame_ts_ms, duration_ms
            FROM m, LATERAL (
                SELECT unnest(range(0, (duration_ms + 59999) // 60000)) AS f
            ) g
        """,
        "minhash_incremental": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM toks WHERE len(l) >= 3
            ),
            tid AS (SELECT doc_id, shingle,
                           CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS tid
                    FROM sh),
            hp AS (SELECT h, 6*h + 7 AS a, 3*h + 1 AS b
                   FROM (SELECT unnest(generate_series(0, 7)) AS h)),
            sig AS (SELECT doc_id, h, min((a * tid + b) % 8191) AS mh
                    FROM tid CROSS JOIN hp GROUP BY doc_id, h),
            bandsig AS (
                SELECT doc_id, h // 2 AS band,
                       sum(mh * CASE WHEN h % 2 = 0 THEN 1 ELSE 8192 END) AS band_key
                FROM sig GROUP BY doc_id, band
            ),
            hist AS (SELECT DISTINCT band, band_key FROM bandsig WHERE doc_id < 250),
            hits AS (
                SELECT DISTINCT n.doc_id
                FROM bandsig n JOIN hist h
                  ON n.band = h.band AND n.band_key = h.band_key
                WHERE n.doc_id >= 250
            )
            SELECT d.doc_id, (hits.doc_id IS NOT NULL) AS candidate_dup
            FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
            LEFT JOIN hits ON d.doc_id = hits.doc_id
        """,
        "minhash_lsh_dedup": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM toks WHERE len(l) >= 3
            ),
            tid AS (SELECT doc_id, shingle,
                           CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS tid
                    FROM sh),
            hp AS (SELECT h, 6*h + 7 AS a, 3*h + 1 AS b
                   FROM (SELECT unnest(generate_series(0, 7)) AS h)),
            sig AS (SELECT doc_id, h, min((a * tid + b) % 8191) AS mh
                    FROM tid CROSS JOIN hp GROUP BY doc_id, h),
            bandsig AS (
                SELECT doc_id, h // 2 AS band,
                       sum(mh * CASE WHEN h % 2 = 0 THEN 1 ELSE 8192 END) AS band_key
                FROM sig GROUP BY doc_id, band
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bandsig a JOIN bandsig b
                  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT doc_a, doc_b, count(*) AS inter
                FROM cand
                JOIN sh sa ON sa.doc_id = doc_a
                JOIN sh sb ON sb.doc_id = doc_b AND sa.shingle = sb.shingle
                GROUP BY doc_a, doc_b
            ),
            scored AS (
                SELECT doc_a, doc_b,
                       round(inter / (sa.n + sb.n - inter), 6) AS jaccard
                FROM inter
                JOIN sizes sa ON doc_a = sa.doc_id
                JOIN sizes sb ON doc_b = sb.doc_id
            )
            SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
        """,
        "simhash": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM toks WHERE len(l) >= 3
            ),
            hx AS (SELECT doc_id,
                          CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS hx
                   FROM sh),
            bits AS (SELECT unnest(generate_series(0, 15)) AS b),
            votes AS (
                SELECT doc_id, b,
                       sum(CASE WHEN (hx >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM hx CROSS JOIN bits GROUP BY doc_id, b
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id
        """,
        "ann_cosine_topk": _COS_TOP10_ORACLE,
        # two-stage PQ+rerank returns the EXACT top-10 (shortlist covers it,
        # tests assert the margin) — same oracle as the exact kernel
        "pq_ann": _COS_TOP10_ORACLE,
        "ann_lsh_topk": """
            WITH base AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                       sqrt(list_sum(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
                       CAST(list_sum(list_transform(generate_series(0, 7), p ->
                           CASE WHEN list_sum(list_transform(generate_series(1, 64),
                               i -> CAST(embedding[i] AS DOUBLE) *
                                    (((p * 64 + (i - 1)) * 2654435761 % 1000) / 1000.0 - 0.5)
                           )) >= 0 THEN (1 << p) ELSE 0 END)) AS INT) AS bucket
                FROM embeddings
            ),
            pairs AS (
                SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                       list_sum(list_transform(generate_series(1, 64),
                           i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) AS cos,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                                    i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) DESC,
                                    b.vec_id) AS rn
                FROM base a JOIN base b
                  ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
            )
            SELECT vec_id, neighbor_id, round(cos, 6) AS cos_sim
            FROM pairs WHERE rn <= 3
        """,
        "embedding_near_dup": """
            WITH n AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ),
            p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       round(list_sum(list_transform(generate_series(1, len(a.nv)),
                             i -> a.nv[i] * b.nv[i])), 6) AS cos_sim
                FROM n a JOIN n b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.4
        """,
        "multimodal_meta": """
            WITH m AS (
                SELECT doc_id,
                       ['image', 'audio', 'video'][(n_chars % 3) + 1] AS modality,
                       octet_length(CAST(text AS BLOB)) AS n_bytes,
                       CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS mh
                FROM documents
            )
            SELECT doc_id, modality, CAST(n_bytes AS INT) AS n_bytes,
                   ['png', 'jpeg', 'wav', 'mp4'][CAST(mh % 4 AS INT) + 1] AS format,
                   CASE WHEN modality <> 'image'
                        THEN CAST(mh % 600000 + 1 AS INT) END AS duration_ms
            FROM m
        """,
        "stratified_sample": """
            SELECT doc_id, lang, source FROM documents
            WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 10000
                  < CASE WHEN lang = 'en' THEN 3000
                         WHEN lang = 'zh' THEN 8000
                         ELSE 5000 END
        """,
        "array_hof": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            )
            SELECT doc_id,
                   CAST(len(list_filter(toks, t -> length(t) > 5)) AS BIGINT)
                       AS n_long,
                   CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
                       AS total_chars,
                   array_to_string(list_transform(toks[1:3], t -> upper(t)), '_')
                       AS head_upper
            FROM t
        """,
        "regexp_funcs": """
            WITH t AS (
                SELECT doc_id, text,
                       regexp_extract_all(text, '([0-9]+)', 1) AS nums
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(nums) AS BIGINT) AS n_numbers,
                   nums[1] AS first_number,
                   regexp_matches(text, 'the ') AS has_the
            FROM t
        """,
        "moving_revenue_7d": """
            SELECT o_orderkey, o_custkey, o_orderdate,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                        PARTITION BY o_custkey
                        ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                       AS rev_7d
            FROM orders
        """,
        "grouping_sets_revenue": """
            SELECT r_name, n_name,
                   CAST(GROUPING(r_name) AS INT) AS g_r,
                   CAST(GROUPING(n_name) AS INT) AS g_n,
                   count(*) AS cnt,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """,
        "funnel_conversion": """
            WITH per_user AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                       min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
                FROM events GROUP BY user_id
            )
            SELECT count(t_view) AS n_view,
                   CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view_then_click,
                   CAST(sum(CASE WHEN t_click > t_view AND t_purchase > t_click
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
            FROM per_user
        """,
        "user_journey": """
            -- row_number instead of arg_min/arg_max: DuckDB's arg_* skip rows
            -- whose VALUE argument is NULL, Spark's min_by/max_by return that
            -- row's (possibly NULL) value — the window replays Spark exactly
            WITH o AS (
                SELECT user_id, event_type, value, event_id,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY event_id ASC NULLS LAST) AS ra,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY event_id DESC NULLS LAST) AS rd
                FROM events
            )
            SELECT user_id,
                   max(CASE WHEN ra = 1 AND event_id IS NOT NULL
                            THEN event_type END) AS first_type,
                   max(CASE WHEN rd = 1 AND event_id IS NOT NULL
                            THEN event_type END) AS last_type,
                   max(CASE WHEN rd = 1 AND event_id IS NOT NULL
                            THEN value END) AS last_value,
                   count(*) AS n_events
            FROM o GROUP BY user_id
        """,
        "chunk_documents": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), c AS (
                SELECT doc_id, toks,
                       unnest(range(0, greatest(
                           CAST(ceil((len(toks) - 8) / 56.0) AS BIGINT), 1)))
                           AS chunk_id
                FROM t
            )
            SELECT doc_id, chunk_id,
                   array_to_string(toks[chunk_id*56+1 : chunk_id*56+64], ' ')
                       AS chunk_text,
                   CAST(len(toks[chunk_id*56+1 : chunk_id*56+64]) AS BIGINT)
                       AS n_chunk_tokens
            FROM c
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT source, doc_id,
                       CAST(coalesce(len(string_split(text, ' ')), 0)
                            AS BIGINT) AS n
                FROM documents
            ), p AS (
                SELECT source, n,
                       coalesce(sum(n) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS prefix
                FROM t
            )
            SELECT source, CAST(floor(prefix / 256.0) AS BIGINT) AS bin_id,
                   count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens
            FROM p GROUP BY source, bin_id
        """,
        "vocab_topk": """
            SELECT token, count(*) AS freq FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS token
                FROM documents
            ) WHERE regexp_matches(token, '^[a-z]+$')
            GROUP BY token ORDER BY freq DESC, token LIMIT 50
        """,
        "decontaminate": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM toks WHERE len(l) >= 3
            ),
            ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
            tr AS (SELECT * FROM sh WHERE doc_id >= 20),
            sizes AS (
                SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id
            ),
            hits AS (
                SELECT doc_id, count(*) AS n_hits FROM tr
                WHERE shingle IN (SELECT shingle FROM ev)
                GROUP BY doc_id
            )
            SELECT s.doc_id, s.n_shingles, h.n_hits,
                   round(h.n_hits / CAST(s.n_shingles AS DOUBLE), 6)
                       AS containment
            FROM sizes s JOIN hits h ON s.doc_id = h.doc_id
        """,
        "dup_clusters": """
            WITH RECURSIVE n AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM n a JOIN n b ON a.vec_id < b.vec_id
                WHERE round(list_sum(list_transform(
                          generate_series(1, len(a.nv)),
                          i -> a.nv[i] * b.nv[i])), 6) >= 0.4
            ), e AS (
                SELECT id_a AS u, id_b AS v FROM p
                UNION
                SELECT id_b, id_a FROM p
            ), reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            )
            SELECT u AS vec_id, least(u, min(v)) AS cluster_id
            FROM reach GROUP BY u
        """,
        "salted_event_stats": """
            SELECT event_type, count(event_id) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
                   max(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "nation_trade_balance": """
            WITH c AS (
                SELECT c_nationkey AS nationkey,
                       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                           AS cust_bal,
                       count(*) AS n_cust
                FROM customer GROUP BY c_nationkey
            ), s AS (
                SELECT s_nationkey AS nationkey,
                       CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                           AS supp_bal,
                       count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey
            )
            SELECT n_name, n_cust, cust_bal, n_supp, supp_bal
            FROM c FULL OUTER JOIN s USING (nationkey)
            LEFT JOIN nation ON nationkey = n_nationkey
        """,
        "lateral_top_customers": """
            SELECT n_name, c_name, c_acctbal FROM nation,
            LATERAL (SELECT c_name, c_acctbal FROM customer
                     WHERE c_nationkey = n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """,
        "priority_shift_except_all": """
            SELECT o_orderpriority FROM orders WHERE o_orderdate >= DATE '1995-01-01'
            EXCEPT ALL
            SELECT o_orderpriority FROM orders WHERE o_orderdate < DATE '1995-01-01'
        """,
        "semantic_dedup": """
            WITH RECURSIVE n AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM n a JOIN n b ON a.vec_id < b.vec_id
                WHERE round(list_sum(list_transform(
                          generate_series(1, len(a.nv)),
                          i -> a.nv[i] * b.nv[i])), 6) >= 0.4
            ), e AS (
                SELECT id_a AS u, id_b AS v FROM p
                UNION SELECT id_b, id_a FROM p
            ), reach(u, v) AS (
                SELECT u, v FROM e
                UNION SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ), cl AS (
                SELECT u AS id, least(u, min(v)) AS cluster_id
                FROM reach GROUP BY u
            ), joined AS (
                SELECT cl.cluster_id, d.doc_id,
                       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
                FROM cl JOIN documents d ON cl.id = d.doc_id
            ), ranked AS (
                SELECT *, row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_tok DESC, doc_id) AS rn
                FROM joined
            ), members AS (
                SELECT cluster_id, count(*) AS n_members
                FROM joined GROUP BY cluster_id
            )
            SELECT r.cluster_id, r.doc_id AS canonical_doc_id,
                   r.n_tok AS canonical_tokens, m.n_members
            FROM ranked r JOIN members m ON r.cluster_id = m.cluster_id
            WHERE r.rn = 1
        """,
        "value_histogram": """
            WITH b AS (
                SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bin_lo,
                       count(*) AS cnt
                FROM events GROUP BY bin_lo
            )
            SELECT bin_lo, cnt,
                   round(cnt / CAST(sum(cnt) OVER () AS DOUBLE), 6) + 0.0
                       AS share
            FROM b
        """,
        "bitwise_agg": """
            WITH f AS (
                SELECT event_type,
                       CAST(floor(value) AS BIGINT) % 256 AS fl
                FROM events
            )
            SELECT event_type,
                   bit_and(fl) AS flags_and,
                   bit_or(fl) AS flags_or,
                   bit_xor(fl) AS flags_xor,
                   CAST(sum(bit_count(fl)) AS BIGINT) AS total_bits
            FROM f GROUP BY event_type
        """,
        "safe_arithmetic": """
            SELECT event_id,
                   round(value / (CAST(floor(value) AS BIGINT) % 7), 6) + 0.0
                       AS safe_ratio,
                   TRY_CAST(CASE WHEN value > 100
                                 THEN CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                                 ELSE event_type END AS BIGINT) AS parsed
            FROM events
        """,
        "nulls_ordering": """
            WITH p AS (
                SELECT o_custkey, o_orderkey,
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS prev_date
                FROM orders
            )
            SELECT o_custkey, o_orderkey, prev_date,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY prev_date ASC NULLS LAST, o_orderkey) AS INT)
                       AS rnk
            FROM p
        """,
        "ann_all_topk": """
            WITH n AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), p AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       round(list_sum(list_transform(
                           generate_series(1, len(q.nv)),
                           i -> q.nv[i] * c.nv[i])), 6) AS cos_sim
                FROM n q CROSS JOIN n c
            ), r AS (
                SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM p
            )
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim
            FROM r WHERE rank <= 4
        """,
        "knn_join": """
            WITH n AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), p AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       round(list_sum(list_transform(
                           generate_series(1, len(q.nv)),
                           i -> q.nv[i] * c.nv[i])), 6) AS cos_sim
                FROM n q JOIN n c ON q.vec_id < 50 AND c.vec_id >= 50
            ), r AS (
                SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM p
            )
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim
            FROM r WHERE rank <= 5
        """,
        "pii_redact": """
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[PII]', 'g'),
                       '\\+?[0-9][0-9 ()-]{7,}[0-9]', '[PII]', 'g')
                       AS redacted_text,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[PII]', 'g'),
                       '\\+?[0-9][0-9 ()-]{7,}[0-9]')) AS BIGINT) AS n_phones
            FROM documents
        """,
        "repetition_stats": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                FROM documents
            ), per_token AS (
                SELECT doc_id, token, count(*) AS c
                FROM tok GROUP BY doc_id, token
            )
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_distinct_tokens,
                   max(c) AS top_token_freq,
                   round(max(c) / CAST(sum(c) AS DOUBLE), 6) + 0.0
                       AS repetition_ratio
            FROM per_token GROUP BY doc_id
        """,
        "bm25_search": """
            WITH tf AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS dl,
                       len(list_filter(string_split(text, ' '), x -> x = 'spark'))  AS tf0,
                       len(list_filter(string_split(text, ' '), x -> x = 'join'))   AS tf1,
                       len(list_filter(string_split(text, ' '), x -> x = 'window')) AS tf2
                FROM documents WHERE text IS NOT NULL
            ), stats AS (
                SELECT count(*) AS n, sum(dl) AS sdl,
                       CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                       CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                       CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
                FROM tf
            )
            SELECT doc_id,
                   round(
                     ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * 2.2)
                       / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * 2.2)
                       / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * 2.2)
                       / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                   , 6) + 0.0 AS score
            FROM tf, stats
            ORDER BY score DESC, doc_id
            LIMIT 20
        """,
        "scd2_user_state": """
            WITH marked AS (
                SELECT user_id, event_type, event_id, ts,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
                       lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
                FROM events
            ), starts AS (
                SELECT * FROM marked
                WHERE rn = 1 OR event_type IS DISTINCT FROM prev
            )
            SELECT user_id, event_type AS state,
                   event_id AS valid_from_seq, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
                       AS is_current
            FROM starts
        """,
        "train_test_split": """
            SELECT doc_id, source,
                   CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                        WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "rolling_zscore": """
            WITH fr AS (
                SELECT event_id, user_id, value,
                       sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER w / 100.0 AS s,
                       sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                           * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER w / 10000.0 AS ss,
                       CAST(count(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER w AS DOUBLE) AS cnt
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
            )
            SELECT event_id, user_id, value,
                   round(s / cnt, 6) + 0.0 AS roll_mean,
                   CASE WHEN cnt >= 2.0
                         AND sqrt(greatest((ss - (s * s) / cnt) / (cnt - 1.0), 0.0)) > 0
                        THEN round((value - s / cnt)
                                   / sqrt(greatest((ss - (s * s) / cnt) / (cnt - 1.0), 0.0)), 6) + 0.0
                   END AS zscore
            FROM fr
        """,
        "html_extract": _html_extract_oracle(),
        "common_line_filter": """
            WITH wrapped AS (
                SELECT doc_id,
                       'We use cookies to improve your experience'
                       || chr(10) || text || chr(10)
                       || 'Copyright 2026 Example Corp All rights reserved'
                       AS text
                FROM documents WHERE text IS NOT NULL
            ), lines AS (
                SELECT doc_id, i - 1 AS pos, ln[i] AS line
                FROM (SELECT doc_id, string_split(text, chr(10)) AS ln,
                             unnest(range(1, len(string_split(text, chr(10)))
                                          + 1)) AS i
                      FROM wrapped)
            ), cond AS (
                SELECT line FROM lines WHERE length(line) >= 10
                GROUP BY line HAVING count(DISTINCT doc_id) > 5
            ), marked AS (
                SELECT l.doc_id, l.pos, l.line,
                       (c.line IS NOT NULL AND length(l.line) >= 10) AS _drop
                FROM lines l LEFT JOIN cond c ON l.line = c.line
            )
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN NOT _drop THEN line END,
                                       chr(10) ORDER BY pos), '') AS text,
                   CAST(count(CASE WHEN NOT _drop THEN 1 END) AS BIGINT)
                       AS n_lines_kept,
                   CAST(count(CASE WHEN _drop THEN 1 END) AS BIGINT)
                       AS n_lines_dropped
            FROM marked GROUP BY doc_id
        """,
        "generation_loops": _generation_loops_oracle(),
        "rejection_sample": """
            WITH cands AS (
                SELECT doc_id // 8 AS prompt_id, doc_id AS cand_id, text,
                       CAST(length(text) % 997 AS DOUBLE) AS score
                FROM documents WHERE text IS NOT NULL
            ), ranked AS (
                SELECT *,
                       row_number() OVER (PARTITION BY prompt_id
                                          ORDER BY score DESC, cand_id)
                           AS rb,
                       count(*) OVER (PARTITION BY prompt_id) AS n_cands,
                       quantile_cont(score, 0.5) OVER
                           (PARTITION BY prompt_id) AS med
                FROM cands
            )
            SELECT prompt_id, cand_id, text, score,
                   round(med, 6) + 0.0 AS median_score,
                   round(score - med, 6) + 0.0 AS reward_gain,
                   CAST(n_cands AS BIGINT) AS n_candidates
            FROM ranked
            WHERE rb = 1 AND n_cands >= 2 AND score - med >= 100.0
        """,
        "epoch_shuffle": """
            WITH keyed AS (
                SELECT doc_id,
                       CAST(CAST(concat('0x', substr(md5(concat(
                                'epoch-0:shard:', CAST(doc_id AS VARCHAR))),
                                1, 8)) AS BIGINT) % 8 AS INT) AS shard,
                       md5(concat('epoch-0:ord:', CAST(doc_id AS VARCHAR)))
                           AS ord
                FROM documents
            )
            SELECT doc_id, shard,
                   CAST(row_number() OVER (PARTITION BY shard
                                           ORDER BY ord, doc_id)
                        AS BIGINT) AS pos
            FROM keyed
        """,
        "context_fit_report": """
            WITH tok AS (
                SELECT source, CAST(length(string_split(text, ' '))
                                    AS BIGINT) AS n
                FROM documents WHERE text IS NOT NULL
            ), x AS (
                SELECT source, n, CAST(l.context_limit AS INT)
                           AS context_limit
                FROM tok CROSS JOIN (VALUES (32), (64), (96), (128))
                     AS l(context_limit)
            )
            SELECT source, context_limit,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN n > context_limit THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_truncated,
                   round(CAST(sum(CASE WHEN n > context_limit
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) + 0.0 AS pct_docs_truncated,
                   CAST(sum(n) AS BIGINT) AS tokens_total,
                   CAST(sum(greatest(n - context_limit, 0)) AS BIGINT)
                       AS tokens_lost,
                   round(CAST(sum(greatest(n - context_limit, 0)) AS DOUBLE)
                         / sum(n), 6) + 0.0 AS pct_tokens_lost
            FROM x GROUP BY source, context_limit
            ORDER BY source, context_limit
        """,
        "elo_ratings": _bt_oracle(),
        "position_bias_probe": """
            WITH v AS (
                SELECT lang,
                       ((doc_id % 97)
                        < (40 + ascii(substr(lang, 1, 1)) % 25)) AS f
                FROM documents
            ), agg AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
                           AS first_wins
                FROM v WHERE f IS NOT NULL GROUP BY lang
            )
            SELECT lang, n, first_wins,
                   round(CAST(first_wins AS DOUBLE) / n, 6) + 0.0
                       AS first_win_rate,
                   round((CAST(first_wins AS DOUBLE) / n - 0.5) * 2.0
                         * sqrt(CAST(n AS DOUBLE)), 6) + 0.0 AS z,
                   (abs((CAST(first_wins AS DOUBLE) / n - 0.5) * 2.0
                        * sqrt(CAST(n AS DOUBLE))) > 1.96) AS biased
            FROM agg ORDER BY lang
        """,
        "win_rate_matrix": """
            WITH g AS (
                SELECT concat('m', CAST(doc_id % 8 AS VARCHAR)) AS a,
                       concat('m', CAST((doc_id % 8 + 1 + (doc_id // 8) % 7)
                                        % 8 AS VARCHAR)) AS b,
                       CAST(length(text) % 3 AS DOUBLE) AS wa,
                       CAST(doc_id % 2 AS DOUBLE) AS wb
                FROM documents WHERE text IS NOT NULL
            ), agg AS (
                SELECT least(a, b) AS model_lo, greatest(a, b) AS model_hi,
                       sum(CASE WHEN a <= b THEN wa ELSE wb END) AS wins_lo,
                       sum(CASE WHEN a <= b THEN wb ELSE wa END) AS wins_hi
                FROM g WHERE a <> b GROUP BY 1, 2
            ), w AS (
                SELECT model_lo, model_hi,
                       wins_lo + wins_hi AS games, wins_lo,
                       wins_lo / (wins_lo + wins_hi) AS p,
                       wins_lo + wins_hi AS n
                FROM agg WHERE wins_lo + wins_hi > 0
            )
            SELECT model_lo, model_hi, games, wins_lo,
                   round(p, 6) + 0.0 AS win_rate_lo,
                   round((p + (1.96 * 1.96) / (2 * n)
                          - 1.96 * sqrt(p * (1 - p) / n
                                        + (1.96 * 1.96) / (4 * n * n)))
                         / (1 + (1.96 * 1.96) / n), 6) + 0.0
                       AS wilson_lb_lo
            FROM w ORDER BY model_lo, model_hi
        """,
        "spearman_corr": """
            WITH base AS (
                SELECT lang,
                       CAST(length(text) % 101 AS DOUBLE) AS sx,
                       CAST((n_chars * 7) % 89 AS DOUBLE) AS sy
                FROM documents
                WHERE text IS NOT NULL AND n_chars IS NOT NULL
            ), ranked AS (
                SELECT lang,
                       rank() OVER (PARTITION BY lang ORDER BY sx)
                           + (count(*) OVER (PARTITION BY lang, sx) - 1)
                             / 2.0 AS rx,
                       rank() OVER (PARTITION BY lang ORDER BY sy)
                           + (count(*) OVER (PARTITION BY lang, sy) - 1)
                             / 2.0 AS ry
                FROM base
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CASE WHEN stddev_samp(rx) > 0 AND stddev_samp(ry) > 0
                        THEN round(covar_samp(rx, ry)
                                   / (stddev_samp(rx) * stddev_samp(ry)),
                                   6) + 0.0
                   END AS rho
            FROM ranked GROUP BY lang ORDER BY lang
        """,
        "distinct_ngrams": """
            WITH grams AS (
                SELECT source, l.n AS n,
                       unnest(CASE WHEN length(string_split(text, ' '))
                                        >= l.n THEN
                           list_transform(
                               range(1, length(string_split(text, ' '))
                                        - l.n + 2),
                               i -> md5(array_to_string(
                                   string_split(text, ' ')
                                       [i : i + l.n - 1], ' ')))
                           ELSE CAST([] AS VARCHAR[]) END) AS gram
                FROM documents CROSS JOIN (VALUES (1), (2), (3)) l(n)
                WHERE text IS NOT NULL
            )
            SELECT source, CAST(n AS INT) AS n,
                   CAST(count(*) AS BIGINT) AS n_grams_total,
                   CAST(count(DISTINCT gram) AS BIGINT)
                       AS n_grams_distinct,
                   round(CAST(count(DISTINCT gram) AS DOUBLE)
                         / count(*), 6) + 0.0 AS distinct_ratio
            FROM grams GROUP BY source, n ORDER BY source, n
        """,
        "lsh_design_report": """
            WITH sims AS (
                SELECT ((doc_id * 37) % 101) / 100.0 AS sim FROM documents
            ), hist AS (
                SELECT floor(sim / 0.05) AS bk,
                       CAST(count(*) AS BIGINT) AS n
                FROM sims WHERE sim IS NOT NULL GROUP BY 1
            ), ex AS (
                SELECT bk, n, CAST(c.b AS INT) AS b, CAST(c.r AS INT) AS r
                FROM hist CROSS JOIN (VALUES (8, 8), (16, 4), (32, 2))
                     c(b, r)
            ), scored AS (
                SELECT b, r, n,
                       round(pow(1.0 / b, 1.0 / r), 6) + 0.0 AS sstar,
                       least((bk + 0.5) * 0.05, 1.0) AS s_mid,
                       1.0 - list_reduce(
                           list_transform(range(b), x ->
                               1.0 - list_reduce(
                                   list_transform(range(r),
                                       y -> least((bk + 0.5) * 0.05,
                                                  1.0)),
                                   (a, c2) -> a * c2)),
                           (a, c2) -> a * c2) AS p
                FROM ex
            )
            SELECT b AS bands, r AS rows_per_band,
                   max(sstar) AS s_star,
                   round(sum(n * p), 6) + 0.0 AS expected_candidates,
                   round(sum(CASE WHEN s_mid < 0.5 THEN n * p
                                  ELSE 0.0 END), 6) + 0.0
                       AS false_positive_mass,
                   round(sum(CASE WHEN s_mid >= 0.5 THEN n * (1.0 - p)
                                  ELSE 0.0 END), 6) + 0.0
                       AS false_negative_mass,
                   CAST(sum(n) AS BIGINT) AS n_pairs
            FROM scored GROUP BY b, r ORDER BY bands
        """,
        "epoch_shuffle_grouped": """
            WITH rows_ AS (
                SELECT doc_id, doc_id // 10 AS conv_id FROM documents
            ), keyed AS (
                SELECT doc_id, conv_id,
                       CAST(CAST(concat('0x', substr(md5(concat(
                                'epoch-0:shard:',
                                CAST(conv_id AS VARCHAR))),
                                1, 8)) AS BIGINT) % 8 AS INT) AS shard,
                       md5(concat('epoch-0:ord:',
                                  CAST(conv_id AS VARCHAR))) AS ord
                FROM rows_
            )
            SELECT doc_id, conv_id, shard,
                   CAST(row_number() OVER (PARTITION BY shard
                                           ORDER BY ord, doc_id)
                        AS BIGINT) AS pos
            FROM keyed
        """,
        "prefix_cache_report": """
            WITH prompts AS (
                SELECT lang || ' system prompt tokens one two three four '
                            || text AS text
                FROM documents WHERE text IS NOT NULL
            ), rows_ AS (
                SELECT CAST(l.k AS INT) AS prefix_len,
                       md5(array_to_string(
                           string_split(text, ' ')[1:l.k], ' ')) AS pk
                FROM prompts CROSS JOIN (VALUES (4), (8), (16)) l(k)
                WHERE length(string_split(text, ' ')) >= l.k
            ), groups AS (
                SELECT prefix_len, pk, count(*) AS g
                FROM rows_ GROUP BY 1, 2
            )
            SELECT prefix_len,
                   CAST(sum(g) AS BIGINT) AS n_prompts,
                   CAST(sum(CASE WHEN g >= 2 THEN g ELSE 0 END) AS BIGINT)
                       AS n_shared_prompts,
                   CAST(sum(CASE WHEN g >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_shared_groups,
                   CAST(sum(CASE WHEN g >= 2 THEN (g - 1) * prefix_len
                                 ELSE 0 END) AS BIGINT) AS tokens_saved,
                   round(CAST(sum(CASE WHEN g >= 2 THEN (g - 1) * prefix_len
                                       ELSE 0 END) AS DOUBLE)
                         / (sum(g) * prefix_len), 6) + 0.0 AS hit_rate
            FROM groups GROUP BY prefix_len ORDER BY prefix_len
        """,
        "fleiss_kappa": """
            WITH ic AS (
                SELECT doc_id // 5 AS i, lang AS c, count(*) AS n
                FROM documents GROUP BY 1, 2
            ), per_item AS (
                SELECT i, sum(n) AS ni, sum(n * n) AS sq FROM ic GROUP BY 1
            ), ist AS (
                SELECT CAST(count(*) AS BIGINT) AS n_items,
                       CAST(sum(CASE WHEN ni >= 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_rated_items,
                       CAST(sum(ni) AS BIGINT) AS n_ratings,
                       sum(CASE WHEN ni >= 2 THEN
                            CAST(sq - ni AS DOUBLE) / (ni * (ni - 1)) END)
                           AS p_sum
                FROM per_item
            ), m AS (
                SELECT CAST(sum(nc * nc) AS DOUBLE)
                           / (sum(nc) * sum(nc)) AS pe
                FROM (SELECT sum(n) AS nc FROM ic GROUP BY c)
            )
            SELECT n_items, n_rated_items, n_ratings,
                   round(p_sum / n_rated_items, 6) + 0.0 AS p_bar,
                   round(pe, 6) + 0.0 AS p_e,
                   CASE WHEN pe < 1.0 THEN
                        round((p_sum / n_rated_items - pe) / (1.0 - pe), 6)
                            + 0.0
                   END AS kappa
            FROM ist, m
        """,
        "pass_at_k": """
            WITH per_task AS (
                SELECT doc_id // 8 AS t,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN (n_chars + doc_id) % 3 = 0
                                     THEN 1 ELSE 0 END) AS BIGINT) AS c
                FROM documents WHERE text IS NOT NULL GROUP BY 1
            ), ex AS (
                SELECT n, c, CAST(l.k AS INT) AS k
                FROM per_task CROSS JOIN (VALUES (1), (2), (4)) l(k)
                WHERE n >= l.k
            ), p AS (
                SELECT k,
                       CASE WHEN c = 0 THEN 0.0
                            WHEN c > n - k THEN 1.0
                            ELSE 1.0 - list_reduce(
                                list_transform(range(k),
                                    i -> CAST(n - c - i AS DOUBLE)
                                         / CAST(n - i AS DOUBLE)),
                                (a, b) -> a * b)
                       END AS p
                FROM ex
            )
            SELECT k, CAST(count(*) AS BIGINT) AS n_tasks,
                   round(avg(p), 6) + 0.0 AS mean_pass_at_k
            FROM p GROUP BY k ORDER BY k
        """,
        "template_mine": """
            WITH prompts AS (
                SELECT doc_id, source,
                       CASE WHEN doc_id % 5 <> 0 THEN
                            lang || ' task: write about "'
                                   || substr(text, 1, 20) || '" in '
                                   || CAST(n_chars % 50 AS VARCHAR)
                                   || ' words'
                       ELSE text END AS text
                FROM documents WHERE text IS NOT NULL
            ), skel AS (
                SELECT doc_id, source,
                       trim(regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(text, '"[^"]*"', '<q>', 'g'),
                           '''[^'']*''', '<q>', 'g'),
                           '[0-9]+', '<num>', 'g'),
                           '\\s+', ' ', 'g')) AS s
                FROM prompts WHERE text IS NOT NULL
            )
            SELECT s AS template, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   min(doc_id) AS example_id
            FROM skel GROUP BY s HAVING count(*) >= 2
        """,
        "bitext_filter": """
            WITH pairs AS (
                SELECT doc_id AS pair_id, text AS src_text,
                       CASE doc_id % 4
                            WHEN 0 THEN array_to_string(
                                string_split(text, ' ')[1:3], ' ')
                            WHEN 1 THEN text
                            WHEN 2 THEN text || ' 42'
                            ELSE array_to_string(list_reverse(
                                string_split(text, ' ')), ' ')
                       END AS tgt_text
                FROM documents WHERE text IS NOT NULL
            ), n AS (
                SELECT *,
                       CAST(length(string_split(src_text, ' ')) AS BIGINT)
                           AS ns,
                       CAST(length(string_split(tgt_text, ' ')) AS BIGINT)
                           AS nt,
                       (src_text IS NOT NULL AND tgt_text IS NOT NULL)
                           AS is_pair,
                       CASE WHEN trim(regexp_replace(src_text, '[^0-9]+',
                                 ' ', 'g')) = '' THEN 0
                            ELSE length(string_split(trim(regexp_replace(
                                 src_text, '[^0-9]+', ' ', 'g')), ' '))
                       END AS ds,
                       CASE WHEN trim(regexp_replace(tgt_text, '[^0-9]+',
                                 ' ', 'g')) = '' THEN 0
                            ELSE length(string_split(trim(regexp_replace(
                                 tgt_text, '[^0-9]+', ' ', 'g')), ' '))
                       END AS dt
                FROM pairs
            ), fl AS (
                SELECT *,
                       CAST(greatest(ns, nt) AS DOUBLE)
                           / CAST(least(ns, nt) AS DOUBLE) AS ratio,
                       (is_pair AND ns >= 2 AND nt >= 2) AS ok_len_floor,
                       (is_pair AND CAST(greatest(ns, nt) AS DOUBLE)
                            / CAST(least(ns, nt) AS DOUBLE) <= 2.0)
                           AS ok_ratio,
                       (is_pair AND src_text <> tgt_text) AS ok_not_identical,
                       (is_pair AND ds = dt) AS ok_digits
                FROM n
            )
            SELECT pair_id, src_text, tgt_text,
                   CASE WHEN is_pair THEN ns END AS n_src_tokens,
                   CASE WHEN is_pair THEN nt END AS n_tgt_tokens,
                   CASE WHEN is_pair THEN round(ratio, 6) + 0.0 END
                       AS len_ratio,
                   ok_len_floor, ok_ratio, ok_not_identical, ok_digits,
                   (ok_len_floor AND ok_ratio AND ok_not_identical
                    AND ok_digits) AS keep
            FROM fl
        """,
        "shard_manifest": """
            WITH keyed AS (
                SELECT doc_id, text,
                       CAST(CAST(concat('0x', substr(md5(concat(
                                'epoch-0:shard:', CAST(doc_id AS VARCHAR))),
                                1, 8)) AS BIGINT) % 8 AS INT) AS shard,
                       md5(concat('epoch-0:ord:', CAST(doc_id AS VARCHAR)))
                           AS ord
                FROM documents
            ), pos AS (
                SELECT doc_id, text, shard,
                       CAST(row_number() OVER (PARTITION BY shard
                                               ORDER BY ord, doc_id)
                            AS BIGINT) AS pos
                FROM keyed
            )
            SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(coalesce(
                       length(string_split(text, ' ')), 0)) AS BIGINT)
                       AS n_tokens,
                   min(pos) AS min_pos, max(pos) AS max_pos,
                   (min(pos) = 1 AND max(pos) = count(*)) AS contiguous
            FROM pos GROUP BY shard ORDER BY shard
        """,
        "span_corrupt": """
            WITH base AS (
                SELECT doc_id, text, string_split(text, ' ') AS toks,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n
                FROM documents
            ), blk AS (
                SELECT doc_id, toks, n,
                       unnest(range(CAST(ceil(n / 20.0) AS BIGINT))) AS k
                FROM base WHERE text IS NOT NULL AND n >= 2
            ), spans AS (
                SELECT doc_id, n, k, toks,
                       k * 20 AS base_off,
                       least(CAST(20 AS BIGINT), n - k * 20) AS blen,
                       least(1 + CAST(concat('0x', substr(md5(concat(
                                 CAST(doc_id AS VARCHAR), ':scL:',
                                 CAST(k AS VARCHAR))), 1, 8)) AS BIGINT)
                             % 5,
                             least(CAST(20 AS BIGINT), n - k * 20)) AS L
                FROM blk
            ), placed AS (
                SELECT doc_id, n, k, toks, base_off, blen, L,
                       base_off
                       + CAST(concat('0x', substr(md5(concat(
                             CAST(doc_id AS VARCHAR), ':scO:',
                             CAST(k AS VARCHAR))), 1, 8)) AS BIGINT)
                         % (blen - L + 1)
                       + 1 AS a
                FROM spans
            ), pieces AS (
                SELECT doc_id, n, k, L,
                       concat_ws(' ',
                           CASE WHEN a - 1 > base_off THEN
                               array_to_string(toks[base_off + 1 : a - 1],
                                               ' ') END,
                           '<extra_id_' || k || '>',
                           CASE WHEN base_off + blen >= a + L THEN
                               array_to_string(
                                   toks[a + L : base_off + blen], ' ')
                           END) AS ip,
                       concat_ws(' ', '<extra_id_' || k || '>',
                                 array_to_string(toks[a : a + L - 1], ' '))
                           AS tp
                FROM placed
            ), agg AS (
                SELECT doc_id,
                       string_agg(ip, ' ' ORDER BY k) AS input_text,
                       string_agg(tp, ' ' ORDER BY k)
                           || ' <extra_id_' || CAST(ceil(max(n) / 20.0)
                                AS BIGINT) || '>' AS target_text,
                       CAST(ceil(max(n) / 20.0) AS BIGINT) AS n_spans,
                       CAST(sum(L) AS BIGINT) AS n_corrupted_tokens
                FROM pieces GROUP BY doc_id
            )
            SELECT doc_id, input_text, target_text, n_spans,
                   n_corrupted_tokens
            FROM agg
            UNION ALL
            SELECT doc_id, text AS input_text, '' AS target_text,
                   CAST(0 AS BIGINT) AS n_spans,
                   CAST(0 AS BIGINT) AS n_corrupted_tokens
            FROM base WHERE text IS NULL OR n < 2
        """,
        "interleave_by_weight": """
            WITH pos AS (
                SELECT doc_id, source,
                       CAST(row_number() OVER (PARTITION BY source
                           ORDER BY md5(concat('mix-0:ord:',
                                               CAST(doc_id AS VARCHAR))),
                                    doc_id) AS BIGINT) AS src_pos
                FROM documents
            )
            SELECT doc_id, source, src_pos,
                   floor((src_pos
                          - (CAST(concat('0x', substr(md5(concat(
                                 'mix-0:phase:', source)), 1, 8))
                                 AS BIGINT) % 1000000) / 1000000.0)
                         / (1.0 + CAST(substr(source, 4) AS BIGINT) % 3)
                         * 1000000.0) / 1000000.0 AS slot
            FROM pos
        """,
        "filter_funnel": """
            WITH flags AS (
                SELECT source,
                       (text IS NOT NULL) AS p1,
                       coalesce(n_chars >= 150, FALSE) AS p2,
                       coalesce(length(string_split(text, ' ')) >= 30,
                                FALSE) AS p3,
                       (doc_id % 7 <> 0) AS p4
                FROM documents
            ), ff AS (
                SELECT source,
                       CASE WHEN NOT p1 THEN 1 WHEN NOT p2 THEN 2
                            WHEN NOT p3 THEN 3 WHEN NOT p4 THEN 4
                       END AS f
                FROM flags
            ), agg AS (
                SELECT source, count(*) AS total,
                       sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS k1,
                       sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS k2,
                       sum(CASE WHEN f = 3 THEN 1 ELSE 0 END) AS k3,
                       sum(CASE WHEN f = 4 THEN 1 ELSE 0 END) AS k4
                FROM ff GROUP BY source
            ), stages AS (
                SELECT source, 1 AS i, 'has_text' AS stage, total AS n_in,
                       k1 AS killed, total - k1 AS n_out, total FROM agg
                UNION ALL
                SELECT source, 2, 'min_chars', total - k1, k2,
                       total - k1 - k2, total FROM agg
                UNION ALL
                SELECT source, 3, 'token_floor', total - k1 - k2, k3,
                       total - k1 - k2 - k3, total FROM agg
                UNION ALL
                SELECT source, 4, 'quality_hash', total - k1 - k2 - k3, k4,
                       total - k1 - k2 - k3 - k4, total FROM agg
            )
            SELECT source, CAST(i AS INT) AS stage_idx, stage,
                   CAST(n_in AS BIGINT) AS n_in,
                   CAST(killed AS BIGINT) AS n_killed,
                   CAST(n_out AS BIGINT) AS n_out,
                   CASE WHEN n_in > 0 THEN
                        round(CAST(n_out AS DOUBLE) / n_in, 6) + 0.0
                   END AS survival_rate,
                   CASE WHEN total > 0 THEN
                        round(CAST(n_out AS DOUBLE) / total, 6) + 0.0
                   END AS cumulative_survival
            FROM stages ORDER BY source, stage_idx
        """,
        "chat_tree_paths": """
            WITH RECURSIVE nodes AS (
                SELECT source AS conv_id,
                       CAST(row_number() OVER (PARTITION BY source
                           ORDER BY doc_id) AS BIGINT) AS node_id,
                       substr(text, 1, 40) AS content
                FROM documents WHERE text IS NOT NULL
            ), tree AS (
                SELECT conv_id, node_id,
                       CASE WHEN node_id > 1 THEN node_id // 2 END
                           AS parent_id,
                       CASE WHEN node_id % 2 = 1 THEN 'user'
                            ELSE 'assistant' END AS role,
                       content
                FROM nodes
            ), leaves AS (
                SELECT t.* FROM tree t
                WHERE NOT EXISTS (SELECT 1 FROM tree c
                                  WHERE c.conv_id = t.conv_id
                                    AND c.parent_id = t.node_id)
            ), walk AS (
                -- the walk replays Spark's max_depth=16 cap exactly: at
                -- most 16 hops per leaf, and a 16th node that still has a
                -- parent marks the path truncated (leaf-nearest 16 turns
                -- kept) — without this the oracle silently diverges the
                -- moment a conversation tree exceeds depth 16
                SELECT conv_id, node_id AS leaf_id, node_id AS node,
                       0 AS up
                FROM leaves
                UNION ALL
                SELECT w.conv_id, w.leaf_id, t.parent_id, w.up + 1
                FROM walk w JOIN tree t ON t.conv_id = w.conv_id
                                       AND t.node_id = w.node
                WHERE t.parent_id IS NOT NULL AND w.up + 1 < 16
            )
            SELECT w.conv_id, w.leaf_id,
                   CAST(count(*) AS BIGINT) AS depth,
                   string_agg(t.role || ':' || t.content, '|'
                              ORDER BY w.up DESC) AS path_text,
                   coalesce(max(CASE WHEN w.up = 15
                                     THEN t.parent_id IS NOT NULL END),
                            false) AS truncated
            FROM walk w JOIN tree t ON t.conv_id = w.conv_id
                                   AND t.node_id = w.node
            GROUP BY w.conv_id, w.leaf_id
        """,
        "near_dup_decontaminate": """
            WITH tdocs AS (
                SELECT doc_id, text FROM documents WHERE text IS NOT NULL
            ), edocs AS (
                SELECT doc_id + 20000000 AS doc_id,
                       text || ' trailing eval marker' AS text
                FROM documents
                WHERE text IS NOT NULL AND doc_id % 7 = 0
            ), tsh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS l
                      FROM tdocs) WHERE len(l) >= 3
            ), esh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS l
                      FROM edocs) WHERE len(l) >= 3
            ), hp AS (SELECT h, 6*h + 7 AS a, 3*h + 1 AS b
                      FROM (SELECT unnest(generate_series(0, 7)) AS h)),
            tsig AS (
                SELECT doc_id, h, min((a * CAST(concat('0x',
                           substr(md5(shingle), 1, 8)) AS BIGINT) + b)
                           % 8191) AS mh
                FROM tsh CROSS JOIN hp GROUP BY doc_id, h
            ), esig AS (
                SELECT doc_id, h, min((a * CAST(concat('0x',
                           substr(md5(shingle), 1, 8)) AS BIGINT) + b)
                           % 8191) AS mh
                FROM esh CROSS JOIN hp GROUP BY doc_id, h
            ), tband AS (
                SELECT doc_id, h // 2 AS band,
                       sum(mh * CASE WHEN h % 2 = 0 THEN 1 ELSE 8192 END)
                           AS band_key
                FROM tsig GROUP BY doc_id, band
            ), eband AS (
                SELECT doc_id, h // 2 AS band,
                       sum(mh * CASE WHEN h % 2 = 0 THEN 1 ELSE 8192 END)
                           AS band_key
                FROM esig GROUP BY doc_id, band
            ), cand AS (
                SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
                FROM tband t JOIN eband e
                  ON t.band = e.band AND t.band_key = e.band_key
            ), tsz AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY doc_id),
            esz AS (SELECT doc_id, count(*) AS n FROM esh GROUP BY doc_id),
            inter AS (
                SELECT c.doc_id, c.eval_id, count(*) AS i
                FROM cand c
                JOIN tsh ON tsh.doc_id = c.doc_id
                JOIN esh ON esh.doc_id = c.eval_id
                        AND esh.shingle = tsh.shingle
                GROUP BY c.doc_id, c.eval_id
            ), scored AS (
                SELECT i.doc_id, i.eval_id,
                       round(i.i / (t.n + e.n - i.i), 6) AS jaccard
                FROM inter i
                JOIN tsz t ON i.doc_id = t.doc_id
                JOIN esz e ON i.eval_id = e.doc_id
            )
            SELECT doc_id, eval_id, jaccard
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY jaccard DESC, eval_id) AS rn
                  FROM scored WHERE jaccard >= 0.5)
            WHERE rn = 1
        """,
        "fim_transform": """
            WITH t AS (
                SELECT doc_id, text,
                       string_split(text, ' ') AS toks,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
                           || ':fimr'), 1, 8)) AS BIGINT) % 100 < 50 AS gate,
                       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
                           || ':fim1'), 1, 8)) AS BIGINT) AS h1,
                       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
                           || ':fim2'), 1, 8)) AS BIGINT) AS h2
                FROM documents
            ), pts AS (
                SELECT *,
                       (text IS NOT NULL AND n >= 3 AND gate) AS fim_applied,
                       CASE WHEN n > 1 THEN 1 + h1 % (n - 1) END AS i
                FROM t
            ), pts2 AS (
                SELECT *, CASE WHEN i IS NOT NULL AND n > i
                               THEN i + 1 + h2 % (n - i) END AS j
                FROM pts
            )
            SELECT doc_id, fim_applied,
                   CASE WHEN fim_applied
                        -- coalesce each segment: an empty DuckDB list
                        -- slice renders NULL and would NULL the concat
                        THEN '<PRE>' || coalesce(array_to_string(
                                    toks[1:i], ' '), '')
                             || '<SUF>' || coalesce(array_to_string(
                                    toks[(j + 1):n], ' '), '')
                             || '<MID>' || coalesce(array_to_string(
                                    toks[(i + 1):j], ' '), '')
                        ELSE text END AS text,
                   CAST(CASE WHEN fim_applied THEN i
                             ELSE coalesce(n, 0) END AS BIGINT) AS n_prefix,
                   CAST(CASE WHEN fim_applied THEN j - i
                             ELSE 0 END AS BIGINT) AS n_middle,
                   CAST(CASE WHEN fim_applied THEN n - j
                             ELSE 0 END AS BIGINT) AS n_suffix
            FROM pts2
        """,
        "preference_pairs": """
            WITH cands AS (
                SELECT doc_id // 8 AS prompt_id, doc_id AS cand_id, text,
                       CAST(length(text) % 997 AS DOUBLE) AS score
                FROM documents WHERE text IS NOT NULL
            ), ranked AS (
                -- chosen: score DESC, id ASC; rejected: score ASC, id
                -- DESC (a fully tied prompt still yields two distinct
                -- candidates) — mirrors the struct MIN/MAX tie-breaks
                SELECT *, row_number() OVER (PARTITION BY prompt_id
                              ORDER BY score DESC, cand_id) AS rb,
                          row_number() OVER (PARTITION BY prompt_id
                              ORDER BY score ASC, cand_id DESC) AS rw,
                          count(*) OVER (PARTITION BY prompt_id) AS n_cands
                FROM cands
            ), ch AS (
                SELECT prompt_id, cand_id AS chosen_id,
                       text AS chosen_text, score AS cs,
                       CAST(n_cands AS BIGINT) AS n_candidates
                FROM ranked WHERE rb = 1
            ), rj AS (
                SELECT prompt_id, cand_id AS rejected_id,
                       text AS rejected_text, score AS rs
                FROM ranked WHERE rw = 1
            )
            SELECT prompt_id, chosen_id, rejected_id, chosen_text,
                   rejected_text, round(cs - rs, 6) + 0.0 AS score_margin,
                   n_candidates
            FROM ch JOIN rj USING (prompt_id)
            WHERE n_candidates >= 2 AND cs - rs >= 50.0
        """,
        "pack_training_rows": """
            WITH base AS (
                SELECT doc_id AS conv_id, text,
                       CASE WHEN doc_id % 3 = 0
                            THEN [{'s': CAST(0 AS BIGINT),
                                   'e': CAST(least(40, length(text))
                                             AS BIGINT)}]
                            ELSE CAST([] AS STRUCT(s BIGINT, e BIGINT)[])
                       END AS spans,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                FROM documents WHERE text IS NOT NULL
            ), kls AS (
                SELECT *, CASE WHEN n_tok > 128 THEN 0
                               ELSE 128 // n_tok END AS kcls
                FROM base
            ), rnk AS (
                -- longest-first inside each harmonic size class, id
                -- tie-break: mirrors global_rank(_k, -n, id) - class min
                SELECT *, row_number() OVER (PARTITION BY kcls
                              ORDER BY n_tok DESC, conv_id) - 1 AS rank0
                FROM kls
            ), rws AS (
                SELECT *, CASE WHEN kcls = 0 THEN rank0
                               ELSE rank0 // kcls END AS row_id
                FROM rnk
            ), mem AS (
                -- prev = char offset of this member in the packed text
                -- (sum of earlier members' lengths + 1-char separators)
                SELECT *, coalesce(sum(length(text) + 1) OVER (
                              PARTITION BY kcls, row_id ORDER BY rank0
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS prev
                FROM rws
            ), packs AS (
                SELECT kcls, row_id,
                       string_agg(text, chr(10) ORDER BY rank0) AS ptext,
                       flatten(list(list_transform(spans,
                           x -> {'s': x.s + prev, 'e': x.e + prev})
                           ORDER BY rank0)) AS pspans,
                       list({'s': prev,
                             'e': prev + length(text)}
                            ORDER BY rank0) AS dspans,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                       (kcls = 0) AS overflow
                FROM mem GROUP BY kcls, row_id
            )
            SELECT CAST(kcls AS VARCHAR) || '_' || CAST(row_id AS VARCHAR)
                       AS pack_id,
                   n_docs, n_tokens, overflow,
                   CAST(len(pspans) AS BIGINT) AS n_spans,
                   -- coalesce: DuckDB's array_to_string of an empty list
                   -- is NULL where Spark's array_join is ''
                   coalesce(array_to_string(list_transform(pspans,
                       x -> substr(ptext, CAST(x.s + 1 AS INTEGER),
                                   CAST(x.e - x.s AS INTEGER))), '|'), '')
                       AS span_concat,
                   md5(coalesce(array_to_string(list_transform(dspans,
                       x -> substr(ptext, CAST(x.s + 1 AS INTEGER),
                                   CAST(x.e - x.s AS INTEGER))),
                       chr(31)), '')) AS doc_concat_md5,
                   CAST(length(ptext) AS BIGINT) AS text_len
            FROM packs
        """,
        "web_corpus_prep": _web_corpus_prep_oracle(),
        "margin_mine": """
            WITH n AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE)
                                      * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), s AS (SELECT * FROM n WHERE label < 5),
            t AS (SELECT * FROM n WHERE label >= 5),
            pf AS (
                SELECT s.vec_id AS qid, t.vec_id AS nid,
                       round(list_sum(list_transform(
                           generate_series(1, len(s.nv)),
                           i -> s.nv[i] * t.nv[i])), 6) AS cos_sim
                FROM s JOIN t ON true
            ), fwd AS (
                SELECT * FROM (
                    SELECT qid, nid, cos_sim,
                           row_number() OVER (PARTITION BY qid
                               ORDER BY cos_sim DESC, nid) AS rnk
                    FROM pf) WHERE rnk <= 4
            ), pb AS (
                SELECT t.vec_id AS qid, s.vec_id AS nid,
                       round(list_sum(list_transform(
                           generate_series(1, len(t.nv)),
                           i -> t.nv[i] * s.nv[i])), 6) AS cos_sim
                FROM t JOIN s ON true
            ), bwd AS (
                SELECT * FROM (
                    SELECT qid, nid, cos_sim,
                           row_number() OVER (PARTITION BY qid
                               ORDER BY cos_sim DESC, nid) AS rnk
                    FROM pb) WHERE rnk <= 4
            ), dx AS (SELECT qid, sum(CAST(cos_sim AS DECIMAL(9,6))) AS dxs,
                             count(*) AS nx
                      FROM fwd GROUP BY qid),
            dy AS (SELECT qid, sum(CAST(cos_sim AS DECIMAL(9,6))) AS dys,
                          count(*) AS ny
                   FROM bwd GROUP BY qid),
            scored AS (
                -- actual-neighbor-count form (mirrors similarity.py
                -- margin_mine): cos * 2*nx*ny / (dxs*ny + dys*nx)
                SELECT f.qid, f.nid, f.cos_sim,
                       round(f.cos_sim * (2 * dx.nx * dy.ny)
                             / CAST(dx.dxs * dy.ny + dy.dys * dx.nx
                                    AS DOUBLE), 6) + 0.0
                           AS margin
                FROM fwd f
                JOIN dx ON f.qid = dx.qid
                JOIN dy ON f.nid = dy.qid
                WHERE dx.dxs * dy.ny + dy.dys * dx.nx > 0
            )
            SELECT qid AS src_id, nid AS tgt_id, cos_sim, margin
            FROM (SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY margin DESC, nid) AS rn FROM scored)
            WHERE rn = 1 AND margin >= 1.0
        """,
        "chat_training_text": """
            WITH turns AS (
                SELECT source AS conv_id, doc_id,
                       CASE WHEN doc_id % 2 = 0 THEN 'user'
                            ELSE 'assistant' END AS role,
                       substr(text, 1, 80) AS content
                FROM documents WHERE text IS NOT NULL
            ), off AS (
                SELECT conv_id, doc_id, role, content,
                       coalesce(sum(CASE WHEN role = 'assistant' THEN 12
                                         ELSE 7 END
                                    + length(content) + 1)
                           OVER (PARTITION BY conv_id ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING),
                           0) AS prev
                FROM turns
            ), rendered AS (
                SELECT conv_id,
                       string_agg(CASE WHEN role = 'assistant'
                                       THEN '[ASSISTANT]' || chr(10)
                                       ELSE '[USER]' || chr(10) END
                                  || content || chr(10),
                                  '' ORDER BY doc_id) AS text
                FROM turns GROUP BY conv_id
            )
            SELECT o.conv_id,
                   CAST(o.prev + 12 AS BIGINT) AS s,
                   CAST(o.prev + 12 + length(o.content) AS BIGINT) AS e,
                   substr(r.text, CAST(o.prev + 13 AS INTEGER),
                          length(o.content)) AS span_text
            FROM off o JOIN rendered r USING (conv_id)
            WHERE o.role = 'assistant'
        """,
        "cross_lingual_dedup": _cross_lingual_oracle(),
        "embedding_dim_drift": """
            WITH ex AS (
                SELECT CAST(i - 1 AS INTEGER) AS dim,
                       CAST(embedding[i] AS DOUBLE) AS v,
                       (label < 5) AS is_ref
                FROM (SELECT embedding, label,
                             unnest(range(1, len(embedding) + 1)) AS i
                      FROM embeddings
                      WHERE embedding IS NOT NULL AND label IS NOT NULL)
            ), m AS (
                SELECT dim,
                       sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                       sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur,
                       sum(CASE WHEN is_ref THEN CAST(round(v, 9) AS DECIMAL(28,9))
                                ELSE CAST(0 AS DECIMAL(28,9)) END) AS sx_ref,
                       sum(CASE WHEN is_ref THEN CAST(0 AS DECIMAL(28,9))
                                ELSE CAST(round(v, 9) AS DECIMAL(28,9)) END) AS sx_cur,
                       sum(CASE WHEN is_ref THEN CAST(round(v * v, 9) AS DECIMAL(28,9))
                                ELSE CAST(0 AS DECIMAL(28,9)) END) AS sx2_ref,
                       sum(CASE WHEN is_ref THEN CAST(0 AS DECIMAL(28,9))
                                ELSE CAST(round(v * v, 9) AS DECIMAL(28,9)) END) AS sx2_cur
                FROM ex GROUP BY dim
            ), mom AS (
                SELECT dim,
                       CAST(sx_ref AS DOUBLE) / n_ref AS m_ref,
                       CAST(sx_cur AS DOUBLE) / n_cur AS m_cur,
                       CAST(sx2_ref AS DOUBLE) / n_ref
                         - (CAST(sx_ref AS DOUBLE) / n_ref)
                           * (CAST(sx_ref AS DOUBLE) / n_ref) AS v_ref,
                       CAST(sx2_cur AS DOUBLE) / n_cur
                         - (CAST(sx_cur AS DOUBLE) / n_cur)
                           * (CAST(sx_cur AS DOUBLE) / n_cur) AS v_cur
                FROM m
            ), scored AS (
                SELECT dim,
                       round(m_ref, 6) + 0.0 AS mean_ref,
                       round(m_cur, 6) + 0.0 AS mean_cur,
                       CASE WHEN v_ref + v_cur > 0
                            THEN round((m_cur - m_ref)
                                       / sqrt((v_ref + v_cur) / 2.0), 6)
                                 + 0.0 END AS smd
                FROM mom
            )
            SELECT dim, mean_ref, mean_cur, smd
            FROM scored ORDER BY abs(smd) DESC NULLS LAST, dim LIMIT 10
        """,
        "url_recrawl_dedup": """
            WITH u AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 2 = 0
                            THEN 'HTTPS://WWW.Example.COM/doc/'
                                 || CAST(doc_id // 2 AS VARCHAR) || '#ref'
                            ELSE 'https://www.example.com/doc/'
                                 || CAST(doc_id // 2 AS VARCHAR)
                       END AS url
                FROM documents
            ), n AS (
                SELECT doc_id,
                       regexp_replace(
                           lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                               '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
                           || regexp_replace(regexp_replace(url, '#.*$', ''),
                               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                           '^([a-z][a-z0-9+.-]*://[^/?#]+)/$', '\\1')
                           AS norm_url
                FROM u
            )
            SELECT norm_url,
                   CAST(count(*) AS BIGINT) AS n_crawls,
                   min(doc_id) AS keep_doc
            FROM n GROUP BY norm_url
        """,
        "ewma_smooth": _EWMA_ORACLE,
        "sessionize": """
            WITH base AS (
                SELECT event_id, user_id, ts,
                       lag(ts) OVER w AS prev_ts,
                       row_number() OVER w AS rn
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            ), marked AS (
                SELECT *, CASE WHEN prev_ts IS NULL
                                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                               THEN 1 ELSE 0 END AS new_sess
                FROM base
            )
            SELECT event_id, user_id,
                   CAST(sum(new_sess) OVER wc AS BIGINT) AS session_id,
                   CAST(rn - max(CASE WHEN new_sess = 1 THEN rn END) OVER wc + 1
                        AS BIGINT) AS session_pos
            FROM marked
            WINDOW wc AS (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "data_quality_report": """
            SELECT 'qty_out_of_range' AS check_name,
                   CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM lineitem
            UNION ALL
            SELECT 'suspicious_high_qty',
                   CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'nonpositive_price',
                   CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'null_shipdate',
                   CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'discount_out_of_range',
                   CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.1) THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'orphan_orders', CAST(count(*) AS BIGINT)
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'orphan_lineitems', CAST(count(*) AS BIGINT)
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        """,
        "winsorize_values": """
            WITH pct AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.05), 6) AS lo,
                       round(quantile_cont(value, 0.95), 6) AS hi
                FROM events GROUP BY event_type
            )
            -- CASE mirror of the Spark side's explicit NULL propagation
            -- (both engines' greatest/least skip NULL arguments)
            SELECT event_id, e.event_type, value,
                   CASE WHEN value IS NOT NULL
                        THEN least(greatest(value, lo), hi) END AS value_wins
            FROM events e JOIN pct ON e.event_type = pct.event_type
        """,
        "shipping_concurrency": """
            WITH done AS (
                SELECT l_orderkey, max(l_shipdate) AS done_d
                FROM lineitem GROUP BY l_orderkey
            ), j AS (
                SELECT o_orderdate, done_d
                FROM orders JOIN done ON o_orderkey = l_orderkey
            ), deltas AS (
                SELECT o_orderdate AS d, 1 AS delta FROM j
                UNION ALL
                SELECT done_d AS d, -1 AS delta FROM j
            ), per_date AS (
                SELECT d, CAST(sum(delta) AS BIGINT) AS net
                FROM deltas GROUP BY d
            )
            SELECT d, net,
                   CAST(sum(net) OVER (ORDER BY d NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS concurrent
            FROM per_date
        """,
        "mad_by_type": """
            WITH med AS (
                SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median
                FROM events GROUP BY event_type
            )
            SELECT e.event_type, median,
                   round(quantile_cont(abs(value - median), 0.5), 6) AS mad,
                   count(*) AS n
            FROM events e JOIN med USING (event_type)
            GROUP BY e.event_type, median
        """,
        "token_entropy": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents
            ), cnt AS (
                SELECT doc_id, token, count(*) AS c
                FROM tok GROUP BY doc_id, token
            ), agg AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                       count(*) AS n_distinct,
                       list(c ORDER BY token) AS cs
                FROM cnt GROUP BY doc_id
            )
            SELECT doc_id, n AS n_tokens, n_distinct AS n_distinct_tokens,
                   round(ln(CAST(n AS DOUBLE))
                         - list_reduce(list_transform(cs,
                               c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))),
                               (a, b) -> a + b) / CAST(n AS DOUBLE),
                         6) + 0.0 AS entropy
            FROM agg
        """,
        "mixture_sample": """
            WITH h AS (
                SELECT doc_id, source,
                       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS hm
                FROM documents
            ), c AS (
                SELECT doc_id, source,
                       CASE WHEN source = 'src0' THEN 2 + CASE WHEN hm < 5000 THEN 1 ELSE 0 END
                            WHEN source = 'src1' THEN 1 + CASE WHEN hm < 0 THEN 1 ELSE 0 END
                            WHEN source = 'src2' THEN 0 + CASE WHEN hm < 2500 THEN 1 ELSE 0 END
                            ELSE 0 + CASE WHEN hm < 5000 THEN 1 ELSE 0 END END AS n_copies
                FROM h
            )
            SELECT doc_id, source,
                   unnest(range(1, n_copies + 1)) AS copy_id
            FROM c WHERE n_copies >= 1
        """,
        "cohort_retention": """
            WITH first AS (
                SELECT o_custkey,
                       CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP)
                           AS cohort_month
                FROM orders GROUP BY o_custkey
            )
            SELECT f.cohort_month,
                   CAST(datediff('month', f.cohort_month,
                                 date_trunc('month', o.o_orderdate)) AS INT)
                       AS month_offset,
                   count(DISTINCT o.o_custkey) AS active_customers
            FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
            GROUP BY 1, 2
        """,
        "event_transitions": """
            WITH pairs AS (
                SELECT event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY event_id) AS next_type
                FROM events
            ), agg AS (
                SELECT event_type, next_type, count(*) AS cnt
                FROM pairs WHERE next_type IS NOT NULL
                GROUP BY event_type, next_type
            )
            SELECT event_type, next_type, cnt,
                   round(CAST(cnt AS DOUBLE)
                         / CAST(sum(cnt) OVER (PARTITION BY event_type)
                                AS DOUBLE), 6) + 0.0 AS p_transition
            FROM agg
        """,
        "login_streaks": """
            WITH days AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS DATE) AS d
                FROM events
            ), runs AS (
                SELECT user_id, d,
                       datediff('day', DATE '1970-01-01', d)
                         - row_number() OVER (PARTITION BY user_id ORDER BY d)
                           AS anchor
                FROM days
            ), r2 AS (
                SELECT user_id, anchor, count(*) AS len, min(d) AS start
                FROM runs GROUP BY user_id, anchor
            )
            SELECT user_id, max(len) AS longest_streak,
                   CAST(sum(len) AS BIGINT) AS n_active_days,
                   count(*) AS n_streaks,
                   min(start) AS first_active_day
            FROM r2 GROUP BY user_id
        """,
        "pareto_customers": """
            WITH rev AS (
                SELECT o_custkey,
                       sum(CAST(o_totalprice AS DECIMAL(12,2))) AS r
                FROM orders GROUP BY o_custkey
            ), sh AS (
                SELECT o_custkey, CAST(r AS DOUBLE) AS revenue,
                       round(CAST(sum(r) OVER (ORDER BY r DESC, o_custkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                             AS DOUBLE)
                             / CAST(sum(r) OVER () AS DOUBLE), 6) + 0.0
                           AS cum_share
                FROM rev
            )
            SELECT o_custkey, revenue, cum_share,
                   CASE WHEN cum_share <= 0.8 THEN 'A'
                        WHEN cum_share <= 0.95 THEN 'B'
                        ELSE 'C' END AS pareto_class
            FROM sh
        """,
        "fuzzy_name_match": """
            WITH v AS (
                SELECT c_custkey, c_name,
                       unnest(list_append(list_transform(
                           range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, CAST(i AS INT) - 1)
                                || substr(c_name, CAST(i AS INT) + 1)),
                           c_name)) AS variant
                FROM customer
            ), cand AS (
                SELECT DISTINCT a.c_custkey AS a_custkey,
                                b.c_custkey AS b_custkey,
                                a.c_name AS an, b.c_name AS bn
                FROM v a JOIN v b
                  ON a.variant = b.variant
                 AND (a.c_name < b.c_name OR (a.c_name = b.c_name
                      AND a.c_custkey < b.c_custkey))
            )
            SELECT a_custkey, b_custkey,
                   CAST(levenshtein(an, bn) AS INT) AS edit_distance
            FROM cand WHERE levenshtein(an, bn) <= 1
        """,
        "regr_trend": """
            WITH daily AS (
                SELECT c.c_mktsegment, CAST(o.o_orderdate AS DATE) AS d,
                       CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2)))
                            AS DECIMAL(18,2)) AS y
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2
            ), dd AS (
                SELECT c_mktsegment,
                       CAST(datediff('day', DATE '1995-01-01', d) AS BIGINT)
                           AS x,
                       y
                FROM daily
            ), st AS (
                SELECT c_mktsegment, count(*) AS n_days,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(CAST(x AS DECIMAL(10,0)) * y) AS DOUBLE)
                           AS sxy,
                       CAST(sum(x * x) AS DOUBLE) AS sxx
                FROM dd GROUP BY c_mktsegment
            )
            SELECT c_mktsegment, n_days,
                   round((CAST(n_days AS DOUBLE) * sxy - sx * sy)
                         / (CAST(n_days AS DOUBLE) * sxx - sx * sx), 6) + 0.0
                       AS slope,
                   round((sy - ((CAST(n_days AS DOUBLE) * sxy - sx * sy)
                                / (CAST(n_days AS DOUBLE) * sxx - sx * sx))
                               * sx)
                         / CAST(n_days AS DOUBLE), 6) + 0.0 AS intercept
            FROM st
        """,
        "tfidf_search": """
            WITH tf AS (
                SELECT doc_id,
                       len(list_filter(string_split(text, ' '), x -> x = 'spark'))  AS tf0,
                       len(list_filter(string_split(text, ' '), x -> x = 'join'))   AS tf1,
                       len(list_filter(string_split(text, ' '), x -> x = 'window')) AS tf2
                FROM documents WHERE text IS NOT NULL
            ), stats AS (
                SELECT count(*) AS n,
                       CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                       CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                       CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
                FROM tf
            )
            SELECT doc_id,
                   round(
                     CASE WHEN tf0 > 0 AND df0 > 0
                          THEN (1.0 + ln(CAST(tf0 AS DOUBLE)))
                               * ln(CAST(n AS DOUBLE) / CAST(df0 AS DOUBLE))
                          ELSE 0.0 END
                   + CASE WHEN tf1 > 0 AND df1 > 0
                          THEN (1.0 + ln(CAST(tf1 AS DOUBLE)))
                               * ln(CAST(n AS DOUBLE) / CAST(df1 AS DOUBLE))
                          ELSE 0.0 END
                   + CASE WHEN tf2 > 0 AND df2 > 0
                          THEN (1.0 + ln(CAST(tf2 AS DOUBLE)))
                               * ln(CAST(n AS DOUBLE) / CAST(df2 AS DOUBLE))
                          ELSE 0.0 END
                   , 6) + 0.0 AS score
            FROM tf, stats
            ORDER BY score DESC, doc_id
            LIMIT 20
        """,
        "campaign_overlap": """
            WITH fulfil AS (
                SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p,
                       o_orderdate AS fs,
                       o_orderdate + INTERVAL 7 DAY AS fe
                FROM orders
            ), camps AS (
                SELECT DISTINCT
                       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           AS cs,
                       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           + INTERVAL 10 DAY AS ce
                FROM orders
            )
            SELECT c.cs AS camp_start, count(*) AS n_orders,
                   CAST(sum(f.p) AS DOUBLE) AS revenue
            FROM fulfil f JOIN camps c ON f.fs < c.ce AND c.cs < f.fe
            GROUP BY c.cs
        """,
        "heavy_hitter_tokens": """
            WITH tok AS (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM documents
            )
            SELECT token, count(*) AS cnt
            FROM tok GROUP BY token
            ORDER BY cnt DESC, token LIMIT 20
        """,
        "quantized_ann": f"""
            WITH ev AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ), m AS (
                SELECT vec_id, e,
                       list_max(list_transform(e, x -> abs(x))) AS amax
                FROM ev
            ), s AS (
                SELECT vec_id, e,
                       CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END
                           AS scale
                FROM m
            ), q8 AS (
                SELECT vec_id,
                       list_transform(e, x -> CAST(floor(x * scale + 0.5)
                                                   AS INT)) AS qvec
                FROM s
            ), sc AS (
                SELECT vec_id,
                       CAST(list_sum(list_transform(generate_series(1, 64),
                            i -> CAST(qvec[i] AS BIGINT)
                                 * ({_qq_sql})[i])) AS DOUBLE)
                       / (sqrt(CAST(list_sum(list_transform(qvec,
                              x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)))
                              AS DOUBLE)) * CAST('{_qn!r}' AS DOUBLE)) AS cos
                FROM q8
            )
            SELECT vec_id, round(cos, 6) + 0.0 AS qcos_sim
            FROM sc ORDER BY cos DESC, vec_id LIMIT 10
        """,
        "gopher_rules": """
            WITH w AS (
                SELECT doc_id, text, string_split(lower(text), ' ') AS ws,
                       length(text) AS nc
                FROM documents
            ), base AS (
                SELECT doc_id,
                       CAST(len(ws) AS BIGINT) AS n_words,
                       round(CAST(nc - (len(ws) - 1) AS DOUBLE) / len(ws), 6)
                           + 0.0 AS mean_word_len,
                       round(CAST(len(list_filter(ws,
                                 x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                             / len(ws), 6) + 0.0 AS frac_alpha_words,
                       CAST(len(list_intersect(list_distinct(ws),
                            ['the','be','to','of','and','that','have','with']))
                            AS BIGINT) AS stopword_hits,
                       round(CAST((nc - length(replace(text, '#', '')))
                                  + (nc - length(replace(text, '...', ''))) // 3
                                  AS DOUBLE) / len(ws), 6) + 0.0
                           AS symbol_ratio
                FROM w
            ), bgc AS (
                SELECT doc_id, bigram, count(*) AS c
                FROM (
                    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                        i -> ws[CAST(i AS INT)] || ' '
                             || ws[CAST(i AS INT) + 1])) AS bigram
                    FROM w WHERE len(ws) >= 2
                ) GROUP BY doc_id, bigram
            ), share AS (
                SELECT doc_id,
                       round(max(c) / CAST(sum(c) AS DOUBLE), 6) + 0.0
                           AS top_bigram_share
                FROM bgc GROUP BY doc_id
            )
            SELECT b.doc_id, b.n_words, b.mean_word_len, b.frac_alpha_words,
                   b.stopword_hits, b.symbol_ratio, s.top_bigram_share,
                   (b.n_words >= 10 AND b.n_words <= 100000
                    AND b.mean_word_len >= 3.0 AND b.mean_word_len <= 10.0
                    AND b.frac_alpha_words >= 0.8 AND b.stopword_hits >= 1
                    AND b.symbol_ratio < 0.1
                    AND COALESCE(s.top_bigram_share, 0.0) < 0.18) AS keep
            FROM base b LEFT JOIN share s ON b.doc_id = s.doc_id
        """,
        "contamination_score": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM toks WHERE len(l) >= 3
            ),
            ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
            tr AS (SELECT * FROM sh WHERE doc_id >= 20),
            agg AS (
                SELECT doc_id, count(*) AS n_shingles,
                       CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev)
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
                FROM tr GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
                   CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
                   CASE WHEN coalesce(a.n_shingles, 0) > 0
                        THEN round(a.n_hits / CAST(a.n_shingles AS DOUBLE), 6) + 0.0
                        ELSE 0.0 END AS containment,
                   CASE WHEN coalesce(a.n_shingles, 0) > 0
                        THEN round(a.n_hits / CAST(a.n_shingles AS DOUBLE), 6) + 0.0
                        ELSE 0.0 END >= 0.8 AS contaminated
            FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id >= 20) d
            LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "mixture_weights": """
            WITH per AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY source
            ), tot AS (
                SELECT CAST(sum(n_tokens) AS DOUBLE) AS t,
                       sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z
                FROM per
            )
            SELECT source, n_docs, n_tokens,
                   round(n_tokens / t, 6) + 0.0 AS natural_share,
                   round(pow(CAST(n_tokens AS DOUBLE), 0.5) / z, 6) + 0.0
                       AS weight
            FROM per, tot
        """,
        "rp_project": _RP_ORACLE,
        "simhash_pairs": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
                          FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
                FROM toks WHERE len(l) >= 3
            ),
            hx AS (SELECT doc_id,
                          CAST(concat('0x', substr(md5(shingle), 9, 8))
                               AS BIGINT) AS hx
                   FROM sh),
            bits AS (SELECT unnest(generate_series(0, 31)) AS b),
            votes AS (
                SELECT doc_id, b,
                       sum(CASE WHEN (hx >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM hx CROSS JOIN bits GROUP BY doc_id, b
            ),
            sig AS (
                SELECT doc_id,
                       sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << b)
                           ELSE 0 END) AS s
                FROM votes GROUP BY doc_id
            ),
            bands AS (
                SELECT doc_id, s, j, (s >> (CAST(j AS INT) * 8)) & 255 AS bkey
                FROM sig CROSS JOIN range(0, 4) r(j)
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                                a.s AS sa, b.s AS sb
                FROM bands a JOIN bands b
                  ON a.j = b.j AND a.bkey = b.bkey AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "normalize_text": r"""
            WITH n AS (
                SELECT doc_id, text,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[\x00-\x08\x0e-\x1f\x7f]', '', 'g'),
                            '[ \t\n\r\x0b\x0c]+', ' ', 'g')) AS norm_text
                FROM documents
            )
            SELECT doc_id, norm_text, norm_text <> text AS changed FROM n
        """,
        "doc_keywords": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                FROM documents
            ), tf AS (
                SELECT doc_id, token, count(*) AS tf
                FROM tok GROUP BY doc_id, token
            ), dfq AS (
                SELECT token, count(*) AS df FROM tf GROUP BY token
            ), nn AS (
                SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
            ), scored AS (
                SELECT doc_id, token,
                       round((1.0 + ln(tf)) * ln(n / df), 6) + 0.0 AS score
                FROM tf JOIN dfq USING (token), nn
            ), r AS (
                SELECT doc_id, token, score,
                       CAST(row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, token) AS INT) AS rank
                FROM scored
            )
            SELECT doc_id, token, score, rank FROM r WHERE rank <= 3
        """,
        "bloom_membership": """
            WITH bpos AS (
                SELECT ((6*i+7) * CAST(concat('0x',
                            substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                            AS BIGINT) + (3*i+1)) % 65536 AS pos
                FROM orders CROSS JOIN range(0, 4) t(i)
            ), words AS (
                SELECT pos // 32 AS word,
                       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))
                           AS bits
                FROM bpos GROUP BY 1
            ), cpos AS (
                SELECT c_custkey AS key,
                       ((6*i+7) * CAST(concat('0x',
                            substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                            AS BIGINT) + (3*i+1)) % 65536 AS pos
                FROM customer CROSS JOIN range(0, 4) t(i)
            ), probe AS (
                SELECT key,
                       CASE WHEN (COALESCE(w.bits, 0)
                                  & (CAST(1 AS BIGINT)
                                     << CAST(pos % 32 AS INT))) <> 0
                            THEN 1 ELSE 0 END AS hit
                FROM cpos LEFT JOIN words w ON cpos.pos // 32 = w.word
            )
            SELECT key, sum(hit) = 4 AS member FROM probe GROUP BY key
        """,
        "ohlc_resample": """
            WITH base AS (
                SELECT user_id AS key,
                       (epoch_us(ts) // 1000000)
                           - ((epoch_us(ts) // 1000000) % 3600)
                           AS bucket_start_s,
                       ts, event_id, CAST(value AS DECIMAL(18,4)) AS v
                FROM events
            ), w AS (
                SELECT *,
                       row_number() OVER (PARTITION BY key, bucket_start_s
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (PARTITION BY key, bucket_start_s
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM base
            )
            SELECT key, bucket_start_s,
                   CAST(max(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
                   CAST(max(v) AS DOUBLE) AS high,
                   CAST(min(v) AS DOUBLE) AS low,
                   CAST(max(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close,
                   count(*) AS n
            FROM w GROUP BY key, bucket_start_s
        """,
        "skew_report": """
            WITH per AS (
                SELECT user_id AS key, count(*) AS cnt
                FROM events GROUP BY 1
            ), stats AS (
                SELECT count(*) AS n_keys, sum(cnt) AS total_rows,
                       max(cnt) AS mx
                FROM per
            ), top AS (
                SELECT key, cnt,
                       row_number() OVER (ORDER BY cnt DESC, key) AS rank
                FROM per ORDER BY cnt DESC, key LIMIT 10
            )
            SELECT key, cnt,
                   round(cnt / CAST(total_rows AS DOUBLE), 6) + 0.0 AS share,
                   CAST(rank AS INT) AS rank,
                   n_keys, CAST(total_rows AS BIGINT) AS total_rows,
                   round(total_rows / CAST(n_keys AS DOUBLE), 6) + 0.0
                       AS mean_per_key,
                   round(mx * n_keys / CAST(total_rows AS DOUBLE), 6) + 0.0
                       AS skew_factor
            FROM top, stats
        """,
        "kfold_split": """
            SELECT doc_id,
                   CAST(CAST(concat('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 5 AS INT) AS fold
            FROM documents
        """,
        "quantile_normalize": """
            SELECT event_id, event_type, value,
                   round(percent_rank() OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id), 6) + 0.0 AS pct
            FROM events
        """,
        "entity_resolution": """
            WITH RECURSIVE c AS (
                SELECT c_custkey, c_name FROM customer WHERE c_custkey < 400
            ), v AS (
                SELECT c_custkey, c_name,
                       unnest(list_append(list_transform(
                           range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, CAST(i AS INT) - 1)
                                || substr(c_name, CAST(i AS INT) + 1)),
                           c_name)) AS variant
                FROM c
            ), cand AS (
                SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb,
                                a.c_name AS an, b.c_name AS bn
                FROM v a JOIN v b
                  ON a.variant = b.variant
                 AND (a.c_name < b.c_name OR (a.c_name = b.c_name
                      AND a.c_custkey < b.c_custkey))
            ), p AS (
                SELECT ka, kb FROM cand WHERE levenshtein(an, bn) <= 1
            ), e AS (
                SELECT ka AS u, kb AS v FROM p
                UNION
                SELECT kb, ka FROM p
            ), reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            )
            SELECT u AS c_custkey, least(u, min(v)) AS cluster_id
            FROM reach GROUP BY u
        """,
        "bloom_pruned_revenue": """
            WITH hv AS (
                SELECT c_custkey FROM customer WHERE c_acctbal > 5000
            ), bpos AS (
                SELECT ((6*i+7) * CAST(concat('0x',
                            substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                            AS BIGINT) + (3*i+1)) % 65536 AS pos
                FROM hv CROSS JOIN range(0, 4) t(i)
            ), words AS (
                SELECT pos // 32 AS word,
                       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))
                           AS bits
                FROM bpos GROUP BY 1
            ), ks AS (
                SELECT DISTINCT o_custkey FROM orders
            ), cpos AS (
                SELECT o_custkey AS key,
                       ((6*i+7) * CAST(concat('0x',
                            substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                            AS BIGINT) + (3*i+1)) % 65536 AS pos
                FROM ks CROSS JOIN range(0, 4) t(i)
            ), probe AS (
                SELECT key,
                       CASE WHEN (COALESCE(w.bits, 0)
                                  & (CAST(1 AS BIGINT)
                                     << CAST(pos % 32 AS INT))) <> 0
                            THEN 1 ELSE 0 END AS hit
                FROM cpos LEFT JOIN words w ON cpos.pos // 32 = w.word
            ), members AS (
                SELECT key FROM probe GROUP BY key HAVING sum(hit) = 4
            )
            SELECT CAST(year(o_orderdate) AS INT) AS year,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS revenue
            FROM orders JOIN members ON o_custkey = members.key
            GROUP BY 1
        """,
        "vwap_resample": """
            WITH b AS (
                SELECT l_returnflag AS key,
                       (epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 1000000)
                           - ((epoch_us(CAST(l_shipdate AS TIMESTAMP))
                               // 1000000) % 2592000) AS bucket_start_s,
                       CAST(l_extendedprice AS DECIMAL(18,4)) AS p,
                       CAST(l_quantity AS DECIMAL(18,4)) AS q
                FROM lineitem
            )
            SELECT key, bucket_start_s,
                   CAST(round(sum(p * q) / sum(q), 6) AS DOUBLE) AS vwap,
                   CAST(sum(q) AS DOUBLE) AS total_qty,
                   count(*) AS n
            FROM b GROUP BY key, bucket_start_s
        """,
        "dedup_within": """
            WITH RECURSIVE b AS (
                SELECT event_id, ts, user_id, event_type, value, props,
                       epoch_us(ts) AS t,
                       row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY epoch_us(ts), event_id) AS rn
                FROM events
            ), scan(user_id, event_type, rn, t, anchor, kept) AS (
                SELECT user_id, event_type, rn, t, t, TRUE
                FROM b WHERE rn = 1
                UNION ALL
                SELECT b.user_id, b.event_type, b.rn, b.t,
                       CASE WHEN b.t - s.anchor >= 3600000000
                            THEN b.t ELSE s.anchor END,
                       b.t - s.anchor >= 3600000000
                FROM scan s JOIN b ON b.user_id = s.user_id
                 AND b.event_type = s.event_type AND b.rn = s.rn + 1
            )
            SELECT b.event_id, b.ts, b.user_id, b.event_type, b.value,
                   b.props, s.kept
            FROM b JOIN scan s ON b.user_id = s.user_id
             AND b.event_type = s.event_type AND b.rn = s.rn
        """,
        "corpus_report": """
            WITH f AS (
                SELECT source, md5(text) AS h,
                       CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE) AS n_distinct,
                       CAST(length(regexp_replace(text, '[0-9]', '', 'g'))
                            AS DOUBLE) AS n_nodigit,
                       CAST(length(regexp_replace(text, '[A-Z]', '', 'g'))
                            AS DOUBLE) AS n_noupper
                FROM documents
            ), z AS (
                SELECT source, h, CAST(n_tok AS BIGINT) AS nt,
                       CAST(round(1.0 / (1.0 + exp(-(
                           -1.0 + 0.6 * ln(n_tok + 1.0)
                                + 0.25 * ((n_chars - (n_tok - 1)) / n_tok)
                                + -3.0 * ((n_chars - n_nodigit) / n_chars)
                                + -2.0 * ((n_chars - n_noupper) / n_chars)
                                + 1.5 * (n_distinct / n_tok)))), 6)
                            AS DECIMAL(10,6)) AS q
                FROM f
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   CAST(round(sum(q) / count(*), 6) AS DOUBLE)
                       AS mean_quality,
                   count(DISTINCT h) AS n_distinct,
                   round((count(*) - count(DISTINCT h))
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS dup_rate
            FROM z GROUP BY source
        """,
        "weighted_sample": """
            SELECT doc_id, n_chars,
                   round(-ln((CAST(CAST(concat('0x',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)
                         / CAST(n_chars AS DOUBLE), 9) AS sample_key
            FROM documents
            ORDER BY sample_key, doc_id
            LIMIT 100
        """,
        "logreg_quality": _LOGREG_ORACLE,
        "pagerank_users": _PAGERANK_ORACLE,
        "bpe_learn_merges": _BPE_LEARN_ORACLE,
        "kmeans_clusters": _KMEANS_ORACLE,
        "ivf_ann_topk": _IVF_TOPK_ORACLE,
        "ann_ivf_all": _ANN_IVF_ALL_ORACLE,
        # ground-truth oracle DERIVED FROM THE DATA: byte-identical payloads
        # (the 20 planted clones at doc_id+1000000 AND any naturally
        # duplicated fixture texts — sf0.1 ships 8 such pairs) hash
        # identically (hamming 0), and no non-identical fixture pair falls
        # within the radius (verified sf0.001/sf0.01/sf0.1 by exhaustive
        # detector-vs-equality compare), so text-equality pairs over the
        # same union frame the query builds ARE the full expected result
        "phash_near_dup": """
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id < 20
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(0 AS INT) AS hamming
            FROM u a JOIN u b ON a.text = b.text AND a.doc_id < b.doc_id
        """,
        "classification_report": """
            WITH s AS (
                SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                       CASE WHEN n_chars > 250 THEN 1 ELSE 0 END AS p
                FROM documents
            ), agg AS (
                SELECT CAST(sum(CASE WHEN y=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                       CAST(sum(CASE WHEN y=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                       CAST(sum(CASE WHEN y=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                       CAST(sum(CASE WHEN y=0 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
                FROM s
            )
            -- guards mirror Spark's try_divide (NULL, never NaN/inf):
            -- precision/recall NULL on zero denominator; f1 is NULL
            -- whenever tp = 0 (prec or rec NULL, or try_divide(0,0))
            SELECT tp, fp, fn, tn,
                   CASE WHEN tp + fp > 0 THEN
                     round(tp / CAST(tp + fp AS DOUBLE), 6) + 0.0
                   END AS precision,
                   CASE WHEN tp + fn > 0 THEN
                     round(tp / CAST(tp + fn AS DOUBLE), 6) + 0.0
                   END AS recall,
                   CASE WHEN tp > 0 THEN
                     round(CAST(2.0 AS DOUBLE) * (tp / CAST(tp + fp AS DOUBLE))
                           * (tp / CAST(tp + fn AS DOUBLE))
                           / ((tp / CAST(tp + fp AS DOUBLE))
                              + (tp / CAST(tp + fn AS DOUBLE))), 6) + 0.0
                   END AS f1,
                   round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
                       + 0.0 AS accuracy
            FROM agg
        """,
        "psi_drift": """
            WITH oldv AS (
                SELECT value FROM events
                WHERE event_id % 2 = 0 AND value IS NOT NULL
            ), newv AS (
                SELECT value * CAST(1.1 AS DOUBLE) AS value
                FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
            ), pb AS (
                SELECT CASE WHEN value < CAST(0.0 AS DOUBLE) THEN -1
                            ELSE least(CAST(floor(value
                                / CAST(100.0 AS DOUBLE)) AS INT), 9) END
                           AS bucket, count(*) AS c
                FROM oldv GROUP BY 1
            ), pt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM pb),
            p AS (SELECT bucket, c / t AS p FROM pb, pt),
            qb AS (
                SELECT CASE WHEN value < CAST(0.0 AS DOUBLE) THEN -1
                            ELSE least(CAST(floor(value
                                / CAST(100.0 AS DOUBLE)) AS INT), 9) END
                           AS bucket, count(*) AS c
                FROM newv GROUP BY 1
            ), qt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM qb),
            q AS (SELECT bucket, c / t AS q FROM qb, qt),
            j AS (
                SELECT COALESCE(p.bucket, q.bucket) AS bucket,
                       COALESCE(p.p, CAST(0.0 AS DOUBLE)) AS p,
                       COALESCE(q.q, CAST(0.0 AS DOUBLE)) AS q
                FROM p FULL OUTER JOIN q ON p.bucket = q.bucket
            ), terms AS (
                SELECT bucket, p, q,
                       CAST(round((greatest(p, 1e-6) - greatest(q, 1e-6))
                            * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 9)
                            AS DECIMAL(15,9)) AS term
                FROM j
            ), tot AS (
                SELECT round(CAST(sum(term) AS DOUBLE), 6) AS psi FROM terms
            )
            SELECT bucket, round(p, 6) + 0.0 AS p, round(q, 6) + 0.0 AS q,
                   CAST(term AS DOUBLE) + 0.0 AS psi_term, psi + 0.0 AS psi
            FROM terms, tot
        """,
        "snapshot_diff": """
            WITH old AS (
                SELECT event_id, value AS old_value,
                       event_type AS old_event_type, 1 AS in_old
                FROM events WHERE event_id % 10 <> 0
            ), new AS (
                SELECT event_id,
                       CASE WHEN event_id % 3 = 0 THEN round(value + 1.0, 2)
                            ELSE value END AS new_value,
                       event_type AS new_event_type, 1 AS in_new
                FROM events WHERE event_id % 7 <> 0
            ), j AS (
                SELECT COALESCE(o.event_id, n.event_id) AS event_id,
                       o.old_value, o.old_event_type, o.in_old,
                       n.new_value, n.new_event_type, n.in_new
                FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
            )
            SELECT event_id,
                   CASE WHEN in_old IS NULL THEN 'added'
                        WHEN in_new IS NULL THEN 'removed'
                        WHEN old_value IS DISTINCT FROM new_value
                             OR old_event_type IS DISTINCT FROM new_event_type
                             THEN 'changed' END AS change_type,
                   old_value, old_event_type, new_value, new_event_type
            FROM j
            WHERE CASE WHEN in_old IS NULL THEN 'added'
                       WHEN in_new IS NULL THEN 'removed'
                       WHEN old_value IS DISTINCT FROM new_value
                            OR old_event_type IS DISTINCT FROM new_event_type
                            THEN 'changed' END IS NOT NULL
        """,
        "dsir_select": """
            WITH toks AS (
                SELECT doc_id, CAST(lang = 'en' AS INT) AS is_t,
                       string_split(lower(text), ' ') AS t
                FROM documents
            ), uni AS (
                SELECT doc_id, is_t, unnest(t) AS gram FROM toks
            ), bi AS (
                SELECT doc_id, is_t,
                       unnest(t[1 : len(t) - 1]) || ' ' || unnest(t[2 : len(t)]) AS gram
                FROM toks WHERE len(t) >= 2
            ), grams AS (
                SELECT doc_id, is_t,
                       CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) % 128 AS bucket
                FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
            ), per_doc AS (
                SELECT doc_id, bucket, count(*) AS cnt, max(is_t) AS is_t
                FROM grams GROUP BY doc_id, bucket
            ), buckets AS (
                SELECT bucket,
                       sum(CASE WHEN is_t = 1 THEN cnt ELSE 0 END) AS ct,
                       sum(cnt) AS cr
                FROM per_doc GROUP BY bucket
            ), tot AS (
                SELECT sum(ct) AS nt, sum(cr) AS nr FROM buckets
            ), lut AS (
                SELECT bucket,
                       CAST(round(ln((ct + 0.5) / (nt + 0.5 * 128))
                                  - ln((cr + 0.5) / (nr + 0.5 * 128)), 9)
                            AS DECIMAL(15,9)) AS ratio
                FROM buckets CROSS JOIN tot
            )
            SELECT p.doc_id, CAST(sum(p.cnt) AS BIGINT) AS n_grams,
                   round(CAST(sum(p.cnt * l.ratio) AS DOUBLE), 6) + 0.0 AS logweight
            FROM per_doc p JOIN lut l USING (bucket)
            GROUP BY p.doc_id
            ORDER BY logweight DESC, p.doc_id
            LIMIT 50
        """,
        "attribution_last_touch": """
            WITH j AS (
                SELECT p.value,
                       CASE WHEN c.ts IS NOT NULL
                                 AND p.ts - c.ts <= INTERVAL '604800 seconds'
                            THEN CAST(c.ts AS DATE) END AS click_day
                FROM (SELECT user_id, ts, value FROM events
                      WHERE event_type = 'purchase') p
                ASOF LEFT JOIN (SELECT user_id, ts FROM events
                                WHERE event_type = 'click') c
                  ON p.user_id = c.user_id AND p.ts >= c.ts
            )
            SELECT click_day,
                   CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_purchases
            FROM j GROUP BY click_day
        """,
        "value_quantile_sketch": """
            WITH b AS (
                SELECT event_type AS key,
                       CAST(least(greatest(floor((value - 0.0) / 15.625), 0), 63)
                            AS INT) AS bin
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
            ), counts AS (
                SELECT key, bin, count(*) AS cnt FROM b GROUP BY key, bin
            ), c AS (
                SELECT key, bin, cnt,
                       sum(cnt) OVER (PARTITION BY key ORDER BY bin
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum,
                       sum(cnt) OVER (PARTITION BY key) AS n
                FROM counts
            ), probes AS (
                SELECT c.*, q.q, CAST(greatest(ceil(q.q * c.n), 1) AS BIGINT) AS rnk
                FROM c CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)),
                                          (CAST(0.9 AS DOUBLE)),
                                          (CAST(0.99 AS DOUBLE))) q(q)
            )
            SELECT key, q,
                   round(0.0 + 15.625 * (bin + CAST(rnk - (cum - cnt) AS DOUBLE)
                                               / cnt), 6) AS est,
                   CAST(n AS BIGINT) AS n
            FROM probes WHERE cum >= rnk AND cum - cnt < rnk
        """,
        "curriculum_order": """
            WITH r1 AS (
                SELECT doc_id,
                       row_number() OVER (
                           ORDER BY -CAST(n_chars AS DOUBLE), doc_id) AS grk,
                       count(*) OVER () AS n,
                       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) AS shuf
                FROM documents
            ), staged AS (
                SELECT doc_id, shuf,
                       CAST(floor((grk - 1) * 4 / n) AS INT) AS stage
                FROM r1
            )
            SELECT doc_id, stage,
                   row_number() OVER (PARTITION BY stage
                                      ORDER BY shuf, doc_id) AS within_pos
            FROM staged
        """,
        "novelty_score": """
            WITH toks AS (
                SELECT doc_id, string_split(lower(text), ' ') AS l
                FROM documents
            ), g AS (
                SELECT DISTINCT doc_id, unnest(list_transform(
                    generate_series(1, len(l) - 2),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
                FROM toks WHERE len(l) >= 3
            ), f AS (
                SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
            )
            SELECT g.doc_id, count(*) AS n_grams,
                   CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS novel,
                   round(sum(CASE WHEN f.first_doc = g.doc_id
                                  THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS novelty
            FROM g JOIN f USING (gram)
            GROUP BY g.doc_id
        """,
        "seasonal_anomalies": """
            WITH base AS (
                SELECT event_type AS etype, extract(hour FROM ts) AS bh,
                       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                           / count(*) AS mu
                FROM events GROUP BY 1, 2
            )
            SELECT e.event_id, e.event_type,
                   CAST(extract(hour FROM e.ts) AS INT) AS hod, e.value,
                   round(e.value - b.mu, 6) AS residual
            FROM events e JOIN base b
              ON e.event_type = b.etype
             AND extract(hour FROM e.ts) = b.bh
            ORDER BY abs(round(e.value - b.mu, 6)) DESC, e.event_id
            LIMIT 20
        """,
        "cdc_apply_changes": """
            WITH ev AS (
                SELECT event_id, user_id, event_type, value FROM events
            ), snap AS (
                SELECT * FROM ev WHERE event_id % 10 <> 0
            ), changes AS (
                SELECT event_id, user_id, event_type,
                       CASE WHEN event_id % 7 = 0 THEN value
                            ELSE value + 1.0 END AS value,
                       CASE WHEN event_id % 7 = 0 THEN 'delete'
                            ELSE 'upsert' END AS op
                FROM ev WHERE event_id % 7 = 0 OR event_id % 3 = 0
            )
            SELECT s.event_id, s.user_id, s.event_type, s.value
            FROM snap s
            WHERE NOT EXISTS (SELECT 1 FROM changes c
                              WHERE c.event_id = s.event_id)
            UNION ALL
            SELECT event_id, user_id, event_type, value
            FROM changes WHERE op = 'upsert'
        """,
        "target_encoding": """
            WITH base AS (
                SELECT event_id, event_type, value,
                       CAST(CAST(concat('0x',
                            substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 5 AS INT) AS fold
                FROM events
            ), per_cat AS (
                SELECT event_type AS c,
                       sum(CAST(value AS DECIMAL(18,4))) AS s,
                       count(*) AS n
                FROM base GROUP BY 1
            ), per_cf AS (
                SELECT event_type AS c, fold AS f,
                       sum(CAST(value AS DECIMAL(18,4))) AS sf,
                       count(*) AS nf
                FROM base GROUP BY 1, 2
            ), prior AS (
                SELECT CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       / count(*) AS p
                FROM events
            )
            SELECT b.event_id, b.event_type, b.value, b.fold,
                   round((CAST(pc.s - pf.sf AS DOUBLE) + 20.0 * prior.p)
                         / (pc.n - pf.nf + 20.0), 6) + 0.0 AS te
            FROM base b
            JOIN per_cat pc ON b.event_type = pc.c
            JOIN per_cf pf ON b.event_type = pf.c AND b.fold = pf.f
            CROSS JOIN prior
        """,
        "pii_luhn": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' card '
                       || lpad(CAST((doc_id * 48271) % 100000000 AS VARCHAR),
                               8, '0')
                       || lpad(CAST((doc_id * 16807) % 100000000 AS VARCHAR),
                               8, '0') AS text
                FROM documents
            ), cand AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text,
                              '[0-9][0-9 -]*[0-9]')) AS raw
                FROM aug
            ), flt AS (
                SELECT doc_id, regexp_replace(raw, '[^0-9]', '', 'g') AS dg
                FROM cand
                WHERE length(regexp_replace(raw, '[^0-9]', '', 'g'))
                      BETWEEN 13 AND 19
            ), luhn AS (
                SELECT doc_id, dg,
                       list_sum(list_transform(
                           generate_series(1, length(dg)),
                           i -> CASE WHEN i % 2 = 0
                                THEN CASE WHEN CAST(substr(reverse(dg), i, 1)
                                               AS INT) * 2 > 9
                                     THEN CAST(substr(reverse(dg), i, 1)
                                          AS INT) * 2 - 9
                                     ELSE CAST(substr(reverse(dg), i, 1)
                                          AS INT) * 2 END
                                ELSE CAST(substr(reverse(dg), i, 1) AS INT)
                                END)) AS tot
                FROM flt
            )
            SELECT doc_id, substr(dg, length(dg) - 3, 4) AS last4,
                   CAST(length(dg) AS INT) AS n_digits
            FROM luhn WHERE tot % 10 = 0
        """,
        "boolean_retrieval": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), f AS (
                SELECT doc_id,
                       len(list_filter(l, x -> x = 'spark')) AS tf_0,
                       len(list_filter(l, x -> x = 'join')) AS tf_1,
                       len(list_filter(l, x -> x = 'window')) AS tf_2
                FROM t
            )
            SELECT doc_id, CAST(tf_0 AS INT) AS tf_0,
                   CAST(tf_1 AS INT) AS tf_1, CAST(tf_2 AS INT) AS tf_2,
                   CAST(3 AS INT) AS n_terms_matched
            FROM f WHERE tf_0 > 0 AND tf_1 > 0 AND tf_2 > 0
        """,
        # replays holt_linear's exact per-key recurrence: each step is the
        # SAME fixed-order IEEE expression with the same double factors
        # (0.45/0.35 — non-dyadic on purpose, see q_holt_trend), so the
        # recursive CTE reproduces the numpy fold bit-for-bit
        "holt_trend": """
            WITH RECURSIVE o AS (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id) AS rn
                FROM events
            ), h AS (
                SELECT user_id, event_id, value, rn,
                       CAST(value AS DOUBLE) AS level,
                       CAST(0.0 AS DOUBLE) AS trend
                FROM o WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.event_id, o.value, o.rn,
                       0.45 * o.value
                       + (1.0 - 0.45) * (h.level + h.trend) AS level,
                       0.35 * ((0.45 * o.value
                                + (1.0 - 0.45) * (h.level + h.trend))
                               - h.level)
                       + (1.0 - 0.35) * h.trend AS trend
                FROM o JOIN h ON o.user_id = h.user_id AND o.rn = h.rn + 1
            )
            SELECT event_id, user_id, value,
                   CAST(floor(level * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0 + 0.0 AS level,
                   CAST(floor(trend * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0 + 0.0 AS trend
            FROM h
        """,
        "blocking_report": """
            WITH v AS (SELECT DISTINCT p_name AS w FROM part),
            pairs AS (
                SELECT CAST(substr(a.w, 1, 4) = substr(b.w, 1, 4) AS INT)
                           AS blocked,
                       CAST(round(jaro_winkler_similarity(a.w, b.w), 6)
                            >= 0.86 AS INT) AS is_match
                FROM v a JOIN v b ON a.w < b.w
            )
            SELECT count(*) AS total_pairs,
                   CAST(sum(blocked) AS BIGINT) AS candidate_pairs,
                   CAST(sum(is_match) AS BIGINT) AS true_matches,
                   CAST(sum(blocked * is_match) AS BIGINT) AS matched_in_candidates,
                   round(1.0 - sum(blocked) / CAST(count(*) AS DOUBLE), 6)
                       + 0.0 AS reduction_ratio,
                   round(sum(blocked * is_match)
                         / CAST(sum(is_match) AS DOUBLE), 6) + 0.0
                       AS pair_completeness
            FROM pairs
        """,
        "neyman_sample": """
            WITH mom AS (
                SELECT event_type AS stratum, count(*) AS n_stratum,
                       sum(CAST(value AS DECIMAL(18,4))) AS sx,
                       sum(CAST(value AS DECIMAL(18,4))
                           * CAST(value AS DECIMAL(18,4))) AS sxx
                FROM events GROUP BY 1
            ), m2 AS (
                SELECT stratum, n_stratum,
                       round(sqrt(greatest((CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                     / n_stratum) / n_stratum, 0.0)), 6)
                           AS sigma
                FROM mom
            ), w AS (
                SELECT stratum, n_stratum, sigma,
                       n_stratum * CAST(sigma AS DECIMAL(18,6)) AS wgt
                FROM m2
            ), tot AS (SELECT sum(wgt) AS tw, sum(n_stratum) AS tn FROM w),
            alloc AS (
                SELECT stratum, n_stratum, sigma,
                       CAST(floor(CASE WHEN tw > 0
                                  THEN 1000 * CAST(wgt AS DOUBLE)
                                       / CAST(tw AS DOUBLE)
                                  ELSE 1000 * CAST(n_stratum AS DOUBLE)
                                       / CAST(tn AS DOUBLE) END) AS BIGINT)
                           AS alloc
                FROM w CROSS JOIN tot
            ), ranked AS (
                SELECT event_type AS stratum, event_id,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY CAST(concat('0x',
                               substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                               AS BIGINT), event_id) AS rk
                FROM events
            ), kept AS (
                SELECT r.stratum, count(*) AS n_kept,
                       sum(r.event_id) AS kept_id_sum
                FROM ranked r JOIN alloc a USING (stratum)
                WHERE r.rk <= a.alloc GROUP BY r.stratum
            )
            SELECT a.stratum, a.n_stratum, a.sigma, a.alloc,
                   CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(COALESCE(k.kept_id_sum, 0) AS BIGINT) AS kept_id_sum
            FROM alloc a LEFT JOIN kept k ON a.stratum = k.stratum
        """,
        "calibration_report": """
            WITH d AS (
                SELECT round(1.0 / (1.0 + exp(-((len(string_split(text, ' ')) - 60)
                                                / 30.0))), 6) AS p,
                       CAST(lang = 'en' AS INT) AS y
                FROM documents
            )
            SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
                   count(*) AS n,
                   round(CAST(sum(CAST(p AS DECIMAL(10,6))) AS DOUBLE)
                         / count(*), 6) + 0.0 AS avg_pred,
                   round(sum(y) / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS obs_rate,
                   round(CAST(sum(CAST(round((p - y) * (p - y), 9)
                                       AS DECIMAL(12,9))) AS DOUBLE)
                         / count(*), 6) + 0.0 AS brier
            FROM d GROUP BY 1
        """,
        "cluster_silhouette": """
            WITH e AS (
                SELECT label, unnest(embedding) AS v,
                       unnest(range(0, len(embedding))) AS pos
                FROM embeddings
            ), cl AS (
                SELECT label, pos, count(*) AS n,
                       list(CAST(v AS DOUBLE) ORDER BY CAST(v AS DOUBLE)) AS vs
                FROM e GROUP BY label, pos
            ), cent_long AS (
                SELECT label, pos,
                       round(list_reduce(vs, (x, y) -> x + y) / n, 6) + 0.0 AS cv
                FROM cl
            ), cent AS (
                SELECT label AS clb, list(cv ORDER BY pos) AS c
                FROM cent_long GROUP BY label
            ), dist AS (
                SELECT v.vec_id, v.label, c.clb,
                       sqrt(list_reduce(list_transform(
                           generate_series(1, len(v.embedding)),
                           i -> (CAST(v.embedding[i] AS DOUBLE) - c.c[i])
                                * (CAST(v.embedding[i] AS DOUBLE) - c.c[i])),
                           (x, y) -> x + y)) AS d
                FROM embeddings v CROSS JOIN cent c
            ), ab AS (
                SELECT vec_id, label,
                       min(CASE WHEN clb = label THEN d END) AS a,
                       min(CASE WHEN clb <> label THEN d END) AS b
                FROM dist GROUP BY vec_id, label
            ), s AS (
                SELECT label,
                       CAST(round(CASE WHEN greatest(a, b) = 0 THEN 0.0
                                       ELSE (b - a) / greatest(a, b) END, 9)
                            AS DECIMAL(12,9)) AS sv
                FROM ab
            )
            SELECT label, count(*) AS n,
                   round(CAST(sum(sv) AS DOUBLE) / count(*), 6) + 0.0
                       AS silhouette
            FROM s GROUP BY label
        """,
        "oov_rate": """
            WITH toks AS (
                SELECT source, unnest(string_split(lower(text), ' ')) AS token
                FROM documents
            ), v AS (
                SELECT token FROM (
                    SELECT token, count(*) AS freq FROM toks
                    WHERE regexp_matches(token, '^[a-z]+$')
                    GROUP BY token ORDER BY freq DESC, token LIMIT 30
                )
            )
            SELECT source, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN token NOT IN (SELECT token FROM v)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                   round(sum(CASE WHEN token NOT IN (SELECT token FROM v)
                                  THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS oov_rate
            FROM toks GROUP BY source
        """,
        "segment_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), idx AS (
                SELECT doc_id, t,
                       unnest(generate_series(0,
                           CAST(ceil(len(t) / 8.0) AS INT) - 1)) AS pos
                FROM toks
            ), segs AS (
                SELECT doc_id, pos,
                       array_to_string(t[(pos*8+1):((pos+1)*8)], ' ') AS seg
                FROM idx
            ), kept AS (
                SELECT doc_id, pos, seg,
                       row_number() OVER (PARTITION BY seg
                                          ORDER BY doc_id, pos) AS rn
                FROM segs
            ), tot AS (
                SELECT doc_id, count(*) AS n_total FROM segs GROUP BY doc_id
            )
            SELECT k.doc_id,
                   string_agg(k.seg, ' ' ORDER BY k.pos) AS dedup_text,
                   count(*) AS n_kept,
                   min(t.n_total) - count(*) AS n_dropped
            FROM kept k JOIN tot t ON k.doc_id = t.doc_id
            WHERE k.rn = 1
            GROUP BY k.doc_id
        """,
        "quantile_error_report": """
            WITH b AS (
                SELECT event_type AS key,
                       CAST(least(greatest(floor((value - 0.0) / 15.625), 0), 63)
                            AS INT) AS bin
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
            ), counts AS (
                SELECT key, bin, count(*) AS cnt FROM b GROUP BY key, bin
            ), c AS (
                SELECT key, bin, cnt,
                       sum(cnt) OVER (PARTITION BY key ORDER BY bin
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum,
                       sum(cnt) OVER (PARTITION BY key) AS n
                FROM counts
            ), probes AS (
                SELECT c.*, q.q, CAST(greatest(ceil(q.q * c.n), 1) AS BIGINT) AS rnk
                FROM c CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)),
                                          (CAST(0.9 AS DOUBLE)),
                                          (CAST(0.99 AS DOUBLE))) q(q)
            ), sk AS (
                SELECT key, q,
                       round(0.0 + 15.625 * (bin + CAST(rnk - (cum - cnt) AS DOUBLE)
                                                   / cnt), 6) AS est,
                       CAST(n AS BIGINT) AS n
                FROM probes WHERE cum >= rnk AND cum - cnt < rnk
            ), ex AS (
                SELECT event_type AS key, CAST(0.5 AS DOUBLE) AS q,
                       round(quantile_cont(value, 0.5), 6) AS exact
                FROM events GROUP BY 1
                UNION ALL
                SELECT event_type, CAST(0.9 AS DOUBLE),
                       round(quantile_cont(value, 0.9), 6)
                FROM events GROUP BY 1
                UNION ALL
                SELECT event_type, CAST(0.99 AS DOUBLE),
                       round(quantile_cont(value, 0.99), 6)
                FROM events GROUP BY 1
            )
            SELECT s.key, s.q, s.est, e.exact,
                   round(abs(s.est - e.exact), 6) AS abs_err, s.n
            FROM sk s JOIN ex e ON s.key = e.key AND s.q = e.q
        """,
        "fuzzy_vocab_jw": """
            WITH v AS (SELECT DISTINCT p_name AS w FROM part)
            SELECT a.w AS w1, b.w AS w2,
                   round(jaro_winkler_similarity(a.w, b.w), 6) AS jw
            FROM v a JOIN v b
              ON substr(a.w, 1, 4) = substr(b.w, 1, 4)
             AND a.w < b.w
            WHERE round(jaro_winkler_similarity(a.w, b.w), 6) >= 0.86
        """,
        "rrf_fusion": """
            WITH tf AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS dl,
                       len(list_filter(string_split(text, ' '), x -> x = 'spark'))  AS tf0,
                       len(list_filter(string_split(text, ' '), x -> x = 'join'))   AS tf1,
                       len(list_filter(string_split(text, ' '), x -> x = 'window')) AS tf2
                FROM documents WHERE text IS NOT NULL
            ), stats AS (
                SELECT count(*) AS n, sum(dl) AS sdl,
                       CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                       CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                       CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
                FROM tf
            ), scored AS (
                SELECT doc_id,
                       round(
                         ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * 2.2)
                           / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                       + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * 2.2)
                           / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                       + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * 2.2)
                           / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                       , 6) + 0.0 AS sb,
                       round(
                         CASE WHEN tf0 > 0 AND df0 > 0
                              THEN (1.0 + ln(CAST(tf0 AS DOUBLE))) * ln(CAST(n AS DOUBLE) / CAST(df0 AS DOUBLE))
                              ELSE 0.0 END
                       + CASE WHEN tf1 > 0 AND df1 > 0
                              THEN (1.0 + ln(CAST(tf1 AS DOUBLE))) * ln(CAST(n AS DOUBLE) / CAST(df1 AS DOUBLE))
                              ELSE 0.0 END
                       + CASE WHEN tf2 > 0 AND df2 > 0
                              THEN (1.0 + ln(CAST(tf2 AS DOUBLE))) * ln(CAST(n AS DOUBLE) / CAST(df2 AS DOUBLE))
                              ELSE 0.0 END
                       , 6) + 0.0 AS st
                FROM tf, stats
            ), tb AS (
                SELECT doc_id, sb FROM scored ORDER BY sb DESC, doc_id LIMIT 100
            ), tt AS (
                SELECT doc_id, st FROM scored ORDER BY st DESC, doc_id LIMIT 100
            ), ra AS (
                SELECT doc_id, row_number() OVER (ORDER BY sb DESC, doc_id) AS r FROM tb
            ), rb AS (
                SELECT doc_id, row_number() OVER (ORDER BY st DESC, doc_id) AS r FROM tt
            ), fused AS (
                SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
                       CAST(COALESCE(ra.r, 0) AS BIGINT) AS bm25_rank,
                       CAST(COALESCE(rb.r, 0) AS BIGINT) AS tfidf_rank
                FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
            )
            SELECT doc_id, bm25_rank, tfidf_rank,
                   round(
                     CASE WHEN bm25_rank > 0
                          THEN 1.0 / (60.0 + CAST(bm25_rank AS DOUBLE)) ELSE 0.0 END
                   + CASE WHEN tfidf_rank > 0
                          THEN 1.0 / (60.0 + CAST(tfidf_rank AS DOUBLE)) ELSE 0.0 END
                   , 6) + 0.0 AS rrf
            FROM fused
            ORDER BY rrf DESC, doc_id
            LIMIT 20
        """,
        "token_budget_fill": """
            WITH q AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) + 0.0 AS quality
                FROM documents WHERE text IS NOT NULL
            ), c AS (
                SELECT doc_id, n_tok, quality,
                       CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_tok,
                       (3 * CAST(sum(n_tok) OVER () AS BIGINT)) // 10 AS budget
                FROM q
            )
            SELECT doc_id, n_tok, quality, cum_tok
            FROM c WHERE cum_tok <= budget
        """,
        "audio_segments": """
            WITH m AS (
                SELECT doc_id, md5(text) AS ph,
                       CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 600000 + 1
                           AS dur
                FROM documents
            ), fr AS (
                SELECT doc_id, CAST(f AS BIGINT) AS f,
                       CAST(concat('0x', substr(md5(concat(ph, ':', f)), 1, 8)) AS BIGINT) % 1000
                           AS e
                FROM m, LATERAL (
                    SELECT unnest(range(0, (dur + 999) // 1000)) AS f
                ) g
            ), act AS (
                SELECT doc_id, f, e,
                       f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS isl
                FROM fr WHERE e >= 600
            )
            SELECT doc_id,
                   CAST(min(f) * 1000 AS BIGINT) AS seg_start_ms,
                   CAST((max(f) + 1) * 1000 AS BIGINT) AS seg_end_ms,
                   CAST(count(*) AS BIGINT) AS n_frames,
                   CAST(sum(e) AS BIGINT) AS energy_millis
            FROM act GROUP BY doc_id, isl
        """,
        "hard_negatives": """
            WITH n AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), p AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       round(list_sum(list_transform(
                           generate_series(1, len(q.nv)),
                           i -> q.nv[i] * c.nv[i])), 6) AS cos_sim
                FROM n q JOIN n c ON q.label <> c.label
            ), r AS (
                SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM p
            )
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim
            FROM r WHERE rank <= 3
        """,
        "scd2_as_of": """
            WITH marked AS (
                SELECT user_id, event_type, event_id, ts,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
                       lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
                FROM events
            ), starts AS (
                SELECT * FROM marked
                WHERE rn = 1 OR event_type IS DISTINCT FROM prev
            ), iv AS (
                SELECT user_id, event_type AS state,
                       event_id AS valid_from_seq, ts AS valid_from,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)
                           AS valid_to
                FROM starts
            )
            SELECT user_id, state, valid_from, valid_from_seq
            FROM iv
            WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
              AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 12:00:00' < valid_to)
        """,
        "balanced_shards": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                FROM documents WHERE text IS NOT NULL
            )
            SELECT doc_id, n_tok,
                   CAST((row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1)
                        % 16 AS INT) AS shard
            FROM t
        """,
        # Mann–Whitney AUC with average-rank tie handling: exact integers
        # until the one final division (functions/ml.py::auc_roc)
        "auc_roc": """
            WITH scored AS (
                SELECT CAST(lang = 'en' AS INT) AS label, n_chars AS score
                FROM documents
                WHERE lang IS NOT NULL AND n_chars IS NOT NULL
            ), per AS (
                SELECT score,
                       CAST(sum(label) AS BIGINT) AS pos,
                       CAST(count(*) - sum(label) AS BIGINT) AS neg
                FROM scored GROUP BY score
            ), c AS (
                SELECT pos, neg,
                       CAST(sum(neg) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) - neg AS cumneg
                FROM per
            )
            -- single-class guard mirrors Spark's try_divide: NULL (not
            -- NaN/inf) when either class is absent
            SELECT CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
                     round(CAST(sum(CAST(pos AS DECIMAL(19,0))
                                  * (2 * cumneg + neg)) AS DOUBLE)
                         / (2.0 * CAST(sum(pos) AS DOUBLE)
                            * CAST(sum(neg) AS DOUBLE)), 6) + 0.0
                   END AS auc,
                   CAST(sum(pos) AS BIGINT) AS n_pos,
                   CAST(sum(neg) AS BIGINT) AS n_neg
            FROM c
        """,
        # windowed two-sample level-shift detector: exact cents-integer
        # sums and threshold test (operators/timeseries.py::
        # mean_shift_detect, w=5, threshold=100.0 -> 50000 cents)
        "mean_shift": """
            WITH base AS (
                SELECT event_id, user_id, value,
                       CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                           AS cl
                FROM events
            ), fr AS (
                SELECT event_id, user_id, value,
                       sum(cl) OVER wpre AS pre_s,
                       count(cl) OVER wpre AS pre_n,
                       sum(cl) OVER wpost AS post_s,
                       count(cl) OVER wpost AS post_n
                FROM base
                WINDOW wpre AS (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
                       wpost AS (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
            )
            SELECT event_id, user_id, value,
                   round(pre_s / 500.0, 6) + 0.0 AS pre_mean,
                   round(post_s / 500.0, 6) + 0.0 AS post_mean,
                   round((post_s - pre_s) / 500.0, 6) + 0.0 AS shift
            FROM fr
            WHERE pre_n = 5 AND post_n = 5
              AND abs(post_s - pre_s) > 50000
        """,
        # per-type lag-1..3 Pearson autocorrelation from exact cents-integer
        # moment sums (operators/timeseries.py::autocorrelation)
        "acf_lags": """
            WITH base AS (
                SELECT event_type, event_id,
                       CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                           AS y
                FROM events
            ), lagged AS (
                SELECT event_type, 1 AS lag, lag(y, 1) OVER w1 AS x, y
                FROM base WINDOW w1 AS (PARTITION BY event_type
                                        ORDER BY event_id)
                UNION ALL
                SELECT event_type, 2 AS lag, lag(y, 2) OVER w2 AS x, y
                FROM base WINDOW w2 AS (PARTITION BY event_type
                                        ORDER BY event_id)
                UNION ALL
                SELECT event_type, 3 AS lag, lag(y, 3) OVER w3 AS x, y
                FROM base WINDOW w3 AS (PARTITION BY event_type
                                        ORDER BY event_id)
            ), m AS (
                SELECT event_type, lag,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(count(*) AS DOUBLE) AS nn,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE)
                           AS sxy,
                       CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE)
                           AS sxx,
                       CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE)
                           AS syy
                FROM lagged
                WHERE x IS NOT NULL AND y IS NOT NULL
                GROUP BY event_type, lag
            )
            SELECT event_type, CAST(lag AS INT) AS lag, n,
                   -- guard the RADICAND, not sqrt(...): double rounding
                   -- can land an exact-zero product slightly negative and
                   -- DuckDB's sqrt raises where Spark yields NaN
                   round(CASE WHEN (nn * sxx - sx * sx)
                                   * (nn * syy - sy * sy) > 0
                              THEN (nn * sxy - sx * sy)
                                   / sqrt((nn * sxx - sx * sx)
                                          * (nn * syy - sy * sy))
                         END, 6) + 0.0 AS acf
            FROM m
        """,
        # Zipf rank-frequency regression over the top-300 vocabulary:
        # 9-dp-rounded logs summed as exact decimals
        # (functions/corpus.py::zipf_fit)
        "zipf_fit": """
            WITH vt AS (
                SELECT token, count(*) AS freq FROM (
                    SELECT unnest(string_split(lower(text), ' ')) AS token
                    FROM documents
                ) WHERE regexp_matches(token, '^[a-z]+$')
                GROUP BY token ORDER BY freq DESC, token LIMIT 300
            ), r AS (
                SELECT CAST(round(ln(CAST(row_number() OVER (
                                ORDER BY freq DESC, token) AS DOUBLE)), 9)
                            AS DECIMAL(18,9)) AS x,
                       CAST(round(ln(CAST(freq AS DOUBLE)), 9)
                            AS DECIMAL(18,9)) AS y
                FROM vt
            ), m AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(count(*) AS BIGINT) AS n_terms,
                       CAST(sum(x) AS DOUBLE) AS sx,
                       CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE)
                           AS sxy,
                       CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE)
                           AS sxx
                FROM r
            )
            SELECT round(CASE WHEN (n * sxx - sx * sx) <> 0
                              THEN (n * sxy - sx * sy)
                                   / (n * sxx - sx * sx) END, 6)
                       + 0.0 AS zipf_slope,
                   round(CASE WHEN n > 0
                              THEN (sy - (CASE WHEN (n * sxx - sx * sx) <> 0
                                          THEN (n * sxy - sx * sy)
                                               / (n * sxx - sx * sx) END)
                                    * sx) / n END, 6) + 0.0
                       AS zipf_intercept,
                   n_terms
            FROM m
        """,
        # Naive Bayes language ID, trained and scored in SQL exactly as
        # functions/ml.py::nb_train/nb_predict: top-300 vocabulary
        # (freq desc, token asc), Laplace-smoothed 9-dp decimal log-probs,
        # decimal-exact posteriors, label-asc argmax tie-break
        "nb_lang_confusion": """
            WITH toks AS (
                SELECT doc_id, lang, token FROM (
                    SELECT doc_id, lang,
                           unnest(string_split(lower(text), ' ')) AS token
                    FROM documents
                ) WHERE regexp_matches(token, '^[a-z]+$')
            ), counts AS (
                SELECT token, lang AS label, CAST(count(*) AS BIGINT) AS cnt
                FROM toks GROUP BY token, lang
            ), vocab AS (
                SELECT token FROM (
                    SELECT token, sum(cnt) AS tot FROM counts GROUP BY token
                    ORDER BY tot DESC, token LIMIT 300
                )
            ), v_size AS (
                SELECT count(*) AS v FROM vocab
            ), cv AS (
                SELECT c.token, c.label, c.cnt
                FROM counts c JOIN vocab USING (token)
            ), tot_l AS (
                SELECT label, CAST(sum(cnt) AS BIGINT) AS label_total
                FROM cv GROUP BY label
            ), labels AS (
                SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY lang
            ), n_all AS (
                SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents
            ), matrix AS (
                SELECT v.token, l.label,
                       CAST(round(ln(
                           CAST(coalesce(cv.cnt, 0) + 1 AS DOUBLE)
                           / CAST(coalesce(t.label_total, 0) + s.v
                                  AS DOUBLE)), 9) AS DECIMAL(18,9)) AS logp
                FROM vocab v
                CROSS JOIN (SELECT label FROM labels) l
                LEFT JOIN cv ON cv.token = v.token AND cv.label = l.label
                LEFT JOIN tot_l t ON t.label = l.label
                CROSS JOIN v_size s
            ), priors AS (
                SELECT label,
                       CAST(round(ln(CAST(n_docs AS DOUBLE)
                                     / CAST(n_all AS DOUBLE)), 9)
                            AS DECIMAL(18,9)) AS logprior
                FROM labels CROSS JOIN n_all
            ), dtoks AS (
                SELECT doc_id, token FROM (
                    SELECT doc_id,
                           unnest(string_split(lower(text), ' ')) AS token
                    FROM documents
                ) WHERE regexp_matches(token, '^[a-z]+$')
            ), scored AS (
                SELECT d.doc_id, m.label, sum(m.logp) AS s,
                       CAST(count(*) AS BIGINT) AS n_tok
                FROM dtoks d JOIN matrix m USING (token)
                GROUP BY d.doc_id, m.label
            ), post AS (
                SELECT s.doc_id, s.label, s.n_tok,
                       row_number() OVER (
                           PARTITION BY s.doc_id
                           ORDER BY s.s + p.logprior DESC, s.label) AS rn
                FROM scored s JOIN priors p USING (label)
            )
            SELECT d.lang AS truth, post.label AS predicted,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(post.n_tok) AS BIGINT) AS sum_tok
            FROM post JOIN documents d USING (doc_id)
            WHERE rn = 1
            GROUP BY truth, predicted
        """,
        "ndcg_eval": _ndcg_oracle(),
        "welch_ttest": _welch_oracle(),
        "benford_check": _benford_oracle(),
        # KS separation: same distinct-score collapse as auc_roc, both
        # class CDFs as prefix sums, exact-integer max diff, smallest-score
        # tie-break (functions/ml.py::ks_statistic)
        "ks_statistic": """
            WITH scored AS (
                SELECT CAST(lang = 'en' AS INT) AS label, n_chars AS score
                FROM documents
                WHERE lang IS NOT NULL AND n_chars IS NOT NULL
            ), per AS (
                SELECT score,
                       CAST(sum(label) AS BIGINT) AS pos,
                       CAST(count(*) - sum(label) AS BIGINT) AS neg
                FROM scored GROUP BY score
            ), tot AS (
                SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
                       CAST(sum(neg) AS BIGINT) AS n_neg
                FROM per
            ), c AS (
                SELECT score,
                       CAST(sum(pos) OVER w AS BIGINT) AS cp,
                       CAST(sum(neg) OVER w AS BIGINT) AS cn
                FROM per
                WINDOW w AS (ORDER BY score ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)
            ), d AS (
                SELECT score, n_pos, n_neg,
                       abs(CAST(cp AS DECIMAL(19,0)) * n_neg
                           - CAST(cn AS DECIMAL(19,0)) * n_pos) AS num
                FROM c CROSS JOIN tot
            )
            -- single-class guard mirrors Spark's try_divide: NULL (not
            -- NaN/inf) when either class is absent
            SELECT CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                     round(CAST(num AS DOUBLE)
                           / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
                           6) + 0.0
                   END AS ks,
                   score AS at_score, n_pos, n_neg
            FROM d ORDER BY num DESC, score LIMIT 1
        """,
        # χ² token selection: document-presence contingency with exact
        # cells, double square of the exact decimal (ad-bc), zero-marginal
        # tokens excluded on both engines (functions/ml.py::chi2_tokens)
        "chi2_tokens": """
            WITH toks AS (
                SELECT y, unnest(list_distinct(
                           string_split(lower(text), ' '))) AS token
                FROM (SELECT CAST(lang = 'en' AS INT) AS y, text
                      FROM documents WHERE lang IS NOT NULL)
            ), per AS (
                SELECT token,
                       CAST(sum(y) AS BIGINT) AS a,
                       CAST(sum(1 - y) AS BIGINT) AS b
                FROM toks
                WHERE regexp_matches(token, '^[a-z]+$')
                GROUP BY token
            ), tot AS (
                SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                            AS BIGINT) AS n0
                FROM documents WHERE lang IS NOT NULL
            ), j AS (
                SELECT token, a, b, n1 - a AS c, n0 - b AS d, n1 + n0 AS n
                FROM per CROSS JOIN tot
                WHERE a + b >= 5
            )
            SELECT token, a, b, c, d,
                   round(CAST(n AS DOUBLE)
                         * (CAST(CAST(a AS DECIMAL(19,0)) * d
                                 - CAST(b AS DECIMAL(19,0)) * c AS DOUBLE)
                            * CAST(CAST(a AS DECIMAL(19,0)) * d
                                   - CAST(b AS DECIMAL(19,0)) * c AS DOUBLE))
                         / (CAST(CAST(a + b AS DECIMAL(19,0)) * (c + d)
                                 AS DOUBLE)
                            * CAST(CAST(a + c AS DECIMAL(19,0)) * (b + d)
                                   AS DOUBLE)), 6) + 0.0 AS chi2
            FROM j
            WHERE c + d > 0 AND b + d > 0 AND a + c > 0
            ORDER BY chi2 DESC, token LIMIT 30
        """,
        # per-node clustering coefficient: triangle_count's CTE chain with
        # the closed wedges exploded to all three vertices
        # (functions/graph.py::local_clustering)
        "local_clustering": """
            WITH e0 AS (
                SELECT lag(user_id) OVER (
                           PARTITION BY date_trunc('hour', ts)
                           ORDER BY event_id) AS src,
                       user_id AS dst
                FROM events),
            edges AS (SELECT src, dst FROM e0
                      WHERE src IS NOT NULL AND src <> dst),
            und AS (SELECT DISTINCT least(src, dst) AS a,
                           greatest(src, dst) AS b
                    FROM edges WHERE src <> dst),
            deg AS (SELECT v, count(*) AS d FROM (
                        SELECT a AS v FROM und
                        UNION ALL SELECT b AS v FROM und)
                    GROUP BY v),
            oriented AS (
                SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                            THEN a ELSE b END AS lo,
                       CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                            THEN b ELSE a END AS hi
                FROM und
                JOIN deg da ON a = da.v
                JOIN deg db ON b = db.v),
            wedges AS (
                SELECT e1.lo AS u, e1.hi AS w1, e2.hi AS w2
                FROM oriented e1 JOIN oriented e2
                  ON e1.lo = e2.lo AND e1.hi < e2.hi),
            closed AS (
                SELECT u, w1, w2 FROM wedges w
                WHERE EXISTS (SELECT 1 FROM und
                              WHERE a = w.w1 AND b = w.w2)),
            tri AS (
                SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
                    SELECT u AS node FROM closed
                    UNION ALL SELECT w1 AS node FROM closed
                    UNION ALL SELECT w2 AS node FROM closed)
                GROUP BY node)
            SELECT deg.v AS node, CAST(deg.d AS BIGINT) AS degree,
                   CAST(coalesce(tri.triangles, 0) AS BIGINT) AS triangles,
                   round(CAST(2 * coalesce(tri.triangles, 0) AS DOUBLE)
                         / CAST(deg.d * (deg.d - 1) AS DOUBLE), 6) + 0.0
                       AS coefficient
            FROM deg LEFT JOIN tri ON deg.v = tri.node
            WHERE deg.d >= 2
        """,
        # market-basket association rules over co-ordered brands: ONE
        # basket-key self-join, exact counts, decimal lift products
        # (functions/basket.py::association_rules)
        "association_rules": """
            WITH items0 AS (
                SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE l.l_orderkey IS NOT NULL AND p.p_brand IS NOT NULL
            ), items AS (
                SELECT basket, item FROM (
                    SELECT basket, item,
                           count(*) OVER (PARTITION BY basket) AS sz
                    FROM items0)
                WHERE sz <= 100
            ), nb AS (
                SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
                FROM items
            ), item_n AS (
                SELECT item, CAST(count(*) AS BIGINT) AS n FROM items
                GROUP BY item
            ), pairs AS (
                SELECT a.item AS x, b.item AS y,
                       CAST(count(*) AS BIGINT) AS n_xy
                FROM items a JOIN items b
                  ON a.basket = b.basket AND a.item < b.item
                GROUP BY a.item, b.item
                HAVING count(*) >= 3
            )
            SELECT x, y, n_xy,
                   ix.n AS n_x, iy.n AS n_y,
                   round(CAST(n_xy AS DOUBLE)
                         / CAST(n_baskets AS DOUBLE), 6) + 0.0 AS support,
                   round(CAST(n_xy AS DOUBLE) / CAST(ix.n AS DOUBLE), 6)
                       + 0.0 AS confidence,
                   round(CAST(CAST(n_xy AS DECIMAL(19,0)) * n_baskets
                              AS DOUBLE)
                         / CAST(CAST(ix.n AS DECIMAL(19,0)) * iy.n
                                AS DOUBLE), 6) + 0.0 AS lift
            FROM pairs
            JOIN item_n ix ON pairs.x = ix.item
            JOIN item_n iy ON pairs.y = iy.item
            CROSS JOIN nb
            ORDER BY lift DESC, x, y LIMIT 25
        """,
        # Kaplan-Meier: time to first purchase, administratively censored
        # at user_id % 7 observation days; exclusive prefix at-risk set,
        # log-space survival product with 9-dp decimal terms
        # (functions/ml.py::kaplan_meier)
        "kaplan_meier": """
            WITH subj0 AS (
                SELECT CAST(user_id % 7 AS INT) AS cday,
                       date_diff('day', CAST(min(ts) AS DATE),
                                 CAST(min(CASE WHEN event_type = 'purchase'
                                          THEN ts END) AS DATE)) AS pdays
                FROM events GROUP BY user_id
            ), subj AS (
                SELECT CAST(CASE WHEN pdays IS NOT NULL AND pdays <= cday
                            THEN pdays ELSE cday END AS INT) AS t,
                       CAST(pdays IS NOT NULL AND pdays <= cday AS INT)
                           AS ev
                FROM subj0
            ), per AS (
                SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                       CAST(count(*) - sum(ev) AS BIGINT) AS c
                FROM subj GROUP BY t
            ), c1 AS (
                SELECT t, d,
                       CAST((SELECT sum(d + c) FROM per) AS BIGINT)
                       - CAST(coalesce(sum(d + c) OVER (
                             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
                FROM per
            ), c2 AS (
                SELECT t, d, n_risk,
                       sum(CASE WHEN d < n_risk
                                THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE)
                                                    / CAST(n_risk AS DOUBLE)),
                                                9) AS DECIMAL(18,9)) END)
                           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS cs
                FROM c1
            )
            SELECT t AS duration, n_risk, d AS n_events,
                   CASE WHEN d = n_risk THEN CAST(0.0 AS DOUBLE)
                        ELSE round(exp(CAST(cs AS DOUBLE)), 6) + 0.0
                   END AS survival
            FROM c2 WHERE d > 0
        """,
        "embedding_drift": _embedding_drift_oracle(),
        # k-anonymity: the groups a pseudonymized release would expose
        # (functions/quality.py::k_anonymity; Spark floor-divides the
        # exact decimal balance, so mirror with decimal division)
        "k_anonymity": """
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 1000)
                        AS INT) AS bal_band,
                   CAST(count(*) AS BIGINT) AS group_size
            FROM customer
            GROUP BY c_nationkey, c_mktsegment, bal_band
            HAVING count(*) < 5
        """,
        # sliced classifier evaluation: q_classification_report's shape
        # per language with a rule pair that populates all four cells in
        # every slice (label n_chars>250, predicted n_tokens>45)
        "sliced_eval": """
            WITH s AS (
                SELECT lang,
                       CASE WHEN n_chars > 250 THEN 1 ELSE 0 END AS y,
                       CASE WHEN len(string_split(text, ' ')) > 45
                            THEN 1 ELSE 0 END AS p
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL
            ), agg AS (
                SELECT lang,
                       CAST(sum(CASE WHEN y=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                       CAST(sum(CASE WHEN y=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                       CAST(sum(CASE WHEN y=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                       CAST(sum(CASE WHEN y=0 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
                FROM s GROUP BY lang
            )
            -- guards mirror Spark's try_divide (NULL, never NaN/inf): a
            -- slice that never predicts positive (tp+fp=0) or has no
            -- positives (tp+fn=0) gets NULL, and f1 is NULL whenever
            -- tp = 0 (prec or rec NULL, or try_divide(0,0))
            SELECT lang, tp, fp, fn, tn,
                   CASE WHEN tp + fp > 0 THEN
                     round(tp / CAST(tp + fp AS DOUBLE), 6) + 0.0
                   END AS precision,
                   CASE WHEN tp + fn > 0 THEN
                     round(tp / CAST(tp + fn AS DOUBLE), 6) + 0.0
                   END AS recall,
                   CASE WHEN tp > 0 THEN
                     round(CAST(2.0 AS DOUBLE) * (tp / CAST(tp + fp AS DOUBLE))
                           * (tp / CAST(tp + fn AS DOUBLE))
                           / ((tp / CAST(tp + fp AS DOUBLE))
                              + (tp / CAST(tp + fn AS DOUBLE))), 6) + 0.0
                   END AS f1,
                   round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
                       + 0.0 AS accuracy
            FROM agg
        """,
        # JSD of the en/non-en token distributions: exact counts, the SAME
        # zero-guarded double term expression, round-9 decimal sums
        # (functions/ml.py::js_divergence)
        "js_divergence": """
            WITH tok AS (
                -- lang IS NOT NULL mirrors the Spark side's three-valued
                -- filters (lang = 'en' / lang <> 'en' both drop NULLs);
                -- the bare CASE would bucket NULL-lang docs into q
                SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_p,
                       unnest(string_split(lower(text), ' ')) AS item
                FROM documents WHERE lang IS NOT NULL
            ), cnt AS (
                SELECT item,
                       CAST(sum(is_p) AS BIGINT) AS cp,
                       CAST(sum(1 - is_p) AS BIGINT) AS cq
                FROM tok GROUP BY item
            ), tot AS (
                SELECT CAST(sum(cp) AS BIGINT) AS tp,
                       CAST(sum(cq) AS BIGINT) AS tq,
                       CAST(sum(CASE WHEN cp > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS vp,
                       CAST(sum(CASE WHEN cq > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS vq,
                       CAST(count(*) AS BIGINT) AS vu
                FROM cnt
            ), terms AS (
                SELECT CAST(round((
                         CASE WHEN cp > 0 THEN
                           (CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE))
                           * ln((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE))
                                / ((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE)
                                    + CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE))
                                   / 2.0))
                         ELSE 0.0 END
                       + CASE WHEN cq > 0 THEN
                           (CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE))
                           * ln((CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE))
                                / ((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE)
                                    + CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE))
                                   / 2.0))
                         ELSE 0.0 END) / 2.0, 9) AS DECIMAL(15,9)) AS t,
                       tp, tq, vp, vq, vu
                FROM cnt, tot
            )
            SELECT round(CAST(sum(t) AS DOUBLE), 6) + 0.0 AS jsd,
                   tp AS n_p, tq AS n_q, vp AS vocab_p, vq AS vocab_q,
                   vu AS vocab_union
            FROM terms GROUP BY tp, tq, vp, vq, vu
        """,
        # entropy / conditional entropy / mutual information of the
        # event-type transition table: exact pair counts, round-9 decimal
        # term sums, first-row-per-next-state marker for the marginal
        # (functions/ml.py::conditional_entropy)
        "conditional_entropy": """
            WITH seq AS (
                SELECT event_type AS c,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY event_id) AS x
                FROM events
            ), pairs AS (
                SELECT c, x, CAST(count(*) AS BIGINT) AS n
                FROM seq WHERE c IS NOT NULL AND x IS NOT NULL
                GROUP BY c, x
            ), en AS (
                SELECT n,
                       CAST(sum(n) OVER (PARTITION BY c) AS BIGINT) AS nc,
                       CAST(sum(n) OVER (PARTITION BY x) AS BIGINT) AS nx,
                       CAST(sum(n) OVER () AS BIGINT) AS nt,
                       row_number() OVER (PARTITION BY x ORDER BY c) = 1
                           AS first_x
                FROM pairs
            ), terms AS (
                SELECT CAST(round(-(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
                         * ln(CAST(n AS DOUBLE) / CAST(nc AS DOUBLE)), 9)
                         AS DECIMAL(15,9)) AS hc,
                       CAST(CASE WHEN first_x THEN
                         round(-(CAST(nx AS DOUBLE) / CAST(nt AS DOUBLE))
                               * ln(CAST(nx AS DOUBLE) / CAST(nt AS DOUBLE)),
                               9)
                       ELSE 0.0 END AS DECIMAL(15,9)) AS hx,
                       nt
                FROM en
            )
            SELECT round(CAST(sum(hx) AS DOUBLE), 6) + 0.0 AS h_next,
                   round(CAST(sum(hc) AS DOUBLE), 6) + 0.0
                       AS h_next_given_cur,
                   round(CAST(sum(hx) AS DOUBLE) - CAST(sum(hc) AS DOUBLE),
                         6) + 0.0 AS mutual_info,
                   nt AS n_transitions
            FROM terms GROUP BY nt
        """,
        # deterministic multiplicative-hash bootstrap of mean n_chars over
        # the dense doc_id<400 panel: identical integer draws, exact sums,
        # identical rank selection (functions/ml.py::bootstrap_ci)
        "bootstrap_ci": """
            WITH panel AS (
                SELECT doc_id AS pid, CAST(n_chars AS BIGINT) AS v
                FROM documents WHERE doc_id >= 0 AND doc_id < 400
            ), grid AS (
                SELECT CAST(floor(i / 400) AS BIGINT) AS r,
                       ((i + 1) * 2654435761) % 4294967296 % 400 AS draw
                FROM (SELECT unnest(range(0, 80000)) AS i)
            ), means AS (
                SELECT r, CAST(sum(v) AS DOUBLE) / 400.0 AS m
                FROM grid JOIN panel ON draw = pid GROUP BY r
            ), ranked AS (
                SELECT m,
                       row_number() OVER (ORDER BY m ASC, r ASC) AS ra,
                       row_number() OVER (ORDER BY m DESC, r DESC) AS rd
                FROM means
            ), fullp AS (
                SELECT CAST(sum(v) AS DOUBLE) / 400.0 AS mf FROM panel
            )
            SELECT CAST(400 AS INT) AS n, CAST(200 AS INT) AS b,
                   round(mf, 6) + 0.0 AS mean_full,
                   round(max(CASE WHEN ra = 5 THEN m END), 6) + 0.0 AS ci_lo,
                   round(max(CASE WHEN rd = 5 THEN m END), 6) + 0.0 AS ci_hi
            FROM ranked, fullp GROUP BY mf
        """,
        # Gini of per-user event counts: exact rank*count integer sums
        # (rank ties on count are order-invariant in the sum), one final
        # double division (functions/quality.py::gini_concentration)
        "gini_user_activity": """
            WITH per AS (
                SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY user_id
            ), r AS (
                SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rnk
                FROM per
            ), agg AS (
                SELECT CAST(count(*) AS BIGINT) AS nk,
                       CAST(sum(cnt) AS BIGINT) AS tot,
                       CAST(sum(CAST(rnk AS HUGEINT) * cnt) AS HUGEINT) AS s1
                FROM r
            )
            SELECT nk AS n_keys, tot AS total_rows,
                   CASE WHEN nk > 0 AND tot > 0 THEN
                     round(CAST(2 * s1 - (nk + 1) * CAST(tot AS HUGEINT)
                                AS DOUBLE)
                           / CAST(CAST(nk AS HUGEINT) * tot AS DOUBLE), 6)
                     + 0.0
                   END AS gini
            FROM agg
        """,
        # per-language fertility: the token_count_bpe estimator summed per
        # lang, exact integer totals, guarded division
        # (functions/text.py::tokenizer_fertility)
        "tokenizer_fertility": """
            WITH d AS (
                -- NULL-text docs stay NULL (Spark's aggregate over a NULL
                -- array is NULL, skipped by sum) while a WORDLESS text
                -- coalesces to 0 (Spark's fold starts at 0L) — collapsing
                -- both to 0 would flip an all-NULL-text group from NULL
                -- totals to 0
                SELECT lang,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE CAST(coalesce(list_sum(list_transform(
                                 regexp_extract_all(lower(text), '[a-z0-9]+'),
                                 x -> greatest(1, (length(x) + 3) // 4))), 0)
                                 AS BIGINT) END AS toks,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS BIGINT) AS words
                FROM documents
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(toks) AS BIGINT) AS total_tokens,
                   CAST(sum(words) AS BIGINT) AS total_words,
                   CASE WHEN sum(words) > 0 THEN
                     round(CAST(sum(toks) AS DOUBLE)
                           / CAST(sum(words) AS DOUBLE), 6) + 0.0
                   END AS fertility
            FROM d GROUP BY lang
        """,
        "average_precision": _ap_oracle(),
        "mmr_diverse_topk": _mmr_oracle(),
        # keyed sketch PSI: identical bin clamp, identical psi_drift term
        # math (1e-6 floor, round-9 decimal sums), keys scored only when
        # both sketches carry them (functions/sketches.py::psi_probe)
        "psi_probe_drift": """
            WITH ref AS (
                SELECT event_type AS key,
                       CAST(least(greatest(floor((CAST(value AS DOUBLE)
                                - CAST(0.0 AS DOUBLE))
                                / CAST(100.0 AS DOUBLE)), 0), 9) AS INT)
                           AS bin,
                       count(*) AS cnt
                FROM events
                WHERE event_id % 2 = 0 AND value IS NOT NULL
                      AND NOT isnan(value)
                GROUP BY 1, 2
            ), live AS (
                SELECT event_type AS key,
                       CAST(least(greatest(floor((CAST(value AS DOUBLE)
                                * CAST(1.1 AS DOUBLE)
                                - CAST(0.0 AS DOUBLE))
                                / CAST(100.0 AS DOUBLE)), 0), 9) AS INT)
                           AS bin,
                       count(*) AS cnt
                FROM events
                WHERE event_id % 2 = 1 AND value IS NOT NULL
                      AND NOT isnan(value)
                GROUP BY 1, 2
            ), rt AS (
                SELECT key, CAST(sum(cnt) AS BIGINT) AS tp
                FROM ref GROUP BY key
            ), lt AS (
                SELECT key, CAST(sum(cnt) AS BIGINT) AS tq
                FROM live GROUP BY key
            ), ks AS (
                SELECT rt.key AS key, tp, tq
                FROM rt JOIN lt ON rt.key = lt.key
            ), m AS (
                SELECT COALESCE(r.key, l.key) AS key,
                       COALESCE(r.bin, l.bin) AS bin,
                       COALESCE(r.cnt, 0) AS cp, COALESCE(l.cnt, 0) AS cq
                FROM ref r FULL OUTER JOIN live l
                  ON r.key = l.key AND r.bin = l.bin
            ), j AS (
                SELECT m.key, m.bin,
                       CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) AS p,
                       CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE) AS q
                FROM m JOIN ks ON m.key = ks.key
            ), t AS (
                SELECT key, bin, p, q,
                       CAST(round((greatest(p, 1e-6) - greatest(q, 1e-6))
                            * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 9)
                            AS DECIMAL(15,9)) AS term
                FROM j
            )
            SELECT key, bin, round(p, 6) + 0.0 AS p, round(q, 6) + 0.0 AS q,
                   CAST(term AS DOUBLE) + 0.0 AS psi_term,
                   round(CAST(sum(term) OVER (PARTITION BY key) AS DOUBLE),
                         6) + 0.0 AS psi
            FROM t
        """,
        # CCNet split on the shared bigram-LM CTE: identical 6-dp scores,
        # identical (score, id) ranking, exact integer bucket arithmetic
        # (// mirrors Spark's DIV; a double divide + int cast would
        # truncate on Spark but ROUND on DuckDB)
        "perplexity_buckets": f"""
            WITH scored AS ({_BIGRAM_LP_SQL})
            SELECT doc_id, logprob,
                   CAST((3 * (rnk - 1)) // n AS INT) AS ppl_bucket
            FROM (SELECT doc_id, logprob,
                         row_number() OVER (ORDER BY logprob, doc_id) AS rnk,
                         count(*) OVER () AS n
                  FROM scored)
        """,
        # RFM: exact day diff to the corpus anchor, exact decimal cents sum
        # (functions/ml.py::rfm_features)
        "rfm_features": """
            WITH anchor AS (SELECT max(ts) AS maxts FROM events)
            SELECT user_id AS user,
                   CAST(date_diff('day', CAST(max(ts) AS DATE),
                                  CAST(maxts AS DATE)) AS INT)
                       AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))),
                                 CAST(0 AS DECIMAL(18,2))) AS DOUBLE) + 0.0
                       AS monetary,
                   CAST(count(value) AS BIGINT) AS n_valued
            FROM events CROSS JOIN anchor
            GROUP BY user_id, maxts
        """,
        # Pearson degree assortativity over the canonical undirected lag
        # graph: exact integer moment sums, the SAME double combination,
        # NULL on zero variance (functions/graph.py::degree_assortativity)
        "degree_assortativity": """
            WITH e0 AS (
                SELECT lag(user_id) OVER (
                           PARTITION BY date_trunc('hour', ts)
                           ORDER BY event_id) AS src,
                       user_id AS dst
                FROM events
            ), ed AS (
                SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM e0 WHERE src IS NOT NULL AND src <> dst
            ), deg AS (
                SELECT v, count(*) AS d FROM (
                    SELECT a AS v FROM ed UNION ALL SELECT b FROM ed)
                GROUP BY v
            ), j AS (
                SELECT da.d AS dx, db.d AS dy
                FROM ed JOIN deg da ON ed.a = da.v
                        JOIN deg db ON ed.b = db.v
            ), agg AS (
                SELECT CAST(count(*) AS BIGINT) AS m,
                       CAST(sum(CAST(dx AS HUGEINT) + dy) AS HUGEINT) AS sx,
                       CAST(sum(CAST(dx AS HUGEINT) * dx
                                + CAST(dy AS HUGEINT) * dy) AS HUGEINT)
                           AS sxx,
                       CAST(sum(2 * CAST(dx AS HUGEINT) * dy) AS HUGEINT)
                           AS sxy
                FROM j
            )
            SELECT m AS n_edges,
                   CASE WHEN CAST(m * 2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
                   THEN round((CAST(m * 2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              / (CAST(m * 2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                              6) + 0.0
                   END AS assortativity
            FROM agg
        """,
        # dedup audit on the dup_clusters transitive closure: cluster-size
        # histogram + corpus totals
        "dup_cluster_sizes": """
            WITH RECURSIVE n AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                           / sqrt(list_sum(list_transform(embedding,
                                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
                FROM embeddings
            ), p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM n a JOIN n b ON a.vec_id < b.vec_id
                WHERE round(list_sum(list_transform(
                          generate_series(1, len(a.nv)),
                          i -> a.nv[i] * b.nv[i])), 6) >= 0.4
            ), e AS (
                SELECT id_a AS u, id_b AS v FROM p
                UNION
                SELECT id_b, id_a FROM p
            ), reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ), clusters AS (
                SELECT u AS vec_id, least(u, min(v)) AS cluster_id
                FROM reach GROUP BY u
            ), sizes AS (
                SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM clusters GROUP BY cluster_id
            ), tot AS (
                SELECT CAST(sum(cluster_size) AS BIGINT) AS total_members,
                       CAST(count(*) AS BIGINT) AS total_clusters
                FROM sizes
            )
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                   total_members, total_clusters,
                   total_members - total_clusters AS removable_docs
            FROM sizes, tot
            GROUP BY cluster_size, total_members, total_clusters
        """,
    }
