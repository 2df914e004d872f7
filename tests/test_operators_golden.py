"""Per-operator unit tests with inline golden oracles — the reference's test
style (SURVEY.md §5): happy path, empty input, error propagation, plus the
exact golden fixtures from the reference specs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from akka_stream_contrib_spark.operators import (
    accumulate,
    accumulate_while_unchanged,
    feedback_loop,
    last_element,
    merge_by_index,
    retry,
    sample_nth,
    token_throttle,
    unfold_flow,
)


def ints_df(spark, n=100):
    # F2 fixture: dense 1..N stream, value == seq
    return spark.range(1, n + 1).select(
        F.col("id").alias("seq"), F.col("id").alias("value"))


def test_sample_nth_matches_reference_oracle(spark):
    # SampleSpec.scala:22-30: list.filter(_ % n == 0) for 1-based streams
    df = ints_df(spark, 100)
    for n in (1, 3, 7, 10, 99, 100):
        got = sorted(r.seq for r in df.transform(sample_nth(n)).collect())
        assert got == [x for x in range(1, 101) if x % n == 0], f"n={n}"


def test_sample_nth_empty_and_invalid(spark):
    assert ints_df(spark, 100).limit(0).transform(sample_nth(5)).count() == 0
    with pytest.raises(ValueError):
        sample_nth(0)
    with pytest.raises(ValueError):
        sample_nth(-3)


def test_accumulate_running_sum_golden(spark):
    # AccumulateSpec.scala:13-26: scan emitting every intermediate
    df = ints_df(spark, 5).transform(accumulate(F.sum("value"), out="acc"))
    got = {r.seq: r.acc for r in df.collect()}
    assert got == {1: 1, 2: 3, 3: 6, 4: 10, 5: 15}


def test_accumulate_while_unchanged_fixture_groups(spark):
    # AccumulateWhileUnchangedSpec Ones/Twos/Threes: values 1,1,1,2,2,3
    rows = [(i + 1, v) for i, v in enumerate([1, 1, 1, 2, 2, 3])]
    df = spark.createDataFrame(rows, "seq int, value int")
    out = df.transform(accumulate_while_unchanged(
        "value", [F.count(F.lit(1)).alias("cnt"),
                  F.collect_list("seq").alias("seqs")]))
    got = sorted((r.grp, r.value, r.cnt, sorted(r.seqs)) for r in out.collect())
    assert got == [(1, 1, 3, [1, 2, 3]), (2, 2, 2, [4, 5]), (3, 3, 1, [6])]


def test_accumulate_while_unchanged_max_elements(spark):
    rows = [(i + 1, 7) for i in range(10)]  # one run of 10, cap at 4
    df = spark.createDataFrame(rows, "seq int, value int")
    out = df.transform(accumulate_while_unchanged(
        "value", [F.count(F.lit(1)).alias("cnt")], max_elements=4))
    assert sorted(r.cnt for r in out.collect()) == [2, 4, 4]


def test_last_element_and_empty(spark):
    # LastElement.scala:39-78 — Some(last) / None on empty
    df = ints_df(spark, 42)
    assert df.transform(last_element()).collect()[0].seq == 42
    assert df.limit(0).transform(last_element()).collect() == []


def test_merge_by_index_restores_random_scatter(spark):
    # MergeByIndexSpec.scala:105-128 property: random branches+gaps, order out
    rng = random.Random(7)
    idxs = [i for i in range(1000) if rng.random() > 0.2]
    branches_data: dict[int, list] = {b: [] for b in range(20)}
    for i in idxs:
        branches_data[rng.randrange(20)].append((i, i * 2))
    branches = [
        spark.createDataFrame(rows or [(None, None)], "idx bigint, value bigint")
        .filter(F.col("idx").isNotNull())
        for rows in branches_data.values()
    ]
    out = merge_by_index(branches, index="idx", rank_col="rnk").collect()
    by_rank = [r.idx for r in sorted(out, key=lambda r: r.rnk)]
    assert by_rank == sorted(idxs)


def test_merge_by_index_duplicate_raises(spark):
    # MergeByIndexSpec.scala:82-90: duplicate index fails the stream
    a = spark.createDataFrame([(1, 10), (2, 20)], "idx bigint, value bigint")
    b = spark.createDataFrame([(2, 99)], "idx bigint, value bigint")
    with pytest.raises(ValueError, match="duplicate index"):
        merge_by_index([a, b], index="idx")


def test_token_throttle_accounting_exact(spark):
    # TokenThrottleSpec.scala:56-68: consumed == Σ costs, no over-consumption
    df = ints_df(spark, 40)
    out = df.transform(token_throttle(F.col("value").cast("bigint"),
                                      total_tokens=100)).collect()
    emitted = sorted(r.seq for r in out)
    # greedy prefix: 1+2+...+13 = 91 <= 100 < 105
    assert emitted == list(range(1, 14))
    assert max(r.cum_cost for r in out) == 91


def test_token_throttle_negative_cost_raises(spark):
    df = spark.createDataFrame([(1, -5)], "seq int, value int")
    with pytest.raises(Exception, match="negative cost"):
        df.transform(token_throttle(F.col("value"), total_tokens=10)).collect()


COLLATZ_27_HEAD = [82, 41, 124, 62, 31, 94, 47, 142, 71, 214]


def test_unfold_collatz_golden(spark):
    # UnfoldFlowSpec.scala:22-27: seed 27 trajectory (111 steps to 1)
    seeds = spark.createDataFrame([(27,)], "seed bigint")

    def step(v):
        if v <= 1:
            return None
        nxt = v // 2 if v % 2 == 0 else 3 * v + 1
        return (nxt, nxt)

    rows = sorted(unfold_flow(seeds, step).collect(), key=lambda r: r.step)
    vals = [r.value for r in rows]
    assert vals[:10] == COLLATZ_27_HEAD
    assert len(vals) == 111
    assert vals[-1] == 1


def test_feedback_loop_fibonacci_golden(spark):
    # FeedbackLoopSpec.scala:166
    initial = spark.createDataFrame([(0, 0, 1)], "n int, a bigint, b bigint")

    def forward(fb):
        out = fb.select("n", F.col("a").alias("fib"))
        nxt = fb.select((F.col("n") + 1).alias("n"), F.col("b").alias("a"),
                        (F.col("a") + F.col("b")).alias("b"))
        return out, nxt

    got = [r.fib for r in sorted(feedback_loop(initial, forward, 10).collect(),
                                 key=lambda r: r.n)]
    assert got == [0, 1, 1, 2, 3, 5, 8, 13, 21, 34]


def test_retry_reference_semantics(spark):
    # RetrySpec.scala:16-41: fail on even i, succeed i+1 on odd; retryWith +1
    inp = spark.createDataFrame(
        [(i, i, i, False, None) for i in (1, 2, 3, 42)],
        "seq int, i int, state int, ok boolean, value int")

    def flow(df):
        return df.withColumn("ok", F.col("i") % 2 == 1).withColumn(
            "value", F.when(F.col("i") % 2 == 1, F.col("i") + 1))

    def retry_with(failed):
        return (failed.withColumn("give_up", F.col("state") >= 42)
                .withColumn("i", F.when(~F.col("give_up"), F.col("state") + 1).otherwise(F.col("i")))
                .withColumn("state", F.when(~F.col("give_up"), F.col("state") + 1).otherwise(F.col("state"))))

    out = {r.seq: (r.ok, r.value) for r in retry(inp, flow, retry_with).collect()}
    assert out == {1: (True, 2), 2: (True, 4), 3: (True, 4), 42: (False, None)}


def test_unfold_flow_with_separate_decision_fn(spark):
    """SourceGen.unfoldFlowWith (SourceGen.scala:70-95): flow computes,
    unfoldWith decides. Doubling fixture: seed s emits s*2^j while <= 100."""
    from pyspark.sql import functions as F
    from akka_stream_contrib_spark.operators import unfold_flow_with

    seeds = spark.range(1, 6).select(F.col("id").alias("seed"))
    out = unfold_flow_with(
        seeds,
        flow=lambda s: s * 2,
        unfold_with=lambda o: None if o > 100 else (o, o),
        max_steps=50,
    ).collect()
    got = sorted((r.seed, r.step, r.value) for r in out)
    expect = sorted(
        (s, j - 1, s * (2 ** j))
        for s in range(1, 6) for j in range(1, 8) if s * (2 ** j) <= 100)
    assert got == expect


def test_retry_concat_splits_failures_into_multiple_retries(spark):
    """Retry.concat (Retry.scala:84-95): one failure re-injects several
    elements. Halving fixture: leaves of the halving tree, attempts = depth."""
    from pyspark.sql import functions as F
    from akka_stream_contrib_spark.operators import retry_concat

    df = spark.createDataFrame([(1, 7), (2, 25)], "id int, v bigint")

    def flow(d):
        return (d.withColumn("ok", F.col("v") <= 10)
                 .withColumn("value", F.when(F.col("v") <= 10, F.col("v"))))

    def retry_with(failed):
        half = F.floor(F.col("v") / F.lit(2)).cast("bigint")
        return failed.withColumn(
            "v", F.explode(F.array(half, (F.col("v") - half).cast("bigint")))
        ).select("id", "v", "attempts")

    out = retry_concat(df, flow, retry_with, max_rounds=8)
    got = sorted((r.id, r.value, r.attempts) for r in out.collect())
    # 7 succeeds directly; 25 -> (12, 13) -> (6, 6) and (6, 7)
    assert got == [(1, 7, 1), (2, 6, 3), (2, 6, 3), (2, 6, 3), (2, 7, 3)]
