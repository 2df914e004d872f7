"""Round-4 operator unit tests: CDC merge, target encoding, Luhn PII,
boolean retrieval, Holt smoothing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_apply_changes_golden(spark):
    from akka_stream_contrib_spark.operators.cdc import apply_changes
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    changes = spark.createDataFrame(
        [(2, "B", "upsert"),     # replace
         (3, None, "delete"),    # remove
         (4, "d", "upsert")],    # brand-new key
        "k long, v string, op string")
    out = {r.k: r.v for r in apply_changes(snap, changes, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_apply_changes_broadcast_off_same_result(spark):
    from akka_stream_contrib_spark.operators.cdc import apply_changes
    snap = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    changes = spark.range(0, 100, 10).selectExpr(
        "id AS k", "id AS v", "'upsert' AS op")
    a = apply_changes(snap, changes, ["k"]).collect()
    b = apply_changes(snap, changes, ["k"], broadcast_changes=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_target_encoding_excludes_own_fold(spark):
    """Leakage check: a row's encoding must not move when ITS OWN label
    changes (the in-fold sum is subtracted), but must move when a
    same-category row in ANOTHER fold changes."""
    from akka_stream_contrib_spark.functions.ml import target_encoding
    rows = [(i, "x", 10.0) for i in range(40)]
    df = spark.createDataFrame(rows, "event_id long, cat string, y double")
    enc = target_encoding("cat", "y", "event_id", n_folds=4, smoothing=5)
    base = {r.event_id: r.te for r in df.transform(enc).collect()}
    # bump row 0's label only
    df2 = df.withColumn(
        "y", F.when(F.col("event_id") == 0, 1000.0).otherwise(F.col("y")))
    bumped = {r.event_id: r.te for r in df2.transform(enc).collect()}
    fold = {r.event_id: r.fold for r in df.transform(enc).collect()}
    f0 = fold[0]
    same_fold = [i for i in base if fold[i] == f0]
    other_fold = [i for i in base if fold[i] != f0]
    assert other_fold and same_fold
    # prior moved for everyone, but same-fold rows must NOT see row 0's
    # label beyond the prior: their (cat-sum minus fold-sum) is unchanged,
    # while other-fold rows absorb the full bump
    for i in other_fold:
        assert bumped[i] > base[i] + 1.0
    # smoothing=5, prior shift = 990/40; same-fold rows move ONLY by the
    # smoothed prior term m*Δprior/(n_oof+m)
    d_prior = 990.0 / 40
    for i in same_fold:
        assert abs((bumped[i] - base[i])
                   - 5 * d_prior / (40 - sum(1 for j in fold
                                             if fold[j] == f0) + 5)) < 1e-3


def test_luhn_valid_known_numbers(spark):
    from akka_stream_contrib_spark.functions.text import luhn_valid
    df = spark.createDataFrame(
        [("4111111111111111",),   # classic valid test PAN
         ("4111111111111112",),   # checksum broken
         ("79927398713",),        # valid 11-digit (pure checksum: True)
         ("",),                   # empty: no digits, never valid
         ("5500005555555559",)],  # valid 16-digit
        "d string")
    got = df.select(luhn_valid(F.col("d")).alias("ok")).collect()
    assert [r.ok for r in got] == [True, False, True, False, True]


def test_luhn_scan_extracts_only_valid_with_separators(spark):
    from akka_stream_contrib_spark.functions.text import luhn_scan
    df = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 now"),
         (2, "ref 4111 1111 1111 1112 bogus"),   # invalid checksum
         (3, "short 1234-5678 code"),            # too few digits
         (4, "id 12345678901234567890 tail")],   # 20 digits: too long
        "doc_id long, text string")
    rows = df.transform(luhn_scan()).collect()
    assert [(r.doc_id, r.last4, r.n_digits) for r in rows] == [
        (1, "1111", 16)]


def test_boolean_and_search_golden(spark):
    from akka_stream_contrib_spark.functions.retrieval import (
        boolean_and_search)
    df = spark.createDataFrame(
        [(1, "spark join window join"),
         (2, "spark window"),
         (3, "join window nothing")],
        "doc_id long, text string")
    rows = df.transform(
        boolean_and_search(["spark", "join"])).collect()
    assert [(r.doc_id, r.tf_0, r.tf_1) for r in rows] == [(1, 1, 2)]
    with pytest.raises(ValueError):
        boolean_and_search([])


def test_holt_linear_matches_python_model(spark):
    from akka_stream_contrib_spark.operators.timeseries import holt_linear
    rng = np.random.RandomState(3)
    rows = [(int(i), int(i % 3), float(round(v, 2)))
            for i, v in enumerate(rng.uniform(0, 100, 60))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {(r.user_id, r.event_id): (r.level, r.trend)
           for r in df.transform(holt_linear(alpha=0.45, beta=0.35)).collect()}
    for u in range(3):
        xs = [(i, v) for i, k, v in rows if k == u]
        lv, tr = xs[0][1], 0.0
        q = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
        assert got[(u, xs[0][0])] == (q(lv), q(tr))
        for i, x in xs[1:]:
            prev = lv + tr
            nlv = 0.45 * x + (1.0 - 0.45) * prev
            tr = 0.35 * (nlv - lv) + (1.0 - 0.35) * tr
            lv = nlv
            assert got[(u, i)] == (q(lv), q(tr))


def test_holt_linear_null_keys_one_series_and_batch_carry(spark):
    """NULL keys must fold as ONE series (groupBy's null grouping, not
    NaN != NaN fragmentation), and a key whose history spans multiple
    Arrow batches must continue bit-exactly via the carried (level, trend)
    state — forced here with a 7-row Arrow batch size."""
    import akka_stream_contrib_spark.operators.timeseries as ts
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rng = np.random.RandomState(7)
        rows, eid = [], 0
        for k, cnt in [(None, 40), (1, 30), (2, 3)]:
            for _ in range(cnt):
                rows.append((eid, k, float(round(rng.uniform(0, 50), 2))))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double").repartition(2)
        got = {r.event_id: (r.level, r.trend) for r in
               df.transform(ts.holt_linear(alpha=0.45, beta=0.35)).collect()}
        assert len(got) == len(rows)
        q = lambda v: np.floor(v * 1e6 + 0.5) / 1e6
        by_key = {}
        for i, k, v in rows:
            by_key.setdefault(k, []).append((i, v))
        for k, xs in by_key.items():
            lv, tr = xs[0][1], 0.0
            assert got[xs[0][0]] == (q(lv), q(tr))
            for i, x in xs[1:]:
                prev_s = lv + tr
                nlv = 0.45 * x + (1.0 - 0.45) * prev_s
                tr = 0.35 * (nlv - lv) + (1.0 - 0.35) * tr
                lv = nlv
                assert got[i] == (q(lv), q(tr)), f"key {k} event {i}"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_holt_linear_length_buckets_and_skew(spark, monkeypatch):
    """Force the multi-bucket padded-fold path (tiny cell budget) with
    SKEWED key lengths — one long key among many short ones — and verify
    bit-equality with a sequential python fold per key. Guards the
    bucketing/scatter index arithmetic in the vectorized rewrite."""
    import akka_stream_contrib_spark.operators.timeseries as ts
    monkeypatch.setattr(ts, "_HOLT_CELL_BUDGET", 64)
    rng = np.random.RandomState(11)
    rows, eid = [], 0
    # key 0: length 100 (exceeds the 64-cell budget alone); keys 1..12:
    # lengths 1..12 — multiple buckets, including a single-key bucket
    for k, n in [(0, 100)] + [(k, k) for k in range(1, 13)]:
        for _ in range(n):
            rows.append((eid, k, float(round(rng.uniform(0, 50), 2))))
            eid += 1
    df = (spark.createDataFrame(rows, "event_id long, user_id long, value double")
          .repartition(4))
    got = {(r.user_id, r.event_id): (r.level, r.trend)
           for r in df.transform(ts.holt_linear(alpha=0.45, beta=0.35)).collect()}
    assert len(got) == len(rows)
    q = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
    by_key = {}
    for i, k, v in rows:
        by_key.setdefault(k, []).append((i, v))
    for k, xs in by_key.items():
        lv, tr = xs[0][1], 0.0
        assert got[(k, xs[0][0])] == (q(lv), q(tr))
        for i, x in xs[1:]:
            prev = lv + tr
            nlv = 0.45 * x + (1.0 - 0.45) * prev
            tr = 0.35 * (nlv - lv) + (1.0 - 0.35) * tr
            lv = nlv
            assert got[(k, i)] == (q(lv), q(tr))


def test_frequent_journeys_trigrams_and_guard(spark):
    from akka_stream_contrib_spark.operators.timeseries import (
        frequent_journeys)
    rows = ([(1, i, t) for i, t in enumerate("abcabc")]
            + [(2, i, t) for i, t in enumerate("abcx")]
            + [(3, 0, "a"), (3, 1, "b")])          # < 3 events: no trigram
    df = spark.createDataFrame(rows,
                               "user_id int, event_id int, event_type string")
    got = {r.journey: r.n for r in df.transform(frequent_journeys()).collect()}
    assert got == {"a>b>c": 3, "b>c>a": 1, "c>a>b": 1, "b>c>x": 1}
    # max_events guard excludes the long user entirely
    got2 = {r.journey: r.n
            for r in df.transform(frequent_journeys(max_events=5)).collect()}
    assert got2 == {"a>b>c": 1, "b>c>x": 1}
