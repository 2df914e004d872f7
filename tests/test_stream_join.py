"""Watermarked stream-stream interval join: streamed result == batch twin,
left_outer NULL-pads once the watermark closes the window, and the column
contract fails loudly instead of aliasing."""

from __future__ import annotations

import json
import time

import pytest

from akka_stream_contrib_spark.streaming import stream_interval_join


def _feed(dirpath, name, rows):
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows))


def _await_rows(spark, view, n, timeout_s=90):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if spark.sql(f"select count(*) c from {view}").collect()[0].c >= n:
            return True
        time.sleep(0.4)
    return False


IMP_SCHEMA = "user_id long, imp_id long, imp_ts timestamp"
CLK_SCHEMA = "user_id long, clk_id long, clk_ts timestamp"

IMPRESSIONS = [
    {"user_id": 1, "imp_id": 10, "imp_ts": "2024-01-01 10:00:00"},
    {"user_id": 1, "imp_id": 11, "imp_ts": "2024-01-01 11:00:00"},
    {"user_id": 2, "imp_id": 20, "imp_ts": "2024-01-01 10:30:00"},
    {"user_id": 3, "imp_id": 30, "imp_ts": "2024-01-01 10:00:00"},
]
CLICKS = [
    # inside [imp_ts, imp_ts+30min] of imp 10 only
    {"user_id": 1, "clk_id": 100, "clk_ts": "2024-01-01 10:20:00"},
    # exactly on imp 11's upper bound (inclusive)
    {"user_id": 1, "clk_id": 101, "clk_ts": "2024-01-01 11:30:00"},
    # right key, before imp 20 (lower bound 0 → no match)
    {"user_id": 2, "clk_id": 200, "clk_ts": "2024-01-01 10:29:00"},
    # user 3 never clicks
]
# (imp_id, clk_id) pairs inside the 30-minute window
EXPECTED_INNER = {(10, 100), (11, 101)}


def test_stream_interval_join_inner_matches_batch_twin(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    _feed(imp_dir, "b1.json", IMPRESSIONS)
    _feed(clk_dir, "b1.json", CLICKS)
    imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
    clks = spark.readStream.schema(CLK_SCHEMA).json(str(clk_dir))
    out = stream_interval_join(
        imps, clks, on="user_id", l_ts="imp_ts", r_ts="clk_ts",
        lower_s=0, upper_s=1800,
        l_watermark="10 minutes", r_watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("sij_inner")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="1 second").start())
    try:
        assert _await_rows(spark, "sij_inner", len(EXPECTED_INNER))
        got = {(r.imp_id, r.clk_id)
               for r in spark.sql("select * from sij_inner").collect()}
        assert got == EXPECTED_INNER
        # the module's documented batch-backtest path: same call, batch
        # frames (watermark no-op) — identical pairs
        bi = spark.createDataFrame(
            [(r["user_id"], r["imp_id"], r["imp_ts"]) for r in IMPRESSIONS],
            "user_id long, imp_id long, imp_ts string"
        ).selectExpr("user_id", "imp_id", "cast(imp_ts as timestamp) imp_ts")
        bc = spark.createDataFrame(
            [(r["user_id"], r["clk_id"], r["clk_ts"]) for r in CLICKS],
            "user_id long, clk_id long, clk_ts string"
        ).selectExpr("user_id", "clk_id", "cast(clk_ts as timestamp) clk_ts")
        batch = stream_interval_join(
            bi, bc, on="user_id", l_ts="imp_ts", r_ts="clk_ts",
            lower_s=0, upper_s=1800)
        assert {(r.imp_id, r.clk_id) for r in batch.collect()} \
            == EXPECTED_INNER
    finally:
        q.stop()


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    _feed(imp_dir, "b1.json", IMPRESSIONS)
    _feed(clk_dir, "b1.json", CLICKS)
    imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
    clks = spark.readStream.schema(CLK_SCHEMA).json(str(clk_dir))
    out = stream_interval_join(
        imps, clks, on="user_id", l_ts="imp_ts", r_ts="clk_ts",
        lower_s=0, upper_s=1800,
        l_watermark="10 minutes", r_watermark="10 minutes",
        how="left_outer")
    q = (out.writeStream.format("memory").queryName("sij_outer")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="1 second").start())
    try:
        assert _await_rows(spark, "sij_outer", len(EXPECTED_INNER))
        # advance BOTH watermarks far past every impression's upper bound so
        # the unmatched rows (imp 20, imp 30) provably have no future partner
        _feed(imp_dir, "b2.json", [
            {"user_id": 9, "imp_id": 90, "imp_ts": "2024-01-01 23:00:00"}])
        _feed(clk_dir, "b2.json", [
            {"user_id": 9, "clk_id": 900, "clk_ts": "2024-01-01 23:00:00"}])
        # 2 inner + the watermark-advancing (90, 900) pair itself + the two
        # NULL-padded no-click impressions = 5 rows before asserting
        assert _await_rows(spark, "sij_outer", len(EXPECTED_INNER) + 3)
        rows = spark.sql("select * from sij_outer").collect()
        matched = {(r.imp_id, r.clk_id) for r in rows if r.clk_id is not None}
        nulls = {r.imp_id for r in rows if r.clk_id is None}
        assert EXPECTED_INNER <= matched
        assert {20, 30} <= nulls  # no-click impressions surfaced NULL-padded
    finally:
        q.stop()


def test_stream_interval_join_contract_errors(spark):
    df_l = spark.createDataFrame([], "user_id long, v long, lts timestamp")
    df_r = spark.createDataFrame([], "user_id long, v long, rts timestamp")
    with pytest.raises(ValueError, match="non-key column"):
        stream_interval_join(df_l, df_r, "user_id", "lts", "rts")
    df_r2 = spark.createDataFrame([], "user_id long, w long, lts timestamp")
    with pytest.raises(ValueError, match="distinct column names"):
        stream_interval_join(df_l, df_r2, "user_id", "lts", "lts")
    df_r3 = spark.createDataFrame([], "user_id long, w long, rts timestamp")
    with pytest.raises(ValueError, match="empty interval"):
        stream_interval_join(df_l, df_r3, "user_id", "lts", "rts",
                             lower_s=10, upper_s=5)
    with pytest.raises(ValueError, match="how must be"):
        stream_interval_join(df_l, df_r3, "user_id", "lts", "rts",
                             how="full_outer")
    with pytest.raises(ValueError, match="must exist on both"):
        stream_interval_join(df_l, df_r3, "nope", "lts", "rts")


def test_stream_interval_join_drops_click_past_watermark(spark, tmp_path):
    """Out-of-order-past-watermark drop: once the committed right watermark
    has passed an impression's whole match window, an in-window click that
    arrives late must be DROPPED across a restart (a batch join over the
    same rows would match it) — the contract that keeps join state bounded."""
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # batch 1: the target impression, plus a far-future pair on another key
    # that (a) proves the join works on-time and (b) advances both
    # watermarks to 22:50, far past imp 10's [10:00, 10:30] match window
    _feed(imp_dir, "b1.json", [
        {"user_id": 1, "imp_id": 10, "imp_ts": "2024-01-01 10:00:00"},
        {"user_id": 9, "imp_id": 90, "imp_ts": "2024-01-01 23:00:00"}])
    _feed(clk_dir, "b1.json", [
        {"user_id": 9, "clk_id": 900, "clk_ts": "2024-01-01 23:00:00"}])
    imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
    clks = spark.readStream.schema(CLK_SCHEMA).json(str(clk_dir))
    out = stream_interval_join(
        imps, clks, on="user_id", l_ts="imp_ts", r_ts="clk_ts",
        lower_s=0, upper_s=1800,
        l_watermark="10 minutes", r_watermark="10 minutes")

    def run_once():
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        q.stop()

    run_once()
    # second zero-data run: the watermark derived from batch 1 is committed
    # in the checkpoint before the late click exists anywhere
    run_once()
    # restart with ONLY the late click pending: 10:20 is inside imp 10's
    # window but hours below the committed 22:50 watermark
    _feed(clk_dir, "b2.json", [
        {"user_id": 1, "clk_id": 100, "clk_ts": "2024-01-01 10:20:00"}])
    run_once()
    got = {(r.imp_id, r.clk_id)
           for r in spark.read.parquet(out_dir).collect()}
    assert (90, 900) in got, "on-time pair must join"
    assert (10, 100) not in got, \
        "click past the committed watermark must be dropped"
