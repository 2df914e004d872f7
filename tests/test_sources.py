"""Source tests — the reference's IO fixtures (FileTailSourceTest.java,
DirectoryChangesTest.java, ZipInputStreamSourceSpec, PagedSourceSpec)
re-expressed with tempdirs + memory sinks."""

from __future__ import annotations

import io
import os
import time
import zipfile

import pytest

from akka_stream_contrib_spark.sources import register_sources
from akka_stream_contrib_spark.sources.paged import paged_source
from akka_stream_contrib_spark.sources.zip_source import total_bytes, zip_entries


def _run_until(query, predicate, timeout_s=90):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if predicate():
            return True
        time.sleep(0.3)
    return False


def test_file_tail_emits_appended_bytes(spark, tmp_path):
    register_sources(spark)
    log = tmp_path / "app.log"
    log.write_bytes(b"initial-content\n")
    q = (
        spark.readStream.format("file_tail")
        .option("path", str(log))
        .option("maxChunkSize", 8)
        .load()
        .writeStream.format("memory").queryName("tail_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        assert _run_until(q, lambda: spark.sql(
            "select count(*) c from tail_t").collect()[0].c >= 2)
        with open(log, "ab") as f:
            f.write(b"appended!\n")
        assert _run_until(q, lambda: b"appended!\n" in b"".join(
            bytes(r.chunk) for r in spark.sql(
                "select chunk from tail_t order by position").collect()))
        got = b"".join(bytes(r.chunk) for r in spark.sql(
            "select chunk from tail_t order by position").collect())
        assert got == b"initial-content\nappended!\n"
        # chunking respects maxChunkSize (reference: maxChunkSize bound)
        assert all(len(bytes(r.chunk)) <= 8 for r in
                   spark.sql("select chunk from tail_t").collect())
    finally:
        q.stop()


def test_directory_changes_feed(spark, tmp_path):
    register_sources(spark)
    watched = tmp_path / "watched"
    watched.mkdir()
    (watched / "pre_existing.txt").write_text("old")
    q = (
        spark.readStream.format("directory_changes")
        .option("path", str(watched))
        .load()
        .writeStream.format("memory").queryName("dirw_t")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # let the initial snapshot (offset) be taken before creating files:
        # a fixed sleep raced a loaded host (snapshot after a.txt => no
        # Creation event) — wait for the first completed micro-batch instead
        assert _run_until(q, lambda: q.lastProgress is not None)
        time.sleep(1.2)  # one extra trigger so the snapshot offset is live
        (watched / "a.txt").write_text("hello")
        assert _run_until(q, lambda: {("a.txt", "Creation")} <= {
            (os.path.basename(r.path), r.change)
            for r in spark.sql("select * from dirw_t").collect()})
        os.utime(watched / "pre_existing.txt", ns=(1, 10**15))
        (watched / "a.txt").unlink()
        assert _run_until(q, lambda: {
            ("pre_existing.txt", "Modification"), ("a.txt", "Deletion")} <= {
            (os.path.basename(r.path), r.change)
            for r in spark.sql("select * from dirw_t").collect()})
    finally:
        q.stop()


def test_zip_entries_chunks_and_nesting(spark, tmp_path):
    # ZipInputStreamSourceSpec: chunk count = ceil(size/chunk), dirs skipped,
    # nested .zip recursed, total-bytes materialized value
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("deep.txt", b"y" * 10)
    outer = tmp_path / "archive.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("small.txt", b"x" * 5)
        zf.writestr("big.bin", b"z" * 20)
        zf.writestr("a_dir/", b"")
        zf.writestr("nested.zip", inner.getvalue())
    df = zip_entries(spark, str(outer), chunk_size=8)
    rows = df.collect()
    by_entry = {}
    for r in rows:
        by_entry.setdefault(r.entry_name, []).append(r)
    assert set(by_entry) == {"small.txt", "big.bin", "nested.zip/deep.txt"}
    assert len(by_entry["small.txt"]) == 1        # ceil(5/8)
    assert len(by_entry["big.bin"]) == 3          # ceil(20/8)
    assert len(by_entry["nested.zip/deep.txt"]) == 2  # ceil(10/8)
    assert total_bytes(df) == 5 + 20 + 10


def test_zip_entries_udtf_matches_mapinpandas(spark, tmp_path):
    from akka_stream_contrib_spark.sources.zip_source import zip_entries_udtf
    outer = tmp_path / "u.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("a.txt", b"q" * 12)
    got = zip_entries_udtf(spark, str(outer), chunk_size=8).collect()
    ref = zip_entries(spark, str(outer), chunk_size=8).collect()
    key = lambda r: (r.entry_name, r.chunk_no)
    assert sorted([(r.entry_name, r.chunk_no, bytes(r.content)) for r in got]) == \
           sorted([(r.entry_name, r.chunk_no, bytes(r.content)) for r in ref])


def test_paged_source_batch_unfold(spark):
    # PagedSourceSpec.scala:14-63: linked pages, stop on null next key
    pages = {
        "first": ([("first", "a"), ("first", "b")], "second"),
        "second": ([("second", "c")], "third"),
        "third": ([], None),
    }
    df = paged_source(spark, lambda k: pages[k], "first",
                      schema="page_key string, item string")
    assert sorted(r.item for r in df.collect()) == ["a", "b", "c"]


def test_paged_source_stops_on_empty_first_page(spark):
    df = paged_source(spark, lambda k: ([], "next"), "first",
                      schema="page_key string, item string")
    assert df.count() == 0


def test_format_breadth_roundtrip(spark, tmp_path):
    """§2.7 scans checklist: csv / json / orc are Spark built-ins — verify a
    schema-stable round-trip so the claim is tested, not asserted."""
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "id long, s string, v double")
    got = {}
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / f"rt_{fmt}")
        if fmt == "csv":
            df.write.mode("overwrite").csv(path, header=True)
            back = spark.read.schema(df.schema).csv(path, header=True)
        elif fmt == "json":
            df.write.mode("overwrite").json(path)
            back = spark.read.schema(df.schema).json(path)
        else:
            df.write.mode("overwrite").orc(path)
            back = spark.read.orc(path)
        got[fmt] = sorted(map(tuple, back.collect()))
    expect = sorted(map(tuple, df.collect()))
    assert got == {"csv": expect, "json": expect, "orc": expect}


def test_read_jsonl_docs_routes_corrupt_records(spark, tmp_path):
    from akka_stream_contrib_spark.sources.ingest import (
        ingest_report, read_jsonl_docs)
    p = tmp_path / "docs.jsonl"
    p.write_text('\n'.join([
        '{"doc_id": 1, "text": "hello world"}',
        '{"doc_id": 2, "text": "ok"}',
        '{"doc_id": 3, "text": broken',          # malformed line
        'not json at all',
    ]) + '\n')
    good, bad = read_jsonl_docs(spark, str(p), "doc_id long, text string")
    grows = {r.doc_id: r.text for r in good.collect()}
    assert grows == {1: "hello world", 2: "ok"}
    braws = [r.raw for r in bad.collect()]
    assert len(braws) == 2 and any("broken" in r for r in braws)
    rep = ingest_report(good, bad).collect()[0]
    assert (rep.n_good, rep.n_bad, rep.bad_rate) == (2, 2, 0.5)


def test_zip_entries_tolerates_empty_and_corrupt_nested_archives(spark, tmp_path):
    """A zero-byte or non-zip payload behind a .zip name must yield NO
    entries (reference ZipInputStream.getNextEntry returns null) instead
    of failing the whole job with BadZipFile."""
    outer = tmp_path / "mixed.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("ok.txt", b"hello")
        zf.writestr("empty_placeholder.zip", b"")
        zf.writestr("corrupt.zip", b"this is not a zip archive")
    rows = zip_entries(spark, str(outer)).collect()
    assert {r.entry_name for r in rows} == {"ok.txt"}
    # a zero-byte TOP-LEVEL .zip beside a good one: job still completes
    (tmp_path / "empty_top.zip").write_bytes(b"")
    rows = zip_entries(spark, str(tmp_path / "*.zip")).collect()
    assert {r.entry_name for r in rows} == {"ok.txt"}


def test_file_tail_start_position_beyond_size_waits(tmp_path):
    """startingPosition past the current file size means 'not yet grown':
    the reader must poll (empty batch) like the reference, not trip the
    shrink detector. Truncation below CONSUMED data still raises."""
    from akka_stream_contrib_spark.sources.file_tail import _FileTailReader
    log = tmp_path / "future.log"
    log.write_bytes(b"0123456789")  # 10 bytes
    r = _FileTailReader({"path": str(log), "startingPosition": "100"})
    rows, off = r.read(r.initialOffset())
    assert list(rows) == [] and off == {"position": 100}
    # file grows past the start -> bytes from the offset are emitted
    log.write_bytes(b"x" * 105)
    rows, off = r.read({"position": 100})
    assert b"".join(c for _, c in rows) == b"x" * 5 and off == {"position": 105}
    # NOW a shrink below consumed data is a loud truncation error
    log.write_bytes(b"x" * 50)
    with pytest.raises(IOError):
        r.read({"position": 105})


def test_directory_changes_snapshot_skips_stat_race(tmp_path, monkeypatch):
    """A file deleted between the scandir listing and its stat() is a
    routine race: only THAT entry is skipped. Catching it around the whole
    scan committed a truncated snapshot that emitted phantom
    Deletion/Creation waves for still-present files."""
    import os as _os

    from akka_stream_contrib_spark.sources.directory_changes import _snapshot
    d = tmp_path / "watched"
    d.mkdir()
    (d / "a.txt").write_text("a")
    (d / "b.txt").write_text("b")
    (d / "c.txt").write_text("c")
    real_scandir = _os.scandir

    class _RacyEntry:
        def __init__(self, e):
            self._e = e
            self.path = e.path
        def is_file(self):
            return self._e.is_file()
        def stat(self):
            if self._e.path.endswith("b.txt"):
                raise FileNotFoundError(self._e.path)  # deleted mid-scan
            return self._e.stat()

    class _RacyScan:
        def __init__(self, path):
            self._it = real_scandir(path)
        def __enter__(self):
            return (_RacyEntry(e) for e in
                    sorted(self._it, key=lambda e: e.path))
        def __exit__(self, *a):
            self._it.close()

    monkeypatch.setattr(_os, "scandir", _RacyScan)
    snap = _snapshot(str(d))
    # b.txt's race skips b only — a and c are still present in the snapshot
    assert {p.rsplit("/", 1)[-1] for p in snap} == {"a.txt", "c.txt"}
