"""Paged-API unfold sources.

Re-expresses ``PagedSource`` (reference PagedSource.scala:27-53:
``firstKey → Future[Page(items, nextKey)]``, flatten items, stop on empty page
or exhausted key).

Two forms:

- ``paged_source(spark, fetch_page, first_key)`` — batch: the page walk is
  inherently sequential (each key comes from the previous page), so it runs
  as a driver loop accumulating rows, then parallelizes into a DataFrame.
- ``PagedDataSource`` — streaming: offset = next page key; each microbatch
  reads one page. The fetcher is named by the ``fetcher`` option as a dotted
  ``module:function`` path (data-source options are strings), with signature
  ``fetch(key: str) -> (rows: list[tuple], next_key: str | None)``.
"""

from __future__ import annotations

import importlib
from typing import Callable, Iterable, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StringType, StructField, StructType

FetchPage = Callable[[str], Tuple[Iterable[tuple], Optional[str]]]


def paged_source(spark: SparkSession, fetch_page: FetchPage, first_key: str,
                 schema: str, max_pages: int = 100_000) -> DataFrame:
    """Batch unfold of a paged API into a DataFrame. Stops on ``next_key is
    None`` or an empty page (PagedSource.scala:44-49)."""
    rows: list[tuple] = []
    key: Optional[str] = first_key
    if key is None:  # nothing to page
        return spark.createDataFrame(rows, schema=schema)
    for _ in range(max_pages):
        items, key = fetch_page(key)
        items = list(items)
        if not items:
            key = None
        rows.extend(items)
        # exhaustion is checked AFTER the fetch: an API whose final page
        # lands exactly on max_pages terminates cleanly instead of hitting
        # the for/else overflow error on the never-started next iteration
        if key is None:
            break
    else:
        raise RuntimeError(f"paged_source: exceeded max_pages={max_pages}")
    return spark.createDataFrame(rows, schema=schema)


def _resolve_fetcher(spec: str) -> FetchPage:
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)


class _PagedReader(SimpleDataSourceStreamReader):
    """One page per read; the offset carries the next key (or exhaustion).

    REPLAY CONTRACT: Spark recovers a crashed-but-committed batch through
    ``readBetweenOffsets``, which re-invokes the fetcher with the SAME page
    key — so exactly-once delivery holds only if ``fetch(key)`` is
    deterministic for a given key (an immutable page store, a snapshot/
    as-of-versioned API, or a caching shim). Against a LIVE mutating API
    the replayed batch may contain different rows than the original — the
    same at-least-once caveat the reference's PagedSource has (it re-calls
    ``f(key)`` on restart from a saved nextKey, PagedSource.scala); cache
    pages durably before this source if the pipeline needs exactly-once."""

    def __init__(self, options):
        spec = options.get("fetcher")
        if not spec:
            raise ValueError("paged requires option 'fetcher' = 'module:function'")
        self.fetch = _resolve_fetcher(spec)
        self.first_key = options.get("firstKey", "")

    def initialOffset(self):
        return {"key": self.first_key, "done": False}

    def read(self, start: dict):
        if start["done"]:
            return iter([]), start
        items, next_key = self.fetch(start["key"])
        items = list(items)
        if not items or next_key is None:
            return iter(items), {"key": start["key"], "done": True}
        return iter(items), {"key": next_key, "done": False}

    def readBetweenOffsets(self, start: dict, end: dict):
        if start["done"]:
            return iter([])
        items, _ = self.fetch(start["key"])
        return iter(list(items))


class PagedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "paged"

    def schema(self):
        # items are (page_key, item) strings by default; override with
        # .schema(...) on load for richer item tuples
        return StructType([
            StructField("page_key", StringType()),
            StructField("item", StringType()),
        ])

    def simpleStreamReader(self, schema):
        return _PagedReader(self.options)
