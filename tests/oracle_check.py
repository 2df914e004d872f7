"""Local replica of the driver's correctness gate: run each entry in
``queries()`` on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables, then compare row count, column names, order-insensitive
values, AND the pandas dtype class of every column.

The dtype check exists because the driver hashes the *pandas* rendering of
both result sets (Spark ``toPandas()`` vs DuckDB ``.df()``).  DuckDB returns
``SUM(int)`` as HUGEINT, which pandas renders as float64, while Spark gives
int64 — so an oracle with an unpinned integer SUM hashes ``5.0`` against
``5`` and fails at the driver even though ``fetchall()`` (exact Python ints)
says the values are identical.  That blind spot shipped red twice (rounds
1 and 3); this replica now compares int/float/bool dtype classes via the
same pandas path the driver uses, so an unpinned SUM fails locally too.

Used by tests and by ad-hoc dev runs (python tests/oracle_check.py).
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    """Canonicalize one pandas-rendered value so equal data compares equal
    across the two engines' pandas conventions: numpy scalars unwrap,
    arrays/lists become tuples, NaT/None→None, NaN→"NaN", Decimal→float,
    and date-like values render as the day when the time part is zero
    (DuckDB renders DATE as a midnight Timestamp, Spark as datetime.date)."""
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm(x) for x in v)
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        if pd.isna(v):  # NaT
            return None
        v = v.replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(_norm(r[i])) for i in order) for r in rows)


def _dtype_class(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's hash distinguishes:
    int widths are interchangeable (int32 vs int64 both render ``5``) but
    int-vs-float is not (``5`` vs ``5.0``)."""
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    return "other"


def _pandas_dtype_classes(pdf) -> dict[str, str]:
    return {c.lower(): _dtype_class(t) for c, t in pdf.dtypes.items()}


def compare_query(spark, name: str, qfn, sql: str | None, sf_dir: str,
                  max_diff_show: int = 5) -> tuple[bool, str]:
    # each side executes exactly ONCE (the driver does too): everything —
    # row count, dtype classes, values — derives from the single pandas
    # frame each engine produced, which is also the representation the
    # driver hashes
    sdf = qfn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    if sql is None:
        return True, f"{name}: rows-only ({sdf.count()} rows)"
    spdf = sdf.toPandas()
    con = duck_connection(sf_dir)
    try:
        dpdf = con.execute(sql).df()
    finally:
        con.close()
    dcols = [c.lower() for c in dpdf.columns]
    if sorted(scols) != sorted(dcols):
        return False, f"{name}: SCHEMA mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    if len(spdf) != len(dpdf):
        return False, f"{name}: ROWCOUNT mismatch spark={len(spdf)} duck={len(dpdf)}"
    # Driver-faithful dtype gate: both sides are hashed via pandas, where
    # DuckDB HUGEINT (unpinned integer SUM) renders float64 vs Spark int64.
    skinds = _pandas_dtype_classes(spdf)
    dkinds = _pandas_dtype_classes(dpdf)
    drift = {c: (skinds[c], dkinds[c]) for c in skinds
             if skinds[c] != dkinds.get(c, skinds[c])}
    if drift:
        return False, (f"{name}: PANDAS-DTYPE mismatch (spark, duck) = {drift}"
                       " — pin the oracle (e.g. CAST(sum(...) AS BIGINT))")
    # itertuples preserves per-cell types (df.values would upcast columns)
    sm = _rows_to_multiset(scols, list(spdf.itertuples(index=False, name=None)))
    dm = _rows_to_multiset(dcols, list(dpdf.itertuples(index=False, name=None)))
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:max_diff_show]
        return False, f"{name}: VALUE mismatch; first diffs: {diffs}"
    return True, f"{name}: OK ({len(spdf)} rows)"


def run_all(sf_dir: str = "/root/testdata/sf0.001", only: list[str] | None = None):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from akka_stream_contrib_spark import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        try:
            ok, msg = compare_query(spark, name, qfn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"{name}: EXCEPTION {type(e).__name__}: {e}"
        print(("PASS " if ok else "FAIL ") + msg, flush=True)
        if not ok:
            failures.append(name)
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    fails = run_all(sf, only)
    print(f"\n{'ALL PASS' if not fails else 'FAILURES: ' + ','.join(fails)}")
    sys.exit(1 if fails else 0)
