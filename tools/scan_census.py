"""Scan-count census over the headline queries (explain-only, sf0.001).

Complements the r11 session-2 JOB census: a repeated parquet scan hides
inside a single job (e.g. a union of two filtered reads of one table), so
job counts alone cannot see it. For every headline query this dumps, from
the formatted explain string: per-table "Scan parquet" counts, Exchange
mentions, and any BatchEvalPython/ArrowEvalPython nodes (should be zero).
Queries whose plan explains as a checkpoint stub (the iterative loops)
scan-count as ~0 by construction — their audit lives in the job census.

Usage: python tools/scan_census.py [out.json] [q1,q2,...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from akka_stream_contrib_spark import get_spark
from akka_stream_contrib_spark.util import drop_stale_caches

SF = "/root/testdata/sf0.001"


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scan_census.json"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("scan-census")
    qs = entrymod.queries()
    names = [n for n in bench.HEADLINE if n in qs]
    if only:
        names = [n for n in names if n in only]
    rows = {}
    for name in names:
        try:
            df = qs[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — census must survive one bad query
            rows[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", flush=True)
            continue
        # details section: map scan node id -> table name
        id2table = dict(re.findall(
            r"\((\d+)\) Scan parquet ?\nOutput[^\n]*\nBatched[^\n]*\n"
            r"Location: \w+ \[[^\]]*/([\w.]+)\.parquet\]", txt))
        # tree section: each mention of the node id is one executed scan
        per_table = {}
        scans = []
        for nid in re.findall(r"Scan parquet\s+\((\d+)\)", txt):
            t = id2table.get(nid, f"node{nid}")
            per_table[t] = per_table.get(t, 0) + 1
            scans.append(t)
        rows[name] = {
            "scans": per_table,
            "n_scans": len(scans),
            "exchange": txt.count("Exchange"),
            "py_eval": txt.count("BatchEvalPython") + txt.count("ArrowEvalPython"),
            "inmem": txt.count("InMemoryRelation"),
        }
        hot = {t: c for t, c in per_table.items() if c >= 3}
        flag = f"  <-- {hot}" if hot else ""
        print(f"{name}: scans={per_table} ex={rows[name]['exchange']}"
              f" py={rows[name]['py_eval']}{flag}", flush=True)
        drop_stale_caches()
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
