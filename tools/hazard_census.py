"""Scale-hazard census over the headline queries (explain-only, sf0.001).

Third census lens of r11 (after the session-2 job census and session-3
scan census): flags plan shapes that are fine at bench SFs but lethal at
100 TB — SinglePartition exchanges (global one-reducer funnels),
CartesianProduct / BroadcastNestedLoopJoin (pair-space blowups), and
Sort-bearing windows hash-partitioned on a low-cardinality key (hot-key
single-reducer sorts — the neyman/spearman/interleave family session 2
fixed). Known-bounded shapes are whitelisted in the report, not hidden.

Usage: python tools/hazard_census.py [out.json] [q1,q2,...]
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

#: columns whose domain is bounded by the fixture schema (≤ ~20 values) —
#: a Sort window partitioned ONLY by these funnels the corpus into that
#: many reducer tasks at any scale
LOW_CARD = {"event_type", "lang", "source", "l_returnflag", "l_linestatus",
            "o_orderpriority", "o_orderstatus", "side", "slice", "bin",
            "label", "stratum", "branch"}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hazard_census.json"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("hazard-census")
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
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", flush=True)
            continue
        single = len(re.findall(r"Exchange SinglePartition", txt))
        cart = txt.count("CartesianProduct")
        bnlj = txt.count("BroadcastNestedLoopJoin")
        # hash partitionings whose key set is entirely low-cardinality
        hot = []
        for args in re.findall(r"hashpartitioning\(([^)]*)\)", txt):
            cols = {c.strip().split("#")[0] for c in args.split(",")
                    if "#" in c}
            cols.discard("")
            if cols and cols <= LOW_CARD:
                hot.append(sorted(cols))
        rec = {"single_partition": single, "cartesian": cart,
               "bnlj": bnlj, "hot_hash": hot}
        rows[name] = rec
        if single or cart or bnlj or hot:
            print(f"{name}: single={single} cart={cart} bnlj={bnlj} "
                  f"hot={hot}", flush=True)
        drop_stale_caches()
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    n_flagged = sum(1 for v in rows.values()
                    if any(v.get(k) for k in
                           ("single_partition", "cartesian", "bnlj",
                            "hot_hash")))
    print(f"wrote {out_path} ({len(rows)} queries, {n_flagged} flagged)")


if __name__ == "__main__":
    main()
