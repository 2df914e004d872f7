"""Dump .explain("formatted") for the optimization-round target queries to
plans/r11/<query>_<tag>.txt (tag = before/after). Explain-only: plans are
built at sf0.001, nothing executes but the driver-side actions the query
builders themselves perform (seed probes, iteration counts).

Usage: python tools/dump_r11_plans.py <before|after> q1,q2,...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from akka_stream_contrib_spark import get_spark

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r11")


def main():
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-r11-plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt "
              f"({buf.getvalue().count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
