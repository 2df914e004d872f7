"""Decompose per-query fixed cost ("floor") at a small SF.

For each query: time (a) fn() — Python-side plan construction, (b) schema
access — analysis, (c) noop write — optimization + execution; and count the
Spark jobs / stages / tasks the execution submitted (statusTracker within a
job group). Two rounds per query; the second round is the compile-warm floor
the bench measures. Usage:

    python tools/profile_floor.py [sf_dir] [q1,q2,... | TOPN]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from akka_stream_contrib_spark import get_spark


def profile(spark, fn, sf_dir, name, rnd):
    sc = spark.sparkContext
    group = f"prof-{name}-{rnd}"
    sc.setJobGroup(group, name)
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    _ = df.schema
    t_schema = time.monotonic() - t0
    t0 = time.monotonic()
    df.write.mode("overwrite").format("noop").save()
    t_exec = time.monotonic() - t0
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for s in ji.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    sc.setJobGroup(f"prof-idle-{name}", "idle")
    return {"build": round(t_build, 3), "schema": round(t_schema, 3),
            "exec": round(t_exec, 3), "jobs": len(jobs),
            "stages": n_stages, "tasks": n_tasks}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    arg = sys.argv[2] if len(sys.argv) > 2 else "30"
    spark = get_spark("profile-floor")
    spark.range(1000).selectExpr("sum(id)").write.mode(
        "overwrite").format("noop").save()
    spark.range(100).mapInPandas(
        lambda it: it, "id long").write.mode(
        "overwrite").format("noop").save()
    qs = entrymod.queries()
    if "," in arg or arg in qs:
        names = [n for n in arg.split(",") if n in qs]
    else:
        # top-N by committed floor
        det = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json")))
        fl = det["queries_floor_sf001"]
        names = [k for k, _ in sorted(
            fl.items(), key=lambda kv: -kv[1])[:int(arg)]]
    out = {}
    for name in names:
        fn = qs[name]
        try:
            r1 = profile(spark, fn, sf_dir, name, 1)
            r2 = profile(spark, fn, sf_dir, name, 2)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAIL {ex}", flush=True)
            continue
        out[name] = {"cold": r1, "warm": r2}
        print(f"{name:28s} warm: build {r2['build']:6.3f} schema "
              f"{r2['schema']:6.3f} exec {r2['exec']:6.3f} "
              f"jobs {r2['jobs']:3d} stages {r2['stages']:3d} "
              f"tasks {r2['tasks']:4d}   (cold exec {r1['exec']:6.3f}, "
              f"cold jobs {r1['jobs']})", flush=True)
    with open("/tmp/profile_floor_out.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
