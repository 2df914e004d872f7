"""Round-9 quiet-host profiler for the two r8 perf-weak marks
(adamic_adar, dsir_select): clamp tell first, then warm/floor/oracle
in ONE process so the ratios are host-speed independent."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as entrymod
from akka_stream_contrib_spark import get_spark, tables

SF = "/root/testdata/sf0.1"
SF_SMALL = "/root/testdata/sf0.01"
spark = get_spark()
sc = spark.sparkContext

def clamp_probe():
    """Wide-parallel vs single-thread CPU work: quiet host => speedup near
    min(32, cores); a quota clamp collapses the wide number only."""
    import math
    def burn(n):
        t0 = time.monotonic()
        sc.parallelize(range(n), n).map(
            lambda i: sum(math.sqrt(x) for x in range(600000))).count()
        return time.monotonic() - t0
    burn(2)  # warm python workers
    one = burn(1)
    wide = burn(32)
    return {"one_task_sec": round(one, 3), "wide_32_sec": round(wide, 3),
            "speedup": round(32 * one / wide, 1)}

def run_spark(name, sf, reps=3):
    fn = entrymod.queries()[name]
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        ts.append(round(time.monotonic() - t0, 3))
    return ts

def run_duck(name, sf, reps=3):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    sql = entrymod.oracle_sql()[name]
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        ts.append(round(time.monotonic() - t0, 3))
    return ts

out = {"loadavg": open("/proc/loadavg").read().split()[:3],
       "clamp_probe": clamp_probe()}
print(json.dumps(out["clamp_probe"]), flush=True)

for name in ("adamic_adar", "dsir_select"):
    # compile warm at the small SF, then floor (small SF reps), then target
    run_spark(name, SF_SMALL, 1)
    floor = run_spark(name, SF_SMALL, 2)
    warm = run_spark(name, SF, 3)
    duck = run_duck(name, SF, 3)
    out[name] = {"floor_sf001": floor, "warm_sf01": warm, "duckdb_sf01": duck}
    print(name, json.dumps(out[name]), flush=True)

json.dump(out, open("/root/repo/tools/profile_weak_out.json", "w"), indent=1)
