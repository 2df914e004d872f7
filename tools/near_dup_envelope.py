"""Round-9 envelope probe for near_dup_pairs_blocked (verdict r8 item 8):
measured wall-clock across corpus size x nlist on the two corpus shapes
that bracket the design — UNIFORM (nothing prunes: the honest worst case,
blocked-exact O(N^2) GEMM) and CLUSTERED (the 100 TB shape: the spherical
cell-pair bound prunes most of the nlist^2 grid). Deterministic vectors
(integer LCG, no RNG)."""
import sys, time, json, math
sys.path.insert(0, "/root/repo")
import numpy as np
from akka_stream_contrib_spark import get_spark
from akka_stream_contrib_spark.functions import near_dup_pairs_blocked

spark = get_spark()
D = 32

def make(n, shape):
    # deterministic: LCG per (i, d)
    idx = np.arange(n, dtype=np.int64)[:, None] * D + np.arange(D)
    u = ((idx * 2654435761 + 12345) % 100003).astype(np.float64) / 100003.0 - 0.5
    if shape == "clustered":
        # 32 tight clusters: vector = cluster center + small jitter
        cents = ((np.arange(32, dtype=np.int64)[:, None] * D
                  + np.arange(D)) * 40503 % 9973).astype(np.float64) / 9973.0 - 0.5
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        v = cents[np.arange(n) % 32] + 0.05 * u
    else:
        v = u
    rows = [(int(i), [float(x) for x in v[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .repartition(32).cache()

out = []
for shape in ("uniform", "clustered"):
    for n in (10_000, 20_000, 40_000):
        df = make(n, shape)
        df.count()
        for nlist in (16, 64, 256):
            t0 = time.monotonic()
            cnt = near_dup_pairs_blocked(df, 0.9, nlist=nlist).count()
            w = round(time.monotonic() - t0, 2)
            rec = {"shape": shape, "n": n, "nlist": nlist,
                   "pairs": cnt, "wall_s": w}
            out.append(rec)
            print(json.dumps(rec), flush=True)
        df.unpersist()
json.dump(out, open("/root/repo/tools/near_dup_envelope_out.json", "w"), indent=1)
