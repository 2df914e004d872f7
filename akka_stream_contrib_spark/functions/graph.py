"""Graph analytics over DataFrames: PageRank by power iteration.

Complements `functions/dedup.py::dup_clusters` (connected components via
min-label propagation) as the second iterative-algorithm family: cyclic
dataflow expressed as a driver-side loop over DataFrames, the Spark
re-expression of the reference's feedback wiring
(`FeedbackLoop.scala:18-38` — outputs re-injected as inputs, bounded by an
explicit iteration budget instead of a buffer).

Scale shape: each iteration is one shuffle (the contribution aggregation on
dst); the edge table is computed once, and the per-iteration lineage is
truncated by a pipeline-scoped persist (r10: `pipeline_cache` instead of an
eager `localCheckpoint` — CacheManager substitutes the cached subtree during
planning, so the EXECUTED plan is just as truncated, but no per-iteration
materialization JOB runs on the driver: the whole loop executes inside the
consumer's single action; measured 3.1 → 2.7 s warm on pagerank_users at
sf0.1, 43 → 5 jobs). The caveat that shapes this family: the ANALYZED tree
is not truncated by a persist, so a loop whose state back-references the
previous state k>1 times grows that tree like k^iterations — fine for the
k=2 / 3-iteration forms here (plans and analysis cost were measured), but
hits_scores (k=3) hit 36.7 s of driver-side analysis and was restructured
to a k=1 sparse linear chain instead (see `hits_scores`). Loops with many
iterations or multi-reference state should fall back to an eager
`localCheckpoint` every few iterations; note `localCheckpoint(eager=False)`
is NOT a fix — under AQE the RDD conversion runs all intermediate stages
eagerly, measured strictly worse than both alternatives. Rank state is one
row per node — the same
footprint any MPP PageRank carries. Dangling mass (nodes with no out-edges)
is redistributed uniformly each iteration, keeping the rank vector summing
to 1 (up to FP) like the textbook formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Power-iteration PageRank over the directed edge list ``edges``
    (duplicate edges are collapsed). Returns (id, rank) for every node that
    appears as a source or destination. Fixed ``iterations`` (the driver-loop
    analogue of the reference's bounded feedback buffer); ranks are rounded
    to 6 dp only by callers that need engine-portable output.
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    e = pipeline_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct())
    nodes = pipeline_cache(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct())
    # the one unavoidable driver action (1/n is a plan literal); it also
    # fully materializes the e and nodes caches in a single job
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (e.join(ranks.join(out_deg, ranks.id == out_deg.src)
                          .select("id", (F.col("rank") / F.col("out_deg"))
                                  .alias("share")),
                          e.src == F.col("id"))
                   .groupBy("dst").agg(F.sum("share").alias("inflow")))
        # dangling mass (rank held by nodes with no out-edges) stays a
        # broadcast 1-row frame folded into the rank update — no driver
        # .head() round-trip per iteration; its broadcast build is what
        # materializes the previous iteration's rank cache. The
        # expression order — (base + d·m/n) + d·inflow — is the one the
        # unrolled DuckDB oracle mirrors; keep them in lockstep.
        dangling = (ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")))
        ranks = pipeline_cache(
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select("id",
                    (F.lit(base)
                     + F.lit(damping) * F.col("m") / F.lit(float(n))
                     + F.lit(damping)
                     * F.coalesce(F.col("inflow"), F.lit(0.0)))
                    .alias("rank")))
    return ranks


def _wedge_frames(edges: DataFrame, src: str, dst: str
                  ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared compact-forward pipeline: canonical undirected edges,
    degrees, and the oriented wedge stream (see `triangle_count` for the
    scale argument). Returns (und, deg, wedges)."""
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                        F.greatest(F.col(src), F.col(dst)).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    # one scan of `und` (explode both endpoints), not a 2-scan unionAll —
    # halves the upstream recomputation in the physical plan
    deg = (und.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count(F.lit(1)).alias("d")))
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (und.join(da, F.col("a") == F.col("da.v"))
                .join(db, F.col("b") == F.col("db.v"))
                .select(
                    F.when((F.col("da.d") < F.col("db.d"))
                           | ((F.col("da.d") == F.col("db.d"))
                              & (F.col("a") < F.col("b"))),
                           F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")))
                    .otherwise(F.struct(F.col("b").alias("lo"),
                                        F.col("a").alias("hi"))).alias("e"))
                .select("e.lo", "e.hi"))
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w1"))
    e2 = oriented.select(F.col("lo").alias("u2"), F.col("hi").alias("w2"))
    wedges = (e1.join(e2, (F.col("u") == F.col("u2"))
                      & (F.col("w1") < F.col("w2")))
              .select("u", "w1", "w2"))
    return und, deg, wedges


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact global triangle and wedge counts over the undirected simple
    graph induced by ``edges`` (direction and duplicates collapsed, self
    loops dropped). Returns one row ``(n_wedges, n_triangles)``.

    Compact-forward scheme: vertices are totally ordered by (degree, id)
    and every edge is oriented low→high under that order, so each triangle
    is enumerated exactly once and — the 100 TB point — the wedge join
    fans out only from each edge's LOWER-degree endpoint. Against a Zipf
    degree distribution that bounds intermediate wedges near the O(m^1.5)
    optimum instead of Σ deg² blowing up on hub nodes. Plan: two hash
    joins on vertex keys (wedge build + closing-edge probe), no crossJoin,
    all counting map-side-combined.
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    und, deg, wedges = _wedge_frames(edges, src, dst)
    # like local_clustering: the physical plan reads `und` SEVEN times
    # (deg build, 2 degree-join sides of each of the 2 oriented
    # evaluations inside the wedge self-join, the closing probe) and
    # `deg` four — with exchange reuse NOT firing across the aliased
    # branches (0 ReusedExchange in the executed plan). Cache both so the
    # edge canonicalization (scan + distinct shuffle) and the degree
    # shuffle run once; the CacheManager substitutes the cached subtrees
    # inside the already-built `wedges` plan by canonical equality.
    und = pipeline_cache(und)
    deg = pipeline_cache(deg)
    # wedge endpoints are value-ordered (w1 < w2) and `und` is canonical
    # (a < b), so the closing-edge probe is a single EQUI semi-join — a
    # disjunctive form here would force a nested-loop join and blow up on
    # dense graphs.
    # LEFT join, not semi + a second wedge scan: `und` is canonically
    # distinct so each wedge matches at most once (no fanout), and one
    # aggregation then yields BOTH counts in a single pass over the wedge
    # stream — the wedge set (the big intermediate) is never recomputed.
    und2 = und.select(F.col("a").alias("c1"), F.col("b").alias("c2"))
    closed = wedges.join(
        und2, (F.col("w1") == F.col("c1")) & (F.col("w2") == F.col("c2")),
        "left")
    return closed.agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.count(F.col("c1")).alias("n_triangles"))


def local_clustering(edges: DataFrame, src: str = "src", dst: str = "dst",
                     ) -> DataFrame:
    """Per-node local clustering coefficient over the undirected simple
    graph: ``c(v) = 2·tri(v) / (deg(v)·(deg(v)−1))`` — how close each
    node's neighborhood is to a clique; the node-level drill-down of
    `triangle_count`'s global transitivity (community-structure probes,
    bot/spam-account signals in co-activity graphs).

    Same compact-forward wedge stream as `triangle_count` (shared
    `_wedge_frames` — the low-degree-endpoint fanout bound is what
    survives Zipf degrees at 100 TB); each CLOSED wedge credits one
    triangle to all three of its vertices via a 3-way explode, one
    map-combined count per node. All integers up to the one coefficient
    division. Nodes with degree < 2 are excluded (the coefficient is
    undefined). Returns (node, degree, triangles, coefficient).

    Reference anchor: none (graph-analytics extension; family of
    triangle_count / pagerank).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    und, deg, wedges = _wedge_frames(edges, src, dst)
    # unlike triangle_count's single-consumer chain, this op reads `und`
    # three times (degrees, orientation, closing probe) and `deg` twice
    # (orientation, output) — cache both so the edge canonicalization and
    # the degree shuffle run once
    und = pipeline_cache(und)
    deg = pipeline_cache(deg)
    und2 = und.select(F.col("a").alias("c1"), F.col("b").alias("c2"))
    closed = wedges.join(
        und2, (F.col("w1") == F.col("c1")) & (F.col("w2") == F.col("c2")))
    tri = (closed.select(F.explode(F.array("u", "w1", "w2")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))
    out = (deg.filter(F.col("d") >= 2)
           .join(tri, deg.v == tri.node, "left")
           .select(F.col("v").alias("node"),
                   F.col("d").alias("degree"),
                   F.coalesce("triangles", F.lit(0).cast("long"))
                   .alias("triangles")))
    coef = (F.lit(2) * F.col("triangles")).cast("double") \
        / (F.col("degree") * (F.col("degree") - F.lit(1))).cast("double")
    return out.select(
        "node", "degree", "triangles",
        (F.round(coef, 6) + F.lit(0.0)).alias("coefficient"))


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Degree assortativity of the undirected simple graph: the Pearson
    correlation of endpoint degrees over all edges, both orientations
    (Newman 2002) — positive means hubs link to hubs (social nets),
    negative means hubs link to leaves (the fraud-ring / botnet shape).
    Completes the structural family: triangle_count (global closure),
    local_clustering (per-node), assortativity (mixing).

    Exact integer moment sums to the end: both-orientation sums make
    Σx = Σy and Σx² = Σy², products go through decimal (the int64
    overflow discipline — deg² · edges overflows at ~1e6-degree hubs),
    and the final Pearson combination is one double expression over the
    exact sums, NULL (try_divide) on a degree-regular graph where the
    variance is 0. One groupBy for degrees + one broadcast-degree join
    per endpoint + a 1-row reduction. Returns
    (n_edges, assortativity).

    Reference anchor: none (graph-analytics extension; family of
    triangle_count / local_clustering).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    und, deg, _wedges = _wedge_frames(edges, src, dst)
    # like local_clustering: `und` feeds the degree build AND the moment
    # join, `deg` joins twice (one alias per endpoint) — cache both so the
    # edge canonicalization and the degree shuffle run once
    und = pipeline_cache(und)
    deg = pipeline_cache(deg)
    da, db = deg.alias("da"), deg.alias("db")
    joined = (und.join(da, F.col("a") == F.col("da.v"))
              .join(db, F.col("b") == F.col("db.v"))
              .select(F.col("da.d").alias("dx"), F.col("db.d").alias("dy")))
    # both orientations: each undirected edge contributes (dx,dy), (dy,dx)
    x = F.col("dx").cast("decimal(19,0)")
    y = F.col("dy").cast("decimal(19,0)")
    agg = joined.agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum(x + y).alias("_sx"),
        F.sum(x * x + y * y).alias("_sxx"),
        # decimal(19,0)² needs precision 39 -> Spark trims; keep the
        # factors narrow (degrees < 1e9) so the product stays exact
        F.sum(F.lit(2).cast("decimal(10,0)")
              * F.col("dx").cast("decimal(14,0)")
              * F.col("dy").cast("decimal(14,0)")).alias("_sxy"))
    n = (F.col("_m") * 2).cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    return agg.select(
        F.col("_m").alias("n_edges"),
        (F.round(F.try_divide(num, den), 6) + F.lit(0.0))
        .alias("assortativity"))



def _symmetric(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Shared symmetric undirected view for the peel/sweep/frontier family
    (k_core / lpa_communities / bfs_hops): self-loops dropped, both
    directions materialized, deduped, lineage cut with a pipeline-scoped
    persist (every consumer iterates over it; the first round's driver
    action fills the cache — no separate eager-checkpoint job)."""
    from akka_stream_contrib_spark.util import pipeline_cache

    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .filter(F.col("a") != F.col("b")))
    return pipeline_cache(
        und.union(und.select(F.col("b").alias("a"),
                             F.col("a").alias("b")))
        .distinct())


def hits_scores(edges: DataFrame, iterations: int = 3,
                src: str = "src", dst: str = "dst") -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, JACM: "Authoritative
    sources in a hyperlinked environment") over the directed edge list —
    the bipartite-influence companion to `pagerank`: a good HUB points at
    good authorities, a good AUTHORITY is pointed at by good hubs. The
    curation use: over a citation/link graph, authorities are the
    canonical documents, hubs the index pages.

    Synchronous power iteration with DEFERRED L1 normalization: the
    update is linear, so the per-half-step norms are scalar factors that
    cancel — the loop runs unnormalized
      auth'(v) = Σ_{u→v} hub(u),   hub'(u) = Σ_{u→v} auth'(v)
    and both vectors are L1-normalized ONCE at the end, giving the same
    direction as the textbook interleaved form while saving the two
    broadcast-norm driver jobs every iteration. Unnormalized magnitudes
    grow like ‖A‖₁^iterations — for 3 iterations far inside double range
    on any real graph. Fixed ``iterations`` (driver-loop family of
    pagerank / kmeans / logreg / BPE-learn).

    r10 shape — SPARSE LINEAR CHAIN: the loop iterates on sparse vectors
    (hub defined only on nodes with out-edges, auth only on nodes with
    in-edges). The per-iteration zero-fill joins of the old form were
    mathematically inert — a zero hub/auth entry contributes nothing to
    the next half-step's sums and such nodes never match the edge join
    anyway — so zero-fill happens ONCE at the end for the output rows.
    That removes 2 of the 4 joins per iteration AND makes each step
    back-reference its predecessor exactly once, so the analyzed plan
    grows linearly in ``iterations`` (the old state frame was referenced
    3× per iteration; with persist-only truncation that analyzed tree
    grew 3^n — measured 36.7 s of driver time at 3 iterations; see the
    module docstring).

    Scale shape: each half-step is one shuffle (aggregation on the
    receiving endpoint); state is one row per node; one broadcast 1-row
    norm frame at the end. Float sums associate differently across
    engines (~1e-16 relative); callers round for portable output (the
    pagerank convention).

    Returns (id, hub, auth) for every node appearing in the edge list.

    Reference anchor: the cyclic wiring is `FeedbackLoop.scala:18-38`
    re-expressed (same anchor as pagerank).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    e = pipeline_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct())
    nodes = pipeline_cache(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct())
    # count, not isEmpty: the one driver job fully materializes the e and
    # nodes caches (a take(1) probe would cache only the scanned slice and
    # the loop would recompute the rest)
    if nodes.count() == 0:
        return nodes.select("id", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("auth"))
    # sparse hub_0: every node starts at hub = 1.0, but only nodes with
    # out-edges ever contribute to an auth sum — iterate on those
    hub = e.select(F.col("src").alias("id")).distinct() \
           .withColumn("hub", F.lit(1.0))
    # iterations <= 0: the all-ones vectors, normalized (old behavior)
    auth = nodes.withColumn("auth", F.lit(1.0))
    if iterations <= 0:
        hub = nodes.withColumn("hub", F.lit(1.0))
    for _ in range(iterations):
        # two half-steps, each one shuffle; intermediate steps have a
        # single consumer so they stay uncached (the chain executes once
        # inside the final action) — only the LAST auth/hub pair, read
        # twice (norms + output), is pipeline-cached below
        auth = (e.join(hub.select(F.col("id").alias("_s"), "hub"),
                       e.src == F.col("_s"))
                .groupBy("dst").agg(F.sum("hub").alias("auth"))
                .select(F.col("dst").alias("id"), "auth"))
        hub = (e.join(auth.select(F.col("id").alias("_d"), "auth"),
                      e.dst == F.col("_d"))
               .groupBy("src").agg(F.sum("auth").alias("hub"))
               .select(F.col("src").alias("id"), "hub"))
    auth = pipeline_cache(auth)
    hub = pipeline_cache(hub)
    norms = hub.agg(F.sum("hub").alias("_hn")).crossJoin(
        auth.agg(F.sum("auth").alias("_an")))
    return (nodes.join(hub.select(F.col("id").alias("_h"), "hub"),
                       nodes.id == F.col("_h"), "left")
            .join(auth.select(F.col("id").alias("_a"), "auth"),
                  nodes.id == F.col("_a"), "left")
            .crossJoin(F.broadcast(norms))
            .select("id",
                    (F.coalesce(F.col("hub"), F.lit(0.0))
                     / F.col("_hn")).alias("hub"),
                    (F.coalesce(F.col("auth"), F.lit(0.0))
                     / F.col("_an")).alias("auth")))


def k_core(edges: DataFrame, k: int = 3, rounds: int = 8,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core membership by synchronous peeling over the UNDIRECTED view
    of the edge list: repeatedly delete every node whose remaining degree
    is < ``k``; what survives is the k-core (Seidman 1983, "Network
    structure and minimum degree"). The community-density filter — spam
    rings and tightly-coupled crawl clusters sit in high cores, stragglers
    in low ones.

    Runs exactly ``rounds`` synchronous peel rounds (driver-loop family of
    pagerank; each round = one degree aggregation + one semi-join, lineage
    truncated with localCheckpoint). The result equals the true k-core
    whenever peeling has converged by then — the loop exits early on a
    fixpoint (a bounded driver count per round) — and the fixed bound is
    what lets the DuckDB oracle replay the identical rounds as unrolled
    CTEs; on adversarial path-like graphs needing more rounds, raise
    ``rounds`` (converged-by verified in tests at all fixture SFs).

    All-integer arithmetic — exact on any engine/partitioning.

    Returns (id, degree, in_core): remaining degree after the final
    completed round for SURVIVING nodes with in_core = true; peeled nodes
    are absent.

    Reference anchor: none (graph-analytics extension; family of
    pagerank / triangle_count / local_clustering).
    """
    from akka_stream_contrib_spark.util import (pipeline_cache,
                                                release_pipeline_cache)

    und = _symmetric(edges, src, dst)
    alive = und
    prev_n = None
    # NOTE (r11): probing only every 2nd round was tried and REJECTED —
    # the probe is a load-bearing CACHE-MATERIALIZATION barrier, not just
    # a fixpoint check: keep_r is referenced twice by alive_r (both join
    # sides), so an unprobed round's cache fills race inside the next
    # job and recompute shared subtrees concurrently (measured warm build
    # 0.81 → 5.49 s at sf0.1 with the every-2nd cadence). Per-round
    # probes stay; what r11 adds is the eager release of superseded
    # rounds' caches (guide §5 — bounded storage over many rounds).
    superseded: list = []
    for _ in range(rounds):
        deg = alive.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
        keep = pipeline_cache(deg.filter(F.col("degree") >= k).select("a"))
        # the fixpoint probe is the round's ONLY driver job; it fully
        # materializes keep (and, transitively, the previous round's
        # alive cache) — the old shape paid this count AND an eager
        # checkpoint recomputation per round
        n_keep = keep.count()
        # frames superseded two-plus rounds back are fully covered by the
        # later rounds this probe just materialized — release them (r11,
        # guide §5; the live pair stays cached for the consumer's action)
        while len(superseded) > 4:
            release_pipeline_cache(superseded.pop(0))
        if prev_n is not None and n_keep == prev_n:
            break
        prev_n = n_keep
        alive = pipeline_cache(
            alive.join(keep, "a")
            .join(keep.select(F.col("a").alias("b")), "b")
            .select("a", "b"))
        superseded.extend([keep, alive])
    return (alive.groupBy(F.col("a").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .filter(F.col("degree") >= k)
            .withColumn("in_core", F.lit(True)))


def lpa_communities(edges: DataFrame, rounds: int = 2,
                    src: str = "src", dst: str = "dst") -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007, Phys. Rev. E: "Near linear time algorithm to detect
    community structures in large-scale networks") over the undirected
    view: every node starts as its own label; each round it adopts the
    most frequent label among its neighbors, ties broken toward the
    SMALLEST label. Where `dup_clusters` finds connected components (full
    transitive reach), LPA finds DENSE regions inside a component — the
    crawl-cluster / spam-ring / topic-group splitter.

    Runs exactly ``rounds`` synchronous rounds (the k_core convention:
    a fixed bound is what lets the DuckDB oracle replay identical
    unrolled CTEs; classic LPA converges in a handful of sweeps and the
    tie-break makes every round deterministic). All-integer label/count
    arithmetic — exact on any engine/partitioning.

    Scale shape: each round is the neighbor-label join (one shuffle on
    the edge key) + a (node, label) count + a per-node argmax MIN
    aggregate over a (−count, label) struct — lexicographic struct order
    IS the (count desc, label asc) vote order, all-integer so negation
    is exact, and the hash aggregate partially combines map-side where
    a rank window would ship every (node, label) row and sort it.

    Returns (id, label) for every node in the edge list.

    Reference anchor: none (graph-analytics extension; family of
    pagerank / k_core; the cyclic wiring is FeedbackLoop.scala:18-38).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    und = _symmetric(edges, src, dst)
    labels = und.select(F.col("a").alias("id")).distinct() \
                .withColumn("label", F.col("id"))
    for _ in range(rounds):
        votes = (und.join(labels.select(F.col("id").alias("b"), "label"),
                          "b")
                 .groupBy("a", "label").agg(F.count(F.lit(1)).alias("_n")))
        # pipeline-persist, not an eager checkpoint: the whole fixed-round
        # sweep executes inside the consumer's single action, each round's
        # label cache truncating the next round's executed lineage
        labels = pipeline_cache(
            votes.groupBy("a")
            .agg(F.min(F.struct((-F.col("_n")).alias("nn"),
                                F.col("label").alias("lb"))).alias("_b"))
            .select(F.col("a").alias("id"), F.col("_b.lb").alias("label")))
    return labels


def bfs_hops(edges: DataFrame, source, max_hops: int = 4,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Breadth-first hop distance from ``source`` over the undirected
    view, out to ``max_hops`` — the influence-radius / crawl-depth /
    blast-radius primitive. Nodes unreached within the bound are absent
    (their distance is known only to be > max_hops).

    Each round is one frontier-neighbor join + an anti-join against the
    settled set (both on the node key), lineage checkpoint-truncated;
    the loop exits early on an empty frontier (bounded driver count, the
    k_core convention). All-integer — exact on any engine; the DuckDB
    oracle unrolls the same rounds as chained CTEs.

    Returns (id, dist) with dist in [0, max_hops].

    Reference anchor: none (graph-analytics extension; family of
    k_core / lpa_communities).
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    und = _symmetric(edges, src, dst)
    # the seed frame inherits the node column's own type (string ids work
    # like bigints; nothing is coerced through a hardcoded schema); it is
    # drawn from the RAW endpoints so a source whose only edges are
    # self-loops still yields its dist-0 row, and an absent source yields
    # an empty frame -> empty reachability result
    settled = pipeline_cache(
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .filter(F.col("id") == F.lit(source)).distinct()
        .withColumn("dist", F.lit(0)))
    frontier = settled
    for r in range(1, max_hops + 1):
        nxt = pipeline_cache(
            und.join(frontier.select(F.col("id").alias("a")), "a")
            .select(F.col("b").alias("id")).distinct()
            .join(settled.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(r)))
        # count, not isEmpty: the round's one driver job fully
        # materializes the frontier cache (the old shape computed nxt for
        # the isEmpty probe and then RECOMPUTED it inside the eager union
        # checkpoint — two full passes per round). r11: the FINAL round
        # skips the probe — it decides nothing (the loop ends either way)
        # and nxt_last is referenced exactly once (the settled union; the
        # frontier handle is never consumed), so there is no shared-cache
        # fill to race and the consumer's action materializes it once.
        # (Probing only every 2nd round was tried and REJECTED: an
        # unprobed nxt_r is referenced THREE times — next frontier, the
        # settled union, the next anti-join — and the un-materialized
        # cache recomputes concurrently inside the next job; measured
        # warm exec 0.22 → 1.81 s at sf0.1.)
        if r < max_hops and nxt.count() == 0:
            break
        settled = settled.unionByName(nxt)
        frontier = nxt
    return settled


def personalized_pagerank(edges: DataFrame, seed, iterations: int = 3,
                          damping: float = 0.85, src: str = "src",
                          dst: str = "dst") -> DataFrame:
    """Personalized PageRank from a single seed node: the random walk
    teleports back to ``seed`` (probability 1−d, plus all dangling mass)
    instead of to a uniform vector — rank becomes RELEVANCE TO THE SEED,
    the seed-based recommendation / related-entities primitive (the
    "people also interact with" query `pagerank` cannot answer, since its
    scores are global importance).

    Same loop skeleton as `pagerank` (fixed iterations, eager-checkpoint
    lineage truncation, dangling mass as a broadcast 1-row frame, ONE job
    per iteration); the update is
    ``r(v) = [v = seed]·((1−d) + d·m) + d·inflow(v)`` with r₀ = e_seed.
    Float sums drift ~1e-16 across engines; callers round for portable
    output (the pagerank convention; the oracle unrolls identical CTEs).

    Returns (id, rank) for every node in the edge list; ranks sum to 1.

    Reference anchor: `FeedbackLoop.scala:18-38` re-expressed (the
    pagerank anchor); algorithm per Page et al. 1999 §6 "personalized"
    teleport vectors.
    """
    from akka_stream_contrib_spark.util import pipeline_cache

    e = pipeline_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct())
    nodes = pipeline_cache(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct())
    # a seed outside the graph would make every teleport term vanish and
    # return silent all-zero ranks — fail loudly instead. count, not
    # isEmpty: the one driver job fully materializes the e/nodes caches
    # for the loop (a take(1) probe would cache only the scanned slice).
    # NOTE (r11): skipping this probe for callers that prove membership
    # was tried and REJECTED — it doubles as the e/nodes materialization
    # barrier; without it the loop's first action races the shared cache
    # fills (e is read by out_deg AND every iteration's contrib join) and
    # recomputes them concurrently (measured cold exec 2.35 → 4.55 s).
    if nodes.filter(F.col("id") == F.lit(seed)).count() == 0:
        raise ValueError(
            f"personalized_pagerank: seed {seed!r} is not a node of the "
            "edge list")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    is_seed = (F.col("id") == F.lit(seed)).cast("double")
    ranks = nodes.withColumn("rank", is_seed)
    d = float(damping)
    for _ in range(iterations):
        contrib = (e.join(ranks.join(out_deg, ranks.id == out_deg.src)
                          .select("id", (F.col("rank") / F.col("out_deg"))
                                  .alias("share")),
                          e.src == F.col("id"))
                   .groupBy("dst").agg(F.sum("share").alias("inflow")))
        dangling = (ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")))
        ranks = pipeline_cache(
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select("id",
                    (is_seed * (F.lit(1.0 - d) + F.lit(d) * F.col("m"))
                     + F.lit(d)
                     * F.coalesce(F.col("inflow"), F.lit(0.0)))
                    .alias("rank")))
    return ranks


def adamic_adar(edges: DataFrame, src: str = "src", dst: str = "dst",
                top_k: int = 50, max_degree: int = 200) -> DataFrame:
    """Adamic–Adar link prediction: for every NON-adjacent pair (x, y)
    sharing at least one neighbor, ``AA(x,y) = Σ_{z ∈ N(x)∩N(y)}
    1/ln(deg(z))`` — common neighbors weighted inversely by how
    promiscuous they are (Adamic & Adar 2003, "Friends and neighbors on
    the Web"). The classic "who should be connected next" primitive; the
    top-``top_k`` predicted links are returned.

    Scale shape (the dedup posting-list discipline, not a neighbor
    self-join): one symmetric-adjacency aggregation collects each
    vertex's sorted neighbor set; centers with degree > ``max_degree``
    are EXCLUDED up front (loud in the signature — the quadratic wedge
    fan-out guard; a hub's 1/ln(d) terms are the least informative ones),
    and the candidate pairs are generated IN-ROW by the shared
    ``pair_fanout_expr``, so the deg² blow-up never hits a join. One
    shuffle keys the (x, y) aggregation; existing edges are removed by a
    broadcast-eligible anti-join; top-k is TakeOrdered, never a global
    sort.

    Determinism: each center's term is ``round(1/ln(d), 9)`` held as a
    1e9-scaled long — per-term rounding + exact integer addition make the
    sum independent of aggregation order, so both engines produce the
    identical score (the PMI/bigram convention). Scaled-long headroom:
    a single pair overflows the 64-bit sum only past ~6.4e9 common
    neighbors (Long.Max / 1.45e9), far beyond any graph's ``max_degree``
    fan-in worth scoring.

    Returns (x, y, n_common, adamic_adar), ordered by score desc with
    (x, y) tie-break, limited to ``top_k``.
    """
    from akka_stream_contrib_spark.functions.dedup import pair_fanout_expr
    from akka_stream_contrib_spark.util import pipeline_cache

    und = pipeline_cache(
        edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                     F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct())
    nbrs = und.union(und.select(F.col("b").alias("a"),
                                F.col("a").alias("b")))
    # explicit-count repartition (the theil_sen discipline): the wedge
    # fan-out stage is CPU-heavy but byte-tiny, so AQE's byte-based
    # coalescing would single-thread the in-row pair generation (measured
    # 19 s -> 4 s warm at sf0.1). A codegen self-equi-join form was also
    # measured and REJECTED: it re-materializes the 12 M-row wedge stream
    # through a join + exchange that AQE under-sizes, landing 5x slower
    # than this posting form on the dense sf0.1 co-activity graph.
    n_part = int(edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    posting = (nbrs.repartition(n_part, "a")
               .groupBy(F.col("a").alias("v"))
               .agg(F.array_sort(F.collect_set("b")).alias("_l"))
               .withColumn("_d", F.size("_l"))
               .filter((F.col("_d") >= 2) & (F.col("_d") <= max_degree))
               # the 9-dp term rides the quadratic wedge fan-out as a
               # 1e9-SCALED LONG, not a decimal(28,9): the decimal cast
               # (exact 9-dp) happens once per CENTER, the long scaling is
               # an exact decimal multiply, and the 12M-row pair aggregate
               # sums primitive longs instead of precision-28 decimals
               # (16-byte unscaled values + overflow-checked adds). The
               # final score divides the long sum back via an exact
               # decimal(9,9) multiply, so the emitted double is
               # bit-identical to the old decimal-sum cast.
               .withColumn("_term",
                           (F.round(F.lit(1.0) / F.log(F.col("_d")), 9)
                            .cast("decimal(28,9)")
                            * F.lit(1000000000)).cast("long")))
    pairs = (posting
             .select("_term", F.explode(
                 F.expr(pair_fanout_expr("x", "y"))).alias("_p"))
             .select(F.col("_p.x").alias("x"), F.col("_p.y").alias("y"),
                     "_term"))
    agg = (pairs.groupBy("x", "y")
           .agg(F.count(F.lit(1)).alias("n_common"),
                F.sum("_term").alias("_aa")))
    cand = agg.join(und, (F.col("x") == F.col("a"))
                    & (F.col("y") == F.col("b")), "left_anti")
    # unscale: long × decimal(9,9) 1e-9 is an EXACT decimal(30,9) multiply
    # (precision 20+9+1, no division-rule precision loss), so the cast to
    # double sees the identical rational the old decimal(38,9) sum held
    return (cand.select(
        "x", "y", "n_common",
        (F.round((F.col("_aa").cast("decimal(20,0)")
                  * F.lit("0.000000001").cast("decimal(9,9)"))
                 .cast("double"), 6) + F.lit(0.0))
        .alias("adamic_adar"))
        .orderBy(F.desc("adamic_adar"), "x", "y")
        .limit(top_k))
