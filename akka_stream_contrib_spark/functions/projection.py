"""Johnson–Lindenstrauss random projection for embedding columns.

Dimensionality reduction is the standard first stage of large-scale
embedding pipelines (shrink 100 TB of float vectors before clustering /
ANN indexing / near-dup screening). The JL lemma guarantees pairwise
distances are preserved to (1±ε) with out_dim = O(log n / ε²) — and the
Achlioptas (2001) result shows a ±1 sign matrix suffices, which is what
makes the projection expressible as PURE integer arithmetic:

- the sign matrix is derived from md5 of ``(seed, i, j)`` — no RNG state,
  bit-identical on any engine and on every executor without shipping a
  matrix (it is injected as a literal, ~out_dim×in_dim small ints);
- each input component is fixed-pointed to exact micro-units via the
  engine-replayable ``floor(x·1e6 + 0.5)`` (same device as
  `similarity.quantize_embeddings`), so every projected component is an
  EXACT bigint sum — order-independent, overflow-safe (64 × 2^40 ≪ 2^63),
  and identical in Spark and the DuckDB oracle.

Scale shape: zero shuffles — one projected expression per output dim, all
inside whole-stage codegen; the explode to long form multiplies rows by
out_dim only at the very end (and a caller that wants the array form can
skip it). Reference anchor: none (BASELINE.json-mandate extension).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_signs(in_dim: int = 64, out_dim: int = 16, seed: str = "jl") -> list[list[int]]:
    """The deterministic ±1 projection matrix, row j = output dim j. Derived
    from md5 so both engines (and the test suite) can rebuild it exactly."""
    return [
        [1 if int(hashlib.md5(f"{seed}_{i}_{j}".encode()).hexdigest()[:8], 16) % 2 == 0
         else -1
         for i in range(in_dim)]
        for j in range(out_dim)
    ]


def rp_project(df: DataFrame, out_dim: int = 16, in_dim: int = 64,
               seed: str = "jl", id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Project each vector onto ``out_dim`` ±1 hyperplanes; emits long form
    (vec_id, dim, comp) with ``comp`` the projected component in original
    units (micro-unit-exact, rounded to 6 dp).

    NULL handling: a NULL vector component propagates NULL through the
    whole output vector (fail-loud — a corrupt embedding should not
    silently project as if the component were 0); feed complete vectors,
    or coalesce upstream if partial projection is genuinely wanted. The
    SQL oracle assumes complete fixed-width vectors for the same reason.
    """
    signs = jl_signs(in_dim, out_dim, seed)
    q = ("transform(cast({v} as array<double>),"
         " x -> cast(floor(x * 1000000.0 + 0.5) as bigint))").format(v=vec_col)
    comps = F.array(*[
        F.struct(
            F.lit(j).alias("dim"),
            F.expr(
                "aggregate(zip_with(_q, array({s}), (x, s) -> x * s),"
                " 0L, (a, x) -> a + x)".format(
                    s=",".join(str(s) for s in signs[j]))
            ).alias("q"),
        )
        for j in range(out_dim)
    ])
    return (
        df.withColumn("_q", F.expr(q))
        .select(F.col(id_col).alias("vec_id"), F.explode(comps).alias("_c"))
        .select("vec_id", F.col("_c.dim").alias("dim"),
                (F.round(F.col("_c.q") / F.lit(1000000.0), 6) + F.lit(0.0))
                .alias("comp"))
    )


def rp_project_sql(table: str = "embeddings", out_dim: int = 16,
                   in_dim: int = 64, seed: str = "jl",
                   id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """The DuckDB oracle for `rp_project` — same literal sign matrix, same
    micro-unit fixed-point, exact bigint sum (grouped, but integer-exact so
    order cannot matter)."""
    mat = "[" + ",".join(
        "[" + ",".join(str(s) for s in row) + "]" for row in jl_signs(in_dim, out_dim, seed)
    ) + "]"
    return f"""
        WITH q AS (
            SELECT {id_col} AS vec_id, CAST(i AS INT) AS i,
                   CAST(floor(CAST({vec_col}[i] AS DOUBLE) * 1000000.0 + 0.5)
                        AS BIGINT) AS qx
            FROM {table} CROSS JOIN range(1, {in_dim + 1}) t(i)
        )
        SELECT vec_id, CAST(j AS INT) AS dim,
               round(SUM(qx * ({mat}[CAST(j AS INT) + 1][i])) / 1000000.0, 6)
                   + 0.0 AS comp
        FROM q CROSS JOIN range(0, {out_dim}) r(j)
        GROUP BY vec_id, j
    """
