"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB training pipeline needs:
  * brute-force cosine top-k — exact baseline; a broadcast nested-loop
    of (queries x corpus) where queries are SMALL (broadcast) and the
    corpus streams through one scan. All arithmetic is JVM-side
    (zip_with/aggregate inside codegen) — no Python in the hot path.
  * LSH-bucketed ANN — sign-random-projection buckets; candidate
    generation is a bucket equi-join, ranking only within buckets.
    Projection vectors derive from the portable md5 hash so the
    partitioning is deterministic across engines/runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark.functions.hashing import py_md5_hash

COSINE_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / "
    "(sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * v)) * "
    "sqrt(aggregate({b}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * v)))"
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries must be small (they are broadcast — the corpus is never
    shuffled, one scan + per-partition ranking via window). Returns
    (query_id, neighbor_id, rank, sim) with deterministic tie-break on
    neighbor_id. Self-matches are excluded.
    """
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.expr(COSINE_EXPR.format(a="q_vec", b="c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _projection_matrix(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from the portable hash:
    component (p, d) = md5-derived value mapped to [-1, 1)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = py_md5_hash(f"plane:{table}:{p}:{d}")
            row.append((h % 2_000_003) / 1_000_001.5 - 1.0)
        planes.append(row)
    return planes


def _bucket_expr(vec_col: str, dim: int, n_planes: int, table: int) -> str:
    planes = _projection_matrix(dim, n_planes, table)
    lits = ", ".join(
        "array(" + ", ".join(f"CAST({v:.9f} AS DOUBLE)" for v in row) + ")"
        for row in planes
    )
    return (
        f"aggregate(sequence(0, {n_planes - 1}), {table * (1 << n_planes)}L, "
        f"(acc, p) -> acc + "
        f"IF(aggregate(zip_with(element_at(array({lits}), p + 1), {vec_col}, "
        "(w, x) -> w * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        "(a, v) -> a + v) > 0, shiftleft(1L, p), 0L))"
    )


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding",
    out_col: str = "lsh_bucket", table: int = 0,
) -> DataFrame:
    """Sign-random-projection bucket id as a column (one hash table).

    The tiny projection matrix is inlined as a literal array-of-arrays —
    evaluated inside codegen; equivalent to broadcasting it. Bucket ids
    of different tables are disjoint (offset by table * 2^n_planes).
    """
    return df.withColumn(out_col, F.expr(_bucket_expr(vec_col, dim, n_planes, table)))


def with_lsh_buckets(
    df: DataFrame, dim: int, n_planes: int, n_tables: int,
    vec_col: str = "embedding", out_col: str = "lsh_bucket",
) -> DataFrame:
    """Multi-table LSH: one row per (vector, table) with that table's
    bucket id — candidates are unioned across tables (standard L-tables
    construction; raises recall at the cost of L bucket joins)."""
    exprs = ", ".join(
        _bucket_expr(vec_col, dim, n_planes, t) for t in range(n_tables)
    )
    return df.withColumn(out_col, F.explode(F.expr(f"array({exprs})")))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH buckets,
    candidates unioned over n_tables hash tables.

    Scale path: corpus bucketed once per table (could be written
    bucket-partitioned to Iceberg); each query joins its buckets only —
    candidate set shrinks ~2^n_planes/n_tables-fold vs brute force.
    Recall vs cosine_topk measured in tests.
    """
    from pyspark.sql import Window as W

    cb = with_lsh_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec")),
        dim, n_planes, n_tables, vec_col="c_vec", out_col="c_bucket",
    )
    qb = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec")),
        dim, n_planes, n_tables, vec_col="q_vec", out_col="q_bucket",
    )
    sim = F.expr(COSINE_EXPR.format(a="q_vec", b="c_vec"))
    scored = (
        cb.join(F.broadcast(qb), (F.col("c_bucket") == F.col("q_bucket"))
                & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
