"""Measure the literal-SQL vs Arrow codebook crossover (round-4 verdict #5).

LITERAL_CODEBOOK_MAX (operators/similarity.py) decides when quantizer
codebooks / projection matrices stop being inlined as SQL literals and
switch to the Arrow-batched numpy UDF. The 8192 threshold was justified
by expression-tree reasoning; this script measures both paths on a
SemDeDup-realistic corpus (dim=768 embeddings) across k, plus the Arrow
path's sensitivity to spark.sql.execution.arrow.maxRecordsPerBatch, and
writes BENCH/CODEBOOK.md.

Usage: python scripts/codebook_bench.py [n_rows] [dim]
NEVER run concurrently with other Spark jobs — wall-time measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_df(spark, n_rows: int, dim: int):
    from pyspark.sql import functions as F

    # deterministic pseudo-random embeddings generated ON EXECUTORS
    # (hash-derived, no driver-side 600 MB array): component d of row i
    # = fract(sin-free integer mix) mapped to [-1, 1)
    return (
        spark.range(n_rows).repartition(32)
        .withColumn("_vec", F.expr(
            "transform(sequence(0, {d}), x -> "
            "CAST((pmod(hash(id, x), 200003) / 100001.5) - 1.0 AS DOUBLE))"
            .format(d=dim - 1)))
    )


def centroids(k: int, dim: int) -> list:
    rng = np.random.default_rng(7)
    return [(i, [float(v) for v in rng.normal(size=dim)]) for i in range(k)]


def time_assign(spark, df, cent, path: str, reps: int = 3) -> float:
    from pyspark.sql import functions as F

    from fastpasta_spark.operators import similarity as sim

    saved = sim.LITERAL_CODEBOOK_MAX
    sim.LITERAL_CODEBOOK_MAX = 10**12 if path == "literal" else 0
    try:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = sim._assign_lists(df, cent, nprobe=1, vec_col="_vec")
            out.agg(F.sum("list_id")).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)
    finally:
        sim.LITERAL_CODEBOOK_MAX = saved


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768

    from fastpasta_spark.session import get_spark

    spark = get_spark(app_name="codebook_bench", cores=32,
                      shuffle_partitions=32)
    df = make_df(spark, n_rows, dim).cache()
    df.count()

    lines = [
        "# Codebook path crossover: literal SQL vs Arrow numpy UDF",
        "",
        f"`_assign_lists` nprobe=1 argmax-cosine over {n_rows:,} rows of "
        f"dim={dim} embeddings, local[32], best-of-3 (min). "
        "k*dim = would-be literal count; current "
        "LITERAL_CODEBOOK_MAX threshold marked.",
        "",
        "| k | k*dim | literal s | arrow s | arrow/literal |",
        "|---|---|---|---|---|",
    ]
    from fastpasta_spark.operators.similarity import LITERAL_CODEBOOK_MAX

    results = []
    for k in (2, 4, 8, 16, 32, 64, 128):
        cent = centroids(k, dim)
        t_arrow = time_assign(spark, df, cent, "arrow")
        # past ~10^5 literals analysis/codegen time explodes; guard with
        # a wall cap by simply not measuring the literal path there
        t_lit = (time_assign(spark, df, cent, "literal")
                 if k * dim <= 100_000 else None)
        mark = " <- threshold" if (k * dim > LITERAL_CODEBOOK_MAX
                                   >= (k // 2) * dim) else ""
        ratio = (f"{t_arrow / t_lit:.2f}" if t_lit else "-")
        lines.append(f"| {k} | {k * dim}{mark} | "
                     f"{t_lit if t_lit is not None else '-'} | "
                     f"{t_arrow} | {ratio} |")
        results.append((k, t_lit, t_arrow))
        print(lines[-1], flush=True)

    # large-k Arrow-only sweep (SemDeDup-realistic codebooks)
    lines += ["", "Arrow path at SemDeDup scale (literal infeasible):",
              "", "| k | k*dim | arrow s |", "|---|---|---|"]
    for k in (1024, 4096, 10_000):
        cent = centroids(k, dim)
        t_arrow = time_assign(spark, df, cent, "arrow", reps=2)
        lines.append(f"| {k} | {k * dim} | {t_arrow} |")
        print(lines[-1], flush=True)

    # maxRecordsPerBatch sensitivity for the vector-heavy UDF
    lines += ["", "Arrow batch-size sensitivity (k=1024):", "",
              "| maxRecordsPerBatch | arrow s |", "|---|---|"]
    cent = centroids(1024, dim)
    for mrb in ("1000", "4000", "10000", "16000"):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", mrb)
        t = time_assign(spark, df, cent, "arrow", reps=2)
        lines.append(f"| {mrb} | {t} |")
        print(lines[-1], flush=True)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "CODEBOOK.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
