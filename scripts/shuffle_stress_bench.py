"""Shuffle-side stress bench (round-5 verdict item 2).

The sf0.1 `documents` table is 5k rows and `embeddings` 2k — at that
size the shuffle-heavy queries are fixed-overhead-dominated and say
nothing about how their exchanges behave at scale. This script expands
both tables by SCALE deterministically (pure function of (row, replica):
replica-offset ids, per-replica text suffix so content-hash dup-group
structure replicates instead of multiplying, one embedding component
perturbed per replica) and times the shuffle-heavy queries at 1x and at
SCALEx on the SAME session, reporting the work ratio:

    ratio      = t_scaled / t_base
    efficiency = SCALE / ratio   (1.0 = perfectly linear in rows;
                  > 1 means the 1x run was overhead-bound, which is the
                  expected regime here; << 1 flags a super-linear
                  shuffle hotspot — the thing this bench exists to catch)

Usage:  python scripts/shuffle_stress_bench.py [SCALE] [REPS]
Writes: BENCH/SHUFFLE_STRESS.md (+ one JSON line on stdout)

NEVER run concurrently with other Spark jobs — it measures wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

# the shuffle-heavy registry entries (verdict list): uniqueness branch
# analogues (dup_content groupBy + uniqueness_totals HLL), connected
# components, segment dedup, distributed prefix sum, LSH ANN,
# pair-join Jaccard
QUERIES = [
    "dup_content",
    "uniqueness_totals",
    "pack_chunks",
    "segment_dedup",
    "dup_clusters",
    "jaccard_pairs",
    "minhash_signatures",
    "lsh_ann",
    "dup_spans",
    "remove_dup_spans",
    "dsir_resample",
]


def build_scaled(spark, scale: int) -> str:
    """Deterministic SCALEx expansion of documents + embeddings into a
    sf_dir-shaped directory; cached by _SUCCESS marker."""
    from pyspark.sql import functions as F

    out = f"/tmp/fastpasta_stress_x{scale}"
    docs_p = os.path.join(out, "documents.parquet")
    emb_p = os.path.join(out, "embeddings.parquet")
    if (os.path.exists(os.path.join(docs_p, "_SUCCESS"))
            and os.path.exists(os.path.join(emb_p, "_SUCCESS"))):
        return out
    rep = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("rep")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    # suffix per replica keeps each replica's exact-dup group structure
    # identical to the base table (cross-replica texts never collide),
    # so dup-group count scales linearly like a real larger corpus
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(" r"), F.col("rep")))
    (docs.select("*", rep)
     .select((F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
             text.alias("text"), "lang", "source",
             F.length(text).alias("n_chars"))
     .repartition(32)
     .write.mode("overwrite").parquet(docs_p))
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    # perturb one component deterministically per replica: near-
    # duplicate vectors across replicas (realistic for ANN) but never
    # bit-identical
    vec = F.expr("transform(embedding, (x, i) -> IF(i = 0, "
                 "CAST(x + rep * 0.0001 AS FLOAT), x))")
    (emb.select("*", rep)
     .select((F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
             vec.alias("embedding"), "label")
     .repartition(32)
     .write.mode("overwrite").parquet(emb_p))
    return out


def main(scale: int = 100, reps: int = 2) -> None:
    import __spark_entry__ as entrymod
    from fastpasta_spark.functions.cache import release_tracked
    from fastpasta_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="shuffle_stress", cores=cpus,
                      shuffle_partitions=max(8, cpus),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "4m",
                          "spark.sql.files.openCostInBytes": "512k",
                          "spark.sql.execution.arrow.maxRecordsPerBatch": "16000",
                      })
    scaled_dir = build_scaled(spark, scale)
    qs = entrymod.queries()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(max(reps, 1)):
            release_tracked()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # count(), not collect(): segment_dedup/pack outputs scale
            # with the corpus — materialize distributed, don't pull
            # hundreds of MB of text to the driver inside a timing
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # warm both input dirs + python workers once
    qs["dup_content"](spark, BASE).count()
    qs["dup_content"](spark, scaled_dir).count()
    release_tracked()

    rows = []
    for name in QUERIES:
        t1 = run(name, BASE)
        tS = run(name, scaled_dir)
        ratio = round(tS / t1, 2) if t1 > 0 else float("inf")
        eff = round(scale / ratio, 1) if ratio else float("inf")
        rows.append((name, t1, tS, ratio, eff))
        print(f"{name}: 1x={t1}s {scale}x={tS}s ratio={ratio} "
              f"rows-per-sec-efficiency={eff}", flush=True)

    md = [
        "# Shuffle-stress bench — scaled documents/embeddings",
        "",
        f"- base: `{BASE}` (documents 5k rows, embeddings 2k rows)",
        f"- scaled: `{scaled_dir}` ({scale}x rows, deterministic expansion"
        " — replica-offset ids, per-replica text suffix, one perturbed"
        " embedding component)",
        f"- local[{cpus}], shuffle.partitions={max(8, cpus)}, "
        f"best-of-{reps} per cell, generated by "
        "`scripts/shuffle_stress_bench.py`",
        "",
        "| query | 1x sec | {s}x sec | ratio | linear-eff ({s}/ratio) |"
        .format(s=scale),
        "|---|---|---|---|---|",
    ]
    for name, t1, tS, ratio, eff in rows:
        md.append(f"| {name} | {t1} | {tS} | {ratio} | {eff} |")
    md += [
        "",
        "Reading: ratio << scale means the 1x run was fixed-overhead-"
        "bound (expected at 5k rows); linear-eff well below 1 would flag "
        "a super-linear shuffle hotspot (quadratic pair blowup, skewed "
        "exchange, driver pull) — the regression this bench exists to "
        "catch.",
    ]
    out_md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "SHUFFLE_STRESS.md")
    with open(out_md, "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({
        "metric": "shuffle_stress", "scale": scale, "cpus": cpus,
        "queries": {n: {"t1": t1, "tS": tS, "ratio": r, "eff": e}
                    for n, t1, tS, r, e in rows},
    }))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*(args or [100]))
