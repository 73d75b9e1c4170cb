"""Headline benchmark — prints ONE JSON line.

Times (a) end-to-end validation throughput (`check all` analogue) on a
seeded synthetic interleaved corpus written to parquet, and (b) the
headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR.

    value    = total seconds of the headline suite
    queries  = per-query seconds
    docs_per_sec = validation corpus docs / validation wall time

Scaling evidence (local[N] vs local[4N]) is produced separately by
scripts/scaling_bench.py -> BENCH/BASELINE.md (clean JVM per level).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", 500_000))
# best-of-N per timing (hyperfine-min analogue): the shared host has
# neighbor bursts that can inflate ONE query 10x in a single-shot run
# (round-3 observed identical code swing 20.4s..49.4s suite-total with
# ambient loadavg 2 -> 14 mid-run; 3 reps ride out most bursts)
BENCH_REPS = int(os.environ.get("BENCH_REPS", 3))

HEADLINE_QUERIES = [
    "span_fsm",
    "q1_pricing_summary",
    "join_revenue",
    "topk_per_group",
    "textstats",
    "minhash_signatures",
    "jaccard_pairs",
    "simhash",
    "cosine_topk",
    "sessionize",
    "running_check",
    "trigger_period",
    "lsh_ann",
    "constraint_check",
    "decontam",
    "unigram_lm",
    "col_profile",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from fastpasta_spark.plans.check_all import check_all
    from fastpasta_spark.session import get_spark
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

    # finer input splits + small Arrow batches: the synthetic corpus is
    # a few hundred MB in ~256 small files — default 128m splits pack it
    # into ~16 partitions and starve a 32-core run (see BENCH/BASELINE.md
    # methodology notes)
    spark = get_spark(app_name="fastpasta_spark_bench", cores=CPUS,
                      shuffle_partitions=max(8, CPUS),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "4m",
                          "spark.sql.files.openCostInBytes": "512k",
                          # 16000 measured consistently ~4% faster than
                          # the round-2 500 on check_all across 4
                          # interleaved fresh-JVM rounds (the pass is now
                          # vectorized enough that bigger Arrow batches
                          # amortize the per-batch Python/FFI overhead)
                          "spark.sql.execution.arrow.maxRecordsPerBatch": "16000",
                      })

    # --- validation throughput on the synthetic interleaved corpus ------
    from fastpasta_spark.sources.synth import GENERATOR_VERSION

    cfg = CorpusConfig(n_docs=BENCH_DOCS, corrupt_per_mille=50, dup_per_mille=5)
    corpus_path = f"/tmp/fastpasta_bench_corpus_v{GENERATOR_VERSION}_{BENCH_DOCS}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        shutil.rmtree(corpus_path, ignore_errors=True)
        corpus_df(spark, cfg).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    media = media_df(spark, cfg)

    # warmup on a slice: compile the plans (codegen/JIT/python workers)
    # so the measured run reflects steady-state throughput — same role
    # as the warmup runs in the reference's hyperfine benches
    warm = check_all(docs.limit(2000), media)
    warm.violations.count(); warm.metrics.collect()
    spark.catalog.clearCache()

    from fastpasta_spark.functions.cache import release_tracked

    # per-timing evidence so a BENCH json is self-interpreting on this
    # shared host (round-3 lesson: identical code swung 18.9s -> 26.7s
    # between rounds with nothing to tell "regression" from "neighbor
    # burst"): every rep's seconds AND the 1-min loadavg sampled at each
    # rep's start are emitted alongside the best-of value
    reps: dict[str, list[float]] = {}
    rep_load: dict[str, list[float]] = {}

    def best_of(fn, name: str) -> tuple[float, object]:
        best, out = float("inf"), None
        r, ld = reps.setdefault(name, []), rep_load.setdefault(name, [])
        for _ in range(max(BENCH_REPS, 1)):
            release_tracked()  # drop operator caches from the last rep
            spark.catalog.clearCache()
            ld.append(round(os.getloadavg()[0], 1))
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            r.append(round(dt, 3))
            best = min(best, dt)
        return best, out

    t_validate, n_viol = best_of(lambda: (
        lambda r: (r.violations.count(), r.metrics.collect())[0]
    )(check_all(docs, media)), "check_all_validation")
    n_docs = docs.count()

    timings: dict[str, float] = {"check_all_validation": round(t_validate, 3)}

    # --- headline queries at SF_DIR --------------------------------------
    qs = entrymod.queries()
    for name in HEADLINE_QUERIES:
        t, _ = best_of(lambda name=name: qs[name](spark, SF_DIR).collect(),
                       name)
        timings[name] = round(t, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    headline = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "validation_docs": n_docs,
        "validation_violations": n_viol,
        "docs_per_sec": round(n_docs / t_validate, 1),
        "cpus": CPUS,
        "bench_reps": BENCH_REPS,
    }
    # Full per-rep evidence (seconds + loadavg per rep) goes to a sidecar
    # file: round-4 lesson — inlining it grew the JSON line past the
    # driver's tail-capture window and BENCH_r04.json recorded
    # "parsed": null. The driver-visible line stays compact and is
    # printed LAST.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "last_run_full.json")
    os.makedirs(os.path.dirname(sidecar), exist_ok=True)
    with open(sidecar, "w") as f:
        json.dump({**headline, "reps": reps, "loadavg_per_rep": rep_load,
                   "loadavg_end": round(os.getloadavg()[0], 1)}, f, indent=1)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
