"""Round-8 optimization measurement harness (bench.py stays FROZEN).

Per headline query (plus check_all_validation):
  * captures .explain("formatted") to plans/r08/<query>_<tag>.txt
  * times `collect()` min-of-reps with the SAME session confs and
    cache-release hygiene as bench.py (so numbers are comparable to the
    driver's bench without touching it)

Usage:
    python bench_extra.py [tag] [query ...]
        tag      plan-file suffix, default "before"
        query    subset to run; default = bench.py's headline set
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPS (default 3),
     BENCH_DOCS (default 500_000), SKIP_VALIDATION=1 to skip check_all.
Writes BENCH/extra_<tag>.json. NEVER run concurrently with other Spark
jobs — it measures wall time.
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


def explain_str(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = sys.argv[2:] or HEADLINE_QUERIES

    import __spark_entry__ as entrymod
    from fastpasta_spark.functions.cache import release_tracked
    from fastpasta_spark.plans.check_all import check_all
    from fastpasta_spark.session import get_spark
    from fastpasta_spark.sources.synth import (
        GENERATOR_VERSION,
        CorpusConfig,
        corpus_df,
        media_df,
    )

    spark = get_spark(app_name="fastpasta_spark_bench_extra", cores=CPUS,
                      shuffle_partitions=max(8, CPUS),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "4m",
                          "spark.sql.files.openCostInBytes": "512k",
                          "spark.sql.execution.arrow.maxRecordsPerBatch": "16000",
                      })

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}

    def best_of(fn, name: str, plan_df=None) -> float:
        if plan_df is not None:
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(explain_str(spark, plan_df))
        best = float("inf")
        r = reps.setdefault(name, [])
        for _ in range(max(BENCH_REPS, 1)):
            release_tracked()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            r.append(round(dt, 3))
            best = min(best, dt)
        return best

    qs = entrymod.queries()

    if os.environ.get("SKIP_VALIDATION") != "1" and (
            "check_all_validation" in wanted or wanted == HEADLINE_QUERIES):
        cfg = CorpusConfig(n_docs=BENCH_DOCS, corrupt_per_mille=50,
                           dup_per_mille=5)
        corpus_path = (f"/tmp/fastpasta_bench_corpus_v{GENERATOR_VERSION}_"
                       f"{BENCH_DOCS}")
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            shutil.rmtree(corpus_path, ignore_errors=True)
            corpus_df(spark, cfg).write.mode("overwrite").parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)
        media = media_df(spark, cfg)
        warm = check_all(docs.limit(2000), media)
        warm.violations.count(); warm.metrics.collect()
        spark.catalog.clearCache()
        release_tracked()
        spark.sparkContext.setJobDescription("check_all_validation")
        t = best_of(lambda: (
            lambda r: (r.violations.count(), r.metrics.collect())
        )(check_all(docs, media)), "check_all_validation",
            plan_df=check_all(docs, media).violations)
        timings["check_all_validation"] = round(t, 3)
        print(f"check_all_validation: {timings['check_all_validation']}"
              f"  reps={reps['check_all_validation']}", flush=True)

    for name in wanted:
        if name == "check_all_validation" or name not in qs:
            continue
        spark.sparkContext.setJobDescription(name)
        t = best_of(lambda name=name: qs[name](spark, SF_DIR).collect(),
                    name, plan_df=qs[name](spark, SF_DIR))
        timings[name] = round(t, 3)
        print(f"{name}: {timings[name]}  reps={reps[name]}", flush=True)

    out = {
        "tag": tag,
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "bench_reps": BENCH_REPS,
        "timings": timings,
        "reps": reps,
        "total_min": round(sum(timings.values()), 3),
        "loadavg_end": round(os.getloadavg()[0], 1),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", f"extra_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"tag": tag, "total_min": out["total_min"],
                      "timings": timings}))


if __name__ == "__main__":
    main()
