"""Two-parallelism scaling evidence -> BENCH/BASELINE.md.

The north_rule's two-cluster-size criterion (throughput scaling
efficiency >= 0.8 from N to 4N executors) cannot use a real cluster in
this sandbox, so per BASELINE.md we run the IDENTICAL validation job at
local[N] and local[4N] (fresh JVM each, same parquet input,
shuffle.partitions sized per level) and report docs/sec at both plus
efficiency = (T_N / T_4N) / 4.

    python scripts/scaling_bench.py [n_low] [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from fastpasta_spark.session import get_spark
from fastpasta_spark.plans.check_all import check_all
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

cores = {cores}
spark = get_spark(app_name=f"scaling_{{cores}}", cores=cores,
                  shuffle_partitions=max(8, 2 * cores))
cfg = CorpusConfig(n_docs={n_docs}, corrupt_per_mille=50, dup_per_mille=5)
docs = spark.read.parquet({corpus!r})
media = media_df(spark, cfg)
# warmup run on a small slice: compiles the same plans (whole-stage
# codegen, Janino, Python worker spin-up) so the measured run reflects
# steady-state throughput — same role as hyperfine's warmup runs in the
# reference's benches (README.md:243-265)
warm = check_all(docs.limit(2000), media)
warm.violations.count(); warm.metrics.collect()
# the sandbox host is SHARED (noisy neighbors, loadavg often >15 with
# nothing of ours running): gate each rep on low ambient load and take
# best-of-N as the uncontended estimate, like hyperfine's min
def wait_for_quiet(max_wait=240, threshold=4.0):
    waited = 0
    while waited < max_wait:
        load1 = float(open("/proc/loadavg").read().split()[0])
        if load1 < threshold:
            return load1
        time.sleep(10); waited += 10
    return load1

best, nv, reps = None, 0, {reps}
for _ in range(reps):
    wait_for_quiet()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    res = check_all(docs, media)
    nv = res.violations.count()
    res.metrics.collect()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print("RESULT " + json.dumps({{"cores": cores, "sec": best,
    "docs": docs.count(), "violations": nv}}))
"""


def run_level(cores: int, n_docs: int, corpus: str, reps: int = 3) -> dict:
    code = WORKER.format(repo=REPO, cores=cores, n_docs=n_docs, corpus=corpus,
                         reps=reps)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"level {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main(n_low: int = 4, n_docs: int = 1_500_000) -> None:
    sys.path.insert(0, REPO)
    from fastpasta_spark.sources.synth import GENERATOR_VERSION

    corpus = f"/tmp/fastpasta_scaling_corpus_v{GENERATOR_VERSION}_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from fastpasta_spark.session import get_spark\n"
            "from fastpasta_spark.sources.synth import CorpusConfig, corpus_df\n"
            f"spark = get_spark(cores=16)\n"
            f"cfg = CorpusConfig(n_docs={n_docs}, corrupt_per_mille=50, dup_per_mille=5)\n"
            f"corpus_df(spark, cfg).write.mode('overwrite').parquet({corpus!r})\n"
        )
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800,
                       capture_output=True)

    n_high = 4 * n_low
    lo = run_level(n_low, n_docs, corpus)
    hi = run_level(n_high, n_docs, corpus)
    tput_lo = lo["docs"] / lo["sec"]
    tput_hi = hi["docs"] / hi["sec"]
    eff = (lo["sec"] / hi["sec"]) / 4

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — scaling evidence (local[N] vs local[4N])

Per BASELINE.md: the two-cluster-size criterion is evidenced by running
the IDENTICAL end-to-end validation job (`check_all`: fused FSM +
sanity + stats + uniqueness + referential, {lo['docs']:,} docs,
{lo['violations']:,} violations found) on the same parquet input at two
local parallelism levels, fresh JVM per level,
`spark.sql.shuffle.partitions = 2 x cores` per level, warmup run
excluded, best-of-3 per level with each rep gated on ambient
loadavg < 4 (the sandbox host is shared — loadavg >15 from neighbor
workloads with nothing of ours running — so the load-gated min
approximates the uncontended time, as hyperfine's min does).

| level | cores | wall sec | docs/sec |
|---|---|---|---|
| N  | {n_low} | {lo['sec']:.2f} | {tput_lo:,.0f} |
| 4N | {n_high} | {hi['sec']:.2f} | {tput_hi:,.0f} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (gate: >= 0.8)

Caveats: local mode shares one JVM/driver; shuffle is via local disk.
On a real 4N-executor cluster the same plan shape applies (the fused
pass is embarrassingly parallel per document; downstream aggregations
shuffle only keys/violations).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n_low": n_low, "n_high": n_high,
                      "sec_low": round(lo["sec"], 2), "sec_high": round(hi["sec"], 2),
                      "docs_per_sec_low": round(tput_lo), "docs_per_sec_high": round(tput_hi),
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
