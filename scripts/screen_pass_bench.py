"""Pure-Python A/B of the fused arrow_pass with/without the clean screen.

Reads the bench corpus parquet directly with pyarrow, slices it into
16k-row batches (the bench's maxRecordsPerBatch), and times
_make_arrow_pass(fused=True, screen=X) end-to-end per rep. No Spark.
"""
import sys
import time

import pyarrow as pa
import pyarrow.dataset as ds

sys.path.insert(0, "/root/repo")
from fastpasta_spark.operators import sequence as seq

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/fastpasta_bench_corpus_v5_500000"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

tbl = ds.dataset(path, format="parquet").to_table(
    columns=["doc_id", "spans"]).combine_chunks()
n = tbl.num_rows
batches = tbl.to_batches(max_chunksize=16000)
print(f"{n} docs, {len(batches)} batches")

res = {True: [], False: []}
order = [True, False]
for r in range(reps):
    for screen in (order if r % 2 == 0 else order[::-1]):
        fn = seq._make_arrow_pass(fused=True, screen=screen)
        t0 = time.perf_counter()
        out_rows = sum(len(b) for b in fn(iter(batches)))
        dt = time.perf_counter() - t0
        res[screen].append(dt)
        print(f"rep{r} screen={int(screen)} {dt:.3f}s out={out_rows}",
              flush=True)

for s in (True, False):
    v = sorted(res[s])
    print(f"screen={int(s)}: min {v[0]:.3f} med {v[len(v) // 2]:.3f}")
print(f"speedup (min off/on): {min(res[False]) / min(res[True]):.3f}x  "
      f"(med: {sorted(res[False])[reps // 2] / sorted(res[True])[reps // 2]:.3f}x)")
