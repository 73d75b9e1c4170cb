"""Build a larger SF dir by replicating /root/testdata/sf0.1 k times
with shifted keys — measurement aid ONLY (the driver generates its own
large SF; this proxy just has the same shape/row counts so round-8
optimizations can be timed at the scale the driver measures at).

Per copy i (i = 0..k-1):
  * fact keys shift by i * <table row span> so ids stay dense and joins
    stay internally consistent within a copy,
  * document token lists are cyclically rotated by i words (preserves
    vocabulary, doc length and within-copy near-dup structure while
    breaking cross-copy shingle matches — a k-times corpus, not k
    literal clones),
  * embeddings are cyclically rotated by i positions (norm-preserving,
    direction-changing),
  * nation/region dims stay fixed (25 / 5 rows at every SF).

Usage: python scripts/gen_scaled_sf.py [k] [out_dir]
       defaults: k=10, out_dir=/root/sfwork/sf1.0
Pure pyarrow — no Spark session.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_AS_IS = ["nation", "region"]


def _span(col: pa.ChunkedArray) -> int:
    return int(pc.max(col).as_py()) + 1


def rotate_text(texts: list[str | None], i: int) -> list[str | None]:
    if i == 0:
        return texts
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        w = t.split(" ")
        r = i % len(w) if w else 0
        out.append(" ".join(w[r:] + w[:r]))
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sfwork/sf1.0"
    os.makedirs(out_dir, exist_ok=True)

    for name in COPY_AS_IS:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(name, t.num_rows)

    for name, cols in SHIFT_COLS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        spans = {c: _span(t[c]) for c in cols}
        copies = []
        for i in range(k):
            ti = t
            for c in cols:
                idx = ti.schema.get_field_index(c)
                shifted = pc.add(ti[c], pa.scalar(i * spans[c],
                                                  type=ti[c].type))
                ti = ti.set_column(idx, ti.schema.field(c),
                                   shifted.cast(ti[c].type))
            if name == "documents" and i > 0:
                idx = ti.schema.get_field_index("text")
                rot = rotate_text(ti["text"].to_pylist(), i)
                ti = ti.set_column(idx, ti.schema.field("text"),
                                   pa.array(rot, type=pa.string()))
            if name == "embeddings" and i > 0:
                idx = ti.schema.get_field_index("embedding")
                emb = ti["embedding"].combine_chunks()
                mat = np.asarray(emb.values).reshape(len(ti), -1)
                mat = np.roll(mat, i, axis=1)
                arr = pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float32()), mat.shape[1])
                # keep the original list<float> type
                arr = arr.cast(ti["embedding"].type)
                ti = ti.set_column(idx, ti.schema.field("embedding"), arr)
            copies.append(ti)
        full = pa.concat_tables(copies)
        pq.write_table(full, f"{out_dir}/{name}.parquet")
        print(name, full.num_rows)

    open(os.path.join(out_dir, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
