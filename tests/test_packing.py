"""Sequence packing: engine vs pure-Python oracle + tiling invariants."""

import random

import pytest
from pyspark.sql import functions as F

from fastpasta_spark.operators.packing import (
    global_cumsum,
    pack_documents_table,
    pack_sequences,
)


def py_pack(items, budget):
    """Oracle: exclusive cumsum in key order, chunk the token stream."""
    out = []
    start = 0
    for doc_id, n in sorted(items):
        if n <= 0:
            continue
        first, last = start // budget, (start + n - 1) // budget
        for p in range(first, last + 1):
            s = max(0, p * budget - start)
            e = min(n, (p + 1) * budget - start)
            out.append((doc_id, p, s, e, n))
        start += n
    return sorted(out)


@pytest.fixture(scope="module")
def items():
    rng = random.Random(7)
    # token counts straddle the budget in every way: 0 (dropped), tiny,
    # exactly budget, multiple budgets + remainder
    return [(f"d{i:04d}", rng.choice([0, 1, 3, 17, 64, 64, 100, 250]))
            for i in range(400)]


def test_pack_matches_python_oracle(spark, items):
    df = spark.createDataFrame(items, "doc_id string, n_tokens long")
    got = sorted(tuple(r) for r in
                 pack_sequences(df, budget=64).collect())
    assert got == py_pack(items, 64)


def test_pack_invariant_to_input_partitioning(spark, items):
    df1 = spark.createDataFrame(items, "doc_id string, n_tokens long")
    df8 = df1.repartition(8, "n_tokens")  # scrambled, skewed layout
    a = sorted(tuple(r) for r in
               pack_sequences(df1, 100, num_partitions=3).collect())
    b = sorted(tuple(r) for r in
               pack_sequences(df8, 100, num_partitions=11).collect())
    assert a == b == py_pack(items, 100)


def test_pack_tiles_every_token_once(spark, items):
    df = spark.createDataFrame(items, "doc_id string, n_tokens long")
    rows = pack_sequences(df, 64).collect()
    # per-doc slices tile [0, n) with no gap or overlap
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.tok_start)
        assert rs[0].tok_start == 0
        assert rs[-1].tok_end == rs[0].n_tokens
        for a, b in zip(rs, rs[1:]):
            assert a.tok_end == b.tok_start
    # every pack except the last holds exactly `budget` tokens
    per_pack = {}
    for r in rows:
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + (r.tok_end - r.tok_start)
    last = max(per_pack)
    assert set(per_pack) == set(range(last + 1))  # dense pack ids
    for p, tot in per_pack.items():
        assert tot == 64 or p == last


def test_global_cumsum_empty_and_single(spark):
    empty = spark.createDataFrame([], "doc_id string, n long")
    assert global_cumsum(empty, "doc_id", "n").count() == 0
    one = spark.createDataFrame([("a", 5)], "doc_id string, n long")
    [r] = global_cumsum(one, "doc_id", "n").collect()
    assert r.cum_before == 0


def test_pack_documents_table_runs(spark):
    docs = spark.createDataFrame(
        [("a", "one two three"), ("b", None), ("c", ""), ("d", "x " * 50)],
        "doc_id string, text string")
    rows = pack_documents_table(docs, budget=16).collect()
    ids = {r.doc_id for r in rows}
    assert ids == {"a", "d"}  # null/empty text -> 0 tokens -> dropped
    assert sum(r.tok_end - r.tok_start for r in rows) == 53


# ---------------------------------------------------------------- #
# deterministic training shards (round-7 output-side op)            #
# ---------------------------------------------------------------- #

def test_assign_shards_matches_python_twin_and_is_stable(spark):
    from fastpasta_spark.functions.hashing import py_md5_hash
    from fastpasta_spark.operators.packing import assign_shards

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    got = {r.doc_id: r.shard
           for r in assign_shards(df, 16, seed=3).collect()}
    assert got == {i: py_md5_hash(str(i), seed=3) % 16 for i in range(500)}
    # partition-independent: same assignment after a repartition
    got2 = {r.doc_id: r.shard
            for r in assign_shards(df.repartition(13), 16, seed=3).collect()}
    assert got2 == got


def test_write_training_shards_deterministic_layout(spark, tmp_path):
    from fastpasta_spark.operators.packing import (
        shard_manifest,
        write_training_shards,
    )

    rows = [(i, f"doc {i} text body here") for i in range(300)] + [(None, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(df, p1, 8, seed=1)
    write_training_shards(df.repartition(7), p2, 8, seed=1)
    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    rows_a = sorted((r.shard, r.doc_id) for r in a.collect())
    rows_b = sorted((r.shard, r.doc_id) for r in b.collect())
    assert rows_a == rows_b and len(rows_a) == 300  # NULL id dropped
    # every shard directory exists with exactly one data file
    import glob
    for k in {r.shard for r in a.collect()}:
        files = glob.glob(f"{p1}/shard={k}/*.parquet")
        assert len(files) == 1
    # manifest agrees with the written layout
    man = {r.shard: (r.docs, r.tokens)
           for r in shard_manifest(df, 8, seed=1).collect()}
    from collections import Counter
    per = Counter(r.shard for r in a.collect())
    assert {k: v[0] for k, v in man.items()} == dict(per)


def test_assign_shards_validation():
    import pytest as _pytest

    from fastpasta_spark.operators.packing import assign_shards

    with _pytest.raises(ValueError, match="n_shards"):
        assign_shards(None, 0)
