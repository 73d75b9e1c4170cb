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
