"""Connected-components / duplicate-cluster tests.

Engine (iterative hash-min label propagation) vs a pure-Python
union-find oracle, plus multi-hop chains and partitioning independence.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fastpasta_spark.operators.graph import connected_components, duplicate_clusters


def _uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_chain_converges_to_min(spark):
    # path 1-2-3-4-5: label must propagate 4 hops
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 4)], "doc_a long, doc_b long")
    got = {r["node"]: r["cluster"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    rows = duplicate_clusters(pairs).collect()
    by_node = {r["node"]: r for r in rows}
    assert by_node[3]["cluster"] == 1 and by_node[3]["csize"] == 3
    assert by_node[11]["cluster"] == 10 and by_node[11]["csize"] == 2
    keepers = sorted(r["node"] for r in rows if r["is_keeper"])
    assert keepers == [1, 10]


def test_random_graph_matches_union_find(spark):
    rng = random.Random(1234)
    pairs = [(rng.randrange(80), rng.randrange(80)) for _ in range(70)]
    pairs = [(a, b) for a, b in pairs if a != b]
    expect = _uf_components(pairs)
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["cluster"]
           for r in connected_components(df).collect()}
    assert got == expect


def test_partitioning_independent(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df1 = spark.createDataFrame(pairs, "doc_a long, doc_b long").coalesce(1)
    df8 = spark.createDataFrame(pairs, "doc_a long, doc_b long").repartition(8)
    r1 = sorted(map(tuple, connected_components(df1).collect()))
    r8 = sorted(map(tuple, connected_components(df8).collect()))
    assert r1 == r8


def test_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c")], "doc_a string, doc_b string")
    got = {r["node"]: r["cluster"]
           for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_dup_clusters_dedup_semantics(spark):
    # 3 exact copies + 1 near-dup chained onto them: delete NOT is_keeper
    # keeps exactly one doc of the family
    pairs = spark.createDataFrame(
        [(100, 101), (101, 102), (102, 200)], "doc_a long, doc_b long")
    res = duplicate_clusters(pairs)
    assert res.filter(F.col("is_keeper")).count() == 1
    assert res.filter(~F.col("is_keeper")).count() == 3


def test_nonconvergence_raises(spark):
    import pytest

    # a 12-node path needs 11 propagation rounds; max_iter=3 must FAIL
    # LOUDLY rather than return split clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=3)
