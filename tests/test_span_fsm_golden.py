"""Driver span_fsm oracle integrity: the golden parquet's pure-Python
provenance must track both the live engine AND the live Spark
docs-derivation (a drifted scripts/make_span_fsm_golden.py replica
would silently rot the driver's correctness gate)."""

import os
from collections import Counter

import duckdb

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "span_fsm_sf0.01.parquet")


def test_derive_spans_replica_matches_spark(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_span_fsm_golden import derive_spans

    from fastpasta_spark.sources.from_documents import docs_from_documents

    documents = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.spans
           for r in docs_from_documents(documents).collect()}
    for row in documents.collect():
        exp = derive_spans(str(row.doc_id), row.text, row.n_chars)
        spark_spans = got[str(row.doc_id)]
        spark_tuples = (None if spark_spans is None else
                        [(s.kind, s.text, s.media_ref, s.offset)
                         for s in spark_spans])
        assert spark_tuples == exp, row.doc_id


def test_golden_parquet_matches_live_engine(spark):
    import __spark_entry__ as em

    df = em.queries()["span_fsm"](spark, "/root/testdata/sf0.01")
    engine = Counter(tuple(r) for r in df.collect())
    golden = Counter(tuple(r) for r in duckdb.sql(
        f"SELECT * FROM read_parquet('{GOLDEN}')").fetchall())
    assert engine == golden
