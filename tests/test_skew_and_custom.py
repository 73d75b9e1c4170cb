"""Skew handling (salted agg on a hot key), custom checks (V2),
iceberg fallback, lane-count (A1) end-to-end."""

from fastpasta_spark import schema as S
from fastpasta_spark.operators.uniqueness import duplicate_keys, salted_duplicate_keys
from fastpasta_spark.plans.check_all import check_all
from fastpasta_spark.plans.report import custom_checks
from fastpasta_spark.sources.iceberg import iceberg_available, read_docs, write_docs
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df


def test_salted_matches_plain_on_hot_key(spark):
    # hot key: doc 0 duplicated 2000x (FIXTURES dup_keys skew fixture)
    cfg = CorpusConfig(n_docs=500, hot_key_copies=2000)
    docs = corpus_df(spark, cfg)
    plain = {(r[0], r[1]) for r in duplicate_keys(docs).collect()}
    salted = {(r[0], r[1]) for r in salted_duplicate_keys(docs).collect()}
    assert plain == salted
    assert ("doc0000000000", 2001) in plain


def test_custom_checks(spark):
    cfg = CorpusConfig(n_docs=200, corrupt_per_mille=100)
    res = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
    # reference analogue: --its-trigger-period style expected counts
    ok = custom_checks(res.metrics, {"docs_seen": 200.0})
    assert ok.count() == 0
    bad = custom_checks(res.metrics, {"docs_seen": 9999.0, "no_such_metric": 1.0})
    rows = bad.collect()
    assert len(rows) == 2
    assert all(r.check_code == S.E9001_CUSTOM_CHECK for r in rows)
    assert any("<absent>" in r.message for r in rows)


def test_lane_count_end_to_end(spark):
    # corrupted corpus now includes MUT_LANE_MISMATCH docs -> E702 rows
    cfg = CorpusConfig(n_docs=600, corrupt_per_mille=300)
    res = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
    codes = {r.check_code for r in res.violations.collect()}
    assert S.E702_LANE_COUNT in codes


def test_iceberg_fallback_roundtrip(spark, tmp_path):
    assert not iceberg_available(spark)  # sandbox image: no iceberg jars
    docs = corpus_df(spark, CorpusConfig(n_docs=50))
    path = str(tmp_path / "docs_out")
    write_docs(docs, path)
    back = read_docs(spark, path)
    assert back.count() == 50
    assert [f.name for f in back.schema.fields] == ["doc_id", "spans"]


def test_iceberg_bucket_ddl_contract():
    # the DDL write_docs issues on a real catalog: bucket(doc_id)
    # partitioning is what buys file pruning for resume + co-located
    # uniqueness (BASELINE.json input_hint)
    from fastpasta_spark.sources.iceberg import bucket_ddl

    ddl = bucket_ddl("lake.db.docs", 256)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(256, doc_id))" in ddl
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS lake.db.docs")


def test_iceberg_write_roundtrip_when_runtime_present(spark, tmp_path):
    # integration path: runs only on images that ship the Iceberg
    # runtime jar + a configured catalog (sandbox: auto-skip)
    import pytest

    if not iceberg_available(spark):
        pytest.skip("no iceberg runtime jar on this image")
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df

    docs = corpus_df(spark, CorpusConfig(n_docs=50))
    write_docs(docs, "lake.db.t_roundtrip", bucket_count=8)
    back = read_docs(spark, "lake.db.t_roundtrip")
    assert back.count() == 50
