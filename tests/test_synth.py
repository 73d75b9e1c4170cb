"""Generator determinism — the corpus must be a pure function of
(seed, doc index), independent of partitioning (FIXTURES.md seed=42)."""

from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, gen_doc, media_df


def test_gen_doc_deterministic():
    cfg = CorpusConfig(n_docs=100, corrupt_per_mille=200)
    a = [gen_doc(i, cfg) for i in range(50)]
    b = [gen_doc(i, cfg) for i in range(50)]
    assert a == b


def test_corpus_partition_independent(spark):
    cfg = CorpusConfig(n_docs=200, corrupt_per_mille=150, dup_per_mille=50)
    rows1 = sorted(
        corpus_df(spark, cfg).repartition(3).collect(),
        key=lambda r: (r.doc_id, len(r.spans or [])),
    )
    rows2 = sorted(
        corpus_df(spark, cfg).repartition(17).collect(),
        key=lambda r: (r.doc_id, len(r.spans or [])),
    )
    assert rows1 == rows2
    assert len(rows1) == 210  # 200 + 5% dups


def test_media_dim(spark):
    cfg = CorpusConfig(n_media=10)
    rows = media_df(spark, cfg).collect()
    assert len(rows) == 10
    assert {r.mtype for r in rows} == {"image", "audio", "video"}
    assert all(r.bytes > 0 for r in rows)


def test_clean_corpus_has_valid_spans(spark):
    from fastpasta_spark.functions.fsm import stateless_doc_checks, validate_spans

    cfg = CorpusConfig(n_docs=100)
    for r in corpus_df(spark, cfg).collect():
        tuples = [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        assert validate_spans(tuples) == [], r.doc_id
        assert stateless_doc_checks(r.doc_id, tuples) == [], r.doc_id
