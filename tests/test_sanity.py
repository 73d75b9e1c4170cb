"""The Column-expression sanity battery must agree ROW-FOR-ROW with the
pure-Python battery (functions/fsm.py) — two independent implementations
of the same rules, cross-checked on a corrupted corpus. This is the
engine-level analogue of the reference's validator accept/reject unit
tests (`validators/rdh.rs:379-825`)."""

from fastpasta_spark.functions.fsm import stateless_doc_checks
from fastpasta_spark.operators.sanity import sanity_violations
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df


def test_sanity_matches_python_oracle(spark):
    cfg = CorpusConfig(n_docs=400, corrupt_per_mille=300, dup_per_mille=30)
    docs = corpus_df(spark, cfg)

    got = sorted(
        (r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message)
        for r in sanity_violations(docs).collect()
    )

    expected = []
    for r in docs.collect():
        tuples = [(s.kind, s.text, s.media_ref, s.offset) for s in (r.spans or [])]
        for si, off, code, sev, msg in stateless_doc_checks(r.doc_id, tuples or None):
            expected.append((r.doc_id, si, off, code, sev, msg))
    expected.sort()

    assert got == expected
    assert len(got) > 0  # the fixture actually exercises the battery


def test_sanity_clean_corpus_empty(spark):
    docs = corpus_df(spark, CorpusConfig(n_docs=150))
    assert sanity_violations(docs).count() == 0


def test_sanity_null_edge_cases(spark):
    from fastpasta_spark import schema as S

    rows = [
        (None, [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]),
        ("ok_doc", None),
        ("bad id!", [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]),
    ]
    docs = spark.createDataFrame(rows, schema=S.DOCS_SCHEMA)
    codes = {r.check_code for r in sanity_violations(docs).collect()}
    assert codes == {S.E10_DOC_ID_NULL, S.E12_SPANS_NULL, S.E13_DOC_ID_FORMAT}
