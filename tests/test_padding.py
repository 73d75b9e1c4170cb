"""Padding gate (C7): pad spans legal only as a trailing run.

E82 position violations (FSM), E74 dirty padding (stateless battery).
"""

import pytest

from fastpasta_spark import schema as S
from fastpasta_spark.functions.fsm import stateless_doc_checks, validate_spans
from fastpasta_spark.sources import fixtures as FX
from fastpasta_spark.sources import synth


def span(kind, text="", ref="", off=0):
    return (kind, text, ref, off)


def _codes(viols):
    return [v[2] for v in viols]


def _frame(off=0):
    return [span("header", "lanes=1", off=off),
            span("trig", "cont=0,bc=5", off=off + 1),
            span("text", "a", off=off + 2),
            span("trailer", "done=1", off=off + 3)]


def test_trailing_pads_clean():
    doc = _frame() + [span("pad", off=4), span("pad", off=5)]
    assert validate_spans(doc) == []


def test_pad_after_diag_clean():
    doc = _frame() + [span("diag", "ok", off=4), span("pad", off=5)]
    assert validate_spans(doc) == []


def test_pad_inside_frame_fires_e82_without_poisoning():
    doc = [span("header", "lanes=1"), span("trig", "cont=0,bc=5", off=1),
           span("pad", off=2), span("text", "a", off=3),
           span("trailer", "done=1", off=4)]
    assert _codes(validate_spans(doc)) == [S.E82_PAD_POSITION]


def test_span_after_legal_padding_fires_e82():
    doc = _frame() + [span("pad", off=4)] + [
        span("header", "lanes=1", off=5), span("trig", "cont=0,bc=9", off=6),
        span("text", "b", off=7), span("trailer", "done=1", off=8)]
    codes = _codes(validate_spans(doc))
    assert codes.count(S.E82_PAD_POSITION) == 4  # every span after the pad


def test_dirty_pad_fires_e74():
    doc = _frame() + [span("pad", "leftover", off=4)]
    codes = _codes(stateless_doc_checks("doc1", doc))
    assert codes == [S.E74_PAD_NOT_EMPTY]
    assert validate_spans(doc) == []  # position is legal


_PAD_CFG = FX._PAD_SPANS_CFG


@pytest.mark.parametrize("mut", [synth.MUT_PAD_INSIDE, synth.MUT_PAD_DIRTY])
def test_engine_matches_oracle_on_pad_families(spark, mut):
    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )

    n = 60
    df = FX._mutated(spark, mut, n, cfg=_PAD_CFG)
    viol, _ = split_sequence_output(sequence_pass(df, fused=True))
    engine = sorted(
        (r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message)
        for r in viol.collect()
    )
    oracle = []
    for i in range(n):
        spans = synth._doc_spans(i, _PAD_CFG)
        h = synth.splitmix64(_PAD_CFG.seed * 0xA5A5 + i * 3 + 1)
        spans = synth._mutate([dict(s) for s in spans], mut, h, _PAD_CFG)
        tuples = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for v in validate_spans(tuples):
            oracle.append((f"doc{i:010d}", *v))
        for v in stateless_doc_checks(f"doc{i:010d}", tuples):
            oracle.append((f"doc{i:010d}", *v))
    assert engine == sorted(oracle)
    assert len(engine) >= n


def test_clean_pad_corpus_is_clean(spark):
    from fastpasta_spark.plans.check_all import check_all

    docs = synth.corpus_df(spark, _PAD_CFG)
    assert check_all(docs).violations.count() == 0
