"""Page/orbit running counters — R1-R3 true docs-model form.

E31 page counter (rdh pages-counter analogue), E32 same-fields-when-
page>0, E441 orbit-change-only-after-stop. Opt-in per FIELD presence:
corpora without page=/orbit= fields are untouched (goldens stable).
"""

import pytest

from fastpasta_spark import schema as S
from fastpasta_spark.functions.fsm import validate_spans
from fastpasta_spark.sources import fixtures as FX
from fastpasta_spark.sources import synth


def span(kind, text="", ref="", off=0):
    return (kind, text, ref, off)


def _codes(viols):
    return [v[2] for v in viols]


def _doc(headers, orbits=None, dones=None):
    """Build a doc of len(headers) frames; headers[i] is the header text,
    orbits[i] the trig orbit field (or None), dones[i] the trailer done."""
    doc, off = [], 0
    for i, htext in enumerate(headers):
        orb = f",orbit={orbits[i]}" if orbits and orbits[i] is not None else ""
        done = dones[i] if dones else 1
        doc.append(span("header", htext, off=off))
        doc.append(span("trig", f"cont=0,bc={10 + i}{orb}", off=off + 1))
        doc.append(span("text", "a", off=off + 2))
        doc.append(span("trailer", f"done={done}", off=off + 3))
        off += 4
    return doc


def test_clean_page_sequence():
    assert validate_spans(_doc(["lanes=1,page=0", "lanes=1,page=1",
                                "lanes=1,page=2"])) == []


def test_page_skip_fires_e31():
    viols = validate_spans(_doc(["lanes=1,page=0", "lanes=1,page=2"]))
    assert _codes(viols) == [S.E31_PAGE_COUNTER]
    assert viols[0][0] == 4  # 2nd header's span index


def test_first_page_nonzero_fires_e31():
    assert _codes(validate_spans(_doc(["lanes=1,page=3"]))) == [S.E31_PAGE_COUNTER]


def test_fields_change_fires_e32():
    # 2nd frame declares lanes=2 and carries 2 content spans (count ok)
    doc = _doc(["lanes=1,page=0"])
    doc += [span("header", "lanes=2,page=1", off=4),
            span("trig", "cont=0,bc=50", off=5),
            span("text", "a", off=6), span("text", "b", off=7),
            span("trailer", "done=1", off=8)]
    assert _codes(validate_spans(doc)) == [S.E32_PAGE_FIELDS]


def test_no_page_fields_noop():
    # counter-less corpora: varying lanes never fires E31/E32
    doc = _doc(["lanes=1"])
    doc += [span("header", "lanes=2", off=4),
            span("trig", "cont=0,bc=50", off=5),
            span("text", "a", off=6), span("text", "b", off=7),
            span("trailer", "done=1", off=8)]
    assert validate_spans(doc) == []


def test_orbit_monotone_and_stop_rule():
    # advance after done=1: clean
    assert validate_spans(_doc(["lanes=1,page=0", "lanes=1,page=1"],
                               orbits=[5, 6])) == []
    # decrease: E441
    assert _codes(validate_spans(_doc(["lanes=1,page=0", "lanes=1,page=1"],
                                      orbits=[6, 5]))) == [S.E441_ORBIT_NO_STOP]
    # advance after done=0: E441 (orbit may only change after a stop)
    assert _codes(validate_spans(
        _doc(["lanes=1,page=0", "lanes=1,page=1"],
             orbits=[5, 6], dones=[0, 1]))) == [S.E441_ORBIT_NO_STOP]
    # SAME orbit after done=0: clean (continuation keeps the orbit)
    assert validate_spans(_doc(["lanes=1,page=0", "lanes=1,page=1"],
                               orbits=[5, 5], dones=[0, 1])) == []


_PAGE_CFG = FX._PAGE_CFG


@pytest.mark.parametrize("name,mut", [
    ("bad_page_counter", synth.MUT_PAGE_SKIP),
    ("bad_page_fields", synth.MUT_PAGE_FIELDS),
    ("bad_orbit", synth.MUT_ORBIT_NO_STOP),
])
def test_engine_matches_oracle_on_page_families(spark, name, mut):
    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )

    n = 60
    df = FX._mutated(spark, mut, n, cfg=_PAGE_CFG)
    viol, _ = split_sequence_output(sequence_pass(df))
    engine = sorted(
        (r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message)
        for r in viol.collect()
    )
    oracle = []
    for i in range(n):
        spans = synth._doc_spans(i, _PAGE_CFG)
        h = synth.splitmix64(_PAGE_CFG.seed * 0xA5A5 + i * 3 + 1)
        spans = synth._mutate([dict(s) for s in spans], mut, h, _PAGE_CFG)
        tuples = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for v in validate_spans(tuples):
            oracle.append((f"doc{i:010d}", *v))
    assert engine == sorted(oracle)
    assert len(engine) >= n  # every doc mutated -> at least one row each


def test_clean_page_orbit_corpus_is_clean(spark):
    from fastpasta_spark.plans.check_all import check_all

    docs = synth.corpus_df(spark, _PAGE_CFG)
    assert check_all(docs).violations.count() == 0
