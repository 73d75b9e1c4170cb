"""Clean-doc pre-screen safety property (round-4 verdict #2).

`operators/sequence._screen_clean_docs` lets the fused pass skip the
Python FSM loop for docs it proves violation-free. The ONLY way it can
be wrong is a false CLEAN (a skipped doc the FSM would have flagged) —
false DIRTY merely costs speed. This test hammers the implication

    screen says clean  =>  functions/fsm.validate_spans(doc) == []

over every mutation class the generator knows (incl. lane-layer,
page/orbit, padding, trigger-period corpora) plus hand-built edge docs,
and asserts the screen still has teeth (clean docs of a clean corpus DO
pass the screen — no trivially-all-dirty regression).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastpasta_spark.functions import fsm as pyfsm
from fastpasta_spark.operators import sequence as seq
from fastpasta_spark.sources.synth import (
    N_MUTATIONS_ALL,
    CorpusConfig,
    corpus_df,
)


def _screen_docs(doc_list):
    """Replicate arrow_pass's flattening for a list of span-tuple lists
    and run the screen. doc_list: list of list[(kind, text, ref, off)]."""
    spans_arr = pa.array(
        [[{"kind": k, "text": t, "media_ref": r, "offset": o}
          for (k, t, r, o) in (d or [])] if d is not None else None
         for d in doc_list],
        type=pa.list_(pa.struct([("kind", pa.string()),
                                 ("text", pa.string()),
                                 ("media_ref", pa.string()),
                                 ("offset", pa.int32())])))
    n_docs = len(spans_arr)
    flat = spans_arr.flatten()
    kind_c, text_c = flat.field("kind"), flat.field("text")
    ref_c = flat.field("media_ref")
    counts_np = pc.fill_null(pc.list_value_length(spans_arr), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts_np, out=bounds[1:])
    parent = np.repeat(np.arange(n_docs), counts_np)
    codes = pc.fill_null(
        pc.index_in(kind_c, value_set=pa.array(seq._KINDS)), -1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    ref_empty = (pc.fill_null(pc.utf8_length(pc.fill_null(ref_c, "")), 0)
                 .to_numpy(zero_copy_only=False) == 0) | \
        pc.is_null(ref_c).to_numpy(zero_copy_only=False)
    lane_pref = pc.starts_with(pc.fill_null(text_c, ""), pattern="lane="
                               ).to_numpy(zero_copy_only=False)
    return seq._screen_clean_docs(codes, parent, bounds, counts_np,
                                  text_c, ref_c, ref_empty, lane_pref)


def _assert_clean_implies_no_violations(doc_list, trigger_period=None):
    clean = _screen_docs(doc_list)
    for d, spans in enumerate(doc_list):
        if clean[d] and spans:
            got = pyfsm.validate_spans(
                [(k, t, r, o) for (k, t, r, o) in spans],
                trigger_period=trigger_period)
            assert got == [], (
                f"screen passed doc {d} but FSM flags {got}: {spans}")
    return clean


def _collect_docs(spark, cfg):
    return [
        [(s.kind, s.text, s.media_ref, s.offset) for s in (r.spans or [])]
        for r in corpus_df(spark, cfg).collect()
    ]


def test_screen_never_false_clean_all_mutations(spark):
    # MUT_LANE_MISMATCH (12) / MUT_DUP_REF (13) parse simple 'lanes=N'
    # headers and cannot mutate lane-layer corpora (generator
    # constraint); every other class — they are covered by the default
    # corpus test below and the edge docs
    cfg = CorpusConfig(
        n_docs=600, corrupt_per_mille=700, dup_per_mille=20,
        mutation_classes=tuple(c for c in range(N_MUTATIONS_ALL)
                               if c not in (12, 13)),
        lane_layer=True, page_orbit=True, pad_spans=True,
        readout_flags=True, trigger_period=7, min_frames=1, max_frames=3)
    docs = _collect_docs(spark, cfg)
    clean = _assert_clean_implies_no_violations(docs, trigger_period=7)
    # lane-layer/page-orbit corpora are outside the strict screen
    # grammar — everything should route to the exact loop
    assert not clean[[i for i, d in enumerate(docs) if d]].any()


def test_screen_never_false_clean_default_corpus(spark):
    cfg = CorpusConfig(n_docs=800, corrupt_per_mille=500, dup_per_mille=10)
    docs = _collect_docs(spark, cfg)
    clean = _assert_clean_implies_no_violations(docs)
    # the screen must have teeth on the default (bench-shaped) corpus:
    # a majority of docs are clean and most must skip the loop
    n_clean_oracle = sum(
        1 for d in docs if d and pyfsm.validate_spans(
            [(k, t, r, o) for (k, t, r, o) in d]) == [])
    assert clean.sum() >= 0.9 * n_clean_oracle > 0


def test_screen_edge_docs():
    H, T, X, M, C, R, D, P = ("header", "trig", "text", "media", "calib",
                              "trailer", "diag", "pad")

    def doc(*steps):
        return [(k, t, r, i) for i, (k, t, r) in enumerate(steps)]

    clean_doc = doc((H, "lanes=2", ""), (T, "cont=0,bc=5", ""),
                    (X, "hello", ""), (M, "", "m1"), (R, "done=1", ""),
                    (D, "ok", ""))
    edge_docs = [
        clean_doc,
        None,                                    # null spans
        [],                                      # empty spans
        doc((H, "lanes=1", "")),                 # unclosed => E991
        doc((R, "done=1", "")),                  # orphan close => E992
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1", ""),
            (R, "done=1", "")),                  # empty frame => E701
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1", ""), (X, "a", ""),
            (X, "b", ""), (R, "done=1", "")),    # count 2 != 1 => E702
        doc((H, "lanes=2", ""), (T, "cont=0,bc=9", ""), (M, "", "m7"),
            (M, "", "m7"), (R, "done=1", "")),   # dup ref => E703
        doc((H, "lanes=1", ""), (T, "cont=0,bc=9", ""), (X, "a", ""),
            (R, "done=1", ""), (H, "lanes=1", ""), (T, "cont=0,bc=3", ""),
            (X, "b", ""), (R, "done=1", "")),    # bc decrease => E440
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1", ""), (X, "a", ""),
            (C, "idx=0", ""), (R, "done=1", "")),  # calib late => E81
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1", ""), (X, "a", ""),
            (R, "done=0", ""), (T, "cont=1,bc=2", ""), (X, "b", ""),
            (R, "done=1", "")),                  # legal continuation
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1", ""), (X, "a", ""),
            (R, "done=1", ""), (P, "", "")),     # trailing pad
        doc((H, "lanes=1,page=0", ""), (T, "cont=0,bc=1", ""),
            (X, "a", ""), (R, "done=1", "")),    # page field => loop
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1,int=1", ""),
            (X, "a", ""), (R, "done=1", "")),    # int trig => loop
        doc((H, "lanes=1", ""), (T, "cont=0,bc=1", ""),
            (X, "lane=0,chips=0;1,cbc=1", ""),
            (R, "done=1", "")),                  # lane layer => loop
        doc((D, "ok", "")),                      # diag-only doc
        doc((H, "lanes=0", ""), (T, "cont=0,bc=1", ""),
            (R, "done=1", "")),                  # lanes=0 + E701
        doc((H, "lanes=1", ""), (T, "cont=0,bc=99999999999999999999", ""),
            (X, "a", ""), (R, "done=1", "")),    # >int64 bc => loop
    ]
    clean = _assert_clean_implies_no_violations(edge_docs)
    assert clean[0]                              # the clean doc passes
    # every doc with a genuine FSM violation must be dirty
    for i in (3, 4, 5, 6, 7, 8, 9):
        assert not clean[i], i
