"""Unit tests for the pure-Python grammar FSM (functions/fsm.py).

Mirrors the reference's accept/reject validator unit tests
(`/root/reference/fastpasta/src/analyze/validators/its/cdp_running.rs:459-802`
drives the FSM with crafted word sequences and asserts exact error
codes/positions).
"""

from fastpasta_spark import schema as S
from fastpasta_spark.functions.fsm import (
    parse_kv,
    stateless_doc_checks,
    validate_spans,
)


def span(kind, text="", ref="", off=0):
    return (kind, text, ref, off)


def _codes(viols):
    return [v[2] for v in viols]


GOOD_DOC = [
    span("header", "lanes=2", off=0),   # declares 2 content spans
    span("trig", "cont=0,bc=10", off=1),
    span("calib", "idx=0", off=2),      # calib doesn't count toward lanes
    span("text", "hello world", off=3),
    span("media", "", "m1", off=4),
    span("trailer", "done=1", off=5),
    span("header", "lanes=1", off=6),
    span("trig", "cont=0,bc=22", off=7),
    span("text", "more", off=8),
    span("trailer", "done=1", off=9),
    span("diag", "ok", off=10),
]


def test_parse_kv():
    assert parse_kv("cont=0,bc=12") == {"cont": "0", "bc": "12"}
    assert parse_kv("") == {}
    assert parse_kv("garbage") == {}


def test_clean_doc_passes():
    assert validate_spans(GOOD_DOC) == []


def test_continuation_frame_legal():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=5", off=1),
        span("text", "a", off=2),
        span("trailer", "done=0", off=3),
        span("trig", "cont=1,bc=6", off=4),
        span("text", "b", off=5),
        span("trailer", "done=1", off=6),
    ]
    assert validate_spans(doc) == []


def test_orphan_trailer():
    doc = [span("trailer", "done=1", off=0)] + [
        (k, t, r, o + 1) for k, t, r, o in GOOD_DOC
    ]
    codes = _codes(validate_spans(doc))
    assert S.E992_FSM_ORPHAN_CLOSE in codes


def test_unclosed_frame():
    doc = GOOD_DOC[:4]  # header trig calib text — never closed
    codes = _codes(validate_spans(doc))
    assert codes == [S.E991_FSM_UNCLOSED]


def test_bc_monotone():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=50", off=1),
        span("text", "a", off=2),
        span("trailer", "done=1", off=3),
        span("header", "lanes=1", off=4),
        span("trig", "cont=0,bc=10", off=5),  # bc decreased
        span("text", "b", off=6),
        span("trailer", "done=1", off=7),
    ]
    viols = validate_spans(doc)
    assert _codes(viols) == [S.E440_BC_NOT_MONOTONE]
    assert viols[0][0] == 5  # span index of the bad trig


def test_cont_after_done_is_e41():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=5", off=1),
        span("text", "a", off=2),
        span("trailer", "done=1", off=3),
        span("trig", "cont=1,bc=6", off=4),  # cont after done=1
        span("text", "b", off=5),
        span("trailer", "done=1", off=6),
    ]
    assert _codes(validate_spans(doc)) == [S.E41_CONTINUATION]


def test_calib_after_content():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=5", off=1),
        span("text", "a", off=2),
        span("calib", "idx=1", off=3),
        span("trailer", "done=1", off=4),
    ]
    assert _codes(validate_spans(doc)) == [S.E81_CALIB_POSITION]


def test_empty_frame():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=5", off=1),
        span("trailer", "done=1", off=2),
    ]
    assert _codes(validate_spans(doc)) == [S.E701_EMPTY_FRAME]


def test_calib_only_frame_is_empty():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=5", off=1),
        span("calib", "idx=0", off=2),
        span("trailer", "done=1", off=3),
    ]
    assert _codes(validate_spans(doc)) == [S.E701_EMPTY_FRAME]


def test_lane_count_mismatch():
    doc = [
        span("header", "lanes=3", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("text", "a", off=2),
        span("text", "b", off=3),
        span("trailer", "done=1", off=4),
    ]
    viols = validate_spans(doc)
    assert _codes(viols) == [S.E702_LANE_COUNT]
    assert viols[0][0] == 4  # reported on the closing trailer


def test_lane_count_empty_frame_is_e701_not_e702():
    doc = [
        span("header", "lanes=3", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("trailer", "done=1", off=2),
    ]
    assert _codes(validate_spans(doc)) == [S.E701_EMPTY_FRAME]


def test_dup_ref_in_frame():
    doc = [
        span("header", "lanes=2", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("media", "", "m5", off=2),
        span("media", "", "m5", off=3),  # duplicate ref, same frame
        span("trailer", "done=1", off=4),
    ]
    viols = validate_spans(doc)
    assert _codes(viols) == [S.E703_DUP_REF_IN_FRAME]
    assert viols[0][0] == 3


def test_same_ref_in_different_frames_ok():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("media", "", "m5", off=2),
        span("trailer", "done=1", off=3),
        span("header", "lanes=1", off=4),
        span("trig", "cont=0,bc=2", off=5),
        span("media", "", "m5", off=6),  # same ref, NEW frame -> fine
        span("trailer", "done=1", off=7),
    ]
    assert validate_spans(doc) == []


def test_span_after_diag():
    doc = GOOD_DOC + [span("text", "late", off=11)]
    codes = _codes(validate_spans(doc))
    assert codes == [S.E60_DIAG_SANITY]


def test_malformed_fields():
    doc = [
        span("header", "nolanes", off=0),
        span("trig", "garbage", off=1),
        span("text", "a", off=2),
        span("trailer", "what", off=3),
    ]
    codes = _codes(validate_spans(doc))
    assert S.E30_HEADER_SANITY in codes
    assert S.E40_TRIG_SANITY in codes
    assert S.E50_TRAILER_SANITY in codes


def test_double_header():
    doc = [
        span("header", "lanes=1", off=0),
        span("header", "lanes=1", off=1),
        span("trig", "cont=0,bc=1", off=2),
        span("text", "a", off=3),
        span("trailer", "done=1", off=4),
    ]
    assert _codes(validate_spans(doc)) == [S.E990_FSM_UNEXPECTED]


def test_stateless_checks():
    viols = stateless_doc_checks("doc1", [span("junk", "x", "", 0)])
    assert _codes(viols) == [S.E70_INVALID_KIND]
    viols = stateless_doc_checks("", None)
    assert set(_codes(viols)) == {S.E10_DOC_ID_NULL, S.E12_SPANS_NULL}
    viols = stateless_doc_checks("bad id!", [span("text", "x", "", 5)])
    assert S.E13_DOC_ID_FORMAT in _codes(viols)
    assert S.E11_OFFSET_SEQUENCE in _codes(viols)
    # media_ref on a text span
    viols = stateless_doc_checks("d", [span("text", "x", "m1", 0)])
    assert _codes(viols) == [S.E73_UNEXPECTED_REF]


def test_diag_field_sanity():
    # DDW0 field sanity analogue (ddw.rs:9-46, checks_list.md:94-97):
    # resv must be 0, idx an integer >= 1; opt-in per key
    def diag_doc(text):
        return [
            span("header", "lanes=1", off=0),
            span("trig", "cont=0,bc=1", off=1),
            span("text", "a", off=2),
            span("trailer", "done=1", off=3),
            span("diag", text, off=4),
        ]

    assert validate_spans(diag_doc("ok")) == []            # field-less: no-op
    assert validate_spans(diag_doc("idx=1,resv=0")) == []  # clean fields
    assert validate_spans(diag_doc("idx=3")) == []         # idx alone ok
    for bad in ("resv=5", "idx=1,resv=1", "resv=x",
                "idx=0", "idx=-2", "idx=zz,resv=0"):
        viols = validate_spans(diag_doc(bad))
        assert _codes(viols) == [S.E61_DIAG_FIELDS], bad
        assert viols[0][0] == 4 and viols[0][1] == 4, bad
    # both fields bad -> two E61 rows (resv first, then idx)
    both = validate_spans(diag_doc("idx=0,resv=9"))
    assert _codes(both) == [S.E61_DIAG_FIELDS, S.E61_DIAG_FIELDS]
    # misplaced AND corrupt diag reports both E61 and E990
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("diag", "resv=7", off=2),
    ]
    # (no E991: diag moves the FSM to DONE even when misplaced)
    assert set(_codes(validate_spans(doc))) == {
        S.E61_DIAG_FIELDS, S.E990_FSM_UNEXPECTED}
