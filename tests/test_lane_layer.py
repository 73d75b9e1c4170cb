"""Grammar v2: trigger-period (E45), lane-identity (E704/E705), the chip
nesting level (E9003/E9004/E9005) and FATAL lane propagation (E9006).

Reference analogues: tdh.rs:60-109 (trigger period, driven from
cdp_running.rs:400-427), words/its/status_words/util.rs:184-189 (lane
membership), alpide_readout_frame.rs:94-130 (legal lane groupings),
lane_alpide_frame_analyzer.rs:91-320 (per-lane chip decode + E9003/4/5),
readout_frame.rs:40-50 (fatal-lane exclusion).
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


# ---------------------------------------------------------------------------
# E45 trigger period (pure FSM)
# ---------------------------------------------------------------------------


def _period_doc(bcs, period=None):
    doc, off = [], 0
    for bc in bcs:
        doc.append(span("header", "lanes=1", off=off))
        doc.append(span("trig", f"cont=0,bc={bc},int=1", off=off + 1))
        doc.append(span("text", "a", off=off + 2))
        doc.append(span("trailer", "done=1", off=off + 3))
        off += 4
    return validate_spans(doc, trigger_period=period)


def test_trigger_period_clean():
    assert _period_doc([10, 208, 406], period=198) == []


def test_trigger_period_off_by_default():
    # no period configured -> E45 never fires (reference: only with
    # --its-trigger-period)
    assert _period_doc([10, 11, 12]) == []


def test_trigger_period_mismatch():
    viols = _period_doc([10, 208, 500], period=198)
    assert _codes(viols) == [S.E45_TRIGGER_PERIOD]
    assert viols[0][0] == 9  # the third trig's span index


def test_trigger_period_wraps_mod_3564():
    # 3500 -> 134 is exactly 198 forward with the bc wraparound; the
    # wrap also decreases bc, which the separate E440 check reports
    viols = _period_doc([3302, 3500, 134], period=198)
    assert _codes(viols) == [S.E440_BC_NOT_MONOTONE]


def test_trigger_period_ignores_external_trigs():
    doc = [
        span("header", "lanes=1", off=0),
        span("trig", "cont=0,bc=10,int=1", off=1),
        span("text", "a", off=2),
        span("trailer", "done=1", off=3),
        span("header", "lanes=1", off=4),
        span("trig", "cont=0,bc=50", off=5),  # external: not in the chain
        span("text", "b", off=6),
        span("trailer", "done=1", off=7),
        span("header", "lanes=1", off=8),
        span("trig", "cont=0,bc=208,int=1", off=9),  # 10 + 198
        span("text", "c", off=10),
        span("trailer", "done=1", off=11),
    ]
    assert validate_spans(doc, trigger_period=198) == []


# ---------------------------------------------------------------------------
# lane identity + chip layer (pure FSM)
# ---------------------------------------------------------------------------


def _lane_doc(lane_texts, header="lanes=2,lane_ids=0;1,chips=2"):
    doc = [span("header", header, off=0), span("trig", "cont=0,bc=1", off=1)]
    for i, t in enumerate(lane_texts):
        doc.append(span("text", t, off=2 + i))
    doc.append(span("trailer", "done=1", off=2 + len(lane_texts)))
    return validate_spans(doc)


def test_lane_layer_clean():
    assert _lane_doc(["lane=0,chips=0;1,cbc=7", "lane=1,chips=8;9,cbc=7"]) == []


def test_lane_not_declared():
    viols = _lane_doc(["lane=0,chips=0;1,cbc=7", "lane=5,chips=8;9,cbc=7"])
    assert _codes(viols) == [S.E704_LANE_NOT_DECLARED]


def test_lane_order():
    viols = _lane_doc(["lane=1,chips=8;9,cbc=7", "lane=0,chips=0;1,cbc=7"])
    assert _codes(viols) == [S.E705_LANE_ORDER]
    assert viols[0][0] == 3  # the second (out-of-order) lane span


def test_chip_count():
    viols = _lane_doc(["lane=0,chips=0,cbc=7", "lane=1,chips=8;9,cbc=7"])
    assert _codes(viols) == [S.E9004_CHIP_COUNT]


def test_chip_order_only_checked_when_count_ok():
    # count wrong AND order wrong -> only E9004 (reference checks order
    # only if the count is valid, lane_alpide_frame_analyzer.rs:191-205)
    viols = _lane_doc(["lane=0,chips=5;3;1,cbc=7", "lane=1,chips=8;9,cbc=7"])
    assert _codes(viols) == [S.E9004_CHIP_COUNT]
    viols = _lane_doc(["lane=0,chips=1;0,cbc=7", "lane=1,chips=8;9,cbc=7"])
    assert _codes(viols) == [S.E9005_CHIP_ORDER]


def test_chip_bc_mismatch_reported_on_trailer():
    viols = _lane_doc(["lane=0,chips=0;1,cbc=7", "lane=1,chips=8;9,cbc=8"])
    assert _codes(viols) == [S.E9003_CHIP_BC_MISMATCH]
    assert viols[0][0] == 4  # the closing trailer


def test_non_participating_text_untouched():
    # free text that happens inside a lane_ids frame is NOT a lane span
    assert _lane_doc(["lane=0,chips=0;1,cbc=7", "plain words here"]) == []


def test_fatal_lane_propagation():
    # frame 1: lane 0's chip stream is undecodable -> E9006 FATAL; the
    # frame still expects 2 lanes (snapshot at open). frame 2 ships only
    # lane 1 and must NOT get E702 (expected drops to 1).
    doc = [
        span("header", "lanes=2,lane_ids=0;1,chips=2", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("text", "lane=0,chips=x;y,cbc=7", off=2),
        span("text", "lane=1,chips=8;9,cbc=7", off=3),
        span("trailer", "done=1", off=4),
        span("header", "lanes=2,lane_ids=0;1,chips=2", off=5),
        span("trig", "cont=0,bc=2", off=6),
        span("text", "lane=1,chips=8;9,cbc=7", off=7),
        span("trailer", "done=1", off=8),
    ]
    viols = validate_spans(doc)
    assert _codes(viols) == [S.E9006_LANE_FATAL]
    assert viols[0][3] == S.SEV_FATAL
    # WITHOUT propagation the second frame would be an E702: prove the
    # counter-factual by sending a non-fatal first frame
    doc_nofatal = [s if s[3] != 2 else span("text", "lane=0,chips=0;1,cbc=7", off=2)
                   for s in doc]
    assert S.E702_LANE_COUNT in _codes(validate_spans(doc_nofatal))


def test_fatal_lane_still_expected_in_its_own_frame():
    # the fatal set is snapshotted at frame open: dropping the fatal
    # lane's span from the SAME frame is still a count violation
    doc = [
        span("header", "lanes=2,lane_ids=0;1,chips=2", off=0),
        span("trig", "cont=0,bc=1", off=1),
        span("text", "lane=1,chips=8;9,cbc=7", off=2),
        span("trailer", "done=1", off=3),
    ]
    assert _codes(validate_spans(doc)) == [S.E702_LANE_COUNT]


# ---------------------------------------------------------------------------
# engine (mapInArrow) twin parity on the new fixture families
# ---------------------------------------------------------------------------


_FAMS = [
    ("bad_trigger_period", FX._PERIOD_CFG, synth.MUT_BAD_PERIOD, 198),
    ("bad_lane_ids", FX._LANE_CFG, synth.MUT_LANE_UNDECLARED, None),
    ("bad_lane_order", FX._LANE_CFG, synth.MUT_LANE_ORDER, None),
    ("bad_chip_count", FX._LANE_CFG, synth.MUT_CHIP_COUNT, None),
    ("bad_chip_order", FX._LANE_CFG, synth.MUT_CHIP_ORDER, None),
    ("bad_chip_bc", FX._LANE_CFG, synth.MUT_CHIP_BC, None),
    ("fatal_lanes", FX._LANE_CFG, synth.MUT_FATAL_LANE, None),
    ("bad_diag_fields", None, synth.MUT_DIAG_RESV, None),
    ("bad_diag_index", None, synth.MUT_DIAG_IDX, None),
    ("ape_warnings", FX._LANE_CFG, synth.MUT_APE_WARNING, None),
    ("ape_fatal", FX._LANE_CFG, synth.MUT_APE_FATAL, None),
]


@pytest.mark.parametrize("name,cfg,mut,tp", _FAMS, ids=[f[0] for f in _FAMS])
def test_engine_matches_oracle_on_lane_families(spark, name, cfg, mut, tp):
    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )

    from fastpasta_spark.sources.synth import CorpusConfig

    cfg = cfg or CorpusConfig()
    n = 60
    df = FX._mutated(spark, mut, n, cfg=cfg)
    viol, _ = split_sequence_output(sequence_pass(df, trigger_period=tp))
    engine = sorted(
        (r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message)
        for r in viol.collect()
    )
    oracle = []
    for i in range(n):
        spans = synth._doc_spans(i, cfg)
        h = synth.splitmix64(cfg.seed * 0xA5A5 + i * 3 + 1)
        spans = synth._mutate([dict(s) for s in spans], mut, h, cfg)
        tuples = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for v in validate_spans(tuples, trigger_period=tp):
            oracle.append((f"doc{i:010d}", *v))
    assert engine == sorted(oracle)
    assert len(engine) >= n  # every doc is mutated -> at least one row each


def test_check_all_trigger_period_end_to_end(spark):
    from fastpasta_spark.plans.check_all import check_all

    docs = FX.bad_trigger_period(spark, 80)
    res = check_all(docs, trigger_period=198)
    codes = {r.check_code for r in res.violations.collect()}
    assert S.E45_TRIGGER_PERIOD in codes
    # same corpus without the config: E45 must NOT fire (opt-in check)
    res_off = check_all(docs)
    codes_off = {r.check_code for r in res_off.violations.collect()}
    assert S.E45_TRIGGER_PERIOD not in codes_off


# ---------------------------------------------------------------------------
# ALPIDE readout-flag census (G5 true form, alpide_stats.rs:55-134)
# ---------------------------------------------------------------------------


def _py_readout_census(rf_values):
    """Independent replay of ReadoutFlags::log (alpide_stats.rs:70-89) —
    written out explicitly so a bug in the shared engine helper cannot
    hide behind a tautological test."""
    c = {k: 0 for k in ("chip_trailers_seen", "busy_violations",
                        "data_overrun", "transmission_in_fatal",
                        "flushed_incomplete", "strobe_extended",
                        "busy_transitions")}
    for rf in rf_values:
        c["chip_trailers_seen"] += 1
        if rf == 0xB8:
            c["busy_violations"] += 1
        elif rf == 0xBC:
            c["data_overrun"] += 1
        elif rf == 0xBE:
            c["transmission_in_fatal"] += 1
        else:
            c["flushed_incomplete"] += (rf & 0b100) == 0b100
            c["strobe_extended"] += (rf & 0b010) == 0b010
            c["busy_transitions"] += (rf & 0b001) == 0b001
    return {k: v for k, v in c.items() if v}


def test_log_readout_flags_truth_table():
    from fastpasta_spark.functions.fsm import log_readout_flags

    cases = [0xB8, 0xBC, 0xBE, 0xB0, 0xB1, 0xB2, 0xB4, 0xB7, 0, 5]
    got = {}
    for rf in cases:
        log_readout_flags(rf, got)
    assert got == _py_readout_census(cases)


def test_alpide_census_engine_matches_generator(spark):
    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df

    cfg = CorpusConfig(n_docs=80, lane_layer=True, readout_flags=True,
                       min_frames=2, min_content=2)
    _, stats = split_sequence_output(sequence_pass(corpus_df(spark, cfg)))
    got = {r.name: r.value for r in stats.collect()
           if r.name.startswith("alpide_")}
    rf_values = []
    for i in range(cfg.n_docs):
        for s in synth._doc_spans(i, cfg):
            if s["text"].startswith("lane=") and ",rf=" in s["text"]:
                fields = dict(p.split("=", 1) for p in s["text"].split(","))
                rf_values.append(int(fields["rf"]))
    exp = {f"alpide_{k}": float(v)
           for k, v in _py_readout_census(rf_values).items()}
    assert got == exp
    assert got["alpide_chip_trailers_seen"] > 0
    # all three exclusive trailer states appear in the fixture corpus
    for name in ("alpide_busy_violations", "alpide_data_overrun",
                 "alpide_transmission_in_fatal"):
        assert got[name] > 0, name


def test_lane_corpora_without_rf_emit_no_census(spark):
    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df

    cfg = CorpusConfig(n_docs=20, lane_layer=True)
    _, stats = split_sequence_output(sequence_pass(corpus_df(spark, cfg)))
    assert not [r.name for r in stats.collect()
                if r.name.startswith("alpide_")]


# ---------------------------------------------------------------------------
# APE severity table (E9007; alpide_word.rs:35-49)
# ---------------------------------------------------------------------------


def _ape_doc(lane_texts, lanes=None):
    n = len(lane_texts)
    ids = ";".join(str(i) for i in range(lanes if lanes is not None else n))
    doc = [span("header", f"lanes={lanes or n},lane_ids={ids},chips=2", off=0),
           span("trig", "cont=0,bc=5", off=1)]
    for i, t in enumerate(lane_texts):
        doc.append(span("text", t, off=i + 2))
    doc.append(span("trailer", "done=1", off=n + 2))
    return doc


def test_ape_warning_reports_but_lane_survives():
    doc = _ape_doc([f"lane=0,chips=0;1,cbc=5,ape={0xF2}",
                     "lane=1,chips=8;9,cbc=5"])
    viols = validate_spans(doc)
    assert [(v[2], v[3]) for v in viols] == [(S.E9007_APE, S.SEV_WARNING)]
    assert "strip_start" in viols[0][4]


def test_ape_ok_padding_is_noop():
    doc = _ape_doc(["lane=0,chips=0;1,cbc=5,ape=0",
                     "lane=1,chips=8;9,cbc=5"])
    assert validate_spans(doc) == []


def test_ape_unknown_byte_warns():
    doc = _ape_doc([f"lane=0,chips=0;1,cbc=5,ape={0xF3}",
                     "lane=1,chips=8;9,cbc=5"])
    viols = validate_spans(doc)
    assert [(v[2], v[3]) for v in viols] == [(S.E9007_APE, S.SEV_WARNING)]
    assert "unknown APE" in viols[0][4]


def test_ape_fatal_propagates_like_e9006():
    # frame 1: lane 0 hit by a fatal APE (frame still expects it —
    # snapshot at open); frame 2 omits lane 0 entirely and must NOT
    # get an E702 because the fatal set shrinks the expectation
    doc = [
        span("header", "lanes=2,lane_ids=0;1,chips=2", off=0),
        span("trig", "cont=0,bc=5", off=1),
        span("text", f"lane=0,chips=0;1,cbc=5,ape={0xF4}", off=2),
        span("text", "lane=1,chips=8;9,cbc=5", off=3),
        span("trailer", "done=1", off=4),
        span("header", "lanes=2,lane_ids=0;1,chips=2", off=5),
        span("trig", "cont=0,bc=9", off=6),
        span("text", "lane=1,chips=8;9,cbc=9", off=7),
        span("trailer", "done=1", off=8),
    ]
    viols = validate_spans(doc)
    assert [(v[2], v[3]) for v in viols] == [(S.E9007_APE, S.SEV_FATAL)]
    assert "detector_timeout" in viols[0][4]
    # chip checks skipped on the dead lane: corrupt its chips too -> same
    doc2 = [dict_span for dict_span in doc]
    doc2[2] = span("text", f"lane=0,chips=junk,ape={0xF4}", off=2)
    assert [(v[2], v[3]) for v in validate_spans(doc2)] == [
        (S.E9007_APE, S.SEV_FATAL)]


def test_ape_census_names():
    from fastpasta_spark.functions.fsm import ape_census_name

    assert ape_census_name(0x00) is None
    assert ape_census_name(0xF2) == "ape_strip_start"
    assert ape_census_name(0xF4) == "ape_detector_timeout"
    assert ape_census_name(0xFC) == "ape_rate_missing_trigger"
    assert ape_census_name(0xF3) == "ape_unknown"
    assert ape_census_name(None) == "ape_unknown"


def test_ape_census_counts_in_stats(spark):
    from fastpasta_spark.operators.sequence import (
        sequence_pass,
        split_sequence_output,
    )

    rows = [("d0", [
        {"kind": "header", "text": "lanes=2,lane_ids=0;1,chips=2",
         "media_ref": "", "offset": 0},
        {"kind": "trig", "text": "cont=0,bc=5", "media_ref": "", "offset": 1},
        {"kind": "text", "text": f"lane=0,chips=0;1,cbc=5,ape={0xF2}",
         "media_ref": "", "offset": 2},
        {"kind": "text", "text": f"lane=1,chips=8;9,cbc=5,ape={0xF4}",
         "media_ref": "", "offset": 3},
        {"kind": "trailer", "text": "done=1", "media_ref": "", "offset": 4},
    ])]
    df = spark.createDataFrame(rows, schema=S.DOCS_SCHEMA)
    _, stats = split_sequence_output(sequence_pass(df))
    got = {r.name: r.value for r in stats.collect()
           if r.name.startswith("alpide_ape")}
    assert got == {"alpide_ape_strip_start": 1.0,
                   "alpide_ape_detector_timeout": 1.0}
