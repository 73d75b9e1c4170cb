"""The span-sequence grammar: a deterministic FSM over one document.

This is the semantic core of the engine — the analogue of the reference's
ITS payload FSM (`/root/reference/fastpasta/src/analyze/validators/its/
its_payload_fsm_cont.rs:24-81`, 9 states / 8 events with best-guess
recovery on ambiguous words :111-298) plus the TDH/TDT running checks
(`status_word/tdh.rs:115-206`, `cdp_running.rs:317-456`).

Grammar over the span-kind alphabet (FIXTURES.md):

    doc   := frame+ diag?
    frame := header trig content* trailer
           | trig(cont=1) content* trailer      -- continuation frame
    content := calib* (text | media)*           -- calib only at frame start

Running rules:
  * trig.cont=1 is legal only when the previous trailer had done=0 (E41)
  * trig.bc is non-decreasing across trigs within a doc (E440)
  * opt-in page counter (R1/R3 true form, rdh_running.rs pages-counter +
    same-fields analogues): a header carrying ``page=N`` must have N = 0
    for the doc's first counted header and previous+1 after -> E31; when
    N > 0 its ``lanes=`` declaration must equal the previous header's
    -> E32
  * opt-in orbit counter (R2, orbit-change-after-stop): a trig carrying
    ``orbit=O`` may never decrease O, and may increase it only when the
    previous trailer had done=1 (stop) -> E441
  * with a user-configured ``trigger_period``: between consecutive trigs
    carrying int=1 (internal trigger), (bc_cur - bc_prev) mod 3564 must
    equal the period -> E45 (tdh.rs:60-109 via cdp_running.rs:400-427)
  * a trailer closing a frame with zero content spans -> E701
  * header lanes=N declares the frame's expected content-span count
    (excluding calib); a closing trailer with a different count -> E702
    (nested-group cardinality, A1 analogue: the reference's expected
    lanes-per-frame check, alpide_readout_frame.rs:53-130)
  * the same media_ref appearing twice within one frame -> E703
    (nested-group uniqueness, A6 analogue: chip-ID order/uniqueness,
    lane_alpide_frame_analyzer.rs:288-320)
  * a trailer with no open frame -> E992; doc ending inside a frame -> E991
  * any span after diag -> E60
  * calib after content within a frame -> E81
  * padding gate (C7, flush-padding sanity analogue): ``pad`` spans are
    legal only as a trailing run outside any open frame (incl. after
    diag); a mid-frame pad -> E82 (without poisoning the rest), any
    non-pad span after legal padding began -> E82, a pad carrying text
    -> E74 (stateless battery)

Lane-identity + chip layer (the third nesting level; opt-in per span —
a content span participates iff its text starts with ``lane=``):
  * header may declare the lane SET via ``lane_ids=a;b;c`` (and expected
    chips per lane via ``chips=M``); a participating span whose lane is
    not in the set -> E704 (membership, util.rs:184-189, ib.rs:14-22)
  * participating lanes must appear in non-decreasing order within a
    frame -> E705 (legal-grouping analogue, alpide_readout_frame.rs:94-130)
  * a participating span may carry a chip sub-stream ``chips=c0;c1;...``
    plus a chip bunch counter ``cbc=B`` (lane_alpide_frame_analyzer.rs:
    91-177 decode analogue):
      - chip count != declared chips=M -> E9004
      - else chip ids not strictly increasing -> E9005 (order checked
        only when the count is valid, mirroring the reference :191-205)
      - cbc values must agree across all lanes of one frame; the
        mismatch is reported on the closing trailer -> E9003
      - an undecodable chip stream (non-integer id) -> E9006 with
        severity FATAL; the lane joins the doc's running fatal set and
        is excluded from expected-lane accounting for all LATER frames
        (readout_frame.rs:40-50: expected count drops per fatal lane).
        The frame where the lane went fatal still expects it (the fatal
        set is snapshotted at frame open).

The function below is PURE PYTHON over plain lists — it is the single
source of truth used BOTH by the vectorized engine pass
(operators/sequence.py, via Arrow batches) and by the pytest oracle
(tests compare engine output row-for-row against this).

Violations are (span_idx, offset, code, severity, message) tuples; the
per-document restart makes the whole check embarrassingly parallel,
exactly like the reference re-initializing its tracker per RDH
(cdp_running.rs:87-104).
"""

from __future__ import annotations

import re

from fastpasta_spark import schema as S

# \A..\Z (not ^..$): Python's $ matches before a trailing newline, RE2's
# (Arrow twin in operators/sequence.py) does not — strict anchors keep the
# three implementations (here, Arrow, Java RLIKE) byte-identical
_DOC_ID_RE = re.compile(r"\A[A-Za-z0-9_-]+\Z")

# FSM states
START = 0        # before any span
AWAIT_TRIG = 1   # header seen, frame not yet triggered
CONTENT = 2      # inside a frame, accepting content
CLOSED = 3       # frame closed by trailer; between frames
DONE = 4         # diag seen; doc must end


def parse_kv(text: str) -> dict[str, str]:
    """Parse 'k1=v1,k2=v2' span payloads. Malformed pairs are dropped."""
    out: dict[str, str] = {}
    if not text:
        return out
    for part in text.split(","):
        k, sep, v = part.partition("=")
        if sep:
            out[k.strip()] = v.strip()
    return out


def _int_field(fields: dict[str, str], key: str) -> int | None:
    v = fields.get(key)
    if v is None:
        return None
    try:
        return int(v)
    except ValueError:
        return None


def _int_list_field(fields: dict[str, str], key: str) -> list[int] | None:
    """Parse a ';'-separated int list value ('0;1;2'). None if the key is
    absent OR any element fails to parse (undecodable list)."""
    v = fields.get(key)
    if v is None:
        return None
    out: list[int] = []
    for part in v.split(";"):
        try:
            out.append(int(part))
        except ValueError:
            return None
    return out


# bc counters wrap at this modulus (Tdh::MAX_BC + 1 analogue)
BC_MODULUS = 3564


def stateless_doc_checks(
    doc_id: str | None, spans: list[tuple[str, str, str, int]] | None,
    valid_media_ids: frozenset | set | None = None,
) -> list[tuple[int | None, int, str, str, str]]:
    """Doc-level + per-span stateless sanity — the pure-Python twin of the
    Column-expression battery in operators/sanity.py (tests assert the two
    paths agree). Used by the fused single-scan pass in plans/check_all.py.

    valid_media_ids (optional) enables the E110 referential check: a
    media span whose non-empty ref is not in the set dangles. The fused
    pass mirrors this vectorized (operators/sequence.py) against a
    broadcast of the media dim's ids — change them TOGETHER.
    """
    viol: list[tuple[int | None, int, str, str, str]] = []
    if doc_id is None or doc_id == "":
        viol.append((None, -1, S.E10_DOC_ID_NULL, S.SEV_ERROR,
                     "doc_id is null or empty"))
    elif not _DOC_ID_RE.match(doc_id):
        viol.append((None, -1, S.E13_DOC_ID_FORMAT, S.SEV_ERROR,
                     f"malformed doc_id: {doc_id}"))
    if spans is None or len(spans) == 0:
        viol.append((None, -1, S.E12_SPANS_NULL, S.SEV_ERROR,
                     "spans array is null or empty"))
        return viol
    for i, (kind, text, ref, offset) in enumerate(spans):
        if offset is None or offset != i:
            viol.append((i, -1 if offset is None else offset,
                         S.E11_OFFSET_SEQUENCE, S.SEV_ERROR,
                         f"offset sequence broken at span {i}"))
            break
    for i, (kind, text, ref, offset) in enumerate(spans):
        off = offset if offset is not None else -1
        if kind is None or kind not in S.VALID_KINDS:
            viol.append((i, off, S.E70_INVALID_KIND, S.SEV_ERROR,
                         f"invalid span kind: {kind if kind is not None else 'NULL'}"))
        if kind == S.KIND_TEXT and (text is None or text == ""):
            viol.append((i, off, S.E71_TEXT_EMPTY, S.SEV_ERROR,
                         "text span with empty text"))
        if kind == S.KIND_MEDIA and (ref is None or ref == ""):
            viol.append((i, off, S.E72_MEDIA_REF_MISSING, S.SEV_ERROR,
                         "media span with empty media_ref"))
        elif (kind == S.KIND_MEDIA and valid_media_ids is not None
              and ref not in valid_media_ids):
            viol.append((i, off, S.E110_DANGLING_REF, S.SEV_ERROR,
                         f"media_ref not found in media table: {ref}"))
        if kind != S.KIND_MEDIA and ref is not None and ref != "":
            viol.append((i, off, S.E73_UNEXPECTED_REF, S.SEV_ERROR,
                         f"non-media span carries media_ref {ref}"))
        if kind == S.KIND_PAD and text is not None and text != "":
            viol.append((i, off, S.E74_PAD_NOT_EMPTY, S.SEV_ERROR,
                         "pad span with non-empty text"))
    return viol


def validate_spans(
    spans: list[tuple[str, str, str, int]],
    trigger_period: int | None = None,
    chips_per_lane: int | None = None,
    legal_chip_orderings: list[list[int]] | None = None,
) -> list[tuple[int, int, str, str, str]]:
    """Run the grammar FSM over one document's spans.

    ``spans`` is the list of (kind, text, media_ref, offset), already in
    stored order (callers sort by offset first when offsets are sane).
    ``trigger_period`` enables the E45 check (user-configurable, like the
    reference's --its-trigger-period; off by default).
    ``chips_per_lane`` / ``legal_chip_orderings`` are user-config
    OVERRIDES for the chip layer (the reference's custom TOML checks,
    custom_checks_cfg.rs:7-28: chip_count_ob + chip_orderings_ob):
    chips_per_lane replaces the header-derived ``chips=`` expectation
    (E9004); legal_chip_orderings replaces the default strictly-
    increasing legality with an explicit list of legal chip-id
    sequences (E9005).
    Returns violations as (span_idx, offset, code, severity, message).
    Stateless per-span sanity (E70/E71/E72/E73) is NOT done here — that
    battery is vectorized Column expressions (operators/sanity.py).
    """
    viol: list[tuple[int, int, str, str, str]] = []
    state = START
    prev_trailer_done: int | None = None
    prev_bc: int | None = None
    prev_int_bc: int | None = None        # last bc of an int=1 trig (E45)
    prev_page: int | None = None          # last header page= (E31/E32)
    prev_page_lanes: int | None = None    # lanes= of that header (E32)
    prev_orbit: int | None = None         # last trig orbit= (E441)
    content_in_frame = 0
    noncalib_in_frame = 0
    declared_lanes: int | None = None
    declared_lane_ids: list[int] | None = None
    declared_chips: int | None = None
    fatal_lanes: set[int] = set()         # running, doc-scope (A8)
    frame_fatal_snapshot: set[int] = set()  # fatal set at frame open (E702)
    prev_lane: int | None = None
    frame_cbcs: set[int] = set()
    frame_refs: set[str] = set()

    def emit(i: int, off: int, code: str, msg: str, sev: str = S.SEV_ERROR) -> None:
        viol.append((i, off, code, sev, msg))

    def reset_frame() -> None:
        nonlocal content_in_frame, noncalib_in_frame, frame_refs
        nonlocal prev_lane, frame_cbcs, frame_fatal_snapshot
        content_in_frame = 0
        noncalib_in_frame = 0
        frame_refs = set()
        prev_lane = None
        frame_cbcs = set()
        frame_fatal_snapshot = set(fatal_lanes)

    padding_started = False
    for i, (kind, text, media_ref, offset) in enumerate(spans):
        off = offset if offset is not None else -1
        # padding gate (C7): pad spans are legal only as a trailing run
        # outside any open frame (incl. after diag); anything after a
        # legally-placed pad is corrupt. An ILLEGAL (mid-frame) pad is
        # flagged itself but does not poison the rest of the doc.
        if kind == S.KIND_PAD:
            if state in (AWAIT_TRIG, CONTENT):
                emit(i, off, S.E82_PAD_POSITION, "pad span inside an open frame")
            else:
                padding_started = True
            continue
        if padding_started:
            emit(i, off, S.E82_PAD_POSITION,
                 f"{kind} span after padding began")
        if state == DONE:
            emit(i, off, S.E60_DIAG_SANITY, f"span kind={kind} after diag footer")
            continue

        if kind == S.KIND_HEADER:
            fields = parse_kv(text or "")
            declared_lanes = _int_field(fields, "lanes")
            declared_lane_ids = _int_list_field(fields, "lane_ids")
            declared_chips = _int_field(fields, "chips")
            if declared_lanes is None:
                emit(i, off, S.E30_HEADER_SANITY, "header missing integer lanes= field")
            page = _int_field(fields, "page")
            if page is not None:
                expected_page = 0 if prev_page is None else prev_page + 1
                if page != expected_page:
                    emit(i, off, S.E31_PAGE_COUNTER,
                         f"header page {page} != expected {expected_page}")
                if (page > 0 and prev_page_lanes is not None
                        and declared_lanes is not None
                        and declared_lanes != prev_page_lanes):
                    emit(i, off, S.E32_PAGE_FIELDS,
                         f"header lanes changed {prev_page_lanes} -> "
                         f"{declared_lanes} at page {page}")
                prev_page = page
                prev_page_lanes = declared_lanes
            if state in (START, CLOSED):
                state = AWAIT_TRIG
            else:
                # double header / header inside frame; best-guess: reopen
                emit(i, off, S.E990_FSM_UNEXPECTED, f"header not legal in state {state}")
                state = AWAIT_TRIG
            reset_frame()

        elif kind == S.KIND_TRIG:
            fields = parse_kv(text or "")
            cont = _int_field(fields, "cont")
            bc = _int_field(fields, "bc")
            if cont is None or bc is None or cont not in (0, 1):
                emit(i, off, S.E40_TRIG_SANITY, "trig missing cont=/bc= integer fields")
            if bc is not None:
                if prev_bc is not None and bc < prev_bc:
                    emit(i, off, S.E440_BC_NOT_MONOTONE,
                         f"trig bc {bc} decreased vs previous {prev_bc}")
                prev_bc = bc
            if (trigger_period is not None and bc is not None
                    and _int_field(fields, "int") == 1):
                # E45: period between consecutive internal triggers
                # (tdh.rs:60-109; mod-3564 wraparound like Tdh::MAX_BC)
                if prev_int_bc is not None:
                    detected = (bc - prev_int_bc) % BC_MODULUS
                    if detected != trigger_period:
                        emit(i, off, S.E45_TRIGGER_PERIOD,
                             f"trigger period {detected} != specified "
                             f"{trigger_period} (prev bc {prev_int_bc}, bc {bc})")
                prev_int_bc = bc
            orbit = _int_field(fields, "orbit")
            if orbit is not None:
                if prev_orbit is not None:
                    if orbit < prev_orbit:
                        emit(i, off, S.E441_ORBIT_NO_STOP,
                             f"orbit {orbit} decreased vs previous {prev_orbit}")
                    elif orbit > prev_orbit and prev_trailer_done != 1:
                        # != 1, not == 0: an orbit advance with NO trailer
                        # seen yet (None) is also a change without a stop
                        emit(i, off, S.E441_ORBIT_NO_STOP,
                             f"orbit changed {prev_orbit} -> {orbit} "
                             "without a stop (previous trailer done!=1)")
                prev_orbit = orbit
            if state == AWAIT_TRIG:
                if cont == 1:
                    emit(i, off, S.E41_CONTINUATION,
                         "trig cont=1 directly after header (new frame)")
            elif state == CLOSED:
                # continuation frame without a new header
                if cont == 1:
                    if prev_trailer_done != 0:
                        emit(i, off, S.E41_CONTINUATION,
                             "trig cont=1 but previous trailer had done=1")
                else:
                    emit(i, off, S.E990_FSM_UNEXPECTED,
                         "trig cont=0 without a new header after closed frame")
            else:
                emit(i, off, S.E990_FSM_UNEXPECTED, f"trig not legal in state {state}")
            state = CONTENT
            reset_frame()

        elif kind in (S.KIND_TEXT, S.KIND_MEDIA):
            if state != CONTENT:
                emit(i, off, S.E990_FSM_UNEXPECTED,
                     f"{kind} span outside an open frame (state {state})")
                state = CONTENT  # best-guess recovery: assume frame open
            if kind == S.KIND_MEDIA and media_ref:
                if media_ref in frame_refs:
                    emit(i, off, S.E703_DUP_REF_IN_FRAME,
                         f"media_ref {media_ref} repeated within frame")
                frame_refs.add(media_ref)
            if text and text.startswith("lane="):
                box = [prev_lane]
                _lane_span_checks(parse_kv(text), i, off, emit, fatal_lanes,
                                  declared_lane_ids,
                                  chips_per_lane if chips_per_lane is not None
                                  else declared_chips,
                                  frame_cbcs, box,
                                  legal_orderings=legal_chip_orderings)
                prev_lane = box[0]
            content_in_frame += 1
            noncalib_in_frame += 1

        elif kind == S.KIND_CALIB:
            if state != CONTENT:
                emit(i, off, S.E990_FSM_UNEXPECTED,
                     f"calib span outside an open frame (state {state})")
                state = CONTENT
            elif noncalib_in_frame > 0:
                emit(i, off, S.E81_CALIB_POSITION,
                     "calib span after content; only valid at frame start")
            content_in_frame += 1

        elif kind == S.KIND_TRAILER:
            fields = parse_kv(text or "")
            done = _int_field(fields, "done")
            if done is None or done not in (0, 1):
                emit(i, off, S.E50_TRAILER_SANITY, "trailer missing done=0|1 field")
                done = 1
            if state == CONTENT:
                expected = _expected_lanes(
                    declared_lanes, declared_lane_ids, frame_fatal_snapshot)
                if noncalib_in_frame == 0:
                    emit(i, off, S.E701_EMPTY_FRAME,
                         "trailer closed a frame with no content spans")
                elif expected is not None and noncalib_in_frame != expected:
                    emit(i, off, S.E702_LANE_COUNT,
                         f"frame content count {noncalib_in_frame} != "
                         f"declared lanes {expected}")
                if len(frame_cbcs) > 1:
                    emit(i, off, S.E9003_CHIP_BC_MISMATCH,
                         f"chip bc mismatch across lanes: {sorted(frame_cbcs)}")
                state = CLOSED
            else:
                emit(i, off, S.E992_FSM_ORPHAN_CLOSE,
                     f"trailer with no open frame (state {state})")
                state = CLOSED
            prev_trailer_done = done

        elif kind == S.KIND_DIAG:
            _diag_field_checks(parse_kv(text or ""), i, off, emit)
            if state not in (CLOSED, START):
                emit(i, off, S.E990_FSM_UNEXPECTED,
                     f"diag footer while frame open (state {state})")
            state = DONE

        else:
            # invalid kind: stateless battery reports E70; the FSM skips it
            continue

    if state in (AWAIT_TRIG, CONTENT):
        last_idx = len(spans) - 1
        last_off = spans[last_idx][3] if spans else -1
        viol.append((last_idx, last_off if last_off is not None else -1,
                     S.E991_FSM_UNCLOSED, S.SEV_ERROR,
                     "document ended with an open frame"))
    return viol


def _expected_lanes(
    declared_lanes: int | None,
    declared_lane_ids: list[int] | None,
    fatal_snapshot: set[int],
) -> int | None:
    """Expected content-span count for a closing frame: the declared lane
    set minus lanes already FATAL when the frame opened
    (readout_frame.rs:64-77: `expect_lane_count -= fatal_lanes.len()`)."""
    if declared_lane_ids is not None:
        return len([lid for lid in declared_lane_ids if lid not in fatal_snapshot])
    if declared_lanes is not None and fatal_snapshot:
        return max(declared_lanes - len(fatal_snapshot), 0)
    return declared_lanes


# ---------------------------------------------------------------------------
# ALPIDE readout-flag census (G5 true form) — not a violation check but a
# per-run flag census, merged by SUM like the reference's AlpideStats
# (stats_collector/its_stats/alpide_stats.rs:55-134). A participating
# lane span may carry ``rf=<chip trailer byte>``; decode follows
# ReadoutFlags::log exactly: three exclusive full-trailer states, any
# OTHER value contributes its low bit flags individually.
# ---------------------------------------------------------------------------

ALPIDE_FLAG_NAMES = (
    "chip_trailers_seen",
    "busy_violations",
    "data_overrun",
    "transmission_in_fatal",
    "flushed_incomplete",
    "strobe_extended",
    "busy_transitions",
)

_RF_BUSY_VIOLATION = 0xB8        # 4'b1000 (alpide_word.rs trailer values)
_RF_DATA_OVERRUN = 0xBC          # 4'b1100
_RF_TRANSMISSION_IN_FATAL = 0xBE  # 4'b1110

# APE (ALPIDE Protocol Extension) severity table — alpide_word.rs:35-49.
# 0x00 (padding) is lane-status OK and a no-op; WARNING APEs report
# only; every other TABLE byte is FATAL (lane joins the running fatal
# set, lane_alpide_frame_analyzer.rs:166-170); unknown bytes WARN
# ("Unknown ALPIDE word", :174-176).
APE_OK = 0x00
APE_WARNING = {
    0xF2: "strip_start",
    0xFD: "pe_data_missing",
    0xFE: "oot_data_missing",
}
APE_FATAL = {
    0xF4: "detector_timeout",
    0xF5: "out_of_table",
    0xF6: "protocol_error",
    0xF7: "lane_fifo_overflow",
    0xF8: "fsm_error",
    0xF9: "pending_detector_event_limit",
    0xFA: "pending_lane_event_limit",
    0xFB: "o2n_error",
    0xFC: "rate_missing_trigger",
}


def log_readout_flags(rf: int, counters: dict[str, int]) -> None:
    """ReadoutFlags::log twin (alpide_stats.rs:70-89). Mutates
    ``counters`` in place; callers merge partials by sum."""
    counters["chip_trailers_seen"] = counters.get("chip_trailers_seen", 0) + 1
    if rf == _RF_BUSY_VIOLATION:
        counters["busy_violations"] = counters.get("busy_violations", 0) + 1
    elif rf == _RF_DATA_OVERRUN:
        counters["data_overrun"] = counters.get("data_overrun", 0) + 1
    elif rf == _RF_TRANSMISSION_IN_FATAL:
        counters["transmission_in_fatal"] = (
            counters.get("transmission_in_fatal", 0) + 1)
    else:
        if rf & 0b100:
            counters["flushed_incomplete"] = (
                counters.get("flushed_incomplete", 0) + 1)
        if rf & 0b010:
            counters["strobe_extended"] = counters.get("strobe_extended", 0) + 1
        if rf & 0b001:
            counters["busy_transitions"] = (
                counters.get("busy_transitions", 0) + 1)


def ape_census_name(ape: int | None) -> str | None:
    """Census bucket for an ``ape=`` value (None = unparseable byte).
    Padding (0x00, lane status OK) is not counted; unknown bytes land
    in ``ape_unknown`` (the reference log-warns on them)."""
    if ape == APE_OK:
        return None
    if ape in APE_WARNING:
        return f"ape_{APE_WARNING[ape]}"
    if ape in APE_FATAL:
        return f"ape_{APE_FATAL[ape]}"
    return "ape_unknown"


def _diag_field_checks(fields: dict[str, str], i: int, off: int, emit) -> None:
    """Diag (DDW0 analogue) checked-field sanity — C5 true form
    (ddw.rs:9-46; checks_list.md:94-97: reserved == 0, index >= 1).
    Opt-in per key so field-less footers ('ok') stay no-ops; a
    non-integer value fails the same check (undecodable field).
    Shared by both FSM implementations so message formats cannot drift."""
    if "resv" in fields:
        resv = _int_field(fields, "resv")
        if resv is None or resv != 0:
            emit(i, off, S.E61_DIAG_FIELDS,
                 f"diag resv={fields['resv']} must be 0")
    if "idx" in fields:
        idx = _int_field(fields, "idx")
        if idx is None or idx < 1:
            emit(i, off, S.E61_DIAG_FIELDS,
                 f"diag idx={fields['idx']} must be an integer >= 1")


def _lane_span_checks(
    fields: dict[str, str],
    i: int,
    off: int,
    emit,
    fatal_lanes: set[int],
    declared_lane_ids: list[int] | None,
    declared_chips: int | None,
    frame_cbcs: set[int],
    prev_lane_box: list,
    legal_orderings: list[list[int]] | None = None,
) -> None:
    """Lane-identity + chip-layer checks for ONE participating content span
    (text starts with 'lane='). Mutates fatal_lanes / frame_cbcs /
    prev_lane_box in place. Shared by both FSM implementations so the
    message formats cannot drift. ``legal_orderings``, when configured,
    REPLACES the default strictly-increasing chip-id legality with an
    explicit list of legal sequences (the reference's configurable OB
    chip orderings, custom_checks_cfg.rs:7-28 via
    lane_alpide_frame_analyzer.rs:288-320)."""
    lane = _int_field(fields, "lane")
    if lane is None:
        return
    if lane in fatal_lanes:
        return  # FATAL lane: excluded from all expectations (A8)
    if declared_lane_ids is not None and lane not in declared_lane_ids:
        emit(i, off, S.E704_LANE_NOT_DECLARED,
             f"lane {lane} not in declared lane set {declared_lane_ids}")
    if prev_lane_box[0] is not None and lane < prev_lane_box[0]:
        emit(i, off, S.E705_LANE_ORDER,
             f"lane {lane} out of order after lane {prev_lane_box[0]}")
    prev_lane_box[0] = lane
    if "ape" in fields:
        ape = _int_field(fields, "ape")
        if ape is None or not (ape == APE_OK or ape in APE_WARNING
                               or ape in APE_FATAL):
            emit(i, off, S.E9007_APE,
                 f"unknown APE byte {fields['ape']} on lane {lane}",
                 S.SEV_WARNING)
        elif ape in APE_WARNING:
            emit(i, off, S.E9007_APE,
                 f"APE {APE_WARNING[ape]} on lane {lane}", S.SEV_WARNING)
        elif ape in APE_FATAL:
            emit(i, off, S.E9007_APE,
                 f"APE {APE_FATAL[ape]} on lane {lane}; lane status FATAL",
                 S.SEV_FATAL)
            fatal_lanes.add(lane)
            return  # dead lane: no chip checks, excluded from later frames
        # APE_OK (padding, 0x00): lane status OK — fall through
    if "chips" in fields:
        chips = _int_list_field(fields, "chips")
        if chips is None:
            emit(i, off, S.E9006_LANE_FATAL,
                 f"undecodable chip stream on lane {lane}; lane excluded "
                 "for the rest of the doc", S.SEV_FATAL)
            fatal_lanes.add(lane)
            return
        cbc = _int_field(fields, "cbc")
        if cbc is not None:
            frame_cbcs.add(cbc)
        if declared_chips is not None and len(chips) != declared_chips:
            emit(i, off, S.E9004_CHIP_COUNT,
                 f"chip count {len(chips)} != declared {declared_chips}")
        elif legal_orderings is not None:
            if chips not in legal_orderings:
                emit(i, off, S.E9005_CHIP_ORDER,
                     f"chip ids {chips} not in configured legal orderings")
        elif any(chips[j] >= chips[j + 1] for j in range(len(chips) - 1)):
            emit(i, off, S.E9005_CHIP_ORDER,
                 f"chip ids not strictly increasing: {chips}")
