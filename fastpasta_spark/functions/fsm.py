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
        if "=" in part:
            k, _, v = part.partition("=")
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


def stateless_doc_checks(
    doc_id: str | None, spans: list[tuple[str, str, str, int]] | None
) -> list[tuple[int | None, int, str, str, str]]:
    """Doc-level + per-span stateless sanity — the pure-Python twin of the
    Column-expression battery in operators/sanity.py (tests assert the two
    paths agree). Used by the fused single-scan pass in plans/check_all.py.
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
        if kind != S.KIND_MEDIA and ref is not None and ref != "":
            viol.append((i, off, S.E73_UNEXPECTED_REF, S.SEV_ERROR,
                         f"non-media span carries media_ref {ref}"))
    return viol


def validate_spans(spans: list[tuple[str, str, str, int]]) -> list[tuple[int, int, str, str, str]]:
    """Run the grammar FSM over one document's spans.

    ``spans`` is the list of (kind, text, media_ref, offset), already in
    stored order (callers sort by offset first when offsets are sane).
    Returns violations as (span_idx, offset, code, severity, message).
    Stateless per-span sanity (E70/E71/E72/E73) is NOT done here — that
    battery is vectorized Column expressions (operators/sanity.py).
    """
    viol: list[tuple[int, int, str, str, str]] = []
    state = START
    prev_trailer_done: int | None = None
    prev_bc: int | None = None
    content_in_frame = 0
    noncalib_in_frame = 0
    declared_lanes: int | None = None
    frame_refs: set[str] = set()

    def emit(i: int, off: int, code: str, msg: str, sev: str = S.SEV_ERROR) -> None:
        viol.append((i, off, code, sev, msg))

    for i, (kind, text, media_ref, offset) in enumerate(spans):
        off = offset if offset is not None else -1
        if state == DONE:
            emit(i, off, S.E60_DIAG_SANITY, f"span kind={kind} after diag footer")
            continue

        if kind == S.KIND_HEADER:
            fields = parse_kv(text or "")
            declared_lanes = _int_field(fields, "lanes")
            if declared_lanes is None:
                emit(i, off, S.E30_HEADER_SANITY, "header missing integer lanes= field")
            if state in (START, CLOSED):
                state = AWAIT_TRIG
            else:
                # double header / header inside frame; best-guess: reopen
                emit(i, off, S.E990_FSM_UNEXPECTED, f"header not legal in state {state}")
                state = AWAIT_TRIG
            content_in_frame = 0
            noncalib_in_frame = 0
            frame_refs = set()

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
            content_in_frame = 0
            noncalib_in_frame = 0
            frame_refs = set()

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
                if noncalib_in_frame == 0:
                    emit(i, off, S.E701_EMPTY_FRAME,
                         "trailer closed a frame with no content spans")
                elif declared_lanes is not None and noncalib_in_frame != declared_lanes:
                    emit(i, off, S.E702_LANE_COUNT,
                         f"frame content count {noncalib_in_frame} != "
                         f"declared lanes {declared_lanes}")
                state = CLOSED
            else:
                emit(i, off, S.E992_FSM_ORPHAN_CLOSE,
                     f"trailer with no open frame (state {state})")
                state = CLOSED
            prev_trailer_done = done

        elif kind == S.KIND_DIAG:
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
