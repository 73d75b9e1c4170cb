"""Stateless per-record predicate battery ("sanity checks").

Analogue of the reference's RDH/status-word sanity validators
(`/root/reference/fastpasta/src/analyze/validators/rdh.rs:130-160`,
`its/status_word/*.rs`, data-word ID ranges `its/data_words.rs:12-48`)
— but expressed as vectorized Column expressions so the whole battery
runs inside whole-stage codegen: each rule builds a violation struct or
NULL per span via ``transform``, nulls are filtered out, and one
``explode`` turns the per-doc violation arrays into rows. No Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark import schema as S

_VIOL_STRUCT = (
    "named_struct("
    "'span_idx', CAST({idx} AS INT), "
    "'offset', CAST({off} AS INT), "
    "'check_code', '{code}', "
    "'severity', '{sev}', "
    "'message', {msg})"
)

_NULL_VIOL = (
    "CAST(NULL AS struct<span_idx:int,offset:int,check_code:string,"
    "severity:string,message:string>)"
)


def _span_rule(cond: str, code: str, msg: str, sev: str = S.SEV_ERROR) -> str:
    """One per-span rule: inside transform(spans, (s, i) -> ...).

    A NULL stored offset reports as -1 — the same normalization as the
    Python twin (fsm.stateless_doc_checks `off = offset or -1` form) and
    the fused Arrow pass; found by the hostile-input fuzz, where a bare
    s.offset emitted NULL and broke three-way row parity."""
    viol = _VIOL_STRUCT.format(idx="i", off="coalesce(s.offset, -1)",
                               code=code, sev=sev, msg=msg)
    return f"IF({cond}, {viol}, {_NULL_VIOL})"


def _doc_rule(cond: str, code: str, msg: str, idx: str = "NULL",
              off: str = "-1", sev: str = S.SEV_ERROR) -> str:
    viol = _VIOL_STRUCT.format(idx=idx, off=off, code=code, sev=sev, msg=msg)
    return f"IF({cond}, {viol}, {_NULL_VIOL})"


def sanity_violations(docs: DataFrame) -> DataFrame:
    """All stateless checks -> violation rows (VIOLATION_SCHEMA).

    Rules (codes in schema.py):
      E10  doc_id null/empty            (rdh.rs header_id checks)
      E12  spans null/empty
      E13  doc_id malformed key
      E11  offsets not exactly 0..n-1   (pages_counter running analogue,
                                         rdh_running.rs:83-121 — here a
                                         pure positional-equality check)
      E70  kind not in alphabet         (data_words.rs:12-48)
      E71  text-kind with empty text
      E72  media-kind with empty media_ref
      E73  non-media span carrying a media_ref
    """
    kinds = ", ".join(f"'{k}'" for k in S.VALID_KINDS)

    span_rules = ", ".join(
        [
            _span_rule(f"s.kind IS NULL OR NOT s.kind IN ({kinds})",
                       S.E70_INVALID_KIND,
                       "concat('invalid span kind: ', coalesce(s.kind, 'NULL'))"),
            _span_rule(f"s.kind = '{S.KIND_TEXT}' AND (s.text IS NULL OR s.text = '')",
                       S.E71_TEXT_EMPTY, "'text span with empty text'"),
            _span_rule(
                f"s.kind = '{S.KIND_MEDIA}' AND (s.media_ref IS NULL OR s.media_ref = '')",
                S.E72_MEDIA_REF_MISSING, "'media span with empty media_ref'"),
            # NULL-safe non-media test: `s.kind <> 'media'` alone is NULL
            # (not TRUE) for a NULL kind, silently skipping E73 where the
            # Python twin and the fused pass both emit it (fuzz-found)
            _span_rule(
                f"(s.kind IS NULL OR s.kind <> '{S.KIND_MEDIA}') "
                "AND s.media_ref IS NOT NULL AND s.media_ref <> ''",
                S.E73_UNEXPECTED_REF,
                "concat('non-media span carries media_ref ', s.media_ref)"),
            # padding gate (C7): flush padding must be pure — a pad span
            # carrying text is corrupt padding (ref case is E73 above)
            _span_rule(
                f"s.kind = '{S.KIND_PAD}' AND s.text IS NOT NULL AND s.text <> ''",
                S.E74_PAD_NOT_EMPTY, "'pad span with non-empty text'"),
        ]
    )

    # first index where offset != position (NULL if the sequence is exact)
    first_bad = (
        "get(filter(transform(spans, (s, i) -> "
        "IF(s.offset IS NULL OR s.offset <> i, i, -1)), v -> v >= 0), 0)"
    )

    doc_rules = ", ".join(
        [
            _doc_rule("doc_id IS NULL OR doc_id = ''", S.E10_DOC_ID_NULL,
                      "'doc_id is null or empty'"),
            _doc_rule("spans IS NULL OR size(spans) = 0", S.E12_SPANS_NULL,
                      "'spans array is null or empty'"),
            # \\A..\\z strict anchors: Java $ matches before a trailing
            # newline; the fused Arrow pass (RE2) does not — keep them equal
            _doc_rule("doc_id IS NOT NULL AND doc_id <> '' "
                      "AND NOT doc_id RLIKE '\\\\A[A-Za-z0-9_-]+\\\\z'",
                      S.E13_DOC_ID_FORMAT,
                      "concat('malformed doc_id: ', doc_id)"),
            _doc_rule(
                f"spans IS NOT NULL AND size(spans) > 0 AND {first_bad} IS NOT NULL",
                S.E11_OFFSET_SEQUENCE,
                f"concat('offset sequence broken at span ', CAST({first_bad} AS STRING))",
                idx=first_bad,
                off=f"coalesce(spans[{first_bad}].offset, -1)",
            ),
        ]
    )

    # doc_rules/span_rules are comma-joined lists — they land inside
    # array(...) below, giving one candidate violation per rule; NULLs
    # (rule passed) are filtered before the explode.
    viols = F.expr(
        "filter(concat(array({doc}), coalesce(flatten(transform(spans, (s, i) -> "
        "array({span}))), array())), v -> v IS NOT NULL)".format(
            doc=doc_rules, span=span_rules
        )
    )

    return (
        docs.select(F.col("doc_id"), F.explode(viols).alias("v"))
        .select(
            "doc_id",
            F.col("v.span_idx").alias("span_idx"),
            F.col("v.offset").alias("offset"),
            F.col("v.check_code").alias("check_code"),
            F.col("v.severity").alias("severity"),
            F.col("v.message").alias("message"),
        )
    )
