"""Human-facing read-only views (reference `view rdh` / `view
its-readout-frames`, `/root/reference/fastpasta/src/analyze/view/
rdh_view.rs`, `its_readout_frame.rs:89-126`, trigger describe
`view/lib.rs:59-77`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark import schema as S


def view_docs(docs: DataFrame) -> DataFrame:
    """One formatted row per document (W1 analogue of `view rdh`)."""
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.expr(
            f"size(filter(spans, s -> s.kind = '{S.KIND_HEADER}'))"
        ).alias("n_frames"),
        F.expr(
            f"size(filter(spans, s -> s.kind = '{S.KIND_TEXT}'))"
        ).alias("n_text"),
        F.expr(
            f"size(filter(spans, s -> s.kind = '{S.KIND_MEDIA}'))"
        ).alias("n_media"),
        F.expr(
            "aggregate(spans, 0L, (acc, s) -> acc + length(coalesce(s.text, '')))"
        ).alias("payload_chars"),
    ).orderBy("doc_id")


#: Default cap on view_frames output rows. The reference streams every
#: word to a terminal (view/lib.rs:11-24) — a human-facing artifact — so
#: an unbounded global sort over a full corpus is never the right plan at
#: scale. With a limit the sort compiles to TakeOrderedAndProject
#: (per-partition top-K + driver merge, no range shuffle); pass
#: ``limit=None`` explicitly to get the full ordered dump.
VIEW_FRAMES_DEFAULT_LIMIT = 100_000

#: sentinel distinguishing "caller passed no limit" from an explicit
#: limit=100_000 — the implicit default triggers a one-time warning
#: (round-5 advice: callers that relied on the old unbounded dump must
#: hear about the silent cap once, same precedent as jaccard_pairs'
#: implicit max_df warning)
_IMPLICIT = object()
_WARNED_DEFAULT_LIMIT = False


def view_frames(docs: DataFrame, limit=_IMPLICIT,
                doc_ids: list[str] | None = None) -> DataFrame:
    """One row per span with doc position + kind decode (W2 analogue).

    ``doc_ids`` filters to the named documents BEFORE the explode (filter
    pushes to the parquet scan); ``limit`` bounds the ordered output so
    the sort is a top-K, not a full-corpus range shuffle. Defaults to
    VIEW_FRAMES_DEFAULT_LIMIT with a one-time warning; pass an explicit
    int or ``limit=None`` (full ordered dump) to silence it.
    """
    if limit is _IMPLICIT:
        limit = VIEW_FRAMES_DEFAULT_LIMIT
        global _WARNED_DEFAULT_LIMIT
        if not _WARNED_DEFAULT_LIMIT:
            _WARNED_DEFAULT_LIMIT = True
            import warnings

            warnings.warn(
                f"view_frames caps output at {VIEW_FRAMES_DEFAULT_LIMIT} "
                "rows by default; pass limit=None for the full ordered "
                "dump or an explicit limit to silence this warning",
                stacklevel=2)
    describe = (
        f"CASE s.kind WHEN '{S.KIND_HEADER}' THEN 'frame header' "
        f"WHEN '{S.KIND_TRIG}' THEN concat('trigger ', s.text) "
        f"WHEN '{S.KIND_TRAILER}' THEN concat('frame trailer ', s.text) "
        f"WHEN '{S.KIND_DIAG}' THEN 'doc footer' "
        f"WHEN '{S.KIND_CALIB}' THEN 'calibration' "
        f"WHEN '{S.KIND_MEDIA}' THEN concat('media -> ', s.media_ref) "
        "ELSE concat('content(', CAST(length(coalesce(s.text, '')) AS STRING), ' chars)') END"
    )
    if doc_ids is not None:
        docs = docs.filter(F.col("doc_id").isin(list(doc_ids)))
    out = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
            F.expr(describe).alias("describe"),
        )
        .orderBy("doc_id", "offset")
    )
    return out if limit is None else out.limit(limit)
