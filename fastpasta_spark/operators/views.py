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


def view_frames(docs: DataFrame) -> DataFrame:
    """One row per span with doc position + kind decode (W2 analogue)."""
    describe = (
        f"CASE s.kind WHEN '{S.KIND_HEADER}' THEN 'frame header' "
        f"WHEN '{S.KIND_TRIG}' THEN concat('trigger ', s.text) "
        f"WHEN '{S.KIND_TRAILER}' THEN concat('frame trailer ', s.text) "
        f"WHEN '{S.KIND_DIAG}' THEN 'doc footer' "
        f"WHEN '{S.KIND_CALIB}' THEN 'calibration' "
        f"WHEN '{S.KIND_MEDIA}' THEN concat('media -> ', s.media_ref) "
        "ELSE concat('content(', CAST(length(coalesce(s.text, '')) AS STRING), ' chars)') END"
    )
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
            F.expr(describe).alias("describe"),
        )
        .orderBy("doc_id", "offset")
    )
