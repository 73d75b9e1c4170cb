"""Referential-integrity checks on media references (anti-join).

north_rule mandate. The reference's closest analogue is the
stave-not-found report path (`/root/reference/fastpasta/tests/
fastpasta_10_rdh.rs:108-132`); at engine scale this is the classic
FK check: ``docs.spans[*].media_ref`` must resolve in ``media.media_id``.

Scale design: the refs side is exploded but immediately projected to
(doc_id, span_idx, offset, media_ref) — column pruning keeps the span
text out of the shuffle. The media dimension is broadcast when small
(explicit ``F.broadcast``); for a huge dimension Catalyst falls back to
a shuffle hash anti-join on the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark import schema as S


def media_refs(docs: DataFrame) -> DataFrame:
    """Distinct-ish projection of media references, one row per media span."""
    # index the spans BEFORE filtering so span_idx stays the original
    # position, then prune to (idx, offset, media_ref) pre-explode
    refs = F.expr(
        "filter(transform(spans, (s, i) -> named_struct("
        "'span_idx', CAST(i AS INT), 'offset', s.offset, "
        "'media_ref', s.media_ref, 'kind', s.kind)), "
        f"x -> x.kind = '{S.KIND_MEDIA}' AND x.media_ref IS NOT NULL "
        "AND x.media_ref <> '')"
    )
    return (
        docs.select("doc_id", F.explode(refs).alias("s"))
        .select(
            "doc_id",
            F.col("s.span_idx").alias("span_idx"),
            F.col("s.offset").alias("offset"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def referential_violations(
    docs: DataFrame, media: DataFrame, broadcast_dim: bool = True
) -> DataFrame:
    """E110 rows for every media span whose ref is absent from media."""
    dim = media.select("media_id")
    if broadcast_dim:
        dim = F.broadcast(dim)
    dangling = media_refs(docs).join(
        dim, F.col("media_ref") == F.col("media_id"), "left_anti"
    )
    return dangling.select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        "offset",
        F.lit(S.E110_DANGLING_REF).alias("check_code"),
        F.lit(S.SEV_ERROR).alias("severity"),
        F.concat(F.lit("media_ref not found in media table: "),
                 F.col("media_ref")).alias("message"),
    )
