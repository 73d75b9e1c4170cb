"""Derive the interleaved (doc_id, spans) table from a flat documents
table — deterministically, with pure Column expressions (no Python).

This bridges the driver's testdata (`documents(doc_id, text, ...)`,
TESTDATA.md) to the engine's input_hint shape so the flagship
validation query runs on driver-provided parquet. A deterministic
fraction of docs is "corrupted" (trailer dropped / kind junked /
offset gapped) keyed on the portable md5 hash of doc_id, so the FSM
has real violations to find — the testdata analogue of the reference's
bad sample files (`/root/reference/fastpasta/tests/util/mod.rs:19-36`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark.functions.hashing import spark_md5_hash, spark_tokens


def docs_from_documents(documents: DataFrame, max_content: int = 8) -> DataFrame:
    """(doc_id string, spans array<struct<...>>) from documents(text).

    Layout per doc: header, trig, up to max_content token spans (every
    4th token becomes a media span referencing m<hash%64>), trailer.
    Corruption classes (by doc hash % 10):
      0 -> last content span kind becomes 'junk'      (E70)
      1 -> trailer dropped                            (E991)
      2 -> offsets shifted by +1 after the trig       (E11)
    """
    toks = f"slice({spark_tokens('text')}, 1, {max_content})"
    h = spark_md5_hash("cast(doc_id as string)")
    mut = f"pmod({h}, 10)"

    # round-8: let-bind (tokens, mutation class) ONCE per row via the
    # 1-element-aggregate pattern (CLAUDE.md): the previous form
    # referenced the tokenize chain ~11x per row — header/trailer sizes,
    # both IF branches, and worst of all size({toks}) INSIDE the
    # per-token transform lambda, which re-ran translate+split+filter
    # for EVERY content token. s.tk is a bound, materialized array, so
    # size(s.tk) inside the lambda is O(1).
    content = (
        "transform(s.tk, (t, i) -> named_struct("
        # every 4th token is a media span; corrupted class 0 junks the last kind
        "'kind', CASE WHEN s.m = 0 AND i = size(s.tk) - 1 THEN 'junk' "
        "WHEN pmod(i, 4) = 3 THEN 'media' ELSE 'text' END, "
        "'text', IF(pmod(i, 4) = 3, '', t), "
        # refs land in m0..m71 while the companion media dim has 64 rows
        # -> ~11% dangle, so the referential anti-join (E110) fires too
        f"'media_ref', IF(pmod(i, 4) = 3, concat('m', cast(pmod({spark_md5_hash('t')}, 72) as string)), ''), "
        "'offset', cast(i + 2 + IF(s.m = 2 AND i > 0, 1, 0) as int)))"
    )
    header = (
        "named_struct('kind', 'header', "
        "'text', concat('lanes=', cast(size(s.tk) as string)), "
        "'media_ref', '', 'offset', cast(0 as int))"
    )
    trig = (
        "named_struct('kind', 'trig', "
        "'text', concat('cont=0,bc=', cast(n_chars as string)), "
        "'media_ref', '', 'offset', cast(1 as int))"
    )
    trailer = (
        "named_struct('kind', 'trailer', 'text', 'done=1', 'media_ref', '', "
        "'offset', cast(size(s.tk) + 2 + IF(s.m = 2, 1, 0) as int))"
    )
    span_ty = ("array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")
    spans = (
        f"aggregate(array(named_struct('tk', {toks}, 'm', {mut})), "
        f"cast(array() as {span_ty}), (acc, s) -> "
        f"IF(s.m = 1, concat(array({header}), array({trig}), {content}), "
        f"concat(array({header}), array({trig}), {content}, array({trailer}))))"
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(spans).alias("spans"),
    )
