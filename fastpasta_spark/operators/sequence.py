"""Span-sequence structural validation — the engine's core custom operator.

The reference drives a 9-state FSM over each CDP payload word-by-word
(`/root/reference/fastpasta/src/analyze/validators/its/
its_payload_fsm_cont.rs:24-81,111-298`) with running checks and stats
fused into the same scan (`cdp_running.rs:194-456`; stats funnel
`controller.rs:112-248`). Catalyst has no built-in for a per-row grammar
pass, so this is the designated slow-path escape hatch: ONE
``mapInPandas`` (Arrow-batched) pass per partition that emits

  row_type 'v' — violation rows (FSM + optionally the stateless battery)
  row_type 's' — per-batch stats partials (doc/span/kind counts, text
                 length min/max/sum, length histogram) — O(batches) rows
  row_type 'k' — (doc_id) key rows for downstream uniqueness agg
  row_type 'r' — (doc_id, span_idx, offset, media_ref) for the
                 referential anti-join

The fused mode is what plans/check_all.py uses: at 100 TB a second full
scan costs more than everything downstream combined, so uniqueness keys
and media refs ride along in the same scan and all later joins/aggs run
on the (orders-of-magnitude smaller) pass output. Per-document restart
(cdp_running.rs:87-104) means no cross-partition state — any
partitioning is correct and the pass scales linearly.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fastpasta_spark import schema as S
from fastpasta_spark.functions.fsm import stateless_doc_checks, validate_spans

SEQ_OUT_SCHEMA = T.StructType(
    [
        T.StructField("row_type", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("span_idx", T.IntegerType(), True),
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("check_code", T.StringType(), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("stat_name", T.StringType(), True),
        T.StructField("stat_value", T.DoubleType(), True),
    ]
)

# text-length histogram bucket edges (powers of 2; merged by sum downstream)
_HIST_EDGES = [0, 8, 16, 32, 64, 128, 256, 512, 1024]


def _hist_bucket(n: int) -> str:
    for e in reversed(_HIST_EDGES):
        if n >= e:
            return f"text_len_hist_ge_{e}"
    return "text_len_hist_ge_0"


def _make_pass(fused: bool):
    """Build the mapInPandas function. fused=True adds stateless checks,
    'k' key rows and 'r' ref rows (single-scan check_all mode)."""

    def seq_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(SEQ_OUT_SCHEMA.fieldNames())
        for pdf in batches:
            rows: list[tuple] = []
            stats: Counter = Counter()
            tmin, tmax = None, None
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                stats["docs_seen"] += 1
                if fused:
                    rows.append(("k", doc_id, None, None, None, None, None,
                                 None, None))
                tuples = (
                    []
                    if spans is None
                    else [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in spans]
                )
                if fused:
                    for vi in stateless_doc_checks(doc_id, tuples or None):
                        rows.append(("v", doc_id, *vi[:2], vi[2], vi[3], vi[4],
                                     None, None))
                if not tuples:
                    continue
                stats["spans_seen"] += len(tuples)
                for i, (kind, text, ref, off) in enumerate(tuples):
                    key = kind if kind in S.VALID_KINDS else "invalid"
                    stats[f"kind_count_{key}"] += 1
                    if kind == S.KIND_TEXT:
                        if text is None:
                            stats["text_null_count"] += 1
                        else:
                            n = len(text)
                            stats["text_len_sum"] += n
                            stats[_hist_bucket(n)] += 1
                            tmin = n if tmin is None else min(tmin, n)
                            tmax = n if tmax is None else max(tmax, n)
                    if fused and kind == S.KIND_MEDIA and ref:
                        rows.append(("r", doc_id, i, off, None, None, ref,
                                     None, None))
                for span_idx, off, code, sev, msg in validate_spans(tuples):
                    rows.append(("v", doc_id, span_idx, off, code, sev, msg,
                                 None, None))
            for k, v in stats.items():
                rows.append(("s", None, None, None, None, None, None, k, float(v)))
            if tmin is not None:
                rows.append(("s", None, None, None, None, None, None,
                             "text_len_min", float(tmin)))
                rows.append(("s", None, None, None, None, None, None,
                             "text_len_max", float(tmax)))
            yield pd.DataFrame(rows, columns=cols)

    return seq_pass


def sequence_pass(docs: DataFrame, fused: bool = False) -> DataFrame:
    """Run the FSM (+stats) pass. fused=True also emits key/ref rows and
    the stateless battery (see module docstring). Returns SEQ_OUT_SCHEMA."""
    return docs.select("doc_id", "spans").mapInPandas(
        _make_pass(fused), schema=SEQ_OUT_SCHEMA
    )


def split_sequence_output(out: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the pass output into (violations, merged stats).

    Stats partials merge by SUM except the min/max names — the same
    partial+final aggregation shape as the reference's stats funnel,
    expressed as a groupBy (map-side combine + tiny shuffle).
    """
    violations = out.filter(F.col("row_type") == "v").select(
        "doc_id", "span_idx", "offset", "check_code", "severity", "message"
    )
    stats = (
        out.filter(F.col("row_type") == "s")
        .groupBy("stat_name")
        .agg(
            F.when(F.col("stat_name") == "text_len_min", F.min("stat_value"))
            .when(F.col("stat_name") == "text_len_max", F.max("stat_value"))
            .otherwise(F.sum("stat_value"))
            .alias("value")
        )
        .select(F.col("stat_name").alias("name"), "value")
    )
    return violations, stats
