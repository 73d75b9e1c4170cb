"""Regenerate the span_fsm golden violation parquet from the PURE-PYTHON
oracle — no Spark involved.

The driver's correctness gate compares every queries() entry against a
DuckDB oracle; the grammar FSM is genuinely non-SQL, so `span_fsm` was
a rows-only row. This script derives the interleaved docs from
sf0.01/documents.parquet exactly like sources/from_documents.py (same
portable md5 hash, same tokenizer, same mutation classes — replicated
here in pure Python) and runs functions/fsm.py's stateless battery +
grammar FSM over each doc. The resulting violation table is written to
tests/golden/span_fsm_sf0.01.parquet and registered in
__spark_entry__.oracle_sql() as `SELECT * FROM read_parquet(...)`,
turning the driver row into a full rows+schema+hash check against a
snapshot whose provenance is the ORACLE, not the engine.

Regenerate (and say so in the commit message) only on an intentional
semantics change:

    python scripts/make_span_fsm_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastpasta_spark.functions.fsm import stateless_doc_checks, validate_spans
from fastpasta_spark.functions.hashing import py_md5_hash, py_tokens

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "span_fsm_sf0.01.parquet")
MAX_CONTENT = 8

# parquet key-value metadata key holding the SOURCE corpus fingerprint —
# scripts/oracle_check.py compares it against the sf_dir it is run on,
# so the golden gates on corpus IDENTITY, not on the directory's name
FINGERPRINT_KEY = b"source_corpus_fingerprint"


def corpus_fingerprint_sql(documents_parquet: str) -> str:
    """DuckDB query producing a cheap content fingerprint of a documents
    table (row count + id range + total text length — enough to tell
    'same corpus under another name' from 'different corpus/scale')."""
    return (
        "SELECT count(*) || ':' || coalesce(min(doc_id)::VARCHAR, '') "
        "|| ':' || coalesce(max(doc_id)::VARCHAR, '') || ':' || "
        "coalesce(sum(length(text)), 0) "
        f"FROM read_parquet('{documents_parquet}')"
    )


def derive_spans(doc_id: str, text: str | None, n_chars) -> list | None:
    """Pure-Python twin of sources/from_documents.docs_from_documents
    (keep the two in sync; the inline engine-vs-golden check in
    scripts/oracle_check.py + the driver gate catch drift)."""
    if text is None:
        return None  # spark_tokens(NULL) nulls the whole concat -> E12
    toks = py_tokens(text)[:MAX_CONTENT]
    mut = py_md5_hash(doc_id) % 10
    bc = None if n_chars is None else str(n_chars)
    spans = [
        ("header", f"lanes={len(toks)}", "", 0),
        ("trig", None if bc is None else f"cont=0,bc={bc}", "", 1),
    ]
    for i, t in enumerate(toks):
        if mut == 0 and i == len(toks) - 1:
            kind = "junk"
        elif i % 4 == 3:
            kind = "media"
        else:
            kind = "text"
        txt = "" if i % 4 == 3 else t
        ref = f"m{py_md5_hash(t) % 72}" if i % 4 == 3 else ""
        spans.append((kind, txt, ref, i + 2 + (1 if (mut == 2 and i > 0) else 0)))
    if mut != 1:
        spans.append(("trailer", "done=1", "",
                      len(toks) + 2 + (1 if mut == 2 else 0)))
    return spans


def golden_rows(documents) -> list[tuple]:
    rows = []
    for doc_id, text, n_chars in documents:
        did = str(doc_id)
        spans = derive_spans(did, text, n_chars)
        for v in stateless_doc_checks(did, spans or None):
            rows.append((did,) + tuple(v))
        for v in validate_spans(spans or []):
            rows.append((did,) + tuple(v))
    rows.sort(key=lambda r: (r[0], r[2], r[3]))
    return rows


def main() -> None:
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    rows = golden_rows(docs)
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("offset", pa.int32()),
        ("check_code", pa.string()),
        ("severity", pa.string()),
        ("message", pa.string()),
    ])
    cols = list(zip(*rows)) if rows else [[]] * 6
    table = pa.Table.from_arrays(
        [pa.array(list(c), t.type) for c, t in zip(cols, schema)],
        schema=schema)
    fp = duckdb.sql(
        corpus_fingerprint_sql(f"{SF_DIR}/documents.parquet")).fetchone()[0]
    table = table.replace_schema_metadata({FINGERPRINT_KEY: fp.encode()})
    pq.write_table(table, OUT)
    print(f"wrote {len(rows)} golden violation rows -> {OUT} "
          f"(source fingerprint {fp})")


if __name__ == "__main__":
    main()
