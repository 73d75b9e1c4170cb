"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at a given sf, compare
row count / schema / order-insensitive value hash. Usage:

    python scripts/oracle_check.py [sf_dir] [only]

`only` is an optional comma-separated list of query names for targeted
runs (e.g. `python scripts/oracle_check.py /root/testdata/sf0.01
dangling_refs,referential`).
"""

from __future__ import annotations

import decimal
import hashlib
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    return str(v)


def decimal_cols(table: pa.Table) -> list[str]:
    """DuckDB types sum(int) as HUGEINT -> Arrow decimal128(38,0); the
    driver's hasher normalizes that differently from BIGINT even when the
    values are identical (round-1 mismatch). Surface such columns as
    failures locally so the fix (::BIGINT cast in the oracle SQL) lands
    before the driver runs."""
    return [f.name for f in table.schema
            if pa.types.is_decimal(f.type)]


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _span_fsm_golden_matches(con, sf_dir: str) -> bool:
    """True iff sf_dir's documents table IS the corpus the pinned
    span_fsm golden was generated from (fingerprint recorded in the
    golden's parquet metadata by scripts/make_span_fsm_golden.py)."""
    import pyarrow.parquet as pq

    from scripts.make_span_fsm_golden import (
        FINGERPRINT_KEY, OUT, corpus_fingerprint_sql)

    meta = pq.read_schema(OUT).metadata or {}
    golden_fp = meta.get(FINGERPRINT_KEY)
    if golden_fp is None:
        # every golden since round 4 embeds the fingerprint
        # (make_span_fsm_golden.py writes it unconditionally); a golden
        # without one is stale — regenerate rather than guess
        raise RuntimeError(
            f"{OUT} lacks {FINGERPRINT_KEY!r} metadata; regenerate with "
            "scripts/make_span_fsm_golden.py")
    try:
        actual = con.sql(
            corpus_fingerprint_sql(f"{sf_dir}/documents.parquet")
        ).fetchone()[0]
    except Exception:
        return False
    return actual == golden_fp.decode()


def main(sf_dir: str = "/root/testdata/sf0.01", only: str = "") -> int:
    """only: comma-separated query names to restrict to (targeted runs)."""
    import __spark_entry__ as entrymod
    from fastpasta_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    from fastpasta_spark.functions.cache import release_tracked

    qs = entrymod.queries()
    if only:
        names = {n.strip() for n in only.split(",")}
        unknown = names - qs.keys()
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in names}
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
            release_tracked()
        except Exception as e:
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            failures += 1
            continue
        if name == "span_fsm":
            # a stale golden (missing fingerprint metadata) raises —
            # record it as this query's FAIL, don't abort the whole run
            try:
                golden_ok = _span_fsm_golden_matches(con, sf_dir)
            except Exception as e:
                print(f"FAIL  {name}: golden check error {str(e)[:200]}")
                failures += 1
                continue
        if name == "span_fsm" and not golden_ok:
            # the span_fsm oracle is a PINNED golden parquet generated
            # from one specific corpus; when run against ANY other
            # corpus (keyed on content fingerprint, not directory name)
            # fall back to the rows-only check instead of false-failing
            print(f"ok*   {name}: rows-only at {sf_dir} "
                  f"(corpus != golden's source; {len(srows)} rows)")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            atab = rel.arrow()
            drows = [tuple(r.values()) for r in atab.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        decs = decimal_cols(atab)
        if decs:
            problems.append(f"decimal-typed oracle cols {decs} (cast ::BIGINT/::DOUBLE)")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok    {name}: {len(srows)} rows match")
    print(f"\n{len(qs) - failures}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
