"""Generic per-column stats profiler — the whole-schema face of the
reference's stats totals (fastpasta stats_collector.rs:96-175 keeps
global counters per payload field; here the table IS the schema, so the
analogue is one stats row PER COLUMN): null count/rate, distinct
cardinality, and numeric min/max/avg — string columns profile their
LENGTH — computed in ONE aggregation pass over the table.

Scale design (100 TB): a single ``df.agg`` compiles to a partial
(map-side) aggregate per partition merged into one final row — the only
shuffle traffic is per-partition partial buffers (bytes, not rows), and
every expression is JVM-side inside whole-stage codegen.  Distinct
cardinality defaults to HyperLogLog++ (``approx_count_distinct`` over a
pre-hashed ``xxhash64``, rsd=0.02 — mergeable sketch partials, no plan
Expand); ``exact_distinct=True`` switches to exact ``count_distinct``,
which plans Spark's Expand strategy (input replicated once per distinct
aggregate) — right for small tables and oracle parity, wrong for 100 TB.

The single stats row is then unpivoted driver-free with ``stack`` into
one row per column, so downstream consumers (golden-stats diff,
report assembly) see the same (name, value)-shaped surface as the rest
of the metrics plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType,
)


def _numeric_face(field: T.StructField):
    """The double-valued expression profiled for min/max/avg, or None
    for types with no meaningful numeric face (arrays, structs, maps).
    Strings profile their length; timestamps their epoch seconds."""
    v = F.col(field.name)
    if isinstance(field.dataType, T.StringType):
        return F.length(v).cast("double")
    if isinstance(field.dataType, T.DateType):
        # DATE has no direct double cast; epoch seconds via timestamp
        # (session TZ is UTC, matching DuckDB epoch(date))
        return v.cast("timestamp").cast("double")
    if isinstance(field.dataType, T.TimestampType):
        return v.cast("double")
    if isinstance(field.dataType, _NUMERIC_TYPES):
        return v.cast("double")
    return None


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    dp: int = 4,
) -> DataFrame:
    """One profile row per column: (col_name, dtype, n_rows, n_nulls,
    null_rate, n_distinct, min_num, max_num, avg_num).

    ``exact_distinct`` trades the mergeable HLL sketch for exact
    ``count_distinct`` (small-SF / oracle-parity mode).  ``dp`` rounds
    the float outputs so engine/oracle hashes are stable.
    """
    fields = [f for f in df.schema.fields
              if columns is None or f.name in columns]
    if not fields:
        raise ValueError("column_profile: no columns selected")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for f in fields:
        c, v = f.name, F.col(f.name)
        aggs.append(F.sum(v.isNull().cast("long")).alias(f"{c}__nulls"))
        if exact_distinct:
            # strings: count distinct over the 128-bit md5 instead of
            # the raw value — count_distinct plans an Expand whose
            # exchange carries the DISTINCT VALUES as group keys, so a
            # text column shipped every full document body through the
            # shuffle (~the whole column's bytes); 16-byte digests give
            # the same count (collision odds ~n^2/2^129) for ~100x less
            # exchange volume. md5(NULL) is NULL, so NULL handling is
            # unchanged. Non-strings are already fixed-width.
            dv = (F.md5(v.cast("binary"))
                  if isinstance(f.dataType, T.StringType) else v)
            dist = F.count_distinct(dv)
        else:
            # xxhash64(NULL) is a real value (the seed), which would
            # count NULL as one extra distinct — mask it out so HLL and
            # exact mode agree on the NULLs-don't-count convention
            dist = F.approx_count_distinct(
                F.when(v.isNotNull(), F.xxhash64(v)), rsd=0.02)
        aggs.append(dist.cast("long").alias(f"{c}__dist"))
        num = _numeric_face(f)
        if num is None:
            num = F.lit(None).cast("double")
        aggs.extend([
            F.min(num).alias(f"{c}__min"),
            F.max(num).alias(f"{c}__max"),
            F.avg(num).alias(f"{c}__avg"),
        ])
    one_row = df.agg(*aggs)

    stacked = ", ".join(
        f"'{f.name}', '{f.dataType.simpleString()}', "
        f"`{f.name}__nulls`, `{f.name}__dist`, "
        f"`{f.name}__min`, `{f.name}__max`, `{f.name}__avg`"
        for f in fields
    )
    stack = (
        f"stack({len(fields)}, {stacked}) as "
        "(col_name, dtype, n_nulls, n_distinct, min_num, max_num, avg_num)"
    )
    out = one_row.select(F.col("n_rows"), F.expr(stack))
    # ANSI mode: guard the 0-row division (x / 0 throws, not NULL).
    rate = F.when(F.col("n_rows") == 0, F.lit(0.0)).otherwise(
        F.col("n_nulls") / F.col("n_rows"))
    return out.select(
        "col_name",
        "dtype",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.round(rate, dp).alias("null_rate"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round("min_num", dp).alias("min_num"),
        F.round("max_num", dp).alias("max_num"),
        F.round("avg_num", dp).alias("avg_num"),
    )


def duckdb_profile_sql(
    table: str,
    fields: list[tuple[str, str]],
    dp: int = 4,
) -> str:
    """The DuckDB twin of ``column_profile(exact_distinct=True)`` for a
    table of (name, spark_simpleString_dtype) fields — one UNION ALL
    branch per column, scanning the table once per column (fine at
    oracle SF; the Spark side stays one-pass)."""
    branches = []
    for name, dtype in fields:
        if dtype == "string":
            num = f"length({name})"
        elif dtype in ("timestamp", "date"):
            num = f"epoch({name})"
        else:
            num = name
        branches.append(f"""
SELECT '{name}' AS col_name, '{dtype}' AS dtype,
       count(*)::BIGINT AS n_rows,
       sum(({name} IS NULL)::INT)::BIGINT AS n_nulls,
       round(sum(({name} IS NULL)::INT) / count(*), {dp}) AS null_rate,
       count(DISTINCT {name})::BIGINT AS n_distinct,
       round(min({num})::DOUBLE, {dp}) AS min_num,
       round(max({num})::DOUBLE, {dp}) AS max_num,
       round(avg({num}), {dp}) AS avg_num
FROM {table}""")
    return " UNION ALL ".join(branches)


def numeric_quantiles(
    df: DataFrame,
    columns: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    exact: bool = False,
    accuracy: int = 10_000,
    dp: int = 4,
) -> DataFrame:
    """Per-column quantiles as (col_name, prob, value) rows.

    Default is ``percentile_approx`` — Spark's GK/KLL-style rank sketch
    with mergeable per-partition partials (one pass, shuffle traffic =
    sketch bytes × partitions), the only viable shape at 100 TB.
    ``exact=True`` switches to the exact interpolated ``percentile``
    (full sort of each column's values — small-SF / oracle-parity mode;
    its linear-interpolation definition matches DuckDB quantile_cont).

    All columns and all probs are computed in ONE ``df.agg``; the
    per-column result arrays are unpivoted with stack + posexplode, so
    each percentile sort/sketch runs once however many probes it serves.
    """
    if not columns:
        raise ValueError("numeric_quantiles: no columns given")
    probs_sql = ", ".join(f"CAST({p!r} AS DOUBLE)" for p in probs)
    aggs = []
    for c in columns:
        if exact:
            expr = f"percentile({c}, array({probs_sql}))"
        else:
            expr = f"percentile_approx({c}, array({probs_sql}), {accuracy})"
        aggs.append(F.expr(expr).alias(f"{c}__q"))
    one_row = df.agg(*aggs)
    stacked = ", ".join(f"'{c}', `{c}__q`" for c in columns)
    qs = one_row.select(
        F.expr(f"stack({len(columns)}, {stacked}) as (col_name, qs)"))
    return (
        qs.select(
            "col_name",
            F.explode(F.arrays_zip(
                F.array(*[F.lit(float(p)) for p in probs]).alias("prob"),
                F.col("qs").cast("array<double>").alias("value"),
            )).alias("z"))
        .select("col_name", F.col("z.prob").alias("prob"),
                F.round("z.value", dp).alias("value"))
    )


def duckdb_quantiles_sql(
    table: str,
    columns: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    dp: int = 4,
) -> str:
    """DuckDB twin of ``numeric_quantiles(exact=True)``."""
    branches = [
        f"SELECT '{c}' AS col_name, CAST({p!r} AS DOUBLE) AS prob, "
        f"round(quantile_cont({c}, {p!r}), {dp}) AS value FROM {table}"
        for c in columns for p in probs
    ]
    return " UNION ALL ".join(branches)
