"""As-of join — a temporal operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.time <= left.time`` within the same key. Implemented with the
classic UNION + last-value-window composition (pure built-ins — no
pandas merge_asof, no per-key UDF):

    union(tagged left, tagged right)
      -> window last(right_payload, ignorenulls) over
         (partition by key order by time, side) rows unbounded preceding
      -> keep left rows

Scale: ONE shuffle of (key, time)-tagged rows; the window is a single
sort within partitions — same cost as any keyed window. Contrast with
the naive range join (quadratic per key) or applyInPandas merge_asof
(python + full regroup). Skewed keys behave like any window
partitionBy (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right payload at or
    before its time (NULLs when no earlier right row exists).

    Ties on time resolve to the right row (side ordering: right rows
    sort before left rows at equal times, so an exactly-simultaneous
    right row IS visible to the left row). Among right rows sharing the
    same (key, time), the greatest payload tuple (compared in
    payload_cols order) wins — a deterministic rule, so output is stable
    across runs and partitionings.
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in payload_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side",
                 # deterministic tie-break among equal-time right rows:
                 # last() then picks the greatest payload tuple
                 *[F.col(f"{prefix}{c}").asc_nulls_first() for c in payload_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tag.unionByName(r_tag)
    filled = unioned.select(
        "_side",
        "_left",
        *[F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
          for c in payload_cols],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in lcols],
        *[F.col(f"{prefix}{c}") for c in payload_cols],
    )
