"""Running checks over ordered per-key sequences — the window-function
face of the FSM's running rules, for flat (non-nested) tables.

The grammar FSM (operators/sequence.py) applies these rules inside the
spans array; this module applies the same semantics to a flat event
stream with one row per step — the reference's cdp_running checks
(`/root/reference/fastpasta/src/analyze/validators/its/cdp_running.rs:
317-456`) re-expressed as lag windows so Catalyst plans ONE shuffle on
the key and a per-partition sort, with no Python in the hot path.

Scale: a keyed window = one hash exchange + sort, identical cost to any
sessionization; skewed keys behave like any window partitionBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def period_violations(
    df: DataFrame,
    key: str,
    order: list[str],
    bc_col: str,
    period: int,
    modulus: int = 3564,
) -> DataFrame:
    """Rows whose bc distance to the previous row of the same key is not
    exactly ``period`` (mod ``modulus``) — the E45 trigger-period check
    (reference tdh.rs:60-109: wraparound via `MAX_BC - prev + 1 + cur`,
    which equals the mod-``modulus`` difference).

    Returns the input columns plus ``detected`` (the observed period);
    the first row of each key carries no previous bc and never violates.
    """
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(bc_col).over(w)
    detected = F.pmod(F.col(bc_col) - prev, F.lit(modulus))
    return (
        df.withColumn("detected", detected)
        .filter(F.col("detected").isNotNull() & (F.col("detected") != period))
    )


def monotone_violations(
    df: DataFrame,
    key: str,
    order: list[str],
    value_col: str,
) -> DataFrame:
    """Rows whose value decreased vs the previous row of the same key —
    the flat-table twin of the FSM's E440 bc-monotonicity rule
    (tdh.rs:115-122 via cdp_running.rs:371-398)."""
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(value_col).over(w)
    return (
        df.withColumn("prev_value", prev)
        .filter(F.col(value_col) < F.col("prev_value"))
    )
