"""Masked bitwise filters — the P3 operator as a first-class filter.

The reference filters records by masked field equality (e.g. keep CDPs
whose RDH link field matches `--filter-link`, feed-equality via masked
FEE id; `/root/reference/fastpasta/src/analyze/lib.rs` filter path and
`words/rdh.rs` field extractors). In Spark this is a plain bitwise
Column predicate, which Catalyst can push into the parquet scan when the
column is stored unmasked — always prefer expressing the mask on the
READ side rather than pre-materializing masked columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def masked_eq(col: str, mask: int, value: int) -> Column:
    """Predicate: (col & mask) == value."""
    return F.col(col).bitwiseAND(F.lit(mask)) == F.lit(value)


def masked_filter(df: DataFrame, col: str, mask: int, value: int) -> DataFrame:
    """Keep rows whose masked field equals value — `--filter-link`-style
    record selection. One scan, no shuffle; combine with further plan
    stages freely (the predicate participates in pushdown/codegen)."""
    return df.filter(masked_eq(col, mask, value))
