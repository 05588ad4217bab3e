"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no user-defined stateful operators (SURVEY.md §2A:
'explicitly absent'); this is the engine-extension surface for ones Spark
doesn't ship: arbitrary per-key state evolved across micro-batches in
Arrow-batched Python (grouped rows in, state handle, rows out).

Example operator: running per-key counters (count + exact value total) —
the building block for streaming dedup ledgers, rate trackers, and
session accumulators.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value_micros", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total_micros", T.LongType(), False),
    ]
)


def running_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact µ-unit value total) across batches.

    Values are accumulated as integer micros so state totals are exact and
    order-independent (same policy as the DECIMAL aggregate path).
    """

    def update(key: tuple[Any, ...], pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        n, total = state.get() if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # exact integer accumulation (value has <= 2 true decimals)
            total += int(round(float(pdf["value"].sum()) * 1_000_000))
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value_micros": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
