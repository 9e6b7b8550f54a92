"""Stream-stream interval join — the Structured Streaming surface the
rest of the streaming family (incremental merge, watermark dedup,
stateful sessionization, windowed rollups) doesn't cover: correlating
two live event streams on a key within a time bound.

The reference's closest shape is the batch change-window scan
(`/root/reference/revtron/`: incremental pulls by LastModifiedDate); on
Spark the real-time twin is the watermarked stream-stream join — e.g.
"match each purchase to the ad click that preceded it by ≤1 h".

100 TB posture: both sides carry watermarks AND the join condition
bounds event time on both sides, which is exactly what lets Spark expire
join state — without the time-range conjunct the state store grows
unboundedly (Spark refuses inner stream-stream joins with no watermark,
and outer joins additionally require the time bound). The key equality
makes the state store hash-partitioned on the key, so matching is local
per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streaming DataFrames on ``key`` where the right event
    happens in ``[left_ts, left_ts + max_delay]``.

    Both inputs may be streaming (the canonical case) or batch (the same
    code then runs as a plain interval join — used by the differential
    test to cross-check the streamed result). All non-key columns are
    prefixed so the two sides can't collide.
    """
    lcols = [
        F.col(c).alias(c if c == key else f"{left_prefix}{c}") for c in left.columns
    ]
    rcols = [
        F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != key
    ] + [F.col(key).alias(f"{right_prefix}{key}")]
    l = left.select(*lcols)
    r = right.select(*rcols)
    lts, rts = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    if l.isStreaming:
        l = l.withWatermark(lts, watermark)
    if r.isStreaming:
        r = r.withWatermark(rts, watermark)
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, join_type).drop(f"{right_prefix}{key}")
