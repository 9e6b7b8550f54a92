"""Slowly-changing-dimension type 2 (SCD2) merge — history-preserving
upsert, the warehouse pattern behind "what did this row look like when
the training run snapshotted it?".

Target layout: business key + attribute columns + ``effective_from``
(timestamp), ``effective_to`` (NULL while current), ``is_current``.
Each batch row (key, attrs, batch_ts):

* new key → insert an open row;
* attrs unchanged vs the key's current row → no-op;
* attrs changed → close the current row (``effective_to = batch_ts``)
  and insert a new open row.

Composed from a broadcast-friendly join + union (the MERGE-less Spark
form): one join of the current slice against the batch, one union of
[closed rows, new rows, untouched history]. History rows
(``is_current = false``) pass through untouched — at 100 TB with a
partitioned/transactional table you'd partition on ``is_current`` (or
date) so the rewrite only touches the current partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge import dedupe_source

SCD_COLS = ("effective_from", "effective_to", "is_current")


def scd2_init(batch: DataFrame, keys: Sequence[str], batch_ts) -> DataFrame:
    """Bootstrap an SCD2 table from a first batch."""
    out = dedupe_source(batch, keys)
    return (
        out.withColumn("effective_from", F.lit(batch_ts).cast("timestamp"))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    target: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    batch_ts,
) -> DataFrame:
    """Apply one batch to an SCD2 target (see module doc). ``batch`` has
    key+attribute columns only; ``batch_ts`` stamps the transition."""
    keys = list(keys)
    attr_cols = [c for c in batch.columns if c not in keys]
    for c in SCD_COLS:
        if c not in target.columns:
            raise ValueError(f"target is not an SCD2 table (missing {c})")

    batch = dedupe_source(batch, keys)
    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    # presence markers, not key null-checks: the join is null-safe on
    # purpose (NULL keys are legal), so `keys[0] IS NOT NULL` would
    # silently drop every null-keyed row from both sides
    b = batch.withColumn("__b_mark", F.lit(True)).alias("b")
    cur = current.withColumn("__t_mark", F.lit(True)).alias("t")
    key_cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys]
    cond = key_cond[0]
    for c in key_cond[1:]:
        cond = cond & c
    joined = cur.join(b, cond, "full_outer")

    b_present = F.col("b.__b_mark").isNotNull()
    t_present = F.col("t.__t_mark").isNotNull()
    # row-level change detection: any attribute differs (null-safe)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(f"t.{c}").eqNullSafe(F.col(f"b.{c}"))

    t_cols = [F.col(f"t.{c}").alias(c) for c in current.columns]
    # 1. current rows whose key is absent from the batch, or unchanged → keep open
    keep_open = joined.filter(t_present & (~b_present | ~changed)).select(*t_cols)
    # 2. current rows superseded by a changed batch row → close
    closed = (
        joined.filter(t_present & b_present & changed)
        .select(*t_cols)
        .withColumn("effective_to", F.lit(batch_ts).cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    # 3. batch rows that are new keys or changed attrs → new open rows
    new_rows = (
        joined.filter(b_present & (~t_present | changed))
        .select(*[F.col(f"b.{c}").alias(c) for c in batch.columns])
        .withColumn("effective_from", F.lit(batch_ts).cast("timestamp"))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    ordered = target.columns
    return (
        history.select(*ordered)
        .unionByName(keep_open.select(*ordered))
        .unionByName(closed.select(*ordered))
        .unionByName(new_rows.select(*ordered))
    )


def asof_snapshot(scd_table: DataFrame, ts) -> DataFrame:
    """The point-in-time read an SCD2 table exists for: rows effective at
    ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return scd_table.filter(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > t))
    ).drop(*SCD_COLS)
