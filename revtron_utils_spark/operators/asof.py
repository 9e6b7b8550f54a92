"""As-of and range joins — operators Spark's join surface lacks,
composed from built-ins so Catalyst still owns the physical plan.

* **asof_join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` within the same key. Implemented with the
  union+window trick: tag both sides, union, one window over
  (key, ts) carrying the last seen right value forward
  (``last(..., ignorenulls)``), keep left rows. ONE shuffle on the key
  — no nested-loop, no per-key driver work, and skew on hot keys is
  AQE's problem like any window. The ``applyInPandas``/``merge_asof``
  alternative materializes each key group in memory; the union form
  streams, so it's the 100 TB default.
* **interval_join** — equi-bucketized range join: map each left value
  to a bucket, explode each right interval to the buckets it spans,
  equi-join on bucket, post-filter the exact containment. Turns a
  nested-loop theta join into a hash join; bucket width trades shuffle
  fan-out against post-filter selectivity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: each left row gains the right row's payload
    columns (suffixed) from the latest right row at-or-before its
    timestamp (``direction='backward'``; ``'forward'`` takes the
    earliest at-or-after). Right payload is NULL when no match exists.
    Inclusive on ties (right at exactly left's timestamp matches),
    matching DuckDB's ``ASOF JOIN`` semantics."""
    on = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    payload = [c for c in right.columns if c not in on and c != right_ts]
    l_tag = left.withColumn("__evt", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # the whole right payload travels as ONE struct: `last(ignorenulls)`
    # then skips only missing right rows, never a present row whose
    # payload columns happen to be NULL (per-column carry would resurrect
    # stale values and could mix columns from different right rows)
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    ).withColumn("__evt", F.lit(0))

    all_cols = set(l_tag.columns) | set(r_tag.columns)
    def pad(df):
        out = df
        for c in all_cols - set(df.columns):
            out = out.withColumn(c, F.lit(None))
        return out.select(*sorted(all_cols))

    unioned = pad(l_tag).unionByName(pad(r_tag))

    # at equal timestamps the right (rate) row must sort before the left
    # (event) row so the event sees it — hence ordering by (ts, __evt)
    if direction == "backward":
        w = W.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__evt").asc()).rowsBetween(
            W.unboundedPreceding, 0
        )
    else:
        w = W.partitionBy(*on).orderBy(F.col("__ts").desc(), F.col("__evt").asc()).rowsBetween(
            W.unboundedPreceding, 0
        )

    carried = unioned.withColumn(
        "__carried", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__evt") == 1)
    for c in payload:
        out = out.withColumn(f"{c}{suffix}", F.col("__carried").getField(c))
    return out.drop("__evt", "__ts", "__payload", "__carried")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals containing their value
    (``lo <= value < hi``) via bucketization: a hash join on
    ``floor(x / bucket_width)`` plus an exact post-filter, instead of a
    nested-loop theta join. Right intervals explode to every bucket they
    overlap — size ``bucket_width`` near the typical interval width so
    the fan-out stays O(1) per interval.

    ``how`` may be inner or left: the explode duplicates each right
    interval once per bucket, so right/full outer joins would emit one
    null-extended row PER BUCKET for unmatched intervals — rejected
    rather than silently wrong. Empty/inverted intervals (``hi <= lo``)
    explode to nothing (Spark's sequence auto-descends when start >
    stop, which would fabricate buckets); the last bucket is
    ``ceil(hi/width) - 1`` — exact for the exclusive bound, where the
    old ``floor((hi - 1e-9)/width)`` epsilon silently stopped working
    past ~2^53·1e-9."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"interval_join supports inner/left joins only, got {how!r} "
            "(right/full would duplicate unmatched intervals per bucket)"
        )
    l = left.withColumn("__lbucket", F.floor(F.col(value_col) / bucket_width))
    b_lo = F.floor(F.col(lo_col) / bucket_width)
    b_hi = F.ceil(F.col(hi_col) / bucket_width) - 1
    buckets = F.when(
        (F.col(hi_col) > F.col(lo_col)) & (b_hi >= b_lo), F.sequence(b_lo, b_hi)
    ).otherwise(F.array().cast("array<long>"))
    r = right.withColumn("__rbucket", F.explode(buckets))
    # containment lives IN the join condition (not a post-filter), so
    # outer joins null-extend correctly instead of degrading to inner
    cond = (
        (F.col("__lbucket") == F.col("__rbucket"))
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))
    )
    return l.join(r, cond, how).drop("__lbucket", "__rbucket")
