"""Incremental aggregate maintenance: mergeable per-group summaries that
are updated batch-by-batch instead of recomputed from raw history.

At 100 TB you cannot re-aggregate the full fact table per sync window;
you maintain a rollup keyed by group whose statistics are
**decomposable**: partials from a new batch merge with the stored state
by arithmetic alone (count/sum add, min/max fold, sum-of-squares adds →
variance finalizes). This is the summary-table pattern the reference's
ETL loop implies but delegates to Postgres (`Database.upsert`,
revtron/database/main.py:88-117, is exactly the merge step — without
combinable aggregates behind it).

Distinct counts are NOT decomposable exactly, so the scale path is a
mergeable sketch: Spark 4 ships Apache DataSketches HLL
(``hll_sketch_agg`` to build, ``hll_union_agg`` to merge,
``hll_sketch_estimate`` to read) — the sketch column lives in the
rollup row and merges like any sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# summary columns maintained per (group, metric)
_STATE = ("n", "s", "s2", "mn", "mx")


def rollup_partial(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """One batch's partial summary: count / sum / sum-of-squares /
    min / max per group — everything downstream statistics need, all
    map-side combinable (one narrow shuffle per batch)."""
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("s2"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def rollup_merge(state: DataFrame, partial: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge a new partial into the stored state by pure arithmetic:
    counts/sums add, extrema fold. A full-outer join on the group key —
    on a real table this is the MERGE the incremental syncer issues."""
    s, p = state.alias("s"), partial.alias("p")
    joined = s.join(p, on=list(group_cols), how="full_outer")

    def z(side: str, c: str):  # null → additive identity
        return F.coalesce(F.col(f"{side}.{c}"), F.lit(0))

    return joined.select(
        *group_cols,
        (z("s", "n") + z("p", "n")).alias("n"),
        (z("s", "s") + z("p", "s")).alias("s"),
        (z("s", "s2") + z("p", "s2")).alias("s2"),
        F.coalesce(F.least("s.mn", "p.mn"), F.col("s.mn"), F.col("p.mn")).alias("mn"),
        F.coalesce(F.greatest("s.mx", "p.mx"), F.col("s.mx"), F.col("p.mx")).alias("mx"),
    )


def rollup_merge_many(partials: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge N partial states in ONE aggregation: union-all + the same
    arithmetic (sums add, extrema fold) as a grouped re-aggregate.
    Use for in-plan folds of many batches; ``rollup_merge`` (the keyed
    full-outer join) remains the two-operand form for merging a batch
    into durable state."""
    from functools import reduce

    allp = reduce(lambda a, b: a.unionByName(b), partials)
    return allp.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def rollup_finalize(state: DataFrame, group_cols: list[str], ndigits: int = 6) -> DataFrame:
    """Derive the user-facing statistics from the maintained state:
    mean and population variance via the sum-of-squares identity."""
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    mean = s / n
    var = s2 / n - mean * mean
    return state.select(
        *group_cols,
        n.alias("n"),
        F.round(s, ndigits).alias("total"),
        F.round(mean, ndigits).alias("mean"),
        F.round(F.greatest(var, F.lit(0.0)), ndigits).alias("var_pop"),
        F.round("mn", ndigits).alias("min"),
        F.round("mx", ndigits).alias("max"),
    )


def maintain_rollup(
    batches: list[DataFrame], group_cols: list[str], value_col: str
) -> DataFrame:
    """Fold disjoint batches through partial→merge and finalize — must
    equal the direct aggregate over the union (the differential test and
    the driver oracle assert exactly that). The fold itself is one
    aggregation over the unioned partials (vs a keyed full-outer join
    per batch); each batch still pays its own partial-aggregate shuffle,
    which is the real per-sync cost in production too."""
    assert batches, "maintain_rollup needs at least one batch"
    parts = [rollup_partial(b, group_cols, value_col) for b in batches]
    return rollup_finalize(rollup_merge_many(parts, group_cols), group_cols)


def sketch_rollup_partial(
    df: DataFrame, group_cols: list[str], key_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch of distinct ``key_col`` values (binary,
    mergeable). lg_k=12 → ~1.6 KB per group, <1% typical error."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("dk_sketch"),
        F.count(F.lit(1)).alias("n"),
    )


def sketch_rollup_merge(state: DataFrame, partial: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union the sketches (and counts) of two rollup states."""
    both = state.unionByName(partial)
    return both.groupBy(*group_cols).agg(
        F.hll_union_agg("dk_sketch").alias("dk_sketch"),
        F.sum("n").alias("n"),
    )


def sketch_rollup_estimate(state: DataFrame, group_cols: list[str]) -> DataFrame:
    """Read out the distinct estimates."""
    return state.select(
        *group_cols,
        F.hll_sketch_estimate("dk_sketch").alias("approx_distinct"),
        F.col("n"),
    )
