"""Skew mitigation utilities: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions; these explicit forms cover
the cases AQE can't: a single key too hot for any split (salted_join
replicates the small side across salt shards) and skewed aggregation
where one group's partial state dominates a task (two-stage salted
aggregate). Results are identical to the unsalted forms — only the
shuffle layout changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where the (large, skewed) left side is sharded into
    ``salt`` sub-keys and the (smaller) right side is replicated across
    all shards — a hot key's rows spread over ``salt`` tasks instead of
    one. Use when one join key dwarfs the rest AND the right side is
    small enough to replicate ×salt (typical dim-table skew). Identical
    output to ``left.join(right, on, how)``."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full outer would surface each unmatched right row once
        # PER SALT REPLICA (up to `salt` duplicates) — refuse rather than
        # silently break the identity contract
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, not {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    l = left.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage aggregation for skewed groups: partial-aggregate on
    (group, salt), then final-aggregate on group. Supports the
    decomposable aggregates ``sum``, ``count``, ``min``, ``max``
    (``aggs``: output-name → "fn(col)"). Spark already does map-side
    partial aggregation; this additionally splits a hot group's REDUCE
    work across ``salt`` tasks."""
    group_cols = list(group_cols)
    parsed: dict[str, tuple[str, str]] = {}
    for name, spec in aggs.items():
        fn, _, col = spec.partition("(")
        parsed[name] = (fn.strip().lower(), col.rstrip(")").strip())
        if parsed[name][0] not in ("sum", "count", "min", "max"):
            raise ValueError(f"non-decomposable aggregate: {spec}")

    salted = df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    partial_exprs: list[Column] = []
    for name, (fn, col) in parsed.items():
        e = F.count(F.lit(1)) if fn == "count" and col in ("", "*", "1") else getattr(F, fn)(col)
        partial_exprs.append(e.alias(f"__p_{name}"))
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_exprs)

    final_exprs = []
    for name, (fn, _) in parsed.items():
        refn = "sum" if fn == "count" else fn  # counts combine by summing
        final_exprs.append(getattr(F, refn)(f"__p_{name}").alias(name))
    return partial.groupBy(*group_cols).agg(*final_exprs)
