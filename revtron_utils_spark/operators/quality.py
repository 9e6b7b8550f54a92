"""Data-quality validation: declarative rules → one aggregate pass.

The reference declares constraints (`ColumnModel.foreign_key`,
`unique_columns`, NOT-NULL-by-convention — /root/reference/revtron/
database/main.py:28-37, 118-127) but delegates enforcement to Postgres.
Spark enforces nothing, so this module makes constraint checking an
explicit, distributed audit:

* ``check(df, rules)`` — every rule compiles to a conditional-count
  expression; ALL rules evaluate in **one** map-side-combinable
  aggregate pass over the table (no per-rule scans — at 100 TB, one
  scan vs N is the whole game).
* ``fk_violations`` — referential-integrity audit as a broadcast/anti
  join (the parent key side is a narrow distinct projection).

Report format: one row per rule, ``(rule, column, violations, n_rows)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column


@dataclass(frozen=True)
class Rule:
    """A named predicate over one row; violations = rows where it fails."""

    name: str
    column: str
    predicate: Column  # true = row passes


def not_null(col: str) -> Rule:
    return Rule("not_null", col, F.col(col).isNotNull())


def in_range(col: str, lo: Any, hi: Any) -> Rule:
    return Rule("in_range", col, F.col(col).between(lo, hi))


def accepted_values(col: str, values: Sequence[Any]) -> Rule:
    return Rule("accepted_values", col, F.col(col).isin(list(values)))


def matches(col: str, pattern: str) -> Rule:
    return Rule("matches", col, F.col(col).rlike(pattern))


def non_negative(col: str) -> Rule:
    return Rule("non_negative", col, F.col(col) >= 0)


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule in a single aggregate pass.

    A NULL predicate result counts as a violation (3-valued logic made
    explicit: a NULL value fails ``in_range`` etc. unless the rule is
    ``not_null``-style and says otherwise).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        failed = ~F.coalesce(r.predicate, F.lit(False))
        aggs.append(F.count(F.when(failed, 1)).alias(f"_r{i}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (r.name, r.column, int(row[f"_r{i}"]), int(row["_n"]))
        for i, r in enumerate(rules)
    ]
    return spark.createDataFrame(
        out, "rule string, column string, violations bigint, n_rows bigint"
    )


def fk_violations(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> int:
    """Rows in ``child`` whose non-null key has no match in ``parent``.

    The parent side reduces to a distinct single-column projection
    before the anti join — broadcastable for dimension tables of any
    realistic key count; fact-fact FK audits shuffle only (key) pairs.
    """
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    return (
        child.filter(F.col(child_col).isNotNull())
        .select(child_col)
        .join(keys, child_col, "left_anti")
        .count()
    )


def fk_audit(
    edges: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
    round_to: int = 6,
) -> DataFrame:
    """Referential-integrity report over a schema's FK edges — the
    warehouse join-health audit run before trusting any star-schema
    rollup: one row per edge ``(fk, n_child, orphans, orphan_rate)``
    where orphans are non-null child keys with no parent match.

    ``edges`` is a sequence of ``(name, child_df, child_col, parent_df,
    parent_col)``. Each edge is one distinct parent-key projection
    (broadcastable dimension) + one anti join + scalar aggregates —
    unioned into a bounded edge-count frame; the plan stays one pass
    per table side with no driver-side counts (unlike
    :func:`fk_violations`, which returns an int for imperative use).
    """
    from functools import reduce

    parts = []
    for name, child, ccol, parent, pcol in edges:
        keys = parent.select(F.col(pcol).alias(ccol)).distinct()
        nn = child.filter(F.col(ccol).isNotNull())
        tot = nn.agg(F.count(F.lit(1)).alias("n_child"))
        orph = (
            nn.select(ccol)
            .join(keys, ccol, "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
        )
        parts.append(
            tot.crossJoin(orph).select(
                F.lit(name).alias("fk"),
                "n_child",
                "orphans",
                F.round(
                    F.when(
                        F.col("n_child") > 0,
                        F.col("orphans").cast("double")
                        / F.col("n_child").cast("double"),
                    ),
                    round_to,
                ).alias("orphan_rate"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("fk")


def fk_audit_oracle_sql(
    edges: Sequence[tuple[str, str, str, str, str]],
    round_to: int = 6,
) -> str:
    """DuckDB twin: one scalar-subquery row per edge, same anti-join
    semantics. ``edges`` is ``(name, child_table, child_col,
    parent_table, parent_col)``."""
    rows = []
    for name, ct, cc, pt, pc in edges:
        rows.append(
            f"""
SELECT '{name}' AS fk,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {ct}
        WHERE {cc} IS NOT NULL) AS n_child,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT {cc} FROM {ct} WHERE {cc} IS NOT NULL) c
        ANTI JOIN (SELECT DISTINCT {pc} AS {cc} FROM {pt}) p USING ({cc})
       ) AS orphans"""
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
SELECT fk, n_child, orphans,
       ROUND(CASE WHEN n_child > 0 THEN
         CAST(orphans AS DOUBLE) / CAST(n_child AS DOUBLE) END,
         {round_to}) AS orphan_rate
FROM ({union})
"""
