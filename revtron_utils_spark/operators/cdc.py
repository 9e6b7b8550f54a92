"""Change-data-capture application and snapshot reconciliation — the
two halves of a sync loop's trust story: ``cdc_apply`` folds an
out-of-order changelog into a base snapshot (what the reference's
Salesforce → Postgres incremental sync does with updated/deleted
records, revtron/salesforce/main.py:110-128 + database/main.py:88-117,
generalized to full-row change events), and ``table_diff`` reconciles
two snapshots key-by-key (the audit you run AFTER a sync to prove the
replica converged).

Both are single-shuffle, key-partitioned plans:

* ``cdc_apply``: union(base-as-oldest-change, changelog) → one window
  per key ordered by (seq, tiebreak) descending → keep rank 1 rows that
  are not deletes. Latest-image-wins semantics; out-of-order and
  duplicate deliveries are absorbed by the deterministic ordering, so
  replaying a batch is idempotent. At 100 TB the window is a
  shuffle on the primary key — the same partitioning the subsequent
  MERGE wants, so a real pipeline pays it once.
* ``table_diff``: full outer join on the key with null-safe value
  comparison per column → status ∈ {added, removed, changed,
  unchanged} + the list of changed columns. One co-partitioned join,
  no driver materialization; drill-down happens by filtering the
  result, not by re-scanning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Apply a full-row-image changelog to a base snapshot.

    ``changes`` carries the key columns, the same value columns as
    ``base``, a monotone ``seq_col`` (LSN / commit timestamp / version),
    and ``op_col`` with ``delete_op`` marking deletions (any other value
    is an upsert image). For every key the HIGHEST ``(seq, tiebreak)``
    change wins; base rows act as the oldest image (sequence −∞ via a
    0-rank union flag). A key whose latest change is a delete is absent
    from the output. Deterministic: ties on ``seq_col`` break on
    ``tiebreak_col`` (pass the changelog's delivery id) and then on the
    base-vs-change flag, so replays and duplicate deliveries are
    idempotent. An exact ``(seq, tiebreak)`` collision between an upsert
    and a delete resolves delete-wins (``_del`` is the final sort key,
    descending), so key survival is deterministic even without a
    ``tiebreak_col``.

    Returns the new snapshot with ``base``'s columns.
    """
    from pyspark.sql import Window

    keys = list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    b = base.select(
        *keys,
        *value_cols,
        F.lit(0).alias("_src"),  # base sorts below every change
        F.lit(0).cast("long").alias("_seq"),
        F.lit(False).alias("_del"),
        *([F.lit(None).cast("long").alias("_tb")] if tiebreak_col else []),
    )
    c = changes.select(
        *keys,
        *value_cols,
        F.lit(1).alias("_src"),
        F.col(seq_col).cast("long").alias("_seq"),
        (F.col(op_col) == delete_op).alias("_del"),
        *([F.col(tiebreak_col).cast("long").alias("_tb")] if tiebreak_col else []),
    )
    order = (
        [F.col("_src").desc(), F.col("_seq").desc()]
        + ([F.col("_tb").desc()] if tiebreak_col else [])
        + [F.col("_del").desc()]  # exact-tie U/D collision: delete wins
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & ~F.col("_del"))
        .select(*keys, *value_cols)
    )


def cdc_apply_oracle_sql(
    base_sql: str,
    changes_sql: str,
    keys: Sequence[str],
    value_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB twin: same union, same descending
    (src, seq[, tiebreak], del) rank, same delete suppression."""
    keys = list(keys)
    vals = list(value_cols)
    cols = ", ".join(keys + vals)
    tb_sel_b = ", CAST(NULL AS BIGINT) AS _tb" if tiebreak_col else ""
    tb_sel_c = f", CAST({tiebreak_col} AS BIGINT) AS _tb" if tiebreak_col else ""
    tb_ord = ", _tb DESC" if tiebreak_col else ""
    return f"""
WITH b AS (
  SELECT {cols}, 0 AS _src, CAST(0 AS BIGINT) AS _seq, FALSE AS _del{tb_sel_b}
  FROM ({base_sql})
), c AS (
  SELECT {cols}, 1 AS _src, CAST({seq_col} AS BIGINT) AS _seq,
         ({op_col} = '{delete_op}') AS _del{tb_sel_c}
  FROM ({changes_sql})
), u AS (SELECT * FROM b UNION ALL SELECT * FROM c)
SELECT {cols} FROM u
QUALIFY row_number() OVER (
  PARTITION BY {", ".join(keys)} ORDER BY _src DESC, _seq DESC{tb_ord}, _del DESC
) = 1 AND NOT _del
"""


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Key-level reconciliation of two snapshots.

    Returns one row per key present in either side:
    ``(*keys, status, changed_cols)`` with status ``added`` (key only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (both sides,
    ≥1 value column differs under null-safe comparison) or
    ``unchanged``. ``changed_cols`` is the sorted array of differing
    column names ([] unless changed). One full outer join co-partitioned
    on the key; columns compared with ``eqNullSafe`` so NULL→value and
    value→NULL transitions count as changes.
    """
    keys = list(keys)
    vals = list(value_cols) if value_cols is not None else [
        c for c in old.columns if c not in keys
    ]
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in vals],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in vals],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ko_{k}") == F.col(f"_kn_{k}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in vals
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k) for k in keys],
        status.alias("status"),
        F.when(status == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def table_diff_oracle_sql(
    old_sql: str,
    new_sql: str,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> str:
    """DuckDB twin: FULL OUTER JOIN + IS DISTINCT FROM per column."""
    keys = list(keys)
    vals = list(value_cols)
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    key_out = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    diffs = ", ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END" for c in vals
    )
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql}),
j AS (
  SELECT {key_out},
         (o.{keys[0]} IS NULL) AS _added,
         (n.{keys[0]} IS NULL) AS _removed,
         list_sort(list_filter([{diffs}], x -> x IS NOT NULL)) AS _changed
  FROM o FULL OUTER JOIN n ON {on}
)
SELECT {", ".join(keys)},
       CASE WHEN _added THEN 'added'
            WHEN _removed THEN 'removed'
            WHEN len(_changed) > 0 THEN 'changed'
            ELSE 'unchanged' END AS status,
       CASE WHEN NOT _added AND NOT _removed AND len(_changed) > 0
            THEN _changed ELSE CAST([] AS VARCHAR[]) END AS changed_cols
FROM j
"""
