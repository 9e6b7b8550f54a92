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


def join_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-key skew diagnostic for a prospective join/aggregation key —
    the decision input for :func:`salted_join` / AQE skew handling
    (`ams_f2` estimates the aggregate blowup Σf²; this names the keys):
    the ``top_k`` heaviest key values with exact counts, each key's
    share of all rows, and its ratio to the mean key frequency
    (``count·n_keys/n_rows`` — >> 1 means one task eats the key).

    Exact integer counts + two exactly-rounded divisions per row, so the
    readout hash-matches a SQL oracle. One partial-aggregated shuffle on
    the key; the top-k itself is ``orderBy(...).limit(k)`` — Spark
    compiles that to ``TakeOrderedAndProject`` (per-partition k-row
    heaps, O(k) driver merge), so the key-counts frame is never globally
    sorted and never flows through a single-task unpartitioned window.
    The rank column is a row_number over the already-k-row result, and
    the two scalar totals are a broadcast single-row aggregate — nothing
    driver-side scales with the key space.

    Output: ``(*key_cols, cnt, share, x_mean, rank)``.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    order = [F.col("cnt").desc()] + [F.col(k).asc() for k in keys]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_n_rows"), F.count(F.lit(1)).alias("_n_keys")
    )
    top = counts.orderBy(*order).limit(top_k)
    ranked = top.join(F.broadcast(totals)).withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    return ranked.select(
        *keys,
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("_n_rows").cast("double"), round_to).alias(
            "share"
        ),
        F.round(
            # cast BEFORE multiplying: cnt·n_keys in int64 overflows 2^63
            # at 100-TB cardinalities (1e9-row hot key × 1e10 keys) and
            # fails under ANSI mode; double loses nothing a 6-decimal
            # rounded diagnostic needs.
            F.col("cnt").cast("double")
            * F.col("_n_keys").cast("double")
            / F.col("_n_rows").cast("double"),
            round_to,
        ).alias("x_mean"),
        "rank",
    )


def join_skew_report_oracle_sql(
    table: str, key_cols: Sequence[str], top_k: int = 10, round_to: int = 6
) -> str:
    """DuckDB twin: same counts, same two divisions, same tiebreak."""
    keys = list(key_cols)
    gc = ", ".join(keys)
    tb = ", ".join(f"{k} ASC" for k in keys)
    return f"""
WITH c AS (SELECT {gc}, COUNT(*) AS cnt FROM {table} GROUP BY {gc}),
t AS (SELECT SUM(cnt) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
r AS (
  SELECT c.*, t.n_rows, t.n_keys,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, {tb}) AS rank
  FROM c CROSS JOIN t
)
SELECT {gc}, cnt,
       ROUND(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), {round_to}) AS share,
       ROUND(CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), {round_to}) AS x_mean,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= {top_k}
"""


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    top_k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact inner-join output cardinality WITHOUT running the join —
    the go/no-go check before a multi-TB join: ``|A ⋈ B| = Σ_k
    cA(k)·cB(k)``, computed from two map-side-combined key-count
    aggregations and a join of the (key-cardinality-sized) count
    frames — never the row-level join itself. Surfaces the ``top_k``
    output-heaviest keys (the ones AQE skew-split or `salted_join`
    will have to absorb) with their per-key output rows and share of
    the total.

    Per-key products and the total accumulate in DECIMAL(38,0) (a
    single ~4e9×4e9 hot key — or the SUM across a 100-TB key space —
    overflows int64); the surfaced top-k rows cast back to long, which
    is exact below 2^63 output rows per key; one rounded division per
    row. Output: ``(*keys, n_left, n_right, out_rows, share, rank)``
    ranked by exact output rows descending (keys ascending tie-break).
    """
    from pyspark.sql import Window

    keys = list(keys)
    ca = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_left"))
    cb = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_right"))
    prod = (
        F.col("n_left").cast("decimal(18,0)") * F.col("n_right").cast("decimal(18,0)")
    ).cast("decimal(38,0)")
    per_key = ca.join(cb, keys).select(*keys, "n_left", "n_right", prod.alias("out_rows"))
    total = per_key.agg(F.sum("out_rows").alias("_total"))
    order = [F.col("out_rows").desc()] + [F.col(k).asc() for k in keys]
    top = per_key.orderBy(*order).limit(top_k)
    ranked = top.join(F.broadcast(total)).withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    return ranked.select(
        *keys,
        "n_left",
        "n_right",
        F.col("out_rows").cast("long").alias("out_rows"),
        F.round(
            F.col("out_rows").cast("double") / F.col("_total").cast("double"),
            round_to,
        ).alias("share"),
        "rank",
    )


def join_size_estimate_oracle_sql(
    left_sql: str,
    right_sql: str,
    keys: Sequence[str],
    top_k: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB twin: HUGEINT products, same rank order."""
    keys = list(keys)
    gc = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    asel = ", ".join(f"a.{k}" for k in keys)
    tb = ", ".join(f"{k} ASC" for k in keys)
    return f"""
WITH la AS (SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n_left FROM ({left_sql}) GROUP BY {gc}),
rb AS (SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n_right FROM ({right_sql}) GROUP BY {gc}),
pk AS (
  SELECT {asel}, a.n_left, b.n_right,
         CAST(a.n_left AS HUGEINT) * CAST(b.n_right AS HUGEINT) AS out_rows
  FROM la a JOIN rb b ON {on}
),
t AS (SELECT SUM(out_rows) AS total FROM pk),
r AS (
  SELECT pk.*, ROW_NUMBER() OVER (ORDER BY out_rows DESC, {tb}) AS rank FROM pk
)
SELECT {gc}, n_left, n_right, CAST(out_rows AS BIGINT) AS out_rows,
       ROUND(CAST(out_rows AS DOUBLE) / CAST(t.total AS DOUBLE), {round_to}) AS share,
       CAST(rank AS INT) AS rank
FROM r, t WHERE rank <= {top_k}
"""
