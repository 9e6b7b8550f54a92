"""Market-basket association rules — pairwise support / confidence /
lift over (basket, item) co-occurrence. The classic "what co-occurs"
readout, and for a training-data pipeline the tag/domain co-occurrence
audit (which labels ride together, which sources share fingerprints).

Reference parity: no counterpart in the reference engine — analytics
extension alongside `funnel.collocations` (PMI over token bigrams);
this operates on explicit basket membership instead of adjacency.

Hash-match discipline: all counts exact integers; lift's ``p·n`` and
``a·b`` products go through DECIMAL (both wrap int64 at corpus scale);
support/confidence/lift are each ONE IEEE double division, mirrored
token-for-token in the oracle.

Scale posture: one distinct (basket, item) shuffle; the pair expansion
is a basket-keyed equi-join whose blowup is O(basket_size²) per basket —
``max_basket_items`` drops pathological baskets BEFORE the self-join
(the same hot-key cap discipline as `dedup._cap_hot_buckets`); item
supports live on the bounded item catalog and broadcast back onto the
pair frame. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_items: int | None = None,
    top_k: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Unordered item-pair rules: for each pair {a, b} with a < b,
    ``support = p/n``, ``confidence(a→b) = p/count_a`` (and the
    reverse), ``lift = p·n / (count_a·count_b)`` — counts over DISTINCT
    basket membership (duplicate lines in one basket count once).

    Output, ordered (lift DESC, item_a, item_b) and optionally
    limited to ``top_k``: ``(item_a, item_b, pair_count, count_a,
    count_b, n_baskets, support, conf_a_to_b, conf_b_to_a, lift)``.
    """
    b, i = F.col(basket_col), F.col(item_col)
    bi = df.select(b.alias("_b"), i.alias("_i")).distinct()
    if max_basket_items is not None:
        sizes = bi.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
        bi = bi.join(
            sizes.where(F.col("_sz") <= max_basket_items).select("_b"), "_b"
        )
    n = bi.select(F.countDistinct("_b").alias("n_baskets"))
    items = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("cnt"))
    left = bi.select(F.col("_b"), F.col("_i").alias("item_a"))
    right = bi.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    scored = (
        pairs.join(
            F.broadcast(items.select(F.col("_i").alias("item_a"), F.col("cnt").alias("count_a"))),
            "item_a",
        )
        .join(
            F.broadcast(items.select(F.col("_i").alias("item_b"), F.col("cnt").alias("count_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
    )
    p, a, c2, nb = (
        F.col("pair_count"),
        F.col("count_a"),
        F.col("count_b"),
        F.col("n_baskets"),
    )
    out = scored.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        "n_baskets",
        F.round(p.cast("double") / nb.cast("double"), round_to).alias("support"),
        F.round(p.cast("double") / a.cast("double"), round_to).alias("conf_a_to_b"),
        F.round(p.cast("double") / c2.cast("double"), round_to).alias("conf_b_to_a"),
        F.round(
            (p.cast("decimal(38,0)") * nb.cast("decimal(38,0)")).cast("double")
            / (a.cast("decimal(38,0)") * c2.cast("decimal(38,0)")).cast("double"),
            round_to,
        ).alias("lift"),
    )
    ordered = out.orderBy(F.col("lift").desc(), "item_a", "item_b")
    return ordered.limit(top_k) if top_k is not None else ordered


def association_rules_oracle_sql(
    basket_sql: str,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_items: int | None = None,
    top_k: int | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same distinct membership, same cap, same HUGEINT
    lift products and single divisions, same (lift DESC, pair) order."""
    cap = (
        f""",
capped AS (
  SELECT bi.* FROM bi
  JOIN (SELECT _b FROM bi GROUP BY _b
        HAVING COUNT(*) <= {max_basket_items}) ok USING (_b)
)"""
        if max_basket_items is not None
        else ""
    )
    src = "capped" if max_basket_items is not None else "bi"
    limit = f"LIMIT {top_k}" if top_k is not None else ""
    return f"""
WITH raw AS ({basket_sql}),
bi AS (SELECT DISTINCT {basket_col} AS _b, {item_col} AS _i FROM raw){cap},
n AS (SELECT CAST(COUNT(DISTINCT _b) AS BIGINT) AS n_baskets FROM {src}),
items AS (SELECT _i, CAST(COUNT(*) AS BIGINT) AS cnt FROM {src} GROUP BY _i),
pairs AS (
  SELECT l._i AS item_a, r._i AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_count
  FROM {src} l JOIN {src} r ON l._b = r._b AND l._i < r._i
  GROUP BY l._i, r._i
  HAVING COUNT(*) >= {min_pair_count}
)
SELECT item_a, item_b, pair_count,
       ia.cnt AS count_a, ib.cnt AS count_b, n.n_baskets,
       ROUND(CAST(pair_count AS DOUBLE) / CAST(n.n_baskets AS DOUBLE), {round_to}) AS support,
       ROUND(CAST(pair_count AS DOUBLE) / CAST(ia.cnt AS DOUBLE), {round_to}) AS conf_a_to_b,
       ROUND(CAST(pair_count AS DOUBLE) / CAST(ib.cnt AS DOUBLE), {round_to}) AS conf_b_to_a,
       ROUND(CAST(CAST(pair_count AS HUGEINT) * CAST(n.n_baskets AS HUGEINT) AS DOUBLE)
             / CAST(CAST(ia.cnt AS HUGEINT) * CAST(ib.cnt AS HUGEINT) AS DOUBLE),
             {round_to}) AS lift
FROM pairs
JOIN items ia ON pairs.item_a = ia._i
JOIN items ib ON pairs.item_b = ib._i
CROSS JOIN n
ORDER BY lift DESC, item_a, item_b
{limit}
"""
