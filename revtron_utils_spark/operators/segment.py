"""RFM segmentation — recency/frequency/monetary quartile scoring, the
classic entity-segmentation readout (for a training-data pipeline:
freshness / volume / value tiers over sources or domains).

Reference parity: no counterpart in the reference engine — analytics
extension alongside `funnel.cohort_retention` / `quantiles.robust_stats`.

The scale decision: NO ``ntile`` over the entity frame — an
unpartitioned row_number/ntile window moves EVERY entity through one
partition (the exact anti-pattern the plan audits hunt). Instead each
metric's quartile boundaries come from its bounded distinct-value
histogram (the `value_histogram` / `robust_stats` pattern): callers
pass INTEGER metrics bucketed so the distinct-value frame is bounded
(days, counts, kilodollar buckets), cumulative counts give

    q_k = min v : count(x ≤ v) ≥ ⌈n·k/4⌉   ⟺   4·cum(v) ≥ n·k

and scores are pure comparisons broadcast back onto the entities. Ties
share a score by construction (value-deterministic, no arbitrary rank
split), which is also what makes the DuckDB twin exact.

Hash-match discipline: boundaries and counts exact integers end-to-end;
the per-segment averages are each ONE IEEE double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quartile_bounds(df: DataFrame, col: str) -> DataFrame:
    """Single-row frame ``(q1, q2, q3)`` of ascending quartile
    boundaries of integer column ``col``: q_k is the smallest value
    whose cumulative count reaches ⌈n·k/4⌉. One distinct-value
    aggregation + one window over the BOUNDED histogram frame."""
    vc = df.groupBy(F.col(col).alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("_v").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "_v",
        (F.sum("_c").over(w) * F.lit(4)).alias("_cum4"),
        F.sum("_c").over(wall).alias("_n"),
    )
    return cum.agg(
        *[
            F.min(F.when(F.col("_cum4") >= F.col("_n") * F.lit(k), F.col("_v"))).alias(
                f"q{k}"
            )
            for k in (1, 2, 3)
        ]
    )


def rfm_segments(
    df: DataFrame,
    recency_col: str,
    frequency_col: str,
    monetary_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Score each entity 1–4 on the three metrics (``df`` has ONE ROW
    PER ENTITY with integer metrics, pre-bucketed so distinct values
    are bounded), then roll up per (r, f, m) segment.

    Scores: frequency/monetary score ``1 + Σ_k [x > q_k]`` (4 = top
    quartile); recency is inverted (``4 − Σ_k [x > q_k]``) so 4 = most
    recent. Output per segment: ``(segment, r_score, f_score, m_score,
    n_entities, sum_monetary, avg_recency, avg_frequency,
    avg_monetary)`` ordered by segment.
    """
    rb = quartile_bounds(df, recency_col)
    fb = quartile_bounds(df, frequency_col)
    mb = quartile_bounds(df, monetary_col)

    def _renamed(b: DataFrame, tag: str) -> DataFrame:
        return b.select(*[F.col(f"q{k}").alias(f"{tag}{k}") for k in (1, 2, 3)])

    scored = (
        df.crossJoin(F.broadcast(_renamed(rb, "r")))
        .crossJoin(F.broadcast(_renamed(fb, "f")))
        .crossJoin(F.broadcast(_renamed(mb, "m")))
    )

    def _ups(col: str, tag: str):
        x = F.col(col)
        return sum(
            (x > F.col(f"{tag}{k}")).cast("int") for k in (1, 2, 3)
        )

    scored = scored.select(
        (F.lit(4) - _ups(recency_col, "r")).alias("r_score"),
        (F.lit(1) + _ups(frequency_col, "f")).alias("f_score"),
        (F.lit(1) + _ups(monetary_col, "m")).alias("m_score"),
        F.col(recency_col).cast("long").alias("_rec"),
        F.col(frequency_col).cast("long").alias("_frq"),
        F.col(monetary_col).cast("long").alias("_mon"),
    )
    agg = scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum("_rec").alias("_sr"),
        F.sum("_frq").alias("_sf"),
        F.sum("_mon").alias("sum_monetary"),
    )
    nd = F.col("n_entities").cast("double")
    return agg.select(
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
        "r_score",
        "f_score",
        "m_score",
        "n_entities",
        "sum_monetary",
        F.round(F.col("_sr").cast("double") / nd, round_to).alias("avg_recency"),
        F.round(F.col("_sf").cast("double") / nd, round_to).alias("avg_frequency"),
        F.round(F.col("sum_monetary").cast("double") / nd, round_to).alias(
            "avg_monetary"
        ),
    ).orderBy("segment")


def rfm_segments_oracle_sql(
    entities_sql: str,
    recency_col: str,
    frequency_col: str,
    monetary_col: str,
    round_to: int = 4,
) -> str:
    """DuckDB twin: same histogram boundaries (4·cum ≥ n·k), same
    comparison scores, same single-division averages."""

    def bounds(col: str, tag: str) -> str:
        return f"""
{tag}b AS (
  SELECT MIN(CASE WHEN cum4 >= n * 1 THEN _v END) AS {tag}1,
         MIN(CASE WHEN cum4 >= n * 2 THEN _v END) AS {tag}2,
         MIN(CASE WHEN cum4 >= n * 3 THEN _v END) AS {tag}3
  FROM (
    SELECT _v,
           SUM(_c) OVER (ORDER BY _v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 4 AS cum4,
           SUM(_c) OVER () AS n
    FROM (SELECT {col} AS _v, COUNT(*) AS _c FROM ent GROUP BY {col})
  )
)"""

    ups = lambda col, tag: " + ".join(
        f"CASE WHEN e.{col} > {tag}.{tag}{k} THEN 1 ELSE 0 END" for k in (1, 2, 3)
    )
    return f"""
WITH ent AS ({entities_sql}),
{bounds(recency_col, 'r')},
{bounds(frequency_col, 'f')},
{bounds(monetary_col, 'm')},
scored AS (
  SELECT 4 - ({ups(recency_col, 'r')}) AS r_score,
         1 + ({ups(frequency_col, 'f')}) AS f_score,
         1 + ({ups(monetary_col, 'm')}) AS m_score,
         CAST(e.{recency_col} AS BIGINT) AS _rec,
         CAST(e.{frequency_col} AS BIGINT) AS _frq,
         CAST(e.{monetary_col} AS BIGINT) AS _mon
  FROM ent e CROSS JOIN rb r CROSS JOIN fb f CROSS JOIN mb m
)
SELECT CONCAT(r_score, '-', f_score, '-', m_score) AS segment,
       r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(SUM(_mon) AS BIGINT) AS sum_monetary,
       ROUND(CAST(SUM(_rec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), {round_to}) AS avg_recency,
       ROUND(CAST(SUM(_frq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), {round_to}) AS avg_frequency,
       ROUND(CAST(SUM(_mon) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), {round_to}) AS avg_monetary
FROM scored
GROUP BY r_score, f_score, m_score
"""


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    round_to: int = 6,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation — how many units to
    draw from each stratum to minimize the variance of the estimated
    mean at a fixed budget (the eval-set construction question:
    high-variance strata earn more slots):

        n_h = total_n · (N_h·S_h) / Σ(N_h·S_h)

    S_h is the population σ from DECIMAL-exact moments (one division,
    exactly-rounded sqrt). Fractional allocations are integerized by
    the LARGEST-REMAINDER method with a deterministic (remainder DESC,
    stratum ASC) tie-break, so Σ n_alloc == total_n exactly. If every
    stratum is constant (Σ weights = 0) the allocation falls back to
    proportional-by-size, pinned identically in the oracle.

    One moment aggregate per stratum + windows over the bounded strata
    frame. Output: ``(stratum, n_pop, sd, share, n_alloc)``.
    """
    from pyspark.sql import Window

    st = F.col(stratum_col)
    per = df.groupBy(st.alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.sum(F.col(value_col).cast("long")).alias("_s"),
        F.sum(
            F.col(value_col).cast("decimal(38,0)")
            * F.col(value_col).cast("decimal(38,0)")
        ).alias("_s2"),
    )
    npop = F.col("n_pop").cast("decimal(38,0)")
    num = (npop * F.col("_s2") - F.col("_s").cast("decimal(38,0)")
           * F.col("_s").cast("decimal(38,0)"))
    sd = F.sqrt(num.cast("double")) / F.col("n_pop").cast("double")
    scored = per.select(
        "stratum", "n_pop", sd.alias("sd"),
        (F.col("n_pop").cast("double") * sd).alias("_w"),
    )
    wall = Window.orderBy("stratum").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # fall back to proportional weights when every stratum is constant
    scored = scored.withColumn("_wsum", F.sum("_w").over(wall)).withColumn(
        "_we",
        F.when(F.col("_wsum") > 0, F.col("_w")).otherwise(
            F.col("n_pop").cast("double")
        ),
    )
    scored = scored.withColumn("_wes", F.sum("_we").over(wall)).withColumn(
        "_exact", F.lit(float(total_n)) * F.col("_we") / F.col("_wes")
    )
    scored = (
        scored.withColumn("_base", F.floor("_exact").cast("long"))
        .withColumn("_rem", F.col("_exact") - F.col("_base").cast("double"))
        .withColumn("_bsum", F.sum("_base").over(wall))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("_rem").desc(), F.col("stratum").asc())
            ),
        )
    )
    return scored.select(
        "stratum",
        "n_pop",
        F.round(F.col("sd"), round_to).alias("sd"),
        F.round(F.col("_we") / F.col("_wes"), round_to).alias("share"),
        (
            F.col("_base")
            + (F.col("_rk") <= (F.lit(total_n) - F.col("_bsum"))).cast("long")
        ).alias("n_alloc"),
    ).orderBy("stratum")


def neyman_allocation_oracle_sql(
    values_sql: str,
    stratum_col: str,
    value_col: str,
    total_n: int,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same moments, sqrt, largest-remainder integerization
    and tie-break."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {stratum_col} AS stratum, CAST(COUNT(*) AS BIGINT) AS n_pop,
         CAST(SUM({value_col}) AS BIGINT) AS _s,
         SUM(CAST({value_col} AS HUGEINT) * CAST({value_col} AS HUGEINT)) AS _s2
  FROM vals GROUP BY {stratum_col}
),
scored AS (
  SELECT stratum, n_pop,
         SQRT(CAST(CAST(n_pop AS HUGEINT) * _s2
                   - CAST(_s AS HUGEINT) * CAST(_s AS HUGEINT) AS DOUBLE))
           / CAST(n_pop AS DOUBLE) AS sd
  FROM per
),
wts AS (
  SELECT *, CAST(n_pop AS DOUBLE) * sd AS _w,
         SUM(CAST(n_pop AS DOUBLE) * sd) OVER () AS _wsum
  FROM scored
),
eff AS (
  SELECT *, CASE WHEN _wsum > 0 THEN _w ELSE CAST(n_pop AS DOUBLE) END AS _we
  FROM wts
),
ex AS (
  SELECT *, CAST({total_n} AS DOUBLE) * _we / SUM(_we) OVER () AS _exact,
         _we / SUM(_we) OVER () AS share
  FROM eff
),
fl AS (
  SELECT *, CAST(FLOOR(_exact) AS BIGINT) AS _base,
         _exact - FLOOR(_exact) AS _rem
  FROM ex
),
rk AS (
  SELECT *, SUM(_base) OVER () AS _bsum,
         ROW_NUMBER() OVER (ORDER BY _rem DESC, stratum ASC) AS _rk
  FROM fl
)
SELECT stratum, n_pop, ROUND(sd, {round_to}) AS sd,
       ROUND(share, {round_to}) AS share,
       _base + CASE WHEN _rk <= {total_n} - _bsum THEN 1 ELSE 0 END AS n_alloc
FROM rk
"""
