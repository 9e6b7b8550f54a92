"""Time-series structural readouts over bucketed metric series —
CUSUM changepoint location and the Mann-Kendall monotone-trend test.
The "did this source's volume shift, and when" audit a pipeline runs
over per-domain ingest rates before retraining on a new crawl.

Reference parity: the reference engine has no time-series operators;
this extends the analytics family (`profile.rolling_zscore`,
`funnel.cohort_retention`) with offline changepoint/trend detection.

Hash-match discipline: inputs are exact integers (callers pass cents /
counts); every cumulative sum and pairwise sign count stays integral
(DECIMAL where products can wrap int64); each emitted statistic is ONE
IEEE double division from exact integers, reproduced token-for-token in
the DuckDB oracles.

Scale posture: both operators run per group over a BOUNDED bucket spine
(daily/monthly calendar buckets — callers bucket precisely so the
per-group frame is O(spine), never O(rows)). CUSUM is one partial-agg
shuffle + one per-group window; Mann-Kendall's pairwise self-join is
O(spine²) per group — bounded by construction (84 months → 3.5k pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(
    df: DataFrame,
    time_col: str,
    value_col: str,
    by: list[str],
    round_to: int = 4,
) -> DataFrame:
    """Offline CUSUM: per group, the bucket where the cumulative
    deviation from the group mean peaks — the classic single-changepoint
    location estimate (Page 1954; at a level shift, |S_i| is maximal at
    the change).

    ``df`` has one row per observation: ``time_col`` (orderable bucket),
    ``value_col`` (exact integer — cents/counts), ``by`` groups. With
    bucket sums x_1..x_n (time order) and T = Σx:

        S_i = (Σ_{j≤i} x_j) − i·T/n

    Exact integer cumsums and DECIMAL i·T (wraps int64 at corpus scale);
    ONE division by n. Output one row per group: ``(*by, n_buckets,
    peak_t, peak_cusum, total)`` where peak is argmax |S_i| with the
    deterministic (|S| DESC, t ASC) tie-break.
    """
    keys = list(by)
    per = df.groupBy(*keys, F.col(time_col).alias("t")).agg(
        F.sum(F.col(value_col).cast("long")).alias("x")
    )
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*keys)
    scored = per.select(
        *keys,
        "t",
        F.sum("x").over(wcum).alias("cum"),
        F.row_number().over(Window.partitionBy(*keys).orderBy("t")).alias("i"),
        F.sum("x").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select(
        *keys,
        "t",
        "total",
        "n",
        (
            F.col("cum").cast("double")
            - (
                F.col("i").cast("decimal(38,0)")
                * F.col("total").cast("decimal(38,0)")
            ).cast("double")
            / F.col("n").cast("double")
        ).alias("s"),
    )
    pick = Window.partitionBy(*keys).orderBy(
        F.abs(F.col("s")).desc(), F.col("t").asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(pick))
        .where(F.col("_r") == 1)
        .select(
            *keys,
            F.col("n").alias("n_buckets"),
            F.col("t").alias("peak_t"),
            F.round(F.col("s"), round_to).alias("peak_cusum"),
            "total",
        )
        .orderBy(*keys)
    )


def cusum_changepoint_oracle_sql(
    series_sql: str,
    time_col: str,
    value_col: str,
    by: list[str],
    round_to: int = 4,
) -> str:
    """DuckDB twin: same integral cumsum, HUGEINT i·T, one division,
    same (|S| DESC, t ASC) pick."""
    gc = ", ".join(by)
    return f"""
WITH series AS ({series_sql}),
per AS (
  SELECT {gc}, {time_col} AS t, CAST(SUM({value_col}) AS BIGINT) AS x
  FROM series GROUP BY {gc}, {time_col}
),
scored AS (
  SELECT {gc}, t,
         SUM(x) OVER (PARTITION BY {gc}) AS total,
         COUNT(*) OVER (PARTITION BY {gc}) AS n,
         CAST(SUM(x) OVER (PARTITION BY {gc} ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)
         - CAST(CAST(ROW_NUMBER() OVER (PARTITION BY {gc} ORDER BY t)
                     AS HUGEINT)
                * CAST(SUM(x) OVER (PARTITION BY {gc}) AS HUGEINT) AS DOUBLE)
           / CAST(COUNT(*) OVER (PARTITION BY {gc}) AS DOUBLE) AS s
  FROM per
),
picked AS (
  SELECT {gc}, t, s, total, n,
         ROW_NUMBER() OVER (PARTITION BY {gc} ORDER BY ABS(s) DESC, t ASC) AS r
  FROM scored
)
SELECT {gc}, CAST(n AS BIGINT) AS n_buckets, t AS peak_t,
       ROUND(s, {round_to}) AS peak_cusum, CAST(total AS BIGINT) AS total
FROM picked WHERE r = 1
"""


def mann_kendall(
    df: DataFrame,
    time_col: str,
    value_col: str,
    by: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Mann-Kendall monotone-trend test per group: the exact integer

        S = Σ_{i<j} sign(x_j − x_i)

    over the time-ordered bucket sums, plus Kendall's tau-a
    ``S / (n(n−1)/2)`` — the nonparametric "is this metric drifting"
    readout that needs no distributional assumption and tolerates ties.

    Pairwise self-join on the group keys with ``t_i < t_j`` — O(spine²)
    per group, bounded because callers pass calendar buckets. S and the
    pair count are exact integers; tau is ONE division. Output:
    ``(*by, n_buckets, s_stat, tau)``.
    """
    keys = list(by)
    per = df.groupBy(*keys, F.col(time_col).alias("t")).agg(
        F.sum(F.col(value_col).cast("long")).alias("x")
    )
    a = per.select(*keys, F.col("t").alias("ti"), F.col("x").alias("xi"))
    b = per.select(*keys, F.col("t").alias("tj"), F.col("x").alias("xj"))
    pairs = a.join(b, on=keys).where(F.col("ti") < F.col("tj"))
    agg = pairs.groupBy(*keys).agg(
        F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long")).alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    # n from pair count: n_pairs = n(n-1)/2 — but recover n directly
    # from the bucket frame to keep the output self-explanatory.
    nper = per.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_buckets"))
    return (
        agg.join(nper, on=keys)
        .select(
            *keys,
            "n_buckets",
            "s_stat",
            F.round(
                F.col("s_stat").cast("double")
                / F.col("n_pairs").cast("double"),
                round_to,
            ).alias("tau"),
        )
        .orderBy(*keys)
    )


def mann_kendall_oracle_sql(
    series_sql: str,
    time_col: str,
    value_col: str,
    by: list[str],
    round_to: int = 6,
) -> str:
    """DuckDB twin: same pairwise sign sum, same single division."""
    gc = ", ".join(by)
    on = " AND ".join(f"a.{k} = b.{k}" for k in by)
    ga = ", ".join(f"a.{k}" for k in by)
    return f"""
WITH series AS ({series_sql}),
per AS (
  SELECT {gc}, {time_col} AS t, CAST(SUM({value_col}) AS BIGINT) AS x
  FROM series GROUP BY {gc}, {time_col}
),
pairs AS (
  SELECT {ga}, CAST(SIGN(b.x - a.x) AS BIGINT) AS sg
  FROM per a JOIN per b ON {on} AND a.t < b.t
),
agg AS (
  SELECT {gc}, CAST(SUM(sg) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY {gc}
),
nper AS (SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n_buckets FROM per GROUP BY {gc})
SELECT n.*, a.s_stat,
       ROUND(CAST(a.s_stat AS DOUBLE) / CAST(a.n_pairs AS DOUBLE), {round_to}) AS tau
FROM nper n JOIN agg a USING ({gc})
"""
