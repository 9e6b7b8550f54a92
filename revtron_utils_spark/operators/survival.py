"""Kaplan-Meier survival curves — the right-censored time-to-event
readout behind retention/churn analysis ("how long do customers keep
ordering", "how long until a document is superseded").

Reference parity: the reference engine has no survival operator; this is
part of the large-scale analytics extension (same family as
`funnel.cohort_retention`, which it complements: retention measures a
fixed grid of offsets, KM handles censoring — subjects still alive at
the horizon leave the risk set without counting as events).

Hash-match discipline (the house rules, see `profile.concentration_gini`):
exact integer event/at-risk counts end-to-end; each step factor
``1 − d/n`` is ONE IEEE double division; the survival prefix product is
a left fold over the ascending-time factor array, reproduced in the
DuckDB oracle as an identical ``list_reduce`` fold (the
`annotation.bradley_terry` precedent — same operation order → same
doubles).

Scale posture: one (group, bucket) partial-aggregated shuffle; the
at-risk window runs per group over the BOUNDED bucket spine (callers
bucket durations — weeks capped at `max_buckets` — precisely so state
is O(groups × buckets), never O(subjects)); the fold is O(T²) doubles
per group with T ≤ max_buckets. Nothing is ever collected to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    time_col: str,
    event_col: str,
    by: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier product-limit estimator per group.

    ``df`` has ONE ROW PER SUBJECT: an integer duration bucket
    ``time_col`` (callers pre-bucket — e.g. capped weeks — so the
    per-group spine is bounded), an 0/1 ``event_col`` (1 = event
    observed, 0 = right-censored at that time), and ``by`` group
    columns.

    Standard KM: at each distinct event time t with d events and n
    at-risk subjects (time ≥ t, censored-at-t included),
    S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}). Output one row per (group,
    event time): ``(*by, t, at_risk, events, survival)``.
    """
    keys = list(by)
    t, e = F.col(time_col), F.col(event_col)
    per = df.groupBy(*keys, t.alias("t")).agg(
        F.sum(e.cast("long")).alias("d"),
        F.sum(F.lit(1) - e.cast("long")).alias("c"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = (
        per.withColumn("n", F.sum(F.col("d") + F.col("c")).over(w))
        .where(F.col("d") > 0)
        .withColumn(
            "f",
            F.lit(1.0) - F.col("d").cast("double") / F.col("n").cast("double"),
        )
    )
    # sort_array on struct(t, ...) orders by t (distinct within group),
    # so the fold order is deterministic ascending time.
    arr = ev.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n", "f"))).alias("a")
    )
    ex = arr.select(*keys, "a", F.posexplode("a").alias("i", "s"))
    surv = F.aggregate(
        F.slice("a", F.lit(1), F.col("i") + F.lit(1)),
        F.lit(1.0),
        lambda acc, x: acc * x["f"],
    )
    return ex.select(
        *keys,
        F.col("s.t").alias("t"),
        F.col("s.n").alias("at_risk"),
        F.col("s.d").alias("events"),
        F.round(surv, round_to).alias("survival"),
    ).orderBy(*keys, "t")


def kaplan_meier_oracle_sql(
    subjects_sql: str,
    time_col: str,
    event_col: str,
    by: list[str],
    round_to: int = 6,
) -> str:
    """DuckDB twin: same at-risk window, same single-division factor,
    same ascending-time ``list_reduce`` left fold (``list_prepend(1.0)``
    seeds the product exactly like the Spark ``F.aggregate`` init)."""
    gc = ", ".join(by)
    return f"""
WITH subj AS ({subjects_sql}),
per AS (
  SELECT {gc}, {time_col} AS t,
         CAST(SUM(CASE WHEN {event_col} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN {event_col} = 1 THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM subj GROUP BY {gc}, {time_col}
),
atrisk AS (
  SELECT {gc}, t, d,
         SUM(d + c) OVER (PARTITION BY {gc} ORDER BY t DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
  FROM per
),
ev AS (
  SELECT {gc}, t, d, n,
         CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS f
  FROM atrisk WHERE d > 0
),
arr AS (
  SELECT {gc},
         list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
         list(n ORDER BY t) AS ns, list(f ORDER BY t) AS fs
  FROM ev GROUP BY {gc}
),
expl AS (
  SELECT {gc}, ts[i] AS t, ns[i] AS at_risk, ds[i] AS events,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs[1:i]),
                     (a, b) -> a * b) AS s
  FROM arr, UNNEST(range(1, len(ts) + 1)) AS u(i)
)
SELECT {gc}, t, CAST(at_risk AS BIGINT) AS at_risk, events,
       ROUND(s, {round_to}) AS survival
FROM expl
"""
