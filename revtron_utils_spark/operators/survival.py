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
    # ONE array-building fold per group (r13, the timeseries.ewma
    # treatment): the old shape exploded positions and re-folded each
    # position's prefix — O(T²) interpreted lambda evaluations per
    # group. Appending S_i = S_{i−1}·f_i (S_0 = 1.0) computes the
    # identical double sequence in one O(T) pass; oracle unchanged.
    survs = F.aggregate(
        F.col("a"),
        F.array().cast("array<double>"),
        lambda acc, x: F.array_append(
            acc,
            F.when(F.size(acc) == 0, F.lit(1.0)).otherwise(
                F.element_at(acc, F.lit(-1))
            )
            * x["f"],
        ),
    )
    ex = arr.select(
        *keys,
        F.posexplode(
            F.zip_with(
                "a",
                survs,
                lambda s, sv: F.struct(
                    s["t"].alias("t"),
                    s["d"].alias("d"),
                    s["n"].alias("n"),
                    sv.alias("sv"),
                ),
            )
        ).alias("i", "z"),
    )
    return ex.select(
        *keys,
        F.col("z.t").alias("t"),
        F.col("z.n").alias("at_risk"),
        F.col("z.d").alias("events"),
        F.round(F.col("z.sv"), round_to).alias("survival"),
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


def logrank_test(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample log-rank test — "do these two cohorts churn at the
    same rate", the hypothesis-test companion to :func:`kaplan_meier`
    (Mantel 1966). At each distinct pooled event time t with d events
    among n at risk (n_a from cohort A):

        O_a = Σ d_a(t)                                (observed, exact int)
        E_a = Σ d·n_a / n                             (expected under H0)
        V   = Σ d·n_a·n_b·(n−d) / (n²·(n−1))          (hypergeometric var)
        z   = (O_a − E_a) / sqrt(V)

    Each E/V term is ONE division of DECIMAL-exact integer products;
    sqrt is IEEE exactly-rounded. The at-risk counts come from
    descending-time windows over the caller-bounded bucket spine, so
    the whole test is O(spine) state per cohort pair. Output one row:
    ``(n_times, o_a, e_a, o_b, e_b, z)`` (z NULL when V = 0).
    """
    g = F.col(group_col)
    sub = df.where(g.isin(group_a, group_b)).select(
        F.col(time_col).alias("t"),
        F.col(event_col).cast("long").alias("e"),
        (g == group_a).alias("_isa"),
    )
    per = sub.groupBy("t").agg(
        F.sum(F.when(F.col("_isa"), F.col("e")).otherwise(0)).alias("da"),
        F.sum(F.when(~F.col("_isa"), F.col("e")).otherwise(0)).alias("db"),
        F.sum(F.when(F.col("_isa"), 1).otherwise(0)).alias("ta"),
        F.sum(F.when(~F.col("_isa"), 1).otherwise(0)).alias("tb"),
    )
    w = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per.select(
        "t",
        "da",
        "db",
        F.sum("ta").over(w).alias("na"),
        F.sum("tb").over(w).alias("nb"),
    ).where((F.col("da") + F.col("db")) > 0)
    d = F.col("da") + F.col("db")
    n = F.col("na") + F.col("nb")
    dec = lambda c: c.cast("decimal(38,0)")
    e_a = (dec(d) * dec(F.col("na"))).cast("double") / n.cast("double")
    v = (
        (dec(d) * dec(F.col("na")) * dec(F.col("nb")) * dec(n - d)).cast("double")
        / (dec(n) * dec(n) * dec(n - F.lit(1))).cast("double")
    )
    terms = risk.select(
        "da",
        "db",
        e_a.alias("_ea"),
        (d.cast("double") - e_a).alias("_eb_part"),
        F.when(n > 1, v).otherwise(F.lit(0.0)).alias("_v"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_times"),
        F.sum("da").alias("o_a"),
        F.sum("db").alias("o_b"),
        F.sum("_ea").alias("_sea"),
        F.sum("_eb_part").alias("_seb"),
        F.sum("_v").alias("_sv"),
    )
    z = (F.col("o_a").cast("double") - F.col("_sea")) / F.sqrt(F.col("_sv"))
    return agg.select(
        "n_times",
        "o_a",
        F.round(F.col("_sea"), round_to).alias("e_a"),
        "o_b",
        F.round(F.col("_seb"), round_to).alias("e_b"),
        F.round(F.when(F.col("_sv") > 0, z), round_to).alias("z"),
    )


def logrank_test_oracle_sql(
    subjects_sql: str,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a_sql: str,
    group_b_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT term products, one division per term,
    exactly-rounded sqrt. Group literals are SQL expressions."""
    return f"""
WITH subj AS ({subjects_sql}),
sub AS (
  SELECT {time_col} AS t, CAST({event_col} AS BIGINT) AS e,
         ({group_col} = {group_a_sql}) AS _isa
  FROM subj WHERE {group_col} IN ({group_a_sql}, {group_b_sql})
),
per AS (
  SELECT t,
         SUM(CASE WHEN _isa THEN e ELSE 0 END) AS da,
         SUM(CASE WHEN _isa THEN 0 ELSE e END) AS db,
         SUM(CASE WHEN _isa THEN 1 ELSE 0 END) AS ta,
         SUM(CASE WHEN _isa THEN 0 ELSE 1 END) AS tb
  FROM sub GROUP BY t
),
risk AS (
  SELECT t, da, db,
         SUM(ta) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS na,
         SUM(tb) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nb
  FROM per
),
terms AS (
  SELECT da, db,
         CAST(CAST(da + db AS HUGEINT) * CAST(na AS HUGEINT) AS DOUBLE)
           / CAST(na + nb AS DOUBLE) AS _ea,
         CAST(da + db AS DOUBLE)
           - CAST(CAST(da + db AS HUGEINT) * CAST(na AS HUGEINT) AS DOUBLE)
             / CAST(na + nb AS DOUBLE) AS _eb_part,
         CASE WHEN na + nb > 1 THEN
           CAST(CAST(da + db AS HUGEINT) * CAST(na AS HUGEINT)
                * CAST(nb AS HUGEINT)
                * CAST(na + nb - (da + db) AS HUGEINT) AS DOUBLE)
           / CAST(CAST(na + nb AS HUGEINT) * CAST(na + nb AS HUGEINT)
                  * CAST(na + nb - 1 AS HUGEINT) AS DOUBLE)
         ELSE 0.0 END AS _v
  FROM risk WHERE da + db > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
       CAST(SUM(da) AS BIGINT) AS o_a,
       ROUND(SUM(_ea), {round_to}) AS e_a,
       CAST(SUM(db) AS BIGINT) AS o_b,
       ROUND(SUM(_eb_part), {round_to}) AS e_b,
       ROUND(CASE WHEN SUM(_v) > 0 THEN
         (CAST(SUM(da) AS DOUBLE) - SUM(_ea)) / SQRT(SUM(_v)) END,
         {round_to}) AS z
FROM terms
"""
