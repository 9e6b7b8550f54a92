"""Event-sequence analytics over the events table: ordered funnels and
cohort retention — the two classic warehouse patterns a product/ETL
pipeline runs daily (the reference's consumers do this in Postgres on
the extracted tables; here they're first-class distributed operators).

Scale shape: every stage is a map-side-combinable aggregate or an
equi-join on the user key. The step chain re-joins the events table
once per funnel step (steps are short; each join is user-key
co-partitioned and AQE reuses the exchange), never materializing
per-user event arrays — the collect_list-per-user formulation OOMs on
power users at 100 TB, this one cannot. Retention is two aggregates
and one join, all keyed on user/cohort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_days: int | None = None,
) -> DataFrame:
    """Per-user earliest STRICTLY-ORDERED completion time of each step:
    ``(user_col, t_0 … t_{n-1})``, where ``t_i`` is the earliest
    ``steps[i]`` event AFTER ``t_{i-1}`` (null if the chain breaks).
    Users who never reach step 0 are absent. ``within_days`` adds the
    standard whole-funnel deadline: steps 1…n−1 must complete within
    that many days of the user's step-0 time.

    Plan shape: ONE shuffle. The obvious per-step join chain references
    its own prefix twice per level, planning 2^(n−1) copies of the
    events subtree; instead the chain is computed as layered running
    minima over a single ``(user, RANGE ≤ ts)`` window — ``cand_i`` is
    the row's ts when it's a ``steps[i]`` event strictly after the
    frame's best prefix completion ``run_{i-1}`` (a RANGE frame, so
    equal-ts ties resolve deterministically and the strict ``>`` holds
    exactly). All n window layers share one sort; the final per-user
    min-aggregate reuses the window's hash partitioning — the events
    scan (pruned to funnel types) happens once at any n."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cur = events.filter(F.col(type_col).isin(steps)).select(user_col, type_col, ts_col)
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if i > 0:
            cond = cond & (F.col(ts_col) > F.col(f"_run_{i-1}"))
            if within_days is not None:
                # whole-funnel deadline: every later step must land
                # within `within_days` of the user's step-0 time
                cond = cond & (
                    F.col(ts_col)
                    <= F.col("_run_0") + F.expr(f"INTERVAL {int(within_days)} DAYS")
                )
        cur = cur.withColumn(f"_cand_{i}", F.when(cond, F.col(ts_col)))
        if i < len(steps) - 1:
            cur = cur.withColumn(f"_run_{i}", F.min(f"_cand_{i}").over(w))
    out = cur.groupBy(user_col).agg(
        *[F.min(f"_cand_{i}").alias(f"t_{i}") for i in range(len(steps))]
    )
    return out.filter(F.col("t_0").isNotNull())


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_days: int | None = None,
) -> DataFrame:
    """Funnel summary ``(step, event_type, users)``: how many users
    complete each ordered prefix. ``users`` is non-increasing by
    construction (each ``t_i`` requires ``t_{i-1}``)."""
    times = funnel_times(events, steps, user_col, type_col, ts_col, within_days)
    counts = times.agg(
        *[F.count(f"t_{i}").alias(f"c_{i}") for i in range(len(steps))]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"c_{i}").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(pairs).alias("r")).select("r.step", "r.event_type", "r.users")


def funnel_oracle_sql(
    steps: list[str],
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_days: int | None = None,
) -> str:
    """DuckDB mirror of :func:`funnel_counts` — the same strictly-
    ordered min-chain, engine-neutral integer counts."""
    ctes = [
        f"s0 AS (SELECT {user_col}, MIN({ts_col}) AS t FROM {table} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY 1)"
    ]
    for i, s in enumerate(steps[1:], start=1):
        deadline_join, deadline = "", ""
        if within_days is not None:
            deadline_join = f"JOIN s0 s0d USING ({user_col}) "
            deadline = (
                f" AND e.{ts_col} <= s0d.t + INTERVAL {int(within_days)} DAY"
            )
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, MIN(e.{ts_col}) AS t FROM {table} e "
            f"JOIN s{i-1} p USING ({user_col}) {deadline_join}"
            f"WHERE e.{type_col} = '{s}' AND e.{ts_col} > p.t{deadline} GROUP BY 1)"
        )
    selects = [
        f"SELECT CAST({i} AS INTEGER) AS step, '{s}' AS event_type, "
        f"CAST((SELECT COUNT(*) FROM s{i}) AS BIGINT) AS users"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle ``(cohort_day, offset, users)``: users
    grouped by first-activity day (truncated), counted as retained in
    each later ``period_days`` bucket they show activity in. Two
    aggregates + one user-key join; offsets are integer day arithmetic
    (engine-neutral)."""
    day = F.to_date(ts_col)
    first = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(F.col(user_col), day.alias("d")).distinct()
    return (
        active.join(first, user_col)
        .withColumn(
            "offset",
            F.floor(F.datediff("d", "cohort_day") / period_days).cast("int"),
        )
        .select(user_col, "cohort_day", "offset")
        .distinct()
        .groupBy("cohort_day", "offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


def cohort_retention_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> str:
    return f"""
WITH first AS (
  SELECT {user_col}, MIN(CAST({ts_col} AS DATE)) AS cohort_day
  FROM {table} GROUP BY 1
), active AS (
  SELECT DISTINCT {user_col}, CAST({ts_col} AS DATE) AS d FROM {table}
), marked AS (
  SELECT DISTINCT a.{user_col}, f.cohort_day,
         CAST(FLOOR(date_diff('day', f.cohort_day, a.d) / {period_days}) AS INTEGER) AS "offset"
  FROM active a JOIN first f USING ({user_col})
)
SELECT cohort_day, "offset", CAST(COUNT(*) AS BIGINT) AS users
FROM marked GROUP BY 1, 2
"""


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day active users per day (DAU at ``window_days=1``,
    WAU at 7, MAU at 30): ``(day, active_users)`` for every day in the
    data's [min, max] range.

    Sweep-line plan, O(activity) at ANY window size: the naive
    "explode each activity day into the window_days it covers" blows
    rows up ×window_days (×30 for MAU), and a per-day sliding
    COUNT(DISTINCT) re-scans the window per day. Instead each user's
    coverage intervals ``[d, d+w−1]`` are merged per user (an islands
    window — partitions bounded by a user's activity), each merged
    interval emits a +1/−1 delta at its start/end+1, and a running sum
    over the (tiny, calendar-bounded) day spine turns deltas into
    counts. The one unpartitioned window runs over #days rows — a few
    thousand for a decade — not over activity."""
    from pyspark.sql import Window

    day = F.to_date(ts_col)
    active = events.select(F.col(user_col), day.alias("d")).distinct()
    bounds = active.agg(F.min("d").alias("mn"), F.max("d").alias("mx")).first()
    if bounds["mn"] is None:
        return active.select(
            F.col("d").alias("day"), F.lit(0).cast("bigint").alias("active_users")
        ).limit(0)

    w_isl = Window.partitionBy(user_col).orderBy("d")
    end = F.date_add("d", window_days - 1)
    prev_end = F.max(end).over(w_isl.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        active.withColumn(
            "_brk",
            F.when(F.col("d") <= F.date_add(F.coalesce(prev_end, F.lit("1900-01-01").cast("date")), 1), 0).otherwise(1),
        )
        .withColumn("_isl", F.sum("_brk").over(w_isl.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(user_col, "_isl")
        .agg(F.min("d").alias("start"), F.date_add(F.max("d"), window_days - 1).alias("end"))
    )
    deltas = (
        islands.select(F.col("start").alias("day"), F.lit(1).alias("delta"))
        .unionByName(
            islands.select(F.date_add("end", 1).alias("day"), F.lit(-1).alias("delta"))
        )
        .groupBy("day")
        .agg(F.sum("delta").alias("delta"))
    )
    spine = (
        active.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(bounds["mn"]), F.lit(bounds["mx"]))
            ).alias("day")
        )
    )
    # deliberately unpartitioned window (Spark warns): the running
    # total runs over the CALENDAR-DAY spine, whose cardinality is the
    # date range of the data (~365 rows/year — bounded regardless of
    # corpus size), after the distributed heavy stages (distinct
    # users, islands, deltas) have reduced everything to one delta row
    # per day. A single task over that spine is the right plan.
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(deltas, "day", "left")
        .withColumn("active_users", F.sum(F.coalesce("delta", F.lit(0))).over(w_days))
        .filter(F.col("active_users") > 0)
        .select("day", F.col("active_users").cast("bigint").alias("active_users"))
    )


def rolling_active_users_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> str:
    return f"""
WITH active AS (
  SELECT DISTINCT {user_col}, CAST({ts_col} AS DATE) AS d FROM {table}
), bounds AS (
  SELECT MAX(d) AS mx FROM active
), expanded AS (
  SELECT DISTINCT {user_col}, d + CAST(t.o AS INTEGER) AS day
  FROM active CROSS JOIN generate_series(0, {window_days - 1}) t(o)
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS active_users
FROM expanded
WHERE day <= (SELECT mx FROM bounds)
GROUP BY day
"""


def multi_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str = "user_id",
    conv_id_col: str = "event_id",
    conv_ts_col: str = "ts",
    touch_ts_col: str = "touch_ts",
    channel_col: str = "touch_type",
    window_days: int = 30,
    decay_cap_days: int = 20,
    round_to: int = 6,
    touch_tiebreak_col: str | None = None,
) -> DataFrame:
    """Position-based (U-shaped) and time-decay multi-touch attribution:
    every touch in the ``window_days`` before a conversion earns a
    share of that conversion's credit, aggregated per channel — the
    step past last-touch (`q_attribution_last_touch`) that real
    marketing analytics runs.

    Weights (standard industry definitions):
    - position: single touch 1.0; two touches 0.5/0.5; otherwise 0.4
      first + 0.4 last + 0.2 split evenly across the middle.
    - time-decay: touch at age d days weighs 2^-min(d, cap) — the
      per-conversion numerators ``2^(cap-d)`` are exact integers, their
      window sum is exact, and each share is ONE IEEE division, so the
      whole computation is deterministic without a single libm call.

    Per-channel totals sum the per-touch shares AFTER rounding to
    ``round_to``, as DECIMAL — decimal addition is exact and
    order-independent, which keeps the aggregate hash-comparable
    across engines (a double sum would depend on partition order).

    Physical shape: one user-keyed join bounded by the time predicate
    (bucket it with `operators/asof.range_join` at scale), windows
    partitioned by conversion id (bounded by touches-per-window), one
    O(channels) final aggregate. Conversions with no in-window touch
    receive no attribution row (inner join) by definition.

    Determinism: the position window orders by ``(touch_ts, channel
    [, touch_tiebreak_col])`` — the channel tiebreak alone already makes
    the per-channel credit sums deterministic (two touches tied on both
    timestamp AND channel are interchangeable within a channel's sum);
    pass ``touch_tiebreak_col`` (e.g. a touch id, mirroring
    ``event_transitions``' tiebreak_col) when per-touch attribution
    rows must be reproducible too.
    """
    from pyspark.sql import Window

    us_day = 86_400_000_000
    c = conversions.select(
        F.col(conv_id_col).alias("_cid"),
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(conv_ts_col)).alias("_cus"),
    )
    tb = [F.col(touch_tiebreak_col).alias("_tb")] if touch_tiebreak_col else []
    t = touches.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(touch_ts_col)).alias("_tus"),
        F.col(channel_col).alias("_ch"),
        *tb,
    )
    j = c.join(t, "_u").where(
        (F.col("_cus") - F.col("_tus") >= 0)
        & (F.col("_cus") - F.col("_tus") < window_days * us_day)
    )
    w = Window.partitionBy("_cid")
    order = [F.col("_tus"), F.col("_ch")] + ([F.col("_tb")] if tb else [])
    wo = w.orderBy(*order)
    j = (
        j.withColumn("_k", F.count(F.lit(1)).over(w))
        .withColumn("_r", F.row_number().over(wo))
        .withColumn(
            "_d",
            F.least(
                F.expr(f"(_cus - _tus) div {us_day}"), F.lit(decay_cap_days)
            ).cast("int"),
        )
        .withColumn(
            "_num", F.expr(f"shiftleft(CAST(1 AS BIGINT), {decay_cap_days} - _d)")
        )
        .withColumn("_snum", F.sum("_num").over(w))
    )
    w_pos = (
        F.when(F.col("_k") == 1, F.lit(1.0))
        .when(F.col("_k") == 2, F.lit(0.5))
        .when((F.col("_r") == 1) | (F.col("_r") == F.col("_k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("_k") - 2))
    )
    w_decay = F.col("_num").cast("double") / F.col("_snum").cast("double")
    per_touch = j.select(
        F.col("_ch").alias(channel_col),
        F.round(w_pos, round_to).cast("decimal(18,6)").alias("_wp"),
        F.round(w_decay, round_to).cast("decimal(18,6)").alias("_wd"),
    )
    return per_touch.groupBy(channel_col).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("_wp").cast("double"), round_to).alias("credit_position"),
        F.round(F.sum("_wd").cast("double"), round_to).alias("credit_decay"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: ``(from_type, to_type, n, prob)`` with ``prob =
    P(to | from)`` — the behavioral-flow summary (what follows a view?
    where do sessions die?) behind sankey/journey analytics.

    One lag window per user (ordered by ``ts`` with a deterministic id
    tiebreak for simultaneous events), one (from, to) count aggregate,
    row-normalized by a broadcast of the O(types) margins; the single
    count division is exactly-rounded IEEE, so the matrix
    hash-matches a SQL oracle."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    margins = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(margins), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("_tot").cast("double"), round_to).alias(
                "prob"
            ),
        )
    )


def welch_ab_test(
    df: DataFrame,
    metric_col: str,
    variant_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Welch test per segment: means, unbiased variances,
    and the t statistic for EVERY unordered variant pair (a < b) of
    ``variant_col`` — two variants give the classic A/B row, three or
    more give the C(v,2) pairwise readout — computed from one
    map-side-combined pass over exact moment sums (``metric_col`` must
    be integral; Σx² in DECIMAL(38,0)).
    ``t = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)`` uses only
    exactly-rounded IEEE ops (sqrt included), so the output
    hash-matches a SQL oracle. A single-observation variant has no
    unbiased variance: its ``v`` is NULL (not NaN from a 0/0) and every
    ``t_stat`` involving it is NULL."""
    by = list(by or [])
    dt = dict(zip(df.schema.names, [f.dataType.simpleString() for f in df.schema.fields]))[
        metric_col
    ]
    if dt not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(f"welch_ab_test needs an integral metric; got {metric_col}: {dt}")
    x = F.col(metric_col).cast("long")
    base = df.filter(x.isNotNull() & F.col(variant_col).isNotNull())
    agg = base.groupBy(*by, F.col(variant_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum((x * x).cast("decimal(38,0)")).alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    # unbiased variance from exact sums: (n·Σx² − (Σx)²) / (n·(n−1))
    var = (nd * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")) / (
        nd * (nd - 1)
    )
    # n=1 → n·(n−1)=0: guard to NULL rather than letting the IEEE 0/0
    # surface as NaN (NULL propagates cleanly through t below)
    stats = agg.select(
        *by, "_v", "n", mean.alias("m"), F.when(nd > 1, var).alias("v")
    )
    a = stats.alias("a")
    b = stats.alias("b")
    cond = F.col("a._v") < F.col("b._v")
    for c in by:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    t = (F.col("a.m") - F.col("b.m")) / F.sqrt(
        F.col("a.v") / F.col("a.n") + F.col("b.v") / F.col("b.n")
    )
    return a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in by],
        F.col("a._v").alias("variant_a"),
        F.col("b._v").alias("variant_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.m"), round_to).alias("mean_a"),
        F.round(F.col("b.m"), round_to).alias("mean_b"),
        F.round(t, round_to).alias("t_stat"),
    )


def top_session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    k: int = 20,
    max_len: int = 10,
    sep: str = ">",
) -> DataFrame:
    """Most common session journeys: sessionize per user (lag/cumsum,
    ``gap_minutes`` inactivity gap), render each session's ordered
    event-type sequence as a path string (truncated to ``max_len``
    steps — long sessions share their prefix, the analytically useful
    part), count identical paths, return the top ``k``.

    The per-session collect is bounded by session length (max_len
    truncation caps the carried payload), the path count is a
    map-side-combined aggregate on the path string, and top-k plans as
    TakeOrdered — no global sort. Ordering inside a session uses
    (ts, event_id) so simultaneous events are deterministic; ranking
    ties break on the path string. Fully integer/string arithmetic —
    hash-comparable against a SQL oracle.

    Returns ``(path, n_sessions)`` ordered by (-n_sessions, path).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    with_sid = events.select(
        F.col(user_col).alias("_u"),
        us.alias("_us"),
        F.col(id_col).alias("_i"),
        F.col(type_col).alias("_t"),
        sid.alias("_sid"),
    )
    paths = with_sid.groupBy("_u", "_sid").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_us"), F.col("_i"), F.col("_t")))
                    ),
                    lambda s: s["_t"],
                ),
                1,
                max_len,
            ),
            sep,
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def prop_ztest(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion pooled z-test per segment — the conversion-rate
    companion to :func:`welch_ab_test` (which compares continuous
    metrics): for every unordered variant pair (a < b) with successes
    s and trials n,

        p̂ = (s_a + s_b)/(n_a + n_b)
        z  = (s_a/n_a − s_b/n_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))

    Exact integer success/trial counts from one map-side-combined
    pass + a variant-pair self-join over the bounded variant catalog;
    rates and the pooled term are pinned single divisions; sqrt is
    IEEE exactly-rounded. z is NULL when the pooled variance is 0
    (all-success or all-failure pools) or a side is empty. Output:
    ``(*by, variant_a, variant_b, n_a, s_a, n_b, s_b, rate_a, rate_b,
    z)``.
    """
    keys = list(by or [])
    per = df.groupBy(*keys, F.col(variant_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(success_col).cast("long")).alias("s"),
    )
    a = per.select(
        *keys,
        F.col("_v").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
    )
    b = per.select(
        *keys,
        F.col("_v").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    pairs = (
        a.join(b, on=keys) if keys else a.crossJoin(b)
    ).where(F.col("variant_a") < F.col("variant_b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    pool = (sa + sb) / (na + nb)
    rate_a, rate_b = sa / na, sb / nb
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    z = (rate_a - rate_b) / F.sqrt(var)
    return pairs.select(
        *keys,
        "variant_a",
        "variant_b",
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.round(rate_a, round_to).alias("rate_a"),
        F.round(rate_b, round_to).alias("rate_b"),
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0), z),
            round_to,
        ).alias("z"),
    ).orderBy(*keys, "variant_a", "variant_b")


def prop_ztest_oracle_sql(
    trials_sql: str,
    variant_col: str,
    success_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same counts, same pinned divisions, same
    exactly-rounded sqrt (z NULL on zero pooled variance via NULLIF)."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = f"{gc}, " if keys else ""
    on = (
        " AND ".join(f"a.{k} = b.{k}" for k in keys) + " AND "
        if keys
        else ""
    )
    ga = ", ".join(f"a.{k}" for k in keys) + ", " if keys else ""
    return f"""
WITH trials AS ({trials_sql}),
per AS (
  SELECT {sel}{variant_col} AS _v, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST({success_col} AS BIGINT)) AS BIGINT) AS s
  FROM trials GROUP BY {sel}{variant_col}
),
pairs AS (
  SELECT {ga}a._v AS variant_a, b._v AS variant_b,
         a.n AS n_a, a.s AS s_a, b.n AS n_b, b.s AS s_b
  FROM per a JOIN per b ON {on}a._v < b._v
)
SELECT {sel}variant_a, variant_b, n_a, s_a, n_b, s_b,
       ROUND(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), {round_to}) AS rate_a,
       ROUND(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), {round_to}) AS rate_b,
       ROUND(CASE WHEN n_a > 0 AND n_b > 0
                   AND s_a + s_b > 0 AND s_a + s_b < n_a + n_b THEN
         (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / SQRT((CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 - CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       END, {round_to}) AS z
FROM pairs
"""


def cohort_ltv(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    value_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Cohort lifetime-value curves — cumulative revenue per member by
    cohort age, the money-side companion to :func:`cohort_retention`
    (retention counts who comes back; LTV sums what they bring):

        ltv(cohort, age) = Σ_{a ≤ age} revenue(cohort, a) / |cohort|

    Cohort = calendar month of the entity's first event; age = exact
    integer month difference ((y·12+m) arithmetic — no float
    months_between). Exact integer cents and member counts, cumulative
    window over the BOUNDED cohort×age grid, ONE division per cell.
    Plan: one per-entity min-date aggregate, one (cohort, age)
    partial-agg shuffle, grid-sized windows. Output: ``(cohort, age,
    n_members, revenue, cum_revenue, ltv)``.
    """
    from pyspark.sql import Window

    ym = lambda c: F.year(c) * F.lit(12) + F.month(c)
    first = df.groupBy(F.col(entity_col).alias("_e")).agg(
        F.min(F.col(date_col)).alias("_first")
    )
    sizes = first.groupBy(
        F.date_trunc("month", "_first").cast("date").alias("cohort")
    ).agg(F.count(F.lit(1)).alias("n_members"))
    joined = df.join(first, df[entity_col] == first["_e"]).select(
        F.date_trunc("month", "_first").cast("date").alias("cohort"),
        (ym(F.col(date_col)) - ym(F.col("_first"))).cast("int").alias("age"),
        F.col(value_col).cast("long").alias("_v"),
    )
    grid = joined.groupBy("cohort", "age").agg(F.sum("_v").alias("revenue"))
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cum_revenue", F.sum("revenue").over(wcum))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "n_members",
            "revenue",
            "cum_revenue",
            F.round(
                F.col("cum_revenue").cast("double")
                / F.col("n_members").cast("double"),
                round_to,
            ).alias("ltv"),
        )
        .orderBy("cohort", "age")
    )


def cohort_ltv_oracle_sql(
    events_sql: str,
    entity_col: str,
    date_col: str,
    value_col: str,
    round_to: int = 4,
) -> str:
    """DuckDB twin: same integer month arithmetic, same cumulative
    window, same single division."""
    return f"""
WITH ev AS ({events_sql}),
first_ AS (
  SELECT {entity_col} AS _e, MIN({date_col}) AS _first
  FROM ev GROUP BY {entity_col}
),
sizes AS (
  SELECT CAST(date_trunc('month', _first) AS DATE) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM first_ GROUP BY 1
),
grid AS (
  SELECT CAST(date_trunc('month', f._first) AS DATE) AS cohort,
         CAST((YEAR(e.{date_col}) * 12 + MONTH(e.{date_col}))
              - (YEAR(f._first) * 12 + MONTH(f._first)) AS INTEGER) AS age,
         CAST(SUM(CAST(e.{value_col} AS BIGINT)) AS BIGINT) AS revenue
  FROM ev e JOIN first_ f ON e.{entity_col} = f._e
  GROUP BY 1, 2
)
SELECT g.cohort, g.age, s.n_members, g.revenue,
       CAST(SUM(g.revenue) OVER (PARTITION BY g.cohort ORDER BY g.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue,
       ROUND(CAST(SUM(g.revenue) OVER (PARTITION BY g.cohort ORDER BY g.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(s.n_members AS DOUBLE), {round_to}) AS ltv
FROM grid g JOIN sizes s ON g.cohort = s.cohort
"""


def markov_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    channel_col: str = "event_type",
    conversion: str = "purchase",
    tiebreak_col: str | None = "event_id",
    k_steps: int = 8,
    scale: int = 10**6,
    round_to: int = 6,
    max_channels: int = 32,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016, "Mapping
    the customer journey"): model user journeys as a first-order Markov
    chain over channels with absorbing conversion/null states; a
    channel's credit is its REMOVAL EFFECT — how much the start→conv
    probability drops when every transition into the channel is
    redirected to null — normalized into shares. The step past
    heuristic position/time-decay weights (`multi_touch_attribution`):
    channels that merely appear on converting paths but don't CAUSE
    conversions earn nothing.

    Semantics: each user's journey is their event sequence up to and
    including the first ``conversion`` event (→ conv terminal), else
    ending in the null terminal. Transition probabilities are
    row-normalized counts quantized to fixed-point integers
    (``(c·scale) div rowtotal`` — engine-exact); conversion
    probabilities come from ``k_steps`` synchronous propagation steps
    (absorbing-state mass after k steps — a deterministic truncation of
    the absorbing-chain solve, the `bradley_terry` fixed-iteration
    convention), with every cross-state sum an index-ordered
    ``F.aggregate`` fold mirrored by the oracle's ``list_reduce`` —
    bit-identical doubles.

    Scale shape (the BT playbook): the 100-TB event stream reduces with
    one per-user lag window + ONE (state, state) count aggregate;
    everything after runs on a SINGLE-ROW state frame of O(channels²)
    integers — the channel catalog is leaderboard-sized by documented
    assumption (``max_channels`` guards it). Each propagation step is
    its own projection over the materialized previous array (the
    ams_f2 codegen lesson).

    Output one row per channel: ``(channel, base_conv, removed_conv,
    removal_effect, share)`` — share = effect / Σ effects (NULL when
    the total effect is ≤ 0).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    wu = Window.partitionBy(user_col).orderBy(*order)
    wall = Window.partitionBy(user_col)
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(channel_col).alias("_c"),
        F.row_number().over(wu).alias("_rn"),
    )
    ev = ev.withColumn(
        "_crn",
        F.min(F.when(F.col("_c") == conversion, F.col("_rn"))).over(
            Window.partitionBy("_u")
        ),
    )
    kept = ev.where(F.col("_crn").isNull() | (F.col("_rn") <= F.col("_crn")))
    wk = Window.partitionBy("_u").orderBy("_rn")
    kept = kept.select(
        "_u",
        "_c",
        "_rn",
        "_crn",
        F.lag("_c").over(wk).alias("_prev"),
        F.max("_rn").over(Window.partitionBy("_u")).alias("_mx"),
    )
    is_conv = F.col("_c") == conversion
    trans1 = kept.select(
        F.when(F.col("_prev").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("sk"),
        F.when(F.col("_prev").isNull(), F.lit(None)).otherwise(F.col("_prev")).alias("sl"),
        F.when(is_conv, F.lit(2)).otherwise(F.lit(1)).alias("dk"),
        F.when(is_conv, F.lit(None)).otherwise(F.col("_c")).alias("dl"),
    )
    trans2 = kept.where(F.col("_crn").isNull() & (F.col("_rn") == F.col("_mx"))).select(
        F.lit(1).alias("sk"),
        F.col("_c").alias("sl"),
        F.lit(3).alias("dk"),
        F.lit(None).cast(kept.schema["_c"].dataType).alias("dl"),
    )
    trans = trans1.unionByName(trans2).groupBy("sk", "sl", "dk", "dl").agg(
        F.count(F.lit(1)).alias("c")
    )
    from .dedup import _persist

    trans = _persist(trans)
    chan = (
        trans.select(
            F.explode(
                F.array(
                    F.when(F.col("sk") == 1, F.col("sl")),
                    F.when(F.col("dk") == 1, F.col("dl")),
                )
            ).alias("ch")
        )
        .where(F.col("ch").isNotNull())
        .distinct()
    )
    items_row = chan.agg(F.array_sort(F.collect_list("ch")).alias("it"))
    m_val = items_row.select(F.size("it").alias("m")).first()["m"]
    if m_val > max_channels:
        raise ValueError(
            f"markov_attribution: {m_val} channels, over max_channels="
            f"{max_channels} — the single-row O(channels²) state assumes "
            "a bounded channel catalog"
        )
    ci = trans.join(F.broadcast(items_row)).select(
        F.size("it").alias("m"),
        F.when(F.col("sk") == 0, F.lit(0))
        .otherwise(F.array_position("it", F.col("sl")))
        .cast("int")
        .alias("i"),
        F.when(F.col("dk") == 1, F.array_position("it", F.col("dl")))
        .when(F.col("dk") == 2, F.size("it") + 1)
        .otherwise(F.size("it") + 2)
        .cast("int")
        .alias("j"),
        "c",
    )
    tots = ci.groupBy("i").agg(F.sum("c").alias("tot"))
    n_col = F.col("m") + 3
    grid = (
        items_row.select(F.size("it").alias("m"), "it")
        .select("m", "it", F.explode(F.sequence(F.lit(0), n_col - 1)).alias("i"))
        .select(
            "m",
            "it",
            "i",
            F.explode(F.sequence(F.lit(0), F.col("m") + 2)).alias("j"),
        )
    )
    cells = (
        grid.join(ci.select("i", "j", "c"), ["i", "j"], "left")
        .join(tots, "i", "left")
        .select(
            "m",
            "it",
            (F.col("i").cast("long") * (F.col("m") + 3) + F.col("j")).alias("k"),
            F.when(
                F.col("i") == F.col("m") + 1,
                F.when(F.col("j") == F.col("m") + 1, F.lit(scale)).otherwise(F.lit(0)),
            )
            .when(
                F.col("i") == F.col("m") + 2,
                F.when(F.col("j") == F.col("m") + 2, F.lit(scale)).otherwise(F.lit(0)),
            )
            .otherwise(
                F.expr(f"(coalesce(c, 0) * {scale}) div coalesce(tot, 1)")
            )
            .cast("long")
            .alias("t"),
        )
    )
    state = cells.groupBy("m", "it").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "t"))), lambda s: s["t"]
        ).alias("tflat")
    )
    sd = float(scale)
    state = state.withColumn(
        "vs",
        F.transform(
            F.sequence(F.lit(0), F.col("m")),
            lambda r: F.transform(
                F.sequence(F.lit(0), F.col("m") + 2),
                lambda j: F.when(j == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
            ),
        ),
    )

    # one propagation step as a single parameterized SQL string, parsed
    # once and reused for all k steps (the bradley_terry / pq_ann_poly
    # r12 convention): the old nested-lambda Column construction issued
    # hundreds of py4j round-trips per step (~0.12 s × k_steps of pure
    # driver time). Identical expression tree: same CASE branch order,
    # same fold, same cast/divide placement — `0.0D` literals keep the
    # DoubleType the lambdas produced (bare 0.0 parses as DECIMAL).
    def _t_sql(i: str, j: str) -> str:
        return (
            f"CAST(element_at(tflat, CAST(({i} * (m + 3)) + {j} AS INT) + 1)"
            f" AS DOUBLE) / {sd!r}D"
        )

    _fold_last = (
        "aggregate(sequence(0, (m + 3) - 1), 0.0D, (acc, i) -> acc + "
        "element_at(element_at(vs, r + 1), i + 1) * "
        f"({_t_sql('i', 'j')} + (CASE WHEN r >= 1 THEN {_t_sql('i', 'r')} "
        "ELSE 0.0D END)))"
    )
    _fold_plain = (
        "aggregate(sequence(0, (m + 3) - 1), 0.0D, (acc, i) -> acc + "
        f"element_at(element_at(vs, r + 1), i + 1) * {_t_sql('i', 'j')})"
    )
    step_expr = F.expr(
        "transform(sequence(0, m), r -> transform(sequence(0, (m + 3) - 1), "
        "j -> CASE WHEN (r >= 1) AND (j = r) THEN 0.0D "
        f"WHEN j = (m + 3) - 1 THEN {_fold_last} "
        f"ELSE {_fold_plain} END))"
    )

    for _ in range(k_steps):
        state = state.select("m", "it", "tflat", step_expr.alias("vs"))
    conv_at = lambda r: F.element_at(F.element_at("vs", r + 1), F.col("m") + 2)
    base = conv_at(F.lit(0))
    tot_re = F.aggregate(
        F.sequence(F.lit(1), F.col("m")),
        F.lit(0.0),
        lambda acc, r: acc + (base - conv_at(r)),
    )
    final = state.select("it", "vs", base.alias("_base"), tot_re.alias("_tot"))
    out = final.select(
        F.posexplode("it").alias("_p", "channel"), "vs", "_base", "_tot"
    )
    # conv state index = m+1 → 1-based element m+2; m = size(vs)-1
    removed = F.element_at(
        F.element_at("vs", F.col("_p") + 2), F.size("vs") + 1
    )
    return out.select(
        "channel",
        F.round(F.col("_base"), round_to).alias("base_conv"),
        F.round(removed, round_to).alias("removed_conv"),
        F.round(F.col("_base") - removed, round_to).alias("removal_effect"),
        F.round(
            F.when(F.col("_tot") > 0, (F.col("_base") - removed) / F.col("_tot")),
            round_to,
        ).alias("share"),
    )


def markov_attribution_oracle_sql(
    events_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    channel_col: str = "event_type",
    conversion: str = "purchase",
    tiebreak_col: str | None = "event_id",
    k_steps: int = 8,
    scale: int = 10**6,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`markov_attribution`: identical journey
    truncation, identical integer-quantized transition matrix, and the
    propagation steps unrolled as MATERIALIZED CTEs whose list folds
    replay the Spark ``F.aggregate`` adds in the same index order —
    bit-identical doubles."""
    conv = conversion.replace("'", "''")
    s = scale
    tb = f", {tiebreak_col}" if tiebreak_col else ""
    parts = [
        f"""WITH ev AS MATERIALIZED (
  SELECT {user_col} AS u, {channel_col} AS c,
         ROW_NUMBER() OVER (PARTITION BY {user_col}
                            ORDER BY {ts_col}{tb}) AS rn
  FROM ({events_sql})
)""",
        """ev2 AS MATERIALIZED (
  SELECT u, c, rn,
         MIN(CASE WHEN c = '%s' THEN rn END) OVER (PARTITION BY u) AS crn
  FROM ev
)""" % conv,
        """kept AS MATERIALIZED (
  SELECT u, c, rn, crn,
         LAG(c) OVER (PARTITION BY u ORDER BY rn) AS prev,
         MAX(rn) OVER (PARTITION BY u) AS mx
  FROM ev2 WHERE crn IS NULL OR rn <= crn
)""",
        f"""trans AS MATERIALIZED (
  SELECT sk, sl, dk, dl, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT CASE WHEN prev IS NULL THEN 0 ELSE 1 END AS sk,
           CASE WHEN prev IS NULL THEN NULL ELSE prev END AS sl,
           CASE WHEN c = '{conv}' THEN 2 ELSE 1 END AS dk,
           CASE WHEN c = '{conv}' THEN NULL ELSE c END AS dl
    FROM kept
    UNION ALL
    SELECT 1, c, 3, NULL FROM kept WHERE crn IS NULL AND rn = mx
  ) GROUP BY sk, sl, dk, dl
)""",
        """items AS MATERIALIZED (
  SELECT list_sort(list_distinct(list(ch))) AS it FROM (
    SELECT sl AS ch FROM trans WHERE sk = 1
    UNION SELECT dl FROM trans WHERE dk = 1
  ) WHERE ch IS NOT NULL
)""",
        "mm AS (SELECT it, CAST(len(it) AS BIGINT) AS m FROM items)",
        """ci AS MATERIALIZED (
  SELECT CASE WHEN t.sk = 0 THEN 0
              ELSE list_position(mm.it, t.sl) END AS i,
         CASE WHEN t.dk = 1 THEN list_position(mm.it, t.dl)
              WHEN t.dk = 2 THEN mm.m + 1 ELSE mm.m + 2 END AS j,
         t.c
  FROM trans t CROSS JOIN mm
)""",
        "tots AS (SELECT i, SUM(c) AS tot FROM ci GROUP BY i)",
        """grid AS MATERIALIZED (
  SELECT mm.m, mm.it, a.i, b.j
  FROM mm, UNNEST(range(0, mm.m + 3)) AS a(i), UNNEST(range(0, mm.m + 3)) AS b(j)
)""",
        f"""cells AS MATERIALIZED (
  SELECT g.m, g.it, g.i * (g.m + 3) + g.j AS k,
         CASE WHEN g.i = g.m + 1
              THEN CASE WHEN g.j = g.m + 1 THEN {s} ELSE 0 END
              WHEN g.i = g.m + 2
              THEN CASE WHEN g.j = g.m + 2 THEN {s} ELSE 0 END
              ELSE (COALESCE(cc.c, 0) * {s}) // COALESCE(tt.tot, 1) END AS t
  FROM grid g
  LEFT JOIN (SELECT i, j, SUM(c) AS c FROM ci GROUP BY i, j) cc
         ON cc.i = g.i AND cc.j = g.j
  LEFT JOIN tots tt ON tt.i = g.i
)""",
        """tf AS MATERIALIZED (
  SELECT m, it, list(t ORDER BY k) AS tflat FROM cells GROUP BY m, it
)""",
        """s0 AS MATERIALIZED (
  SELECT m, it, tflat,
         list_transform(range(0, m + 1), r ->
           list_transform(range(0, m + 3), j ->
             CASE WHEN j = 0 THEN 1.0 ELSE 0.0 END)) AS vs
  FROM tf
)""",
    ]
    td = f"CAST(tflat[CAST(i * (m + 3) + j AS BIGINT) + 1] AS DOUBLE) / {float(s)!r}"
    tr = f"CAST(tflat[CAST(i * (m + 3) + r AS BIGINT) + 1] AS DOUBLE) / {float(s)!r}"
    step = f"""s{{k}} AS MATERIALIZED (
  SELECT m, it, tflat,
    list_transform(range(0, m + 1), r ->
      list_transform(range(0, m + 3), j ->
        CASE WHEN r >= 1 AND j = r THEN 0.0
             WHEN j = m + 2 THEN
               list_reduce(list_prepend(0.0, list_transform(range(0, m + 3),
                 i -> vs[CAST(r AS INTEGER) + 1][CAST(i AS INTEGER) + 1]
                      * ({td} + CASE WHEN r >= 1 THEN {tr} ELSE 0.0 END))),
                 (a, b) -> a + b)
             ELSE
               list_reduce(list_prepend(0.0, list_transform(range(0, m + 3),
                 i -> vs[CAST(r AS INTEGER) + 1][CAST(i AS INTEGER) + 1]
                      * ({td}))),
                 (a, b) -> a + b)
        END)) AS vs
  FROM s{{prev}}
)"""
    for k in range(1, k_steps + 1):
        parts.append(step.format(k=k, prev=k - 1))
    last = f"s{k_steps}"
    return (
        ",\n".join(parts)
        + f""",
fin AS (
  SELECT m, it, vs,
         vs[1][CAST(m AS INTEGER) + 2] AS base,
         list_reduce(list_prepend(0.0, list_transform(range(1, m + 1),
           r -> vs[1][CAST(m AS INTEGER) + 2]
                - vs[CAST(r AS INTEGER) + 1][CAST(m AS INTEGER) + 2])),
           (a, b) -> a + b) AS tot
  FROM {last}
)
SELECT it[CAST(u.r AS INTEGER)] AS channel,
       ROUND(base, {round_to}) AS base_conv,
       ROUND(vs[CAST(u.r AS INTEGER) + 1][CAST(m AS INTEGER) + 2], {round_to})
         AS removed_conv,
       ROUND(base - vs[CAST(u.r AS INTEGER) + 1][CAST(m AS INTEGER) + 2],
             {round_to}) AS removal_effect,
       ROUND(CASE WHEN tot > 0 THEN
         (base - vs[CAST(u.r AS INTEGER) + 1][CAST(m AS INTEGER) + 2]) / tot
       END, {round_to}) AS share
FROM fin, UNNEST(range(1, m + 1)) AS u(r)
"""
    )


def shapley_attribution(
    touches: DataFrame,
    unit_col: str,
    channel_col: str,
    round_to: int = 6,
    max_channels: int = 12,
) -> DataFrame:
    """Exact Shapley-value channel attribution over converted units —
    the game-theoretic sibling of :func:`markov_attribution` (Markov
    credits by removal effect on a path chain; Shapley credits each
    channel its average marginal contribution over every coalition
    order, the only attribution satisfying efficiency + symmetry):

        φ_c = Σ_{S ⊆ C∖{c}} |S|!·(k−1−|S|)!/k! · [v(S∪{c}) − v(S)],

    with the standard marketing characteristic function
    v(S) = #units whose touched-channel set ⊆ S (units that would
    still have converted with only S available).

    Exactness AND scale: the corpus reduces to ≤2^k MASK COUNTS (one
    distinct + one aggregation — the only passes over the data);
    v(·), every marginal difference, and the k!-scaled credits are
    exact DECIMAL integers over the ≤2^k×2^k subset lattice (driver-
    free, a self-join on `(mask & S) = mask`), and φ_c is ONE pinned
    division by k!. ``k`` is measured and fail-fast capped at
    ``max_channels`` (the lattice is 4^k cells — 12 channels = 16M,
    fine; 30 would not be). Output per channel:
    ``(channel, shapley)``, ordered by channel; Σφ = #units with a
    non-empty touched set.
    """
    from pyspark.sql import Window

    chans = [
        r["_c"]
        for r in touches.select(F.col(channel_col).alias("_c"))
        .distinct()
        .orderBy("_c")
        .collect()
    ]
    k = len(chans)
    if k == 0:
        raise ValueError("shapley_attribution: no channels in input")
    if k > max_channels:
        raise ValueError(
            f"shapley_attribution: {k} channels exceeds max_channels="
            f"{max_channels} — the subset lattice is 4^k cells; bucket "
            "the channel taxonomy first"
        )
    spark = touches.sparkSession
    bits = spark.createDataFrame(
        [(c, 1 << i) for i, c in enumerate(chans)], ["_c", "_bit"]
    )
    masks = (
        touches.select(F.col(unit_col).alias("_u"), F.col(channel_col).alias("_c"))
        .distinct()
        .join(F.broadcast(bits), "_c")
        .groupBy("_u")
        .agg(F.sum("_bit").alias("_mask"))  # distinct bits: sum == OR
        .groupBy("_mask")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    subsets = spark.range(0, 1 << k).select(F.col("id").alias("_s"))
    from .dedup import _persist

    # persisted: v is ≤ 2^k rows but sits on top of the corpus-reducing
    # scan, and the marginal-difference self-join below reads it twice
    v = _persist(
        subsets.join(
            F.broadcast(masks),
            masks["_mask"].bitwiseAND(subsets["_s"]) == masks["_mask"],
            "left",
        )
        .groupBy("_s")
        .agg(F.coalesce(F.sum("_cnt"), F.lit(0)).alias("_v"))
    )
    # factorial weights as exact literals (k ≤ 12 → fits long); ONE
    # plan for all channels — the chan×lattice joins reuse the single
    # corpus-reducing `v` subtree instead of re-scanning per channel
    import math

    fact = [math.factorial(i) for i in range(k + 1)]
    wexpr = F.element_at(
        F.array(*[F.lit(fact[s] * fact[k - 1 - s]) for s in range(k)]),
        (F.bit_count(F.col("_s0")) + 1).cast("int"),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    v0 = v.select(F.col("_s").alias("_s0"), F.col("_v").alias("_v0"))
    v1 = v.select(F.col("_s").alias("_s1"), F.col("_v").alias("_v1"))
    pairs = (
        F.broadcast(bits)
        .join(v0, v0["_s0"].bitwiseAND(F.col("_bit")) == 0)
        .join(v1, F.col("_s1") == F.col("_s0") + F.col("_bit"))
    )
    return (
        pairs.groupBy(F.col("_c").alias("channel"))
        .agg(
            F.sum(dec(F.col("_v1") - F.col("_v0")) * dec(wexpr)).alias("_num")
        )
        .select(
            "channel",
            F.round(
                F.col("_num").cast("double") / F.lit(float(fact[k])), round_to
            ).alias("shapley"),
        )
        .orderBy("channel")
    )


def shapley_attribution_oracle_sql(
    touches_sql: str,
    unit_col: str,
    channel_col: str,
    round_to: int = 6,
    max_channels: int = 12,
) -> str:
    """DuckDB twin: same mask counts, same subset lattice joined on
    `(mask & S) = mask`, same factorial-weighted exact integer credits
    and single k! division. k is derived in SQL, but the lattice range
    needs a CONSTANT bound (DuckDB table functions reject subquery
    args) — it is ``2^max_channels``, which must match the Spark
    call's ``max_channels`` (both default 12). A SQL-side guard
    errors (rather than silently truncating the lattice) if the data
    carries more channels than the bound."""
    lattice = 1 << max_channels
    return f"""
WITH t AS MATERIALIZED (
  SELECT DISTINCT {unit_col} AS _u, {channel_col} AS _c FROM ({touches_sql})
),
chan AS MATERIALIZED (
  SELECT _c, CAST(1 AS BIGINT) << (CAST(row_number() OVER (ORDER BY _c) AS INTEGER) - 1) AS _bit,
         CAST(row_number() OVER (ORDER BY _c) AS BIGINT) - 1 AS _i
  FROM (SELECT DISTINCT _c FROM t)
),
kk AS (SELECT CASE WHEN COUNT(*) > {max_channels}
              THEN CAST(error('shapley_attribution oracle: ' || COUNT(*)
                   || ' channels exceeds max_channels={max_channels} — the '
                   || 'constant lattice bound would silently truncate') AS BIGINT)
              ELSE CAST(COUNT(*) AS BIGINT) END AS k FROM chan),
masks AS MATERIALIZED (
  SELECT _mask, CAST(COUNT(*) AS BIGINT) AS _cnt FROM (
    SELECT t._u, CAST(SUM(c._bit) AS BIGINT) AS _mask
    FROM t JOIN chan c USING (_c) GROUP BY t._u
  ) GROUP BY _mask
),
subsets AS (
  -- constant-bound range (table functions can't take subqueries),
  -- filtered to the real 2^k lattice; bound = 2^max_channels, and kk
  -- errors first whenever k would exceed it
  SELECT CAST(r.range AS BIGINT) AS _s
  FROM range(0, {lattice}) r
  WHERE r.range < CAST(power(2, (SELECT k FROM kk)) AS BIGINT)
),
v AS MATERIALIZED (
  SELECT s._s, CAST(COALESCE(SUM(m._cnt), 0) AS BIGINT) AS _v
  FROM subsets s LEFT JOIN masks m ON (m._mask & s._s) = m._mask
  GROUP BY s._s
)
SELECT c._c AS channel,
       ROUND(CAST(SUM(CAST(v1._v - v0._v AS HUGEINT)
                      * CAST(factorial(CAST(bit_count(v0._s) AS INTEGER)) AS HUGEINT)
                      * CAST(factorial(CAST((SELECT k FROM kk) - 1 - bit_count(v0._s) AS INTEGER)) AS HUGEINT))
                  AS DOUBLE)
             / CAST(factorial(CAST((SELECT k FROM kk) AS INTEGER)) AS DOUBLE),
             {round_to}) AS shapley
FROM chan c
JOIN v v0 ON (v0._s & c._bit) = 0
JOIN v v1 ON v1._s = v0._s + c._bit
GROUP BY c._c
ORDER BY c._c
"""
