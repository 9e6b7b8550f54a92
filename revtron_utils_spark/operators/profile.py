"""Table profiling — per-column statistics in ONE aggregation pass
(null counts, distinct estimates, numeric min/max/mean, string lengths),
the data-quality sweep a pipeline runs before training ingestion.

Everything folds into a single ``agg`` so Spark computes the whole
profile in one scan + one reduce regardless of column count — never one
job per column. Distinct counts default to HLL++ (``approx_distinct``)
because exact per-column distincts are the scan-dominating cost at
100 TB; pass ``approx_distinct=False`` for oracle-exact profiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .guards import integral_long

_NUMERIC = (T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType, T.ShortType)


def profile_table(df: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """One row per column: name, type, n_nulls, null_rate, n_distinct
    (approximate by default), and for numeric columns min/max/mean, for
    strings min/max length. Single scan, single reduce."""
    n_col = F.count(F.lit(1))
    aggs = [n_col.alias("__n")]
    specs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        prefix = f.name
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{prefix}__nulls"))
        distinct = (
            F.approx_count_distinct(f.name)
            if approx_distinct
            else F.countDistinct(f.name)
        )
        aggs.append(distinct.alias(f"{prefix}__distinct"))
        if isinstance(f.dataType, _NUMERIC):
            aggs += [
                F.min(c).cast("double").alias(f"{prefix}__min"),
                F.max(c).cast("double").alias(f"{prefix}__max"),
                F.round(F.avg(c), 6).alias(f"{prefix}__mean"),
            ]
            kind = "numeric"
        elif isinstance(f.dataType, T.StringType):
            aggs += [
                F.min(F.length(c)).cast("double").alias(f"{prefix}__min"),
                F.max(F.length(c)).cast("double").alias(f"{prefix}__max"),
                F.lit(None).cast("double").alias(f"{prefix}__mean"),
            ]
            kind = "string_len"
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{prefix}__min"),
                F.lit(None).cast("double").alias(f"{prefix}__max"),
                F.lit(None).cast("double").alias(f"{prefix}__mean"),
            ]
            kind = "other"
        # normalize engine-specific spellings (Spark reads non-UTC
        # parquet timestamps as timestamp_ntz)
        dtype = f.dataType.simpleString().replace("timestamp_ntz", "timestamp")
        specs.append((f.name, dtype, kind))

    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n"]
    out = [
        {
            "column": name,
            "dtype": dtype,
            "stat_kind": kind,
            "n_rows": n,
            "n_nulls": row[f"{name}__nulls"],
            "null_rate": round(row[f"{name}__nulls"] / n, 6) if n else None,
            "n_distinct": row[f"{name}__distinct"],
            "min": row[f"{name}__min"],
            "max": row[f"{name}__max"],
            "mean": row[f"{name}__mean"],
        }
        for name, dtype, kind in specs
    ]
    spark = df.sparkSession
    schema = (
        "column string, dtype string, stat_kind string, n_rows bigint, n_nulls bigint, "
        "null_rate double, n_distinct bigint, min double, max double, mean double"
    )
    return spark.createDataFrame(out, schema)


def grouped_linreg(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares fit ``y ≈ slope·x + intercept``
    with ``r2`` — the one-pass closed form over the five moment sums,
    map-side combined like any hash aggregate (no per-group
    collection, no second scan).

    Engine-exact determinism: ``x_col``/``y_col`` must be INTEGRAL so
    the distributed sums are exact integers (Σx² / Σxy / Σy² are summed
    as DECIMAL(38,0) — int64 would overflow at ~10⁶ rows of 10⁷-unit
    values; Spark's decimal sum and the oracle's HUGEINT sum are both
    exact, and both cast to double with one correctly-rounded
    conversion). The closed-form float math is a fixed expression of
    exactly-rounded IEEE ops, so results hash-match a SQL oracle.

    Degenerate groups (zero x-variance) return NULL slope/intercept/r2
    rather than dividing by zero.
    """
    by = list(by or [])
    for c in (x_col, y_col):
        dt = dict(zip(df.schema.names, [f.dataType.simpleString() for f in df.schema.fields]))[c]
        if dt not in ("tinyint", "smallint", "int", "bigint", "long"):
            raise ValueError(
                f"grouped_linreg needs integral columns for exact sums; got {c}: {dt}"
            )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = df.filter(x.isNotNull() & y.isNotNull())
    agg = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((x * y).cast("decimal(38,0)")).alias("_sxy"),
        F.sum((y * y).cast("decimal(38,0)")).alias("_syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    # fixed-order expressions, textually mirrored by the oracle:
    # cov_n = n·Σxy − Σx·Σy ; varx_n = n·Σxx − Σx·Σx ; vary_n likewise
    cov_n = nd * sxy - sx * sy
    varx_n = nd * sxx - sx * sx
    vary_n = nd * syy - sy * sy
    slope = cov_n / varx_n
    intercept = (sy - (cov_n / varx_n) * sx) / nd
    r2 = (cov_n * cov_n) / (varx_n * vary_n)
    guard = varx_n > 0
    return agg.select(
        *by,
        "n",
        F.round(F.when(guard, slope), round_to).alias("slope"),
        F.round(F.when(guard, intercept), round_to).alias("intercept"),
        F.round(F.when(guard & (vary_n > 0), r2), round_to).alias("r2"),
    )


def grouped_linreg_oracle_sql(
    table_expr: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`grouped_linreg`: HUGEINT-exact sums, the
    same fixed-order float expressions."""
    by = list(by or [])
    gc = ", ".join(by)
    gsel = f"{gc}, " if by else ""
    gby = f"GROUP BY {gc}" if by else ""
    return f"""
WITH a AS (
  SELECT {gsel}CAST(COUNT(*) AS BIGINT) AS n,
         SUM({x_col}) AS sx, SUM({y_col}) AS sy,
         SUM({x_col} * {x_col}) AS sxx,
         SUM({x_col} * {y_col}) AS sxy,
         SUM({y_col} * {y_col}) AS syy
  FROM {table_expr}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
  {gby}
), d AS (
  SELECT {gsel}n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM a
)
SELECT {gsel}n,
       ROUND(CASE WHEN varx_n > 0 THEN cov_n / varx_n END, {round_to}) AS slope,
       ROUND(CASE WHEN varx_n > 0
             THEN (syd - (cov_n / varx_n) * sxd) / CAST(n AS DOUBLE) END, {round_to}) AS intercept,
       ROUND(CASE WHEN varx_n > 0 AND vary_n > 0
             THEN (cov_n * cov_n) / (varx_n * vary_n) END, {round_to}) AS r2
FROM d
"""


def contingency_chi2(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square contribution table for a two-way contingency:
    observed counts, independence-expected counts ``row_tot·col_tot/N``,
    and per-cell ``(O−E)²/E`` — the categorical drift/independence
    screen (e.g. does the label distribution shift across sources?).
    Summing ``chi2_term`` gives the statistic with
    ``(rows−1)(cols−1)`` degrees of freedom.

    One count aggregate + two O(categories) broadcast joins; all counts
    are exact integers and the float math is a fixed expression, so the
    table hash-matches a SQL oracle. Cells absent from the data (O=0
    but both margins positive) are included via the margin cross join —
    their ``(0−E)²/E = E`` contribution is part of the statistic.
    """
    base = df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    cells = base.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("observed"))
    rows = base.groupBy(row_col).agg(F.count(F.lit(1)).alias("_rt"))
    cols = base.groupBy(col_col).agg(F.count(F.lit(1)).alias("_ct"))
    n = base.agg(F.count(F.lit(1)).alias("_n"))
    full = (
        rows.crossJoin(F.broadcast(cols))
        .join(F.broadcast(cells), [row_col, col_col], "left")
        .crossJoin(F.broadcast(n))
        .withColumn("observed", F.coalesce(F.col("observed"), F.lit(0)))
    )
    # fixed order: (rt·ct)/n with the numerator an exact int64 product
    # (rt, ct ≤ n ≤ 3e9 keeps rt·ct < 2^63; cast to double once)
    expected = (F.col("_rt") * F.col("_ct")).cast("double") / F.col("_n").cast("double")
    dev = F.col("observed").cast("double") - expected
    return full.select(
        row_col,
        col_col,
        "observed",
        F.round(expected, round_to).alias("expected"),
        F.round(dev * dev / expected, round_to).alias("chi2_term"),
    )


def contingency_chi2_oracle_sql(
    table_expr: str, row_col: str, col_col: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`contingency_chi2`."""
    return f"""
WITH b AS (
  SELECT {row_col} AS r, {col_col} AS c FROM {table_expr}
  WHERE {row_col} IS NOT NULL AND {col_col} IS NOT NULL
), cells AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS observed FROM b GROUP BY r, c),
rt AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS rtot FROM b GROUP BY r),
ct AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS ctot FROM b GROUP BY c),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
grid AS (
  SELECT rt.r, ct.c, COALESCE(cells.observed, 0) AS observed, rt.rtot, ct.ctot, nn.n
  FROM rt CROSS JOIN ct
  LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
  CROSS JOIN nn
)
SELECT r AS {row_col}, c AS {col_col}, observed,
       ROUND(CAST(rtot * ctot AS DOUBLE) / CAST(n AS DOUBLE), {round_to}) AS expected,
       ROUND((CAST(observed AS DOUBLE) - CAST(rtot * ctot AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(observed AS DOUBLE) - CAST(rtot * ctot AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rtot * ctot AS DOUBLE) / CAST(n AS DOUBLE)), {round_to}) AS chi2_term
FROM grid
"""


def rolling_zscore(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: list[str] | None = None,
    window: int = 7,
    min_history: int = 3,
    value_scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Daily-series anomaly screen: per group, each day's total scored
    against the TRAILING ``window`` days (excluding the current day —
    an anomaly must not inflate its own baseline): ``z = (x − μ) /
    σ``, with μ/σ from the window's exact integer sums. Days with
    fewer than ``min_history`` prior days get NULL z (cold start).

    The volume/traffic drift alarm every ingestion pipeline runs.
    Values are quantized to ``1/value_scale`` units so every
    distributed and window sum is an exact integer (squares summed as
    DECIMAL(38,0) — a day's scaled total squared overflows int64 at
    realistic volume); σ uses the unbiased estimator and one
    exactly-rounded sqrt, so output hash-matches a SQL oracle.

    One shuffle to daily grain (map-side combined), then an
    O(groups × days) window — the window input is the DAILY table, so
    its size is calendar-bounded regardless of event volume.

    Returns ``(*by, day_us, daily_total, z)``.
    """
    from pyspark.sql import Window

    by = list(by or [])
    day = F.date_trunc("DAY", F.col(ts_col).cast("timestamp"))
    q = F.round(F.col(value_col) * value_scale).cast("long")
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by, F.unix_micros(day).alias("day_us"))
        .agg(F.sum(q).alias("_x"))
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("day_us")
        .rowsBetween(-window, -1)
    )
    n = F.count(F.col("_x")).over(w)
    s = F.sum(F.col("_x")).over(w)
    s2 = F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,0)")).over(w)
    nd = n.cast("double")
    mean = s.cast("double") / nd
    # unbiased variance from exact sums: (n·Σx² − (Σx)²) / (n·(n−1))
    var = (nd * s2.cast("double") - s.cast("double") * s.cast("double")) / (
        nd * (nd - 1)
    )
    z = (F.col("_x").cast("double") - mean) / F.sqrt(var)
    return daily.select(
        *by,
        "day_us",
        F.round(F.col("_x").cast("double") / value_scale, round_to).alias("daily_total"),
        F.round(
            F.when((n >= min_history) & (var > 0), z), round_to
        ).alias("z"),
    )


def token_diversity(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Lexical-diversity profile per group — the corpus-health signal
    behind "is this domain template spam or real prose":

    - ``n_tokens`` (N), ``n_types`` (V): totals and distinct tokens,
    - ``ttr = V / N``: type-token ratio,
    - ``simpson``: the unbiased Gini-Simpson index
      ``1 − Σ_t c_t·(c_t−1) / (N·(N−1))`` — the probability two tokens
      drawn WITHOUT replacement differ. 0 for a one-word group, → 1 for
      maximally diverse text; unlike entropy it needs no logarithm, so
      every quantity here is an exact integer sum plus ONE
      exactly-rounded IEEE division — hash-comparable across engines.

    Physical shape: tokenize (JVM expressions) → one partial-aggregated
    shuffle on (group, token) for the per-token counts → one O(groups)
    rollup. Token-count skew (stopwords) is absorbed by the map-side
    combine; nothing collects. NULL/empty documents contribute nothing.

    No counterpart in the reference (its text surface is SOQL strings);
    part of the text-analysis extension.
    """
    from ..functions.text import tokens

    tok = df.select(
        *group_cols, F.explode(tokens(F.col(text_col))).alias("_t")
    )
    counts = tok.groupBy(*group_cols, "_t").agg(F.count(F.lit(1)).alias("_c"))
    agg = counts.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("_c") * (F.col("_c") - 1)).alias("_rep2"),
    )
    n = F.col("n_tokens")
    nd = n.cast("double")
    simpson = F.when(
        n > 1,
        F.lit(1.0) - F.col("_rep2").cast("double") / (nd * (nd - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    return agg.select(
        *group_cols,
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / nd, round_to).alias("ttr"),
        F.round(simpson, round_to).alias("simpson"),
    )


def token_diversity_oracle_sql(
    table: str, group_cols: list[str], text_col: str = "text", round_to: int = 6
) -> str:
    """DuckDB twin: same tokenizer, same integer sums, same divisions."""
    gc = ", ".join(group_cols)
    return rf"""
WITH tok AS (
  SELECT {gc},
         unnest(list_filter(string_split_regex(trim({text_col}), '\s+'),
                            t -> t <> '')) AS t
  FROM {table}
), c AS (
  SELECT {gc}, t, COUNT(*) AS c FROM tok GROUP BY {gc}, t
), a AS (
  SELECT {gc}, SUM(c) AS n_tokens, CAST(COUNT(*) AS BIGINT) AS n_types,
         SUM(c * (c - 1)) AS rep2
  FROM c GROUP BY {gc}
)
SELECT {gc}, n_tokens, n_types,
       ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), {round_to}) AS ttr,
       ROUND(CASE WHEN n_tokens > 1
             THEN 1.0 - CAST(rep2 AS DOUBLE)
                  / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
             ELSE 0.0 END, {round_to}) AS simpson
FROM a
"""


def vocab_drift(
    df: DataFrame,
    slice_col: str,
    slice_a: str,
    slice_b: str,
    text_col: str = "text",
    top_k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Distribution shift between two corpus slices, log-free: the
    total-variation distance between their token distributions plus the
    ``top_k`` most-divergent tokens — the drift readout you run when a
    new crawl snapshot or source lands (KL/JS need logarithms whose
    libm rounding differs across engines; TVD is
    ``Σ_t |c_a·N_b − c_b·N_a| / (2·N_a·N_b)`` — an exact DECIMAL
    integer sum and ONE float division, so the readout hash-matches
    SQL).

    Output: ``(token, c_a, c_b, contrib, tvd, rank)`` — per-token
    contribution to the distance, the corpus-level TVD repeated on each
    row (broadcast scalar), ranked by exact numerator descending
    (token ascending tie-break). Plan: tokenize → ONE (token)
    partial-aggregated shuffle with conditional counts → single-row
    totals broadcast → TakeOrdered top-k; nothing driver-side scales
    with the vocabulary.
    """
    from ..functions.text import tokens
    from pyspark.sql import Window

    base = df.where(F.col(slice_col).isin([slice_a, slice_b])).select(
        F.col(slice_col).alias("_s"), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    counts = base.groupBy("_t").agg(
        F.sum(F.when(F.col("_s") == slice_a, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("_s") == slice_b, 1).otherwise(0)).alias("c_b"),
    )
    # |c_a·N_b − c_b·N_a| exactly: DECIMAL products (int64 would wrap at
    # c·N ≈ 2^63 — reachable at 100-TB token counts), DECIMAL sum
    totals = counts.agg(
        F.sum("c_a").alias("_na"), F.sum("c_b").alias("_nb")
    )
    num = F.abs(
        F.col("c_a").cast("decimal(18,0)") * F.col("_nb").cast("decimal(18,0)")
        - F.col("c_b").cast("decimal(18,0)") * F.col("_na").cast("decimal(18,0)")
    ).alias("_num")
    scored = counts.join(F.broadcast(totals)).select(
        "_t", "c_a", "c_b", "_na", "_nb", num
    )
    tvd_row = scored.agg(
        F.sum("_num").alias("_sum_num"),
        F.first("_na").alias("_na"),
        F.first("_nb").alias("_nb"),
    ).select(
        F.round(
            # an empty slice leaves TVD undefined (0/0) — NULL, not a
            # NaN/inf whose rendering the engines could disagree on
            F.when(
                (F.col("_na") > 0) & (F.col("_nb") > 0),
                F.col("_sum_num").cast("double")
                / (F.lit(2.0) * F.col("_na").cast("double") * F.col("_nb").cast("double")),
            ),
            round_to,
        ).alias("tvd")
    )
    top = scored.orderBy(F.col("_num").desc(), F.col("_t").asc()).limit(top_k)
    ranked = top.join(F.broadcast(tvd_row)).withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("_num").desc(), F.col("_t").asc())),
    )
    return ranked.select(
        F.col("_t").alias("token"),
        "c_a",
        "c_b",
        F.round(
            F.when(
                (F.col("_na") > 0) & (F.col("_nb") > 0),
                F.col("_num").cast("double")
                / (F.lit(2.0) * F.col("_na").cast("double") * F.col("_nb").cast("double")),
            ),
            round_to,
        ).alias("contrib"),
        "tvd",
        "rank",
    )


def vocab_drift_oracle_sql(
    table: str,
    slice_col: str,
    slice_a: str,
    slice_b: str,
    text_col: str = "text",
    top_k: int = 20,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same tokenizer, HUGEINT-exact numerators, same
    single division and (numerator DESC, token ASC) rank."""
    return rf"""
WITH tok AS (
  SELECT {slice_col} AS s,
         unnest(list_filter(string_split_regex(trim({text_col}), '\s+'),
                            t -> t <> '')) AS t
  FROM {table} WHERE {slice_col} IN ('{slice_a}', '{slice_b}')
), c AS (
  SELECT t, SUM(CASE WHEN s = '{slice_a}' THEN 1 ELSE 0 END) AS c_a,
         SUM(CASE WHEN s = '{slice_b}' THEN 1 ELSE 0 END) AS c_b
  FROM tok GROUP BY t
), tt AS (SELECT SUM(c_a) AS na, SUM(c_b) AS nb FROM c),
sc AS (
  SELECT c.t, c.c_a, c.c_b, tt.na, tt.nb,
         ABS(CAST(c.c_a AS HUGEINT) * CAST(tt.nb AS HUGEINT)
             - CAST(c.c_b AS HUGEINT) * CAST(tt.na AS HUGEINT)) AS num
  FROM c CROSS JOIN tt
), tv AS (
  SELECT ROUND(CASE WHEN ANY_VALUE(na) > 0 AND ANY_VALUE(nb) > 0 THEN
               CAST(SUM(num) AS DOUBLE)
               / (2.0 * CAST(ANY_VALUE(na) AS DOUBLE) * CAST(ANY_VALUE(nb) AS DOUBLE))
               END, {round_to}) AS tvd
  FROM sc
), r AS (
  SELECT t, c_a, c_b, na, nb, num,
         ROW_NUMBER() OVER (ORDER BY num DESC, t ASC) AS rank
  FROM sc
)
SELECT r.t AS token, r.c_a, r.c_b,
       ROUND(CASE WHEN r.na > 0 AND r.nb > 0 THEN CAST(r.num AS DOUBLE)
             / (2.0 * CAST(r.na AS DOUBLE) * CAST(r.nb AS DOUBLE)) END, {round_to}) AS contrib,
       tv.tvd, CAST(r.rank AS INT) AS rank
FROM r CROSS JOIN tv WHERE r.rank <= {top_k}
"""


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation with average ranks for ties —
    the scorer-agreement readout (how consistently do two quality
    signals order the same corpus?). Engine-exact: the average rank
    ``RANK() + (ties−1)/2`` is kept integral by DOUBLING it
    (``2·RANK() + ties − 1``; Pearson is affine-invariant, so rho is
    unchanged), the five moment sums accumulate in DECIMAL(38,0), and
    the closed form is the fixed expression of `grouped_linreg` —
    hash-matches SQL. Constant-valued sides (zero rank variance) return
    NULL.

    Plan: two rank windows per group (each one shuffle on the group
    key — the second reuses the first's partitioning) + one map-side-
    combined moment aggregation.
    """
    from pyspark.sql import Window

    by = list(by or [])
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    wx = Window.partitionBy(*by).orderBy(F.col(x_col).asc())
    wy = Window.partitionBy(*by).orderBy(F.col(y_col).asc())
    tx = Window.partitionBy(*by, x_col)
    ty = Window.partitionBy(*by, y_col)
    ranked = base.select(
        *by,
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(tx) - 1).alias("_rx"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(ty) - 1).alias("_ry"),
    )
    rx = F.col("_rx").cast("long")
    ry = F.col("_ry").cast("long")
    agg = ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rx).alias("_sx"),
        F.sum(ry).alias("_sy"),
        F.sum((rx * rx).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((rx * ry).cast("decimal(38,0)")).alias("_sxy"),
        F.sum((ry * ry).cast("decimal(38,0)")).alias("_syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov_n = nd * F.col("_sxy").cast("double") - sx * sy
    varx_n = nd * F.col("_sxx").cast("double") - sx * sx
    vary_n = nd * F.col("_syy").cast("double") - sy * sy
    rho = cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n))
    return agg.select(
        *by,
        "n",
        F.round(F.when((varx_n > 0) & (vary_n > 0), rho), round_to).alias("rho"),
    )


def spearman_corr_oracle_sql(
    table_expr: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: identical doubled average ranks, HUGEINT-exact
    moment sums, same fixed-order float expression."""
    by = list(by or [])
    gc = ", ".join(by)
    gsel = f"{gc}, " if by else ""
    gby = f"GROUP BY {gc}" if by else ""
    pb = f"PARTITION BY {gc}" if by else ""
    pbx = f"PARTITION BY {gc + ', ' if by else ''}{x_col}"
    pby = f"PARTITION BY {gc + ', ' if by else ''}{y_col}"
    return f"""
WITH b AS (
  SELECT * FROM {table_expr}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
), rk AS (
  SELECT {gsel}
         2 * RANK() OVER ({pb} ORDER BY {x_col} ASC) + COUNT(*) OVER ({pbx}) - 1 AS rx,
         2 * RANK() OVER ({pb} ORDER BY {y_col} ASC) + COUNT(*) OVER ({pby}) - 1 AS ry
  FROM b
), a AS (
  SELECT {gsel}CAST(COUNT(*) AS BIGINT) AS n,
         SUM(rx) AS sx, SUM(ry) AS sy,
         SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
         SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
         SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
  FROM rk {gby}
), d AS (
  SELECT {gsel}n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n
  FROM a
)
SELECT {gsel}n,
       ROUND(CASE WHEN varx_n > 0 AND vary_n > 0
             THEN cov_n / (sqrt(varx_n) * sqrt(vary_n)) END, {round_to}) AS rho
FROM d
"""


def vocab_richness(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Vocabulary-richness projection per group — "how much vocabulary
    have we NOT seen yet" for a corpus slice, from the frequency of
    rare tokens:

    - ``n_tokens`` (N), ``n_types`` (V), ``f1`` (hapaxes), ``f2``
      (tokens seen exactly twice),
    - ``chao1``: the bias-corrected Chao1 richness estimate
      ``V + f1·(f1−1) / (2·(f2+1))`` (defined even when f2 = 0 — the
      reason this form is pinned over the classic ``f1²/2f2``),
    - ``oov_mass``: the Good-Turing unseen-probability estimate
      ``f1 / N`` — the chance the NEXT token drawn is a new type.

    Every quantity is an exact integer (f1·(f1−1) in DECIMAL — hapax
    counts at 100-TB scale square past int64) plus one exactly-rounded
    division each, so the readout hash-matches SQL. Plan: one
    (group, token) partial-aggregated shuffle → one O(groups) rollup —
    `token_diversity`'s shape, measuring the opposite tail.
    """
    from ..functions.text import tokens

    tok = df.select(*group_cols, F.explode(tokens(F.col(text_col))).alias("_t"))
    counts = tok.groupBy(*group_cols, "_t").agg(F.count(F.lit(1)).alias("_c"))
    agg = counts.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).alias("f2"),
    )
    f1 = F.col("f1").cast("decimal(18,0)")
    chao1 = F.col("n_types").cast("double") + (
        (f1 * (f1 - 1)).cast("double")
        / (F.lit(2.0) * (F.col("f2").cast("double") + F.lit(1.0)))
    )
    return agg.select(
        *group_cols,
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        F.round(chao1, round_to).alias("chao1"),
        F.round(
            F.col("f1").cast("double") / F.col("n_tokens").cast("double"), round_to
        ).alias("oov_mass"),
    )


def vocab_richness_oracle_sql(
    table: str, group_cols: list[str], text_col: str = "text", round_to: int = 6
) -> str:
    """DuckDB twin: same tokenizer, HUGEINT hapax product, same pinned
    bias-corrected Chao1 form."""
    gc = ", ".join(group_cols)
    return rf"""
WITH tok AS (
  SELECT {gc},
         unnest(list_filter(string_split_regex(trim({text_col}), '\s+'),
                            t -> t <> '')) AS t
  FROM {table}
), c AS (
  SELECT {gc}, t, COUNT(*) AS c FROM tok GROUP BY {gc}, t
), a AS (
  SELECT {gc}, SUM(c) AS n_tokens, CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM c GROUP BY {gc}
)
SELECT {gc}, n_tokens, n_types, f1, f2,
       ROUND(CAST(n_types AS DOUBLE)
             + CAST(CAST(f1 AS HUGEINT) * (CAST(f1 AS HUGEINT) - 1) AS DOUBLE)
               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), {round_to}) AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), {round_to}) AS oov_mass
FROM a
"""


def concentration_gini(
    df: DataFrame,
    key_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Gini coefficient of the per-key row-count distribution — the
    one-number "is one domain/source eating the corpus" concentration
    readout (0 = perfectly even, → 1 = one key holds everything). With
    counts ``c_i`` sorted ascending (deterministic (count, key) order)
    and 1-based rank ``i``:

        G = (2·Σ i·c_i − (n+1)·Σ c) / (n·Σ c)

    Exact integers end-to-end (rank-weighted sums in DECIMAL — i·c
    wraps int64 when both run corpus-scale) and ONE division, so the
    scalar hash-matches SQL. Plan: one key-count shuffle, then the
    rank over the counts frame runs as `curation.distributed_rank`'s
    two-pass range-partitioned row_number — the counts frame is one
    row per DISTINCT key, which for domain/source keys is
    corpus-driven (millions), so a bare unpartitioned window would
    single-task-sort it. One final aggregate. Output one row:
    ``(n_keys, n_rows, gini)``.
    """
    from .curation import distributed_rank

    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    order = [F.col("c").asc()] + [F.col(k).asc() for k in keys]
    ranked = distributed_rank(counts, order, rank_col="i").select("c", "i")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.sum(
            (F.col("i").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)"))
        ).alias("_ic"),
    )
    nd = F.col("n_keys").cast("double")
    sc = F.col("n_rows").cast("double")
    gini = (
        F.lit(2.0) * F.col("_ic").cast("double") - (nd + F.lit(1.0)) * sc
    ) / (nd * sc)
    return agg.select(
        "n_keys",
        "n_rows",
        F.round(F.when(F.col("n_rows") > 0, gini), round_to).alias("gini"),
    )


def concentration_gini_oracle_sql(
    table_expr: str, key_cols: list[str], round_to: int = 6
) -> str:
    """DuckDB twin: same deterministic rank order, HUGEINT rank-weighted
    sum, same single division."""
    keys = list(key_cols)
    gc = ", ".join(keys)
    tb = ", ".join(f"{k} ASC" for k in keys)
    return f"""
WITH c AS (SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS c FROM {table_expr} GROUP BY {gc}),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, {tb}) AS i FROM c),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, SUM(c) AS n_rows,
         SUM(CAST(i AS HUGEINT) * CAST(c AS HUGEINT)) AS ic
  FROM r
)
SELECT n_keys, n_rows,
       ROUND(CASE WHEN n_rows > 0 THEN
         (2.0 * CAST(ic AS DOUBLE)
          - (CAST(n_keys AS DOUBLE) + 1.0) * CAST(n_rows AS DOUBLE))
         / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)) END, {round_to}) AS gini
FROM a
"""


# Benford first-digit probabilities log10(1 + 1/d), d = 1..9 — literal
# constants so Spark and SQL evaluate identical doubles.
_BENFORD_P = tuple(__import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10))


def benford_deviation(
    df: DataFrame,
    value_col: str,
    by: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Benford's-law conformity per group — the chi-square distance of
    the FIRST-significant-digit distribution of a positive integer
    metric from log10(1 + 1/d), the classic fabricated/synthetic-data
    tripwire (a generated metric column rarely carries Benford's
    digit curve; a real multiplicative one does).

    χ² = Σ_d (c_d − n·p_d)² / (n·p_d) over all nine digits (absent
    digits contribute their full expectation — the counts frame is
    completed against a 9-digit spine). ``worst_digit`` is the digit
    with the largest |c_d − n·p_d| (tie → smallest digit), and
    ``worst_excess`` its signed observed−expected frequency gap
    (c_d/n − p_d, ONE division).

    Exact integer digit counts; expectations are literal-double
    products, so both engines evaluate the same IEEE expressions. One
    (group, digit) partial-agg shuffle + windows over the bounded
    9-row-per-group frame. Rows with value < 1 are ignored.
    """
    from pyspark.sql import Window

    keys = list(by)
    v = F.col(value_col)
    base = df.where(v >= 1).select(
        *keys, F.substring(v.cast("string"), 1, 1).cast("int").alias("_d")
    )
    counts = base.groupBy(*keys, "_d").agg(F.count(F.lit(1)).alias("_c"))
    spine = (
        base.select(*keys)
        .distinct()
        .select(*keys, F.explode(F.sequence(F.lit(1), F.lit(9))).alias("_d"))
    )
    full = spine.join(counts, [*keys, "_d"], "left").select(
        *keys, "_d", F.coalesce(F.col("_c"), F.lit(0)).alias("_c")
    )
    p = F.element_at(F.array(*[F.lit(x) for x in _BENFORD_P]), F.col("_d"))
    wall = Window.partitionBy(*keys)
    scored = full.select(
        *keys,
        "_d",
        "_c",
        F.sum("_c").over(wall).alias("_n"),
        p.alias("_p"),
    ).select(
        *keys,
        "_d",
        "_c",
        "_n",
        "_p",
        (F.col("_c").cast("double") - F.col("_n").cast("double") * F.col("_p")).alias(
            "_dev"
        ),
    )
    rank = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.abs(F.col("_dev")).desc(), F.col("_d"))
    )
    ranked = scored.withColumn("_r", rank)
    return (
        ranked.groupBy(*keys)
        .agg(
            F.max("_n").alias("n_values"),
            F.sum(
                F.col("_dev") * F.col("_dev") / (F.col("_n").cast("double") * F.col("_p"))
            ).alias("_chi2"),
            F.min(F.when(F.col("_r") == 1, F.col("_d"))).alias("worst_digit"),
            F.min(
                F.when(
                    F.col("_r") == 1,
                    F.col("_c").cast("double") / F.col("_n").cast("double")
                    - F.col("_p"),
                )
            ).alias("_worst"),
        )
        .select(
            *keys,
            "n_values",
            F.round(F.col("_chi2"), round_to).alias("chi2"),
            "worst_digit",
            F.round(F.col("_worst"), round_to).alias("worst_excess"),
        )
        .orderBy(*keys)
    )


def benford_deviation_oracle_sql(
    values_sql: str,
    value_col: str,
    by: list[str],
    round_to: int = 6,
) -> str:
    """DuckDB twin: same 9-digit spine completion, same literal
    expectations, same χ² terms and worst-digit pick."""
    keys = list(by)
    gc = ", ".join(keys)
    p_case = " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in zip(range(1, 10), _BENFORD_P)
    )
    return f"""
WITH vals AS ({values_sql}),
base AS (
  SELECT {gc}, CAST(SUBSTRING(CAST({value_col} AS VARCHAR), 1, 1) AS INTEGER) AS _d
  FROM vals WHERE {value_col} >= 1
),
counts AS (SELECT {gc}, _d, CAST(COUNT(*) AS BIGINT) AS _c FROM base GROUP BY {gc}, _d),
spine AS (
  SELECT {gc}, CAST(u._d AS INTEGER) AS _d
  FROM (SELECT DISTINCT {gc} FROM base), UNNEST(range(1, 10)) AS u(_d)
),
full_ AS (
  SELECT spine.*, COALESCE(_c, 0) AS _c
  FROM spine LEFT JOIN counts USING ({gc}, _d)
),
scored AS (
  SELECT {gc}, _d, _c,
         SUM(_c) OVER (PARTITION BY {gc}) AS _n,
         CASE _d {p_case} END AS _p
  FROM full_
),
dev AS (
  SELECT *, CAST(_c AS DOUBLE) - CAST(_n AS DOUBLE) * _p AS _dev,
         ROW_NUMBER() OVER (
           PARTITION BY {gc}
           ORDER BY ABS(CAST(_c AS DOUBLE) - CAST(_n AS DOUBLE) * _p) DESC, _d
         ) AS _r
  FROM scored
)
SELECT {gc}, CAST(MAX(_n) AS BIGINT) AS n_values,
       ROUND(SUM(_dev * _dev / (CAST(_n AS DOUBLE) * _p)), {round_to}) AS chi2,
       MIN(CASE WHEN _r = 1 THEN _d END) AS worst_digit,
       ROUND(MIN(CASE WHEN _r = 1
                 THEN CAST(_c AS DOUBLE) / CAST(_n AS DOUBLE) - _p END),
             {round_to}) AS worst_excess
FROM dev GROUP BY {gc}
"""


def hellinger_drift(
    df: DataFrame,
    bucket_col: str,
    slice_col,
    slice_a,
    slice_b,
    round_to: int = 6,
) -> DataFrame:
    """Hellinger distance between the ``bucket_col`` distributions of
    two slices — the numeric-feature companion to `vocab_drift`'s
    token TVD. KL/PSI/JS need logarithms (libm rounding differs across
    engines); Hellinger needs only ``sqrt``, which IEEE 754 requires to
    be EXACTLY rounded, so the readout is engine-deterministic:

        BC = Σ_b sqrt(c_a(b)·c_b(b)) / sqrt(N_a·N_b)
        H  = sqrt(1 − BC)            (0 = identical, 1 = disjoint)

    Buckets absent on one side contribute 0 naturally — none of PSI's
    ε-smoothing hacks. Exact integer counts, DECIMAL products (counts
    multiply past int64 at corpus scale), ONE division. Plan: one
    (bucket, slice) partial-agg shuffle; the bucket frame is bounded by
    the caller's bucketing (the value_histogram discipline). Output one
    row: ``(n_a, n_b, n_buckets_common, bc, hellinger)``.
    """
    s = F.col(slice_col)
    per = (
        df.where(s.isin(slice_a, slice_b))
        .groupBy(F.col(bucket_col).alias("_k"))
        .agg(
            F.sum(F.when(s == slice_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(s == slice_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    agg = per.agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        F.sum(((F.col("_ca") > 0) & (F.col("_cb") > 0)).cast("long")).alias(
            "n_buckets_common"
        ),
        F.sum(
            F.sqrt(
                (
                    F.col("_ca").cast("decimal(38,0)")
                    * F.col("_cb").cast("decimal(38,0)")
                ).cast("double")
            )
        ).alias("_sab"),
    )
    bc = F.col("_sab") / F.sqrt(
        (F.col("n_a").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)"))
        .cast("double")
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_buckets_common",
        F.round(bc, round_to).alias("bc"),
        F.round(F.sqrt(F.lit(1.0) - bc), round_to).alias("hellinger"),
    )


def hellinger_drift_oracle_sql(
    values_sql: str,
    bucket_col: str,
    slice_col: str,
    slice_a_sql: str,
    slice_b_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT products, same exactly-rounded sqrt,
    same single division. Slice literals are passed as SQL expressions
    (quote strings yourself)."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {bucket_col} AS _k,
         CAST(SUM(CASE WHEN {slice_col} = {slice_a_sql} THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
         CAST(SUM(CASE WHEN {slice_col} = {slice_b_sql} THEN 1 ELSE 0 END) AS BIGINT) AS _cb
  FROM vals WHERE {slice_col} IN ({slice_a_sql}, {slice_b_sql})
  GROUP BY {bucket_col}
),
agg AS (
  SELECT CAST(SUM(_ca) AS BIGINT) AS n_a, CAST(SUM(_cb) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN _ca > 0 AND _cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_buckets_common,
         SUM(SQRT(CAST(CAST(_ca AS HUGEINT) * CAST(_cb AS HUGEINT) AS DOUBLE)))
           AS _sab
  FROM per
)
SELECT n_a, n_b, n_buckets_common,
       ROUND(_sab / SQRT(CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)),
             {round_to}) AS bc,
       ROUND(SQRT(1.0 - _sab / SQRT(CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
                                          AS DOUBLE))),
             {round_to}) AS hellinger
FROM agg
"""


def cramers_v(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cramér's V — the [0, 1] effect-size normalization of
    :func:`contingency_chi2` (χ² alone grows with N, so "is this
    association big" needs V = sqrt(χ² / (N·(min(r,c)−1)))). Chosen
    over mutual information because sqrt is IEEE exactly-rounded while
    MI's logarithms are not — the same determinism argument as
    `hellinger_drift`.

    One pass through the chi2 contribution table (same two margin
    broadcasts), then one scalar aggregate. Output one row:
    ``(n, n_rows, n_cols, chi2, dof, v)`` (V NULL for degenerate 1×k
    tables).
    """
    terms = contingency_chi2(df, row_col, col_col, round_to=12)
    base = df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    n = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(row_col).alias("n_rows"),
        F.countDistinct(col_col).alias("n_cols"),
    )
    chi2 = terms.agg(F.sum("chi2_term").alias("_chi2"))
    joined = n.crossJoin(F.broadcast(chi2))
    k = F.least(F.col("n_rows"), F.col("n_cols")) - F.lit(1)
    dof = (F.col("n_rows") - F.lit(1)) * (F.col("n_cols") - F.lit(1))
    v = F.sqrt(
        F.col("_chi2") / (F.col("n").cast("double") * k.cast("double"))
    )
    return joined.select(
        "n",
        "n_rows",
        "n_cols",
        F.round(F.col("_chi2"), round_to).alias("chi2"),
        dof.cast("long").alias("dof"),
        F.round(F.when(k > 0, v), round_to).alias("v"),
    )


def cramers_v_oracle_sql(
    table_expr: str, row_col: str, col_col: str, round_to: int = 6
) -> str:
    """DuckDB twin: the contingency oracle's chi2 sum, same
    normalization and exactly-rounded sqrt."""
    chi2_sql = contingency_chi2_oracle_sql(table_expr, row_col, col_col, round_to=12)
    return f"""
WITH terms AS ({chi2_sql}),
base AS (SELECT * FROM {table_expr}
         WHERE {row_col} IS NOT NULL AND {col_col} IS NOT NULL),
nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT {row_col}) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT {col_col}) AS BIGINT) AS n_cols
  FROM base
),
c2 AS (SELECT SUM(chi2_term) AS _chi2 FROM terms)
SELECT n, n_rows, n_cols,
       ROUND(_chi2, {round_to}) AS chi2,
       CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
       ROUND(CASE WHEN LEAST(n_rows, n_cols) > 1 THEN
         SQRT(_chi2 / (CAST(n AS DOUBLE)
                       * CAST(LEAST(n_rows, n_cols) - 1 AS DOUBLE))) END,
         {round_to}) AS v
FROM nn CROSS JOIN c2
"""


def chapman_estimate(
    df: DataFrame,
    id_col: str,
    slice_col,
    slice_a,
    slice_b,
    round_to: int = 4,
) -> DataFrame:
    """Chapman capture-recapture population estimate — "how many unique
    ids exist in total, given two overlapping samples": the dedup-side
    question (two crawl snapshots share m documents → how big is the
    whole corpus) answered by mark-recapture statistics:

        N̂ = (n_a + 1)(n_b + 1) / (m + 1) − 1

    (Chapman's bias-corrected form of Lincoln-Petersen; exact for
    m = 0.) Exact distinct counts, DECIMAL product, ONE division. Plan:
    one distinct (id, membership-pair) aggregate. Output one row:
    ``(n_a, n_b, overlap, estimate)``.
    """
    s = F.col(slice_col)
    per = (
        df.where(s.isin(slice_a, slice_b))
        .groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.max((s == slice_a).cast("int")).alias("_a"),
            F.max((s == slice_b).cast("int")).alias("_b"),
        )
    )
    agg = per.agg(
        F.sum("_a").alias("n_a"),
        F.sum("_b").alias("n_b"),
        F.sum(F.col("_a") * F.col("_b")).alias("overlap"),
    )
    est = (
        (F.col("n_a") + 1).cast("decimal(38,0)")
        * (F.col("n_b") + 1).cast("decimal(38,0)")
    ).cast("double") / (F.col("overlap") + 1).cast("double") - F.lit(1.0)
    return agg.select(
        "n_a", "n_b", "overlap", F.round(est, round_to).alias("estimate")
    )


def chapman_estimate_oracle_sql(
    values_sql: str,
    id_col: str,
    slice_col: str,
    slice_a_sql: str,
    slice_b_sql: str,
    round_to: int = 4,
) -> str:
    """DuckDB twin: same distinct membership, HUGEINT product, one
    division."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {id_col} AS _id,
         MAX(CASE WHEN {slice_col} = {slice_a_sql} THEN 1 ELSE 0 END) AS _a,
         MAX(CASE WHEN {slice_col} = {slice_b_sql} THEN 1 ELSE 0 END) AS _b
  FROM vals WHERE {slice_col} IN ({slice_a_sql}, {slice_b_sql})
  GROUP BY {id_col}
),
agg AS (
  SELECT CAST(SUM(_a) AS BIGINT) AS n_a, CAST(SUM(_b) AS BIGINT) AS n_b,
         CAST(SUM(_a * _b) AS BIGINT) AS overlap
  FROM per
)
SELECT n_a, n_b, overlap,
       ROUND(CAST(CAST(n_a + 1 AS HUGEINT) * CAST(n_b + 1 AS HUGEINT) AS DOUBLE)
             / CAST(overlap + 1 AS DOUBLE) - 1.0, {round_to}) AS estimate
FROM agg
"""


def ks_test(
    df: DataFrame,
    bucket_col: str,
    slice_col,
    slice_a,
    slice_b,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance — the sup-norm companion
    to :func:`hellinger_drift` (Hellinger integrates the disagreement,
    KS finds the worst point of it):

        D = max_t |F_a(t) − F_b(t)|

    computed EXACTLY as max_t |cum_a(t)·n_b − cum_b(t)·n_a| over the
    caller-bounded bucket spine (DECIMAL cross products), then ONE
    division by n_a·n_b; the scaled statistic
    ``sqrt(n_a·n_b/(n_a+n_b))·D`` uses the exactly-rounded sqrt. The
    argmax location breaks ties toward the smallest bucket. Plan: one
    (bucket, slice) partial-agg shuffle + cumsum windows over the
    bounded histogram. Output one row: ``(n_a, n_b, ks_at, ks_d,
    ks_stat)``. The bounded-spine contract is enforced by
    ``guards.require_bounded_spine`` (fail fast instead of
    single-task-sorting an unbinned spine; ``max_buckets=None``
    vouches).
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "ks_test")
    s = F.col(slice_col)
    per = (
        df.where(s.isin(slice_a, slice_b))
        .groupBy(F.col(bucket_col).alias("_k"))
        .agg(
            F.sum(F.when(s == slice_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(s == slice_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    wcum = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("_k").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "_k",
        F.sum("_ca").over(wcum).alias("_cuma"),
        F.sum("_cb").over(wcum).alias("_cumb"),
        F.sum("_ca").over(wall).alias("_na"),
        F.sum("_cb").over(wall).alias("_nb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    diff = F.abs(
        dec(F.col("_cuma")) * dec(F.col("_nb"))
        - dec(F.col("_cumb")) * dec(F.col("_na"))
    )
    pick = Window.orderBy(F.col("_diff").desc(), F.col("_k").asc())
    best = (
        cum.withColumn("_diff", diff)
        .withColumn("_r", F.row_number().over(pick))
        .where(F.col("_r") == 1)
    )
    d = F.col("_diff").cast("double") / (
        dec(F.col("_na")) * dec(F.col("_nb"))
    ).cast("double")
    stat = (
        F.sqrt(
            (dec(F.col("_na")) * dec(F.col("_nb"))).cast("double")
            / (F.col("_na") + F.col("_nb")).cast("double")
        )
        * d
    )
    return best.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.col("_k").alias("ks_at"),
        F.round(d, round_to).alias("ks_d"),
        F.round(stat, round_to).alias("ks_stat"),
    )


def mann_whitney(
    df: DataFrame,
    bucket_col: str,
    slice_col,
    slice_a,
    slice_b,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
) -> DataFrame:
    """Two-sample Mann-Whitney U test with midrank tie correction —
    the rank-based companion to :func:`ks_test` (KS finds the worst
    CDF gap; MWU asks whether one sample is stochastically larger):

        U_a = R_a − n_a(n_a+1)/2,
        z = (U_a − n_a·n_b/2) / sqrt(Var U)   with the tie-corrected
        Var U = n_a·n_b/12 · [ (N+1) − Σ(t³−t)/(N(N−1)) ].

    Exactness (the DOUBLED-rank trick): over the caller-bounded value
    spine, the midrank of a tie group is (before + (t+1)/2) — a .5
    rational — so the plan carries 2·midrank = 2·before + t + 1, an
    INTEGER. The doubled rank sum Σ c_a·(2·before+t+1) and
    2U_a = ΣR2 − n_a(n_a+1) stay exact DECIMAL(38,0); the tie term
    Σ(t³−t) and (N+1)N(N−1) are DECIMAL (N³ < 10³⁸ up to 10¹² rows);
    the only float ops are the pinned final sequence
    ``num / (2·sqrt(varnum/varden))`` — token-identical in the oracle.
    z is NULL when the variance is 0 (every value tied). Output one
    row: ``(n_a, n_b, u_a, z)``; ``u_a`` is 2U_a/2 as a double (U can
    be a .5 multiple under midranks).

    The bounded-spine contract is enforced by
    ``guards.require_bounded_spine`` (callers bucket the metric first,
    exactly like `ks_test`; ``max_buckets=None`` vouches).
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "mann_whitney")
    s = F.col(slice_col)
    per = (
        df.where(s.isin(slice_a, slice_b))
        .groupBy(F.col(bucket_col).alias("_k"))
        .agg(
            F.sum(F.when(s == slice_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(s == slice_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    wcum = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = lambda c: c.cast("decimal(38,0)")
    t = F.col("_ca") + F.col("_cb")
    cum = per.select(
        "_k",
        "_ca",
        "_cb",
        t.alias("_t"),
        (F.sum(t).over(wcum) - t).alias("_before"),
    )
    agg = cum.agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.sum(
            dec(F.col("_ca"))
            * dec(F.lit(2) * F.col("_before") + F.col("_t") + F.lit(1))
        ).alias("_r2a"),
        F.sum(
            dec(F.col("_t")) * dec(F.col("_t")) * dec(F.col("_t"))
            - dec(F.col("_t"))
        ).alias("_ties"),
    )
    na, nb = F.col("_na"), F.col("_nb")
    n = na + nb
    u2 = F.col("_r2a") - dec(na) * dec(na + F.lit(1))
    num = (u2 - dec(na) * dec(nb)).cast("double")
    varnum = (
        (dec(n + F.lit(1)) * dec(n) * dec(n - F.lit(1)) - F.col("_ties"))
        .cast("double")
        * (dec(na) * dec(nb)).cast("double")
    )
    varden = (F.lit(12.0) * (dec(n) * dec(n - F.lit(1))).cast("double"))
    z = num / (F.lit(2.0) * F.sqrt(varnum / varden))
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        (u2.cast("double") / F.lit(2.0)).alias("u_a"),
        F.round(
            F.when((na > 0) & (nb > 0) & (varnum > 0), z), round_to
        ).alias("z"),
    )


def mann_whitney_oracle_sql(
    values_sql: str,
    bucket_col: str,
    slice_col: str,
    slice_a_sql: str,
    slice_b_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same doubled midranks, HUGEINT rank/tie sums, same
    pinned ``num / (2·sqrt(varnum/varden))`` float tail."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {bucket_col} AS _k,
         CAST(SUM(CASE WHEN {slice_col} = {slice_a_sql} THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
         CAST(SUM(CASE WHEN {slice_col} = {slice_b_sql} THEN 1 ELSE 0 END) AS BIGINT) AS _cb
  FROM vals WHERE {slice_col} IN ({slice_a_sql}, {slice_b_sql})
  GROUP BY {bucket_col}
),
cum AS (
  SELECT _k, _ca, _cb, _ca + _cb AS _t,
         SUM(_ca + _cb) OVER (ORDER BY _k
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - (_ca + _cb) AS _before
  FROM per
),
agg AS (
  SELECT CAST(SUM(_ca) AS BIGINT) AS _na, CAST(SUM(_cb) AS BIGINT) AS _nb,
         SUM(CAST(_ca AS HUGEINT) * CAST(2 * _before + _t + 1 AS HUGEINT)) AS _r2a,
         SUM(CAST(_t AS HUGEINT) * CAST(_t AS HUGEINT) * CAST(_t AS HUGEINT)
             - CAST(_t AS HUGEINT)) AS _ties
  FROM cum
),
calc AS (
  SELECT _na, _nb,
         _r2a - CAST(_na AS HUGEINT) * CAST(_na + 1 AS HUGEINT) AS _u2,
         CAST((CAST(_na + _nb + 1 AS HUGEINT) * CAST(_na + _nb AS HUGEINT)
               * CAST(_na + _nb - 1 AS HUGEINT) - _ties) AS DOUBLE)
         * CAST(CAST(_na AS HUGEINT) * CAST(_nb AS HUGEINT) AS DOUBLE) AS _varnum,
         12.0 * CAST(CAST(_na + _nb AS HUGEINT)
                     * CAST(_na + _nb - 1 AS HUGEINT) AS DOUBLE) AS _varden
  FROM agg
)
SELECT _na AS n_a, _nb AS n_b,
       CAST(_u2 AS DOUBLE) / 2.0 AS u_a,
       ROUND(CASE WHEN _na > 0 AND _nb > 0 AND _varnum > 0
             THEN CAST(_u2 - CAST(_na AS HUGEINT) * CAST(_nb AS HUGEINT) AS DOUBLE)
                  / (2.0 * SQRT(_varnum / _varden)) END, {round_to}) AS z
FROM calc
"""


def ks_test_oracle_sql(
    values_sql: str,
    bucket_col: str,
    slice_col: str,
    slice_a_sql: str,
    slice_b_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT cross products, same argmax tie-break,
    same single division and exactly-rounded sqrt."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {bucket_col} AS _k,
         CAST(SUM(CASE WHEN {slice_col} = {slice_a_sql} THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
         CAST(SUM(CASE WHEN {slice_col} = {slice_b_sql} THEN 1 ELSE 0 END) AS BIGINT) AS _cb
  FROM vals WHERE {slice_col} IN ({slice_a_sql}, {slice_b_sql})
  GROUP BY {bucket_col}
),
cum AS (
  SELECT _k,
         SUM(_ca) OVER (ORDER BY _k
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cuma,
         SUM(_cb) OVER (ORDER BY _k
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cumb,
         SUM(_ca) OVER () AS _na, SUM(_cb) OVER () AS _nb
  FROM per
),
scored AS (
  SELECT _k, _na, _nb,
         ABS(CAST(_cuma AS HUGEINT) * CAST(_nb AS HUGEINT)
             - CAST(_cumb AS HUGEINT) * CAST(_na AS HUGEINT)) AS _diff
  FROM cum
),
best AS (
  SELECT * FROM scored
  QUALIFY ROW_NUMBER() OVER (ORDER BY _diff DESC, _k ASC) = 1
)
SELECT CAST(_na AS BIGINT) AS n_a, CAST(_nb AS BIGINT) AS n_b, _k AS ks_at,
       ROUND(CAST(_diff AS DOUBLE)
             / CAST(CAST(_na AS HUGEINT) * CAST(_nb AS HUGEINT) AS DOUBLE),
             {round_to}) AS ks_d,
       ROUND(SQRT(CAST(CAST(_na AS HUGEINT) * CAST(_nb AS HUGEINT) AS DOUBLE)
                  / CAST(_na + _nb AS DOUBLE))
             * (CAST(_diff AS DOUBLE)
                / CAST(CAST(_na AS HUGEINT) * CAST(_nb AS HUGEINT) AS DOUBLE)),
             {round_to}) AS ks_stat
FROM best
"""


def slice_overlap(
    df: DataFrame,
    id_col: str,
    slice_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact pairwise overlap matrix of the DISTINCT id sets behind each
    slice — the "how much do my sources/snapshots share" audit
    (`kmv.kmv_intersect` answers the same question with sketches at
    unbounded slice counts; this is the exact small-catalog form, and
    :func:`chapman_estimate`'s two-sample input generalized to every
    pair):

        jaccard = |A∩B| / (|A|+|B|−|A∩B|)      (ONE division)
        containment a→b = |A∩B| / |A|           (ONE division)

    Plan: one distinct (id, slice) shuffle, an id-keyed self-join whose
    per-id blowup is bounded by the slice catalog (≤ catalog² pairs per
    id), broadcast per-slice sizes. Exact integers throughout. Output
    one row per unordered pair: ``(slice_a, slice_b, n_a, n_b, overlap,
    jaccard, containment_a, containment_b)``.
    """
    per = df.select(
        F.col(id_col).alias("_id"), F.col(slice_col).alias("_s")
    ).distinct()
    sizes = per.groupBy("_s").agg(F.count(F.lit(1)).alias("n"))
    a = per.select("_id", F.col("_s").alias("slice_a"))
    b = per.select("_id", F.col("_s").alias("slice_b"))
    inter = (
        a.join(b, "_id")
        .where(F.col("slice_a") < F.col("slice_b"))
        .groupBy("slice_a", "slice_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("_s").alias("slice_a"), F.col("n").alias("n_a"))),
            "slice_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_s").alias("slice_b"), F.col("n").alias("n_b"))),
            "slice_b",
        )
    )
    ov = F.col("overlap").cast("double")
    return out.select(
        "slice_a",
        "slice_b",
        "n_a",
        "n_b",
        "overlap",
        F.round(
            ov / (F.col("n_a") + F.col("n_b") - F.col("overlap")).cast("double"),
            round_to,
        ).alias("jaccard"),
        F.round(ov / F.col("n_a").cast("double"), round_to).alias("containment_a"),
        F.round(ov / F.col("n_b").cast("double"), round_to).alias("containment_b"),
    ).orderBy("slice_a", "slice_b")


def slice_overlap_oracle_sql(
    values_sql: str,
    id_col: str,
    slice_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same distinct membership, same pair join, same
    single divisions. Pairs with zero overlap are absent on BOTH
    engines (inner pair join)."""
    return f"""
WITH vals AS ({values_sql}),
per AS (SELECT DISTINCT {id_col} AS _id, {slice_col} AS _s FROM vals),
sizes AS (SELECT _s, CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY _s),
inter AS (
  SELECT a._s AS slice_a, b._s AS slice_b, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM per a JOIN per b ON a._id = b._id AND a._s < b._s
  GROUP BY a._s, b._s
)
SELECT slice_a, slice_b, sa.n AS n_a, sb.n AS n_b, overlap,
       ROUND(CAST(overlap AS DOUBLE)
             / CAST(sa.n + sb.n - overlap AS DOUBLE), {round_to}) AS jaccard,
       ROUND(CAST(overlap AS DOUBLE) / CAST(sa.n AS DOUBLE), {round_to}) AS containment_a,
       ROUND(CAST(overlap AS DOUBLE) / CAST(sb.n AS DOUBLE), {round_to}) AS containment_b
FROM inter
JOIN sizes sa ON inter.slice_a = sa._s
JOIN sizes sb ON inter.slice_b = sb._s
"""


def _hbos_width_guard(n_rows: int, n_features: int, scale: int) -> None:
    """Fail-fast width contract (the tfidf_cosine_pairs discipline):
    the largest per-feature factor is ``n_rows·scale`` (a singleton
    bin), so the product of ``n_features`` factors is bounded by
    ``(n_rows·scale)^n_features`` — past 10³⁸ Spark's non-ANSI DECIMAL
    overflow would NULL the very rows the query exists to surface
    (NULLs sort last under score DESC) while the DuckDB twin errors."""
    if (n_rows * scale) ** n_features >= 10**38:
        max_n = int((10**38) ** (1.0 / n_features)) // scale
        raise ValueError(
            f"hbos_scores: (n_rows*{scale})^{n_features} would "
            f"overflow DECIMAL(38,0) at n_rows={n_rows} — drop a "
            f"feature or stay under ~{max_n} rows with "
            f"{n_features} features"
        )


def hbos_scores(
    df: DataFrame,
    id_col: str,
    features: dict,
    top_k: int | None = None,
) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel, HBOS 2012) —
    the classic at-scale unsupervised anomaly readout: per feature,
    histogram the column with a caller-fixed bin width; a row's score
    is the product over features of the inverse bin density. Rows in
    sparse corners of the joint-marginal space rank highest (top_k
    returns the most anomalous first).

    ``features`` maps numeric column name → integer bin width (caller
    fixes widths so bins are data-independent — no min/max pre-pass,
    stable under corpus growth; the `quantiles._log_bin` rationale).

    Exactness (the log-free house rule — classic HBOS sums logs, this
    multiplies the rationals): per feature the factor is the INTEGER
    ``n_rows·SCALE // bin_count`` (floor div, both engines) and the
    score is the exact DECIMAL(38,0) product. A singleton bin makes its
    factor ``n_rows·SCALE``, so the worst-case product is
    ``(n_rows·SCALE)^n_features`` — a RUNTIME width guard raises when
    that bound reaches 10³⁸ (e.g. 3 features cap out near
    n_rows ≈ 4.6·10⁸ at SCALE=10⁴; drop a feature or the guard tells
    you the limit). Without the guard, Spark's non-ANSI DECIMAL
    overflow silently NULLs exactly the most anomalous rows (NULLs
    sort last under ``ORDER BY score_int DESC``) while DuckDB HUGEINT
    errors — the engines would diverge invisibly. Within the guard the
    product matches DuckDB bit-for-bit; ranking is unchanged from the
    log form (log is monotone; product of positives ↔ sum of logs).

    Plan: one partial-agg shuffle per feature histogram (bounded by the
    occupied-bin count), each broadcast-joined back onto ONE scan —
    no sort unless ``top_k`` is set, and that compiles to
    TakeOrderedAndProject. Output: ``(id_col, <f>_bin per feature,
    score_int)``.
    """
    if not (1 <= len(features) <= 3):
        raise ValueError(
            "hbos_scores takes 1-3 features: the exact integer product "
            f"is bounded for ≤3 factors (got {len(features)})"
        )
    SCALE = 10_000
    out = df
    n_rows = df.count()
    _hbos_width_guard(n_rows, len(features), SCALE)
    score = None
    bin_cols = []
    for fcol, width in sorted(features.items()):
        w = int(width)
        if w < 1:
            raise ValueError(f"bin width for {fcol!r} must be >= 1")
        bname = f"{fcol}_bin"
        bin_cols.append(bname)
        # floor-to-bin in pure int64: subtract the mod-positive residue
        # then integer-divide (exact — the numerator is a multiple of
        # w), so negatives floor instead of truncating toward zero.
        # Feature columns must be INTEGER-VALUED (cents/counts): Spark
        # truncates a fractional cast where DuckDB rounds — callers
        # quantize floats first (the gate rounds prices to cents).
        bexpr = F.expr(
            f"(CAST({fcol} AS BIGINT)"
            f" - (((CAST({fcol} AS BIGINT) % {w}) + {w}) % {w})) div {w}"
        )
        out = out.withColumn(bname, bexpr)
        hist = out.groupBy(F.col(bname).alias("_b")).agg(
            F.count(F.lit(1)).alias("_c")
        )
        factor = F.expr(f"({n_rows}L * {SCALE}L) div _c")
        ftab = hist.select(
            F.col("_b").alias(f"_b_{fcol}"), factor.alias(f"_f_{fcol}")
        )
        out = out.join(
            F.broadcast(ftab), out[bname] == ftab[f"_b_{fcol}"]
        ).drop(f"_b_{fcol}")
        f_dec = F.col(f"_f_{fcol}").cast("decimal(38,0)")
        score = f_dec if score is None else (score * f_dec).cast("decimal(38,0)")
    res = out.select(
        F.col(id_col), *bin_cols, score.alias("score_int")
    )
    if top_k is not None:
        res = res.orderBy(
            F.col("score_int").desc(), F.col(id_col).asc()
        ).limit(top_k)
    return res


def hbos_scores_oracle_sql(
    table_expr: str,
    id_col: str,
    features: dict,
    top_k: int | None = None,
) -> str:
    """DuckDB twin: identical floor-binning, identical integer inverse
    densities, HUGEINT product."""
    SCALE = 10_000
    feats = sorted(features.items())
    bin_exprs = []
    for fcol, width in feats:
        w = int(width)
        v = f"CAST({fcol} AS BIGINT)"
        bin_exprs.append(
            f"({v} - ((({v} % {w}) + {w}) % {w})) // {w} AS {fcol}_bin"
        )
    bins = ", ".join(bin_exprs)
    hists = []
    joins = []
    factors = []
    for fcol, _ in feats:
        hists.append(
            f"h_{fcol} AS (SELECT {fcol}_bin AS b, CAST(COUNT(*) AS BIGINT)"
            f" AS c FROM binned GROUP BY 1)"
        )
        joins.append(f"JOIN h_{fcol} ON binned.{fcol}_bin = h_{fcol}.b")
        factors.append(
            f"CAST(((SELECT n FROM nn) * {SCALE}) // h_{fcol}.c AS HUGEINT)"
        )
    score = " * ".join(factors)
    bin_out = ", ".join(f"binned.{fcol}_bin" for fcol, _ in feats)
    order = (
        f"ORDER BY score_int DESC, {id_col} ASC LIMIT {top_k}"
        if top_k is not None
        else ""
    )
    return f"""
WITH base AS ({table_expr}),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
binned AS (SELECT {id_col}, {bins} FROM base),
{", ".join(hists)}
SELECT {id_col}, {bin_out}, {score} AS score_int
FROM binned {" ".join(joins)}
{order}
"""


def cuped_adjustment(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """CUPED variance-reduced group means (Deng, Xu, Kohavi & Walker,
    "Improving the sensitivity of online controlled experiments by
    utilizing pre-experiment data", WSDM 2013): adjust each group's
    experiment-metric mean with the pooled pre-period covariate,

        ŷ_g = ȳ_g − θ·(x̄_g − x̄),   θ = cov(x, y) / var(x)  (pooled)

    — the standard A/B readout that removes pre-existing user-level
    variance so smaller effects clear the same test. Pairs with
    `ab_test`/`permutation_test`, which consume the adjusted metric.

    Exactness (the `grouped_linreg` discipline): ``x_col``/``y_col``
    must be INTEGRAL; θ comes from exact DECIMAL(38,0) moment sums with
    ONE division, and the adjustment is a fixed-order double
    expression, so the readout hash-matches the oracle. Zero pooled
    x-variance → NULL θ and adjusted means.

    Plan: one pooled map-side-combined aggregate (1 row, broadcast) +
    one per-group aggregate. Output: ``(group_col, n, mean_x, mean_y,
    theta, adj_mean)``.
    """
    for c in (x_col, y_col):
        dt = df.schema[c].dataType.simpleString()
        if dt not in ("tinyint", "smallint", "int", "bigint", "long"):
            raise ValueError(
                f"cuped_adjustment needs integral columns for exact "
                f"sums; got {c}: {dt}"
            )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = df.filter(x.isNotNull() & y.isNotNull())
    pooled = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((x * y).cast("decimal(38,0)")).alias("_sxy"),
    )
    per = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_gx"),
        F.sum(y).alias("_gy"),
    )
    j = per.crossJoin(F.broadcast(pooled))
    nd = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    # fixed-order, textually mirrored by the oracle
    cov_n = nd * sxy - sx * sy
    varx_n = nd * sxx - sx * sx
    theta = cov_n / varx_n
    gnd = F.col("n").cast("double")
    mean_x = F.col("_gx").cast("double") / gnd
    mean_y = F.col("_gy").cast("double") / gnd
    adj = mean_y - (cov_n / varx_n) * (mean_x - sx / nd)
    guard = varx_n > 0
    return j.select(
        group_col,
        "n",
        F.round(mean_x, round_to).alias("mean_x"),
        F.round(mean_y, round_to).alias("mean_y"),
        F.round(F.when(guard, theta), round_to).alias("theta"),
        F.round(F.when(guard, adj), round_to).alias("adj_mean"),
    )


def cuped_adjustment_oracle_sql(
    units_sql: str,
    x_col: str,
    y_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: HUGEINT-exact pooled moments, identical fixed-order
    adjustment expression."""
    return f"""
WITH units AS ({units_sql}),
base AS (
  SELECT {group_col}, CAST({x_col} AS BIGINT) AS x, CAST({y_col} AS BIGINT) AS y
  FROM units WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS _n,
         SUM(x) AS _sx, SUM(y) AS _sy,
         SUM(CAST(x AS HUGEINT) * x) AS _sxx,
         SUM(CAST(x AS HUGEINT) * y) AS _sxy
  FROM base
),
per AS (
  SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS _gx, SUM(y) AS _gy
  FROM base GROUP BY {group_col}
)
SELECT {group_col}, n,
  ROUND(CAST(_gx AS DOUBLE) / CAST(n AS DOUBLE), {round_to}) AS mean_x,
  ROUND(CAST(_gy AS DOUBLE) / CAST(n AS DOUBLE), {round_to}) AS mean_y,
  ROUND(CASE WHEN CAST(_n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                  - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) > 0 THEN
    (CAST(_n AS DOUBLE) * CAST(_sxy AS DOUBLE)
     - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
    / (CAST(_n AS DOUBLE) * CAST(_sxx AS DOUBLE)
       - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)) END, {round_to}) AS theta,
  ROUND(CASE WHEN CAST(_n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                  - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) > 0 THEN
    CAST(_gy AS DOUBLE) / CAST(n AS DOUBLE)
    - ((CAST(_n AS DOUBLE) * CAST(_sxy AS DOUBLE)
        - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
       / (CAST(_n AS DOUBLE) * CAST(_sxx AS DOUBLE)
          - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)))
      * (CAST(_gx AS DOUBLE) / CAST(n AS DOUBLE)
         - CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE)) END, {round_to}) AS adj_mean
FROM per CROSS JOIN pooled
"""


def did_estimate(
    df: DataFrame,
    cohort_col: str,
    period_col: str,
    value_col: str,
    treated,
    control,
    post,
    pre,
    round_to: int = 6,
) -> DataFrame:
    """Difference-in-differences estimator — the quasi-experimental
    companion to :func:`cuped_adjustment` (CUPED reduces variance when
    you randomized; DiD removes the shared time trend when you could
    NOT randomize and only have a before/after on treated vs control
    cohorts):

        DID = (ȳ_treated,post − ȳ_treated,pre)
            − (ȳ_control,post − ȳ_control,pre)

    One map-side-combined aggregation collects all four cells' exact
    integer sums/counts (callers pass integer metrics — cents/counts);
    the four means are pinned single divisions and DID is three
    float subtractions in a fixed order — reproduced token-for-token
    in the oracle. Any empty cell NULLs the estimate instead of
    silently reading a 3-cell design as a DiD. Output one row:
    ``(n_tpost, n_tpre, n_cpost, n_cpre, mean_tpost, mean_tpre,
    mean_cpost, mean_cpre, did)``.
    """
    c, p = F.col(cohort_col), F.col(period_col)
    v = F.col(value_col).cast("long")

    def cell(cv, pv, tag):
        m = (c == F.lit(cv)) & (p == F.lit(pv))
        return [
            F.sum(F.when(m, 1).otherwise(0)).alias(f"_n{tag}"),
            F.sum(F.when(m, v).otherwise(F.lit(0))).alias(f"_s{tag}"),
        ]

    agg = df.agg(
        *cell(treated, post, "tp"),
        *cell(treated, pre, "tq"),
        *cell(control, post, "cp"),
        *cell(control, pre, "cq"),
    )
    mean = {
        t: F.col(f"_s{t}").cast("double") / F.col(f"_n{t}").cast("double")
        for t in ("tp", "tq", "cp", "cq")
    }
    did = (mean["tp"] - mean["tq"]) - (mean["cp"] - mean["cq"])
    nonempty = (
        (F.col("_ntp") > 0)
        & (F.col("_ntq") > 0)
        & (F.col("_ncp") > 0)
        & (F.col("_ncq") > 0)
    )
    return agg.select(
        F.col("_ntp").alias("n_tpost"),
        F.col("_ntq").alias("n_tpre"),
        F.col("_ncp").alias("n_cpost"),
        F.col("_ncq").alias("n_cpre"),
        F.round(F.when(F.col("_ntp") > 0, mean["tp"]), round_to).alias("mean_tpost"),
        F.round(F.when(F.col("_ntq") > 0, mean["tq"]), round_to).alias("mean_tpre"),
        F.round(F.when(F.col("_ncp") > 0, mean["cp"]), round_to).alias("mean_cpost"),
        F.round(F.when(F.col("_ncq") > 0, mean["cq"]), round_to).alias("mean_cpre"),
        F.round(F.when(nonempty, did), round_to).alias("did"),
    )


def did_estimate_oracle_sql(
    units_sql: str,
    cohort_col: str,
    period_col: str,
    value_col: str,
    treated_sql: str,
    control_sql: str,
    post_sql: str,
    pre_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same four-cell conditional aggregation, same pinned
    division/subtraction order."""

    def cell(cv, pv, tag):
        m = f"{cohort_col} = {cv} AND {period_col} = {pv}"
        return (
            f"CAST(SUM(CASE WHEN {m} THEN 1 ELSE 0 END) AS BIGINT) AS _n{tag},\n"
            f"         SUM(CASE WHEN {m} THEN CAST({value_col} AS BIGINT)"
            f" ELSE 0 END) AS _s{tag}"
        )

    means = {
        t: f"CAST(_s{t} AS DOUBLE) / CAST(_n{t} AS DOUBLE)"
        for t in ("tp", "tq", "cp", "cq")
    }
    did = f"({means['tp']} - {means['tq']}) - ({means['cp']} - {means['cq']})"
    return f"""
WITH units AS ({units_sql}),
agg AS (
  SELECT {cell(treated_sql, post_sql, "tp")},
         {cell(treated_sql, pre_sql, "tq")},
         {cell(control_sql, post_sql, "cp")},
         {cell(control_sql, pre_sql, "cq")}
  FROM units
)
SELECT _ntp AS n_tpost, _ntq AS n_tpre, _ncp AS n_cpost, _ncq AS n_cpre,
       ROUND(CASE WHEN _ntp > 0 THEN {means['tp']} END, {round_to}) AS mean_tpost,
       ROUND(CASE WHEN _ntq > 0 THEN {means['tq']} END, {round_to}) AS mean_tpre,
       ROUND(CASE WHEN _ncp > 0 THEN {means['cp']} END, {round_to}) AS mean_cpost,
       ROUND(CASE WHEN _ncq > 0 THEN {means['cq']} END, {round_to}) AS mean_cpre,
       ROUND(CASE WHEN _ntp > 0 AND _ntq > 0 AND _ncp > 0 AND _ncq > 0
             THEN {did} END, {round_to}) AS did
FROM agg
"""


def bh_fdr(
    df: DataFrame,
    test_col: str,
    p_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
    max_tests: int | None = 100_000,
) -> DataFrame:
    """Benjamini-Hochberg FDR step-up over a family of test p-values —
    the multiple-testing gate downstream of the per-segment tests this
    repo emits (`prop_ztest` pairs, `permutation_test` replays,
    `mcnemar_test` panels): reject H_(1..k*) where

        k* = max { k : p_(k) ≤ k·α/m }.

    Pure rank arithmetic: p-values sort ASC (ties by test id — total
    order), the step-up condition is evaluated per rank, and the
    cutoff k* propagates back as a running max from the bottom (the
    classic step-up), so a test with p above its own line is still
    rejected when a later rank passes. The comparison
    ``p·m ≤ k·α`` is two float multiplies in pinned order on BOTH
    engines — no division. m is the family size (NULL p-values are
    excluded from m and reported unrejected, matching R's p.adjust
    contract of complete-case testing).

    The family is a bounded spine by contract
    (``guards.require_bounded_spine`` on ``test_col``; a family of 10⁶⁺
    tests is a modeling smell, not a scale feature). Output one row
    per test: ``(test, p_value, rank, m, rejected)``.
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, test_col, [], max_tests, "bh_fdr")
    base = df.select(
        F.col(test_col).alias("test"), F.col(p_col).cast("double").alias("p_value")
    )
    ok = base.where(F.col("p_value").isNotNull())
    w = Window.orderBy(F.col("p_value").asc(), F.col("test").asc())
    ranked = ok.select(
        "test",
        "p_value",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(
            Window.orderBy("p_value").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    passes = F.col("p_value") * F.col("m").cast("double") <= F.col(
        "rank"
    ).cast("double") * F.lit(float(alpha))
    wdown = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = ranked.select(
        "test",
        F.round("p_value", round_to).alias("p_value"),
        "rank",
        "m",
        (F.max(passes.cast("int")).over(wdown) == 1).alias("rejected"),
    )
    nulls = base.where(F.col("p_value").isNull()).select(
        "test",
        F.lit(None).cast("double").alias("p_value"),
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("long").alias("m"),
        F.lit(False).alias("rejected"),
    )
    return out.unionByName(nulls).orderBy(F.col("rank").asc_nulls_last(), "test")


def bh_fdr_oracle_sql(
    tests_sql: str,
    test_col: str,
    p_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same (p ASC, test ASC) rank, same pinned ``p·m ≤
    k·α`` comparison, same bottom-up running-max step-up."""
    return f"""
WITH tests AS ({tests_sql}),
base AS (SELECT {test_col} AS test, CAST({p_col} AS DOUBLE) AS p_value FROM tests),
ok AS (
  SELECT test, p_value,
         CAST(ROW_NUMBER() OVER (ORDER BY p_value ASC, test ASC) AS INTEGER) AS rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM base WHERE p_value IS NOT NULL
),
flag AS (
  SELECT *, CASE WHEN p_value * CAST(m AS DOUBLE)
                      <= CAST(rank AS DOUBLE) * {float(alpha)!r}
            THEN 1 ELSE 0 END AS ok_k
  FROM ok
)
SELECT test, ROUND(p_value, {round_to}) AS p_value, rank, m,
       MAX(ok_k) OVER (ORDER BY rank DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
       AS rejected
FROM flag
UNION ALL
SELECT test, NULL, NULL, NULL, FALSE FROM base WHERE p_value IS NULL
"""


def loo_group_influence(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Leave-one-group-out influence — the cheapest honest data-
    valuation readout for a grouped corpus ("which SOURCE moves the
    global metric, and which way"): for each group g,

        influence(g) = mean(all) − mean(all \\ g)
                     = S/N − (S − s_g)/(N − n_g)

    A positive influence means the group PULLS THE MEAN UP (removing
    it drops the metric). One map-side-combined aggregation collects
    every group's exact integer ``(n_g, s_g)``; the global ``(N, S)``
    is the one-row sum of that frame broadcast back — the corpus is
    scanned ONCE regardless of group count, where the naive
    leave-one-out loop scans it G times. Means are pinned single
    divisions; ``loo_mean`` is NULL for a group that IS the whole
    corpus. Output: ``(group, n, group_mean, loo_mean, influence)``.
    """
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("long")).alias("_s"),
    )
    tot = per.agg(
        F.sum("n").alias("_nn"), F.sum("_s").alias("_ss")
    )
    j = per.crossJoin(F.broadcast(tot))
    gmean = F.col("_s").cast("double") / F.col("n").cast("double")
    allmean = F.col("_ss").cast("double") / F.col("_nn").cast("double")
    loo = (F.col("_ss") - F.col("_s")).cast("double") / (
        F.col("_nn") - F.col("n")
    ).cast("double")
    return j.select(
        "group",
        "n",
        F.round(gmean, round_to).alias("group_mean"),
        F.round(F.when(F.col("_nn") > F.col("n"), loo), round_to).alias(
            "loo_mean"
        ),
        F.round(
            F.when(F.col("_nn") > F.col("n"), allmean - loo), round_to
        ).alias("influence"),
    )


def loo_group_influence_oracle_sql(
    units_sql: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same one-pass group sums, same pinned divisions and
    whole-corpus NULL."""
    return f"""
WITH units AS ({units_sql}),
per AS (
  SELECT {group_col} AS "group", CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST({value_col} AS BIGINT)) AS BIGINT) AS _s
  FROM units GROUP BY {group_col}
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS _nn, CAST(SUM(_s) AS BIGINT) AS _ss FROM per)
SELECT "group", n,
       ROUND(CAST(_s AS DOUBLE) / CAST(n AS DOUBLE), {round_to}) AS group_mean,
       ROUND(CASE WHEN _nn > n THEN CAST(_ss - _s AS DOUBLE)
             / CAST(_nn - n AS DOUBLE) END, {round_to}) AS loo_mean,
       ROUND(CASE WHEN _nn > n THEN CAST(_ss AS DOUBLE) / CAST(_nn AS DOUBLE)
             - CAST(_ss - _s AS DOUBLE) / CAST(_nn - n AS DOUBLE) END,
             {round_to}) AS influence
FROM per CROSS JOIN tot
"""


def propensity_strata_effect(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    value_col: str,
    round_to: int = 6,
    max_strata: int | None = 10_000,
) -> DataFrame:
    """Stratified treatment-effect estimator (propensity-score
    subclassification, Rosenbaum & Rubin 1984): callers bucket units
    into strata (propensity-score quantiles, or any confounder
    bucketing), and the effect is the stratum-size-weighted mean of
    within-stratum arm differences:

        ATE ≈ Σ_q (n_q / N_valid) · (ȳ_treated,q − ȳ_control,q)

    over strata with BOTH arms present; one-armed strata are excluded
    from the estimate and surfaced via ``coverage`` (share of ALL
    units that live in valid strata — an estimate covering 60% of the
    population should say so). The causal companion to
    :func:`did_estimate` (before/after) and :func:`cuped_adjustment`
    (variance reduction).

    Exactness: one (stratum, arm) conditional aggregation of integer
    sums; per-stratum means are pinned divisions; the weighted sum
    Σ n_q·(m1−m0) runs as an ORDERED fold over the stratum-sorted
    array (cross-row float sums are order-dependent — the ewma/
    fmix precedent), then ONE division by N_valid — the oracle folds
    the identical list in the identical _q order. Strata are a
    bounded spine by contract (``guards.require_bounded_spine``;
    propensity bucketing is quantile-grid-sized by construction).
    Output one row: ``(n_total, n_valid, n_strata_valid, att_effect,
    coverage)``.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(
        df, stratum_col, [], max_strata, "propensity_strata_effect"
    )
    t = F.col(treat_col).cast("int")
    v = F.col(value_col).cast("long")
    per = df.groupBy(F.col(stratum_col).alias("_q")).agg(
        F.sum(F.when(t == 1, 1).otherwise(0)).alias("_n1"),
        F.sum(F.when(t == 1, v).otherwise(F.lit(0))).alias("_s1"),
        F.sum(F.when(t == 0, 1).otherwise(0)).alias("_n0"),
        F.sum(F.when(t == 0, v).otherwise(F.lit(0))).alias("_s0"),
    )
    valid = (F.col("_n1") > 0) & (F.col("_n0") > 0)
    diff = F.col("_s1").cast("double") / F.col("_n1").cast("double") - F.col(
        "_s0"
    ).cast("double") / F.col("_n0").cast("double")
    nq = F.col("_n1") + F.col("_n0")
    agg = per.agg(
        F.sum(nq).alias("n_total"),
        F.sum(F.when(valid, nq).otherwise(F.lit(0))).alias("n_valid"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("n_strata_valid"),
        # collect_list drops the NULLs the invalid strata produce;
        # sort_array orders by _q, so the fold order is total
        F.sort_array(
            F.collect_list(
                F.when(
                    valid,
                    F.struct(
                        F.col("_q").alias("q"),
                        (nq.cast("double") * diff).alias("wd"),
                    ),
                )
            )
        ).alias("_terms"),
    ).withColumn(
        "_wsum",
        F.aggregate(
            F.col("_terms"), F.lit(0.0), lambda a, x: a + x["wd"]
        ),
    )
    return agg.select(
        "n_total",
        "n_valid",
        "n_strata_valid",
        F.round(
            F.when(
                F.col("n_valid") > 0,
                F.col("_wsum") / F.col("n_valid").cast("double"),
            ),
            round_to,
        ).alias("att_effect"),
        F.round(
            F.col("n_valid").cast("double") / F.col("n_total").cast("double"),
            round_to,
        ).alias("coverage"),
    )


def propensity_strata_effect_oracle_sql(
    units_sql: str,
    stratum_col: str,
    treat_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same (stratum, arm) sums, same both-arms validity
    filter, same pinned weighted-difference arithmetic."""
    return f"""
WITH units AS ({units_sql}),
per AS (
  SELECT {stratum_col} AS _q,
         CAST(SUM(CASE WHEN CAST({treat_col} AS INTEGER) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS _n1,
         SUM(CASE WHEN CAST({treat_col} AS INTEGER) = 1 THEN CAST({value_col} AS BIGINT) ELSE 0 END) AS _s1,
         CAST(SUM(CASE WHEN CAST({treat_col} AS INTEGER) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS _n0,
         SUM(CASE WHEN CAST({treat_col} AS INTEGER) = 0 THEN CAST({value_col} AS BIGINT) ELSE 0 END) AS _s0
  FROM units GROUP BY {stratum_col}
),
agg AS (
  SELECT CAST(SUM(_n1 + _n0) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN _n1 > 0 AND _n0 > 0 THEN _n1 + _n0 ELSE 0 END) AS BIGINT) AS n_valid,
         CAST(SUM(CASE WHEN _n1 > 0 AND _n0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_strata_valid,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(CAST(_n1 + _n0 AS DOUBLE)
                * (CAST(_s1 AS DOUBLE) / CAST(_n1 AS DOUBLE)
                   - CAST(_s0 AS DOUBLE) / CAST(_n0 AS DOUBLE))
                ORDER BY _q)
             FILTER (WHERE _n1 > 0 AND _n0 > 0)),
           (a, b) -> a + b) AS _wsum
  FROM per
)
SELECT n_total, n_valid, n_strata_valid,
       ROUND(CASE WHEN n_valid > 0 THEN _wsum / CAST(n_valid AS DOUBLE) END,
             {round_to}) AS att_effect,
       ROUND(CAST(n_valid AS DOUBLE) / CAST(n_total AS DOUBLE), {round_to}) AS coverage
FROM agg
"""


def cochran_armitage(
    df: DataFrame,
    dose_col: str,
    success_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cochran-Armitage trend test: is a binary outcome's rate
    MONOTONICALLY drifting across ordered integer dose buckets (score
    deciles, time buckets, exposure counts)? The ordered-category
    sibling of :func:`prop_ztest` (which compares two unordered arms):

        T = Σ_i s_i·k_i − S·(Σ_i n_i·k_i)/N
        Var(T) = p(1−p)·[Σ n_i·k_i² − (Σ n_i·k_i)²/N],  p = S/N
        z = T / sqrt(Var)

    where k_i is the integer dose, n_i/s_i the trials/successes in
    bucket i. Exactness: the five moments (N, S, Σnk, Σnk², Σsk) come
    from ONE map-side-combined aggregation as exact integers (DECIMAL
    for the k² products — int64 wraps at ~10⁹ rows of 10⁵ doses); the
    z tail is the pinned float sequence reproduced token-for-token in
    the oracle. z is NULL when the variance is 0 (single dose level or
    degenerate rates). Output one row: ``(n, s, n_doses, z)``.
    """
    k = F.col(dose_col).cast("long")
    s = F.col(success_col).cast("boolean").cast("int").cast("long")
    dec = lambda c: c.cast("decimal(38,0)")
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(s).alias("_s"),
        F.sum(dec(k)).alias("_nk"),
        F.sum(dec(k) * dec(k)).alias("_nk2"),
        F.sum(dec(s * k)).alias("_sk"),
        F.countDistinct(k).alias("n_doses"),
    )
    nd = F.col("_n").cast("double")
    sd = F.col("_s").cast("double")
    nk = F.col("_nk").cast("double")
    nk2 = F.col("_nk2").cast("double")
    sk = F.col("_sk").cast("double")
    p = sd / nd
    t = sk - sd * nk / nd
    var = p * (F.lit(1.0) - p) * (nk2 - nk * nk / nd)
    z = t / F.sqrt(var)
    return agg.select(
        F.col("_n").alias("n"),
        F.col("_s").alias("s"),
        "n_doses",
        F.round(F.when(var > 0, z), round_to).alias("z"),
    )


def cochran_armitage_oracle_sql(
    units_sql: str,
    dose_col: str,
    success_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same five HUGEINT moments, same pinned float tail."""
    return f"""
WITH units AS ({units_sql}),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS _n,
         CAST(SUM(CASE WHEN CAST({success_col} AS BOOLEAN) THEN 1 ELSE 0 END) AS BIGINT) AS _s,
         SUM(CAST({dose_col} AS HUGEINT)) AS _nk,
         SUM(CAST({dose_col} AS HUGEINT) * CAST({dose_col} AS HUGEINT)) AS _nk2,
         SUM(CASE WHEN CAST({success_col} AS BOOLEAN)
             THEN CAST({dose_col} AS HUGEINT) ELSE 0 END) AS _sk,
         CAST(COUNT(DISTINCT CAST({dose_col} AS BIGINT)) AS BIGINT) AS n_doses
  FROM units
)
SELECT _n AS n, _s AS s, n_doses,
       ROUND(CASE WHEN (CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE))
                       * (1.0 - CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE))
                       * (CAST(_nk2 AS DOUBLE)
                          - CAST(_nk AS DOUBLE) * CAST(_nk AS DOUBLE)
                            / CAST(_n AS DOUBLE)) > 0
             THEN (CAST(_sk AS DOUBLE)
                   - CAST(_s AS DOUBLE) * CAST(_nk AS DOUBLE) / CAST(_n AS DOUBLE))
                  / SQRT((CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE))
                         * (1.0 - CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE))
                         * (CAST(_nk2 AS DOUBLE)
                            - CAST(_nk AS DOUBLE) * CAST(_nk AS DOUBLE)
                              / CAST(_n AS DOUBLE))) END, {round_to}) AS z
FROM agg
"""


def odds_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-segment 2×2 effect sizes — odds ratio and relative risk with
    their log-scale standard errors, the epidemiology-standard
    companion readouts to :func:`contingency_chi2` (chi² says "is
    there an association"; OR/RR say how big and which way):

        OR = (a·d)/(b·c),   RR = [a/(a+b)] / [c/(c+d)]
        se_ln_or = sqrt(1/a + 1/b + 1/c + 1/d)

    with a=exposed∧outcome, b=exposed∧¬outcome, c=¬exposed∧outcome,
    d=¬exposed∧¬outcome. One conditional aggregation of exact integer
    counts per segment; every statistic is a pinned float expression
    over those four ints (DECIMAL cross-products for OR's numerator /
    denominator — a·d wraps int64 at ~3e9² cells), NULL whenever a
    zero cell makes it undefined (no Haldane fudge — callers who want
    +0.5 smoothing can add it to the counts explicitly). Output:
    ``(*by, a, b, c, d, odds_ratio, relative_risk, se_ln_or)``.
    """
    keys = list(by or [])
    e = F.col(exposure_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    cell = lambda ec, oc, name: F.sum(
        F.when(e.eqNullSafe(ec) & o.eqNullSafe(oc), 1).otherwise(0)
    ).alias(name)
    per = df.groupBy(*keys).agg(
        cell(True, True, "a"),
        cell(True, False, "b"),
        cell(False, True, "c"),
        cell(False, False, "d"),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    a, b, c, d = (F.col(x) for x in "abcd")
    orr = (dec(a) * dec(d)).cast("double") / (dec(b) * dec(c)).cast("double")
    rr = (
        a.cast("double") / (a + b).cast("double")
    ) / (c.cast("double") / (c + d).cast("double"))
    se = F.sqrt(
        F.lit(1.0) / a.cast("double")
        + F.lit(1.0) / b.cast("double")
        + F.lit(1.0) / c.cast("double")
        + F.lit(1.0) / d.cast("double")
    )
    allpos = (a > 0) & (b > 0) & (c > 0) & (d > 0)
    out = per.select(
        *keys,
        "a",
        "b",
        "c",
        "d",
        F.round(F.when(allpos, orr), round_to).alias("odds_ratio"),
        F.round(
            F.when((a + b > 0) & (c > 0) & (c + d > 0), rr), round_to
        ).alias("relative_risk"),
        F.round(F.when(allpos, se), round_to).alias("se_ln_or"),
    )
    return out.orderBy(*keys) if keys else out


def odds_ratio_oracle_sql(
    units_sql: str,
    exposure_col: str,
    outcome_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same four HUGEINT cells, same pinned expressions
    and zero-cell NULL guards."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = f"{gc}, " if keys else ""
    order = f"ORDER BY {gc}" if keys else ""
    e = f"CAST({exposure_col} AS BOOLEAN)"
    o = f"CAST({outcome_col} AS BOOLEAN)"
    return f"""
WITH units AS ({units_sql}),
per AS (
  SELECT {sel}
         CAST(SUM(CASE WHEN {e} AND {o} THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN {e} AND NOT {o} THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN NOT {e} AND {o} THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN NOT {e} AND NOT {o} THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM units {("GROUP BY " + gc) if keys else ""}
)
SELECT {sel}a, b, c, d,
       ROUND(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
             THEN CAST(CAST(a AS HUGEINT) * CAST(d AS HUGEINT) AS DOUBLE)
                  / CAST(CAST(b AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE)
             END, {round_to}) AS odds_ratio,
       ROUND(CASE WHEN a + b > 0 AND c > 0 AND c + d > 0
             THEN (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                  / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))
             END, {round_to}) AS relative_risk,
       ROUND(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
             THEN SQRT(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
                       + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))
             END, {round_to}) AS se_ln_or
FROM per {order}
"""


def kruskal_wallis(
    df: DataFrame,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
    max_groups: int | None = 10_000,
) -> DataFrame:
    """K-sample Kruskal-Wallis H test with midrank ties — the k-group
    extension of :func:`mann_whitney` (MWU asks "is A shifted vs B";
    KW asks "is ANY of the k groups shifted"), the rank-based one-way
    ANOVA a curation pipeline runs before trusting a per-source score
    comparison:

        H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1),
        H_corrected = H / (1 − Σ(t³−t)/(N³−N)).

    Exactness: same DOUBLED-rank spine as mann_whitney — per bucket the
    doubled midrank 2·before+t+1 is an INTEGER, per-group doubled rank
    sums R2_g stay DECIMAL(38,0)-exact, and the tie term Σ(t³−t) is an
    exact DECIMAL. Σ R_g²/n_g is a rational with per-group denominators,
    so it runs as an ORDERED float fold over the group-sorted array
    (cross-row float sums are order-dependent — the propensity/ewma
    precedent): term_g = (R2_g·R2_g)/(4·n_g) in doubles, folded in
    group order, then the pinned H tail. Output one row:
    ``(k, n, h, h_corrected)``; both NULL when N < 2 or every value is
    tied (correction denominator 0).

    Bounded contracts: the value spine via
    ``guards.require_bounded_spine`` (bucket the metric first, exactly
    like ks_test/mann_whitney), the group catalog via ``max_groups``
    (the fold is one row wide).
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "kruskal_wallis")
    require_bounded_spine(df, group_col, [], max_groups, "kruskal_wallis")
    per = df.groupBy(F.col(bucket_col).alias("_k"), F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = lambda c: c.cast("decimal(38,0)")
    spine = per.groupBy("_k").agg(F.sum("_c").alias("_t"))
    spine = spine.select(
        "_k", "_t", (F.sum("_t").over(wcum) - F.col("_t")).alias("_before")
    )
    # per-group doubled rank sums: join each (bucket, group) count back
    # to the bucket spine's doubled midrank
    grp = (
        per.join(spine, "_k")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_ng"),
            F.sum(
                dec(F.col("_c"))
                * dec(F.lit(2) * F.col("_before") + F.col("_t") + F.lit(1))
            ).alias("_r2g"),
        )
    )
    ties = spine.agg(
        F.sum(
            dec(F.col("_t")) * dec(F.col("_t")) * dec(F.col("_t"))
            - dec(F.col("_t"))
        ).alias("_ties")
    )
    agg = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ng").alias("n"),
        # ordered fold: Σ (R2_g)² / (4 n_g) in group order
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").alias("g"),
                    (
                        F.col("_r2g").cast("double")
                        * F.col("_r2g").cast("double")
                        / (F.lit(4.0) * F.col("_ng").cast("double"))
                    ).alias("term"),
                )
            )
        ).alias("_terms"),
    ).withColumn(
        "_rsum",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["term"]),
    ).crossJoin(ties)
    n = F.col("n")
    nd = n.cast("double")
    h = (
        F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("_rsum")
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr_den = F.lit(1.0) - F.col("_ties").cast("double") / (
        dec(n) * dec(n) * dec(n) - dec(n)
    ).cast("double")
    return agg.select(
        "k",
        "n",
        F.round(F.when(n > 1, h), round_to).alias("h"),
        F.round(
            F.when((n > 1) & (corr_den > 0), h / corr_den), round_to
        ).alias("h_corrected"),
    )


def kruskal_wallis_oracle_sql(
    values_sql: str,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same doubled midranks, HUGEINT rank/tie sums, the
    identical group-ordered float fold and pinned H tail."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {bucket_col} AS _k, {group_col} AS _g,
         CAST(COUNT(*) AS BIGINT) AS _c
  FROM vals GROUP BY 1, 2
),
spine AS (
  SELECT _k, _t,
         SUM(_t) OVER (ORDER BY _k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - _t AS _before
  FROM (SELECT _k, CAST(SUM(_c) AS BIGINT) AS _t FROM per GROUP BY _k)
),
grp AS (
  SELECT p._g, CAST(SUM(p._c) AS BIGINT) AS _ng,
         SUM(CAST(p._c AS HUGEINT)
             * CAST(2 * s._before + s._t + 1 AS HUGEINT)) AS _r2g
  FROM per p JOIN spine s ON p._k = s._k
  GROUP BY p._g
),
ties AS (
  SELECT SUM(CAST(_t AS HUGEINT) * CAST(_t AS HUGEINT) * CAST(_t AS HUGEINT)
             - CAST(_t AS HUGEINT)) AS _ties
  FROM spine
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(_ng) AS BIGINT) AS n,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(CAST(_r2g AS DOUBLE) * CAST(_r2g AS DOUBLE)
                / (4.0 * CAST(_ng AS DOUBLE)) ORDER BY _g)),
           (a, b) -> a + b) AS _rsum
  FROM grp
)
SELECT k, n,
       ROUND(CASE WHEN n > 1 THEN
         12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * _rsum
         - 3.0 * (CAST(n AS DOUBLE) + 1.0) END, {round_to}) AS h,
       ROUND(CASE WHEN n > 1 AND
         1.0 - CAST(_ties AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                    - CAST(n AS HUGEINT) AS DOUBLE) > 0
         THEN (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * _rsum
               - 3.0 * (CAST(n AS DOUBLE) + 1.0))
              / (1.0 - CAST(_ties AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                        - CAST(n AS HUGEINT) AS DOUBLE)) END,
         {round_to}) AS h_corrected
FROM agg, ties
"""


def _require_sum_sq_width(df: DataFrame, col: str, op_name: str) -> None:
    """Fail fast when Σ value² could overflow DECIMAL(38,0) — MEASURED
    from the data (the tfidf/hbos house rule: silent Spark non-ANSI
    overflow NULLs exactly the extreme rows while DuckDB's HUGEINT
    keeps going, so the engines would diverge invisibly). Shared
    implementation lives in :mod:`.guards` (annotation.cronbach_alpha
    needs it too)."""
    from .guards import require_sum_sq_width

    require_sum_sq_width(df, col, op_name)


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
    max_groups: int | None = 10_000,
) -> DataFrame:
    """One-way ANOVA F test over an integer metric — "do the k group
    means differ more than within-group noise explains", the parametric
    sibling of :func:`kruskal_wallis` (KW compares rank distributions;
    this compares means, plus the η² effect size a dashboards wants
    next to the p-ready F):

        SSB = Σ_g S_g²/n_g − S²/N,   SSW = Σx² − Σ_g S_g²/n_g,
        F = (SSB/(k−1)) / (SSW/(N−k)),   η² = SSB/(SSB+SSW).

    Exactness: per-group n_g, S_g = Σx and the global Σx² are exact
    DECIMAL(38,0) integer sums (width MEASURED fail-fast); Σ S_g²/n_g
    is the one rational — an ORDERED float fold over the group-sorted
    array, then the pinned F/η² tail. Output one row:
    ``(k, n, f_stat, eta_sq)`` — NULL when k < 2, N ≤ k, or SSW ≤ 0.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, group_col, [], max_groups, "anova_oneway")
    _require_sum_sq_width(df, value_col, "anova_oneway")
    dec = lambda c: c.cast("decimal(38,0)")
    v = integral_long(df, value_col, "anova_oneway")
    grp = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_ng"),
        F.sum(dec(v)).alias("_sg"),
        F.sum(dec(v) * dec(v)).alias("_qg"),
    )
    agg = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ng").alias("n"),
        F.sum("_sg").alias("_s"),
        F.sum("_qg").alias("_q"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").alias("g"),
                    (
                        F.col("_sg").cast("double")
                        * F.col("_sg").cast("double")
                        / F.col("_ng").cast("double")
                    ).alias("term"),
                )
            )
        ).alias("_terms"),
    ).withColumn(
        "_rs",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["term"]),
    )
    k, n = F.col("k"), F.col("n")
    nd = n.cast("double")
    ssb = F.col("_rs") - F.col("_s").cast("double") * F.col("_s").cast("double") / nd
    ssw = F.col("_q").cast("double") - F.col("_rs")
    fstat = (ssb / (k - F.lit(1)).cast("double")) / (
        ssw / (n - k).cast("double")
    )
    ok = (k > 1) & (n > k) & (ssw > 0)
    return agg.select(
        "k",
        "n",
        F.round(F.when(ok, fstat), round_to).alias("f_stat"),
        F.round(F.when(ok, ssb / (ssb + ssw)), round_to).alias("eta_sq"),
    )


def anova_oneway_oracle_sql(
    values_sql: str,
    value_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT group sums, same group-ordered float
    fold, same pinned F/η² tail."""
    return f"""
WITH vals AS ({values_sql}),
grp AS (
  SELECT {group_col} AS _g, CAST(COUNT(*) AS BIGINT) AS _ng,
         SUM(CAST({value_col} AS HUGEINT)) AS _sg,
         SUM(CAST({value_col} AS HUGEINT) * CAST({value_col} AS HUGEINT)) AS _qg
  FROM vals GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(_ng) AS BIGINT) AS n,
         SUM(_sg) AS _s, SUM(_qg) AS _q,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(CAST(_sg AS DOUBLE) * CAST(_sg AS DOUBLE) / CAST(_ng AS DOUBLE)
                ORDER BY _g)),
           (a, b) -> a + b) AS _rs
  FROM grp
),
calc AS (
  SELECT k, n,
         _rs - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE) / CAST(n AS DOUBLE) AS _ssb,
         CAST(_q AS DOUBLE) - _rs AS _ssw
  FROM agg
)
SELECT k, n,
       ROUND(CASE WHEN k > 1 AND n > k AND _ssw > 0 THEN
         (_ssb / CAST(k - 1 AS DOUBLE)) / (_ssw / CAST(n - k AS DOUBLE))
         END, {round_to}) AS f_stat,
       ROUND(CASE WHEN k > 1 AND n > k AND _ssw > 0 THEN
         _ssb / (_ssb + _ssw) END, {round_to}) AS eta_sq
FROM calc
"""


def brown_forsythe(
    df: DataFrame,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
    max_groups: int | None = 10_000,
) -> DataFrame:
    """Brown-Forsythe test for equal variances across k groups — the
    robust Levene variant (deviations from the group MEDIAN, not the
    mean) that guards the ANOVA/t-test family's homoscedasticity
    assumption before anyone trusts its F:

        z_ij = |x_ij − med_g|,   F_BF = one-way ANOVA F over z.

    Exactness: group medians come from the bounded value spine with the
    DOUBLED-median trick — m2_g = v_lo + v_hi (the two middle order
    statistics from the per-group cumulative histogram) is an INTEGER,
    so the deviations d2 = |2·x − m2_g| and all their sums/squares stay
    DECIMAL-exact; only the final F assembly (the same ordered
    Σ S_g²/n_g fold + pinned tail as :func:`anova_oneway`) touches
    floats. Output one row: ``(k, n, f_stat)``.

    The cumulative-histogram window is PARTITIONED by group (ordered by
    the bounded value spine) — no unpartitioned window anywhere.
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "brown_forsythe")
    require_bounded_spine(df, group_col, [], max_groups, "brown_forsythe")
    dec = lambda c: c.cast("decimal(38,0)")
    per = df.groupBy(
        F.col(group_col).alias("_g"),
        integral_long(df, bucket_col, "brown_forsythe").alias("_v"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    wg = Window.partitionBy("_g").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "_g",
        "_v",
        "_c",
        F.sum("_c").over(wg).alias("_cum"),
        F.sum("_c").over(Window.partitionBy("_g")).alias("_ng"),
    )
    # doubled median: the two middle order statistics — v_lo at rank
    # ceil(n/2) = (n+1) div 2, v_hi at rank n div 2 + 1 (equal ranks
    # when n is odd, the two middles when even)
    med = cum.groupBy("_g").agg(
        F.min(
            F.when(
                F.col("_cum") >= F.expr("(_ng + 1) div 2"), F.col("_v")
            )
        ).alias("_vlo"),
        F.min(
            F.when(F.col("_cum") >= F.expr("_ng div 2 + 1"), F.col("_v"))
        ).alias("_vhi"),
    ).select("_g", (F.col("_vlo") + F.col("_vhi")).alias("_m2"))
    dev = (
        per.join(med, "_g")
        .select(
            "_g",
            "_c",
            F.abs(F.lit(2) * F.col("_v") - F.col("_m2")).alias("_d2"),
        )
    )
    grp = dev.groupBy("_g").agg(
        F.sum("_c").alias("_ng"),
        F.sum(dec(F.col("_c")) * dec(F.col("_d2"))).alias("_sg"),
        F.sum(dec(F.col("_c")) * dec(F.col("_d2")) * dec(F.col("_d2"))).alias("_qg"),
    )
    agg = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ng").alias("n"),
        F.sum("_sg").alias("_s"),
        F.sum("_qg").alias("_q"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").alias("g"),
                    (
                        F.col("_sg").cast("double")
                        * F.col("_sg").cast("double")
                        / F.col("_ng").cast("double")
                    ).alias("term"),
                )
            )
        ).alias("_terms"),
    ).withColumn(
        "_rs",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["term"]),
    )
    k, n = F.col("k"), F.col("n")
    nd = n.cast("double")
    ssb = F.col("_rs") - F.col("_s").cast("double") * F.col("_s").cast("double") / nd
    ssw = F.col("_q").cast("double") - F.col("_rs")
    fstat = (ssb / (k - F.lit(1)).cast("double")) / (
        ssw / (n - k).cast("double")
    )
    ok = (k > 1) & (n > k) & (ssw > 0)
    return agg.select(
        "k", "n", F.round(F.when(ok, fstat), round_to).alias("f_stat")
    )


def brown_forsythe_oracle_sql(
    values_sql: str,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same doubled group medians from the per-group
    cumulative histogram, same HUGEINT deviation sums, same ordered
    fold + pinned F tail."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {group_col} AS _g, CAST({bucket_col} AS BIGINT) AS _v,
         CAST(COUNT(*) AS BIGINT) AS _c
  FROM vals GROUP BY 1, 2
),
cum AS (
  SELECT _g, _v, _c,
         SUM(_c) OVER (PARTITION BY _g ORDER BY _v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         SUM(_c) OVER (PARTITION BY _g) AS _ng
  FROM per
),
med AS (
  SELECT _g,
         MIN(CASE WHEN _cum >= (_ng + 1) // 2 THEN _v END)
         + MIN(CASE WHEN _cum >= _ng // 2 + 1 THEN _v END) AS _m2
  FROM cum GROUP BY _g
),
grp AS (
  SELECT p._g, CAST(SUM(p._c) AS BIGINT) AS _ng,
         SUM(CAST(p._c AS HUGEINT) * CAST(ABS(2 * p._v - m._m2) AS HUGEINT)) AS _sg,
         SUM(CAST(p._c AS HUGEINT) * CAST(ABS(2 * p._v - m._m2) AS HUGEINT)
             * CAST(ABS(2 * p._v - m._m2) AS HUGEINT)) AS _qg
  FROM per p JOIN med m ON p._g = m._g
  GROUP BY p._g
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(_ng) AS BIGINT) AS n,
         SUM(_sg) AS _s, SUM(_qg) AS _q,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(CAST(_sg AS DOUBLE) * CAST(_sg AS DOUBLE) / CAST(_ng AS DOUBLE)
                ORDER BY _g)),
           (a, b) -> a + b) AS _rs
  FROM grp
),
calc AS (
  SELECT k, n,
         _rs - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE) / CAST(n AS DOUBLE) AS _ssb,
         CAST(_q AS DOUBLE) - _rs AS _ssw
  FROM agg
)
SELECT k, n,
       ROUND(CASE WHEN k > 1 AND n > k AND _ssw > 0 THEN
         (_ssb / CAST(k - 1 AS DOUBLE)) / (_ssw / CAST(n - k AS DOUBLE))
         END, {round_to}) AS f_stat
FROM calc
"""


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
    max_x_buckets: int | None = 1000,
    max_y_buckets: int | None = 1000,
    max_cells: int | None = 25_000,
) -> DataFrame:
    """Kendall's τ-b rank correlation over two BOUNDED-spine columns —
    the concordance companion to the Spearman/Pearson correlations the
    repo already carries (Spearman measures monotone fit via ranks;
    τ-b counts concordant vs discordant PAIRS, the more robust readout
    under heavy ties):

        τ_b = (C − D) / sqrt((n0 − n1)(n0 − n2)),
        n0 = n(n−1)/2, n1 = Σ t_x(t_x−1)/2, n2 = Σ t_y(t_y−1)/2.

    Exactness AND scale: naive τ is O(n²) over ROWS — undistributable.
    Over bucketed spines it collapses to the joint histogram: C and D
    are cell-pair sums Σ n_a·n_b over V² CELL pairs (V = distinct
    JOINT cells, guarded by ``max_cells`` — the per-axis caps alone
    would admit V up to their product), every count/product an exact
    DECIMAL(38,0), with the single pinned sqrt tail at the end. The
    cell self-join is restricted to x_b > x_a (each unordered pair
    counted once; x-ties contribute to neither C nor D). Output one
    row: ``(n, concordant, discordant, tau_b)``.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, x_col, [], max_x_buckets, "kendall_tau")
    require_bounded_spine(df, y_col, [], max_y_buckets, "kendall_tau")
    # the per-axis caps bound each margin, but the concordance self-join
    # is over JOINT cells: V distinct (x,y) cells cost ~V²/2 compared
    # pairs in the x-range join, so V must be guarded directly or the
    # defaults admit a 5e11-pair blowup
    if max_cells is not None:
        joint = df.select(
            F.struct(F.col(x_col), F.col(y_col)).alias("_cell")
        )
        require_bounded_spine(joint, "_cell", [], max_cells, "kendall_tau")
    dec = lambda c: c.cast("decimal(38,0)")
    cells = df.groupBy(
        integral_long(df, x_col, "kendall_tau").alias("_x"),
        integral_long(df, y_col, "kendall_tau").alias("_y"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    a = cells.select(
        F.col("_x").alias("_xa"), F.col("_y").alias("_ya"), F.col("_c").alias("_ca")
    )
    b = cells.select(
        F.col("_x").alias("_xb"), F.col("_y").alias("_yb"), F.col("_c").alias("_cb")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    # coalesce: an all-tied-x input has ZERO x-ordered cell pairs and
    # the empty-join sums must read 0, not NULL
    pairs = a.join(b, F.col("_xb") > F.col("_xa")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_yb") > F.col("_ya"),
                    dec(F.col("_ca")) * dec(F.col("_cb")),
                ).otherwise(zero)
            ),
            zero,
        ).alias("concordant"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_yb") < F.col("_ya"),
                    dec(F.col("_ca")) * dec(F.col("_cb")),
                ).otherwise(zero)
            ),
            zero,
        ).alias("discordant"),
    )
    margins = cells.agg(
        F.sum("_c").alias("n"),
        F.sum(dec(F.col("_c")) * dec(F.col("_c") - F.lit(1))).alias("_txy2"),
    )
    tx = (
        cells.groupBy("_x")
        .agg(F.sum("_c").alias("_t"))
        .agg(F.sum(dec(F.col("_t")) * dec(F.col("_t") - F.lit(1))).alias("_tx2"))
    )
    ty = (
        cells.groupBy("_y")
        .agg(F.sum("_c").alias("_t"))
        .agg(F.sum(dec(F.col("_t")) * dec(F.col("_t") - F.lit(1))).alias("_ty2"))
    )
    out = pairs.crossJoin(margins).crossJoin(tx).crossJoin(ty)
    n = F.col("n")
    n02 = dec(n) * dec(n - F.lit(1))  # 2·n0
    den = F.sqrt(
        (n02 - F.col("_tx2")).cast("double") * (n02 - F.col("_ty2")).cast("double")
    )
    num = F.lit(2.0) * (
        F.col("concordant").cast("double") - F.col("discordant").cast("double")
    )
    return out.select(
        "n",
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.round(
            F.when((n > 1) & ((n02 - F.col("_tx2")) > 0) & ((n02 - F.col("_ty2")) > 0), num / den),
            round_to,
        ).alias("tau_b"),
    )


def kendall_tau_oracle_sql(
    values_sql: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same joint-histogram cell-pair concordance counts
    (HUGEINT), same doubled-n0 tie margins, same pinned 2(C−D)/sqrt
    tail."""
    return f"""
WITH vals AS ({values_sql}),
cells AS MATERIALIZED (
  SELECT CAST({x_col} AS BIGINT) AS _x, CAST({y_col} AS BIGINT) AS _y,
         CAST(COUNT(*) AS BIGINT) AS _c
  FROM vals GROUP BY 1, 2
),
pairs AS (
  SELECT
    COALESCE(SUM(CASE WHEN b._y > a._y
             THEN CAST(a._c AS HUGEINT) * CAST(b._c AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END), CAST(0 AS HUGEINT)) AS concordant,
    COALESCE(SUM(CASE WHEN b._y < a._y
             THEN CAST(a._c AS HUGEINT) * CAST(b._c AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END), CAST(0 AS HUGEINT)) AS discordant
  FROM cells a JOIN cells b ON b._x > a._x
),
margins AS (
  SELECT CAST(SUM(_c) AS BIGINT) AS n FROM cells
),
tx AS (
  SELECT SUM(CAST(_t AS HUGEINT) * CAST(_t - 1 AS HUGEINT)) AS _tx2
  FROM (SELECT CAST(SUM(_c) AS BIGINT) AS _t FROM cells GROUP BY _x)
),
ty AS (
  SELECT SUM(CAST(_t AS HUGEINT) * CAST(_t - 1 AS HUGEINT)) AS _ty2
  FROM (SELECT CAST(SUM(_c) AS BIGINT) AS _t FROM cells GROUP BY _y)
)
SELECT n, CAST(concordant AS BIGINT) AS concordant,
       CAST(discordant AS BIGINT) AS discordant,
       ROUND(CASE WHEN n > 1
             AND CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) - _tx2 > 0
             AND CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) - _ty2 > 0
             THEN 2.0 * (CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
                  / SQRT(CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) - _tx2 AS DOUBLE)
                         * CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) - _ty2 AS DOUBLE))
             END, {round_to}) AS tau_b
FROM pairs, margins, tx, ty
"""


def regression_influence(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    top_n: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-point OLS influence diagnostics for each group's y~x fit —
    leverage and Cook's distance, surfacing the ``top_n`` most
    fit-distorting points per group. The row-level companion to
    :func:`grouped_linreg` (the fit) and :func:`loo_group_influence`
    (group-level leave-out): "which individual records are bending this
    source's trend line".

    Exactness (exact one-scan algebra, not per-point refits): with the
    integer group moments S_x, S_y, S_xx, S_xy, S_yy,

        βnum = n·S_xy − S_x·S_y,  βden = n·S_xx − S_x²,
        R_i  = βden·(n·y_i − S_y) − βnum·(n·x_i − S_x)   (∝ residual),

    every quantity above is an exact DECIMAL(38,0) integer (width
    MEASURED fail-fast: 8·n³·max|x|²·max|y| < 10³⁸); leverage
    h_i = 1/n + (n·x_i − S_x)²/(n·βden), the residual e_i = R_i/(n·βden),
    s² = SSE/(n−2) and Cook's D_i = e_i²·h_i/(2·s²·(1−h_i)²) are the
    pinned float tail, token-identical in the oracle. The per-group
    top-n window orders by (cooks_d DESC, id ASC) — both engines rank
    identical doubles identically.

    Output: ``(group, id, x, y, leverage, cooks_d, rnk)`` for the
    ``top_n`` rows per group (groups need n > 2, nonzero x variance and
    SSE > 0 — degenerate groups yield no rows).
    """
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        integral_long(df, x_col, "regression_influence").alias("_x"),
        integral_long(df, y_col, "regression_influence").alias("_y"),
    )
    stats = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x")) * dec(F.col("_x"))).alias("_sxx"),
        F.sum(dec(F.col("_x")) * dec(F.col("_y"))).alias("_sxy"),
        F.sum(dec(F.col("_y")) * dec(F.col("_y"))).alias("_syy"),
        F.max(F.abs(F.col("_x"))).alias("_mx"),
        F.max(F.abs(F.col("_y"))).alias("_my"),
    )
    w = stats.agg(
        F.max("_n").alias("_n"),
        F.max("_mx").alias("_mx"),
        F.max("_my").alias("_my"),
    ).first()
    n_w, mx_w, my_w = (int(w[c] or 0) for c in ("_n", "_mx", "_my"))
    if 8 * (n_w**3) * (mx_w**2) * max(my_w, mx_w) >= 10**38:
        raise ValueError(
            f"regression_influence: 8·n³·max|x|²·max(|y|,|x|) = "
            f"8·{n_w}³·{mx_w}²·{max(my_w, mx_w)} would overflow the "
            "DECIMAL(38,0) residual numerators — rescale x/y or "
            "pre-aggregate"
        )
    j = base.join(stats.drop("_mx", "_my"), "_g")
    n = F.col("_n")
    bnum = dec(n) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    bden = dec(n) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dx = dec(n) * dec(F.col("_x")) - F.col("_sx")
    dy = dec(n) * dec(F.col("_y")) - F.col("_sy")
    r_i = bden * dy - bnum * dx
    syyc = dec(n) * F.col("_syy") - F.col("_sy") * F.col("_sy")
    nd = n.cast("double")
    nbden = (dec(n) * bden).cast("double")
    h = F.lit(1.0) / nd + (dx * dx).cast("double") / nbden
    e = r_i.cast("double") / nbden
    sse = syyc.cast("double") / nd - (
        bnum.cast("double") * bnum.cast("double")
    ) / nbden
    s2 = sse / (nd - F.lit(2.0))
    cooks = (e * e * h) / (
        F.lit(2.0) * s2 * (F.lit(1.0) - h) * (F.lit(1.0) - h)
    )
    ok = (n > 2) & (bden > 0) & (sse > 0) & (h < 1.0)
    scored = j.where(ok).select(
        "_g",
        "_id",
        "_x",
        "_y",
        h.alias("_h"),
        cooks.alias("_cd"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("_g").orderBy(
            F.col("_cd").desc(), F.col("_id").asc()
        )
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= top_n)
        .select(
            F.col("_g").alias(group_col),
            F.col("_id").alias(id_col),
            F.col("_x").alias(x_col),
            F.col("_y").alias(y_col),
            F.round(F.col("_h"), round_to).alias("leverage"),
            F.round(F.col("_cd"), round_to).alias("cooks_d"),
            "rnk",
        )
    )


def regression_influence_oracle_sql(
    points_sql: str,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    top_n: int = 3,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT moments/residual numerators, same
    pinned leverage/Cook's tail, same (cooks DESC, id ASC) QUALIFY
    top-n."""
    return f"""
WITH base AS MATERIALIZED (
  SELECT {group_col} AS _g, {id_col} AS _id,
         CAST({x_col} AS BIGINT) AS _x, CAST({y_col} AS BIGINT) AS _y
  FROM ({points_sql})
),
stats AS (
  SELECT _g, CAST(COUNT(*) AS BIGINT) AS _n,
         SUM(CAST(_x AS HUGEINT)) AS _sx, SUM(CAST(_y AS HUGEINT)) AS _sy,
         SUM(CAST(_x AS HUGEINT) * CAST(_x AS HUGEINT)) AS _sxx,
         SUM(CAST(_x AS HUGEINT) * CAST(_y AS HUGEINT)) AS _sxy,
         SUM(CAST(_y AS HUGEINT) * CAST(_y AS HUGEINT)) AS _syy
  FROM base GROUP BY _g
),
scored AS (
  SELECT b._g, b._id, b._x, b._y,
         1.0 / CAST(s._n AS DOUBLE)
         + CAST((CAST(s._n AS HUGEINT) * b._x - s._sx)
                * (CAST(s._n AS HUGEINT) * b._x - s._sx) AS DOUBLE)
           / CAST(CAST(s._n AS HUGEINT)
                  * (CAST(s._n AS HUGEINT) * s._sxx - s._sx * s._sx) AS DOUBLE)
         AS _h,
         CAST((CAST(s._n AS HUGEINT) * s._sxx - s._sx * s._sx)
              * (CAST(s._n AS HUGEINT) * b._y - s._sy)
              - (CAST(s._n AS HUGEINT) * s._sxy - s._sx * s._sy)
                * (CAST(s._n AS HUGEINT) * b._x - s._sx) AS DOUBLE)
         / CAST(CAST(s._n AS HUGEINT)
                * (CAST(s._n AS HUGEINT) * s._sxx - s._sx * s._sx) AS DOUBLE)
         AS _e,
         CAST(CAST(s._n AS HUGEINT) * s._syy - s._sy * s._sy AS DOUBLE)
           / CAST(s._n AS DOUBLE)
         - (CAST(CAST(s._n AS HUGEINT) * s._sxy - s._sx * s._sy AS DOUBLE)
            * CAST(CAST(s._n AS HUGEINT) * s._sxy - s._sx * s._sy AS DOUBLE))
           / CAST(CAST(s._n AS HUGEINT)
                  * (CAST(s._n AS HUGEINT) * s._sxx - s._sx * s._sx) AS DOUBLE)
         AS _sse,
         s._n AS _n,
         CAST(s._n AS HUGEINT) * s._sxx - s._sx * s._sx AS _bden
  FROM base b JOIN stats s ON b._g = s._g
),
flagged AS (
  SELECT _g, _id, _x, _y, _h,
         (_e * _e * _h)
         / (2.0 * (_sse / (CAST(_n AS DOUBLE) - 2.0))
            * (1.0 - _h) * (1.0 - _h)) AS _cd
  FROM scored
  WHERE _n > 2 AND _bden > 0 AND _sse > 0 AND _h < 1.0
)
SELECT _g AS {group_col}, _id AS {id_col}, _x AS {x_col}, _y AS {y_col},
       ROUND(_h, {round_to}) AS leverage, ROUND(_cd, {round_to}) AS cooks_d,
       CAST(ROW_NUMBER() OVER (PARTITION BY _g ORDER BY _cd DESC, _id ASC)
            AS INTEGER) AS rnk
FROM flagged
QUALIFY rnk <= {top_n}
"""


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
    round_to: int = 6,
    max_strata: int | None = 10_000,
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across strata — the
    confounder-adjusted completion of :func:`odds_ratio` (crude OR
    answers "does treatment associate with outcome"; MH answers it
    WITHIN each stratum and pools, the classic Simpson's-paradox
    guard):

        OR_MH = Σ_i (a_i·d_i / n_i) / Σ_i (b_i·c_i / n_i),

    reported next to the CRUDE pooled OR (Σa·Σd)/(Σb·Σc) — the two
    disagreeing is the confounding readout. Exactness: the four cells
    per stratum are exact integers; each a·d/n term is one pinned
    division folded in STRATUM ORDER (bounded catalog by contract,
    ``max_strata`` guard); the crude OR is exact DECIMAL products with
    one division. Output one row: ``(n_strata, n, or_crude, or_mh)`` —
    NULL ORs when a denominator is 0.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, stratum_col, [], max_strata, "mantel_haenszel")
    dec = lambda c: c.cast("decimal(38,0)")
    t = F.col(treat_col).cast("int")
    o = F.col(outcome_col).cast("int")
    per = df.groupBy(F.col(stratum_col).alias("_q")).agg(
        F.sum(F.when((t == 1) & (o == 1), 1).otherwise(0)).alias("_a"),
        F.sum(F.when((t == 1) & (o == 0), 1).otherwise(0)).alias("_b"),
        F.sum(F.when((t == 0) & (o == 1), 1).otherwise(0)).alias("_c"),
        F.sum(F.when((t == 0) & (o == 0), 1).otherwise(0)).alias("_d"),
    )
    ni = F.col("_a") + F.col("_b") + F.col("_c") + F.col("_d")
    term = lambda p, q: (dec(p) * dec(q)).cast("double") / ni.cast("double")
    agg = per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(ni).alias("n"),
        F.sum(dec(F.col("_a"))).alias("_sa"),
        F.sum(dec(F.col("_b"))).alias("_sb"),
        F.sum(dec(F.col("_c"))).alias("_sc"),
        F.sum(dec(F.col("_d"))).alias("_sd"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_q").alias("q"),
                    term(F.col("_a"), F.col("_d")).alias("ad"),
                    term(F.col("_b"), F.col("_c")).alias("bc"),
                )
            )
        ).alias("_terms"),
    )
    folded = agg.withColumn(
        "_sad",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["ad"]),
    ).withColumn(
        "_sbc",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["bc"]),
    )
    crude_num = (F.col("_sa") * F.col("_sd")).cast("double")
    crude_den = (F.col("_sb") * F.col("_sc")).cast("double")
    return folded.select(
        "n_strata",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.when(crude_den > 0, crude_num / crude_den), round_to
        ).alias("or_crude"),
        F.round(
            F.when(F.col("_sbc") > 0, F.col("_sad") / F.col("_sbc")),
            round_to,
        ).alias("or_mh"),
    )


def mantel_haenszel_oracle_sql(
    units_sql: str,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same per-stratum cells, same stratum-ordered
    a·d/n and b·c/n folds, same crude-OR DECIMAL products."""
    t = f"CAST({treat_col} AS INTEGER)"
    o = f"CAST({outcome_col} AS INTEGER)"
    return f"""
WITH units AS ({units_sql}),
per AS (
  SELECT {stratum_col} AS _q,
         CAST(SUM(CASE WHEN {t} = 1 AND {o} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS _a,
         CAST(SUM(CASE WHEN {t} = 1 AND {o} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS _b,
         CAST(SUM(CASE WHEN {t} = 0 AND {o} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS _c,
         CAST(SUM(CASE WHEN {t} = 0 AND {o} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS _d
  FROM units GROUP BY {stratum_col}
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(_a + _b + _c + _d) AS BIGINT) AS n,
         SUM(CAST(_a AS HUGEINT)) AS _sa, SUM(CAST(_b AS HUGEINT)) AS _sb,
         SUM(CAST(_c AS HUGEINT)) AS _sc, SUM(CAST(_d AS HUGEINT)) AS _sd,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(CAST(CAST(_a AS HUGEINT) * CAST(_d AS HUGEINT) AS DOUBLE)
                / CAST(_a + _b + _c + _d AS DOUBLE) ORDER BY _q)),
           (x, y) -> x + y) AS _sad,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(CAST(CAST(_b AS HUGEINT) * CAST(_c AS HUGEINT) AS DOUBLE)
                / CAST(_a + _b + _c + _d AS DOUBLE) ORDER BY _q)),
           (x, y) -> x + y) AS _sbc
  FROM per
)
SELECT n_strata, n,
       ROUND(CASE WHEN CAST(_sb * _sc AS DOUBLE) > 0
             THEN CAST(_sa * _sd AS DOUBLE) / CAST(_sb * _sc AS DOUBLE)
             END, {round_to}) AS or_crude,
       ROUND(CASE WHEN _sbc > 0 THEN _sad / _sbc END, {round_to}) AS or_mh
FROM agg
"""


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
    max_treatments: int | None = 10_000,
) -> DataFrame:
    """Friedman test — k related treatments ranked WITHIN each block
    (the repeated-measures sibling of :func:`kruskal_wallis`: KW
    compares independent groups; Friedman removes the block effect by
    ranking inside each block first). The "do my k scorers disagree
    systematically across the same documents" readout.

    Exactness: within-block midranks use the DOUBLED-rank trick
    (2·midrank = 2·before + t + 1 over the per-block value histogram —
    an INTEGER), and the tie-corrected statistic

        Q = (k−1)·Σ_j (R2_j − n(k+1))² / (Σ_ij R2_ij² − n·k·(k+1)²)

    is integer-exact in BOTH numerator and denominator in the doubled
    scale (the 4s cancel) — one pinned division total, no float fold at
    all. Incomplete blocks (missing or duplicated treatments) are
    DROPPED and counted, the :func:`cronbach_alpha` convention. Output
    one row: ``(k, n_blocks, n_dropped, q)`` — NULL q when k < 2,
    n = 0, or every block is internally tied (denominator 0).

    Scale: per-block windows only (blocks are the partition key); the
    treatment catalog is bounded by contract (``max_treatments``).
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, treatment_col, [], max_treatments, "friedman_test")
    dec = lambda c: c.cast("decimal(38,0)")
    base = df.select(
        F.col(block_col).alias("_b"),
        F.col(treatment_col).alias("_j"),
        integral_long(df, value_col, "friedman_test").alias("_v"),
    )
    k_row = base.select(F.countDistinct("_j").alias("k")).first()
    k = int(k_row["k"] or 0)
    per_block = base.groupBy("_b").agg(
        F.countDistinct("_j").alias("_nj"), F.count(F.lit(1)).alias("_nr")
    )
    from .dedup import _persist

    complete = _persist(
        per_block.where(
            (F.col("_nj") == F.lit(k)) & (F.col("_nr") == F.lit(k))
        ).select("_b")
    )
    n_complete = complete.count()
    n_dropped = per_block.count() - n_complete
    if n_complete == 0:
        # no complete block anywhere: emit the one-row summary instead
        # of an empty frame (the SQL twin returns 0 rows here — the
        # engines only diverge in this degenerate no-data case, which a
        # gate fixture must not hit anyway)
        from pyspark.sql import types as T

        return df.sparkSession.createDataFrame(
            [(k, 0, n_dropped, None)],
            T.StructType(
                [
                    T.StructField("k", T.LongType()),
                    T.StructField("n_blocks", T.LongType()),
                    T.StructField("n_dropped", T.LongType()),
                    T.StructField("q", T.DoubleType()),
                ]
            ),
        )
    rows = base.join(complete, "_b")
    # within-block doubled midranks over the (block, value) histogram
    hist = rows.groupBy("_b", "_v").agg(F.count(F.lit(1)).alias("_t"))
    wb = Window.partitionBy("_b").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = hist.select(
        "_b", "_v", "_t", (F.sum("_t").over(wb) - F.col("_t")).alias("_bef")
    )
    ranked = rows.join(hist, ["_b", "_v"]).select(
        "_b",
        "_j",
        (F.lit(2) * F.col("_bef") + F.col("_t") + F.lit(1)).alias("_r2"),
    )
    tr = ranked.groupBy("_j").agg(F.sum(dec(F.col("_r2"))).alias("_r2j"))
    glob = ranked.agg(
        F.countDistinct("_b").alias("n_blocks"),
        F.sum(dec(F.col("_r2")) * dec(F.col("_r2"))).alias("_sumsq"),
    )
    out = (
        tr.crossJoin(glob)
        .select(
            "n_blocks",
            "_sumsq",
            (
                (F.col("_r2j") - dec(F.col("n_blocks")) * dec(F.lit(k + 1)))
                * (F.col("_r2j") - dec(F.col("n_blocks")) * dec(F.lit(k + 1)))
            ).alias("_dev2"),
        )
        .groupBy("n_blocks", "_sumsq")
        .agg(F.sum("_dev2").alias("_num"))
    )
    nb = F.col("n_blocks")
    den = F.col("_sumsq") - dec(nb) * dec(F.lit(k)) * dec(F.lit((k + 1) ** 2))
    q = (dec(F.lit(k - 1)) * F.col("_num")).cast("double") / den.cast("double")
    return out.select(
        F.lit(k).cast("long").alias("k"),
        nb.cast("long").alias("n_blocks"),
        F.lit(n_dropped).cast("long").alias("n_dropped"),
        F.round(F.when((F.lit(k) > 1) & (nb > 0) & (den > 0), q), round_to).alias(
            "q"
        ),
    )


def friedman_test_oracle_sql(
    rows_sql: str,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same complete-block filter, same doubled within-
    block midranks, same all-integer Q with one pinned division."""
    return f"""
WITH base AS MATERIALIZED (
  SELECT {block_col} AS _b, {treatment_col} AS _j,
         CAST({value_col} AS BIGINT) AS _v
  FROM ({rows_sql})
),
nk AS (SELECT COUNT(DISTINCT _j) AS k FROM base),
per_block AS MATERIALIZED (
  SELECT _b, COUNT(DISTINCT _j) AS _nj, COUNT(*) AS _nr
  FROM base GROUP BY _b
),
complete AS MATERIALIZED (
  SELECT _b FROM per_block, nk WHERE _nj = k AND _nr = k
),
dropped AS (
  SELECT (SELECT COUNT(*) FROM per_block) - (SELECT COUNT(*) FROM complete)
         AS n_dropped
),
rows_c AS MATERIALIZED (
  SELECT b.* FROM base b JOIN complete c ON b._b = c._b
),
hist AS (
  SELECT _b, _v, CAST(COUNT(*) AS BIGINT) AS _t,
         SUM(COUNT(*)) OVER (PARTITION BY _b ORDER BY _v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - COUNT(*) AS _bef
  FROM rows_c GROUP BY _b, _v
),
ranked AS MATERIALIZED (
  SELECT r._b, r._j, 2 * h._bef + h._t + 1 AS _r2
  FROM rows_c r JOIN hist h ON r._b = h._b AND r._v = h._v
),
tr AS (
  SELECT _j, SUM(CAST(_r2 AS HUGEINT)) AS _r2j FROM ranked GROUP BY _j
),
gl AS (
  SELECT CAST(COUNT(DISTINCT _b) AS BIGINT) AS n_blocks,
         SUM(CAST(_r2 AS HUGEINT) * CAST(_r2 AS HUGEINT)) AS _sumsq
  FROM ranked
),
num AS (
  SELECT g.n_blocks, g._sumsq,
         SUM((t._r2j - CAST(g.n_blocks AS HUGEINT) * ((SELECT k FROM nk) + 1))
             * (t._r2j - CAST(g.n_blocks AS HUGEINT) * ((SELECT k FROM nk) + 1)))
         AS _num
  FROM tr t, gl g GROUP BY g.n_blocks, g._sumsq
)
SELECT (SELECT k FROM nk) AS k, n_blocks,
       (SELECT n_dropped FROM dropped) AS n_dropped,
       ROUND(CASE WHEN (SELECT k FROM nk) > 1 AND n_blocks > 0
             AND _sumsq - CAST(n_blocks AS HUGEINT) * (SELECT k FROM nk)
                 * ((SELECT k FROM nk) + 1) * ((SELECT k FROM nk) + 1) > 0
             THEN CAST(((SELECT k FROM nk) - 1) * _num AS DOUBLE)
                  / CAST(_sumsq - CAST(n_blocks AS HUGEINT) * (SELECT k FROM nk)
                         * ((SELECT k FROM nk) + 1) * ((SELECT k FROM nk) + 1)
                         AS DOUBLE)
             END, {round_to}) AS q
FROM num
"""


def cochran_q(
    df: DataFrame,
    item_col: str,
    treatment_col: str,
    outcome_col: str,
    round_to: int = 6,
    max_treatments: int | None = 10_000,
) -> DataFrame:
    """Cochran's Q — k related BINARY treatments over the same items
    (the 0/1 specialization of :func:`friedman_test`, and the k-arm
    extension of the McNemar pair test): "do my k binary detectors
    fire at systematically different rates on the same documents".

        Q = k(k−1)·[k·Σ_j G_j² − (Σ G)²] / [k·(k·ΣL_i − ΣL_i²)]
          (equivalently k(k−1)Σ(G_j−Ḡ)² / (kΣL − ΣL²))

    with G_j the per-treatment fire counts and L_i the per-item fire
    counts — EVERY term an exact integer; the single division is the
    only float op. Items that fire on all k or none (L_i ∈ {0, k})
    contribute nothing to either side — kept, but Q is NULL when ONLY
    such items exist (denominator 0). Incomplete items are dropped and
    counted (the complete-design convention). Output one row:
    ``(k, n_items, n_dropped, q)``.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, treatment_col, [], max_treatments, "cochran_q")
    dec = lambda c: c.cast("decimal(38,0)")
    base = df.select(
        F.col(item_col).alias("_i"),
        F.col(treatment_col).alias("_j"),
        F.col(outcome_col).cast("int").alias("_o"),
    )
    k_row = base.select(F.countDistinct("_j").alias("k")).first()
    k = int(k_row["k"] or 0)
    per_item = base.groupBy("_i").agg(
        F.countDistinct("_j").alias("_nj"),
        F.count(F.lit(1)).alias("_nr"),
        F.sum("_o").alias("_l"),
    )
    from .dedup import _persist

    complete = _persist(
        per_item.where(
            (F.col("_nj") == F.lit(k)) & (F.col("_nr") == F.lit(k))
        ).select("_i", "_l")
    )
    n_dropped = per_item.count() - complete.count()
    gj = (
        base.join(complete.select("_i"), "_i")
        .groupBy("_j")
        .agg(F.sum("_o").alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_kk"),
            F.sum(dec(F.col("_g"))).alias("_sg"),
            F.sum(dec(F.col("_g")) * dec(F.col("_g"))).alias("_sg2"),
        )
    )
    li = complete.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec(F.col("_l"))).alias("_sl"),
        F.sum(dec(F.col("_l")) * dec(F.col("_l"))).alias("_sl2"),
    )
    out = gj.crossJoin(li)
    kd = dec(F.lit(k))
    num = kd * (kd - F.lit(1).cast("decimal(38,0)")) * (
        kd * F.col("_sg2") - F.col("_sg") * F.col("_sg")
    )
    den = kd * (kd * F.col("_sl") - F.col("_sl2"))
    return out.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_items").cast("long").alias("n_items"),
        F.lit(n_dropped).cast("long").alias("n_dropped"),
        F.round(
            F.when(
                (F.lit(k) > 1) & (den > 0),
                num.cast("double") / den.cast("double"),
            ),
            round_to,
        ).alias("q"),
    )


def cochran_q_oracle_sql(
    rows_sql: str,
    item_col: str,
    treatment_col: str,
    outcome_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same complete-item filter and all-integer Q."""
    return f"""
WITH base AS MATERIALIZED (
  SELECT {item_col} AS _i, {treatment_col} AS _j,
         CAST({outcome_col} AS INTEGER) AS _o
  FROM ({rows_sql})
),
nk AS (SELECT COUNT(DISTINCT _j) AS k FROM base),
per_item AS MATERIALIZED (
  SELECT _i, COUNT(DISTINCT _j) AS _nj, COUNT(*) AS _nr,
         CAST(SUM(_o) AS BIGINT) AS _l
  FROM base GROUP BY _i
),
complete AS MATERIALIZED (
  SELECT _i, _l FROM per_item, nk WHERE _nj = k AND _nr = k
),
dropped AS (
  SELECT (SELECT COUNT(*) FROM per_item) - (SELECT COUNT(*) FROM complete)
         AS n_dropped
),
gj AS (
  SELECT SUM(CAST(_g AS HUGEINT)) AS _sg,
         SUM(CAST(_g AS HUGEINT) * CAST(_g AS HUGEINT)) AS _sg2
  FROM (
    SELECT b._j, CAST(SUM(b._o) AS BIGINT) AS _g
    FROM base b JOIN complete c ON b._i = c._i
    GROUP BY b._j
  )
),
li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(CAST(_l AS HUGEINT)) AS _sl,
         SUM(CAST(_l AS HUGEINT) * CAST(_l AS HUGEINT)) AS _sl2
  FROM complete
)
SELECT (SELECT k FROM nk) AS k, n_items,
       (SELECT n_dropped FROM dropped) AS n_dropped,
       ROUND(CASE WHEN (SELECT k FROM nk) > 1
             AND (SELECT k FROM nk) * ((SELECT k FROM nk) * _sl - _sl2) > 0
             THEN CAST((SELECT k FROM nk) * ((SELECT k FROM nk) - 1)
                       * ((SELECT k FROM nk) * _sg2 - _sg * _sg) AS DOUBLE)
                  / CAST((SELECT k FROM nk)
                         * ((SELECT k FROM nk) * _sl - _sl2) AS DOUBLE)
             END, {round_to}) AS q
FROM gj, li
"""


def effect_sizes(
    df: DataFrame,
    treat_col: str,
    value_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Standardized mean-difference effect sizes per segment — Cohen's d
    with the Hedges small-sample correction, the "how BIG is the
    difference" companion the `ab_test` z/p readout needs next to it
    (a p-value at corpus n is always significant; d says whether anyone
    should care):

        d = (x̄₁ − x̄₀) / s_pooled,
        s²_pooled = ((n₁−1)s₁² + (n₀−1)s₀²) / (n₁+n₀−2),
        g = d · (1 − 3/(4(n₁+n₀) − 9))      (Hedges & Olkin).

    Exactness: per-arm n, Σx, Σx² are exact DECIMAL(38,0) sums from ONE
    conditional aggregation; every later step (sample variances, the
    pooled blend, d, g) is the pinned float tail, token-identical in
    the oracle. Output per segment: ``(*by, n1, n0, mean_diff,
    cohens_d, hedges_g)`` — NULL d/g when either arm has < 2 rows or
    the pooled variance is 0.
    """
    from .guards import require_sum_sq_width

    require_sum_sq_width(df, value_col, "effect_sizes")
    keys = list(by or [])
    dec = lambda c: c.cast("decimal(38,0)")
    t = F.col(treat_col).cast("int")
    v = dec(integral_long(df, value_col, "effect_sizes"))
    per = df.groupBy(*keys).agg(
        F.sum(F.when(t == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(t == 1, v).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_s1"),
        F.sum(F.when(t == 1, v * v).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_q1"),
        F.sum(F.when(t == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(t == 0, v).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_s0"),
        F.sum(F.when(t == 0, v * v).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_q0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    n1d, n0d = n1.cast("double"), n0.cast("double")
    var1 = (dec(n1) * F.col("_q1") - F.col("_s1") * F.col("_s1")).cast(
        "double"
    ) / (n1d * (n1d - F.lit(1.0)))
    var0 = (dec(n0) * F.col("_q0") - F.col("_s0") * F.col("_s0")).cast(
        "double"
    ) / (n0d * (n0d - F.lit(1.0)))
    sp2 = ((n1d - F.lit(1.0)) * var1 + (n0d - F.lit(1.0)) * var0) / (
        n1d + n0d - F.lit(2.0)
    )
    diff = F.col("_s1").cast("double") / n1d - F.col("_s0").cast("double") / n0d
    d = diff / F.sqrt(sp2)
    g = d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (n1d + n0d) - F.lit(9.0)))
    ok = (n1 > 1) & (n0 > 1) & (sp2 > 0)
    out = per.select(
        *keys,
        n1.cast("long").alias("n1"),
        n0.cast("long").alias("n0"),
        F.round(F.when((n1 > 0) & (n0 > 0), diff), round_to).alias("mean_diff"),
        F.round(F.when(ok, d), round_to).alias("cohens_d"),
        F.round(F.when(ok, g), round_to).alias("hedges_g"),
    )
    return out.orderBy(*keys) if keys else out


def effect_sizes_oracle_sql(
    units_sql: str,
    treat_col: str,
    value_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same one-pass HUGEINT arm moments, same pinned
    variance/pool/d/g tail."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = (gc + ", ") if keys else ""
    order = f"ORDER BY {gc}" if keys else ""
    t = f"CAST({treat_col} AS INTEGER)"
    v = f"CAST({value_col} AS BIGINT)"
    return f"""
WITH units AS ({units_sql}),
per AS (
  SELECT {sel}
         CAST(SUM(CASE WHEN {t} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         SUM(CASE WHEN {t} = 1 THEN CAST({v} AS HUGEINT) ELSE 0 END) AS _s1,
         SUM(CASE WHEN {t} = 1 THEN CAST({v} AS HUGEINT) * CAST({v} AS HUGEINT) ELSE 0 END) AS _q1,
         CAST(SUM(CASE WHEN {t} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         SUM(CASE WHEN {t} = 0 THEN CAST({v} AS HUGEINT) ELSE 0 END) AS _s0,
         SUM(CASE WHEN {t} = 0 THEN CAST({v} AS HUGEINT) * CAST({v} AS HUGEINT) ELSE 0 END) AS _q0
  FROM units {("GROUP BY " + gc) if keys else ""}
),
calc AS (
  SELECT {sel}n1, n0,
         CAST(_s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         - CAST(_s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS _diff,
         ((CAST(n1 AS DOUBLE) - 1.0)
            * (CAST(CAST(n1 AS HUGEINT) * _q1 - _s1 * _s1 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
          + (CAST(n0 AS DOUBLE) - 1.0)
            * (CAST(CAST(n0 AS HUGEINT) * _q0 - _s0 * _s0 AS DOUBLE)
               / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0))))
         / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0) AS _sp2
  FROM per
)
SELECT {sel}n1, n0,
       ROUND(CASE WHEN n1 > 0 AND n0 > 0 THEN _diff END, {round_to}) AS mean_diff,
       ROUND(CASE WHEN n1 > 1 AND n0 > 1 AND _sp2 > 0
             THEN _diff / SQRT(_sp2) END, {round_to}) AS cohens_d,
       ROUND(CASE WHEN n1 > 1 AND n0 > 1 AND _sp2 > 0
             THEN (_diff / SQRT(_sp2))
                  * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)) - 9.0))
             END, {round_to}) AS hedges_g
FROM calc {order}
"""


def welch_anova(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
    max_groups: int | None = 10_000,
) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA — the k-group extension of
    the Welch t-test (`ab_test`) and the variance-honest sibling of
    :func:`anova_oneway`: when :func:`brown_forsythe` rejects equal
    variances, the classic F is invalid and THIS is the test to run.

        w_g = n_g/s_g²,  W = Σw_g,  m = Σ w_g·x̄_g / W,
        F_W = [Σ w_g(x̄_g − m)²/(k−1)] / [1 + 2Λ(k−2)/3],
        Λ   = 3·Σ (1 − w_g/W)²/(n_g−1) / (k²−1),
        df₂ = 1/Λ.

    Exactness: per-group n, Σx, Σx² are exact DECIMAL(38,0); every
    subsequent step is the pinned float tail computed via GROUP-ORDERED
    folds over one collected per-group array (three passes over the
    same sorted array: W, then m, then the two Σ-terms that need m) —
    token-identical in the oracle. Groups with n < 2 or zero variance
    are EXCLUDED (infinite weight) and counted. Output one row:
    ``(k, n, n_excluded, f_welch, df2)`` — NULL when fewer than 2
    usable groups survive.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, group_col, [], max_groups, "welch_anova")
    _require_sum_sq_width(df, value_col, "welch_anova")
    dec = lambda c: c.cast("decimal(38,0)")
    v = integral_long(df, value_col, "welch_anova")
    grp = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(v)).alias("_s"),
        F.sum(dec(v) * dec(v)).alias("_q"),
    )
    nd = F.col("_n").cast("double")
    # guard on the variance NUMERATOR, not the variance: evaluating
    # var for a singleton group divides by n(n-1)=0, which ANSI mode
    # raises on even inside the predicate
    varnum = (dec(F.col("_n")) * F.col("_q") - F.col("_s") * F.col("_s")).cast(
        "double"
    )
    var = varnum / (nd * (nd - F.lit(1.0)))
    usable = (F.col("_n") > 1) & (varnum > 0)
    agg = grp.agg(
        F.sum(F.when(usable, 1).otherwise(0)).alias("k"),
        F.sum(F.when(usable, F.col("_n")).otherwise(F.lit(0))).alias("n"),
        F.sum(F.when(~usable, 1).otherwise(0)).alias("n_excluded"),
        F.sort_array(
            F.collect_list(
                F.when(
                    usable,
                    F.struct(
                        F.col("_g").alias("g"),
                        nd.alias("n"),
                        (nd / var).alias("w"),
                        (F.col("_s").cast("double") / nd).alias("xb"),
                    ),
                )
            )
        ).alias("_t"),
    )
    fold = lambda expr: F.aggregate(F.col("_t"), F.lit(0.0), expr)
    agg = agg.withColumn("_W", fold(lambda a, x: a + x["w"]))
    agg = agg.withColumn(
        "_m", fold(lambda a, x: a + x["w"] * x["xb"]) / F.col("_W")
    )
    agg = agg.withColumn(
        "_num",
        fold(
            lambda a, x: a
            + x["w"] * (x["xb"] - F.col("_m")) * (x["xb"] - F.col("_m"))
        ),
    )
    agg = agg.withColumn(
        "_lam3",
        fold(
            lambda a, x: a
            + (F.lit(1.0) - x["w"] / F.col("_W"))
            * (F.lit(1.0) - x["w"] / F.col("_W"))
            / (x["n"] - F.lit(1.0))
        ),
    )
    k = F.col("k")
    kd = k.cast("double")
    lam = F.lit(3.0) * F.col("_lam3") / (kd * kd - F.lit(1.0))
    fw = (F.col("_num") / (kd - F.lit(1.0))) / (
        F.lit(1.0) + F.lit(2.0) * lam * (kd - F.lit(2.0)) / F.lit(3.0)
    )
    ok = k > 1
    return agg.select(
        k.cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("n_excluded").cast("long").alias("n_excluded"),
        F.round(F.when(ok, fw), round_to).alias("f_welch"),
        F.round(F.when(ok & (lam > 0), F.lit(1.0) / lam), round_to).alias("df2"),
    )


def welch_anova_oracle_sql(
    values_sql: str,
    value_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT moments, same group-ordered fold
    passes over one list, same pinned Welch tail."""
    core = """
  SELECT {g} AS _g, CAST(COUNT(*) AS BIGINT) AS _n,
         SUM(CAST({v} AS HUGEINT)) AS _s,
         SUM(CAST({v} AS HUGEINT) * CAST({v} AS HUGEINT)) AS _q
  FROM vals GROUP BY 1
""".format(g=group_col, v=f"CAST({value_col} AS BIGINT)")
    varnum = "CAST(CAST(_n AS HUGEINT) * _q - _s * _s AS DOUBLE)"
    var = (
        "CAST(CAST(_n AS HUGEINT) * _q - _s * _s AS DOUBLE)"
        " / (CAST(_n AS DOUBLE) * (CAST(_n AS DOUBLE) - 1.0))"
    )
    return f"""
WITH vals AS ({values_sql}),
grp AS ({core}),
flt AS MATERIALIZED (
  SELECT _g, CAST(_n AS DOUBLE) AS n,
         CAST(_n AS DOUBLE) / ({var}) AS w,
         CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE) AS xb
  FROM grp WHERE _n > 1 AND ({varnum}) > 0
),
meta AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM flt) AS k,
         (SELECT CAST(COALESCE(SUM(_n), 0) AS BIGINT) FROM grp
          WHERE _n > 1 AND ({varnum}) > 0) AS n,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM grp
          WHERE NOT (_n > 1 AND ({varnum}) > 0)) AS n_excluded
),
arr AS (
  SELECT list(struct_pack(g := _g, n := n, w := w, xb := xb) ORDER BY _g) AS t
  FROM flt
),
f1 AS (
  SELECT t, list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(t, x -> x.w)), (a, b) -> a + b) AS W
  FROM arr
),
f2 AS (
  SELECT t, W,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(t, x -> x.w * x.xb)), (a, b) -> a + b) / W AS m
  FROM f1
),
f3 AS (
  SELECT W, m,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(t, x -> x.w * (x.xb - m) * (x.xb - m))),
           (a, b) -> a + b) AS num,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(t, x -> (1.0 - x.w / W) * (1.0 - x.w / W)
                                  / (x.n - 1.0))),
           (a, b) -> a + b) AS lam3
  FROM f2
)
SELECT meta.k, meta.n, meta.n_excluded,
       ROUND(CASE WHEN meta.k > 1 THEN
         (num / (CAST(meta.k AS DOUBLE) - 1.0))
         / (1.0 + 2.0 * (3.0 * lam3 / (CAST(meta.k AS DOUBLE) * CAST(meta.k AS DOUBLE) - 1.0))
                  * (CAST(meta.k AS DOUBLE) - 2.0) / 3.0)
         END, {round_to}) AS f_welch,
       ROUND(CASE WHEN meta.k > 1 AND
         3.0 * lam3 / (CAST(meta.k AS DOUBLE) * CAST(meta.k AS DOUBLE) - 1.0) > 0
         THEN 1.0 / (3.0 * lam3 / (CAST(meta.k AS DOUBLE) * CAST(meta.k AS DOUBLE) - 1.0))
         END, {round_to}) AS df2
FROM f3, meta
"""

def grubbs_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Grubbs' maximum-normed-residual test per group — "is the single
    most extreme value an outlier", the formal companion to the robust
    screens (`hbos_outliers` scores everything; Grubbs tests the worst
    one):

        G = max_i |x_i − x̄| / s.

    Exactness: the argmax runs on the exact INTEGER n-scaled deviation
    |n·x_i − S| (ties → smallest id), so the chosen row is
    deterministic; G = dev_max/n ÷ s with s from the exact moments is
    the pinned float tail. One aggregation + one group-partitioned
    top-1 window. Output per group: ``(group, outlier_id, value,
    g_stat)`` — NULL g_stat when n < 3 or zero variance (those groups
    still report their extreme row).
    """
    from pyspark.sql import Window

    _require_sum_sq_width(df, value_col, "grubbs_test")
    dec = lambda c: c.cast("decimal(38,0)")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        integral_long(df, value_col, "grubbs_test").alias("_x"),
    )
    stats = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_x"))).alias("_s"),
        F.sum(dec(F.col("_x")) * dec(F.col("_x"))).alias("_q"),
    )
    j = base.join(stats, "_g").withColumn(
        "_dev", F.abs(dec(F.col("_n")) * dec(F.col("_x")) - F.col("_s"))
    )
    w = Window.partitionBy("_g").orderBy(
        F.col("_dev").desc(), F.col("_id").asc()
    )
    top = j.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    nd = F.col("_n").cast("double")
    var = (dec(F.col("_n")) * F.col("_q") - F.col("_s") * F.col("_s")).cast(
        "double"
    ) / (nd * (nd - F.lit(1.0)))
    g = (F.col("_dev").cast("double") / nd) / F.sqrt(var)
    ok = (F.col("_n") > 2) & (var > 0)
    return top.select(
        F.col("_g").alias(group_col),
        F.col("_id").alias("outlier_id"),
        F.col("_x").alias(value_col),
        F.round(F.when(ok, g), round_to).alias("g_stat"),
    )


def grubbs_test_oracle_sql(
    values_sql: str,
    value_col: str,
    group_col: str,
    id_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same integer n-scaled deviation argmax, same pinned
    G tail."""
    return f"""
WITH vals AS (
  SELECT {group_col} AS _g, {id_col} AS _id,
         CAST({value_col} AS BIGINT) AS _x
  FROM ({values_sql})
),
stats AS (
  SELECT _g, CAST(COUNT(*) AS BIGINT) AS _n,
         SUM(CAST(_x AS HUGEINT)) AS _s,
         SUM(CAST(_x AS HUGEINT) * CAST(_x AS HUGEINT)) AS _q
  FROM vals GROUP BY _g
),
j AS (
  SELECT v._g, v._id, v._x, s._n, s._s, s._q,
         ABS(CAST(s._n AS HUGEINT) * v._x - s._s) AS _dev
  FROM vals v JOIN stats s ON v._g = s._g
),
top AS (
  SELECT * FROM j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY _g ORDER BY _dev DESC, _id ASC) = 1
)
SELECT _g AS {group_col}, _id AS outlier_id, _x AS {value_col},
       ROUND(CASE WHEN _n > 2 AND
         CAST(CAST(_n AS HUGEINT) * _q - _s * _s AS DOUBLE)
         / (CAST(_n AS DOUBLE) * (CAST(_n AS DOUBLE) - 1.0)) > 0
         THEN (CAST(_dev AS DOUBLE) / CAST(_n AS DOUBLE))
              / SQRT(CAST(CAST(_n AS HUGEINT) * _q - _s * _s AS DOUBLE)
                     / (CAST(_n AS DOUBLE) * (CAST(_n AS DOUBLE) - 1.0)))
         END, {round_to}) AS g_stat
FROM top
"""


def moods_median(
    df: DataFrame,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
    max_groups: int | None = 10_000,
) -> DataFrame:
    """Mood's median test — do the k groups share a common median?
    The maximally-robust k-sample location test (uses only
    above/below-the-grand-median counts, so it shrugs off outliers
    that bend :func:`anova_oneway` and even :func:`kruskal_wallis`):
    a 2×k chi-square on the dichotomized counts.

    Exactness: the DOUBLED grand median comes from the bounded value
    spine's cumulative histogram (exactly :func:`mann_whitney`'s spine
    contract — the one unpartitioned cumsum is over the caller-bounded
    spine, guard-enforced); values equal to the median are dropped
    (the SAS convention); per-group above/below counts are exact
    integers, and the chi-square Σ(O−E)²/E terms are the pinned float
    tail folded in GROUP ORDER. Output one row: ``(k, n, chi2)`` —
    NULL when either margin is empty.
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "moods_median")
    require_bounded_spine(df, group_col, [], max_groups, "moods_median")
    base = df.select(
        F.col(group_col).alias("_g"),
        integral_long(df, bucket_col, "moods_median").alias("_x"),
    )
    hist = base.groupBy("_x").agg(F.count(F.lit(1)).alias("_c"))
    wcum = Window.orderBy("_x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "_x",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_nt"),
    )
    med = cum.agg(
        (
            F.min(F.when(F.col("_cum") >= F.expr("(_nt + 1) div 2"), F.col("_x")))
            + F.min(F.when(F.col("_cum") >= F.expr("_nt div 2 + 1"), F.col("_x")))
        ).alias("_m2")
    )
    marked = base.crossJoin(med).where(F.lit(2) * F.col("_x") != F.col("_m2"))
    per = marked.groupBy("_g").agg(
        F.sum(F.when(F.lit(2) * F.col("_x") > F.col("_m2"), 1).otherwise(0)).alias(
            "_a"
        ),
        F.sum(F.when(F.lit(2) * F.col("_x") < F.col("_m2"), 1).otherwise(0)).alias(
            "_b"
        ),
    )
    tot = per.agg(
        F.sum("_a").alias("_ta"), F.sum("_b").alias("_tb")
    )
    j = per.crossJoin(tot)
    ngd = (F.col("_a") + F.col("_b")).cast("double")
    nd = (F.col("_ta") + F.col("_tb")).cast("double")
    ea = ngd * F.col("_ta").cast("double") / nd
    eb = ngd * F.col("_tb").cast("double") / nd
    term = (F.col("_a").cast("double") - ea) * (
        F.col("_a").cast("double") - ea
    ) / ea + (F.col("_b").cast("double") - eb) * (
        F.col("_b").cast("double") - eb
    ) / eb
    agg = j.groupBy("_ta", "_tb").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("_a") + F.col("_b")).alias("n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("_g").alias("g"), term.alias("t")))
        ).alias("_terms"),
    ).withColumn(
        "_chi2",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["t"]),
    )
    ok = (F.col("_ta") > 0) & (F.col("_tb") > 0) & (F.col("k") > 1)
    return agg.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(F.when(ok, F.col("_chi2")), round_to).alias("chi2"),
    )


def moods_median_oracle_sql(
    values_sql: str,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same doubled grand median, same integer 2×k cells,
    same group-ordered chi-square fold."""
    return f"""
WITH base AS MATERIALIZED (
  SELECT {group_col} AS _g, CAST({bucket_col} AS BIGINT) AS _x
  FROM ({values_sql})
),
cum AS (
  SELECT _x,
         SUM(_c) OVER (ORDER BY _x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         SUM(_c) OVER () AS _nt
  FROM (SELECT _x, CAST(COUNT(*) AS BIGINT) AS _c FROM base GROUP BY 1)
),
med AS (
  SELECT MIN(CASE WHEN _cum >= (_nt + 1) // 2 THEN _x END)
         + MIN(CASE WHEN _cum >= _nt // 2 + 1 THEN _x END) AS _m2
  FROM cum
),
per AS (
  SELECT _g,
         CAST(SUM(CASE WHEN 2 * _x > (SELECT _m2 FROM med) THEN 1 ELSE 0 END) AS BIGINT) AS _a,
         CAST(SUM(CASE WHEN 2 * _x < (SELECT _m2 FROM med) THEN 1 ELSE 0 END) AS BIGINT) AS _b
  FROM base WHERE 2 * _x != (SELECT _m2 FROM med)
  GROUP BY _g
),
tot AS (
  SELECT CAST(SUM(_a) AS BIGINT) AS _ta, CAST(SUM(_b) AS BIGINT) AS _tb FROM per
),
agg AS (
  SELECT t._ta, t._tb, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(p._a + p._b) AS BIGINT) AS n,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(
             (CAST(p._a AS DOUBLE)
              - CAST(p._a + p._b AS DOUBLE) * CAST(t._ta AS DOUBLE)
                / CAST(t._ta + t._tb AS DOUBLE))
             * (CAST(p._a AS DOUBLE)
                - CAST(p._a + p._b AS DOUBLE) * CAST(t._ta AS DOUBLE)
                  / CAST(t._ta + t._tb AS DOUBLE))
             / (CAST(p._a + p._b AS DOUBLE) * CAST(t._ta AS DOUBLE)
                / CAST(t._ta + t._tb AS DOUBLE))
             +
             (CAST(p._b AS DOUBLE)
              - CAST(p._a + p._b AS DOUBLE) * CAST(t._tb AS DOUBLE)
                / CAST(t._ta + t._tb AS DOUBLE))
             * (CAST(p._b AS DOUBLE)
                - CAST(p._a + p._b AS DOUBLE) * CAST(t._tb AS DOUBLE)
                  / CAST(t._ta + t._tb AS DOUBLE))
             / (CAST(p._a + p._b AS DOUBLE) * CAST(t._tb AS DOUBLE)
                / CAST(t._ta + t._tb AS DOUBLE))
             ORDER BY p._g)),
           (a, b) -> a + b) AS _chi2
  FROM per p, tot t
  GROUP BY t._ta, t._tb
)
SELECT k, n,
       ROUND(CASE WHEN _ta > 0 AND _tb > 0 AND k > 1 THEN _chi2 END,
             {round_to}) AS chi2
FROM agg
"""


def cramer_von_mises(
    df: DataFrame,
    bucket_col: str,
    slice_col,
    slice_a,
    slice_b,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
) -> DataFrame:
    """Two-sample Cramér–von Mises criterion over a caller-bounded
    bucket spine — the INTEGRATED companion to :func:`ks_test` (KS finds
    the worst single point of ECDF disagreement; CvM sums the squared
    disagreement across the whole support, so a broad mild shift that
    never spikes still registers):

        T = (n_a·n_b / N²) · Σ_k t_k · (F_a(k) − F_b(k))².

    Exactness: with D_k = cum_a(k)·n_b − cum_b(k)·n_a (the exact integer
    KS cross-product), F_a − F_b = D_k/(n_a·n_b) and

        T = Σ_k t_k·D_k² / (N² · n_a · n_b)

    — numerator an exact DECIMAL(38,0) sum, ONE pinned division. Width
    is MEASURED fail-fast (Σ t·D² ≤ N·(n_a·n_b)²). Plan: one
    (bucket, slice) partial-agg shuffle + cumsum windows over the
    bounded histogram, a single-row readout. Output:
    ``(n_a, n_b, t_cvm)`` — NULL when either sample is empty.
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "cramer_von_mises")
    s = F.col(slice_col)
    per = (
        df.where(s.isin(slice_a, slice_b))
        .groupBy(F.col(bucket_col).alias("_k"))
        .agg(
            F.sum(F.when(s == slice_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(s == slice_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    wcum = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("_k").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "_k",
        (F.col("_ca") + F.col("_cb")).alias("_t"),
        F.sum("_ca").over(wcum).alias("_cuma"),
        F.sum("_cb").over(wcum).alias("_cumb"),
        F.sum("_ca").over(wall).alias("_na"),
        F.sum("_cb").over(wall).alias("_nb"),
    )
    wrow = cum.agg(
        F.max("_na").alias("_na"), F.max("_nb").alias("_nb")
    ).first()
    na_w, nb_w = int(wrow["_na"] or 0), int(wrow["_nb"] or 0)
    if (na_w + nb_w) * (na_w * nb_w) ** 2 >= 10**38:
        raise ValueError(
            f"cramer_von_mises: N·(n_a·n_b)² = "
            f"{na_w + nb_w}·({na_w}·{nb_w})² would overflow the "
            "DECIMAL(38,0) Σ t·D² sum — subsample or stratify first"
        )
    dec = lambda c: c.cast("decimal(38,0)")
    d_k = dec(F.col("_cuma")) * dec(F.col("_nb")) - dec(F.col("_cumb")) * dec(
        F.col("_na")
    )
    agg = cum.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum(dec(F.col("_t")) * d_k * d_k).alias("_num"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    nn = dec(na + nb) * dec(na + nb) * dec(na) * dec(nb)
    ok = (na > 0) & (nb > 0)
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(
            F.when(ok, F.col("_num").cast("double") / nn.cast("double")),
            round_to,
        ).alias("t_cvm"),
    )


def cramer_von_mises_oracle_sql(
    values_sql: str,
    bucket_col: str,
    slice_col: str,
    slice_a: str,
    slice_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same integer D_k cross products, same HUGEINT
    Σ t·D² numerator, same single pinned division."""
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {bucket_col} AS _k,
         CAST(SUM(CASE WHEN {slice_col} = '{slice_a}' THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
         CAST(SUM(CASE WHEN {slice_col} = '{slice_b}' THEN 1 ELSE 0 END) AS BIGINT) AS _cb
  FROM vals WHERE {slice_col} IN ('{slice_a}', '{slice_b}')
  GROUP BY 1
),
cum AS (
  SELECT _k, _ca + _cb AS _t,
         SUM(_ca) OVER (ORDER BY _k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cuma,
         SUM(_cb) OVER (ORDER BY _k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cumb,
         SUM(_ca) OVER () AS _na,
         SUM(_cb) OVER () AS _nb
  FROM per
),
agg AS (
  SELECT MAX(_na) AS n_a, MAX(_nb) AS n_b,
         SUM(CAST(_t AS HUGEINT)
             * (CAST(_cuma AS HUGEINT) * _nb - CAST(_cumb AS HUGEINT) * _na)
             * (CAST(_cuma AS HUGEINT) * _nb - CAST(_cumb AS HUGEINT) * _na)) AS _num
  FROM cum
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST(_num AS DOUBLE)
         / CAST(CAST(n_a + n_b AS HUGEINT) * (n_a + n_b) * n_a * n_b AS DOUBLE)
       END, {round_to}) AS t_cvm
FROM agg
"""


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lo_pct: int = 5,
    hi_pct: int = 95,
    round_to: int = 6,
) -> DataFrame:
    """Per-group winsorized and trimmed means over an integer metric —
    the robust-location readout that belongs next to `robust_stats`
    (median/MAD say where the middle is; winsorizing says what the mean
    WOULD be if the tails were clamped, the standard way to report
    revenue-per-user without one whale dominating):

        p_lo = percentile_disc(lo), p_hi = percentile_disc(hi),
        winsorized = mean(clamp(x, p_lo, p_hi)),
        trimmed    = mean(x : p_lo ≤ x ≤ p_hi).

    Exactness: percentile_disc picks actual DATA values (the smallest
    value whose cumulative count reaches ⌈q·n⌉ — integers, no
    interpolation); the clamped/trimmed sums are exact DECIMAL(38,0);
    each mean is ONE pinned division. Plan: one group-partitioned rank
    window (distributed per-group sort — no bounded-spine requirement),
    a broadcast-size percentile row per group joined back, one
    conditional aggregation. Output per group: ``(*by, n, p_lo, p_hi,
    winsorized_mean, trimmed_mean)``.
    """
    from pyspark.sql import Window

    from .guards import integral_long

    keys = list(by or [])
    dec = lambda c: c.cast("decimal(38,0)")
    base = df.select(
        *keys, integral_long(df, value_col, "winsorized_stats").alias("_v")
    )
    w = Window.partitionBy(*keys).orderBy("_v")
    ranked = base.select(
        *keys,
        "_v",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("_n"),
    )
    # percentile_disc: the value at rank ⌈q·n⌉ (ties resolved by the
    # rank itself — duplicates of the threshold value are all ≥ it)
    lo_rank = F.ceil(F.col("_n") * F.lit(lo_pct) / F.lit(100.0)).cast("long")
    hi_rank = F.ceil(F.col("_n") * F.lit(hi_pct) / F.lit(100.0)).cast("long")
    pcts = (
        ranked.where(
            (F.col("_r") == F.greatest(lo_rank, F.lit(1)))
            | (F.col("_r") == F.greatest(hi_rank, F.lit(1)))
        )
        .groupBy(*keys)
        .agg(
            F.min(
                F.when(F.col("_r") == F.greatest(lo_rank, F.lit(1)), F.col("_v"))
            ).alias("_plo"),
            F.min(
                F.when(F.col("_r") == F.greatest(hi_rank, F.lit(1)), F.col("_v"))
            ).alias("_phi"),
        )
    )
    j = base.join(F.broadcast(pcts), keys) if keys else base.crossJoin(pcts)
    clamped = F.greatest(F.least(F.col("_v"), F.col("_phi")), F.col("_plo"))
    inside = (F.col("_v") >= F.col("_plo")) & (F.col("_v") <= F.col("_phi"))
    out = j.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_plo").alias("p_lo"),
        F.min("_phi").alias("p_hi"),
        F.sum(dec(clamped)).alias("_ws"),
        F.sum(F.when(inside, dec(F.col("_v"))).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_ts"),
        F.sum(F.when(inside, 1).otherwise(0)).alias("_tn"),
    )
    res = out.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("p_lo").cast("long").alias("p_lo"),
        F.col("p_hi").cast("long").alias("p_hi"),
        F.round(
            F.col("_ws").cast("double") / F.col("n").cast("double"), round_to
        ).alias("winsorized_mean"),
        F.round(
            F.when(
                F.col("_tn") > 0,
                F.col("_ts").cast("double") / F.col("_tn").cast("double"),
            ),
            round_to,
        ).alias("trimmed_mean"),
    )
    return res.orderBy(*keys) if keys else res


def winsorized_stats_oracle_sql(
    values_sql: str,
    value_col: str,
    by: list[str] | None = None,
    lo_pct: int = 5,
    hi_pct: int = 95,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same rank-⌈q·n⌉ discrete percentiles, same HUGEINT
    clamped/trimmed sums, same pinned divisions."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = (gc + ", ") if keys else ""
    part = f"PARTITION BY {gc}" if keys else ""
    joincond = " AND ".join(f"b.{k} = p.{k}" for k in keys) if keys else "TRUE"
    psel = (", ".join(f"b.{k}" for k in keys) + ", ") if keys else ""
    order = f"ORDER BY {gc}" if keys else ""
    group = f"GROUP BY {gc}" if keys else ""
    return f"""
WITH vals AS (SELECT {sel}CAST({value_col} AS BIGINT) AS _v FROM ({values_sql})),
ranked AS (
  SELECT {sel}_v,
         row_number() OVER ({part} ORDER BY _v) AS _r,
         COUNT(*) OVER ({part}) AS _n
  FROM vals
),
pcts AS (
  SELECT {sel}
         MIN(CASE WHEN _r = GREATEST(CAST(ceil(_n * {lo_pct} / 100.0) AS BIGINT), 1)
             THEN _v END) AS _plo,
         MIN(CASE WHEN _r = GREATEST(CAST(ceil(_n * {hi_pct} / 100.0) AS BIGINT), 1)
             THEN _v END) AS _phi
  FROM ranked
  WHERE _r = GREATEST(CAST(ceil(_n * {lo_pct} / 100.0) AS BIGINT), 1)
     OR _r = GREATEST(CAST(ceil(_n * {hi_pct} / 100.0) AS BIGINT), 1)
  {group}
)
SELECT {psel}
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(p._plo) AS BIGINT) AS p_lo,
       CAST(MIN(p._phi) AS BIGINT) AS p_hi,
       ROUND(CAST(SUM(CAST(GREATEST(LEAST(b._v, p._phi), p._plo) AS HUGEINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), {round_to}) AS winsorized_mean,
       ROUND(CASE WHEN SUM(CASE WHEN b._v BETWEEN p._plo AND p._phi THEN 1 ELSE 0 END) > 0
         THEN CAST(SUM(CASE WHEN b._v BETWEEN p._plo AND p._phi
                       THEN CAST(b._v AS HUGEINT) ELSE 0 END) AS DOUBLE)
              / CAST(SUM(CASE WHEN b._v BETWEEN p._plo AND p._phi THEN 1 ELSE 0 END) AS DOUBLE)
         END, {round_to}) AS trimmed_mean
FROM vals b JOIN pcts p ON {joincond}
{("GROUP BY " + ", ".join("b." + k for k in keys)) if keys else ""}
{("ORDER BY " + ", ".join("b." + k for k in keys)) if keys else ""}
"""


def correlation_matrix(
    df: DataFrame,
    value_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations over k integer metrics in ONE
    aggregation pass — the multi-column extension of `grouped_linreg`'s
    moment algebra (k(k−1)/2 correlations from one scan instead of one
    job per pair; the screen a feature pipeline runs before shipping a
    redundant column set):

        r_ij = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)).

    Exactness: all moments (Σx_i, Σx_i², Σx_i·x_j) are exact
    DECIMAL(38,0) sums; each r is the pinned rational-over-sqrt tail.
    Output one row per unordered pair (i < j by position):
    ``(col_a, col_b, n, r)`` — r NULL when either variance is 0. Plan:
    one scan, one reduce (k(k+3)/2 accumulators), a literal-exploded
    readout; no joins, no windows.
    """
    from .guards import integral_long

    k = len(value_cols)
    if k < 2:
        raise ValueError("correlation_matrix: need at least two columns")
    dec = lambda c: c.cast("decimal(38,0)")
    vs = [
        dec(integral_long(df, c, "correlation_matrix")).alias(f"_v{i}")
        for i, c in enumerate(value_cols)
    ]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i in range(k):
        aggs.append(F.sum(F.col(f"_v{i}")).alias(f"_s{i}"))
        aggs.append(F.sum(F.col(f"_v{i}") * F.col(f"_v{i}")).alias(f"_q{i}"))
    for i in range(k):
        for j in range(i + 1, k):
            aggs.append(
                F.sum(F.col(f"_v{i}") * F.col(f"_v{j}")).alias(f"_p{i}_{j}")
            )
    mom = df.select(*vs).agg(*aggs)
    n = F.col("_n")
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            num = dec(n) * F.col(f"_p{i}_{j}") - F.col(f"_s{i}") * F.col(f"_s{j}")
            vi = dec(n) * F.col(f"_q{i}") - F.col(f"_s{i}") * F.col(f"_s{i}")
            vj = dec(n) * F.col(f"_q{j}") - F.col(f"_s{j}") * F.col(f"_s{j}")
            r = num.cast("double") / F.sqrt(vi.cast("double") * vj.cast("double"))
            pairs.append(
                F.struct(
                    F.lit(value_cols[i]).alias("col_a"),
                    F.lit(value_cols[j]).alias("col_b"),
                    n.cast("long").alias("n"),
                    F.round(
                        F.when((vi > 0) & (vj > 0), r), round_to
                    ).alias("r"),
                )
            )
    return mom.select(F.explode(F.array(*pairs)).alias("_e")).select(
        "_e.col_a", "_e.col_b", "_e.n", "_e.r"
    )


def correlation_matrix_oracle_sql(
    values_sql: str,
    value_cols: list[str],
    round_to: int = 6,
) -> str:
    """DuckDB twin: same one-pass HUGEINT moments, same pinned
    rational-over-sqrt tails, rows unioned in the same (i, j) order."""
    k = len(value_cols)
    moms = ["CAST(COUNT(*) AS HUGEINT) AS _n"]
    for i, c in enumerate(value_cols):
        moms.append(f"SUM(CAST(CAST({c} AS BIGINT) AS HUGEINT)) AS _s{i}")
        moms.append(
            f"SUM(CAST(CAST({c} AS BIGINT) AS HUGEINT) * CAST({c} AS BIGINT)) AS _q{i}"
        )
    for i in range(k):
        for j in range(i + 1, k):
            moms.append(
                f"SUM(CAST(CAST({value_cols[i]} AS BIGINT) AS HUGEINT)"
                f" * CAST({value_cols[j]} AS BIGINT)) AS _p{i}_{j}"
            )
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            vi = f"(_n * _q{i} - _s{i} * _s{i})"
            vj = f"(_n * _q{j} - _s{j} * _s{j})"
            num = f"(_n * _p{i}_{j} - _s{i} * _s{j})"
            rows.append(
                f"SELECT '{value_cols[i]}' AS col_a, '{value_cols[j]}' AS col_b, "
                f"CAST(_n AS BIGINT) AS n, "
                f"ROUND(CASE WHEN {vi} > 0 AND {vj} > 0 THEN "
                f"CAST({num} AS DOUBLE) / SQRT(CAST({vi} AS DOUBLE) * CAST({vj} AS DOUBLE)) "
                f"END, {round_to}) AS r FROM mom"
            )
    return f"""
WITH vals AS ({values_sql}),
mom AS (SELECT {", ".join(moms)} FROM vals)
{" UNION ALL ".join(rows)}
"""


def tukey_hsd(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
    max_groups: int | None = 1_000,
) -> DataFrame:
    """Tukey HSD pairwise contrasts — the post-hoc step after
    :func:`anova_oneway` rejects (the F says SOME group differs; HSD
    says WHICH pairs, with the studentized-range q statistic whose
    critical values correct for all k(k−1)/2 comparisons at once):

        q_ij = (x̄_i − x̄_j) / sqrt( s²_w/2 · (1/n_i + 1/n_j) ),
        s²_w = SSW / (N − k)    (the ANOVA within-group variance).

    Exactness: group moments are exact DECIMAL(38,0) (width MEASURED,
    the anova_oneway guard); SSW's Σ S_g²/n_g runs as the same
    group-ordered float fold; each pair's mean difference is the exact
    integer (S_i·n_j − S_j·n_i) over ONE pinned division; the q tail is
    pinned. Output per pair (i < j by group order): ``(group_a,
    group_b, n_a, n_b, mean_diff, q_stat)`` — q NULL when s²_w ≤ 0 or
    N ≤ k. Plan: one group agg (bounded by ``max_groups``), a one-row
    within-variance readout broadcast onto the tiny group-pair
    self-join.
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, group_col, [], max_groups, "tukey_hsd")
    _require_sum_sq_width(df, value_col, "tukey_hsd")
    dec = lambda c: c.cast("decimal(38,0)")
    v = integral_long(df, value_col, "tukey_hsd")
    grp = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(v)).alias("_s"),
        F.sum(dec(v) * dec(v)).alias("_q"),
    )
    within = grp.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum("_q").alias("_qt"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").alias("g"),
                    (
                        F.col("_s").cast("double")
                        * F.col("_s").cast("double")
                        / F.col("_n").cast("double")
                    ).alias("term"),
                )
            )
        ).alias("_terms"),
    ).withColumn(
        "_rs",
        F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["term"]),
    )
    ssw = F.col("_qt").cast("double") - F.col("_rs")
    nt, kk = F.col("_nt"), F.col("_k")
    sw2 = ssw / (nt - kk).cast("double")
    wrow = within.select(
        sw2.alias("_sw2"), ((nt > kk) & (ssw > 0)).alias("_ok")
    )
    a = grp.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("_na"),
        F.col("_s").alias("_sa"),
    )
    b = grp.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("_nb"),
        F.col("_s").alias("_sb"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b")).crossJoin(
        F.broadcast(wrow)
    )
    nad, nbd = F.col("_na").cast("double"), F.col("_nb").cast("double")
    diff = (
        (dec(F.col("_sa")) * dec(F.col("_nb")) - dec(F.col("_sb")) * dec(F.col("_na")))
        .cast("double")
        / (dec(F.col("_na")) * dec(F.col("_nb"))).cast("double")
    )
    q = diff / F.sqrt(
        F.col("_sw2") / F.lit(2.0) * (F.lit(1.0) / nad + F.lit(1.0) / nbd)
    )
    return pairs.select(
        "group_a",
        "group_b",
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.round(diff, round_to).alias("mean_diff"),
        F.round(F.when(F.col("_ok"), q), round_to).alias("q_stat"),
    ).orderBy("group_a", "group_b")


def tukey_hsd_oracle_sql(
    values_sql: str,
    value_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT moments, same group-ordered SSW fold,
    same exact pair numerators and pinned q tail."""
    return f"""
WITH vals AS (SELECT {group_col} AS _g, CAST({value_col} AS BIGINT) AS _v
              FROM ({values_sql})),
grp AS MATERIALIZED (
  SELECT _g, CAST(COUNT(*) AS BIGINT) AS _n,
         SUM(CAST(_v AS HUGEINT)) AS _s,
         SUM(CAST(_v AS HUGEINT) * CAST(_v AS HUGEINT)) AS _q
  FROM vals GROUP BY _g
),
win AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS _k, CAST(SUM(_n) AS BIGINT) AS _nt,
         CAST(SUM(_q) AS DOUBLE)
         - list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE)
                  ORDER BY _g)), (x, y) -> x + y) AS _ssw
  FROM grp
)
SELECT a._g AS group_a, b._g AS group_b,
       a._n AS n_a, b._n AS n_b,
       ROUND(CAST(a._s * b._n - b._s * a._n AS DOUBLE)
             / CAST(CAST(a._n AS HUGEINT) * b._n AS DOUBLE), {round_to}) AS mean_diff,
       ROUND(CASE WHEN w._nt > w._k AND w._ssw > 0 THEN
         (CAST(a._s * b._n - b._s * a._n AS DOUBLE)
          / CAST(CAST(a._n AS HUGEINT) * b._n AS DOUBLE))
         / SQRT((w._ssw / CAST(w._nt - w._k AS DOUBLE)) / 2.0
                * (1.0 / CAST(a._n AS DOUBLE) + 1.0 / CAST(b._n AS DOUBLE)))
         END, {round_to}) AS q_stat
FROM grp a JOIN grp b ON a._g < b._g CROSS JOIN win w
ORDER BY group_a, group_b
"""


def iv_wald(
    df: DataFrame,
    outcome_col: str,
    exposure_col: str,
    instrument_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Instrumental-variable Wald estimator per segment — the causal
    readout when treatment is CONFOUNDED but an instrument exists
    (encouragement assigned, offer shown): the effect of exposure on
    outcome identified through the instrument,

        β_IV = (ȳ₁ − ȳ₀) / (x̄₁ − x̄₀)

    (intent-to-treat effect over first-stage compliance — the
    two-stage-least-squares estimate with one binary instrument). The
    companion to `did_estimate`/`cuped`: DiD needs parallel trends,
    CUPED a pre-period; IV needs only the exclusion restriction.

    Exactness: the six conditional sums (n, Σy, Σx per instrument arm)
    are exact DECIMAL(38,0) from ONE aggregation; each difference of
    means is the exact integer cross product over one pinned division;
    β is one more. Output per segment: ``(*by, n1, n0, itt, first_stage,
    beta_iv)`` — NULL β when the first stage is 0 (weak-instrument
    degenerate) or either arm is empty.
    """
    from .guards import integral_long

    keys = list(by or [])
    dec = lambda c: c.cast("decimal(38,0)")
    z = F.col(instrument_col).cast("int")
    y = dec(integral_long(df, outcome_col, "iv_wald"))
    x = dec(integral_long(df, exposure_col, "iv_wald"))
    zero = F.lit(0).cast("decimal(38,0)")
    per = df.groupBy(*keys).agg(
        F.sum(F.when(z == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(z == 1, y).otherwise(zero)).alias("_y1"),
        F.sum(F.when(z == 1, x).otherwise(zero)).alias("_x1"),
        F.sum(F.when(z == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(z == 0, y).otherwise(zero)).alias("_y0"),
        F.sum(F.when(z == 0, x).otherwise(zero)).alias("_x0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    itt_num = dec(n0) * F.col("_y1") - dec(n1) * F.col("_y0")
    fs_num = dec(n0) * F.col("_x1") - dec(n1) * F.col("_x0")
    den = (dec(n1) * dec(n0)).cast("double")
    itt = itt_num.cast("double") / den
    fs = fs_num.cast("double") / den
    both = (n1 > 0) & (n0 > 0)
    return per.select(
        *keys,
        n1.cast("long").alias("n1"),
        n0.cast("long").alias("n0"),
        F.round(F.when(both, itt), round_to).alias("itt"),
        F.round(F.when(both, fs), round_to).alias("first_stage"),
        F.round(
            F.when(both & (fs_num != 0), itt / fs), round_to
        ).alias("beta_iv"),
    ).orderBy(*keys) if keys else per.select(
        n1.cast("long").alias("n1"),
        n0.cast("long").alias("n0"),
        F.round(F.when(both, itt), round_to).alias("itt"),
        F.round(F.when(both, fs), round_to).alias("first_stage"),
        F.round(
            F.when(both & (fs_num != 0), itt / fs), round_to
        ).alias("beta_iv"),
    )


def iv_wald_oracle_sql(
    units_sql: str,
    outcome_col: str,
    exposure_col: str,
    instrument_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same six HUGEINT conditional sums, same exact cross
    products and pinned divisions."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = (gc + ", ") if keys else ""
    group = f"GROUP BY {gc}" if keys else ""
    order = f"ORDER BY {gc}" if keys else ""
    z = f"CAST({instrument_col} AS INTEGER)"
    y = f"CAST(CAST({outcome_col} AS BIGINT) AS HUGEINT)"
    x = f"CAST(CAST({exposure_col} AS BIGINT) AS HUGEINT)"
    return f"""
WITH units AS ({units_sql}),
per AS (
  SELECT {sel}
         CAST(SUM(CASE WHEN {z} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         SUM(CASE WHEN {z} = 1 THEN {y} ELSE 0 END) AS _y1,
         SUM(CASE WHEN {z} = 1 THEN {x} ELSE 0 END) AS _x1,
         CAST(SUM(CASE WHEN {z} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         SUM(CASE WHEN {z} = 0 THEN {y} ELSE 0 END) AS _y0,
         SUM(CASE WHEN {z} = 0 THEN {x} ELSE 0 END) AS _x0
  FROM units {group}
)
SELECT {sel}n1, n0,
       ROUND(CASE WHEN n1 > 0 AND n0 > 0 THEN
         CAST(CAST(n0 AS HUGEINT) * _y1 - CAST(n1 AS HUGEINT) * _y0 AS DOUBLE)
         / CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE) END, {round_to}) AS itt,
       ROUND(CASE WHEN n1 > 0 AND n0 > 0 THEN
         CAST(CAST(n0 AS HUGEINT) * _x1 - CAST(n1 AS HUGEINT) * _x0 AS DOUBLE)
         / CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE) END, {round_to}) AS first_stage,
       ROUND(CASE WHEN n1 > 0 AND n0 > 0
                   AND (CAST(n0 AS HUGEINT) * _x1 - CAST(n1 AS HUGEINT) * _x0) <> 0
         THEN (CAST(CAST(n0 AS HUGEINT) * _y1 - CAST(n1 AS HUGEINT) * _y0 AS DOUBLE)
               / CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE))
              / (CAST(CAST(n0 AS HUGEINT) * _x1 - CAST(n1 AS HUGEINT) * _x0 AS DOUBLE)
                 / CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE))
         END, {round_to}) AS beta_iv
FROM per {order}
"""


def srm_check(
    df: DataFrame,
    arm_col: str,
    round_to: int = 6,
    max_arms: int | None = 1_000,
) -> DataFrame:
    """Sample-ratio-mismatch check for an equal-allocation experiment —
    the integrity gate that runs BEFORE any effect readout (`ab_test`,
    `effect_sizes`, `cuped` are all invalid if assignment itself is
    broken): a chi-square of the observed arm counts against the equal
    split,

        χ² = Σ_a (o_a − n/k)² / (n/k)  =  (k·Σo² − n²) / n

    — which the right-hand algebra makes EXACT: k·Σo² − n² is an exact
    DECIMAL integer, χ² is ONE pinned division. Output one row:
    ``(k, n, chi2)`` plus the max/min arm counts (the "which arm leaks"
    readout); NULL χ² when n = 0 or k < 2. One map-side-combined
    aggregation; the arm catalog is bounded (``max_arms``).
    """
    from .guards import require_bounded_spine

    require_bounded_spine(df, arm_col, [], max_arms, "srm_check")
    dec = lambda c: c.cast("decimal(38,0)")
    arms = df.groupBy(F.col(arm_col).alias("_a")).agg(
        F.count(F.lit(1)).alias("_o")
    )
    agg = arms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_o").alias("n"),
        F.sum(dec(F.col("_o")) * dec(F.col("_o"))).alias("_osq"),
        F.max("_o").alias("max_arm"),
        F.min("_o").alias("min_arm"),
    )
    k, n = F.col("k"), F.col("n")
    chi2 = (dec(k) * F.col("_osq") - dec(n) * dec(n)).cast("double") / n.cast(
        "double"
    )
    ok = (n > 0) & (k > 1)
    return agg.select(
        k.cast("long").alias("k"),
        n.cast("long").alias("n"),
        F.col("max_arm").cast("long").alias("max_arm"),
        F.col("min_arm").cast("long").alias("min_arm"),
        F.round(F.when(ok, chi2), round_to).alias("chi2"),
    )


def srm_check_oracle_sql(
    units_sql: str,
    arm_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same exact k·Σo² − n² numerator, one division."""
    return f"""
WITH units AS ({units_sql}),
arms AS (
  SELECT {arm_col} AS _a, CAST(COUNT(*) AS BIGINT) AS _o FROM units GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(_o) AS BIGINT) AS n,
         SUM(CAST(_o AS HUGEINT) * _o) AS _osq,
         CAST(MAX(_o) AS BIGINT) AS max_arm, CAST(MIN(_o) AS BIGINT) AS min_arm
  FROM arms
)
SELECT k, n, max_arm, min_arm,
       ROUND(CASE WHEN n > 0 AND k > 1 THEN
         CAST(CAST(k AS HUGEINT) * _osq - CAST(n AS HUGEINT) * n AS DOUBLE)
         / CAST(n AS DOUBLE) END, {round_to}) AS chi2
FROM agg
"""


def dunn_test(
    df: DataFrame,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
    max_buckets: int | None = 100_000,
    max_groups: int | None = 1_000,
) -> DataFrame:
    """Dunn's pairwise rank contrasts — the post-hoc step after
    :func:`kruskal_wallis` rejects (H says SOME group's distribution is
    shifted; Dunn says WHICH pairs, on the same pooled midranks, with
    the tie-corrected null variance):

        z_ij = (R̄_i − R̄_j) / sqrt( σ² · (1/n_i + 1/n_j) ),
        σ²   = N(N+1)/12 − Σ(t³−t) / (12(N−1)).

    Exactness: the DOUBLED-midrank spine (the mann_whitney/
    kruskal_wallis machinery) keeps per-group doubled rank sums R2_g
    and the tie term Σ(t³−t) exact DECIMAL(38,0); each pair's mean-rank
    difference is the exact integer (R2_i·n_j − R2_j·n_i) over ONE
    pinned division by 2·n_i·n_j; the σ² tail is pinned. Output per
    pair (i < j by group order): ``(group_a, group_b, n_a, n_b,
    mean_rank_diff, z)`` — z NULL when σ² ≤ 0 (every value tied) or
    N < 2. Bounded contracts as in kruskal_wallis.
    """
    from pyspark.sql import Window

    from .guards import require_bounded_spine

    require_bounded_spine(df, bucket_col, [], max_buckets, "dunn_test")
    require_bounded_spine(df, group_col, [], max_groups, "dunn_test")
    per = df.groupBy(
        F.col(bucket_col).alias("_k"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    wcum = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = lambda c: c.cast("decimal(38,0)")
    spine = per.groupBy("_k").agg(F.sum("_c").alias("_t"))
    spine = spine.select(
        "_k", "_t", (F.sum("_t").over(wcum) - F.col("_t")).alias("_before")
    )
    grp = (
        per.join(spine, "_k")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(
                dec(F.col("_c"))
                * dec(F.lit(2) * F.col("_before") + F.col("_t") + F.lit(1))
            ).alias("_r2"),
        )
    )
    ties = spine.agg(
        F.sum("_t").alias("_nt"),
        F.sum(
            dec(F.col("_t")) * dec(F.col("_t")) * dec(F.col("_t"))
            - dec(F.col("_t"))
        ).alias("_ties"),
    )
    a = grp.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("_na"),
        F.col("_r2").alias("_ra"),
    )
    b = grp.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("_nb"),
        F.col("_r2").alias("_rb"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b")).crossJoin(
        F.broadcast(ties)
    )
    nt = F.col("_nt")
    ntd = nt.cast("double")
    sig2 = ntd * (ntd + F.lit(1.0)) / F.lit(12.0) - F.col("_ties").cast(
        "double"
    ) / (F.lit(12.0) * (ntd - F.lit(1.0)))
    diff = (
        (dec(F.col("_ra")) * dec(F.col("_nb")) - dec(F.col("_rb")) * dec(F.col("_na")))
        .cast("double")
        / (F.lit(2.0) * (dec(F.col("_na")) * dec(F.col("_nb"))).cast("double"))
    )
    z = diff / F.sqrt(
        sig2
        * (
            F.lit(1.0) / F.col("_na").cast("double")
            + F.lit(1.0) / F.col("_nb").cast("double")
        )
    )
    ok = (nt > 1) & (sig2 > 0)
    return pairs.select(
        "group_a",
        "group_b",
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.round(diff, round_to).alias("mean_rank_diff"),
        F.round(F.when(ok, z), round_to).alias("z"),
    ).orderBy("group_a", "group_b")


def dunn_test_oracle_sql(
    values_sql: str,
    bucket_col: str,
    group_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same doubled midranks, HUGEINT rank/tie sums, same
    exact pair numerators and pinned σ²/z tail."""
    return f"""
WITH vals AS (SELECT {bucket_col} AS _k, {group_col} AS _g FROM ({values_sql})),
per AS (
  SELECT _k, _g, CAST(COUNT(*) AS BIGINT) AS _c FROM vals GROUP BY 1, 2
),
spine AS MATERIALIZED (
  SELECT _k, CAST(SUM(_c) AS BIGINT) AS _t,
         CAST(SUM(SUM(_c)) OVER (ORDER BY _k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - SUM(_c)
              AS BIGINT) AS _before
  FROM per GROUP BY _k
),
grp AS MATERIALIZED (
  SELECT p._g, CAST(SUM(p._c) AS BIGINT) AS _n,
         SUM(CAST(p._c AS HUGEINT) * (2 * s._before + s._t + 1)) AS _r2
  FROM per p JOIN spine s USING (_k)
  GROUP BY p._g
),
ties AS (
  SELECT CAST(SUM(_t) AS BIGINT) AS _nt,
         SUM(CAST(_t AS HUGEINT) * _t * _t - _t) AS _ties
  FROM spine
)
SELECT a._g AS group_a, b._g AS group_b, a._n AS n_a, b._n AS n_b,
       ROUND(CAST(a._r2 * b._n - b._r2 * a._n AS DOUBLE)
             / (2.0 * CAST(CAST(a._n AS HUGEINT) * b._n AS DOUBLE)),
             {round_to}) AS mean_rank_diff,
       ROUND(CASE WHEN t._nt > 1 AND
         (CAST(t._nt AS DOUBLE) * (CAST(t._nt AS DOUBLE) + 1.0) / 12.0
          - CAST(t._ties AS DOUBLE) / (12.0 * (CAST(t._nt AS DOUBLE) - 1.0))) > 0
         THEN (CAST(a._r2 * b._n - b._r2 * a._n AS DOUBLE)
               / (2.0 * CAST(CAST(a._n AS HUGEINT) * b._n AS DOUBLE)))
              / SQRT((CAST(t._nt AS DOUBLE) * (CAST(t._nt AS DOUBLE) + 1.0) / 12.0
                      - CAST(t._ties AS DOUBLE) / (12.0 * (CAST(t._nt AS DOUBLE) - 1.0)))
                     * (1.0 / CAST(a._n AS DOUBLE) + 1.0 / CAST(b._n AS DOUBLE)))
         END, {round_to}) AS z
FROM grp a JOIN grp b ON a._g < b._g CROSS JOIN ties t
ORDER BY group_a, group_b
"""


def ols_two_factor(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Two-regressor OLS with intercept per segment — the multivariate
    step past :func:`grouped_linreg` (one regressor can't separate
    correlated drivers; two + Cramer's rule is the largest normal-
    equation system whose closed form stays a readable pinned tail):

        [n    Σx₁   Σx₂ ] [β₀]   [Σy  ]
        [Σx₁  Σx₁²  Σx₁x₂] [β₁] = [Σx₁y]
        [Σx₂  Σx₁x₂ Σx₂² ] [β₂]   [Σx₂y]

    solved by Cramer determinants. Exactness: all nine moments are
    exact DECIMAL(38,0) from ONE aggregation; each 3×3 determinant is
    the PINNED fixed-order float expression a(ei−fh) − b(di−fg) +
    c(dh−eg) over the exact moments cast to double (a determinant of
    38-digit integers exceeds any fixed-precision decimal — the pinned
    tail is the honest exact-prefix/float-suffix boundary, token-
    identical in the oracle); each β is one division. Output per
    segment: ``(*by, n, b0, b1, b2)`` — NULL βs when the system is
    singular (|det| = 0: collinear regressors or degenerate n).
    """
    from .guards import integral_long

    keys = list(by or [])
    dec = lambda c: c.cast("decimal(38,0)")
    y = dec(integral_long(df, y_col, "ols_two_factor"))
    x1 = dec(integral_long(df, x1_col, "ols_two_factor"))
    x2 = dec(integral_long(df, x2_col, "ols_two_factor"))
    per = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x1).alias("_s1"),
        F.sum(x2).alias("_s2"),
        F.sum(x1 * x1).alias("_s11"),
        F.sum(x1 * x2).alias("_s12"),
        F.sum(x2 * x2).alias("_s22"),
        F.sum(y).alias("_sy"),
        F.sum(x1 * y).alias("_s1y"),
        F.sum(x2 * y).alias("_s2y"),
    )
    d = lambda c: F.col(c).cast("double")
    n = F.col("_n").cast("double")

    def det3(a, b, c, dd, e, f, g, h, i):
        return (
            a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
        )

    den = det3(
        n, d("_s1"), d("_s2"),
        d("_s1"), d("_s11"), d("_s12"),
        d("_s2"), d("_s12"), d("_s22"),
    )
    num0 = det3(
        d("_sy"), d("_s1"), d("_s2"),
        d("_s1y"), d("_s11"), d("_s12"),
        d("_s2y"), d("_s12"), d("_s22"),
    )
    num1 = det3(
        n, d("_sy"), d("_s2"),
        d("_s1"), d("_s1y"), d("_s12"),
        d("_s2"), d("_s2y"), d("_s22"),
    )
    num2 = det3(
        n, d("_s1"), d("_sy"),
        d("_s1"), d("_s11"), d("_s1y"),
        d("_s2"), d("_s12"), d("_s2y"),
    )
    ok = den != 0.0
    out = per.select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        F.round(F.when(ok, num0 / den), round_to).alias("b0"),
        F.round(F.when(ok, num1 / den), round_to).alias("b1"),
        F.round(F.when(ok, num2 / den), round_to).alias("b2"),
    )
    return out.orderBy(*keys) if keys else out


def ols_two_factor_oracle_sql(
    points_sql: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same nine HUGEINT moments, the token-identical
    pinned Cramer determinants and divisions."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = (gc + ", ") if keys else ""
    group = f"GROUP BY {gc}" if keys else ""
    order = f"ORDER BY {gc}" if keys else ""
    h = lambda c: f"CAST(CAST({c} AS BIGINT) AS HUGEINT)"

    def det3(a, b, c, dd, e, f, g, i1, i2):
        return (
            f"({a} * ({e} * {i2} - {f} * {i1}) "
            f"- {b} * ({dd} * {i2} - {f} * {g}) "
            f"+ {c} * ({dd} * {i1} - {e} * {g}))"
        )

    D = lambda c: f"CAST({c} AS DOUBLE)"
    n, s1, s2 = D("_n"), D("_s1"), D("_s2")
    s11, s12, s22 = D("_s11"), D("_s12"), D("_s22")
    sy, s1y, s2y = D("_sy"), D("_s1y"), D("_s2y")
    den = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    num0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    num1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    num2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    return f"""
WITH pts AS ({points_sql}),
per AS (
  SELECT {sel}
         CAST(COUNT(*) AS BIGINT) AS _n,
         SUM({h(x1_col)}) AS _s1, SUM({h(x2_col)}) AS _s2,
         SUM({h(x1_col)} * {h(x1_col)}) AS _s11,
         SUM({h(x1_col)} * {h(x2_col)}) AS _s12,
         SUM({h(x2_col)} * {h(x2_col)}) AS _s22,
         SUM({h(y_col)}) AS _sy,
         SUM({h(x1_col)} * {h(y_col)}) AS _s1y,
         SUM({h(x2_col)} * {h(y_col)}) AS _s2y
  FROM pts {group}
)
SELECT {sel}_n AS n,
       ROUND(CASE WHEN {den} <> 0.0 THEN {num0} / {den} END, {round_to}) AS b0,
       ROUND(CASE WHEN {den} <> 0.0 THEN {num1} / {den} END, {round_to}) AS b1,
       ROUND(CASE WHEN {den} <> 0.0 THEN {num2} / {den} END, {round_to}) AS b2
FROM per {order}
"""


def sample_size_power(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    mde_pct: float = 2.0,
    z_alpha: float = 1.959963984540054,  # two-sided 5%
    z_beta: float = 0.8416212335729143,  # 80% power
    round_to: int = 6,
) -> DataFrame:
    """Per-segment A/B sample-size requirement — the planning readout
    that belongs BEFORE `ab_test`/`effect_sizes` ship (an experiment
    that can't reach power is a decision already made): the classic
    two-arm normal-approximation formula at a relative minimum
    detectable effect,

        n/arm = 2 σ² (z_α/2 + z_β)² / (MDE·x̄)²,

    with σ², x̄ from the segment's own history. The z quantiles are
    fixed PYTHON literals (the ndcg DCG-weight precedent — neither
    engine evaluates an inverse normal CDF, which libm could disagree
    on in the last bit).

    Exactness: n, Σx, Σx² are exact DECIMAL(38,0) from one
    aggregation; variance, mean, and the n-per-arm tail are pinned
    float ops token-identical in the oracle. Output per segment:
    ``(*by, n_hist, mean, variance, n_per_arm)`` — NULL when the
    segment has < 2 rows, zero variance, or zero mean (relative MDE
    undefined). ``n_per_arm`` is ceiled to a whole unit.
    """
    from .guards import integral_long

    keys = list(by or [])
    dec = lambda c: c.cast("decimal(38,0)")
    v = dec(integral_long(df, value_col, "sample_size_power"))
    per = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_q"),
    )
    nd = F.col("_n").cast("double")
    mean = F.col("_s").cast("double") / nd
    varnum = (dec(F.col("_n")) * F.col("_q") - F.col("_s") * F.col("_s")).cast(
        "double"
    )
    var = varnum / (nd * (nd - F.lit(1.0)))
    delta = F.lit(float(mde_pct) / 100.0) * mean
    zsum = F.lit(float(z_alpha) + float(z_beta))
    n_arm = F.ceil(F.lit(2.0) * var * zsum * zsum / (delta * delta))
    ok = (F.col("_n") > 1) & (varnum > 0) & (mean != 0.0)
    out = per.select(
        *keys,
        F.col("_n").cast("long").alias("n_hist"),
        F.round(mean, round_to).alias("mean"),
        F.round(F.when(F.col("_n") > 1, var), round_to).alias("variance"),
        F.when(ok, n_arm).cast("long").alias("n_per_arm"),
    )
    return out.orderBy(*keys) if keys else out


def sample_size_power_oracle_sql(
    values_sql: str,
    value_col: str,
    by: list[str] | None = None,
    mde_pct: float = 2.0,
    z_alpha: float = 1.959963984540054,
    z_beta: float = 0.8416212335729143,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT moments, same literal z sum, same
    pinned tail and ceil."""
    keys = list(by or [])
    gc = ", ".join(keys)
    sel = (gc + ", ") if keys else ""
    group = f"GROUP BY {gc}" if keys else ""
    order = f"ORDER BY {gc}" if keys else ""
    zsum = float(z_alpha) + float(z_beta)
    return f"""
WITH vals AS ({values_sql}),
per AS (
  SELECT {sel}
         CAST(COUNT(*) AS BIGINT) AS _n,
         SUM(CAST(CAST({value_col} AS BIGINT) AS HUGEINT)) AS _s,
         SUM(CAST(CAST({value_col} AS BIGINT) AS HUGEINT) * CAST({value_col} AS BIGINT)) AS _q
  FROM vals {group}
),
calc AS (
  SELECT {sel}_n,
         CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE) AS _mean,
         CAST(CAST(_n AS HUGEINT) * _q - _s * _s AS DOUBLE) AS _varnum,
         CAST(CAST(_n AS HUGEINT) * _q - _s * _s AS DOUBLE)
           / (CAST(_n AS DOUBLE) * (CAST(_n AS DOUBLE) - 1.0)) AS _var
  FROM per
)
SELECT {sel}_n AS n_hist,
       ROUND(_mean, {round_to}) AS mean,
       ROUND(CASE WHEN _n > 1 THEN _var END, {round_to}) AS variance,
       CAST(CASE WHEN _n > 1 AND _varnum > 0 AND _mean <> 0.0 THEN
         CEIL(2.0 * _var * {zsum!r} * {zsum!r}
              / (({float(mde_pct) / 100.0!r} * _mean) * ({float(mde_pct) / 100.0!r} * _mean)))
       END AS BIGINT) AS n_per_arm
FROM calc {order}
"""


def hhi_concentration(
    df: DataFrame,
    key_cols: list[str],
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index of the per-key
    row-count shares, optionally per segment — the antitrust-style
    companion to :func:`concentration_gini` (Gini measures inequality
    of the whole distribution; HHI weights the TOP — the readout that
    moves when one supplier/domain eats the corpus):

        HHI = Σ_k (c_k / n)²  =  Σ c_k² / n²

    — which makes it EXACT: Σ c_k² is an exact DECIMAL(38,0), HHI one
    pinned division (and n_eff = 1/HHI, the "effective number of
    keys", one more). Output per segment: ``(*by, n_keys, n_rows, hhi,
    n_effective)``. Plan: one (segment, key) partial-agg shuffle + one
    segment rollup; no windows, no rank."""
    keys = list(key_cols)
    segs = list(by or [])
    dec = lambda c: c.cast("decimal(38,0)")
    counts = df.groupBy(*(segs + keys)).agg(F.count(F.lit(1)).alias("_c"))
    agg = counts.groupBy(*segs).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_c").alias("n_rows"),
        F.sum(dec(F.col("_c")) * dec(F.col("_c"))).alias("_csq"),
    )
    n = F.col("n_rows")
    hhi = F.col("_csq").cast("double") / (dec(n) * dec(n)).cast("double")
    out = agg.select(
        *segs,
        F.col("n_keys").cast("long").alias("n_keys"),
        n.cast("long").alias("n_rows"),
        F.round(F.when(n > 0, hhi), round_to).alias("hhi"),
        F.round(F.when(n > 0, F.lit(1.0) / hhi), round_to).alias("n_effective"),
    )
    return out.orderBy(*segs) if segs else out


def hhi_concentration_oracle_sql(
    table_expr: str,
    key_cols: list[str],
    by: list[str] | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same HUGEINT Σc², same pinned divisions."""
    keys = list(key_cols)
    segs = list(by or [])
    gall = ", ".join(segs + keys)
    gseg = ", ".join(segs)
    sel = (gseg + ", ") if segs else ""
    group = f"GROUP BY {gseg}" if segs else ""
    order = f"ORDER BY {gseg}" if segs else ""
    return f"""
WITH _hh_c AS (SELECT {gall}, CAST(COUNT(*) AS BIGINT) AS _c
           FROM {table_expr} GROUP BY {gall}),
_hh_a AS (
  SELECT {sel}CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(_c) AS BIGINT) AS n_rows,
         SUM(CAST(_c AS HUGEINT) * _c) AS _csq
  FROM _hh_c {group}
)
SELECT {sel}n_keys, n_rows,
       ROUND(CASE WHEN n_rows > 0 THEN CAST(_csq AS DOUBLE)
             / CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE) END,
             {round_to}) AS hhi,
       ROUND(CASE WHEN n_rows > 0 THEN 1.0 / (CAST(_csq AS DOUBLE)
             / CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE)) END,
             {round_to}) AS n_effective
FROM _hh_a {order}
"""


def lorenz_curve(
    df: DataFrame,
    key_cols: list[str],
    n_bands: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Lorenz curve of the per-key row-count distribution at
    ``n_bands`` population bands — the curve behind
    :func:`concentration_gini`'s single number (the readout that says
    "the bottom 50% of domains hold 4% of the corpus" instead of
    "gini = 0.71"): keys ranked ascending by count (deterministic
    (count, key) order, `curation.distributed_rank` — no single-task
    sort), band_d = ⌈n_bands·i/n_keys⌉, cumulative count share per
    band.

    Exactness: per-band row sums are exact integers; the band
    assignment ⌈n_bands·i/n_keys⌉ is the positive-operand integer ceil
    (a + b − 1) div b — no float ceil anywhere near a boundary, and no
    negated-div identity (Spark `div` truncates while DuckDB `//`
    floors, so they disagree on negatives — measured engine trap);
    the cumulative share is a cumsum over ≤ n_bands rows
    with ONE pinned division per band. Output per band:
    ``(band, n_keys_cum, cum_share)``."""
    from .curation import distributed_rank

    keys = list(key_cols)
    dec = lambda c: c.cast("decimal(38,0)")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    order = [F.col("_c").asc()] + [F.col(k).asc() for k in keys]
    ranked = distributed_rank(counts, order, rank_col="_i").select("_c", "_i")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("_nk"), F.sum("_c").alias("_nr")
    )
    j = ranked.crossJoin(F.broadcast(tot))
    # integer ceil over POSITIVE operands: ⌈a/b⌉ = (a + b − 1) div b —
    # the negated-div identity is an engine trap (Spark `div` truncates
    # toward zero, DuckDB `//` floors; they disagree on negatives)
    band = F.expr(f"({n_bands} * _i + _nk - 1) div _nk")
    per = j.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("_bk"),
        F.sum("_c").alias("_bs"),
        F.max("_nr").alias("_nr"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        F.col("band").cast("long").alias("band"),
        F.sum("_bk").over(w).cast("long").alias("n_keys_cum"),
        F.round(
            F.sum(dec(F.col("_bs"))).over(w).cast("double")
            / F.col("_nr").cast("double"),
            round_to,
        ).alias("cum_share"),
    ).orderBy("band")


def lorenz_curve_oracle_sql(
    table_expr: str,
    key_cols: list[str],
    n_bands: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same deterministic rank, same integer band ceil,
    same bounded cumsum and pinned divisions."""
    keys = list(key_cols)
    gc = ", ".join(keys)
    tb = ", ".join(f"{k} ASC" for k in keys)
    return f"""
WITH _lz_c AS (SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS _c FROM {table_expr} GROUP BY {gc}),
_lz_r AS (SELECT _c, CAST(ROW_NUMBER() OVER (ORDER BY _c ASC, {tb}) AS BIGINT) AS _i FROM _lz_c),
_lz_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS _nk, CAST(SUM(_c) AS BIGINT) AS _nr FROM _lz_r),
per AS (
  SELECT ({n_bands} * r._i + t._nk - 1) // t._nk AS band,
         CAST(COUNT(*) AS BIGINT) AS _bk,
         SUM(CAST(r._c AS HUGEINT)) AS _bs,
         CAST(MAX(t._nr) AS BIGINT) AS _nr
  FROM _lz_r r CROSS JOIN _lz_t t
  GROUP BY 1
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(SUM(_bk) OVER (ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_keys_cum,
       ROUND(CAST(SUM(_bs) OVER (ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            / CAST(_nr AS DOUBLE), {round_to}) AS cum_share
FROM per ORDER BY band
"""
