"""CUSUM changepoint + Mann-Kendall semantics
(operators/timeseries.py): analytic fixtures (level shift, monotone
ramp, flat series) and python-model differentials. Corpus-scale value
equality is covered by the `cusum_changepoint` / `mann_kendall`
gates."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.timeseries import (
    cusum_changepoint,
    mann_kendall,
)


def _cusum_py(xs):
    n, total = len(xs), sum(xs)
    best = None
    cum = 0
    for i, x in enumerate(xs, start=1):
        cum += x
        s = float(cum) - float(i * total) / float(n)
        if best is None or abs(s) > abs(best[1]):
            best = (i, s)
    return best


def test_cusum_peaks_at_the_level_shift(spark):
    # 10 buckets at 100 then 10 at 200: |S| maximal exactly at t=10.
    xs = [100] * 10 + [200] * 10
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = cusum_changepoint(df, "t", "x", ["g"]).collect()[0]
    assert (r["n_buckets"], r["peak_t"], r["total"]) == (20, 10, 3000)
    # S_10 = 1000 - 10*3000/20 = -500
    assert r["peak_cusum"] == -500.0


def test_cusum_tie_breaks_to_earliest_bucket(spark):
    # symmetric V shape: |S| ties at several buckets; earliest wins.
    xs = [0, 0, 4, 4]  # S = -2, -4, -2, 0 → unique min at t=2
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = cusum_changepoint(df, "t", "x", ["g"]).collect()[0]
    assert r["peak_t"] == 2 and r["peak_cusum"] == -4.0
    # exact tie case: [1, 3] → S = -1 at t=1, 0 at t=2… use [2,0,2,0]:
    # S = 1, 0, 1, 0 — |S| ties at t=1 and t=3, earliest (t=1) wins.
    df2 = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate([2, 0, 2, 0], start=1)],
        ["g", "t", "x"],
    )
    r2 = cusum_changepoint(df2, "t", "x", ["g"]).collect()[0]
    assert r2["peak_t"] == 1 and r2["peak_cusum"] == 1.0


def test_cusum_python_model_differential(spark):
    import random

    rng = random.Random(11)
    xs = [rng.randint(0, 1000) for _ in range(60)]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = cusum_changepoint(df, "t", "x", ["g"]).collect()[0]
    t_star, s_star = _cusum_py(xs)
    assert r["peak_t"] == t_star
    assert abs(r["peak_cusum"] - round(s_star, 4)) < 1e-9


def test_mann_kendall_monotone_series_is_tau_one(spark):
    df = spark.createDataFrame(
        [("up", t, t * 10) for t in range(1, 9)]
        + [("dn", t, -t) for t in range(1, 9)]
        + [("flat", t, 5) for t in range(1, 9)],
        ["g", "t", "x"],
    )
    rows = {r["g"]: r for r in mann_kendall(df, "t", "x", ["g"]).collect()}
    assert rows["up"]["tau"] == 1.0 and rows["up"]["s_stat"] == 28
    assert rows["dn"]["tau"] == -1.0 and rows["dn"]["s_stat"] == -28
    assert rows["flat"]["tau"] == 0.0 and rows["flat"]["s_stat"] == 0
    assert rows["up"]["n_buckets"] == 8


def test_mann_kendall_python_model_differential(spark):
    import random

    rng = random.Random(3)
    xs = [rng.randint(0, 50) for _ in range(40)]  # small range → ties
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = mann_kendall(df, "t", "x", ["g"]).collect()[0]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert r["s_stat"] == s
    assert abs(r["tau"] - round(s / (n * (n - 1) / 2), 6)) < 1e-9


def test_mann_kendall_duplicate_bucket_rows_are_summed_first(spark):
    # two rows in the same bucket aggregate before the pair scan
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 1, 5), ("g", 2, 8)], ["g", "t", "x"]
    )
    r = mann_kendall(df, "t", "x", ["g"]).collect()[0]
    assert (r["n_buckets"], r["s_stat"], r["tau"]) == (2, -1, -1.0)


def test_ewma_matches_recursive_model(spark):
    from revtron_utils_spark.operators.timeseries import ewma

    xs = [100, 200, 50, 300, 0, 150]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    rows = ewma(df, "t", "x", ["g"], alpha=0.3).orderBy("t").collect()
    e = float(xs[0])
    for i, r in enumerate(rows):
        if i > 0:
            e = 0.3 * xs[i] + 0.7 * e
        assert r["x"] == xs[i]
        assert abs(r["ewma"] - round(e, 4)) < 1e-9


def test_ewma_constant_series_is_flat(spark):
    from revtron_utils_spark.operators.timeseries import ewma

    df = spark.createDataFrame([("g", t, 42) for t in range(1, 9)], ["g", "t", "x"])
    assert all(r["ewma"] == 42.0 for r in ewma(df, "t", "x", ["g"]).collect())


def test_theil_sen_exact_line_recovers_slope(spark):
    from revtron_utils_spark.operators.timeseries import theil_sen

    # x = 7·i + noiseless → every pairwise slope is exactly 7
    df = spark.createDataFrame(
        [("g", t, 7 * t + 100) for t in range(1, 13)], ["g", "t", "x"]
    )
    r = theil_sen(df, "t", "x", ["g"]).collect()[0]
    assert (r["n_buckets"], r["n_pairs"], r["slope"]) == (12, 66, 7.0)


def test_theil_sen_is_outlier_robust(spark):
    from revtron_utils_spark.operators.timeseries import theil_sen

    # a line with one wild outlier: the median slope stays near 7
    xs = [7 * t for t in range(1, 16)]
    xs[7] = 100000
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = theil_sen(df, "t", "x", ["g"]).collect()[0]
    assert abs(r["slope"] - 7.0) < 1.0


def test_theil_sen_python_model_differential(spark):
    import random

    from revtron_utils_spark.operators.timeseries import theil_sen

    rng = random.Random(31)
    xs = [rng.randint(0, 500) for _ in range(25)]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    slopes = sorted(
        ((xs[j] - xs[i]) / (j - i), i, j)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    import math

    lower_median = slopes[math.ceil(len(slopes) / 2) - 1][0]
    r = theil_sen(df, "t", "x", ["g"]).collect()[0]
    assert abs(r["slope"] - round(lower_median, 6)) < 1e-9


def test_seasonality_index_flat_series_is_one(spark):
    import datetime

    from revtron_utils_spark.operators.timeseries import seasonality_index

    rows = [
        ("g", datetime.date(2020, m, 15), 100) for m in range(1, 13)
    ]
    df = spark.createDataFrame(rows, ["g", "d", "x"])
    got = seasonality_index(df, "d", "x", ["g"]).collect()
    assert len(got) == 12 and all(r["index"] == 1.0 for r in got)


def test_seasonality_index_hot_month(spark):
    import datetime

    from revtron_utils_spark.operators.timeseries import seasonality_index

    # December orders are 3x the value of the others
    rows = [("g", datetime.date(2021, m, 1), 100) for m in range(1, 12)]
    rows += [("g", datetime.date(2021, 12, 1), 300)]
    df = spark.createDataFrame(rows, ["g", "d", "x"])
    got = {r["month"]: r["index"] for r in seasonality_index(df, "d", "x", ["g"]).collect()}
    # overall avg = 1400/12; december avg = 300 → index = 300*12/1400
    assert abs(got[12] - 300 * 12 / 1400) < 1e-6
    assert abs(got[1] - 100 * 12 / 1400) < 1e-6


def test_dispersion_index_poisson_like_and_bursty(spark):
    from revtron_utils_spark.operators.timeseries import dispersion_index

    # regular: exactly 5 events in each of 8 buckets → variance 0
    reg = [("reg", t) for t in range(8) for _ in range(5)]
    # bursty: all 40 events in one bucket of 8 seen buckets — emulate by
    # 33 in bucket 0 and 1 in each other bucket
    bur = [("bur", 0)] * 33 + [("bur", t) for t in range(1, 8)]
    df = spark.createDataFrame(reg + bur, ["g", "t"])
    got = {r["g"]: r for r in dispersion_index(df, "t", ["g"]).collect()}
    assert got["reg"]["dispersion"] == 0.0
    assert got["reg"]["n_buckets"] == 8 and got["reg"]["n_events"] == 40
    # bursty: counts [33,1,1,1,1,1,1,1]: mean 5, pop var = (33-5)^2+7*16 /8
    exp = ((33 - 5) ** 2 + 7 * 16) / 8 / 5
    assert abs(got["bur"]["dispersion"] - round(exp, 6)) < 1e-9


def test_dispersion_index_python_model_differential(spark):
    import random

    from revtron_utils_spark.operators.timeseries import dispersion_index

    rng = random.Random(43)
    rows = [("g", rng.randint(0, 20)) for _ in range(500)]
    df = spark.createDataFrame(rows, ["g", "t"])
    counts = {}
    for _, t in rows:
        counts[t] = counts.get(t, 0) + 1
    cs = list(counts.values())
    n, s, s2 = len(cs), sum(cs), sum(c * c for c in cs)
    exp = (n * s2 - s * s) / (n * s)
    r = dispersion_index(df, "t", ["g"]).collect()[0]
    assert (r["n_buckets"], r["n_events"]) == (n, s)
    assert abs(r["dispersion"] - round(exp, 6)) < 1e-9


def test_analytics_pipeline_consistent_with_standalone_gates(spark, sf_dir):
    """The composition gate's per-nation columns must equal the
    standalone cusum/mann_kendall/theil_sen gates run alone."""
    import __spark_entry__ as entry

    combo = {r["nation"]: r for r in entry.q_analytics_pipeline(spark, sf_dir).collect()}
    cus = {r["nation"]: r for r in entry.q_cusum_changepoint(spark, sf_dir).collect()}
    mk = {r["nation"]: r for r in entry.q_mann_kendall(spark, sf_dir).collect()}
    ts = {r["nation"]: r for r in entry.q_theil_sen(spark, sf_dir).collect()}
    assert set(combo) == set(cus) == set(mk) == set(ts)
    for n, r in combo.items():
        assert (r["n_buckets"], r["peak_t"], r["peak_cusum"]) == (
            cus[n]["n_buckets"], cus[n]["peak_t"], cus[n]["peak_cusum"]
        )
        assert (r["s_stat"], r["tau"]) == (mk[n]["s_stat"], mk[n]["tau"])
        assert r["slope"] == ts[n]["slope"]


def test_holt_matches_recursive_model(spark):
    from revtron_utils_spark.operators.timeseries import holt_linear

    xs = [100, 120, 110, 150, 160, 140, 180]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = holt_linear(df, "t", "x", ["g"], alpha=0.3, beta=0.1).collect()[0]
    l, b = float(xs[0]), float(xs[1] - xs[0])
    for x in xs[1:]:
        ln = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (ln - l) + 0.9 * b
        l = ln
    assert r["n_buckets"] == len(xs)
    assert abs(r["level"] - round(l, 4)) < 1e-9
    assert abs(r["trend"] - round(b, 4)) < 1e-9
    assert abs(r["forecast"] - round(l + b, 4)) < 1e-9


def test_holt_perfect_line_recovers_trend(spark):
    from revtron_utils_spark.operators.timeseries import holt_linear

    # exact line: level tracks it, trend equals the slope, forecast is
    # the next point — Holt is exact on linear series for any α, β
    df = spark.createDataFrame(
        [("g", t, 50 + 10 * t) for t in range(1, 15)], ["g", "t", "x"]
    )
    r = holt_linear(df, "t", "x", ["g"]).collect()[0]
    assert abs(r["trend"] - 10.0) < 1e-9
    assert abs(r["level"] - (50 + 10 * 14)) < 1e-9
    assert abs(r["forecast"] - (50 + 10 * 15)) < 1e-9


def test_holt_single_bucket_emits_null_trend(spark):
    from revtron_utils_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame([("g", 1, 42)], ["g", "t", "x"])
    r = holt_linear(df, "t", "x", ["g"]).collect()[0]
    assert r["n_buckets"] == 1 and r["trend"] is None and r["forecast"] is None


def test_holt_oracle_uses_list_accumulator(spark):
    """Pin the DuckDB 1.0 list_reduce struct-accumulator bug: the same
    Holt fold written with a struct accumulator returns WRONG values
    (second field sees corrupted state), while the list-accumulator
    form the oracle uses matches the recursive model exactly."""
    import duckdb

    con = duckdb.connect()
    struct_q = """
SELECT list_reduce(
  list_prepend({'l': CAST(10 AS DOUBLE), 'b': CAST(2 AS DOUBLE)},
               list_transform([12.0,11.0,15.0]::DOUBLE[],
                              x -> {'l': x, 'b': CAST(0.0 AS DOUBLE)})),
  (acc, cur) -> {
    'l': CAST(0.3 AS DOUBLE) * cur.l + CAST(0.7 AS DOUBLE) * (acc.l + acc.b),
    'b': CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * cur.l
                                 + CAST(0.7 AS DOUBLE) * (acc.l + acc.b)) - acc.l)
         + CAST(0.9 AS DOUBLE) * acc.b
  }) AS st
"""
    list_q = struct_q.replace(
        "{'l': CAST(10 AS DOUBLE), 'b': CAST(2 AS DOUBLE)}",
        "[CAST(10 AS DOUBLE), CAST(2 AS DOUBLE)]",
    ).replace("x -> {'l': x, 'b': CAST(0.0 AS DOUBLE)}", "x -> [x, CAST(0.0 AS DOUBLE)]")
    list_q = """
SELECT list_reduce(
  list_prepend([CAST(10 AS DOUBLE), CAST(2 AS DOUBLE)],
               list_transform([12.0,11.0,15.0]::DOUBLE[],
                              x -> [x, CAST(0.0 AS DOUBLE)])),
  (acc, cur) -> [
    CAST(0.3 AS DOUBLE) * cur[1] + CAST(0.7 AS DOUBLE) * (acc[1] + acc[2]),
    CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * cur[1]
                            + CAST(0.7 AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
    + CAST(0.9 AS DOUBLE) * acc[2]
  ]) AS st
"""
    # python model
    l, b = 10.0, 2.0
    for x in (12.0, 11.0, 15.0):
        ln = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (ln - l) + 0.9 * b
        l = ln
    lst = con.execute(list_q).fetchone()[0]
    assert abs(lst[0] - l) < 1e-12 and abs(lst[1] - b) < 1e-12
    st = con.execute(struct_q).fetchone()[0]
    if abs(st["l"] - l) < 1e-12 and abs(st["b"] - b) < 1e-12:
        # duckdb fixed the struct path: the workaround note can go
        import warnings

        warnings.warn("duckdb struct-accumulator list_reduce now correct")
