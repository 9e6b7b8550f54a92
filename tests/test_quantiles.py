"""Differential tests for the histogram-refinement exact quantile
operator: must equal Spark's built-in exact `percentile` (==
quantile_cont) bit-for-bit-ish (1e-9) on assorted distributions."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.operators.quantiles import exact_quantiles

PROBS = [0.0, 0.25, 0.5, 0.9, 1.0]


def _check(spark, rows, by, probs=PROBS):
    df = spark.createDataFrame(rows, "g string, v double")
    mine = exact_quantiles(df, "v", probs, by=by)
    names = [f"p{100 * p:g}".replace(".", "_") for p in probs]
    ref = (
        df.filter(F.col("v").isNotNull())
        .groupBy(*by)
        .agg(F.percentile("v", F.lit(probs)).alias("p"))
    )
    mine_map = {tuple(r[c] for c in by): [r[n] for n in names] for r in mine.collect()}
    ref_map = {tuple(r[c] for c in by): list(r["p"]) for r in ref.collect()}
    assert mine_map.keys() == ref_map.keys()
    for k, exp in ref_map.items():
        got = mine_map[k]
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, exp)), (k, got, exp)


def test_uniform_groups(spark):
    rng = random.Random(1)
    rows = [(g, rng.uniform(-100, 100)) for g in "abc" for _ in range(500)]
    _check(spark, rows, ["g"])


def test_duplicate_heavy_and_singleton(spark):
    rows = (
        [("dup", 7.0)] * 400
        + [("dup", 9.0)] * 100
        + [("one", 42.0)]
        + [("two", 1.0), ("two", 2.0)]
    )
    _check(spark, rows, ["g"])


def test_constant_group_and_nulls(spark):
    rows = [("const", 5.5)] * 50 + [("const", None)] * 5
    _check(spark, rows, ["g"])


def test_ungrouped(spark):
    rng = random.Random(2)
    rows = [("x", rng.gauss(0, 10)) for _ in range(1000)]
    _check(spark, rows, [], probs=[0.5, 0.999])


def test_fractional_interpolation(spark):
    # n=4, p=0.5 → h=1.5: exactly between 2nd and 3rd sorted values
    rows = [("g", v) for v in (10.0, 20.0, 40.0, 80.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles(df, "v", [0.5], by=["g"]).collect()[0]
    assert out["p50"] == pytest.approx(30.0, abs=1e-12)


def test_forced_refinement(spark):
    # narrow-range values all land in ONE level-0 log bin (the worst
    # case for data-independent binning); a tiny collect_cap with few
    # refine bins forces several equi-width refinement rounds
    rng = random.Random(3)
    rows = [("g", 1000.0 + rng.random()) for _ in range(2000)] + [
        ("h", rng.uniform(-1, 1)) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    mine = exact_quantiles(
        df, "v", PROBS, by=["g"], collect_cap=8, refine_bins=16, max_refine=20
    )
    names = [f"p{100 * p:g}".replace(".", "_") for p in PROBS]
    ref = df.groupBy("g").agg(F.percentile("v", F.lit(PROBS)).alias("p"))
    mine_map = {r["g"]: [r[n] for n in names] for r in mine.collect()}
    ref_map = {r["g"]: list(r["p"]) for r in ref.collect()}
    assert mine_map.keys() == ref_map.keys()
    for k, exp in ref_map.items():
        assert all(abs(a - b) < 1e-9 for a, b in zip(mine_map[k], exp)), k


def test_refinement_tied_heavy_bin(spark):
    # a heavy bin that is one repeated value must resolve via the
    # min==max short-circuit, never via a giant collect
    rows = [("g", 3.14)] * 5000 + [("g", 2.0), ("g", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles(df, "v", [0.5], by=["g"], collect_cap=10).collect()[0]
    assert out["p50"] == pytest.approx(3.14, abs=1e-12)


def test_nan_and_infinity_ordering(spark):
    # Spark sorts doubles -inf < finite < +inf < NaN and the built-in
    # percentile includes NaN at the top; sentinel bins must reproduce
    # that exactly (floor(NaN)->0 would count NaNs as mid-order values)
    import math as m

    rows = [("g", v) for v in (1.0, 2.0, 3.0, float("nan"))]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles(df, "v", [0.0, 0.5, 1.0], by=["g"]).collect()[0]
    ref = df.groupBy("g").agg(
        F.percentile("v", F.lit([0.0, 0.5, 1.0])).alias("p")
    ).collect()[0]["p"]
    assert out["p0"] == ref[0] == 1.0
    assert out["p50"] == ref[1] == 2.5
    assert m.isnan(out["p100"]) and m.isnan(ref[2])

    rows = [("g", v) for v in (float("-inf"), 0.0, 5.0, float("inf"))]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles(df, "v", [0.0, 0.5, 1.0], by=["g"]).collect()[0]
    ref = df.groupBy("g").agg(
        F.percentile("v", F.lit([0.0, 0.5, 1.0])).alias("p")
    ).collect()[0]["p"]
    assert out["p0"] == ref[0] == float("-inf")
    assert out["p50"] == ref[1] == 2.5
    assert out["p100"] == ref[2] == float("inf")


def test_degenerate_refinement_spans(spark):
    # sub-binning a segment whose observed span is degenerate must not
    # divide by zero (adjacent subnormal doubles: (hi-lo)/nbins
    # underflows to 0.0) nor cast NaN to long (±1e308 span: hi-lo
    # overflows to inf, inf/inf = NaN). Both fall back to a single
    # deterministic sub-bin; max_refine bounds the stalled rounds.
    import math as m

    tiny = 5e-324  # adjacent doubles around 0: span underflows
    rows = [("g", v) for v in (0.0, tiny, 2 * tiny, 3 * tiny)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles(
        df, "v", [0.5], by=["g"], collect_cap=2, max_refine=2
    ).collect()[0]
    ref = df.groupBy("g").agg(
        F.percentile("v", F.lit(0.5)).alias("p")
    ).collect()[0]["p"]
    assert out["p50"] == ref

    huge = 1.0e308  # hi - lo overflows to inf
    rows = [("g", v) for v in (-huge, -1.0, 1.0, huge)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles(
        df, "v", [0.25, 0.5], by=["g"], collect_cap=2, max_refine=2
    ).collect()[0]
    ref = df.groupBy("g").agg(
        F.percentile("v", F.lit([0.25, 0.5])).alias("p")
    ).collect()[0]["p"]
    assert out["p25"] == ref[0] and out["p50"] == ref[1]
    assert m.isfinite(out["p50"])


def test_robust_stats_outlier_resistance(spark):
    """A planted extreme outlier drags the mean but leaves the
    winsorized mean, trimmed mean, and MAD essentially unmoved."""
    from revtron_utils_spark.operators.quantiles import robust_stats

    base = [(1, v) for v in range(100, 200)]  # uniform 100..199
    poisoned = base + [(1, 10_000_000)]
    clean = robust_stats(
        spark.createDataFrame(base, "g: int, x: long"), "x", by=["g"]
    ).first()
    dirty = robust_stats(
        spark.createDataFrame(poisoned, "g: int, x: long"), "x", by=["g"]
    ).first()
    assert dirty["mean"] > 10 * clean["mean"]  # mean is wrecked
    assert abs(dirty["winsor_mean"] - clean["winsor_mean"]) < 15
    assert abs(dirty["trimmed_mean"] - clean["trimmed_mean"]) < 5
    assert abs(dirty["mad"] - clean["mad"]) < 2


def test_robust_stats_rejects_float_column(spark):
    import pytest as _pytest

    from revtron_utils_spark.operators.quantiles import robust_stats

    df = spark.createDataFrame([(1, 1.5)], "g: int, x: double")
    with _pytest.raises(ValueError, match="integral"):
        robust_stats(df, "x", by=["g"])


def test_robust_stats_matches_python(spark, sf_dir):
    """Differential vs a pure-python reference on the fixture data."""
    import statistics

    from pyspark.sql import functions as F

    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.quantiles import robust_stats

    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "_cents", F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    got = {
        r["l_returnflag"]: r
        for r in robust_stats(li, "_cents", by=["l_returnflag"]).collect()
    }
    vals = {}
    for r in li.select("l_returnflag", "_cents").collect():
        vals.setdefault(r[0], []).append(r[1])
    for g, xs in vals.items():
        xs.sort()
        lo = statistics.quantiles(xs, n=100, method="inclusive")[4]   # p5
        hi = statistics.quantiles(xs, n=100, method="inclusive")[94]  # p95
        med = statistics.median(xs)
        wins = [min(max(x, lo), hi) for x in xs]
        trim = [x for x in xs if lo <= x <= hi]
        mad = statistics.median(sorted(abs(x - med) for x in xs))
        row = got[g]
        assert row["n"] == len(xs)
        assert abs(row["mean"] - statistics.mean(xs)) < 0.01
        assert abs(row["winsor_mean"] - statistics.mean(wins)) < 0.01
        assert abs(row["trimmed_mean"] - statistics.mean(trim)) < 0.01
        assert abs(row["mad"] - mad) < 0.01
