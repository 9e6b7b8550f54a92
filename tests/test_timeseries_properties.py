"""Hypothesis property-differentials for the round-7 time-series /
survival operators: random bucketed series vs pure-python models of the
pinned formulas. Complements the fixed fixtures in test_timeseries.py /
test_survival.py with adversarial shapes (ties, constants, single
buckets)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hypothesis import HealthCheck, given, settings, strategies as st

SERIES = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=2, max_size=25
)
SUBJECTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8), st.integers(min_value=0, max_value=1)
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(xs=SERIES)
def test_cusum_property_differential(spark, xs):
    from revtron_utils_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    r = cusum_changepoint(df, "t", "x", ["g"]).collect()[0]
    n, total = len(xs), sum(xs)
    best_t, best_s, cum = None, None, 0
    for i, x in enumerate(xs, start=1):
        cum += x
        s = float(cum) - float(i * total) / float(n)
        if best_s is None or abs(s) > abs(best_s):
            best_t, best_s = i, s
    assert r["peak_t"] == best_t
    assert abs(r["peak_cusum"] - best_s) < 1.01e-4
    assert r["total"] == total and r["n_buckets"] == n


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(xs=SERIES)
def test_mann_kendall_property_differential(spark, xs):
    from revtron_utils_spark.operators.timeseries import mann_kendall

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
    assert abs(r["tau"] - s / (n * (n - 1) / 2)) < 1.01e-6


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(xs=SERIES)
def test_ewma_property_differential(spark, xs):
    from revtron_utils_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    rows = ewma(df, "t", "x", ["g"], alpha=0.3).orderBy("t").collect()
    e = float(xs[0])
    for i, r in enumerate(rows):
        if i > 0:
            e = 0.3 * xs[i] + 0.7 * e
        # one rounding quantum of slack: python round() is half-even on
        # the stored double while Spark/DuckDB ROUND are half-up (both
        # engines agree with each other — hypothesis found the boundary)
        assert abs(r["ewma"] - e) < 1.01e-4


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(subj=SUBJECTS)
def test_kaplan_meier_property_differential(spark, subj):
    from revtron_utils_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame([("g", t, e) for t, e in subj], ["g", "t", "e"])
    got = sorted(
        (r["t"], r["at_risk"], r["events"], r["survival"])
        for r in kaplan_meier(df, "t", "e", ["g"]).collect()
    )
    times = sorted({t for t, e in subj if e == 1})
    s = 1.0
    want = []
    for t in times:
        n = sum(1 for u, _ in subj if u >= t)
        d = sum(1 for u, e in subj if u == t and e == 1)
        s *= 1.0 - d / n
        want.append((t, n, d))
    assert len(got) == len(want)
    s = 1.0
    for (gt, gn, gd, gs), (wt, wn, wd) in zip(got, want):
        s *= 1.0 - wd / wn
        assert (gt, gn, gd) == (wt, wn, wd)
        assert abs(gs - s) < 1.01e-6


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(subj=SUBJECTS)
def test_theil_sen_property_differential(spark, subj):
    from revtron_utils_spark.operators.timeseries import theil_sen

    xs = [t for t, _ in subj]  # reuse the generator as a value stream
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs, start=1)], ["g", "t", "x"]
    )
    if len(xs) < 2:
        return
    r = theil_sen(df, "t", "x", ["g"]).collect()[0]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    want = slopes[math.ceil(len(slopes) / 2) - 1]
    assert abs(r["slope"] - want) < 1.01e-6
