"""Round-11 guard hardening: the integer-exact stats family must FAIL
FAST, not silently diverge, on the three hazards the round-10 audit
flagged — fractional value columns (silent ``.cast("long")``
truncation), DECIMAL(38,0) sum-of-squares overflow in the ops that
skipped the measured width check, and the quadratic joint-cell blowup
in kendall_tau's concordance self-join. Plus the durbin_watson
duplicate-bucket raise (the acf_lags precedent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from py4j.protocol import Py4JJavaError


def _raises_noninteger(fn):
    """The inline integral guard surfaces as a Spark execution error
    wrapping our raise_error message."""
    with pytest.raises(Exception) as ei:
        fn()
    assert "non-integer value" in str(ei.value)


# ------------------------------------------------------ fractional fail-fast


def test_welch_anova_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import welch_anova

    rows = [(1.5, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    _raises_noninteger(lambda: welch_anova(df, "v", "g").collect())


def test_anova_oneway_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import anova_oneway

    rows = [(1.25, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    _raises_noninteger(lambda: anova_oneway(df, "v", "g").collect())


def test_effect_sizes_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import effect_sizes

    rows = [(1, 10.5), (1, 11.0), (0, 9.0), (0, 8.0)]
    df = spark.createDataFrame(rows, "t int, v double")
    _raises_noninteger(lambda: effect_sizes(df, "t", "v").collect())


def test_grubbs_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import grubbs_test

    rows = [("a", 1, 1.5), ("a", 2, 2.0), ("a", 3, 9.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    _raises_noninteger(lambda: grubbs_test(df, "v", "g", "id").collect())


def test_moods_median_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import moods_median

    rows = [("a", 1.5), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    _raises_noninteger(lambda: moods_median(df, "v", "g").collect())


def test_friedman_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import friedman_test

    rows = [(b, t, float(b + len(t)) + 0.5) for b in range(3) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    _raises_noninteger(lambda: friedman_test(df, "b", "t", "v").collect())


def test_kendall_tau_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.profile import kendall_tau

    rows = [(1.5, 2.0), (2.0, 3.0), (3.0, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    _raises_noninteger(lambda: kendall_tau(df, "x", "y").collect())


def test_cronbach_alpha_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.annotation import cronbach_alpha

    rows = [(s, i, float(s + len(i)) + 0.25) for s in range(3) for i in ("q1", "q2")]
    df = spark.createDataFrame(rows, "s long, i string, v double")
    _raises_noninteger(lambda: cronbach_alpha(df, "s", "i", "v").collect())


def test_durbin_watson_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.timeseries import durbin_watson

    rows = [("a", t, float(t), float(t) * 2 + 0.5) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t long, x double, y double")
    _raises_noninteger(lambda: durbin_watson(df, "g", "t", "x", "y").collect())


def test_acf_lags_rejects_fractional_values(spark):
    from revtron_utils_spark.operators.timeseries import acf_lags

    rows = [("a", t, float(t) + 0.5) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    _raises_noninteger(lambda: acf_lags(df, "g", "t", "v").collect())


def test_integral_long_passes_whole_doubles_and_nulls(spark):
    """A double column that happens to carry only whole values (and
    NULLs) must flow through unchanged — the guard rejects VALUES, not
    types."""
    from revtron_utils_spark.operators.profile import anova_oneway

    rows = [(1.0, "a"), (2.0, "a"), (None, "a"), (3.0, "b"), (4.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = anova_oneway(df.where(F.col("v").isNotNull()), "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 4


def test_integral_long_integer_input_is_plain_cast(spark):
    """Integral input types must compile to a bare cast — no guard
    branch in the plan (zero cost on the house-rule integer paths)."""
    from revtron_utils_spark.operators.guards import integral_long

    df = spark.createDataFrame([(1,)], "v long")
    plan = df.select(integral_long(df, "v", "x"))._jdf.queryExecution().toString()
    assert "raise_error" not in plan


# -------------------------------------------------------- width fail-fasts


def test_welch_anova_width_fail_fast(spark):
    from revtron_utils_spark.operators.profile import welch_anova

    big = 6 * 10**18  # n·max² = 4·3.6e37 ≥ 1e38, still inside long
    rows = [(big, "a"), (big - 1, "a"), (big - 7, "b"), (big - 9, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    with pytest.raises(ValueError, match="overflow"):
        welch_anova(df, "v", "g")


def test_effect_sizes_width_fail_fast(spark):
    from revtron_utils_spark.operators.profile import effect_sizes

    big = 6 * 10**18
    rows = [(1, big), (1, big - 1), (0, big - 2), (0, big - 3)]
    df = spark.createDataFrame(rows, "t int, v long")
    with pytest.raises(ValueError, match="overflow"):
        effect_sizes(df, "t", "v")


def test_grubbs_width_fail_fast(spark):
    from revtron_utils_spark.operators.profile import grubbs_test

    big = 6 * 10**18  # 3·3.6e37 ≥ 1e38
    rows = [("a", 1, big), ("a", 2, big - 1), ("a", 3, big - 5)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    with pytest.raises(ValueError, match="overflow"):
        grubbs_test(df, "v", "g", "id")


def test_cronbach_width_fail_fast_scales_by_items(spark):
    """cronbach's totals are k items wide: a value that squares safely
    on its own must still trip the guard once scaled by k."""
    from revtron_utils_spark.operators.annotation import cronbach_alpha

    big = 3 * 10**18  # n·(k·max)² = 6·(6e18)² ≈ 2.2e38 ≥ 1e38
    rows = [(s, i, big - s - len(i)) for s in range(3) for i in ("q1", "q2")]
    df = spark.createDataFrame(rows, "s long, i string, v long")
    with pytest.raises(ValueError, match="overflow"):
        cronbach_alpha(df, "s", "i", "v")


# ------------------------------------------------- structural fail-fasts


def test_durbin_watson_rejects_duplicate_buckets(spark):
    from revtron_utils_spark.operators.timeseries import durbin_watson

    rows = [("a", 1, 1, 2), ("a", 1, 2, 3), ("a", 2, 3, 5), ("a", 3, 4, 6)]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    with pytest.raises(ValueError, match="duplicate"):
        durbin_watson(df, "g", "t", "x", "y")


def test_kendall_tau_joint_cell_guard(spark):
    """60×60 distinct joint cells under per-axis caps of 100 each must
    trip max_cells (the per-axis guards alone would admit it)."""
    from revtron_utils_spark.operators.profile import kendall_tau

    rows = [(i % 60, i // 60) for i in range(3600)]
    df = spark.createDataFrame(rows, "x long, y long")
    with pytest.raises(Exception, match="_cell"):
        kendall_tau(
            df, "x", "y", max_x_buckets=100, max_y_buckets=100, max_cells=1000
        ).collect()
    # and the same data passes when the caller vouches
    out = kendall_tau(
        df, "x", "y", max_x_buckets=100, max_y_buckets=100, max_cells=None
    ).collect()
    assert out[0]["n"] == 3600
