"""Round-12 wave: hand-checked constants for the new experiment /
association / concentration / trend operators, plus the round's
advisor-fix regressions (width guards, winsorized NULLs, shapley
oracle bound, pq_adc_exact fail-fast)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------- regression_adjustment


def test_regression_adjustment_hand_case(spark):
    """Both arms have within-arm slope 2 and equal covariate means, so
    β = 2 and the adjustment moves nothing: ATE = raw diff = 2."""
    from revtron_utils_spark.operators.experiment import regression_adjustment

    rows = [
        (1, 1, 3), (1, 2, 5),  # treated: y = 2x + 1
        (0, 1, 1), (0, 2, 3),  # control: y = 2x − 1
    ]
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    r = regression_adjustment(df, "x", "y", "arm", 1, 0).collect()[0]
    assert (r["n_t"], r["n_c"]) == (2, 2)
    assert r["diff_raw"] == 2.0
    assert r["beta"] == 2.0
    assert r["ate_adj"] == 2.0


def test_regression_adjustment_covariate_imbalance(spark):
    """Treated arm saw higher x by chance; the adjustment removes the
    slope·Δx component: ȳ_t=7, ȳ_c=1, x̄_t=3, x̄_c=1, β=2 ⇒
    ATE = 6 − 2·2 = 2."""
    from revtron_utils_spark.operators.experiment import regression_adjustment

    rows = [
        (1, 2, 5), (1, 4, 9),   # treated: y = 2x + 1
        (0, 0, -1), (0, 2, 3),  # control: y = 2x − 1
    ]
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    r = regression_adjustment(df, "x", "y", "arm", 1, 0).collect()[0]
    assert r["diff_raw"] == 6.0
    assert r["beta"] == 2.0
    assert r["ate_adj"] == 2.0


def test_regression_adjustment_rejects_fractional(spark):
    from revtron_utils_spark.operators.experiment import regression_adjustment

    df = spark.createDataFrame([(1, 1.5, 2.0)], "arm long, x double, y double")
    with pytest.raises(ValueError, match="integral"):
        regression_adjustment(df, "x", "y", "arm", 1, 0)


def test_regression_adjustment_degenerate_x(spark):
    """Constant covariate in both arms ⇒ Dβ = 0 ⇒ NULL beta/ate but a
    live raw difference."""
    from revtron_utils_spark.operators.experiment import regression_adjustment

    rows = [(1, 5, 10), (1, 5, 12), (0, 5, 7), (0, 5, 9)]
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    r = regression_adjustment(df, "x", "y", "arm", 1, 0).collect()[0]
    assert r["diff_raw"] == 3.0
    assert r["beta"] is None and r["ate_adj"] is None


# --------------------------------------------------- group_sequential_check


def test_group_sequential_hand_case(spark):
    """Cumulative look-1 cells: t={1,3}, c={0,2} ⇒ pooled s²=2,
    z = 1/√2 ≈ 0.707107; boundaries [1.0, 2.0] ⇒ not crossed."""
    from revtron_utils_spark.operators.experiment import group_sequential_check

    rows = [
        (1, 1, 1), (1, 1, 3), (1, 0, 0), (1, 0, 2),
        (2, 1, 4), (2, 0, 0),
    ]
    df = spark.createDataFrame(rows, "look long, arm long, v long")
    out = {
        r["look"]: r
        for r in group_sequential_check(
            df, "look", "arm", "v", 1, 0, boundaries=[1.0, 2.0]
        ).collect()
    }
    assert out[1]["n_t"] == 2 and out[1]["n_c"] == 2
    assert out[1]["z"] == pytest.approx(0.707107)
    assert out[1]["boundary"] == 1.0
    assert bool(out[1]["crossed"]) is False
    assert out[1]["info_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert out[2]["n_t"] == 3 and out[2]["n_c"] == 3
    assert out[2]["info_frac"] == 1.0


def test_group_sequential_crossing(spark):
    """A huge separation crosses a loose boundary at the first look."""
    from revtron_utils_spark.operators.experiment import group_sequential_check

    rows = [(1, 1, 100), (1, 1, 101), (1, 0, 0), (1, 0, 1)]
    df = spark.createDataFrame(rows, "look long, arm long, v long")
    r = group_sequential_check(
        df, "look", "arm", "v", 1, 0, boundaries=[2.0]
    ).collect()[0]
    assert bool(r["crossed"]) is True


# ------------------------------------------------------- seasonal_naive_eval


def test_seasonal_naive_hand_case(spark):
    """y = 1..6, period 2: seasonal errors are all 2 (MAE 2, RMSE 2),
    naive errors all 1 (MAE 1) ⇒ MASE = 2."""
    from revtron_utils_spark.operators.timeseries import seasonal_naive_eval

    rows = [("a", t, t) for t in range(1, 7)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    r = seasonal_naive_eval(df, "t", "y", 2, by=["g"]).collect()[0]
    assert r["n"] == 6
    assert r["mae_seasonal"] == 2.0
    assert r["mae_naive"] == 1.0
    assert r["mase"] == 2.0
    assert r["rmse_seasonal"] == 2.0


def test_seasonal_naive_short_series_nulls(spark):
    """A series shorter than the period has no seasonal span: NULL MAE
    and MASE, live naive MAE."""
    from revtron_utils_spark.operators.timeseries import seasonal_naive_eval

    rows = [("a", 1, 10), ("a", 2, 13)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    r = seasonal_naive_eval(df, "t", "y", 12, by=["g"]).collect()[0]
    assert r["mae_seasonal"] is None and r["mase"] is None
    assert r["mae_naive"] == 3.0


def test_seasonal_naive_rejects_period_one(spark):
    from revtron_utils_spark.operators.timeseries import seasonal_naive_eval

    df = spark.createDataFrame([("a", 1, 1)], "g string, t long, y long")
    with pytest.raises(ValueError, match="period"):
        seasonal_naive_eval(df, "t", "y", 1)


# ------------------------------------------------------- partial_correlation


def test_partial_correlation_perfect_confound(spark):
    """y and x are both exact linear functions of z, so r_xy = 1 via z
    and the 1 − r² factors vanish ⇒ partial_r NULL."""
    from revtron_utils_spark.operators.association import partial_correlation

    rows = [(z, 2 * z, 3 * z) for z in range(1, 6)]
    df = spark.createDataFrame(rows, "z long, x long, y long")
    r = partial_correlation(df, "x", "y", "z").collect()[0]
    assert r["r_xy"] == 1.0 and r["r_xz"] == 1.0 and r["r_yz"] == 1.0
    assert r["partial_r"] is None


def test_partial_correlation_hand_case(spark):
    """Numbers small enough to check by hand: x=(1,2,3,4), y=(1,3,2,4),
    z=(0,1,0,1). covs (n·Σab − ΣaΣb): xy=16, xz=4, yz=8; vars: x=y=20,
    z=4 ⇒ r_xy=0.8, r_xz=4/√80≈0.447214, r_yz=8/√80≈0.894427;
    partial = (0.8 − 0.4)/√(0.8·0.2) = 1 (y−2z is exactly x/2 − 1/2:
    once z is removed, y IS x)."""
    from revtron_utils_spark.operators.association import partial_correlation

    rows = [(1, 1, 0), (2, 3, 1), (3, 2, 0), (4, 4, 1)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    r = partial_correlation(df, "x", "y", "z").collect()[0]
    assert r["r_xy"] == pytest.approx(0.8)
    assert r["r_xz"] == pytest.approx(0.447214)
    assert r["r_yz"] == pytest.approx(0.894427)
    assert r["partial_r"] == pytest.approx(1.0)


# ----------------------------------------------------------- gamma_somers_d


def test_gamma_somers_d_hand_case(spark):
    """(1,1),(1,2),(2,3): C=2, D=0 ⇒ gamma=1; x-tied pairs=1 ⇒
    d_yx = 2·2/(3·2 − 2) = 1."""
    from revtron_utils_spark.operators.association import gamma_somers_d

    rows = [(1, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = gamma_somers_d(df, "x", "y").collect()[0]
    assert (r["concordant"], r["discordant"]) == (2, 0)
    assert r["gamma"] == 1.0
    assert r["somers_dyx"] == 1.0


def test_gamma_somers_d_discordant(spark):
    """Reversed order flips the sign: (1,3),(2,1) ⇒ C=0, D=1 ⇒
    gamma=−1, d_yx=−1."""
    from revtron_utils_spark.operators.association import gamma_somers_d

    rows = [(1, 3), (2, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = gamma_somers_d(df, "x", "y").collect()[0]
    assert r["gamma"] == -1.0 and r["somers_dyx"] == -1.0


def test_gamma_ties_differ_from_tau(spark):
    """With y-ties gamma (drops tied pairs) exceeds |d_yx| (keeps them
    in the denominator): (1,1),(2,1),(3,2) ⇒ C=2, D=0, gamma=1;
    d_yx = 2·2/(6 − 0) = 2/3."""
    from revtron_utils_spark.operators.association import gamma_somers_d

    rows = [(1, 1), (2, 1), (3, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = gamma_somers_d(df, "x", "y").collect()[0]
    assert r["gamma"] == 1.0
    assert r["somers_dyx"] == pytest.approx(2 / 3, abs=1e-6)


# -------------------------------------------------------------- risk_ratios


def test_risk_ratios_hand_case(spark):
    """a=2 b=2 c=1 d=3: risks 0.5 vs 0.25, RD=0.25, RR=2."""
    from revtron_utils_spark.operators.association import risk_ratios

    rows = [(1, 1), (1, 1), (1, 0), (1, 0), (0, 1), (0, 0), (0, 0), (0, 0)]
    df = spark.createDataFrame(rows, "e long, o long")
    r = risk_ratios(df, "e", "o").collect()[0]
    assert (r["n_exposed"], r["n_unexposed"]) == (4, 4)
    assert r["risk_exposed"] == 0.5
    assert r["risk_unexposed"] == 0.25
    assert r["risk_diff"] == 0.25
    assert r["risk_ratio"] == 2.0
    # Wald half-width: 1.96·sqrt(2·2/64 + 1·3/64) = 1.959964·sqrt(7/64)
    import math

    half = 1.959963984540054 * math.sqrt(7 / 64)
    assert r["rd_lo"] == pytest.approx(0.25 - half, abs=1e-6)
    assert r["rd_hi"] == pytest.approx(0.25 + half, abs=1e-6)


def test_risk_ratios_zero_unexposed_events(spark):
    """c = 0 ⇒ RR NULL (division by zero), RD still live."""
    from revtron_utils_spark.operators.association import risk_ratios

    rows = [(1, 1), (1, 0), (0, 0), (0, 0)]
    df = spark.createDataFrame(rows, "e long, o long")
    r = risk_ratios(df, "e", "o").collect()[0]
    assert r["risk_ratio"] is None
    assert r["risk_diff"] == 0.5


# ---------------------------------------------------------- ratio_metric_ci


def test_ratio_metric_ci_hand_case(spark):
    """(x,y) = (1,1),(2,4): R=5/3; s²_x=.5, s²_y=4.5, s_xy=1.5;
    Var = (4.5 − 2R·1.5 + R²·.5)/(2·1.5²) — check against the same
    fixed-order float arithmetic."""
    from revtron_utils_spark.operators.experiment import ratio_metric_ci

    df = spark.createDataFrame([(1, 1), (4, 2)], "y long, x long")
    r = ratio_metric_ci(df, "y", "x").collect()[0]
    assert (r["sum_num"], r["sum_den"]) == (5, 3)
    R = 5.0 / 3.0
    var = (4.5 - 2.0 * R * 1.5 + R * R * 0.5) / (2.0 * 1.5 * 1.5)
    import math

    assert r["ratio"] == pytest.approx(R, abs=1e-6)
    assert r["se"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert r["ci_lo"] == pytest.approx(R - 1.959963984540054 * math.sqrt(var), abs=1e-6)


def test_ratio_metric_ci_zero_variance(spark):
    """Identical units ⇒ se = 0 and a degenerate CI at the ratio."""
    from revtron_utils_spark.operators.experiment import ratio_metric_ci

    df = spark.createDataFrame([(2, 1), (2, 1)], "y long, x long")
    r = ratio_metric_ci(df, "y", "x").collect()[0]
    assert r["ratio"] == 2.0
    assert r["se"] == 0.0
    assert r["ci_lo"] == 2.0 and r["ci_hi"] == 2.0


# ----------------------------------------------------------- quantile_share


def test_quantile_share_hand_case(spark):
    """Values 1..10: bottom 40% = {1..4} sums 10, top 10% = {10} sums
    10, total 55 ⇒ equal shares, ratio 1."""
    from revtron_utils_spark.operators.concentration import quantile_share

    rows = [(i, i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, v long")
    r = quantile_share(df, "v", ["id"]).collect()[0]
    assert r["n"] == 10 and r["total"] == 55
    assert r["bottom_share"] == pytest.approx(10 / 55, abs=1e-6)
    assert r["top_share"] == pytest.approx(10 / 55, abs=1e-6)
    assert r["top_bottom_ratio"] == 1.0


def test_quantile_share_tie_break_deterministic(spark):
    """All-equal values: the id tie-break decides which rows land in
    the bottom cut, but the SUMS are tie-invariant — shares still
    exact."""
    from revtron_utils_spark.operators.concentration import quantile_share

    rows = [(i, 7) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, v long")
    r = quantile_share(df, "v", ["id"]).collect()[0]
    assert r["bottom_share"] == pytest.approx(4 * 7 / 70, abs=1e-6)
    assert r["top_share"] == pytest.approx(7 / 70, abs=1e-6)


# ------------------------------------------------------ jonckheere_terpstra


def test_jonckheere_all_concordant(spark):
    """g1={1,2}, g2={3,4}: every cross pair ascends ⇒ 2J = 8 = its
    maximum (2·n₁·n₂); E₀ = (16 − 8)/4 = 2 < J = 4 ⇒ z > 0."""
    from revtron_utils_spark.operators.hypothesis_tests import (
        jonckheere_terpstra,
    )

    rows = [(1, 1), (1, 2), (2, 3), (2, 4)]
    df = spark.createDataFrame(rows, "g long, v long")
    r = jonckheere_terpstra(df, "v", "g").collect()[0]
    assert (r["n"], r["k"], r["jt2"]) == (4, 2, 8)
    assert r["z"] is not None and r["z"] > 0


def test_jonckheere_hand_variance(spark):
    """g1={1,2}, g2={2,3}: 2J = 2+2+1+2 = 7; no-tie-free case checked
    against the Hollander–Wolfe three-term variance computed by hand
    in exact Python ints."""
    from revtron_utils_spark.operators.hypothesis_tests import (
        jonckheere_terpstra,
    )

    rows = [(1, 1), (1, 2), (2, 2), (2, 3)]
    df = spark.createDataFrame(rows, "g long, v long")
    r = jonckheere_terpstra(df, "v", "g").collect()[0]
    assert r["jt2"] == 7
    n = 4
    q4 = n * n - (4 + 4)  # 8 = 4·E₀ (E₀ = n₁n₂/2 = 2)
    g25 = 2 * (2 * 1 * 9)  # groups both size 2
    t25 = 2 * 1 * 9  # one value (2) tied twice
    term1 = (n * (n - 1) * (2 * n + 5) - g25 - t25) / 72.0
    g3 = 0  # sizes 2 ⇒ (n_i−2)=0
    t3 = 0
    term2 = 0.0
    g2 = 2 * (2 * 1)
    t2 = 2 * 1
    term3 = (g2 * t2) / (8.0 * n * (n - 1))
    import math

    z = (2.0 * 7 - q4) / (4.0 * math.sqrt(term1 + term2 + term3))
    assert r["z"] == pytest.approx(round(z, 6), abs=1e-6)


def test_jonckheere_degenerate_null_z(spark):
    """One group ⇒ no ordered pairs and zero variance ⇒ z NULL."""
    from revtron_utils_spark.operators.hypothesis_tests import (
        jonckheere_terpstra,
    )

    rows = [(1, 1), (1, 2), (1, 3)]
    df = spark.createDataFrame(rows, "g long, v long")
    r = jonckheere_terpstra(df, "v", "g").collect()[0]
    assert r["jt2"] == 0
    assert r["z"] is None


# ------------------------------------------------- advisor-fix regressions


def test_winsorized_stats_null_values_match_oracle(spark):
    """NULL metrics are excluded from ranking AND n on both engines
    (the r12 advisor fix: Spark ranks NULLS FIRST, DuckDB NULLS
    LAST — counting them shifted every ⌈q·n⌉ threshold)."""
    from revtron_utils_spark.operators.concentration import (
        winsorized_stats,
        winsorized_stats_oracle_sql,
    )

    rows = [(i, v) for i, v in enumerate([5, None, 1, 9, None, 3, 7, 2, 8, 4])]
    df = spark.createDataFrame(rows, "id long, v long")
    got = winsorized_stats(df, "v", lo_pct=10, hi_pct=90).collect()[0]
    assert got["n"] == 8  # NULLs excluded from n
    con = duckdb.connect()
    con.execute("CREATE TABLE src (id BIGINT, v BIGINT)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    sql = winsorized_stats_oracle_sql("SELECT v FROM src", "v", lo_pct=10, hi_pct=90)
    want = con.execute(sql).fetchone()
    assert (got["n"], got["p_lo"], got["p_hi"]) == tuple(want[:3])
    assert got["winsorized_mean"] == pytest.approx(want[3], abs=1e-9)
    assert got["trimmed_mean"] == pytest.approx(want[4], abs=1e-9)


def test_shapley_oracle_errors_over_channel_cap():
    """13 channels with max_channels=12 must ERROR in the oracle, not
    silently truncate the lattice (the r12 advisor fix)."""
    from revtron_utils_spark.operators.funnel import (
        shapley_attribution_oracle_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE touches (u BIGINT, c VARCHAR)")
    con.executemany(
        "INSERT INTO touches VALUES (?, ?)",
        [(i, f"ch{i:02d}") for i in range(13)],
    )
    sql = shapley_attribution_oracle_sql("SELECT u, c FROM touches", "u", "c")
    with pytest.raises(duckdb.Error, match="max_channels"):
        con.execute(sql).fetchall()


def test_pq_adc_exact_small_corpus_fails_fast(spark):
    from revtron_utils_spark.operators.pq import pq_adc_exact

    rows = [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="n_codes"):
        pq_adc_exact(df, [0.0, 0.0, 0.0, 0.0], n_codes=16)


def test_sum_sq_width_multi_guard(spark):
    """One overflow-wide column among several trips the combined
    guard; narrow inputs pass."""
    from revtron_utils_spark.operators.guards import require_sum_sq_width_multi

    ok = spark.createDataFrame([(1, 2)], "a long, b long")
    require_sum_sq_width_multi(ok, ["a", "b"], "t")  # no raise
    wide = spark.createDataFrame(
        [(1, 4 * 10**18)] * 100, "a long, b long"
    )  # 100·(4e18)² ≈ 1.6e39 ≥ 10³⁸
    with pytest.raises(ValueError, match="overflow"):
        require_sum_sq_width_multi(wide, ["a", "b"], "t")
