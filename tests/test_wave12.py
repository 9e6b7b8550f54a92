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


# ------------------------------------------------------ pillow decode path


def test_decode_image_pillow_fallback_when_available():
    """JPEG/PNG decode via the optional pillow hook (r11 verdict
    carry-over). Skips in this sandbox (no pillow); the BMP/PPM
    reference codecs stay the tested default either way."""
    import numpy as np

    from revtron_utils_spark.multimodal import _pillow_or_none, decode_image

    Image = _pillow_or_none()
    if Image is None:
        pytest.skip("pillow not installed in this environment")
    import io

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[..., 0] = 200
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    got = decode_image(buf.getvalue())
    assert got.shape == (4, 4, 3)
    assert np.array_equal(got, px)


def test_decode_image_unknown_magic_still_valueerror():
    """Without pillow the non-BMP/PPM path must stay a ValueError (the
    documented contract the mapInPandas error accounting relies on)."""
    from revtron_utils_spark.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n not a real png")


# ---------------------------------------------------------- page_trend_test


def test_page_trend_perfect_monotone(spark):
    """3 blocks × 3 treatments, values strictly increasing along the
    treatment order in every block: ranks 1,2,3 (doubled 2,4,6),
    L2 = 1·6 + 2·12 + 3·18 = 84 (the maximum); E2 = 3·24 = 72,
    Var = 3·9·16·2/144 = 6 ⇒ z = 12/(2√6) ≈ 2.44949."""
    from revtron_utils_spark.operators.hypothesis_tests import page_trend_test

    rows = [
        (blk, t, 10 * blk + t)
        for blk in (1, 2, 3)
        for t in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "blk long, trt long, v long")
    r = page_trend_test(df, "blk", "trt", "v").collect()[0]
    assert (r["k"], r["n_blocks"], r["n_dropped"]) == (3, 3, 0)
    assert r["l2"] == 84
    assert r["z"] == pytest.approx(2.44949, abs=1e-5)


def test_page_trend_incomplete_blocks_dropped(spark):
    from revtron_utils_spark.operators.hypothesis_tests import page_trend_test

    rows = [(1, 1, 5), (1, 2, 6), (1, 3, 7), (2, 1, 9)]  # block 2 incomplete
    df = spark.createDataFrame(rows, "blk long, trt long, v long")
    r = page_trend_test(df, "blk", "trt", "v").collect()[0]
    assert r["n_blocks"] == 1 and r["n_dropped"] == 1


def test_page_trend_no_complete_blocks(spark):
    from revtron_utils_spark.operators.hypothesis_tests import page_trend_test

    rows = [(1, 1, 5), (2, 2, 6)]
    df = spark.createDataFrame(rows, "blk long, trt long, v long")
    r = page_trend_test(df, "blk", "trt", "v").collect()[0]
    assert r["n_blocks"] == 0 and r["n_dropped"] == 2
    assert r["z"] is None


# ----------------------------------------------------------- yuen_trimmed_t


def test_yuen_hand_case(spark):
    """Arms [0,1,2,3,100] and [10,11,12,13,110], 20% trim: g=1, h=3,
    trimmed means 2 vs 12, winsorized s²=1 each, d=2/3 each ⇒
    t = −10/√(4/3) ≈ −8.660254, df = 4 (symmetric arms)."""
    from revtron_utils_spark.operators.hypothesis_tests import yuen_trimmed_t

    rows = [("a", v) for v in (0, 1, 2, 3, 100)] + [
        ("b", v) for v in (10, 11, 12, 13, 110)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    r = yuen_trimmed_t(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["h_a"], r["h_b"]) == (5, 5, 3, 3)
    assert r["tmean_a"] == 2.0 and r["tmean_b"] == 12.0
    assert r["t"] == pytest.approx(-8.660254, abs=1e-6)
    assert r["df"] == pytest.approx(4.0, abs=1e-6)


def test_yuen_outlier_robustness(spark):
    """The whale in arm a (100 vs 3) does not move the trimmed mean —
    replacing it with 1000 changes nothing."""
    from revtron_utils_spark.operators.hypothesis_tests import yuen_trimmed_t

    base = [("a", v) for v in (0, 1, 2, 3, 100)] + [
        ("b", v) for v in (10, 11, 12, 13, 14)
    ]
    whale = [("a", v) for v in (0, 1, 2, 3, 1000)] + [
        ("b", v) for v in (10, 11, 12, 13, 14)
    ]
    r1 = yuen_trimmed_t(
        spark.createDataFrame(base, "g string, v long"), "v", "g", "a", "b"
    ).collect()[0]
    r2 = yuen_trimmed_t(
        spark.createDataFrame(whale, "g string, v long"), "v", "g", "a", "b"
    ).collect()[0]
    assert r1["tmean_a"] == r2["tmean_a"]
    assert r1["t"] == r2["t"]


def test_yuen_rejects_bad_trim(spark):
    from revtron_utils_spark.operators.hypothesis_tests import yuen_trimmed_t

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="trim_pct"):
        yuen_trimmed_t(df, "v", "g", "a", "b", trim_pct=50)


# ---------------------------------------------------------------- tvd_drift


def test_tvd_hand_case(spark):
    """a: {x:2, y:2}, b: {x:1, y:3} ⇒ TVD = ½(¼ + ¼) = 0.25."""
    from revtron_utils_spark.operators.concentration import tvd_drift

    rows = (
        [("a", "x")] * 2 + [("a", "y")] * 2 + [("b", "x")] + [("b", "y")] * 3
    )
    df = spark.createDataFrame(rows, "s string, bkt string")
    r = tvd_drift(df, "bkt", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_buckets_common"]) == (4, 4, 2)
    assert r["tvd"] == 0.25


def test_tvd_disjoint_and_identical(spark):
    from revtron_utils_spark.operators.concentration import tvd_drift

    disjoint = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")], "s string, bkt string"
    )
    assert tvd_drift(disjoint, "bkt", "s", "a", "b").collect()[0]["tvd"] == 1.0
    same = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "s string, bkt string"
    )
    assert tvd_drift(same, "bkt", "s", "a", "b").collect()[0]["tvd"] == 0.0


# -------------------------------------------------------------- bland_altman


def test_bland_altman_hand_case(spark):
    """d = (1,3,5,7): mean 4, s² = 80/12, all four inside the ±1.96s
    limits ⇒ pct_within = 1."""
    import math

    from revtron_utils_spark.operators.association import bland_altman

    rows = [(11, 10), (13, 10), (15, 10), (17, 10)]
    df = spark.createDataFrame(rows, "m1 long, m2 long")
    r = bland_altman(df, "m1", "m2").collect()[0]
    assert r["n"] == 4
    assert r["mean_diff"] == 4.0
    sd = math.sqrt(80 / 12)
    assert r["sd_diff"] == pytest.approx(sd, abs=1e-6)
    assert r["loa_lo"] == pytest.approx(4 - 1.959963984540054 * sd, abs=1e-6)
    assert r["pct_within"] == 1.0


def test_bland_altman_outlier_outside_loa(spark):
    """Nine zeros and one d=100: LoA ≈ 10 ± 62, the whale falls
    outside ⇒ pct_within = 0.9."""
    from revtron_utils_spark.operators.association import bland_altman

    rows = [(0, 0)] * 9 + [(100, 0)]
    df = spark.createDataFrame(rows, "m1 long, m2 long")
    r = bland_altman(df, "m1", "m2").collect()[0]
    assert r["mean_diff"] == 10.0
    assert r["pct_within"] == 0.9


def test_bland_altman_single_row_nulls(spark):
    from revtron_utils_spark.operators.association import bland_altman

    df = spark.createDataFrame([(5, 3)], "m1 long, m2 long")
    r = bland_altman(df, "m1", "m2").collect()[0]
    assert r["n"] == 1 and r["mean_diff"] == 2.0
    assert r["sd_diff"] is None and r["pct_within"] is None


# ------------------------------------------------------------------ wilson_ci


def test_wilson_hand_case(spark):
    """s=5, n=10, z=1.959964: center = (0.5 + z²/20)/(1 + z²/10),
    half = z·sqrt(0.025 + z²/400)/(1 + z²/10) — the classic
    [0.2366, 0.7634] interval."""
    import math

    from revtron_utils_spark.operators.experiment import wilson_ci

    rows = [(1,)] * 5 + [(0,)] * 5
    df = spark.createDataFrame(rows, "x long")
    r = wilson_ci(df, "x").collect()[0]
    assert (r["n"], r["successes"]) == (10, 5)
    assert r["p_hat"] == 0.5
    z = 1.959963984540054
    denom = 1.0 + z * z / 10.0
    center = (0.5 + z * z / 20.0) / denom
    half = z * math.sqrt(0.5 * 0.5 / 10.0 + z * z / 400.0) / denom
    assert r["ci_lo"] == pytest.approx(center - half, abs=1e-6)
    assert r["ci_hi"] == pytest.approx(center + half, abs=1e-6)


def test_wilson_extreme_p_stays_inside_unit_interval(spark):
    """All successes: Wald would give [1, 1]; Wilson pulls the lower
    bound properly below 1 and keeps bounds in (0, 1]."""
    from revtron_utils_spark.operators.experiment import wilson_ci

    df = spark.createDataFrame([(1,)] * 8, "x long")
    r = wilson_ci(df, "x").collect()[0]
    assert r["p_hat"] == 1.0
    assert 0.6 < r["ci_lo"] < 1.0
    assert r["ci_hi"] <= 1.0


# -------------------------------------------------------------------- sign_test


def test_sign_test_hand_case(spark):
    """6 positive, 2 negative, 2 ties: z = 4/√8 ≈ 1.414214, ties
    excluded from the denominator but counted."""
    from revtron_utils_spark.operators.hypothesis_tests import sign_test

    rows = (
        [(5, 1)] * 6 + [(1, 5)] * 2 + [(3, 3)] * 2
    )
    df = spark.createDataFrame(rows, "m1 long, m2 long")
    r = sign_test(df, "m1", "m2").collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"], r["n_zero"]) == (10, 6, 2, 2)
    assert r["z"] == pytest.approx(1.414214, abs=1e-6)


def test_sign_test_all_ties_null(spark):
    from revtron_utils_spark.operators.hypothesis_tests import sign_test

    df = spark.createDataFrame([(2, 2), (7, 7)], "m1 long, m2 long")
    r = sign_test(df, "m1", "m2").collect()[0]
    assert r["z"] is None and r["n_zero"] == 2


# ------------------------------------------------------------ poisson_rate_test


def test_poisson_rate_hand_case(spark):
    """Arm a: 8 events over 4 units; arm b: 2 events over 4 units:
    rates 2 vs 0.5, z = 1.5/sqrt(8/16 + 2/16) = 1.5/0.790569…"""
    import math

    from revtron_utils_spark.operators.hypothesis_tests import (
        poisson_rate_test,
    )

    rows = [("a", 8, 4), ("b", 2, 4)]
    df = spark.createDataFrame(rows, "g string, ev long, ex long")
    r = poisson_rate_test(df, "g", "a", "b", "ev", "ex").collect()[0]
    assert (r["events_a"], r["exposure_a"]) == (8, 4)
    assert r["rate_a"] == 2.0 and r["rate_b"] == 0.5
    z = 1.5 / math.sqrt(8 / 16 + 2 / 16)
    assert r["z"] == pytest.approx(z, abs=1e-6)


def test_poisson_rate_zero_exposure_null(spark):
    from revtron_utils_spark.operators.hypothesis_tests import (
        poisson_rate_test,
    )

    rows = [("a", 8, 4)]
    df = spark.createDataFrame(rows, "g string, ev long, ex long")
    r = poisson_rate_test(df, "g", "a", "b", "ev", "ex").collect()[0]
    assert r["z"] is None and r["rate_b"] is None


# --------------------------------------------------------------- hodges_lehmann


def test_hodges_lehmann_odd_simple(spark):
    """Values {1,2,3}: Walsh averages {1, 1.5, 2, 2, 2.5, 3} → W=6
    even, middles 2 and 2 ⇒ HL = 2."""
    from revtron_utils_spark.operators.hypothesis_tests import hodges_lehmann

    df = spark.createDataFrame([(v,) for v in (1, 2, 3)], "v long")
    r = hodges_lehmann(df, "v").collect()[0]
    assert r["n"] == 3
    assert r["hl_estimate"] == 2.0


def test_hodges_lehmann_two_values(spark):
    """Values {1, 5}: Walsh {1, 3, 5}, W=3 odd ⇒ HL = 3."""
    from revtron_utils_spark.operators.hypothesis_tests import hodges_lehmann

    df = spark.createDataFrame([(1,), (5,)], "v long")
    r = hodges_lehmann(df, "v").collect()[0]
    assert r["hl_estimate"] == 3.0


def test_hodges_lehmann_even_average(spark):
    """Values {1, 2, 4, 10}: W = 10, sorted Walsh (doubled s):
    2,3,5,4,6,8,11,12,14,20 → sorted 2,3,4,5,6,8,11,12,14,20;
    middles 6 and 8 (s-scale) ⇒ HL = (6+8)/4 = 3.5."""
    from revtron_utils_spark.operators.hypothesis_tests import hodges_lehmann

    df = spark.createDataFrame([(v,) for v in (1, 2, 4, 10)], "v long")
    r = hodges_lehmann(df, "v").collect()[0]
    assert r["hl_estimate"] == 3.5


def test_hodges_lehmann_outlier_robust_vs_scipy_semantics(spark):
    """Ties + outlier: matches a brute-force Python Walsh median."""
    import statistics

    from revtron_utils_spark.operators.hypothesis_tests import hodges_lehmann

    vals = [3, 3, 5, 7, 7, 7, 9, 1000]
    walsh = [
        (vals[i] + vals[j]) / 2
        for i in range(len(vals))
        for j in range(i, len(vals))
    ]
    want = statistics.median(walsh)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = hodges_lehmann(df, "v").collect()[0]
    assert r["hl_estimate"] == pytest.approx(want, abs=1e-9)
