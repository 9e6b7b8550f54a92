"""Round-10 third stats wave: Welch's heteroscedastic ANOVA, Grubbs'
single-outlier test, the Wald-Wolfowitz runs test, and Mood's median
test."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- welch_anova


def test_welch_anova_hand_checked(spark):
    """a={1,2,3} (w=3), b={4,6,8} (w=3/4): W=3.75, m=2.8, num=9.6,
    k=2 so the k−2 term vanishes → F_W=9.6; Λ=0.34 → df₂=1/0.34."""
    from revtron_utils_spark.operators.profile import welch_anova

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (6, "b"), (8, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = welch_anova(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 6 and r["n_excluded"] == 0
    assert abs(r["f_welch"] - 9.6) < 1e-9
    assert abs(r["df2"] - round(1.0 / 0.34, 6)) < 1e-9


def test_welch_anova_excludes_degenerate_groups(spark):
    """A singleton group and a zero-variance group carry infinite
    weight — they must be EXCLUDED and counted, not poison the F."""
    from revtron_utils_spark.operators.profile import welch_anova

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (6, "b"), (8, "b"),
            (9, "solo"), (5, "flat"), (5, "flat")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = welch_anova(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n_excluded"] == 2
    assert abs(r["f_welch"] - 9.6) < 1e-9


def test_welch_anova_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        welch_anova,
        welch_anova_oracle_sql,
    )

    rows = [((i * 37) % 101 + (i % 5) * 7, "g" + str(i % 5)) for i in range(400)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = tuple(welch_anova(df, "v", "g").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        welch_anova_oracle_sql("SELECT * FROM t", "v", "g")
    ).fetchone()
    assert got == want


# --------------------------------------------------------------- grubbs_test


def test_grubbs_flags_planted_outlier(spark):
    from revtron_utils_spark.operators.profile import grubbs_test

    rows = [("g", i, 10 + (i % 3)) for i in range(20)] + [("g", 99, 500)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = grubbs_test(df, "v", "g", "id").collect()[0]
    assert r["outlier_id"] == 99 and r["v"] == 500
    assert r["g_stat"] > 4.0


def test_grubbs_tie_breaks_to_min_id(spark):
    """Two symmetric extremes (same |deviation|): smallest id wins."""
    from revtron_utils_spark.operators.profile import grubbs_test

    rows = [("g", 7, 0), ("g", 3, 10), ("g", 5, 5), ("g", 1, 5)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = grubbs_test(df, "v", "g", "id").collect()[0]
    assert r["outlier_id"] == 3  # dev 20 at ids 3 (v=10) and 7 (v=0): min id 3


def test_grubbs_zero_variance_null(spark):
    from revtron_utils_spark.operators.profile import grubbs_test

    rows = [("g", i, 5) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = grubbs_test(df, "v", "g", "id").collect()[0]
    assert r["g_stat"] is None and r["outlier_id"] == 0


def test_grubbs_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        grubbs_test,
        grubbs_test_oracle_sql,
    )

    rows = [("g" + str(i % 4), i, (i * 13) % 57) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = sorted(map(tuple, grubbs_test(df, "v", "g", "id").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, id BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                grubbs_test_oracle_sql("SELECT * FROM t", "v", "g", "id")
            ).fetchall(),
        )
    )
    assert got == want


# ----------------------------------------------------------------- runs_test


def test_runs_test_oscillating_positive_z(spark):
    """Perfectly alternating above/below: the maximum possible runs →
    strongly positive z."""
    from revtron_utils_spark.operators.timeseries import runs_test

    rows = [("g", t, 10 if t % 2 == 0 else 0) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = runs_test(df, "g", "t", "x").collect()[0]
    assert r["runs"] == 30 and r["z"] > 4.0


def test_runs_test_clumped_negative_z(spark):
    """All lows then all highs: 2 runs → strongly negative z."""
    from revtron_utils_spark.operators.timeseries import runs_test

    rows = [("g", t, 0 if t < 15 else 10) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = runs_test(df, "g", "t", "x").collect()[0]
    assert r["runs"] == 2 and r["z"] < -4.0


def test_runs_test_median_ties_dropped(spark):
    """Values equal to the median are dropped before counting."""
    from revtron_utils_spark.operators.timeseries import runs_test

    rows = [("g", 0, 1), ("g", 1, 5), ("g", 2, 9), ("g", 3, 5), ("g", 4, 1),
            ("g", 5, 9)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = runs_test(df, "g", "t", "x").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 2  # the two 5s (the median) dropped


def test_runs_test_matches_oracle(spark):
    from revtron_utils_spark.operators.timeseries import (
        runs_test,
        runs_test_oracle_sql,
    )

    rows = [
        ("g" + str(g), t, ((t * 17 + g * 5) % 23))
        for g in range(3)
        for t in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    got = sorted(map(tuple, runs_test(df, "g", "t", "x").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                runs_test_oracle_sql("SELECT * FROM t", "g", "t", "x")
            ).fetchall(),
        )
    )
    assert got == want


# -------------------------------------------------------------- moods_median


def test_moods_median_hand_checked(spark):
    """a all below, b all above the grand median → maximal chi² = n."""
    from revtron_utils_spark.operators.profile import moods_median

    rows = [(v, "a") for v in (1, 2, 3, 4)] + [(v, "b") for v in (10, 11, 12, 13)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = moods_median(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 8
    assert abs(r["chi2"] - 8.0) < 1e-9  # perfect separation: chi2 = n


def test_moods_median_no_signal_zero(spark):
    """Identical distributions: each group splits evenly → chi² = 0."""
    from revtron_utils_spark.operators.profile import moods_median

    rows = [(v, g) for g in ("a", "b") for v in (1, 2, 8, 9)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = moods_median(df, "v", "g").collect()[0]
    assert r["chi2"] == 0.0


def test_moods_median_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        moods_median,
        moods_median_oracle_sql,
    )

    rows = [((i * 7) % 31, "g" + str(i % 4)) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = tuple(moods_median(df, "v", "g").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        moods_median_oracle_sql("SELECT * FROM t", "v", "g")
    ).fetchone()
    assert got == want


def test_moods_median_guard_trips(spark):
    from revtron_utils_spark.operators.profile import moods_median

    df = spark.range(3000).select(
        F.col("id").alias("v"), (F.col("id") % 2).alias("g")
    )
    with pytest.raises(Exception, match="moods_median"):
        moods_median(df, "v", "g", max_buckets=100).collect()
