"""Round-10 stats wave: Kruskal-Wallis H (doubled midranks), one-way
ANOVA F + η², Brown-Forsythe equal-variance (doubled group medians),
Kendall τ-b over the bounded joint histogram."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------- kruskal_wallis


def test_kruskal_wallis_hand_checked(spark):
    """No-tie textbook case a={1,2,3}, b={4,5,6}: R_a=6, R_b=15,
    H = 12/(6·7)·(12+75) − 21 = 27/7."""
    from revtron_utils_spark.operators.profile import kruskal_wallis

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 6
    assert abs(r["h"] - round(27.0 / 7.0, 6)) < 1e-9
    assert r["h_corrected"] == r["h"]  # no ties -> correction is 1


def test_kruskal_wallis_ties_match_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        kruskal_wallis,
        kruskal_wallis_oracle_sql,
    )

    rows = [(i % 7, "g" + str(i % 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = tuple(kruskal_wallis(df, "v", "g").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        kruskal_wallis_oracle_sql("SELECT * FROM t", "v", "g")
    ).fetchone()
    assert got == want


def test_kruskal_wallis_all_tied_null(spark):
    """Every value identical: the tie correction denominator is 0 and
    h_corrected must be NULL (h itself is the degenerate −3(N+1)+3(N+1)
    ... i.e. defined), never a division blow-up."""
    from revtron_utils_spark.operators.profile import kruskal_wallis

    df = spark.createDataFrame(
        [(5, "a")] * 4 + [(5, "b")] * 4, "v long, g string"
    )
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["h_corrected"] is None


def test_kruskal_wallis_guard_trips(spark):
    from revtron_utils_spark.operators.profile import kruskal_wallis

    df = spark.range(3000).select(
        F.col("id").alias("v"), (F.col("id") % 2).alias("g")
    )
    with pytest.raises(Exception, match="kruskal_wallis"):
        kruskal_wallis(df, "v", "g", max_buckets=100).collect()


# ------------------------------------------------------------ anova_oneway


def test_anova_hand_checked(spark):
    """a={1,2,3}, b={4,5,6}: SSB=13.5, SSW=4, F=13.5, η²=13.5/17.5."""
    from revtron_utils_spark.operators.profile import anova_oneway

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 6
    assert abs(r["f_stat"] - 13.5) < 1e-9
    assert abs(r["eta_sq"] - round(13.5 / 17.5, 6)) < 1e-9


def test_anova_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        anova_oneway,
        anova_oneway_oracle_sql,
    )

    rows = [((i * 37) % 101, "g" + str(i % 5)) for i in range(400)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = tuple(anova_oneway(df, "v", "g").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        anova_oneway_oracle_sql("SELECT * FROM t", "v", "g")
    ).fetchone()
    assert got == want


def test_anova_single_group_null(spark):
    from revtron_utils_spark.operators.profile import anova_oneway

    df = spark.createDataFrame([(1, "a"), (2, "a")], "v long, g string")
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r["f_stat"] is None and r["eta_sq"] is None


def test_anova_width_guard_trips(spark):
    """The Σv² width guard MEASURES max|v| (house rule) and fails fast
    before a silent non-ANSI DECIMAL overflow diverges from HUGEINT."""
    from revtron_utils_spark.operators.profile import anova_oneway

    big = 9_000_000_000_000_000_000  # near int64 max: 2·big² ≥ 10³⁸
    df = spark.createDataFrame(
        [(big, "a"), (big, "b")], "v long, g string"
    )
    with pytest.raises(ValueError, match="overflow"):
        anova_oneway(df, "v", "g")


# ---------------------------------------------------------- brown_forsythe


def test_brown_forsythe_hand_checked(spark):
    """a={1,2,3,10} (med 2.5 → d2={3,1,1,15}), b={1,1,1,5} (med 1 →
    d2={0,0,0,8}): SSB=18, SSW=184, F=18/(184/6)=108/184."""
    from revtron_utils_spark.operators.profile import brown_forsythe

    rows = [(1, "a"), (2, "a"), (3, "a"), (10, "a"),
            (1, "b"), (1, "b"), (1, "b"), (5, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = brown_forsythe(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["n"] == 8
    assert abs(r["f_stat"] - round(108.0 / 184.0, 6)) < 1e-9


def test_brown_forsythe_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        brown_forsythe,
        brown_forsythe_oracle_sql,
    )

    rows = [((i * 13) % 23, "g" + str(i % 4)) for i in range(600)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = tuple(brown_forsythe(df, "v", "g").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        brown_forsythe_oracle_sql("SELECT * FROM t", "v", "g")
    ).fetchone()
    assert got == want


def test_brown_forsythe_equal_variance_small_f(spark):
    """Two identical-shape groups: every deviation matches, SSB=0,
    F=0 — the null case reads as 'no variance difference'."""
    from revtron_utils_spark.operators.profile import brown_forsythe

    rows = [(v, g) for g in ("a", "b") for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = brown_forsythe(df, "v", "g").collect()[0]
    assert r["f_stat"] == 0.0


# -------------------------------------------------------------- kendall_tau


def test_kendall_tau_perfect_concordance(spark):
    from revtron_utils_spark.operators.profile import kendall_tau

    df = spark.createDataFrame([(i, i) for i in range(5)], "x long, y long")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["concordant"] == 10 and r["discordant"] == 0
    assert r["tau_b"] == 1.0


def test_kendall_tau_perfect_discordance(spark):
    from revtron_utils_spark.operators.profile import kendall_tau

    df = spark.createDataFrame([(i, 10 - i) for i in range(5)], "x long, y long")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["tau_b"] == -1.0


def test_kendall_tau_ties_hand_checked(spark):
    """x=[1,1,2,2], y=[1,2,1,2]: one concordant, one discordant pair
    across the x groups → τ_b = 0."""
    from revtron_utils_spark.operators.profile import kendall_tau

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], "x long, y long"
    )
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["concordant"] == 1 and r["discordant"] == 1
    assert r["tau_b"] == 0.0


def test_kendall_tau_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        kendall_tau,
        kendall_tau_oracle_sql,
    )

    rows = [((i * 7) % 12, (i * i) % 9) for i in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = tuple(kendall_tau(df, "x", "y").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        kendall_tau_oracle_sql("SELECT * FROM t", "x", "y")
    ).fetchone()
    assert got == want


def test_kendall_tau_guard_trips(spark):
    from revtron_utils_spark.operators.profile import kendall_tau

    df = spark.range(5000).select(
        F.col("id").alias("x"), (F.col("id") % 3).alias("y")
    )
    with pytest.raises(Exception, match="kendall_tau"):
        kendall_tau(df, "x", "y", max_x_buckets=100).collect()


def test_kendall_tau_degenerate_all_tied_x(spark):
    """Every x identical: no x-ordered pairs at all, τ_b is NULL (the
    n0−n1 factor is 0), not a division error."""
    from revtron_utils_spark.operators.profile import kendall_tau

    df = spark.createDataFrame([(1, i) for i in range(4)], "x long, y long")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["concordant"] == 0 and r["discordant"] == 0
    assert r["tau_b"] is None
