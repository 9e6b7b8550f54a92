"""Round-10 second stats wave: Friedman (within-block doubled
midranks), Cochran's Q (all-integer), Durbin-Watson residual serial
correlation, and Cohen's d / Hedges g effect sizes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- friedman_test


def test_friedman_hand_checked(spark):
    """3 blocks × 3 treatments, no ties, treatment ranks identical in
    every block (t3 > t2 > t1): the classic maximal-disagreement case —
    R_j = {3, 6, 9} doubled {6,12,18}, Q = 2·Σ(R2_j−12)²/(ΣR2²−3·3·16)
    = 2·72/(504−432) = 2·72/72... = textbook Q = 6."""
    from revtron_utils_spark.operators.profile import friedman_test

    rows = [
        (b, t, v)
        for b in range(3)
        for t, v in (("t1", 10), ("t2", 20), ("t3", 30))
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, v long")
    r = friedman_test(df, "blk", "trt", "v").collect()[0]
    assert r["k"] == 3 and r["n_blocks"] == 3 and r["n_dropped"] == 0
    # exact: ranks 1,2,3 per block -> Q = 12/(nk(k+1)) ΣR² - 3n(k+1) = 6
    assert abs(r["q"] - 6.0) < 1e-9


def test_friedman_no_signal_zero(spark):
    """Value depends only on the block (all treatments tied within
    every block): every within-block rank is the same midrank → Q
    NULL (all-tied denominator 0)."""
    from revtron_utils_spark.operators.profile import friedman_test

    rows = [(b, t, b * 7) for b in range(4) for t in ("t1", "t2", "t3")]
    df = spark.createDataFrame(rows, "blk long, trt string, v long")
    r = friedman_test(df, "blk", "trt", "v").collect()[0]
    assert r["q"] is None


def test_friedman_drops_incomplete_blocks(spark):
    from revtron_utils_spark.operators.profile import friedman_test

    rows = [
        (b, t, v)
        for b in range(3)
        for t, v in (("t1", 10), ("t2", 20), ("t3", 30))
    ]
    rows += [(99, "t1", 5)]  # incomplete block
    df = spark.createDataFrame(rows, "blk long, trt string, v long")
    r = friedman_test(df, "blk", "trt", "v").collect()[0]
    assert r["n_blocks"] == 3 and r["n_dropped"] == 1
    assert abs(r["q"] - 6.0) < 1e-9


def test_friedman_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        friedman_test,
        friedman_test_oracle_sql,
    )

    rows = [
        (b, "t" + str(t), ((b * 7 + t * 13) % 9) + (1 if b % 10 else 0))
        for b in range(80)
        for t in range(4)
        if not (b % 13 == 0 and t == 1)
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, v long")
    got = tuple(friedman_test(df, "blk", "trt", "v").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (blk BIGINT, trt VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        friedman_test_oracle_sql("SELECT * FROM t", "blk", "trt", "v")
    ).fetchone()
    assert got == want


# ----------------------------------------------------------------- cochran_q


def test_cochran_q_hand_checked(spark):
    """Textbook 2-treatment case reduces to McNemar's chi-square
    without correction: discordant pairs b=3, c=1 → Q = (3−1)²/(3+1)
    = 1."""
    from revtron_utils_spark.operators.profile import cochran_q

    # items: 2 both-fire, 3 only-A, 1 only-B, 2 neither
    rows = []
    for i, (a, b) in enumerate(
        [(1, 1), (1, 1), (1, 0), (1, 0), (1, 0), (0, 1), (0, 0), (0, 0)]
    ):
        rows += [(i, "A", a), (i, "B", b)]
    df = spark.createDataFrame(rows, "item long, det string, fired int")
    r = cochran_q(df, "item", "det", "fired").collect()[0]
    assert r["k"] == 2 and r["n_items"] == 8
    assert abs(r["q"] - 1.0) < 1e-9


def test_cochran_q_all_agree_null(spark):
    """Every item fires on all or none: denominator 0 → NULL."""
    from revtron_utils_spark.operators.profile import cochran_q

    rows = []
    for i in range(4):
        f = 1 if i % 2 == 0 else 0
        rows += [(i, "A", f), (i, "B", f), (i, "C", f)]
    df = spark.createDataFrame(rows, "item long, det string, fired int")
    assert cochran_q(df, "item", "det", "fired").collect()[0]["q"] is None


def test_cochran_q_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        cochran_q,
        cochran_q_oracle_sql,
    )

    rows = [
        (i, "d" + str(j), 1 if (i * (j + 3)) % (j + 2) == 0 else 0)
        for i in range(200)
        for j in range(3)
        if not (i % 17 == 0 and j == 2)
    ]
    df = spark.createDataFrame(rows, "item long, det string, fired int")
    got = tuple(cochran_q(df, "item", "det", "fired").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (item BIGINT, det VARCHAR, fired INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        cochran_q_oracle_sql("SELECT * FROM t", "item", "det", "fired")
    ).fetchone()
    assert got == want


# -------------------------------------------------------------- durbin_watson


def test_durbin_watson_alternating_residuals_near_4(spark):
    """y alternates around a flat line: adjacent residuals flip sign
    every step → DW near 4 (strong negative serial correlation)."""
    from revtron_utils_spark.operators.timeseries import durbin_watson

    rows = [("g", t, t, 100 + (5 if t % 2 == 0 else -5)) for t in range(40)]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    r = durbin_watson(df, "g", "t", "x", "y").collect()[0]
    assert r["dw"] > 3.5


def test_durbin_watson_trending_residuals_near_0(spark):
    """Residuals form a slow V shape (quadratic y over linear fit):
    adjacent residuals are nearly equal → DW near 0."""
    from revtron_utils_spark.operators.timeseries import durbin_watson

    rows = [("g", t, t, t * t) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    r = durbin_watson(df, "g", "t", "x", "y").collect()[0]
    assert r["dw"] < 0.5


def test_durbin_watson_perfect_fit_null(spark):
    from revtron_utils_spark.operators.timeseries import durbin_watson

    rows = [("g", t, t, 3 * t + 7) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    assert durbin_watson(df, "g", "t", "x", "y").collect()[0]["dw"] is None


def test_durbin_watson_matches_oracle(spark):
    from revtron_utils_spark.operators.timeseries import (
        durbin_watson,
        durbin_watson_oracle_sql,
    )

    rows = [
        ("g" + str(g), t, t, ((t * 13 + g * 7) % 50) + 3 * t)
        for g in range(3)
        for t in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    got = sorted(map(tuple, durbin_watson(df, "g", "t", "x", "y").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, t BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                durbin_watson_oracle_sql("SELECT * FROM t", "g", "t", "x", "y")
            ).fetchall(),
        )
    )
    assert got == want


def test_durbin_watson_width_guard_trips(spark):
    from revtron_utils_spark.operators.timeseries import durbin_watson

    big = 10**9
    rows = [("g", t, t * big, t * big) for t in range(2000)]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    with pytest.raises(ValueError, match="overflow"):
        durbin_watson(df, "g", "t", "x", "y")


# ---------------------------------------------------------------- effect_sizes


def test_effect_sizes_hand_checked(spark):
    """treated {4,6} (mean 5, var 2), control {1,3} (mean 2, var 2):
    pooled s² = 2, d = 3/sqrt(2), g = d·(1 − 3/7)."""
    from revtron_utils_spark.operators.profile import effect_sizes

    rows = [(1, 4), (1, 6), (0, 1), (0, 3)]
    df = spark.createDataFrame(rows, "treat int, v long")
    r = effect_sizes(df, "treat", "v").collect()[0]
    import math

    d = 3.0 / math.sqrt(2.0)
    assert r["mean_diff"] == 3.0
    assert abs(r["cohens_d"] - round(d, 6)) < 1e-9
    assert abs(r["hedges_g"] - round(d * (1 - 3.0 / 7.0), 6)) < 1e-9


def test_effect_sizes_tiny_arm_null(spark):
    from revtron_utils_spark.operators.profile import effect_sizes

    rows = [(1, 4), (0, 1), (0, 3)]
    df = spark.createDataFrame(rows, "treat int, v long")
    r = effect_sizes(df, "treat", "v").collect()[0]
    assert r["mean_diff"] is not None and r["cohens_d"] is None


def test_effect_sizes_matches_oracle_grouped(spark):
    from revtron_utils_spark.operators.profile import (
        effect_sizes,
        effect_sizes_oracle_sql,
    )

    rows = [
        ("s" + str(i % 4), (i * 7) % 3 % 2, ((i * 13) % 97) + 5)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "seg string, treat int, v long")
    got = [tuple(r) for r in effect_sizes(df, "treat", "v", by=["seg"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (seg VARCHAR, treat INTEGER, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        effect_sizes_oracle_sql("SELECT * FROM t", "treat", "v", by=["seg"])
    ).fetchall()
    assert got == want


def test_friedman_no_complete_blocks_single_row(spark):
    """Zero complete blocks must yield the one-row NULL summary, not an
    empty frame."""
    from revtron_utils_spark.operators.profile import friedman_test

    rows = [(1, "t1", 5), (2, "t2", 6)]  # k=2, no block has both
    df = spark.createDataFrame(rows, "blk long, trt string, v long")
    r = friedman_test(df, "blk", "trt", "v").collect()
    assert len(r) == 1
    assert r[0]["n_blocks"] == 0 and r[0]["n_dropped"] == 2 and r[0]["q"] is None
