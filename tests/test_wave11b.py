"""Round-11 second wave: tukey_hsd, dunn_test (post-hoc contrasts),
iv_wald, srm_check (experiment integrity), mrr_at_k (first-hit ranking).
Hand-checked values + DuckDB differentials + structural invariants
(anti-symmetry, balanced-split χ²=0, perfect/none MRR extremes)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- tukey_hsd


def test_tukey_hand_checked(spark):
    """a={1,2,3}, b={4,5,6}: x̄ diff = −3, SSW = 2+2 = 4, s²w = 4/4 = 1,
    q = −3 / sqrt(0.5·(1/3+1/3)) = −3/sqrt(1/3) = −5.196152."""
    from revtron_utils_spark.operators.profile import tukey_hsd

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = tukey_hsd(df, "v", "g").collect()
    assert len(r) == 1
    assert r[0]["mean_diff"] == -3.0
    assert abs(r[0]["q_stat"] - round(-3 / (1 / 3) ** 0.5, 6)) < 1e-9


def test_tukey_pair_count_and_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        tukey_hsd,
        tukey_hsd_oracle_sql,
    )

    rows = [((i * 17) % 50 + (i % 4) * 3, f"g{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = [tuple(r) for r in tukey_hsd(df, "v", "g").collect()]
    assert len(got) == 6  # C(4,2)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        tukey_hsd_oracle_sql("SELECT g, v FROM t", "v", "g")
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_tukey_zero_within_variance_null(spark):
    from revtron_utils_spark.operators.profile import tukey_hsd

    rows = [(5, "a"), (5, "a"), (9, "b"), (9, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = tukey_hsd(df, "v", "g").collect()[0]
    assert r["mean_diff"] == -4.0 and r["q_stat"] is None


# --------------------------------------------------------------- dunn_test


def test_dunn_antisymmetry_and_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        dunn_test,
        dunn_test_oracle_sql,
    )

    rows = [((i * 13) % 20, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "bucket long, g string")
    got = [tuple(r) for r in dunn_test(df, "bucket", "g").collect()]
    assert len(got) == 3
    con = duckdb.connect()
    con.execute("CREATE TABLE t (bucket BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        dunn_test_oracle_sql("SELECT * FROM t", "bucket", "g")
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_dunn_shifted_group_sign(spark):
    """Group b strictly above group a → positive mean-rank difference
    for (a, b)? No: R̄_a < R̄_b so diff (a−b) is NEGATIVE; z < −5 at
    n=40/40 with no ties inside the shift."""
    from revtron_utils_spark.operators.profile import dunn_test

    rows = [(i % 10, "a") for i in range(40)] + [
        (100 + i % 10, "b") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "bucket long, g string")
    r = dunn_test(df, "bucket", "g").collect()[0]
    assert r["mean_rank_diff"] == -40.0
    assert r["z"] < -5


def test_dunn_all_tied_null(spark):
    from revtron_utils_spark.operators.profile import dunn_test

    rows = [(7, "a"), (7, "a"), (7, "b"), (7, "b")]
    df = spark.createDataFrame(rows, "bucket long, g string")
    r = dunn_test(df, "bucket", "g").collect()[0]
    assert r["z"] is None


# ----------------------------------------------------------------- iv_wald


def test_iv_wald_hand_checked(spark):
    """z=1: y mean 10, x mean 0.5; z=0: y mean 4, x mean 0.25 →
    itt = 6, first_stage = 0.25, β = 24."""
    from revtron_utils_spark.operators.profile import iv_wald

    rows = [
        (1, 1, 12), (1, 0, 8),     # z=1: x means .5, y mean 10
        (0, 1, 7), (0, 0, 3), (0, 0, 3), (0, 0, 3),  # z=0: x .25, y 4
    ]
    df = spark.createDataFrame(rows, "z int, x long, y long")
    r = iv_wald(df, "y", "x", "z").collect()[0]
    assert r["itt"] == 6.0 and r["first_stage"] == 0.25 and r["beta_iv"] == 24.0


def test_iv_wald_zero_first_stage_null(spark):
    from revtron_utils_spark.operators.profile import iv_wald

    rows = [(1, 1, 10), (1, 1, 12), (0, 1, 5), (0, 1, 7)]
    df = spark.createDataFrame(rows, "z int, x long, y long")
    r = iv_wald(df, "y", "x", "z").collect()[0]
    assert r["first_stage"] == 0.0 and r["beta_iv"] is None


def test_iv_wald_matches_oracle_grouped(spark):
    from revtron_utils_spark.operators.profile import (
        iv_wald,
        iv_wald_oracle_sql,
    )

    rows = [
        (f"s{i % 3}", i % 2, (i * 7) % 2, (i * 13) % 97)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "seg string, z int, x long, y long")
    got = [tuple(r) for r in iv_wald(df, "y", "x", "z", by=["seg"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (seg VARCHAR, z INTEGER, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = con.execute(
        iv_wald_oracle_sql("SELECT * FROM t", "y", "x", "z", by=["seg"])
    ).fetchall()
    assert got == [tuple(w) for w in want]


# --------------------------------------------------------------- srm_check


def test_srm_balanced_is_zero(spark):
    from revtron_utils_spark.operators.profile import srm_check

    rows = [(i % 4,) for i in range(400)]
    df = spark.createDataFrame(rows, "arm long")
    r = srm_check(df, "arm").collect()[0]
    assert r["k"] == 4 and r["n"] == 400 and r["chi2"] == 0.0


def test_srm_hand_checked_and_oracle(spark):
    """arms (60, 40): χ² = (2·(3600+1600) − 100²)/100 = 4.0."""
    from revtron_utils_spark.operators.profile import (
        srm_check,
        srm_check_oracle_sql,
    )

    rows = [(0,)] * 60 + [(1,)] * 40
    df = spark.createDataFrame(rows, "arm long")
    r = srm_check(df, "arm").collect()[0]
    assert r["chi2"] == 4.0 and r["max_arm"] == 60 and r["min_arm"] == 40
    con = duckdb.connect()
    con.execute("CREATE TABLE t (arm BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(srm_check_oracle_sql("SELECT * FROM t", "arm")).fetchone()
    assert tuple(r) == tuple(want)


# ---------------------------------------------------------------- mrr_at_k


def test_mrr_extremes(spark):
    """q1: relevant at rank 1 → rr 1; q2: relevant at rank 3 → 1/3;
    q3: none in top-k → 0. MRR = (1 + 1/3 + 0)/3."""
    from revtron_utils_spark.operators.evaluation import mrr_at_k

    rows = [
        ("q1", 1, 100, True), ("q1", 2, 90, False),
        ("q2", 1, 100, False), ("q2", 2, 90, False), ("q2", 3, 80, True),
        ("q3", 1, 100, False), ("q3", 2, 90, False),
    ]
    df = spark.createDataFrame(rows, "q string, id long, score long, rel boolean")
    r = mrr_at_k(df, "q", "id", "score", "rel", k=10).collect()[0]
    assert r["n_queries"] == 3 and r["n_hit"] == 2
    assert abs(r["mrr"] - round((1 + 1 / 3) / 3, 6)) < 1e-9


def test_mrr_k_cutoff(spark):
    """A relevant doc at rank k+1 must not count."""
    from revtron_utils_spark.operators.evaluation import mrr_at_k

    rows = [("q", i, 100 - i, i == 4) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "q string, id long, score long, rel boolean")
    r = mrr_at_k(df, "q", "id", "score", "rel", k=3).collect()[0]
    assert r["n_hit"] == 0 and r["mrr"] == 0.0


def test_mrr_matches_oracle(spark):
    from revtron_utils_spark.operators.evaluation import (
        mrr_at_k,
        mrr_at_k_oracle_sql,
    )

    rows = [
        (f"q{i % 7}", i, (i * 31) % 100, (i * 13) % 5 == 0)
        for i in range(250)
    ]
    df = spark.createDataFrame(rows, "q string, id long, score long, rel boolean")
    got = tuple(mrr_at_k(df, "q", "id", "score", "rel", k=10).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q VARCHAR, id BIGINT, score BIGINT, rel BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = con.execute(
        mrr_at_k_oracle_sql("SELECT * FROM t", "q", "id", "score", "rel", k=10)
    ).fetchone()
    assert got == tuple(want)
