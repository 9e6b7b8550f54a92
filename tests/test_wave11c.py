"""Round-11 third wave: ffill_series (calendar densify + carry-forward)
and ols_two_factor (two-regressor OLS via pinned Cramer determinants)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- ffill_series


def test_ffill_fills_gaps_and_leading_nulls(spark):
    from revtron_utils_spark.operators.timeseries import ffill_series

    rows = [("a", 3, 30), ("a", 1, 10), ("a", 6, 60), ("b", 5, 50)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {
        (r["g"], r["t"]): (r["v"], r["filled"], r["is_observed"])
        for r in ffill_series(df, "g", "t", "v").collect()
    }
    # a spans 1..6: observed 1,3,6; 2 carries 10; 4,5 carry 30
    assert len([k for k in out if k[0] == "a"]) == 6
    assert out[("a", 2)] == (None, 10, False)
    assert out[("a", 4)] == (None, 30, False)
    assert out[("a", 5)] == (None, 30, False)
    assert out[("a", 6)] == (60, 60, True)
    # b is a single point — exactly one row, no padding outside its range
    assert [k for k in out if k[0] == "b"] == [("b", 5)]


def test_ffill_rejects_duplicate_buckets(spark):
    from revtron_utils_spark.operators.timeseries import ffill_series

    rows = [("a", 1, 10), ("a", 1, 20)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    with pytest.raises(ValueError, match="duplicate"):
        ffill_series(df, "g", "t", "v")


def test_ffill_matches_oracle(spark):
    from revtron_utils_spark.operators.timeseries import (
        ffill_series,
        ffill_series_oracle_sql,
    )

    rows = [
        (f"g{i % 3}", (i * 7) % 40, i * 11)
        for i in range(60)
    ]
    # dedupe (group, time) for validity
    seen = set()
    rows = [r for r in rows if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = sorted(
        tuple(r) for r in ffill_series(df, "g", "t", "v").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(w)
        for w in con.execute(
            ffill_series_oracle_sql("SELECT * FROM t", "g", "t", "v")
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------- ols_two_factor


def test_ols_two_factor_recovers_planted_coefficients(spark):
    """y = 7 + 3·x1 − 2·x2 exactly → β = (7, 3, −2) with zero residual."""
    from revtron_utils_spark.operators.profile import ols_two_factor

    rows = [
        (x1, x2, 7 + 3 * x1 - 2 * x2)
        for x1 in range(10)
        for x2 in range(7)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    r = ols_two_factor(df, "y", "x1", "x2").collect()[0]
    assert (r["b0"], r["b1"], r["b2"]) == (7.0, 3.0, -2.0)


def test_ols_two_factor_collinear_is_null(spark):
    from revtron_utils_spark.operators.profile import ols_two_factor

    rows = [(i, 2 * i, 5 * i + 1) for i in range(20)]  # x2 = 2·x1
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    r = ols_two_factor(df, "y", "x1", "x2").collect()[0]
    assert r["b0"] is None and r["b1"] is None and r["b2"] is None


def test_ols_two_factor_matches_oracle_grouped(spark):
    from revtron_utils_spark.operators.profile import (
        ols_two_factor,
        ols_two_factor_oracle_sql,
    )

    rows = [
        (f"g{i % 2}", (i * 7) % 23, (i * 13) % 17, (i * 31) % 101)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, x1 long, x2 long, y long")
    got = [
        tuple(r)
        for r in ols_two_factor(df, "y", "x1", "x2", by=["g"]).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x1 BIGINT, x2 BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = con.execute(
        ols_two_factor_oracle_sql("SELECT * FROM t", "y", "x1", "x2", by=["g"])
    ).fetchall()
    assert got == [tuple(w) for w in want]
