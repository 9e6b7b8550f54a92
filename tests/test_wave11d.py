"""Round-11 fourth wave: sample_size_power (experiment planning) and
the dataset_card composition gate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_power_hand_checked(spark):
    """Values 90..110 step 1 (n=21): mean 100, var = Σ(x−100)²/20 =
    770/20 = 38.5. At MDE 2% → δ=2, zsum=2.8016...:
    n = 2·38.5·zsum²/4 = 19.25·zsum² → ceil."""
    import math

    from revtron_utils_spark.operators.profile import sample_size_power

    rows = [(v,) for v in range(90, 111)]
    df = spark.createDataFrame(rows, "v long")
    r = sample_size_power(df, "v", mde_pct=2.0).collect()[0]
    assert r["mean"] == 100.0 and r["variance"] == 38.5
    zsum = 1.959963984540054 + 0.8416212335729143
    want = math.ceil(2 * 38.5 * zsum * zsum / (0.02 * 100.0) ** 2)
    assert r["n_per_arm"] == want


def test_power_degenerate_nulls(spark):
    from revtron_utils_spark.operators.profile import sample_size_power

    df = spark.createDataFrame([(5,), (5,), (5,)], "v long")
    r = sample_size_power(df, "v").collect()[0]
    assert r["variance"] == 0.0 and r["n_per_arm"] is None


def test_power_matches_oracle_grouped(spark):
    from revtron_utils_spark.operators.profile import (
        sample_size_power,
        sample_size_power_oracle_sql,
    )

    rows = [((i * 37) % 500 + 50, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = [tuple(r) for r in sample_size_power(df, "v", by=["g"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        sample_size_power_oracle_sql("SELECT g, v FROM t", "v", by=["g"])
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_dataset_card_shape_and_dup_rate(spark):
    """The card runs on the real fixture; sanity-check the invariants:
    one row, rates in [0,1], dup_rate reflects planted behavior, and
    the median is an actual document length."""
    import __spark_entry__ as m

    r = m.queries()["dataset_card"](spark, "/root/testdata/sf0.001").collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_docs"] > 0 and row["n_tokens"] > 0
    for c in ("pct_en", "dup_rate", "gopher_pass_rate"):
        assert 0.0 <= row[c] <= 1.0
    assert row["p50_chars"] > 0
