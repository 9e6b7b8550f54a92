"""Round-11 fifth wave: hhi_concentration and lorenz_curve."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_hhi_extremes(spark):
    from revtron_utils_spark.operators.profile import hhi_concentration

    # monopoly: one key holds everything → HHI 1, n_eff 1
    mono = spark.createDataFrame([("k1",)] * 50, "k string")
    r = hhi_concentration(mono, ["k"]).collect()[0]
    assert r["hhi"] == 1.0 and r["n_effective"] == 1.0
    # perfectly even 4 keys → HHI 0.25, n_eff 4
    even = spark.createDataFrame([(f"k{i % 4}",) for i in range(80)], "k string")
    r = hhi_concentration(even, ["k"]).collect()[0]
    assert r["hhi"] == 0.25 and r["n_effective"] == 4.0


def test_hhi_matches_oracle_grouped(spark):
    from revtron_utils_spark.operators.profile import (
        hhi_concentration,
        hhi_concentration_oracle_sql,
    )

    rows = [(f"s{i % 2}", f"k{(i * i) % 7}") for i in range(300)]
    df = spark.createDataFrame(rows, "seg string, k string")
    got = [tuple(r) for r in hhi_concentration(df, ["k"], by=["seg"]).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (seg VARCHAR, k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        hhi_concentration_oracle_sql("t", ["k"], by=["seg"])
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_lorenz_hand_checked(spark):
    """10 keys with counts 1..10 (total 55), 5 bands of 2 keys each:
    cum shares 3/55, 10/55, 21/55, 36/55, 55/55."""
    from revtron_utils_spark.operators.profile import lorenz_curve

    rows = [(f"k{i:02d}",) for i in range(1, 11) for _ in range(0)]
    data = []
    for i in range(1, 11):
        data += [(f"k{i:02d}",)] * i
    df = spark.createDataFrame(data, "k string")
    out = lorenz_curve(df, ["k"], n_bands=5).collect()
    shares = [r["cum_share"] for r in out]
    want = [round(s / 55, 6) for s in (3, 10, 21, 36, 55)]
    assert shares == want
    assert [r["n_keys_cum"] for r in out] == [2, 4, 6, 8, 10]
    assert out[-1]["cum_share"] == 1.0


def test_lorenz_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        lorenz_curve,
        lorenz_curve_oracle_sql,
    )

    rows = [(f"k{(i * i + i) % 37}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    got = [tuple(r) for r in lorenz_curve(df, ["k"], n_bands=10).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(lorenz_curve_oracle_sql("t", ["k"], n_bands=10)).fetchall()
    assert got == [tuple(w) for w in want]


def test_lorenz_band_ceil_no_negated_div(spark):
    """n_keys not divisible by n_bands: band edges must follow the
    positive integer ceil (the negated-div identity would disagree
    between engines). 7 keys, 3 bands → band sizes 3/2/2 by
    ceil(3i/7): i=1,2→1? ceil(3/7)=1, ceil(6/7)=1, ceil(9/7)=2 …"""
    import math

    from revtron_utils_spark.operators.profile import lorenz_curve

    data = []
    for i in range(1, 8):
        data += [(f"k{i}",)] * i
    df = spark.createDataFrame(data, "k string")
    out = lorenz_curve(df, ["k"], n_bands=3).collect()
    want_bands = {}
    for i in range(1, 8):
        b = math.ceil(3 * i / 7)
        want_bands[b] = want_bands.get(b, 0) + 1
    got_sizes = {}
    prev = 0
    for r in out:
        got_sizes[r["band"]] = r["n_keys_cum"] - prev
        prev = r["n_keys_cum"]
    assert got_sizes == want_bands
