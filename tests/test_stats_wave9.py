"""Round-9 operator wave: Mann-Whitney U (tie-exact doubled midranks),
difference-in-differences, Benjamini-Hochberg FDR, sampled harmonic
centrality."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_mann_whitney_hand_checked(spark):
    """Textbook two-sample case without ties: A = {1,2,3}, B = {4,5,6}
    → R_a = 6, U_a = 0, and the z sign says A is stochastically
    smaller."""
    from revtron_utils_spark.operators.profile import mann_whitney

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = mann_whitney(df, "v", "g", "a", "b").collect()[0]
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["u_a"] == 0.0
    # exact z for U=0, n_a=n_b=3, no ties: (0-4.5)/sqrt(36*7/12)
    import math

    want = -4.5 / math.sqrt(9.0 * 7.0 / 12.0)
    assert abs(r["z"] - round(want, 6)) < 1e-9


def test_mann_whitney_ties_match_oracle(spark):
    """Tie-heavy integer spine (the doubled-midrank path) must agree
    with the DuckDB twin bit-for-bit."""
    from revtron_utils_spark.operators.profile import (
        mann_whitney,
        mann_whitney_oracle_sql,
    )

    rows = [(i % 7, "a" if i % 3 == 0 else "b") for i in range(500)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = tuple(mann_whitney(df, "v", "g", "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        mann_whitney_oracle_sql("SELECT * FROM t", "v", "g", "'a'", "'b'")
    ).fetchone()
    assert got == want


def test_mann_whitney_degenerate_all_tied(spark):
    """Every value identical → variance 0 → z NULL, U still defined."""
    from revtron_utils_spark.operators.profile import mann_whitney

    df = spark.createDataFrame(
        [(5, "a"), (5, "a"), (5, "b")], "v long, g string"
    )
    r = mann_whitney(df, "v", "g", "a", "b").collect()[0]
    assert r["z"] is None
    assert r["u_a"] == 1.0  # midranks: R_a = 2·2 = 4, U = 4 − 3 = 1


def test_did_estimate_hand_checked(spark):
    """Treated moves 10→30 (+20), control 5→15 (+10) → DID = +10."""
    from revtron_utils_spark.operators.profile import did_estimate

    rows = (
        [("t", "pre", 10)] * 4
        + [("t", "post", 30)] * 4
        + [("c", "pre", 5)] * 3
        + [("c", "post", 15)] * 3
    )
    df = spark.createDataFrame(rows, "cohort string, period string, v long")
    r = did_estimate(df, "cohort", "period", "v", "t", "c", "post", "pre").collect()[0]
    assert r["did"] == 10.0
    assert (r["n_tpost"], r["n_tpre"], r["n_cpost"], r["n_cpre"]) == (4, 4, 3, 3)


def test_did_estimate_empty_cell_nulls(spark):
    from revtron_utils_spark.operators.profile import did_estimate

    rows = [("t", "pre", 10), ("t", "post", 20), ("c", "post", 5)]
    df = spark.createDataFrame(rows, "cohort string, period string, v long")
    r = did_estimate(df, "cohort", "period", "v", "t", "c", "post", "pre").collect()[0]
    assert r["did"] is None and r["mean_cpre"] is None
    assert r["n_cpre"] == 0


def test_did_estimate_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        did_estimate,
        did_estimate_oracle_sql,
    )

    rows = [
        ("t" if i % 2 == 0 else "c", "post" if i % 3 == 0 else "pre", (i * 17) % 101)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "cohort string, period string, v long")
    got = tuple(
        did_estimate(df, "cohort", "period", "v", "t", "c", "post", "pre")
        .collect()[0]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE u (cohort VARCHAR, period VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO u VALUES (?, ?, ?)", rows)
    want = con.execute(
        did_estimate_oracle_sql(
            "SELECT * FROM u", "cohort", "period", "v",
            "'t'", "'c'", "'post'", "'pre'",
        )
    ).fetchone()
    assert got == want


def test_bh_fdr_textbook_stepup(spark):
    """Classic step-up property: p = (.01, .02, .03, .04, .2), α=.05,
    m=5 → thresholds (.01, .02, .03, .04, .05): ranks 1-4 all pass
    their own line → first 4 rejected, the .2 survivor not."""
    from revtron_utils_spark.operators.profile import bh_fdr

    rows = [("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.04), ("t5", 0.2)]
    df = spark.createDataFrame(rows, "test string, p double")
    out = {r["test"]: r for r in bh_fdr(df, "test", "p", alpha=0.05).collect()}
    assert [out[f"t{i}"]["rejected"] for i in range(1, 6)] == [
        True, True, True, True, False,
    ]


def test_bh_fdr_stepup_rescues_middle_rank(spark):
    """The defining BH behavior: a rank that fails its own line is
    still rejected when a LATER rank passes (k* is a max, not a
    prefix). p = (.01, .049, .05) at α=.05: rank 2's line is .0333
    (fail) but rank 3 passes (.05 ≤ .05) → ALL THREE rejected."""
    from revtron_utils_spark.operators.profile import bh_fdr

    rows = [("a", 0.01), ("b", 0.049), ("c", 0.05)]
    df = spark.createDataFrame(rows, "test string, p double")
    out = {r["test"]: r["rejected"] for r in bh_fdr(df, "test", "p").collect()}
    assert out == {"a": True, "b": True, "c": True}


def test_bh_fdr_nulls_and_oracle(spark):
    from revtron_utils_spark.operators.profile import bh_fdr, bh_fdr_oracle_sql

    rows = [(f"t{i}", ((i * 37) % 100) / 100.0 if i % 7 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "test string, p double")
    got = sorted(map(tuple, bh_fdr(df, "test", "p", alpha=0.1).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE f (test VARCHAR, p DOUBLE)")
    con.executemany("INSERT INTO f VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            bh_fdr_oracle_sql("SELECT * FROM f", "test", "p", alpha=0.1)
        ).fetchall()
    )
    assert got == want
    nulls = [g for g in got if g[1] is None]
    assert nulls and all(g[4] is False for g in nulls)


def test_harmonic_centrality_star(spark):
    """Star graph (hub 0 — leaves 1..6), all 7 nodes sampled: the hub
    is 1 hop from every leaf (h12 = 6·12), each leaf is 1 hop from the
    hub + 2 hops from the 5 other leaves (12 + 5·6 = 42)."""
    from revtron_utils_spark.operators.graph import harmonic_centrality_sampled

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "src long, dst long"
    )
    r = {
        row["node"]: row
        for row in harmonic_centrality_sampled(
            edges, n_sources=7, radius=3
        ).collect()
    }
    assert r[0]["h12"] == 72 and r[0]["reached"] == 7
    for leaf in range(1, 7):
        assert r[leaf]["h12"] == 42, leaf
        assert r[leaf]["reached"] == 7


def test_harmonic_centrality_matches_oracle(spark):
    from revtron_utils_spark.operators.graph import (
        harmonic_centrality_sampled,
        harmonic_centrality_sampled_oracle_sql,
    )

    edges = [(i, (i * 7 + 3) % 40) for i in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        map(tuple, harmonic_centrality_sampled(df, n_sources=8, radius=3).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE g (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.execute(
            harmonic_centrality_sampled_oracle_sql(
                "SELECT src, dst FROM g", n_sources=8, radius=3
            )
        ).fetchall()
    )
    assert got == want


def test_harmonic_centrality_radius_bound(spark):
    from revtron_utils_spark.operators.graph import harmonic_centrality_sampled

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="radius"):
        harmonic_centrality_sampled(df, radius=5)
