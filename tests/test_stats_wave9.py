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


def test_loo_influence_hand_checked(spark):
    """Groups {a: 10,10}, {b: 40}: global mean 20; dropping b → 10, so
    b's influence is +10; dropping a → 40, influence −20."""
    from revtron_utils_spark.operators.profile import loo_group_influence

    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("b", 40)], "g string, v long"
    )
    r = {x["group"]: x for x in loo_group_influence(df, "g", "v").collect()}
    assert r["b"]["influence"] == 10.0 and r["b"]["loo_mean"] == 10.0
    assert r["a"]["influence"] == -20.0
    # single-group corpus: loo undefined
    one = spark.createDataFrame([("x", 5)], "g string, v long")
    row = loo_group_influence(one, "g", "v").collect()[0]
    assert row["loo_mean"] is None and row["influence"] is None


def test_loo_influence_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        loo_group_influence,
        loo_group_influence_oracle_sql,
    )

    rows = [(f"g{i % 7}", (i * 13) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = sorted(map(tuple, loo_group_influence(df, "g", "v").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE u (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO u VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            loo_group_influence_oracle_sql("SELECT * FROM u", "g", "v")
        ).fetchall()
    )
    assert got == want


def test_clustering_coefficient_triangle_plus_tail(spark):
    """Triangle 1-2-3 with a pendant 4 off node 1: nodes 2,3 have
    cc = 1 (their only pair of neighbors is connected), node 1 has
    deg 3 and 1 triangle → cc = 2·1/(3·2) = 1/3, node 4 deg 1 → NULL."""
    from revtron_utils_spark.operators.graph import clustering_coefficient

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    r = {x["node"]: x for x in clustering_coefficient(edges).collect()}
    assert r[2]["cc"] == 1.0 and r[3]["cc"] == 1.0
    assert r[1]["cc"] == round(1 / 3, 6) and r[1]["triangles"] == 1
    assert r[4]["cc"] is None and r[4]["degree"] == 1


def test_clustering_coefficient_matches_oracle(spark):
    from revtron_utils_spark.operators.graph import (
        clustering_coefficient,
        clustering_coefficient_oracle_sql,
    )

    edges = [(i, (i * 5 + 2) % 30) for i in range(90)] + [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(map(tuple, clustering_coefficient(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE g (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.execute(
            clustering_coefficient_oracle_sql("SELECT src, dst FROM g")
        ).fetchall()
    )
    assert got == want


def test_propensity_strata_hand_checked(spark):
    """Two balanced strata with +10 and +20 arm gaps, equal sizes →
    effect 15; a third one-armed stratum is excluded and shows up in
    coverage only."""
    from revtron_utils_spark.operators.profile import propensity_strata_effect

    rows = (
        [(0, 1, 20), (0, 1, 20), (0, 0, 10), (0, 0, 10)]
        + [(1, 1, 50), (1, 1, 50), (1, 0, 30), (1, 0, 30)]
        + [(2, 1, 99), (2, 1, 99)]
    )
    df = spark.createDataFrame(rows, "stratum long, treat int, v long")
    r = propensity_strata_effect(df, "stratum", "treat", "v").collect()[0]
    assert r["att_effect"] == 15.0
    assert r["n_strata_valid"] == 2
    assert r["n_total"] == 10 and r["n_valid"] == 8
    assert r["coverage"] == 0.8


def test_propensity_strata_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        propensity_strata_effect,
        propensity_strata_effect_oracle_sql,
    )

    rows = [
        ((i * 3) % 11, 1 if i % 2 else 0, (i * 17) % 100) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "stratum long, treat int, v long")
    got = tuple(propensity_strata_effect(df, "stratum", "treat", "v").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE u (stratum BIGINT, treat INTEGER, v BIGINT)")
    con.executemany("INSERT INTO u VALUES (?, ?, ?)", rows)
    want = con.execute(
        propensity_strata_effect_oracle_sql(
            "SELECT * FROM u", "stratum", "treat", "v"
        )
    ).fetchone()
    assert got == want


def test_ece_perfect_and_worst_calibration(spark):
    """Scores at a bin midpoint with a matching positive rate → ECE 0;
    the same scores with inverted labels → ECE = |rate − midpoint|."""
    from revtron_utils_spark.operators.evaluation import (
        expected_calibration_error,
    )

    # num/den = 0.55 of the [0, 1] range → bin 5 of 10 (midpoint 0.55)
    # on a score_min=0, score_max=0 ... use the integer-rational shape:
    # score range [0, 9], num/den = 5 → bin floor((5-0)*10/10)=5
    rows = [(5, 1, i < 11) for i in range(20)]  # 11/20 = 0.55 positives
    df = spark.createDataFrame(rows, "num long, den long, y boolean")
    r = expected_calibration_error(
        df, "num", "den", "y", score_min=0, score_max=9
    ).collect()[0]
    assert r["ece"] == 0.0 and r["n_bins_hit"] == 1
    inv = spark.createDataFrame(
        [(5, 1, i < 1) for i in range(20)], "num long, den long, y boolean"
    )
    r2 = expected_calibration_error(
        inv, "num", "den", "y", score_min=0, score_max=9
    ).collect()[0]
    assert r2["ece"] == 0.5  # |0.05 − 0.55|


def test_ece_matches_oracle(spark):
    from revtron_utils_spark.operators.evaluation import (
        expected_calibration_error,
        expected_calibration_error_oracle_sql,
    )

    rows = [((i * 7) % 10, 1, i % 3 == 0) for i in range(300)]
    df = spark.createDataFrame(rows, "num long, den long, y boolean")
    got = tuple(
        expected_calibration_error(
            df, "num", "den", "y", score_min=0, score_max=9
        ).collect()[0]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE s (num BIGINT, den BIGINT, y BOOLEAN)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    want = con.execute(
        expected_calibration_error_oracle_sql(
            "SELECT * FROM s", "num", "den", "y", score_min=0, score_max=9
        )
    ).fetchone()
    assert got == want


def test_cochran_armitage_monotone_vs_flat(spark):
    from revtron_utils_spark.operators.profile import cochran_armitage

    # rate rises with dose: 10% / 50% / 90%
    rows = []
    for d, rate in ((0, 1), (1, 5), (2, 9)):
        rows += [(d, i < rate) for i in range(10)]
    df = spark.createDataFrame(rows, "dose long, y boolean")
    r = cochran_armitage(df, "dose", "y").collect()[0]
    assert r["z"] is not None and r["z"] > 3  # strong upward trend
    # flat rates → z near 0
    flat = spark.createDataFrame(
        [(d, i < 5) for d in range(3) for i in range(10)], "dose long, y boolean"
    )
    r2 = cochran_armitage(flat, "dose", "y").collect()[0]
    assert abs(r2["z"]) < 1e-9
    # single dose level → variance 0 → NULL
    one = spark.createDataFrame([(1, True), (1, False)], "dose long, y boolean")
    assert cochran_armitage(one, "dose", "y").collect()[0]["z"] is None


def test_cochran_armitage_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        cochran_armitage,
        cochran_armitage_oracle_sql,
    )

    rows = [((i * 3) % 6, (i * 7) % 10 < (i * 3) % 6 + 2) for i in range(400)]
    df = spark.createDataFrame(rows, "dose long, y boolean")
    got = tuple(cochran_armitage(df, "dose", "y").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE u (dose BIGINT, y BOOLEAN)")
    con.executemany("INSERT INTO u VALUES (?, ?)", rows)
    want = con.execute(
        cochran_armitage_oracle_sql("SELECT * FROM u", "dose", "y")
    ).fetchone()
    assert got == want


def test_keep_cluster_canonical_picks_best(spark):
    from revtron_utils_spark.operators.curation import keep_cluster_canonical

    rows = [
        (1, 100, 10), (2, 100, 30), (3, 100, 30),  # cluster 100: tie 2 vs 3
        (4, 200, 5),                               # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, cl long, q long")
    out = {r["cl"]: r for r in keep_cluster_canonical(df, "cl", "q", "doc_id").collect()}
    assert out[100]["doc_id"] == 2 and out[100]["n_members"] == 3  # tie → min id
    assert out[200]["doc_id"] == 4 and out[200]["n_members"] == 1


def test_page_hinkley_level_shift(spark):
    """Flat 10s then a jump to 20 at t=5: PH must alarm in the shifted
    regime and measure roughly (shift size)·(post length)·(pre share)."""
    from revtron_utils_spark.operators.timeseries import page_hinkley

    rows = [("g", t, 10 if t < 5 else 20) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    r = page_hinkley(df, "t", "v", by=["g"]).collect()[0]
    assert r["alarm_t"] == 9  # max rise accumulates to the last bucket
    assert r["ph_stat"] == 25.0  # 5 post buckets × (20 − 15)
    # no shift → PH 0 (constant series: C is flat, rise 0)
    flat = spark.createDataFrame(
        [("g", t, 7) for t in range(8)], "g string, t long, v long"
    )
    assert page_hinkley(flat, "t", "v", by=["g"]).collect()[0]["ph_stat"] == 0.0


def test_page_hinkley_matches_oracle(spark):
    from revtron_utils_spark.operators.timeseries import (
        page_hinkley,
        page_hinkley_oracle_sql,
    )

    rows = [(f"g{i % 3}", i % 12, (i * 17) % 40) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = sorted(map(tuple, page_hinkley(df, "t", "v", by=["g"]).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE s (g VARCHAR, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            page_hinkley_oracle_sql("SELECT * FROM s", "t", "v", by=["g"])
        ).fetchall()
    )
    assert got == want


def test_odds_ratio_hand_checked(spark):
    """a=20,b=10,c=5,d=15 → OR = (20·15)/(10·5) = 6; RR = (20/30)/(5/20)
    = 8/3."""
    from revtron_utils_spark.operators.profile import odds_ratio

    rows = (
        [(True, True)] * 20 + [(True, False)] * 10
        + [(False, True)] * 5 + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "e boolean, y boolean")
    r = odds_ratio(df, "e", "y").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (20, 10, 5, 15)
    assert r["odds_ratio"] == 6.0
    assert r["relative_risk"] == round(8 / 3, 6)
    # zero cell → OR/se NULL
    z = spark.createDataFrame(
        [(True, True), (False, False)], "e boolean, y boolean"
    )
    rz = odds_ratio(z, "e", "y").collect()[0]
    assert rz["odds_ratio"] is None and rz["se_ln_or"] is None


def test_odds_ratio_matches_oracle(spark):
    from revtron_utils_spark.operators.profile import (
        odds_ratio,
        odds_ratio_oracle_sql,
    )

    rows = [
        (f"s{i % 3}", i % 2 == 0, (i * 7) % 5 < 2) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "seg string, e boolean, y boolean")
    got = sorted(map(tuple, odds_ratio(df, "e", "y", by=["seg"]).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE u (seg VARCHAR, e BOOLEAN, y BOOLEAN)")
    con.executemany("INSERT INTO u VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            odds_ratio_oracle_sql("SELECT * FROM u", "e", "y", by=["seg"])
        ).fetchall()
    )
    assert got == want


def test_mann_whitney_invariances(spark):
    """Rank-test properties: (1) adding a constant to every value
    leaves U and z unchanged (ranks are shift-invariant); (2) swapping
    the two groups maps U_a → n_a·n_b − U_a and z → −z."""
    from revtron_utils_spark.operators.profile import mann_whitney

    rows = [((i * 11) % 9, "a" if i % 4 == 0 else "b") for i in range(120)]
    df = spark.createDataFrame(rows, "v long, g string")
    base = mann_whitney(df, "v", "g", "a", "b").collect()[0]
    shifted = spark.createDataFrame(
        [(v + 1000, g) for v, g in rows], "v long, g string"
    )
    sh = mann_whitney(shifted, "v", "g", "a", "b").collect()[0]
    assert (sh["u_a"], sh["z"]) == (base["u_a"], base["z"])
    sw = mann_whitney(df, "v", "g", "b", "a").collect()[0]
    assert sw["u_a"] == base["n_a"] * base["n_b"] - base["u_a"]
    assert sw["z"] == -base["z"]


def test_bh_fdr_alpha_monotone(spark):
    """BH rejections are monotone in α: everything rejected at α=0.05
    stays rejected at α=0.20."""
    from revtron_utils_spark.operators.profile import bh_fdr

    rows = [(f"t{i}", ((i * 31) % 97) / 97.0) for i in range(60)]
    df = spark.createDataFrame(rows, "test string, p double")
    r_lo = {r["test"] for r in bh_fdr(df, "test", "p", alpha=0.05).collect() if r["rejected"]}
    r_hi = {r["test"] for r in bh_fdr(df, "test", "p", alpha=0.20).collect() if r["rejected"]}
    assert r_lo <= r_hi


def test_page_hinkley_shift_invariant(spark):
    """Adding a constant to every bucket's value leaves PH unchanged
    (deviations are measured against the series' own mean)."""
    from revtron_utils_spark.operators.timeseries import page_hinkley

    rows = [("g", t, (t * 13) % 37) for t in range(24)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    base = page_hinkley(df, "t", "v", by=["g"]).collect()[0]
    shifted = spark.createDataFrame(
        [(g, t, v + 500) for g, t, v in rows], "g string, t long, v long"
    )
    sh = page_hinkley(shifted, "t", "v", by=["g"]).collect()[0]
    assert (sh["ph_stat"], sh["alarm_t"]) == (base["ph_stat"], base["alarm_t"])
