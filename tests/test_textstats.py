"""Unit tests for the round-8 operator additions: readability, RAKE
keywords, HITS, permutation test, tf-idf cosine pairs, HBOS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_readability_known_counts(spark):
    from revtron_utils_spark.operators.textstats import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The cat ran!"),
            (2, "hello"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # the/cat/sat/the/cat/ran → 1 syllable each
    assert r1["n_syllables"] == 6
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r1["flesch"] - round(expected, 4)) < 1e-9
    r2 = rows[2]
    assert r2["n_words"] == 1 and r2["n_sentences"] == 1
    # "hello" → e, o → 2 vowel groups
    assert r2["n_syllables"] == 2
    r3 = rows[3]
    assert r3["n_words"] == 0 and r3["flesch"] is None


def test_rake_scores_hand_checked(spark):
    from revtron_utils_spark.operators.textstats import rake_keywords

    # phrases: "deep learning", "deep learning", "systems"
    df = spark.createDataFrame(
        [
            (1, "deep learning is the deep learning of systems"),
        ],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, top_k=10, scale=100).collect()
    by_phrase = {r["phrase"]: r for r in rows}
    # deep: freq 2, deg 4 → score 200; learning: same → phrase 400
    dl = by_phrase["deep learning"]
    assert dl["n_occurrences"] == 2 and dl["n_words"] == 2
    assert dl["score_int"] == 400
    s = by_phrase["systems"]
    assert s["score_int"] == 100  # deg 1 / freq 1
    assert rows[0]["phrase"] == "deep learning"  # highest score first


def test_rake_punctuation_delimits(spark):
    from revtron_utils_spark.operators.textstats import rake_keywords

    df = spark.createDataFrame(
        [(1, "Fast, robust engines. fast robust engines")],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, top_k=10).collect()
    phrases = {r["phrase"] for r in rows}
    # classic RAKE: punctuation is a HARD phrase boundary — the comma
    # ends "fast", the period ends "robust engines"
    assert "robust engines" in phrases and "fast robust engines" in phrases
    assert "fast" in phrases


def test_hits_star_graph(spark):
    """One hub pointing at 3 authorities: the center must out-hub the
    leaves; the leaves must out-authority the center."""
    from revtron_utils_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (9, 1)], "src long, dst long"
    )
    r = {row["node"]: row for row in hits(edges, iterations=3).collect()}
    assert r[0]["hub_int"] > r[1]["hub_int"]
    assert r[0]["hub_int"] > r[9]["hub_int"]  # 3 targets beat 1
    assert r[1]["auth_int"] > r[2]["auth_int"]  # two pointers beat one
    assert r[1]["auth_int"] > r[0]["auth_int"]
    # L1 renormalization keeps total mass ≈ n_nodes·scale bounded
    assert all(0 <= row["hub_int"] <= 10**10 for row in r.values())


def test_hits_matches_oracle_small(spark):
    import duckdb

    from revtron_utils_spark.operators.graph import hits, hits_oracle_sql

    edges = [(i, (i * 3 + 1) % 7) for i in range(20)] + [(3, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["node"], r["hub_int"], r["auth_int"])
        for r in hits(df, iterations=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_t VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.execute(
            hits_oracle_sql("SELECT src, dst FROM edges_t", iterations=4)
        ).fetchall()
    )
    assert got == want


def test_permutation_test_null_vs_signal(spark):
    from revtron_utils_spark.operators.bootstrap import permutation_test

    # identical distributions → non-small p; disjoint → tiny p
    rows = [(i, 10 + (i % 5), "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "uid long, v long, g string")
    null_p = permutation_test(df, "uid", "v", "g", "a", "b", n_perm=99).collect()[0]
    assert null_p["p_value"] > 0.05

    rows2 = [(i, (100 if i % 2 == 0 else 10), "a" if i % 2 == 0 else "b") for i in range(200)]
    df2 = spark.createDataFrame(rows2, "uid long, v long, g string")
    sig = permutation_test(df2, "uid", "v", "g", "a", "b", n_perm=99).collect()[0]
    assert sig["p_value"] <= 0.02
    assert sig["mean_a"] == 100.0 and sig["mean_b"] == 10.0


def test_tfidf_cosine_duplicate_docs_score_one(spark):
    from revtron_utils_spark.operators.retrieval import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta"),
            (4, "alpha beta something else"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.1, df_cap=10).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs  # no shared vocabulary
    assert 0.1 <= pairs[(1, 4)] < 1.0


def test_tfidf_cosine_df_cap_drops_hot_terms(spark):
    from revtron_utils_spark.operators.retrieval import tfidf_cosine_pairs

    # "common" appears in every doc; with df_cap=2 it can't pair docs
    df = spark.createDataFrame(
        [(i, f"common word{i}") for i in range(5)],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(df, threshold=0.01, df_cap=2).collect()
    assert out == []


def test_hbos_sparse_bin_scores_highest(spark):
    from revtron_utils_spark.operators.profile import hbos_scores

    rows = [(i, 10, 10) for i in range(99)] + [(99, 500, 500)]
    df = spark.createDataFrame(rows, "uid long, x long, y long")
    out = hbos_scores(df, "uid", {"x": 50, "y": 50}, top_k=3).collect()
    assert out[0]["uid"] == 99  # the lone far point is most anomalous
    assert out[0]["score_int"] > out[1]["score_int"]


def test_hbos_negative_values_floor_bin(spark):
    from revtron_utils_spark.operators.profile import hbos_scores

    df = spark.createDataFrame(
        [(1, -1), (2, -50), (3, 1)], "uid long, x long"
    )
    rows = {r["uid"]: r["x_bin"] for r in hbos_scores(df, "uid", {"x": 50}).collect()}
    assert rows[1] == -1 and rows[2] == -1 and rows[3] == 0


def test_hbos_feature_count_bounds(spark):
    from revtron_utils_spark.operators.profile import hbos_scores

    df = spark.createDataFrame([(1, 1, 1, 1, 1)], "uid long, a long, b long, c long, d long")
    with pytest.raises(ValueError, match="1-3 features"):
        hbos_scores(df, "uid", {"a": 1, "b": 1, "c": 1, "d": 1})


def test_dawid_skene_downweights_confused_rater(spark):
    """Three reliable raters + one adversarial rater who always inverts:
    DS must recover the reliable majority on every item, and on the
    item where the adversary creates a 2-2 split against two reliable
    raters... the confusion model must side with the reliable pair."""
    from revtron_utils_spark.operators.annotation import dawid_skene

    votes = []
    # items 0..9: true label alternates x/y; raters 1-3 truthful,
    # rater 4 always inverts
    for i in range(10):
        truth = "x" if i % 2 == 0 else "y"
        inv = "y" if truth == "x" else "x"
        for r in (1, 2, 3):
            votes.append((i, r, truth))
        votes.append((i, 4, inv))
    df = spark.createDataFrame(votes, "item long, rater int, label string")
    out = {r["item"]: r for r in dawid_skene(df, "item", "rater", "label").collect()}
    for i in range(10):
        want = "x" if i % 2 == 0 else "y"
        assert out[i]["ds_label"] == want
        assert out[i]["n_raters"] == 4
        # posterior should be confident (> 0.9 of scale)
        assert out[i]["q_int"] > 9000


def test_dawid_skene_matches_oracle_small(spark):
    import duckdb

    from revtron_utils_spark.operators.annotation import (
        dawid_skene,
        dawid_skene_oracle_sql,
    )

    votes = [
        (i, r, ["a", "b", "c"][(i * r + (1 if r == 5 else 0)) % 3])
        for i in range(30)
        for r in range(1, 6)
    ]
    df = spark.createDataFrame(votes, "item long, rater int, label string")
    got = sorted(
        (r["item"], r["ds_label"], r["q_int"], r["n_raters"])
        for r in dawid_skene(df, "item", "rater", "label").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE votes_t (item BIGINT, rater INT, label VARCHAR)")
    con.executemany("INSERT INTO votes_t VALUES (?, ?, ?)", votes)
    want = sorted(
        tuple(r)
        for r in con.execute(
            dawid_skene_oracle_sql(
                "SELECT item, rater, label FROM votes_t",
                "item",
                "rater",
                "label",
            )
        ).fetchall()
    )
    assert got == want


def test_dawid_skene_panel_guard(spark):
    from revtron_utils_spark.operators.annotation import dawid_skene

    votes = [(1, r, "x") for r in range(12)]
    df = spark.createDataFrame(votes, "item long, rater int, label string")
    with pytest.raises(ValueError, match="max_raters"):
        dawid_skene(df, "item", "rater", "label")
    # lower scale widens the exact product bound
    out = dawid_skene(df, "item", "rater", "label", scale=100, max_raters=16)
    assert out.collect()[0]["ds_label"] == "x"
