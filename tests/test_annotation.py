"""Annotation / preference analytics (operators/annotation.py):
majority-vote aggregation, Cohen's kappa, Bradley-Terry MM, Wilson
intervals — unit fixtures with hand-checked values, python-model
differentials, and oracle-agreement checks (the corpus-scale value
equality is covered by the `majority_vote` / `annotator_kappa` /
`bradley_terry` / `win_rate_wilson` gates)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from revtron_utils_spark.operators.annotation import (
    bradley_terry,
    bradley_terry_oracle_sql,
    cohen_kappa_pairs,
    majority_vote,
    win_rate_wilson,
)


def test_majority_vote_modal_and_tiebreak(spark):
    rows = [
        (1, "x", "P"), (1, "y", "P"), (1, "z", "N"),   # P wins 2-1
        (2, "x", "N"), (2, "y", "P"),                   # tie -> 'N' (lex smallest)
        (3, "x", "P"), (3, "y", "P"),                   # unanimous
    ]
    df = spark.createDataFrame(rows, ["item", "rater", "label"])
    out = {r["item"]: r for r in majority_vote(df, "item", "rater", "label").collect()}
    assert out[1]["label"] == "P" and out[1]["votes"] == 2 and out[1]["n_raters"] == 3
    assert not out[1]["unanimous"]
    assert out[2]["label"] == "N" and abs(out[2]["share"] - 0.5) < 1e-9
    assert out[3]["unanimous"] and out[3]["share"] == 1.0


def test_cohen_kappa_perfect_and_chance(spark):
    # raters x,y agree on everything -> po=1; pe<1 -> kappa=1
    rows = [(i, r, lab) for i, lab in enumerate(["A", "B", "A", "B"]) for r in ("x", "y")]
    df = spark.createDataFrame(rows, ["item", "rater", "label"])
    out = cohen_kappa_pairs(df, "item", "rater", "label").collect()
    assert len(out) == 1
    assert out[0]["po"] == 1.0 and out[0]["kappa"] == 1.0


def test_cohen_kappa_degenerate_single_label_is_null(spark):
    # both raters always say "A": po=1, pe=1 -> kappa undefined -> NULL
    rows = [(i, r, "A") for i in range(4) for r in ("x", "y")]
    df = spark.createDataFrame(rows, ["item", "rater", "label"])
    out = cohen_kappa_pairs(df, "item", "rater", "label").collect()
    assert out[0]["pe"] == 1.0 and out[0]["kappa"] is None


def test_cohen_kappa_matches_python_model(spark):
    # known mixed fixture vs the direct formula
    rows = [
        (1, "x", "A"), (1, "y", "A"),
        (2, "x", "A"), (2, "y", "B"),
        (3, "x", "B"), (3, "y", "B"),
        (4, "x", "B"), (4, "y", "A"),
        (5, "x", "A"), (5, "y", "A"),
    ]
    df = spark.createDataFrame(rows, ["item", "rater", "label"])
    r = cohen_kappa_pairs(df, "item", "rater", "label").collect()[0]
    n = 5
    po = 3 / n
    pe = (3 * 3 + 2 * 2) / (n * n)  # x: 3A2B; y: 3A2B
    kappa = (po - pe) / (1 - pe)
    assert r["n_shared"] == n
    assert abs(r["po"] - round(po, 6)) < 1e-9
    assert abs(r["pe"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round(kappa, 6)) < 1e-6


def _bt_model(comps, iterations):
    items = sorted({x for c in comps for x in c})
    ix = {x: i for i, x in enumerate(items)}
    m = len(items)
    n = [[0.0] * m for _ in range(m)]
    w = [0.0] * m
    for win, lose in comps:
        n[ix[win]][ix[lose]] += 1
        n[ix[lose]][ix[win]] += 1
        w[ix[win]] += 1
    p = [1.0] * m
    for _ in range(iterations):
        q = []
        for i in range(m):
            d = sum(
                n[i][j] / (p[i] + p[j]) for j in range(m) if j != i and n[i][j] > 0
            )
            q.append(w[i] / d if d else float("nan"))
        p = q
    s = sum(p)
    return {items[i]: round(p[i] / s, 6) for i in range(m)}


def test_bradley_terry_matches_python_mm(spark):
    comps = [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("b", "a")]
    df = spark.createDataFrame(comps, ["w", "l"])
    got = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l", 5).collect()}
    assert got == _bt_model(comps, 5)


def test_bradley_terry_dominant_item_ranks_first(spark):
    comps = [("champ", x) for x in ("b", "c", "d") for _ in range(5)] + [
        ("b", "c"), ("c", "d"), ("d", "b")
    ]
    df = spark.createDataFrame(comps, ["w", "l"])
    got = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l", 10).collect()}
    assert max(got, key=got.get) == "champ"
    assert abs(sum(got.values()) - 1.0) < 1e-4


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    comps=st.lists(
        st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=4,
        max_size=20,
    )
)
def test_bradley_terry_property_differential(spark, comps):
    """Random comparison streams: Spark MM == python MM after rounding
    (NaN-strength items — never winning — surface as NULL/NaN on both
    sides and are compared loosely)."""
    df = spark.createDataFrame(comps, ["w", "l"])
    got = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l", 3).collect()}
    model = _bt_model(comps, 3)
    assert set(got) == set(model)
    for k in model:
        gv, mv = got[k], model[k]
        if mv != mv or mv in (float("inf"), -float("inf")):  # NaN/inf regime
            assert gv is None or gv != gv or math.isinf(gv)
        else:
            assert gv is not None and abs(gv - mv) <= 1e-6


def test_bradley_terry_oracle_sql_matches(spark):
    import duckdb

    comps = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "a"), ("a", "b")]
    df = spark.createDataFrame(comps, ["w", "l"])
    got = sorted(
        (r["item"], r["strength"]) for r in bradley_terry(df, "w", "l", 4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE comp_t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{w}','{l}')" for w, l in comps)
        + ") t(w, l)"
    )
    oracle = sorted(
        con.execute(bradley_terry_oracle_sql("SELECT * FROM comp_t", "w", "l", 4)).fetchall()
    )
    assert got == oracle


def test_wilson_bounds_properties(spark):
    comps = [("a", "b")] * 9 + [("b", "a")]  # a: 9/10, b: 1/10
    df = spark.createDataFrame(comps, ["w", "l"])
    out = {r["item"]: r for r in win_rate_wilson(df, "w", "l").collect()}
    a, b = out["a"], out["b"]
    assert a["wins"] == 9 and a["n"] == 10 and a["win_rate"] == 0.9
    # interval brackets the estimate and stays in [0, 1]
    for r in (a, b):
        assert 0.0 <= r["wilson_lo"] <= r["win_rate"] <= r["wilson_hi"] <= 1.0
    # more evidence -> tighter interval at same rate
    big = spark.createDataFrame([("a", "b")] * 90 + [("b", "a")] * 10, ["w", "l"])
    a2 = {r["item"]: r for r in win_rate_wilson(big, "w", "l").collect()}["a"]
    assert (a2["wilson_hi"] - a2["wilson_lo"]) < (a["wilson_hi"] - a["wilson_lo"])


def test_preference_pipeline_consistent_with_standalone_ops(spark):
    """The composed leaderboard (shared pair-count frame) must agree
    with the standalone bradley_terry and win_rate_wilson on the same
    stream — the composition changes the plan, never the values."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    lb = {r["item"]: r for r in entry.q_preference_pipeline(spark, sf).collect()}
    comp = entry._comparisons(spark, sf)
    bt = {r["item"]: r["strength"] for r in bradley_terry(comp, "winner", "loser", 20).collect()}
    wr = {r["item"]: r for r in win_rate_wilson(comp, "winner", "loser").collect()}
    assert set(lb) == set(bt) == set(wr)
    for item, row in lb.items():
        assert row["strength"] == bt[item]
        assert (row["wins"], row["n"], row["win_rate"], row["wilson_lo"], row["wilson_hi"]) == (
            wr[item]["wins"], wr[item]["n"], wr[item]["win_rate"],
            wr[item]["wilson_lo"], wr[item]["wilson_hi"],
        )
    ranks = [r["rank"] for r in sorted(lb.values(), key=lambda r: (-r["strength"], r["item"]))]
    assert ranks == sorted(ranks)


def test_bradley_terry_handles_mid_sized_catalogs(spark):
    """m=100 catalog (10k-cell dense state): the distributed grid build
    must keep this tractable (the naive single-row scatter fold is
    O(m⁴)) and recover the planted strength ordering."""
    import random

    rng = random.Random(11)
    comps = []
    for _ in range(5000):
        a, b = rng.sample(range(100), 2)
        w, l = (a, b) if rng.random() < (a + 1) / (a + b + 2) else (b, a)
        comps.append((f"m{a:03d}" if w == a else f"m{b:03d}",
                      f"m{b:03d}" if w == a else f"m{a:03d}"))
    df = spark.createDataFrame(comps, ["w", "l"])
    out = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l", 10).collect()}
    assert len(out) == 100
    # planted order: high indices are stronger — top decile mean beats bottom decile
    hi = sum(out[f"m{i:03d}"] for i in range(90, 100)) / 10
    lo = sum(out[f"m{i:03d}"] for i in range(10)) / 10
    assert hi > lo * 2


def _fleiss_py(items, n):
    """items = list of label-lists of length n → (p_bar, p_e, kappa)."""
    N = len(items)
    labels = sorted({l for it in items for l in it})
    nij = [[it.count(j) for j in labels] for it in items]
    p_bar = (sum(c * c for row in nij for c in row) - N * n) / (N * n * (n - 1))
    totals = [sum(row[j] for row in nij) for j in range(len(labels))]
    p_e = sum(t * t for t in totals) / (N * n) ** 2
    return p_bar, p_e, (p_bar - p_e) / (1 - p_e) if p_e < 1 else None


def test_fleiss_perfect_agreement_is_one(spark):
    from revtron_utils_spark.operators.annotation import fleiss_kappa

    rows = [(i, "yes") for i in range(10) for _ in range(3)]
    rows += [(i + 100, "no") for i in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, ["item", "label"])
    r = fleiss_kappa(df, "item", "label", n_raters=3).collect()[0]
    assert r["n_items"] == 20 and r["p_bar"] == 1.0 and r["kappa"] == 1.0


def test_fleiss_unanimous_single_label_panel_kappa_null(spark):
    from revtron_utils_spark.operators.annotation import fleiss_kappa

    rows = [(i, "same") for i in range(5) for _ in range(4)]
    df = spark.createDataFrame(rows, ["item", "label"])
    r = fleiss_kappa(df, "item", "label", n_raters=4).collect()[0]
    # p_e = 1 (one label, full mass) → kappa undefined
    assert r["p_e"] == 1.0 and r["kappa"] is None


def test_fleiss_drops_ragged_items_and_matches_model(spark):
    import random

    from revtron_utils_spark.operators.annotation import fleiss_kappa

    rng = random.Random(37)
    items = [[rng.choice("xyz") for _ in range(4)] for _ in range(40)]
    rows = [(i, l) for i, it in enumerate(items) for l in it]
    rows += [(999, "x"), (999, "y")]  # a 2-rater item: dropped
    df = spark.createDataFrame(rows, ["item", "label"])
    r = fleiss_kappa(df, "item", "label", n_raters=4).collect()[0]
    p_bar, p_e, kappa = _fleiss_py(items, 4)
    assert r["n_items"] == 40
    assert abs(r["p_bar"] - round(p_bar, 6)) < 1e-9
    assert abs(r["p_e"] - round(p_e, 6)) < 1e-9
    assert abs(r["kappa"] - round(kappa, 6)) < 1e-6
