"""Cramér's V / Chapman capture-recapture / Neyman allocation semantics
(operators/profile.py, operators/segment.py): analytic fixtures and
python-model differentials. Corpus-scale value equality is covered by
the `cramers_v` / `population_estimate` / `neyman_allocation` gates."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.profile import chapman_estimate, cramers_v
from revtron_utils_spark.operators.segment import neyman_allocation


def test_cramers_v_perfect_association_is_one(spark):
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, ["r", "c"])
    r = cramers_v(df, "r", "c").collect()[0]
    assert (r["n"], r["n_rows"], r["n_cols"], r["dof"]) == (20, 2, 2, 1)
    assert r["v"] == 1.0


def test_cramers_v_independence_is_zero(spark):
    rows = [(a, b) for a in "ab" for b in "xy" for _ in range(5)]
    df = spark.createDataFrame(rows, ["r", "c"])
    r = cramers_v(df, "r", "c").collect()[0]
    assert r["chi2"] == 0.0 and r["v"] == 0.0


def test_cramers_v_degenerate_single_row_is_null(spark):
    df = spark.createDataFrame([("only", c) for c in "xyz"], ["r", "c"])
    r = cramers_v(df, "r", "c").collect()[0]
    assert r["v"] is None and r["dof"] == 0


def test_chapman_estimate_hand_computed(spark):
    # sample a: ids 0..19 (n=20); sample b: ids 10..24 (n=15); overlap 10
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 25)]
    df = spark.createDataFrame(rows, ["s", "uid"])
    r = chapman_estimate(df, "uid", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["overlap"]) == (20, 15, 10)
    assert abs(r["estimate"] - (21 * 16 / 11 - 1)) < 1e-4


def test_chapman_no_overlap_uses_bias_corrected_form(spark):
    rows = [("a", i) for i in range(5)] + [("b", i + 100) for i in range(5)]
    df = spark.createDataFrame(rows, ["s", "uid"])
    r = chapman_estimate(df, "uid", "s", "a", "b").collect()[0]
    assert r["overlap"] == 0 and r["estimate"] == 35.0  # 6*6/1 - 1


def test_neyman_allocation_favors_high_variance_strata(spark):
    # stratum L: constant metric (sd 0); stratum H: spread metric
    rows = [("L", 50)] * 40 + [("H", v) for v in range(0, 100)] * 1
    df = spark.createDataFrame(rows, ["s", "x"])
    got = {r["stratum"]: r for r in neyman_allocation(df, "s", "x", 10).collect()}
    assert got["L"]["sd"] == 0.0
    assert got["H"]["n_alloc"] == 10 and got["L"]["n_alloc"] == 0
    assert got["H"]["share"] == 1.0


def test_neyman_allocation_sums_to_budget_and_matches_model(spark):
    import random

    rng = random.Random(47)
    strata = {"a": 200, "b": 100, "c": 50}
    rows = [
        (s, rng.randint(0, 1000 * (i + 1)))
        for i, (s, n) in enumerate(strata.items())
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, ["s", "x"])
    got = {r["stratum"]: r for r in neyman_allocation(df, "s", "x", 100).collect()}
    assert sum(r["n_alloc"] for r in got.values()) == 100
    # python model of the same pinned arithmetic
    by = {}
    for s, x in rows:
        by.setdefault(s, []).append(x)
    w = {}
    for s, xs in by.items():
        n = len(xs)
        num = n * sum(v * v for v in xs) - sum(xs) ** 2
        sd = math.sqrt(num) / n
        w[s] = n * sd
        assert abs(got[s]["sd"] - round(sd, 6)) < 1e-6
    tot = sum(w.values())
    exact = {s: 100 * v / tot for s, v in w.items()}
    base = {s: math.floor(v) for s, v in exact.items()}
    deficit = 100 - sum(base.values())
    order = sorted(exact, key=lambda s: (-(exact[s] - base[s]), s))
    for i, s in enumerate(order):
        want = base[s] + (1 if i < deficit else 0)
        assert got[s]["n_alloc"] == want


def test_neyman_all_constant_falls_back_to_proportional(spark):
    rows = [("a", 7)] * 30 + [("b", 7)] * 10
    df = spark.createDataFrame(rows, ["s", "x"])
    got = {r["stratum"]: r for r in neyman_allocation(df, "s", "x", 8).collect()}
    assert got["a"]["n_alloc"] == 6 and got["b"]["n_alloc"] == 2
