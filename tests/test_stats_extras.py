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


def test_ks_identical_slices_zero_and_disjoint_one(spark):
    from revtron_utils_spark.operators.profile import ks_test

    same = [("a", k) for k in range(10)] * 2 + [("b", k) for k in range(10)] * 2
    df = spark.createDataFrame(same, ["s", "k"])
    r = ks_test(df, "k", "s", "a", "b").collect()[0]
    assert r["ks_d"] == 0.0 and r["ks_stat"] == 0.0
    dis = [("a", k) for k in range(5)] + [("b", k + 100) for k in range(5)]
    r2 = ks_test(spark.createDataFrame(dis, ["s", "k"]), "k", "s", "a", "b").collect()[0]
    assert r2["ks_d"] == 1.0 and r2["ks_at"] == 4  # sup reached at a's last bucket


def test_ks_matches_python_model(spark):
    import math
    import random

    from revtron_utils_spark.operators.profile import ks_test

    rng = random.Random(53)
    a = [rng.randint(0, 15) for _ in range(250)]
    b = [min(15, rng.randint(0, 15) + 3) for _ in range(150)]
    rows = [("a", k) for k in a] + [("b", k) for k in b]
    df = spark.createDataFrame(rows, ["s", "k"])
    r = ks_test(df, "k", "s", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    best_d, best_at = -1, None
    for t in sorted(set(a) | set(b)):
        d = abs(
            sum(1 for x in a if x <= t) * nb - sum(1 for x in b if x <= t) * na
        )
        if d > best_d:
            best_d, best_at = d, t
    assert r["ks_at"] == best_at
    assert abs(r["ks_d"] - round(best_d / (na * nb), 6)) < 1e-9
    assert abs(
        r["ks_stat"] - round(math.sqrt(na * nb / (na + nb)) * best_d / (na * nb), 6)
    ) < 1e-6


def _gini_py(rows):
    """rows = [(bucket, label)] → (parent, best_t, best_gain)."""
    from collections import Counter

    n = len(rows)
    pos = sum(l for _, l in rows)
    parent = (n * n - pos * pos - (n - pos) ** 2) / (n * n)
    best = None
    for t in sorted({k for k, _ in rows}):
        nl = sum(1 for k, _ in rows if k <= t)
        if nl == n:
            continue
        pl = sum(l for k, l in rows if k <= t)
        nr, pr = n - nl, pos - pl
        child = (
            (nl * nl - pl * pl - (nl - pl) ** 2) * nr
            + (nr * nr - pr * pr - (nr - pr) ** 2) * nl
        ) / (nl * nr * n)
        gain = parent - child
        if best is None or gain > best[1]:
            best = (t, gain)
    return parent, best[0], best[1]


def test_gini_split_perfect_separator(spark):
    from revtron_utils_spark.operators.evaluation import gini_split_gain

    # label = bucket > 5 exactly: splitting at 5 removes all impurity
    rows = [("g", k, int(k > 5)) for k in range(10) for _ in range(4)]
    df = spark.createDataFrame(rows, ["g", "k", "y"])
    r = gini_split_gain(df, "k", "y", by=["g"]).collect()[0]
    assert r["best_threshold"] == 5
    assert abs(r["best_gain"] - r["parent_gini"]) < 1e-9  # child impurity 0
    assert (r["n_left"], r["n_right"]) == (24, 16)


def test_gini_split_useless_feature_zero_gain(spark):
    from revtron_utils_spark.operators.evaluation import gini_split_gain

    # label independent of bucket with equal class mix per bucket
    rows = [("g", k, l) for k in range(4) for l in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, ["g", "k", "y"])
    r = gini_split_gain(df, "k", "y", by=["g"]).collect()[0]
    assert abs(r["best_gain"]) < 1e-9


def test_gini_split_python_model_differential(spark):
    import random

    from revtron_utils_spark.operators.evaluation import gini_split_gain

    rng = random.Random(59)
    rows = [
        ("g", rng.randint(0, 12), int(rng.random() < 0.3 + 0.04 * rng.randint(0, 12)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, ["g", "k", "y"])
    r = gini_split_gain(df, "k", "y", by=["g"]).collect()[0]
    parent, t, gain = _gini_py([(k, l) for _, k, l in rows])
    assert abs(r["parent_gini"] - round(parent, 6)) < 1e-9
    assert r["best_threshold"] == t
    assert abs(r["best_gain"] - round(gain, 6)) < 1e-6


def test_slice_overlap_hand_computed_matrix(spark):
    from revtron_utils_spark.operators.profile import slice_overlap

    rows = (
        [("a", i) for i in range(10)]
        + [("b", i) for i in range(5, 15)]
        + [("c", i + 100) for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["s", "uid"])
    got = {
        (r["slice_a"], r["slice_b"]): r
        for r in slice_overlap(df, "uid", "s").collect()
    }
    ab = got[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["overlap"]) == (10, 10, 5)
    assert abs(ab["jaccard"] - 5 / 15) < 1e-6
    assert ab["containment_a"] == 0.5 and ab["containment_b"] == 0.5
    # disjoint pairs are absent (inner pair join)
    assert ("a", "c") not in got and ("b", "c") not in got


def test_slice_overlap_duplicate_rows_count_once(spark):
    from revtron_utils_spark.operators.profile import slice_overlap

    rows = [("a", 1), ("a", 1), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, ["s", "uid"])
    r = slice_overlap(df, "uid", "s").collect()[0]
    assert (r["n_a"], r["n_b"], r["overlap"], r["jaccard"]) == (1, 1, 1, 1.0)
