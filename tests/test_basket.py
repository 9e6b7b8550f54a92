"""Association-rule semantics (operators/basket.py): hand-computed
support/confidence/lift, distinct-membership handling, the basket-size
cap, and a python-model differential. Corpus-scale value equality is
covered by the `association_rules` gate."""

from __future__ import annotations

import sys
from itertools import combinations
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.basket import association_rules


def _rules_py(baskets):
    sets = [set(b) for b in baskets]
    n = len(sets)
    cnt = {}
    for s in sets:
        for i in s:
            cnt[i] = cnt.get(i, 0) + 1
    out = {}
    for s in sets:
        for a, b in combinations(sorted(s), 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return {
        (a, b): (p, cnt[a], cnt[b], p / n, p / cnt[a], p / cnt[b], p * n / (cnt[a] * cnt[b]))
        for (a, b), p in out.items()
    }


def test_rules_hand_computed(spark):
    baskets = [["x", "y"], ["x", "y"], ["x", "z"], ["y"]]
    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    df = spark.createDataFrame(rows, ["b", "i"])
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "b", "i").collect()
    }
    xy = got[("x", "y")]
    assert (xy["pair_count"], xy["count_a"], xy["count_b"], xy["n_baskets"]) == (2, 3, 3, 4)
    assert xy["support"] == 0.5
    assert abs(xy["conf_a_to_b"] - 2 / 3) < 1e-6
    # lift = 2*4/(3*3)
    assert abs(xy["lift"] - 8 / 9) < 1e-6
    xz = got[("x", "z")]
    assert xz["pair_count"] == 1 and xz["conf_b_to_a"] == 1.0
    assert abs(xz["lift"] - 4 / 3) < 1e-6


def test_rules_duplicate_lines_count_once(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x")], ["b", "i"]
    )
    r = association_rules(df, "b", "i").collect()[0]
    assert (r["pair_count"], r["count_a"], r["count_b"]) == (1, 2, 1)


def test_rules_basket_cap_drops_oversized_baskets(spark):
    rows = [(1, c) for c in "abcde"] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["b", "i"])
    got = association_rules(df, "b", "i", max_basket_items=3).collect()
    assert len(got) == 1
    r = got[0]
    # only basket 2 survives: n_baskets=1, all counts from it
    assert (r["item_a"], r["item_b"], r["pair_count"], r["n_baskets"]) == ("a", "b", 1, 1)


def test_rules_min_count_and_topk_ordering(spark):
    baskets = [["a", "b"]] * 3 + [["a", "c"]] * 2 + [["b", "c"]]
    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    df = spark.createDataFrame(rows, ["b", "i"])
    got = association_rules(df, "b", "i", min_pair_count=2, top_k=1).collect()
    assert len(got) == 1
    # lifts: ab = 3*6/(5*4)=0.9, ac = 2*6/(5*3)=0.8 → ab first
    assert (got[0]["item_a"], got[0]["item_b"]) == ("a", "b")


def test_rules_python_model_differential(spark):
    import random

    rng = random.Random(5)
    items = list("abcdefgh")
    baskets = [rng.sample(items, rng.randint(1, 4)) for _ in range(60)]
    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    df = spark.createDataFrame(rows, ["b", "i"])
    model = _rules_py(baskets)
    got = association_rules(df, "b", "i").collect()
    assert len(got) == len(model)
    for r in got:
        p, ca, cb, sup, cab, cba, lift = model[(r["item_a"], r["item_b"])]
        assert (r["pair_count"], r["count_a"], r["count_b"]) == (p, ca, cb)
        for mine, ref in (
            (r["support"], sup),
            (r["conf_a_to_b"], cab),
            (r["conf_b_to_a"], cba),
            (r["lift"], lift),
        ):
            assert abs(mine - ref) < 1e-6
