"""Kaplan-Meier semantics (operators/survival.py): the classic
hand-worked fixture, censoring edge cases, and a python-model
differential. Corpus-scale value equality is covered by the
`kaplan_meier` gate."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.survival import kaplan_meier


def _km_py(subjects):
    """Pure-python product-limit model: subjects = [(t, event)]."""
    times = sorted({t for t, e in subjects if e == 1})
    out, s = [], 1.0
    for t in times:
        n = sum(1 for u, _ in subjects if u >= t)
        d = sum(1 for u, e in subjects if u == t and e == 1)
        s *= 1.0 - d / n
        out.append((t, n, d, s))
    return out


def test_km_hand_worked_textbook_fixture(spark):
    # (t, event): censored-at-2 stays at risk for the t=2 step.
    subj = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame([("g", t, e) for t, e in subj], ["g", "t", "e"])
    rows = {r["t"]: r for r in kaplan_meier(df, "t", "e", ["g"]).collect()}
    assert set(rows) == {1, 2, 3, 5}
    assert (rows[1]["at_risk"], rows[1]["events"]) == (6, 1)
    assert abs(rows[1]["survival"] - 5 / 6) < 1e-6
    assert (rows[2]["at_risk"], rows[2]["events"]) == (5, 1)
    assert abs(rows[2]["survival"] - 2 / 3) < 1e-6
    assert (rows[3]["at_risk"], rows[3]["events"]) == (3, 1)
    assert abs(rows[3]["survival"] - 4 / 9) < 1e-6
    assert (rows[5]["at_risk"], rows[5]["events"]) == (1, 1)
    assert rows[5]["survival"] == 0.0


def test_km_all_censored_emits_no_steps(spark):
    df = spark.createDataFrame([("g", 3, 0), ("g", 7, 0)], ["g", "t", "e"])
    assert kaplan_meier(df, "t", "e", ["g"]).count() == 0


def test_km_no_censoring_matches_empirical_survival(spark):
    # distinct times, every subject an event: S(t_i) = (n - i) / n
    n = 8
    df = spark.createDataFrame([("g", i, 1) for i in range(1, n + 1)], ["g", "t", "e"])
    rows = kaplan_meier(df, "t", "e", ["g"]).orderBy("t").collect()
    for i, r in enumerate(rows, start=1):
        assert abs(r["survival"] - (n - i) / n) < 1e-6


def test_km_groups_are_independent_and_match_python_model(spark):
    import random

    rng = random.Random(7)
    subj = {
        "a": [(rng.randint(1, 10), rng.randint(0, 1)) for _ in range(40)],
        "b": [(rng.randint(1, 6), rng.randint(0, 1)) for _ in range(25)],
    }
    data = [(g, t, e) for g, rows in subj.items() for t, e in rows]
    df = spark.createDataFrame(data, ["g", "t", "e"])
    got = kaplan_meier(df, "t", "e", ["g"]).collect()
    for g, rows in subj.items():
        model = _km_py(rows)
        mine = sorted(
            (r["t"], r["at_risk"], r["events"], r["survival"])
            for r in got
            if r["g"] == g
        )
        assert len(mine) == len(model)
        for (t, n_, d, s), (mt, mn, md, ms) in zip(mine, model):
            assert (t, n_, d) == (mt, mn, md)
            assert abs(s - ms) < 1e-6


def _logrank_py(subjects):
    """subjects = [(group 'a'/'b', t, event)] → (o_a, e_a, v)."""
    times = sorted({t for _, t, e in subjects if e == 1})
    o_a = e_a = v = 0.0
    for t in times:
        na = sum(1 for g, u, _ in subjects if g == "a" and u >= t)
        nb = sum(1 for g, u, _ in subjects if g == "b" and u >= t)
        da = sum(1 for g, u, e in subjects if g == "a" and u == t and e == 1)
        db = sum(1 for g, u, e in subjects if g == "b" and u == t and e == 1)
        d, n = da + db, na + nb
        o_a += da
        e_a += d * na / n
        if n > 1:
            v += d * na * nb * (n - d) / (n * n * (n - 1))
    return o_a, e_a, v


def test_logrank_identical_cohorts_z_near_zero(spark):
    from revtron_utils_spark.operators.survival import logrank_test

    subj = [(g, t, 1) for g in "ab" for t in range(1, 11)]
    df = spark.createDataFrame(subj, ["g", "t", "e"])
    r = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    assert r["o_a"] == 10 and r["o_b"] == 10
    assert abs(r["e_a"] - 10) < 1e-6 and abs(r["z"]) < 1e-6


def test_logrank_detects_faster_churn(spark):
    from revtron_utils_spark.operators.survival import logrank_test

    # cohort a dies at t=1..5, cohort b survives to t=11..15: strong
    # negative association for b → large |z|
    subj = [("a", t, 1) for t in range(1, 6)] + [("b", t + 10, 1) for t in range(1, 6)]
    df = spark.createDataFrame(subj, ["g", "t", "e"])
    r = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    o_a, e_a, v = _logrank_py(subj)
    assert r["o_a"] == 5
    assert abs(r["e_a"] - round(e_a, 6)) < 1e-9
    assert r["z"] > 2.0  # a observed far more early deaths than expected


def test_logrank_python_model_differential_with_censoring(spark):
    import math
    import random

    from revtron_utils_spark.operators.survival import logrank_test

    rng = random.Random(29)
    subj = [
        (rng.choice("ab"), rng.randint(1, 12), rng.randint(0, 1))
        for _ in range(120)
    ]
    df = spark.createDataFrame(subj, ["g", "t", "e"])
    r = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    o_a, e_a, v = _logrank_py(subj)
    assert r["o_a"] == o_a
    assert abs(r["e_a"] - round(e_a, 6)) < 1e-6
    if v > 0:
        assert abs(r["z"] - round((o_a - e_a) / math.sqrt(v), 6)) < 1e-6
    # third cohorts are excluded
    df2 = spark.createDataFrame(subj + [("c", 1, 1)] * 30, ["g", "t", "e"])
    r2 = logrank_test(df2, "t", "e", "g", "a", "b").collect()[0]
    assert r2["o_a"] == r["o_a"] and r2["e_a"] == r["e_a"]


def test_logrank_no_events_yields_null_z(spark):
    from revtron_utils_spark.operators.survival import logrank_test

    df = spark.createDataFrame(
        [("a", 3, 0), ("b", 5, 0)], ["g", "t", "e"]
    )
    r = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    assert r["n_times"] == 0 and r["z"] is None
