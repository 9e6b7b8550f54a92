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
