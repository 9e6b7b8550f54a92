"""Benford-deviation semantics (operators/profile.py::benford_deviation):
conforming vs uniform fixtures, zero-count digit completion, python-model
differential. Corpus-scale value equality is covered by the
`benford_digits` gate."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.profile import _BENFORD_P, benford_deviation


def _chi2_py(values):
    counts = [0] * 10
    n = 0
    for v in values:
        if v >= 1:
            counts[int(str(v)[0])] += 1
            n += 1
    chi2 = 0.0
    worst_d, worst_abs = None, -1.0
    for d in range(1, 10):
        p = _BENFORD_P[d - 1]
        dev = counts[d] - n * p
        chi2 += dev * dev / (n * p)
        if abs(dev) > worst_abs:
            worst_abs, worst_d = abs(dev), d
    return n, chi2, worst_d, counts[worst_d] / n - _BENFORD_P[worst_d - 1]


def test_benford_conforming_sample_scores_low_uniform_scores_high(spark):
    # sample digits proportionally to Benford, 1000 values
    conforming = []
    for d in range(1, 10):
        conforming += [d * 100] * round(1000 * _BENFORD_P[d - 1])
    uniform = [d * 100 + 7 for d in range(1, 10)] * 111
    rows = [("ben", v) for v in conforming] + [("uni", v) for v in uniform]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r for r in benford_deviation(df, "v", ["g"]).collect()}
    assert got["ben"]["chi2"] < 1.0  # rounding residue only
    assert got["uni"]["chi2"] > 100.0  # uniform digits violate hard
    # uniform's most-underrepresented digit is 1 (expected 30%, got 11%)
    assert got["uni"]["worst_digit"] == 1
    assert got["uni"]["worst_excess"] < 0


def test_benford_missing_digits_contribute_expectation(spark):
    # only digit 9 present: chi2 = sum over d of the full penalty
    df = spark.createDataFrame([("g", 9000)] * 10, ["g", "v"])
    r = benford_deviation(df, "v", ["g"]).collect()[0]
    n, chi2, wd, we = _chi2_py([9000] * 10)
    assert r["n_values"] == 10
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-9
    # digit 9 holds all mass: its excess |10 − 10·p9| ≈ 9.5 dominates
    # even digit 1's fully-missing 3.0 expectation
    assert r["worst_digit"] == wd == 9


def test_benford_ignores_sub_one_values(spark):
    df = spark.createDataFrame([("g", 0), ("g", -5), ("g", 123)], ["g", "v"])
    r = benford_deviation(df, "v", ["g"]).collect()[0]
    assert r["n_values"] == 1


def test_benford_python_model_differential(spark):
    import random

    rng = random.Random(23)
    values = [rng.randint(1, 999999) for _ in range(800)]
    df = spark.createDataFrame([("g", v) for v in values], ["g", "v"])
    r = benford_deviation(df, "v", ["g"]).collect()[0]
    n, chi2, wd, we = _chi2_py(values)
    assert r["n_values"] == n
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-6
    assert r["worst_digit"] == wd
    assert abs(r["worst_excess"] - round(we, 6)) < 1e-9
