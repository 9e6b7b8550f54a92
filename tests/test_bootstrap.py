"""Poisson-bootstrap semantics (operators/bootstrap.py): weight
distribution sanity, CI bracketing/determinism, rank-pick definition,
python-model differential of the full estimator. Corpus-scale value
equality is covered by the `bootstrap_ci` gate."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.bootstrap import (
    _POISSON_CDF,
    _A,
    _A2,
    _B1,
    _P,
    poisson_bootstrap_ci,
)


def _weight_py(uid, b):
    h = ((uid % _P) * _A + (b + 1) * _B1) % _P
    h = (h * _A2) % _P
    u = h / _P
    return sum(u >= t for t in _POISSON_CDF)


def _ci_py(rows, n_boot=100, alpha=0.05):
    """rows = [(uid, x)] for one group."""
    means = []
    for b in range(n_boot):
        wx = wn = 0
        for uid, x in rows:
            w = _weight_py(uid, b)
            wx += w * x
            wn += w
        if wn > 0:
            means.append((wx / wn, b))
    means.sort()
    lo = means[math.ceil(n_boot * alpha / 2) - 1][0]
    hi = means[math.ceil(n_boot * (1 - alpha / 2)) - 1][0]
    return lo, hi


def test_poisson_weights_have_unit_mean_and_bounded_range(spark):
    n, B = 2000, 5
    total = sum(_weight_py(i, b) for i in range(n) for b in range(B))
    mean_w = total / (n * B)
    assert 0.95 < mean_w < 1.05  # Poisson(1) mean ≈ 1 under the hash map
    assert all(0 <= _weight_py(i, 0) <= 6 for i in range(500))


def test_ci_brackets_point_mean_and_is_deterministic(spark):
    rows = [(i, 100 + (i * 37) % 50) for i in range(400)]
    df = spark.createDataFrame([("g", u, x) for u, x in rows], ["g", "uid", "x"])
    r1 = poisson_bootstrap_ci(df, "uid", "x", ["g"]).collect()[0]
    r2 = poisson_bootstrap_ci(df, "uid", "x", ["g"]).collect()[0]
    assert tuple(r1) == tuple(r2)  # no RNG anywhere
    assert r1["ci_lo"] <= r1["point_mean"] <= r1["ci_hi"]
    assert r1["n_units"] == 400
    # interval shrinks roughly like 1/sqrt(n): a 4x bigger sample of the
    # same distribution gives a narrower interval
    big = [(i, 100 + (i * 37) % 50) for i in range(1600)]
    dfb = spark.createDataFrame([("g", u, x) for u, x in big], ["g", "uid", "x"])
    rb = poisson_bootstrap_ci(dfb, "uid", "x", ["g"]).collect()[0]
    assert (rb["ci_hi"] - rb["ci_lo"]) < (r1["ci_hi"] - r1["ci_lo"])


def test_ci_matches_python_model_exactly(spark):
    rows = [(i * 13 + 7, (i * i) % 97) for i in range(150)]
    df = spark.createDataFrame([("g", u, x) for u, x in rows], ["g", "uid", "x"])
    r = poisson_bootstrap_ci(df, "uid", "x", ["g"], n_boot=60).collect()[0]
    lo, hi = _ci_py(rows, n_boot=60)
    assert abs(r["ci_lo"] - round(lo, 4)) < 1e-12
    assert abs(r["ci_hi"] - round(hi, 4)) < 1e-12
    assert abs(r["point_mean"] - round(sum(x for _, x in rows) / len(rows), 4)) < 1e-12


def test_groups_are_independent(spark):
    rows = [("a", i, 10) for i in range(50)] + [("b", i, 1000) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "uid", "x"])
    got = {r["g"]: r for r in poisson_bootstrap_ci(df, "uid", "x", ["g"]).collect()}
    # constant metrics → every resample mean equals the constant
    assert got["a"]["ci_lo"] == got["a"]["ci_hi"] == got["a"]["point_mean"] == 10.0
    assert got["b"]["point_mean"] == 1000.0
