"""classification_report / rank_auc semantics (operators/evaluation.py):
hand-checked confusion fixtures, sklearn-free python AUC model with
ties, NULL guards. Corpus-scale value equality is covered by the
`classifier_eval` / `score_auc` gates."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from revtron_utils_spark.operators.evaluation import (
    classification_report,
    rank_auc,
)


def test_classification_report_hand_checked(spark):
    # actual: 3a 2b 1c ; predictions mix
    pairs = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "c"),
        ("c", "a"),
    ]
    df = spark.createDataFrame(pairs, ["actual", "pred"])
    out = {r["label"]: r for r in classification_report(df, "actual", "pred").collect()}
    a = out["a"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (3, 2, 1, 1)
    assert abs(a["precision"] - 2 / 3) < 1e-6 and abs(a["recall"] - 2 / 3) < 1e-6
    assert abs(a["f1"] - 2 * 2 / (2 * 2 + 1 + 1)) < 1e-6
    b = out["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (1, 1, 1)
    c = out["c"]
    assert (c["support"], c["tp"], c["fp"], c["fn"]) == (1, 0, 1, 1)
    assert c["precision"] == 0.0 and c["recall"] == 0.0 and c["f1"] == 0.0


def test_classification_report_class_only_on_one_side(spark):
    # 'd' never predicted -> precision NULL; 'e' never actual -> recall NULL
    pairs = [("d", "e"), ("d", "d")]
    df = spark.createDataFrame(pairs, ["actual", "pred"])
    out = {r["label"]: r for r in classification_report(df, "actual", "pred").collect()}
    assert out["e"]["support"] == 0 and out["e"]["recall"] is None
    assert out["e"]["precision"] == 0.0  # predicted once, never right
    assert out["d"]["precision"] == 1.0 and abs(out["d"]["recall"] - 0.5) < 1e-9


def _auc_model(scores, labels):
    """Mann-Whitney with average ranks, straight from the definition."""
    n = len(scores)
    order = sorted(range(n), key=lambda i: scores[i])
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and scores[order[j]] == scores[order[i]]:
            j += 1
        ar = (i + j + 1) / 2
        for k in range(i, j):
            ranks[order[k]] = ar
        i = j
    npos = sum(labels)
    nneg = n - npos
    if npos == 0 or nneg == 0:
        return None
    rsum = sum(r for r, y in zip(ranks, labels) if y)
    return (rsum - npos * (npos + 1) / 2) / (npos * nneg)


def test_rank_auc_perfect_and_inverse(spark):
    rows = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, ["score", "y"])
    assert rank_auc(df, "score", "y").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame([(float(i), i < 5) for i in range(10)], ["score", "y"])
    assert rank_auc(inv, "score", "y").collect()[0]["auc"] == 0.0


def test_rank_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(1.0, True), (2.0, True)], ["score", "y"])
    r = rank_auc(df, "score", "y").collect()[0]
    assert r["auc"] is None and r["n_pos"] == 2


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.booleans()),
        min_size=2,
        max_size=30,
    )
)
def test_rank_auc_matches_python_model_with_ties(spark, rows):
    """Small-score-domain random fixtures force heavy ties — the exact
    average-rank correction must match the definitional python model."""
    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], ["score", "y"]
    )
    got = rank_auc(df, "score", "y").collect()[0]["auc"]
    model = _auc_model([s for s, _ in rows], [y for _, y in rows])
    if model is None:
        assert got is None
    else:
        assert got is not None and abs(got - round(model, 6)) < 1e-9


def test_calibration_curve_bins_and_rates(spark):
    from revtron_utils_spark.operators.evaluation import calibration_curve

    # scores num/den in [0, 10), 5 bins of width 2: num 0-1 -> bin 0, ...
    rows = [(i, 1, i >= 6) for i in range(10)]
    df = spark.createDataFrame(rows, ["num", "den", "y"])
    out = {r["bin"]: r for r in calibration_curve(
        df, "num", "den", "y", score_min=0, score_max=9, n_bins=5
    ).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(out[b]["n_docs"] == 2 for b in out)
    assert out[0]["pos_rate"] == 0.0 and out[2]["pos_rate"] == 0.0
    assert out[3]["pos_rate"] == 1.0 and out[4]["pos_rate"] == 1.0


def test_calibration_curve_monotone_fixture(spark):
    from revtron_utils_spark.operators.evaluation import calibration_curve

    import random

    rng = random.Random(3)
    rows = []
    for _ in range(2000):
        s = rng.randrange(0, 100)
        rows.append((s, 1, rng.random() < s / 100))
    df = spark.createDataFrame(rows, ["num", "den", "y"])
    out = sorted(
        calibration_curve(df, "num", "den", "y", 0, 99, n_bins=4).collect(),
        key=lambda r: r["bin"],
    )
    rates = [r["pos_rate"] for r in out]
    assert rates == sorted(rates)  # well-calibrated synthetic -> monotone bins
    assert sum(r["n_docs"] for r in out) == 2000


def test_join_size_estimate_matches_real_join(spark):
    from revtron_utils_spark.operators.skew import join_size_estimate

    left = spark.createDataFrame([(k,) for k in [1] * 5 + [2] * 3 + [3]], ["k"])
    right = spark.createDataFrame([(k,) for k in [1] * 4 + [3] * 2 + [4]], ["k"])
    out = {r["k"]: r for r in join_size_estimate(left, right, ["k"]).collect()}
    real = left.join(right, "k").count()
    assert sum(r["out_rows"] for r in out.values()) == real == 5 * 4 + 1 * 2
    assert out[1]["out_rows"] == 20 and out[1]["rank"] == 1
    assert abs(out[1]["share"] - 20 / 22) < 1e-6
    assert 2 not in out and 4 not in out  # unmatched keys produce no output


def test_mcnemar_hand_computed_and_degenerate(spark):
    from revtron_utils_spark.operators.evaluation import mcnemar_test

    # 20 both right, b=8 only A, c=2 only B, 5 neither
    rows = (
        [(True, True)] * 20 + [(True, False)] * 8
        + [(False, True)] * 2 + [(False, False)] * 5
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert (r["n"], r["both_ok"], r["only_a"], r["only_b"], r["neither_ok"]) == (
        35, 20, 8, 2, 5
    )
    assert abs(r["chi2"] - (8 - 2) ** 2 / 10) < 1e-9
    # never disagree → chi2 NULL
    dfa = spark.createDataFrame([(True, True)] * 4 + [(False, False)] * 3, ["a", "b"])
    assert mcnemar_test(dfa, "a", "b").collect()[0]["chi2"] is None


def test_gain_curve_separable_and_uniform(spark):
    from revtron_utils_spark.operators.evaluation import gain_curve

    # scores 3..0, positives only at score >= 2 → capture hits 1.0 at
    # 50% of the population scanned
    rows = [("g", s, int(s >= 2)) for s in (3, 2, 1, 0) for _ in range(10)]
    df = spark.createDataFrame(rows, ["g", "score", "y"])
    got = {r["score"]: r for r in gain_curve(df, "score", "y", by=["g"]).collect()}
    assert got[3]["cum_share"] == 0.25 and got[3]["cum_capture"] == 0.5
    assert got[2]["cum_share"] == 0.5 and got[2]["cum_capture"] == 1.0
    assert got[0]["cum_share"] == 1.0 and got[0]["cum_capture"] == 1.0
    # uniform labels: capture tracks share exactly at every level
    rows2 = [("g", s, y) for s in range(4) for y in (0, 1) for _ in range(5)]
    df2 = spark.createDataFrame(rows2, ["g", "score", "y"])
    for r in gain_curve(df2, "score", "y", by=["g"]).collect():
        assert abs(r["cum_share"] - r["cum_capture"]) < 1e-9


def test_gain_curve_no_positives_is_null(spark):
    from revtron_utils_spark.operators.evaluation import gain_curve

    df = spark.createDataFrame([("g", s, 0) for s in range(3)], ["g", "score", "y"])
    assert all(
        r["cum_capture"] is None
        for r in gain_curve(df, "score", "y", by=["g"]).collect()
    )
