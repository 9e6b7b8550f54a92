"""vocab_richness / concentration_gini semantics
(operators/profile.py): closed-form fixtures and python-model
differentials. Corpus-scale value equality is covered by the
`vocab_richness` / `concentration_gini` gates."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.profile import (
    concentration_gini,
    vocab_richness,
)


def test_vocab_richness_hand_checked(spark):
    # tokens: a a a b b c d  -> N=7 V=4 f1=2 (c,d) f2=1 (b)
    df = spark.createDataFrame([("s", "a a a b b c d")], ["source", "text"])
    r = vocab_richness(df, ["source"]).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (7, 4, 2, 1)
    # chao1 = V + f1(f1-1)/(2(f2+1)) = 4 + 2/4 = 4.5
    assert r["chao1"] == 4.5
    assert abs(r["oov_mass"] - 2 / 7) < 1e-6


def test_vocab_richness_no_rare_tokens(spark):
    # every type seen 3x: f1=f2=0 -> chao1 = V exactly, oov_mass = 0
    df = spark.createDataFrame([("s", "a a a b b b")], ["source", "text"])
    r = vocab_richness(df, ["source"]).collect()[0]
    assert r["f1"] == 0 and r["f2"] == 0
    assert r["chao1"] == 2.0 and r["oov_mass"] == 0.0


def test_gini_uniform_is_near_zero_and_concentrated_is_high(spark):
    even = spark.createDataFrame([(k,) for k in range(10) for _ in range(5)], ["k"])
    g_even = concentration_gini(even, ["k"]).collect()[0]
    assert g_even["n_keys"] == 10 and g_even["n_rows"] == 50
    assert g_even["gini"] == 0.0  # perfectly even
    skewed = spark.createDataFrame(
        [(0,)] * 91 + [(k,) for k in range(1, 10)], ["k"]
    )
    g_skew = concentration_gini(skewed, ["k"]).collect()[0]
    assert g_skew["gini"] > 0.7


def test_gini_matches_python_model(spark):
    counts = {0: 7, 1: 1, 2: 4, 3: 2, 4: 11}
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    g = concentration_gini(spark.createDataFrame(rows, ["k"]), ["k"]).collect()[0]
    cs = sorted(counts.values())
    n, s = len(cs), sum(cs)
    model = (2 * sum((i + 1) * c for i, c in enumerate(cs)) - (n + 1) * s) / (n * s)
    assert abs(g["gini"] - round(model, 6)) < 1e-9
