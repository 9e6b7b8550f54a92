"""vocab_drift / spearman_corr / degree_assortativity semantics
(operators/profile.py, operators/graph.py): analytic fixtures with
known closed-form answers plus python-model differentials. Corpus-scale
value equality is covered by the `vocab_drift` / `scorer_spearman` /
`degree_assortativity` gates."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from revtron_utils_spark.operators.graph import degree_assortativity
from revtron_utils_spark.operators.profile import spearman_corr, vocab_drift


def test_vocab_drift_identical_slices_is_zero(spark):
    rows = [("a", "x y z"), ("b", "x y z")]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = vocab_drift(df, "source", "a", "b", top_k=5).collect()
    assert all(r["tvd"] == 0.0 and r["contrib"] == 0.0 for r in out)


def test_vocab_drift_disjoint_slices_is_one(spark):
    rows = [("a", "x x y"), ("b", "p q q")]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = vocab_drift(df, "source", "a", "b", top_k=10).collect()
    assert out and all(r["tvd"] == 1.0 for r in out)
    # per-token contributions sum to the TVD when top_k covers the vocab
    assert abs(sum(r["contrib"] for r in out) - 1.0) < 1e-6


def test_vocab_drift_matches_python_model(spark):
    rows = [("a", "x x y z"), ("a", "y w"), ("b", "x q q w w")]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r["token"]: r for r in vocab_drift(df, "source", "a", "b", top_k=10).collect()}
    from collections import Counter

    ca = Counter("x x y z y w".split())
    cb = Counter("x q q w w".split())
    na, nb = sum(ca.values()), sum(cb.values())
    tvd = sum(abs(ca[t] * nb - cb[t] * na) for t in set(ca) | set(cb)) / (2 * na * nb)
    for t in set(ca) | set(cb):
        r = out[t]
        assert (r["c_a"], r["c_b"]) == (ca[t], cb[t])
        assert abs(r["contrib"] - abs(ca[t] * nb - cb[t] * na) / (2 * na * nb)) < 1e-6
        assert abs(r["tvd"] - round(tvd, 6)) < 1e-9
    # rank 1 = largest exact numerator, token tie-break
    best = max(out.values(), key=lambda r: (abs(ca[r["token"]] * nb - cb[r["token"]] * na), ))
    assert out[best["token"]]["rank"] >= 1


def test_spearman_perfect_and_inverse(spark):
    rows = [(i, i * 10, 100 - i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["x", "y_up", "y_down"])
    up = spearman_corr(df, "x", "y_up").collect()[0]
    down = spearman_corr(df, "x", "y_down").collect()[0]
    assert up["rho"] == 1.0 and down["rho"] == -1.0


def test_spearman_ties_match_python_model(spark):
    xs = [1, 2, 2, 3, 3, 3, 4]
    ys = [5, 5, 7, 6, 9, 9, 10]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    got = spearman_corr(df, "x", "y").collect()[0]["rho"]

    def avg_ranks(v):
        s = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and v[s[j]] == v[s[i]]:
                j += 1
            ar = (i + j + 1) / 2  # average of 1-based ranks i+1..j
            for k in range(i, j):
                r[s[k]] = ar
            i = j
        return r

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    assert abs(got - num / den) < 1e-6


def test_spearman_constant_side_is_null(spark):
    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], ["x", "y"])
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] is None


def test_assortativity_star_is_minus_one(spark):
    # star K1,5: every edge links the hub (deg 5) to a leaf (deg 1) —
    # perfectly disassortative
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    r = degree_assortativity(edges).collect()[0]
    assert r["n_nodes"] == 6 and r["n_edges"] == 5
    assert r["assortativity"] == -1.0


def test_assortativity_uniform_degree_is_null(spark):
    # 4-cycle: every node degree 2 — zero variance, undefined
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["assortativity"] is None and r["n_edges"] == 4


def test_assortativity_dedups_and_drops_self_loops(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2), (0, 2)], ["src", "dst"]
    )
    r = degree_assortativity(edges).collect()[0]
    # surviving undirected edges: {0,1}, {0,2}
    assert r["n_edges"] == 2 and r["n_nodes"] == 3


def _drift_hyp_tests():
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    return given(
        docs=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.lists(st.sampled_from("xyzpq"), min_size=1, max_size=6),
            ),
            min_size=2,
            max_size=12,
        ).filter(
            lambda d: {s for s, _ in d} == {"a", "b"}
        )
    ), settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )


_given, _settings = _drift_hyp_tests()


@_settings
@_given
def test_vocab_drift_property_differential(spark, docs):
    """Random two-slice corpora over a 5-token vocabulary: per-token
    counts, contributions, and the TVD scalar all match the direct
    python computation."""
    from collections import Counter

    df = spark.createDataFrame(
        [(s, " ".join(toks)) for s, toks in docs], ["source", "text"]
    )
    out = {r["token"]: r for r in vocab_drift(df, "source", "a", "b", top_k=10).collect()}
    ca, cb = Counter(), Counter()
    for s, toks in docs:
        (ca if s == "a" else cb).update(toks)
    na, nb = sum(ca.values()), sum(cb.values())
    tvd = sum(abs(ca[t] * nb - cb[t] * na) for t in set(ca) | set(cb)) / (2 * na * nb)
    assert set(out) == set(ca) | set(cb)
    for t, r in out.items():
        assert (r["c_a"], r["c_b"]) == (ca[t], cb[t])
        assert abs(r["tvd"] - round(tvd, 6)) < 1e-9


def test_vocab_drift_empty_slice_is_null_not_nan(spark):
    """One slice with no tokens: TVD/contrib are NULL (0/0 would be a
    NaN/inf whose rendering engines disagree on)."""
    df = spark.createDataFrame([("a", "x y")], ["source", "text"])
    out = vocab_drift(df, "source", "a", "b", top_k=5).collect()
    assert out and all(r["tvd"] is None and r["contrib"] is None for r in out)


def test_hellinger_identical_slices_is_zero(spark):
    from revtron_utils_spark.operators.profile import hellinger_drift

    rows = [("a", k) for k in range(10)] * 3 + [("b", k) for k in range(10)] * 3
    df = spark.createDataFrame(rows, ["s", "k"])
    r = hellinger_drift(df, "k", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_buckets_common"]) == (30, 30, 10)
    assert r["bc"] == 1.0 and r["hellinger"] == 0.0


def test_hellinger_disjoint_slices_is_one(spark):
    from revtron_utils_spark.operators.profile import hellinger_drift

    rows = [("a", k) for k in range(5)] + [("b", k + 100) for k in range(5)]
    df = spark.createDataFrame(rows, ["s", "k"])
    r = hellinger_drift(df, "k", "s", "a", "b").collect()[0]
    assert r["n_buckets_common"] == 0
    assert r["bc"] == 0.0 and r["hellinger"] == 1.0


def test_hellinger_matches_python_model(spark):
    import math
    import random

    from revtron_utils_spark.operators.profile import hellinger_drift

    rng = random.Random(41)
    a = [rng.randint(0, 12) for _ in range(300)]
    b = [min(12, rng.randint(0, 12) + 2) for _ in range(200)]
    rows = [("a", k) for k in a] + [("b", k) for k in b]
    df = spark.createDataFrame(rows, ["s", "k"])
    r = hellinger_drift(df, "k", "s", "a", "b").collect()[0]
    ca = {k: a.count(k) for k in set(a)}
    cb = {k: b.count(k) for k in set(b)}
    bc = sum(
        math.sqrt(ca.get(k, 0) * cb.get(k, 0)) for k in set(a) | set(b)
    ) / math.sqrt(len(a) * len(b))
    assert abs(r["bc"] - round(bc, 6)) < 1e-9
    assert abs(r["hellinger"] - round(math.sqrt(1 - bc), 6)) < 1e-6
    # third slices are excluded entirely
    df2 = spark.createDataFrame(rows + [("c", 1)] * 50, ["s", "k"])
    r2 = hellinger_drift(df2, "k", "s", "a", "b").collect()[0]
    assert (r2["n_a"], r2["n_b"]) == (300, 200) and r2["bc"] == r["bc"]
