"""Link-prediction semantics (operators/graph.py::link_prediction):
hand-checked wedge/Jaccard fixtures, adjacency exclusion, degree cap,
python-model differential. Corpus-scale value equality is covered by
the `link_prediction` gate."""

from __future__ import annotations

import sys
from itertools import combinations
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.graph import link_prediction


def _lp_py(edges, min_common=1):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        es.add((min(a, b), max(a, b)))
    out = {}
    for u, w in combinations(sorted(adj), 2):
        if (u, w) in es:
            continue
        cn = len(adj[u] & adj[w])
        if cn >= min_common:
            du, dw = len(adj[u]), len(adj[w])
            out[(u, w)] = (cn, du, dw, cn / (du + dw - cn))
    return out


def test_lp_path_graph_predicts_the_closing_edge(spark):
    # path 1-2-3: only candidate pair is (1,3) through center 2
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = link_prediction(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["u"], r["w"], r["common"], r["deg_u"], r["deg_w"]) == (1, 3, 1, 1, 1)
    assert r["jaccard"] == 1.0


def test_lp_excludes_existing_edges(spark):
    # triangle: every pair adjacent → no candidates
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    assert link_prediction(df).count() == 0


def test_lp_shared_neighborhood_jaccard(spark):
    # u=1 and w=2 share neighbors {3,4}; 1 also links 5.
    df = spark.createDataFrame(
        [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4)], ["src", "dst"]
    )
    rows = {(r["u"], r["w"]): r for r in link_prediction(df).collect()}
    r = rows[(1, 2)]
    assert (r["common"], r["deg_u"], r["deg_w"]) == (2, 3, 2)
    # jaccard = 2 / (3 + 2 - 2)
    assert abs(r["jaccard"] - 2 / 3) < 1e-6


def test_lp_max_degree_drops_hub_centers(spark):
    # star center 0 with leaves 1..5: every leaf pair shares center 0.
    df = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    assert link_prediction(df).count() == 10
    assert link_prediction(df, max_degree=3).count() == 0


def test_lp_python_model_differential_and_topk_order(spark):
    import random

    rng = random.Random(17)
    edges = list({tuple(sorted(rng.sample(range(20), 2))) for _ in range(60)})
    df = spark.createDataFrame(edges, ["src", "dst"])
    model = _lp_py(edges, min_common=2)
    got = link_prediction(df, min_common=2, top_k=None).collect()
    assert len(got) == len(model)
    for r in got:
        cn, du, dw, j = model[(r["u"], r["w"])]
        assert (r["common"], r["deg_u"], r["deg_w"]) == (cn, du, dw)
        assert abs(r["jaccard"] - j) < 1e-6
    # top_k respects the (common DESC, jaccard DESC, u, w) order
    top = link_prediction(df, min_common=2, top_k=5).collect()
    ranked = sorted(
        got, key=lambda r: (-r["common"], -r["jaccard"], r["u"], r["w"])
    )[:5]
    assert [(r["u"], r["w"]) for r in top] == [(r["u"], r["w"]) for r in ranked]
