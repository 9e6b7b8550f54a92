"""Round-11: deterministic-integer ANN twins (`ivf_probe_exact`,
`pq_adc_exact`) — the hash-gateable closes of the `ivf_ann`/`pq_ann`
rows-only gates. Differential strategy: an exact pure-Python re-
implementation of the same integer pipeline (quantize → assign/encode →
probe/ADC → rank) must agree row-for-row, and recall vs global brute
force is floored on a clustered fixture."""

from __future__ import annotations

import math
import random

import pytest


def _quant(v, scale=1_000_000):
    return [
        math.floor(float(x) * scale + 0.5)
        if x >= 0
        else math.ceil(float(x) * scale - 0.5)
        for x in v
    ]


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _mk_vectors(n=120, dim=16, n_clusters=4, seed=7):
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) * 3 for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, 0.15) for x in c]))
    return rows


def _py_ivf(rows, qvec, k, n_seeds, nprobe):
    q = _quant(qvec)
    qs = sorted(rows)[:n_seeds]
    seeds = [_quant(v) for _, v in qs]
    probes = [
        j for _, j in sorted((_d2(s, q), j) for j, s in enumerate(seeds))[:nprobe]
    ]
    out = []
    for vid, v in rows:
        qv = _quant(v)
        cl = min((_d2(qv, s), j) for j, s in enumerate(seeds))[1]
        if cl in probes:
            out.append((_d2(qv, q), vid, cl))
    out.sort()
    return [(vid, cl, d) for d, vid, cl in out[:k]]


def test_ivf_probe_exact_matches_python_reference(spark):
    from revtron_utils_spark.operators.similarity import ivf_probe_exact

    rows = _mk_vectors()
    qvec = rows[3][1]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["vec_id"], r["cluster"], r["dist2"])
        for r in ivf_probe_exact(df, qvec, k=10, n_seeds=8, nprobe=2).collect()
    ]
    want = _py_ivf(rows, qvec, k=10, n_seeds=8, nprobe=2)
    assert got == want


def test_ivf_probe_exact_recall_vs_brute_force(spark):
    """On a well-clustered corpus the 2-of-8 probe keeps >= 7 of the
    true top-10 (the query's own cluster holds its neighbors)."""
    from revtron_utils_spark.operators.similarity import ivf_probe_exact

    rows = _mk_vectors(n=200, n_clusters=4, seed=11)
    qvec = rows[0][1]
    q = _quant(qvec)
    truth = sorted((_d2(_quant(v), q), vid) for vid, v in rows)[:10]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]
        for r in ivf_probe_exact(df, qvec, k=10, n_seeds=8, nprobe=2).collect()
    }
    assert len(got & {vid for _, vid in truth}) >= 7


def test_ivf_probe_plan_has_no_shuffle_before_topk(spark):
    """Assignment must be a literal-folded projection: no Exchange in
    the plan except the TakeOrderedAndProject's own driver merge."""
    from revtron_utils_spark.operators.similarity import ivf_probe_exact

    rows = _mk_vectors(n=60)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = (
        ivf_probe_exact(df, rows[0][1], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def _py_pq(rows, qvec, k, shortlist, m, n_codes):
    q = _quant(qvec)
    dim = len(q)
    sub = dim // m
    seeds = [_quant(v) for _, v in sorted(rows)[:n_codes]]
    books = [[s[j * sub : (j + 1) * sub] for s in seeds] for j in range(m)]
    qsubs = [q[j * sub : (j + 1) * sub] for j in range(m)]
    scored = []
    for vid, v in rows:
        qv = _quant(v)
        adc = 0
        for j in range(m):
            sv = qv[j * sub : (j + 1) * sub]
            code = min((_d2(sv, books[j][t]), t) for t in range(n_codes))[1]
            adc += _d2(qsubs[j], books[j][code])
        scored.append((adc, vid, _d2(qv, q)))
    scored.sort(key=lambda r: (r[0], r[1]))
    short = scored[:shortlist]
    short.sort(key=lambda r: (r[2], r[1]))
    return [(vid, adc, d) for adc, vid, d in short[:k]]


def test_pq_adc_exact_matches_python_reference(spark):
    from revtron_utils_spark.operators.pq import pq_adc_exact

    rows = _mk_vectors(n=100, dim=16, seed=3)
    qvec = rows[5][1]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["vec_id"], r["adc_dist2"], r["dist2"])
        for r in pq_adc_exact(
            df, qvec, k=10, shortlist=30, m=4, n_codes=16
        ).collect()
    ]
    want = _py_pq(rows, qvec, k=10, shortlist=30, m=4, n_codes=16)
    assert got == want


def test_pq_adc_exact_rerank_recall(spark):
    """The exact re-rank of the ADC shortlist keeps >= 8 of the true
    top-10 on a clustered corpus (ADC is lossy; the shortlist oversamples
    3x to compensate — the classic PQ-refine contract)."""
    from revtron_utils_spark.operators.pq import pq_adc_exact

    rows = _mk_vectors(n=150, dim=16, n_clusters=5, seed=13)
    qvec = rows[0][1]
    q = _quant(qvec)
    truth = {vid for _, vid in sorted((_d2(_quant(v), q), vid) for vid, v in rows)[:10]}
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]
        for r in pq_adc_exact(df, qvec, k=10, shortlist=30, m=4, n_codes=16).collect()
    }
    assert len(got & truth) >= 8


def test_pq_adc_exact_rejects_indivisible_dim(spark):
    from revtron_utils_spark.operators.pq import pq_adc_exact

    rows = [(i, [float(i)] * 10) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_adc_exact(df, [0.0] * 10, m=4, n_codes=4)
