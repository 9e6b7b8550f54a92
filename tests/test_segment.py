"""RFM segmentation semantics (operators/segment.py): quartile-boundary
definition, tie sharing, recency inversion, python-model differential.
Corpus-scale value equality is covered by the `rfm_segments` gate."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from revtron_utils_spark.operators.segment import quartile_bounds, rfm_segments


def _bounds_py(xs):
    n = len(xs)
    out = []
    for k in (1, 2, 3):
        need = math.ceil(n * k / 4)
        s = sorted(xs)
        out.append(s[need - 1])
    return tuple(out)


def test_quartile_bounds_exact_definition(spark):
    xs = [1, 2, 3, 4, 5, 6, 7, 8]
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    r = quartile_bounds(df, "v").collect()[0]
    assert (r["q1"], r["q2"], r["q3"]) == (2, 4, 6) == _bounds_py(xs)


def test_quartile_bounds_with_heavy_ties(spark):
    xs = [5] * 10 + [9] * 2
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    r = quartile_bounds(df, "v").collect()[0]
    # cum(5)=10 ≥ ceil(12k/4) for k=1,2,3 → every boundary is 5
    assert (r["q1"], r["q2"], r["q3"]) == (5, 5, 5) == _bounds_py(xs)


def test_rfm_scores_invert_recency_and_share_ties(spark):
    # 4 entities, metrics engineered so each lands in its own quartile
    rows = [
        (10, 1, 100),  # oldest, least frequent, lowest spend
        (7, 2, 200),
        (4, 3, 300),
        (1, 4, 400),  # freshest, most frequent, top spend
    ]
    df = spark.createDataFrame(rows, ["rec", "frq", "mon"])
    segs = {r["segment"]: r for r in rfm_segments(df, "rec", "frq", "mon").collect()}
    # freshest entity: r=4 (inverted), f=4, m=4; oldest: 1-1-1
    assert "4-4-4" in segs and "1-1-1" in segs
    assert segs["4-4-4"]["n_entities"] == 1
    assert segs["4-4-4"]["avg_monetary"] == 400.0
    assert segs["1-1-1"]["avg_recency"] == 10.0
    # identical entities share one segment
    df2 = spark.createDataFrame([(3, 3, 3)] * 5, ["rec", "frq", "mon"])
    segs2 = rfm_segments(df2, "rec", "frq", "mon").collect()
    assert len(segs2) == 1 and segs2[0]["n_entities"] == 5


def test_rfm_python_model_differential(spark):
    import random

    rng = random.Random(13)
    rows = [
        (rng.randint(0, 60), rng.randint(1, 12), rng.randint(0, 50))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, ["rec", "frq", "mon"])
    rq = _bounds_py([r[0] for r in rows])
    fq = _bounds_py([r[1] for r in rows])
    mq = _bounds_py([r[2] for r in rows])
    model = {}
    for rec, frq, mon in rows:
        rs = 4 - sum(rec > q for q in rq)
        fs = 1 + sum(frq > q for q in fq)
        ms = 1 + sum(mon > q for q in mq)
        key = (rs, fs, ms)
        n, sr, sf_, sm = model.get(key, (0, 0, 0, 0))
        model[key] = (n + 1, sr + rec, sf_ + frq, sm + mon)
    got = rfm_segments(df, "rec", "frq", "mon").collect()
    assert len(got) == len(model)
    for r in got:
        n, sr, sf_, sm = model[(r["r_score"], r["f_score"], r["m_score"])]
        assert r["n_entities"] == n and r["sum_monetary"] == sm
        assert abs(r["avg_recency"] - round(sr / n, 4)) < 1e-9
        assert abs(r["avg_frequency"] - round(sf_ / n, 4)) < 1e-9
