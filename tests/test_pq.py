"""Product-quantization ANN (operators/pq.py): codebook determinism,
encode shape, ADC ordering, and the shortlist→exact-re-rank pipeline's
recall against brute force."""

from __future__ import annotations

import numpy as np
import pytest

from revtron_utils_spark.operators.pq import PQIndex


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    return read_table(spark, sf_dir, "embeddings").persist()


@pytest.fixture(scope="module")
def index(emb):
    return PQIndex.train(emb, m=8, k=64, seed=42)


def test_train_is_deterministic_and_shaped(emb, index):
    again = PQIndex.train(emb, m=8, k=64, seed=42)
    assert index.codebooks == again.codebooks
    assert index.m == 8 and index.k == 64 and index.subdim == index.dim // 8


def test_encode_codes_shape_and_range(emb, index):
    enc = index.encode(emb)
    rows = enc.select("pq_codes").collect()
    assert all(len(r.pq_codes) == index.m for r in rows)
    flat = [c for r in rows for c in r.pq_codes]
    assert min(flat) >= 0 and max(flat) < index.k


def test_encode_is_nearest_codebook_row(emb, index):
    # spot-check a handful of rows against a numpy argmin
    sample = emb.orderBy("vec_id").limit(5).collect()
    enc = {r.vec_id: r.pq_codes for r in index.encode(emb).orderBy("vec_id").limit(5).collect()}
    sub = index.subdim
    for r in sample:
        x = np.asarray(r.embedding, dtype=np.float64)
        x = x / np.linalg.norm(x)
        for j in range(index.m):
            xj = x[j * sub : (j + 1) * sub]
            C = np.array(index.codebooks[j])
            want = int(((C - xj[None, :]) ** 2).sum(axis=1).argmin())
            assert enc[r.vec_id][j] == want


def test_adc_topk_orders_ascending_with_tiebreak(emb, index):
    q = emb.orderBy("vec_id").first().embedding
    enc = index.encode(emb)
    got = index.topk(enc, list(q), k=20).collect()
    dists = [r.approx_dist for r in got]
    assert dists == sorted(dists)
    for a, b in zip(got, got[1:]):
        if a.approx_dist == b.approx_dist:
            assert a.vec_id < b.vec_id


def test_rerank_reproduces_exact_topk(emb, index):
    from revtron_utils_spark.operators.similarity import cosine_topk

    enc = index.encode(emb).persist()
    # the first query point reproduces brute force exactly; across a
    # 5-query panel the pipeline's mean recall@10 stays high (random
    # 64-dim data is PQ's worst case — real embeddings cluster)
    q0 = list(emb.orderBy("vec_id").first().embedding)
    got = [(r.vec_id, r.cosine) for r in index.rerank_topk(enc, q0, k=10, shortlist=50).collect()]
    want = [(r.vec_id, r.cosine) for r in cosine_topk(emb, q0, k=10).collect()]
    assert got == want
    recalls = []
    for qid_row in emb.orderBy("vec_id").limit(5).collect():
        q = list(qid_row.embedding)
        g = {r.vec_id for r in index.rerank_topk(enc, q, k=10, shortlist=100).collect()}
        w = {r.vec_id for r in cosine_topk(emb, q, k=10).collect()}
        recalls.append(len(g & w) / 10)
    assert sum(recalls) / len(recalls) >= 0.8
    enc.unpersist()


def test_shortlist_recall_floor(emb, index):
    # even the RAW ADC shortlist (no re-rank) must recall most of the
    # exact top-10 — random 64-dim data is PQ's worst case, so the floor
    # is modest; the re-rank pipeline above is the production contract
    rows = emb.collect()
    X = np.array([r.embedding for r in rows])
    ids = np.array([r.vec_id for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    q = Xn[int(np.argmin(ids))]
    exact10 = set(ids[np.argsort(-(Xn @ q), kind="stable")[:10]].tolist())
    enc = index.encode(emb)
    short = {r.vec_id for r in index.topk(enc, X[int(np.argmin(ids))].tolist(), k=50).collect()}
    assert len(exact10 & short) / 10 >= 0.8


def test_dim_mismatch_raises(emb, index):
    with pytest.raises(ValueError):
        index.adc_distance([0.0] * 3)
    with pytest.raises(ValueError):
        PQIndex.train(emb, m=7)  # 64 % 7 != 0


def test_zero_norm_vector_encodes(spark, index):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] + [0.0] * 63)], "vec_id long, embedding array<float>"
    )
    rows = index.encode(df).collect()
    assert all(len(r.pq_codes) == index.m for r in rows)
