"""BM25 retrieval: hand-computed scores, ranking invariants, and the
fixture-corpus top-k path."""

from __future__ import annotations

import pytest

from revtron_utils_spark.operators.retrieval import bm25_scores, bm25_topk


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry apple"),
        ],
        "doc_id long, text string",
    )


def test_bm25_hand_computed(tiny):
    # N=3, avgdl=3; df(apple)=2 -> idf=0.6
    # d1: tf=2, dl=3 -> 0.6 * 4.4/3.2 = 0.825
    # d3: tf=1, dl=4 -> 0.6 * 2.2/2.5 = 0.528
    rows = {r["doc_id"]: r["bm25"] for r in bm25_scores(tiny, ["apple"]).collect()}
    assert set(rows) == {1, 3}  # d2 has no query term => absent
    assert rows[1] == pytest.approx(0.825, abs=1e-9)
    assert rows[3] == pytest.approx(0.528, abs=1e-9)


def test_bm25_multi_term_is_fixed_order_sum(tiny):
    single = {
        t: {r["doc_id"]: r["bm25"] for r in bm25_scores(tiny, [t]).collect()}
        for t in ("apple", "cherry")
    }
    both = {r["doc_id"]: r["bm25"] for r in bm25_scores(tiny, ["apple", "cherry"]).collect()}
    for d in both:
        expect = single["apple"].get(d, 0.0) + single["cherry"].get(d, 0.0)
        assert both[d] == pytest.approx(expect, abs=1e-6)


def test_bm25_topk_order_and_tiebreak(tiny):
    got = bm25_topk(tiny, ["apple", "banana", "cherry"], k=3).collect()
    scores = [r["bm25"] for r in got]
    assert scores == sorted(scores, reverse=True)
    # ties (if any) broken by ascending doc_id
    for a, b in zip(got, got[1:]):
        if a["bm25"] == b["bm25"]:
            assert a["doc_id"] < b["doc_id"]


def test_bm25_rejects_empty_query(tiny):
    with pytest.raises(ValueError):
        bm25_scores(tiny, [])


def test_bm25_case_insensitive(spark):
    df = spark.createDataFrame([(1, "Apple APPLE"), (2, "pear")], "doc_id long, text string")
    rows = bm25_scores(df, ["aPpLe"]).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_bm25_fixture_topk(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, ["spark", "join", "stream"], k=15).collect()
    assert len(out) == 15
    assert all(r["bm25"] > 0 for r in out)
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)


# ------------------------------------------------------- RRF fusion


def test_rrf_fuse_hand_computed(spark):
    from revtron_utils_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], "doc_id long, rank int")
    got = {r.doc_id: r.rrf_int for r in rrf_fuse([a, b], k=60).collect()}
    s = 10**12
    assert got == {
        1: s // 61 + s // 62,
        2: s // 62,
        3: s // 63 + s // 61,
        4: s // 63,
    }


def test_rrf_fuse_order_and_topn(spark):
    from revtron_utils_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rank int")
    out = rrf_fuse([a], topn=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]


def test_hybrid_topk_both_legs_beat_single(spark):
    from revtron_utils_spark.operators.retrieval import hybrid_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana"),
            (2, "apple apple apple"),
            (3, "pear plum quince"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_topk(docs, emb, ["apple"], [1.0, 0.0], k_each=3, topn=3).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 1 appears in both legs (has "apple", similar vector) -> top
    assert out[0].doc_id == 1
    assert by_id[1].bm25_rank is not None and by_id[1].cos_rank is not None
    # doc 3 misses the lexical leg -> NULL bm25_rank, present cos_rank
    assert by_id[3].bm25_rank is None and by_id[3].cos_rank is not None
    # fused score is exactly the sum of the integer contributions
    s = 10**12
    for r in out:
        want = (s // (60 + r.bm25_rank) if r.bm25_rank else 0) + (
            s // (60 + r.cos_rank) if r.cos_rank else 0
        )
        assert r.rrf_int == want


# ---------------------------------------------------- collocations


def test_collocations_hand_computed(spark):
    from revtron_utils_spark.operators.retrieval import collocations

    # corpus: "a b" x3 and "a c" x1 -> bigrams: (a,b)x3, (a,c)x1
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    got = {(r.w1, r.w2): (r.n_pair, r.lift) for r in collocations(docs, min_count=1).collect()}
    # N_uni=8, N_bi=4, c(a)=4, c(b)=3, c(c)=1
    assert got[("a", "b")] == (3, round(3.0 * 8 * 8 / 4 / 4 / 3, 6))
    assert got[("a", "c")] == (1, round(1.0 * 8 * 8 / 4 / 4 / 1, 6))


def test_collocations_min_count_and_case(spark):
    from revtron_utils_spark.operators.retrieval import collocations

    docs = spark.createDataFrame(
        [(1, "New York"), (2, "new york"), (3, "old town")],
        "doc_id long, text string",
    )
    got = {(r.w1, r.w2): r.n_pair for r in collocations(docs, min_count=2).collect()}
    # case-folded: "new york" appears twice; "old town" filtered by min_count
    assert got == {("new", "york"): 2}
