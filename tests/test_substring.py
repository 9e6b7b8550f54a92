"""Duplicate-substring span mining: crafted-corpus boundaries, islands
merge, same-doc repeats, hashed-gram parity, and span stripping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.operators.substring import (
    duplicate_spans,
    strip_duplicate_spans,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_detected_with_exact_boundaries(spark):
    shared = "q w e r t y u i"  # 8 tokens, positions 2..9 in both docs
    docs = _mk(
        spark,
        [(1, f"a1 b1 {shared} c1 d1"), (2, f"a2 b2 {shared} c2 d2")],
    )
    spans = duplicate_spans(docs, k=4).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in spans} == {
        (1, 2, 9, 8),
        (2, 2, 9, 8),
    }


def test_within_doc_repeat_counts_toward_min_count(spark):
    docs = _mk(spark, [(1, "x y z w a b x y z w"), (2, "unrelated words here only")])
    spans = duplicate_spans(docs, k=4).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans} == {
        (1, 0, 3),
        (1, 6, 9),
    }


def test_adjacent_windows_merge_into_one_island(spark):
    # two docs sharing a 6-token run: with k=3 the run yields 4
    # overlapping windows that must merge to a single maximal span
    docs = _mk(spark, [(1, "p q r s t u"), (2, "p q r s t u")])
    spans = duplicate_spans(docs, k=3).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in spans} == {
        (1, 0, 5, 6),
        (2, 0, 5, 6),
    }


def test_short_docs_and_no_duplicates(spark):
    docs = _mk(spark, [(1, "only three tokens"), (2, "all fresh words entirely new")])
    assert duplicate_spans(docs, k=4).count() == 0


def test_hash_grams_matches_exact_on_small_corpus(spark):
    docs = _mk(
        spark,
        [(i, f"d{i} lead in the same old shared trailing run tail{i}") for i in range(6)],
    )
    exact = set(map(tuple, duplicate_spans(docs, k=4).collect()))
    hashed = set(map(tuple, duplicate_spans(docs, k=4, hash_grams=True).collect()))
    assert exact == hashed and exact


def test_strip_removes_exactly_span_tokens(spark):
    shared = "q w e r t y u i"
    docs = _mk(
        spark,
        [
            (1, f"a1 b1 {shared} c1 d1"),
            (2, f"a2 b2 {shared} c2 d2"),
            (3, "untouched totally unique document text"),
        ],
    )
    out = strip_duplicate_spans(docs, k=4).collect()
    by_id = {r["doc_id"]: r["clean_text"] for r in out}
    assert by_id[1] == "a1 b1 c1 d1"
    assert by_id[2] == "a2 b2 c2 d2"
    assert by_id[3] == "untouched totally unique document text"


def test_fixture_corpus_spans_cover_known_duplicates(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, k=5)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n"), F.max("span_tokens").alias("longest")
    ).first()
    assert agg["n"] > 0
    assert agg["longest"] >= 5


# ------------------------------------------------ hypothesis differential


def _py_duplicate_spans(docs: list[tuple[int, str]], k: int, min_count: int = 2):
    """Pure-python reference: gram counting + per-doc islands merge."""
    from collections import Counter

    grams: list[tuple[int, int, tuple[str, ...]]] = []
    counts: Counter = Counter()
    for doc_id, text in docs:
        toks = text.split()
        for i in range(len(toks) - k + 1):
            g = tuple(toks[i : i + k])
            grams.append((doc_id, i, g))
            counts[g] += 1
    spans = []
    hits: dict[int, list[int]] = {}
    for doc_id, pos, g in grams:
        if counts[g] >= min_count:
            hits.setdefault(doc_id, []).append(pos)
    for doc_id, poss in hits.items():
        poss.sort()
        start, end = poss[0], poss[0] + k - 1
        for p in poss[1:]:
            if p <= end + 1:
                end = max(end, p + k - 1)
            else:
                spans.append((doc_id, start, end, end - start + 1))
                start, end = p, p + k - 1
        spans.append((doc_id, start, end, end - start + 1))
    return sorted(spans)


def test_duplicate_spans_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # tiny alphabet forces heavy gram collisions; short docs force the
    # n<k empty path; k in 2..4 exercises overlap/adjacency merging
    doc = st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=18).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=8)

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=corpus, k=st.integers(min_value=2, max_value=4))
    def run(texts, k):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in duplicate_spans(df, k=k).collect()
        )
        assert got == _py_duplicate_spans(rows, k)

    run()


def test_strip_handles_empty_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x y z w x y z w"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["clean_text"] for r in strip_duplicate_spans(docs, k=4).collect()}
    assert out[1] == ""  # whole doc is a duplicated span (internal repeat)
    assert out[2] == "" and out[3] == ""
