"""Differential tests: the distributed BPE trainer/encoder must match a
pure-Python reference implementation of the published algorithm exactly
(merge table, tie-breaks, overlapping-run semantics, encodings)."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from revtron_utils_spark.functions import text as TX
from revtron_utils_spark.operators import bpe as B


def _ref_train(word_counts: dict[str, int], num_merges: int, min_pair_count: int = 2):
    """Reference Sennrich-style trainer over a word-frequency dict."""
    vocab = {tuple(list(w) + [B.END_OF_WORD]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # max count, then lexicographically smallest pair — the same
        # tie-break as the Spark orderBy
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        new_vocab = {}
        for sym, c in vocab.items():
            out, pend = [], None
            for s in sym:
                if pend == best[0] and s == best[1]:
                    out.append(best[0] + best[1])
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def small_docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
        .cache()
    )


def _word_counts(small_docs) -> dict[str, int]:
    rows = small_docs.select(
        F.explode(F.transform(TX.tokens("text"), F.lower)).alias("w")
    ).collect()
    return dict(Counter(r.w for r in rows))


def test_bpe_train_matches_reference(small_docs):
    wc = _word_counts(small_docs)
    want = _ref_train(wc, num_merges=25)
    got = B.bpe_train(small_docs, num_merges=25)
    assert got == want


def test_bpe_train_overlapping_runs(spark):
    df = spark.createDataFrame([(1, "aaa aaa aaa")], "doc_id long, text string")
    merges = B.bpe_train(df, num_merges=2, min_pair_count=2)
    # round 1: (a,a) wins; fold must produce [aa, a, </w>] per word —
    # leftmost-first, no overlap double-count
    assert merges[0] == ("a", "a")
    want = _ref_train({"aaa": 3}, num_merges=2)
    assert merges == want


def test_bpe_encode_matches_reference(small_docs):
    merges = B.bpe_train(small_docs, num_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r.doc_id: r.pieces
        for r in B.bpe_encode(small_docs, merges).collect()
    }
    rows = small_docs.select(
        "doc_id", F.transform(TX.tokens("text"), F.lower).alias("toks")
    ).collect()
    for r in rows:
        want = [p for w in r.toks for p in B.encode_word(w, ranks)]
        assert got[r.doc_id] == want, f"doc {r.doc_id}"


def test_bpe_encode_roundtrip_text(small_docs):
    # concatenating pieces and stripping the markers reproduces the
    # lowercased tokens — no characters lost or duplicated
    merges = B.bpe_train(small_docs, num_merges=15)
    enc = B.bpe_encode(small_docs, merges)
    joined = enc.select(
        "doc_id",
        F.array_join(
            F.transform(
                "pieces", lambda p: F.replace(p, F.lit(B.END_OF_WORD), F.lit(" "))
            ),
            "",
        ).alias("flat"),
    )
    orig = small_docs.select(
        "doc_id",
        F.concat(
            F.array_join(F.transform(TX.tokens("text"), F.lower), " "),
            F.lit(" "),
        ).alias("want"),
    )
    bad = (
        joined.join(orig, "doc_id")
        .where(F.col("flat") != F.col("want"))
        .count()
    )
    assert bad == 0


def test_bpe_train_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # tiny alphabet forces merge ties (the lexicographic tie-break is
    # the subtle part); repeated chars ("aaa") exercise the overlap fold
    word = st.text(alphabet="ab", min_size=1, max_size=5)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=corpus)
    def run(corpus):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
        )
        wc = _word_counts_from(corpus)
        assert B.bpe_train(df, num_merges=6) == _ref_train(wc, num_merges=6)

    run()


def _word_counts_from(corpus: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in corpus:
        for w in t.lower().split():
            c[w] += 1
    return dict(c)
