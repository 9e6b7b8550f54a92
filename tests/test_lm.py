"""Differential tests for the stupid-backoff n-gram LM scorer
(`operators/lm.py`) against a pure-Python reference — the same
strategy as the BPE suite: an independent reimplementation of the
model, compared value-for-value."""

from __future__ import annotations

import decimal
from collections import Counter

import pytest

from revtron_utils_spark.operators.lm import ngram_lm_score

SCALE = 1_000_000


def _ref_scores(docs, n=3, alpha=0.4, min_count=1, lm_docs=None):
    """Pure-Python stupid backoff with HALF_UP quantization (Spark and
    DuckDB both round half up; Python's built-in round is banker's)."""
    toksd = {i: t.lower().split() for i, t in docs}
    corpus = lm_docs if lm_docs is not None else docs
    cnt = {k: Counter() for k in range(1, n + 1)}
    for _, t in corpus:
        ws = t.lower().split()
        for k in range(1, n + 1):
            for j in range(len(ws) - k + 1):
                cnt[k][" ".join(ws[j : j + k])] += 1
    for k in range(2, n + 1):
        cnt[k] = Counter({g: c for g, c in cnt[k].items() if c >= min_count})
    T, V = sum(cnt[1].values()), len(cnt[1])

    def S(ws, i):
        avail = min(i + 1, n)
        for k in range(avail, 1, -1):
            g = " ".join(ws[i - k + 1 : i + 1])
            d = " ".join(ws[i - k + 1 : i])
            if cnt[k][g] > 0:
                return (cnt[k][g] / cnt[k - 1][d]) * (alpha ** (avail - k))
        return ((cnt[1][ws[i]] + 1) / (T + V)) * (alpha ** (avail - 1))

    out = {}
    for i, _ in docs:
        ws = toksd[i]
        if not ws:
            continue
        s = sum(
            int(
                decimal.Decimal(SCALE * S(ws, p)).quantize(
                    0, rounding=decimal.ROUND_HALF_UP
                )
            )
            for p in range(len(ws))
        )
        out[i] = (len(ws), s / (len(ws) * SCALE))
    return out


CORPUS = [
    ("a", "the cat sat on the mat"),
    ("b", "the cat sat"),
    ("c", "zebra quark"),
    ("d", "the"),
    ("e", ""),
    ("f", "the cat sat on the mat the cat sat"),
    ("g", "ON the MAT the cat sat"),  # case folding
    ("h", "a a a a"),  # self-overlapping grams
]


def _collect(df):
    return {r[0]: (r[1], r[2]) for r in df.collect()}


@pytest.mark.parametrize("n", [2, 3, 4])
def test_matches_python_reference(spark, n):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    got = _collect(ngram_lm_score(df, n=n))
    assert got == _ref_scores(CORPUS, n=n)


def test_min_count_floor(spark):
    # the floor prunes singleton bigrams/trigrams -> those positions
    # back off; unigrams stay complete (Laplace base). The shared floor
    # preserves the prefix property, so no NULL/0 division anywhere.
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    got = _collect(ngram_lm_score(df, n=3, min_count=2))
    assert got == _ref_scores(CORPUS, n=3, min_count=2)
    # pruning must change scores for docs whose grams were floored away
    unpruned = _collect(ngram_lm_score(df, n=3))
    assert got != unpruned


def test_separate_lm_corpus(spark):
    # train on the fluent half, score everything: unseen scoring vocab
    # exercises the Laplace-unseen path (count 0 -> 1/(T+V))
    lm = [d for d in CORPUS if d[0] in ("a", "b", "f")]
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    lm_df = spark.createDataFrame(lm, "doc_id string, text string")
    got = _collect(ngram_lm_score(df, lm_docs=lm_df, n=3))
    assert got == _ref_scores(CORPUS, n=3, lm_docs=lm)
    # fluent (in-domain) docs must outscore the unseen-vocab doc
    assert got["a"][1] > got["c"][1]


def test_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id string, text string")
    out = ngram_lm_score(empty, n=3)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_tokens", "lm_score"]
    # empty LM corpus scoring a non-empty frame: no vocabulary, no rows
    df = spark.createDataFrame(CORPUS[:2], "doc_id string, text string")
    assert ngram_lm_score(df, lm_docs=empty, n=3).collect() == []


def test_n_below_two_rejected(spark):
    df = spark.createDataFrame(CORPUS[:1], "doc_id string, text string")
    with pytest.raises(ValueError):
        ngram_lm_score(df, n=1)


def test_scores_bounded_and_fluency_ordering(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    got = _collect(ngram_lm_score(df, n=3))
    for _, (_, s) in got.items():
        assert 0.0 < s <= 1.0
    # a repeated fluent sentence scores near the top; random vocab low
    assert got["f"][1] > got["c"][1]


def test_include_sum_consistency(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    rows = ngram_lm_score(df, n=3, include_sum=True).collect()
    assert [f.name for f in ngram_lm_score(df, n=3, include_sum=True).schema.fields] == [
        "doc_id",
        "n_tokens",
        "lm_score",
        "score_sum_int",
    ]
    for r in rows:
        # the double mean IS the integer sum divided out — one IEEE op
        assert r.lm_score == r.score_sum_int / (r.n_tokens * SCALE)
    # empty-corpus path carries the extra column too
    empty = spark.createDataFrame([], "doc_id string, text string")
    out = ngram_lm_score(empty, n=3, include_sum=True)
    assert out.collect() == [] and out.schema.fieldNames()[-1] == "score_sum_int"


def test_perplexity_filter_composition(spark, sf_dir):
    # the composed CCNet shape: integer milli-score ranking keeps ~the
    # top half per language, and every kept doc clears its group median
    import __spark_entry__ as m

    out = m.queries()["perplexity_filter"](spark, sf_dir)
    kept = out.collect()
    assert kept and set(out.columns) == {"doc_id", "lang", "lm_milli"}
    total = m.queries()["lm_score"](spark, sf_dir).count()
    assert 0.4 * total <= len(kept) <= 0.65 * total
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r.lm_milli)
    for lang, vals in by_lang.items():
        assert min(vals) >= 0


def test_lm_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # tiny alphabet maximizes gram collisions (the backoff cascade's
    # interesting region); single-char words and repeats ("a a a")
    # exercise overlapping grams and count floors
    word = st.text(alphabet="abA ", min_size=1, max_size=4).map(
        lambda s: s.replace(" ", "")
    )
    corpus = st.lists(
        st.lists(word, min_size=0, max_size=7).map(" ".join),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=corpus, n=st.sampled_from([2, 3]), mc=st.sampled_from([1, 2]))
    def run(corpus, n, mc):
        docs = [(str(i), t) for i, t in enumerate(corpus)]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = _collect(ngram_lm_score(df, n=n, min_count=mc))
        assert got == _ref_scores(docs, n=n, min_count=mc)

    run()


# ---------------------------------------------------------------- KN


def _ref_kn(docs, lm_docs=None, D=0.75):
    """Independent interpolated-KN trigram reference (continuation
    counts per Chen & Goodman), HALF_UP quantization. The context
    count c(uv.) is the trigram-occurrence sum, NOT the raw bigram
    count — a doc-final-only bigram is not a context."""
    corpus = lm_docs if lm_docs is not None else docs
    cc, c3 = Counter(), Counter()
    tri, bi = set(), set()
    uni = set()
    for _, t in corpus:
        ws = t.lower().split()
        uni.update(ws)
        for j in range(len(ws) - 1):
            bi.add((ws[j], ws[j + 1]))
        for j in range(len(ws) - 2):
            c3[(ws[j], ws[j + 1], ws[j + 2])] += 1
            cc[(ws[j], ws[j + 1])] += 1
            tri.add((ws[j], ws[j + 1], ws[j + 2]))
    n1p1 = Counter(w for _, w in bi)                 # distinct predecessors
    n1p2 = Counter((v, w) for _, v, w in tri)        # distinct left ctx of vw
    n1mid = Counter(v for _, v, _ in tri)            # trigram types with middle v
    n1fmid = Counter()                               # distinct followers of middle v
    for v, ws_ in Counter((v, w) for _, v, w in tri).keys():
        n1fmid[v] += 1
    n1f2 = Counter((u, v) for u, v, _ in tri)        # distinct continuations of uv
    B, V = len(bi), len(uni)

    def p1(w):
        return (n1p1[w] + 1) / (B + V)

    def p2(w, v):
        if n1mid[v] == 0:
            return p1(w)
        return max(n1p2[(v, w)] - D, 0.0) / n1mid[v] + ((D * n1fmid[v]) / n1mid[v]) * p1(w)

    def p3(w, u, v):
        if cc[(u, v)] == 0:
            return p2(w, v)
        return max(c3[(u, v, w)] - D, 0.0) / cc[(u, v)] + (
            (D * n1f2[(u, v)]) / cc[(u, v)]
        ) * p2(w, v)

    out = {}
    for i, t in docs:
        ws = t.lower().split()
        if not ws:
            continue
        s = 0
        for p in range(len(ws)):
            if p == 0:
                val = p1(ws[0])
            elif p == 1:
                val = p2(ws[1], ws[0])
            else:
                val = p3(ws[p], ws[p - 2], ws[p - 1])
            s += int(
                decimal.Decimal(SCALE * val).quantize(
                    0, rounding=decimal.ROUND_HALF_UP
                )
            )
        out[i] = (len(ws), s / (len(ws) * SCALE))
    return out


def test_kn_matches_python_reference(spark):
    from revtron_utils_spark.operators.lm import kneser_ney_score

    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    got = _collect(kneser_ney_score(df))
    assert got == _ref_kn(CORPUS)


def test_kn_separate_corpus_and_empty(spark):
    from revtron_utils_spark.operators.lm import kneser_ney_score

    lm = [d for d in CORPUS if d[0] in ("a", "b", "f")]
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    lm_df = spark.createDataFrame(lm, "doc_id string, text string")
    got = _collect(kneser_ney_score(df, lm_docs=lm_df))
    assert got == _ref_kn(CORPUS, lm_docs=lm)
    assert got["a"][1] > got["c"][1]  # in-domain outscores unseen vocab
    empty = spark.createDataFrame([], "doc_id string, text string")
    out = kneser_ney_score(df, lm_docs=empty)
    assert out.collect() == []
    assert out.schema.fieldNames() == ["doc_id", "n_tokens", "kn_score"]


def test_kn_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from revtron_utils_spark.operators.lm import kneser_ney_score

    word = st.text(alphabet="ab", min_size=1, max_size=3)
    corpus = st.lists(
        st.lists(word, min_size=0, max_size=7).map(" ".join),
        min_size=1,
        max_size=5,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=corpus)
    def run(corpus):
        docs = [(str(i), t) for i, t in enumerate(corpus)]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = _collect(kneser_ney_score(df))
        assert got == _ref_kn(docs)

    run()


def test_kn_doc_final_context_backs_off(spark):
    # "x y" is attested ONLY document-finally: it never acts as a
    # trigram context, so scoring "x y z" must fall through to p2 for
    # z, not assign probability 0 (below gibberish). Regression for
    # the context-count-vs-bigram-count defect.
    from revtron_utils_spark.operators.lm import kneser_ney_score

    lm = [("t", "x y")]
    score_docs = [("s1", "x y z"), ("s2", "q r z")]
    df = spark.createDataFrame(score_docs, "doc_id string, text string")
    lm_df = spark.createDataFrame(lm, "doc_id string, text string")
    got = _collect(kneser_ney_score(df, lm_docs=lm_df))
    assert got == _ref_kn(score_docs, lm_docs=lm)
    # the attested-context doc must not score below the gibberish doc
    assert got["s1"][1] >= got["s2"][1]
    assert got["s1"][1] > 0
