"""Differential tests for the unigram-LM tokenizer
(`operators/unigram.py`) against a pure-Python reference — the BPE
suite's strategy: an independent reimplementation of the full training
loop (seed → Viterbi-EM → prune), compared value-for-value. Both sides
score segmentations as ``math.log`` sums in the same candidate order,
so float ties resolve identically."""

from __future__ import annotations

import math
from collections import Counter

from revtron_utils_spark.operators.unigram import (
    UNK_LOGPROB,
    unigram_encode,
    unigram_train,
    viterbi_pieces,
)


def _ref_viterbi(word, logp, max_len):
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            if piece in logp:
                lp = logp[piece]
            elif len(piece) == 1:
                lp = UNK_LOGPROB
            else:
                continue
            if best[j] + lp > best[i]:
                best[i] = best[j] + lp
                back[i] = j
    out, i = [], n
    while i > 0:
        out.append(word[back[i] : i])
        i = back[i]
    return out[::-1]


def _ref_train(corpus, vocab_size=400, max_len=4, seed_keep=2000, rounds=3, min_count=2):
    wc = Counter()
    for t in corpus:
        for w in t.lower().split():
            wc[w] += 1
    if not wc:
        return []
    seed = Counter()
    for w, c in wc.items():
        for l in range(1, max_len + 1):
            for j in range(len(w) - l + 1):
                seed[w[j : j + l]] += c
    chars = sorted((p, c) for p, c in seed.items() if len(p) == 1)
    multi = [(p, c) for p, c in seed.items() if len(p) > 1 and c >= min_count]
    multi.sort(key=lambda pc: (-pc[1], pc[0]))
    vocab = dict(sorted(chars + multi[:seed_keep]))
    for _ in range(rounds):
        total = float(sum(vocab.values()))
        logp = {p: math.log(c / total) for p, c in vocab.items() if c > 0}
        counts = Counter()
        for w, c in wc.items():
            for piece in _ref_viterbi(w, logp, max_len):
                counts[piece] += c
        new = {}
        for p in vocab:
            c = counts.get(p, 0)
            if len(p) == 1:
                c += 1
            if c > 0:
                new[p] = c
        ch = sorted((p, c) for p, c in new.items() if len(p) == 1)
        mu = [(p, c) for p, c in new.items() if len(p) > 1]
        mu.sort(key=lambda pc: (-pc[1], pc[0]))
        keep = max(0, vocab_size - len(ch))
        vocab = dict(sorted(ch + mu[:keep]))
    total = float(sum(vocab.values()))
    return sorted((p, c / total) for p, c in vocab.items())


CORPUS = [
    "the cattle sat on the mat",
    "the cat sat",
    "battle rattle cattle",
    "the mat the mat the mat",
    "",
    "a",
]


def test_train_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = unigram_train(df, vocab_size=40, seed_keep=60, rounds=3)
    ref = _ref_train(CORPUS, vocab_size=40, seed_keep=60, rounds=3)
    assert got == ref
    # multi-char pieces actually learned (not a char-only degenerate)
    assert any(len(p) > 1 for p, _ in got)
    # every corpus character survives pruning (coverage invariant)
    chars = {c for t in CORPUS for c in t.lower() if not c.isspace()}
    assert chars <= {p for p, _ in got if len(p) == 1}


def test_train_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=5,
    )

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=corpus, vs=st.sampled_from([8, 20]))
    def run(corpus, vs):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
        )
        assert unigram_train(df, vocab_size=vs, seed_keep=30, rounds=2) == _ref_train(
            corpus, vocab_size=vs, seed_keep=30, rounds=2
        )

    run()


def test_encode_roundtrip_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    pieces = unigram_train(df, vocab_size=40, seed_keep=60, rounds=2)
    enc = unigram_encode(df, pieces)
    rows = {r.doc_id: r.pieces for r in enc.collect()}
    # concatenated pieces reproduce each document's token stream
    for i, t in enumerate(CORPUS):
        toks = t.lower().split()
        if not toks:
            assert i not in rows  # token-less docs have no rows
            continue
        assert "".join(rows[i]) == "".join(toks)
    # identical inputs produce identical encodings (determinism)
    rows2 = {r.doc_id: r.pieces for r in unigram_encode(df, pieces).collect()}
    assert rows == rows2


def test_encode_oov_falls_back_to_chars(spark):
    df = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    pieces = unigram_train(df, vocab_size=10, seed_keep=10, rounds=1)
    oov = spark.createDataFrame([(7, "zq aa")], "doc_id long, text string")
    out = {r.doc_id: r.pieces for r in unigram_encode(oov, pieces).collect()}
    assert "".join(out[7]) == "zqaa"
    assert "z" in out[7] and "q" in out[7]  # unseen chars segment singly


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_train(empty) == []


def test_viterbi_prefers_longest_on_ties():
    # two segmentations with equal score: scan order keeps the longest
    # first piece; reference and operator must agree by construction
    logp = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    assert viterbi_pieces("ab", logp, 2) == ["ab"]
