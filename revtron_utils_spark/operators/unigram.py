"""Distributed unigram-LM subword tokenizer — the SentencePiece
unigram model (Kudo 2018, "Subword regularization"), as Viterbi-EM:
the second tokenizer trainer next to `operators/bpe.py`, sharing its
distribution strategy.

Algorithm (deterministic throughout):

1. **Seed vocabulary**: every substring of length 1..``max_len`` of
   the distinct-word table, weighted by word frequency; all single
   characters are kept unconditionally (coverage), plus the
   ``seed_keep`` most frequent multi-character substrings
   (ties break piece-ascending).
2. **EM rounds** (hard EM — each word takes its single best
   segmentation rather than the full forward-backward expectation;
   the standard practical simplification, documented deviation from
   the paper): E-step segments every DISTINCT word by Viterbi DP under
   current piece log-probabilities (an Arrow-batched Pandas UDF — the
   corpus is never touched by Python, only the Heaps-law-small word
   table); piece usage aggregates as one combinable ``groupBy(piece)
   .sum(wcount)``. M-step recomputes probabilities from usage, with
   +1 smoothing on single characters so coverage pieces never hit
   zero mass.
3. **Prune** to ``vocab_size``: all single characters + the most-used
   multi-character pieces (ties piece-ascending).

Training is iterative and not SQL-expressible — rows-only in the
oracle gate (the same exemption as ``bpe_learned``); exactness is
proven differentially against a pure-Python reference in
tests/test_unigram.py (identical float arithmetic: both sides score
segmentations with ``math.log`` sums in the same order, so Viterbi
ties resolve identically).

Scale posture mirrors BPE: the only full-corpus pass is the
distinct-word aggregation; every round runs on the word table
(vocab-sized Arrow UDF + one map-side-combinable aggregate); encoding
segments each distinct word once and joins the word→pieces map back
(AQE broadcasts it while it fits).

No analog in the reference (`/root/reference/revtron/` is a SQL/SOQL
generation layer); part of the LLM-data-pipeline extension.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_frequencies

# log-prob assigned to single characters absent from the vocabulary at
# encode time (unseen script in a new corpus): worse than any real
# piece, deterministic, keeps Viterbi total finite
UNK_LOGPROB = -100.0


def viterbi_pieces(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: DP over end
    positions, candidates scanned longest-piece-first so ties keep the
    longest piece (deterministic; the pure-Python reference must scan
    in the same order)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                lp = UNK_LOGPROB if len(piece) == 1 else None
                if lp is None:
                    continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _seed_counts(words: DataFrame, max_len: int) -> DataFrame:
    """(piece, count) for every substring of length 1..max_len, each
    occurrence weighted by the word's corpus frequency."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _subs(col):
        def subs(w):
            return [
                w[j : j + l]
                for l in range(1, max_len + 1)
                for j in range(len(w) - l + 1)
            ]

        return col.map(subs)

    return (
        words.withColumn("piece", F.explode(_subs(F.col("word"))))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("c"))
    )


def _prune(counts: list[tuple[str, int]], vocab_size: int) -> list[tuple[str, int]]:
    chars = [(p, c) for p, c in counts if len(p) == 1]
    multi = [(p, c) for p, c in counts if len(p) > 1]
    multi.sort(key=lambda pc: (-pc[1], pc[0]))
    keep = max(0, vocab_size - len(chars))
    return sorted(chars + multi[:keep])


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    max_len: int = 4,
    seed_keep: int = 2000,
    rounds: int = 3,
    min_count: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary; returns the final
    (piece, probability) list sorted piece-ascending."""
    spark = df.sparkSession
    words = word_frequencies(df, text_col, lowercase=lowercase).persist()
    try:
        seed_rows = _seed_counts(words, max_len).collect()
        if not seed_rows:
            return []
        seed = [(r["piece"], int(r["c"])) for r in seed_rows]
        chars = [(p, c) for p, c in seed if len(p) == 1]
        multi = [(p, c) for p, c in seed if len(p) > 1 and c >= min_count]
        multi.sort(key=lambda pc: (-pc[1], pc[0]))
        vocab = dict(sorted(chars + multi[:seed_keep]))

        for _ in range(rounds):
            total = float(sum(vocab.values()))
            logp = {p: math.log(c / total) for p, c in vocab.items() if c > 0}
            b_logp = spark.sparkContext.broadcast(logp)

            from pyspark.sql.functions import pandas_udf

            @pandas_udf("array<string>")
            def _seg(col):
                lp = b_logp.value
                return col.map(lambda w: viterbi_pieces(w, lp, max_len))

            used = (
                words.withColumn("piece", F.explode(_seg(F.col("word"))))
                .groupBy("piece")
                .agg(F.sum("wcount").alias("c"))
                .collect()
            )
            b_logp.unpersist()  # this round's dict is dead once collected
            counts = {r["piece"]: int(r["c"]) for r in used}
            # segmentation output is always a subset of the vocabulary
            # (every corpus character is seeded and survives pruning),
            # so rebuilding from vocab keys loses nothing.
            # coverage floor: single chars get +1 so they never vanish.
            new = {}
            for p in vocab:
                c = counts.get(p, 0)
                if len(p) == 1:
                    c += 1
                if c > 0:
                    new[p] = c
            vocab = dict(_prune(sorted(new.items()), vocab_size))

        total = float(sum(vocab.values()))
        return sorted((p, c / total) for p, c in vocab.items())
    finally:
        words.unpersist()


def unigram_encode(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pieces",
    max_len: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Segment documents with a learned vocabulary: each DISTINCT word
    is segmented once (Arrow UDF), the word→pieces map joins back, and
    pieces reassemble in token order — the bpe_encode pattern.

    ``max_len`` defaults to the longest learned piece — a fixed
    default smaller than the training window would silently make the
    longer pieces unreachable (everything still round-trips via
    shorter pieces, so nothing would error)."""
    from pyspark.sql.functions import pandas_udf

    from ..functions import text as TX

    spark = df.sparkSession
    logp = {p: math.log(pr) for p, pr in pieces if pr > 0}
    if max_len is None:
        max_len = max((len(p) for p in logp), default=1)
    b_logp = spark.sparkContext.broadcast(logp)

    @pandas_udf("array<string>")
    def _enc(col):
        lp = b_logp.value
        return col.map(lambda w: viterbi_pieces(w, lp, max_len))

    tok = TX.tokens(F.lower(F.col(text_col)) if lowercase else F.col(text_col))
    toks = df.select(F.col(id_col), F.posexplode(tok).alias("pos", "word"))
    words = toks.select("word").distinct().withColumn("pieces", _enc(F.col("word")))
    return (
        # no broadcast hint: vocabulary-sized map, AQE decides
        toks.join(words, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                ).pieces
            ).alias(out_col)
        )
    )
