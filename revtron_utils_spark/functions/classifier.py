"""Model-free document scoring: a hashed-feature linear classifier and
Gopher-style heuristic quality rules — the two standard pre-training
corpus filters that need no model artifact on the cluster.

* **hashed_linear_score** — the fastText/Vowpal-Wabbit hashing trick
  (Weinberger et al., "Feature hashing for large scale multitask
  learning", ICML 2009): each token hashes into one of ``dim`` buckets
  and the document score is the mean bucket weight. Weights here come
  from a deterministic pseudo-random formula (a stand-in for a trained
  weight vector — swap `weight_expr` for a broadcast lookup when real
  weights exist); everything is integer arithmetic inside codegen, so
  scores are bit-reproducible across engines and hash-verify against a
  DuckDB oracle.
* **gopher_quality_flags** — the rule set of Rae et al., "Scaling
  language models: ... Gopher" (arXiv:2112.11446, App. A1.1), re-cast as
  exact integer comparisons (``3n ≤ Σlen ≤ 10n`` instead of a float mean)
  so every flag is engine-exact: word count bounds, mean-word-length
  bounds, ≥80% words alphabetic, ≤10% hash/ellipsis symbol words, ≥2
  stopword hits.

100-TB posture: per-document column expressions only — no shuffle, no
Python, no UDF; filters compose with predicate pushdown (a `WHERE
keep` on top of the scorer prunes at the scan when the score column is
materialized). Cost is O(tokens · token_len) per document, embarrassingly
parallel.

Reference parity: no analog in `/root/reference/revtron` (a SQL/SOQL
client); this is the LLM-data-pipeline extension surface from the build
brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import text as TX

POLY_MOD = 1_000_000_007
POLY_BASE = 31
_WEIGHT_MULT = 2654435761
_WEIGHT_MOD = 2_000_001  # weights land in [-1e6, 1e6]
_WEIGHT_SHIFT = 1_000_000

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def token_poly_hash(tok: Column) -> Column:
    """Per-token polynomial rolling hash over lowercased character codes
    — the same ``(acc*31 + ascii) % 1e9+7`` fold as
    `text.rolling_hash`, proven bit-equal to the DuckDB ``list_reduce``
    oracle on these fixtures."""
    chars = F.filter(F.split(F.lower(tok), "(?!^)"), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * POLY_BASE + F.ascii(ch)) % POLY_MOD,
    )


def hashed_bucket(tok: Column, dim: int = 4096) -> Column:
    return token_poly_hash(tok) % dim


def pseudo_weight(bucket: Column, seed: int = 0) -> Column:
    """Deterministic integer weight in [-1e6, 1e6] for a bucket id —
    the placeholder for a trained weight vector. ((b+seed+1) * Knuth
    multiplier) mod 2e6+1, shifted to zero-mean; max intermediate
    ≈ 4e3·2.7e9 ≈ 1.1e13, inside int64 under ANSI mode."""
    return ((bucket + F.lit(seed + 1)) * F.lit(_WEIGHT_MULT)) % F.lit(
        _WEIGHT_MOD
    ) - F.lit(_WEIGHT_SHIFT)


def hashed_linear_score_num(
    col: Column | str, dim: int = 4096, seed: int = 0
) -> Column:
    """Integer numerator of the document score: Σ over tokens of the
    hashed bucket's weight. Exact (int64) — comparisons against 0 are
    engine-exact; divide by ``n_tokens * 1e6`` for the mean-weight score."""
    toks = TX.tokens(col)
    return F.aggregate(
        F.transform(toks, lambda t: pseudo_weight(hashed_bucket(t, dim), seed)),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )


def hashed_linear_score(
    col: Column | str, dim: int = 4096, seed: int = 0
) -> Column:
    """Mean hashed-feature weight in [-1, 1], rounded to 1e-6 (the same
    quantized-rational trick the vector oracles use). Empty docs → 0.0."""
    n = TX.token_count(col)
    num = hashed_linear_score_num(col, dim, seed)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(num / (n.cast("double") * F.lit(1_000_000.0)), 6)
    )


def gopher_quality_flags(
    col: Column | str,
    min_words: int = 20,
    max_words: int = 100_000,
    stopwords: list[str] | None = None,
) -> Column:
    """Struct of Gopher-style boolean quality flags, all computed as
    exact integer comparisons. ``pass_all`` is the conjunction — the
    document survives the filter."""
    toks = TX.tokens(col)
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    n_sym = F.size(
        F.filter(toks, lambda t: t.startswith("#") | t.contains("..."))
    )
    stops = F.array(*[F.lit(s) for s in (stopwords or GOPHER_STOPWORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    f_words = (n >= min_words) & (n <= max_words)
    # 3 <= mean word length <= 10, exactly: 3n <= Σlen <= 10n
    f_mwl = (sum_len >= 3 * n.cast("long")) & (sum_len <= 10 * n.cast("long"))
    f_alpha = n_alpha * 5 >= n * 4        # >= 80% words contain a letter
    f_sym = n_sym * 10 <= n               # <= 10% hash/ellipsis words
    f_stop = n_stop >= 2                  # >= 2 stopword hits
    return F.struct(
        f_words.alias("word_count_ok"),
        f_mwl.alias("mean_word_len_ok"),
        f_alpha.alias("alpha_ratio_ok"),
        f_sym.alias("symbol_ratio_ok"),
        f_stop.alias("stopword_ok"),
        (f_words & f_mwl & f_alpha & f_sym & f_stop).alias("pass_all"),
    )


def hashed_linear_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    seed: int = 0,
    out_col: str = "score_num",
):
    """DataFrame-level twin of `hashed_linear_score_num` for corpus-scale
    scoring: explode tokens, hash only the DISTINCT vocabulary
    (Heaps-law small), broadcast the token→weight map back, and sum per
    document. The per-character hash fold runs per vocabulary entry,
    never per token occurrence — ~2× the pure column expression at the
    fixture shape (50k short docs, 3M occurrences / 39k vocab; the gap
    widens with the occurrence:vocab ratio, i.e. with real document
    lengths at corpus scale). The expression form is kept for
    single-doc/streaming use. Integer sums ⇒ bit-equal results.

    Returns ``df`` with ``out_col`` added (0 for empty documents)."""
    from pyspark.sql import functions as F

    from . import text as TX

    from revtron_utils_spark.operators.dedup import _persist

    # scanned twice (vocab distinct + the scoring join) — persist so
    # the corpus tokenizes once; released via dedup.release_caches()
    toks = _persist(
        df.select(F.col(id_col), F.explode(TX.tokens(text_col)).alias("_term"))
    )
    vocab = (
        toks.select("_term")
        .distinct()
        .withColumn("_w", pseudo_weight(hashed_bucket(F.col("_term"), dim), seed))
    )
    # no broadcast hint: vocabulary is unbounded at corpus scale — AQE
    # broadcasts when it fits, shuffle-joins on the term key otherwise
    sums = (
        toks.join(vocab, "_term")
        .groupBy(id_col)
        .agg(F.sum("_w").alias(out_col))
    )
    return df.join(sums, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )
