"""Lexical retrieval over a document corpus: BM25 scoring and top-k
search, Spark-first.

The reference has no text-retrieval surface (its query layer is
SQL/SOQL generation, ``/root/reference/revtron/database/main.py``); this
is part of the LLM-data-pipeline extension layer — ranking quality
filtering ("keep docs relevant to X"), dataset search, and
decontamination triage all reduce to scoring documents against a small
term set.

100 TB posture
--------------
- One pruned scan of ``(id, text)``; tokenization and per-token rows are
  a narrow ``explode`` projection (whole-stage codegen, no Python).
- The selective ``term IN (query)`` filter runs BEFORE the tf shuffle,
  so the only wide exchange is over documents that contain a query term.
- Document frequencies for the query terms are ≤ ``len(terms)`` rows —
  broadcast by construction.
- Per-document summation is a fixed-order chain of per-term columns
  (conditional aggregation), not an order-nondeterministic ``SUM`` —
  bit-identical across engines, which is what lets the DuckDB oracle
  hash-match a floating-point ranking function.
- Top-k compiles to ``TakeOrderedAndProject`` (per-partition heaps,
  O(k) driver memory).

The scoring function is a **log-free BM25 variant**: the classic
``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` is replaced by the rational
``(N - df + 0.5)/(df + 0.5)``. ``ln`` is not correctly rounded across
libms (JVM vs DuckDB can differ in the last ulp), so the canonical form
can't be hash-compared across engines; the rational form preserves the
per-term ordering (x ↦ ln(1+x) is monotone) and keeps every operation
IEEE-correctly-rounded, hence bit-reproducible. The term-frequency
saturation component is standard BM25: ``tf·(k1+1) / (tf + k1·(1 − b +
b·dl/avgdl))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from revtron_utils_spark.functions.text import tokens


def _corpus_stats(docs: DataFrame, text_col: str) -> tuple[int, float]:
    """(N, avgdl) in one tiny aggregate — two scalars to the driver."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(text_col))).alias("total_tokens"),
    ).first()
    n = int(row["n"])
    avgdl = float(row["total_tokens"] or 0) / n if n else 0.0
    return n, avgdl


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Score every document containing ≥1 query term; returns
    ``(id_col, bm25)``. Documents with no query term are absent (their
    score is 0) — at corpus scale that absence IS the pruning.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    n, avgdl = _corpus_stats(docs, text_col)
    if n == 0 or avgdl == 0.0:
        return docs.select(F.col(id_col)).limit(0).withColumn("bm25", F.lit(0.0))

    # Two-step projection: materialize the token array under an alias
    # BEFORE the generate. Inlining `size(split(...))` next to
    # `explode(split(...))` re-evaluates the split per generated row
    # (~10x slower, measured); through an aliased column the Generate
    # keeps the array materialized once per input row.
    base = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    toks = base.select(
        id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("tok")
    ).select(id_col, "dl", F.lower("tok").alias("term"))
    # Selective filter BEFORE the shuffle: only query-term tokens reach
    # the tf aggregation.
    qt = toks.filter(F.col("term").isin(terms))
    tf = qt.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qt.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    scored = tf.join(F.broadcast(df_), "term")
    # All operands double, every op correctly rounded, parenthesization
    # fixed — mirrored token-for-token by the SQL oracle.
    idf = (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl)))
    )
    scored = scored.withColumn("contrib", idf * sat)

    # Fixed-order per-term summation: one conditional-max column per
    # query term (each (doc, term) row is unique post-tf), added in
    # sorted-term order. Order-deterministic => engine-reproducible.
    per_term = [
        F.max(F.when(F.col("term") == t, F.col("contrib"))).alias(f"_c{i}")
        for i, t in enumerate(terms)
    ]
    agg = scored.groupBy(id_col).agg(*per_term)
    total: Column = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    return agg.select(F.col(id_col), F.round(total, round_to).alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for the query, deterministically tie-broken by id.
    Compiles to ``TakeOrderedAndProject`` — no full sort at any scale."""
    scores = bm25_scores(
        docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    return scores.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def bm25_oracle_sql(
    query_terms: list[str],
    k: int | None = None,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """DuckDB SQL mirroring :func:`bm25_scores` operation-for-operation
    (same tokenization, same rational idf, same fixed-order summation,
    same float literals via ``repr``), so value hashes match bit-exactly.
    """
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join(f"'{t}'" for t in terms)
    k1p1, one_b = repr(k1 + 1.0), repr(1.0 - b)
    contribs = " + ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN contrib END), 0.0)" for t in terms
    )
    sql = f"""
WITH tk AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim({text_col}), '\\s+'), x -> x <> '') AS toks
  FROM {table}
), corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM tk
), toks AS (
  SELECT {id_col}, len(toks) AS dl, lower(unnest(toks)) AS term FROM tk
), qt AS (
  SELECT * FROM toks WHERE term IN ({in_list})
), tf AS (
  SELECT {id_col}, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM qt GROUP BY 1, 2, 3
), dfq AS (
  SELECT term, CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS df FROM qt GROUP BY 1
), scored AS (
  SELECT tf.{id_col}, tf.term,
         ((corpus.n - dfq.df + 0.5) / (dfq.df + 0.5))
         * ((tf.tf * CAST({k1p1} AS DOUBLE))
            / (tf.tf + CAST({k1!r} AS DOUBLE)
               * (CAST({one_b} AS DOUBLE)
                  + CAST({b!r} AS DOUBLE) * (tf.dl / corpus.avgdl)))) AS contrib
  FROM tf JOIN dfq USING (term) CROSS JOIN corpus
)
SELECT {id_col}, ROUND({contribs}, {round_to}) AS bm25
FROM scored GROUP BY {id_col}
"""
    if k is not None:
        sql += f"ORDER BY bm25 DESC, {id_col} LIMIT {k}\n"
    return sql


def ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level word n-gram frequency table (the "count all 5-grams
    in the crawl" job): one explode projection + one map-side-combined
    hash aggregate — the shuffle carries only (ngram, partial count),
    and the ``min_count`` filter keeps the long tail from ever being
    returned. Output: (ngram, n_occurrences)."""
    from ..functions import text as TX

    return (
        docs.select(F.explode(TX.word_ngrams(text_col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def rarity_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document rarity: the mean inverse document frequency of its
    tokens — the log-free cousin of a unigram-LM surprisal filter (rare
    vocabulary ⇒ high score). Exactness trick: per-token idf is
    quantized to an INTEGER (``round(scale·N/df)``) so the per-document
    sum is order-independent and the final rounded mean hash-matches the
    DuckDB oracle bit-for-bit.

    Plan: one narrow token explode; document frequencies aggregate
    map-side; the df table is vocabulary-sized — broadcast onto the
    token stream, so the only wide shuffle is the per-document
    re-aggregation. Output: (id_col, n_tokens, rarity)."""
    from ..functions import text as TX
    from .dedup import _persist

    # the token projection feeds both the df aggregate and the final
    # per-doc join — persist so the corpus tokenizes once (released via
    # dedup.release_caches(), like every operator intermediate)
    toks = _persist(
        docs.select(
            F.col(id_col),
            # lower-then-split (one codegen'd pass) — the per-element
            # transform(tokens, lower) runs interpreted, ~1.6 s/pass at
            # sf0.1; token boundaries are identical (no case mapping
            # touches whitespace)
            F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("term"),
        )
    )
    # the corpus size rides IN-PLAN as a 1-row broadcast (r13): the old
    # build-time docs.count() was a full scan at query-build time just
    # to produce a literal (guide §1.2). double(count)·double(scale) is
    # the same IEEE multiply the old float(n_docs)·scale ran in Python.
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("_nd"))
    df_tab = (
        toks.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "idf_int",
            F.round((F.col("_nd") * F.lit(float(scale))) / F.col("df")).cast(
                "long"
            ),
        )
    )
    return (
        # no broadcast hint: the df table is vocabulary-sized (unbounded
        # at 100 TB) — AQE picks broadcast only when it actually fits
        toks.join(df_tab.select("term", "idf_int"), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("idf_int") / (F.count(F.lit(1)) * F.lit(float(scale))), 6
            ).alias("rarity"),
        )
    )


def _rank_topk(scored: DataFrame, score_col: str, id_col: str, k: int) -> DataFrame:
    """(id, rank) for the top-k rows by (score desc, id asc). The global
    sort compiles to TakeOrderedAndProject (per-partition heaps), so only
    k rows ever reach the driver-side single partition where row_number
    assigns positions — the window never sees the full corpus."""
    from pyspark.sql import Window as W

    top = scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(k)
    w = W.orderBy(F.col(score_col).desc(), F.col(id_col))
    return top.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def _rrf_contrib(rank_col: str, k: int, scale: int) -> Column:
    """Integer RRF contribution ``scale div (k + rank)``; NULL rank
    (absent from that list) contributes 0. Single definition shared by
    :func:`rrf_fuse` and :func:`hybrid_topk` so the fusion arithmetic
    cannot drift between the generic and the two-leg path."""
    return F.coalesce(F.expr(f"{scale} div ({k} + {rank_col})"), F.lit(0))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    *,
    k: int = 60,
    scale: int = 10**12,
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) over any number
    of ``(id, rank)`` lists: ``score(d) = Σ_lists scale div (k + rank)``.

    The classic ``1/(k+r)`` floats are replaced by the integer quotient
    ``scale div (k+r)`` — same ordering for any two rank multisets when
    ``scale`` is large vs ``k + max_rank`` (distinct quotients stay
    distinct), and integer sums are order-independent and engine-exact,
    so a fused ranking can be hash-compared against a SQL oracle.

    Output: ``(id_col, rrf_int)`` sorted by fused score desc, id asc."""
    from functools import reduce

    contribs = [
        r.select(F.col(id_col), _rrf_contrib("rank", k, scale).alias("c"))
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), contribs)
        .groupBy(id_col)
        .agg(F.sum("c").alias("rrf_int"))
        .orderBy(F.col("rrf_int").desc(), F.col(id_col))
    )
    return fused.limit(topn) if topn is not None else fused


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec,
    *,
    k_each: int = 50,
    topn: int = 10,
    rrf_k: int = 60,
    scale: int = 10**12,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 top-``k_each`` and cosine
    top-``k_each`` fused by integer reciprocal-rank fusion. The RAG
    retrieval shape — sparse recall catches exact terminology, dense
    recall catches paraphrase; RRF needs no score calibration between
    the two (ranks only).

    100 TB posture: each leg is its own TakeOrderedAndProject top-k over
    a pruned scan (BM25's term filter before the tf shuffle; the cosine
    leg one narrow map), so the fusion join touches 2·k_each rows total
    — effectively free at any corpus size. Output:
    ``(id_col, bm25_rank, cos_rank, rrf_int)`` — NULL rank means the doc
    was absent from that leg's top-k."""
    from .similarity import cosine_topk

    lex = _rank_topk(
        bm25_scores(docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b),
        "bm25",
        id_col,
        k_each,
    ).withColumnRenamed("rank", "bm25_rank")
    sem = (
        _rank_topk(
            cosine_topk(emb, query_vec, k_each, vec_col=vec_col, id_col=vec_id_col),
            "cosine",
            vec_id_col,
            k_each,
        )
        .withColumnRenamed("rank", "cos_rank")
        .withColumnRenamed(vec_id_col, id_col)
    )
    j = lex.join(sem, id_col, "full_outer")
    return (
        j.select(
            id_col,
            "bm25_rank",
            "cos_rank",
            (
                _rrf_contrib("bm25_rank", rrf_k, scale)
                + _rrf_contrib("cos_rank", rrf_k, scale)
            ).alias("rrf_int"),
        )
        .orderBy(F.col("rrf_int").desc(), F.col(id_col))
        .limit(topn)
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Corpus collocation mining: adjacent-bigram PMI lift,
    ``(w1, w2, n_pair, lift)`` for every bigram seen ≥ ``min_count``
    times. ``lift = p(w1,w2) / (p(w1)·p(w2))`` — the log-free PMI
    (x ↦ ln x is monotone, so the ranking is the PMI ranking), computed
    as the fixed-parenthesization double chain
    ``((((n_pair · N_uni) · N_uni) / N_bi) / c1) / c2``. Every operand
    is an exactly-representable integer and every op is IEEE
    correctly-rounded, so the DuckDB oracle reproduces it bit-for-bit
    (the BM25 precedent).

    100 TB posture: two narrow explode projections (unigram stream,
    zipped-bigram stream) feeding map-side-combined counts; the
    ``min_count`` filter prunes the long tail before the unigram joins;
    the corpus totals are a broadcast 1-row cross join, never a driver
    round-trip inside the plan."""
    from ..functions.text import tokens
    from .dedup import _persist

    # registered with dedup._persist, released by the caller via
    # dedup.release_caches() — the returned frame is lazy, so eager
    # unpersists here would cancel the caches before first use
    toks = _persist(docs.select(tokens(F.lower(F.col(text_col))).alias("t")))
    uni = _persist(
        toks.select(F.explode("t").alias("w")).groupBy("w").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    totals = uni.agg(F.sum("c").alias("n_uni"))
    m = F.greatest(F.size("t") - 1, F.lit(0))
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, m).alias("w1"), F.slice("t", 2, m).alias("w2")
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    n_bi = toks.select(m.alias("m")).agg(F.sum("m").alias("n_bi"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    out = (
        bi.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n_uni")
                * F.col("n_uni")
                / F.col("n_bi")
                / F.col("c1")
                / F.col("c2"),
                round_to,
            ).alias("lift"),
        )
    )
    return out


def collocations_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`collocations` — same tokenization (split on
    raw text, lowercase tokens), same counts, same fixed-order double
    chain."""
    return rf"""
WITH tk AS (
  SELECT list_transform(list_filter(string_split_regex(trim({text_col}), '\s+'),
                                    x -> x <> ''),
                        t -> lower(t)) AS t
  FROM {table}
), uni AS (
  SELECT unnest(t) AS w FROM tk
), uc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w
), totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uc
), nb AS (
  SELECT CAST(SUM(greatest(len(t) - 1, 0)) AS BIGINT) AS n_bi FROM tk
), bi AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM tk, UNNEST(range(1, len(t))) AS r(i)
), bc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM bi GROUP BY w1, w2 HAVING COUNT(*) >= {min_count}
)
SELECT bc.w1, bc.w2, bc.n_pair,
       ROUND(CAST(bc.n_pair AS DOUBLE) * totals.n_uni * totals.n_uni
             / nb.n_bi / a.c / b.c, {round_to}) AS lift
FROM bc
JOIN uc a ON bc.w1 = a.w
JOIN uc b ON bc.w2 = b.w
CROSS JOIN totals CROSS JOIN nb
"""


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    df_cap: int = 1000,
    scale: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Sparse lexical near-duplicate pairs: cosine similarity of
    rational-idf tf-idf vectors via an inverted-index self-join — the
    LEXICAL complement of `similarity.cosine_neardup` (dense embedding
    cosine): catches template/boilerplate overlap that embeddings blur
    and needs no embedding column.

    Weights: ``w(doc, term) = tf · idf_int`` with the house rational
    idf (``idf_int = round(scale·N/df)``, the `rarity_scores`
    precedent — no logs, bit-equal on both engines). Cosine is
    ``Σ w_a·w_b / (√Σw_a² · √Σw_b²)`` with every sum an exact
    DECIMAL(38,0) integer (order-independent), then exactly-rounded
    sqrt + ONE division — hash-exact.

    100 TB posture (the `dedup._cap_hot_buckets` argument): the pair
    space of a posting-list join is Σ_t df_t², unbounded for stopword-
    grade terms — terms with ``df > df_cap`` are EXCLUDED FROM THE
    VECTOR SPACE entirely (standard stop-token capping; norms and dots
    use the same surviving vocabulary, so the cosine stays a true
    cosine in the capped space). Per term the join then emits ≤ df_cap²
    pairs. df-1 terms keep their mass in the norms but never pair.
    Plan: one token explode, one df aggregate, one broadcast of the
    capped vocabulary, one postings self-join keyed on term (AQE
    handles residual term skew), one pair aggregate.

    Output: ``(id_a, id_b, cosine)`` for pairs with
    ``cosine ≥ threshold``, ``id_a < id_b``.
    """
    from ..functions import text as TX
    from .dedup import _persist

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = _persist(
        toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    )
    # DECIMAL(38,0) width contract, MEASURED (round-9 fix: the old
    # n_docs·scale ≤ 1e17 bound ignored tf — a term with tf ≥ ~100
    # still pushed Σw² past 10³⁸). The largest weight is
    # w ≤ max_tf·N·scale (a df=1 term), a doc's norm² sums ≤
    # max_terms_per_doc of its squares, so the exact bound is
    # (max_tf·N·scale)² · max_terms_per_doc < 10³⁸. max_tf and
    # max_terms_per_doc come from one aggregate over the already-
    # persisted tf frame, and the corpus count rides the SAME action
    # via a 1×1 crossJoin (r13: one build-time job instead of two).
    # Fail fast with the fix (lower `scale` as the corpus grows)
    # instead of silently NULLing norms at scale.
    stats = (
        tf.groupBy("_id")
        .agg(F.max("_tf").alias("_mt"), F.count(F.lit(1)).alias("_nt"))
        .agg(F.max("_mt").alias("mt"), F.max("_nt").alias("nt"))
        .crossJoin(docs.agg(F.count(F.lit(1)).alias("nd")))
        .first()
    )
    n_docs = int(stats["nd"])
    max_tf = int(stats["mt"] or 1)
    max_terms = int(stats["nt"] or 1)
    if (max_tf * n_docs * scale) ** 2 * max_terms >= 10**38:
        raise ValueError(
            "tfidf_cosine_pairs: (max_tf·n_docs·scale)²·max_terms_per_doc "
            f"= ({max_tf}·{n_docs}·{scale})²·{max_terms} reaches the "
            "DECIMAL(38,0) norm-width budget (10^38) — pass a smaller "
            "`scale` (idf resolution) for this corpus"
        )
    voc = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= df_cap)
        .withColumn(
            "_idf",
            F.round(F.lit(float(n_docs) * scale) / F.col("_df")).cast("long"),
        )
    )
    posts = _persist(
        tf.join(voc.select("term", "_df", "_idf"), "term").select(
            "term",
            "_df",
            "_id",
            (F.col("_tf").cast("decimal(38,0)") * F.col("_idf").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("_w"),
        )
    )
    norms = posts.groupBy("_id").agg(
        F.sum((F.col("_w") * F.col("_w")).cast("decimal(38,0)")).alias("_n2")
    )
    a = posts.select(
        F.col("term").alias("t"),
        F.col("_df").alias("dfa"),
        F.col("_id").alias("id_a"),
        F.col("_w").alias("_wa"),
    )
    b = posts.select(
        F.col("term").alias("t"),
        F.col("_id").alias("id_b"),
        F.col("_w").alias("_wb"),
    )
    dots = (
        a.join(b, (a.t == b.t) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("_wa") * F.col("_wb")).cast("decimal(38,0)")).alias("_dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("_n2").alias("_na2"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("_n2").alias("_nb2"))
    cos = F.round(
        F.col("_dot").cast("double")
        / (F.sqrt(F.col("_na2").cast("double")) * F.sqrt(F.col("_nb2").cast("double"))),
        round_to,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= F.lit(float(threshold)))
    )


def tfidf_cosine_pairs_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    df_cap: int = 1000,
    scale: int = 1_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same tokenizer, same rational idf, HUGEINT-exact
    weights/norms/dots, same rounded cosine."""
    return rf"""
WITH toks AS (
  SELECT {id_col} AS _id, u.term
  FROM {table},
       UNNEST(list_filter(string_split_regex(trim(lower({text_col})), '\s+'),
                          t -> t <> '')) AS u(term)
),
tf AS (
  SELECT _id, term, CAST(COUNT(*) AS BIGINT) AS _tf
  FROM toks GROUP BY _id, term
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
voc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS _df,
         CAST(ROUND(CAST((SELECT n FROM nn) AS DOUBLE) * {scale}
                    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS _idf
  FROM tf GROUP BY term
  HAVING COUNT(*) <= {df_cap}
),
posts AS (
  SELECT tf.term, tf._id, CAST(tf._tf AS HUGEINT) * voc._idf AS _w
  FROM tf JOIN voc USING (term)
),
norms AS (
  SELECT _id, SUM(_w * _w) AS _n2 FROM posts GROUP BY _id
),
dots AS (
  SELECT a._id AS id_a, b._id AS id_b, SUM(a._w * b._w) AS _dot
  FROM posts a JOIN posts b ON a.term = b.term AND a._id < b._id
  GROUP BY a._id, b._id
)
SELECT id_a, id_b,
       ROUND(CAST(_dot AS DOUBLE)
             / (SQRT(CAST(na._n2 AS DOUBLE)) * SQRT(CAST(nb._n2 AS DOUBLE))),
             {round_to}) AS cosine
FROM dots
JOIN norms na ON dots.id_a = na._id
JOIN norms nb ON dots.id_b = nb._id
WHERE ROUND(CAST(_dot AS DOUBLE)
            / (SQRT(CAST(na._n2 AS DOUBLE)) * SQRT(CAST(nb._n2 AS DOUBLE))),
            {round_to}) >= {float(threshold)!r}
"""


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    top: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty — the fraction of a document's
    distinct word n-grams that appear NOWHERE else in the corpus
    (corpus df = 1). The inverse readout of the dedup family: MinHash
    asks "who is this a copy of"; novelty asks "how much of this doc is
    genuinely new text" — the signal that separates boilerplate-heavy
    pages (novelty → 0) from original content before mixture weighting.

        novelty = |{g ∈ ngrams(d) : df(g) = 1}| / |ngrams(d)|.

    Exactness: distinct-shingle sets, document frequencies, and the
    novel counts are exact integers; novelty is ONE pinned division,
    rounded; the top-``top`` readout orders (novelty DESC, id ASC) —
    total order, hash-stable. Documents with < n tokens (no n-grams)
    are excluded (novelty undefined).

    Scale shape: explode distinct shingles → one (shingle) partial-agg
    shuffle for df → one shingle-keyed join back → one per-doc agg →
    TakeOrderedAndProject. The inverted index IS the plan; no
    collect, no all-pairs anything.
    """
    from ..functions import text as TX
    from .dedup import _spread_if_narrow

    # spread a narrow scan below the shingle projection (r13, the
    # _ngram_pair_counts treatment): a one-split table otherwise runs
    # tokenize+shingle in a single task — twice, once per branch of the
    # inverted index (two ~1 s 1-task stages at sf0.1)
    sh = _spread_if_narrow(df).select(
        F.col(id_col).alias("_id"),
        F.array_distinct(TX.word_ngrams(text_col, n)).alias("_sh"),
    ).where(F.size("_sh") > 0)
    inv = sh.select("_id", F.explode("_sh").alias("_g"))
    dfreq = inv.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    per = (
        inv.join(dfreq, "_g")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    return (
        per.select(
            F.col("_id").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_shingles").cast("double"),
                round_to,
            ).alias("novelty"),
        )
        .orderBy(F.col("novelty").desc(), F.col(id_col).asc())
        .limit(top)
    )


def ngram_novelty_oracle_sql(
    docs_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    top: int = 100,
    round_to: int = 6,
) -> str:
    """DuckDB twin: same whitespace tokens, same space-joined distinct
    n-grams, same df counting and pinned division, same total order."""
    concat = ", ' ', ".join(f"toks[i+{j}]" for j in range(n))
    return rf"""
WITH t AS (
  SELECT {id_col} AS _id,
         list_filter(string_split_regex(trim({text_col}), '\s+'), x -> x != '') AS toks
  FROM ({docs_sql})
),
sh AS (
  SELECT _id, list_distinct(
           list_transform(range(1, len(toks) - {n - 2}),
                          i -> concat({concat}))) AS _sh
  FROM t WHERE len(toks) >= {n}
),
inv AS (
  SELECT _id, unnest(_sh) AS _g FROM sh WHERE len(_sh) > 0
),
dfreq AS (
  SELECT _g, CAST(COUNT(*) AS BIGINT) AS _df FROM inv GROUP BY _g
),
per AS (
  SELECT i._id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN d._df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM inv i JOIN dfreq d USING (_g)
  GROUP BY i._id
)
SELECT _id AS {id_col}, n_shingles, n_novel,
       ROUND(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), {round_to}) AS novelty
FROM per ORDER BY novelty DESC, {id_col} ASC LIMIT {top}
"""
