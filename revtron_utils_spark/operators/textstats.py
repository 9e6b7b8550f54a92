"""Document-statistics operators: readability scoring and RAKE keyword
extraction — the text-analysis layer between `functions/classifier.py`'s
quality gates and `retrieval.py`'s ranking (readability is a standard
corpus-quality stratifier; keywords drive dataset cards and topic
routing).

Reference parity: none (`/root/reference/revtron` is a SQL/SOQL
client); part of the LLM-data-pipeline extension surface.

House rules (`profile.concentration_gini` discipline): no RNG, no log —
readability is a fixed-order IEEE expression of exact integer counts;
RAKE word scores are integer fixed-point ``degree·scale // freq`` so
phrase scores are exact int64 sums, and both operators hash-verify
against DuckDB oracles.

100 TB posture: readability is a pure projection (per-document column
expressions inside codegen, no shuffle). RAKE is two token-keyed
partial-agg shuffles (word stats, phrase scores) + one broadcast join
of the word-score table back onto distinct phrases; the top-k is an
``orderBy().limit()`` → TakeOrderedAndProject (per-partition heaps).
Stopwords are the delimiter set, so the degenerate hot tokens ("the",
"of") never enter the phrase space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Flesch Reading Ease constants — literals so both engines fold the
# identical doubles.
_FLESCH_BASE = 206.835
_FLESCH_WPS = 1.015
_FLESCH_SPW = 84.6

# Delimiter stopwords for RAKE candidate phrases (the Gopher stopword
# set + common function words) — keep SORTED for deterministic SQL.
RAKE_STOPWORDS = sorted(
    {
        "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
        "has", "have", "in", "is", "it", "of", "on", "or", "that", "the",
        "to", "was", "were", "will", "with",
    }
)


def _words(col: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(col)), r"\s+"), lambda t: t != ""
    )


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Flesch Reading Ease per document, with a deterministic
    vowel-group syllable heuristic:

        FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    * words: whitespace tokens of the lowercased text,
    * sentences: runs of ``[.!?]`` (min 1 — headline-only docs count
      as one sentence),
    * syllables per word: runs of ``[aeiouy]`` (min 1 per word) — the
      standard dictionary-free approximation (±1 syllable on silent-e
      words, identical on both engines since it is pure regex
      counting).

    All three counts are exact integers; the score is ONE fixed-order
    double expression, so the output hash-matches the DuckDB oracle.
    Empty/NULL documents emit 0 words and a NULL score. Pure
    projection — no shuffle, no UDF.

    Output: ``(id_col, n_words, n_sentences, n_syllables, flesch)``.
    """
    c = F.col(text_col)
    words = _words(c)
    n_w = F.size(words).cast("long")
    n_s = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
                F.lit(1),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s,
    )
    out = df.select(
        F.col(id_col),
        F.coalesce(n_w, F.lit(0)).alias("n_words"),
        # a NULL text leaves the count NULL — pin to the same 1 floor
        F.coalesce(n_s, F.lit(1)).alias("n_sentences"),
        F.coalesce(syl, F.lit(0)).alias("n_syllables"),
    )
    flesch = (
        F.lit(_FLESCH_BASE)
        - F.lit(_FLESCH_WPS)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(_FLESCH_SPW)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    return out.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.when(F.col("n_words") > 0, flesch), round_to
        ).alias("flesch"),
    )


def readability_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> str:
    """DuckDB twin: identical regex counts, identical fixed-order
    double expression."""
    return rf"""
WITH base AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim(lower({text_col})), '\s+'),
                     t -> t <> '') AS words,
         GREATEST(len(regexp_extract_all({text_col}, '[.!?]+')), 1) AS n_s
  FROM {table}
),
cnt AS (
  SELECT {id_col},
         CAST(COALESCE(len(words), 0) AS BIGINT) AS n_words,
         CAST(COALESCE(n_s, 1) AS BIGINT) AS n_sentences,
         CAST(COALESCE(list_sum(list_transform(words,
              w -> GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1))), 0)
              AS BIGINT) AS n_syllables
  FROM base
)
SELECT {id_col}, n_words, n_sentences, n_syllables,
       ROUND(CASE WHEN n_words > 0 THEN
         {_FLESCH_BASE!r}
         - {_FLESCH_WPS!r} * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - {_FLESCH_SPW!r} * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
       END, {round_to}) AS flesch
FROM cnt
"""


def _phrase_array(col: Column, stopwords: list[str]) -> Column:
    """Candidate phrases, classic RAKE segmentation: lowercase, turn
    every punctuation/symbol run into a hard ``|`` boundary (a comma
    ENDS a phrase — it is not stripped from the token), then replace
    stopword tokens with the same boundary and split — maximal runs of
    content words, as strings."""
    cleaned = F.regexp_replace(
        F.lower(F.coalesce(col, F.lit(""))), "[^a-z0-9\\s]+", " | "
    )
    toks = F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != "")
    mapped = F.transform(
        toks,
        lambda t: F.when(t.isin(list(stopwords) + ["|"]), F.lit("|")).otherwise(t),
    )
    joined = F.array_join(mapped, " ")
    return F.filter(
        F.transform(F.split(joined, r"\|"), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 25,
    scale: int = 10_000,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al., "Automatic keyword
    extraction from individual documents", 2010) over the whole corpus:
    candidate phrases are maximal stopword-free token runs; each word
    scores ``degree/frequency`` (degree = Σ phrase length over its
    occurrences — co-occurrence counting the word itself); a phrase
    scores the sum of its words' scores.

    Exactness: word scores are integer fixed-point computed as
    ``(deg div freq)·scale + ((deg mod freq)·scale) div freq`` — the
    overflow-safe split form of ``deg·scale // freq`` (``deg div freq``
    is bounded by the max phrase length, and ``(deg mod freq) < freq``,
    so every intermediate stays far inside int64 even at 100-TB word
    frequencies). Phrase scores are exact int64 sums of those — no
    doubles anywhere, so the gate hash-verifies bit-exactly.

    Output: top ``top_k`` distinct phrases by ``(score_int DESC,
    phrase ASC)``: ``(phrase, n_words, n_occurrences, score_int)``.
    """
    sw = sorted(stopwords) if stopwords is not None else RAKE_STOPWORDS
    phrases = df.select(
        F.explode(_phrase_array(F.col(text_col), sw)).alias("phrase")
    )
    from .dedup import _persist

    phrases = _persist(phrases)
    occ = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    pw = phrases.select(
        F.size(F.split(F.col("phrase"), " ")).cast("long").alias("_len"),
        F.explode(F.split(F.col("phrase"), " ")).alias("_w"),
    )
    stats = pw.groupBy("_w").agg(
        F.count(F.lit(1)).alias("_freq"), F.sum("_len").alias("_deg")
    )
    ws = stats.select(
        "_w",
        (
            F.expr("_deg div _freq") * F.lit(scale)
            + F.expr(f"((_deg % _freq) * {scale}) div _freq")
        ).alias("_score"),
    )
    dw = occ.select(
        "phrase",
        "n_occurrences",
        F.explode(F.split(F.col("phrase"), " ")).alias("_w"),
    )
    scored = (
        dw.join(ws, "_w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.count(F.lit(1)).alias("n_words"), F.sum("_score").alias("score_int"))
    )
    return scored.select(
        "phrase", "n_words", "n_occurrences", "score_int"
    ).orderBy(F.col("score_int").desc(), F.col("phrase").asc()).limit(top_k)


def rake_keywords_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    top_k: int = 25,
    scale: int = 10_000,
    stopwords: list[str] | None = None,
) -> str:
    """DuckDB twin: identical phrase segmentation (token-strip → ``|``
    delimiters → split), identical split-form integer word scores."""
    sw = sorted(stopwords) if stopwords is not None else RAKE_STOPWORDS
    sw_list = ", ".join(f"'{w}'" for w in sw)
    return rf"""
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(
           regexp_replace(lower(COALESCE({text_col}, '')),
                          '[^a-z0-9\s]+', ' | ', 'g')), '\s+'),
                     t -> t <> '') AS ts
  FROM {table}
),
mapped AS (
  SELECT array_to_string(list_transform(ts, t ->
    CASE WHEN t IN ({sw_list}, '|') THEN '|' ELSE t END), ' ') AS s
  FROM toks
),
phrases AS (
  SELECT trim(p) AS phrase
  FROM mapped, UNNEST(string_split(s, '|')) AS u(p)
  WHERE trim(p) <> ''
),
occ AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM phrases GROUP BY phrase
),
pw AS (
  SELECT CAST(len(string_split(phrase, ' ')) AS BIGINT) AS _len, u._w
  FROM phrases, UNNEST(string_split(phrase, ' ')) AS u(_w)
),
stats AS (
  SELECT _w, CAST(COUNT(*) AS BIGINT) AS _freq, SUM(_len) AS _deg
  FROM pw GROUP BY _w
),
ws AS (
  SELECT _w,
         (_deg // _freq) * {scale} + ((_deg % _freq) * {scale}) // _freq AS _score
  FROM stats
),
dw AS (
  SELECT phrase, n_occurrences, u._w
  FROM occ, UNNEST(string_split(phrase, ' ')) AS u(_w)
),
scored AS (
  SELECT phrase, n_occurrences,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(ws._score) AS BIGINT) AS score_int
  FROM dw JOIN ws USING (_w)
  GROUP BY phrase, n_occurrences
)
SELECT phrase, n_words, n_occurrences, score_int
FROM scored
ORDER BY score_int DESC, phrase ASC
LIMIT {top_k}
"""
