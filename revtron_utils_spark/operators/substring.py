"""Exact duplicate-substring mining over a document corpus — the
distributed analog of suffix-array substring dedup ("Deduplicating
Training Data Makes Language Models Better", Lee et al. 2022): find
every maximal run of tokens that appears ≥ ``min_count`` times across
the corpus, reported as per-document token spans, and optionally strip
those spans from the text.

A true distributed suffix array is overkill on Spark; the classic
scalable reformulation is k-gram posting lists: a token span is
duplicated iff every length-``k`` window inside it is duplicated, so
(1) slide a k-token window over each document (narrow, codegen'd array
ops — no Python), (2) keep windows whose gram occurs ≥ min_count times
corpus-wide (one map-side-combinable groupBy + a semi join back), and
(3) merge overlapping/adjacent surviving windows per document into
maximal spans (an islands window over ``(doc, pos)`` — partition size
bounded by document length, never by corpus size).

100 TB posture: the gram aggregate and the positions→dup-grams semi
join are the only wide exchanges, both keyed on the gram; AQE handles
skew (a boilerplate gram that appears everywhere is one hot key — at
extreme skew pre-filter stopword-only grams or raise ``k``). The
islands window partitions by document — thousands of tokens at most.
By default grams are joined on the exact string (zero false positives,
oracle-reproducible); ``hash_grams=True`` shuffles 8-byte ``xxhash64``
keys instead — ~2⁻³² collision odds per pair, the right trade at
petabyte scale where shuffling k-token strings dominates.

No analog in the reference (its dedup surface is row-level upsert,
``/root/reference/revtron/database/main.py``); this is part of the
LLM-pipeline extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from revtron_utils_spark.functions.text import tokens


def _gram_positions(
    docs: DataFrame, k: int, id_col: str, text_col: str, hash_grams: bool
) -> DataFrame:
    """(id, pos, gram) for every k-token window; empty for short docs."""
    toks = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    # sequence(0, n-k) DESCENDS when n < k (Spark generates backwards
    # ranges) — guard to an empty array instead.
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, k)))
        ).alias("pos", "gram"),
    )
    if hash_grams:
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    return grams


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    ``(id_col, span_start, span_end, span_tokens)`` with inclusive
    0-based token indices. A span is any maximal union of
    overlapping/adjacent k-windows each occurring ≥ ``min_count`` times
    corpus-wide — i.e. every maximal duplicated substring of ≥ k tokens.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    grams = _gram_positions(docs, k, id_col, text_col, hash_grams)
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi").select(
        id_col, F.col("pos").cast("long").alias("pos"), (F.col("pos") + (k - 1)).cast("long").alias("end")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "_brk",
        F.when(F.col("pos") <= F.coalesce(prev_max_end, F.lit(-2)) + 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "_island",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
            (F.max("end") - F.min("pos") + 1).alias("span_tokens"),
        )
        .drop("_island")
    )


def strip_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hash_grams: bool = False,
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every duplicated span's tokens, keeping the rest in order.
    Documents with no duplicated span pass through unchanged. One extra
    shuffle (spans re-keyed by document, bounded per-doc state)."""
    spans = duplicate_spans(
        docs, k, id_col=id_col, text_col=text_col, min_count=min_count, hash_grams=hash_grams
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = docs.join(per_doc, id_col, "left").withColumn("_toks", tokens(text_col))
    # sequence(0, -1) DESCENDS in Spark — guard the empty-doc case to an
    # empty index array instead of a phantom [0, -1]
    idx = F.when(
        F.size("_toks") > 0, F.sequence(F.lit(0), F.size("_toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        F.arrays_zip(F.col("_toks").alias("tok"), idx.alias("i")),
        lambda z: ~F.exists(
            F.coalesce(F.col("_spans"), F.array()),
            lambda s: (z["i"] >= s["span_start"]) & (z["i"] <= s["span_end"]),
        ),
    )
    return toks.withColumn(
        out_col, F.concat_ws(" ", F.transform(kept, lambda z: z["tok"]))
    ).drop("_toks", "_spans")


def duplicate_spans_oracle_sql(
    k: int = 8,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> str:
    """DuckDB mirror of :func:`duplicate_spans` (exact-string grams):
    same tokenization, window semantics, and islands merge — pure
    integer arithmetic, hash-exact across engines."""
    return f"""
WITH tk AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim({text_col}), '\\s+'), x -> x <> '') AS toks
  FROM {table}
), starts AS (
  SELECT {id_col}, toks,
         unnest(range(1, GREATEST(len(toks) - {k - 1}, 0) + 1)) AS i
  FROM tk
), g AS (
  SELECT {id_col}, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(list_slice(toks, i, i + {k - 1}), ' ') AS gram
  FROM starts
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= {min_count}
), hits AS (
  SELECT {id_col}, pos, pos + {k - 1} AS end_pos FROM g JOIN d USING (gram)
), marked AS (
  SELECT {id_col}, pos, end_pos,
         CASE WHEN pos <= COALESCE(MAX(end_pos) OVER (
                PARTITION BY {id_col} ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
              THEN 0 ELSE 1 END AS brk
  FROM hits
), isl AS (
  SELECT *, SUM(brk) OVER (
    PARTITION BY {id_col} ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
)
SELECT {id_col}, MIN(pos) AS span_start, MAX(end_pos) AS span_end,
       MAX(end_pos) - MIN(pos) + 1 AS span_tokens
FROM isl GROUP BY {id_col}, island
"""
