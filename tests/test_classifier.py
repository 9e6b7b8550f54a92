from __future__ import annotations

import pyspark.sql.functions as F

from revtron_utils_spark.functions import classifier as CL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_score_bounds_and_empty(spark):
    df = _docs(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog"), (2, ""), (3, "   ")],
    )
    out = df.select(
        "doc_id",
        CL.hashed_linear_score("text").alias("s"),
        (CL.hashed_linear_score_num("text") > 0).alias("keep"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert -1.0 <= by_id[1].s <= 1.0
    assert by_id[2].s == 0.0 and by_id[2].keep is False
    assert by_id[3].s == 0.0 and by_id[3].keep is False


def test_hashed_score_deterministic_and_seed_sensitive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    s0 = docs.select("doc_id", CL.hashed_linear_score("text", seed=0).alias("s"))
    s0b = docs.select("doc_id", CL.hashed_linear_score("text", seed=0).alias("s"))
    s1 = docs.select("doc_id", CL.hashed_linear_score("text", seed=1).alias("s"))
    assert sorted(s0.collect()) == sorted(s0b.collect())
    joined = s0.alias("a").join(s1.alias("b"), "doc_id")
    assert joined.where(F.col("a.s") != F.col("b.s")).count() > 0


def test_gopher_flags_reject_garbage(spark):
    long_ok = " ".join(["sensible", "words", "with", "the", "usual", "shape"] * 5)
    df = _docs(
        spark,
        [
            (1, long_ok),                                   # passes
            (2, "too short"),                               # word count
            (3, " ".join(["###"] * 30)),                    # symbol + alpha ratio
            (4, " ".join(["a", "b"] * 15)),                 # mean word len < 3
            (5, " ".join(["pneumonoultramicroscopics"] * 25)),  # mwl > 10, no stopwords
        ],
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", CL.gopher_quality_flags("text").alias("g")
        ).select("doc_id", "g.*").collect()
    }
    assert out[1].pass_all is True
    assert out[2].word_count_ok is False and out[2].pass_all is False
    assert out[3].symbol_ratio_ok is False and out[3].alpha_ratio_ok is False
    assert out[4].mean_word_len_ok is False
    assert out[5].mean_word_len_ok is False and out[5].stopword_ok is False


def test_gopher_flags_fixture_discriminates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(CL.gopher_quality_flags("text").alias("g")).select("g.*")
    agg = out.agg(
        F.sum(F.col("pass_all").cast("int")).alias("n_pass"),
        F.count("*").alias("n"),
    ).first()
    assert 0 < agg.n_pass < agg.n
