"""Edge-case probes for the newest operators: empty inputs, ungrouped
paths, empty target sets — the corners the gate queries never hit."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_deterministic_shuffle_empty_and_single(spark):
    from revtron_utils_spark.operators.curation import deterministic_shuffle
    from revtron_utils_spark.operators.dedup import release_caches

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert deterministic_shuffle(empty, "doc_id").count() == 0
    release_caches()
    one = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    rows = deterministic_shuffle(one, "doc_id").collect()
    release_caches()
    assert len(rows) == 1 and rows[0].shuffle_rank == 0


def test_filter_by_score_quantile_ungrouped(spark):
    from revtron_utils_spark.operators.curation import filter_by_score_quantile
    from revtron_utils_spark.operators.dedup import release_caches

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "id long, score long"
    )
    out = filter_by_score_quantile(df, "score", keep_frac=0.5, by=())
    kept = sorted(r.id for r in out.collect())
    release_caches()
    # p50 of 0..90 is 45 → keep scores >= 45 → ids 5..9
    assert kept == [5, 6, 7, 8, 9]


def test_importance_weights_empty_target(spark, sf_dir):
    from revtron_utils_spark.operators.curation import importance_weights
    from revtron_utils_spark.operators.dedup import release_caches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = importance_weights(docs, target=F.lit(False))
    rows = out.collect()
    release_caches()
    # no target docs: every smoothed target prob is 1/dim — weights are
    # finite, positive, and defined for every doc
    assert len(rows) == 50
    assert all(r.weight is not None and r.weight > 0 for r in rows)


def test_bpe_train_degenerate_corpora(spark):
    from revtron_utils_spark.operators import bpe as B

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert B.bpe_train(empty, num_merges=5) == []
    # all-unique single chars: no pair ever reaches min_pair_count=2
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    merges = B.bpe_train(df, num_merges=5, min_pair_count=2)
    assert merges == []
    # encoding with an empty merge table = chars + end marker
    enc = {r.doc_id: r.pieces for r in B.bpe_encode(df, merges).collect()}
    assert enc[1] == ["a", B.END_OF_WORD, "b", B.END_OF_WORD, "c", B.END_OF_WORD, "d", B.END_OF_WORD]


def test_semdedup_empty_and_singleton(spark):
    from revtron_utils_spark.operators import semdedup as SD
    from revtron_utils_spark.operators.dedup import release_caches

    one = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = SD.semantic_dedup(one, threshold=0.5, planes=3, dim=4).collect()
    release_caches()
    assert len(rows) == 1 and rows[0].kept is True


def test_minhash_poly_short_docs_no_shingles(spark):
    from revtron_utils_spark.operators import dedup as DD

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None)], "doc_id long, text string"
    )
    for impl in ("arrow", "expr"):
        assert DD.minhash_poly_pairs(df, impl=impl).count() == 0
        DD.release_caches()


def test_semdedup_empty_frame(spark):
    from revtron_utils_spark.operators import semdedup as SD

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert SD.semantic_dedup(empty).count() == 0


def test_importance_weights_tokenless_corpus(spark):
    import pyspark.sql.functions as F

    from revtron_utils_spark.operators.curation import importance_weights
    from revtron_utils_spark.operators.dedup import release_caches

    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    out = importance_weights(df, target=F.lit(True)).collect()
    release_caches()
    assert out == []  # no tokens -> no scored docs, no crash


def test_dedup_index_append_accepts_pre_hashfamily_meta(spark, tmp_path):
    import json

    from revtron_utils_spark.operators.dedup_index import write_minhash_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).limit(30)
    path = str(tmp_path / "idx")
    write_minhash_index(docs, path, mode="overwrite")
    # simulate an index written before hash_family existed
    meta = tmp_path / "idx" / "_meta.json"
    m = json.loads(meta.read_text())
    m.pop("hash_family")
    meta.write_text(json.dumps(m))
    write_minhash_index(docs, path, mode="append")  # must not raise
