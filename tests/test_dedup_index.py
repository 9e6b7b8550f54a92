"""Incremental MinHash-LSH index: probe-equals-full-sweep equivalence,
append maintenance, and parameter-drift protection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.operators.dedup import minhash_lsh_pairs
from revtron_utils_spark.operators.dedup_index import (
    build_minhash_index,
    probe_minhash_index,
    probe_minhash_index_path,
    write_minhash_index,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_probe_equals_full_sweep_on_new_docs(corpus):
    old = corpus.filter(F.col("doc_id") % 5 != 0)
    new = corpus.filter(F.col("doc_id") % 5 == 0)
    postings, features = build_minhash_index(old)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in probe_minhash_index(new, postings, features).collect()
    }
    # reference: full-corpus sweep, restricted to pairs touching new docs
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(corpus).collect()
        if r["id_a"] % 5 == 0 or r["id_b"] % 5 == 0
    }
    assert got == full and got


def test_probe_without_new_new_pairs(corpus):
    old = corpus.filter(F.col("doc_id") % 5 != 0)
    new = corpus.filter(F.col("doc_id") % 5 == 0)
    postings, features = build_minhash_index(old)
    pairs = probe_minhash_index(new, postings, features, include_new_new=False).collect()
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    for r in pairs:
        # exactly one side is new when new-new pairing is off
        assert (r["id_a"] in new_ids) != (r["id_b"] in new_ids)


def test_append_then_probe_equals_rebuild(corpus, tmp_path):
    b1 = corpus.filter(F.col("doc_id") % 3 == 0)
    b2 = corpus.filter(F.col("doc_id") % 3 == 1)
    probe_batch = corpus.filter(F.col("doc_id") % 3 == 2)

    inc = str(tmp_path / "inc_idx")
    write_minhash_index(b1, inc)
    write_minhash_index(b2, inc, mode="append")

    full = str(tmp_path / "full_idx")
    write_minhash_index(b1.unionByName(b2), full)

    got_inc = {
        tuple(r) for r in probe_minhash_index_path(probe_batch, inc).collect()
    }
    got_full = {
        tuple(r) for r in probe_minhash_index_path(probe_batch, full).collect()
    }
    assert got_inc == got_full


def test_append_with_different_params_refuses(corpus, tmp_path):
    path = str(tmp_path / "idx")
    write_minhash_index(corpus.limit(50), path, bands=16)
    with pytest.raises(ValueError, match="refusing append"):
        write_minhash_index(corpus.limit(50), path, mode="append", bands=8)


def test_poly_probe_equals_full_sweep_restricted(spark, sf_dir):
    import pyspark.sql.functions as F

    from revtron_utils_spark.operators import dedup as DD
    from revtron_utils_spark.operators.dedup_index import (
        build_minhash_index,
        probe_minhash_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    p = dict(num_hashes=32, bands=8, hash_family="poly")
    postings, features = build_minhash_index(old, **p)
    probe = probe_minhash_index(new, postings, features, jaccard_threshold=0.3, **p)
    got = {(r.id_a, r.id_b) for r in probe.collect()}
    full = DD.minhash_poly_pairs(docs, num_hashes=32, bands=8, jaccard_threshold=0.3)
    want = {
        (r.id_a, r.id_b)
        for r in full.collect()
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    DD.release_caches()
    assert got == want
