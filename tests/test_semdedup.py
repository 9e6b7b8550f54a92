from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from revtron_utils_spark.functions import vectors as VX
from revtron_utils_spark.operators import semdedup as SD

TAU = 0.4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _exact_droppable(emb) -> set[int]:
    """Ids with ANY smaller-id neighbor at cosine >= TAU (no clustering) —
    the full-recall reference set."""
    q = emb.select("vec_id", VX.quantize("embedding").alias("qv"))
    a, b = q.alias("a"), q.alias("b")
    rows = (
        a.join(b, F.col("b.vec_id") < F.col("a.vec_id"))
        .where(VX.int_cosine(F.col("a.qv"), F.col("b.qv")) >= TAU)
        .select(F.col("a.vec_id"))
        .distinct()
        .collect()
    )
    return {r[0] for r in rows}


def test_semdedup_deterministic(emb):
    r1 = SD.semantic_dedup(emb, threshold=TAU, planes=4).orderBy("vec_id").collect()
    r2 = SD.semantic_dedup(emb, threshold=TAU, planes=4).orderBy("vec_id").collect()
    assert r1 == r2
    assert len(r1) == emb.count()


def test_semdedup_precision_and_recall(emb):
    exact = _exact_droppable(emb)
    out = SD.semantic_dedup(emb, threshold=TAU, planes=4).collect()
    dropped = {r.vec_id for r in out if not r.kept}
    # precision 1 by construction: an item is only dropped on a verified
    # within-cluster cosine >= TAU with a smaller id
    assert dropped <= exact
    # recall floor: 4-plane LSH at the fixture's weak 0.4 operating point
    assert len(dropped) >= 0.10 * len(exact)


def test_semdedup_kmeans_precision(emb):
    exact = _exact_droppable(emb)
    out = SD.semantic_dedup_kmeans(emb, threshold=TAU, n_clusters=8, seed=7).collect()
    dropped = {r.vec_id for r in out if not r.kept}
    assert dropped <= exact
    assert len(out) == emb.count()


def test_semdedup_drops_identical_vectors(emb, spark):
    # clone the first 5 vectors under new ids: every clone MUST be
    # dropped by both variants (cosine 1.0 to its source, same cluster
    # by determinism of the assignment)
    base = emb.limit(5)
    clones = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(clones)
    for out in (
        SD.semantic_dedup(both, threshold=0.99, planes=4),
        SD.semantic_dedup_kmeans(both, threshold=0.99, n_clusters=8, seed=7),
    ):
        kept = {r.vec_id: r.kept for r in out.collect()}
        for r in base.collect():
            assert kept[r.vec_id + 1_000_000] is False, "clone survived"


def test_semdedup_cluster_ids_bounded(emb):
    out = SD.semantic_dedup(emb, threshold=TAU, planes=4)
    mx = out.agg(F.max("cluster_id"), F.min("cluster_id")).first()
    assert 0 <= mx[1] and mx[0] < 16


def test_semdedup_auto_planes_bounds_clusters(emb, spark):
    # inflate the corpus 8x under new ids: auto mode must pick more
    # planes than it would for the base corpus, keeping E[cluster size]
    # near the target instead of letting clusters grow with n
    import pyspark.sql.functions as F

    big = emb
    for i in range(1, 8):
        big = big.unionByName(
            emb.select((F.col("vec_id") + 10_000_000 * i).alias("vec_id"), "embedding", "label")
        )
    out_small = SD.semantic_dedup(emb, threshold=0.99, target_cluster_rows=100)
    out_big = SD.semantic_dedup(big, threshold=0.99, target_cluster_rows=100)
    k_small = out_small.agg(F.max("cluster_id")).first()[0]
    k_big = out_big.agg(F.max("cluster_id")).first()[0]
    assert k_big > k_small  # more planes → larger cluster-id space
    # expected population stays near target: mean cluster size under 4x target
    n_big = big.count()
    n_clusters = out_big.select("cluster_id").distinct().count()
    assert n_big / n_clusters < 400


def test_null_embedding_rows_are_kept_not_crashed(spark):
    """NULL embeddings can never clear the cosine threshold — they must
    come back kept=True (matching the old try_divide semantics) instead
    of crashing the BLAS verify path on np.asarray(None)."""
    from revtron_utils_spark.operators.semdedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # exact dup of 1 → dropped
        (3, None),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(
        df, threshold=0.99, planes=2, dim=4
    ).collect()}
    assert out[3] is True and out[4] is True
    assert out[1] is True and out[2] is False
