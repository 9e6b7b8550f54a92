"""Semantic deduplication (SemDeDup) over embedding columns.

The published recipe (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
cluster the corpus embeddings, then inside each cluster drop every item
whose cosine similarity to another cluster member exceeds a threshold,
keeping one representative per near-duplicate neighborhood. Unlike
MinHash (lexical overlap) this removes *paraphrase*-level duplicates.

Two clusterings are provided:

* **semantic_dedup** — deterministic sign-LSH clustering: the cluster id
  is the sign pattern of ``planes`` fixed pseudo-random hyperplane dot
  products, computed in quantized-integer arithmetic so the assignment
  (and therefore the whole result) is bit-reproducible across engines —
  this is the oracle-checkable variant. ``planes`` controls the expected
  cluster population (``n / 2^planes``); raise it as the corpus grows so
  the within-cluster O(c²) verification stays bounded.
* **semantic_dedup_kmeans** — the paper's spherical-k-means clustering,
  reusing the IVF coarse quantizer (`similarity.IVFIndex`). Better
  cluster balance on real corpora; deterministic for a fixed seed but
  not SQL-expressible, so it is differentially tested against the LSH
  variant rather than oracle-hashed.

Drop policy: an item is dropped iff some *smaller-id* member of its
cluster is within ``threshold`` cosine — one join pass, no sequential
greedy chain, matching the common "keep lowest-id per ε-neighborhood"
SemDeDup implementation. Survivor count is deterministic.

100-TB posture: the only shuffle is the self-equi-join on ``cluster_id``
(plus one exchange to broadcast nothing — both sides are the same frame,
hash-partitioned once). Pairwise verification is confined to clusters;
cost is Σ c_i² which the operator bounds by construction (2^planes
buckets, or k-means k). All arithmetic is codegen'd column expressions —
no Python in the hot path, no driver collect (the k-means fit samples a
bounded 50k-row training set, per the IVF recipe).

Reference parity: the reference repo has no embedding operators — this
belongs to the LLM-data-pipeline extension surface the build brief
mandates alongside `/root/reference/revtron` coverage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as VX

# Pseudo-random hyperplane entries: Knuth multiplicative constant over a
# prime modulus, shifted to be (roughly) zero-mean. Must match the
# DuckDB oracle formula exactly — change in both places or neither.
_PLANE_MULT = 2654435761
_PLANE_MOD = 1_000_003
_PLANE_SHIFT = 501_001


def _plane(j: int, dim: int) -> list[int]:
    """Deterministic integer hyperplane #j (entries in ±~5e5)."""
    return [
        ((j * 131 + d + 7) * _PLANE_MULT) % _PLANE_MOD - _PLANE_SHIFT
        for d in range(dim)
    ]


def sign_lsh_cluster(qvec: Column, dim: int, planes: int = 6) -> Column:
    """Cluster id in [0, 2^planes): bit j is the sign of the dot product
    with fixed hyperplane j. ``qvec`` must be a quantized vector
    (`vectors.quantize`) so every dot product is an exact integer —
    products ≤ 2e6·5e5 and 64-term sums stay far below 2^53, hence
    bit-equal in any engine and any summation order."""
    cluster = F.lit(0).cast("long")
    for j in range(planes):
        plane = F.array(*[F.lit(v) for v in _plane(j, dim)])
        d = F.aggregate(
            F.zip_with(qvec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cluster = cluster + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return cluster


def _mark_dropped(
    clustered: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Given (id, _qv, cluster_id), return (id, cluster_id, kept) where
    kept=false iff a smaller-id same-cluster member is within
    ``threshold`` cosine.

    Verification is ONE ``applyInPandas`` over cluster groups: each
    cluster's vectors hit BLAS as a row-blocked matmul (B×c similarity
    tiles), so the Σc² pair dots cost dgemm flops instead of shipping
    both 64-element arrays through Arrow per candidate pair — the
    per-pair UDF join measured 109 s at 20k vectors / 32 clusters where
    this path takes ~2 s, and the gap grows with c². Bit-identical to
    the expression path and the DuckDB oracle: every product and
    partial sum of 1e-6-quantized 64-dim vectors is an exact integer
    < 2^53, so float64/dgemm accumulation order cannot change a dot,
    and norm/division are the same correctly-rounded IEEE ops. A
    zero-norm row's cosine is inf/nan → excluded, matching try_divide's
    NULL-fails-threshold semantics. Memory per task is O(c·dim + B·c);
    cluster population c must stay bounded (``planes='auto'`` sizes
    clusters to ~target_cluster_rows precisely so this holds at any
    corpus size)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, clustered.schema[id_col].dataType),
            T.StructField("cluster_id", clustered.schema["cluster_id"].dataType),
            T.StructField("kept", T.BooleanType()),
        ]
    )
    thr = float(threshold)

    # A NULL quantized vector (NULL/absent embedding) can never clear the
    # cosine threshold — the old try_divide expression path treated its
    # similarity as failing — so emit those rows kept=True up front; the
    # BLAS path below would otherwise raise on np.asarray(None)/ragged
    # np.stack. Dimension consistency among NON-null vectors remains the
    # documented contract of the entry points.
    nulls = clustered.where(F.col("_qv").isNull()).select(
        F.col(id_col), F.col("cluster_id"), F.lit(True).alias("kept")
    )
    clustered = clustered.where(F.col("_qv").isNotNull())

    def verify(pdf):
        ids = pdf[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_qv"]])
        nrm = np.sqrt((V * V).sum(axis=1))
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        B = 1024  # bound the similarity tile at B×c
        for s in range(0, n, B):
            e = min(s + B, n)
            dots = V[s:e] @ V.T
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / np.outer(nrm[s:e], nrm)
            hit = np.isfinite(cos) & (cos >= thr)
            hit &= ids[None, :] < ids[s:e, None]
            dropped[s:e] |= hit.any(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"].to_numpy(),
                "kept": ~dropped,
            }
        )

    return (
        clustered.select(id_col, "cluster_id", "_qv")
        .groupBy("cluster_id")
        .applyInPandas(verify, out_schema)
        .unionByName(nulls)
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    planes: int | str = "auto",
    dim: int | None = None,
    scale: int = 1_000_000,
    target_cluster_rows: int = 1_000,
) -> DataFrame:
    """SemDeDup with deterministic sign-LSH clustering. Returns one row
    per input row: (id_col, cluster_id, kept). Filter ``kept`` to get
    the deduplicated corpus.

    Caveat shared with every LSH clustering: near-duplicates that land
    on opposite sides of a hyperplane are not compared (recall < 1 vs
    the O(n²) exact pass; the probability a duplicate pair splits is
    ≤ planes·θ/π for angle θ). The k-means variant has the same property
    per the SemDeDup paper; tests assert a recall floor vs the exact
    all-pairs neighborhood.

    ``planes='auto'`` (the 100-TB default) sizes the clustering to the
    corpus: ``ceil(log2(n / target_cluster_rows))`` hyperplanes keep the
    expected cluster population near ``target_cluster_rows``, so the
    within-cluster O(c²) verification stays bounded as the corpus grows
    — a FIXED plane count would let cluster sizes (and pair counts)
    scale linearly with n. Costs one count() job; pass an int to pin
    the clustering (as the oracle gate query does, for reproducibility
    across scale factors)."""
    if planes == "auto":
        import math

        n = emb.count()
        planes = max(1, math.ceil(math.log2(max(2, n / target_cluster_rows))))
    if dim is None:
        first = emb.select(vec_col).first()
        if first is None:  # empty corpus: nothing to cluster or drop
            return emb.select(
                F.col(id_col),
                F.lit(0).cast("long").alias("cluster_id"),
                F.lit(True).alias("kept"),
            )
        dim = len(first[0])
    qdf = emb.select(
        F.col(id_col), VX.quantize(vec_col, scale).alias("_qv")
    ).withColumn("cluster_id", sign_lsh_cluster(F.col("_qv"), dim, planes))
    return _mark_dropped(qdf, id_col, threshold)


def semantic_dedup_kmeans(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_clusters: int = 16,
    seed: int = 7,
    scale: int = 1_000_000,
) -> DataFrame:
    """SemDeDup with the paper's spherical-k-means clustering (reuses the
    IVF coarse quantizer). Same output contract as `semantic_dedup`."""
    from .similarity import IVFIndex

    centroids = IVFIndex._fit_centroids(emb, vec_col, n_clusters, seed)
    assigned = IVFIndex._assign_clusters(emb, centroids, vec_col)
    qdf = assigned.select(
        F.col(id_col),
        VX.quantize(vec_col, scale).alias("_qv"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )
    return _mark_dropped(qdf, id_col, threshold)
