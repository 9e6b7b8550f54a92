"""Vector column functions (embedding math) as built-in expressions.

``array<float>`` embeddings stay JVM-side: dot products and norms are
``zip_with`` + ``aggregate`` expressions inside whole-stage codegen — no
Pandas UDF in the hot path. For oracle-exact cross-engine comparison we
also provide a quantized dot product (``int_dot``): elements are rounded
to 1e-6 resolution first, making every partial sum exactly representable
in a double, so the result is bit-identical regardless of summation order
or engine (IEEE-754 determinism) — the trick that lets a float similarity
query hash-match a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize(a: Column | str, scale: int = 1_000_000) -> Column:
    """Round each element to 1/scale resolution (stored as double).
    Products of quantized elements are exact integers < 2^53, so sums are
    exact and order-independent."""
    return F.transform(to_double(a), lambda x: F.round(x * scale))


def int_dot(qa: Column, qb: Column) -> Column:
    """Exact dot product of pre-quantized vectors."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def int_cosine(qa: Column, qb: Column) -> Column:
    """Deterministic cosine over quantized vectors: exact integer dot and
    norms, one correctly-rounded sqrt/div each — bit-identical across
    engines. try_divide: a zero-norm vector (all elements quantize to
    0) has undefined cosine — NULL fails any threshold/ranking instead
    of raising DIVIDE_BY_ZERO under ANSI mode, matching DuckDB's NULL
    division."""
    return F.try_divide(
        int_dot(qa, qb), F.sqrt(int_dot(qa, qa)) * F.sqrt(int_dot(qb, qb))
    )


def pair_dot_arrow() -> "Column":
    """Arrow-vectorized dot product UDF for pair-heavy workloads.

    Spark's higher-order functions (``zip_with``/``aggregate``) evaluate
    interpreted, per element, with boxing — fine for one vector per row,
    ~30× too slow for millions of candidate pairs. This Pandas UDF
    batches pairs through Arrow and hits BLAS via ``np.einsum``.
    Determinism is preserved for quantized inputs: every product and
    partial sum of 1e-6-quantized 64-dim vectors is an exact integer
    < 2^53, so float64 accumulation order cannot change the result —
    output is bit-identical to the expression path and the DuckDB oracle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's signature inference rejects
    def _dot(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.values)
        B = np.stack(b.values)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return pandas_udf(_dot, "double")


def hashed_tf_embedding(
    text_col: Column | str,
    dim: int = 64,
    l2_normalize: bool = True,
    hash_family: str = "xxhash",
) -> Column:
    """Hashing-trick document embedding (``array<double>`` of ``dim``):
    each token hashes to a bucket (``xxhash64 mod dim``) and the vector
    counts bucket hits — the classic model-free text featurizer that
    turns raw text into a vector the similarity/ANN family can consume
    (cosine near-dup over text with no pretrained model on the cluster).

    Pure codegen'd column expression — tokenization, hashing, the
    O(tokens) scatter-add (one ``aggregate`` over a mutable bucket via
    ``transform``), and the L2 normalization all stay JVM-side; no
    shuffle, no Python. Cost O(tokens · dim) comparisons per doc — keep
    ``dim`` ≤ a few hundred (at larger dims switch to the explode +
    pivot aggregation, which trades a shuffle for linearity).

    ``hash_family='poly'`` buckets via the polynomial rolling hash
    instead of xxhash64 — slower per token but reproducible in any
    engine, which upgrades downstream text-near-dup results from
    rows-only to hash-verifiable against a DuckDB oracle."""
    from revtron_utils_spark.functions.classifier import token_poly_hash
    from revtron_utils_spark.functions.text import tokens

    if hash_family not in ("xxhash", "poly"):
        # fail fast (round-9 advice, the embedding_neardup_pairs
        # sibling): a typo'd family must not silently bucket via xxhash
        raise ValueError(
            f"hashed_tf_embedding: unknown hash_family {hash_family!r}"
            " (expected 'xxhash' or 'poly')"
        )
    toks = tokens(text_col) if isinstance(text_col, str) else tokens(text_col)
    if hash_family == "poly":
        buckets = F.transform(toks, lambda t: token_poly_hash(t) % dim)
    else:
        buckets = F.transform(toks, lambda t: F.pmod(F.xxhash64(F.lower(t)), F.lit(dim)))
    zero = F.array_repeat(F.lit(0.0), dim)
    counts = F.aggregate(
        buckets,
        zero,
        lambda acc, b: F.transform(
            acc, lambda v, i: v + F.when(b == i.cast("bigint"), 1.0).otherwise(0.0)
        ),
    )
    if not l2_normalize:
        return counts
    # let-bind `counts` and the norm via single-element transform scopes
    # (lambda arguments are true variables in Catalyst): embedding the
    # norm expression directly in the per-element division lambda
    # re-evaluated the WHOLE counts aggregate once per element — a 64×
    # CPU blowup measured at 59 s vs 0.9 s for one sf0.1 corpus pass
    # (HOF lambdas run interpreted; nothing dedups a captured subtree).
    # Same operations on the same values, so output is bit-identical.
    return F.transform(
        F.array(counts),
        lambda c: F.transform(
            F.array(F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, v: a + v * v))),
            lambda n: F.when(n > 0, F.transform(c, lambda v: v / n)).otherwise(c),
        )[0],
    )[0]
