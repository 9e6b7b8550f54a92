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
    engines."""
    return int_dot(qa, qb) / (F.sqrt(int_dot(qa, qa)) * F.sqrt(int_dot(qb, qb)))
