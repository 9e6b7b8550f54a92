"""The cross-engine polynomial string hash — the repo's core exactness
primitive, in ONE place.

``h(s) = fold((acc·31 + ascii(ch)) mod 1e9+7)`` over the raw characters
of ``s`` is bit-equal between a Spark higher-order ``aggregate``, a
DuckDB ``list_reduce``, a Python ``ord`` loop, and the numpy
rolling-hash composition (``h(s1·s2) = (h(s1)·31^len(s2) + h(s2)) mod
p``). Everything that needs an engine-reproducible hash — Bloom
positions (curation), CMS buckets / HLL inputs (rollup), minhash /
simhash poly families (dedup) — derives from this fold; keeping the
Spark and SQL twins side-by-side here means a change to the family
cannot silently diverge between call sites."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_BASE = 31


def poly_hash_str(col: Column) -> Column:
    """Spark fold over the raw (not lowercased) characters of ``col``."""
    chars = F.filter(F.split(col, "(?!^)"), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * POLY_BASE + F.ascii(ch)) % POLY_MOD,
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`poly_hash_str` over the SQL expression
    ``expr`` (a VARCHAR column or expression)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(x, y) -> (x * {POLY_BASE} + y) % {POLY_MOD})"
    )
