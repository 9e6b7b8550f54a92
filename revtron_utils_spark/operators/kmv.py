"""KMV (k-minimum-values) distinct sketch — engine-exact, mergeable,
and the only sketch family here that estimates set INTERSECTIONS.

HLL (``rollup.hll_poly_*``) merges by per-bucket max, so it can only
estimate unions; inclusion–exclusion on two HLLs subtracts two noisy
numbers and blows up for small overlaps.  The KMV synopsis (Bar-Yossef
et al. 2002; Beyer et al., SIGMOD 2007 "On synopses for distinct-value
estimation under multiset operations") keeps the k smallest *distinct*
hash values per group:

- ``D̂ = (k-1)·M / h_(k)`` (the k-th smallest hash, hashes uniform on
  ``[0, M)``),
- two sketches combine by "k smallest of the union" — still a valid
  KMV synopsis — and ``ρ = |L ∩ S_A ∩ S_B| / k`` is an unbiased
  Jaccard estimator, giving ``|A∩B| ≈ ρ · Û``.

Everything is built from the repo's cross-engine polynomial hash
(``functions/polyhash.py``), integer array ops, and single exactly-
rounded IEEE divisions, so estimates are bit-identical between the
Spark path and a DuckDB oracle re-implementing the same pipeline
(queries ``kmv_distinct`` / ``kmv_intersect``).

Scale design (the 100 TB posture): a hash below the k-th minimum is a
~``k/D`` rarity, so the partial pass first bounds the shuffle with an
adaptive prefilter — ``approx_count_distinct`` per group (map-side
partial, O(groups) rows), threshold ``slack·k·M / D̂`` broadcast back,
and only surviving hashes (expected ``slack·k`` per group) reach the
``collect_set`` aggregate.  A deterministic rescue pass re-aggregates
(unfiltered) any group whose survivor set came back smaller than k
while its threshold was active, so the result is EXACTLY the k
smallest distinct hashes regardless of the estimator's error — the
prefilter changes cost, never the answer.

No counterpart in the reference (revtron/database/main.py delegates
``COUNT(DISTINCT ...)`` to Postgres); this is part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.polyhash import poly_hash_sql, poly_hash_str
from .rollup import _fmix32, _fmix32_sql_steps

KMV_DEFAULT_K = 64
# estimator hash space: fmix32 output spans the full 32-bit domain.
# The raw polynomial hash is NOT uniform (short keys map to tiny
# values — an un-finalized KMV overestimated 130 distinct keys as 35M);
# the murmur3 finalizer restores avalanche, exactly as the HLL twin
# does (rollup._fmix32).
KMV_M = 1 << 32


def _hashes(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    return df.where(F.col(key_col).isNotNull()).select(
        *group_cols,
        _fmix32(poly_hash_str(F.col(key_col).cast("string"))).alias("_h"),
    )


def _kmin_agg(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Per-group sorted k smallest distinct hashes + survivor count.

    ``collect_set`` dedups map-side; callers bound its input (prefilter
    or small groups) on the scale path.
    """
    return hashed.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("kmins"),
        F.size(F.collect_set("_h")).alias("_nsurv"),
    )


def kmv_partial(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = KMV_DEFAULT_K,
    prefilter: bool = True,
    slack: int = 8,
) -> DataFrame:
    """Mergeable KMV state ``(*group_cols, kmins: array<bigint>)``.

    ``kmins`` is the sorted list of the k smallest distinct hashes of
    ``key_col`` (fewer iff the group has fewer distinct keys — then the
    sketch is exact).  With ``prefilter`` (default), the shuffle
    carries only ~``slack·k`` hashes per group; the rescue pass keeps
    the output independent of the prefilter (see module docstring).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = _hashes(df, group_cols, key_col)
    if not prefilter:
        return _kmin_agg(hashed, group_cols, k).drop("_nsurv")

    cap = slack * k
    dhat = hashed.groupBy(*group_cols).agg(
        F.approx_count_distinct("_h").alias("_d")
    )
    thr = F.when(F.col("_d") <= cap, F.lit(KMV_M - 1)).otherwise(
        # float(cap)·M ≈ 5e11 < 2^53: the product and the divide are
        # exact-then-rounded doubles; the truncating cast floors
        (F.lit(float(cap) * KMV_M) / F.col("_d")).cast("long")
    )
    thr_df = dhat.select(*group_cols, thr.alias("_thr"))
    survivors = hashed.join(F.broadcast(thr_df), group_cols).where(
        F.col("_h") <= F.col("_thr")
    )
    from .dedup import _persist  # release_caches() reclaims it

    part = _persist(
        _kmin_agg(survivors, group_cols, k).join(F.broadcast(thr_df), group_cols)
    )
    # exactness guard: a group that kept < k distinct survivors while
    # its threshold was below the hash ceiling may have truncated the
    # true k-minima — re-aggregate those groups unfiltered. Candidates
    # come from thr_df (one row per non-empty group), NOT from the
    # survivor aggregate: a group whose EVERY hash exceeds its threshold
    # yields no survivor row at all, and deriving "need" from survivors
    # would silently drop it (a thr == M-1 group always survives — its
    # filter passes everything — so zero survivors implies thr < M-1
    # and the group belongs in the rescue set).
    ok = (F.col("_nsurv") >= k) | (F.col("_thr") == KMV_M - 1)
    good = part.where(ok).select(*group_cols, "kmins")
    need = thr_df.join(
        part.where(ok).select(*group_cols), group_cols, "left_anti"
    ).select(*group_cols)
    if need.limit(1).count() == 0:  # O(groups) check on the persisted partial
        return good
    rescued = _kmin_agg(
        hashed.join(F.broadcast(need), group_cols, "left_semi"), group_cols, k
    ).select(*group_cols, "kmins")
    return good.unionByName(rescued)


def kmv_merge(
    state: DataFrame, partial: DataFrame, group_cols: list[str], k: int = KMV_DEFAULT_K
) -> DataFrame:
    """Combine two KMV states: k smallest of the union, per group."""
    return (
        state.unionByName(partial)
        .groupBy(*group_cols)
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmins")))),
                1,
                k,
            ).alias("kmins")
        )
    )


def _estimate_col(arr: Column, k: int) -> Column:
    """``D̂`` from a kmins array: exact size below k, else
    ``(k-1)·M / h_(k)`` — one exactly-rounded IEEE division on
    integer-exact operands (``(k-1)·M < 2^53``), bit-identical across
    engines."""
    return F.when(
        F.size(arr) < k, F.size(arr).cast("double")
    ).otherwise(F.lit(float((k - 1) * KMV_M)) / F.element_at(arr, k).cast("double"))


def kmv_estimate(
    state: DataFrame,
    group_cols: list[str],
    k: int = KMV_DEFAULT_K,
    round_to: int = 6,
) -> DataFrame:
    """Read out ``(*group_cols, n_kept, approx_distinct)``."""
    return state.select(
        *group_cols,
        F.size("kmins").alias("n_kept"),
        F.round(_estimate_col(F.col("kmins"), k), round_to).alias("approx_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = KMV_DEFAULT_K,
    round_to: int = 6,
    prefilter: bool = True,
) -> DataFrame:
    """One-shot per-group distinct estimate (partial → estimate)."""
    return kmv_estimate(
        kmv_partial(df, group_cols, key_col, k, prefilter=prefilter),
        group_cols,
        k,
        round_to,
    )


def kmv_overlap_pairs(
    state: DataFrame,
    group_col: str,
    k: int = KMV_DEFAULT_K,
    round_to: int = 6,
) -> DataFrame:
    """All unordered group pairs (a < b) with union / intersection /
    Jaccard estimates from their KMV sketches.

    For each pair: ``L`` = k smallest of the combined sketches (a valid
    KMV of A∪B), ``inter`` = members of L present in both input
    sketches.  Then ``Û = (k-1)·M / L_(k)``, ``Ĵ = inter/k'``,
    ``|A∩B|^ = inter·(k-1)·M / (k'·L_(k'))`` — the last as ONE integer-
    exact division (numerator ≤ k²·M < 2^53) so both engines round
    identically.  When the combined sketch holds fewer than k hashes,
    both inputs were exact, so union/intersection are exact too.

    O(groups²) pairs — groups are segment-cardinality (priorities,
    domains), not row-cardinality; the pair join broadcasts one side.
    """
    a = state.select(
        F.col(group_col).alias("a"), F.col("kmins").alias("ka")
    )
    b = state.select(
        F.col(group_col).alias("b"), F.col("kmins").alias("kb")
    )
    pairs = a.join(F.broadcast(b), F.col("a") < F.col("b"))
    comb = F.array_sort(F.array_distinct(F.concat(F.col("ka"), F.col("kb"))))
    pairs = pairs.select(
        "a",
        "b",
        "ka",
        "kb",
        F.slice(comb, 1, k).alias("L"),
        F.size(comb).alias("_ncomb"),
    )
    pairs = pairs.withColumn("_ku", F.least(F.lit(k), F.size("L"))).withColumn(
        "_inter",
        F.size(F.array_intersect(F.array_intersect(F.col("L"), F.col("ka")), F.col("kb"))),
    )
    inter = F.col("_inter")
    ku = F.col("_ku")
    exact = F.col("_ncomb") < k  # both sketches exact => set ops exact
    union_est = F.when(exact, F.col("_ncomb").cast("double")).otherwise(
        F.lit(float((k - 1) * KMV_M)) / F.element_at(F.col("L"), k).cast("double")
    )
    # numerator inter·(k-1)·M ≤ k²·M ≈ 4e12: long-exact, one division
    inter_est = F.when(exact, inter.cast("double")).otherwise(
        (inter.cast("long") * F.lit(k - 1) * F.lit(KMV_M)).cast("double")
        / (ku.cast("long") * F.expr("element_at(L, _ku)")).cast("double")
    )
    jacc = inter.cast("double") / ku.cast("double")
    return pairs.select(
        "a",
        "b",
        F.round(union_est, round_to).alias("union_est"),
        F.round(inter_est, round_to).alias("intersect_est"),
        F.round(jacc, round_to).alias("jaccard_est"),
    )


# ------------------------------------------------------------------ oracles


def kmv_state_sql(table: str, group_cols: list[str], key_col: str, k: int) -> str:
    """DuckDB CTE body producing ``(*group_cols, kmins)`` — the direct
    (no-prefilter) computation the adaptive Spark path must equal.
    Same poly hash + murmur finalizer chain as the Spark side, applied
    through nested selects (each fmix step references ``h`` once, so
    inlining would double the expression per step)."""
    gc = ", ".join(group_cols)
    poly = poly_hash_sql(f"CAST({key_col} AS VARCHAR)")
    inner = (
        f"SELECT {gc}, {poly} AS h FROM {table} WHERE {key_col} IS NOT NULL"
    )
    for step in _fmix32_sql_steps():
        inner = f"SELECT {gc}, {step} AS h FROM ({inner})"
    return f"""
SELECT {gc},
       list_slice(list_sort(array_agg(DISTINCT h)), 1, {k}) AS kmins
FROM ({inner}) GROUP BY {gc}
"""


def kmv_distinct_oracle_sql(
    table: str,
    group_cols: list[str],
    key_col: str,
    k: int = KMV_DEFAULT_K,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — same hash, same k-min set,
    same single-division estimator."""
    gc = ", ".join(group_cols)
    return f"""
WITH state AS ({kmv_state_sql(table, group_cols, key_col, k)})
SELECT {gc}, CAST(len(kmins) AS INT) AS n_kept,
       ROUND(CASE WHEN len(kmins) < {k} THEN CAST(len(kmins) AS DOUBLE)
             ELSE CAST({float((k - 1) * KMV_M)!r} AS DOUBLE)
                  / CAST(list_extract(kmins, {k}) AS DOUBLE) END,
             {round_to}) AS approx_distinct
FROM state ORDER BY {gc}
"""


def kmv_overlap_oracle_sql(
    table: str,
    group_col: str,
    key_col: str,
    k: int = KMV_DEFAULT_K,
    round_to: int = 6,
) -> str:
    """DuckDB twin of ``kmv_partial`` → :func:`kmv_overlap_pairs`."""
    m = KMV_M
    km1m = float((k - 1) * m)
    return f"""
WITH state AS ({kmv_state_sql(table, [group_col], key_col, k)}),
pairs AS (
  SELECT sa.{group_col} AS a, sb.{group_col} AS b, sa.kmins AS ka, sb.kmins AS kb,
         list_slice(list_sort(list_distinct(list_concat(sa.kmins, sb.kmins))), 1, {k}) AS L,
         len(list_distinct(list_concat(sa.kmins, sb.kmins))) AS ncomb
  FROM state sa JOIN state sb ON sa.{group_col} < sb.{group_col}
), calc AS (
  SELECT a, b, ncomb,
         LEAST({k}, len(L)) AS ku,
         len(list_intersect(list_intersect(L, ka), kb)) AS inter,
         list_extract(L, {k}) AS hk,
         list_extract(L, LEAST({k}, len(L))) AS hku
  FROM pairs
)
SELECT a, b,
  ROUND(CASE WHEN ncomb < {k} THEN CAST(ncomb AS DOUBLE)
        ELSE CAST({km1m!r} AS DOUBLE) / CAST(hk AS DOUBLE) END, {round_to}) AS union_est,
  ROUND(CASE WHEN ncomb < {k} THEN CAST(inter AS DOUBLE)
        ELSE CAST(CAST(inter AS BIGINT) * {k - 1} * {m} AS DOUBLE)
             / CAST(CAST(ku AS BIGINT) * hku AS DOUBLE) END, {round_to}) AS intersect_est,
  ROUND(CAST(inter AS DOUBLE) / CAST(ku AS DOUBLE), {round_to}) AS jaccard_est
FROM calc ORDER BY a, b
"""
