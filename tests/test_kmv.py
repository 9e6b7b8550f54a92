"""KMV sketch: exactness below k, estimator accuracy, merge algebra,
the prefilter/rescue invariant, and the DuckDB oracle differential."""

from __future__ import annotations

from pyspark.sql import functions as F

from revtron_utils_spark.io import read_table
from revtron_utils_spark.operators import kmv

from conftest import duck

K = 64
GC = ["o_orderpriority"]


def _orders(spark, sf_dir):
    return read_table(spark, sf_dir, "orders")


def test_exact_below_k(spark, sf_dir):
    """Groups with fewer than k distinct keys report the exact count."""
    est = kmv.kmv_distinct(
        _orders(spark, sf_dir), GC, "o_custkey", k=1024
    ).collect()
    truth = {
        r[0]: r[1]
        for r in _orders(spark, sf_dir)
        .groupBy(*GC)
        .agg(F.countDistinct("o_custkey"))
        .collect()
    }
    assert est
    for row in est:
        assert row["n_kept"] == truth[row[GC[0]]]
        assert row["approx_distinct"] == float(truth[row[GC[0]]])


def test_estimate_within_band(spark, sf_dir):
    """k=64 ⇒ relative σ ≈ 1/√(k−2) ≈ 0.13; assert a generous 3σ."""
    est = {
        r[0]: r["approx_distinct"]
        for r in kmv.kmv_distinct(_orders(spark, sf_dir), GC, "o_custkey", k=K).collect()
    }
    truth = {
        r[0]: r[1]
        for r in _orders(spark, sf_dir)
        .groupBy(*GC)
        .agg(F.countDistinct("o_custkey"))
        .collect()
    }
    for g, t in truth.items():
        assert abs(est[g] - t) / t < 0.4, (g, est[g], t)


def test_merge_equals_direct(spark, sf_dir):
    """KMV(A ∪ B) == merge(KMV(A), KMV(B)) — the mergeability law."""
    df = _orders(spark, sf_dir)
    a = df.where(F.col("o_orderkey") % 2 == 0)
    b = df.where(F.col("o_orderkey") % 2 == 1)
    merged = kmv.kmv_merge(
        kmv.kmv_partial(a, GC, "o_custkey", k=K),
        kmv.kmv_partial(b, GC, "o_custkey", k=K),
        GC,
        k=K,
    )
    direct = kmv.kmv_partial(df, GC, "o_custkey", k=K, prefilter=False)
    m = {r[0]: r["kmins"] for r in merged.collect()}
    d = {r[0]: r["kmins"] for r in direct.collect()}
    assert m == d


def test_prefilter_rescue_is_exact(spark, sf_dir):
    """slack=1 starves the survivor sets, forcing the rescue pass —
    the result must still equal the unfiltered k-minima."""
    df = _orders(spark, sf_dir)
    tight = kmv.kmv_partial(df, GC, "o_custkey", k=K, prefilter=True, slack=1)
    direct = kmv.kmv_partial(df, GC, "o_custkey", k=K, prefilter=False)
    t = {r[0]: r["kmins"] for r in tight.collect()}
    d = {r[0]: r["kmins"] for r in direct.collect()}
    assert t == d


def test_overlap_pairs_sane(spark, sf_dir):
    """Intersection estimates land near the true overlaps."""
    df = _orders(spark, sf_dir)
    st = kmv.kmv_partial(df, GC, "o_custkey", k=K)
    pairs = {
        (r["a"], r["b"]): r for r in kmv.kmv_overlap_pairs(st, GC[0], k=K).collect()
    }
    assert len(pairs) == 10  # C(5,2) priority pairs
    groups = [r[0] for r in df.select(GC[0]).distinct().collect()]
    sets = {
        g: {
            r[0]
            for r in df.where(F.col(GC[0]) == g).select("o_custkey").distinct().collect()
        }
        for g in groups
    }
    for (a, b), row in pairs.items():
        tu, ti = len(sets[a] | sets[b]), len(sets[a] & sets[b])
        assert abs(row["union_est"] - tu) / tu < 0.4
        assert abs(row["intersect_est"] - ti) / max(ti, 1) < 0.5
        assert 0.0 <= row["jaccard_est"] <= 1.0


def test_oracle_differential(spark, sf_dir):
    """Spark path (adaptive prefilter) is bit-equal to the DuckDB
    oracle (direct computation) — estimates AND pair overlaps."""
    con = duck()
    df = _orders(spark, sf_dir)
    s_est = sorted(
        tuple(r)
        for r in kmv.kmv_estimate(kmv.kmv_partial(df, GC, "o_custkey", k=K), GC, K).collect()
    )
    o_est = sorted(
        tuple(r)
        for r in con.sql(
            kmv.kmv_distinct_oracle_sql("orders", GC, "o_custkey", K)
        ).fetchall()
    )
    assert s_est == o_est
    s_pairs = sorted(
        tuple(r)
        for r in kmv.kmv_overlap_pairs(
            kmv.kmv_partial(df, GC, "o_custkey", k=K), GC[0], k=K
        ).collect()
    )
    o_pairs = sorted(
        tuple(r)
        for r in con.sql(
            kmv.kmv_overlap_oracle_sql("orders", GC[0], "o_custkey", K)
        ).fetchall()
    )
    assert s_pairs == o_pairs


def test_zero_survivor_groups_not_dropped(spark, sf_dir):
    """A group whose EVERY hash exceeds its adaptive threshold yields
    no survivor row; the rescue set must come from the per-group
    threshold frame, not the survivor aggregate, or the group vanishes
    from the output entirely (ADVICE r5). With k=2, slack=1 each group's
    threshold keeps a ~2/D slice of its hashes, so across 200 groups of
    ~60 keys several groups land in the zero-survivor regime."""
    rows = [(f"g{i:03d}", f"key_{i}_{j}") for i in range(200) for j in range(60)]
    df = spark.createDataFrame(rows, ["g", "key"])
    tight = kmv.kmv_partial(df, ["g"], "key", k=2, prefilter=True, slack=1)
    direct = kmv.kmv_partial(df, ["g"], "key", k=2, prefilter=False)
    t = {r["g"]: r["kmins"] for r in tight.collect()}
    d = {r["g"]: r["kmins"] for r in direct.collect()}
    assert len(t) == 200, f"groups dropped: {sorted(set(d) - set(t))[:5]}"
    assert t == d


def test_partial_persist_registered_for_release(spark, sf_dir):
    """kmv_partial's internal persist must be reclaimable through the
    repo-wide release_caches() convention (ADVICE r5: leak in
    long-lived drivers)."""
    from revtron_utils_spark.operators.dedup import release_caches

    release_caches()  # drain anything earlier tests left behind
    df = _orders(spark, sf_dir)
    kmv.kmv_partial(df, GC, "o_custkey", k=K, prefilter=True).collect()
    assert release_caches() >= 1
