"""Tests for operators/rollup.py (incremental aggregate maintenance,
HLL sketch rollups) and operators/fuzzy.py (blocked fuzzy joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.operators import rollup as RU
from revtron_utils_spark.operators.fuzzy import fuzzy_join, fuzzy_self_pairs, normalized_key


# ---------------------------------------------------------------- rollup


def test_maintain_rollup_equals_direct_agg(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    batches = [
        ev.filter(F.col("ts") < "2024-01-10"),
        ev.filter((F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-20")),
        ev.filter(F.col("ts") >= "2024-01-20"),
    ]
    got = {
        r.event_type: r
        for r in RU.maintain_rollup(batches, ["event_type"], "value").collect()
    }
    want = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var_pop"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k].n == want[k].n
        assert got[k].total == pytest.approx(want[k].total, rel=1e-9)
        # finalize rounds to 6 decimals — compare with matching tolerance
        assert got[k].mean == pytest.approx(want[k].mean, abs=1e-6)
        assert got[k].var_pop == pytest.approx(want[k].var_pop, rel=1e-6, abs=1e-6)
        assert got[k].min == pytest.approx(want[k].min)
        assert got[k].max == pytest.approx(want[k].max)


def test_rollup_merge_handles_disjoint_groups(spark):
    b1 = spark.createDataFrame([("a", 1.0), ("a", 3.0)], ["g", "v"])
    b2 = spark.createDataFrame([("b", 10.0)], ["g", "v"])
    out = {
        r.g: r for r in RU.maintain_rollup([b1, b2], ["g"], "v").collect()
    }
    assert out["a"].n == 2 and out["a"].mean == 2.0 and out["a"].max == 3.0
    assert out["b"].n == 1 and out["b"].total == 10.0 and out["b"].min == 10.0


def test_sketch_rollup_merge_estimates(spark):
    rows1 = [("t", i) for i in range(0, 600)]
    rows2 = [("t", i) for i in range(300, 1000)]  # 300-599 overlap
    b1 = RU.sketch_rollup_partial(spark.createDataFrame(rows1, ["g", "k"]), ["g"], "k")
    b2 = RU.sketch_rollup_partial(spark.createDataFrame(rows2, ["g", "k"]), ["g"], "k")
    merged = RU.sketch_rollup_merge(b1, b2, ["g"])
    est = RU.sketch_rollup_estimate(merged, ["g"]).collect()[0]
    assert est.n == 1300  # raw rows add
    # distinct = 1000; HLL at lg_k=12 is well under 5% off at this scale
    assert 950 <= est.approx_distinct <= 1050


# ----------------------------------------------------------------- fuzzy


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_self_pairs_vs_python(spark):
    names = ["red widget", "rad widget", "blue widget", "red gadget", "rod widget"]
    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    blk = F.element_at(F.split(F.col("name"), " "), 2)
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_self_pairs(df, "name", "id", [blk], max_dist=2).collect()
    }
    want = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if names[i].split()[1] != names[j].split()[1]:
                continue  # blocked out
            d = _py_lev(names[i], names[j])
            if d <= 2:
                want[(i, j)] = d
    assert got == want
    # cross-block pair (red widget vs red gadget) must NOT appear even
    # though its distance is small — blocking is recall-bounding
    assert (0, 3) not in got


def test_fuzzy_join_two_tables(spark):
    crm = spark.createDataFrame(
        [(1, "Acme Corp", "US"), (2, "Globex", "DE")], ["crm_id", "name", "cc"]
    )
    erp = spark.createDataFrame(
        [(10, "ACME Corp.", "US"), (11, "Initech", "US"), (12, "Globexx", "DE")],
        ["erp_id", "name2", "cc2"],
    )
    crm = crm.withColumn("nk", normalized_key("name"))
    erp = erp.withColumn("nk2", normalized_key("name2"))
    out = fuzzy_join(
        crm, erp, "nk", "nk2", block_on=[("cc", "cc2")], max_dist=2
    ).select("crm_id", "erp_id", "dist")
    got = {(r.crm_id, r.erp_id): r.dist for r in out.collect()}
    assert got == {(1, 10): 0, (2, 12): 1}


def test_fuzzy_threshold_excludes_far_pairs(spark):
    df = spark.createDataFrame(
        [(1, "aaaa", "x"), (2, "zzzz", "x")], ["id", "t", "blk"]
    )
    assert fuzzy_self_pairs(df, "t", "id", ["blk"], max_dist=3).count() == 0


def test_fuzzy_join_left_outer_keeps_unmatched(spark):
    """Outer fuzzy joins must keep unmatched rows (dist NULL) — the
    threshold lives in the join condition, not a post-filter."""
    crm = spark.createDataFrame(
        [(1, "acme", "US"), (2, "zzzzz", "US"), (3, "solo", "JP")],
        ["crm_id", "nk", "cc"],
    )
    erp = spark.createDataFrame([(10, "acmee", "US")], ["erp_id", "nk2", "cc2"])
    out = fuzzy_join(crm, erp, "nk", "nk2", block_on=[("cc", "cc2")], max_dist=2, how="left")
    rows = {r.crm_id: (r.erp_id, r.dist) for r in out.collect()}
    assert rows[1] == (10, 1)          # matched within distance
    assert rows[2] == (None, None)     # same block, too far -> kept, null
    assert rows[3] == (None, None)     # no block match -> kept, null
    assert len(rows) == 3


# --------------------------------------------------- quantile rollup


def test_quantile_rollup_merge_equals_recompute(spark):
    import random

    from revtron_utils_spark.operators.rollup import (
        quantile_rollup_merge,
        quantile_rollup_partial,
    )

    rng = random.Random(5)
    rows = [(("x" if i % 3 else "y"), rng.gauss(50, 20)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    b1, b2 = df.filter("v < 45"), df.filter("v >= 45")
    merged = quantile_rollup_merge(
        quantile_rollup_partial(b1, ["g"], "v"),
        quantile_rollup_partial(b2, ["g"], "v"),
        ["g"],
    )
    direct = quantile_rollup_partial(df, ["g"], "v")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_quantile_rollup_estimate_error_bound(spark):
    import math
    import random

    from revtron_utils_spark.operators.rollup import maintain_quantile_rollup

    rng = random.Random(17)
    rows = [("g", rng.lognormvariate(1, 1.2)) for _ in range(30000)]
    df = spark.createDataFrame(rows, "g string, v double")
    batches = [df.filter(f"pmod(hash(v), 3) = {i}") for i in range(3)]
    probs = [0.25, 0.5, 0.9, 0.99]
    est = {
        r["p"]: r["quantile_est"]
        for r in maintain_quantile_rollup(batches, ["g"], "v", probs).collect()
    }
    exact = df.groupBy("g").agg(F.percentile("v", F.lit(probs)).alias("q")).first()["q"]
    # documented bound: relative error <= e^(1/bins_per_efold) - 1 per
    # covering bin edge; allow 2x slack for the two-rank interpolation
    bound = 2 * (math.exp(1 / 64) - 1)
    for p, ex in zip(probs, exact):
        assert abs(est[p] - ex) / abs(ex) <= bound, (p, est[p], ex)


def test_quantile_rollup_tied_bin_exact(spark):
    from revtron_utils_spark.operators.rollup import (
        quantile_rollup_estimate,
        quantile_rollup_partial,
    )

    # constant-heavy data: the covering bin is tied -> exact median
    rows = [("g", 5.0)] * 100 + [("g", 500.0)] * 10
    df = spark.createDataFrame(rows, "g string, v double")
    state = quantile_rollup_partial(df, ["g"], "v")
    est = quantile_rollup_estimate(state, ["g"], [0.5]).first()["quantile_est"]
    assert est == 5.0


# ------------------------------------------------------ count-min sketch


def test_cms_estimate_dominates_truth_and_is_exact_when_wide(spark):
    from pyspark.sql import functions as F

    from revtron_utils_spark.operators import rollup as RU

    data = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(data, ["k"])
    true = {"a": 50, "b": 30, "c": 5, "d": 1}
    # wide sketch: 4 keys in 1024 buckets -> no collisions, est == truth
    sk = RU.cms_build(df, "k", width=1024, depth=4)
    est = {
        r.k: r.est
        for r in RU.cms_estimate(sk, df.distinct(), "k", width=1024, depth=4).collect()
    }
    assert est == true
    # saturated sketch (width 2): collisions certain, but the CMS
    # guarantee holds — estimates only ever OVERcount
    sk2 = RU.cms_build(df, "k", width=2, depth=2)
    est2 = {
        r.k: r.est
        for r in RU.cms_estimate(sk2, df.distinct(), "k", width=2, depth=2).collect()
    }
    assert all(est2[k] >= v for k, v in true.items())
    # deterministic: same saturated sketch, same collisions
    est2b = {
        r.k: r.est
        for r in RU.cms_estimate(
            RU.cms_build(df, "k", width=2, depth=2), df.distinct(), "k", width=2, depth=2
        ).collect()
    }
    assert est2 == est2b


def test_cms_merge_equals_full_build(spark):
    from pyspark.sql import functions as F

    from revtron_utils_spark.operators import rollup as RU

    df = spark.range(0, 500).select(F.concat(F.lit("k"), (F.col("id") % 37)).alias("k"))
    # split by hash parity, sketch each half, merge
    lo = df.filter(F.crc32("k") % 2 == 0)
    hi = df.filter(F.crc32("k") % 2 == 1)
    merged = RU.cms_merge([RU.cms_build(lo, "k"), RU.cms_build(hi, "k")])
    full = RU.cms_build(df, "k")
    m = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    f = {(r.row, r.bucket): r.cnt for r in full.collect()}
    assert m == f


def test_cms_depth_validation(spark):
    from revtron_utils_spark.operators import rollup as RU

    df = spark.createDataFrame([("x",)], ["k"])
    import pytest

    with pytest.raises(ValueError):
        RU.cms_build(df, "k", depth=99)


# ------------------------------------------------------ engine-exact HLL


def test_hll_poly_accuracy_at_scale(spark):
    from pyspark.sql import functions as F

    from revtron_utils_spark.operators.rollup import hll_poly_distinct

    # 5000 distinct keys, p=8 (m=256): raw HLL error ~1.04/sqrt(m) ≈ 6.5%
    df = spark.range(0, 5000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    row = hll_poly_distinct(df, ["grp"], "k", p=8).collect()[0]
    assert abs(row.approx_distinct - 5000) / 5000 < 0.15
    # duplicates cannot change the estimate (max-based buckets)
    dup = df.unionByName(df)
    row2 = hll_poly_distinct(dup, ["grp"], "k", p=8).collect()[0]
    assert row2.approx_distinct == row.approx_distinct


def test_hll_poly_matches_duckdb_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from revtron_utils_spark.operators.rollup import (
        hll_poly_distinct,
        hll_poly_oracle_sql,
    )

    df = spark.range(0, 800).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("u"), (F.col("id") % 311)).alias("k"),
    )
    got = sorted(map(tuple, hll_poly_distinct(df, ["grp"], "k", p=5).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW t AS SELECT CAST(range % 3 AS VARCHAR) AS grp,"
        " 'u' || CAST(range % 311 AS VARCHAR) AS k FROM range(800)"
    )
    want = sorted(map(tuple, con.sql(hll_poly_oracle_sql(["grp"], "k", "t", p=5)).fetchall()))
    assert got == want


def test_hll_poly_merge_equals_full_build(spark):
    from pyspark.sql import functions as F

    from revtron_utils_spark.operators.rollup import (
        hll_poly_distinct,
        hll_poly_estimate,
        hll_poly_merge,
        hll_poly_partial,
    )

    df = spark.range(0, 2000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.concat(F.lit("k"), F.col("id")).alias("k"),
    )
    lo = df.filter(F.crc32("k") % 2 == 0)
    hi = df.filter(F.crc32("k") % 2 == 1)
    merged = hll_poly_merge(
        hll_poly_partial(lo, ["grp"], "k", p=6),
        hll_poly_partial(hi, ["grp"], "k", p=6),
        ["grp"],
    )
    got = sorted(map(tuple, hll_poly_estimate(merged, ["grp"], p=6).collect()))
    want = sorted(map(tuple, hll_poly_distinct(df, ["grp"], "k", p=6).collect()))
    assert got == want


def test_hll_poly_p_validation(spark):
    import pytest

    from revtron_utils_spark.operators.rollup import hll_poly_distinct

    df = spark.createDataFrame([("g", "x")], ["grp", "k"])
    for bad in (0, 32, 40, -1):
        with pytest.raises(ValueError):
            hll_poly_distinct(df, ["grp"], "k", p=bad)


def test_ams_f2_estimates_self_join_size(spark, sf_dir):
    """F2^ lands within the AMS variance band of the true Σf², and the
    merge law sketch(A)+sketch(B) == sketch(A∪B) holds exactly."""
    from pyspark.sql import functions as F

    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.rollup import (
        ams_f2,
        ams_f2_estimate,
        ams_f2_merge,
        ams_f2_partial,
    )

    li = read_table(spark, sf_dir, "lineitem")
    est = {r[0]: r["f2_est"] for r in ams_f2(li, ["l_returnflag"], "l_orderkey", k=16).collect()}
    truth = {
        r[0]: r[1]
        for r in li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("f") * F.col("f")).alias("f2"))
        .collect()
    }
    for g, t in truth.items():
        # var(F2^) = 2(F2² − F4)/k ≤ 2F2²/k → rel σ ≤ √(2/16) ≈ 0.35; 3σ
        assert abs(est[g] - t) / t < 1.0, (g, est[g], t)

    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    merged = ams_f2_estimate(
        ams_f2_merge(
            ams_f2_partial(a, ["l_returnflag"], "l_orderkey", 16),
            ams_f2_partial(b, ["l_returnflag"], "l_orderkey", 16),
            ["l_returnflag"],
        ),
        ["l_returnflag"],
        16,
    )
    direct = ams_f2(li, ["l_returnflag"], "l_orderkey", 16)
    m = {r[0]: r["f2_est"] for r in merged.collect()}
    d = {r[0]: r["f2_est"] for r in direct.collect()}
    assert m == d
