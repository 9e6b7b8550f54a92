"""SCD2 merge semantics (insert/close/reopen, point-in-time snapshots)
and single-pass table profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from revtron_utils_spark.operators.profile import profile_table
from revtron_utils_spark.operators.scd import asof_snapshot, scd2_init, scd2_merge


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id bigint, city string, tier string")


def test_scd2_lifecycle(spark):
    t0 = scd2_init(_batch(spark, [(1, "nyc", "gold"), (2, "sfo", "silver")]), ["id"], "2024-01-01")
    assert t0.count() == 2 and t0.filter("is_current").count() == 2

    # batch 2: id=1 changes city, id=2 unchanged, id=3 new
    t1 = scd2_merge(
        t0,
        _batch(spark, [(1, "lax", "gold"), (2, "sfo", "silver"), (3, "chi", "bronze")]),
        ["id"],
        "2024-02-01",
    )
    rows = {(r.id, r.is_current): r for r in t1.collect()}
    assert len(rows) == 4  # closed v1 of id=1, open v2, open id=2, open id=3
    assert rows[(1, False)].city == "nyc"
    assert str(rows[(1, False)].effective_to).startswith("2024-02-01")
    assert rows[(1, True)].city == "lax" and rows[(1, True)].effective_to is None
    assert rows[(2, True)].effective_from == rows[(2, True)].effective_from  # untouched
    assert rows[(3, True)].city == "chi"

    # batch 3: id=1 reverts to nyc → another version
    t2 = scd2_merge(t1, _batch(spark, [(1, "nyc", "gold")]), ["id"], "2024-03-01")
    id1 = sorted(
        [r for r in t2.collect() if r.id == 1], key=lambda r: str(r.effective_from)
    )
    assert [r.city for r in id1] == ["nyc", "lax", "nyc"]
    assert [r.is_current for r in id1] == [False, False, True]

    # point-in-time snapshots
    jan = {r.id: r.city for r in asof_snapshot(t2, "2024-01-15").collect()}
    feb = {r.id: r.city for r in asof_snapshot(t2, "2024-02-15").collect()}
    assert jan == {1: "nyc", 2: "sfo"}
    assert feb == {1: "lax", 2: "sfo", 3: "chi"}


def test_scd2_null_safe_change_detection(spark):
    t0 = scd2_init(_batch(spark, [(1, None, "gold")]), ["id"], "2024-01-01")
    # same NULL city → no new version
    t1 = scd2_merge(t0, _batch(spark, [(1, None, "gold")]), ["id"], "2024-02-01")
    assert t1.count() == 1
    # NULL → value IS a change
    t2 = scd2_merge(t1, _batch(spark, [(1, "nyc", "gold")]), ["id"], "2024-03-01")
    assert t2.count() == 2


def test_scd2_duplicate_batch_keys_collapse(spark):
    t0 = scd2_init(_batch(spark, [(1, "nyc", "gold")]), ["id"], "2024-01-01")
    t1 = scd2_merge(
        t0, _batch(spark, [(1, "lax", "gold"), (1, "chi", "gold")]), ["id"], "2024-02-01"
    )
    assert t1.filter("id = 1 AND is_current").count() == 1


def test_profile_table(engine):
    li = engine.get_table("lineitem")
    prof = {r.column: r for r in profile_table(li, approx_distinct=False).collect()}
    assert prof["l_quantity"].stat_kind == "numeric"
    assert prof["l_quantity"].n_nulls == 0 and prof["l_quantity"].null_rate == 0.0
    assert 1 <= prof["l_quantity"].min <= prof["l_quantity"].max <= 50
    assert prof["l_returnflag"].stat_kind == "string_len"
    assert prof["l_returnflag"].n_distinct == 3
    assert prof["l_shipdate"].stat_kind == "other"
    assert prof["l_quantity"].n_rows == li.count()


def test_profile_approx_close_to_exact(engine):
    od = engine.get_table("orders")
    exact = {r.column: r.n_distinct for r in profile_table(od, approx_distinct=False).collect()}
    approx = {r.column: r.n_distinct for r in profile_table(od, approx_distinct=True).collect()}
    for c in exact:
        if exact[c]:
            assert abs(approx[c] - exact[c]) / exact[c] < 0.15


def test_scd2_merge_null_keys_survive(spark):
    """NULL business keys are legal (null-safe join): a null-keyed
    current row must not vanish, and a null-keyed batch row must apply."""
    from revtron_utils_spark.operators.scd import scd2_init, scd2_merge

    base = spark.createDataFrame(
        [(None, "n0"), (1, "a")], "k long, attr string"
    )
    scd = scd2_init(base, ["k"], "2024-01-01")
    batch = spark.createDataFrame([(None, "n1")], "k long, attr string")
    out = scd2_merge(scd, batch, ["k"], "2024-02-01")
    rows = [(r.k, r.attr, r.is_current) for r in out.collect()]
    # null key: old row closed, new row open; key 1 untouched
    assert (None, "n0", False) in rows
    assert (None, "n1", True) in rows
    assert (1, "a", True) in rows
    assert len(rows) == 3


def test_grouped_linreg_recovers_planted_line(spark):
    """y = 3x + 40 exactly ⇒ slope 3, intercept 40, r² = 1."""
    from revtron_utils_spark.operators.profile import grouped_linreg

    rows = [(1, x, 3 * x + 40) for x in range(1, 200)]
    df = spark.createDataFrame(rows, "g: int, x: long, y: long")
    r = grouped_linreg(df, "x", "y", by=["g"]).first()
    assert r["slope"] == 3.0 and r["intercept"] == 40.0 and r["r2"] == 1.0


def test_grouped_linreg_matches_numpy(spark, sf_dir):
    import numpy as np

    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.profile import grouped_linreg

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    got = {r[0]: r for r in grouped_linreg(li, "x", "y", by=["l_returnflag"]).collect()}
    pts = {}
    for r in li.collect():
        pts.setdefault(r[0], []).append((r[1], r[2]))
    for g, xy in pts.items():
        x = np.array([p[0] for p in xy], dtype=float)
        y = np.array([p[1] for p in xy], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[g]["slope"] - slope) / abs(slope) < 1e-6
        assert abs(got[g]["intercept"] - intercept) / max(abs(intercept), 1) < 1e-4
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[g]["r2"] - r * r) < 1e-6


def test_grouped_linreg_degenerate_group(spark):
    """Zero x-variance ⇒ NULL fit, no division error."""
    from revtron_utils_spark.operators.profile import grouped_linreg

    df = spark.createDataFrame([(1, 5, 10), (1, 5, 20)], "g: int, x: long, y: long")
    r = grouped_linreg(df, "x", "y", by=["g"]).first()
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_contingency_chi2_independent_and_skewed(spark):
    """A perfectly independent table scores ~0; a diagonal one scores
    ~N·min(r-1, c-1); zero cells contribute E."""
    from revtron_utils_spark.operators.profile import contingency_chi2

    indep = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(indep, "r: string, c: string")
    total = contingency_chi2(df, "r", "c").agg(F.sum("chi2_term")).first()[0]
    assert abs(total) < 1e-9

    diag = [("x", "u")] * 50 + [("y", "v")] * 50
    df2 = spark.createDataFrame(diag, "r: string, c: string")
    rows = contingency_chi2(df2, "r", "c").collect()
    assert len(rows) == 4  # zero cells present via margins
    total2 = sum(r["chi2_term"] for r in rows)
    assert abs(total2 - 100.0) < 1e-6  # phi² = 1 ⇒ chi² = N
    zero = [r for r in rows if r["observed"] == 0]
    assert len(zero) == 2 and all(r["chi2_term"] == r["expected"] for r in zero)


def test_rolling_zscore_flags_planted_spike(spark):
    """30 flat days then a 10× spike: only the spike day clears |z|>3;
    early cold-start days are NULL."""
    from datetime import datetime, timedelta

    from revtron_utils_spark.operators.profile import rolling_zscore

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(30):
        # mildly noisy baseline (a constant one has zero variance, and
        # the operator deliberately NULLs z rather than divide by it)
        v = 1000.0 + (d * 7) % 23 if d != 25 else 10000.0
        # two events per day so the daily grain does real aggregation
        for part in (v * 0.4, v * 0.6):
            rows.append((eid, t0 + timedelta(days=d, hours=eid % 12), "load", part))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, event_type: string, value: double"
    )
    out = sorted(
        rolling_zscore(df, "ts", "value", by=["event_type"], window=7).collect(),
        key=lambda r: r.day_us,
    )
    assert out[0].z is None  # first day: no history
    flagged = [i for i, r in enumerate(out) if r.z is not None and abs(r.z) > 3]
    assert flagged == [25]
    assert abs(out[25].daily_total - 10000.0) < 1e-6
    # the day AFTER the spike is judged against a spike-inflated
    # baseline but must not itself alert upward
    assert out[26].z is None or out[26].z < 3


def test_token_diversity_known_values(spark):
    """Hand-computable fixture: 'a a b' has N=3 V=2 rep2=2·1=2 →
    simpson = 1 − 2/(3·2) = 2/3; a one-token group pins the n=1 guard."""
    from revtron_utils_spark.operators.profile import token_diversity

    df = spark.createDataFrame(
        [("g1", "a a b"), ("g2", "x"), ("g3", "w w w w")],
        ["source", "text"],
    )
    out = {r["source"]: r for r in token_diversity(df, ["source"]).collect()}
    assert (out["g1"]["n_tokens"], out["g1"]["n_types"]) == (3, 2)
    assert abs(out["g1"]["simpson"] - 2 / 3) < 1e-6
    assert out["g2"]["simpson"] == 0.0 and out["g2"]["ttr"] == 1.0
    assert out["g3"]["simpson"] == 0.0  # all repeats: zero diversity
    assert abs(out["g3"]["ttr"] - 0.25) < 1e-6
