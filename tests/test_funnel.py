"""Funnel and cohort-retention operators: hand-built sequences and
ordering invariants."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from revtron_utils_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_times,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_funnel_strict_ordering(spark):
    t = lambda d, h=0: datetime(2024, 1, d, h)
    rows = [
        # user 1: full ordered funnel
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: purchase BEFORE click -> chain breaks at purchase
        (2, "view", t(1)), (2, "purchase", t(2)), (2, "click", t(3)),
        # user 3: click without view -> never enters the funnel
        (3, "click", t(1)), (3, "purchase", t(2)),
        # user 4: view only
        (4, "view", t(5)),
    ]
    got = {
        r["step"]: r["users"]
        for r in funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    assert got == {0: 3, 1: 2, 2: 1}


def test_funnel_times_earliest_chain(spark):
    t = lambda d: datetime(2024, 1, d)
    rows = [
        (1, "view", t(1)), (1, "view", t(4)),
        (1, "click", t(2)), (1, "click", t(6)),
        (1, "purchase", t(5)),
    ]
    r = funnel_times(_ev(spark, rows), ["view", "click", "purchase"]).first()
    # earliest view (d1) -> earliest click after it (d2) -> earliest
    # purchase after THAT (d5); the d4 view must not reset the chain
    assert r["t_0"] == t(1) and r["t_1"] == t(2) and r["t_2"] == t(5)


def test_funnel_counts_non_increasing_on_fixture(spark, sf_dir):
    from revtron_utils_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    rows = sorted(
        funnel_counts(ev, ["view", "click", "purchase"]).collect(),
        key=lambda r: r["step"],
    )
    users = [r["users"] for r in rows]
    assert users == sorted(users, reverse=True)
    assert users[0] > 0


def test_cohort_retention_triangle(spark):
    t = lambda d: datetime(2024, 1, d)
    rows = [
        (1, "view", t(1)), (1, "view", t(8)),   # cohort d1, offsets 0 and 1
        (2, "view", t(1)),                       # cohort d1, offset 0 only
        (3, "view", t(9)), (3, "view", t(9)),    # cohort d9, offset 0 (dedup)
    ]
    got = {
        (str(r["cohort_day"]), r["offset"]): r["users"]
        for r in cohort_retention(_ev(spark, rows), period_days=7).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-09", 0): 1,
    }


def test_rolling_active_users_hand_computed(spark):
    from revtron_utils_spark.operators.funnel import rolling_active_users

    t = lambda d: datetime(2024, 1, d)
    rows = [
        (1, "view", t(1)),
        (1, "view", t(1)),   # same-day dup must not double count
        (2, "view", t(3)),
        (1, "view", t(10)),
    ]
    got = {
        str(r["day"]): r["active_users"]
        for r in rolling_active_users(_ev(spark, rows), window_days=3).collect()
    }
    # user1 d1 covers days 1-3; user2 d3 covers 3-5; user1 d10 covers 10
    # (11-12 trimmed past the max observed day)
    assert got == {
        "2024-01-01": 1, "2024-01-02": 1, "2024-01-03": 2,
        "2024-01-04": 1, "2024-01-05": 1, "2024-01-10": 1,
    }


def test_rolling_dau_equals_daily_distinct(spark, sf_dir):
    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.funnel import rolling_active_users

    ev = read_table(spark, sf_dir, "events")
    dau = {
        str(r["day"]): r["active_users"]
        for r in rolling_active_users(ev, window_days=1).collect()
    }
    direct = {
        str(r["day"]): r["n"]
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dau == direct


def test_funnel_within_deadline(spark):
    t = lambda d: datetime(2024, 1, d)
    rows = [
        # user 1 completes in 2 days (inside a 3-day deadline)
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2's purchase lands 9 days after the first view
        (2, "view", t(1)), (2, "click", t(2)), (2, "purchase", t(10)),
    ]
    ev = _ev(spark, rows)
    loose = {r["step"]: r["users"] for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    tight = {
        r["step"]: r["users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"], within_days=3).collect()
    }
    assert loose == {0: 2, 1: 2, 2: 2}
    assert tight == {0: 2, 1: 2, 2: 1}  # user 2's purchase missed the deadline


# ------------------------------------------------ hypothesis differential


def _py_funnel_times(rows, steps, within_days=None):
    """Pure-python strict min-chain reference: t_0 = earliest step-0
    event; t_i = earliest step-i event with ts > t_{i-1} (and within
    the optional whole-funnel deadline from t_0)."""
    from collections import defaultdict
    from datetime import timedelta

    by_user = defaultdict(list)
    for u, ty, ts in rows:
        by_user[u].append((ts, ty))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        chain = []
        for i, step in enumerate(steps):
            prev = chain[i - 1] if i else None
            if i and prev is None:
                chain.append(None)
                continue
            best = None
            for ts, ty in evs:
                if ty != step:
                    continue
                if i and ts <= prev:
                    continue
                if i and within_days is not None and ts > chain[0] + timedelta(days=within_days):
                    continue
                best = ts
                break  # evs sorted: first hit is the earliest
            chain.append(best)
        if chain[0] is not None:
            out[u] = tuple(chain)
    return out


def test_funnel_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    types = ["a", "b", "c"]
    event = st.tuples(
        st.integers(min_value=1, max_value=4),           # few users
        st.sampled_from(types),
        st.integers(min_value=1, max_value=12),          # coarse ts -> many ties
    ).map(lambda t: (t[0], t[1], datetime(2024, 1, t[2], t[0] % 3)))
    corpus = st.lists(event, min_size=1, max_size=25)

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(rows=corpus, within=st.sampled_from([None, 2, 5]))
    def run(rows, within):
        df = _ev(spark, rows)
        got = {
            r["user_id"]: (r["t_0"], r["t_1"], r["t_2"])
            for r in funnel_times(df, types, within_days=within).collect()
        }
        assert got == _py_funnel_times(rows, types, within)

    run()


def test_multi_touch_attribution_weights(spark):
    """Planted journey: weights follow the U-shape and decay
    definitions exactly, and per-conversion shares sum to 1."""
    from datetime import datetime, timedelta

    from revtron_utils_spark.operators.funnel import multi_touch_attribution

    t0 = datetime(2024, 1, 31, 12, 0, 0)
    conv = spark.createDataFrame(
        [(100, 1, t0)], "event_id: long, user_id: long, ts: timestamp"
    )
    # four touches: 10, 5, 2, 0 days before conversion
    touches = spark.createDataFrame(
        [
            (1, t0 - timedelta(days=10), "view"),
            (1, t0 - timedelta(days=5), "click"),
            (1, t0 - timedelta(days=2), "view"),
            (1, t0, "click"),
        ],
        "user_id: long, touch_ts: timestamp, touch_type: string",
    )
    out = {r.touch_type: r for r in multi_touch_attribution(conv, touches).collect()}
    # position: first(view)=0.4, last(click)=0.4, two middles 0.1 each
    assert abs(out["view"].credit_position - 0.5) < 1e-6
    assert abs(out["click"].credit_position - 0.5) < 1e-6
    # decay: weights ∝ 2^-10, 2^-5, 2^-2, 2^0 → click gets (2^-5+1)/S
    s = 2**-10 + 2**-5 + 2**-2 + 1.0
    assert abs(out["click"].credit_decay - (2**-5 + 1.0) / s) < 1e-5
    assert abs(out["view"].credit_decay - (2**-10 + 2**-2) / s) < 1e-5
    assert (
        abs(out["view"].credit_position + out["click"].credit_position - 1.0) < 1e-6
    )


def test_multi_touch_attribution_window_excludes(spark):
    """Touches outside the lookback window earn nothing; a conversion
    with no in-window touch produces no rows."""
    from datetime import datetime, timedelta

    from revtron_utils_spark.operators.funnel import multi_touch_attribution

    t0 = datetime(2024, 6, 1)
    conv = spark.createDataFrame(
        [(1, 1, t0), (2, 2, t0)], "event_id: long, user_id: long, ts: timestamp"
    )
    touches = spark.createDataFrame(
        [
            (1, t0 - timedelta(days=40), "view"),  # outside 30d window
            (1, t0 - timedelta(days=1), "click"),  # inside
        ],
        "user_id: long, touch_ts: timestamp, touch_type: string",
    )
    out = multi_touch_attribution(conv, touches).collect()
    assert len(out) == 1
    r = out[0]
    assert r.touch_type == "click" and r.credit_position == 1.0 and r.credit_decay == 1.0


def test_event_transitions_rows_normalize(spark, sf_dir):
    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.funnel import event_transitions

    ev = read_table(spark, sf_dir, "events")
    rows = event_transitions(ev).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for f, rs in by_from.items():
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-4, f
        for r in rs:
            assert 0 < r.prob <= 1 and r.n > 0


def test_welch_ab_test_detects_planted_shift(spark):
    """Variant b shifted by +100 units: t strongly negative (a < b),
    and the statistic matches scipy-free closed form."""
    import math

    from revtron_utils_spark.operators.funnel import welch_ab_test

    a = [(1, "a", 1000 + (i % 7)) for i in range(200)]
    b = [(1, "b", 1100 + (i % 5)) for i in range(150)]
    df = spark.createDataFrame(a + b, "g: int, v: string, x: long")
    r = welch_ab_test(df, "x", "v", by=["g"]).first()
    assert r["variant_a"] == "a" and r["n_a"] == 200 and r["n_b"] == 150
    xs = [t[2] for t in a]
    ys = [t[2] for t in b]
    ma, mb = sum(xs) / len(xs), sum(ys) / len(ys)
    va = sum((x - ma) ** 2 for x in xs) / (len(xs) - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (len(ys) - 1)
    t = (ma - mb) / math.sqrt(va / len(xs) + vb / len(ys))
    assert abs(r["t_stat"] - t) < 1e-4
    assert r["t_stat"] < -50  # the shift is unmistakable


def test_welch_single_observation_variant_yields_null_t(spark):
    """ADVICE r5: n=1 has no unbiased variance — the 0/0 must surface
    as NULL, not NaN, and the pairwise row survives with t_stat NULL."""
    import math

    from revtron_utils_spark.operators.funnel import welch_ab_test

    df = spark.createDataFrame(
        [("A", 10), ("A", 12), ("A", 14), ("B", 11)], ["variant", "m"]
    )
    rows = welch_ab_test(df, "m", "variant").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_b"] == 1
    assert r["t_stat"] is None or not math.isnan(r["t_stat"])
    assert r["t_stat"] is None


def test_welch_three_variants_pairwise(spark):
    """Three variants emit the documented C(3,2) pairwise rows."""
    from revtron_utils_spark.operators.funnel import welch_ab_test

    rows = [(v, 10 + i % 5) for v in ("A", "B", "C") for i in range(20)]
    df = spark.createDataFrame(rows, ["variant", "m"])
    out = welch_ab_test(df, "m", "variant").collect()
    assert {(r["variant_a"], r["variant_b"]) for r in out} == {
        ("A", "B"), ("A", "C"), ("B", "C")
    }


def test_multi_touch_tiebreak_deterministic(spark):
    """ADVICE r5: touches tied on timestamp order by channel (plus the
    optional explicit tiebreak), so per-channel credit is deterministic.
    Two simultaneous touches on different channels: with k=2 both get
    0.5 regardless of order; with k=3 and a tied first pair, the
    channel order decides who is 'first' (0.4) — assert the exact
    split that (ts, channel) ordering implies."""
    import datetime as dt

    from revtron_utils_spark.operators.funnel import multi_touch_attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    conv = spark.createDataFrame(
        [("c1", "u1", dt.datetime(2024, 1, 11))], ["event_id", "user_id", "ts"]
    )
    touches = spark.createDataFrame(
        [
            ("u1", t0, "click"),   # tied pair: click sorts before view
            ("u1", t0, "view"),
            ("u1", dt.datetime(2024, 1, 10, 18, 0, 0), "email"),  # last
        ],
        ["user_id", "touch_ts", "touch_type"],
    )
    out = {
        r["touch_type"]: float(r["credit_position"])
        for r in multi_touch_attribution(conv, touches).collect()
    }
    # order: click (first, 0.4), view (middle, 0.2), email (last, 0.4)
    assert out == {"click": 0.4, "view": 0.2, "email": 0.4}


def test_welch_n1_variant_matches_duckdb_oracle(spark):
    """Single-observation variant: Spark guards var to NULL; the oracle
    SQL now carries the same CASE WHEN n > 1 guard, so both sides agree
    on NULL t_stat in the n=1 regime (DuckDB would otherwise produce a
    NaN from the IEEE 0/0)."""
    import duckdb

    import __spark_entry__ as entry
    from revtron_utils_spark.operators.funnel import welch_ab_test

    rows = [
        ("A", 0.10, 100.0),            # hi band, n=1
        ("A", 0.01, 50.0), ("A", 0.02, 60.0), ("A", 0.03, 70.0),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {d}, {p})" for g, d, p in rows)
        + ") t(l_returnflag, l_discount, l_extendedprice)"
    )
    oracle = con.execute(entry.SQL_AB_TEST).fetchall()
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_discount double, l_extendedprice double"
    ).select(
        "l_returnflag",
        F.when(F.col("l_discount") > 0.05, F.lit("hi")).otherwise(F.lit("lo")).alias(
            "disc_band"
        ),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    got = welch_ab_test(df, "cents", "disc_band", by=["l_returnflag"]).collect()
    assert len(oracle) == 1 and len(got) == 1
    assert oracle[0][-1] is None and got[0]["t_stat"] is None
    assert got[0]["n_a"] == 1 and got[0]["n_b"] == 3


def test_prop_ztest_hand_computed_and_guards(spark):
    import math

    from revtron_utils_spark.operators.funnel import prop_ztest

    # a: 30/100 convert; b: 20/100 convert
    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [("b", 0)] * 80
    df = spark.createDataFrame(rows, ["v", "ok"])
    r = prop_ztest(df, "v", "ok").collect()[0]
    assert (r["n_a"], r["s_a"], r["n_b"], r["s_b"]) == (100, 30, 100, 20)
    p = 50 / 200
    z = (0.3 - 0.2) / math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert abs(r["z"] - round(z, 6)) < 1e-9
    assert r["rate_a"] == 0.3 and r["rate_b"] == 0.2
    # degenerate pools → z NULL
    allfail = spark.createDataFrame(
        [("a", 0)] * 5 + [("b", 0)] * 5, ["v", "ok"]
    )
    assert prop_ztest(allfail, "v", "ok").collect()[0]["z"] is None
    allpass = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 1)] * 5, ["v", "ok"]
    )
    assert prop_ztest(allpass, "v", "ok").collect()[0]["z"] is None


def test_prop_ztest_pairwise_over_many_variants(spark):
    from revtron_utils_spark.operators.funnel import prop_ztest

    rows = [(v, i % 2) for v in "abc" for i in range(10)]
    df = spark.createDataFrame(rows, ["v", "ok"])
    got = prop_ztest(df, "v", "ok").collect()
    assert [(r["variant_a"], r["variant_b"]) for r in got] == [
        ("a", "b"), ("a", "c"), ("b", "c")
    ]
    assert all(r["z"] == 0.0 for r in got)  # identical rates


def test_cohort_ltv_hand_computed(spark):
    import datetime

    from revtron_utils_spark.operators.funnel import cohort_ltv

    d = datetime.date
    rows = [
        # cohort 2020-01: two members; month 0 revenue 100+200, month 2: 50
        (1, d(2020, 1, 5), 100),
        (2, d(2020, 1, 20), 200),
        (1, d(2020, 3, 1), 50),
        # cohort 2020-02: one member, single purchase
        (3, d(2020, 2, 10), 999),
    ]
    df = spark.createDataFrame(rows, ["cust", "dt", "cents"])
    got = {
        (str(r["cohort"]), r["age"]): r
        for r in cohort_ltv(df, "cust", "dt", "cents").collect()
    }
    jan0 = got[("2020-01-01", 0)]
    assert (jan0["n_members"], jan0["revenue"], jan0["cum_revenue"]) == (2, 300, 300)
    assert jan0["ltv"] == 150.0
    jan2 = got[("2020-01-01", 2)]
    assert (jan2["revenue"], jan2["cum_revenue"], jan2["ltv"]) == (50, 350, 175.0)
    feb0 = got[("2020-02-01", 0)]
    assert (feb0["n_members"], feb0["ltv"]) == (1, 999.0)


def test_cohort_ltv_is_nondecreasing_per_cohort(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.q_cohort_ltv(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r["cohort"], []).append((r["age"], r["ltv"]))
    assert by
    for series in by.values():
        series.sort()
        ltvs = [v for _, v in series]
        assert all(b >= a for a, b in zip(ltvs, ltvs[1:]))
