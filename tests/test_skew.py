"""Salting utilities must be result-identical to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from revtron_utils_spark.operators.skew import salted_agg, salted_join


def test_salted_join_matches_plain(engine):
    li = engine.get_table("lineitem").select("l_orderkey", "l_quantity")
    od = engine.get_table("orders").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_orderkey", "k"),
            od.withColumnRenamed("o_orderkey", "k"),
            on="k",
            salt=8,
        )
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_outer(engine, spark):
    cu = engine.get_table("customer").select(F.col("c_custkey").alias("k"), "c_name")
    od = engine.get_table("orders").select(F.col("o_custkey").alias("k"), "o_orderkey")
    plain_n = cu.join(od, "k", "left").count()
    salted_n = salted_join(cu, od, "k", how="left", salt=4).count()
    # left-outer with salting: unmatched rows appear once per... no —
    # they must appear exactly once, same as plain (each left row has ONE
    # salt; unmatched right replication doesn't duplicate it)
    assert salted_n == plain_n


def test_salted_agg_matches_plain(engine):
    ev = engine.get_table("events")
    plain = {
        (r.event_type): (r.n, r.total, r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.total, 2), r.lo, r.hi)
        for r in salted_agg(
            ev,
            ["event_type"],
            {"n": "count(*)", "total": "sum(value)", "lo": "min(value)", "hi": "max(value)"},
            salt=8,
        ).collect()
    }
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert abs(salted[k][1] - plain[k][1]) < 0.05  # double sum regroup tolerance
        assert salted[k][2] == plain[k][2] and salted[k][3] == plain[k][3]


def test_salted_join_rejects_right_outer(engine):
    import pytest

    cu = engine.get_table("customer").select(F.col("c_custkey").alias("k"))
    od = engine.get_table("orders").select(F.col("o_custkey").alias("k"))
    with pytest.raises(ValueError, match="duplicate"):
        salted_join(cu, od, "k", how="full")


def test_salted_agg_rejects_nondecomposable(engine):
    import pytest

    with pytest.raises(ValueError):
        salted_agg(engine.get_table("events"), ["event_type"], {"a": "avg(value)"})


def test_skew_stress_plan_splits_hot_group(spark, sf_dir):
    """The benched skew query must actually produce the two-stage salted
    plan: a first aggregate keyed on (group, __salt) — 32 reduce shards
    for the hot group — then a final aggregate on the group alone. The
    plain aggregate plan has one grouping exchange; salting adds one."""
    import __spark_entry__ as entry
    from revtron_utils_spark.plans.audit import PlanFacts

    df = entry.queries()["skew_stress"](spark, sf_dir)
    facts = PlanFacts.of(df)
    # partial stage keyed by the salt column is in the physical plan
    assert "__salt" in facts.text, facts.text[:2000]

    # plain form of the same aggregate, for plan comparison
    from revtron_utils_spark.io import read_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "hot_key",
        F.when(
            F.col("event_type").isin("view", "click", "signup"), F.lit("hot")
        ).otherwise(F.col("event_type")),
    )
    plain = ev.groupBy("hot_key").agg(F.count(F.lit(1)).alias("n"))
    plain_x = PlanFacts.of(plain).exchanges
    # exactly one extra shuffle stage: hashpartitioning(hot_key, __salt)
    # before the final hashpartitioning(hot_key). (formatted plans list
    # each operator twice, so counts compare 2:1 between the forms)
    assert facts.exchanges == 2 * plain_x, facts.text[:2000]

    # result identity with the direct aggregate (the oracle's contract)
    direct = {
        r.hot_key: (r.n, r.cents, r.mx)
        for r in ev.withColumn(
            "cents", F.round(F.col("value") * 100).cast("long")
        )
        .groupBy("hot_key")
        .agg(
            F.count("event_id").alias("n"),
            F.sum("cents").alias("cents"),
            F.max("cents").alias("mx"),
        )
        .collect()
    }
    got = {r.hot_key: (r.n, r.cents, r.mx) for r in df.collect()}
    assert got == direct


def test_join_skew_report_known_distribution(spark):
    """Hand-checkable fixture: key 'hot' holds 6 of 10 rows across 3
    distinct keys → share 0.6, x_mean = 6·3/10 = 1.8, rank 1."""
    from revtron_utils_spark.operators.skew import join_skew_report

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    out = {r["k"]: r for r in join_skew_report(df, ["k"], top_k=2).collect()}
    assert set(out) == {"hot", "warm"}  # top-2 only
    assert out["hot"]["cnt"] == 6 and out["hot"]["rank"] == 1
    assert abs(out["hot"]["share"] - 0.6) < 1e-9
    assert abs(out["hot"]["x_mean"] - 1.8) < 1e-9
    assert out["warm"]["rank"] == 2


def test_x_mean_multiplies_in_double_not_int64(spark):
    """cnt·n_keys must be a double product (int64 would overflow 2^63 at
    100-TB key cardinalities and fail under ANSI mode) — assert on the
    analyzed plan, since no local fixture can reach the overflow."""
    from revtron_utils_spark.operators.skew import (
        join_skew_report,
        join_skew_report_oracle_sql,
    )

    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    plan = join_skew_report(df, ["k"])._jdf.queryExecution().analyzed().toString()
    assert "(cnt * _n_keys)" not in plan.replace("#", "").lower().replace(
        "cnt0", "cnt"
    )
    assert "cast(cnt" in plan.lower() and "as double" in plan.lower()
    sql = join_skew_report_oracle_sql("t", ["k"])
    assert "CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)" in sql
    assert "cnt * n_keys" not in sql
