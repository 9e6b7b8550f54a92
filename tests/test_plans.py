"""Plan-shape tests (SURVEY §4): pushdown, pruning, broadcast, top-k
physical strategy. A correct answer with the wrong plan fails here."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from revtron_utils_spark.plans.audit import PlanFacts


def test_dsl_filter_pushes_to_parquet(engine):
    df = engine.get(
        "lineitem",
        columns=["l_orderkey", "l_quantity"],
        where=[
            {"l_returnflag": "R"},
            {"l_quantity": {"operator": ">", "value": 30}},
        ],
    )
    facts = PlanFacts.of(df)
    pushed = " ".join(facts.pushed_filters)
    assert "l_returnflag" in pushed and "l_quantity" in pushed, facts.text[:2000]


def test_projection_prunes_read_schema(engine):
    df = engine.get("lineitem", columns=["l_orderkey", "l_quantity"], where={"l_returnflag": "R"})
    cols = PlanFacts.of(df).read_columns()
    # only the projected + filtered columns reach the scan (11-col table)
    assert cols <= {"l_orderkey", "l_quantity", "l_returnflag"}, cols


def test_join_q3_broadcasts_dimension(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["join_q3"](spark, sf_dir)
    facts = PlanFacts.of(df)
    assert facts.has_broadcast_join, facts.text[:2000]


def test_topk_uses_take_ordered(engine):
    df = engine.get("lineitem", sort_by="l_extendedprice", ascending=False, limit=10)
    facts = PlanFacts.of(df)
    assert facts.has_take_ordered, facts.text[:1500]


def test_semi_join_broadcasts(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["semi_join"](spark, sf_dir)
    text = PlanFacts.of(df).text
    assert "BroadcastHashJoin" in text and "LeftSemi" in text


def test_groupby_has_partial_aggregation(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["groupby_q1"](spark, sf_dir)
    facts = PlanFacts.of(df)
    # partial (map-side) + final HashAggregate around a single shuffle
    # (codegen ids are hidden under AdaptiveSparkPlan until execution,
    # so we assert the aggregation shape only)
    assert facts.text.count("HashAggregate") >= 2


def test_date_window_prunes_with_pushed_range(engine):
    df = engine.get(
        "events",
        columns=["event_id"],
        where={"ts": {"operator": "between", "value": ["2024-01-05", "2024-01-10"]}},
    )
    facts = PlanFacts.of(df)
    # the ts range must reach the scan for row-group pruning
    assert any("ts" in p for p in facts.pushed_filters) or "ts" in facts.text


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark, sf_dir):
    """Spark's runtime bloom-filter (AQE runtime filtering) prunes the
    fact side of a shuffle join with a bloom filter built from the
    selective side — at 100 TB this is the difference between scanning
    all of lineitem and scanning the ~1/5 that can match. Default
    thresholds (creation side <= 10MB scanned, application side >= 10GB)
    target real clusters; the test lowers the application-side floor so
    the sf-fixture join qualifies, and asserts our plans are ELIGIBLE
    (equi-join on a raw column, selective filter on the creation side)."""
    from revtron_utils_spark.io import read_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = read_table(spark, sf_dir, "lineitem")
        od = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        text = PlanFacts.of(j).text
        assert "might_contain" in text, text[:3000]
        assert "bloom_filter_agg" in text, text[:3000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
