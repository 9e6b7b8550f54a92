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
