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


# --------------------------------------------------- codegen health
#
# Whole-stage codegen failure is SILENT at runtime (janino >64KB →
# warning in the log, interpreted per-row fallback, 10-100× slower,
# every correctness artifact stays green — round 5's ams_f2). These
# tests make compile health part of the plan surface: every codegen
# stage must janino-compile under the huge-method limit, checked
# statically with AQE off (with AQE on, stages only form at execution).

import contextlib


@contextlib.contextmanager
def _aqe_off(spark):
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_codegen_health_detects_exponential_expression_tree(spark, sf_dir):
    """Regression fixture for the round-5 ams_f2 defect: k pre-built
    sign expressions inline the poly character fold into every fmix32
    stage, the tree doubles per stage, and janino rejects the >64KB
    method. The checker must flag this shape (compile stats -1)."""
    from pyspark.sql import functions as F

    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.operators.rollup import (
        _ams_sign_from_poly,
        poly_hash_str,
    )
    from revtron_utils_spark.plans.audit import codegen_offenders

    with _aqe_off(spark):
        li = read_table(spark, sf_dir, "lineitem")
        rows = li.where(F.col("l_orderkey").isNotNull()).select(
            "l_returnflag",
            poly_hash_str(F.col("l_orderkey").cast("string")).alias("_p"),
        )
        signs = F.array(*[_ams_sign_from_poly(F.col("_p"), j) for j in range(16)])
        old_shape = (
            rows.select("l_returnflag", F.posexplode(signs).alias("j", "s"))
            .groupBy("l_returnflag", "j")
            .agg(F.sum("s").alias("c"))
        )
        bad = codegen_offenders(old_shape)
    assert bad, "checker failed to flag the known-uncompilable shape"
    assert any(s.max_method_code_size < 0 for s in bad)


def test_codegen_health_sketch_family_compiles(spark, sf_dir):
    """The hash-sketch queries build the deepest arithmetic expression
    trees in the registry — every one of their codegen stages must
    compile (non-empty stats, all healthy)."""
    import __spark_entry__ as m

    from revtron_utils_spark.plans.audit import codegen_compile_stats

    queries = m.queries()
    with _aqe_off(spark):
        for name in ("ams_f2", "cms_counts", "approx_distinct_poly", "kmv_distinct"):
            stats = codegen_compile_stats(queries[name](spark, sf_dir))
            assert stats, f"{name}: no codegen stages found (AQE leak?)"
            bad = [s for s in stats if not s.healthy]
            assert not bad, f"{name}: codegen would be disabled: {bad}"
