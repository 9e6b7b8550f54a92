"""Plan-shape tests for the physical-layout module: bucketed joins must
not shuffle, partitioned reads must prune. Results are also checked
against the plain (layout-free) equivalents."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark import layout
from revtron_utils_spark.io import read_table
from revtron_utils_spark.plans.audit import PlanFacts


@contextlib.contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    layout.write_bucketed(
        orders, "orders_b", ["o_custkey"], 4, path=str(tmp_path / "orders_b")
    )
    layout.write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ["o_custkey"],
        4,
        path=str(tmp_path / "customer_b"),
    )
    try:
        # disable broadcast so the co-location (not a broadcast) is what
        # removes the shuffle
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            joined = layout.bucketed_join(spark, "orders_b", "customer_b", "o_custkey")
            facts = PlanFacts.of(joined)
            assert facts.has_sort_merge_join
            assert facts.exchanges == 0, facts.text
            plain = orders.join(
                customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
            )
            assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_groupby_has_no_exchange(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    layout.write_bucketed(
        orders, "orders_g", ["o_custkey"], 4, path=str(tmp_path / "orders_g")
    )
    try:
        agg = (
            spark.table("orders_g")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("total"))
        )
        facts = PlanFacts.of(agg)
        assert facts.exchanges == 0, facts.text
        expect = orders.select("o_custkey").distinct().count()
        assert agg.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_g")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    layout.write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    facts = PlanFacts.of(back)
    assert any("event_type" in f for f in facts.partition_filters), facts.text
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_partitioned_roundtrip_schema(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_rt")
    layout.write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path)
    assert set(back.columns) == set(ev.columns)
    assert back.count() == ev.count()
