"""As-of and interval join semantics: tie inclusivity, no-match NULLs,
forward direction, interval boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from revtron_utils_spark.operators.asof import asof_join, interval_join


def _events(spark):
    rows = [
        (1, "k1", "2024-01-01 10:00:00"),
        (2, "k1", "2024-01-01 11:30:00"),
        (3, "k1", "2024-01-01 09:00:00"),  # before any rate
        (4, "k2", "2024-01-01 10:00:00"),  # key with no rates
    ]
    return spark.createDataFrame(rows, ["id", "k", "ts_s"]).select(
        "id", "k", F.to_timestamp("ts_s").alias("ts")
    )


def _rates(spark):
    rows = [
        ("k1", "2024-01-01 10:00:00", 1.0),  # exactly at event 1 → tie is inclusive
        ("k1", "2024-01-01 11:00:00", 2.0),
    ]
    return spark.createDataFrame(rows, ["k", "rts_s", "rate"]).select(
        "k", F.to_timestamp("rts_s").alias("rts"), "rate"
    )


def test_asof_backward(spark):
    out = {
        r.id: r.rate_r
        for r in asof_join(
            _events(spark), _rates(spark), on="k", left_ts="ts", right_ts="rts"
        ).collect()
    }
    assert out[1] == 1.0  # tie at 10:00 matches (inclusive)
    assert out[2] == 2.0  # latest at-or-before 11:30
    assert out[3] is None  # nothing before 09:00
    assert out[4] is None  # key has no right rows


def test_asof_forward(spark):
    out = {
        r.id: r.rate_r
        for r in asof_join(
            _events(spark),
            _rates(spark),
            on="k",
            left_ts="ts",
            right_ts="rts",
            direction="forward",
        ).collect()
    }
    assert out[1] == 1.0  # inclusive tie
    assert out[2] is None  # nothing at-or-after 11:30
    assert out[3] == 1.0  # earliest at-or-after 09:00


def test_asof_preserves_left_rowcount(engine, spark):
    ev = engine.get_table("events")
    rates = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("rts")).agg(
        F.avg("value").alias("rate")
    )
    joined = asof_join(ev, rates, on="event_type", left_ts="ts", right_ts="rts")
    assert joined.count() == ev.count()
    assert "rate_r" in joined.columns


def test_asof_null_payload_not_resurrected(spark):
    """A matched right row whose payload is NULL must yield NULL, not a
    stale older value (DuckDB ASOF semantics)."""
    ev = spark.createDataFrame([(1, "k1", "2024-01-01 10:30:00")], ["id", "k", "ts_s"]).select(
        "id", "k", F.to_timestamp("ts_s").alias("ts")
    )
    rates = spark.createDataFrame(
        [("k1", "2024-01-01 09:00:00", 5.0), ("k1", "2024-01-01 10:00:00", None)],
        ["k", "rts_s", "rate"],
    ).select("k", F.to_timestamp("rts_s").alias("rts"), F.col("rate").cast("double"))
    out = asof_join(ev, rates, on="k", left_ts="ts", right_ts="rts").collect()
    assert out[0].rate_r is None  # the 10:00 row matched; its NULL stands


def test_interval_join_left_outer_null_extends(spark):
    vals = spark.createDataFrame([(1, 10.0), (2, 999.0)], ["id", "v"])
    bands = spark.createDataFrame([(0, 0.0, 50.0)], ["band", "lo", "hi"])
    out = {r.id: r.band for r in interval_join(vals, bands, "v", "lo", "hi", 50.0, how="left").collect()}
    assert out == {1: 0, 2: None}  # unmatched left row survives with NULL


def test_interval_join_boundaries(spark):
    vals = spark.createDataFrame(
        [(1, 0.0), (2, 49.999), (3, 50.0), (4, 149.999), (5, 200.0)], ["id", "v"]
    )
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 150.0)], ["band", "lo", "hi"]
    )
    out = {r.id: r.band for r in interval_join(vals, bands, "v", "lo", "hi", 50.0).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1}  # hi exclusive; 200 unmatched (inner)


def test_interval_join_wide_interval_spans_buckets(spark):
    vals = spark.createDataFrame([(1, 10.0), (2, 170.0)], ["id", "v"])
    bands = spark.createDataFrame([(9, 0.0, 200.0)], ["band", "lo", "hi"])
    out = interval_join(vals, bands, "v", "lo", "hi", bucket_width=50.0).collect()
    assert {r.id for r in out} == {1, 2}
    # each value matched exactly once despite the interval spanning 4 buckets
    assert len(out) == 2


def test_interval_join_rejects_right_outer(spark):
    import pytest
    from revtron_utils_spark.operators.asof import interval_join

    l = spark.createDataFrame([(1, 10.0)], ["id", "v"])
    r = spark.createDataFrame([(1, 0.0, 50.0)], ["band", "lo", "hi"])
    with pytest.raises(ValueError, match="inner/left"):
        interval_join(l, r, "v", how="full")


def test_interval_join_empty_and_inverted_intervals(spark):
    from revtron_utils_spark.operators.asof import interval_join

    l = spark.createDataFrame([(1, 10.0), (2, 100.0)], ["id", "v"])
    r = spark.createDataFrame(
        [
            (10, 0.0, 50.0),      # normal: catches v=10
            (11, 100.0, 100.0),   # empty interval: matches nothing
            (12, 200.0, 0.0),     # inverted: matches nothing, no bucket blowup
        ],
        ["band", "lo", "hi"],
    )
    got = {(r_.id, r_.band) for r_ in interval_join(l, r, "v").collect()}
    assert got == {(1, 10)}


def test_interval_join_boundary_exclusive(spark):
    from revtron_utils_spark.operators.asof import interval_join

    l = spark.createDataFrame([(1, 50.0)], ["id", "v"])
    r = spark.createDataFrame([(10, 0.0, 50.0), (11, 50.0, 100.0)], ["band", "lo", "hi"])
    got = {(x.id, x.band) for x in interval_join(l, r, "v").collect()}
    assert got == {(1, 11)}  # hi exclusive, lo inclusive
