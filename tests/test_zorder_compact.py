"""Tests for Z-order clustered writes and small-file compaction
(layout.py additions)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from revtron_utils_spark.io import read_table
from revtron_utils_spark.layout import compact, file_column_ranges, zorder_write


def _spans(ranges, col, global_lo, global_hi):
    """Per-file range width as a fraction of the global width."""
    width = global_hi - global_lo or 1
    return [
        (r[col][1] - r[col][0]) / width for r in ranges if r[col] is not None
    ]


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    zorder_write(ev, zpath, ["user_id", "value"], num_files=8)
    # baseline: single-column sort — perfect on user_id, useless on value
    ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(spath)

    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()

    zr = file_column_ranges(spark, zpath, ["user_id", "value"])
    sr = file_column_ranges(spark, spath, ["user_id", "value"])

    z_user = _spans(zr, "user_id", lo_u, hi_u)
    z_val = _spans(zr, "value", lo_v, hi_v)
    s_val = _spans(sr, "value", lo_v, hi_v)

    # z-order: BOTH dimensions clustered (avg per-file span well under
    # the global span); single-sort leaves `value` unclustered (~full
    # span in every file)
    assert sum(z_user) / len(z_user) < 0.6
    assert sum(z_val) / len(z_val) < 0.6
    # and strictly better on the second dimension than single-column sort
    assert sum(z_val) / len(z_val) < 0.8 * (sum(s_val) / len(s_val))

    # contents identical to the source
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0


def test_compact_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "frag")
    ev.repartition(40).write.parquet(path)
    n_before = len(list(Path(path).glob("*.parquet")))
    assert n_before >= 40

    want = ev.count()
    files = compact(spark, path, target_rows_per_file=max(1, want // 3))
    n_after = len(list(Path(path).glob("*.parquet")))
    assert files <= 4
    assert n_after == files
    back = spark.read.parquet(path)
    assert back.count() == want
    assert back.exceptAll(ev).count() == 0


def test_compact_sorted_output(spark, tmp_path):
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    path = str(tmp_path / "srt")
    df.repartition(20).write.parquet(path)
    compact(spark, path, target_rows_per_file=10000, sort_cols=["id"])
    back = spark.read.parquet(path)
    assert back.count() == 10000
    # one file, sorted by id → parquet stats give a tight min/max
    ranges = file_column_ranges(spark, path, ["id"])
    assert len(ranges) == 1
    assert ranges[0]["id"] == (0, 9999)


def test_zorder_four_columns_no_overflow(spark, tmp_path):
    """4+ clustered columns must cap per-column bits so the Morton key
    stays inside int64 (no ANSI overflow, no wrapped ordering)."""
    from revtron_utils_spark.layout import zorder_arrange

    df = spark.range(0, 2000).select(
        F.col("id").alias("a"),
        (F.col("id") * 7 % 1000).alias("b"),
        (F.col("id") * 13 % 1000).alias("c"),
        (F.col("id") * 29 % 1000).alias("d"),
    )
    out = zorder_arrange(df, ["a", "b", "c", "d"], num_files=4)
    assert out.count() == 2000  # executes without ARITHMETIC_OVERFLOW


def test_zorder_timestamp_column(spark, sf_dir, tmp_path):
    from revtron_utils_spark.io import read_table
    from revtron_utils_spark.layout import zorder_arrange

    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    out = zorder_arrange(ev, ["ts", "value"], num_files=4)
    assert out.count() == ev.count()


def test_zorder_empty_frame_passthrough(spark):
    from revtron_utils_spark.layout import zorder_arrange

    df = spark.range(0).select(F.col("id").alias("a"), (F.col("id") * 2).alias("b"))
    assert zorder_arrange(df, ["a", "b"]).count() == 0
