"""Physical data layout: bucketing and partitioning for 100 TB scale.

The reference delegates physical layout entirely to Postgres (indexes,
`revtron/database/main.py:150-170` builds CREATE INDEX); on Spark the
equivalent levers are *bucketing* (pre-shuffled, co-located storage so
repeated joins/aggregations on the bucket key run with **zero
Exchange**) and *partitioned directories* (coarse pruning so a filter
on the partition column skips whole files before any task launches).

At 100 TB these are the difference between a join that shuffles two
multi-TB tables every run and one that streams co-located buckets:
bucket once at ingest, amortize the shuffle across every downstream
query. `tests/test_layout.py` asserts the plan shapes (no Exchange on
bucket-aligned joins, PartitionFilters on pruned scans), not just the
results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Joins/aggregations between tables bucketed on the same keys with the
    same bucket count require no shuffle; ``sortBy`` additionally lets
    sort-merge join skip its per-task sort. ``path`` makes the table
    external (data outlives ``DROP TABLE``).
    """
    writer = df.write.format(file_format).mode(mode).bucketBy(buckets, *keys)
    writer = writer.sortBy(*(sort_cols or keys))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (one directory per value).

    Filters on ``partition_cols`` become PartitionFilters — pruned at
    planning time, before any task reads a byte. Choose low-cardinality
    columns (date, type, tenant); high-cardinality partitioning creates
    a small-files problem instead.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys.

    When both sides are bucketed on ``on`` with equal bucket counts the
    physical plan is a sort-merge join with **no Exchange on either
    side** — verified by ``PlanFacts`` in tests.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
