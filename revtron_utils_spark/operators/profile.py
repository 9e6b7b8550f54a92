"""Table profiling — per-column statistics in ONE aggregation pass
(null counts, distinct estimates, numeric min/max/mean, string lengths),
the data-quality sweep a pipeline runs before training ingestion.

Everything folds into a single ``agg`` so Spark computes the whole
profile in one scan + one reduce regardless of column count — never one
job per column. Distinct counts default to HLL++ (``approx_distinct``)
because exact per-column distincts are the scan-dominating cost at
100 TB; pass ``approx_distinct=False`` for oracle-exact profiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType, T.ShortType)


def profile_table(df: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """One row per column: name, type, n_nulls, null_rate, n_distinct
    (approximate by default), and for numeric columns min/max/mean, for
    strings min/max length. Single scan, single reduce."""
    n_col = F.count(F.lit(1))
    aggs = [n_col.alias("__n")]
    specs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        prefix = f.name
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{prefix}__nulls"))
        distinct = (
            F.approx_count_distinct(f.name)
            if approx_distinct
            else F.countDistinct(f.name)
        )
        aggs.append(distinct.alias(f"{prefix}__distinct"))
        if isinstance(f.dataType, _NUMERIC):
            aggs += [
                F.min(c).cast("double").alias(f"{prefix}__min"),
                F.max(c).cast("double").alias(f"{prefix}__max"),
                F.round(F.avg(c), 6).alias(f"{prefix}__mean"),
            ]
            kind = "numeric"
        elif isinstance(f.dataType, T.StringType):
            aggs += [
                F.min(F.length(c)).cast("double").alias(f"{prefix}__min"),
                F.max(F.length(c)).cast("double").alias(f"{prefix}__max"),
                F.lit(None).cast("double").alias(f"{prefix}__mean"),
            ]
            kind = "string_len"
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{prefix}__min"),
                F.lit(None).cast("double").alias(f"{prefix}__max"),
                F.lit(None).cast("double").alias(f"{prefix}__mean"),
            ]
            kind = "other"
        # normalize engine-specific spellings (Spark reads non-UTC
        # parquet timestamps as timestamp_ntz)
        dtype = f.dataType.simpleString().replace("timestamp_ntz", "timestamp")
        specs.append((f.name, dtype, kind))

    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n"]
    out = [
        {
            "column": name,
            "dtype": dtype,
            "stat_kind": kind,
            "n_rows": n,
            "n_nulls": row[f"{name}__nulls"],
            "null_rate": round(row[f"{name}__nulls"] / n, 6) if n else None,
            "n_distinct": row[f"{name}__distinct"],
            "min": row[f"{name}__min"],
            "max": row[f"{name}__max"],
            "mean": row[f"{name}__mean"],
        }
        for name, dtype, kind in specs
    ]
    spark = df.sparkSession
    schema = (
        "column string, dtype string, stat_kind string, n_rows bigint, n_nulls bigint, "
        "null_rate double, n_distinct bigint, min double, max double, mean double"
    )
    return spark.createDataFrame(out, schema)
