"""Distributed exact quantiles (quantile_cont semantics) by histogram
refinement.

Spark's built-in exact ``percentile`` aggregate buffers every value of a
group on one reducer — a hot group OOMs at 100 TB. A window
``row_number`` over ``partitionBy(group)`` has the same flaw (the whole
group sorts on one task). This operator keeps every stage combinable
and skew-free:

1. **stats pass** — per-group ``count/min/max`` (map-side combinable);
2. **histogram pass** — bucket values into K equi-width bins per group,
   ``groupBy(group, bin).count()`` (combinable; shuffle = O(groups × K));
   cumulative bin counts locate, for each probability p, the bin holding
   rank ``h = (n−1)·p`` and its neighbor ``⌈h⌉``;
3. **extract pass** — only rows in needed bins survive (a broadcast
   semi-filter); ``row_number`` within (group, bin) — partitions of
   ~n/K rows, not n — picks the exact ranked values, which interpolate
   to ``v_lo + (h−⌊h⌋)·(v_hi−v_lo)``.

Matches ANSI ``quantile_cont`` / Spark ``percentile`` exactly. Driver
state is O(groups × K) bin counts — ``by`` must be low-cardinality
(profiling dimensions), which is also the regime where the built-in
aggregate is most dangerous. Caveat: a bin stuffed with duplicates of a
single value still extracts quickly (ties share ranks); adversarial
many-distinct-values-in-one-bin data would need a second refinement
round, not implemented.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    by: Sequence[str] = (),
    out_prefix: str = "p",
    num_bins: int = 4096,
) -> DataFrame:
    """Interpolated quantiles of ``value_col`` per ``by`` group.

    Returns one row per group with a column per probability, named
    ``{out_prefix}{100·p:g}`` (``p25``, ``p99_9`` for 0.999). NULLs are
    excluded, matching quantile_cont.
    """
    by = list(by)
    probs = [float(p) for p in probs]
    names = [f"{out_prefix}{100 * p:g}".replace(".", "_") for p in probs]
    spark = df.sparkSession

    vals = df.filter(F.col(value_col).isNotNull()).select(
        *by, F.col(value_col).cast("double").alias("_v")
    )

    # pass 1+2 fused: histogram needs min/max first, so two aggregates —
    # both fully map-side combinable, no wide rows anywhere
    stats = (
        vals.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("_v").alias("_lo"),
            F.max("_v").alias("_hi"),
        )
    )
    stats_rows = stats.collect()
    if not stats_rows:
        fields = ", ".join(f"{n} double" for n in names)
        schema = (
            ", ".join(f"{c} {_ddl_type(df, c)}" for c in by) + ", " if by else ""
        ) + fields
        return spark.createDataFrame([], schema)

    skey = lambda r: tuple(r[c] for c in by)  # noqa: E731
    ginfo = {
        skey(r): (r["_n"], r["_lo"], r["_hi"], max((r["_hi"] - r["_lo"]) / num_bins, 0.0))
        for r in stats_rows
    }

    # rebuild the broadcast side from the ALREADY-COLLECTED rows —
    # broadcasting the uncached `stats` plan would re-run the full
    # group-stats scan over the input a second (and third) time
    stats_b = F.broadcast(spark.createDataFrame(stats_rows, stats.schema))
    binned = vals.join(stats_b, on=by) if by else vals.crossJoin(stats_b)
    bin_expr = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(
            F.lit(num_bins - 1),
            F.floor((F.col("_v") - F.col("_lo")) / ((F.col("_hi") - F.col("_lo")) / num_bins)),
        ),
    ).otherwise(F.lit(0))
    hist = (
        binned.withColumn("_bin", bin_expr.cast("long"))
        .groupBy(*by, "_bin")
        .count()
        .collect()
    )

    # driver: cumulative counts per group → rank → owning bin + in-bin offset
    by_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in hist:
        by_group.setdefault(skey(r), []).append((r["_bin"], r["count"]))

    # needed[(gkey, bin)] -> list of (prob_idx, side, in_bin_rank)
    needed: dict[tuple, list[tuple[int, str, int]]] = {}
    fracs: dict[tuple, float] = {}
    for gkey, bins in by_group.items():
        bins.sort()
        n = ginfo[gkey][0]
        cum = []
        below = 0
        for b, c in bins:
            cum.append((b, below, c))
            below += c
        for pi, p in enumerate(probs):
            h = (n - 1) * p
            fracs[(gkey, pi)] = h - math.floor(h)
            for side, rank in (("lo", math.floor(h)), ("hi", math.ceil(h))):
                for b, start, c in cum:
                    if start <= rank < start + c:
                        needed.setdefault((gkey, b), []).append(
                            (pi, side, rank - start)
                        )
                        break

    # pass 3: extract the ranked values from only the needed bins
    spec_rows = [
        (*gkey, b, pi, side, in_rank)
        for (gkey, b), wants in needed.items()
        for (pi, side, in_rank) in wants
    ]
    spec_schema = (
        ", ".join(f"{c} {_ddl_type(df, c)}" for c in by)
        + (", " if by else "")
        + "_bin long, _pi int, _side string, _inrank long"
    )
    spec = spark.createDataFrame(spec_rows, spec_schema)

    w = Window.partitionBy(*by, "_bin").orderBy(F.col("_v").asc())
    bin_vals = (
        binned.withColumn("_bin", bin_expr.cast("long"))
        .join(
            F.broadcast(spec.select(*by, "_bin").distinct()), on=[*by, "_bin"]
        )
        .select(*by, "_bin", "_v")
        .withColumn("_inrank", F.row_number().over(w) - 1)
    )
    picked = bin_vals.join(F.broadcast(spec), on=[*by, "_bin", "_inrank"]).collect()

    vals_at: dict[tuple, float] = {}
    for r in picked:
        vals_at[(skey(r), r["_pi"], r["_side"])] = r["_v"]

    out_rows = []
    for gkey in by_group:
        rec = list(gkey)
        for pi in range(len(probs)):
            v_lo = vals_at[(gkey, pi, "lo")]
            v_hi = vals_at[(gkey, pi, "hi")]
            fr = fracs[(gkey, pi)]
            rec.append(v_lo + fr * (v_hi - v_lo))
        out_rows.append(tuple(rec))
    out_schema = (
        ", ".join(f"{c} {_ddl_type(df, c)}" for c in by)
        + (", " if by else "")
        + ", ".join(f"{n} double" for n in names)
    )
    return spark.createDataFrame(out_rows, out_schema)


def _ddl_type(df: DataFrame, col: str) -> str:
    return dict(zip(df.schema.names, df.schema.fields))[col].dataType.simpleString()
