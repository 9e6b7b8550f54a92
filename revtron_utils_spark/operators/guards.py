"""Bounded-spine contract enforcement.

Several fold/window operators (`profile.ks_test`, `evaluation.
gain_curve`, `timeseries.ewma`/`holt_linear`, `survival.kaplan_meier`)
deliberately run an unpartitioned window or an O(T²) array fold over a
spine the CALLER promises is bounded (pre-bucketed times, score
histograms). The contract was previously documentation-only: a careless
caller passing a raw high-cardinality column (microsecond timestamps,
unbinned float scores) got a single-task sort or a multi-GB
collect_list row instead of an error. These helpers make the contract
fail fast: one cheap ``approx_count_distinct`` pre-aggregation (partial
map-side combine, one tiny action) estimates the worst per-group spine
cardinality and raises before the expensive stage is ever scheduled.

The estimate carries HLL++ error (~2-5% at the default rsd), so the cap
is a posture guard, not an exact limit — callers running a legitimately
huge bounded spine can raise ``max_buckets`` or pass ``None`` to vouch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BUCKETS = 100_000


def require_bounded_spine(
    df: DataFrame,
    spine_col: str,
    by: list[str],
    max_buckets: int | None,
    op_name: str,
) -> None:
    """Raise ``ValueError`` when the (approximate) number of distinct
    ``spine_col`` values in the worst ``by`` group exceeds
    ``max_buckets``. ``max_buckets=None`` skips the check entirely
    (zero extra work — the caller vouches for the bound)."""
    if max_buckets is None:
        return
    per = df.groupBy(*by).agg(
        F.approx_count_distinct(spine_col).alias("_nb")
    )
    row = per.agg(F.max("_nb").alias("_mx")).first()
    est = (row["_mx"] if row is not None else 0) or 0
    if est > max_buckets:
        scope = f"per {by} group" if by else "overall"
        raise ValueError(
            f"{op_name}: spine column {spine_col!r} has ~{est} distinct "
            f"values {scope}, over max_buckets={max_buckets}. This "
            "operator's contract is a CALLER-BOUNDED spine (it sorts or "
            "folds the whole spine in one task/row) — pre-bucket the "
            "column (e.g. floor timestamps to days, bin scores), or "
            "raise/disable max_buckets to vouch for the bound."
        )
