#!/usr/bin/env python
"""Suite-position A/B for the round-12 weak-tail regressions (VERDICT
r12 task 3): sign_test / jonckheere / yuen_t / bland_altman sit at the
END of HEADLINE and slowed across r12's three same-methodology runs
while their code was untouched and loadavg was LOW — "host epoch" was
asserted but never shown. The alternative hypothesis is a
suite-position/JVM-state effect (heap churn, JIT deopt, code-cache
pressure after ~240 queries).

This probe runs ONLY the last ``--n`` HEADLINE queries, in FORWARD or
REVERSE order (same session warmups and cache-release discipline as
bench.py), bracketed by the TPC-H canary before and after. If a tail
query is fast when it runs EARLY (reverse order) and slow when late
(forward), position is the cause; if it is slow in both, the query (or
the host) is.

Usage: python tools/suite_position_probe.py [--n 40] [--order reverse]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CANARY = ["join_q3", "groupby_q1", "where_theta", "rollup"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--order", choices=["forward", "reverse"], default="reverse")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from revtron_utils_spark.session import get_spark

    spark = get_spark(app_name="suite-position-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s

    spark.range(256).repartition(64).select(_warm(col("id").cast("double"))).collect()
    from revtron_utils_spark.io import read_table

    read_table(spark, args.sf_dir, "region").write.mode("overwrite").format(
        "noop"
    ).save()
    _wc = spark.range(100_000).selectExpr("cast(id as string) s", "id").persist()
    _wc.count()
    _wc.unpersist()

    queries = entry_mod.queries()

    def _release() -> None:
        from revtron_utils_spark.operators.dedup import release_caches

        release_caches()
        spark.catalog.clearCache()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        _release()
        return dt

    tail = HEADLINE[-args.n :]
    if args.order == "reverse":
        tail = list(reversed(tail))

    out: dict[str, object] = {
        "order": args.order,
        "n": args.n,
        "loadavg0": round(os.getloadavg()[0], 2),
    }
    out["canary_pre"] = {q: run(q) for q in CANARY}
    out["times"] = {q: run(q) for q in tail}
    out["canary_post"] = {q: run(q) for q in CANARY}
    out["loadavg1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
