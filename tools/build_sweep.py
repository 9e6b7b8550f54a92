#!/usr/bin/env python
"""Time ONLY the build (driver-side DataFrame construction, no action)
of every headline query — the py4j/Catalyst analysis floor that VERDICT
r12 task 8 targets.

    python tools/build_sweep.py [sf_dir] [--profile name1,name2]

With --profile, cProfile the named builders and print the top py4j /
expression-construction hotspots.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    prof_names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--profile"):
            prof_names = a.split("=", 1)[1].split(",") if "=" in a else []

    import __spark_entry__ as entry_mod
    from revtron_utils_spark.session import get_spark

    spark = get_spark(app_name="build-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from revtron_utils_spark.io import read_table

    try:
        read_table(spark, sf_dir, "region").write.mode("overwrite").format(
            "noop"
        ).save()
    except Exception:
        pass

    from revtron_utils_spark.operators.dedup import release_caches

    queries = entry_mod.queries()

    if prof_names:
        import cProfile
        import pstats

        for name in prof_names:
            fn = queries[name]
            fn(spark, sf_dir)  # warm module-level lazies
            release_caches()
            spark.catalog.clearCache()
            pr = cProfile.Profile()
            pr.enable()
            fn(spark, sf_dir)
            pr.disable()
            release_caches()
            spark.catalog.clearCache()
            print(f"===== {name} =====", flush=True)
            st = pstats.Stats(pr)
            st.sort_stats("cumulative").print_stats(30)
        return

    out = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {e}", flush=True)
            continue
        out[name] = time.perf_counter() - t0
        release_caches()
        spark.catalog.clearCache()
        print(f"{name}: {out[name]:.3f}", flush=True)
    top = sorted(out.items(), key=lambda kv: -kv[1])
    print("\n== total build %.1f s over %d queries ==" % (sum(out.values()), len(out)))
    for k, v in top[:40]:
        print(f"{v:7.3f}  {k}")


if __name__ == "__main__":
    main()
