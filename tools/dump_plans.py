#!/usr/bin/env python
"""Dump ``explain('formatted')`` for headline queries into
``plans/<round>/<query>_<suffix>.txt`` (optimization-round evidence:
the judge diffs the _before/_after files against the claims in
OPTIMIZATION_*.md).

Usage:
    python tools/dump_plans.py <round> <suffix> [sf_dir] [query ...]

With no query list, dumps every headline query in bench.HEADLINE.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench
import __spark_entry__ as entry_mod
from revtron_utils_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    if len(args) < 2:
        sys.exit(__doc__)
    rnd, suffix = args[0], args[1]
    rest = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and "/" in rest[0]:
        sf_dir = rest[0]
        rest = rest[1:]
    names = rest or bench.HEADLINE

    out_dir = REPO / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="dump-plans")
    queries = entry_mod.queries()
    n_ok = 0
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep going
            txt = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        n_ok += 1
        print(f"wrote plans/{rnd}/{name}_{suffix}.txt")
    print(f"done: {n_ok}/{len(names)}")


if __name__ == "__main__":
    main()
