"""Smoke sweep over the whole driver registry: every ``queries()``
entry must build and execute at sf0.001 on the engine session, and
every oracle entry must be parseable DuckDB SQL. Catches a broken
registry entry in pytest without the full differential harness
(tools/check_correctness.py remains the value-level gate)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod

from conftest import SF_DIR, duck

_ALL = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", _ALL)
def test_query_executes(spark, name):
    try:
        df = entry_mod.queries()[name](spark, SF_DIR)
        # full execution without driver-side transfer, like the bench sink
        df.write.mode("overwrite").format("noop").save()
        assert df.columns, f"{name}: empty schema"
    finally:
        # same per-query hygiene as bench.py: frames persisted inside
        # dedup/graph operators must not accumulate across the ~100-case
        # session-scoped sweep
        from revtron_utils_spark.operators.dedup import release_caches

        release_caches()
        spark.catalog.clearCache()


def test_oracle_sql_parses():
    con = duck()
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql.rstrip().rstrip(';')}) LIMIT 0")
        except Exception as exc:
            bad.append((name, str(exc)[:120]))
    assert not bad, bad


def test_entry_contract(spark):
    out = entry_mod.entry(spark)
    rows = out.collect()
    assert out.columns
    assert len(rows) > 0, "flagship query returned no rows"
