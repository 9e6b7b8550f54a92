"""Unit tests for the where-DSL compiler (F1-F10) — differential against
DuckDB running the equivalent SQL on the same parquet, mirroring the
reference DSL at /root/reference/revtron/database/main.py:191-216."""

from __future__ import annotations

import pytest

from tests.conftest import duck

CASES = [
    # (name, dsl, duckdb sql predicate)
    ("F1_eq", {"l_returnflag": "R"}, "l_returnflag = 'R'"),
    ("F2_in", {"l_linestatus": {"operator": "in", "value": ["O", "F"]}}, "l_linestatus IN ('O','F')"),
    ("F3_not_in", {"l_returnflag": {"operator": "not in", "value": ["A"]}}, "l_returnflag NOT IN ('A')"),
    ("F4_like", {"l_returnflag": {"operator": "like", "value": "R%"}}, "l_returnflag LIKE 'R%'"),
    ("F5_not_like", {"l_returnflag": {"operator": "not like", "value": "N%"}}, "l_returnflag NOT LIKE 'N%'"),
    ("F6_is_null", {"l_quantity": {"operator": "is null"}}, "l_quantity IS NULL"),
    ("F7_is_not_null", {"l_quantity": {"operator": "is not null"}}, "l_quantity IS NOT NULL"),
    (
        "F8_between",
        {"l_quantity": {"operator": "between", "value": [10, 20]}},
        "l_quantity BETWEEN 10 AND 20",
    ),
    (
        "F9_not_between",
        {"l_quantity": {"operator": "not between", "value": [10, 20]}},
        "l_quantity NOT BETWEEN 10 AND 20",
    ),
    ("F10_gt", {"l_quantity": {"operator": ">", "value": 30}}, "l_quantity > 30"),
    ("F10_ne", {"l_returnflag": {"operator": "!=", "value": "A"}}, "l_returnflag <> 'A'"),
    (
        "conjunction",
        [
            {"l_returnflag": "R"},
            {"l_quantity": {"operator": ">", "value": 30}},
            {"l_linestatus": {"operator": "in", "value": ["F"]}},
        ],
        "l_returnflag = 'R' AND l_quantity > 30 AND l_linestatus IN ('F')",
    ),
]


@pytest.mark.parametrize("name,dsl,sql_pred", CASES, ids=[c[0] for c in CASES])
def test_dsl_matches_duckdb(engine, name, dsl, sql_pred):
    got = engine.get("lineitem", where=dsl).count()
    con = duck()
    want = con.execute(f"SELECT count(*) FROM lineitem WHERE {sql_pred}").fetchone()[0]
    assert got == want, f"{name}: spark={got} duckdb={want}"


def test_unknown_operator_raises(engine):
    from revtron_utils_spark import WhereDSLError

    with pytest.raises(WhereDSLError):
        engine.get("lineitem", where={"l_quantity": {"operator": "frobnicate", "value": 1}}).count()


def test_empty_where_is_full_scan(engine):
    assert engine.get("lineitem").count() == engine.get_table_count("lineitem")


def test_empty_in_list(engine):
    assert engine.get("lineitem", where={"l_returnflag": {"operator": "in", "value": []}}).count() == 0


def test_kwargs_filters(engine):
    from revtron_utils_spark import kwargs_filters

    df = engine.get_table("events")
    got = df.filter(kwargs_filters(event_type=["click", "view"], user_id=7)).count()
    con = duck()
    want = con.execute(
        "SELECT count(*) FROM events WHERE event_type IN ('click','view') AND user_id = 7"
    ).fetchone()[0]
    assert got == want


def test_or_groups_compile_and_nest(spark):
    from revtron_utils_spark.dsl import compile_where

    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 50.0), (3, "C", 500.0), (4, "A", 5000.0)],
        ["k", "flag", "v"],
    )
    # (flag = 'A' AND v < 10) OR (v > 400 AND (flag = 'C' OR flag = 'A'))
    where = {
        "or": [
            [{"flag": "A"}, {"v": {"operator": "<", "value": 10}}],
            [
                {"v": {"operator": ">", "value": 400}},
                {"or": [{"flag": "C"}, {"flag": "A"}]},
            ],
        ]
    }
    got = sorted(r.k for r in df.filter(compile_where(where)).collect())
    assert got == [1, 3, 4]


def test_or_group_validation():
    import pytest
    from revtron_utils_spark.dsl import WhereDSLError, compile_where

    with pytest.raises(WhereDSLError):
        compile_where({"or": "not-a-list"})
    with pytest.raises(WhereDSLError):
        compile_where({"or": []})
