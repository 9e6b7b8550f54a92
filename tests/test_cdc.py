"""cdc_apply / table_diff semantics (operators/cdc.py): latest-image-
wins ordering, delete suppression, replay idempotence, null-safe diff
classification. The oracle-differential gates (`cdc_apply`,
`table_diff`) cover value-level equality at corpus size."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from revtron_utils_spark.operators.cdc import cdc_apply, table_diff


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "val"]
    )


def test_latest_image_wins_and_delete_suppresses(spark):
    changes = spark.createDataFrame(
        [
            (1, "a1", 11, 1, "U"),
            (1, "a2", 12, 2, "U"),   # later image wins
            (2, "b", 20, 5, "D"),    # delete removes the key
            (4, "d", 40, 1, "U"),    # fresh insert
        ],
        ["id", "name", "val", "seq", "op"],
    )
    out = {r["id"]: (r["name"], r["val"])
           for r in cdc_apply(_base(spark), changes, ["id"], "seq").collect()}
    assert out == {1: ("a2", 12), 3: ("c", 30), 4: ("d", 40)}


def test_delete_then_reinsert(spark):
    changes = spark.createDataFrame(
        [(3, "c", 30, 1, "D"), (3, "c9", 99, 2, "U")],
        ["id", "name", "val", "seq", "op"],
    )
    out = {r["id"]: (r["name"], r["val"])
           for r in cdc_apply(_base(spark), changes, ["id"], "seq").collect()}
    assert out[3] == ("c9", 99)


def test_replay_is_idempotent(spark):
    changes = spark.createDataFrame(
        [(1, "a1", 11, 1, "U"), (2, "b", 20, 2, "D")],
        ["id", "name", "val", "seq", "op"],
    )
    once = cdc_apply(_base(spark), changes, ["id"], "seq")
    # replay the same batch against the applied snapshot
    twice = cdc_apply(once, changes, ["id"], "seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_seq_tie_breaks_on_tiebreak_col(spark):
    changes = spark.createDataFrame(
        [(1, "x", 1, 7, "U", 100), (1, "y", 2, 7, "U", 200)],
        ["id", "name", "val", "seq", "op", "delivery"],
    )
    out = cdc_apply(
        _base(spark), changes, ["id"], "seq", tiebreak_col="delivery"
    ).collect()
    got = {r["id"]: r["name"] for r in out}
    assert got[1] == "y"  # higher delivery id wins the seq tie


def test_table_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30)], "id int, name string, val int"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (4, "d", 40)], "id int, name string, val int"
    )
    out = {r["id"]: (r["status"], r["changed_cols"])
           for r in table_diff(old, new, ["id"]).collect()}
    assert out[1] == ("unchanged", [])
    assert out[2] == ("changed", ["val"])   # NULL -> 20 counts as a change
    assert out[3] == ("removed", [])
    assert out[4] == ("added", [])


def test_table_diff_multi_column_change_sorted(spark):
    old = spark.createDataFrame([(1, "a", 10)], "id int, name string, val int")
    new = spark.createDataFrame([(1, "z", None)], "id int, name string, val int")
    row = table_diff(old, new, ["id"]).collect()[0]
    assert row["status"] == "changed"
    assert row["changed_cols"] == ["name", "val"]


def test_batchwise_apply_equals_one_shot_for_ordered_batches(spark):
    """foreachBatch-style application: folding seq-ordered micro-batches
    one at a time equals applying the full changelog at once (each
    batch's min seq exceeds the previous batch's max — the normal CDC
    stream contract; changes always supersede the running snapshot)."""
    base = _base(spark)
    b1 = spark.createDataFrame(
        [(1, "a1", 11, 1, "U"), (2, "b", 20, 2, "D"), (4, "d", 40, 3, "U")],
        ["id", "name", "val", "seq", "op"],
    )
    b2 = spark.createDataFrame(
        [(1, "a2", 12, 10, "U"), (4, "d", 40, 11, "D"), (3, "c2", 31, 12, "U")],
        ["id", "name", "val", "seq", "op"],
    )
    sequential = cdc_apply(cdc_apply(base, b1, ["id"], "seq"), b2, ["id"], "seq")
    one_shot = cdc_apply(base, b1.unionByName(b2), ["id"], "seq")
    assert sorted(map(tuple, sequential.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


# --------------------------------------------- property differential

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),    # key
        st.integers(min_value=0, max_value=99),   # value
        st.integers(min_value=1, max_value=20),   # seq
        st.sampled_from(["U", "D"]),              # op
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=_CHANGES)
def test_cdc_apply_matches_python_model(spark, changes):
    """Differential vs a direct python fold: per key, the (seq,
    delivery)-max change decides — image if U, absent if D; untouched
    base keys pass through."""
    base_rows = [(k, k * 10) for k in range(4)]
    model = {k: v for k, v in base_rows}
    # python model: pick per-key argmax over (seq, delivery_index)
    best: dict[int, tuple] = {}
    for i, (k, v, seq, op) in enumerate(changes):
        cur = best.get(k)
        if cur is None or (seq, i) > (cur[0], cur[1]):
            best[k] = (seq, i, v, op)
    for k, (_, _, v, op) in best.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    base = spark.createDataFrame(base_rows, "id int, val int")
    if changes:
        ch = spark.createDataFrame(
            [(k, v, seq, op, i) for i, (k, v, seq, op) in enumerate(changes)],
            "id int, val int, seq int, op string, delivery int",
        )
        got = {
            r["id"]: r["val"]
            for r in cdc_apply(
                base, ch, ["id"], "seq", tiebreak_col="delivery"
            ).collect()
        }
    else:
        got = {r["id"]: r["val"] for r in base.collect()}
    assert got == model


_SNAP = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.tuples(st.sampled_from(["a", "b", None]), st.one_of(st.none(), st.integers(0, 3))),
    max_size=10,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_SNAP, new=_SNAP)
def test_table_diff_matches_python_model(spark, old, new):
    """Differential vs a direct python fold over random snapshots with
    NULLs in both value columns (null-safe comparison semantics)."""
    model = {}
    for k in set(old) | set(new):
        if k not in new:
            model[k] = ("removed", [])
        elif k not in old:
            model[k] = ("added", [])
        else:
            changed = sorted(
                c for c, i in (("name", 0), ("val", 1)) if old[k][i] != new[k][i]
            )
            model[k] = ("changed", changed) if changed else ("unchanged", [])
    schema = "id int, name string, val int"
    o = spark.createDataFrame([(k, v[0], v[1]) for k, v in old.items()], schema)
    n = spark.createDataFrame([(k, v[0], v[1]) for k, v in new.items()], schema)
    got = {
        r["id"]: (r["status"], list(r["changed_cols"]))
        for r in table_diff(o, n, ["id"]).collect()
    }
    assert got == model


def test_ud_seq_tie_without_tiebreak_is_deterministic_delete_wins(spark):
    """An update and a delete on the same key at the same seq with NO
    tiebreak_col must resolve the same way every run: delete wins (the
    `_del DESC` final sort key), so the key is absent."""
    changes = spark.createDataFrame(
        [(1, "u", 99, 7, "U"), (1, "u", 99, 7, "D")],
        ["id", "name", "val", "seq", "op"],
    )
    for _ in range(3):  # repeated runs: row_number tie must not flip
        shuffled = changes.repartition(5)
        out = {r["id"] for r in cdc_apply(_base(spark), shuffled, ["id"], "seq").collect()}
        assert 1 not in out


def test_ud_tie_oracle_agrees_delete_wins(spark):
    """The DuckDB oracle twin resolves the same U/D collision the same
    way (delete wins)."""
    import duckdb

    from revtron_utils_spark.operators.cdc import cdc_apply_oracle_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE base_t AS SELECT 1 AS id, 'a' AS name, 10 AS val")
    con.execute(
        "CREATE TABLE chg_t AS SELECT * FROM (VALUES (1,'u',99,7,'U'),(1,'u',99,7,'D'))"
        " t(id, name, val, seq, op)"
    )
    sql = cdc_apply_oracle_sql(
        "SELECT * FROM base_t", "SELECT * FROM chg_t", ["id"], ["name", "val"], "seq"
    )
    assert con.execute(sql).fetchall() == []
