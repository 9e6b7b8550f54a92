"""Engine read-path, catalog, and mutation-suite tests (SURVEY §2.1, §2.4,
§2.6). Mutation semantics are checked against the reference's documented
Postgres behavior: null-preserving upsert, write-through update, SQL
three-valued delete."""

from __future__ import annotations

import pytest

from tests.conftest import duck


def test_flagship_read(engine):
    df = engine.get(
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_shipdate", "l_returnflag"],
        where=[
            {"l_shipdate": {"operator": "between", "value": ["1994-01-01", "1996-12-31"]}},
            {"l_returnflag": "R"},
        ],
        sort_by="l_extendedprice",
        ascending=False,
        limit=10,
    )
    rows = df.collect()
    assert len(rows) == 10
    prices = [r.l_extendedprice for r in rows]
    assert prices == sorted(prices, reverse=True)
    con = duck()
    want = con.execute(
        "SELECT l_extendedprice FROM lineitem WHERE l_shipdate BETWEEN '1994-01-01' AND "
        "'1996-12-31' AND l_returnflag='R' ORDER BY l_extendedprice DESC LIMIT 10"
    ).fetchall()
    assert prices == [w[0] for w in want]


def test_sort_offset_limit_pagination(engine):
    page1 = engine.get("orders", sort_by="o_orderkey", limit=5, as_dicts=True)
    page2 = engine.get("orders", sort_by="o_orderkey", limit=5, offset=5, as_dicts=True)
    keys = [r["o_orderkey"] for r in page1 + page2]
    assert keys == sorted(keys)
    assert len(set(keys)) == 10


def test_catalog(engine):
    assert engine.check_table_exists("lineitem")
    assert not engine.check_table_exists("nope")
    assert "l_orderkey" in engine.get_table_columns("lineitem")
    assert set(engine.get_tables()) >= {"region", "nation", "orders", "lineitem"}
    assert engine.get_table_count("region") == 5


def test_execute_raw(engine):
    df = engine.execute_raw(
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"
    )
    got = {r.o_orderstatus: r.n for r in df.collect()}
    con = duck()
    want = dict(con.execute("SELECT o_orderstatus, count(*) FROM orders GROUP BY 1").fetchall())
    assert got == want


def test_table_size_profile(engine):
    prof = engine.table_size("events", date_field="ts")
    assert prof["n_records"] == engine.get_table_count("events")
    assert prof["n_columns"] == 6
    assert prof["min_date"] <= prof["max_date"]


# ---------------------------------------------------------------- mutations


@pytest.fixture()
def managed_customer(engine):
    engine.save_table("mcustomer", engine.get_table("customer"), primary_key=["c_custkey"])
    return engine


def test_upsert_null_preserving(managed_customer):
    eng = managed_customer
    before = {r["c_custkey"]: r for r in eng.get("mcustomer", as_dicts=True)}
    some_key = min(before)
    keys = eng.upsert(
        "mcustomer",
        [
            {"c_custkey": some_key, "c_name": "RENAMED", "c_acctbal": None},
            {"c_custkey": 10**9, "c_name": "NEWBIE", "c_acctbal": 42.0},
        ],
    )
    assert sorted(k["c_custkey"] for k in keys) == [some_key, 10**9]
    after = {r["c_custkey"]: r for r in eng.get("mcustomer", as_dicts=True)}
    assert len(after) == len(before) + 1
    assert after[some_key]["c_name"] == "RENAMED"
    # incoming NULL must NOT clobber (main.py:106-113)
    assert after[some_key]["c_acctbal"] == before[some_key]["c_acctbal"]
    # untouched column passes through
    assert after[some_key]["c_mktsegment"] == before[some_key]["c_mktsegment"]
    assert after[10**9]["c_name"] == "NEWBIE"


def test_upsert_overwrite_with_null(managed_customer):
    eng = managed_customer
    some_key = min(r["c_custkey"] for r in eng.get("mcustomer", as_dicts=True))
    eng.upsert(
        "mcustomer",
        {"c_custkey": some_key, "c_acctbal": None},
        overwrite_with_null=True,
    )
    after = {r["c_custkey"]: r for r in eng.get("mcustomer", as_dicts=True)}
    assert after[some_key]["c_acctbal"] is None


def test_upsert_idempotent(managed_customer):
    eng = managed_customer
    rec = {"c_custkey": 77777, "c_name": "IDEMP", "c_acctbal": 1.5}
    eng.upsert("mcustomer", rec)
    snap1 = sorted(map(str, eng.get("mcustomer", as_dicts=True)))
    eng.upsert("mcustomer", rec)
    snap2 = sorted(map(str, eng.get("mcustomer", as_dicts=True)))
    assert snap1 == snap2


def test_upsert_duplicate_source_keys_collapse(managed_customer):
    """A source with repeated keys must not multiply target rows
    (Postgres errors; we collapse deterministically)."""
    eng = managed_customer
    before = eng.get_table_count("mcustomer")
    some_key = min(r["c_custkey"] for r in eng.get("mcustomer", as_dicts=True))
    eng.upsert(
        "mcustomer",
        [
            {"c_custkey": some_key, "c_name": "A"},
            {"c_custkey": some_key, "c_name": "B"},
        ],
    )
    assert eng.get_table_count("mcustomer") == before
    after = {r["c_custkey"]: r for r in eng.get("mcustomer", as_dicts=True)}
    assert after[some_key]["c_name"] in ("A", "B")


def test_update_duplicate_source_keys_no_multiply(managed_customer):
    eng = managed_customer
    before = eng.get_table_count("mcustomer")
    some_key = min(r["c_custkey"] for r in eng.get("mcustomer", as_dicts=True))
    eng.update(
        "mcustomer",
        [{"c_custkey": some_key, "c_name": "X"}, {"c_custkey": some_key, "c_name": "Y"}],
        on="c_custkey",
    )
    assert eng.get_table_count("mcustomer") == before


def test_reattach_clears_format(engine, tmp_path):
    df = engine.get_table("region")
    df.write.option("header", "true").csv(str(tmp_path / "r_csv"))
    df.write.parquet(str(tmp_path / "r_pq"))
    engine.attach("swap", str(tmp_path / "r_csv"), format="csv", header="true", inferSchema="true")
    assert engine.get_table_count("swap") == 5
    engine.attach("swap", str(tmp_path / "r_pq"))  # re-attach as plain parquet
    assert engine.get_table_count("swap") == 5
    assert set(engine.get_table_columns("swap")) == {"r_regionkey", "r_name"}


def test_execute_raw_works_with_jdbc_attached(engine):
    engine.attach_jdbc("pg_x", url="jdbc:postgresql://nowhere/db")
    n = engine.execute_raw("SELECT count(*) AS n FROM region").collect()[0].n
    assert n == 5


def test_upsert_requires_pk(engine):
    from revtron_utils_spark import MergeKeyError

    engine.save_table("nopk", engine.get_table("region"))
    with pytest.raises(MergeKeyError):
        engine.upsert("nopk", {"r_regionkey": 1, "r_name": "x"})


def test_update_writes_nulls_through(managed_customer):
    eng = managed_customer
    some_key = min(r["c_custkey"] for r in eng.get("mcustomer", as_dicts=True))
    n = eng.update(
        "mcustomer",
        [{"c_custkey": some_key, "c_acctbal": None, "c_name": "UPD"}],
        on="c_custkey",
    )
    assert n == 1
    after = {r["c_custkey"]: r for r in eng.get("mcustomer", as_dicts=True)}
    assert after[some_key]["c_acctbal"] is None  # UPDATE clobbers, unlike upsert
    assert after[some_key]["c_name"] == "UPD"


def test_update_no_insert(managed_customer):
    eng = managed_customer
    before = eng.get_table_count("mcustomer")
    n = eng.update("mcustomer", [{"c_custkey": 10**9 + 5, "c_name": "GHOST"}], on="c_custkey")
    assert n == 0
    assert eng.get_table_count("mcustomer") == before


def test_delete_where(engine):
    engine.save_table("mevents", engine.get_table("events"), primary_key=["event_id"])
    total = engine.get_table_count("mevents")
    con = duck()
    want_deleted = con.execute("SELECT count(*) FROM events WHERE value > 50").fetchone()[0]
    n = engine.delete("mevents", {"value": {"operator": ">", "value": 50}})
    assert n == want_deleted
    assert engine.get_table_count("mevents") == total - want_deleted


def test_insert_defaults_applied(engine):
    from revtron_utils_spark import ColumnModel

    engine.create_table(
        "with_defaults",
        [
            ColumnModel("id", "bigint", primary_key=True),
            ColumnModel("status", "string", default="new"),
            ColumnModel("score", "double"),
        ],
    )
    engine.upsert("with_defaults", {"id": 1})  # status/score omitted
    row = engine.get("with_defaults", as_dicts=True)[0]
    assert row["status"] == "new"  # declared default applied on insert
    assert row["score"] is None  # no default -> NULL
    # an update must NOT re-apply the default over an existing value
    engine.upsert("with_defaults", {"id": 1, "score": 2.5})
    row = engine.get("with_defaults", as_dicts=True)[0]
    assert row["status"] == "new" and row["score"] == 2.5


def test_multi_column_sort(engine):
    rows = engine.get(
        "lineitem",
        columns=["l_returnflag", "l_quantity"],
        sort_by=["l_returnflag", "l_quantity"],
        limit=20,
        as_dicts=True,
    )
    pairs = [(r["l_returnflag"], r["l_quantity"]) for r in rows]
    assert pairs == sorted(pairs)


def test_create_table_schema_evolution(engine):
    from revtron_utils_spark import ColumnModel

    engine.create_table(
        "evolving",
        [ColumnModel("id", "bigint", primary_key=True), ColumnModel("a", "string")],
    )
    engine.upsert("evolving", {"id": 1, "a": "x"})
    engine.create_table(
        "evolving",
        [ColumnModel("id", "bigint"), ColumnModel("a", "string"), ColumnModel("b", "double")],
    )
    cols = engine.get_table_columns("evolving")
    assert cols == ["id", "a", "b"]
    rows = engine.get("evolving", as_dicts=True)
    assert rows[0]["b"] is None


def test_unique_constraints_and_index_layout(engine):
    from revtron_utils_spark import ColumnModel

    engine.create_table(
        "uq",
        [
            ColumnModel("id", "bigint", primary_key=True),
            ColumnModel("email", "string"),
            ColumnModel("score", "double"),
        ],
        unique_columns=["email"],
        indexes=["score"],
    )
    engine.upsert("uq", [{"id": 1, "email": "a@x"}, {"id": 2, "email": "b@x"}])
    assert engine.validate_unique("uq") == {}
    # bulk-load a duplicate email around the upsert path
    dup = engine.get_table("uq").unionByName(
        engine.spark.createDataFrame([(3, "a@x", 1.0)], engine.get_table("uq").schema)
    )
    engine.save_table("uq", dup)
    violations = engine.validate_unique("uq")
    assert violations == {"unique:email": 1}

    # index hint: managed write sorts within partitions on `score`
    import random

    import pyarrow.parquet as pq
    from pathlib import Path

    rng = random.Random(7)
    rows = [(i, f"u{i}@x", rng.uniform(0, 1000)) for i in range(200)]
    big = engine.spark.createDataFrame(rows, engine.get_table("uq").schema).repartition(2)
    engine.save_table("uq", big)
    path = Path(engine._managed_path("uq")) / "current"
    files = sorted(path.resolve().glob("*.parquet"))
    assert files
    vals = []
    for f in files:
        t = pq.read_table(f, columns=["score"])
        col = [v for v in t.column("score").to_pylist() if v is not None]
        assert col == sorted(col)
        vals += col


def test_attach_csv_json(engine, spark, tmp_path):
    df = engine.get_table("region")
    df.write.option("header", "true").csv(str(tmp_path / "region_csv"))
    df.write.json(str(tmp_path / "region_json"))
    engine.attach("region_csv", str(tmp_path / "region_csv"), format="csv",
                  header="true", inferSchema="true")
    engine.attach("region_json", str(tmp_path / "region_json"), format="json")
    assert engine.get_table_count("region_csv") == 5
    assert engine.get_table_count("region_json") == 5
    assert set(engine.get_table_columns("region_json")) == {"r_regionkey", "r_name"}


def test_create_view_and_list(engine):
    engine.create_view("big_orders", "SELECT * FROM orders WHERE o_totalprice > 100000")
    assert "big_orders" in engine.get_views()
    n = engine.execute_raw("SELECT count(*) AS n FROM big_orders").collect()[0].n
    assert 0 < n < engine.get_table_count("orders")


def test_timer_decorator(capsys):
    from revtron_utils_spark import timer

    @timer
    def f(x):
        return x + 1

    @timer(text="hello")
    def g(x):
        return x * 2

    assert f(1) == 2 and g(2) == 4
    out = capsys.readouterr().out
    assert "seconds" in out and "hello" in out
    assert f.last_elapsed is not None


def test_upsert_merge_many_equals_iterated(spark):
    """The one-shuffle N-batch fold must match pairwise upsert_merge in
    both null-preserving and overwrite modes."""
    from revtron_utils_spark import upsert_merge, upsert_merge_many

    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)], ["k", "name", "v"]
    )
    b2 = spark.createDataFrame(
        [(2, None, 21.0), (3, "c", None), (4, "d", 40.0)], ["k", "name", "v"]
    )
    b3 = spark.createDataFrame([(1, None, None), (5, "e", 50.0)], ["k", "name", "v"])

    for own in (False, True):
        iterated = upsert_merge(
            upsert_merge(b1, b2, ["k"], overwrite_with_null=own),
            b3,
            ["k"],
            overwrite_with_null=own,
        )
        folded = upsert_merge_many([b1, b2, b3], ["k"], overwrite_with_null=own)
        assert folded.exceptAll(iterated).count() == 0, f"own={own}"
        assert iterated.exceptAll(folded).count() == 0, f"own={own}"

    # plan check: the fold is a single aggregation — far fewer exchanges
    from revtron_utils_spark.plans.audit import PlanFacts

    f_folded = PlanFacts.of(upsert_merge_many([b1, b2, b3], ["k"]))
    f_iter = PlanFacts.of(
        upsert_merge(upsert_merge(b1, b2, ["k"]), b3, ["k"])
    )
    assert f_folded.exchanges < f_iter.exchanges


def test_as_df_key_order_independent(engine):
    """Dict records listing keys in different orders must land in the
    right columns (positional Row conversion silently swapped them)."""
    import pyspark.sql.functions as F

    cu = engine.get_table("customer").limit(5)
    engine.save_table("cust_ord", cu, primary_key=["c_custkey"])
    engine.upsert(
        "cust_ord",
        [
            {"c_custkey": 1, "c_acctbal": 111.0},
            {"c_acctbal": 222.0, "c_custkey": 2},  # reversed key order
        ],
    )
    got = {
        r.c_custkey: r.c_acctbal
        for r in engine.get_table("cust_ord").filter(F.col("c_custkey").isin(1, 2)).collect()
    }
    assert got[1] == 111.0 and got[2] == 222.0


def test_as_df_empty_records_rejected(engine):
    import pytest

    cu = engine.get_table("customer").limit(1)
    engine.save_table("cust_empty", cu, primary_key=["c_custkey"])
    with pytest.raises(ValueError, match="empty"):
        engine.upsert("cust_empty", [])


def test_create_table_refuses_to_shadow_attached(engine):
    import pytest
    from revtron_utils_spark.engine import ColumnModel

    with pytest.raises(ValueError, match="shadow"):
        engine.create_table("customer", [ColumnModel("c_custkey", "bigint")])


def test_jdbc_roundtrip(engine, spark, tmp_path):
    """Live JDBC execution against embedded Derby (ships with Spark) —
    the reference's primary transport is a SQLAlchemy engine URL
    (reference revtron/database/main.py:39-49); attach_jdbc is its Spark
    analog. Round-trips a write, a read, predicate pushdown into the
    JDBC scan, and a partition-parallel read."""
    url = f"jdbc:derby:{tmp_path}/jdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    src = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(20)], "id int, name string, val double"
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "items")
        .option("driver", driver)
        .option("createTableColumnTypes", "id INT, name VARCHAR(64), val DOUBLE")
        .mode("overwrite")
        .save()
    )

    engine.attach_jdbc("items", url, driver=driver)
    got = engine.get_table("items")
    assert got.count() == 20
    assert {r.name for r in got.filter("id < 3").collect()} == {"n0", "n1", "n2"}

    # predicate pushdown: the filter must reach the JDBC scan (executed
    # server-side), not run as a post-scan Spark Filter
    from revtron_utils_spark.plans.audit import formatted_plan

    flt = engine.get_table("items").filter("id >= 10")
    plan = formatted_plan(flt)
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan, plan[:2000]
    assert flt.count() == 10

    # partition-parallel read: bounds split the scan into N JDBC queries
    engine.attach_jdbc(
        "items_p",
        url,
        dbtable="items",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=20,
        driver=driver,
    )
    dp = engine.get_table("items_p")
    assert dp.rdd.getNumPartitions() == 4
    assert dp.count() == 20

    # write-through via engine: append more rows over JDBC, read back
    extra = spark.createDataFrame([(100, "x", 0.5)], "id int, name string, val double")
    (
        extra.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "items")
        .option("driver", driver)
        .mode("append")
        .save()
    )
    assert engine.get_table("items").count() == 21
