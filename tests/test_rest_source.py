"""REST source/sink + Salesforce facade tests against the in-memory
transport — covers S9-S19 semantics: partitioned two-phase fetch,
date-window extraction, kwargs filters, soft-delete visibility, SOQL
compilation parity, per-record write status."""

from __future__ import annotations

from datetime import datetime

import pytest

from revtron_utils_spark.sources.rest import QuerySpec
from revtron_utils_spark.sources.salesforce import (
    FakeSalesforceTransport,
    Salesforce,
    compile_soql,
)


def make_rows(n=250):
    return [
        {
            "Id": f"ID{i:05d}",
            "Name": f"acct {i}",
            "Amount": float(i) * 1.5,
            "LastModifiedDate": datetime(2024, 1, 1 + (i % 28)),
            "IsDeleted": i % 50 == 0,
            "Stage": "open" if i % 3 else "won",
        }
        for i in range(n)
    ]


@pytest.fixture()
def sf(spark):
    transport = FakeSalesforceTransport({"Opportunity": make_rows()})
    return Salesforce(spark, transport, max_parallelism=4)


def test_catalog_surface(sf):
    assert sf.sobjects == ["Opportunity"]
    assert "Amount" in sf.get_sobject_columns("Opportunity")
    assert sf.limits["DailyApiRequests"]["Max"] == 100000
    types = {f["name"]: f["type"] for f in sf.describe_sobject("Opportunity")}
    assert types["Id"] == "id" and types["Amount"] == "double" and types["LastModifiedDate"] == "datetime"


def test_get_excludes_soft_deleted_by_default(sf):
    df = sf.get("Opportunity")
    rows = df.collect()
    # 250 rows, 5 soft-deleted (every 50th)
    assert len(rows) == 245
    assert sf.get("Opportunity", include_deleted=True).count() == 250


def test_get_columns_and_filters(sf):
    df = sf.get("Opportunity", columns=["Id", "Stage"], Stage="won")
    assert df.columns == ["Id", "Stage"]
    rows = df.collect()
    assert rows and all(r.Stage == "won" for r in rows)


def test_get_date_window(sf):
    df = sf.get(
        "Opportunity",
        start_date=datetime(2024, 1, 10),
        end_date=datetime(2024, 1, 12),
    )
    dates = {r.LastModifiedDate.day for r in df.collect()}
    assert dates == {10, 11, 12}


def test_get_limit(sf):
    assert sf.get("Opportunity", limit=7).count() == 7


def test_get_list_filter_in(sf):
    n_open = sf.get("Opportunity", Stage=["open"]).count()
    n_both = sf.get("Opportunity", Stage=["open", "won"]).count()
    assert 0 < n_open < n_both == 245


def test_as_dicts_edge(sf):
    recs = sf.get("Opportunity", columns=["Id", "Name"], limit=3, as_dicts=True)
    assert isinstance(recs, list) and isinstance(recs[0], dict) and "Id" in recs[0]


def test_sobject_size(sf):
    prof = sf.sobject_size("Opportunity", date_field="LastModifiedDate")
    assert prof["n_records"] == 245
    assert prof["min_date"] == datetime(2024, 1, 1)
    assert prof["n_columns"] == 6


def test_write_upsert_routes_on_id(spark, tmp_path):
    from revtron_utils_spark.sources.salesforce import FakeSalesforceTransport, Salesforce

    log_dir = str(tmp_path / "writes")
    transport = FakeSalesforceTransport({"Opportunity": make_rows()}, write_log_dir=log_dir)
    sf = Salesforce(spark, transport, max_parallelism=4)
    res = sf.upsert(
        "Opportunity",
        [
            {"Id": "ID00001", "Name": "renamed"},
            {"Name": "brand new", "Amount": 9.0},
        ],
    ).collect()
    by_status = {r.status for r in res}
    assert by_status == {"updated", "inserted"}
    # executor tasks hold pickled transport copies — the write log is the
    # cross-process record that both writes actually executed
    log = FakeSalesforceTransport.read_write_log(log_dir)
    actions = {(e["action"], e["record"].get("Name")) for e in log}
    assert ("updated", "renamed") in actions
    assert ("inserted", "brand new") in actions


def test_write_error_captured_not_raised(sf):
    res = sf.update("Opportunity", [{"Id": "NOPE", "Name": "x"}, {"Name": "no id"}]).collect()
    assert all(r.status == "error" for r in res)
    assert any("not found" in (r.error or "") for r in res)
    assert any("requires Id" in (r.error or "") for r in res)


def test_insert_always_posts(sf):
    res = sf.insert("Opportunity", [{"Id": "ID00002", "Name": "clone"}]).collect()
    assert res[0].status == "inserted"
    assert res[0].record_id.startswith("FAKE")


# ---------------------------------------------------------------- SOQL


def test_soql_basic_select():
    assert (
        compile_soql(QuerySpec("Account"))
        == "SELECT FIELDS(ALL) FROM Account"
    )


def test_soql_where_rewrite_and_dates():
    q = compile_soql(
        QuerySpec(
            "Account",
            columns=["Id", "Name"],
            start_date=datetime(2024, 1, 1),
            end_date=datetime(2024, 2, 1),
        )
    )
    assert q == (
        "SELECT Id, Name FROM Account"
        " WHERE LastModifiedDate >= 2024-01-01T00:00:00.000000+0000"
        " AND LastModifiedDate <= 2024-02-01T00:00:00.000000+0000"
    )


def test_soql_filters_scalar_vs_list():
    q = compile_soql(QuerySpec("Account", filters={"Stage": "won", "Type": ["a", "b"]}))
    assert "WHERE Stage = 'won'" in q
    assert "AND Type IN ('a', 'b')" in q


def test_soql_single_element_tuple_fixup():
    q = compile_soql(QuerySpec("Account", filters={"Type": ["solo"]}))
    assert "Type IN ('solo')" in q and "('solo',)" not in q


def test_soql_id_batch_gets_data_limit():
    q = compile_soql(QuerySpec("Account", columns=["Id"], id_batch=["a", "b"]))
    assert q.endswith("LIMIT 200") and "Id IN ('a', 'b')" in q


def test_soql_user_limit():
    assert compile_soql(QuerySpec("Account", limit=5)).endswith("LIMIT 5")


def test_soql_escapes_quotes_and_datetime_lists():
    from datetime import datetime
    from revtron_utils_spark.sources.salesforce import QuerySpec, compile_soql

    q = compile_soql(QuerySpec(sobject="Contact", columns=["Id"], filters={"LastName": "O'Brien"}))
    assert "LastName = 'O\\'Brien'" in q
    q2 = compile_soql(
        QuerySpec(
            sobject="Contact",
            columns=["Id"],
            filters={"CreatedDate": [datetime(2020, 1, 1), datetime(2021, 1, 1)]},
        )
    )
    assert "datetime" not in q2  # no Python reprs
    assert "2020-01-01T00:00:00.000000+0000" in q2
