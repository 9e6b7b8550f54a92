"""HttpSalesforceTransport protocol tests against a scripted stub
session — auth host fallback, 401 re-auth, 204 handling, cursor
pagination, queryAll routing, write routing. No network."""

from __future__ import annotations

import json

import pytest

from revtron_utils_spark.sources.http_transport import (
    PROD_HOST,
    SANDBOX_HOST,
    HttpSalesforceTransport,
)
from revtron_utils_spark.sources.rest import QuerySpec


class StubResponse:
    def __init__(self, status_code=200, body=None, text=""):
        self.status_code = status_code
        self._body = body if body is not None else {}
        self.text = text or json.dumps(self._body)

    def json(self):
        return self._body


class StubSession:
    """Scripted HTTP session: records calls, answers from a routing
    table (list entries pop in order; callables get the kwargs)."""

    def __init__(self, routes):
        self.routes = routes
        self.calls = []

    def _answer(self, method, url, **kwargs):
        self.calls.append((method, url, kwargs))
        for key, resp in self.routes:
            if key in url:
                if isinstance(resp, list):
                    return resp.pop(0)
                if callable(resp):
                    return resp(method, url, **kwargs)
                return resp
        return StubResponse(404, {"error": "no route"}, "no route")

    def post(self, url, **kwargs):
        return self._answer("POST", url, **kwargs)

    def get(self, url, **kwargs):
        return self._answer("GET", url, **kwargs)

    def request(self, method, url, **kwargs):
        return self._answer(method, url, **kwargs)


TOKEN_OK = StubResponse(200, {"access_token": "TOK", "instance_url": "https://inst.example"})


def make_transport(routes):
    session = StubSession(routes)
    t = HttpSalesforceTransport(
        client_id="cid", client_secret="sec", refresh_token_value="ref",
        session_factory=lambda: session,
    )
    return t, session


def test_refresh_token_prod_first():
    t, session = make_transport([("oauth2/token", TOKEN_OK)])
    assert t.refresh_token() == "TOK"
    assert t.instance_url == "https://inst.example"
    assert session.calls[0][1].startswith(PROD_HOST)


def test_refresh_token_falls_back_to_sandbox():
    t, session = make_transport(
        [("oauth2/token", [StubResponse(400, {}, "bad"), TOKEN_OK])]
    )
    assert t.refresh_token() == "TOK"
    hosts = [c[1] for c in session.calls]
    assert hosts[0].startswith(PROD_HOST) and hosts[1].startswith(SANDBOX_HOST)


def test_refresh_token_both_fail():
    t, _ = make_transport([("oauth2/token", StubResponse(500, {}, "down"))])
    with pytest.raises(RuntimeError, match="both hosts"):
        t.refresh_token()


def test_request_204_maps_to_empty_dict():
    t, _ = make_transport(
        [("oauth2/token", TOKEN_OK), ("/sobjects/Acct/abc", StubResponse(204))]
    )
    assert t.write_record("Acct", {"Name": "x"}, "abc") == {"id": "abc", "status": "updated"}


def test_request_401_reauths_once():
    t, session = make_transport(
        [
            ("oauth2/token", TOKEN_OK),
            ("/limits/", [StubResponse(401, {}, "expired"), StubResponse(200, {"DailyApiRequests": {}})]),
        ]
    )
    assert t.limits() == {"DailyApiRequests": {}}
    # token endpoint hit twice: initial auth + re-auth after the 401
    assert sum("oauth2/token" in c[1] for c in session.calls) == 2


def test_request_raises_on_error_status():
    t, _ = make_transport(
        [("oauth2/token", TOKEN_OK), ("/limits/", StubResponse(500, {}, "boom"))]
    )
    with pytest.raises(RuntimeError, match="HTTP 500"):
        t.limits()


def test_query_ids_follows_cursor():
    page1 = StubResponse(
        200,
        {"records": [{"Id": "a"}, {"Id": "b"}], "done": False, "nextRecordsUrl": "/next/xyz"},
    )
    page2 = StubResponse(200, {"records": [{"Id": "c"}], "done": True})
    t, session = make_transport(
        [("oauth2/token", TOKEN_OK), ("/next/xyz", page2), ("/query", page1)]
    )
    pages = list(t.query_ids(QuerySpec("Acct"), page_size=200))
    assert pages == [["a", "b"], ["c"]]
    # batchSize header rode the first request
    first_query_call = next(c for c in session.calls if "/query" in c[1])
    assert first_query_call[2]["headers"]["Sforce-Query-Options"] == "batchSize=200"


def test_include_deleted_routes_to_queryall():
    t, session = make_transport(
        [("oauth2/token", TOKEN_OK), ("/queryAll", StubResponse(200, {"records": [], "done": True}))]
    )
    list(t.query_ids(QuerySpec("Acct", include_deleted=True), page_size=10))
    assert any("/queryAll" in c[1] for c in session.calls)


def test_fetch_rows_strips_attributes():
    t, _ = make_transport(
        [
            ("oauth2/token", TOKEN_OK),
            ("/query", StubResponse(200, {"records": [{"attributes": {"type": "Acct"}, "Id": "a", "V": 1}]})),
        ]
    )
    assert t.fetch_rows(QuerySpec("Acct", columns=["Id", "V"])) == [{"Id": "a", "V": 1}]


def test_aggregate_reads_expr_aliases():
    t, _ = make_transport(
        [
            ("oauth2/token", TOKEN_OK),
            ("/query", StubResponse(200, {"records": [{"expr0": 42, "expr1": "2024-01-01"}]})),
        ]
    )
    out = t.aggregate(QuerySpec("Acct"), ["COUNT(Id)", "MIN(D)"])
    assert out == {"COUNT(Id)": 42, "MIN(D)": "2024-01-01"}


def test_insert_posts_without_id():
    t, session = make_transport(
        [("oauth2/token", TOKEN_OK), ("/sobjects/Acct/", StubResponse(201, {"id": "new1"}))]
    )
    assert t.write_record("Acct", {"Name": "n"}, None) == {"id": "new1", "status": "inserted"}
    method = next(c[0] for c in session.calls if "/sobjects/Acct/" in c[1])
    assert method == "POST"


class StubFactory:
    """Module-level (picklable) session factory, as a real executor-side
    factory would be."""

    def __init__(self, routes):
        self.routes = routes

    def __call__(self):
        return StubSession(self.routes)


def test_pickling_drops_socket_state():
    import pickle

    t = HttpSalesforceTransport(
        client_id="cid", client_secret="sec", refresh_token_value="ref",
        session_factory=StubFactory([("oauth2/token", TOKEN_OK)]),
    )
    t.refresh_token()
    _ = t.session
    clone = pickle.loads(pickle.dumps(t))
    assert clone._session is None and clone.access_token == "TOK"
    # the clone can lazily rebuild a session and re-auth
    assert clone.refresh_token() == "TOK"
