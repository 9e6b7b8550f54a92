"""HTTP Salesforce transport: the live-wire implementation of the
``Transport`` protocol, reproducing the reference client's auth and
request semantics (``/root/reference/revtron/salesforce/main.py``):

* OAuth refresh-token grant with production→sandbox host fallback —
  ``login.salesforce.com`` then ``test.salesforce.com``
  (``refresh_token``, main.py:58-89), credentials from arguments or the
  environment.
* bearer-auth JSON requests that raise on non-2xx and map HTTP 204 to
  ``{}`` (``request``, main.py:29-56).
* cursor pagination via ``nextRecordsUrl`` until ``done``
  (main.py:157-163), with the ``Sforce-Query-Options: batchSize``
  header (main.py:152) and queryAll vs query routing for soft-deleted
  rows (main.py:114, 150).

The HTTP session is injected (anything with ``.post``/``.get``), so the
whole protocol is unit-testable offline; executors construct their own
session per task (the transport pickles its config, not its socket).
"""

from __future__ import annotations

import os
from typing import Any, Iterator

from .rest import DATA_QUERY_LIMIT, QuerySpec

PROD_HOST = "https://login.salesforce.com"
SANDBOX_HOST = "https://test.salesforce.com"
API_VERSION = "v57.0"


def _default_session():
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise ImportError("HttpSalesforceTransport needs `requests` (or an injected session)") from e
    return requests.Session()


class HttpSalesforceTransport:
    """Live REST transport. Credentials resolve argument-first with env
    fallback (``SF_CLIENT_ID``/``SF_CLIENT_SECRET``/``SF_REFRESH_TOKEN``),
    mirroring the reference's constructor convention."""

    def __init__(
        self,
        client_id: str | None = None,
        client_secret: str | None = None,
        refresh_token_value: str | None = None,
        instance_url: str | None = None,
        session_factory=None,
    ):
        self.client_id = client_id or os.environ.get("SF_CLIENT_ID")
        self.client_secret = client_secret or os.environ.get("SF_CLIENT_SECRET")
        self.refresh_token_value = refresh_token_value or os.environ.get("SF_REFRESH_TOKEN")
        self.instance_url = instance_url
        self.access_token: str | None = None
        self._session_factory = session_factory or _default_session
        self._session = None

    # -- session/auth -----------------------------------------------------

    def __getstate__(self):  # sessions hold sockets — never pickle them
        state = dict(self.__dict__)
        state["_session"] = None
        return state

    @property
    def session(self):
        if self._session is None:
            self._session = self._session_factory()
        return self._session

    def refresh_token(self) -> str:
        """OAuth refresh-token grant; tries the production login host,
        falls back to the sandbox host on failure (main.py:58-89)."""
        payload = {
            "grant_type": "refresh_token",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
            "refresh_token": self.refresh_token_value,
        }
        last_err: Exception | None = None
        for host in (PROD_HOST, SANDBOX_HOST):
            try:
                resp = self.session.post(f"{host}/services/oauth2/token", data=payload)
                if getattr(resp, "status_code", 500) == 200:
                    body = resp.json()
                    self.access_token = body["access_token"]
                    self.instance_url = body.get("instance_url", self.instance_url)
                    return self.access_token
                last_err = RuntimeError(f"{host}: HTTP {resp.status_code}")
            except Exception as e:  # connection error → try next host
                last_err = e
        raise RuntimeError(f"token refresh failed on both hosts: {last_err}")

    # -- request core (main.py:29-56) --------------------------------------

    def request(self, method: str, path: str, retry_auth: bool = True, **kwargs) -> dict:
        if self.access_token is None:
            self.refresh_token()
        url = path if path.startswith("http") else f"{self.instance_url}{path}"
        caller_headers = kwargs.pop("headers", {})
        headers = {"Authorization": f"Bearer {self.access_token}", **caller_headers}
        resp = self.session.request(method, url, headers=headers, **kwargs)
        if resp.status_code == 401 and retry_auth:
            self.refresh_token()
            # re-supply the caller headers: they were popped from kwargs
            # above, and losing them on retry would silently change
            # behavior (e.g. the Sforce-Query-Options page size)
            return self.request(
                method, path, retry_auth=False, headers=caller_headers, **kwargs
            )
        if resp.status_code == 204:  # e.g. successful PATCH
            return {}
        if not (200 <= resp.status_code < 300):
            raise RuntimeError(f"HTTP {resp.status_code} for {method} {url}: {resp.text[:200]}")
        return resp.json()

    def _base(self) -> str:
        return f"/services/data/{API_VERSION}"

    # -- Transport protocol -------------------------------------------------

    def list_sobjects(self) -> list[str]:
        body = self.request("GET", f"{self._base()}/sobjects/")
        return [s["name"] for s in body.get("sobjects", [])]

    def describe(self, sobject: str) -> list[dict]:
        body = self.request("GET", f"{self._base()}/sobjects/{sobject}/describe/")
        return body.get("fields", [])

    def limits(self) -> dict:
        return self.request("GET", f"{self._base()}/limits/")

    def _soql(self, spec: QuerySpec, id_phase: bool) -> str:
        from .salesforce import compile_soql

        if id_phase:
            id_spec = QuerySpec(**{**spec.__dict__, "columns": ["Id"], "id_batch": None})
            return compile_soql(id_spec)
        return compile_soql(spec)

    def _query_endpoint(self, spec: QuerySpec) -> str:
        # queryAll surfaces soft-deleted rows (main.py:114, 150)
        return "queryAll" if spec.include_deleted else "query"

    def query_ids(self, spec: QuerySpec, page_size: int) -> Iterator[list[str]]:
        q = self._soql(spec, id_phase=True)
        body = self.request(
            "GET",
            f"{self._base()}/{self._query_endpoint(spec)}",
            params={"q": q},
            headers={"Sforce-Query-Options": f"batchSize={page_size}"},
        )
        while True:
            yield [r["Id"] for r in body.get("records", [])]
            if body.get("done") or not body.get("nextRecordsUrl"):
                return
            body = self.request("GET", body["nextRecordsUrl"])

    def fetch_rows(self, spec: QuerySpec) -> list[dict]:
        q = self._soql(spec, id_phase=False)
        body = self.request(
            "GET", f"{self._base()}/{self._query_endpoint(spec)}", params={"q": q}
        )
        records = body.get("records", [])[:DATA_QUERY_LIMIT]
        return [{k: v for k, v in r.items() if k != "attributes"} for r in records]

    def aggregate(self, spec: QuerySpec, exprs: list[str]) -> dict:
        cols = ", ".join(exprs)
        base_spec = QuerySpec(**{**spec.__dict__, "columns": [cols], "id_batch": None})
        q = self._soql(base_spec, id_phase=False)
        body = self.request("GET", f"{self._base()}/{self._query_endpoint(spec)}", params={"q": q})
        rec = (body.get("records") or [{}])[0]
        out: dict[str, Any] = {}
        # Salesforce aliases aggregate results expr0, expr1, ...
        for i, e in enumerate(exprs):
            out[e] = rec.get(f"expr{i}", rec.get(e))
        return out

    def write_record(self, sobject: str, record: dict, record_id: str | None) -> dict:
        record = {k: v for k, v in record.items() if k not in ("attributes", "Id")}
        if record_id is None:
            body = self.request("POST", f"{self._base()}/sobjects/{sobject}/", json=record)
            return {"id": body.get("id"), "status": "inserted"}
        self.request("PATCH", f"{self._base()}/sobjects/{sobject}/{record_id}", json=record)
        return {"id": record_id, "status": "updated"}
