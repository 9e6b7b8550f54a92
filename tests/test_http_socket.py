"""HttpSalesforceTransport over a REAL socket: a stdlib http.server
fixture serves the scripted Salesforce responses, so the OAuth
refresh-token grant, prod→sandbox host fallback, 401 re-auth retry,
cursor pagination (with the Sforce-Query-Options page-size header), and
the 204→{} mapping are all exercised through `requests` and a live TCP
connection — no mocked session objects anywhere (reference behavior:
revtron/salesforce/main.py:29-89)."""

from __future__ import annotations

import json
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from revtron_utils_spark.sources import http_transport as HT
from revtron_utils_spark.sources.http_transport import HttpSalesforceTransport
from revtron_utils_spark.sources.rest import QuerySpec


class _State:
    def __init__(self):
        self.token_serial = 0
        self.valid_token: str | None = None
        self.log: list[tuple[str, str, int]] = []  # (method, path, status)
        self.seen_query_options: list[str] = []


def _handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _json(self, code: int, body: dict | None):
            payload = b"" if body is None else json.dumps(body).encode()
            # log BEFORE responding: the handler runs in a server worker
            # thread, so a log-after-write races the client's next
            # assertion (observed as a missing 204 under full-suite load)
            state.log.append((self.command, self.path.split("?")[0], code))
            self.send_response(code)
            if payload:
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
            else:
                self.send_header("Content-Length", "0")
            self.end_headers()
            self.wfile.write(payload)

        def _authed(self) -> bool:
            return (
                self.headers.get("Authorization")
                == f"Bearer {state.valid_token}"
            )

        def do_POST(self):
            if self.path == "/services/oauth2/token":
                state.token_serial += 1
                state.valid_token = f"tok{state.token_serial}"
                base = f"http://{self.server.server_address[0]}:{self.server.server_address[1]}"
                self._json(
                    200,
                    {"access_token": state.valid_token, "instance_url": base},
                )
                return
            self._json(404, {"error": "not found"})

        def do_GET(self):
            if not self._authed():
                self._json(401, {"error": "INVALID_SESSION_ID"})
                return
            if self.path.startswith("/services/data/v57.0/query"):
                if "next-2000" in self.path:
                    self._json(200, {"records": [{"Id": "c"}], "done": True})
                    return
                opts = self.headers.get("Sforce-Query-Options")
                if opts:
                    state.seen_query_options.append(opts)
                self._json(
                    200,
                    {
                        "records": [{"Id": "a"}, {"Id": "b"}],
                        "done": False,
                        "nextRecordsUrl": "/services/data/v57.0/query/next-2000",
                    },
                )
                return
            self._json(404, {"error": "not found"})

        def do_PATCH(self):
            if not self._authed():
                self._json(401, {"error": "INVALID_SESSION_ID"})
                return
            if self.path.startswith("/services/data/v57.0/sobjects/"):
                self._json(204, None)
                return
            self._json(404, {"error": "not found"})

    return Handler


@pytest.fixture()
def live_server():
    state = _State()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base, state
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.fixture()
def closed_port() -> int:
    # a port that refuses connections = the "production login host
    # unreachable" case for host fallback. Port 1 (tcpmux, privileged)
    # is never bound in this container — a bind-then-close ephemeral
    # port was flaky here because the full test suite's many Spark/py4j
    # sockets can recycle the freed port between fixture and request.
    s = socket.socket()
    s.settimeout(1)
    try:
        s.connect(("127.0.0.1", 1))
        pytest.skip("something is listening on port 1 in this environment")
    except (ConnectionRefusedError, OSError):
        pass
    finally:
        s.close()
    return 1


def test_socket_auth_fallback_pagination_reauth(live_server, closed_port, monkeypatch):
    base, state = live_server
    monkeypatch.setattr(HT, "PROD_HOST", f"http://127.0.0.1:{closed_port}")
    monkeypatch.setattr(HT, "SANDBOX_HOST", base)

    t = HttpSalesforceTransport(
        client_id="cid", client_secret="sec", refresh_token_value="rt"
    )

    # prod host refuses the TCP connection → sandbox host issues the token
    tok = t.refresh_token()
    assert tok == "tok1" and t.instance_url == base

    # cursor pagination over the wire, with the page-size header
    spec = QuerySpec(sobject="Account", columns=["Id", "Name"])
    pages = list(t.query_ids(spec, page_size=200))
    assert pages == [["a", "b"], ["c"]]
    assert state.seen_query_options == ["batchSize=200"]

    # server-side token expiry → 401 → transport re-auths once and
    # retries; the successful PATCH returns 204, mapped to {}
    state.valid_token = "expired"
    out = t.write_record("Account", {"Name": "n", "Id": "001"}, record_id="001")
    assert out == {"id": "001", "status": "updated"}
    assert t.access_token == "tok2"
    patch_codes = [c for (m, p, c) in state.log if m == "PATCH"]
    assert patch_codes == [401, 204]


def test_socket_refresh_fails_on_both_hosts(closed_port, monkeypatch):
    monkeypatch.setattr(HT, "PROD_HOST", f"http://127.0.0.1:{closed_port}")
    monkeypatch.setattr(HT, "SANDBOX_HOST", f"http://127.0.0.1:{closed_port}")
    t = HttpSalesforceTransport(
        client_id="cid", client_secret="sec", refresh_token_value="rt"
    )
    with pytest.raises(RuntimeError, match="both hosts"):
        t.refresh_token()
