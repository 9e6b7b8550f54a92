"""URL normalization/domain extraction and WARC record parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from revtron_utils_spark.functions import url as U
from revtron_utils_spark.sources.warc import parse_warc_records

URL_CASES = [
    # scheme/host lowercased, default port stripped, tracking dropped,
    # params sorted, fragment removed
    (
        "HTTPS://WWW.Example.COM:443/Path/x?utm_source=a&b=2&a=1#frag",
        "https://www.example.com/Path/x?a=1&b=2",
        "example.com",
    ),
    # nonstandard port survives; empty path becomes /
    ("http://cdn.example.org:8080", "http://cdn.example.org:8080/", "example.org"),
    # http default port stripped
    ("http://a.b.example.net:80/x", "http://a.b.example.net/x", "example.net"),
    # ccSLD keeps three labels
    ("https://news.bbc.co.uk/story", "https://news.bbc.co.uk/story", "bbc.co.uk"),
    # bare two-label ccSLD host
    ("https://bbc.co.uk/", "https://bbc.co.uk/", "bbc.co.uk"),
    # query of only tracking params vanishes
    ("https://x.com/p?utm_medium=email&fbclid=123", "https://x.com/p", "x.com"),
    # single-label host (intranet)
    ("http://localhost/admin", "http://localhost/admin", "localhost"),
    # unparseable -> NULL
    ("not a url at all", None, None),
    ("", None, None),
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(URL_CASES)], "id long, url string"
    )


def test_url_normalize_cases(urls):
    got = {
        r["id"]: (r["n"], r["d"])
        for r in urls.select(
            "id",
            U.url_normalize("url").alias("n"),
            U.registered_domain("url").alias("d"),
        ).collect()
    }
    for i, (_, want_n, want_d) in enumerate(URL_CASES):
        assert got[i] == (want_n, want_d), f"case {i}: {got[i]}"


def test_filter_blocked_domains(spark, urls):
    block = spark.createDataFrame([("example.com",), ("bbc.co.uk",)], "domain string")
    kept = U.filter_blocked_domains(urls, "url", block)
    ids = {r["id"] for r in kept.collect()}
    assert 0 not in ids and 3 not in ids and 4 not in ids
    assert 1 in ids and 2 in ids
    # NULL domains (unparseable) are kept — anti-join never matches NULL
    assert 7 in ids and 8 in ids


def test_url_ops_plan_is_shuffle_free(urls):
    plan = (
        urls.select(U.url_normalize("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


CRLF = "\r\n"


def _warc(records):
    out = []
    for headers, payload in records:
        hdr = CRLF.join(["WARC/1.0"] + headers)
        out.append(f"{hdr}{CRLF}{CRLF}{payload}{CRLF}{CRLF}")
    return "".join(out)


def test_parse_warc_records(spark):
    doc = _warc(
        [
            (
                ["WARC-Type: request", "WARC-Target-URI: http://e.com/1",
                 "Content-Length: 0"],
                "",
            ),
            (
                ["WARC-Type: response", "WARC-Target-URI: http://e.com/1",
                 "Content-Length: 11"],
                "hello world",
            ),
            (
                # header names case-insensitive; missing Content-Length
                ["warc-type: metadata", "warc-target-uri: http://e.com/2"],
                "k: v",
            ),
        ]
    )
    df = spark.createDataFrame([(7, doc)], "doc_id long, warc string")
    rows = parse_warc_records(df).orderBy("rec_idx").collect()
    assert [r["warc_type"] for r in rows] == ["request", "response", "metadata"]
    assert rows[1]["payload"] == "hello world"
    assert rows[1]["content_length"] == 11
    assert rows[0]["payload"] == ""
    assert rows[2]["content_length"] is None
    assert rows[2]["target_uri"] == "http://e.com/2"


def test_parse_warc_multiline_payload(spark):
    body = f"line one{CRLF}line two{CRLF}{CRLF}line four"
    doc = _warc([(["WARC-Type: response", "Content-Length: 1"], body)])
    df = spark.createDataFrame([(1, doc)], "doc_id long, warc string")
    rows = parse_warc_records(df).collect()
    assert rows[0]["payload"] == body


def test_warc_content_length_ignores_payload_http_headers(spark):
    # HTTP response payloads carry their own Content-Length; the WARC
    # field must come from the WARC header block only (NULL if absent)
    doc = _warc(
        [
            (
                ["WARC-Type: response", "WARC-Target-URI: http://e.com/3"],
                f"HTTP/1.1 200 OK{CRLF}Content-Length: 999{CRLF}{CRLF}<p>x</p>",
            ),
            (
                # prefixed header names must not match the anchored regex
                ["WARC-Type: response", "X-WARC-Type: bogus",
                 "X-Content-Length: 5", "Content-Length: 7"],
                "payload",
            ),
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, warc string")
    rows = parse_warc_records(df).orderBy("rec_idx").collect()
    assert rows[0]["content_length"] is None
    assert rows[1]["content_length"] == 7
    assert rows[1]["warc_type"] == "response"
