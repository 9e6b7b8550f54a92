"""URL parsing, normalization, and domain filtering — the provenance
stage of a web-corpus pipeline (URL dedup keys, domain mixing caps,
blocklist filtering all consume these).

Everything is a chain of regexp/split/array built-ins (zero shuffle,
zero UDF), with every pattern in the Java-regex ∩ RE2 common subset so
the DuckDB oracle reproduces each field bit-for-bit. Normalization
implements the safe subset of RFC 3986 §6: scheme/host lowercasing,
default-port removal, fragment removal, tracking-parameter removal
(utm_*, fbclid, gclid), and query-parameter sorting (order rarely
carries meaning; sorting makes the URL a stable dedup key).

No analog in the reference (SQL/SOQL generator); LLM-pipeline
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port][/path][?query][#fragment]
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]*)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)="
# NB: bare `ref` is deliberately NOT treated as tracking — many sites
# use ?ref= semantically (branch/section selection), and dropping it
# would merge genuinely different resources into one dedup key

# common two-level public suffixes where the registered domain needs
# THREE labels (approximation of the public-suffix list; the full list
# would be a broadcast lookup table, same shape)
_CC_SLD = ("co.uk", "ac.uk", "gov.uk", "co.jp", "com.au", "com.br", "co.in", "com.cn")


def url_parse(col: Column | str) -> Column:
    """Struct(scheme, host, port, path, query, fragment); unparseable
    URLs yield a struct of empty strings (regexp_extract semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.regexp_extract(c, _URL_RE, 1).alias("scheme"),
        F.regexp_extract(c, _URL_RE, 2).alias("host"),
        F.regexp_extract(c, _URL_RE, 3).alias("port"),
        F.regexp_extract(c, _URL_RE, 4).alias("path"),
        F.regexp_extract(c, _URL_RE, 5).alias("query"),
        F.regexp_extract(c, _URL_RE, 6).alias("fragment"),
    )


def _clean_query(q: Column) -> Column:
    """Drop tracking params, sort the rest (stable dedup key)."""
    params = F.filter(
        F.split(q, r"&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def url_normalize(col: Column | str) -> Column:
    """Canonical URL: lowercased scheme+host, default port stripped
    (80 for http, 443 for https), tracking params dropped, remaining
    query params sorted, fragment removed, empty path → '/'. Returns
    NULL for strings that don't parse as absolute URLs."""
    u = url_parse(col)
    scheme = F.lower(u["scheme"])
    host = F.lower(u["host"])
    port = u["port"]
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    path = F.when(u["path"] == "", F.lit("/")).otherwise(u["path"])
    query = _clean_query(u["query"])
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(u["scheme"] == "", F.lit(None).cast("string")).otherwise(out)


def registered_domain(col: Column | str) -> Column:
    """Registered domain of the URL's host: last two labels, or last
    three when the two-label tail is a known ccSLD (co.uk, com.au, …).
    Lowercased; NULL when the URL doesn't parse."""
    u = url_parse(col)
    host = F.lower(u["host"])
    labels = F.split(host, r"\.")
    n = F.size(labels)
    two = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    three = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    is_ccsld = two.isin(*_CC_SLD)
    dom = F.when(is_ccsld & (n >= 3), three).otherwise(two)
    return F.when(u["scheme"] == "", F.lit(None).cast("string")).otherwise(dom)


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocklist: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocklist``
    (a one-column frame). Left-anti equi-join on the domain key — the
    blocklist is dimension-sized, so AQE broadcasts it; the corpus
    never shuffles."""
    return df.withColumn("_dom", registered_domain(url_col)).join(
        blocklist.select(F.col(domain_col).alias("_dom")), "_dom", "left_anti"
    ).drop("_dom")
