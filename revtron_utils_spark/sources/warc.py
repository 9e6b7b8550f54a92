"""WARC (Web ARChive, ISO 28500) record parsing — the ingest front end
of a CommonCrawl-style pipeline: each input row holds a WARC file's
contents; the parser explodes it into one row per record with the
standard headers (WARC-Type, WARC-Target-URI, Content-Length) and the
record payload, ready for `functions/html.py` extraction downstream.

Dependency-free column plumbing: records are split on the
``WARC/1.0\\r\\n`` version line and header/payload on the first blank
line, all with regexp built-ins (zero UDF, zero shuffle beyond the
explode). Documented caveat: a payload containing a literal version
line would be over-split — exact framing needs Content-Length-driven
sequential reads (warcio's job); this operator is the distributed
plumbing whose shape (schema, explode, header extraction) is what a
binary-aware reader would share.

No analog in the reference; LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HDR = r"(?s)^(.*?)\r\n\r\n"
_BODY = r"(?s)\r\n\r\n(.*)$"


def _header(headers, name: str):
    # anchored at line start so 'X-WARC-Type:' etc. can never match
    return F.regexp_extract(headers, rf"(?im)^{name}: ([^\r\n]+)", 1)


def parse_warc_records(
    df: DataFrame, warc_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Explode WARC file contents into records:
    ``(id_col, rec_idx, warc_type, target_uri, content_length,
    payload)``. Header names are matched case-insensitively;
    ``content_length`` is NULL when absent/malformed (try_cast);
    trailing record-boundary CRLFs are stripped from the payload."""
    recs = F.split(F.col(warc_col), r"WARC/1\.0\r\n")
    exploded = df.select(
        F.col(id_col), F.posexplode(recs).alias("rec_idx", "rec")
    ).filter(F.col("rec") != "")
    headers = F.regexp_extract(F.col("rec"), _HDR, 1)
    payload = F.regexp_replace(
        F.regexp_extract(F.col("rec"), _BODY, 1), r"(\r\n)+$", ""
    )
    # Content-Length must come from the WARC HEADER block, never the
    # payload — HTTP response payloads routinely carry their own
    # 'Content-Length:' header, which an unscoped search would return
    clen = _header(headers, "Content-Length")
    return exploded.select(
        id_col,
        "rec_idx",
        _header(headers, "WARC-Type").alias("warc_type"),
        _header(headers, "WARC-Target-URI").alias("target_uri"),
        F.when(clen.rlike(r"^[0-9]+$"), clen.cast("bigint"))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("content_length"),
        payload.alias("payload"),
    )
