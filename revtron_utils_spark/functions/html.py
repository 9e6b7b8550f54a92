"""HTML → text extraction: dependency-free tag stripping + boilerplate
heuristics, the first stage of every CommonCrawl-style training-data
pipeline (cf. trafilatura/jusText; this is the regex-and-density
subset those tools ship as their fallback path).

Pipeline per document:

1. drop non-content ELEMENTS wholesale (script/style/noscript/template/
   svg/head and the structural boilerplate nav/header/footer/aside/
   form) plus HTML comments;
2. segment what remains into blocks on block-level tags (p, div,
   h1-h6, li, table cells, section, br, ...);
3. per block: strip inline tags, decode the common entities, collapse
   whitespace;
4. keep a block only if it has at least ``min_words`` words AND its
   link density is low (``2 × anchor_count ≤ word_count`` — integer
   arithmetic, the jusText-style nav-bar filter);
5. join the surviving blocks.

Everything is a deterministic chain of regexp/replace/split built-ins —
no shuffle, no UDF on the default path — and every pattern is written
in the common subset of Java regex (Spark), RE2 (DuckDB), and Python
``re`` with ``re.ASCII``, so the DuckDB oracle reproduces the
extraction bit-for-bit and the Arrow twin (`main_text_arrow`) is
bit-identical to the expression path.

No analog in the reference (SQL/SOQL generator only); LLM-pipeline
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# elements whose CONTENT is boilerplate — removed wholesale. Non-greedy
# body match; nested same-tag elements are out of scope for the regex
# fallback (real extractors parse; this is the documented heuristic).
DROP_ELEMENTS = (
    "script",
    "style",
    "noscript",
    "template",
    "svg",
    "head",
    "nav",
    "header",
    "footer",
    "aside",
    "form",
)

# block-level boundaries for segmentation (opening or closing tag)
BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody"
    r"|section|article|main|blockquote|pre|figure|br|hr)(?:\s[^>]*)?/?>"
)

# single-pass entity decode, && last so "&amp;lt;" yields "&lt;" (the
# standard non-recursive approximation)
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def drop_boilerplate_elements(col: Column | str) -> Column:
    """Remove comments and the DROP_ELEMENTS subtrees (regex heuristic:
    non-greedy to the matching close tag)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    for tag in DROP_ELEMENTS:
        c = F.regexp_replace(c, rf"(?is)<{tag}(?:\s[^>]*)?>.*?</{tag}\s*>", " ")
    return c


def _decode_entities(c: Column) -> Column:
    for ent, rep in ENTITIES:
        # regexp-free literal replace: stays codegen and avoids regex
        # metacharacter escaping entirely
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _block_text(b: Column) -> Column:
    t = F.regexp_replace(b, r"(?s)<[^>]*>", " ")
    t = _decode_entities(t)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def main_text(
    col: Column | str, min_words: int = 3, impl: str = "expr"
) -> Column:
    """Extracted main text of an HTML document (see module docstring).

    ``impl='expr'`` is the built-in expression chain (regexp codegen +
    one interpreted higher-order pass over the block array — still zero
    shuffle and zero Python); ``impl='arrow'`` is the vectorized Pandas
    UDF twin (`main_text_arrow`) with bit-identical output, for corpora
    where the per-block HOF interpretation dominates."""
    if impl == "arrow":
        c = F.col(col) if isinstance(col, str) else col
        return main_text_arrow(min_words)(c)
    cleaned = drop_boilerplate_elements(col)
    blocks = F.split(cleaned, BLOCK_SPLIT)
    # (text, anchors) per block: anchors counted BEFORE tag stripping
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("t"),
            (F.size(F.split(b, r"(?i)<a[\s>]")) - 1).alias("a"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.size(F.split(s["t"], r" ")) >= min_words)
        & (s["t"] != "")
        & (2 * s["a"] <= F.size(F.split(s["t"], r" "))),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), " ")


def main_text_arrow(min_words: int = 3):
    """Arrow-vectorized twin of :func:`main_text`: same regexes compiled
    with ``re.ASCII`` (so ``\\s``/``\\w`` match the ASCII-only Java/RE2
    semantics of the expression path), same block scoring, bit-identical
    output."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    comment = re.compile(r"<!--.*?-->", re.S | re.A)
    drops = [
        re.compile(rf"<{t}(?:\s[^>]*)?>.*?</{t}\s*>", re.I | re.S | re.A)
        for t in DROP_ELEMENTS
    ]
    block_split = re.compile(BLOCK_SPLIT.replace("(?i)", ""), re.I | re.A)
    inline = re.compile(r"<[^>]*>", re.S | re.A)
    ws = re.compile(r"\s+", re.A)
    anchor = re.compile(r"<a[\s>]", re.I | re.A)

    def extract(htmls):
        out = []
        for h in htmls:
            if h is None:
                out.append(None)
                continue
            c = comment.sub(" ", h)
            for d in drops:
                c = d.sub(" ", c)
            keep = []
            for b in block_split.split(c):
                t = inline.sub(" ", b)
                for ent, rep in ENTITIES:
                    t = t.replace(ent, rep)
                # strip SPACES only: str.strip() would also strip
                # Unicode whitespace (NBSP, …) that Java/RE2 \s+ and
                # trim() leave alone, breaking expr/arrow bit-equality
                t = ws.sub(" ", t).strip(" ")
                if not t:
                    continue
                words = t.count(" ") + 1
                if words >= min_words and 2 * len(anchor.findall(b)) <= words:
                    keep.append(t)
            out.append(" ".join(keep))
        return pd.Series(out)

    return pandas_udf(extract, "string")


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    min_words: int = 3,
    impl: str = "expr",
) -> DataFrame:
    """Append ``out_col`` with the extracted main text (narrow
    projection — embarrassingly parallel, no shuffle, filters and
    column pruning pass straight through)."""
    return df.withColumn(out_col, main_text(html_col, min_words, impl))
