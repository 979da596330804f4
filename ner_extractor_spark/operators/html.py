"""Real HTML -> text extraction (web-corpus ingestion; VERDICT r03 #1).

The reference freezes a per-document text serializer (CoNLL parse ->
``to_lines()``, DistilBERT-CRF/src/datasets.py:22-44); the web-page
analog every Common-Crawl-style corpus needs is a *markup-aware*
extractor, not a regex tag strip.  This module implements it in pure
stdlib Python (``html.parser.HTMLParser`` tokenizer — no external
deps), vectorized over Arrow batches as a pandas UDF so the per-row
work never leaves the batch loop:

  * ``<script> <style> <head> <template> <noscript> <iframe> <svg>``
    subtrees are DROPPED entirely (their character data is code/markup,
    not text — the classic boilerplate leak of regex strippers);
  * comments / doctypes / processing instructions are dropped;
  * character and entity references (``&amp;`` ``&#101;`` ``&#x65;``)
    are decoded to their characters (``convert_charrefs``);
  * block-level tags (p, div, br, li, h1-h6, tr, ...) open/close LINE
    boundaries; inline tags (b, a, span, ...) do not split text;
  * each assembled line is stripped of leading/trailing whitespace;
    whitespace-only lines vanish; lines join with ``\\n``.

Determinism contract: extraction is a pure function of the html bytes —
``extract_text(messy_html(text)) == canonical_lines(text)`` where
``canonical_lines`` trims each line and drops empties.  The
``html_extract_text`` contract query pins this end-to-end against a
DuckDB oracle over deterministically messy synthesized pages (entities,
scripts with markup-looking strings, comments with tag decoys, nested
blocks).

Scale shape: a flat map over pages — no shuffle, no state; the UDF cost
is linear in html bytes and the binary column is only scanned when this
path is asked for (column pruning keeps it out of every other query).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

#: subtrees whose character data is never text
SKIP_TAGS = frozenset(
    {"script", "style", "head", "template", "noscript", "iframe", "svg"})

#: tags that open/close a line boundary (HTML block-level + br/hr);
#: everything else (b, i, a, span, em, code, ...) is inline
BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "summary",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
})


class _TextExtractor(HTMLParser):
    """One-pass tokenizer: collects text chunks, ``None`` = boundary."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._parts: list[str | None] = []

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag in BLOCK_TAGS:
            self._parts.append(None)

    def handle_startendtag(self, tag, attrs):
        # self-closing form (<br/>): boundary, but never enters a skip
        # subtree (an empty skip subtree contains nothing to skip)
        if tag in BLOCK_TAGS:
            self._parts.append(None)

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            if self._skip:
                self._skip -= 1
        elif tag in BLOCK_TAGS:
            self._parts.append(None)

    def handle_data(self, data):
        if not self._skip and data:
            self._parts.append(data)

    def text(self) -> str:
        lines: list[str] = []
        cur: list[str] = []

        def flush():
            if cur:
                line = "".join(cur).strip()
                cur.clear()
                if line:
                    lines.append(line)

        for p in self._parts:
            if p is None:
                flush()
            else:
                cur.append(p)
        flush()
        return "\n".join(lines)


def extract_text(html: bytes | str | None) -> str | None:
    """Pure-Python extraction kernel (also the unit under property
    tests).  Bytes decode as UTF-8 with replacement — a real crawl has
    mislabeled encodings and a corrupt page must not kill the task."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


@pandas_udf(StringType())
def html_to_text(html: pd.Series) -> pd.Series:
    """Vectorized wrapper: one Arrow batch in, one out (no per-row
    Python round trips through the JVM — BASELINE.json input_hint)."""
    return html.map(extract_text)


class _MetaExtractor(HTMLParser):
    """Head metadata: <title> text, <meta name=description content>,
    <link rel=canonical href>.  First occurrence of each wins; charrefs
    in attribute values are decoded by the tokenizer itself."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._in_title = 0
        self.title: str | None = None
        self._title_buf: list[str] = []
        self.description: str | None = None
        self.canonical: str | None = None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "title":
            self._in_title += 1
        elif tag == "meta" and self.description is None \
                and a.get("name", "").lower() == "description":
            self.description = a.get("content")
        elif tag == "link" and self.canonical is None \
                and a.get("rel", "").lower() == "canonical":
            self.canonical = a.get("href")

    def handle_startendtag(self, tag, attrs):
        # void-element form: meta/link are the real cases; a
        # self-closing <title/> has no text and must not open capture
        if tag != "title":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title -= 1
            if self.title is None:
                self.title = "".join(self._title_buf).strip()

    def handle_data(self, data):
        if self._in_title:
            self._title_buf.append(data)


def extract_meta(html: bytes | str | None):
    """(title, meta_description, canonical) — pure kernel."""
    if html is None:
        return (None, None, None)
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _MetaExtractor()
    p.feed(html)
    p.close()
    if p.title is None and p._title_buf:    # unclosed <title> to EOF
        p.title = "".join(p._title_buf).strip()
    return (p.title, p.description, p.canonical)


# explicit StructType: a DDL string here would need an active
# SparkSession at module import time (pandas_udf parses DDL through
# the session), and this module must import session-free
_META_SCHEMA = StructType([
    StructField("title", StringType()),
    StructField("meta_description", StringType()),
    StructField("canonical", StringType()),
])


@pandas_udf(_META_SCHEMA)
def html_to_meta(html: pd.Series) -> pd.DataFrame:
    rows = [extract_meta(h) for h in html]
    return pd.DataFrame(rows,
                        columns=["title", "meta_description", "canonical"])


# ---------------------------------------------------------------------------
# Deterministic messy-page synthesis (test/oracle input builder)
# ---------------------------------------------------------------------------

def messy_html_expr(text_col, title_col):
    """JVM-side builder of a deterministically MESSY page around
    ``text_col``: head with style + a script whose string literal looks
    like markup, a comment with tag decoys, nested div/p structure, a
    noscript block, a trailing tracking script — and the text itself
    entity-escaped (``& < >`` plus every ``e`` as ``&#101;``) so
    extraction must actually decode character references to win back
    byte parity.

    Keep in lockstep with ``MESSY_EXPECTED_SQL``: the oracle does not
    parse HTML — it computes the extractor's expected OUTPUT from the
    clean source text (trim lines, drop empties, join with \\n), which
    is exactly what a correct parse of this wrapper recovers.
    """
    def esc_of(col):
        e = F.regexp_replace(col, "&", "&amp;")
        e = F.regexp_replace(e, "<", "&lt;")
        e = F.regexp_replace(e, ">", "&gt;")
        e = F.regexp_replace(e, '"', "&quot;")
        return F.regexp_replace(e, "e", "&#101;")

    esc = esc_of(text_col)
    # meta description = the first line, same escaping (exercises
    # charref decoding inside ATTRIBUTE values, not just text nodes)
    desc = esc_of(F.split(text_col, "\n").getItem(0))
    body = F.concat(F.lit("<p>"),
                    F.regexp_replace(esc, "\n", "</p>\n<P >"),
                    F.lit("</p>"))
    return F.encode(F.concat(
        F.lit('<!DOCTYPE html>\n<html>\n<head><title>'), title_col,
        F.lit('</title>\n<meta name="description" content="'), desc,
        F.lit('">\n<link rel="canonical" href="'), title_col,
        F.lit('/canonical">\n'
              '<style>p { color: #000; }</style>\n'
              '<script type="text/javascript">var decoy = '
              '"<p>not text</p>";</script>\n'
              '</head>\n<body class="m">\n'
              '<!-- begin <p>comment decoy</p> -->\n'
              '<div id="main">\n'),
        body,
        F.lit('\n</div>\n<noscript>&lt;enable js&gt;</noscript>\n'
              '<script>track("'), title_col,
        F.lit('");</script>\n</body>\n</html>\n')), "UTF-8")


def messy_html_py(text: str, title: str) -> bytes:
    """Python twin of ``messy_html_expr`` (fixtures + property tests);
    keep byte-for-byte in lockstep with the Spark expression."""
    def esc_of(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;")
                .replace("e", "&#101;"))

    esc = esc_of(text)
    desc = esc_of(text.split("\n")[0])
    body = "<p>" + esc.replace("\n", "</p>\n<P >") + "</p>"
    return (
        '<!DOCTYPE html>\n<html>\n<head><title>' + title +
        '</title>\n<meta name="description" content="' + desc +
        '">\n<link rel="canonical" href="' + title + '/canonical">\n'
        '<style>p { color: #000; }</style>\n'
        '<script type="text/javascript">var decoy = '
        '"<p>not text</p>";</script>\n'
        '</head>\n<body class="m">\n'
        '<!-- begin <p>comment decoy</p> -->\n'
        '<div id="main">\n' + body +
        '\n</div>\n<noscript>&lt;enable js&gt;</noscript>\n'
        '<script>track("' + title + '");</script>\n</body>\n</html>\n'
    ).encode("utf-8")


def canonical_lines(text: str) -> str:
    """The extractor's expected output on a messy-wrapped ``text``:
    per-line strip, drop empties, join with newline (Python twin of
    ``MESSY_EXPECTED_SQL``)."""
    return "\n".join(
        s for s in (ln.strip() for ln in text.split("\n")) if s)


#: expected extractor output per url, computed from the CLEAN text —
#: embed after a CTE named ``pages`` with (url, text) columns.  The
#: per-line trim strips the full ASCII whitespace set (space, \t, \v,
#: \f, \r) to match Python ``str.strip`` — DuckDB's bare trim() strips
#: spaces only and would diverge on tab-padded lines.
MESSY_EXPECTED_SQL = """
ln AS (
  SELECT url, i,
         trim(string_split(text, chr(10))[i],
              ' ' || chr(9) || chr(11) || chr(12) || chr(13)) AS line
  FROM pages,
       unnest(generate_series(1, len(string_split(text, chr(10))))) t(i)
),
expected AS (
  SELECT url, string_agg(line, chr(10) ORDER BY i) AS text
  FROM ln WHERE line != '' GROUP BY url
)"""
