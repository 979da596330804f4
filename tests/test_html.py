"""Real HTML extraction: skip-subtree removal, entity decoding, block
boundaries, messy-wrapper round trip (VERDICT r03 #1).

The kernel tests are pure Python (no Spark) — the extractor is a pure
function; Spark tests pin the Arrow UDF path and the lockstep between
``messy_html_expr`` (JVM builder) and ``messy_html_py``.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ner_extractor_spark.operators.html import (canonical_lines,
                                                extract_text,
                                                html_to_text,
                                                messy_html_expr,
                                                messy_html_py)


# -- kernel (no spark) ------------------------------------------------------

def test_script_style_head_never_leak():
    h = ('<html><head><title>T</title><style>p{color:red}</style>'
         '<script>var a = "<p>decoy</p>";</script></head>'
         '<body><p>real</p><noscript>njs</noscript>'
         '<script>track()</script></body></html>')
    assert extract_text(h) == "real"


def test_entities_decoded():
    assert extract_text('<p>a &amp; b &lt;c&gt; &#101;&#x65;</p>') == \
        "a & b <c> ee"


def test_block_vs_inline_boundaries():
    h = '<div>a<b>b</b> <i>c</i><br>d</div><p>e</p><p></p>'
    assert extract_text(h) == "ab c\nd\ne"


def test_comment_with_tag_decoys_dropped():
    assert extract_text('<p>x</p><!-- <p>no</p> --><p>y</p>') == "x\ny"


def test_nested_and_unclosed_skip_subtrees():
    assert extract_text('<div>a<svg><text>no</text></svg>b</div>') == "ab"
    # script unclosed to EOF swallows the rest (CDATA semantics)
    assert extract_text('<p>keep</p><script>var x="<p>no</p>";') == "keep"


def test_uppercase_tags_and_whitespace_nodes():
    assert extract_text('<P >a</P><DIV>b</DIV>') == "a\nb"
    assert extract_text('<p>foo<b> </b>bar</p>') == "foo bar"


def test_indented_markup_strips_line_ends_only():
    h = '<div>\n  foo  bar \n</div>'
    assert extract_text(h) == "foo  bar"


def test_bytes_decode_with_replacement_and_null():
    assert extract_text(b'<p>ok\xff</p>') == 'ok�'
    assert extract_text(None) is None


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7e),
    max_size=40), max_size=6))
def test_messy_roundtrip_property(lines):
    """extract(messy(text)) == canonical_lines(text) for arbitrary
    printable-ASCII multi-line text — incl. & < > " ' and e chars."""
    text = "\n".join(lines)
    got = extract_text(messy_html_py(text, "t-1"))
    assert got == canonical_lines(text), (text, got)


# -- spark path -------------------------------------------------------------

def test_spark_expr_matches_python_twin(spark):
    rows = [("u1", "hello & <world>\nsecond e line"),
            ("u2", "  padded  \n\nafter blank"),
            ("u3", "")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = df.select(
        "url",
        messy_html_expr(F.col("text"), F.col("url")).alias("html"))
    got = {r["url"]: bytes(r["html"]) for r in out.collect()}
    for url, text in rows:
        assert got[url] == messy_html_py(text, url), url


def test_spark_udf_roundtrip(spark):
    rows = [("u%d" % i, t) for i, t in enumerate(
        ["a & b\ne<'s>", "one\n\n  two  ", "", "x " * 30])]
    df = spark.createDataFrame(rows, "url string, text string")
    out = (df.select("url", messy_html_expr(F.col("text"),
                                            F.col("url")).alias("html"))
           .select("url", html_to_text(F.col("html")).alias("got")))
    got = {r["url"]: r["got"] for r in out.collect()}
    for url, text in rows:
        assert got[url] == canonical_lines(text), (url, text, got[url])


def test_extract_sentences_html_path_on_messy_pages(spark):
    """End-to-end: pages whose ONLY text carrier is messy html produce
    the same sentences as the clean-text path (per-url invariant
    through real markup)."""
    from ner_extractor_spark import synth
    from ner_extractor_spark.operators.extract import extract_sentences
    from ner_extractor_spark.schemas import PAGES
    docs = synth.gold_corpus(20)
    rows = [(d.url, d.warc_ts, messy_html_py(d.text(), d.url), d.text(),
             d.lang) for d in docs]
    pages = spark.createDataFrame(rows, schema=PAGES)
    via_html = extract_sentences(pages, lang=None, use_html=True)
    via_text = extract_sentences(pages, lang=None)
    a = sorted(map(tuple, via_html.select(
        "url", "sent_id", "sent_text").collect()))
    b = sorted(map(tuple, via_text.select(
        "url", "sent_id", "sent_text").collect()))
    assert a == b and len(a) > 0


# -- head metadata ----------------------------------------------------------

def test_meta_kernel_cases():
    from ner_extractor_spark.operators.html import extract_meta
    assert extract_meta(
        '<head><title> A &amp; B </title></head>') == ('A & B', None, None)
    assert extract_meta('<head><title>partial') == ('partial', None, None)
    assert extract_meta('<meta name="DESCRIPTION" content="x">')[1] == 'x'
    assert extract_meta(
        '<link rel="canonical" href="https://c/1">')[2] == "https://c/1"
    # first occurrence wins
    t, d, c = extract_meta('<title>one</title><title>two</title>'
                           '<meta name="description" content="a">'
                           '<meta name="description" content="b">')
    assert (t, d) == ("one", "a")
    assert extract_meta(None) == (None, None, None)
    # charrefs decoded inside attribute values
    assert extract_meta(
        '<meta name="description" content="x &amp; &#121;">')[1] == "x & y"


def test_meta_roundtrip_on_messy_wrapper(spark):
    from ner_extractor_spark.operators.html import (html_to_meta,
                                                    messy_html_expr)
    rows = [("u1", 'first "quoted" & line\nsecond'), ("u2", "")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = (df.select("url", messy_html_expr(
               F.col("text"), F.col("url")).alias("html"))
           .select("url", html_to_meta(F.col("html")).alias("m"))
           .select("url", "m.*"))
    got = {r["url"]: (r["title"], r["meta_description"], r["canonical"])
           for r in out.collect()}
    assert got["u1"] == ("u1", 'first "quoted" & line', "u1/canonical")
    assert got["u2"] == ("u2", "", "u2/canonical")
