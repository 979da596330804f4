"""pages -> sentences extraction: byte-parity per url (the north-rule
per-row invariant), html path, lang pushdown."""

from pyspark.sql import functions as F

from ner_extractor_spark import synth
from ner_extractor_spark.operators.extract import extract_sentences
from ner_extractor_spark.schemas import PAGES


def _pages(spark, n=25):
    return spark.createDataFrame(synth.pages_rows(synth.gold_corpus(n)),
                                 schema=PAGES)


def _reconstruct(sents):
    return (sents.groupBy("url")
            .agg(F.array_sort(F.collect_list(F.struct("sent_id", "sent_text"))).alias("ss"))
            .select("url", F.concat_ws("\n", F.transform(
                "ss", lambda s: s.sent_text)).alias("text2")))


def test_text_byte_parity(spark):
    pages = _pages(spark)
    sents = extract_sentences(pages, lang=None)
    recon = _reconstruct(sents)
    joined = pages.filter(F.length("text") > 0).join(recon, "url")
    assert joined.filter(F.col("text") != F.col("text2")).count() == 0
    # every non-empty page is reconstructed
    assert joined.count() == pages.filter(F.length("text") > 0).count()


def test_html_extraction_byte_parity(spark):
    """The html->text UDF recovers the exact text bytes (per-url
    invariant exercised through the binary column)."""
    pages = _pages(spark)
    sents = extract_sentences(pages, lang=None, use_html=True)
    recon = _reconstruct(sents)
    joined = pages.filter(F.length("text") > 0).join(recon, "url")
    assert joined.filter(F.col("text") != F.col("text2")).count() == 0


def test_lang_filter(spark):
    pages = _pages(spark)
    n_en = extract_sentences(pages, lang="en").select("url").distinct().count()
    n_all = extract_sentences(pages, lang=None).select("url").distinct().count()
    n_de = pages.filter("lang = 'de' and length(text) > 0").count()
    assert n_en + n_de == n_all


def test_empty_doc_produces_no_sentences(spark):
    pages = _pages(spark)
    sents = extract_sentences(pages, lang=None)
    assert sents.filter(F.col("url").endswith("/empty")).count() == 0


def test_tokens_roundtrip_surface(spark):
    """' '.join(split(text)) == text for every sentence (F9 inverse)."""
    sents = extract_sentences(_pages(spark), lang=None)
    bad = sents.filter(
        F.concat_ws(" ", F.col("tokens")) != F.col("sent_text")).count()
    assert bad == 0
