"""End-to-end oracle tests (SURVEY §5.2 T-oracle/e2e, T-determinism,
T-resume): the north-rule gates."""

import pytest
from pyspark.sql import functions as F

from ner_extractor_spark import synth
from ner_extractor_spark.operators.extract import extract_sentences
from ner_extractor_spark.operators.metrics import span_prf
from ner_extractor_spark.operators.ner import tag_sentences
from ner_extractor_spark.operators.spans import extract_mentions
from ner_extractor_spark.plans.kg_pipeline import run_kg_pipeline
from ner_extractor_spark.schemas import ALIASES, PAGES

N_DOCS = 120
GOLD_MEN = "url string, sent_id int, start int, end int, surface string, label string"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth.gold_corpus(N_DOCS)
    pages = spark.createDataFrame(synth.pages_rows(docs), schema=PAGES)
    gold = spark.createDataFrame(synth.gold_mention_rows(docs), GOLD_MEN)
    aliases = spark.createDataFrame(synth.alias_rows(), schema=ALIASES)
    return docs, pages, gold, aliases


def test_pr_gate(spark, corpus):
    """North rule: emitted mentions match gold spans+labels at P/R>=0.95."""
    _, pages, gold, _ = corpus
    sents = extract_sentences(pages, lang=None)
    pred = extract_mentions(tag_sentences(sents, synth.tagger_dictionary()))
    m = span_prf(pred, gold)
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m
    # the gate is real: noise keeps it strictly below perfect
    assert m["precision"] < 1.0 or m["recall"] < 1.0, m


def test_partitioning_invariance(spark, corpus):
    """Output invariant under radically different partitioning (the
    N-vs-4N determinism prerequisite, SURVEY W6/F16)."""
    _, pages, _, _ = corpus
    sents = extract_sentences(pages, lang=None)
    m1 = extract_mentions(tag_sentences(sents, synth.tagger_dictionary()))
    m64 = extract_mentions(tag_sentences(
        sents.repartition(64), synth.tagger_dictionary()))
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m64.collect()))


def test_resume_skips_and_is_identical(spark, corpus, tmp_path):
    _, pages, _, aliases = corpus
    wd = str(tmp_path / "kg")
    r1 = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                         wd, lang=None)
    t1 = sorted(map(tuple, r1.triples.collect()))
    # second run must reuse every stage (manifest hit) and be identical
    r2 = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                         wd, lang=None)
    t2 = sorted(map(tuple, r2.triples.collect()))
    assert t1 == t2 and len(t1) > 0

    from ner_extractor_spark.plans.checkpoints import StageManifest
    man = StageManifest(wd)
    for stage in ["sentences", "tagged", "mentions", "triples_raw",
                  "linked", "components", "triples"]:
        assert man.done(stage), stage


def test_linking_canonicalizes_ambiguous_alias(spark, corpus, tmp_path):
    """'globex' maps to two entity ids; canonicalization must merge them
    into one component so triples always use the canonical id."""
    _, pages, _, aliases = corpus
    wd = str(tmp_path / "kg2")
    res = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                          wd, lang=None)
    comp = {r["node"]: r["comp"] for r in res.components.collect()}
    # both globex ids exist in the alias dict; they must share a component
    gx = [r["entity_id"] for r in aliases.filter(
        F.col("alias_norm") == "globex").collect()]
    assert len(gx) == 2
    assert comp[gx[0]] == comp[gx[1]]
    # no triple may reference a non-canonical id
    used = {r["subj"] for r in res.triples.collect()} | \
           {r["obj"] for r in res.triples.collect()}
    canonical = set(comp.values())
    assert used <= canonical | {u for u in used if u.startswith("S-")}


def test_lineage_written_per_stage(spark, corpus, tmp_path):
    _, pages, _, aliases = corpus
    wd = str(tmp_path / "kg3")
    run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                    wd, lang=None)
    from ner_extractor_spark.plans.checkpoints import read_lineage
    lin = read_lineage(spark, wd)
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"sentences", "mentions", "triples"} <= stages
    # row counts in lineage match the tables
    got = {r["stage"]: r["n"] for r in
           lin.groupBy("stage").agg(F.sum("row_count").alias("n")).collect()}
    sents = extract_sentences(pages, lang=None).count()
    assert got["sentences"] == sents


def test_coherent_linker_parity_when_silent(spark, corpus, tmp_path):
    """linker='coherent' with an EMPTY relatedness table scores every
    candidate 0, so its fallback (prior desc, entity_id asc) must
    reproduce the exact-linker triples verbatim; with a relatedness
    table favouring the low-prior globex sense, links flip exactly
    where context fires."""
    _, pages, _, aliases = corpus
    empty_rel = spark.createDataFrame([], "qa string, qb string, w double")
    re = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                         str(tmp_path / "ex"))
    rc = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                         str(tmp_path / "co"), linker="coherent",
                         relatedness=empty_rel)
    a = sorted(map(tuple, re.triples.collect()))
    b = sorted(map(tuple, rc.triples.collect()))
    assert a == b and len(a) > 0

    with pytest.raises(ValueError):
        run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                        str(tmp_path / "bad"), linker="fuzzy")


def test_embed_linker_ranks_residuals_by_cosine(spark, corpus, tmp_path):
    """linker='embed' swaps the residual LSH min(entity_id) rule for
    cosine-ranked top-1: on the clean corpus both modes must produce
    identically many triples and agree on every exactly-linked fact;
    residual surfaces may only move BETWEEN candidate entities (or to
    their S- surface id), never vanish (the totality invariant)."""
    _, pages, _, aliases = corpus
    re_ = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                          str(tmp_path / "ex2"))
    rb = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                         str(tmp_path / "em"), linker="embed")
    a = re_.triples.select("url", "sent_id", "pred").collect()
    b = rb.triples.select("url", "sent_id", "pred").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0
    # facts whose endpoints are canonical Q- entities in BOTH modes
    # (i.e. exact-linked) are identical
    qa = {tuple(r) for r in re_.triples.filter(
        "subj LIKE 'Q-%' AND obj LIKE 'Q-%'")
        .select("subj", "pred", "obj", "url", "sent_id").collect()}
    qb = {tuple(r) for r in rb.triples.filter(
        "subj LIKE 'Q-%' AND obj LIKE 'Q-%'")
        .select("subj", "pred", "obj", "url", "sent_id").collect()}
    assert qa == qb
