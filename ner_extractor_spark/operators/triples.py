"""Dependency-pattern (subj, pred, obj) triple extraction (SURVEY §7.1 M4).

Pattern semantics (config-table-driven, no hard-coded NLP):
  a triple is emitted for every ordered mention pair (m1, m2) in the same
  sentence with m1.end < m2.start, where the FIRST token strictly between
  them that appears in the predicate lexicon becomes `pred`; pairs with no
  predicate token between them (or gap > max_gap tokens) emit nothing.

This is deliberately a declarative composition:
  mentions self-join (same url, sent_id) + sentence-token slice scanned
  with a higher-order `filter` — zero Python in the hot path.  The
  predicate lexicon is a literal array (broadcast-sized dim, SURVEY J5).

At scale: the self-join key (url, sent_id) is the natural partition key;
mentions-per-sentence is tiny and bounded, so the join explodes by ~k^2
within a sentence only — no skew beyond sentence length, no global
shuffle beyond the one hash partition by (url, sent_id) that the
aggregation upstream already produced.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F

from .spans import span_decode_expr

DEFAULT_PREDICATES = ["met", "visited", "founded", "joined", "left"]


def extract_triples_local(
    tagged: DataFrame,
    predicates: Sequence[str] = DEFAULT_PREDICATES,
    max_gap: int = 8,
    tags_col: str = "pred_tags",
) -> DataFrame:
    """ZERO-SHUFFLE triple extraction, fused into the tagged rows.

    Triple extraction is sentence-local, so the scale-correct plan never
    joins: spans are decoded per row (span_decode_expr), ordered span
    pairs and the first predicate token between them are computed with
    array higher-order functions, and one explode emits the triples.
    The whole pages -> sentences -> tags -> mentions -> triples pipeline
    is map-only (no exchange at any width).  Output schema matches
    ``extract_triples``.
    """
    plist = list(predicates)

    def pair_struct(m1, m2):
        return F.struct(
            m1["start"].alias("subj_start"),
            m1["end"].alias("subj_end"),
            m1["label"].alias("subj_label"),
            m2["start"].alias("obj_start"),
            m2["end"].alias("obj_end"),
            m2["label"].alias("obj_label"),
        )

    def with_hits(p):
        between = F.slice(F.col("tokens"), p["subj_end"] + 2,
                          p["obj_start"] - p["subj_end"] - 1)
        hits = F.filter(between, lambda t: t.isin(plist))
        return F.struct(
            p["subj_start"].alias("subj_start"),
            p["subj_end"].alias("subj_end"),
            p["subj_label"].alias("subj_label"),
            p["obj_start"].alias("obj_start"),
            p["obj_end"].alias("obj_end"),
            p["obj_label"].alias("obj_label"),
            hits.alias("hits"),
        )

    def pairs_from(sp):
        # `sp` is a LAMBDA VARIABLE binding the decoded span array: it is
        # evaluated once per row.  Referencing span_decode_expr directly
        # in a nested transform would re-run the decode per outer element
        # (and CollapseProject would duplicate it across Projects) — a
        # measured 5x slowdown.  Index-filter the pair matrix BEFORE the
        # token-slice work so predicate search runs only on gap-valid
        # ordered pairs.
        pairs = F.flatten(F.transform(
            sp, lambda m1: F.transform(sp, lambda m2: pair_struct(m1, m2))))
        gap_ok = F.filter(
            pairs,
            lambda p: (p["subj_end"] < p["obj_start"])
            & ((p["obj_start"] - p["subj_end"]) <= max_gap)
            & (p["obj_start"] - p["subj_end"] > 1),
        )
        return F.filter(F.transform(gap_ok, with_hits),
                        lambda p: F.size(p["hits"]) > 0)

    valid = F.transform(F.array(span_decode_expr(tags_col)), pairs_from)[0]

    surface = lambda s, e: F.concat_ws(  # noqa: E731
        " ", F.slice(F.col("tokens"), s + 1, e - s + 1))

    return (
        tagged.select("url", "sent_id", "tokens",
                      F.explode(valid).alias("p"))
        .select(
            "url", "sent_id",
            F.col("p.subj_start").alias("subj_start"),
            surface(F.col("p.subj_start"), F.col("p.subj_end")).alias("subj_surface"),
            F.col("p.subj_label").alias("subj_label"),
            F.col("p.hits")[0].alias("pred"),
            F.col("p.obj_start").alias("obj_start"),
            surface(F.col("p.obj_start"), F.col("p.obj_end")).alias("obj_surface"),
            F.col("p.obj_label").alias("obj_label"),
        )
    )


def extract_triples(
    sentences: DataFrame,
    mentions: DataFrame,
    predicates: Sequence[str] = DEFAULT_PREDICATES,
    max_gap: int = 8,
) -> DataFrame:
    """(sentences, mentions) -> triples_raw.

    sentences: (url, sent_id, tokens, ...); mentions: MENTIONS schema.
    """
    m1 = mentions.alias("m1")
    m2 = mentions.alias("m2")
    pairs = m1.join(
        m2,
        on=[
            F.col("m1.url") == F.col("m2.url"),
            F.col("m1.sent_id") == F.col("m2.sent_id"),
            F.col("m1.end") < F.col("m2.start"),
            (F.col("m2.start") - F.col("m1.end")) <= max_gap,
        ],
    ).select(
        F.col("m1.url").alias("url"),
        F.col("m1.sent_id").alias("sent_id"),
        F.col("m1.start").alias("subj_start"),
        F.col("m1.end").alias("subj_end"),
        F.col("m1.surface").alias("subj_surface"),
        F.col("m1.label").alias("subj_label"),
        F.col("m2.start").alias("obj_start"),
        F.col("m2.surface").alias("obj_surface"),
        F.col("m2.label").alias("obj_label"),
    )

    plist = list(predicates)
    with_tokens = pairs.join(
        sentences.select("url", "sent_id", "tokens"), on=["url", "sent_id"]
    )
    # tokens strictly between the two mentions: 1-based slice
    gap = with_tokens.withColumn(
        "between",
        F.when(
            F.col("obj_start") - F.col("subj_end") <= 1, F.array().cast("array<string>")
        ).otherwise(
            F.slice(
                F.col("tokens"),
                F.col("subj_end") + 2,
                F.col("obj_start") - F.col("subj_end") - 1,
            )
        ),
    )
    preds = gap.withColumn(
        "pred_hits", F.filter(F.col("between"), lambda t: t.isin(plist))
    )
    return (
        preds.filter(F.size("pred_hits") > 0)
        .select(
            "url", "sent_id",
            "subj_start", "subj_surface", "subj_label",
            F.col("pred_hits")[0].alias("pred"),
            "obj_start", "obj_surface", "obj_label",
        )
    )
