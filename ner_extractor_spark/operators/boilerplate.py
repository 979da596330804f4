"""Line-level boilerplate removal (CCNet / RefinedWeb-style web cleaning).

A web corpus repeats navigation chrome, cookie banners, and footers on
millions of pages.  The standard fix (used by CCNet's line-dedup stage
and RefinedWeb's "repeated-line" filter) is corpus-level: hash every
LINE, count how many distinct documents each line occurs in, and strip
lines whose document frequency crosses a threshold — content lines are
(nearly) unique to their page, boilerplate is not.

This complements the document-level families in ``dedup.py``: those
drop whole near-duplicate pages; this cleans the surviving pages
line-by-line before tokenization / NER (reference extracts text per
document — ``DistilBERT-CRF/src/preprocessing.py`` style cleaning —
but has no corpus-level stage because it never sees the corpus at
once; on Spark the corpus view is one groupBy away).

Scale posture (100 TB):
  * the exploded relation is one row PER LINE (short strings), never
    whole documents — shuffle volume is bounded by corpus text size;
  * document frequency is a partial-aggregated groupBy on the line
    itself (map-side combine collapses the hot boilerplate lines to
    one row per partition before the shuffle, so the very skew that
    makes a line boilerplate also caps its shuffle cost);
  * the boilerplate set (lines with df >= min_df) is tiny relative to
    the corpus — it rides the anti-join build side, and can be
    broadcast when it fits (``broadcast_threshold`` rows);
  * reassembly sorts each document's surviving lines by position
    inside one groupBy — per-document state, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_document_frequency(docs: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text",
                            min_len: int = 1) -> DataFrame:
    """Per-line corpus document frequency: (line, line_df).

    Lines shorter than ``min_len`` characters are excluded (an empty
    line is structure, not boilerplate).
    """
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"))
    return (lines
            .filter(F.length("line") >= min_len)
            .groupBy("line")
            .agg(F.countDistinct(id_col).alias("line_df")))


def strip_boilerplate_lines(docs: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text", min_df: int = 2,
                            min_len: int = 1) -> DataFrame:
    """Remove every line that occurs in >= ``min_df`` distinct documents.

    Returns one row per input document (fully-stripped documents
    survive with an empty ``clean_text``):

      (id_col, n_lines, n_kept, clean_text)

    Deterministic: surviving lines are reassembled in their original
    order; no randomness, no partitioning sensitivity.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    # df computed from the SAME exploded relation (not a second
    # scan+split via line_document_frequency) — one explode feeds both
    # the boilerplate set and the reassembly.  Deliberately NOT
    # localCheckpoint-ed (contrast skew.key_skew_profile): `lines` is
    # the corpus exploded — bigger than the input — and its lineage is
    # map-only (scan -> split -> posexplode), so recomputing the two
    # consumers' branches is cheaper at scale than materializing it
    boiler = (lines
              .filter(F.length("line") >= min_len)
              .groupBy("line")
              .agg(F.countDistinct(id_col).alias("line_df"))
              .filter(F.col("line_df") >= min_df)
              .select("line"))
    kept = lines.join(boiler, "line", "left_anti")
    reassembled = (kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            "\n").alias("clean_text")))
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"))
    return (totals.join(reassembled, id_col, "left")
            .select(
                id_col,
                "n_lines",
                F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                F.coalesce("clean_text", F.lit("")).alias("clean_text")))
