"""Text-analysis functions for training-data pipelines (build brief):
language-ID heuristic, quality scoring, token counting, fingerprinting.
All pure built-in expressions — JVM-side, codegen-friendly, and
recomputable in ANSI SQL by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword lexicons for the n-gram/lexicon heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}


def tokens(col) -> Column:
    """Whitespace tokenization — the reference's free-text extractor
    (SURVEY F9); parity-critical, do not 'improve'."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col)))


# GPT-2-flavoured piece pattern: letter runs, single digits, single
# punctuation marks.  Deliberately lookaround-free so the same pattern
# runs identically under Java regex (Spark) and RE2 (DuckDB oracle).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token-count proxy (build brief: 'whitespace + a
    BPE-ish regex'): number of BPE_ISH_PATTERN matches — letter runs
    stay whole, digits count one piece each (the GPT-2 digit rule),
    punctuation one piece per mark."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def stopword_ratio(col, lang: str = "en") -> Column:
    sw = STOPWORDS[lang]
    toks = tokens(F.lower(col))
    return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(
        F.size(F.filter(toks, lambda t: t.isin(sw))) / F.size(toks))


def lang_id(col) -> Column:
    """Heuristic language ID: argmax stopword-hit-rate over lexicons,
    'und' if nothing hits.  (Real fastText-style models slot in behind
    the same column contract.)"""
    toks = tokens(F.lower(col))

    def hit_filter(sw):
        # NB: the lambda must take exactly one parameter — PySpark treats
        # two-parameter callables as (element, index) lambdas.
        return lambda t: t.isin(sw)

    scores = [
        F.struct(
            (F.size(F.filter(toks, hit_filter(sw))) /
             F.greatest(F.size(toks), F.lit(1))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def quality_features(df, text_col: str = "text"):
    """Classic quality-filter feature set (length / punctuation /
    stopword / uniqueness ratios) as plain columns."""
    c = F.col(text_col)
    toks = tokens(c)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars_q"),
        F.round(F.length(F.regexp_replace(c, r"[^\W_]|\s", "")) /
                F.greatest(F.length(c), F.lit(1)), 6).alias("punct_ratio"),
        F.round(F.size(F.array_distinct(toks)) /
                F.greatest(F.size(toks), F.lit(1)), 6).alias("unique_ratio"),
        F.round(F.length(c) / F.greatest(F.size(toks), F.lit(1)), 6)
        .alias("mean_token_len"),
        stopword_ratio(c).alias("stopword_ratio_en"),
    )


def fingerprint(col) -> Column:
    """Document fingerprint: md5 over the whitespace-normalized,
    lowercased text (rolling-hash stand-in; portable + deterministic)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))
