"""End-to-end corpus curation: the keep/drop decision a training-data
pipeline actually ships.

Chains the independently-verified families into one per-document
verdict with a first-violation reason code, in a fixed rule order:

  1. hard quality rules   (functions/text.quality_filter — C4/Gopher)
  2. exact duplicate      (operators/dedup.exact_dedup — md5 keeper)
  3. cross-doc n-gram dup (operators/dedup.dup_ngram_fraction)
  4. LM quality gate      (operators/lm char-trigram score — CCNet)

Scale shape: every input is a per-document aggregate keyed on the
document id (or its text hash), so the final assembly is equi-joins on
high-cardinality keys; the LM model and its normalizer are
bounded-key aggregates exactly as in operators/lm.  No new shuffle
patterns are introduced by the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ner_extractor_spark.functions.quantiles import quantile_agg as _quantile
from ner_extractor_spark.functions.text import quality_filter
from ner_extractor_spark.operators.dedup import (dup_ngram_fraction,
                                                 normalize_text)
from ner_extractor_spark.operators.lm import trigram_logprob, trigram_model


def curation_scores(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text",
                    lm_join: str = "broadcast",
                    shingles: DataFrame | None = None,
                    materialize_model: bool = True) \
        -> tuple[DataFrame, DataFrame]:
    """(lm, dup): the two corpus-statistics per-document score tables
    the curation chain consumes — ``trigram_logprob`` under the
    corpus' own ``trigram_model``, and ``dup_ngram_fraction``.

    Exists so calibration and the verdict SHARE one computation
    (VERDICT r04 #2): both pipelines cost a full corpus pass (the
    trigram-model aggregation; the shingle-df explode/join), so
    callers running calibrate + curate back-to-back should
    ``localCheckpoint`` each returned DataFrame once and feed the
    pinned copies to both — ``calibrated_curation`` does exactly
    that.

    ``lm_join`` reaches ``trigram_logprob`` (ADVICE r05: the composed
    entry points must not hard-pin the broadcast path): 'broadcast'
    (lazy default, right for a bounded |alphabet|³ model), 'shuffle'
    for multilingual models beyond any broadcast threshold, or 'auto'
    to pick by model row count (costs an eager count job)."""
    lm = trigram_logprob(docs, trigram_model(docs, text_col=text_col),
                         id_col=id_col, text_col=text_col,
                         join_mode=lm_join,
                         materialize_model=materialize_model)
    dup = dup_ngram_fraction(docs, id_col=id_col, text_col=text_col,
                             shingles=shingles)
    return lm, dup


def calibrate_thresholds(docs: DataFrame | None = None, *,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         lm_quantile: float = 0.05,
                         dup_quantile: float = 0.95,
                         scores: tuple[DataFrame, DataFrame] | None = None,
                         lm_join: str = "broadcast",
                         approx: bool = False,
                         accuracy: int = 10000,
                         ) -> DataFrame:
    """1-row (lm_threshold, dup_threshold): quantile cuts over THIS
    corpus' own score distributions (VERDICT r03 #6 — thresholds are
    calibration data derived from the corpus, not magic constants).

    ``lm_threshold`` = the ``lm_quantile`` percentile of per-doc
    trigram-LM scores (documents scoring below it — the most
    out-of-distribution tail — get dropped); ``dup_threshold`` = the
    ``dup_quantile`` percentile of cross-doc duplicate-n-gram
    fractions.  Rounded to 6 so the cut value is engine-portable.

    Quantile modes (VERDICT r05 #1 — the exact UDAF is a scale
    ceiling):

    * ``approx=False`` (oracle/parity mode): exact sort-based
      ``percentile`` — DuckDB ``quantile_cont`` computes the identical
      interpolation, which is what every oracle-checked calibration
      query pins.  MEMORY BOUND: Spark's exact percentile buffers
      EVERY value of the group in a single aggregation buffer — one
      task holds O(corpus-rows) doubles, an executor-OOM/straggler at
      10⁹+ documents.  Use only where the score table fits one task.
    * ``approx=True`` (the at-scale default for production runs):
      ``approx_percentile`` with ``accuracy`` (Greenwald-Khanna
      summaries — mergeable, bounded state ~O(accuracy·log n) per
      partial, combined map-side like any aggregate).  Returns an
      actual observed value within 1/accuracy relative rank error of
      the target quantile instead of the interpolated midpoint; cut
      agreement vs the exact mode is pinned within tolerance in
      tests/test_curation.py.

    Scale shape: two 1-row global aggregates over per-doc score tables
    the curation pass needs anyway — pass ``scores=`` (the
    ``curation_scores`` pair, ideally localCheckpoint-ed) to reuse
    them instead of rebuilding both corpus-scale pipelines here.
    """
    if scores is None:
        if docs is None:
            raise ValueError("pass docs or scores")
        scores = curation_scores(docs, id_col=id_col, text_col=text_col,
                                 lm_join=lm_join)
    lm, dup = scores
    lm_t = lm.agg(F.round(
        _quantile("lm_score", lm_quantile, approx, accuracy), 6)
        .alias("lm_threshold"))
    dup_t = dup.agg(F.round(
        _quantile("dup_fraction", dup_quantile, approx, accuracy), 6)
        .alias("dup_threshold"))
    return lm_t.crossJoin(dup_t)


def near_dup_keepers(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     shingles: DataFrame | None = None) -> DataFrame:
    """(id_col, nd_keeper) — the canonical representative of each
    MinHash-LSH near-duplicate cluster (FineWeb's keep/drop runs
    near-dedup, not just exact dedup — VERDICT r05 #3).

    Composition of the independently-verified pieces: LSH banded
    candidate pairs (``minhash_lsh_pairs`` — banded bucket join, no
    all-pairs) -> transitive closure (``resolve_duplicates`` /
    connected components — iterative small-star hash joins) -> keeper
    = min doc id per cluster; singletons keep themselves, so the
    output is TOTAL over the input and the verdict join loses no
    rows."""
    from .dedup import minhash_lsh_pairs, resolve_duplicates

    pairs = minhash_lsh_pairs(docs, id_col=id_col, text_col=text_col,
                              shingles=shingles)
    return (resolve_duplicates(docs, pairs, id_col=id_col)
            .select(id_col, F.col("keeper").alias("nd_keeper")))


def curate_corpus(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", dup_threshold: float = 0.9,
                  lm_threshold: float = -8.0,
                  thresholds: DataFrame | None = None,
                  scores: tuple[DataFrame, DataFrame] | None = None,
                  lm_join: str = "broadcast",
                  near: DataFrame | bool = False,
                  ) -> DataFrame:
    """(id_col, keep, reason) for every input document.

    ``reason`` is the FIRST violated rule in the order above ('ok' when
    kept); thresholds are corpus-calibration data, not code — pass
    ``thresholds=calibrate_thresholds(docs)`` (a 1-row broadcast that
    overrides the scalar defaults) to derive them from the corpus'
    score distributions instead of hand-picking.  When running the
    calibrated composition, build the score tables ONCE
    (``curation_scores`` + localCheckpoint) and pass them via
    ``scores=`` to both this and ``calibrate_thresholds`` — or just
    call ``calibrated_curation``, which wires that up (VERDICT r04 #2:
    without sharing, the trigram-model aggregation and the shingle-df
    pass each run twice per calibrated verdict).

    Rule 3 is SYMMETRIC (the Gopher semantic): every copy of heavily
    duplicated content trips it, including the keeper of an exact-dup
    group (whose dup_fraction is 1.0 by construction).  Rule 2 runs
    first so non-keepers get the more specific 'exact_duplicate'
    label; pass ``dup_threshold > 1`` to disable rule 3 when keep-one
    exact dedup is the desired policy.

    ``near`` (VERDICT r05 #3 — FineWeb runs MinHash near-dedup, not
    just exact): ``True`` inserts a 'near_duplicate' rule between
    exact-dup and dup-ngrams — a doc whose MinHash-LSH cluster
    representative (``near_dup_keepers``, md5-shingle deterministic
    min-id keeper) is a DIFFERENT document is dropped with that
    reason; the representative itself survives (and may still trip
    the later symmetric rules).  Pass a precomputed
    (id_col, nd_keeper) DataFrame to reuse an existing cluster table
    (the score-sharing discipline); ``False`` skips the rule — the
    default, so pre-r06 frozen-threshold contracts are unchanged.
    """
    from pyspark.sql import Window

    _, q_reason = quality_filter(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("h"),
        q_reason.alias("q_reason"))
    # keeper = min id per content digest, as a WINDOW over the base
    # table (r07, guide §2.4): the former exact_dedup join re-scanned
    # docs and cost two exchanges (groupBy h + join h) where one
    # digest-keyed exchange suffices — identical rows (exact_dedup's
    # keeper is the same min-per-h, and every base row belongs to
    # exactly one h group); the digest key is skew-free by
    # construction.
    base = base.withColumn(
        "keeper", F.min(id_col).over(Window.partitionBy("h")))
    if scores is None:
        scores = curation_scores(docs, id_col=id_col, text_col=text_col,
                                 lm_join=lm_join)
    lm = scores[0].select(F.col("doc_id").alias(id_col), "lm_score")
    dup = scores[1].select(id_col, "dup_fraction")
    joined = (base.join(lm, id_col)
              .join(dup, id_col))
    if near is True:
        near = near_dup_keepers(docs, id_col=id_col, text_col=text_col)
    if near is not False and near is not None:
        # LEFT join: near_dup_keepers is total over the input, but a
        # user-supplied cluster table may only list clustered docs —
        # absent ids are singletons (keep themselves), never dropped
        joined = joined.join(near.select(id_col, "nd_keeper"),
                             id_col, "left")
        nd_hit = (F.col("nd_keeper").isNotNull()
                  & (F.col(id_col) != F.col("nd_keeper")))
    else:
        nd_hit = F.lit(False)
    if thresholds is not None:
        joined = joined.crossJoin(F.broadcast(thresholds))
        dup_thr, lm_thr = F.col("dup_threshold"), F.col("lm_threshold")
    else:
        dup_thr, lm_thr = F.lit(dup_threshold), F.lit(lm_threshold)
    reason = (
        F.when(F.col("q_reason") != "ok", F.col("q_reason"))
        .when(F.col(id_col) != F.col("keeper"), F.lit("exact_duplicate"))
        .when(nd_hit, F.lit("near_duplicate"))
        .when(F.col("dup_fraction") >= dup_thr, F.lit("dup_ngrams"))
        .when(F.col("lm_score") < lm_thr, F.lit("lm_low_quality"))
        .otherwise(F.lit("ok")))
    return joined.select(
        id_col, (reason == "ok").alias("keep"), reason.alias("reason"))


def calibrated_curation(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        lm_quantile: float = 0.05,
                        dup_quantile: float = 0.95,
                        checkpoint: bool = True,
                        lm_join: str = "broadcast",
                        approx: bool = False,
                        accuracy: int = 10000,
                        near: DataFrame | bool = False) -> DataFrame:
    """The calibrate-then-curate composition with ONE corpus pass per
    score family (VERDICT r04 #2): ``curation_scores`` runs once, each
    score table is localCheckpoint-ed (an eager, executor-materialized
    barrier — the per-doc score tables are corpus-row-count-sized,
    far smaller than the exploded intermediates they summarize), and
    the SAME pinned DataFrames feed both the percentile calibration
    and the verdict joins.  Without the barrier the trigram-model
    aggregation and the shingle-df explode/join would each execute
    twice — two redundant full-corpus shuffle passes at 100 TB.

    ``checkpoint=False`` keeps the plan lazy (the two consumers then
    rely on Spark's ReuseExchange to dedupe the identical subplans
    where it applies).

    ``lm_join``/``approx``/``accuracy``/``near`` thread straight
    through to ``trigram_logprob`` / ``calibrate_thresholds`` /
    ``curate_corpus`` (ADVICE r05 + VERDICT r05 #1/#3): production
    runs at web scale want ``approx=True`` (mergeable quantile state)
    and ``lm_join='shuffle'`` (multilingual model beyond broadcast);
    the exact broadcast defaults are the oracle-parity mode.

    ``near=True`` additionally SHARES one exploded-shingle pass (r06):
    ``dup_ngram_fraction`` and the MinHash signature aggregate both
    consume the same localCheckpoint-ed (doc, shingle) table, so the
    near-dup verdict costs one shingle explode, not two.  (That
    barrier is per-(doc, distinct-3gram) — corpus-token-class; at
    petabyte scale swap it for a persisted ``write_stage`` parquet,
    the exact_substr/winnow posture, or pass ``checkpoint=False`` to
    trade re-computation for zero materialization.)"""
    if checkpoint:
        # TWO CONCURRENT DRIVER CHAINS (r07, extending the r06
        # two-thread barrier — guide §2.6 overlap-independent-jobs):
        #
        #   chain A: trigram model ckpt -> LM scoring ckpt
        #   chain B: shingle explode ckpt (near only) -> dup-fraction
        #            ckpt -> near-dup LSH + CC closure (near only)
        #
        # The LM chain and the shingle chain touch disjoint state, so
        # each chain's barriers/stragglers back-fill with the other
        # chain's tasks; the r06 form serialized the model pass, the
        # shingle pass and the CC rounds ahead of the two-thread lm/dup
        # step.  Results are identical — both chains are deterministic
        # and independent, and every barrier lands on the same tables
        # as before.
        from concurrent.futures import ThreadPoolExecutor

        from .lm import trigram_logprob, trigram_model

        def chain_lm():
            model = trigram_model(docs, text_col=text_col) \
                .localCheckpoint()
            return trigram_logprob(docs, model, id_col=id_col,
                                   text_col=text_col, join_mode=lm_join,
                                   materialize_model=False) \
                .localCheckpoint()

        def chain_dup(near):
            shingles = None
            if near is True:
                from .dedup import word_shingles
                shingles = docs.select(
                    F.col(id_col),
                    F.explode(word_shingles(F.col(text_col)))
                    .alias("shingle")).localCheckpoint()
            dup = dup_ngram_fraction(docs, id_col=id_col,
                                     text_col=text_col,
                                     shingles=shingles) \
                .localCheckpoint()
            if near is True:
                near = near_dup_keepers(docs, id_col=id_col,
                                        text_col=text_col,
                                        shingles=shingles)
            return dup, near

        with ThreadPoolExecutor(2) as pool:
            f_lm = pool.submit(chain_lm)
            f_dup = pool.submit(chain_dup, near)
            lm = f_lm.result()
            dup, near = f_dup.result()
    else:
        shingles = None
        if near is True:
            from .dedup import word_shingles
            shingles = docs.select(
                F.col(id_col),
                F.explode(word_shingles(F.col(text_col))).alias("shingle"))
            near = near_dup_keepers(docs, id_col=id_col, text_col=text_col,
                                    shingles=shingles)
        lm, dup = curation_scores(docs, id_col=id_col, text_col=text_col,
                                  lm_join=lm_join, shingles=shingles)
    thr = calibrate_thresholds(scores=(lm, dup),
                               lm_quantile=lm_quantile,
                               dup_quantile=dup_quantile,
                               approx=approx, accuracy=accuracy)
    return curate_corpus(docs, id_col=id_col, text_col=text_col,
                         thresholds=thr, scores=(lm, dup), near=near)
