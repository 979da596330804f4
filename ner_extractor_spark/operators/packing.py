"""Training-data assembly operators (build brief: the operations a
large-scale training-data pipeline needs beyond the reference's scope):

* ``mixture_sample`` — data mixing: keep a per-source fraction of
  documents (the "30% web / 50% books / 20% code" recipe), chosen by a
  deterministic md5 rank so the mixture is cluster-size invariant and
  SQL-reproducible (same discipline as operators/splits.py).

* ``pack_sequences`` — sequence packing: assign documents to
  fixed-token-budget training bins.  Deterministic, shuffle-bounded
  variant: documents are hashed into ``n_buckets`` independent streams,
  md5-ordered within their stream, and BUDGET-QUANTIZED — a document
  belongs to the bin where its running token count started, so a bin
  may overflow by less than one document (the standard streaming-pack
  tradeoff; an exact first-fit needs a sequential scan, which is what
  the per-bucket parallelism bounds).  Window partitioning is per
  bucket — NEVER a global orderBy window — so the operator scales with
  n_buckets regardless of corpus size.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window, functions as F

from .splits import hash_order


def mixture_sample(df: DataFrame, weights: Dict[str, float],
                   key: str = "doc_id", group: str = "source",
                   seed: int = 42, n_buckets: int = 16) -> DataFrame:
    """Per-group quota sampling, scale-safe: each group's rows are hashed
    into ``n_buckets`` independent md5 streams; stream (g, b) keeps its
    floor(weights[g] * n_{g,b}) smallest md5(seed|key) ranks (groups
    absent from ``weights`` are dropped).  Deterministic, cluster-size
    invariant, SQL-reproducible.

    NO window ever partitions on the group alone: a mixture recipe has a
    handful of sources ("30% web / 50% books"), so a per-source window
    would sort an entire 100 TB corpus slice on ONE reducer (VERDICT r02
    #2).  Parallelism here is groups × n_buckets, independent of corpus
    size; the per-bucket floor means the kept count can undershoot the
    single-stream floor(w·n_g) by at most n_buckets − 1 rows per group.
    ``n_buckets`` must be a power of two ≤ 65536 (4-hex-char fold, same
    rule as pack_sequences)."""
    if n_buckets <= 0 or n_buckets & (n_buckets - 1) or n_buckets > 65536:
        raise ValueError("n_buckets must be a power of two in [1, 65536]")
    w_expr = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    d = (df.withColumn("_h", hash_order(F.col(key), seed))
         .withColumn("_b", F.pmod(F.conv(F.substring("_h", 1, 4), 16, 10)
                                  .cast("int"), F.lit(n_buckets))))
    win = Window.partitionBy(group, "_b").orderBy("_h")
    # the per-bucket count rides the row_number window's shuffle — no
    # separate aggregate + join (same pattern as splits.stratified_split)
    n_gb = F.count(F.lit(1)).over(Window.partitionBy(group, "_b"))
    return (d.withColumn("_rk", F.row_number().over(win))
            .withColumn("_quota", F.floor(w_expr[F.col(group)] * n_gb))
            .filter(F.col("_rk") <= F.col("_quota"))
            .drop("_h", "_b", "_rk", "_quota"))


def temperature_weights(df: DataFrame, group: str = "source",
                        alpha: float = 0.5,
                        budget_frac: float = 1.0) -> DataFrame:
    """(group, n, weight): temperature-scaled mixture keep-fractions —
    the mT5 / Pile sampling recipe: a source's sampling share is
    p_g ∝ n_g^alpha (alpha < 1 upweights small sources relative to
    their size; alpha = 1 is proportional, alpha = 0 uniform), and the
    keep fraction renormalizes the shares to a total budget of
    ``budget_frac`` × N documents:

        weight_g = min(1, budget_frac · N · p_g / n_g)

    (capped at 1 — sampling cannot upweight beyond taking everything;
    true upsampling is an epoch-repeat concern, not a sampling one).
    Feed the result to ``mixture_sample`` — ``temperature_mixture``
    composes the two.

    Scale shape: one map-side-combined group count (group cardinality
    ≪ corpus) + a 1-row normalizer broadcast.  Engine-portable at
    alpha = 0.5: sqrt is IEEE-correctly-rounded (unlike generic pow),
    so the oracle twin is bit-stable; weights round to 6."""
    counts = df.groupBy(group).agg(F.count(F.lit(1)).alias("n"))
    norm = counts.agg(
        F.sum(F.pow(F.col("n").cast("double"), F.lit(alpha))).alias("z"),
        F.sum("n").alias("total"))
    share = F.pow(F.col("n").cast("double"), F.lit(alpha)) / F.col("z")
    w = F.least(F.lit(1.0),
                F.lit(budget_frac) * F.col("total") * share / F.col("n"))
    return (counts.crossJoin(F.broadcast(norm))
            .select(group, "n", F.round(w, 6).alias("weight")))


def temperature_mixture(df: DataFrame, group: str = "source",
                        alpha: float = 0.5, budget_frac: float = 1.0,
                        key: str = "doc_id", seed: int = 42,
                        n_buckets: int = 16) -> DataFrame:
    """``mixture_sample`` under ``temperature_weights`` — the one-call
    temperature-mixing operator.  The weight table collects to a dict
    first (BOUNDED driver collect: one row per source — the
    splits/bpe collect discipline)."""
    w = {r[group]: r["weight"]
         for r in temperature_weights(df, group=group, alpha=alpha,
                                      budget_frac=budget_frac).collect()}
    return mixture_sample(df, w, key=key, group=group, seed=seed,
                          n_buckets=n_buckets)


def pack_sequences(docs: DataFrame, budget: int, n_buckets: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: int = 42) -> DataFrame:
    """Documents -> (bucket, bin, n_tokens) packing assignment.

    bin = floor((running token sum before this doc) / budget) within the
    document's md5-ordered bucket stream.  Deterministic and
    engine-portable; per-bin token sums land in (budget − max_doc,
    budget + max_doc) — a boundary-straddling document overflows its own
    bin AND eats into the next one's window — except the final partial
    bin (bound pinned in tests/test_packing.py).  ``n_buckets`` must be
    a power of two ≤ 65536 (the bucket value derives from 4 hex chars;
    a non-divisor of 65536 would skew the streams).
    """
    if n_buckets <= 0 or n_buckets & (n_buckets - 1) or n_buckets > 65536:
        raise ValueError("n_buckets must be a power of two in [1, 65536]")
    from ..functions.text import token_count

    # bucket from the first two md5 bytes (NOT xxhash64 — the md5
    # derivation is what the DuckDB oracle can recompute), stream order
    # from the same hash's full value
    d = (docs.select(F.col(id_col).alias("doc_id"),
                     token_count(F.col(text_col)).alias("n_tokens"),
                     hash_order(F.col(id_col), seed).alias("_h"))
         .withColumn("bucket",
                     F.pmod(F.conv(F.substring("_h", 1, 4), 16, 10)
                            .cast("int"), F.lit(n_buckets))))
    win = (Window.partitionBy("bucket").orderBy("_h")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(win)
    return (d.withColumn("bin",
                         F.floor((cum - F.col("n_tokens")) / budget)
                         .cast("int"))
            .select("doc_id", "bucket", "bin", "n_tokens"))


def _window_builder(chunk_size: int, stride: int):
    """Sliding-window HOF over a token-array lambda variable/column:
    tl -> array<struct<chunk_id, ct>> with 1 + ceil(max(n - chunk_size,
    0) / stride) windows, each a ``slice`` of the bound array (no
    re-tokenization per window)."""
    def windows(tl):
        n_chunks = (F.lit(1) + F.ceil(
            F.greatest(F.size(tl) - chunk_size, F.lit(0))
            / F.lit(stride)).cast("int"))
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.slice(tl, i * stride + 1, chunk_size).alias("ct")))
    return windows


def chunk_documents(docs: DataFrame, chunk_size: int = 128,
                    stride: int | None = None,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Fixed-token-window chunking with overlap — the step every
    pretraining pipeline runs BEFORE packing: a long document becomes
    ceil((n_tokens - chunk_size) / stride) + 1 windows of up to
    ``chunk_size`` whitespace tokens, each window starting ``stride``
    tokens after the previous (stride < chunk_size ⇒ overlapping
    context, the BERT/GPT sliding-window convention; default stride =
    chunk_size, i.e. disjoint windows).  A document shorter than
    ``chunk_size`` yields exactly one chunk (itself); the last window
    is the final partial remainder.

    Returns (doc_id, chunk_id, n_tokens, chunk_text).

    Scale shape: pure per-row HOF expressions + one explode — zero
    shuffle, a flat map over documents; the token array is bound as a
    lambda variable so any downstream single-column projection stays
    collapse-proof (the winnowing lesson), and the chunk windows are
    built with ``slice`` over the bound array (no re-tokenization per
    window).  Engine-portable: whitespace tokens and list slicing
    reproduce exactly in the DuckDB oracle (query ``chunk_documents``).
    """
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    from .dedup import normalize_text

    toks = F.split(normalize_text(F.col(text_col)), " ")
    windows = _window_builder(chunk_size, stride)
    chunks = F.get(F.transform(F.array(toks), windows), 0)
    # n_tokens counts NON-EMPTY tokens (ADVICE r05): split('') yields
    # [''], so an empty/whitespace-only document is one chunk with
    # chunk_text '' and n_tokens 0 — consistent with token_count()'s
    # 0-for-empty convention that pack_sequences budgets downstream
    # (size() alone would charge such a doc a phantom token)
    ex = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode_outer(chunks).alias("c"))
          .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                  F.size(F.filter("c.ct", lambda t: t != ""))
                  .alias("n_tokens"),
                  F.array_join("c.ct", " ").alias("chunk_text")))
    return ex


def chunk_documents_bpe(docs: DataFrame, rules: list, chunk_size: int = 128,
                        stride: int | None = None,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        vocab_join: str = "broadcast") -> DataFrame:
    """``chunk_documents`` with windows budgeted in BPE TOKENS
    (VERDICT r05 #5): pretraining sequence budgets count tokenizer
    tokens, not whitespace words, so the chunk boundary must fall on
    the model's own token stream.  ``rules`` is the learned merge-rule
    list (``bpe.train_bpe`` collected rank order, the same artifact
    ``bpe_encode`` consumes).

    Returns (doc_id, chunk_id, n_tokens, chunk_text) where
    ``chunk_text`` is the window's BPE symbols space-joined (word
    boundaries carry the explicit ``</w>`` marker, so the original
    normalized text reconstructs exactly from the disjoint-window
    stream — pinned in tests/test_packing.py).  A window may split
    mid-word (the standard pretraining convention); a wordless
    document yields one empty chunk (n_tokens 0) — TOTAL over input.

    Scale shape: ``bpe_encode`` does the vocabulary-sized merge folds
    + one corpus map-side join (broadcast by default, ``vocab_join=
    'shuffle'`` beyond the threshold); then ONE aggregation keyed on
    the maximal-cardinality doc id rebuilds the per-document token
    stream (array_sort over collected (pos, syms) structs — the
    per-doc array is the same memory class as chunk_documents' token
    array), and the windowing itself is the shared zero-shuffle HOF
    flat map."""
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    from .bpe import bpe_encode

    enc = bpe_encode(docs, rules, id_col=id_col, text_col=text_col,
                     vocab_join=vocab_join)
    seq = (enc.groupBy("doc_id")
           .agg(F.flatten(F.transform(
               F.array_sort(F.collect_list(
                   F.struct(F.col("pos"),
                            F.split("encoded", " ").alias("s")))),
               lambda st: st["s"])).alias("toks")))
    total = (docs.select(F.col(id_col).alias("doc_id"))
             .join(seq, "doc_id", "left")
             .withColumn("toks", F.coalesce(
                 "toks", F.array().cast("array<string>"))))
    windows = _window_builder(chunk_size, stride)
    # BPE symbols are never empty strings, so size(ct) IS the token
    # count (no phantom-token correction needed here)
    return (total.select("doc_id",
                         F.explode_outer(windows(F.col("toks")))
                         .alias("c"))
            .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                    F.size("c.ct").alias("n_tokens"),
                    F.array_join("c.ct", " ").alias("chunk_text")))
