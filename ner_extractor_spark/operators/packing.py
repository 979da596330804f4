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
