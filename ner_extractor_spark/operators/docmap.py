"""J1: sentence <-> doc-id multiset matching (reference
``scripts/generate_kfold_splits.py:94-109``).

Reference semantics: each processed sentence is mapped back to a raw
doc id by its exact serialized key; duplicate keys are consumed
stack-wise (``bucket.pop()``) so every raw occurrence pairs with at most
one processed occurrence; an unmatched processed sentence is an error.

Distributed re-expression: the stack-pop is a positional 1:1 pairing
within a key's duplicate group — equi-join on the serialized key plus
``row_number()`` per key on both sides.  (The reference pops from the
stack END, i.e. pairs processed-scan-order against reverse raw order;
since the mapping's only contract is *a bijection between equal-key
multisets* — fold grouping treats any pairing identically — we pin the
deterministic ascending/ascending pairing and document the delta.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sentence_key(tokens_col, pos_col, chunk_col, ner_col):
    """F6: '\\n'.join(f'{w} {p} {c} {n}') serialized multiset-join key."""
    return F.concat_ws(
        "\n",
        F.zip_with(
            F.zip_with(tokens_col, pos_col, lambda w, p: F.concat_ws(" ", w, p)),
            F.zip_with(chunk_col, ner_col, lambda c, n: F.concat_ws(" ", c, n)),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )


def map_doc_ids(processed: DataFrame, raw_with_ids: DataFrame,
                order_col: str = "sent_id") -> DataFrame:
    """processed (…, tokens, pos_tags, chunk_tags, ner_tags) ⋈ raw
    (same + doc_id) -> processed + doc_id.

    Raises (via an assertion job) if any processed sentence has no raw
    counterpart — the reference's ValueError.
    """
    key = lambda df: sentence_key(  # noqa: E731
        df["tokens"], df["pos_tags"], df["chunk_tags"], df["ner_tags"])

    p = processed.withColumn("_key", key(processed)).withColumn(
        "_occ", F.row_number().over(
            Window.partitionBy("_key").orderBy(order_col)))
    r = (raw_with_ids.withColumn("_key", key(raw_with_ids))
         .withColumn("_occ", F.row_number().over(
             Window.partitionBy("_key").orderBy("doc_id", order_col)))
         .select("_key", "_occ", "doc_id"))

    joined = p.join(r, on=["_key", "_occ"], how="left")
    n_unmatched = joined.filter(F.col("doc_id").isNull()).count()
    if n_unmatched:
        raise ValueError(
            f"{n_unmatched} sentences not found in raw corpus while "
            "assigning doc ids.")
    return joined.drop("_key", "_occ")
