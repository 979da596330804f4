"""Custom stateful streaming operator (SURVEY §2.11 stretch goal):
per-domain incremental mention statistics via
``applyInPandasWithState`` — the Structured Streaming analog of the
engine's per-partition lineage counters.

Semantics: group the sentence stream by url domain; per trigger, update
(domain -> n_sentences, n_mentions) running totals using the same
dictionary tagger + span decode as the batch path; emit one row per
updated domain per micro-batch.  State times out after
``state_ttl_minutes`` of event inactivity (processing-time timeout).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

OUTPUT = StructType([
    StructField("domain", StringType(), False),
    StructField("n_sentences", LongType(), False),
    StructField("n_mentions", LongType(), False),
    StructField("batch_rows", IntegerType(), False),
])

STATE = StructType([
    StructField("n_sentences", LongType(), False),
    StructField("n_mentions", LongType(), False),
])


def domain_mention_stats(sentences: DataFrame, dictionary: dict,
                         state_ttl_minutes: int = 0) -> DataFrame:
    """sentences stream (url, sent_id, tokens) -> running per-domain
    stats.  Works on a streaming DataFrame; the grouping key is the url
    domain so hot domains stay one state row, not one per page.

    state_ttl_minutes > 0 enables a processing-time state TTL for
    long-running continuous queries.  Leave it 0 for availableNow /
    drain-style runs: a registered processing-time timeout keeps the
    microbatch loop alive issuing empty batches until the timeout fires,
    so availableNow would never terminate (measured, not documented).
    """
    from ..functions.bio import get_entities
    from ..operators.ner import DictionaryTagger

    items = list(dictionary.items())

    def update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        model = DictionaryTagger(dict(items))
        if state.hasTimedOut:
            state.remove()
            return
        n_sent, n_men = state.get if state.exists else (0, 0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            n_sent += len(pdf)
            for toks in pdf["tokens"]:
                n_men += len(get_entities(model.tag(list(toks))))
        state.update((n_sent, n_men))
        if state_ttl_minutes > 0:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        yield pd.DataFrame([{
            "domain": key[0],
            "n_sentences": n_sent,
            "n_mentions": n_men,
            "batch_rows": batch_rows,
        }])

    # regexp_extract returns '' on no match but NULL on null input — both
    # must land in the 'unknown' domain bucket (a null group key would
    # otherwise leak through as its own state group)
    extracted = F.regexp_extract("url", r"^[a-z]+://([^/#]+)", 1)
    with_domain = sentences.withColumn(
        "domain",
        F.when(extracted.isNull() | (extracted == ""), F.lit("unknown"))
        .otherwise(extracted))
    return (
        with_domain.groupBy("domain")
        .applyInPandasWithState(
            update, outputStructType=OUTPUT, stateStructType=STATE,
            outputMode="update",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                         if state_ttl_minutes > 0
                         else GroupStateTimeout.NoTimeout))
    )
