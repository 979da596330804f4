"""Evaluation operators (SURVEY §2.4 A2/A6/A8-A11, J4).

The scoring semantics are seqeval's strict entity-level micro metrics
(reference ``src/metrics.py:46-59``): a predicted span is a TP iff an
identical (url, sent_id, type, start, end) span exists in gold.
Expressed as one equi-join + counts — fully declarative, partial
aggregation and broadcast/SMJ selection left to Catalyst/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPAN_KEY = ["url", "sent_id", "label", "start", "end"]


def span_prf(pred: DataFrame, gold: DataFrame) -> dict:
    """Entity-level micro P/R/F1 (SURVEY J4/A10).  Driver-side scalars —
    the inputs are aggregates of a distributed join, not collects."""
    tp = pred.join(gold, on=SPAN_KEY, how="inner").count()
    n_pred = pred.count()
    n_gold = gold.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "n_pred": n_pred, "n_gold": n_gold}


def span_prf_df(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Same as span_prf but as a one-row DataFrame (oracle-checkable)."""
    tp = pred.join(gold, on=SPAN_KEY, how="inner") \
             .agg(F.count(F.lit(1)).alias("tp"))
    np_ = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    ng = gold.agg(F.count(F.lit(1)).alias("n_gold"))
    j = tp.crossJoin(np_).crossJoin(ng)
    return j.select(
        "tp", "n_pred", "n_gold",
        F.round(F.col("tp") / F.col("n_pred"), 6).alias("precision"),
        F.round(F.col("tp") / F.col("n_gold"), 6).alias("recall"),
        F.round(2 * F.col("tp") / (F.col("n_pred") + F.col("n_gold")), 6).alias("f1"),
    )


def per_type_report(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-class P/R/F1 + support (SURVEY A11), one row per label."""
    tp = (pred.join(gold, on=SPAN_KEY, how="inner")
          .groupBy("label").agg(F.count(F.lit(1)).alias("tp")))
    p = pred.groupBy("label").agg(F.count(F.lit(1)).alias("n_pred"))
    g = gold.groupBy("label").agg(F.count(F.lit(1)).alias("support"))
    out = (g.join(p, "label", "full").join(tp, "label", "full")
           .fillna(0, ["tp", "n_pred", "support"]))
    return out.select(
        "label", "tp", "n_pred", "support",
        F.round(F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
                .otherwise(0.0), 6).alias("precision"),
        F.round(F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
                .otherwise(0.0), 6).alias("recall"),
        F.round(F.when(F.col("n_pred") + F.col("support") > 0,
                       2 * F.col("tp") / (F.col("n_pred") + F.col("support")))
                .otherwise(0.0), 6).alias("f1"),
    )


def token_accuracy(pred_tags: DataFrame) -> DataFrame:
    """Token accuracy over aligned word-level tag arrays
    (seqeval accuracy_score semantics; input has gold_tags/pred_tags)."""
    return pred_tags.select(
        F.round(
            F.sum(F.size(F.filter(
                F.arrays_zip("pred_tags", "gold_tags"),
                lambda x: x["pred_tags"] == x["gold_tags"],
            ))) / F.sum(F.size("gold_tags")), 6
        ).alias("accuracy"))


def entity_type_counts(mentions: DataFrame) -> DataFrame:
    """A2: entities per type (reference compute_entity_counts)."""
    return mentions.groupBy("label").agg(F.count(F.lit(1)).alias("n"))


def confusion_topk(errors: DataFrame, k: int = 10) -> DataFrame:
    """A8: top-k (gold, pred) confusion pairs on error rows."""
    return (errors.filter(F.col("gold") != F.col("pred"))
            .groupBy("gold", "pred").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "gold", "pred").limit(k))


def kfold_summary(results: DataFrame, metric: str = "best_f1",
                  prefix: str | None = None) -> DataFrame:
    """A6: mean / POPULATION stddev / min / max / count per run prefix
    (reference summarize_kfold uses statistics.pstdev, :71)."""
    df = results
    if prefix is not None:
        df = df.filter(F.col("run_name").startswith(prefix))
    return df.agg(
        F.round(F.avg(metric), 6).alias("mean"),
        F.round(F.stddev_pop(metric), 6).alias("stddev"),
        F.round(F.min(metric), 6).alias("min"),
        F.round(F.max(metric), 6).alias("max"),
        F.count(metric).alias("count"),
    )
