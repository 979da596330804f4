"""Scoring parity (T-parity/metrics): span-join P/R/F1 equals hand
computation / seqeval-defined formulas."""

import statistics

from ner_extractor_spark.operators.metrics import (kfold_summary,
                                                   per_type_report, span_prf,
                                                   span_prf_df)

MEN = "url string, sent_id int, start int, end int, surface string, label string"


def test_span_prf_exact(spark):
    gold = spark.createDataFrame([
        ("u1", 0, 0, 1, "John Smith", "PER"),
        ("u1", 0, 3, 3, "Acme", "ORG"),
        ("u1", 1, 0, 0, "Paris", "LOC"),
        ("u2", 0, 2, 2, "Bob", "PER"),
    ], MEN)
    pred = spark.createDataFrame([
        ("u1", 0, 0, 1, "John Smith", "PER"),   # TP
        ("u1", 0, 3, 3, "Acme", "LOC"),          # wrong type -> FP
        ("u1", 1, 0, 0, "Paris", "LOC"),         # TP
        ("u2", 0, 1, 2, "Mr Bob", "PER"),        # wrong span -> FP
        ("u2", 1, 0, 0, "Extra", "ORG"),         # FP
    ], MEN)
    m = span_prf(pred, gold)
    assert m["tp"] == 2
    assert m["precision"] == 2 / 5
    assert m["recall"] == 2 / 4
    f1 = 2 * (2/5) * (2/4) / ((2/5) + (2/4))
    assert abs(m["f1"] - f1) < 1e-9

    row = span_prf_df(pred, gold).collect()[0]
    assert row["tp"] == 2 and row["n_pred"] == 5 and row["n_gold"] == 4

    rep = {r["label"]: r for r in per_type_report(pred, gold).collect()}
    assert rep["PER"]["tp"] == 1 and rep["PER"]["n_pred"] == 2
    assert rep["LOC"]["precision"] == 0.5  # 1 TP of 2 predicted LOC


def test_kfold_summary_population_stddev(spark):
    """Reference summarize_kfold uses statistics.pstdev (population),
    not sample stddev — pin that exact choice."""
    vals = [0.9270, 0.9201, 0.9226, 0.9259, 0.9461]
    df = spark.createDataFrame(
        [("cv", i, v) for i, v in enumerate(vals)],
        "run_name string, fold int, best_f1 double")
    row = kfold_summary(df, "best_f1", prefix="cv").collect()[0]
    assert abs(row["mean"] - statistics.mean(vals)) < 1e-6
    assert abs(row["stddev"] - statistics.pstdev(vals)) < 1e-6
    assert row["count"] == 5
