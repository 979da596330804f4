"""§3.1 data-preparation "query": raw CoNLL dir -> processed
train/validation/test splits (reference ``scripts/prepare_conll03.py``
-> ``src/datasets.py:118-169``).

Spark shape (SURVEY §3.1): read.text -> sentence assembly -> primary
label (P4) -> train∪dev (T2) -> stratified split (T1) -> byte-parity
CoNLL sink (S5).  One job; the only wide op is the split's per-stratum
window.

Parity note: the reference splits with sklearn's seeded RNG; its exact
permutation is library-internal.  We keep the *semantics* (exact
per-stratum quota, seeded, original order restored) but key randomness
by md5(seed|sentence-key) so the split is cluster-size invariant
(SURVEY §4.3.2) — the documented delta from the reference.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

from pyspark.sql import SparkSession, functions as F

from ..operators.splits import stratified_split
from ..sources.conll import read_conll_spark, write_conll_spark

CANDIDATES = {
    "train": ["train.txt", "eng.train"],
    "validation": ["validation.txt", "valid.txt", "dev.txt", "eng.testa"],
    "test": ["test.txt", "eng.testb"],
}


def _locate(raw_dir: Path, kind: str, required: bool = True) -> Path | None:
    for name in CANDIDATES[kind]:
        p = raw_dir / name
        if p.exists():
            return p
    if required:
        raise FileNotFoundError(
            f"Missing {kind} file in {raw_dir}. Expected one of {CANDIDATES[kind]}")
    return None


def prepare_corpus(spark: SparkSession, raw_dir: str, processed_dir: str,
                   val_ratio: float = 0.2, seed: int = 42) -> Dict[str, Path]:
    """Produce processed train/validation/test CoNLL files."""
    raw = Path(raw_dir).resolve()
    out = Path(processed_dir).resolve()
    out.mkdir(parents=True, exist_ok=True)

    train_file = _locate(raw, "train")
    dev_file = _locate(raw, "validation", required=False)
    test_file = _locate(raw, "test")

    pool = read_conll_spark(spark, str(train_file))
    if dev_file is not None:
        pool = pool.unionByName(read_conll_spark(spark, str(dev_file)))  # T2

    # P4 primary label via array HOF; stable global order key for the
    # deterministic split + order restoration
    pool = pool.withColumn(
        "primary_label",
        F.coalesce(
            F.get(F.split(F.get(F.filter("ner_tags", lambda t: t != "O"),
                                0), "-", 2), 1),
            F.lit("O")),
    ).withColumn("_order", F.concat_ws("|", "file", F.col("doc_id"),
                                       F.col("sent_id")))

    split_df = stratified_split(pool, "primary_label", "_order",
                                val_ratio=val_ratio, seed=seed)

    # distributed byte-parity sink (no driver collect — VERDICT r01 #4):
    # the serializer is the concat_ws block expression in write_conll_spark
    paths: Dict[str, Path] = {}
    for split_name, fname in [("train", "train.txt"),
                              ("validation", "validation.txt")]:
        paths[split_name] = write_conll_spark(
            split_df.filter(F.col("split") == split_name), out / fname,
            order_cols=("file", "doc_id", "sent_id"))

    paths["test"] = write_conll_spark(
        read_conll_spark(spark, str(test_file)), out / "test.txt",
        order_cols=("file", "doc_id", "sent_id"))
    return paths
