"""§3.1 prepare pipeline: union + stratified split + byte-parity sink."""

import random

from ner_extractor_spark.functions.bio import build_bio_tags
from ner_extractor_spark.plans.prepare import prepare_corpus
from ner_extractor_spark.sources.conll import (Sentence, read_conll_file,
                                               serialize_conll,
                                               write_conll_file)


def _corpus(seed, n):
    rng = random.Random(seed)
    sents = []
    for i in range(n):
        label = rng.choice(["PER", "ORG", "LOC", "O"])
        toks = [f"w{i}_{j}" for j in range(rng.randint(2, 6))]
        ner = ["O"] * len(toks)
        if label != "O":
            ner[:2] = build_bio_tags(label, min(2, len(toks)))
        sents.append(Sentence(toks, ["NN"] * len(toks), ["O"] * len(toks), ner))
    return sents


def test_prepare_corpus(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    train = _corpus(1, 120)
    dev = _corpus(2, 40)
    test = _corpus(3, 30)
    write_conll_file(train, raw / "train.txt")
    write_conll_file(dev, raw / "dev.txt")
    write_conll_file(test, raw / "test.txt")

    out = tmp_path / "proc"
    paths = prepare_corpus(spark, str(raw), str(out), val_ratio=0.25)

    tr = read_conll_file(paths["train"])
    va = read_conll_file(paths["validation"])
    te = read_conll_file(paths["test"])

    # partition of the train∪dev pool, exact byte round-trip of test
    assert len(tr) + len(va) == 160
    assert serialize_conll(te) == serialize_conll(test)
    pool_keys = sorted(s.key() for s in train + dev)
    assert sorted(s.key() for s in tr + va) == pool_keys

    # per-stratum quota is exact: ~25% of each primary label
    def by_label(sents):
        d = {}
        for s in sents:
            d.setdefault(s.tokens and _primary(s) or "O", []).append(s)
        return d

    def _primary(s):
        for t in s.ner_tags:
            if t != "O":
                return t.split("-", 1)[-1]
        return "O"

    pool_counts = {}
    for s in train + dev:
        pool_counts[_primary(s)] = pool_counts.get(_primary(s), 0) + 1
    val_counts = {}
    for s in va:
        val_counts[_primary(s)] = val_counts.get(_primary(s), 0) + 1
    for lbl, n in pool_counts.items():
        assert val_counts.get(lbl, 0) == round(n * 0.25)

    # deterministic: rerun produces byte-identical files
    out2 = tmp_path / "proc2"
    paths2 = prepare_corpus(spark, str(raw), str(out2), val_ratio=0.25)
    assert paths["train"].read_bytes() == paths2["train"].read_bytes()
    assert paths["validation"].read_bytes() == paths2["validation"].read_bytes()


def test_compact_stage_preserves_data_and_resume(spark, tmp_path):
    """Small-file compaction: fewer files, identical rows, manifest
    resume still skips the stage."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from ner_extractor_spark.plans.checkpoints import (StageManifest,
                                                       compact_stage,
                                                       write_stage)

    man = StageManifest(str(tmp_path / "stages"))
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("x"))
    write_stage(man, "s", df.repartition(32))
    before = sorted(map(tuple, spark.read.parquet(man.path("s")).collect()))
    n_before = len(list(Path(man.path("s")).glob("*.parquet")))
    assert n_before >= 16

    # stale temp dir from a simulated earlier crash must be swept, and
    # its _-prefixed name is invisible to any parquet reader meanwhile
    stale = Path(man.path("s")).parent / "_compacting_s"
    stale.mkdir()
    (stale / "junk.txt").write_text("crash leftover")

    n_after = compact_stage(spark, man, "s")
    assert n_after < n_before
    assert not stale.exists()
    after = sorted(map(tuple, spark.read.parquet(man.path("s")).collect()))
    assert after == before
    assert man.done("s")
    # and the compaction re-mark kept the original run_id (merge, not
    # replace)
    import json
    entry = json.loads(man.manifest_path.read_text())["stages"]["s"]
    assert entry.get("compacted") and "run_id" in entry
    # resume contract: write_stage still skips the compacted stage
    again = write_stage(man, "s", df.limit(1))
    assert again.count() == 1000


def test_compact_crash_recovery(spark, tmp_path):
    """Every compaction crash window must be repaired by recover_stage:
    (a) rename #1 done, rename #2 not (live missing, aside+retired
    present) -> compacted copy promoted; (b) retired-only (aside lost)
    -> original restored; no hidden dirs survive either way."""
    import os
    import shutil
    from pathlib import Path

    from ner_extractor_spark.plans.checkpoints import (StageManifest,
                                                       recover_stage,
                                                       write_stage)

    man = StageManifest(str(tmp_path / "stages"))
    df = spark.range(300).selectExpr("id", "id % 5 as x")
    write_stage(man, "s", df.repartition(8))
    base = Path(man.path("s"))
    before = sorted(map(tuple, spark.read.parquet(str(base)).collect()))

    # (a) simulate crash between the two renames: live -> retired, and a
    # complete compacted copy sits in the aside dir
    aside = base.parent / "_compacting_s"
    spark.read.parquet(str(base)).repartition(1).write.parquet(str(aside))
    os.replace(base, base.parent / "_retired_s")
    recover_stage(man, "s")
    assert base.exists()
    assert not (base.parent / "_retired_s").exists()
    assert not aside.exists()
    got = sorted(map(tuple, spark.read.parquet(str(base)).collect()))
    assert got == before

    # (b) retired-only window: aside never completed
    os.replace(base, base.parent / "_retired_s")
    recover_stage(man, "s")
    assert base.exists()
    assert sorted(map(tuple,
                      spark.read.parquet(str(base)).collect())) == before
    shutil.rmtree(str(tmp_path / "stages"), ignore_errors=True)
