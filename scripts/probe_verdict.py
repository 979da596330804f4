"""Stage-time breakdown of the verdict family at sf0.1 (guide §1:
measure first).  Times each barrier of calibrated_curation / the
composed verdict separately so the optimization targets the real cost.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{time.perf_counter() - t0:7.3f}  {label}", flush=True)
    return out


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from ner_extractor_spark.operators.curation import curation_scores
    from ner_extractor_spark.operators.classifier import (classify_docs,
                                                          synthetic_weights)
    from ner_extractor_spark.operators.dedup import (word_shingles,
                                                     minhash_lsh_pairs,
                                                     resolve_duplicates,
                                                     exact_dedup)
    from ner_extractor_spark.operators.lm import (trigram_logprob,
                                                  trigram_model)
    from ner_extractor_spark.session import get_spark

    spark = get_spark(app_name="probe-verdict",
                      extra_conf={"spark.sql.shuffle.partitions": "64"})
    d = E._web_docs_with_urls(E._docs(spark, sf))
    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa
    t("warm: docs count", lambda: d.count())

    for rep in range(2):
        print(f"--- pass {rep} ---")
        sh = d.select(F.col("doc_id"),
                      F.explode(word_shingles(F.col("text")))
                      .alias("shingle"))
        sh_c = t("shingles localCheckpoint", sh.localCheckpoint)
        t("minhash_lsh_pairs (shared sh) noop",
          lambda: noop(minhash_lsh_pairs(d, shingles=sh_c)))
        pairs = minhash_lsh_pairs(d, shingles=sh_c)
        t("resolve_duplicates (LSH + CC) noop",
          lambda: noop(resolve_duplicates(d, pairs)))
        t("trigram_model only noop",
          lambda: noop(trigram_model(d)))
        t("trigram_logprob noop",
          lambda: noop(trigram_logprob(d, trigram_model(d))))
        lm, dup = curation_scores(d, shingles=sh_c)
        lm_c = t("lm localCheckpoint", lm.localCheckpoint)
        dup_c = t("dup localCheckpoint", dup.localCheckpoint)
        t("exact_dedup noop", lambda: noop(exact_dedup(d)))
        t("classify_docs noop",
          lambda: noop(classify_docs(d, synthetic_weights(spark))))
        from ner_extractor_spark.operators.curation import (
            calibrate_thresholds, curate_corpus)
        thr = calibrate_thresholds(scores=(lm_c, dup_c))
        t("curate_corpus final noop",
          lambda: noop(curate_corpus(d, thresholds=thr,
                                     scores=(lm_c, dup_c))))
        t("full web_corpus_verdict query noop",
          lambda: noop(E.queries()["web_corpus_verdict"](spark, sf)))
        t("full corpus_curation_neardup query noop",
          lambda: noop(E.queries()["corpus_curation_neardup"](spark, sf)))
    spark.stop()


if __name__ == "__main__":
    main()
