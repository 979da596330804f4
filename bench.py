"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...,
   "cpus": ..., "load": {...}}

Noise protocol (VERDICT r03 #2 — this host is a loaded co-tenant box
where single-shot timings swing up to ±2×):
  * every headline query runs N_RUNS=3 times, INTERLEAVED (pass 1 of
    all queries, then pass 2, then pass 3 — so a transient load spike
    taxes one pass of many queries, not all runs of one query);
  * the reported per-query figure is the MEDIAN of the runs, and
    "value" is the sum of medians;
  * host load context is recorded in-band: 1-min loadavg and the
    /proc/stat idle fraction measured across the suite, so a regressed
    artifact can be decomposed without git archaeology.

Every query is forced end-to-end with a noop-format write (count() would
let Catalyst prune the computed columns).  Use --cpus to override the
parallelism.

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N): the
`--scaling` leg is IDLE-GATED by default — it samples /proc/stat (2 s
windows) until the host is >= 95% idle or the gate times out, then runs;
the measured pre-run idle fraction and loadavg land in the JSON either
way.  Run the fragile wide leg FIRST (it needs half the machine for
~25 s; narrow legs tolerate co-tenants) — `--pair HI LO` does both legs
in one invocation, wide first, pinned to disjoint-free core ranges, and
prints the pair with its efficiency.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "kg_extract_sentences",
    "html_extract_text",   # r04: real markup-aware extraction
    "kg_mentions",
    "kg_triples",
    "kg_link_alias",
    "kg_link_alias_salted",  # r04: skew-salted beyond-broadcast config
    "kg_tag_linear",       # r03: forward+align+decode Arrow stage
    "text_redact",         # r03: regexp-chain redaction (pure JVM)
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_jaccard",
    "dedup_simhash",
    "ann_topk",
    "text_quality",
    "text_langid",
    "agg_pricing_summary",
    "join_orders_nation",
    "window_running_value",
    "sessionize",
    "stream_window_counts",
    "text_winnow",         # r04: HOF rolling-hash fingerprints (no shuffle)
    "text_quality_classifier",  # r04: hashed features x broadcast weights
    "text_winnow_matches",  # r05: MOSS cross-doc overlap (df-capped)
    "text_ppl_buckets",    # r05: CCNet head/middle/tail LM bucketing
    "web_corpus_verdict",  # r05: full composed verdict, single score pass
    "chunk_documents",     # r05: sliding-window pretraining chunking
    "decontam_overlap",    # r05: eval-set contamination semi-join
    "dedup_exact_spans",   # r05: ExactSubstr span-level dedup
    "corpus_training_pipeline",  # r05: verdict -> chunk -> pack, one plan
    "corpus_curation_neardup",   # r06: + MinHash near-dup rule
    "corpus_pipeline_spanclean",  # r06: verdict -> span-dedup -> chunk -> pack
    "chunk_documents_bpe",       # r06: BPE-token-budgeted windows
    "classifier_trained_gate",   # r06: perceptron train + learned gate
    "web_verdict_learned",       # r06: full verdict with the trained gate
    "kg_transe",                 # r06: dyadic TransE embedding training
    "warc_roundtrip",            # r06: WARC synth + framing parse
    "kg_fact_resolution",        # r06: provenance vote, one min(struct) agg
    "web_robots_filter",         # r06: RFC 9309 broadcast longest-match
    "web_anchor_aliases",        # r06: anchor-text alias mining
    "kg_fact_timeline",          # r06: gaps-and-islands validity intervals
    "kg_rule_mining",            # r06: AMIE-style rule discovery
    "kg_rule_infer",             # r06: rule-based KG completion
    "kg_entity_salience",        # r06: per-doc entity importance index
    "kg_predicate_stats",        # r06: AMIE functionality profile
    "kg_link_coherent",          # r06: document-coherence disambiguation
    "kg_relation_patterns",      # r06: Snowball pattern induction
    "kg_type_signatures",        # r06: SDType domain/range induction
    "kg_khop",                   # r06: bounded BFS entity neighborhood
    "kg_link_embed",             # r06: dense-retrieval fallback linking
    "kg_entity_cards",           # r06: per-entity fact-card payload
    "kg_export_ntriples",        # r06: RDF N-Triples serialization
    "dedup_blocking_stats",      # r06: LSH blocking-quality audit
    "bpe_fertility",             # r06: per-language tokenizer fertility
    "profile_documents",         # r06: one-pass ingest column profile
]

N_RUNS = 3          # interleaved passes per headline query
IDLE_TARGET = 0.95  # --scaling gate: required /proc/stat idle fraction
IDLE_TIMEOUT = 120  # seconds to wait for the gate before running anyway


# -- host load instrumentation ---------------------------------------------

def _proc_stat() -> tuple[int, int]:
    """(idle+iowait jiffies, total jiffies) from the aggregate cpu line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return idle, sum(vals)


def _idle_between(a: tuple[int, int], b: tuple[int, int]) -> float:
    didle, dtot = b[0] - a[0], b[1] - a[1]
    return round(didle / dtot, 4) if dtot > 0 else -1.0


def _idle_sample(window: float = 2.0) -> float:
    a = _proc_stat()
    time.sleep(window)
    return _idle_between(a, _proc_stat())


def _gate_idle(target: float = IDLE_TARGET,
               timeout: float = IDLE_TIMEOUT) -> dict:
    """Block until the host measures >= target idle over a 2 s window,
    or the timeout elapses; either way report what was measured (the
    gate never hides a loaded run — it just avoids one when it can)."""
    t0 = time.monotonic()
    best = -1.0
    while True:
        f = _idle_sample()
        best = max(best, f)
        if f >= target:
            return {"idle_pre": f, "idle_gated": True,
                    "gate_wait_sec": round(time.monotonic() - t0, 1)}
        if time.monotonic() - t0 >= timeout:
            return {"idle_pre": best, "idle_gated": False,
                    "gate_wait_sec": round(time.monotonic() - t0, 1)}


def _load_ctx() -> dict:
    return {"loadavg_1m": round(os.getloadavg()[0], 2)}


def _warm_python_workers(spark, cpus: int) -> None:
    """Force-spawn the full Python worker pool (each worker imports
    pandas/pyarrow once, ~20 s wall for 32 concurrent cold imports).
    One-time cluster-startup cost, excluded from throughput timings —
    on a real cluster the pool lives for the job's lifetime."""
    import pandas as pd

    def touch(batches):
        for b in batches:
            yield pd.DataFrame({"x": [len(b)]})

    (spark.range(cpus * 4).repartition(cpus * 2)
     .mapInPandas(touch, schema="x long")
     .write.format("noop").mode("overwrite").save())


def scaling_run(cpus: str, sf_dir: str, replicate: int = 96,
                gate: bool = True) -> dict:
    """The N-vs-4N scaling job: the flagship KG pipeline (extract ->
    vectorized tag -> span decode -> triple pattern join) over the corpus
    deterministically replicated x`replicate` (urls disambiguated per
    replica).  Map-heavy with one bounded shuffle — the shape whose
    throughput the north rule grades."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from ner_extractor_spark.operators.extract import extract_sentences
    from ner_extractor_spark.operators.ner import tag_sentences
    from ner_extractor_spark.operators.triples import extract_triples_local
    from ner_extractor_spark.session import get_spark

    gate_ctx = _gate_idle() if gate else {"idle_gated": False,
                                          "idle_pre": _idle_sample()}
    load0 = _load_ctx()

    spark = get_spark(
        app_name=f"bench-scaling-{cpus}", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(2 * int(cpus))})
    # Stage the replicated corpus as a MANY-FILE parquet table first (the
    # production input shape: a 100 TB corpus arrives as thousands of
    # files, not as one shuffle).  File count is FIXED (not a function of
    # cpus) so both cluster sizes run the identical job — the N-vs-4N
    # comparison is then purely about parallelism.
    import tempfile
    staged = tempfile.mkdtemp(prefix=f"kgbench{cpus}_") + "/pages"
    (E._pages(spark, sf_dir)
     .repartition(64, "url")
     .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(replicate))))
     .withColumn("url", F.concat("url", F.lit("#"), F.col("rep")))
     .drop("rep")
     .write.parquet(staged))
    pages = spark.read.parquet(staged)
    n_pages = pages.count()
    _warm_python_workers(spark, int(cpus))

    # the full pipeline is map-only: extract -> tag (Arrow UDF) ->
    # span decode + triple pairing fused as row-local HOF expressions.
    stat0 = _proc_stat()
    t0 = time.perf_counter()
    sents = extract_sentences(pages, lang="en")
    tagged = tag_sentences(sents, {k: v for k, v in E.GAZ.items()})
    triples = extract_triples_local(tagged, predicates=E.PREDICATES)
    n_triples = triples.count()
    dt = time.perf_counter() - t0
    idle_during = _idle_between(stat0, _proc_stat())
    spark.stop()
    return {
        "metric": "kg_pipeline_scaling",
        "value": round(dt, 3),
        "unit": "sec",
        "cpus": int(cpus),
        "replicate": replicate,
        "n_pages": n_pages,
        "n_triples": n_triples,
        "pages_per_sec": round(n_pages / dt, 2),
        "triples_per_sec": round(n_triples / dt, 2),
        "sf_dir": sf_dir,
        "load": {**gate_ctx, **load0, "idle_during": idle_during},
    }


def scaling_curation_run(cpus: str, sf_dir: str, replicate: int = 8,
                         gate: bool = True,
                         training: bool = False) -> dict:
    """The N-vs-4N leg for the DATA-PIPELINE flagship (VERDICT r05 #2:
    the KG scaling job is deliberately exchange-free — this one has the
    real shuffles): ``full_web_verdict`` in at-scale mode
    (approx-percentile calibration) over the corpus replicated
    ×``replicate``.  Exercises the trigram-model aggregation, the
    shingle-df explode/join, the classifier explode + doc-keyed
    aggregate, two calibration aggregates, and the final verdict
    equi-joins.  Replica text gets a per-replica marker token so
    exact-dedup does not degenerate to one keeper per group; doc ids
    are disambiguated per replica.  No Python workers in this job —
    the whole verdict is JVM expressions, so no warm-up phase."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from ner_extractor_spark.operators.classifier import synthetic_weights
    from ner_extractor_spark.operators.web_verdict import full_web_verdict
    from ner_extractor_spark.session import get_spark

    if not 0 < replicate < 1000:
        raise ValueError("curation replicate must be in (0, 1000) — "
                         "doc ids are disambiguated as doc_id*1000+rep")
    gate_ctx = _gate_idle() if gate else {"idle_gated": False,
                                          "idle_pre": _idle_sample()}
    load0 = _load_ctx()

    spark = get_spark(
        app_name=f"bench-curation-{cpus}", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(2 * int(cpus))})
    import tempfile
    staged = tempfile.mkdtemp(prefix=f"curbench{cpus}_") + "/docs"
    (E._docs(spark, sf_dir)
     .repartition(64, "doc_id")
     .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(replicate))))
     .select((F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"),
             F.concat("text", F.lit(" r"), F.col("rep")).alias("text"),
             "lang", "source")
     .write.parquet(staged))
    docs = E._web_docs_with_urls(spark.read.parquet(staged))
    n_docs = docs.count()

    stat0 = _proc_stat()
    t0 = time.perf_counter()
    verdict = full_web_verdict(
        docs, synthetic_weights(spark),
        blocked_domains=("tracker.test", "spam.example"),
        blocked_terms=("casino",), approx=True)
    if training:
        # the LITERAL flagship: verdict -> 64-token chunks -> 500-token
        # packing (adds the zero-shuffle chunk flat map and the
        # per-md5-bucket packing windows on top of the verdict)
        from ner_extractor_spark.operators.packing import (
            chunk_documents, pack_sequences)
        kept = docs.join(verdict.filter("keep").select("doc_id"),
                         "doc_id")
        chunks = chunk_documents(kept, chunk_size=64).select(
            F.concat_ws("#", "doc_id", "chunk_id").alias("chunk_uid"),
            "chunk_text")
        packed = pack_sequences(chunks, budget=500, n_buckets=16,
                                id_col="chunk_uid",
                                text_col="chunk_text")
        n_out = packed.groupBy("bucket", "bin").count().count()
    else:
        n_out = verdict.count()
    dt = time.perf_counter() - t0
    idle_during = _idle_between(stat0, _proc_stat())
    spark.stop()
    return {
        "metric": ("training_pipeline_scaling" if training
                   else "curation_pipeline_scaling"),
        "value": round(dt, 3),
        "unit": "sec",
        "cpus": int(cpus),
        "replicate": replicate,
        "n_pages": n_docs,
        "n_verdicts": n_out,
        "pages_per_sec": round(n_docs / dt, 2),
        "sf_dir": sf_dir,
        "load": {**gate_ctx, **load0, "idle_during": idle_during},
    }


def pair_run(hi: int, lo: int, sf_dir: str, replicate: int,
             strict: bool = False, job: str = "kg") -> dict:
    """One idle-gated scaling pair, WIDE LEG FIRST (BENCH.md §2
    protocol from r3-22): each leg is a fresh subprocess pinned with
    taskset, so legs never inherit a warm JVM.

    ``strict`` (r05, the primary gate protocol): pin each leg to
    EXACTLY cpus cores (0..cpus-1).  The legacy default pins to
    2*cpus (headroom for the JVM) — but on an idle host the narrow
    leg's task threads + python workers overlap into the headroom
    (measured: local[2] under a 4-core mask consumes 3.0 busy cores),
    so its throughput overstates what N cores deliver and the
    efficiency ratio under-measures.  Strict mode hard-caps each
    leg's compute at its nominal budget — the true N-vs-4N
    comparison."""
    legs = {}
    flag = {"kg": "--scaling", "curation": "--scaling-curation",
            "training": "--scaling-training"}[job]
    for cpus in (hi, lo):
        top = cpus - 1 if strict else 2 * cpus - 1
        cmd = ["taskset", "-c", f"0-{top}", sys.executable,
               __file__, flag, "--cpus", str(cpus),
               "--replicate", str(replicate)]
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if out.returncode != 0 or not out.stdout.strip():
            tail = out.stderr.strip().splitlines()[-1] if out.stderr.strip() \
                else "(no stderr)"
            raise RuntimeError(
                f"scaling leg cpus={cpus} failed (rc={out.returncode}): "
                f"{tail}")
        line = out.stdout.strip().splitlines()[-1]
        legs[cpus] = json.loads(line)
    speedup = legs[hi]["pages_per_sec"] / legs[lo]["pages_per_sec"]
    eff = speedup / (hi / lo)
    return {"metric": f"{job}_pipeline_scaling_pair", "hi": legs[hi],
            "lo": legs[lo], "efficiency": round(eff, 3),
            "unit": "ratio"}


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--cpus" in sys.argv:
        cpus = sys.argv[sys.argv.index("--cpus") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    replicate = 96
    # --long: the amortized-length scaling job (VERDICT r04 #8) — 16x
    # the default corpus so the ~2-3 s fixed job overhead (session,
    # staging, first-stage scheduling) stops dominating the ratio; the
    # r04 probe measured 0.982 efficiency at this length vs ~0.85 short
    if "--long" in sys.argv:
        replicate = 1536
    if any(f in sys.argv for f in ("--curation", "--scaling-curation",
                                   "--training", "--scaling-training")):
        replicate = 8   # the verdict job is ~40x heavier per doc than
        # the map-only KG job; 8 replicas ≈ the same wide-leg wall
    if "--replicate" in sys.argv:
        replicate = int(sys.argv[sys.argv.index("--replicate") + 1])
    job = ("training" if "--training" in sys.argv
           else "curation" if "--curation" in sys.argv else "kg")
    if "--pair" in sys.argv:
        i = sys.argv.index("--pair")
        hi, lo = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        n_pairs = 1
        if "--pairs" in sys.argv:
            n_pairs = int(sys.argv[sys.argv.index("--pairs") + 1])
        results = [pair_run(hi, lo, sf_dir, replicate,
                            strict="--strict" in sys.argv, job=job)
                   for _ in range(n_pairs)]
        if n_pairs == 1:
            print(json.dumps(results[0]))
        else:
            effs = sorted(r["efficiency"] for r in results)
            print(json.dumps({
                "metric": f"{job}_pipeline_scaling_pairs",
                "median_efficiency": effs[len(effs) // 2],
                "efficiencies": [r["efficiency"] for r in results],
                "pairs": results, "unit": "ratio"}))
        return
    if "--scaling-curation" in sys.argv or "--scaling-training" in sys.argv:
        print(json.dumps(scaling_curation_run(
            cpus, sf_dir, replicate=replicate,
            gate="--no-gate" not in sys.argv,
            training="--scaling-training" in sys.argv)))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run(
            cpus, sf_dir, replicate=replicate,
            gate="--no-gate" not in sys.argv)))
        return

    import __spark_entry__ as E
    from ner_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(2 * int(cpus))})

    qs = E.queries()
    # warm the JVM and the full Python-worker pool once (not timed)
    qs["kg_extract_sentences"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    _warm_python_workers(spark, int(cpus))

    load0 = _load_ctx()
    stat0 = _proc_stat()
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    tri_runs: list[tuple[int, float]] = []
    for _ in range(N_RUNS):
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
        # throughput datum for the north rule: triples/sec through the
        # full extract -> tag -> decode -> pair+predicate pipeline —
        # same median discipline as the per-query timings
        t0 = time.perf_counter()
        n_triples = qs["kg_triples"](spark, sf_dir).count()
        tri_runs.append((n_triples, time.perf_counter() - t0))
    stat1 = _proc_stat()
    load1 = _load_ctx()

    timings = {name: round(statistics.median(rs), 3)
               for name, rs in runs.items()}
    total = sum(timings.values())
    n_triples = tri_runs[0][0]
    triples_dt = statistics.median(dt for _, dt in tri_runs)
    n_pages = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    out = {
        "metric": "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "runs_per_query": N_RUNS,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / triples_dt, 2),
        "pages_per_sec": round(n_pages / triples_dt, 2),
        "load": {"loadavg_1m_before": load0["loadavg_1m"],
                 "loadavg_1m_after": load1["loadavg_1m"],
                 "idle_during": _idle_between(stat0, stat1)},
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
