"""Data mixing + sequence packing: quotas, determinism, bin budgets."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.packing import (mixture_sample,
                                                   pack_sequences)


def _docs(spark, n=240):
    rows = [(i, f"s{i % 3}", "tok " * (5 + i % 40)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _expected_mixture(n, weights, n_buckets=16, seed=42):
    """Python replica of mixture_sample's (source, bucket) quota streams
    over the _docs corpus — the determinism ground truth."""
    import hashlib
    import math
    from collections import defaultdict

    streams = defaultdict(list)
    for i in range(n):
        src = f"s{i % 3}"
        if src not in weights:
            continue
        h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
        streams[(src, int(h[:4], 16) % n_buckets)].append((h, i))
    keep = set()
    for (src, _), rows in streams.items():
        rows.sort()
        quota = math.floor(weights[src] * len(rows))
        keep.update(i for _, i in rows[:quota])
    return keep


def test_mixture_quotas_and_determinism(spark):
    d = _docs(spark)                     # 80 docs per source s0/s1/s2
    weights = {"s0": 0.5, "s1": 0.25}
    out = mixture_sample(d, weights, group="source")
    got = {r["doc_id"] for r in out.collect()}
    assert got == _expected_mixture(240, weights)  # exact replica match
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # per-bucket floors undershoot the single-stream floor(w*n_g) by at
    # most n_buckets-1 rows; s2 absent from weights -> dropped entirely
    assert 40 - 15 <= by_src["s0"] <= 40
    assert 20 - 15 <= by_src["s1"] <= 20
    assert "s2" not in by_src
    # partition-layout invariance
    again = mixture_sample(d.repartition(13), weights, group="source")
    assert got == {r["doc_id"] for r in again.collect()}


def test_mixture_no_per_source_window(spark):
    """Scale pin (VERDICT r02 #2): no window in the plan may partition on
    the source column alone — a handful of sources at 100 TB would each
    funnel through a single reducer.  Every window spec must include the
    md5 bucket."""
    d = _docs(spark)
    plan = mixture_sample(d, {"s0": 0.5}, group="source") \
        ._jdf.queryExecution().optimizedPlan().toString()
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs, plan
    for ln in specs:
        assert "_b#" in ln.split("windowspecdefinition", 1)[1], ln


def test_pack_sequences_budget_and_coverage(spark):
    d = _docs(spark)
    budget = 200
    p = pack_sequences(d, budget=budget, n_buckets=8)
    assert p.count() == d.count()                  # every doc assigned
    stats = (p.groupBy("bucket", "bin")
             .agg(F.sum("n_tokens").alias("s"),
                  F.max("n_tokens").alias("mx")).collect())
    gmx = p.agg(F.max("n_tokens")).first()[0]
    max_bin = {}
    for r in stats:
        max_bin[r["bucket"]] = max(max_bin.get(r["bucket"], -1), r["bin"])
    for r in stats:
        # quantized-packing bound: a bin's mass deviates from the budget
        # by less than one document on EITHER side (a straddler at the
        # previous boundary eats into this window; one at this boundary
        # overflows it)
        if r["bin"] < max_bin[r["bucket"]]:
            assert r["s"] > budget - gmx, r
        assert r["s"] < budget + gmx, r
    # deterministic under repartition
    a = sorted(map(tuple, p.collect()))
    b = sorted(map(tuple, pack_sequences(d.repartition(7), budget=budget,
                                         n_buckets=8).collect()))
    assert a == b


def test_chunk_documents_windows_and_remainder(spark):
    """Sliding-window chunking: window starts every `stride` tokens,
    each window <= chunk_size tokens, last window is the partial
    remainder, short docs yield exactly one chunk — pinned against a
    pure-Python replica."""
    from ner_extractor_spark.operators.packing import chunk_documents

    rows = [(1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
            (2, "short doc"),                            # 2 tokens
            (3, " ".join(f"w{i}" for i in range(9)))]    # exact multiple
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
           for r in chunk_documents(docs, chunk_size=4,
                                    stride=3).collect()}

    def replica(text, size=4, stride=3):
        toks = " ".join(text.lower().split()).split(" ")
        n = 1 + max(0, -(-(max(len(toks) - size, 0)) // stride))
        return {i: toks[i * stride:i * stride + size] for i in range(n)}

    want = {}
    for doc_id, text in rows:
        for cid, ct in replica(text).items():
            want[(doc_id, cid)] = (len(ct), " ".join(ct))
    assert got == want
    # doc 2 (shorter than chunk_size): exactly one chunk, itself
    assert got[(2, 0)] == (2, "short doc")


def test_chunk_documents_overlap_covers_every_token(spark):
    """stride < chunk_size: every token appears in >= 1 chunk and
    consecutive chunks overlap by chunk_size - stride tokens."""
    from ner_extractor_spark.operators.packing import chunk_documents

    text = " ".join(f"x{i}" for i in range(50))
    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    chunks = sorted((r["chunk_id"], r["chunk_text"].split(" "))
                    for r in chunk_documents(docs, chunk_size=16,
                                             stride=12).collect())
    seen = [t for _, ct in chunks for t in ct]
    assert set(seen) == {f"x{i}" for i in range(50)}
    for (i1, c1), (i2, c2) in zip(chunks, chunks[1:]):
        assert c1[-4:] == c2[:4]    # 16 - 12 = 4 tokens of overlap


def test_chunk_documents_is_shuffle_free(spark):
    from ner_extractor_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(10)],
        "doc_id int, text string")
    plan = chunk_documents(docs, chunk_size=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_chunk_documents_disjoint_chunks_reconstruct_text(spark):
    """stride == chunk_size (disjoint windows): concatenating a doc's
    chunks in chunk_id order reproduces its normalized text exactly —
    chunking loses nothing."""
    from ner_extractor_spark.operators.packing import chunk_documents

    rows = [(i, " ".join(f"tok{i}_{j}" for j in range(1 + 7 * i)))
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {}
    for r in chunk_documents(docs, chunk_size=5).collect():
        out.setdefault(r["doc_id"], []).append((r["chunk_id"],
                                                r["chunk_text"]))
    for doc_id, text in rows:
        parts = [t for _, t in sorted(out[doc_id])]
        assert " ".join(parts) == " ".join(text.split())


def test_chunk_empty_doc_has_zero_tokens(spark):
    """ADVICE r05: split('') yields [''] — an empty/whitespace-only
    document must chunk to ONE row with n_tokens 0 and chunk_text '',
    consistent with token_count()'s 0-for-empty convention that
    pack_sequences budgets downstream (no phantom token)."""
    from ner_extractor_spark.operators.packing import chunk_documents

    d = spark.createDataFrame([(1, ""), (2, "   "), (3, "one two")],
                              "doc_id int, text string")
    rows = {r["doc_id"]: r for r in chunk_documents(d, chunk_size=4).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["chunk_text"] == ""
    assert rows[2]["n_tokens"] == 0 and rows[2]["chunk_text"] == ""
    assert rows[3]["n_tokens"] == 2 and rows[3]["chunk_text"] == "one two"


def test_chunk_bpe_reconstructs_text_and_budgets_bpe_tokens(spark):
    """VERDICT r05 #5: chunk windows budget BPE tokens, and the
    disjoint-window stream reconstructs the normalized text exactly
    (symbols joined, </w> -> space)."""
    from ner_extractor_spark.operators.bpe import train_bpe
    from ner_extractor_spark.operators.packing import chunk_documents_bpe

    rows = [(1, "the cat sat on the mat and the cat ran"),
            (2, "a cat and a mat"),
            (3, "")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    rules = [(r["left"], r["right"])
             for r in train_bpe(d, n_merges=4).collect()]
    out = chunk_documents_bpe(d, rules, chunk_size=5).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every chunk holds <= 5 BPE tokens and n_tokens counts symbols
    for rs in by_doc.values():
        for r in rs:
            syms = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert r["n_tokens"] == len(syms) <= 5
    # reconstruct: concat symbols across disjoint windows, </w> -> ' '
    for doc_id, text in rows:
        syms = []
        for r in by_doc[doc_id]:
            if r["chunk_text"]:
                syms.extend(r["chunk_text"].split(" "))
        rebuilt = "".join(syms).replace("</w>", " ").strip()
        assert rebuilt == " ".join(text.lower().split()), doc_id
    # TOTAL over input: the wordless doc yields one empty chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 0


def test_temperature_weights_semantics(spark):
    """alpha=1 -> proportional shares (every weight = budget_frac);
    alpha=0 -> uniform shares (small sources capped at 1 first);
    alpha=0.5 upweights the small source relative to its size."""
    from ner_extractor_spark.operators.packing import temperature_weights

    rows = [(i, "big") for i in range(90)] + \
           [(100 + i, "small") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id int, source string")

    w1 = {r["source"]: r["weight"]
          for r in temperature_weights(d, alpha=1.0,
                                       budget_frac=0.5).collect()}
    assert w1 == {"big": 0.5, "small": 0.5}

    w0 = {r["source"]: r["weight"]
          for r in temperature_weights(d, alpha=0.0,
                                       budget_frac=0.5).collect()}
    # uniform shares: each source gets 25 docs of budget 50 ->
    # small (10 docs) caps at 1.0, big keeps 25/90
    assert w0["small"] == 1.0
    assert abs(w0["big"] - 25 / 90) < 1e-6

    wh = {r["source"]: r["weight"]
          for r in temperature_weights(d, alpha=0.5,
                                       budget_frac=0.5).collect()}
    assert wh["small"] > wh["big"]


def test_temperature_mixture_respects_quotas(spark):
    """The composed sampler keeps floor(weight * n_{g,b}) per stream —
    totals land within n_buckets of weight * n_g, deterministic."""
    from ner_extractor_spark.operators.packing import (
        temperature_mixture, temperature_weights)

    rows = [(i, f"doc {i} text", "big") for i in range(80)] + \
           [(100 + i, f"doc {i} words", "small") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id int, text string, source string")
    w = {r["source"]: r["weight"]
         for r in temperature_weights(d, budget_frac=0.5).collect()}
    out = temperature_mixture(d, budget_frac=0.5)
    got = {g: n for g, n in
           out.groupBy("source").count().collect()}
    import math
    for g, n_g in (("big", 80), ("small", 20)):
        assert got.get(g, 0) <= math.floor(w[g] * n_g)
        assert got.get(g, 0) >= math.floor(w[g] * n_g) - 16
    # determinism
    again = {g: n for g, n in
             temperature_mixture(d, budget_frac=0.5)
             .groupBy("source").count().collect()}
    assert got == again
