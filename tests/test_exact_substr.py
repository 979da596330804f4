"""Span-level exact-substring dedup (operators/exact_substr.py):
maximal-run detection, within-doc-repetition exclusion, and the
removal policy — pinned against a pure-Python replica."""


DOCS = [
    # docs 1/2 share a 10-token verbatim run inside unique context
    (1, "alpha beta " + "the license text is shared verbatim across "
        "both pages here" + " gamma delta"),
    (2, "omega psi " + "the license text is shared verbatim across "
        "both pages here" + " chi phi"),
    # doc 3: within-doc repetition only — min_df counts DISTINCT docs
    (3, " ".join(["rep tok one two five six seven eight"] * 3)),
    # doc 4: fully unique
    (4, "totally unique content with no duplicated runs at all ok"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _py_spans(texts, n=8, min_df=2):
    toks = {d: " ".join(t.lower().split()).split(" ") for d, t in texts}
    grams = {}
    for d, tl in toks.items():
        for i in range(max(len(tl) - n + 1, 0)):
            grams.setdefault(" ".join(tl[i:i + n]), set()).add(d)
    hot = {g for g, ds in grams.items() if len(ds) >= min_df}
    out = []
    for d, tl in toks.items():
        dup = sorted(i for i in range(max(len(tl) - n + 1, 0))
                     if " ".join(tl[i:i + n]) in hot)
        run = []
        for i in dup:
            if run and i == run[-1] + 1:
                run.append(i)
            else:
                if run:
                    out.append((d, run[0], run[-1] + n - 1))
                run = [i]
        if run:
            out.append((d, run[0], run[-1] + n - 1))
    return {(d, s, e): e - s + 1 for d, s, e in out}


def test_spans_match_python_replica(spark):
    from ner_extractor_spark.operators.exact_substr import \
        exact_substring_spans

    got = {(r["doc_id"], r["start"], r["end"]): r["n_tokens"]
           for r in exact_substring_spans(_df(spark), n=8).collect()}
    assert got == _py_spans(DOCS)
    # the shared run is flagged in both docs; 3 and 4 are clean
    docs_flagged = {d for d, _, _ in got}
    assert docs_flagged == {1, 2}


def test_within_doc_repetition_not_flagged_at_min_df_2(spark):
    """Doc 3 repeats its own 8-gram three times, but min_df counts
    distinct documents — no span."""
    from ner_extractor_spark.operators.exact_substr import \
        exact_substring_spans

    out = exact_substring_spans(_df(spark), n=8).filter("doc_id = 3")
    assert out.count() == 0


def test_removal_deletes_exactly_the_spans(spark):
    from ner_extractor_spark.operators.exact_substr import \
        remove_exact_substrings

    got = {r["doc_id"]: (r["text"], r["n_removed_tokens"])
           for r in remove_exact_substrings(_df(spark), n=8).collect()}
    spans = _py_spans(DOCS)
    for doc_id, text in DOCS:
        tl = " ".join(text.lower().split()).split(" ")
        covered = set()
        for (d, s, e), _ in spans.items():
            if d == doc_id:
                covered.update(range(s, e + 1))
        want = " ".join(t for i, t in enumerate(tl) if i not in covered)
        assert got[doc_id] == (want, len(covered)), doc_id
    # unique doc survives untouched
    assert got[4][1] == 0


def test_spans_split_on_a_single_unique_token(spark):
    """Two shared runs separated by one unique token stay two spans."""
    from ner_extractor_spark.operators.exact_substr import \
        exact_substring_spans

    shared1 = "one two three four five six seven eight"
    shared2 = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
    rows = [(1, shared1 + " UNIQA " + shared2),
            (2, shared1 + " UNIQB " + shared2)]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted((r["doc_id"], r["start"], r["end"])
                 for r in exact_substring_spans(d, n=8).collect())
    assert got == [(1, 0, 7), (1, 9, 16), (2, 0, 7), (2, 9, 16)]


def test_stage_dir_durable_barrier_matches_localcheckpoint(spark, tmp_path):
    """r06 (VERDICT r05 #2): the persisted-parquet gram barrier is
    result-identical to the localCheckpoint form, and the stage table
    lands on disk with a manifest entry (durable, resumable)."""
    from ner_extractor_spark.operators.exact_substr import \
        exact_substring_spans

    rows = [(1, "a b c d e f g h i j unique one"),
            (2, "x y a b c d e f g h i j z"),
            (3, "totally different words here only")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    via_ckpt = sorted(map(tuple, exact_substring_spans(d, n=8).collect()))
    stage = str(tmp_path / "grams_stage")
    via_stage = sorted(map(tuple, exact_substring_spans(
        d, n=8, stage_dir=stage).collect()))
    assert via_ckpt == via_stage and via_ckpt
    assert (tmp_path / "grams_stage" / "_manifest.json").exists()
