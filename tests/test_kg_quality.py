"""KG post-extraction operators: type gate, PMI, negative sampling."""

import math

from pyspark.sql import functions as F

from ner_extractor_spark.operators.kg_quality import (negative_samples,
                                                      triple_pmi,
                                                      typed_triples)

TRI = ("url string, sent_id int, subj_start int, subj_surface string, "
       "subj_label string, pred string, obj_start int, obj_surface string, "
       "obj_label string")


def _triples(spark):
    rows = [
        ("u1", 0, 0, "alice", "PER", "founded", 5, "acme", "ORG"),
        ("u1", 1, 0, "alice", "PER", "founded", 4, "acme", "ORG"),
        ("u2", 0, 0, "bob", "PER", "founded", 3, "globex", "ORG"),
        ("u2", 1, 0, "bob", "PER", "visited", 3, "paris", "LOC"),
        ("u3", 0, 0, "acme", "ORG", "founded", 2, "alice", "PER"),  # off-type
    ]
    return spark.createDataFrame(rows, TRI)


def test_typed_triples_gate(spark):
    t = _triples(spark)
    out = typed_triples(t, [("founded", "PER", "ORG"),
                            ("visited", "PER", "LOC")])
    got = {(r["subj_surface"], r["pred"], r["obj_surface"])
           for r in out.collect()}
    assert got == {("alice", "founded", "acme"),
                   ("bob", "founded", "globex"),
                   ("bob", "visited", "paris")}   # off-type row gated out


def test_triple_pmi_values(spark):
    t = _triples(spark)
    got = {(r["subj"], r["obj"]): (r["n_pair"], r["pmi"])
           for r in triple_pmi(t).collect()}
    # (alice, acme): n_pair=2, n_subj(alice)=2, n_obj(acme)=2, N=5
    n, pmi = got[("alice", "acme")]
    assert n == 2
    assert pmi == round(math.log(2 * 5 / (2 * 2)), 6)
    # (bob, paris): n_pair=1, n_subj(bob)=2, n_obj(paris)=1, N=5
    assert got[("bob", "paris")][1] == round(math.log(5 / 2), 6)
    # (acme, alice): all-singleton marginals -> pmi = ln(N)
    assert got[("acme", "alice")][1] == round(math.log(5), 6)


def test_triple_provenance_rollup(spark):
    import datetime as dt

    from ner_extractor_spark.operators.kg_quality import triple_provenance
    t = _triples(spark)
    t0 = dt.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("u1", t0), ("u2", t0 + dt.timedelta(days=1)),
         ("u3", t0 + dt.timedelta(days=2))], "url string, warc_ts timestamp")
    got = {(r["subj"], r["pred"], r["obj"]):
           (r["n_mentions"], r["n_sources"], r["first_seen"], r["last_seen"])
           for r in triple_provenance(t, pages).collect()}
    # (alice, founded, acme) mentioned twice, both in u1
    assert got[("alice", "founded", "acme")] == (2, 1, t0, t0)
    assert got[("bob", "visited", "paris")][1] == 1
    assert len(got) == 4          # distinct (subj, pred, obj) facts


def test_negative_samples_determinism_and_no_positives(spark):
    t = _triples(spark)
    out = negative_samples(t, k=3)
    rows = out.collect()
    # never an accidental positive, always a same-label pool pick
    pools = {"ORG": {"acme", "globex"}, "LOC": {"paris"}, "PER": {"alice"}}
    orig = {(r["url"], r["sent_id"]): r["obj_surface"]
            for r in t.collect()}
    for r in rows:
        assert r["neg_obj_surface"] != r["obj_surface"]
    # the LOC pool has one entity == the original -> no negatives survive
    assert not [r for r in rows if r["obj_surface"] == "paris"]
    # deterministic under repartition
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, negative_samples(t.repartition(7), k=3).collect()))
    assert a == b
    # ORG corruptions come from the ORG pool
    for r in rows:
        if r["obj_surface"] in pools["ORG"]:
            assert r["neg_obj_surface"] in pools["ORG"]

def test_resolve_facts_vote_order(spark):
    import datetime as dt
    from ner_extractor_spark.operators.kg_quality import resolve_facts

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # s1/based_in: source count dominates mentions
        ("s1", "based_in", "paris", 9, 2, ts(5)),
        ("s1", "based_in", "tokyo", 1, 3, ts(1)),
        # s2/based_in: sources tie -> mentions decide
        ("s2", "based_in", "lyon", 2, 2, ts(5)),
        ("s2", "based_in", "nice", 3, 2, ts(9)),
        # s3/based_in: sources+mentions tie -> earlier capture
        ("s3", "based_in", "late", 2, 2, ts(8)),
        ("s3", "based_in", "early", 2, 2, ts(3)),
        # s4/based_in: full tie -> lexicographically smaller obj
        ("s4", "based_in", "bbb", 1, 1, ts(1)),
        ("s4", "based_in", "aaa", 1, 1, ts(1)),
        # s5: single fact passes through
        ("s5", "works_at", "acme", 1, 1, ts(1)),
    ]
    prov = spark.createDataFrame(
        rows, "subj string, pred string, obj string, n_mentions long, "
        "n_sources long, first_seen timestamp")
    got = {(r["subj"], r["pred"]): r for r in resolve_facts(prov).collect()}
    assert got[("s1", "based_in")]["obj"] == "tokyo"      # 3 sources
    assert got[("s2", "based_in")]["obj"] == "nice"       # 3 mentions
    assert got[("s3", "based_in")]["obj"] == "early"
    assert got[("s4", "based_in")]["obj"] == "aaa"
    assert got[("s5", "works_at")]["obj"] == "acme"
    r1 = got[("s1", "based_in")]
    assert r1["n_alternatives"] == 2
    assert r1["support_share"] == round(1 / 10, 6)
    # functional_preds filter drops other predicates entirely
    only = resolve_facts(prov, functional_preds=["works_at"]).collect()
    assert [r["subj"] for r in only] == ["s5"]


def test_fact_timeline_intervals(spark):
    import datetime as dt
    from ner_extractor_spark.operators.kg_quality import fact_timeline

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    # acme based_in: paris (t1,t2) -> tokyo (t5) -> paris AGAIN (t8) —
    # the re-opened segment must be a NEW interval, not a merge
    tri_rows = [
        ("u1", "acme", "based_in", "paris"),
        ("u2", "acme", "based_in", "paris"),
        ("u5", "acme", "based_in", "tokyo"),
        ("u8", "acme", "based_in", "paris"),
        ("u1", "bob", "works_at", "acme"),
    ]
    tri = spark.createDataFrame(
        tri_rows, "url string, subj_surface string, pred string, "
        "obj_surface string")
    pages = spark.createDataFrame(
        [("u1", ts(1)), ("u2", ts(2)), ("u5", ts(5)), ("u8", ts(8))],
        "url string, warc_ts timestamp")
    rows = sorted(map(tuple, fact_timeline(tri, pages).collect()))
    assert rows == sorted([
        ("acme", "based_in", "paris", ts(1), ts(5), 2),
        ("acme", "based_in", "tokyo", ts(5), ts(8), 1),
        ("acme", "based_in", "paris", ts(8), None, 1),
        ("bob", "works_at", "acme", ts(1), None, 1),
    ])


def test_mine_rules_shapes(spark):
    from ner_extractor_spark.operators.kg_quality import mine_rules

    # planted rules: spouse symmetric; ceo_of => works_at; chain
    # born_in . city_in => citizen_of (2 of 3 bodies confirmed)
    rows = [
        ("a", "spouse", "b"), ("b", "spouse", "a"),
        ("c", "spouse", "d"), ("d", "spouse", "c"),
        ("p1", "ceo_of", "co1"), ("p1", "works_at", "co1"),
        ("p2", "ceo_of", "co2"), ("p2", "works_at", "co2"),
        ("p3", "works_at", "co3"),
        ("p1", "born_in", "paris"), ("paris", "city_in", "fr"),
        ("p1", "citizen_of", "fr"),
        ("p2", "born_in", "lyon"), ("lyon", "city_in", "fr"),
        ("p2", "citizen_of", "fr"),
        ("p3", "born_in", "oslo"), ("oslo", "city_in", "no"),
    ]
    tri = spark.createDataFrame(
        rows, "subj_surface string, pred string, obj_surface string")
    got = {(r["kind"], r["head_pred"], r["body"]):
           (r["support"], r["n_body"], r["n_head"], r["conf"])
           for r in mine_rules(tri, min_conf=0.7).collect()}
    # symmetry detector: spouse(y,x) => spouse(x,y), conf 1.0
    assert got[("inverse", "spouse", "spouse")] == (4, 4, 4, 1.0)
    # implication both ways, with asymmetric confidence
    assert got[("same", "works_at", "ceo_of")] == (2, 2, 3, 1.0)
    assert ("same", "ceo_of", "works_at") not in got  # conf 2/3 < 0.7
    got_all = {(r["kind"], r["head_pred"], r["body"]): r["conf"]
               for r in mine_rules(tri, min_conf=0.05).collect()}
    assert got_all[("same", "ceo_of", "works_at")] == round(2 / 3, 6)
    # composition: born_in . city_in => citizen_of, conf 2/3
    assert got_all[("chain", "citizen_of", "born_in . city_in")] \
        == round(2 / 3, 6)
    # hub cap: max_fanout=0 kills every chain body
    no_chain = mine_rules(tri, min_conf=0.05, max_fanout=0).collect()
    assert not [r for r in no_chain if r["kind"] == "chain"]


def test_infer_facts_completion(spark):
    from ner_extractor_spark.operators.kg_quality import (infer_facts,
                                                          mine_rules)

    rows = [
        # spouse symmetric but MISSING the (e,f) mirror edge
        ("a", "spouse", "b"), ("b", "spouse", "a"),
        ("c", "spouse", "d"), ("d", "spouse", "c"),
        ("e", "spouse", "f"),
        # ceo_of => works_at; p3's works_at edge missing
        ("p1", "ceo_of", "co1"), ("p1", "works_at", "co1"),
        ("p2", "ceo_of", "co2"), ("p2", "works_at", "co2"),
        ("p3", "ceo_of", "co3"),
        # chain born_in . city_in => citizen_of; p3's citizenship missing
        ("p1", "born_in", "paris"), ("paris", "city_in", "fr"),
        ("p1", "citizen_of", "fr"),
        ("p2", "born_in", "lyon"), ("lyon", "city_in", "fr"),
        ("p2", "citizen_of", "fr"),
        ("p3", "born_in", "oslo"), ("oslo", "city_in", "no"),
    ]
    tri = spark.createDataFrame(
        rows, "subj_surface string, pred string, obj_surface string")
    rules = mine_rules(tri, min_conf=0.05)
    got = {(r["subj"], r["pred"], r["obj"]): (r["rule_kind"], r["conf"])
           for r in infer_facts(tri, rules, min_conf=0.6).collect()}
    # the missing mirror edge is back-filled by the symmetry rule
    assert got[("f", "spouse", "e")][0] == "inverse"
    # the missing employment edge from the implication rule
    # (ceo_of has 3 pairs here, 2 confirmed -> conf 2/3)
    assert got[("p3", "works_at", "co3")] == ("same", round(2 / 3, 6))
    # the missing citizenship from the composition rule (conf 2/3)
    assert got[("p3", "citizen_of", "no")][0] == "chain"
    # nothing already in the KG is re-asserted
    assert ("a", "spouse", "b") not in got
    assert all(k not in {(s, p, o) for s, p, o in rows} for k in got)


def test_facts_asof_snapshot(spark):
    import datetime as dt
    from ner_extractor_spark.operators.kg_quality import (fact_timeline,
                                                          facts_asof)

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    tri = spark.createDataFrame(
        [("u1", "acme", "based_in", "paris"),
         ("u5", "acme", "based_in", "tokyo"),
         ("u8", "acme", "based_in", "paris"),
         ("u1", "bob", "works_at", "acme")],
        "url string, subj_surface string, pred string, obj_surface string")
    pages = spark.createDataFrame(
        [("u1", ts(1)), ("u5", ts(5)), ("u8", ts(8))],
        "url string, warc_ts timestamp")
    tl = fact_timeline(tri, pages).localCheckpoint()
    # at t=6 the belief is tokyo; at t=9 it is paris again; at t=0
    # nothing is known yet
    at6 = {(r["subj"], r["pred"]): r["obj"]
           for r in facts_asof(tl, ts(6)).collect()}
    assert at6[("acme", "based_in")] == "tokyo"
    assert at6[("bob", "works_at")] == "acme"
    at9 = {(r["subj"], r["pred"]): r["obj"]
           for r in facts_asof(tl, ts(9)).collect()}
    assert at9[("acme", "based_in")] == "paris"
    assert facts_asof(tl, ts(0)).count() == 0
    # exactly one belief per (subj, pred) at any instant
    assert len(at6) == facts_asof(tl, ts(6)).count()


def test_entity_salience_ordering(spark):
    from ner_extractor_spark.operators.kg_quality import entity_salience

    # u1: acme mentioned 3x from sentence 0 across 2 sents; bob once,
    # late — acme must outrank bob.  u2 exercises the tie-break.
    men = spark.createDataFrame(
        [("u1", 0, 0, 0, "acme", "ORG"),
         ("u1", 0, 3, 3, "acme", "ORG"),
         ("u1", 1, 0, 0, "acme", "ORG"),
         ("u1", 2, 0, 0, "bob", "PER"),
         ("u2", 0, 0, 0, "aa", "ORG"),
         ("u2", 0, 2, 2, "bb", "ORG")],
        "url string, sent_id int, start int, end int, surface string, "
        "label string")
    sents = spark.createDataFrame(
        [("u1", i) for i in range(3)] + [("u2", 0)],
        "url string, sent_id int")
    rows = {(r["url"], r["surface"]): r
            for r in entity_salience(men, sents).collect()}
    a, b = rows[("u1", "acme")], rows[("u1", "bob")]
    assert (a["n_mentions"], a["first_sent"], a["n_sents"]) == (3, 0, 2)
    assert a["salience"] == round(0.5 * 3 / 4 + 0.3 / 1 + 0.2 * 2 / 3, 6)
    assert b["salience"] == round(0.5 * 1 / 4 + 0.3 / 3 + 0.2 * 1 / 3, 6)
    assert (a["rank"], b["rank"]) == (1, 2)
    # identical stats on u2 -> surface asc breaks the tie
    assert rows[("u2", "aa")]["rank"] == 1
    assert rows[("u2", "bb")]["rank"] == 2
    # top_k filters per document
    top1 = entity_salience(men, sents, top_k=1).collect()
    assert {(r["url"], r["surface"]) for r in top1} == \
        {("u1", "acme"), ("u2", "aa")}


def test_predicate_stats_functionality(spark):
    from ner_extractor_spark.operators.kg_quality import predicate_stats

    rows = [
        # based_in: every subject one object (functional), duplicate
        # mention collapses
        ("a", "based_in", "paris"), ("a", "based_in", "paris"),
        ("b", "based_in", "tokyo"),
        # knows: a -> two objects (non-functional)
        ("a", "knows", "b"), ("a", "knows", "c"), ("b", "knows", "c"),
    ]
    tri = spark.createDataFrame(
        rows, "subj_surface string, pred string, obj_surface string")
    got = {r["pred"]: r for r in predicate_stats(tri).collect()}
    bi = got["based_in"]
    assert (bi["n_facts"], bi["n_subj"], bi["n_obj"]) == (2, 2, 2)
    assert bi["functionality"] == 1.0 and bi["is_functional"]
    kn = got["knows"]
    assert (kn["n_facts"], kn["n_subj"]) == (3, 2)
    assert kn["functionality"] == round(2 / 3, 6)
    assert not kn["is_functional"]


def test_resolve_functional_facts_autodetect(spark):
    import datetime as dt
    from ner_extractor_spark.operators.kg_quality import \
        resolve_functional_facts

    tri = spark.createDataFrame(
        [("u1", "acme", "based_in", "paris"),
         ("u2", "acme", "based_in", "tokyo"),   # conflict -> vote
         ("u1", "b", "based_in", "lyon"),
         ("u1", "a", "knows", "b"), ("u1", "a", "knows", "c"),
         ("u2", "b", "knows", "c"), ("u2", "c", "knows", "a")],
        "url string, subj_surface string, pred string, obj_surface string")
    pages = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1)), ("u2", dt.datetime(2024, 1, 2))],
        "url string, warc_ts timestamp")
    # based_in functionality 2/3 ~= 0.67; knows 3/4 = 0.75 -> at 0.6
    # both resolve, at 0.7 only knows, at the 0.8 default neither
    out = resolve_functional_facts(tri, pages, functional_threshold=0.6)
    got = {(r["subj"], r["pred"]): r["obj"] for r in out.collect()}
    assert got[("acme", "based_in")] == "paris"   # earlier capture wins
    assert ("a", "knows") in got
    at07 = resolve_functional_facts(tri, pages, functional_threshold=0.7)
    assert {r["pred"] for r in at07.collect()} == {"knows"}
    assert resolve_functional_facts(tri, pages).count() == 0


def test_snapshot_diff_changes(spark):
    import datetime as dt
    from ner_extractor_spark.operators.kg_quality import (fact_timeline,
                                                          snapshot_diff)

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    tri = spark.createDataFrame(
        [("u1", "acme", "based_in", "paris"),
         ("u5", "acme", "based_in", "tokyo"),
         ("u1", "bob", "works_at", "acme"),
         ("u5", "carol", "works_at", "acme")],
        "url string, subj_surface string, pred string, obj_surface string")
    pages = spark.createDataFrame(
        [("u1", ts(1)), ("u5", ts(5))], "url string, warc_ts timestamp")
    tl = fact_timeline(tri, pages).localCheckpoint()
    got = {(r["subj"], r["pred"]): (r["obj_before"], r["obj_after"],
                                    r["change"])
           for r in snapshot_diff(tl, ts(2), ts(6)).collect()}
    # acme moved; carol appeared; bob unchanged -> omitted
    assert got == {
        ("acme", "based_in"): ("paris", "tokyo", "changed"),
        ("carol", "works_at"): (None, "acme", "added"),
    }
    # t before any capture: everything is 'added'
    all_added = snapshot_diff(tl, ts(0), ts(6)).collect()
    assert {r["change"] for r in all_added} == {"added"}
    assert len(all_added) == 3


def test_growth_curve_cumulative(spark):
    import datetime as dt
    from ner_extractor_spark.operators.kg_quality import growth_curve

    prov = spark.createDataFrame(
        [("a", "p", "x", dt.datetime(2024, 1, 1, 0, 0, 10)),
         ("a", "p", "y", dt.datetime(2024, 1, 1, 0, 0, 50)),
         ("b", "p", "x", dt.datetime(2024, 1, 1, 0, 2, 5)),
         ("c", "p", "x", dt.datetime(2024, 1, 1, 0, 2, 59))],
        "subj string, pred string, obj string, first_seen timestamp")
    rows = sorted(map(tuple, growth_curve(prov).collect()))
    assert rows == [
        (dt.datetime(2024, 1, 1, 0, 0), 2, 2),
        (dt.datetime(2024, 1, 1, 0, 2), 2, 4),
    ]


def test_relation_patterns_between_spans(spark):
    from ner_extractor_spark.operators.kg_quality import relation_patterns

    sents = spark.createDataFrame(
        [("u1", 0, "big co was founded by alice smith"),
         ("u1", 1, "other co was founded by bob"),
         ("u2", 0, "acme acquired rival co")],
        "url string, sent_id int, sent_text string")
    # (subj token span) ... (obj token span); subj precedes obj
    tri = spark.createDataFrame(
        [("u1", 0, 0, "big co", "founded", 5, "alice smith"),
         ("u1", 1, 0, "other co", "founded", 5, "bob"),
         ("u2", 0, 0, "acme", "acquired", 2, "rival co")],
        "url string, sent_id int, subj_start int, subj_surface string, "
        "pred string, obj_start int, obj_surface string")
    got = {(r["pred"], r["pattern"]): (r["n"], r["rank"])
           for r in relation_patterns(tri, sents).collect()}
    assert got[("founded", "was founded by")] == (2, 1)
    assert got[("acquired", "acquired")] == (1, 1)
    assert len(got) == 2


def _sig_triples(spark):
    # pred 'p': 4 distinct ORG->ORG facts, 1 LOC->ORG fact (the
    # schema-noise row), with the LOC fact MENTIONED three times
    # (duplicate rows must not change fact-level support)
    rows = ([("u1", i, 0, f"s{i}", "ORG", "p", 2, f"o{i}", "ORG")
             for i in range(4)]
            + [("u2", 9, 0, "lake", "LOC", "p", 2, "acme", "ORG")] * 3)
    return spark.createDataFrame(
        rows, "url string, sent_id int, subj_start int, "
              "subj_surface string, subj_label string, pred string, "
              "obj_start int, obj_surface string, obj_label string")


def test_predicate_signatures_distinct_fact_support(spark):
    from ner_extractor_spark.operators.kg_quality import \
        predicate_signatures
    got = {(r["subj_label"], r["obj_label"]):
           (r["n_facts"], r["share"], r["rank"], r["is_dominant"])
           for r in predicate_signatures(_sig_triples(spark)).collect()}
    # triple-mentioned LOC fact counts ONCE: 4/5 vs 1/5
    assert got[("ORG", "ORG")] == (4, 0.8, 1, True)
    assert got[("LOC", "ORG")] == (1, 0.2, 2, False)


def test_signature_outliers_threshold(spark):
    from ner_extractor_spark.operators.kg_quality import \
        signature_outliers
    tri = _sig_triples(spark)
    # share 0.2 < 0.25 -> the LOC fact is the one outlier
    out = signature_outliers(tri, min_share=0.25).collect()
    assert [(r["subj"], r["pred"], r["obj"], r["sig_share"])
            for r in out] == [("lake", "p", "acme", 0.2)]
    # tighter threshold: nothing qualifies
    assert signature_outliers(tri, min_share=0.1).count() == 0


def test_entity_cards_evidence_ordering(spark):
    from ner_extractor_spark.operators.kg_quality import entity_cards
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    rows = [
        # subj a: 3 facts — f2 wins on n_sources, f1 beats f3 on
        # first_seen at equal sources/mentions
        ("a", "p", "x", 5, 1, t1),
        ("a", "p", "y", 5, 2, t0),
        ("a", "q", "z", 5, 1, t0),
        ("b", "p", "x", 1, 1, t0),
    ]
    prov = spark.createDataFrame(
        rows, "subj string, pred string, obj string, n_mentions long, "
              "n_sources long, first_seen timestamp")
    got = {(r["subj"], r["rank"]): (r["pred"], r["obj"],
                                    r["n_facts"], r["n_preds"])
           for r in entity_cards(prov, top_k=2).collect()}
    assert got[("a", 1)] == ("p", "y", 3, 2)   # most sources
    assert got[("a", 2)] == ("q", "z", 3, 2)   # earlier first_seen
    assert got[("b", 1)] == ("p", "x", 1, 1)
    assert ("a", 3) not in got                 # top_k enforced
