"""N-Triples export sink (sources/ntriples.py): ECHAR escaping, lossy
slug + lossless label inverse, statement distinctness, bucket key."""

from pyspark.sql import functions as F

from ner_extractor_spark.sources.ntriples import (escape_literal, iri_slug,
                                                  to_ntriples,
                                                  write_ntriples)

TRI = ("subj_surface string, subj_label string, pred string, "
       "obj_surface string, obj_label string")


def _tri(spark):
    return spark.createDataFrame([
        ("Acme Corp.", "ORG", "acquired", 'Bob "Binky" O\'Neil', "PER"),
        ("Acme Corp", "ORG", "acquired", "Tab\there", "PER"),
        # duplicate mention of the first fact from another sentence
        ("Acme Corp.", "ORG", "acquired", 'Bob "Binky" O\'Neil', "PER"),
    ], TRI)


def test_escape_literal_echar_set(spark):
    row = (spark.range(1)
           .select(escape_literal(F.lit('a\\b"c\nd\re\tf')).alias("s"))
           .first())
    assert row["s"] == 'a\\\\b\\"c\\nd\\re\\tf'


def test_iri_slug(spark):
    rows = (spark.createDataFrame([("  Acme, Corp.!!",), ("acme corp",)],
                                  "s string")
            .select(iri_slug(F.col("s")).alias("g")).collect())
    assert [r["g"] for r in rows] == ["acme_corp", "acme_corp"]


def test_to_ntriples_statements(spark):
    out = to_ntriples(_tri(spark)).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], set()).add(r["line"])
    # duplicate fact mention emits ONCE; two distinct facts total
    assert len(by_kind["fact"]) == 2
    assert ("<http://kg.invalid/e/acme_corp> <http://kg.invalid/p/acquired>"
            " <http://kg.invalid/e/bob_binky_o_neil> ." in by_kind["fact"])
    # slug collision ('Acme Corp.' vs 'Acme Corp') -> ONE type line,
    # TWO label lines (the lossless inverse keeps both spellings)
    acme_types = [l for l in by_kind["type"] if "/e/acme_corp>" in l]
    assert len(acme_types) == 1 and "/c/ORG>" in acme_types[0]
    acme_labels = sorted(l for l in by_kind["label"] if "/e/acme_corp>" in l)
    assert [l.split('"')[1] for l in acme_labels] == ["Acme Corp",
                                                      "Acme Corp."]
    # escaped literal on the wire
    assert any('"Bob \\"Binky\\" O\'Neil"' in l for l in by_kind["label"])
    assert any('"Tab\\there"' in l for l in by_kind["label"])
    # every line is terminated and every bucket in range
    assert all(r["line"].endswith(" .") for r in out)
    assert all(0 <= r["part"] < 64 for r in out)


def test_write_ntriples_roundtrip(spark, tmp_path):
    lines = to_ntriples(_tri(spark))
    path = str(tmp_path / "nt")
    write_ntriples(lines, path)
    back = spark.read.text(path)
    assert back.count() == lines.count()
    # partition directories carry the bucket key
    import os
    assert any(d.startswith("part=") for d in os.listdir(path))


def test_to_ntriples_canonical_facts_only(spark):
    """Post-linking Q-id triples (no label columns) export fact
    statements only — a Q-id slugs to itself modulo case/dash."""
    canon = spark.createDataFrame(
        [("Q-00008", "founded", "Q-00002"),
         ("Q-00008", "founded", "Q-00002")],
        "subj string, pred string, obj string")
    out = to_ntriples(canon, subj_col="subj", obj_col="obj").collect()
    assert [r["kind"] for r in out] == ["fact"]
    assert out[0]["line"] == ("<http://kg.invalid/e/q_00008> "
                              "<http://kg.invalid/p/founded> "
                              "<http://kg.invalid/e/q_00002> .")


def test_iri_slug_empty_fallback_and_pred_slugging(spark):
    rows = (spark.createDataFrame([("???",), ("ok",)], "s string")
            .select(iri_slug(F.col("s")).alias("g")).collect())
    assert [r["g"] for r in rows] == ["_", "ok"]
    t = spark.createDataFrame(
        [("A", "ORG", "has part", "B", "ORG")],
        "subj_surface string, subj_label string, pred string, "
        "obj_surface string, obj_label string")
    fact = [r["line"] for r in to_ntriples(t).collect()
            if r["kind"] == "fact"][0]
    # a space in the pred would violate the IRIREF grammar — slugged
    assert "<http://kg.invalid/p/has_part>" in fact


def test_escape_literal_is_invertible(spark):
    """Exhaustive inverse check over the escape alphabet: every 1- and
    2-char string drawn from {a, backslash, quote, LF, CR, TAB}
    unescapes back to itself (the ECHAR chain is lossless and
    order-correct even for adjacent escapables)."""
    chars = ['a', '\\', '"', '\n', '\r', '\t']
    cases = chars + [x + y for x in chars for y in chars]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    rows = df.select("s", escape_literal(F.col("s")).alias("e")).collect()

    def unescape(e):
        out, i = [], 0
        while i < len(e):
            if e[i] == "\\":
                out.append({"\\": "\\", '"': '"', "n": "\n", "r": "\r",
                            "t": "\t"}[e[i + 1]])
                i += 2
            else:
                out.append(e[i])
                i += 1
        return "".join(out)

    for r in rows:
        assert unescape(r["e"]) == r["s"], (r["s"], r["e"])
        # and no raw escapable survives in the wire form
        assert not any(c in r["e"] for c in ('\n', '\r', '\t'))
