"""N-Triples export sink — the KG's interchange materialization.

The north rule ends at "final (subj, pred, obj) triple
materialization back to partitioned tables"; columnar parquet covers
the warehouse side (``plans/checkpoints.write_stage``), and this
module covers the EXCHANGE side: RDF 1.1 N-Triples (W3C REC, one
independently-parseable line per statement), the format KG dumps
(Wikidata, DBpedia) actually ship as and the one downstream triple
stores bulk-load.

Everything is declarative JVM-side string algebra (no UDFs):

  * ``iri_slug`` / ``escape_literal`` — column expressions for the
    two lexical rules that matter: deterministic ASCII slugging of
    surface forms into IRI local names, and the N-Triples string
    escape set (backslash, quote, LF, CR, TAB — grammar ECHAR,
    https://www.w3.org/TR/n-triples/#grammar-production-ECHAR).
  * ``to_ntriples`` — triples -> one row per emitted line, three
    statement kinds per the usual dump layout: the fact itself
    (entity IRIs), one ``rdf:type`` per distinct (entity, NER label),
    and one ``rdfs:label`` literal per distinct entity carrying the
    ORIGINAL surface form (the slug is lossy; the label line is the
    lossless inverse, so a loader can rebuild surfaces exactly).

Scale shape: facts are a projection of the (already canonicalized)
triple table; type and label statements are distinct-aggregates over
the union of subject and object mentions — one shuffle each, keyed on
the entity slug, map-side combined.  Lines are independent, so the
sink writes with arbitrary parallelism and a partition-key column
(md5 bucket of the subject slug) is provided for partitioned output;
no global sort is required by the format.

Line layout cites the reference's triple schema only for WHAT a fact
is (subj/pred/obj surfaces + NER labels, extract_triples output);
the serialization is public-spec, nothing in the reference emits RDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
DEFAULT_BASE = "http://kg.invalid/"


def iri_slug(col: Column) -> Column:
    """Deterministic IRI local name for a surface form: lowercase,
    non-alphanumeric runs collapsed to ``_``, trimmed of edge ``_``;
    an all-punctuation surface falls back to ``_`` so the IRIREF is
    never empty (grammar-valid, and the ``rdfs:label`` lines keep the
    colliding spellings distinguishable).  Lossy by design."""
    s = F.regexp_replace(F.lower(col), "[^a-z0-9]+", "_")
    s = F.regexp_replace(s, "^_+|_+$", "")
    return F.when(s == "", F.lit("_")).otherwise(s)


def escape_literal(col: Column) -> Column:
    """N-Triples ECHAR escaping for a literal: backslash first, then
    quote, LF, CR, TAB.  Order matters — escaping the backslash last
    would double-escape the others."""
    s = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    s = F.replace(s, F.lit('"'), F.lit('\\"'))
    s = F.replace(s, F.lit("\n"), F.lit("\\n"))
    s = F.replace(s, F.lit("\r"), F.lit("\\r"))
    return F.replace(s, F.lit("\t"), F.lit("\\t"))


def _stmt(s: Column, p: Column, o: Column) -> Column:
    return F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit(" ."))


def to_ntriples(triples: DataFrame, base: str = DEFAULT_BASE,
                n_buckets: int = 64, subj_col: str = "subj_surface",
                pred_col: str = "pred", obj_col: str = "obj_surface",
                subj_label_col: str = "subj_label",
                obj_label_col: str = "obj_label") -> DataFrame:
    """triples (extract_triples schema by default) -> N-Triples lines.

    Returns (kind, part, line): kind in ('fact', 'type', 'label'),
    part = md5 bucket of the statement's subject slug (the
    partitioned-write key — co-locates every statement about an
    entity in one output partition), line = the serialized statement.
    Distinct facts / entity-label pairs / entities each emit once.

    When the label columns are absent from ``triples`` (e.g. the
    CANONICAL post-linking table, whose subj/obj are Q-ids with no
    NER label attached), only fact statements are emitted — a Q-id
    slugs to itself, so the label inverse would be vacuous.
    """
    ent = lambda slug: F.concat(F.lit(f"<{base}e/"), slug, F.lit(">"))
    prd = lambda p: F.concat(F.lit(f"<{base}p/"), p, F.lit(">"))
    cls = lambda l: F.concat(F.lit(f"<{base}c/"), l, F.lit(">"))
    subj_slug = iri_slug(F.col(subj_col))

    # the predicate is slugged too: a raw pred containing a space or
    # '>' would violate the IRIREF grammar (reference preds are plain
    # lowercase tokens, for which the slug is the identity)
    facts = (triples
             .select(subj_slug.alias("sslug"),
                     iri_slug(F.col(pred_col)).alias("pred"),
                     iri_slug(F.col(obj_col)).alias("oslug"))
             .distinct()
             .select(F.lit("fact").alias("kind"), F.col("sslug"),
                     _stmt(ent(F.col("sslug")), prd(F.col("pred")),
                           ent(F.col("oslug"))).alias("line")))

    bucket = F.pmod(F.conv(F.substring(F.md5(F.col("sslug")), 1, 4),
                           16, 10).cast("long"),
                    F.lit(n_buckets)).cast("int")
    if (subj_label_col not in triples.columns
            or obj_label_col not in triples.columns):
        return facts.select("kind", bucket.alias("part"), "line")

    mentions = (triples.select(F.col(subj_col).alias("surface"),
                               F.col(subj_label_col).alias("label"))
                .unionByName(triples.select(
                    F.col(obj_col).alias("surface"),
                    F.col(obj_label_col).alias("label"))))
    slugged = mentions.select(iri_slug(F.col("surface")).alias("sslug"),
                              "surface", "label")

    types = (slugged.select("sslug", "label").distinct()
             .select(F.lit("type").alias("kind"), F.col("sslug"),
                     _stmt(ent(F.col("sslug")), F.lit(f"<{RDF_TYPE}>"),
                           cls(F.col("label"))).alias("line")))

    # one label line per distinct SURFACE (slugging is lossy: two
    # surfaces may share a slug, and both spellings must survive)
    labels = (slugged.select("sslug", "surface").distinct()
              .select(F.lit("label").alias("kind"), F.col("sslug"),
                      _stmt(ent(F.col("sslug")), F.lit(f"<{RDFS_LABEL}>"),
                            F.concat(F.lit('"'),
                                     escape_literal(F.col("surface")),
                                     F.lit('"'))).alias("line")))

    out = facts.unionByName(types).unionByName(labels)
    # bucket is the md5-prefix fold (the packing.py idiom) —
    # engine-portable, so the DuckDB oracle replicates the partition
    # key bit-exactly
    return out.select("kind", bucket.alias("part"), "line")


def write_partitioned_lines(lines: DataFrame, path: str) -> None:
    """Shared line-sink: materialize a (part, line) frame partitioned
    by bucket — one directory per ``part``, plain-text shards inside.
    Text sink — the line IS the record.  Used by this module's
    N-Triples export and by ``sources/jsonl.py`` (one writer, so the
    two sinks cannot drift)."""
    (lines.select("part", "line").write.partitionBy("part")
     .mode("overwrite").text(path))


def write_ntriples(lines: DataFrame, path: str) -> None:
    """Materialize the export partitioned by bucket (``.nt`` shards)."""
    write_partitioned_lines(lines, path)
