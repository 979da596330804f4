"""ner_extractor_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the query / data-processing capabilities of the reference NER
harness (``acd19ml/ner-extractor``, read-only at /root/reference) as an
idiomatic Spark DataFrame pipeline:

    pages (url, warc_ts, html, text, lang)
      -> sentences            (operators/extract.py)
      -> word-level BIO tags  (operators/ner.py, vectorized Arrow UDF)
      -> mentions             (operators/spans.py, seqeval-parity decode)
      -> triples_raw          (operators/triples.py, pattern extraction)
      -> linked mentions      (operators/link.py, broadcast alias join + LSH)
      -> entity components    (operators/cc.py, large-star/small-star)
      -> triples + lineage    (plans/kg_pipeline.py, resumable stages)

Everything scale-critical is declarative DataFrame code (Catalyst plans it);
per-document compute is Arrow-batched `mapInPandas` — no per-row Python.
"""

__version__ = "0.1.0"
