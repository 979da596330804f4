"""spark-submit entrypoint (north rule: `spark-submit --py-files
ner_extractor_spark.zip -m` style launch).

Usage:
  spark-submit --py-files ner_extractor_spark.zip \
      -m ner_extractor_spark.cli kg \
      --pages /path/to/pages_parquet --workdir /path/to/work [--lang en]

  python -m ner_extractor_spark.cli kg --synth 200 --workdir /tmp/kg
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(prog="ner-extractor-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="run the KG construction pipeline")
    kg.add_argument("--pages", help="pages table (parquet path or catalog id)")
    kg.add_argument("--synth", type=int, default=0,
                    help="synthesize N fixture pages instead of --pages")
    kg.add_argument("--workdir", required=True)
    kg.add_argument("--lang", default="en")
    kg.add_argument("--run-id", default="run0")
    args = p.parse_args(argv)

    # absolute imports so this file also works as a spark-submit primary
    # script (spark-submit runs it top-level, outside the package)
    from ner_extractor_spark import synth
    from ner_extractor_spark.plans.kg_pipeline import run_kg_pipeline
    from ner_extractor_spark.schemas import ALIASES, PAGES
    from ner_extractor_spark.session import get_spark

    spark = get_spark(app_name="kg-pipeline")

    if args.synth:
        pages = spark.createDataFrame(
            synth.pages_rows(synth.gold_corpus(args.synth)), schema=PAGES)
    else:
        from ner_extractor_spark.sources.pages import read_pages
        pages = read_pages(spark, args.pages)
    aliases = spark.createDataFrame(synth.alias_rows(), schema=ALIASES)

    lang = None if args.lang in ("", "all") else args.lang
    res = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                          args.workdir, lang=lang, run_id=args.run_id)
    print(json.dumps({
        "sentences": res.sentences.count(),
        "mentions": res.mentions.count(),
        "triples": res.triples.count(),
        "workdir": args.workdir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
