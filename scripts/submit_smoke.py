"""Real ``spark-submit --py-files`` launch proof (north rule: the
pipeline is launched via spark-submit --py-files on a cluster).

Zips the package, writes a driver script that imports ONLY from the
shipped zip (no repo sys.path — this is exactly the packaging contract
a multi-executor cluster enforces), and execs spark-submit.

    python scripts/submit_smoke.py [master]     # default local[4]

Prints one line ``SUBMIT_SMOKE_TRIPLES <n>`` on success (n > 0).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

JOB = '''
import tempfile
from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("kg-submit-smoke").getOrCreate()
# imports resolve from the --py-files zip on every executor
from ner_extractor_spark import synth
from ner_extractor_spark.schemas import PAGES, ALIASES
from ner_extractor_spark.plans.kg_pipeline import run_kg_pipeline

pages = spark.createDataFrame(synth.pages_rows(synth.gold_corpus(20)),
                              schema=PAGES)
aliases = spark.createDataFrame(synth.alias_rows(), schema=ALIASES)
r = run_kg_pipeline(spark, pages, aliases, synth.tagger_dictionary(),
                    tempfile.mkdtemp())
print("SUBMIT_SMOKE_TRIPLES", r.triples.count())
spark.stop()
'''


def main() -> int:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[4]"
    repo = Path(__file__).resolve().parent.parent
    tmp = Path(tempfile.mkdtemp(prefix="submit_smoke_"))
    zip_base = tmp / "ner_extractor_spark"
    shutil.make_archive(str(zip_base), "zip", str(repo),
                        "ner_extractor_spark")
    job = tmp / "job.py"
    job.write_text(JOB)
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    proc = subprocess.run(
        [spark_submit, "--master", master,
         "--py-files", str(zip_base) + ".zip", str(job)],
        capture_output=True, text=True, cwd=str(tmp))
    for line in proc.stdout.splitlines():
        if line.startswith("SUBMIT_SMOKE_TRIPLES"):
            print(line)
            n = int(line.split()[-1])
            return 0 if n > 0 else 1
    sys.stderr.write(proc.stderr[-2000:])
    return proc.returncode or 1


if __name__ == "__main__":
    raise SystemExit(main())
