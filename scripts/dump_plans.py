"""Dump .explain('formatted') for headline queries to plans/r07/.

Usage: python scripts/dump_plans.py <suffix> [query ...]
Writes plans/r07/<query>_<suffix>.txt for each query (default: all
bench.HEADLINE queries).  suffix is 'before' or 'after'.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from bench import HEADLINE
    from ner_extractor_spark.session import get_spark

    if not names:
        names = HEADLINE
    qs = E.queries()
    out_dir = ROOT / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="dump-plans")
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{n}_{suffix}.txt").write_text(plan)
        print(f"wrote {n}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
