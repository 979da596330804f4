"""Round-7 optimization harness (bench.py is FROZEN for measurement —
this file holds the extra instrumentation the optimization round needs):

  * time an arbitrary subset of the headline queries with the same
    methodology as bench.py (noop sink, N interleaved passes, median),
    so per-change before/after numbers are cheap;
  * optionally label jobs (spark.sparkContext.setJobDescription) so the
    SQL tab / event logs are readable.

Usage:
  python bench_extra.py [--runs N] [--cpus C] [query ...]
Prints one JSON line {"queries": {name: median_sec}, "queries_min": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = args[i + 1]
        del args[i:i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args

    import __spark_entry__ as E
    from bench import HEADLINE, _load_ctx, _proc_stat, _idle_between, \
        _warm_python_workers
    from ner_extractor_spark.session import get_spark

    if not names:
        names = HEADLINE
    qs = E.queries()
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query: {n}")

    spark = get_spark(
        app_name=f"bench-extra-{cpus}", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(2 * int(cpus))})

    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    _warm_python_workers(spark, int(cpus))

    load0 = _load_ctx()
    stat0 = _proc_stat()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench-extra: {n}")
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            times[n].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    stat1 = _proc_stat()
    out = {
        "queries": {n: round(statistics.median(ts), 3)
                    for n, ts in times.items()},
        "queries_min": {n: min(ts) for n, ts in times.items()},
        "samples": times,
        "total_median": round(sum(statistics.median(ts)
                                  for ts in times.values()), 3),
        "runs": runs, "cpus": int(cpus), "sf_dir": sf_dir,
        "load": {"loadavg_before": load0["loadavg_1m"],
                 "loadavg_after": _load_ctx()["loadavg_1m"],
                 "idle_during": _idle_between(stat0, stat1)},
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
