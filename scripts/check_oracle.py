"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
at the given sf, compare row count + column names + (order-insensitive)
values.  Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal
    if isinstance(v, Decimal):
        return round(float(v), 6)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from ner_extractor_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck] {name}: {str(e)[:300]}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failures.append((name, f"schema: spark={sc} duck={oc}"))
            print(f"[FAIL-schema] {name}: spark={sc} duck={oc}")
        elif len(sr) != len(orr):
            failures.append((name, f"rowcount: spark={len(sr)} duck={len(orr)}"))
            print(f"[FAIL-count] {name}: spark={len(sr)} duck={len(orr)}")
        elif sr != orr:
            diff_s = [r for r in sr if r not in set(orr)][:3]
            diff_o = [r for r in orr if r not in set(sr)][:3]
            failures.append((name, f"values: onlyspark={diff_s} onlyduck={diff_o}"))
            print(f"[FAIL-values] {name}: only-spark={diff_s} only-duck={diff_o}")
        else:
            print(f"[OK] {name}: {len(sr)} rows")

    print(f"\n{n_checked - len(failures)}/{n_checked} matched"
          + ("" if not only else f" (subset of {len(qs)})"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
