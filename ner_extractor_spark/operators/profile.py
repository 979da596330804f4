"""Column-level data-quality profiling (the Deequ/TFDV shape) — the
first thing a 100 TB ingest runs BEFORE any pipeline stage: null
rates, cardinalities, value bounds and width per column, so schema
drift and upstream corruption (a lang column going 40% null, a url
column whose distinct count collapses) are caught at the scan, not
three stages later in a broken join.

One pass over the table: every per-column statistic is an aggregate
in ONE ``agg`` (map-side combined), then the single result row pivots
to long format driver-free via an inline array-of-structs explode.

The cardinality statistic follows the repo's exact/approx dual-mode
discipline (ARCHITECTURE.md "Calibration quantiles"): ``approx=False``
uses ``count(DISTINCT c)`` — bit-exact, DuckDB-oracle-checkable, but
Spark plans n columns of it as an Expand (n× the input rows through
the first aggregate); ``approx=True`` (the documented at-scale
default) swaps in ``approx_count_distinct`` (HyperLogLog++, mergeable
bounded state, no Expand) and keeps everything else identical.

min/max are taken over the STRING CAST of the column (named
``min_str``/``max_str`` accordingly): lexicographic bounds are
engine-portable across every type the synth tables carry, where
double formatting is not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None,
                    approx: bool = False) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_str, max_str, avg_len)."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        s = F.col(c).cast("string")
        distinct = (F.approx_count_distinct(c) if approx
                    else F.countDistinct(c))
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_nulls"),
            distinct.alias(f"{c}__n_distinct"),
            F.min(s).alias(f"{c}__min_str"),
            F.max(s).alias(f"{c}__max_str"),
            F.round(F.avg(F.length(s)), 6).alias(f"{c}__avg_len"),
        ]
    row = df.agg(*aggs)
    return (row.select(F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{c}__n_nulls").alias("n_nulls"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_str").alias("min_str"),
            F.col(f"{c}__max_str").alias("max_str"),
            F.col(f"{c}__avg_len").alias("avg_len"),
        ) for c in cols])).alias("p"))
        .select("p.*"))
