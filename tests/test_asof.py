"""As-of join semantics: backward inclusive match, left-join nulls,
tolerance cutoff, multi-key, plan shape (window, no cartesian)."""

import datetime as dt

from ner_extractor_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30)), (3, "u", _ts(5)),
         (4, "v", _ts(20))],
        "lid int, user string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts(10)), (101, "u", _ts(25)), (102, "v", _ts(60))],
        "rid int, user string, ts timestamp")
    return left, right


def test_backward_inclusive_and_left_nulls(spark):
    left, right = _frames(spark)
    out = {r["lid"]: r["r_rid"]
           for r in asof_join(left, right, on="user").collect()}
    assert out[1] == 100      # equal ts matches (inclusive <=)
    assert out[2] == 101      # latest at-or-before wins
    assert out[3] is None     # nothing precedes -> null, row kept
    assert out[4] is None     # other key's rows never leak across


def test_strict_duplicate_right_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    left, right = _frames(spark)
    # clean right side: strict output == default output
    a = sorted(map(tuple, asof_join(left, right, on="user").collect()))
    b = sorted(map(tuple,
                   asof_join(left, right, on="user", strict=True).collect()))
    assert a == b
    # duplicated (key, ts) on the right: default silently picks one,
    # strict raises
    dup = right.unionByName(
        spark.createDataFrame([(999, "u", _ts(25))],
                              "rid int, user string, ts timestamp"))
    assert asof_join(left, dup, on="user").count() == 4
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="duplicate"):
        asof_join(left, dup, on="user", strict=True).collect()


def test_tolerance_cutoff(spark):
    left, right = _frames(spark)
    out = {r["lid"]: r["r_rid"]
           for r in asof_join(left, right, on="user",
                              tolerance_s=4 * 60).collect()}
    assert out[1] == 100      # gap 0 <= 4 min
    assert out[2] is None     # gap 5 min > tolerance -> nulled
    assert len(out) == 4      # tolerance nulls, never drops rows


def test_asof_matches_pandas_merge_asof(spark):
    """Independent reference: pandas.merge_asof (backward, exact matches
    allowed) on randomized keyed series must agree row for row."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    lrows = [(i, f"u{rng.randint(4)}", _ts(int(rng.randint(0, 500))))
             for i in range(120)]
    # unique (key, ts) on the right — the operator's determinism contract
    seen, rrows = set(), []
    for i in range(80):
        k = (f"u{rng.randint(4)}", int(rng.randint(0, 500)))
        if k not in seen:
            seen.add(k)
            rrows.append((1000 + i, k[0], _ts(k[1])))
    left = spark.createDataFrame(lrows, "lid int, user string, ts timestamp")
    right = spark.createDataFrame(rrows, "rid int, user string, ts timestamp")

    got = {r["lid"]: r["r_rid"]
           for r in asof_join(left, right, on="user").collect()}

    lp = pd.DataFrame(lrows, columns=["lid", "user", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "user", "ts"]).sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="user", direction="backward")
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()}
    assert got == want and any(v is not None for v in got.values())


def test_range_join_matches_naive_between(spark):
    from ner_extractor_spark.operators.asof import range_join
    left = spark.createDataFrame(
        [(i, "u" if i % 3 else "v", _ts(i * 7)) for i in range(40)],
        "lid int, user string, ts timestamp")
    # intervals of varied width, some spanning many buckets
    right = spark.createDataFrame(
        [(100, "u", _ts(10), _ts(25)), (101, "u", _ts(60), _ts(200)),
         (102, "v", _ts(0), _ts(5)), (103, "u", _ts(24), _ts(26))],
        "rid int, user string, start_ts timestamp, end_ts timestamp")
    got = range_join(left, right, on="user", bucket_s=600)
    naive = (left.join(right, on="user")
             .filter("ts between start_ts and end_ts")
             .select("lid", "rid"))
    g = sorted((r["lid"], r["r_rid"]) for r in got.collect())
    assert g == sorted(map(tuple, naive.collect())) and len(g) > 5
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_plan_is_window_not_cartesian(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, on="user")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
