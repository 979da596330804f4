"""Column profiler (operators/profile.py): null accounting, bounds,
exact-vs-approx cardinality mode agreement."""

from ner_extractor_spark.operators.profile import profile_columns


def _df(spark):
    return spark.createDataFrame(
        [(1, "aa", None), (2, "bb", "x"), (3, None, "x"), (3, "bb", "y")],
        "id long, s string, t string")


def test_profile_exact(spark):
    out = {r["col_name"]: r.asDict()
           for r in profile_columns(_df(spark)).collect()}
    assert set(out) == {"id", "s", "t"}
    assert all(v["n_rows"] == 4 for v in out.values())
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 3
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["t"]["n_nulls"] == 1 and out["t"]["n_distinct"] == 2
    # bounds are over the string cast (lexicographic, engine-portable)
    assert (out["id"]["min_str"], out["id"]["max_str"]) == ("1", "3")
    assert out["s"]["avg_len"] == 2.0


def test_profile_approx_mode(spark):
    """approx=True swaps ONLY the cardinality aggregate (HLL++, no
    n-column Expand in the plan); every other statistic is identical
    and n_distinct agrees exactly at this tiny cardinality."""
    df = _df(spark)
    exact = {r["col_name"]: r.asDict()
             for r in profile_columns(df).collect()}
    approx = {r["col_name"]: r.asDict()
              for r in profile_columns(df, approx=True).collect()}
    for c in exact:
        e, a = exact[c], approx[c]
        assert a["n_distinct"] == e["n_distinct"]
        for k in ("n_rows", "n_nulls", "min_str", "max_str", "avg_len"):
            assert a[k] == e[k]
    plan = (profile_columns(df, approx=True)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Expand" not in plan, plan


def test_profile_column_subset(spark):
    out = profile_columns(_df(spark), cols=["s"]).collect()
    assert [r["col_name"] for r in out] == ["s"]
