"""Contract lint (VERDICT r04 #1): the driver's correctness gate
canonicalizes results with pandas sort_values/factorize, which throws
`TypeError: unhashable type: 'list'` on any TOP-LEVEL array or map
column — that is how `text_hashed_embed` and `text_winnow` went
driver-red in round 4 despite being locally oracle-green.  This lint
makes that class of red row structurally impossible: every
``queries()`` entry must project only driver-sortable scalar columns
(operators may keep array outputs; the CONTRACT layer serializes or
explodes them).
"""

import sys
from pathlib import Path

from pyspark.sql.types import ArrayType, MapType

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


def test_contract_schemas_have_no_top_level_array_or_map(spark):
    import __spark_entry__ as E

    bad = {}
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        offenders = [f.name for f in df.schema.fields
                     if isinstance(f.dataType, (ArrayType, MapType))]
        if offenders:
            bad[name] = offenders
    assert not bad, f"driver-unsortable contract columns: {bad}"


def test_every_query_has_an_oracle_or_documented_exemption(spark):
    """Every queries() entry is either DuckDB-oracle-checked or on the
    explicit rows-only list (MLlib-internal numerics by design)."""
    import __spark_entry__ as E

    ROWS_ONLY = {"embed_kmeans"}
    q, o = set(E.queries()), set(E.oracle_sql())
    assert q - o == ROWS_ONLY, sorted(q - o)
    assert not (o - q), sorted(o - q)
