import pytest


@pytest.fixture(scope="session")
def spark():
    from ner_extractor_spark.session import get_spark
    s = get_spark(app_name="tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
