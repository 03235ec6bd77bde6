import pytest


@pytest.fixture(scope="session")
def spark():
    from arkhammirror_spark.session import get_spark

    s = get_spark("arkhammirror-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
