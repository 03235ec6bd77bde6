import pytest


@pytest.fixture(scope="session")
def spark():
    from arkhammirror_spark.session import get_spark

    # ANSI on: the driver's default Spark-4 session runs ANSI mode, so every
    # query must survive it (overflow/invalid-cast become errors, not wraps)
    s = get_spark(
        "arkhammirror-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra={"spark.sql.ansi.enabled": "true"},
    )
    yield s
    s.stop()
