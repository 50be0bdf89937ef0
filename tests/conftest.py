import pytest


@pytest.fixture(scope="session")
def spark():
    from olake_spark.session import get_spark

    s = get_spark("olake-tests", cores=8, shuffle_partitions=8)
    yield s
