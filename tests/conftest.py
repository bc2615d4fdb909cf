import pytest

from qs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("qs_spark_tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()
