import pytest

from hyperpolyglot_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hyperpolyglot_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
