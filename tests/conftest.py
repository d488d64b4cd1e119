import pytest

from rex_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    # small local session for tests: 4 threads, few shuffle partitions
    s = get_session(master="local[4]", shuffle_partitions=4, app_name="rex_spark_tests")
    yield s
    s.stop()
