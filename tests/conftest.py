import pytest

from barefoot_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="barefoot-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
