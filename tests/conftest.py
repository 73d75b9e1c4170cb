import pytest

from fastpasta_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fastpasta_spark_tests", cores=8)
    yield s
