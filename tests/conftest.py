import pytest

from wrangler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=4, app_name="wrangler-tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def one_col(spark):
    """Single 'body' string column — the reference's canonical test shape
    (TestingRig pattern, TestingRig.java:79-95)."""

    def make(*values: str):
        return spark.createDataFrame([(v,) for v in values], "body string")

    return make
