import pytest

from docs2kg_spark.fixtures import gen_transcripts, transcripts_pandas
from docs2kg_spark.oracle import ReferenceOracle
from docs2kg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="docs2kg_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_rows():
    return gen_transcripts(50, 10, seed=7)


@pytest.fixture(scope="session")
def transcripts_df(spark):
    return spark.createDataFrame(transcripts_pandas(50, 10, seed=7)).cache()


@pytest.fixture(scope="session")
def oracle_result(fixture_rows):
    return ReferenceOracle().run(fixture_rows)
