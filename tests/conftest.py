import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine_tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus(spark, tmp_path_factory):
    """Fixture corpus on disk (images + aoi parquet + layers.json)."""
    from gfw_raster_analysis_lambda_spark.sources.fixtures import write_fixture_corpus

    out = tmp_path_factory.mktemp("corpus")
    return write_fixture_corpus(spark, str(out))
