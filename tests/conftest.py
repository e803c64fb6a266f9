import shutil
import tempfile

import pytest

from gcp_datalake_pipeline_spark.session import get_spark
from gcp_datalake_pipeline_spark.storage import Catalog

FIXTURES = "tests/fixtures"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def catalog(spark):
    root = tempfile.mkdtemp(prefix="engine_catalog_")
    yield Catalog(spark, root)
    shutil.rmtree(root, ignore_errors=True)
