import os
import shutil
import tempfile

import pytest

from lineage_store_database_management_system_spark import Database, get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lineage-store-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_db(spark):
    path = tempfile.mkdtemp(prefix="lss_db_")
    db = Database().open(path, spark)
    yield db
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
