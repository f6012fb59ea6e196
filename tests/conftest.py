import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from paimon_spark.session import get_spark
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture()
def wh(tmp_path):
    yield str(tmp_path / "wh")


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
