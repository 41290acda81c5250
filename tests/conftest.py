from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from data_ingestion_from_multiple_directories_linux_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    # Small core count: test speed, not throughput. Warehouse in a temp
    # dir so catalog tables (bucketing tests) never pollute the repo.
    return get_spark(
        app_name="engine-tests",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_")},
    )


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
