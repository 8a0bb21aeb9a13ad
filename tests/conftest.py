from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def spark():
    from tspider_spark.session import get_spark

    spark = get_spark("tspider-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
