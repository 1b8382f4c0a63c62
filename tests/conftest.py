from __future__ import annotations

import pytest

from toyocr_spark.fixtures import write_pages_parquet
from toyocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="toyocr_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("pages_smoke"))
    write_pages_parquet(d, n=150, seed=42)
    return d


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    return os.environ.get("TOYOCR_TEST_SF_DIR", "/root/testdata/sf0.001")
