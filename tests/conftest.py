from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # default sf0.001 for speed; the driver compares at sf0.01 — run
    # `SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/` to
    # pre-check exactly what the driver will see
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
