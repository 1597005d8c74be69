from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from datatransformertools_spark import get_spark

    s = get_spark("dtt-tests")
    yield s
    from datatransformertools_spark.caching import release_caches

    release_caches()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
