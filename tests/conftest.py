from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")


@pytest.fixture(scope="session")
def spark():
    from etl_reporting_spark.session import get_spark

    s = get_spark("etl_reporting_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(params=["localfs", "blob"])
def wap_storage_backend(request, monkeypatch):
    """Parameterize WAP tests over the two data-plane storage
    backends: POSIX (``LocalFSStorage`` — the historical layout) and
    object-store semantics (``BlobStorage`` — flat-key LIST,
    per-object DELETE/LastModified, mkdir-is-a-no-op, commit log on a
    conditional-PUT ObjectStoreCommitStore). WAP test modules opt in
    with ``pytestmark = pytest.mark.usefixtures("wap_storage_backend")``
    — passing under BOTH params is the executable proof the table
    code never relies on POSIX filesystem semantics."""
    if request.param == "blob":
        from etl_reporting_spark.operators import table_storage, wap

        monkeypatch.setattr(
            wap, "_default_storage_factory", table_storage.BlobStorage
        )
    return request.param
