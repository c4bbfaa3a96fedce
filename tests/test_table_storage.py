"""Direct contract tests for the TableStorage seam's local backends
(LocalFSStorage and the object-store-semantics BlobStorage) — the
same verb battery tests/test_s3_table_storage.py runs against the S3
adapter, so all three implementations are pinned to one contract.
The WAP suites cover the seam transitively; these pin each verb's
semantics in isolation (flat LIST, exact-object listing, per-object
delete, hive-leaf derivation, orphan LastModified) so a backend
regression fails here with a one-line diff instead of somewhere deep
in a lifecycle test. No SparkSession needed."""

from __future__ import annotations

import os

import pytest

from etl_reporting_spark.operators.table_storage import (
    BlobStorage,
    LocalFSStorage,
    is_external,
)

LAYOUT = [
    ("d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet", b"a0"),
    ("d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet", b"a1"),
    ("d-aaaaaaaaaaaa/ds=2026-01-02/part-0.parquet", b"a2"),
    ("d-bbbbbbbbbbbb/ds=2026-01-02/part-0.parquet", b"b0"),
    ("d-bbbbbbbbbbbb/_dv/part-0.parquet", b"dv"),
    ("_wap/commit-00001.json", b"{}"),
]


@pytest.fixture(params=["localfs", "blob"])
def fs(request, tmp_path):
    root = str(tmp_path / "tbl")
    storage = (
        LocalFSStorage(root) if request.param == "localfs" else BlobStorage(root)
    )
    for rel, body in LAYOUT:
        full = os.path.join(root, rel.replace("/", os.sep))
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as fh:
            fh.write(body)
    return storage


def test_list_prefix_flat_scoped_and_exact(fs):
    assert fs.list_prefix("d-aaaaaaaaaaaa") == [
        "d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet",
        "d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet",
        "d-aaaaaaaaaaaa/ds=2026-01-02/part-0.parquet",
    ]
    assert fs.list_prefix("d-bbbbbbbbbbbb/_dv/part-0.parquet") == [
        "d-bbbbbbbbbbbb/_dv/part-0.parquet"
    ]
    assert fs.list_prefix("no/such") == []


def test_derived_helpers(fs):
    assert fs.leaf_partition_dirs("d-aaaaaaaaaaaa") == [
        "ds=2026-01-01",
        "ds=2026-01-02",
    ]
    assert fs.leaf_partition_dirs("d-bbbbbbbbbbbb") == ["ds=2026-01-02"]
    assert fs.list_files("d-aaaaaaaaaaaa/ds=2026-01-01") == [
        "part-0.parquet",
        "part-1.parquet",
    ]
    assert {"d-aaaaaaaaaaaa", "d-bbbbbbbbbbbb", "_wap"} <= set(fs.top_roots())
    assert fs.exists("d-bbbbbbbbbbbb/_dv")
    assert not fs.exists("d-cccccccccccc")


def test_delete_key_and_prefix(fs):
    assert fs.delete_key("d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet")
    assert not fs.delete_key("d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet")
    assert fs.delete_prefix("d-aaaaaaaaaaaa") >= 2
    assert fs.list_prefix("d-aaaaaaaaaaaa") == []
    assert fs.exists("d-bbbbbbbbbbbb")  # untouched


def test_last_modified_objects_only(fs):
    import time

    got = fs.last_modified("d-bbbbbbbbbbbb/_dv/part-0.parquet")
    assert got == pytest.approx(time.time(), abs=120)
    assert fs.last_modified("absent.parquet") is None
    if isinstance(fs, BlobStorage):
        # object stores have no directories, hence no dir mtimes
        assert fs.last_modified("d-bbbbbbbbbbbb/_dv") is None


def test_resolve_and_external_pointers(fs):
    assert fs.resolve("d-bbbbbbbbbbbb/ds=2026-01-02") == fs.url(
        "d-bbbbbbbbbbbb/ds=2026-01-02"
    )
    for ext in ("/abs/src/d-cccccccccccc/ds=1", "s3a://bkt/t/d-cccccccccccc"):
        assert is_external(ext) and fs.resolve(ext) == ext
    assert not is_external("d-aaaaaaaaaaaa/ds=2026-01-01")


def test_relativize_roundtrip(fs):
    uri = "file:" + fs.absolute_url(
        "d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet"
    )
    assert fs.relativize(uri) == "d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet"


def test_default_commit_store_cas(fs):
    from etl_reporting_spark.operators.wap import CommitConflict

    store = fs.default_commit_store()
    assert store.max_version() == 1  # sees the seeded commit-00001
    store.publish(2, b'{"version": 2}')
    with pytest.raises(CommitConflict):
        store.publish(2, b"dup")
    assert store.read(2) == b'{"version": 2}'
    assert store.max_version() == 2


def test_blob_delete_prunes_empty_emulation_dirs(tmp_path):
    """Emulation housekeeping: after per-object deletes empty backing
    dirs are pruned, so the blob backend's top_roots (derived from
    keys) and the on-disk state cannot drift apart."""
    root = str(tmp_path / "b")
    fs = BlobStorage(root)
    full = os.path.join(root, "d-aaaaaaaaaaaa", "ds=1")
    os.makedirs(full)
    with open(os.path.join(full, "f.parquet"), "wb") as fh:
        fh.write(b"x")
    assert fs.delete_prefix("d-aaaaaaaaaaaa") == 1
    assert not os.path.exists(os.path.join(root, "d-aaaaaaaaaaaa"))
    assert os.path.isdir(root)  # never prunes past the table root
