"""Contract tests for the REAL S3 data-plane adapter
(object_store_adapters.S3TableStorage), driven against the in-memory
boto3-API fake — every seam verb plus the derived helpers the WAP
table actually uses, so the adapter's mapping logic executes in CI
where no bucket can. The BlobStorage-parameterized WAP suite proves
wap.py needs ONLY these verbs; these tests prove the verbs are
implemented correctly over the S3 API — together the composition is
covered without network.
"""

from __future__ import annotations

import pytest

pytest.importorskip("botocore")

from etl_reporting_spark.operators.object_store_adapters import (  # noqa: E402
    InMemoryS3Client,
    S3TableStorage,
)


@pytest.fixture()
def fs():
    client = InMemoryS3Client()
    storage = S3TableStorage("lake", "tables/fact", client=client)
    # lay down a two-commit-root table shape, plus commit log keys
    for key, body in [
        ("tables/fact/d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet", b"a0"),
        ("tables/fact/d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet", b"a1"),
        ("tables/fact/d-aaaaaaaaaaaa/ds=2026-01-02/part-0.parquet", b"a2"),
        ("tables/fact/d-bbbbbbbbbbbb/ds=2026-01-02/part-0.parquet", b"b0"),
        ("tables/fact/d-bbbbbbbbbbbb/_dv/part-0.parquet", b"dv"),
        ("tables/fact/_wap/commit-00001.json", b"{}"),
    ]:
        client.put_object(Bucket="lake", Key=key, Body=body)
    return storage


def test_urls_are_s3a_and_absolute(fs):
    assert fs.url("d-aaaaaaaaaaaa/ds=2026-01-01") == (
        "s3a://lake/tables/fact/d-aaaaaaaaaaaa/ds=2026-01-01"
    )
    assert fs.absolute_url("x") == fs.url("x")
    # resolve passes external pointers through untouched
    assert fs.resolve("s3a://other/t/d-cccccccccccc/ds=1") == (
        "s3a://other/t/d-cccccccccccc/ds=1"
    )


def test_list_prefix_scopes_and_exact_object(fs):
    assert fs.list_prefix("d-aaaaaaaaaaaa") == [
        "d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet",
        "d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet",
        "d-aaaaaaaaaaaa/ds=2026-01-02/part-0.parquet",
    ]
    # an exact object key lists as itself (the seam contract)
    assert fs.list_prefix(
        "d-bbbbbbbbbbbb/_dv/part-0.parquet"
    ) == ["d-bbbbbbbbbbbb/_dv/part-0.parquet"]
    assert fs.list_prefix("no/such/prefix") == []


def test_derived_helpers_over_s3_keys(fs):
    assert fs.leaf_partition_dirs("d-aaaaaaaaaaaa") == [
        "ds=2026-01-01",
        "ds=2026-01-02",
    ]
    # _dv is not a hive leaf
    assert fs.leaf_partition_dirs("d-bbbbbbbbbbbb") == ["ds=2026-01-02"]
    assert fs.list_files("d-aaaaaaaaaaaa/ds=2026-01-01") == [
        "part-0.parquet",
        "part-1.parquet",
    ]
    assert set(fs.top_roots()) == {"d-aaaaaaaaaaaa", "d-bbbbbbbbbbbb", "_wap"}


def test_delete_key_reports_existence(fs):
    assert fs.delete_key("d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet")
    assert not fs.delete_key("d-aaaaaaaaaaaa/ds=2026-01-01/part-1.parquet")
    assert fs.list_files("d-aaaaaaaaaaaa/ds=2026-01-01") == ["part-0.parquet"]


def test_delete_prefix_batches(fs):
    assert fs.delete_prefix("d-aaaaaaaaaaaa") == 3
    assert fs.list_prefix("d-aaaaaaaaaaaa") == []
    assert fs.exists("d-bbbbbbbbbbbb")  # untouched


def test_last_modified_is_per_object(fs):
    assert fs.last_modified(
        "d-bbbbbbbbbbbb/_dv/part-0.parquet"
    ) == pytest.approx(__import__("time").time(), abs=60)
    # directories do not exist on object stores
    assert fs.last_modified("d-bbbbbbbbbbbb/_dv") is None
    assert fs.last_modified("absent.parquet") is None


def test_default_commit_store_is_conditional_put(fs):
    from etl_reporting_spark.operators.wap import CommitConflict

    store = fs.default_commit_store()
    assert store.max_version() == 1  # sees the seeded commit-00001
    store.publish(2, b'{"version": 2}')
    with pytest.raises(CommitConflict):
        store.publish(2, b"dup")
    assert store.read(2) == b'{"version": 2}'
    assert store.max_version() == 2


def test_relativize_strips_scheme_bucket_prefix(fs):
    uri = "s3a://lake/tables/fact/d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet"
    assert fs.relativize(uri) == "d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet"
    # %-encoded partition values decode like the local backends
    uri2 = "s3a://lake/tables/fact/d-aaaaaaaaaaaa/ds=a%2Fb/f.parquet"
    assert fs.relativize(uri2) == "d-aaaaaaaaaaaa/ds=a/b/f.parquet"
    with pytest.raises(ValueError):
        fs.relativize("s3a://lake/other/place/f.parquet")


def test_list_files_at_external_clone_source(fs):
    fs.client.put_object(
        Bucket="srcbucket",
        Key="src/tbl/d-cccccccccccc/ds=1/part-0.parquet",
        Body=b"x",
    )
    assert fs.list_files_at(
        "s3a://srcbucket/src/tbl/d-cccccccccccc/ds=1"
    ) == ["part-0.parquet"]


def test_transient_errors_propagate_not_absent(fs):
    """503 SlowDown / 403 AccessDenied on HEAD must RAISE, never read
    as "object absent" — a throttled delete_key reporting False would
    make vacuum under-delete silently, and a throttled list_prefix
    would fall through to a (possibly also throttled) LIST. Only a
    genuine 404 means absent (round-10 ADVICE fix)."""
    import botocore.exceptions

    def throttled(Bucket, Key):
        raise botocore.exceptions.ClientError(
            {
                "Error": {"Code": "SlowDown"},
                "ResponseMetadata": {"HTTPStatusCode": 503},
            },
            "HeadObject",
        )

    real_head = fs.client.head_object
    fs.client.head_object = throttled
    try:
        with pytest.raises(botocore.exceptions.ClientError):
            fs.delete_key("d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet")
        with pytest.raises(botocore.exceptions.ClientError):
            fs.list_prefix("d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet")
        with pytest.raises(botocore.exceptions.ClientError):
            fs.last_modified("d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet")
    finally:
        fs.client.head_object = real_head
    # the object was NOT deleted behind the throttle
    assert fs.last_modified(
        "d-aaaaaaaaaaaa/ds=2026-01-01/part-0.parquet"
    ) is not None
    # and a real 404 still reads as absent, not an error
    assert fs.delete_key("nope/missing.parquet") is False
    assert fs.last_modified("nope/missing.parquet") is None
