"""Real cloud ``ObjectStoreClient`` adapters for the WAP commit log.

``ObjectStoreCommitStore`` (operators/wap.py) needs exactly three
verbs — atomic ``put_if_absent``, strongly-consistent ``get`` on new
keys, best-effort ``list_keys`` — and each major store provides them
natively. This module is the thin adapter layer mapping the verbs
onto the vendor SDKs, import-gated the same way the Pillow codec
backend is (none of the SDKs ship in this container; the adapters'
CONTRACT is what's tested here, via the conformance suite in
tests/test_object_store_conformance.py, which every adapter — mock or
real — must pass).

Verb → API mapping (all public, documented semantics):

=============  =======================================================
store          conditional create
=============  =======================================================
S3             ``PutObject`` with ``IfNoneMatch='*'`` → HTTP 412
               ``PreconditionFailed`` when the key exists (GA since
               2024-08; before that delta-rs used a DynamoDB
               conditional write for this slot)
GCS            upload with ``if_generation_match=0`` → HTTP 412
Azure Blob     upload with ETag match condition ``'*'`` →
               ``ResourceExistsError`` / 409
=============  =======================================================

GET is read-after-write consistent for NEW keys on all three (S3
since 2020-12); commit records are immutable so no update consistency
is ever relied on. LIST may lag — ``ObjectStoreCommitStore`` never
trusts it alone (forward-probing GETs).

Semantics anchor: the reference's transactional MERGE surface
(reference connector/snowpark_connector.py:607-1004); these adapters
are how its atomicity lands on real cloud storage.
"""

from __future__ import annotations

from etl_reporting_spark.operators.wap import (
    ObjectStoreClient,
    PreconditionFailed,
)


def boto3_available() -> bool:
    try:
        import boto3  # noqa: F401

        return True
    except ImportError:
        return False


def gcs_available() -> bool:
    try:
        from google.cloud import storage  # noqa: F401

        return True
    except ImportError:
        return False


def azure_blob_available() -> bool:
    try:
        from azure.storage.blob import ContainerClient  # noqa: F401

        return True
    except ImportError:
        return False


class S3ObjectStoreClient(ObjectStoreClient):
    """boto3-shaped S3 adapter. ``bucket``/``prefix`` scope the
    client to one table's log; pass a pre-built ``client`` (e.g. with
    a custom endpoint for MinIO/localstack) or let boto3 resolve the
    default session."""

    def __init__(self, bucket: str, prefix: str = "", client=None) -> None:
        if client is None:
            import boto3

            client = boto3.client("s3")
        self.client = client
        self.bucket = bucket
        self.prefix = (prefix.rstrip("/") + "/") if prefix else ""

    def _key(self, key: str) -> str:
        return self.prefix + key

    def put_if_absent(self, key: str, data: bytes) -> None:
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._key(key),
                Body=data,
                IfNoneMatch="*",
            )
        except self.client.exceptions.ClientError as e:  # pragma: no cover
            code = e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code in (409, 412):
                raise PreconditionFailed(key) from None
            raise

    def get(self, key: str) -> bytes | None:
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._key(key)
            )
            return resp["Body"].read()
        except self.client.exceptions.NoSuchKey:
            return None

    def list_keys(self, prefix: str) -> list[str]:
        out: list[str] = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=self._key(prefix)
        ):
            for obj in page.get("Contents", ()):
                out.append(obj["Key"][len(self.prefix):])
        return sorted(out)


class GCSObjectStoreClient(ObjectStoreClient):
    """google-cloud-storage adapter: ``if_generation_match=0`` is the
    conditional create (generation 0 = "key must not exist")."""

    def __init__(self, bucket: str, prefix: str = "", client=None) -> None:
        if client is None:
            from google.cloud import storage

            client = storage.Client()
        self.bucket = client.bucket(bucket) if isinstance(bucket, str) else bucket
        self.prefix = (prefix.rstrip("/") + "/") if prefix else ""

    def put_if_absent(self, key: str, data: bytes) -> None:
        from google.api_core import exceptions as gexc

        blob = self.bucket.blob(self.prefix + key)
        try:
            blob.upload_from_string(data, if_generation_match=0)
        except gexc.PreconditionFailed:  # pragma: no cover
            raise PreconditionFailed(key) from None

    def get(self, key: str) -> bytes | None:
        from google.api_core import exceptions as gexc

        blob = self.bucket.blob(self.prefix + key)
        try:
            return blob.download_as_bytes()
        except gexc.NotFound:
            return None

    def list_keys(self, prefix: str) -> list[str]:
        return sorted(
            b.name[len(self.prefix):]
            for b in self.bucket.list_blobs(prefix=self.prefix + prefix)
        )


class AzureBlobObjectStoreClient(ObjectStoreClient):
    """azure-storage-blob adapter: upload with ``overwrite=False`` is
    the conditional create (409 ResourceExists on conflict)."""

    def __init__(self, container_client, prefix: str = "") -> None:
        self.container = container_client
        self.prefix = (prefix.rstrip("/") + "/") if prefix else ""

    def put_if_absent(self, key: str, data: bytes) -> None:
        from azure.core.exceptions import ResourceExistsError

        try:
            self.container.upload_blob(
                name=self.prefix + key, data=data, overwrite=False
            )
        except ResourceExistsError:  # pragma: no cover
            raise PreconditionFailed(key) from None

    def get(self, key: str) -> bytes | None:
        from azure.core.exceptions import ResourceNotFoundError

        try:
            return (
                self.container.download_blob(self.prefix + key).readall()
            )
        except ResourceNotFoundError:
            return None

    def list_keys(self, prefix: str) -> list[str]:
        return sorted(
            b.name[len(self.prefix):]
            for b in self.container.list_blobs(
                name_starts_with=self.prefix + prefix
            )
        )
