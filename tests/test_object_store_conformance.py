"""Object-store client CONFORMANCE suite.

The WAP commit log is exactly as correct as its ``ObjectStoreClient``
honors three promises (operators/wap.py docstrings): atomic
``put_if_absent`` (complete payload or PreconditionFailed, never a
torn write, exactly one winner under a race), read-after-write ``get``
on new keys, and prefix ``list_keys`` that may lag but never lies
about what it returns. This module states those promises as a
parameterized test battery: every client — the in-memory mock, the
local-dir blob emulation, and (when an SDK + credentials are present)
the real S3/GCS/Azure adapters — must pass the SAME tests.

To run it against a real bucket: export
``WAP_CONFORMANCE_S3_BUCKET=<bucket>[/prefix]`` with boto3 installed
and credentials resolvable; the suite picks it up as one more param.
Without that the cloud adapters are import-gated out exactly like the
Pillow codec backend (this container has none of the SDKs), and the
mock + local-dir params are the executable contract.

No SparkSession needed — this is pure control-plane code.
"""

from __future__ import annotations

import os
import threading

import pytest

from etl_reporting_spark.operators.table_storage import LocalDirObjectStore
from etl_reporting_spark.operators.wap import (
    CommitConflict,
    InMemoryObjectStore,
    ObjectStoreCommitStore,
    PreconditionFailed,
)


def _boto3_available() -> bool:
    from etl_reporting_spark.operators.object_store_adapters import (
        boto3_available,
    )

    return boto3_available()


def _client_params():
    params = ["inmemory", "localdir"]
    if _boto3_available():
        # the REAL boto3-shaped adapter, driven against the in-memory
        # fake of the S3 client API (object_store_adapters.
        # InMemoryS3Client: real botocore ClientError shapes, real
        # paginator protocol) — the adapter's mapping logic runs in
        # CI even though no bucket exists here
        params.append("s3-fake")
    bucket = os.environ.get("WAP_CONFORMANCE_S3_BUCKET")
    if bucket and _boto3_available():
        params.append("s3")
    return params


@pytest.fixture(params=_client_params())
def client(request, tmp_path):
    if request.param == "inmemory":
        return InMemoryObjectStore()
    if request.param == "localdir":
        return LocalDirObjectStore(str(tmp_path / "blobs"))
    if request.param == "s3-fake":
        from etl_reporting_spark.operators.object_store_adapters import (
            InMemoryS3Client,
            S3ObjectStoreClient,
        )

        return S3ObjectStoreClient(
            "conformance-bucket", prefix="tables/t1", client=InMemoryS3Client()
        )
    if request.param == "s3":
        import uuid

        from etl_reporting_spark.operators.object_store_adapters import (
            S3ObjectStoreClient,
        )

        spec = os.environ["WAP_CONFORMANCE_S3_BUCKET"]
        bucket, _, prefix = spec.partition("/")
        return S3ObjectStoreClient(
            bucket, prefix=f"{prefix or 'wap-conformance'}/{uuid.uuid4().hex}"
        )
    raise AssertionError(request.param)


def test_get_absent_key_is_none(client):
    assert client.get("never/written") is None


def test_put_then_get_roundtrip(client):
    client.put_if_absent("a/b/one.json", b'{"v": 1}')
    assert client.get("a/b/one.json") == b'{"v": 1}'


def test_put_if_absent_conflict_preserves_first_write(client):
    client.put_if_absent("slot.json", b"winner")
    with pytest.raises(PreconditionFailed):
        client.put_if_absent("slot.json", b"loser")
    # the losing PUT must not have torn or replaced the payload
    assert client.get("slot.json") == b"winner"


def test_threaded_race_exactly_one_winner(client):
    """Eight real threads race one key; the conditional PUT must
    admit exactly one COMPLETE payload — this is the property the
    whole commit protocol rests on."""
    n = 8
    barrier = threading.Barrier(n)
    outcomes: list[str] = []
    lock = threading.Lock()

    def writer(i: int) -> None:
        payload = (f"payload-from-writer-{i}-" * 64).encode()
        try:
            barrier.wait(timeout=30)
            client.put_if_absent("raced.json", payload)
            with lock:
                outcomes.append(f"win:{i}")
        except PreconditionFailed:
            with lock:
                outcomes.append(f"lose:{i}")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    wins = [o for o in outcomes if o.startswith("win:")]
    assert len(wins) == 1 and len(outcomes) == n, outcomes
    winner = int(wins[0].split(":")[1])
    assert client.get("raced.json") == (
        f"payload-from-writer-{winner}-" * 64
    ).encode()


def test_list_keys_prefix_filtering(client):
    client.put_if_absent("log/commit-00001.json", b"1")
    client.put_if_absent("log/commit-00002.json", b"2")
    client.put_if_absent("other/commit-00009.json", b"9")
    listed = client.list_keys("log/")
    assert "log/commit-00001.json" in listed
    assert "log/commit-00002.json" in listed
    assert all(k.startswith("log/") for k in listed)


def test_commit_store_composition(client):
    """The CommitStore built on any conforming client behaves like a
    commit log: CAS publish, exact read-back, correct max_version."""
    store = ObjectStoreCommitStore(client, prefix="tbl/_wap")
    assert store.max_version() == 0
    store.publish(1, b'{"version": 1}')
    store.publish(2, b'{"version": 2}')
    with pytest.raises(CommitConflict):
        store.publish(2, b'{"version": "dup"}')
    assert store.read(1) == b'{"version": 1}'
    assert store.read(2) == b'{"version": 2}'
    assert store.read(3) is None
    assert store.max_version() == 2


def test_max_version_survives_listing_lag():
    """Client-specific companion: with a listing that hides recent
    puts (the weakest LIST any store documented), max_version must
    still answer correctly via forward-probing GETs. Runs on the
    in-memory mock, which can inject the lag deterministically."""
    lagged = InMemoryObjectStore(list_lag=2)
    store = ObjectStoreCommitStore(lagged, prefix="t/_wap")
    for v in range(1, 5):
        store.publish(v, f'{{"version": {v}}}'.encode())
    # LIST hides commit-4 and commit-3; GET probing must find them
    assert store.max_version() == 4
