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
        # …and against a REAL SOCKET (round-12): the full botocore
        # HTTP stack — SigV4, 100-continue, paginator round-trips,
        # XML error parsing — hits tools/localhost_s3.py's endpoint,
        # so the CAS-contention race runs through genuine TCP
        params.append("s3-localhost")
    bucket = os.environ.get("WAP_CONFORMANCE_S3_BUCKET")
    if bucket and _boto3_available():
        params.append("s3")
    return params


@pytest.fixture(scope="module")
def s3_localhost_server():
    from tools.localhost_s3 import LocalhostS3Server

    with LocalhostS3Server() as srv:
        yield srv


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
    if request.param == "s3-localhost":
        import uuid

        from etl_reporting_spark.operators.object_store_adapters import (
            S3ObjectStoreClient,
        )

        srv = request.getfixturevalue("s3_localhost_server")
        # unique prefix per test: the module-scoped server's key space
        # persists, exactly like a real bucket between suite runs
        return S3ObjectStoreClient(
            "conformance-bucket",
            prefix=f"tables/{uuid.uuid4().hex}",
            client=srv.client(),
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


# ----------------------------------------------- GCS/Azure adapters
# The GCS and Azure SDKs are uninstallable here (like Pillow), so the
# adapters' mapping logic would otherwise ship unexecuted. Same move
# as the stub-PIL golden tests: inject faithful stub SDK modules into
# sys.modules — real exception TYPES the adapter catches, real call
# signatures — and drive the REAL adapter code through the shared
# contract shapes (conditional create, get-absent, list prefix).


class _FakeGCSBlob:
    def __init__(self, store, name):
        self._store, self.name = store, name

    def upload_from_string(self, data, if_generation_match=None):
        import sys

        exc = sys.modules["google.api_core.exceptions"]
        if if_generation_match == 0 and self.name in self._store:
            raise exc.PreconditionFailed("exists")
        self._store[self.name] = (
            data.encode() if isinstance(data, str) else bytes(data)
        )

    def download_as_bytes(self):
        import sys

        exc = sys.modules["google.api_core.exceptions"]
        if self.name not in self._store:
            raise exc.NotFound("absent")
        return self._store[self.name]


class _FakeGCSBucket:
    def __init__(self):
        self._store: dict[str, bytes] = {}

    def blob(self, name):
        return _FakeGCSBlob(self._store, name)

    def list_blobs(self, prefix=""):
        class _B:
            def __init__(self, name):
                self.name = name

        return [_B(n) for n in sorted(self._store) if n.startswith(prefix)]


@pytest.fixture()
def gcs_client(monkeypatch):
    import sys
    import types

    exc_mod = types.ModuleType("google.api_core.exceptions")

    class PreconditionFailed(Exception):
        pass

    class NotFound(Exception):
        pass

    exc_mod.PreconditionFailed = PreconditionFailed
    exc_mod.NotFound = NotFound
    api_core = types.ModuleType("google.api_core")
    api_core.exceptions = exc_mod
    google = types.ModuleType("google")
    google.api_core = api_core
    monkeypatch.setitem(sys.modules, "google", google)
    monkeypatch.setitem(sys.modules, "google.api_core", api_core)
    monkeypatch.setitem(sys.modules, "google.api_core.exceptions", exc_mod)

    from etl_reporting_spark.operators.object_store_adapters import (
        GCSObjectStoreClient,
    )

    return GCSObjectStoreClient(_FakeGCSBucket(), prefix="tbl/_wap")


def test_gcs_adapter_contract(gcs_client):
    assert gcs_client.get("commit-00001.json") is None
    gcs_client.put_if_absent("commit-00001.json", b'{"v":1}')
    assert gcs_client.get("commit-00001.json") == b'{"v":1}'
    with pytest.raises(PreconditionFailed):
        gcs_client.put_if_absent("commit-00001.json", b"dup")
    assert gcs_client.get("commit-00001.json") == b'{"v":1}'
    gcs_client.put_if_absent("commit-00002.json", b"2")
    assert gcs_client.list_keys("commit-") == [
        "commit-00001.json",
        "commit-00002.json",
    ]


class _FakeAzureDownload:
    def __init__(self, data):
        self._data = data

    def readall(self):
        return self._data


class _FakeAzureContainer:
    def __init__(self):
        self._store: dict[str, bytes] = {}

    def upload_blob(self, name, data, overwrite=False):
        import sys

        exc = sys.modules["azure.core.exceptions"]
        if not overwrite and name in self._store:
            raise exc.ResourceExistsError("exists")
        self._store[name] = bytes(data)

    def download_blob(self, name):
        import sys

        exc = sys.modules["azure.core.exceptions"]
        if name not in self._store:
            raise exc.ResourceNotFoundError("absent")
        return _FakeAzureDownload(self._store[name])

    def list_blobs(self, name_starts_with=""):
        class _B:
            def __init__(self, name):
                self.name = name

        return [
            _B(n)
            for n in sorted(self._store)
            if n.startswith(name_starts_with)
        ]


@pytest.fixture()
def azure_client(monkeypatch):
    import sys
    import types

    exc_mod = types.ModuleType("azure.core.exceptions")

    class ResourceExistsError(Exception):
        pass

    class ResourceNotFoundError(Exception):
        pass

    exc_mod.ResourceExistsError = ResourceExistsError
    exc_mod.ResourceNotFoundError = ResourceNotFoundError
    core = types.ModuleType("azure.core")
    core.exceptions = exc_mod
    azure = types.ModuleType("azure")
    azure.core = core
    monkeypatch.setitem(sys.modules, "azure", azure)
    monkeypatch.setitem(sys.modules, "azure.core", core)
    monkeypatch.setitem(sys.modules, "azure.core.exceptions", exc_mod)

    from etl_reporting_spark.operators.object_store_adapters import (
        AzureBlobObjectStoreClient,
    )

    return AzureBlobObjectStoreClient(_FakeAzureContainer(), prefix="tbl/_wap")


def test_azure_adapter_contract(azure_client):
    assert azure_client.get("commit-00001.json") is None
    azure_client.put_if_absent("commit-00001.json", b'{"v":1}')
    assert azure_client.get("commit-00001.json") == b'{"v":1}'
    with pytest.raises(PreconditionFailed):
        azure_client.put_if_absent("commit-00001.json", b"dup")
    assert azure_client.get("commit-00001.json") == b'{"v":1}'
    azure_client.put_if_absent("commit-00002.json", b"2")
    assert azure_client.list_keys("commit-") == [
        "commit-00001.json",
        "commit-00002.json",
    ]


def test_gcs_and_azure_compose_with_commit_store(gcs_client, azure_client):
    """End-to-end: the CommitStore CAS protocol over BOTH adapters."""
    for cl in (gcs_client, azure_client):
        store = ObjectStoreCommitStore(cl)
        store.publish(1, b"one")
        with pytest.raises(CommitConflict):
            store.publish(1, b"dup")
        assert store.read(1) == b"one" and store.max_version() == 1
