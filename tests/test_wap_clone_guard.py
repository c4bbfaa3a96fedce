"""Clone-vacuum safety guard (round-11 brief #1 — the last silent
data-corruption path in the transactional layer).

Historically (through round 10) ``clone_table`` carried Delta's
caveat verbatim: a source ``vacuum`` could collect files a live
zero-copy clone still referenced, silently breaking the clone. Now
cloning registers itself on the source (``_clones/<token>.json``,
written through the storage seam BEFORE the clone's first publish),
and vacuum:

- KEEPS every snapshot a registered live clone pins, even outside
  the ``keep_last`` window,
- warns loudly (``CloneRetentionWarning``) when a pin is what holds
  space,
- reclaims after ``release_clone(token)`` or once the clone's commit
  log is verifiably gone,
- collects anyway only under the explicit ``ignore_clones=True``.

Every test runs on BOTH storage backends (POSIX + object-store
semantics) via the conftest fixture — the registration path is pure
seam verbs (PUT/GET/LIST/DELETE of one small object).

Reference anchor: the staging-then-MERGE atomicity pattern the WAP
layer protects (reference connector/snowpark_connector.py:607-688);
the registry is the missing pin that makes the clone primitive safe
to combine with retention.
"""

from __future__ import annotations

import random
import shutil
import warnings as _w

import pytest

pytestmark = pytest.mark.usefixtures("wap_storage_backend")

from etl_reporting_spark.operators.wap import (
    CloneRetentionWarning,
    WapTable,
    clone_table,
    create_partitioned_wap_table,
    create_wap_table,
    optimize_partitions,
)


def _mkfact(spark, path, n=20):
    df = spark.createDataFrame(
        [
            (i, "2026-01-01" if i % 2 else "2026-01-02", float(i))
            for i in range(1, n + 1)
        ],
        "id long, ds string, amount double",
    )
    return create_partitioned_wap_table(spark, path, df, ["ds"])


def _churn(spark, t, version_tag: int):
    """One full rewrite of both partitions — supersedes every prior
    snapshot dir so vacuum(keep_last=1) has candidates."""
    df = spark.createDataFrame(
        [
            (i, "2026-01-01" if i % 2 else "2026-01-02", float(i + version_tag))
            for i in range(1, 21)
        ],
        "id long, ds string, amount double",
    )
    t.commit_partitions(df, operation="overwrite")


def test_vacuum_keeps_clone_pinned_snapshot(spark, tmp_path):
    src = _mkfact(spark, str(tmp_path / "src"))
    baseline = sorted(map(tuple, src.read().collect()))
    clone = clone_table(spark, src.path, str(tmp_path / "clone"))
    token = clone.latest_record()["clone_token"]
    assert [r["token"] for r in src.registered_clones()] == [token]

    for i in range(3):
        _churn(spark, src, 100 * (i + 1))

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        removed = src.vacuum(keep_last=1, min_age_seconds=0)
    hits = [w for w in caught if issubclass(w.category, CloneRetentionWarning)]
    assert hits and token in str(hits[0].message)
    # the clone is byte-identical to the snapshot it pinned
    assert sorted(map(tuple, clone.read().collect())) == baseline
    # everything NOT pinned by the window or the clone was reclaimed
    assert removed, "vacuum should still collect unpinned snapshots"

    # release → the pin is gone → next vacuum reclaims the v1 dirs
    assert src.release_clone(token) is True
    assert src.registered_clones() == []
    removed2 = src.vacuum(keep_last=1, min_age_seconds=0)
    assert removed2, "released snapshot should now be collectable"
    with pytest.raises(Exception):
        clone.read().collect()  # the clone is (knowingly) broken now


def test_ignore_clones_is_the_explicit_force(spark, tmp_path):
    src = _mkfact(spark, str(tmp_path / "src"))
    clone = clone_table(spark, src.path, str(tmp_path / "clone"))
    _churn(spark, src, 500)
    src.vacuum(keep_last=1, min_age_seconds=0, ignore_clones=True)
    with pytest.raises(Exception):
        clone.read().collect()
    # the registration survives ignore_clones (it documents intent;
    # only release/auto-GC remove it)
    assert src.registered_clones()


def test_stale_registration_autocollected_when_clone_deleted(spark, tmp_path):
    src = _mkfact(spark, str(tmp_path / "src"))
    clone = clone_table(spark, src.path, str(tmp_path / "clone"))
    assert src.registered_clones()
    shutil.rmtree(clone.path)  # the sandbox is deleted wholesale
    _churn(spark, src, 700)
    removed = src.vacuum(keep_last=1, min_age_seconds=0)
    assert removed
    # the dangling registration was garbage-collected by the vacuum
    assert src.registered_clones() == []


def test_young_registration_keeps_pin_even_if_log_invisible(spark, tmp_path):
    """clone_table registers BEFORE the clone's first publish: a
    vacuum racing that window sees a registration whose dst has no
    commit log yet. Inside the age horizon the pin must hold."""
    src = _mkfact(spark, str(tmp_path / "src"))
    clone = clone_table(spark, src.path, str(tmp_path / "clone"))
    baseline = sorted(map(tuple, clone.read().collect()))
    shutil.rmtree(clone.path)  # make the dst log invisible...
    _churn(spark, src, 300)
    # ...but the registration is younger than the horizon → pin holds
    removed = src.vacuum(keep_last=1, min_age_seconds=3600)
    assert src.registered_clones(), "young registration must survive"
    pinned = src._commit_record(1)["partitions"].values()
    assert all(p not in removed for p in pinned)
    assert sorted(map(tuple, src.read(version=1).collect())) == baseline


def test_plain_waptable_vacuum_honors_manual_registration(spark, tmp_path):
    """The guard lives on WapTable, so full-snapshot tables get the
    same protection (a future full-snapshot cloner, or an operator
    hand-pinning a version for an external reader)."""
    import json
    import time

    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double")
    t = create_wap_table(spark, str(tmp_path / "snap"), df)
    t.fs.put_key(
        "_clones/clone-manualpin.json",
        json.dumps(
            {
                "token": "clone-manualpin",
                "dst_path": "s3://warehouse/other-team-reader",
                "src_version": 1,
                "created_at": time.time() - 7200,
            }
        ).encode(),
    )
    for i in range(3):
        t.commit(df.withColumn("amount", df.amount + i), operation="overwrite")
    v1_dir = t._commit_record(1)["data_dir"]
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        removed = t.vacuum(keep_last=1, min_age_seconds=0)
    assert any(issubclass(w.category, CloneRetentionWarning) for w in caught)
    assert v1_dir not in removed
    assert t.read(version=1).count() == 2
    # remote (URL) dst is never auto-collected — explicit release only
    assert t.registered_clones()
    t.release_clone("clone-manualpin")
    removed2 = t.vacuum(keep_last=1, min_age_seconds=0)
    assert v1_dir in removed2


def test_fuzz_interleaved_churn_vacuum_with_live_clone(spark, tmp_path):
    """The brief's done-criterion: a randomized interleaving of
    source churn (overwrites, deletes) and aggressive vacuums
    (keep_last=1, no age horizon) around a live clone. Invariant
    after EVERY vacuum: the clone reads exactly the snapshot it
    pinned. Afterwards, release + vacuum reclaims the pin."""
    rng = random.Random(1106)
    src = _mkfact(spark, str(tmp_path / "src"))
    _churn(spark, src, 50)
    clone_version = src.current_version()
    expected = sorted(map(tuple, src.read(version=clone_version).collect()))
    clone = clone_table(spark, src.path, str(tmp_path / "clone"))
    token = clone.latest_record()["clone_token"]

    for step in range(8):
        op = rng.choice(["overwrite", "delete", "vacuum", "vacuum"])
        if op == "overwrite":
            _churn(spark, src, 1000 + step)
        elif op == "delete":
            src.delete_rows(f"id = {rng.randint(1, 20)}")
        else:
            with _w.catch_warnings():
                _w.simplefilter("ignore", CloneRetentionWarning)
                src.vacuum(keep_last=1, min_age_seconds=0)
        assert sorted(map(tuple, clone.read().collect())) == expected, (
            f"clone sheared at step {step} ({op})"
        )

    # localize the clone (copy-on-write rewrite), release, reclaim
    optimize_partitions(clone)
    assert sorted(map(tuple, clone.read().collect())) == expected
    src.release_clone(token)
    with _w.catch_warnings():
        _w.simplefilter("ignore", CloneRetentionWarning)
        src.vacuum(keep_last=1, min_age_seconds=0)
    # the localized clone no longer needs the source at all
    assert sorted(map(tuple, clone.read().collect())) == expected
    assert isinstance(src, WapTable) and src.registered_clones() == []
