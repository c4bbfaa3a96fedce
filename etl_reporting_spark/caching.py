"""Scoped cache lifetime for persisted intermediates.

Several operators persist a bounded intermediate because multiple
downstream branches read it (LSH candidate pairs, SimHash signature
tables, connected-components labels, IVF assignments). Round 3 added
opt-in ``cleanup: list`` parameters so callers can unpersist after
consuming — correct but easy to forget, and a composed pipeline that
calls three such operators has to thread three lists. In a
long-running session (a notebook, a report server, a scheduled DAG)
a forgotten list means cached blocks accumulate until executors
evict under memory pressure — silent at sf0.1, a real storage-memory
tax at 100 TB where the cache competes with shuffle/join working set.

``cache_scope()`` makes release structural instead of per-call:

    with cache_scope():
        clusters = near_duplicate_clusters(docs)
        clusters.write.parquet(out)          # consume INSIDE the scope
    # every intermediate persisted by operators in the block is now
    # unpersisted, whether or not any cleanup list was threaded

Operators register persisted frames via ``track(df, cleanup)`` — the
frame lands in the caller's explicit ``cleanup`` list (old contract,
unchanged) AND in the innermost active scope. Scopes nest; each scope
releases only the frames registered while it was innermost. The stack
is thread-local so a streaming ``foreachBatch`` worker thread never
sees (or pollutes) a scope opened on the main thread — per-micro-batch
callers keep the explicit-list contract (streaming/cdc_stream.py).

Unpersisting is idempotent in Spark, so a frame released by both an
explicit list and the scope is a no-op the second time. Consumption
must happen inside the scope: DataFrames remain *valid* after
unpersist (lineage recomputes), so a late consumer is correct but
loses the cache benefit — the semantics degrade gracefully rather
than break.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_local = threading.local()


def _stack() -> list[list[DataFrame]]:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def track(df: DataFrame, cleanup: list | None = None) -> DataFrame:
    """Register an already-persisted frame for scoped release.

    Appends to the caller's explicit ``cleanup`` list (if any) and to
    the innermost active ``cache_scope`` (if any); returns ``df`` so
    call sites can stay expression-shaped.
    """
    if cleanup is not None:
        cleanup.append(df)
    stack = _stack()
    if stack:
        stack[-1].append(df)
    return df


def maybe_persist(df: DataFrame, cleanup: list | None = None) -> DataFrame:
    """Persist + track ``df`` only when somebody can release it — the
    caller passed an explicit ``cleanup`` list or an active
    ``cache_scope`` is open on this thread. Otherwise return ``df``
    un-persisted: recomputing a lineage twice is bounded work, while a
    persist that nothing releases leaks storage memory for the session
    lifetime (the exact failure mode this module exists to prevent).

    Persisting is eager (``count()``) so both downstream consumers hit
    the cache instead of racing to materialize it.
    """
    if cleanup is None and not _stack():
        return df
    df = df.persist()
    df.count()
    return track(df, cleanup)


@contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Auto-unpersist every operator-persisted frame on exit (LIFO).

    Yields the registration list, mostly for tests/introspection;
    normal callers ignore it.
    """
    frames: list[DataFrame] = []
    stack = _stack()
    stack.append(frames)
    try:
        yield frames
    finally:
        stack.pop()
        for df in reversed(frames):
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
