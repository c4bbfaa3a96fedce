"""Persisted ANN index with frozen-codebook incremental growth
(round-14; VERDICT r13 "Next" #1).

Every prior serving gate trains (or inline-derives) its IVF+PQ index
in the same process that queries it — correct, but train-per-query is
exactly what dies at 100 TB. The deployment shape for a GROWING
corpus is the one the reference's own incremental model uses for
facts (high-water-mark loads, reference
connector/snowpark_connector.py:425-453), applied to the index:

1. **Build once** (``build_ann_index``): Lloyd-train the IVF
   centroids and the residual PQ codebook over the build corpus,
   encode every vector, and persist THREE WAP tables under one root —

   =============  =====================================  ============
   table          schema                                 size
   =============  =====================================  ============
   ``centroids``  (vec_id, embedding array<double>)      n_centroids
                                                         rows — always
                                                         broadcastable
   ``codebook``   (subspace, code, subvec, cn2)          m·n_codes
                                                         rows — always
                                                         broadcastable
   ``codes``      (vec_id, subspace, code) PARTITIONED   m rows per
                  BY centroid_id — the inverted lists    corpus vector
   =============  =====================================  ============

   After the build the centroids and codebook are FROZEN — they are
   never retrained by growth (retraining would invalidate every
   stored code; drift vs retrain is measured, not hash-asserted — see
   the recall-drift rung in tools/ann_ladder.py).

2. **Grow by append** (``PersistedAnnIndex.append``): each new
   embedding increment is cell-assigned, residualized per cell, and
   ``pq_encode``-d against the frozen codebook — ONE corpus-linear
   pass over the INCREMENT only — then appended to the codes table as
   one atomic commit (``append_rows``: new files only, zero rewrite).
   Because ``pq_encode`` is pure in (vector, codebook), the grown
   index is bit-identical to a scratch encode of the union against
   the same frozen artifacts — which is exactly what the
   ``ann_index_incremental`` gate hash-proves.

3. **Shrink by deletion vector** (``PersistedAnnIndex.delete``):
   retired/purged vectors leave through the codes table's DV path —
   a sidecar ∝ deleted rows, zero files rewritten, served results
   drop them immediately (the masked read), and the index is again
   ≡ a scratch encode of the remaining corpus.

4. **Serve from the persisted lists** (``PersistedAnnIndex.search``):
   queries are probed against the broadcast centroids; ONLY the
   probed cells' partitions are read (metadata-layer pruning — at
   1000 cells and n_probe 8, 99.2 % of the index is never planned,
   let alone scanned); ADC scoring and the optional exact-rerank
   refine reuse ``ivfpq_candidates``/``exact_rerank`` verbatim via
   the ``codes=`` fast path, so persisted serving stays on the same
   value-hash-oracled code path as the inline gates.

5. **Rebuild by pointer swap** (``rebuild_ann_index``): when the
   recall-drift rung says the frozen model has drifted, retrain on
   the current corpus into ``{path}/gen-NNNNN`` — the old generation
   serves uninterrupted throughout — and flip a tiny generation
   pointer as the LAST step (one atomic small-object PUT, the
   Iceberg metadata-pointer pattern). Crash before the flip and
   nothing changed; handles opened before the flip keep their
   generation.

6. **Sync from the corpus change feed**
   (``sync_from_change_feed``): the index follows the embeddings
   table's commits — inserts encode in one pass, deletes ride the
   DV path pruned to the cells the preimage vectors name.

Scale notes: the codes table carries m small ints per vector — the
4·dim/m× compression that makes a 100 TB raw corpus an ~3 TB index;
appends are ∝ increment; serving is ∝ corpus·n_probe/n_cells with the
two model tables broadcast. The per-partition small-files debt of
frequent appends is the standard WAP one — ``maintenance_plan`` /
``optimize_partitions`` on the codes table compacts inverted lists
without touching the model tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_reporting_spark.operators.table_storage import TableStorage
from etl_reporting_spark.operators.wap import (
    PartitionedWapTable,
    WapTable,
    create_partitioned_wap_table,
    create_wap_table,
)


#: small pointer object naming the current generation dir (rebuild)
_GENERATION_KEY = "ann_index_generation"


def _root_storage(path: str) -> TableStorage:
    """Storage seam rooted at the INDEX root (for the generation
    pointer) — resolved through the wap module's factory attribute so
    the blob-backend test monkeypatch applies here too."""
    from etl_reporting_spark.operators import wap as _wap

    return _wap._default_storage_factory(path)


def _encode_against(
    embeddings: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    m: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Encode vectors against FROZEN artifacts: cell-assign, residualize
    per cell, PQ-encode the residuals. Returns the codes-table rows
    (id_col, subspace, code, centroid_id) — m per vector. Pure in
    (vector, centroids, codebook): build-time and append-time encodes
    of the same vector are bit-identical, the property the incremental
    gate hashes."""
    from etl_reporting_spark.llm.quantize import pq_encode, residualize

    resid = residualize(embeddings, centroids, id_col, vec_col)
    codes = pq_encode(
        resid.select(id_col, vec_col), codebook, m, dim, id_col, vec_col
    )
    return codes.join(resid.select(id_col, "centroid_id"), id_col)


class PersistedAnnIndex:
    """Handle over the three persisted index tables. Open an existing
    index with :func:`open_ann_index`; create one with
    :func:`build_ann_index`. The handle reads the frozen model tables
    once per instance (tiny — broadcast-sized by construction) and
    leaves the codes table on disk until a search names its cells."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        storage: TableStorage | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        # generation indirection (round-14 rebuild): a REBUILT index
        # lives under {path}/gen-NNNNN and a tiny pointer object names
        # the current generation — the Iceberg metadata-pointer
        # pattern, flipped by one atomic small-object PUT as the
        # rebuild's LAST step. No pointer → the legacy flat layout
        # (every pre-rebuild index, and the inside of each gen dir).
        # The resolution happens ONCE per handle: an open handle keeps
        # serving its generation across a concurrent rebuild
        # (continuity), a new handle sees the flip.
        ptr_fs = (
            storage
            if storage is not None
            else _root_storage(path)
        )
        raw = ptr_fs.read_key(_GENERATION_KEY)
        root = path
        if raw is not None:
            import json as _json

            root = f"{path}/{_json.loads(raw)['generation']}"
        self.root = root
        self.centroids_table = WapTable(
            spark, f"{root}/centroids", storage=storage
        )
        self.codebook_table = WapTable(
            spark, f"{root}/codebook", storage=storage
        )
        self.codes_table = PartitionedWapTable(
            spark, f"{root}/codes", ["centroid_id"], storage=storage
        )
        self.params_table = WapTable(spark, f"{root}/params", storage=storage)
        self._params: dict | None = None
        self._centroids: DataFrame | None = None
        self._codebook: DataFrame | None = None

    # ------------------------------------------------------- model
    @property
    def params(self) -> dict:
        """Frozen build parameters (m, dim, n_centroids, n_codes,
        id/vec column names) — one row, committed at build."""
        if self._params is None:
            row = self.params_table.read().first().asDict()
            self._params = row
        return self._params

    def centroids(self) -> DataFrame:
        """The frozen IVF centroids, (id_col, vec_col) — read once per
        handle (n_centroids rows)."""
        if self._centroids is None:
            self._centroids = self.centroids_table.read()
        return self._centroids

    def codebook(self) -> DataFrame:
        """The frozen PQ codebook, (subspace, code, subvec, cn2) —
        read once per handle (m·n_codes rows)."""
        if self._codebook is None:
            self._codebook = self.codebook_table.read()
        return self._codebook

    # ------------------------------------------------------- growth
    def append(self, increment: DataFrame) -> int:
        """Fold a new-embeddings increment into the index: encode
        against the FROZEN centroids + codebook (one pass over the
        increment — the 100 TB contract: growth cost never touches the
        existing corpus) and append the resulting inverted-list rows
        as one atomic commit. Returns the codes table's new version.

        The caller owns id uniqueness (an id re-appended would serve
        twice — dedupe upstream or route updates through the codes
        table's DV ops). Appends into cells the build never populated
        create those partitions."""
        p = self.params
        codes = _encode_against(
            increment,
            self.centroids(),
            self.codebook(),
            int(p["m"]),
            int(p["dim"]),
            p["id_col"],
            p["vec_col"],
        )
        return self.codes_table.append_rows(codes, operation="ann-index-append")

    def sync_from_change_feed(self, changes: DataFrame) -> dict:
        """Fold one EMBEDDINGS-TABLE change-feed batch into the index
        (round-14 continuation): the index follows the corpus table's
        COMMITS, the same cadence shift ``process_change_feed`` gives
        the DQ battery. Feed this straight from ``table_changes``
        over the embeddings table (or any frame carrying Delta's CDF
        vocabulary in ``_change_type``):

        - ``insert`` / ``update_postimage`` rows encode against the
          frozen model (one pass over the batch) and append;
        - ``delete`` / ``update_preimage`` ids leave through the
          codes table's DV path — and because the preimage row
          carries the VECTOR, its cell assignment names exactly the
          partitions its codes live in (cell assignment is pure in
          the frozen centroids), so the delete scan is pruned to the
          affected cells;
        - an UPDATE is therefore delete-then-append: the preimage's
          codes are masked before the re-encoded postimage lands, so
          the two never serve together.

        Deletes commit before appends (one DV commit + one append
        commit per batch). After any mix of appends, deletes and
        keyed updates on the corpus table, the synced index is again
        ≡ a scratch encode of the final snapshot against the same
        frozen artifacts (the ``ann_index_cdf_sync`` gate hash-proves
        it). Returns ``{"deleted_code_rows": n (m per deleted id),
        "appended_batches": 0|1, "version": codes tip}``."""
        from etl_reporting_spark.llm.similarity import ivf_assign

        p = self.params
        id_col, vec_col = p["id_col"], p["vec_col"]
        if "_change_type" not in changes.columns:
            raise ValueError(
                "sync_from_change_feed needs a change-feed frame "
                "(table_changes output) with a _change_type column"
            )
        adds = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, vec_col)
        dels = changes.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col, vec_col)
        n_del = 0
        if dels.take(1):
            # cell-assign the preimage vectors against the frozen
            # centroids: names exactly the partitions the ids' codes
            # live in (encode used the same centroids), so the DV
            # delete scans only the affected cells. The cell-id
            # collect is metadata-bounded (≤ n_centroids values).
            cells = sorted(
                r["centroid_id"]
                for r in ivf_assign(
                    dels, self.centroids(), id_col, vec_col, n_nearest=1
                )
                .select("centroid_id")
                .distinct()
                .collect()
            )
            existing = set(self.codes_table.partition_map())
            parts = [
                key
                for key in (f"centroid_id={c}" for c in cells)
                if key in existing
            ]
            if parts:
                _, n_del = self.codes_table.delete_rows(
                    keys_df=dels.select(id_col).distinct(),
                    keys=[id_col],
                    partitions=parts,
                    operation="ann-index-sync-delete",
                )
        n_add = 0
        if adds.take(1):
            self.append(adds)
            n_add = 1
        return {
            "deleted_code_rows": n_del,
            "appended_batches": n_add,
            "version": self.codes_table.current_version(),
        }

    def delete(self, predicate: str) -> int:
        """Remove vectors from the index by SQL predicate over the
        codes rows (typically ``"vec_id IN (...)"`` — corpus documents
        retired, PII purged). Rides the codes table's DELETION-VECTOR
        path: a sidecar ∝ deleted rows, zero files rewritten, and the
        DV-masked read means :meth:`search` stops serving them
        immediately — the index is again ≡ a scratch encode of the
        remaining corpus. Compaction retires the masks on the normal
        maintenance cadence. Returns the codes table's new version."""
        return self.codes_table.delete_rows(predicate)

    # ------------------------------------------------------ serving
    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 1,
        shortlist: int | None = None,
        rerank_embeddings: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k neighbors per query from the PERSISTED inverted
        lists: probe each query's ``n_probe`` nearest cells (broadcast
        centroids), read ONLY those cells' partitions (metadata-layer
        pruning — the probed-cell set is collected driver-side, ≤
        n_centroids values, metadata-bounded), ADC-score via the
        shared ``ivfpq_candidates`` ``codes=`` path, and either rank
        the ADC scores directly (returns ``adc_score``) or — when
        ``rerank_embeddings`` (the raw vectors, e.g. the corpus table)
        and ``shortlist`` are given — exact-rerank the shortlist to
        TRUE cosines (returns ``cosine``), the IVFADC-R refine stage.

        Scale: candidate work ∝ |corpus|·n_probe/n_cells; the rerank
        join is query-sized (n_queries·shortlist full-width reads)."""
        from etl_reporting_spark.llm.quantize import (
            exact_rerank,
            ivfpq_candidates,
        )
        from etl_reporting_spark.llm.similarity import ivf_assign
        from pyspark.sql import Window

        p = self.params
        id_col, vec_col = p["id_col"], p["vec_col"]
        probes = ivf_assign(
            queries, self.centroids(), id_col, vec_col, n_nearest=n_probe
        )
        # probed-cell ids: ≤ n_centroids distinct values (metadata-
        # bounded collect — never row-cardinality)
        cell_ids = sorted(
            r["centroid_id"]
            for r in probes.select("centroid_id").distinct().collect()
        )
        existing = set(self.codes_table.partition_map())
        keys = [
            key
            for key in (f"centroid_id={c}" for c in cell_ids)
            if key in existing
        ]
        if keys:
            codes = self.codes_table.read(partitions=keys)
        elif existing:
            # every probed cell is an empty inverted list; borrow the
            # committed schema from any partition, keep zero rows
            codes = self.codes_table.read(
                partitions=[next(iter(existing))]
            ).limit(0)
        else:
            codes = self.spark.createDataFrame(
                [], f"{id_col} long, subspace int, code long, centroid_id long"
            )
        cands = ivfpq_candidates(
            None,
            queries,
            n_probe=n_probe,
            residual=True,
            n_centroids=int(p["n_centroids"]),
            m=int(p["m"]),
            n_codes=int(p["n_codes"]),
            dim=int(p["dim"]),
            id_col=id_col,
            vec_col=vec_col,
            centroids=self.centroids(),
            codebook=self.codebook(),
            codes=codes,
        )
        if rerank_embeddings is not None:
            if shortlist is None:
                raise ValueError("rerank_embeddings requires shortlist=")
            return exact_rerank(
                cands,
                rerank_embeddings,
                queries,
                k=k,
                shortlist=shortlist,
                id_col=id_col,
                vec_col=vec_col,
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_score").desc(), F.col("neighbor_id").asc()
        )
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "adc_score")
        )


def build_ann_index(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    n_centroids: int = 32,
    m: int = 8,
    n_codes: int = 64,
    dim: int = 64,
    ivf_iterations: int = 5,
    pq_iterations: int = 3,
    exact: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    storage: TableStorage | None = None,
) -> PersistedAnnIndex:
    """Train + encode + persist: the one-time index build. Training
    cost is paid HERE, never at query time (``exact=True`` keeps the
    whole build value-hash-oracle-able — 100 TB builds pass
    ``exact=False`` for plain partial+final means). The trained
    centroids/codebook are materialized (lineage cut) before
    persisting, exactly like the inline trained gates."""
    from etl_reporting_spark.caching import cache_scope
    from etl_reporting_spark.llm.quantize import (
        materialize_index,
        pq_train_codebook,
        residualize,
    )
    from etl_reporting_spark.llm.similarity import train_ivf_centroids

    with cache_scope():
        cents = materialize_index(
            train_ivf_centroids(
                embeddings,
                n_centroids=n_centroids,
                iterations=ivf_iterations,
                id_col=id_col,
                vec_col=vec_col,
                exact=exact,
            )
        )
    with cache_scope():
        cb = materialize_index(
            pq_train_codebook(
                residualize(embeddings, cents, id_col, vec_col).select(
                    id_col, vec_col
                ),
                m=m,
                n_codes=n_codes,
                dim=dim,
                iterations=pq_iterations,
                id_col=id_col,
                vec_col=vec_col,
                exact=exact,
            )
        )
    create_wap_table(spark, f"{path}/centroids", cents, storage=storage)
    create_wap_table(spark, f"{path}/codebook", cb, storage=storage)
    params = spark.createDataFrame(
        [
            (
                int(n_centroids),
                int(m),
                int(n_codes),
                int(dim),
                id_col,
                vec_col,
            )
        ],
        "n_centroids int, m int, n_codes int, dim int, "
        "id_col string, vec_col string",
    )
    create_wap_table(spark, f"{path}/params", params, storage=storage)
    codes = _encode_against(embeddings, cents, cb, m, dim, id_col, vec_col)
    create_partitioned_wap_table(
        spark, f"{path}/codes", codes, ["centroid_id"], storage=storage
    )
    return PersistedAnnIndex(spark, path, storage=storage)


def open_ann_index(
    spark: SparkSession, path: str, storage: TableStorage | None = None
) -> PersistedAnnIndex:
    """Open a previously built index — a fresh process reading the
    persisted tables; nothing is retrained or re-encoded. Resolves
    the generation pointer (rebuilds), so the returned handle serves
    the CURRENT generation and keeps serving it across a concurrent
    rebuild."""
    idx = PersistedAnnIndex(spark, path, storage=storage)
    if idx.params_table.current_version() == 0:
        raise FileNotFoundError(f"no ANN index at {path}")
    return idx


def rebuild_ann_index(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    ivf_iterations: int = 5,
    pq_iterations: int = 3,
    exact: bool = True,
    **overrides,
) -> PersistedAnnIndex:
    """Full retrain + re-encode + ATOMIC pointer swap — the answer to
    the recall-drift rung's verdict (tools/ann_ladder.py): when frozen
    growth has drifted past the threshold, rebuild on the current
    corpus and flip.

    Mechanics (the Iceberg metadata-pointer pattern): the new
    generation trains and encodes into ``{path}/gen-NNNNN`` — the old
    generation serves UNINTERRUPTED the whole time (readers resolve
    the pointer once per handle) — and the LAST step is one atomic
    small-object PUT of the generation pointer. A crash anywhere
    before the flip leaves the old index intact and served (the
    orphan gen dir is re-built by the retry and aged out by normal
    vacuum); there is no torn state a reader can observe, because no
    reader follows a pointer that has not been written.

    Build parameters default to the OLD index's frozen params
    (n_centroids, m, n_codes, dim, id/vec columns) so a routine
    drift-triggered rebuild is parameter-stable; pass ``overrides``
    to re-shape (e.g. more cells for a corpus that outgrew 32).
    Returns a handle on the NEW generation."""
    old = open_ann_index(spark, path)
    p = dict(old.params)
    gen_no = 1
    if old.root != path:
        gen_no = int(old.root.rsplit("gen-", 1)[1]) + 1
    gen = f"gen-{gen_no:05d}"
    kwargs = {
        "n_centroids": int(p["n_centroids"]),
        "m": int(p["m"]),
        "n_codes": int(p["n_codes"]),
        "dim": int(p["dim"]),
        "id_col": p["id_col"],
        "vec_col": p["vec_col"],
    }
    kwargs.update(overrides)
    build_ann_index(
        spark,
        f"{path}/{gen}",
        embeddings,
        ivf_iterations=ivf_iterations,
        pq_iterations=pq_iterations,
        exact=exact,
        **kwargs,
    )
    import json as _json

    _root_storage(path).put_key(
        _GENERATION_KEY,
        _json.dumps({"generation": gen}).encode(),
    )
    return open_ann_index(spark, path)


def vacuum_generations(
    spark: SparkSession, path: str, keep: int = 1
) -> list[str]:
    """Delete superseded generation dirs (and the pre-rebuild legacy
    flat tables once a generation pointer exists), keeping the
    current generation plus ``keep - 1`` predecessors for open-handle
    grace. Run on the maintenance cadence AFTER serving handles have
    refreshed past the flip — a handle still pinned to a vacuumed
    generation fails loudly on its next read (missing files), never
    silently serves wrong results. Returns the deleted roots."""
    idx = open_ann_index(spark, path)
    if idx.root == path:
        return []  # never rebuilt — nothing superseded
    fs = _root_storage(path)
    current = int(idx.root.rsplit("gen-", 1)[1])
    floor = current - max(int(keep) - 1, 0)
    deleted: list[str] = []
    for rel in sorted(set(fs.list_prefix())):
        head = rel.split("/", 1)[0]
        if head.startswith("gen-"):
            try:
                n = int(head.split("gen-", 1)[1])
            except ValueError:
                continue
            if n < floor and head not in deleted:
                fs.delete_prefix(head)
                deleted.append(head)
        elif head in ("centroids", "codebook", "codes", "params"):
            # the pre-rebuild legacy flat layout, superseded by gen-1
            if floor >= 1 and head not in deleted:
                fs.delete_prefix(head)
                deleted.append(head)
    return sorted(deleted)
