"""Persisted ANN serving indexes over snapshot tables: build once,
serve many query batches, refresh atomically.

``similarity.ivf_knn`` already separates TRAINING (the KMeans coarse
quantizer) from SERVING via its ``index=`` argument; this module gives
the index a durable, transactional home so the production shape —
train once per corpus, serve forever, rebuild behind readers' backs —
is a first-class operation rather than a caller convention:

- the cell-assigned corpus lands in a snapshot table CLUSTERED BY cell
  id with per-file ``_cell`` min/max stats, so serving a query batch
  opens only the files its probed cells live in (manifest-tier file
  skipping — the IVF analogue of a hypertable's chunk exclusion);
- centroids (and PQ codebooks) are sibling snapshot tables, and the
  DATA table's manifest records WHICH versions of them it was built
  against (``snapshot_commit(meta=...)``, carried forward by appends
  and compactions).  Every search pins ONE data-table version and
  derives the centroid/codebook versions from its binding — a rebuild
  that commits the tables non-atomically can never mix index
  generations inside a search, and handles loaded before the rebuild
  keep serving the old generation (snapshot isolation doing
  blue/green);
- probed-cell file pruning needs the batch's distinct cell ids
  driver-side — that collect is bounded by ``n_cells`` BY CONSTRUCTION
  (cell ids, not queries), so it is a legal control-plane collect at
  any query volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ros_sql_spark.sources.snapshot import (
    snapshot_commit,
    snapshot_compact,
    snapshot_meta,
    snapshot_read,
    snapshot_versions,
)

__all__ = [
    "ivf_store_save",
    "ivf_store_load",
    "ivf_store_search",
    "ivf_store_append",
    "ivf_store_optimize",
    "ivf_pq_store_save",
    "ivf_pq_store_load",
    "ivf_pq_store_search",
    "ivf_pq_store_append",
    "ivf_pq_store_append_batch",
    "ivf_pq_store_write_stream",
]


def _commit_clustered(
    df: DataFrame, table: str, target_files: int, meta: dict | None = None
) -> int:
    """ONE clustered write: range-partition + sort on ``_cell`` so the
    per-file stats actually skip, then a single stats-recording commit.
    (A plain commit followed by ``snapshot_compact`` writes the corpus
    twice; at the 100 TB shape the double write is the save's whole
    cost.)  The persist guards the CLAUDE.md repartitionByRange trap:
    its range-boundary sampling job re-executes the child plan — here a
    KMeans transform or an Arrow encode UDF — so without it every row
    computes twice anyway, just invisibly."""
    clustered = df.persist()
    try:
        out = clustered.repartitionByRange(
            target_files, "_cell"
        ).sortWithinPartitions("_cell")
        return snapshot_commit(out, table, stats_cols=["_cell"], meta=meta)
    finally:
        clustered.unpersist()


def _load_centers(
    spark: SparkSession, path: str, version: int | None
) -> list:
    rows = snapshot_read(spark, f"{path}/centers", version=version).collect()
    return sorted((int(r.cell), list(r.center)) for r in rows)


def _assign_cells(
    new_vectors: DataFrame,
    centers: list,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, _cell): nearest EXISTING cell per vector — the same
    Arrow matmul the query probe uses, n_probe=1."""
    from ros_sql_spark.operators.similarity import _probe_cells

    probe = _probe_cells(centers, 1)
    return new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(probe(F.col(vec_col)), 1).alias("_cell"),
    )


def _pruned_cells_read(
    spark: SparkSession,
    table: str,
    version: int,
    queries: DataFrame,
    vec_col: str,
    centers: list,
    n_probe: int,
) -> DataFrame:
    """The probed-cell serving read: distinct probed cells (bounded by
    n_cells by construction — control-plane collect), merged into
    contiguous ranges, each a manifest-pruned version-pinned
    ``snapshot_read``.  Identical rows to reading the whole table and
    filtering (pruning only drops cells no query probes)."""
    import json as _json

    from pyspark.sql.types import StructType

    from ros_sql_spark.operators.similarity import _probe_cells
    from ros_sql_spark.sources.snapshot import _file_may_match, _read_manifest

    probe = _probe_cells(centers, n_probe)
    probed = (
        queries.select(F.col(vec_col).alias("_qvec"))
        .select(F.explode_outer(probe("_qvec")).alias("_cell"))
        .distinct()
        .collect()
    )
    ranges = _cell_ranges([r._cell for r in probed])
    if not ranges:
        return snapshot_read(spark, table, version=version).limit(0)
    # ONE read over the UNION of each range's pruned file set, filtered
    # by the OR of the ranges — a per-range snapshot_read union opened
    # wide-bounds files (the un-compacted appended tail) once PER range
    # (round-8 review: R ranges re-decoded the tail R times; rows were
    # correct, I/O multiplied).
    mani = _read_manifest(spark, table, version)
    stats = mani.get("stats", {})
    files = [
        f
        for f in mani["files"]
        if any(
            _file_may_match(stats.get(f, {}), {"_cell": (lo, hi)})
            for lo, hi in ranges
        )
    ]
    schema = StructType.fromJson(_json.loads(mani["schema"]))
    cond = None
    for lo, hi in ranges:
        c = (F.col("_cell") >= lo) & (F.col("_cell") <= hi)
        cond = c if cond is None else (cond | c)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files).filter(cond)


def _cell_ranges(cells: list[int]) -> list[tuple[int, int]]:
    """Merge sorted cell ids into contiguous [lo, hi] ranges so the
    pruned read is a union of a FEW range scans, not one frame per
    cell (probe sets are contiguous-ish for clustered query batches)."""
    out: list[tuple[int, int]] = []
    for c in sorted(set(cells)):
        if out and c == out[-1][1] + 1:
            out[-1] = (out[-1][0], c)
        else:
            out.append((c, c))
    return out


def _bound_version(
    spark: SparkSession, path: str, data_table: str, version: int | None
) -> tuple[int, dict]:
    """(pinned data-table version, its generation binding)."""
    v = (
        version
        if version is not None
        else snapshot_versions(spark, f"{path}/{data_table}")[-1]
    )
    meta = snapshot_meta(spark, f"{path}/{data_table}", version=v) or {}
    return v, meta


def ivf_store_save(
    spark: SparkSession,
    index: tuple,
    path: str,
    target_files: int = 16,
) -> dict[str, int]:
    """Persist an ``ivf_index(...)`` result as two snapshot tables:
    ``<path>/centers`` and ``<path>/assigned`` (the cell-assigned
    corpus, written ONCE, range-clustered on ``_cell`` so the recorded
    per-file bounds actually skip).  The centers commit FIRST and the
    assigned manifest records their version (``meta.centers_version``)
    — the binding every load/search resolves, so a rebuild can never
    be observed half-applied.  Safe to call again with a rebuilt index:
    readers pinned to old manifests finish on the old generation
    (vacuum reclaims it later)."""
    assigned, centers = index
    centers_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centers],
        "cell INT, center ARRAY<DOUBLE>",
    )
    v_c = snapshot_commit(centers_df, f"{path}/centers")
    v_a = _commit_clustered(
        assigned, f"{path}/assigned", target_files,
        meta={"centers_version": v_c},
    )
    return {"assigned": v_a, "centers": v_c}


def ivf_store_load(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[DataFrame, list]:
    """Load a persisted index back into the exact ``(assigned,
    centers)`` shape ``ivf_knn(index=...)`` consumes — the centers at
    the VERSION the pinned assigned table was built against, so a
    concurrent rebuild can never hand this load mismatched halves."""
    v, meta = _bound_version(spark, path, "assigned", version)
    assigned = snapshot_read(spark, f"{path}/assigned", version=v)
    centers = _load_centers(spark, path, meta.get("centers_version"))
    return assigned, centers


def ivf_store_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Serve a query batch from the persisted index, reading ONLY the
    files whose cell ranges the batch actually probes (~p/c of the
    files for p probed of c cells on a clustered store).  One assigned
    version is pinned and the centers come from ITS binding, so the
    probe space and the data always belong to the same index
    generation.  The search itself is ``ivf_knn`` with the pruned
    table as its prebuilt index — results identical to full serving
    (pruning only removes cells no query probes)."""
    from ros_sql_spark.operators.similarity import ivf_knn

    # PIN the query frame before anything consumes it: the pruning
    # collect, the probe join, and the rerank all evaluate `queries`
    # in separate actions — a nondeterministic lineage (unseeded
    # sample/limit) would prune to one sample's cells and probe
    # another's, silently dropping neighbors (round-8 review); even a
    # deterministic one paid its lineage several times.
    queries = queries.localCheckpoint(eager=False)
    v, meta = _bound_version(spark, path, "assigned", None)
    centers = _load_centers(spark, path, meta.get("centers_version"))
    pruned = _pruned_cells_read(
        spark, f"{path}/assigned", v, queries, vec_col, centers, n_probe
    )
    return ivf_knn(
        corpus=None,
        queries=queries,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
        index=(pruned, centers),
    )


def ivf_pq_store_save(
    spark: SparkSession,
    index: tuple,
    codebooks,
    path: str,
    target_files: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, int]:
    """Persist the full IVF-PQ serving set: the IVF store (assigned
    corpus + centers — the assigned table doubles as the exact-rerank
    source) plus a cell-clustered ``<path>/codes`` table (id, _cell,
    m-byte pq_code — 32x smaller than the vectors it summarizes) and a
    ``<path>/codebooks`` table.  The codes manifest binds BOTH its
    centers and codebooks versions; each table is written once,
    clustered.  At 100 TB the codes table is the one a query batch
    actually scans."""
    from ros_sql_spark.operators.pq import pq_encode

    versions = ivf_store_save(spark, index, path, target_files)
    assigned, _ = index
    m, k, _ = codebooks.shape
    rows = [
        (j, c, [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(k)
    ]
    books_df = spark.createDataFrame(
        rows, "m INT, centroid INT, subvector ARRAY<DOUBLE>"
    )
    versions["codebooks"] = snapshot_commit(books_df, f"{path}/codebooks")
    # encode from the JUST-COMMITTED assigned table, not the caller's
    # frame: `assigned` carries the whole KMeans-transform lineage and
    # re-materializing it for the codes commit re-ran the corpus scan +
    # transform a second time — at the stated 100 TB shape that doubled
    # the save's dominant compute (round-8 review).  pq_encode is
    # deterministic per its own contract, so the stored rows encode
    # identically.
    stored = snapshot_read(
        spark, f"{path}/assigned", version=versions["assigned"]
    )
    codes = pq_encode(stored, codebooks, id_col, vec_col, keep_cols=["_cell"])
    versions["codes"] = _commit_clustered(
        codes, f"{path}/codes", target_files,
        meta={
            "centers_version": versions["centers"],
            "books_version": versions["codebooks"],
            "assigned_version": versions["assigned"],
        },
    )
    return versions


def _load_books(spark: SparkSession, path: str, version: int | None):
    import numpy as np

    rows = snapshot_read(spark, f"{path}/codebooks", version=version).collect()
    m = max(r.m for r in rows) + 1
    k = max(r.centroid for r in rows) + 1
    dsub = len(rows[0].subvector)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for r in rows:
        books[r.m, r.centroid] = r.subvector
    return books


def ivf_pq_store_load(spark: SparkSession, path: str):
    """(index, codebooks) exactly as ``ivf_pq_knn_join`` consumes them,
    ALL resolved through one pin — the codes table's generation binding:
    assigned at ``meta.assigned_version`` (not latest, so the window
    between a rebuild's assigned-commit and codes-commit can never hand
    out new cell assignments with stale codebooks), centers at the
    pinned assigned version's own binding, codebooks at
    ``meta.books_version``.  The codebook doubles survive bit-exactly
    (DOUBLE end to end), so encoding with the loaded books is identical
    to the originals.  Stores saved before the binding existed fall
    back to latest (meta key absent → None → latest)."""
    _, meta = _bound_version(spark, path, "codes", None)
    index = ivf_store_load(spark, path, version=meta.get("assigned_version"))
    books = _load_books(spark, path, meta.get("books_version"))
    return index, books


def ivf_pq_store_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    rerank: bool = False,
    rerank_factor: int = 4,
) -> DataFrame:
    """Serve a query batch from the persisted IVF-PQ index: ONE codes
    version is pinned and the centers/codebooks come from ITS binding
    (no mixed generations), the probed cells' code files are the only
    corpus bytes opened, the query side stays a DataFrame end to end
    (``ivf_pq_knn_join`` — no query collect, no ADC closure cap), and
    ``rerank=True`` adds the exact cosine rerank fetching only final
    candidates' vectors from the stored assigned table."""
    from ros_sql_spark.operators.pq import ivf_pq_knn_join

    # PIN the query frame before anything consumes it: the pruning
    # collect, the probe join, and the rerank all evaluate `queries`
    # in separate actions — a nondeterministic lineage (unseeded
    # sample/limit) would prune to one sample's cells and probe
    # another's, silently dropping neighbors (round-8 review); even a
    # deterministic one paid its lineage several times.
    queries = queries.localCheckpoint(eager=False)
    v_codes, meta = _bound_version(spark, path, "codes", None)
    centers = _load_centers(spark, path, meta.get("centers_version"))
    books = _load_books(spark, path, meta.get("books_version"))
    codes = _pruned_cells_read(
        spark, f"{path}/codes", v_codes, queries, vec_col, centers, n_probe
    )
    # rerank source pinned to the SAME generation as the codes table
    # (meta.assigned_version): during a concurrent rebuild — which
    # commits assigned before codes — an unpinned (latest) read here
    # would rerank this generation's candidates against the NEXT
    # generation's vectors, silently dropping ids that changed.
    rerank_df = (
        snapshot_read(
            spark, f"{path}/assigned", version=meta.get("assigned_version")
        ).drop("_cell")
        if rerank
        else None
    )
    return ivf_pq_knn_join(
        corpus=None,
        queries=queries,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
        index=(None, centers),
        codebooks=books,
        rerank=rerank_df,
        rerank_factor=rerank_factor,
        codes_df=codes,
    )


def ivf_store_append(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance: assign each new vector to its
    nearest EXISTING cell (no retrain; IVF recall tolerates quantizer
    staleness, rebuild when it drifts) and APPEND to the assigned
    table — a metadata commit plus only the new rows' files.  The
    generation binding carries forward automatically.

    The appended tail is not cell-clustered until the next
    :func:`ivf_store_optimize`, so its files carry wide cell bounds and
    every search reads them alongside the pruned clustered bulk —
    correct by construction (stats never skip wrongly), with read
    amplification growing only with the un-compacted tail.  The
    standard LSM-ish regimen: stream appends, periodic re-cluster."""
    _, centers = ivf_store_load(spark, path)
    assigned_new = _assign_cells(new_vectors, centers, id_col, vec_col)
    return snapshot_commit(assigned_new, f"{path}/assigned", mode="append")


def ivf_pq_store_append(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, int]:
    """IVF-PQ ingest: :func:`ivf_store_append` plus encoding the new
    vectors with the STORED codebooks and appending their codes — the
    continuous-ingest shape (new embeddings stream in, the serving
    tables grow by metadata appends, nothing retrains per batch)."""
    from ros_sql_spark.operators.pq import pq_encode

    (_, centers), books = ivf_pq_store_load(spark, path)
    assigned_new = _assign_cells(new_vectors, centers, id_col, vec_col)
    v_a = snapshot_commit(assigned_new, f"{path}/assigned", mode="append")
    codes_new = pq_encode(
        assigned_new, books, id_col, vec_col, keep_cols=["_cell"]
    )
    # the codes commit re-pins assigned_version at the append it just
    # made, so load/search/rerank see the appended vectors; centers/
    # books bindings carry unchanged (same quantizer generation)
    meta = snapshot_meta(spark, f"{path}/codes") or {}
    v_c = snapshot_commit(
        codes_new, f"{path}/codes", mode="append",
        meta={**meta, "assigned_version": v_a},
    )
    return {"assigned": v_a, "codes": v_c}


def ivf_store_optimize(
    spark: SparkSession, path: str, target_files: int = 16
) -> dict[str, int]:
    """Re-cluster the appended tail back into prunable files: one
    ``snapshot_compact(cluster_by=["_cell"])`` per serving table that
    exists (assigned, and codes for a PQ store).  Readers mid-search
    are untouched (snapshot isolation; the generation binding carries
    through the compaction); old versions vacuum later.  For a PQ store
    the codes compaction RE-PINS ``assigned_version`` at the
    freshly-compacted assigned table (identical rows, new version) so a
    later vacuum of pre-compaction assigned versions cannot strand the
    binding; table existence is probed through the snapshot manifest
    API (Hadoop FS abstraction), not the local filesystem."""
    out = {}
    if snapshot_versions(spark, f"{path}/assigned"):
        out["assigned"] = snapshot_compact(
            spark, f"{path}/assigned", target_files=target_files,
            cluster_by=["_cell"],
        )
    if snapshot_versions(spark, f"{path}/codes"):
        meta = snapshot_meta(spark, f"{path}/codes") or {}
        if "assigned" in out and "assigned_version" in meta:
            meta = {**meta, "assigned_version": out["assigned"]}
        out["codes"] = snapshot_compact(
            spark, f"{path}/codes", target_files=target_files,
            cluster_by=["_cell"], meta=meta or None,
        )
    return out


def ivf_pq_store_append_batch(
    new_vectors: DataFrame,
    path: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """Idempotent per-micro-batch index ingest: assign + encode the
    batch and append to BOTH serving tables guarded by each table's own
    ``last_batch`` watermark (``snapshot_append_batch``), so an
    at-least-once redelivery lands exactly once even if a crash fell
    between the two appends (each table skips independently).  Returns
    whether any table committed."""
    from ros_sql_spark.operators.pq import pq_encode
    from ros_sql_spark.sources.snapshot import snapshot_append_batch

    spark = new_vectors.sparkSession
    (_, centers), books = ivf_pq_store_load(spark, path)
    assigned_new = _assign_cells(new_vectors, centers, id_col, vec_col)
    did_a = snapshot_append_batch(assigned_new, f"{path}/assigned", batch_id)
    codes_new = pq_encode(
        assigned_new, books, id_col, vec_col, keep_cols=["_cell"]
    )
    # re-pin the codes binding at the assigned table's CURRENT version:
    # whether this batch's assigned append landed or was a skipped
    # replay (did_a False → the rows are already in the latest
    # version), latest-after-the-append is the generation the codes
    # rows were encoded against.
    meta = snapshot_meta(spark, f"{path}/codes") or {}
    v_a = snapshot_versions(spark, f"{path}/assigned")[-1]
    did_c = snapshot_append_batch(
        codes_new, f"{path}/codes", batch_id,
        meta={**meta, "assigned_version": v_a},
    )
    return did_a or did_c


def ivf_pq_store_write_stream(
    vectors: DataFrame,
    path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Exactly-once STREAMING index ingest: embeddings stream in, the
    persisted IVF-PQ serving tables grow by atomic metadata appends,
    queries keep serving throughout (snapshot isolation), and a
    redelivered batch is skipped per table.  Run
    :func:`ivf_store_optimize` periodically to re-cluster the appended
    tail.  (Single writer per store, like every Structured Streaming
    sink.)  Returns the StreamingQuery."""

    def body(df: DataFrame, batch_id: int) -> None:
        ivf_pq_store_append_batch(df, path, batch_id, id_col, vec_col)

    from ros_sql_spark.streaming.util import start_foreach_batch

    return start_foreach_batch(vectors, body, checkpoint_path, available_now)
