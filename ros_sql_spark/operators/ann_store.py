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
- the centroid table is a second (tiny) snapshot table; a rebuild
  commits both with snapshot semantics, so an in-flight search that
  already resolved its manifests keeps serving the OLD index while the
  new one publishes (snapshot isolation doing blue/green);
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
    snapshot_read,
)

__all__ = [
    "ivf_store_append",
    "ivf_pq_store_append",
    "ivf_pq_store_append_batch",
    "ivf_pq_store_write_stream",
    "ivf_store_optimize",
    "ivf_store_save",
    "ivf_store_load",
    "ivf_store_search",
    "ivf_pq_store_save",
    "ivf_pq_store_load",
    "ivf_pq_store_search",
]


def ivf_store_save(
    spark: SparkSession,
    index: tuple,
    path: str,
    target_files: int = 16,
) -> dict[str, int]:
    """Persist an ``ivf_index(...)`` result as two snapshot tables:
    ``<path>/assigned`` (the cell-assigned corpus, compacted into
    ``target_files`` files RANGE-CLUSTERED on ``_cell`` so the recorded
    per-file cell bounds actually skip) and ``<path>/centers``.  Safe
    to call again with a rebuilt index: both tables move atomically to
    the new version; readers pinned to the old manifests finish on the
    old index (vacuum reclaims it later)."""
    assigned, centers = index
    v_a = snapshot_commit(
        assigned, f"{path}/assigned", stats_cols=["_cell"]
    )
    # clustering is what converts the stats into actual file skipping:
    # without it every append-ordered file spans most cells
    v_a = snapshot_compact(
        spark, f"{path}/assigned", target_files=target_files,
        cluster_by=["_cell"],
    )
    centers_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centers],
        "cell INT, center ARRAY<DOUBLE>",
    )
    v_c = snapshot_commit(centers_df, f"{path}/centers")
    return {"assigned": v_a, "centers": v_c}


def ivf_store_load(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[DataFrame, list]:
    """Load a persisted index back into the exact ``(assigned,
    centers)`` shape ``ivf_knn(index=...)`` consumes.  The file lists
    pin at this call (snapshot isolation): a concurrent rebuild cannot
    change what this handle serves."""
    assigned = snapshot_read(spark, f"{path}/assigned", version=version)
    centers_rows = snapshot_read(spark, f"{path}/centers").collect()
    centers = sorted(
        (int(r.cell), list(r.center)) for r in centers_rows
    )
    return assigned, centers


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
    files whose cell ranges the batch actually probes.

    The distinct probed cells (bounded by ``n_cells``) are computed
    once driver-side, merged into contiguous ranges, and each range is
    a manifest-pruned ``snapshot_read`` — on a ``target_files``-file
    clustered store a batch probing p of c cells opens ~p/c of the
    files.  The search itself is exactly ``ivf_knn`` with the pruned
    assigned table as its prebuilt index, so results are IDENTICAL to
    serving the full table (pruning only removes cells no query
    probes)."""
    from ros_sql_spark.operators.similarity import _probe_cells, ivf_knn
    from ros_sql_spark.sources.snapshot import snapshot_versions

    # pin ONE version for every read below: a concurrent rebuild
    # between the probe and the range scans must not mix index
    # generations within a single search
    v = snapshot_versions(spark, f"{path}/assigned")[-1]
    _, centers = ivf_store_load(spark, path)
    probe = _probe_cells(centers, n_probe)
    probed = (
        queries.select(F.col(vec_col).alias("_qvec"))
        .select(F.explode_outer(probe("_qvec")).alias("_cell"))
        .distinct()
        .collect()
    )  # bounded by n_cells by construction — control-plane collect
    ranges = _cell_ranges([r._cell for r in probed])
    parts = [
        snapshot_read(
            spark, f"{path}/assigned", version=v, prune={"_cell": (lo, hi)}
        ).filter((F.col("_cell") >= lo) & (F.col("_cell") <= hi))
        for lo, hi in ranges
    ]
    if not parts:
        pruned = snapshot_read(spark, f"{path}/assigned", version=v).limit(0)
    else:
        pruned = parts[0]
        for p in parts[1:]:
            pruned = pruned.unionByName(p)
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
) -> dict[str, int]:
    """Persist the full IVF-PQ serving set: the IVF store (assigned
    corpus + centers — the assigned table doubles as the exact-rerank
    source) plus a cell-clustered ``<path>/codes`` table (id, _cell,
    m-byte pq_code — 32x smaller than the vectors it summarizes) and a
    ``<path>/codebooks`` table.  At 100 TB the codes table is the one
    a query batch actually scans; its bytes-per-row is what makes the
    scan affordable, and cell clustering makes it file-prunable."""
    from ros_sql_spark.operators.pq import pq_encode

    versions = ivf_store_save(spark, index, path, target_files)
    assigned, _ = index
    codes = pq_encode(assigned, codebooks, keep_cols=["_cell"])
    snapshot_commit(codes, f"{path}/codes", stats_cols=["_cell"])
    versions["codes"] = snapshot_compact(
        spark, f"{path}/codes", target_files=target_files,
        cluster_by=["_cell"],
    )
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
    return versions


def ivf_pq_store_load(spark: SparkSession, path: str):
    """(index, codebooks) exactly as ``ivf_pq_knn_join`` consumes them.
    The codebook doubles survive bit-exactly (DOUBLE end to end), so
    encoding with the loaded books is identical to the originals."""
    import numpy as np

    index = ivf_store_load(spark, path)
    rows = snapshot_read(spark, f"{path}/codebooks").collect()
    m = max(r.m for r in rows) + 1
    k = max(r.centroid for r in rows) + 1
    dsub = len(rows[0].subvector)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for r in rows:
        books[r.m, r.centroid] = r.subvector
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
    """Serve a query batch from the persisted IVF-PQ index: the probed
    cells' CODE files are the only corpus bytes opened (manifest-pruned
    reads of the clustered codes table, version-pinned), the query side
    stays a DataFrame end to end (``ivf_pq_knn_join`` — no query
    collect, no ADC closure cap), and ``rerank=True`` adds the exact
    cosine rerank by fetching only the final candidates' vectors from
    the stored assigned table."""
    from ros_sql_spark.operators.pq import ivf_pq_knn_join
    from ros_sql_spark.operators.similarity import _probe_cells
    from ros_sql_spark.sources.snapshot import snapshot_versions

    v_codes = snapshot_versions(spark, f"{path}/codes")[-1]
    (_, centers), books = ivf_pq_store_load(spark, path)
    probe = _probe_cells(centers, n_probe)
    probed = (
        queries.select(F.col(vec_col).alias("_qvec"))
        .select(F.explode_outer(probe("_qvec")).alias("_cell"))
        .distinct()
        .collect()
    )  # bounded by n_cells by construction
    ranges = _cell_ranges([r._cell for r in probed])
    parts = [
        snapshot_read(
            spark, f"{path}/codes", version=v_codes, prune={"_cell": (lo, hi)}
        ).filter((F.col("_cell") >= lo) & (F.col("_cell") <= hi))
        for lo, hi in ranges
    ]
    if not parts:
        codes = snapshot_read(spark, f"{path}/codes", version=v_codes).limit(0)
    else:
        codes = parts[0]
        for p in parts[1:]:
            codes = codes.unionByName(p)
    rerank_df = (
        snapshot_read(spark, f"{path}/assigned").drop("_cell")
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
    nearest EXISTING cell (the same Arrow matmul the query probe uses,
    n_probe=1 — no retrain; IVF recall tolerates quantizer staleness,
    rebuild when it drifts) and APPEND to the assigned table — a
    metadata commit plus only the new rows' files.

    The appended tail is not cell-clustered until the next
    ``snapshot_compact(cluster_by=["_cell"])``, so its files carry wide
    cell bounds and every search reads them alongside the pruned
    clustered bulk — correct by construction (stats never skip
    wrongly), with read amplification growing only with the
    un-compacted tail.  The standard LSM-ish regimen: stream appends,
    periodic re-cluster."""
    from ros_sql_spark.operators.similarity import _probe_cells

    _, centers = ivf_store_load(spark, path)
    probe = _probe_cells(centers, 1)
    assigned_new = new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(probe(F.col(vec_col)), 1).alias("_cell"),
    )
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
    from ros_sql_spark.operators.similarity import _probe_cells

    (_, centers), books = ivf_pq_store_load(spark, path)
    probe = _probe_cells(centers, 1)
    assigned_new = new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(probe(F.col(vec_col)), 1).alias("_cell"),
    )
    v_a = snapshot_commit(assigned_new, f"{path}/assigned", mode="append")
    codes_new = pq_encode(
        assigned_new, books, id_col, vec_col, keep_cols=["_cell"]
    )
    v_c = snapshot_commit(codes_new, f"{path}/codes", mode="append")
    return {"assigned": v_a, "codes": v_c}


def ivf_store_optimize(
    spark: SparkSession, path: str, target_files: int = 16
) -> dict[str, int]:
    """Re-cluster the appended tail back into prunable files: one
    ``snapshot_compact(cluster_by=["_cell"])`` per serving table that
    exists (assigned, and codes for a PQ store).  Readers mid-search
    are untouched (snapshot isolation); old versions vacuum later."""
    import os

    from ros_sql_spark.sources.snapshot import snapshot_compact as _compact

    out = {}
    for name in ("assigned", "codes"):
        if os.path.isdir(f"{path}/{name}/_manifests"):
            out[name] = _compact(
                spark, f"{path}/{name}", target_files=target_files,
                cluster_by=["_cell"],
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
    from ros_sql_spark.operators.similarity import _probe_cells
    from ros_sql_spark.sources.snapshot import snapshot_append_batch

    spark = new_vectors.sparkSession
    (_, centers), books = ivf_pq_store_load(spark, path)
    probe = _probe_cells(centers, 1)
    assigned_new = new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(probe(F.col(vec_col)), 1).alias("_cell"),
    )
    did_a = snapshot_append_batch(assigned_new, f"{path}/assigned", batch_id)
    codes_new = pq_encode(
        assigned_new, books, id_col, vec_col, keep_cols=["_cell"]
    )
    did_c = snapshot_append_batch(codes_new, f"{path}/codes", batch_id)
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

    writer = (
        vectors.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
