"""Persisted IVF serving store: snapshot-table save/load roundtrip,
probed-cell file pruning, and result identity with in-memory serving."""

from __future__ import annotations

import pyspark.sql.functions as F

from ros_sql_spark.operators.ann_store import (
    ivf_store_load,
    ivf_store_save,
    ivf_store_search,
)
from ros_sql_spark.operators.similarity import ivf_index, ivf_knn
from ros_sql_spark.sources.io import load_table
from tests.conftest import SF_SMALL


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_ivf_store_roundtrip_serves_identically(spark, tmp_path):
    emb = _emb(spark)
    idx = ivf_index(emb, n_cells=8)
    store = str(tmp_path / "ann")
    versions = ivf_store_save(spark, idx, store, target_files=8)
    assert versions["assigned"] == 1  # ONE clustered write, no rewrite
    loaded = ivf_store_load(spark, store)
    assert loaded[1] == sorted(idx[1])  # centers survive verbatim

    queries = emb.filter("vec_id % 97 = 1").limit(10)
    mem = ivf_knn(None, queries, k=5, index=idx).collect()
    disk = ivf_knn(None, queries, k=5, index=loaded).collect()
    assert sorted(map(tuple, mem)) == sorted(map(tuple, disk))


def test_ivf_store_search_prunes_and_matches_full_serving(spark, tmp_path):
    from ros_sql_spark.sources.snapshot import snapshot_read

    emb = _emb(spark)
    idx = ivf_index(emb, n_cells=8)
    store = str(tmp_path / "ann")
    ivf_store_save(spark, idx, store, target_files=8)

    # pruning substrate: one cell's point read opens a strict subset of
    # the clustered store's files
    total = len(snapshot_read(spark, f"{store}/assigned").inputFiles())
    one_cell = len(
        snapshot_read(
            spark, f"{store}/assigned", prune={"_cell": (0, 0)}
        ).inputFiles()
    )
    assert 0 < one_cell < total

    queries = emb.filter("vec_id % 97 = 1").limit(5)
    loaded = ivf_store_load(spark, store)
    full = ivf_knn(None, queries, k=5, n_probe=2, index=loaded).collect()
    pruned = ivf_store_search(spark, store, queries, k=5, n_probe=2).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))


def test_ivf_store_rebuild_is_atomic_for_pinned_readers(spark, tmp_path):
    """Blue/green: a handle loaded before a rebuild keeps serving the
    OLD index (snapshot isolation pins its file list); a fresh load
    sees the new one."""
    emb = _emb(spark)
    store = str(tmp_path / "ann")
    ivf_store_save(spark, ivf_index(emb, n_cells=4, seed=1), store)
    old = ivf_store_load(spark, store)
    old_cells = old[0].select("_cell").distinct().count()

    ivf_store_save(spark, ivf_index(emb, n_cells=8, seed=2), store)
    # the pinned handle still resolves to 4 cells; a fresh load sees 8
    assert old[0].select("_cell").distinct().count() == old_cells == 4
    fresh = ivf_store_load(spark, store)
    assert fresh[0].select("_cell").distinct().count() == 8
    assert len(fresh[1]) == 8
    # generation binding: loading the PRE-rebuild assigned version must
    # resolve the matching OLD centers (4 cells), not the latest table
    pinned = ivf_store_load(spark, store, version=1)
    assert len(pinned[1]) == 4


def test_ivf_pq_store_roundtrip_and_pruned_search(spark, tmp_path):
    """IVF-PQ store: codebooks survive bit-exactly, the pruned-codes
    search equals in-memory ivf_pq_knn_join, the codes table is
    file-prunable by cell, and the exact-rerank path serves from the
    stored vectors."""
    import numpy as np

    from ros_sql_spark.operators.ann_store import (
        ivf_pq_store_load,
        ivf_pq_store_save,
        ivf_pq_store_search,
    )
    from ros_sql_spark.operators.pq import ivf_pq_knn_join, pq_train
    from ros_sql_spark.sources.snapshot import snapshot_read

    emb = _emb(spark)
    idx = ivf_index(emb, n_cells=8)
    books = pq_train(emb, dim=64, m=8, n_centroids=16)
    store = str(tmp_path / "pq")
    versions = ivf_pq_store_save(spark, idx, books, store, target_files=8)
    assert versions["codes"] == 1  # ONE clustered write, no rewrite

    (_, _), books2 = ivf_pq_store_load(spark, store)
    assert np.array_equal(books, books2)

    # codes table pruning substrate
    total = len(snapshot_read(spark, f"{store}/codes").inputFiles())
    one = len(
        snapshot_read(
            spark, f"{store}/codes", prune={"_cell": (0, 0)}
        ).inputFiles()
    )
    assert 0 < one < total

    queries = emb.filter("vec_id % 97 = 1").limit(5)
    mem = ivf_pq_knn_join(
        None, queries, k=5, n_probe=2, index=idx, codebooks=books
    ).collect()
    disk = ivf_pq_store_search(spark, store, queries, k=5, n_probe=2).collect()
    assert sorted(map(tuple, mem)) == sorted(map(tuple, disk))

    rr = ivf_pq_store_search(
        spark, store, queries, k=5, n_probe=2, rerank=True
    ).collect()
    assert len(rr) == len(disk)
    assert {r[0] for r in rr} == {r[0] for r in disk}  # same query ids


def test_ivf_store_append_and_optimize(spark, tmp_path):
    """Incremental ingest: appended vectors are immediately searchable
    (a new vector queries itself back at cosine 1), serving equals full
    serving over the same grown table, and optimize re-clusters the
    tail back into prunable files."""
    from ros_sql_spark.operators.ann_store import (
        ivf_store_append,
        ivf_store_optimize,
    )
    from ros_sql_spark.sources.snapshot import snapshot_read

    emb = _emb(spark)
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    store = str(tmp_path / "ann")
    ivf_store_save(spark, ivf_index(old, n_cells=8), store, target_files=8)
    ivf_store_append(spark, store, new)

    grown = snapshot_read(spark, f"{store}/assigned")
    assert grown.count() == emb.count()

    # a newly appended vector retrieves itself exactly
    q = new.limit(1)
    qid = q.collect()[0].vec_id
    top = ivf_store_search(
        spark, store, q, k=1, n_probe=2, exclude_self=False
    ).collect()
    assert top[0].vec_id == qid and top[0].sim == 1.0

    # store search equals full serving over the same grown table
    queries = emb.filter("vec_id % 97 = 1").limit(5)
    loaded = ivf_store_load(spark, store)
    full = ivf_knn(None, queries, k=5, n_probe=2, index=loaded).collect()
    pruned = ivf_store_search(spark, store, queries, k=5, n_probe=2).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))

    # re-cluster: rows preserved, results unchanged
    ivf_store_optimize(spark, store, target_files=8)
    assert snapshot_read(spark, f"{store}/assigned").count() == emb.count()
    post = ivf_store_search(spark, store, queries, k=5, n_probe=2).collect()
    assert sorted(map(tuple, post)) == sorted(map(tuple, full))


def test_ivf_pq_store_append_new_ids_searchable(spark, tmp_path):
    from ros_sql_spark.operators.ann_store import (
        ivf_pq_store_append,
        ivf_pq_store_save,
        ivf_pq_store_search,
    )
    from ros_sql_spark.operators.pq import pq_train
    from ros_sql_spark.sources.snapshot import snapshot_read

    emb = _emb(spark)
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    store = str(tmp_path / "pq")
    ivf_pq_store_save(
        spark, ivf_index(old, n_cells=8),
        pq_train(old, dim=64, m=8, n_centroids=16), store, target_files=8,
    )
    ivf_pq_store_append(spark, store, new)
    assert snapshot_read(spark, f"{store}/codes").count() == emb.count()

    # exact rerank puts an appended vector's self-query at the top
    q = new.limit(1)
    qid = q.collect()[0].vec_id
    top = ivf_pq_store_search(
        spark, store, q, k=1, n_probe=2, exclude_self=False, rerank=True
    ).collect()
    assert top[0].vec_id == qid


def test_ivf_pq_store_streaming_ingest_exactly_once(spark, tmp_path):
    """Streaming index ingest: embeddings stream into the serving
    tables with per-batch atomic appends; a FULL redelivery from a
    fresh checkpoint changes neither row counts nor versions."""
    from ros_sql_spark.operators.ann_store import (
        ivf_pq_store_save,
        ivf_pq_store_search,
        ivf_pq_store_write_stream,
    )
    from ros_sql_spark.operators.pq import pq_train
    from ros_sql_spark.sources.snapshot import (
        snapshot_read,
        snapshot_versions,
    )

    emb = _emb(spark)
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    store = str(tmp_path / "pq")
    ivf_pq_store_save(
        spark, ivf_index(old, n_cells=8),
        pq_train(old, dim=64, m=8, n_centroids=16), store, target_files=8,
    )
    src = str(tmp_path / "src")
    new.coalesce(2).write.parquet(src)

    def run(ck):
        q = ivf_pq_store_write_stream(
            spark.readStream.schema(new.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            store,
            checkpoint_path=str(tmp_path / ck),
        )
        q.awaitTermination(180)
        assert not q.isActive

    run("ck1")
    n = emb.count()
    assert snapshot_read(spark, f"{store}/assigned").count() == n
    assert snapshot_read(spark, f"{store}/codes").count() == n
    v_a = snapshot_versions(spark, f"{store}/assigned")[-1]
    v_c = snapshot_versions(spark, f"{store}/codes")[-1]

    run("ck2")  # full redelivery: fresh checkpoint, same store
    assert snapshot_read(spark, f"{store}/assigned").count() == n
    assert snapshot_read(spark, f"{store}/codes").count() == n
    assert snapshot_versions(spark, f"{store}/assigned")[-1] == v_a
    assert snapshot_versions(spark, f"{store}/codes")[-1] == v_c

    # a streamed-in vector serves back
    q1 = new.limit(1)
    qid = q1.collect()[0].vec_id
    top = ivf_pq_store_search(
        spark, store, q1, k=1, n_probe=2, exclude_self=False, rerank=True
    ).collect()
    assert top[0].vec_id == qid


def test_ivf_pq_store_pins_one_generation_mid_rebuild(spark, tmp_path):
    """The r5-advice race: a rebuild commits assigned BEFORE codes, so
    between the two commits the assigned table's LATEST version belongs
    to the NEXT generation.  Load, search, and the rerank path must all
    resolve assigned through the codes manifest's ``assigned_version``
    binding — results identical to before the half-applied rebuild."""
    from ros_sql_spark.operators.ann_store import (
        _commit_clustered,
        ivf_pq_store_load,
        ivf_pq_store_save,
        ivf_pq_store_search,
    )
    from ros_sql_spark.operators.pq import pq_train
    from ros_sql_spark.sources.snapshot import (
        snapshot_commit,
        snapshot_meta,
        snapshot_versions,
    )

    emb = _emb(spark)
    old = emb.filter("vec_id % 2 = 0")
    store = str(tmp_path / "pq")
    versions = ivf_pq_store_save(
        spark, ivf_index(old, n_cells=8, seed=1),
        pq_train(old, dim=64, m=8, n_centroids=16), store, target_files=8,
    )
    assert snapshot_meta(spark, f"{store}/codes")["assigned_version"] == (
        versions["assigned"]
    )
    queries = old.filter("vec_id % 97 = 1").limit(5)
    before = ivf_pq_store_search(
        spark, store, queries, k=5, n_probe=2, rerank=True
    ).collect()

    # simulate the rebuild's first half ONLY: new centers + a REKEYED
    # assigned corpus (ids shifted — any id the old generation serves
    # no longer exists in the new one) with no codes commit yet
    rekeyed = emb.withColumn("vec_id", F.col("vec_id") + 1000000)
    new_idx = ivf_index(rekeyed, n_cells=4, seed=2)
    v_c = snapshot_commit(
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in new_idx[1]],
            "cell INT, center ARRAY<DOUBLE>",
        ),
        f"{store}/centers",
    )
    _commit_clustered(
        new_idx[0], f"{store}/assigned", 8, meta={"centers_version": v_c}
    )
    assert snapshot_versions(spark, f"{store}/assigned")[-1] > (
        versions["assigned"]
    )

    # pinned generation still serves bit-identically (incl. rerank,
    # which fetches vectors from the PINNED assigned version — unpinned
    # it would find zero matching ids and drop every candidate)
    during = ivf_pq_store_search(
        spark, store, queries, k=5, n_probe=2, rerank=True
    ).collect()
    assert sorted(map(tuple, during)) == sorted(map(tuple, before))

    # load resolves the OLD generation end to end: no id from the
    # rekeyed half-committed corpus leaks in
    (assigned, centers), _books = ivf_pq_store_load(spark, store)
    assert assigned.filter("vec_id >= 1000000").count() == 0
    assert len(centers) == 8  # old quantizer, not the new 4-cell one


def test_ivf_pq_store_append_repins_assigned_binding(spark, tmp_path):
    """Appends advance the codes manifest's assigned_version pin so
    pinned readers see the appended vectors; optimize re-pins at the
    compacted version (vacuum of pre-compaction versions cannot strand
    the binding)."""
    from ros_sql_spark.operators.ann_store import (
        ivf_pq_store_append,
        ivf_pq_store_save,
        ivf_store_optimize,
    )
    from ros_sql_spark.operators.pq import pq_train
    from ros_sql_spark.sources.snapshot import (
        snapshot_meta,
        snapshot_versions,
    )

    emb = _emb(spark)
    old = emb.filter("vec_id % 2 = 0")
    store = str(tmp_path / "pq")
    ivf_pq_store_save(
        spark, ivf_index(old, n_cells=8),
        pq_train(old, dim=64, m=8, n_centroids=16), store, target_files=8,
    )
    ivf_pq_store_append(spark, store, emb.filter("vec_id % 2 = 1"))
    meta = snapshot_meta(spark, f"{store}/codes")
    assert meta["assigned_version"] == (
        snapshot_versions(spark, f"{store}/assigned")[-1]
    )
    assert "centers_version" in meta and "books_version" in meta

    out = ivf_store_optimize(spark, store, target_files=8)
    meta2 = snapshot_meta(spark, f"{store}/codes")
    assert meta2["assigned_version"] == out["assigned"]


def test_ivf_pq_store_optimize_then_vacuum_keeps_serving(spark, tmp_path):
    """The binding/vacuum interplay end-to-end: append fragments the
    store, optimize re-clusters AND re-pins assigned_version at the
    compacted version, then an aggressive vacuum (keep_last=1) on every
    table reclaims all pre-compaction versions — and the pinned-
    generation search (incl. exact rerank) must keep serving every
    vector.  Without optimize's re-pin, the rerank would try to read a
    vacuumed assigned version and die."""
    from ros_sql_spark.operators.ann_store import (
        ivf_pq_store_append,
        ivf_pq_store_save,
        ivf_pq_store_search,
        ivf_store_optimize,
    )
    from ros_sql_spark.operators.pq import pq_train
    from ros_sql_spark.sources.snapshot import (
        snapshot_vacuum,
        snapshot_versions,
    )

    emb = _emb(spark)
    old = emb.filter("vec_id % 2 = 0")
    store = str(tmp_path / "pq")
    ivf_pq_store_save(
        spark, ivf_index(old, n_cells=8),
        pq_train(old, dim=64, m=8, n_centroids=16), store, target_files=8,
    )
    ivf_pq_store_append(spark, store, emb.filter("vec_id % 2 = 1"))
    ivf_store_optimize(spark, store, target_files=8)
    for t in ("assigned", "codes", "centers", "codebooks"):
        snapshot_vacuum(spark, f"{store}/{t}", keep_last=1)
        assert len(snapshot_versions(spark, f"{store}/{t}")) == 1

    q = emb.filter("vec_id % 2 = 1").limit(1)
    qid = q.collect()[0].vec_id
    top = ivf_pq_store_search(
        spark, store, q, k=1, n_probe=2, exclude_self=False, rerank=True
    ).collect()
    assert top[0].vec_id == qid
