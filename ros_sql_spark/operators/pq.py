"""Product quantization (PQ) — compressed-domain ANN search.

The missing piece between the engine's exact/LSH/IVF ANN family and a
real 100 TB embedding corpus is MEMORY: 64-dim float32 vectors are
256 bytes each; 10¹¹ of them are 25 TB that every search must stream.
PQ splits each (L2-normalized) vector into ``m`` subvectors, k-means
quantizes each subspace to ``n_centroids`` codewords, and stores only
the m codeword ids — 8 bytes/vector at m=8 (32× smaller), while search
runs entirely in the compressed domain via per-query lookup tables
(asymmetric distance computation, ADC): approx ⟨q, x⟩ =
Σ_j table[j, code_j] — m byte-indexed adds instead of dim multiplies.
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public literature, no code consulted.)

Division of labor in this engine's ANN family:
- ``brute_force_knn``: exact baseline, corpus streams uncompressed.
- ``lsh_knn`` / ``ivf_knn``: prune WHICH vectors are scored.
- ``pq_*`` (here): shrink WHAT is scored — composable with IVF
  (probe cells, then ADC-score only in-cell codes).

Spark shapes:
- training is a bounded, seed-pinned driver-side sample (the codebook
  is m·k·dsub floats — KBs); every per-vector step is an Arrow-batched
  numpy kernel (the hyperplane_buckets trade: interpreted HOF folds
  lose to one matmul per batch);
- codes are a BINARY column (m bytes) — columnar-compressed at rest,
  narrow in shuffles;
- search never shuffles the corpus: per-partition ADC scoring emits at
  most k candidates per (query, partition) and only those tiny
  candidate rows reach the final per-query top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

__all__ = ["pq_train", "pq_encode", "pq_knn", "ivf_pq_knn", "ivf_pq_knn_join"]

#: Hard ceiling on the driver-collected ANN query side.  The query
#: batch is a bounded-collect contract (mirroring ``train_sample``):
#: each query costs an (m × n_centroids) float64 ADC table in the UDF
#: closure, so 4096 queries at m=8,k=256 is ~67 MB — comfortably
#: broadcastable; a million queries would be a driver OOM.  Callers
#: with more queries than this should loop in batches (or use the
#: join-based LSH/IVF paths, whose query side is a DataFrame).
DEFAULT_MAX_QUERIES = 4096


def _collect_queries(queries: DataFrame, id_col, vec_col, max_queries: int):
    """Bounded collect of the ANN query batch: fails FAST (limit+1 scan,
    no full materialization) with an actionable error instead of letting
    an oversized query frame OOM the driver via ADC-table fan-out."""
    rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"query frame exceeds max_queries={max_queries}: the PQ "
            "query side is collected to the driver and each query adds "
            "an (m, n_centroids) ADC table to the UDF closure — batch "
            "your queries or raise max_queries explicitly if the "
            "driver can hold them"
        )
    if not rows:
        raise ValueError("queries frame is empty")
    return rows


def _sampled_matrix(
    df: DataFrame, vec_col: str, train_sample: int, seed: int
) -> np.ndarray:
    """Seed-pinned bounded sample of vectors as an (n, dim) float64
    matrix.  ``sample()`` keeps the scan distributed; only ≤
    ``train_sample`` rows reach the driver (same bounded-collect class
    as IVF centroid training — KBs to low MBs, never the corpus)."""
    n = df.count()
    frac = min(1.0, (train_sample * 1.2) / max(n, 1))
    rows = (
        df.select(vec_col).sample(fraction=frac, seed=seed)
        .limit(train_sample)
        .collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def _adc_tables(Q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(nq, m, n_centroids) ADC lookup tables: tables[q, j, c] =
    <q's j-th subvector, codeword c>.  ONE definition — pq_knn,
    ivf_pq_knn and _adc_join_udf must score bit-identically, and three
    hand-copies of the einsum were the stated contract's only
    enforcement (round-8 review)."""
    m, _, dsub = books.shape
    return np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), books)


def _adc_gather(
    tables: np.ndarray, qi: np.ndarray, C: np.ndarray
) -> np.ndarray:
    """Score each code row against ITS query's table: sum over
    subspaces of tables[qi, j, C[:, j]] — the shared gather kernel."""
    jj = np.arange(C.shape[1])
    return tables[qi[:, None], jj[None, :], C].sum(axis=1)


def _codes_matrix(code_series: pd.Series, m: int) -> np.ndarray:
    """(n, m) uint8 matrix from an Arrow binary column of m-byte
    codes."""
    return np.frombuffer(
        b"".join(code_series.to_numpy()), dtype=np.uint8
    ).reshape(len(code_series), m)


def _queries_df(
    spark, qrows, query_id_col: str, vec_name: str = "_qvec"
) -> DataFrame:
    """Rebuild the query frame FROM THE COLLECTED ROWS so every Spark
    consumer (probe join, rerank) sees exactly the rows the driver
    collected — a nondeterministic `queries` lineage (unseeded sample /
    limit) would otherwise probe one sample while the ADC tables were
    built for another: searchsorted then maps unseen ids to a WRONG
    query's table, or off the end (round-8 review)."""
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in qrows],
        f"{query_id_col} long, {vec_name} array<double>",
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    return m / np.where(norms == 0.0, 1.0, norms)


def _kmeans_np(X: np.ndarray, k: int, iters: int, rng: np.random.Generator):
    """Plain Lloyd iterations, driver-side, on the (bounded) training
    sample of ONE subspace.  Empty clusters keep their previous
    centroid (deterministic; no reseeding jitter)."""
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        a = d.argmin(axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return C


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    n_centroids: int = 256,
    vec_col: str = "embedding",
    train_sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks: (m, n_centroids, dim // m) float64.

    Vectors are L2-normalized before subspace splitting, so the ADC
    inner product approximates cosine similarity.  ``n_centroids`` ≤
    256 keeps one code per subspace in one byte.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if n_centroids > 256:
        raise ValueError("n_centroids > 256 breaks the 1-byte-per-code layout")
    X = _normalize(_sampled_matrix(df, vec_col, train_sample, seed))
    dsub = dim // m
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            _kmeans_np(X[:, j * dsub : (j + 1) * dsub], n_centroids, iters, rng)
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id, pq_code BINARY): each vector L2-normalized, split into m
    subvectors, each assigned its nearest codeword — m bytes total.

    One Arrow batch = one distance computation per subspace
    (‖c‖² − 2·x·cᵀ; the ‖x‖² term is argmin-invariant) — no per-row
    Python.  The codebook tensor rides in the UDF closure (≤ m·256·dsub
    floats ≈ 128 KB at dim 64), shipped once per executor.
    """
    from pyspark.sql.functions import pandas_udf

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    c_sq = (books * books).sum(axis=2)  # (m, k)

    @pandas_udf("binary")
    def _encode(vecs: pd.Series) -> pd.Series:
        X = _normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        codes = np.empty((len(X), m), dtype=np.uint8)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]  # (n, dsub)
            d = c_sq[j][None, :] - 2.0 * (sub @ books[j].T)  # (n, k)
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes])

    extra = [F.col(c) for c in (keep_cols or [])]
    return df.select(
        F.col(id_col), *extra, _encode(F.col(vec_col)).alias("pq_code")
    )


def _finalize_topk(
    scored: DataFrame,
    qv: DataFrame,
    k: int,
    rerank: DataFrame | None,
    rerank_factor: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    broadcast_qv: bool = True,
) -> DataFrame:
    """Shared tail of every PQ search: per-query top-k over ``_adc``
    (id tiebreak), then either round the ADC scores or exact-rerank the
    top ``k·rerank_factor`` candidates against raw vectors.

    ``scored``: (query_id, id, _adc); ``qv``: (query_id, _qvec) —
    broadcast when the query side is bounded (the collected paths),
    plain join when it is an unbounded DataFrame (``ivf_pq_knn_join``).
    One place owns the tiebreak/rounding parity rules for all three
    search paths.
    """
    from ros_sql_spark.operators.similarity import cosine_arrow

    keep = k * (rerank_factor if rerank is not None else 1)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_adc"), F.col(id_col))
    top = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .drop("_rn")
    )
    if rerank is None:
        return top.select(
            query_id_col, id_col, F.round(F.col("_adc"), 6).alias("score")
        )
    rs = (
        top.drop("_adc")
        .join(rerank.select(id_col, vec_col), id_col)
        .join(F.broadcast(qv) if broadcast_qv else qv, query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine_arrow(vec_col, "_qvec"), 6).alias("score"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        rs.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pq_knn(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    max_queries: int = DEFAULT_MAX_QUERIES,
) -> DataFrame:
    """Compressed-domain top-k: (query_id, vec_id, score) per query.

    ``queries`` carries raw vectors (small by contract — the broadcast
    side, like every ANN path here); ``codes`` is the pq_encode output.
    Per query the driver builds the (m, n_centroids) inner-product
    lookup table ONCE (q normalized, so table sums approximate cosine);
    a mapInPandas pass over the code table scores every row with m
    byte-gathers and keeps a local top-k per query PER BATCH — the
    shuffle then carries only ≤ k·partitions candidate rows per query
    into the exact per-query top-k window.

    ``rerank``: optionally pass the raw-vector frame to exact-rerank the
    top ``k·rerank_factor`` ADC candidates (IVF-style: approximate
    recall, exact ordering).  Scores are rounded to 6dp with an id
    tiebreak — deterministic output either way.
    """
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, n_cent, dsub = books.shape

    qrows = _collect_queries(queries, id_col, vec_col, max_queries)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = _normalize(np.array([r[1] for r in qrows], dtype=np.float64))
    tables = _adc_tables(Q, books)
    keep = k * (rerank_factor if rerank is not None else 1)

    out_schema = f"{query_id_col} long, {id_col} long, _adc double"

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = _codes_matrix(pdf["pq_code"], m)
            outs = []
            for qi in range(len(qids)):
                s = _adc_gather(
                    tables, np.full(len(C), qi, dtype=np.int64), C
                )
                if exclude_self:
                    s = np.where(ids == qids[qi], -np.inf, s)
                top = min(keep, len(s))
                # partial-select then exact order among the local top
                idx = np.argpartition(-s, top - 1)[:top]
                keep_mask = np.isfinite(s[idx])
                idx = idx[keep_mask]
                outs.append(
                    pd.DataFrame(
                        {
                            query_id_col: qids[qi],
                            id_col: ids[idx],
                            "_adc": s[idx],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    cand = codes.mapInPandas(_score, schema=out_schema)
    qv = _queries_df(queries.sparkSession, qrows, query_id_col)
    return _finalize_topk(
        cand, qv, k, rerank, rerank_factor, id_col, vec_col, query_id_col
    )


def ivf_pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    index: tuple | None = None,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    max_queries: int = DEFAULT_MAX_QUERIES,
    codebooks: np.ndarray | None = None,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN layout (coarse cells prune WHICH
    vectors are considered; PQ codes shrink WHAT each consideration
    costs).  At 100 TB this is the only family member whose working set
    fits a cluster: the searched representation is n_probe/n_cells of
    the corpus × m bytes per vector.

    ``codebooks``/``codes_df``: prebuilt training artifacts (the same
    parameters the sibling ``ivf_pq_knn_join`` takes) — without them a
    caller passing a prebuilt ``index`` still paid pq_train's corpus
    count + sample collect AND a full-corpus re-encode per query batch
    (round-8 review), reusing only the KMeans step.

    Pipeline: IVF-assign the corpus (KMeans cells, reusable prebuilt
    ``index``) → PQ-encode keeping the cell id → per query, probe the
    ``n_probe`` nearest cells (Arrow matmul, no literal centroids) →
    equi-join codes on the small int cell key → ADC-score each
    candidate row with a vectorized table gather → per-query top-k,
    optionally exact-reranked against ``rerank`` raw vectors.

    Unlike ``pq_knn`` (which streams the WHOLE code table and needs no
    shuffle), the cell equi-join shuffles only code rows — m bytes +
    two longs each — from the probed cells.  Candidate volume is
    ~n_probe/n_cells · |corpus| per query batch.
    """
    from ros_sql_spark.operators.similarity import _probe_cells, ivf_index
    from pyspark.sql.functions import pandas_udf

    assigned, centers = (
        index
        if index is not None
        else ivf_index(corpus, n_cells, seed, id_col, vec_col)
    )
    books = (
        codebooks
        if codebooks is not None
        else pq_train(
            corpus, dim=dim, m=m, n_centroids=n_centroids,
            vec_col=vec_col, seed=seed,
        )
    )
    codes = (
        codes_df
        if codes_df is not None
        else pq_encode(assigned, books, id_col, vec_col, keep_cols=["_cell"])
    )

    qrows = _collect_queries(queries, id_col, vec_col, max_queries)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    order = np.argsort(qids, kind="stable")
    qids = qids[order]
    Q = _normalize(np.array([r[1] for r in qrows], dtype=np.float64))[order]
    mm = books.shape[0]
    tables = _adc_tables(Q, books)

    # the probe/rerank frames rebuild from the COLLECTED rows — see
    # _queries_df (a second evaluation of `queries` could diverge)
    qdf = _queries_df(queries.sparkSession, qrows, query_id_col)
    probe = _probe_cells(centers, n_probe)
    q = (
        qdf.withColumn("_cells", probe("_qvec"))
        # explode_outer: the Generate invariant (CLAUDE.md) — plain
        # explode would re-invoke the probe UDF per row via the
        # inferred size>0 pre-filter; _cells is never null (UDF total).
        .withColumn("_cell", F.explode_outer("_cells"))
        .select(query_id_col, "_cell")
    )
    cand = codes.join(F.broadcast(q), "_cell")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(query_id_col))

    @pandas_udf("double")
    def _adc(qid: pd.Series, code: pd.Series) -> pd.Series:
        qi = np.searchsorted(qids, qid.to_numpy(dtype=np.int64))
        C = _codes_matrix(code, mm)
        # per-row gather: table of THIS row's query, summed over subspaces
        return pd.Series(_adc_gather(tables, qi, C))

    scored = cand.select(
        query_id_col, id_col, _adc(F.col(query_id_col), F.col("pq_code")).alias("_adc")
    )
    return _finalize_topk(
        scored, qdf, k, rerank, rerank_factor, id_col, vec_col, query_id_col
    )


def _adc_join_udf(books: np.ndarray):
    """Pandas UDF (qvec, pq_code) -> ADC score with PER-BATCH table
    construction — the piece that lets the query side stay a DataFrame.

    Each Arrow batch dedups its query vectors (after a shuffle-join on
    query_id the batch is runs of the same query, so the dedup is nearly
    free) and builds ADC tables only for the ≤ unique ones, in chunks of
    256 so closure memory stays ≤ ~4 MB at m=8, k=256 regardless of
    batch composition.  The table math (einsum + byte-gather + sum over
    subspaces) is operation-identical to :func:`pq_knn`'s collected
    path, so the two paths score bit-identically.
    """
    from pyspark.sql.functions import pandas_udf

    books = np.ascontiguousarray(books, dtype=np.float64)
    m = books.shape[0]

    @pandas_udf("double")
    def _adc(qvec: pd.Series, code: pd.Series) -> pd.Series:
        Q = _normalize(np.stack(qvec.to_numpy()).astype(np.float64))
        C = _codes_matrix(code, m)
        qv = np.ascontiguousarray(Q)
        view = qv.view([("", qv.dtype)] * qv.shape[1]).ravel()
        _, first_idx, inv = np.unique(
            view, return_index=True, return_inverse=True
        )
        Qu = qv[first_idx]
        out = np.empty(len(C), dtype=np.float64)
        chunk = 256
        for lo in range(0, len(Qu), chunk):
            hi = min(lo + chunk, len(Qu))
            # shared kernel (_adc_tables/_adc_gather) — bit-identity
            # with the collected paths is a stated contract, enforced
            # by one definition instead of three copies
            tables = _adc_tables(Qu[lo:hi], books)
            mask = (inv >= lo) & (inv < hi)
            out[mask] = _adc_gather(tables, inv[mask] - lo, C[mask])
        return pd.Series(out)

    return _adc


def ivf_pq_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    index: tuple | None = None,
    codebooks: np.ndarray | None = None,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search whose QUERY SIDE IS A DATAFRAME — never collected.

    ``ivf_pq_knn`` ships per-query ADC tables in the UDF closure, which
    is the fast shape for a bounded query batch but caps the query count
    (the ``max_queries`` contract).  This variant removes the cap: probe
    cells are assigned by the Arrow matmul UDF (distributed), candidates
    come from the (codes ⋈ probed-cells) equi-join carrying only NARROW
    rows (query_id, id, m-byte code), the query vector is attached by a
    second equi-join on query_id (sort-merge at scale — which also gives
    the scoring UDF same-query batch locality), and ADC tables are built
    per Arrow batch for the batch's unique queries.  Ten million queries
    are just ten million rows; nothing scales with the driver.

    Shuffle ledger at 100 TB: (1) eval-side probe fan-out n_probe rows/
    query, (2) candidate join on the small-int cell id, (3) candidate
    re-shuffle on query_id for vector attach + top-k — all narrow rows;
    the corpus shuffles only its probed code rows, never raw vectors
    (except the optional exact-rerank fetch of the final k·factor ids).

    ``index`` / ``codebooks``: pass prebuilt artifacts in production so
    per-call training cost disappears (trained once, reused per ingest).
    """
    from ros_sql_spark.operators.similarity import _probe_cells, ivf_index

    assigned, centers = (
        index
        if index is not None
        else ivf_index(corpus, n_cells, seed, id_col, vec_col)
    )
    books = (
        codebooks
        if codebooks is not None
        else pq_train(
            corpus, dim=dim, m=m, n_centroids=n_centroids,
            vec_col=vec_col, seed=seed,
        )
    )
    # codes_df: prebuilt (id, _cell, pq_code) table — the persisted-
    # index serving path (operators/ann_store.py) passes a manifest-
    # pruned read of its codes table so only probed cells' files open;
    # pq_encode is deterministic given the codebooks, so results are
    # identical to encoding in-line.
    codes = (
        codes_df
        if codes_df is not None
        else pq_encode(assigned, books, id_col, vec_col, keep_cols=["_cell"])
    )

    probe = _probe_cells(centers, n_probe)
    qbase = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    q_cells = (
        qbase.withColumn("_cells", probe("_qvec"))
        # explode_outer: Generate invariant (CLAUDE.md); the probe UDF
        # is total, so _cells is never null/empty.
        .withColumn("_cell", F.explode_outer("_cells"))
        .select(query_id_col, "_cell")
    )
    cand = codes.join(q_cells, "_cell")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(query_id_col))
    cand = cand.select(query_id_col, id_col, "pq_code")

    scored = cand.join(qbase, query_id_col).select(
        query_id_col,
        id_col,
        _adc_join_udf(books)(F.col("_qvec"), F.col("pq_code")).alias("_adc"),
    )
    # qv NOT broadcast: the whole point of this path is an unbounded
    # query side
    return _finalize_topk(
        scored, qbase, k, rerank, rerank_factor, id_col, vec_col,
        query_id_col, broadcast_qv=False,
    )
