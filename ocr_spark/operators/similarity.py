"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k (exact baseline, SQL-oracle-checkable) and a
random-hyperplane LSH-bucketed variant (the sublinear scale path).

Execution shape: the small side (query set / hyperplanes / — for the
all-pairs oracle — the whole normalized matrix) is broadcast as a numpy
array; each Arrow batch of the big side does ONE float64 matmul against
it inside mapInPandas. No per-pair Catalyst fold, no crossJoin row
explosion: similarity math runs at BLAS speed and only (id, id, sim)
survivors leave Python.

Numeric discipline: all math in float64, results rounded to 6 dp on both
engine and oracle sides. numpy's pairwise summation differs from the
oracle's sequential fold by ~1e-15 relative — eleven orders of magnitude
below the rounding quantum.

Scale notes (100 TB):
  * cosine_topk broadcasts only the query matrix; work is one scan of the
    embedding table + a tiny per-query top-k shuffle. Linear in rows.
  * embedding_neardup_pairs broadcasts the full normalized matrix — the
    EXACT O(n^2) oracle, intended for samples/small SFs; the production
    near-dup path is LSH bucketing (minhash/simhash for text,
    hyperplane buckets here).
  * lsh_topk buckets by sign-bit prefixes of hyperplane projections:
    candidate generation is an equi-join on a short int key, so the pair
    matrix is never materialized. Recall tunable via num_planes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import hashfam


def _matrix(pdf_vecs: pd.Series) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in pdf_vecs])


def _id_sql_type(df: DataFrame, id_col: str) -> str:
    """SQL type name of the id column, so mapInPandas output schemas stay
    type-generic (string doc ids and long vec ids both work)."""
    return df.schema[id_col].dataType.simpleString()


def _normalized_rows(df: DataFrame, id_col: str, vec_col: str):
    """Collect (ids, unit-row matrix) to the driver for broadcasting."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = _matrix(pdf[vec_col])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def cosine_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Returns (query_id, neighbor_id, cos_sim, rank); self excluded; ties
    broken by neighbor_id ascending (deterministic across engines).
    """
    spark = emb.sparkSession
    q_ids, q_mat = _normalized_rows(
        emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col
    )
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..blas_pin import pin_blas_single_thread

        pin_blas_single_thread()
        qids, qmat = bc.value
        for pdf in batches:
            mat = _matrix(pdf["vec"])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ qmat.T  # (batch, n_queries)
            n, m = sims.shape
            yield pd.DataFrame({
                "query_id": np.repeat(qids[None, :], n, axis=0).ravel(),
                "neighbor_id": np.repeat(pdf["id"].to_numpy(), m),
                "cos_sim": np.round(sims.ravel(), 6),
            })

    id_t = _id_sql_type(emb, id_col)
    scored = (
        emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("vec"))
        .mapInPandas(
            _score,
            schema=f"query_id {id_t}, neighbor_id {id_t}, cos_sim double",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Brute-force cosine near-dup pairs (id_a < id_b, sim >= threshold).

    Exact O(n^2) baseline / oracle: the full unit matrix is broadcast and
    each batch matmuls against it. Use LSH bucketing beyond small SFs.
    """
    spark = emb.sparkSession
    all_ids, all_mat = _normalized_rows(emb, id_col, vec_col)
    bc = spark.sparkContext.broadcast((all_ids, all_mat))

    def _pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..blas_pin import pin_blas_single_thread

        pin_blas_single_thread()
        ids_b, mat_b = bc.value
        for pdf in batches:
            mat = _matrix(pdf["vec"])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ mat_b.T
            ids_a = pdf["id"].to_numpy()
            sims = np.round(sims, 6)
            keep = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({
                "id_a": ids_a[ai],
                "id_b": ids_b[bi],
                "cos_sim": sims[ai, bi],
            })

    id_t = _id_sql_type(emb, id_col)
    return (
        emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("vec"))
        .mapInPandas(
            _pairs, schema=f"id_a {id_t}, id_b {id_t}, cos_sim double"
        )
    )


def lsh_neardup_pairs(
    emb: DataFrame, id_col: str, vec_col: str,
    threshold: float = 0.9, num_planes: int = 8,
) -> DataFrame:
    """Hyperplane-LSH-bucketed cosine near-dup pairs — the sublinear
    production path for embedding near-dup (vs the exact O(n^2) oracle
    embedding_neardup_pairs). Candidates share a sign-bucket, so the pair
    matrix is never materialized; recall < 1 by design (a near-dup pair
    straddling a hyperplane is missed — tested against the exact oracle
    for containment). Returns (id_a, id_b, cos_sim)."""
    base = with_lsh_buckets(emb, id_col, vec_col, num_planes)
    a = base.alias("a")
    b = base.alias("b")
    dot = F.aggregate(
        F.zip_with("a.vec", "b.vec", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF-style ANN: deterministic coarse quantizer + probed cells
# --------------------------------------------------------------------------

def _ivf_centroids(dim: int, num_centroids: int) -> np.ndarray:
    """Unit-norm md5-derived centroids (functions/hashfam.py) — a fixed
    coarse quantizer instead of a trained k-means codebook, so the DuckDB
    oracle can inline the exact values and recompute cell assignment."""
    from ..functions import hashfam

    c = np.asarray(
        [[2.0 * hashfam.md5_base60(f"ivf:{i}:{d}") / hashfam.TWO_60 - 1.0
          for d in range(dim)] for i in range(num_centroids)],
        dtype=np.float64,
    )
    return c / np.linalg.norm(c, axis=1)[:, None]


def _vec_dim(emb: DataFrame, vec_col: str) -> int:
    """Embedding width from one driver job (first non-null row).

    Raises ValueError on an empty input instead of the TypeError that
    ``first()[0]`` would produce. Callers that already hold a vector
    (e.g. a collected query set) pass ``dim`` through instead."""
    row = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if row is None:
        raise ValueError(f"cannot infer dim: no rows with non-null {vec_col}")
    return len(row[0])


def train_ivf_centroids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    num_centroids: int = 16,
    iters: int = 5,
    round_decimals: int | None = 9,
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) — a TRAINED coarse quantizer
    for IVF, vs the fixed md5 codebook of `_ivf_centroids`. Iterative,
    but still fully SQL-oracle-able: with a fixed iteration count the
    whole training unrolls into a chain of assign/aggregate CTEs (see
    `__spark_entry__._ann_ivf_trained_oracle`), and `round_decimals`
    pins each intermediate codebook to a decimal grid so cross-engine
    floating-point summation order (Spark partial-sum tree vs DuckDB
    streaming sum, disagreeing only in the last ulp) cannot drift the
    cell decision boundaries between engines. 9 decimals is far below
    any geometric significance and far above the ~1e-15 cross-engine
    disagreement, so the rounding is behavior-neutral per engine while
    making the two engines' codebooks bit-identical.

    Deterministic end to end: seeds are the `num_centroids` vectors with
    the smallest (md5(id), id) — an engine-neutral order, no RNG — and
    assignment breaks ties by first centroid index.

    Scale shape (100 TB): each iteration is ONE scan of the persisted
    (id, unit-vec) projection. The mapInPandas stage assigns cells with a
    single BLAS matmul per Arrow batch and emits only per-batch partial
    sums — at most `num_centroids` rows per batch (map-side combine), so
    the groupBy that finishes the reduction shuffles ~tasks x k tiny
    rows, never the vectors. Centroids (k x dim floats) broadcast each
    round. The driver never holds more than k partial rows.
    """
    base = (
        emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("vec"))
        .filter(F.col("vec").isNotNull())
        .persist()
    )
    try:
        seed_rows = (
            base.orderBy(F.md5(F.col("id").cast("string")), "id")
            .limit(num_centroids)
            .select("vec")
            .collect()
        )
        if not seed_rows:
            raise ValueError("train_ivf_centroids: input has no vectors")
        dim = len(seed_rows[0][0])
        cents = _ivf_centroids(dim, num_centroids)  # pad if n < k
        seeds = _matrix(pd.Series([r[0] for r in seed_rows]))
        norms = np.linalg.norm(seeds, axis=1)
        norms[norms == 0] = 1.0
        cents[: len(seeds)] = seeds / norms[:, None]
        if round_decimals is not None:
            cents = np.round(cents, round_decimals)

        spark = emb.sparkSession
        sum_cols = [
            F.sum(F.element_at("vsum", i + 1)).alias(f"s{i}")
            for i in range(dim)
        ]
        for _ in range(iters):
            bc = spark.sparkContext.broadcast(cents)

            def _partials(batches: Iterator[pd.DataFrame],
                          ) -> Iterator[pd.DataFrame]:
                from ..blas_pin import pin_blas_single_thread

                pin_blas_single_thread()
                cm = bc.value
                for pdf in batches:
                    mat = _matrix(pdf["vec"])
                    nrm = np.linalg.norm(mat, axis=1)
                    nrm[nrm == 0] = 1.0
                    unit = mat / nrm[:, None]
                    cell = np.argmax(unit @ cm.T, axis=1)
                    rows = [
                        (int(c), int((cell == c).sum()),
                         unit[cell == c].sum(axis=0).tolist())
                        for c in np.unique(cell)
                    ]
                    yield pd.DataFrame(
                        rows, columns=["cell", "n", "vsum"])

            got = (
                base.mapInPandas(
                    _partials,
                    schema="cell long, n long, vsum array<double>")
                .groupBy("cell")
                .agg(F.sum("n").alias("n"), *sum_cols)
                .collect()
            )
            bc.unpersist()
            new = cents.copy()
            for row in got:
                v = np.asarray(row[2:], dtype=np.float64)
                n = np.linalg.norm(v)
                if row["n"] > 0 and n > 0:
                    new[row["cell"]] = (
                        np.round(v / n, round_decimals)
                        if round_decimals is not None else v / n
                    )
            cents = new
        return cents
    finally:
        base.unpersist()


def with_ivf_cells(
    emb: DataFrame, id_col: str, vec_col: str, num_centroids: int = 16,
    dim: int | None = None, centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, vec, norm, cell): cell = argmax dot(vec, unit centroid) —
    first index wins ties (matches the oracle's row_number rule). One
    matmul per Arrow batch. `centroids` overrides the fixed md5 codebook
    (pass a `train_ivf_centroids` result for the trained quantizer)."""
    if centroids is not None:
        dim = centroids.shape[1]
    if dim is None:
        dim = _vec_dim(emb, vec_col)
    if centroids is None:
        centroids = _ivf_centroids(dim, num_centroids)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..blas_pin import pin_blas_single_thread

        pin_blas_single_thread()
        cm = bc.value
        for pdf in batches:
            mat = _matrix(pdf["vec"])
            pdf = pdf.copy()
            pdf["norm"] = np.linalg.norm(mat, axis=1)
            pdf["cell"] = np.argmax(mat @ cm.T, axis=1).astype(np.int64)
            yield pdf

    id_t = _id_sql_type(emb, id_col)
    base = emb.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("vec"))
    return base.mapInPandas(
        _assign,
        schema=f"id {id_t}, vec array<double>, norm double, cell long",
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: each query probes its `nprobe`
    nearest cells and ranks only the vectors assigned there. `centroids`
    swaps in a trained codebook (train_ivf_centroids) for the fixed
    md5 quantizer.

    Scale shape: cell assignment is one scan + matmul; the candidate join
    is an equi-join on a small int key (no pair matrix); each query's
    probe list is tiny and broadcast. Recall < 1 by design (tested for
    overlap vs the exact baseline). Returns (query_id, neighbor_id,
    cos_sim, rank)."""
    spark = emb.sparkSession

    qpdf = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("qvec"))
        .toPandas()
    )
    # dim comes from the query vectors already collected — zero extra
    # driver jobs (round-2 ran emb.first() twice per invocation here).
    if len(qpdf):
        dim = len(qpdf["qvec"].iloc[0])
    else:
        dim = _vec_dim(emb, vec_col)  # raises cleanly on empty input
    base = with_ivf_cells(emb, id_col, vec_col, num_centroids, dim=dim,
                          centroids=centroids)
    if centroids is None:
        centroids = _ivf_centroids(dim, num_centroids)
    qmat = _matrix(qpdf["qvec"])
    qnorms = np.linalg.norm(qmat, axis=1)
    qnorms[qnorms == 0] = 1.0
    dots = qmat @ centroids.T  # (n_queries, num_centroids)
    # top-nprobe cells per query: dot desc, cell index asc on ties —
    # identical to the oracle's row_number ordering
    order = np.lexsort((np.arange(dots.shape[1])[None, :].repeat(
        dots.shape[0], axis=0), -dots), axis=1)[:, :nprobe]
    probe_rows = [
        (qid, int(cell), [float(x) for x in vec], float(n))
        for qid, vec, n, cells in zip(
            qpdf["query_id"], qpdf["qvec"], qnorms, order)
        for cell in cells
    ]
    id_t = _id_sql_type(emb, id_col)
    probes = spark.createDataFrame(
        probe_rows,
        schema=f"query_id {id_t}, cell long, qvec array<double>, "
               f"qnorm double",
    )
    cand = base.join(
        F.broadcast(probes),
        (base["cell"] == probes["cell"])
        & (base["id"] != probes["query_id"]),
    )
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = cand.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(dot / (F.col("norm") * F.col("qnorm")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplanes(dim: int, num_planes: int) -> np.ndarray:
    """md5-derived deterministic hyperplanes (functions/hashfam.py) so the
    DuckDB oracle can inline the exact same values and recompute buckets."""
    return np.asarray(hashfam.hyperplanes(num_planes, dim), dtype=np.float64)


def with_lsh_buckets(
    emb: DataFrame, id_col: str, vec_col: str,
    num_planes: int = 8,
) -> DataFrame:
    """(id, vec, norm, bucket): sign-bit bucket of hyperplane projections,
    computed as one matmul per Arrow batch."""
    dim = _vec_dim(emb, vec_col)
    planes = _hyperplanes(dim, num_planes)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(planes)

    def _bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..blas_pin import pin_blas_single_thread

        pin_blas_single_thread()
        pl = bc.value
        weights = (1 << np.arange(pl.shape[0])).astype(np.int64)
        for pdf in batches:
            mat = _matrix(pdf["vec"])
            bits = (mat @ pl.T) > 0
            pdf = pdf.copy()
            pdf["norm"] = np.linalg.norm(mat, axis=1)
            pdf["bucket"] = bits @ weights
            yield pdf

    id_t = _id_sql_type(emb, id_col)
    base = emb.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("vec"))
    return base.mapInPandas(
        _bucketize,
        schema=f"id {id_t}, vec array<double>, norm double, bucket long",
    )


def lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket of the query.

    Sublinear scale path — the equi-join on bucket replaces the cross
    join. Returns (query_id, neighbor_id, cos_sim, rank) over candidates
    only (recall < 1 by design; tested against cosine_topk for overlap,
    and — since the hyperplanes are md5-derived constants — exactly
    reproduced by the DuckDB oracle, buckets included).
    """
    base = with_lsh_buckets(emb, id_col, vec_col, num_planes)
    queries = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cand = base.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("id") != F.col("query_id")),
    )
    sim = F.zip_with("vec", "qvec", lambda x, y: x * y)
    dot = F.aggregate(sim, F.lit(0.0), lambda acc, x: acc + x)
    scored = cand.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(dot / (F.col("norm") * F.col("qnorm")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )

def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    num_centroids: int = 16,
    centroids: np.ndarray | None = None,
    chunk: int = 1024,
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic near-dup
    pruning WITHIN coarse-quantizer cells. Cluster with IVF cells (pass a
    `train_ivf_centroids` codebook for the paper's k-means variant), then
    inside each cell drop every vector that has a higher-priority
    neighbor with cosine >= `tau`.

    Deterministic contract (shared verbatim with the DuckDB oracle,
    `__spark_entry__._semantic_dedup_oracle`): priority is the total
    order (md5(str(id)), id) ascending — engine-neutral, no RNG. A row
    is DROPPED iff some strictly-higher-priority row in its cell has
    round(cos, 6) >= tau; `keeper_id` is the highest-priority such row.
    A keeper can itself be dropped by a still-earlier row — greedy
    chains resolve transitively through the drop list (same contract as
    the curate lineage table; drop status never feeds back into the
    decision, so rows are independent given the cell).

    Scale shape (100 TB): ONE shuffle, the groupBy(cell) — vectors move
    once, keyed by a small int. Per cell the gram product is chunked:
    `chunk x cell_size` peak memory, never a full cell^2 matrix, one
    BLAS matmul per chunk. num_centroids grows with n (SemDeDup uses
    ~sqrt(n) clusters at scale) to bound cell sizes; skewed cells are a
    codebook-quality problem, surfaced by cell-size stats, not a shuffle
    problem. Returns (doc_id, keeper_id, cos_sim) for dropped rows only.
    """
    cells = with_ivf_cells(emb, id_col, vec_col, num_centroids,
                           centroids=centroids)
    id_t = _id_sql_type(emb, id_col)

    def _dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..blas_pin import pin_blas_single_thread

        pin_blas_single_thread()
        import hashlib

        pdf = pdf.assign(
            _pk=[hashlib.md5(str(i).encode()).hexdigest()
                 for i in pdf["id"]]
        ).sort_values(["_pk", "id"]).reset_index(drop=True)
        mat = _matrix(pdf["vec"])
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        n = len(pdf)
        ids = pdf["id"].to_numpy()
        out = []
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            # dot/(|u||v|) on RAW vectors — the oracle's exact formula
            # (normalize-then-dot would differ in the last ulp)
            sims = np.round(
                (mat[lo:hi] @ mat[:hi].T)
                / (nrm[lo:hi, None] * nrm[None, :hi]), 6)
            allow = np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
            mask = (sims >= tau) & allow
            has = mask.any(axis=1)
            if not has.any():
                continue
            first = mask.argmax(axis=1)
            rows = np.nonzero(has)[0]
            out.append(pd.DataFrame({
                "doc_id": ids[lo + rows],
                "keeper_id": ids[first[rows]],
                "cos_sim": sims[rows, first[rows]],
            }))
        if not out:
            return pd.DataFrame(
                {"doc_id": ids[:0], "keeper_id": ids[:0],
                 "cos_sim": np.zeros(0)})
        return pd.concat(out, ignore_index=True)

    return cells.groupBy("cell").applyInPandas(
        _dedup_cell,
        schema=f"doc_id {id_t}, keeper_id {id_t}, cos_sim double",
    )


def semantic_contamination(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    eval_ids: list[int],
    tau: float,
) -> DataFrame:
    """Semantic benchmark decontamination — the embedding-space
    complement of the n-gram overlap probe (dedup.ngram_contamination):
    flag every corpus vector whose max cosine against ANY eval-set
    vector reaches `tau` (paraphrased eval leakage that shares no
    8-gram). Returns (id, matched_eval_id, max_sim) for flagged rows;
    matched_eval_id is the smallest eval id achieving the max (ties
    deterministic).

    Scale shape: the eval matrix (benchmarks are thousands of rows, not
    corpus-sized) BROADCASTS; the corpus streams through one
    mapInPandas with a single BLAS matmul per Arrow batch — no join, no
    shuffle, output bounded by the contamination volume. The same
    round-to-6-then-compare contract as the ANN family keeps the DuckDB
    oracle exact."""
    spark = emb.sparkSession
    ev = (
        emb.filter(F.col(id_col).isin(eval_ids))
        .select(F.col(id_col).alias("eid"),
                F.col(vec_col).cast("array<double>").alias("v"))
        .toPandas()
    )
    if not len(ev):
        raise ValueError("semantic_contamination: empty eval set")
    emat = _matrix(ev["v"])
    enorm = np.linalg.norm(emat, axis=1)
    enorm[enorm == 0] = 1.0
    eids = ev["eid"].to_numpy()
    order = np.argsort(eids)  # ties resolve to the SMALLEST eval id
    emat, enorm, eids = emat[order], enorm[order], eids[order]
    bc = spark.sparkContext.broadcast((emat, enorm, eids))
    id_t = _id_sql_type(emb, id_col)

    base = emb.filter(~F.col(id_col).isin(eval_ids)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def _flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..blas_pin import pin_blas_single_thread

        pin_blas_single_thread()
        em, en, ei = bc.value
        for pdf in batches:
            mat = _matrix(pdf["vec"])
            nrm = np.linalg.norm(mat, axis=1)
            nrm[nrm == 0] = 1.0
            sims = np.round(
                (mat @ em.T) / (nrm[:, None] * en[None, :]), 6)
            mx = sims.max(axis=1)
            hit = mx >= tau
            if not hit.any():
                continue
            first = np.argmax(sims[hit] == mx[hit, None], axis=1)
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy()[hit],
                "matched_eval_id": ei[first],
                "max_sim": mx[hit],
            })

    return base.mapInPandas(
        _flag,
        schema=f"id {id_t}, matched_eval_id {id_t}, max_sim double",
    )
