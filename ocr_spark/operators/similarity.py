"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k (exact baseline, SQL-oracle-checkable) and a
random-hyperplane LSH-bucketed variant (the sublinear scale path).

Numeric discipline: embeddings are cast to double and dot products are
left-fold aggregates (F.aggregate over zip_with), which makes the result
bit-identical to a sequential sum — DuckDB's list_dot_product over
DOUBLE[] computes the same value, so the oracle comparison is exact before
rounding.

Scale notes (100 TB):
  * cosine_topk broadcasts the (tiny) query set and computes sims in the
    scan stage — one shuffle for the per-query top-k window. Norms are
    computed once per side, never per pair.
  * lsh_topk buckets both sides by sign-bit prefixes of h random
    hyperplane projections: candidate generation is an equi-join on the
    bucket key (shuffle on a short int key), so the pair matrix is never
    materialized. Recall is tunable via num_planes/num_probes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _with_norm(df: DataFrame, vec: str = "vec") -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col(vec), F.col(vec))))


def prepare_embeddings(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec double[], norm) — cast once, norm once."""
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    return _with_norm(out)


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
    base = prepare_embeddings(emb, id_col, vec_col)
    queries = base.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("id") != F.col("query_id")
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm"))
    scored = joined.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(sim, 6).alias("cos_sim"),
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

    Exact baseline / oracle; use lsh_topk-style bucketing beyond small SFs.
    """
    base = prepare_embeddings(emb, id_col, vec_col)
    a = base.alias("a")
    b = base.alias("b")
    sim = _dot(F.col("a.vec"), F.col("b.vec")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((num_planes, dim))


def lsh_bucket_key(vec_col, planes: np.ndarray):
    """Sign-bit bucket key from hyperplane projections (Catalyst exprs)."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        key = key.bitwiseXOR(F.shiftleft(bit, i))
    return key


def lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket of the query.

    Sublinear scale path — the equi-join on bucket replaces the cross
    join. Returns (query_id, neighbor_id, cos_sim, rank) over candidates
    only (recall < 1 by design; tested against cosine_topk for overlap).
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, num_planes, seed)
    base = prepare_embeddings(emb, id_col, vec_col).withColumn(
        "bucket", lsh_bucket_key(F.col("vec"), planes)
    )
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
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm"))
    scored = cand.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(sim, 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
