"""Similarity search over embedding columns.

Two tiers, matching the north-star requirement (BASELINE.json):

- ``cosine_topk``        : exact brute-force top-k — the correctness
                           baseline; the query set is broadcast so the
                           big side never shuffles.
- ``hyperplane_buckets`` + ``cosine_topk_lsh`` : random-hyperplane
                           LSH bucketing — the 100 TB path. Candidates
                           come only from the query's bucket (plus
                           optional Hamming-1 neighbor buckets), so
                           cost scales with bucket size, not corpus
                           size. Recall < 1 by construction; the
                           pytest suite measures it against brute
                           force (driver gets a rows-only check —
                           approximate results have no exact SQL
                           oracle).

Hyperplanes are deterministic (no RNG): plane j's coefficient for
dimension d is +1 when ((j*131 + d*137) mod 7) is even else -1 —
reproducible anywhere, including plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_sim, to_double_array

N_PLANES = 8


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (self excluded).

    queries is expected to be small (it is broadcast); ordering is
    (rounded cosine desc, neighbor id) for cross-engine determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def _plane_sign(j: int, d: int) -> int:
    return 1 if (j * 131 + d * 137) % 7 % 2 == 0 else -1


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = N_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Sign-pattern LSH bucket id per vector (0 .. 2^n_planes - 1).

    Each plane's projection is a +/-1 re-weighted element sum —
    computed with aggregate() over the array, JVM-side.
    """
    v = to_double_array(vec_col)
    plane_bits = []
    for j in range(n_planes):
        signs = F.array(*[F.lit(float(_plane_sign(j, d))) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda a, x: a + x
        )
        plane_bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j))
    bucket = sum(plane_bits)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        bucket.cast("int").alias("bucket"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = N_PLANES,
    dim: int = 64,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket
    plus (multiprobe) all buckets within that Hamming distance of it —
    the standard recall/cost dial for sign-pattern LSH.

    The corpus->bucket map is computed once (one pass over the
    corpus); the join key is the bucket id, so the candidate set per
    query is ~ (1 + n_planes^multiprobe) * N / 2^n_planes instead
    of N.
    """
    cb = hyperplane_buckets(corpus, vec_col, id_col, n_planes, dim)
    qb = hyperplane_buckets(queries, vec_col, id_col, n_planes, dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "bucket",
    )
    if multiprobe >= 1:
        # probe set: own bucket + every bucket one bit-flip away
        # (multiprobe>1 would extend recursively; 1 is the sweet spot)
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j))
                for j in range(n_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos_sim", F.round(cosine_sim(F.col("qv"), F.col("embedding")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
