"""Product quantization (operators/similarity.py PQ half)."""

from pyspark.sql import functions as F

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_pq,
    pq_train_encode,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codebooks_and_codes_shape(spark):
    emb = _emb(spark)
    cb, codes = pq_train_encode(emb, n_subspaces=4, k_sub=16, dim=64)
    cb_rows = cb.collect()
    assert {(r["subspace"], r["code"]) for r in cb_rows} == {
        (s, c) for s in range(4) for c in range(16)
    }
    assert all(len(r["cv"]) == 16 for r in cb_rows)
    n = emb.count()
    assert codes.count() == n * 4
    # each vector has exactly one code per subspace, all in range
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == 4 for r in per_vec)
    assert codes.filter(
        (F.col("code") < 0) | (F.col("code") >= 16)
    ).count() == 0


def test_pq_is_deterministic(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    a = cosine_topk_pq(emb, q, k=5).collect()
    b = cosine_topk_pq(emb, q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_reranked_recall_against_brute(spark):
    """Two-stage search (ADC shortlist -> exact rerank): recall@5 is
    bounded by shortlist coverage, not quantization error. On this
    corpus (~8 intrinsic dims over 64 — hostile to contiguous-split
    PQ) an 8x16 codebook with a 100-wide shortlist clears 0.6;
    raw ADC alone sits near 0.15."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_pq(
            emb, q, k=5, n_subspaces=8, rerank=100
        ).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, f"recall@5 {recall:.2f}"


def test_reranked_scores_are_exact(spark):
    """After the rerank the reported score IS the true cosine: every
    retrieved pair's score equals the brute-force score exactly."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    approx = cosine_topk_pq(emb, q, k=5, n_subspaces=8, rerank=100)
    true = cosine_topk(emb, q, k=499)  # scores for all pairs
    j = approx.alias("a").join(
        true.alias("t"),
        (F.col("a.query_id") == F.col("t.query_id"))
        & (F.col("a.neighbor_id") == F.col("t.neighbor_id")),
    )
    assert j.count() == approx.count()
    assert j.filter(
        F.col("a.cos_sim") != F.col("t.cos_sim")
    ).count() == 0
