"""Similarity-search queries over ``embeddings`` (array<float>, dim 64).

Brute-force exact cosine is the baseline (broadcast nested-loop argmax —
check-matching-fn core.clj:1020-1069 lifted to vectors); sign-bucket LSH
is the corpus-scale path. Cosine values are rounded to 6 decimals on
both sides to absorb summation-order ulps; ranks are computed on the
unrounded values with a pinned (cosine DESC, neighbor_id ASC) tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_lib_spark.operators.dedup import _sign_bucket
from ocr_lib_spark.operators.similarity import brute_force_topk, knn_label_vote
from ocr_lib_spark.plans import QueryDef, load

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 10
LSH_BITS = 8


def _emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def _cosine_topk(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(e, q, k=TOP_K)
    return out.select(
        "query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine_r6")
    )


_O_COSINE = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
       round(cosine, 6) AS cosine_r6
FROM ranked WHERE rank <= {TOP_K}
"""


def _lsh_buckets(spark, sf_dir):
    e = _emb(spark, sf_dir)
    return (
        e.select(_sign_bucket(F.col("embedding"), LSH_BITS).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


_O_LSH_BUCKETS = f"""
SELECT ({" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(LSH_BITS))})::INT AS bucket,
       COUNT(*) AS n
FROM embeddings GROUP BY 1
"""


def _knn_vote(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < N_QUERIES)
    return knn_label_vote(e, q, k=5)


_O_KNN = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nlabel,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
topk AS (
  SELECT query_id, nlabel FROM (
    SELECT query_id, nlabel, cosine, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM pairs) WHERE rank <= 5),
votes AS (
  SELECT query_id, nlabel, COUNT(*) AS n FROM topk GROUP BY query_id, nlabel)
SELECT query_id, nlabel AS pred_label, n AS votes FROM (
  SELECT query_id, nlabel, n,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY n DESC, nlabel ASC) AS r
  FROM votes) WHERE r = 1
"""


NEAR_DUP_T = 0.30  # synthetic embeddings have no true near-dups (max
# in-bucket cosine ≈ 0.43); the threshold exercises the semantics on
# a non-trivial pair set. Production default stays 0.95.


def _near_dup(spark, sf_dir):
    from ocr_lib_spark.operators.dedup import embedding_near_dup

    return embedding_near_dup(
        _emb(spark, sf_dir),
        threshold=NEAR_DUP_T,
        n_lsh_bits=LSH_BITS,
        round_decimals=6,
    )


_O_NEAR_DUP = f"""
WITH wb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ({" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(LSH_BITS))})::INT AS bucket
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= {NEAR_DUP_T}
"""


QUERIES = {
    "cosine_topk": QueryDef(_cosine_topk, _O_COSINE, "exact brute-force cosine top-k (broadcast argmax)"),
    "ann_lsh_buckets": QueryDef(_lsh_buckets, _O_LSH_BUCKETS, "sign-bucket LSH histogram (ANN scale path)"),
    "knn_label_vote": QueryDef(_knn_vote, _O_KNN, "kNN majority-vote classification, pinned ties"),
    "embedding_near_dup": QueryDef(_near_dup, _O_NEAR_DUP, "LSH-bucketed cosine near-dup (bucket prune + exact verify)"),
}
