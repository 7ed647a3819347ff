"""Similarity search over the embeddings table (array<float>, dim 64).

- ann_topk_quantized: brute-force cosine top-k, the exactness baseline.
  Embeddings are quantized to int (round(x*1000)) so dot products and norms
  are EXACT integers — the Spark aggregate and the DuckDB oracle agree
  bit-for-bit; only the final cosine is a (deterministic) double division.
  The dot product is `aggregate(zip_with(...))` — JVM codegen, no Python.

- ann_lsh_bucketed: the scale path — random-hyperplane LSH (deterministic
  integer "hyperplanes" derived from the hash index) buckets candidates so
  each query only scores its bucket. Verified in pytest for recall against
  the brute-force baseline (approximate by design -> no value oracle).

Scale notes: brute force is O(Q x N) — fine for a broadcastable query set,
wrong at 10^12; the LSH variant shuffles on bucket id and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrakit_spark.dialect import DUCK, SPARK, D
from terrakit_spark.registry import ensure_base_views, register_df, register_sql

TOPK = 10
QUERY_PRED = "(vec_id % 50) = 0"


def _quant(d: D, arr: str) -> str:
    if d.d == SPARK:
        return f"transform({arr}, x -> CAST(round(x * 1000, 0) AS BIGINT))"
    return f"list_transform({arr}, x -> CAST(round(x * 1000, 0) AS BIGINT))"


def _dot(d: D, a: str, b: str) -> str:
    if d.d == SPARK:
        return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    return f"CAST(list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i])) AS BIGINT)"


def _ann_topk(dialect: str) -> str:
    d = D(dialect)
    return f"""
SELECT qid, rank, vec_id, cos_sim FROM (
  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         CAST({_dot(d, 'q.qe', 'c.qe')} AS DOUBLE)
           / sqrt(CAST(q.norm2 AS DOUBLE) * CAST(c.norm2 AS DOUBLE)) AS cos_sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY CAST({_dot(d, 'q.qe', 'c.qe')} AS DOUBLE)
                    / sqrt(CAST(q.norm2 AS DOUBLE) * CAST(c.norm2 AS DOUBLE)) DESC,
                    c.vec_id ASC
         ) AS rank
  FROM (SELECT vec_id, qe, {_dot(d, 'qe', 'qe')} AS norm2
        FROM (SELECT vec_id, {_quant(d, 'embedding')} AS qe FROM embeddings WHERE {QUERY_PRED}) _q) q
  JOIN (SELECT vec_id, qe, {_dot(d, 'qe', 'qe')} AS norm2
        FROM (SELECT vec_id, {_quant(d, 'embedding')} AS qe FROM embeddings) _c) c
    ON c.vec_id <> q.vec_id AND c.norm2 > 0 AND q.norm2 > 0
) t WHERE rank <= {TOPK}
"""


register_sql("ann_topk_quantized", _ann_topk, tables=[])


def _embedding_near_dup(dialect: str) -> str:
    """Embedding-cosine near-duplicate pairs: all pairs with quantized
    cosine >= 0.45 over a deterministic subset (brute verify path; at scale
    the LSH buckets generate the candidates). Same exact-integer dot."""
    d = D(dialect)
    return f"""
SELECT d1, d2, round(cos_sim, 6) AS cos_sim FROM (
  SELECT a.vec_id AS d1, b.vec_id AS d2,
         CAST({_dot(d, 'a.qe', 'b.qe')} AS DOUBLE)
           / sqrt(CAST({_dot(d, 'a.qe', 'a.qe')} AS DOUBLE) * CAST({_dot(d, 'b.qe', 'b.qe')} AS DOUBLE)) AS cos_sim
  FROM (SELECT vec_id, {_quant(d, 'embedding')} AS qe FROM embeddings WHERE (vec_id % 10) = 0) a
  JOIN (SELECT vec_id, {_quant(d, 'embedding')} AS qe FROM embeddings WHERE (vec_id % 10) = 0) b
    ON b.vec_id > a.vec_id
) t WHERE cos_sim >= 4.5e-1
"""


register_sql("embedding_near_dup", _embedding_near_dup, tables=[])


N_PLANES = 8


def lsh_bucket_expr(qe_col: str) -> F.Column:
    """Deterministic random-hyperplane LSH: plane p weight for dim i =
    ((i+1)*(p+3)*2654435761 mod 1000003) - 501001 (zero-mean-ish ints);
    bucket bit p = sign of <plane_p, v>. Pure column expressions."""
    bits = []
    for p in range(N_PLANES):
        w = f"((CAST(i AS BIGINT) + 1) * {(p + 3) * 2654435761 % 4294967291}) % 1000003 - 501001"
        proj = (
            f"aggregate(zip_with({qe_col}, sequence(0, size({qe_col}) - 1), "
            f"(x, i) -> x * ({w})), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END")
    return F.expr(" + ".join(bits))


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH
    bucket. Returns (qid, rank, vec_id, cos_sim) like the brute-force op."""
    ensure_base_views(spark, sf_dir)
    emb = spark.table("embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(round(x * 1000, 0) AS BIGINT)) AS qe"
    )
    emb = emb.withColumn("norm2", F.expr("aggregate(zip_with(qe, qe, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
    emb = emb.withColumn("bucket", lsh_bucket_expr("qe")).filter("norm2 > 0")
    q = emb.filter(QUERY_PRED).select(
        F.col("vec_id").alias("qid"), F.col("qe").alias("q_qe"), F.col("norm2").alias("q_norm2"), "bucket"
    )
    cand = emb.select(F.col("vec_id"), F.col("qe").alias("c_qe"), F.col("norm2").alias("c_norm2"), "bucket")
    joined = q.join(cand, "bucket").filter(F.col("vec_id") != F.col("qid"))
    scored = joined.withColumn(
        "cos_sim",
        F.expr(
            "CAST(aggregate(zip_with(q_qe, c_qe, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)"
            " / sqrt(CAST(q_norm2 AS DOUBLE) * CAST(c_norm2 AS DOUBLE))"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOPK).select(
        "qid", "rank", "vec_id", "cos_sim"
    )


register_df("ann_lsh_bucketed", ann_lsh_bucketed)
