"""J7 — grid-based kNN with candidate pruning (north rule).

The reference's only nearest-neighbour op is the 1-D closest-date argmin
(/root/reference/terrakit/download/download_data.py:276-285); the north rule
adds spatial kNN. Two-phase EXACT algorithm:

  Phase 1 (pruned): explode each query to its (2R+1)^2 ring of grid cells,
  equi-join candidates on cell, rank by distance. A query is *proven exact*
  if it found >= k candidates and its kth distance < (R-1)*cell_deg — any
  unexamined candidate sits in a cell Chebyshev-distance > R away, hence
  strictly farther than (R-1) degrees.
  Phase 2 (fallback): the unproven queries (sparse regions) re-rank against
  the full candidate set. At scale this is a small fraction and R is sized
  to the measured candidate density; the phase-1 join is the 10^12-scale
  path (shuffle on cell, AQE skew split for hotspot cells).

All distance math is Spark SQL column expressions (codegen, no Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrakit_spark.dialect import DUCK
from terrakit_spark.operators.spatial_join import _register_views
from terrakit_spark.registry import register_df, with_synth

K = 5
RING = 3
CELL = 1.0


def _dist2(mx, my, cx, cy):
    return (mx - cx) * (mx - cx) + (my - cy) * (my - cy)


def grid_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = K,
    ring: int = RING,
    cell_deg: float = CELL,
) -> DataFrame:
    """queries(qid, mx, my) x candidates(label_id, cx, cy) -> exact top-k
    (qid, rank, label_id, dist2)."""
    q = queries.withColumn("_qcx", F.floor(F.col("mx") / cell_deg).cast("long")).withColumn(
        "_qcy", F.floor(F.col("my") / cell_deg).cast("long")
    )
    c = candidates.withColumn("_ccx", F.floor(F.col("cx") / cell_deg).cast("long")).withColumn(
        "_ccy", F.floor(F.col("cy") / cell_deg).cast("long")
    )
    ring_seq = F.sequence(F.lit(-ring), F.lit(ring))
    q_ring = (
        q.withColumn("_dx", F.explode(ring_seq))
        .withColumn("_dy", F.explode(ring_seq))
        .withColumn("_cx", F.col("_qcx") + F.col("_dx"))
        .withColumn("_cy", F.col("_qcy") + F.col("_dy"))
    )
    cand = q_ring.join(
        c,
        (q_ring["_cx"] == c["_ccx"]) & (q_ring["_cy"] == c["_ccy"]),
        "inner",
    ).select("qid", "mx", "my", "label_id", "cx", "cy")

    w = Window.partitionBy("qid").orderBy(F.col("dist2").asc(), F.col("label_id").asc())
    ranked = cand.withColumn("dist2", _dist2(F.col("mx"), F.col("my"), F.col("cx"), F.col("cy"))).withColumn(
        "rank", F.row_number().over(w)
    )
    topk = ranked.filter(F.col("rank") <= k)
    proof = topk.groupBy("qid").agg(
        F.count("*").alias("_n"),
        F.max("dist2").alias("_kth"),
    )
    bound = float((ring - 1) * cell_deg) ** 2
    proven = proof.filter((F.col("_n") >= k) & (F.col("_kth") < F.lit(bound))).select("qid")
    exact_part = topk.join(F.broadcast(proven), "qid", "left_semi")

    # fallback: unproven queries vs full candidate set
    fb_q = q.join(F.broadcast(proven), "qid", "left_anti").select("qid", "mx", "my")
    fb = fb_q.crossJoin(candidates.select("label_id", "cx", "cy"))
    fb_ranked = fb.withColumn("dist2", _dist2(F.col("mx"), F.col("my"), F.col("cx"), F.col("cy"))).withColumn(
        "rank", F.row_number().over(w)
    )
    fb_topk = fb_ranked.filter(F.col("rank") <= k)

    cols = ["qid", "rank", "label_id", "dist2"]
    return exact_part.select(*cols).unionByName(fb_topk.select(*cols))


def knn_media_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir)
    queries = spark.sql("SELECT media_ref AS qid, mx, my FROM media WHERE doc_num % 100 = 0")
    candidates = spark.sql("SELECT label_id, cx, cy FROM labels")
    out = grid_knn(queries, candidates)
    return out.withColumnRenamed("qid", "media_ref")


_ORACLE = with_synth(
    DUCK,
    f"""
SELECT media_ref, rank, label_id, dist2 FROM (
  SELECT p.media_ref, l.label_id,
         (p.mx - l.cx) * (p.mx - l.cx) + (p.my - l.cy) * (p.my - l.cy) AS dist2,
         row_number() OVER (
           PARTITION BY p.media_ref
           ORDER BY (p.mx - l.cx) * (p.mx - l.cx) + (p.my - l.cy) * (p.my - l.cy) ASC, l.label_id ASC
         ) AS rank
  FROM (SELECT media_ref, mx, my FROM media WHERE doc_num % 100 = 0) p
  CROSS JOIN labels l
) t WHERE rank <= {K}
""",
    tables=["labels", "media"],
)

register_df("knn_grid", knn_media_labels, oracle=_ORACLE)
