"""ANN recall-at-density study (round-4 verdict item 6): measure
recall@k of the two scale paths — ann_lsh_bucketed (multi-table capped
LSH) and ann_ivf_kmeans (IVF over the trained codebook) — against the
brute-force exactness baseline (ann_topk_quantized), at any SF_DIR.

Run at sf0.1 AND sf1 (10x density): the brute baseline's O(Q x N) cost is
contractual, so what must be shown at density is that the bucketed paths'
RECALL holds while their candidate work stays capped. Prints one JSON
line; results recorded in BENCH/BASELINE.md.

Usage: SPARK_GRAFT_SF_DIR=.work/sf1 python scripts/ann_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import terrakit_spark.operators  # noqa: F401
    from terrakit_spark.operators.similarity import QUERY_PRED, lsh_buckets
    from terrakit_spark.registry import QUERIES
    from terrakit_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="ann_recall", shuffle_partitions=int(CPUS))

    t0 = time.time()
    exact = QUERIES["ann_topk_quantized"](spark, SF_DIR).select("qid", "rank", "vec_id").cache()
    n_exact = exact.count()
    brute_sec = time.time() - t0

    out: dict = {"sf_dir": SF_DIR, "n_exact_pairs": n_exact, "brute_sec": round(brute_sec, 1)}

    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    n_queries = exact.select("qid").distinct().count()
    out["n_vecs"] = n_vecs
    out["n_queries"] = n_queries

    for name in ("ann_lsh_bucketed", "ann_ivf_kmeans"):
        t0 = time.time()
        approx = QUERIES[name](spark, SF_DIR).select("qid", "vec_id").cache()
        approx.count()
        sec = time.time() - t0
        res = {"sec": round(sec, 1)}
        for k in (1, 5, 10):
            hits = (
                exact.filter(F.col("rank") <= k)
                .join(approx, ["qid", "vec_id"], "inner")
                .count()
            )
            res[f"recall@{k}"] = round(hits / (n_queries * k), 4)
        out[name] = res

    # candidate fraction of the LSH path (lift denominator): distinct
    # union-over-tables bucket pairs vs the full Q x (N-1) brute cost
    bks = lsh_buckets(spark, SF_DIR).cache()
    q = bks.filter(QUERY_PRED).withColumnRenamed("vec_id", "qid")
    pairs = (
        q.join(bks, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
        .count()
    )
    frac = pairs / (n_queries * (n_vecs - 1))
    out["lsh_candidate_fraction"] = round(frac, 5)
    out["lsh_lift@10"] = round(out["ann_lsh_bucketed"]["recall@10"] / frac, 1) if frac else None

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
