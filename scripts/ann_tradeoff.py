"""ANN recall-vs-candidate-cost tradeoff sweep (round-5, verdict item 6).

The sf0.1 driver embeddings are isotropic random — LSH's theoretical
worst case (tests/test_ann_recall.py docstring) — so absolute recall
there is information-theoretically capped by the candidate fraction
scanned. What this sweep demonstrates is that recall is a TUNABLE
function of the candidate budget with the plan shape unchanged: more
tables / fewer planes / more probes => more candidates => more recall,
all still bucketed equi-joins. Run at sf0.1 and sf1 (structured
embeddings, where defaults already reach 0.9+).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ann_tradeoff.py
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
    from terrakit_spark.operators import similarity as S
    from terrakit_spark.registry import QUERIES
    from terrakit_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="ann_tradeoff", shuffle_partitions=int(CPUS))

    exact = QUERIES["ann_topk_quantized"](spark, SF_DIR).select("qid", "rank", "vec_id").cache()
    exact.count()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    n_queries = exact.select("qid").distinct().count()
    out: dict = {"sf_dir": SF_DIR, "n_vecs": n_vecs, "n_queries": n_queries, "lsh": [], "ivf": []}

    def recall10_and_fraction(approx_df):
        approx = approx_df.select("qid", "vec_id").cache()
        approx.count()
        hits = exact.filter(F.col("rank") <= 10).join(approx, ["qid", "vec_id"], "inner").count()
        return hits / (n_queries * 10)

    def lsh_fraction():
        from terrakit_spark.operators.similarity import QUERY_PRED, lsh_buckets

        bks = lsh_buckets(spark, SF_DIR).cache()
        q = bks.filter(QUERY_PRED).withColumnRenamed("vec_id", "qid")
        pairs = (
            q.join(bks, ["t", "bucket"])
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            .distinct()
            .count()
        )
        bks.unpersist()
        return pairs / (n_queries * (n_vecs - 1))

    base_tables, base_planes, base_probe = S.L_TABLES, S.N_PLANES, S.IVF_KM_NPROBE
    try:
        for tables, planes in ((3, 8), (6, 8), (12, 8), (6, 6), (12, 6), (24, 6)):
            S.L_TABLES, S.N_PLANES = tables, planes
            t0 = time.time()
            r10 = recall10_and_fraction(QUERIES["ann_lsh_bucketed"](spark, SF_DIR))
            frac = lsh_fraction()
            out["lsh"].append(
                {
                    "tables": tables, "planes": planes,
                    "recall@10": round(r10, 4), "candidate_fraction": round(frac, 5),
                    "lift": round(r10 / frac, 1) if frac else None,
                    "sec": round(time.time() - t0, 1),
                }
            )
            print(json.dumps(out["lsh"][-1]), file=sys.stderr)
        S.L_TABLES, S.N_PLANES = base_tables, base_planes
        for nprobe in (1, 2, 4, 8):
            S.IVF_KM_NPROBE = nprobe
            t0 = time.time()
            r10 = recall10_and_fraction(QUERIES["ann_ivf_kmeans"](spark, SF_DIR))
            out["ivf"].append(
                {
                    "nprobe": nprobe, "recall@10": round(r10, 4),
                    "scan_fraction_approx": round(nprobe / S.KMEANS_K, 3),
                    "sec": round(time.time() - t0, 1),
                }
            )
            print(json.dumps(out["ivf"][-1]), file=sys.stderr)
    finally:
        S.L_TABLES, S.N_PLANES, S.IVF_KM_NPROBE = base_tables, base_planes, base_probe

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
