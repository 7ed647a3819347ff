"""The LSH-bucketed ANN is approximate by design. The driver's testdata
embeddings are uniformly random (no cluster structure — measured same-label
vs cross-label cosine are both ~0), which is the theoretical worst case for
LSH: with 8 hyperplanes a true neighbour (cos ~0.33, theta ~70deg) collides
with probability (1 - theta/pi)^8 ~ 2% per table. The meaningful checks are
therefore LIFT — recall must beat the fraction of candidates scored, i.e.
buckets concentrate true neighbours above chance — and BOUNDEDNESS: the
per-(table, bucket) candidate cap must hold by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

import terrakit_spark.operators  # noqa: F401
from terrakit_spark.registry import QUERIES


def _lift(spark, sf_dir):
    from terrakit_spark.operators.similarity import QUERY_PRED, lsh_buckets

    exact = QUERIES["ann_topk_quantized"](spark, sf_dir).select("qid", "vec_id").cache()
    approx = QUERIES["ann_lsh_bucketed"](spark, sf_dir).select("qid", "vec_id").cache()
    n_exact = exact.count()
    hits = exact.join(approx, ["qid", "vec_id"], "inner").count()
    recall = hits / n_exact

    # candidate fraction scored: distinct union-over-tables bucket pairs
    bks = lsh_buckets(spark, sf_dir).cache()
    n_vecs = bks.select("vec_id").distinct().count()
    q = bks.filter(QUERY_PRED).withColumnRenamed("vec_id", "qid")
    pairs = (
        q.join(bks, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    n_queries = q.select("qid").distinct().count()
    candidate_fraction = pairs.count() / (n_queries * (n_vecs - 1))
    return recall, candidate_fraction


def test_lsh_lift_against_bruteforce(synth, spark, sf_dir):
    recall, fraction = _lift(spark, sf_dir)
    # isotropic random embeddings are LSH's theoretical worst case; the
    # invariant is lift > 1 with margin — multi-table union raises both
    # recall and fraction together, lift stays the concentration signal
    assert recall > 1.25 * fraction, f"recall={recall:.4f} fraction={fraction:.4f}"


def test_lsh_bucket_cap_binds(synth, spark, sf_dir):
    """With a tiny cap the candidate side is bounded per (table, bucket) —
    the scale guarantee that hot buckets cannot blow up the join."""
    from terrakit_spark.operators.similarity import ann_lsh_capped, lsh_buckets

    cap = 2
    out = ann_lsh_capped(spark, sf_dir, max_bucket=cap)
    # every query's candidate set is <= L_TABLES * cap (union of its
    # per-table capped buckets, minus itself)
    from terrakit_spark.operators.similarity import L_TABLES

    per_q = out.groupBy("qid").count().agg(F.max("count")).collect()[0][0]
    assert per_q is not None and per_q <= L_TABLES * cap

    # and some bucket actually exceeded the cap (the cap BINDS here)
    biggest = lsh_buckets(spark, sf_dir).groupBy("t", "bucket").count().agg(F.max("count")).collect()[0][0]
    assert biggest > cap
