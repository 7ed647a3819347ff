"""MinHash signature-size study (round-2 verdict item 5): the 8-hash
default vs the 128-hash/16-band production configuration, measured against
exact all-pairs shingle Jaccard ground truth.

The structural story (band theory): 4 bands x 2 rows has collision
S-curve threshold (1/4)^(1/2) = 0.5 with a loose tail — it admits
low-similarity candidate pairs that exact verification then rejects
(wasted shuffle+verify work that grows with corpus size). 16 bands x 8
rows sharpens the threshold to (1/16)^(1/8) ~ 0.71: near-perfect recall
at J >= 0.8 (the production dedup operating point) with far fewer false
candidates."""

from __future__ import annotations

import terrakit_spark.operators  # noqa: F401
from terrakit_spark.operators.dedup import minhash_candidates, true_jaccard_pairs


def test_signature_size_precision_recall(synth, spark, sf_dir):
    truth = {(r.d1, r.d2): r.jaccard for r in true_jaccard_pairs(spark, sf_dir, 0.2).collect()}
    hi = {p for p, j in truth.items() if j >= 0.8}
    assert truth and hi  # planted dups guarantee ground truth exists

    stats = {}
    for label, (nh, br) in {"8": (8, 2), "128": (128, 8)}.items():
        cand = {(r.d1, r.d2) for r in minhash_candidates(spark, sf_dir, nh, br).collect()}
        stats[label] = {
            "precision": len(cand & set(truth)) / len(cand),
            "recall_hi": len(cand & hi) / len(hi),
        }

    # at the production operating point (J >= 0.8) BOTH configurations must
    # recover every true pair...
    assert stats["8"]["recall_hi"] == 1.0
    assert stats["128"]["recall_hi"] == 1.0
    # ...and the larger signature must waste no less verify work
    assert stats["128"]["precision"] >= stats["8"]["precision"]
