"""Deterministic train/val/test split — the reference uses sklearn
train_test_split(test_size=0.2, random_state=42) twice -> 64/16/20
(/root/reference/terrakit/store/taco.py:85-90). A distributed engine must be
order-independent, so the rebuild uses a multiplicative-hash bucket:
bucket = (doc_id * 2654435761) % 100 -> <64 train, <80 val, else test.
Same fractions, reproducible under any partitioning (documented delta from
the reference: hash-based assignment, not permutation-based)."""

from __future__ import annotations

from terrakit_spark.registry import register_sql

KNUTH = 2654435761  # 2^32 * golden ratio conjugate


def _split_assign(dialect: str) -> str:
    return f"""
SELECT doc_id,
       CASE WHEN (doc_id * {KNUTH}) % 100 < 64 THEN 'train'
            WHEN (doc_id * {KNUTH}) % 100 < 80 THEN 'val'
            ELSE 'test' END AS data_split
FROM documents
"""


def _split_counts(dialect: str) -> str:
    return f"""
SELECT data_split, CAST(count(*) AS BIGINT) AS n_docs
FROM ({_split_assign(dialect)}) s
GROUP BY data_split
"""


register_sql("split_assign", _split_assign, tables=[])
register_sql("split_counts", _split_counts, tables=[])
