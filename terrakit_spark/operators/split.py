"""Deterministic train/validation/test split — the reference uses sklearn
train_test_split(test_size=0.2, random_state=42) twice -> 64/16/20 with
split values 'train'/'validation'/'test'
(/root/reference/terrakit/store/taco.py:85-107). A distributed engine must
be order-independent, so the rebuild uses a multiplicative-hash bucket:
bucket = pmod((key % SPLIT_MOD) * 2654435761, 100) -> <64 train,
<80 validation, else test. Same fractions and split values, reproducible
under any partitioning (documented delta from the reference: hash-based
assignment, not permutation-based).

Overflow discipline: Spark is non-ANSI and silently wraps int64 on
key * KNUTH once key exceeds ~3.47e9 (DuckDB raises instead); a wrapped
negative dividend makes `% 100` negative and would route every overflowed
row to 'train'. The key is therefore reduced below 2^63 / KNUTH BEFORE the
multiply, and the outer mod is a sign-safe pmod — buckets stay in [0, 100)
at any corpus scale.

Mixing discipline: (key * KNUTH) % 100 is LINEAR in key % 100 (the product
mod 100 only sees the key's last two digits), so chip keys of the form
scene_id*1000 + win_index would split purely by win_index — every chip at
the same grid position across all scenes lands in the same split. A mod by
a large prime (MIX_MOD) between the multiply and the % 100 breaks the
linearity (classic multiply-mod-prime hashing); the adversarial-key test
pins the fractions. Every split call site (this SQL pair, the store-stage
SQL, and the api/cli DataFrame paths) goes through these helpers."""

from __future__ import annotations

from terrakit_spark.registry import register_sql

KNUTH = 2654435761  # 2^32 * golden ratio conjugate
SPLIT_MOD = 3037000499  # prime; (SPLIT_MOD - 1) * KNUTH = 8.06e18 < 2^63 - 1
MIX_MOD = 1000000007  # prime mixing mod: breaks % 100's linearity in key


def split_bucket_sql(key: str) -> str:
    """Overflow-safe, mixed bucket in [0, 100), identical text in both
    dialects. The first reduction is a sign-safe pmod (not a bare `%`) so
    negative keys take the SAME bucket as the Column twin below — `%` is
    truncated (sign-carrying) in both Spark and DuckDB, and a negative
    intermediate would route through a different residue chain than
    F.pmod. ((k % M) + M) stays below 2*SPLIT_MOD ~ 6.1e18 < 2^63."""
    k = f"(((({key}) % {SPLIT_MOD}) + {SPLIT_MOD}) % {SPLIT_MOD})"
    return f"((((({k} * {KNUTH}) % {MIX_MOD}) % 100) + 100) % 100)"


def split_case_sql(key: str) -> str:
    b = split_bucket_sql(key)
    return f"CASE WHEN {b} < 64 THEN 'train' WHEN {b} < 80 THEN 'validation' ELSE 'test' END"


def split_col(key):
    """DataFrame-path twin of split_case_sql (pyspark Column in, Column out)."""
    from pyspark.sql import functions as F

    b = F.pmod(F.pmod(key, F.lit(SPLIT_MOD)) * F.lit(KNUTH) % F.lit(MIX_MOD), F.lit(100))
    return F.when(b < 64, "train").when(b < 80, "validation").otherwise("test")


def _split_assign(dialect: str) -> str:
    return f"""
SELECT doc_id,
       {split_case_sql("doc_id")} AS data_split
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
