"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID (stopword-overlap heuristic),
and document fingerprinting. All pure Spark SQL (whole-stage codegen, zero
Python) with identical DuckDB oracles."""

from __future__ import annotations

from terrakit_spark.dialect import D
from terrakit_spark.registry import register_sql

STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
STOP_ES = ["el", "la", "de", "y", "en", "es", "un", "una", "los", "con"]
STOP_DE = ["der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von"]


def _token_stats(dialect: str) -> str:
    d = D(dialect)
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    return f"""
SELECT doc_id,
       CAST({n} AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars,
       CAST({d.arr_distinct_len(toks)} AS INT) AS n_distinct,
       round({d.arr_distinct_len(toks)} / {n}, 6) AS type_token_ratio,
       round((length(text) - ({n} - 1)) / {n}, 6) AS avg_token_len
FROM documents
"""


def _quality_score(dialect: str) -> str:
    d = D(dialect)
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    stop = d.list_filter_in(toks, STOP_EN)
    digits = d.regexp_count("text", "[0-9]")
    return f"""
SELECT doc_id,
       round({stop} / {n}, 6) AS stopword_ratio,
       CAST({digits} AS INT) AS n_digits,
       round({d.arr_distinct_len(toks)} / {n}, 6) AS ttr,
       round(5.0e-1 * ({stop} / {n}) + 5.0e-1 * ({d.arr_distinct_len(toks)} / {n}), 6) AS quality
FROM documents
"""


def _lang_id(dialect: str) -> str:
    d = D(dialect)
    toks = d.split_ws("text")
    en = d.list_filter_in(toks, STOP_EN)
    es = d.list_filter_in(toks, STOP_ES)
    de = d.list_filter_in(toks, STOP_DE)
    return f"""
SELECT doc_id, lang,
       CAST({en} AS INT) AS score_en,
       CAST({es} AS INT) AS score_es,
       CAST({de} AS INT) AS score_de,
       CASE WHEN {en} >= {es} AND {en} >= {de} THEN 'en'
            WHEN {es} >= {de} THEN 'es'
            ELSE 'de' END AS lang_pred
FROM documents
"""


def _fingerprint(dialect: str) -> str:
    if dialect == "spark":
        norm = "lower(regexp_replace(text, '\\\\s+', ' '))"
    else:
        norm = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
SELECT doc_id, md5({norm}) AS fingerprint FROM docs_aug
"""


register_sql("token_stats", _token_stats, tables=[])
register_sql("quality_score", _quality_score, tables=[])
register_sql("lang_id", _lang_id, tables=[])
register_sql("doc_fingerprint", _fingerprint, tables=["docs_aug"])
