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


def _repetition_signals(dialect: str) -> str:
    """Gopher-style repetition quality signals: duplicate-2gram fraction
    (1 - distinct/total) and top-2gram fraction (most frequent 2-gram's
    share). Repetitive machine-generated text scores high on both; the
    curation filter drops docs above thresholds. Pure codegen SQL."""
    d = D(dialect)
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    if dialect == "spark":
        grams = f"transform(sequence(0, {n} - 2), i -> concat(toks_a[i], ' ', toks_a[i + 1]))"
        explode = "LATERAL VIEW explode(grams) _g AS gram"
        gram_rows = f"SELECT doc_id, n_2g, gram FROM base {explode}"
    else:
        grams = f"list_transform(generate_series(1, {n} - 1), i -> concat(toks_a[i], ' ', toks_a[i + 1]))"
        gram_rows = "SELECT doc_id, n_2g, unnest(grams) AS gram FROM base"
    return f"""
WITH base AS (
  SELECT doc_id, {grams} AS grams, {n} - 1 AS n_2g
  FROM (SELECT doc_id, {d.split_ws('text')} AS toks_a, text FROM documents) _t
  WHERE {n} >= 2
),
counts AS (
  SELECT doc_id, n_2g, gram, count(*) AS c FROM ({gram_rows}) _r GROUP BY doc_id, n_2g, gram
)
SELECT doc_id,
       CAST(n_2g AS INT) AS n_2grams,
       round(1 - count(*) / CAST(n_2g AS DOUBLE), 6) AS dup_2gram_fraction,
       round(max(c) / CAST(n_2g AS DOUBLE), 6) AS top_2gram_fraction
FROM counts GROUP BY doc_id, n_2g
"""


register_sql("repetition_signals", _repetition_signals, tables=[])


def _corpus_curation(dialect: str) -> str:
    """The composed curation pipeline a training corpus actually runs, as
    ONE declarative query: exact-dedup keeper join x language-ID x token
    bounds x repetition filter, rolled up per predicted language. Each
    stage is the already-oracle-checked operator reused as a subquery —
    Catalyst fuses the whole thing into a few shuffles (the per-doc signals
    are all computed in one scan)."""
    d = D(dialect)
    if dialect == "spark":
        norm = "lower(regexp_replace(text, '\\\\s+', ' '))"
    else:
        norm = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    return f"""
WITH sig AS (
  SELECT doc_id, lang_pred FROM ({_lang_id(dialect)}) _l
),
rep AS (
  SELECT doc_id, dup_2gram_fraction FROM ({_repetition_signals(dialect)}) _r
),
keeper AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM (SELECT doc_id, md5({norm}) AS fp FROM documents) _f
  ) _k WHERE rn = 1
),
tok AS (SELECT doc_id, {n} AS n_tokens FROM documents)
SELECT s.lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs_in,
       CAST(sum(CASE WHEN keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(sum(CASE WHEN keep = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
FROM (
  SELECT s.doc_id, s.lang_pred, t.n_tokens,
         CASE WHEN k.doc_id IS NOT NULL
               AND t.n_tokens BETWEEN 10 AND 1000
               AND coalesce(r.dup_2gram_fraction, 1.0) <= 0.6
              THEN 1 ELSE 0 END AS keep
  FROM sig s
  JOIN tok t ON t.doc_id = s.doc_id
  LEFT JOIN rep r ON r.doc_id = s.doc_id
  LEFT JOIN keeper k ON k.doc_id = s.doc_id
) s
GROUP BY s.lang_pred
"""


register_sql("corpus_curation", _corpus_curation, tables=[])


TOKEN_BUDGET = 5000


def _token_budget_sample(dialect: str) -> str:
    """Token-budget sampling: fill a fixed token budget with the
    highest-priority documents (priority = stopword ratio as the quality
    proxy, doc_id tiebreak) — the 'take the best N tokens' cut every
    corpus build ends with. A doc is kept while the running token total of
    strictly-higher-priority docs stays under budget (so the first
    over-budget doc is the last kept).

    Scale note: the global ORDER BY window is fine here and at moderate
    corpus sizes; at 10^12 docs the same semantics run as two passes —
    priority-histogram to locate the cutoff bucket, then the exact window
    only within that bucket."""
    d = D(dialect)
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    stop = d.list_filter_in(toks, STOP_EN)
    return f"""
WITH scored AS (
  SELECT doc_id, CAST({n} AS BIGINT) AS n_tokens,
         round({stop} / {n}, 6) AS priority
  FROM documents WHERE {n} >= 1
),
runsum AS (
  SELECT doc_id, n_tokens, priority,
         sum(n_tokens) OVER (ORDER BY priority DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM scored
)
SELECT doc_id, n_tokens, priority, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM runsum
WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
"""


register_sql("token_budget_sample", _token_budget_sample, tables=[])


SPAN_MOD = 1000000007
SPAN_MIN_RUN = 5  # >= 5 consecutive shared 3-grams = >= 7 shared tokens


def _duplicate_ngram_spans(dialect: str) -> str:
    """Exact duplicated-substring signal (the training-data dedup pass that
    MinHash misses: long verbatim spans inside otherwise-different docs):
    for every doc pair sharing >= SPAN_MIN_RUN consecutive 3-gram shingles,
    report the number of matched shingles, match runs, and the longest
    shared token span (run + 2 tokens).

    Plan shape: positional shingles (token rolling hashes combined, same
    arithmetic as the dedup operators) equi-join on the shingle hash —
    never on text; runs are recovered per (pair, diagonal ja-jb) with the
    gaps-and-islands trick (ja - row_number), a standard window over the
    match table. At corpus scale the shingle join is the same shuffle the
    MinHash pass already pays; the diagonal window keys on (d1, d2, diag)
    so no global sort exists. Subset: the %10 sample plus every planted
    duplicate pair (id % 1e9 recovers the original id for the +1e9/+2e9
    copies)."""
    d = D(dialect)
    toks = d.split_ws("text")
    A, B = 1000003, 10007
    sub = (
        f"SELECT doc_id, text FROM docs_aug WHERE doc_id % 10 = 0 "
        f"OR (doc_id % 1000000000) % 89 = 0 OR (doc_id % 1000000000) % 97 = 0"
    )
    if dialect == "spark":
        th = f"transform({toks}, t -> {d.rolling_hash('t', SPAN_MOD)})"
        shp = f"""
  SELECT doc_id, j, (th_a[j] * {A} + th_a[j + 1] * {B} + th_a[j + 2]) % {SPAN_MOD} AS h
  FROM (SELECT doc_id, {th} AS th_a FROM ({sub}) _s WHERE {d.arr_len(toks)} >= 3) _t
  LATERAL VIEW explode(sequence(0, size(th_a) - 3)) _j AS j"""
    else:
        th = f"list_transform({toks}, t -> {d.rolling_hash('t', SPAN_MOD)})"
        shp = f"""
  SELECT doc_id, j, (th_a[j + 1] * {A} + th_a[j + 2] * {B} + th_a[j + 3]) % {SPAN_MOD} AS h
  FROM (SELECT doc_id, th_a, unnest(generate_series(0, len(th_a) - 3)) AS j
        FROM (SELECT doc_id, {th} AS th_a FROM ({sub}) _s WHERE {d.arr_len(toks)} >= 3) _t) _j"""
    return f"""
WITH shp AS ({shp}),
mt AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.j AS ja, b.j AS jb
  FROM shp a JOIN shp b ON b.h = a.h AND a.doc_id < b.doc_id
),
runs AS (
  SELECT d1, d2, ja - jb AS diag,
         ja - row_number() OVER (PARTITION BY d1, d2, ja - jb ORDER BY ja) AS grp
  FROM mt
),
rl AS (SELECT d1, d2, diag, grp, count(*) AS run_len FROM runs GROUP BY d1, d2, diag, grp)
SELECT d1, d2,
       CAST(count(*) AS INT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS n_matched_shingles,
       CAST(max(run_len) + 2 AS INT) AS max_shared_tokens
FROM rl GROUP BY d1, d2
HAVING max(run_len) >= {SPAN_MIN_RUN}
"""


register_sql("duplicate_ngram_spans", _duplicate_ngram_spans, tables=["docs_aug"])
