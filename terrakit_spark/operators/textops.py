"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID (stopword-overlap heuristic),
and document fingerprinting. All pure Spark SQL (whole-stage codegen, zero
Python) with identical DuckDB oracles."""

from __future__ import annotations

from terrakit_spark.dialect import SPARK, D
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


def _token_budget_scored(dialect: str) -> str:
    d = D(dialect)
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    stop = d.list_filter_in(toks, STOP_EN)
    return f"""
  SELECT doc_id, CAST({n} AS BIGINT) AS n_tokens,
         round({stop} / {n}, 6) AS priority
  FROM documents WHERE {n} >= 1
"""


def _token_budget_onepass(dialect: str) -> str:
    """Single global ORDER BY window — the semantics in their simplest form;
    kept as the DuckDB oracle and as the Spark parity reference."""
    return f"""
WITH scored AS ({_token_budget_scored(dialect)}),
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


def _token_budget_twopass(dialect: str) -> str:
    """Two-pass plan for the same semantics with NO global sort over the
    doc table: (1) bucket docs by a monotone function of priority
    (floor(priority * 1e6); priority is already rounded to 6 dp, so equal
    priorities share a bucket and buckets respect the global order), sum
    tokens per bucket, and prefix-sum the TINY histogram (<= 1e6+1 rows —
    the only single-partition window) to get each bucket's token offset;
    (2) prune every bucket whose offset already exceeds the budget (its
    first doc is over budget by construction), then run the exact window
    PARTITIONED BY bucket and add the offset. Exact, not approximate: the
    per-bucket running sum + strictly-higher-bucket offset reproduces the
    global running sum row for row."""
    return f"""
WITH scored AS ({_token_budget_scored(dialect)}),
b AS (
  SELECT doc_id, n_tokens, priority,
         CAST(floor(priority * 1000000) AS BIGINT) AS bkt
  FROM scored
),
hist AS (SELECT bkt, sum(n_tokens) AS bkt_tokens FROM b GROUP BY bkt),
off AS (
  SELECT bkt,
         coalesce(sum(bkt_tokens) OVER (ORDER BY bkt DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bkt_offset
  FROM hist
),
keepb AS (SELECT bkt, bkt_offset FROM off WHERE bkt_offset < {TOKEN_BUDGET}),
w AS (
  SELECT b.doc_id, b.n_tokens, b.priority,
         k.bkt_offset + sum(b.n_tokens) OVER (PARTITION BY b.bkt
                        ORDER BY b.priority DESC, b.doc_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM b JOIN keepb k ON k.bkt = b.bkt
)
SELECT doc_id, n_tokens, priority, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM w WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
"""


def _token_budget_sample(dialect: str) -> str:
    """Token-budget sampling: fill a fixed token budget with the
    highest-priority documents (priority = stopword ratio as the quality
    proxy, doc_id tiebreak) — the 'take the best N tokens' cut every
    corpus build ends with. A doc is kept while the running token total of
    strictly-higher-priority docs stays under budget (so the first
    over-budget doc is the last kept).

    The Spark side runs the two-pass histogram plan (no global sort over
    the doc table — the round-3 watch item); the DuckDB oracle keeps the
    one-pass global window, so the driver's exact-match gate doubles as
    the cross-plan parity proof."""
    if dialect == SPARK:
        return _token_budget_twopass(dialect)
    return _token_budget_onepass(dialect)


register_sql("token_budget_sample", _token_budget_sample, tables=[])


SPAN_MOD = 1000000007
SPAN_MIN_RUN = 5  # >= 5 consecutive shared 3-grams = >= 7 shared tokens
SPAN_DF_CAP = 32  # shingles in more than this many docs are dropped pre-join


def _duplicate_ngram_spans(dialect: str, source_sql: str | None = None, df_cap: int = SPAN_DF_CAP) -> str:
    """Exact duplicated-substring signal (the training-data dedup pass that
    MinHash misses: long verbatim spans inside otherwise-different docs):
    for every doc pair sharing >= SPAN_MIN_RUN consecutive 3-gram shingles,
    report the number of matched shingles, match runs, and the longest
    shared token span (run + 2 tokens).

    Hot-shingle cap (the scale contract): a shingle hash appearing in more
    than df_cap distinct docs is dropped BEFORE the pair join — a posting
    list of length k yields k^2 join rows, and natural corpora carry
    stop-phrase 3-grams with enormous k, so without the cap one hash value
    serializes a skewed shuffle partition and the output itself goes
    quadratic. Dropping ubiquitous shingles is standard in the
    substring-dedup literature (they carry no dedup signal). Recall
    contract: a matched run that CONTAINS a dropped hot shingle splits into
    shorter runs (or falls under SPAN_MIN_RUN), and spans composed entirely
    of corpus-ubiquitous phrases are not reported — both engines apply the
    identical cap, so the oracle sees the same outputs.

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
    sub = source_sql or (
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
hot AS (
  SELECT h FROM shp GROUP BY h HAVING count(DISTINCT doc_id) > {df_cap}
),
shpc AS (
  SELECT s.doc_id, s.j, s.h FROM shp s LEFT JOIN hot ON hot.h = s.h WHERE hot.h IS NULL
),
mt AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.j AS ja, b.j AS jb
  FROM shpc a JOIN shpc b ON b.h = a.h AND a.doc_id < b.doc_id
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


HLL_M = 64  # registers (p = 6); standard error 1.04/sqrt(64) ~ 13%


def _hll_distinct_tokens(dialect: str) -> str:
    """Portable HyperLogLog distinct-token estimate — the approx-distinct
    sketch Spark's approx_count_distinct provides, rebuilt on the PORTABLE
    rolling hash so the DuckDB oracle computes the bit-identical sketch
    (engine-native HLLs use incompatible hash functions and could only get
    a rows-only check; this one is exact-oracle-able).

    Construction (classic Flajolet HLL, m = 64):
    - 60-bit token hash from two independent rolling hashes (31x / 131x,
      mod 2^30-ish primes), packed like the SimHash60 operator;
    - register j = h % 64, w = h >> 6 (54 bits), rho = 55 - bitlen(w)
      (bitlen via length(bin(w)) — identical in both engines), w = 0 -> 55;
    - M_j = max(rho); Z = sum over ALL 64 registers of 2^-M_j (absent
      register -> 2^0, materialized by a generate_series cross join);
      2^-M computed as 1/shiftleft(1, M) so every term is an EXACT power
      of two, not a libm pow;
    - raw estimate alpha_64 * m^2 / Z with the standard small-range
      correction m * ln(m / V) when E <= 2.5m and V empty registers exist.
    Exact distinct (count DISTINCT) is emitted alongside so the ~13%
    error contract is visible and test-asserted.

    Scale shape: ONE map-side-combinable max aggregate per (group,
    register) — 64 longs of state per group however many tokens stream
    through; this is the whole point of the sketch at 10^12 docs."""
    d = D(dialect)
    toks = d.split_ws("text")
    n = d.arr_len(toks)
    h1 = _roll_txt(d, "item", 31)
    h2 = _roll_txt(d, "item", 131)
    # two domains: 'token' (tiny cardinality -> small-range ln correction
    # branch) and '2gram' (hundreds -> raw-estimate branch), so BOTH
    # estimator branches are exercised and oracle-pinned
    if dialect == "spark":
        grams = f"transform(sequence(0, {n} - 2), i -> concat(toks_a[i], ' ', toks_a[i + 1]))"
        tok_rows = f"SELECT 'token' AS dom, doc_id % 4 AS grp, tok AS item FROM documents LATERAL VIEW explode({toks}) _t AS tok"
        gram_rows = (
            f"SELECT '2gram' AS dom, doc_id % 4 AS grp, gram AS item "
            f"FROM (SELECT doc_id, {grams} AS gs FROM (SELECT doc_id, {d.split_ws('text')} AS toks_a, text FROM documents) _b WHERE {n} >= 2) _g "
            f"LATERAL VIEW explode(gs) _e AS gram"
        )
        regs_all = f"SELECT dom, grp, explode(sequence(0, {HLL_M - 1})) AS j FROM (SELECT DISTINCT dom, grp FROM items) _g"
    else:
        grams = f"list_transform(generate_series(1, {n} - 1), i -> concat(toks_a[i], ' ', toks_a[i + 1]))"
        tok_rows = f"SELECT 'token' AS dom, doc_id % 4 AS grp, unnest({toks}) AS item FROM documents"
        gram_rows = (
            f"SELECT '2gram' AS dom, doc_id % 4 AS grp, unnest(gs) AS item "
            f"FROM (SELECT doc_id, {grams} AS gs FROM (SELECT doc_id, {d.split_ws('text')} AS toks_a, text FROM documents) _b WHERE {n} >= 2) _g"
        )
        regs_all = f"SELECT dom, grp, unnest(generate_series(0, {HLL_M - 1})) AS j FROM (SELECT DISTINCT dom, grp FROM items) _g"
    w = d.shiftright("h", "6")
    rho = f"CASE WHEN {w} = 0 THEN 55 ELSE 55 - length(bin({w})) END"
    inv_pow = f"1.0 / CAST({d.shiftleft('CAST(1 AS BIGINT)', 'M')} AS DOUBLE)"
    return f"""
WITH items AS ({tok_rows} UNION ALL {gram_rows}),
th AS (
  SELECT dom, grp, item, {d.shiftleft(f'({h1})', '30')} + ({h2}) AS h FROM items
),
regs AS (
  SELECT dom, grp, h % {HLL_M} AS j, max({rho}) AS M
  FROM th GROUP BY dom, grp, h % {HLL_M}
),
full_regs AS (
  SELECT a.dom, a.grp, a.j, coalesce(r.M, 0) AS M
  FROM ({regs_all}) a LEFT JOIN regs r ON r.dom = a.dom AND r.grp = a.grp AND r.j = a.j
),
sketch AS (
  SELECT dom, grp,
         sum({inv_pow}) AS Z,
         sum(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS V
  FROM full_regs GROUP BY dom, grp
),
est AS (
  SELECT dom, grp, V,
         7.09e-1 * {HLL_M * HLL_M} / Z AS e_raw
  FROM sketch
),
exact AS (SELECT dom, grp, count(DISTINCT item) AS n_exact FROM items GROUP BY dom, grp)
SELECT e.dom, e.grp,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       round(CASE WHEN e.e_raw <= {2.5 * HLL_M} AND e.V > 0
                  THEN {HLL_M} * ln({HLL_M} / CAST(e.V AS DOUBLE))
                  ELSE e.e_raw END, 4) AS n_est,
       CAST(e.V AS INT) AS n_zero_regs
FROM est e JOIN exact x ON x.dom = e.dom AND x.grp = e.grp
"""


def _roll_txt(d: D, s: str, mult: int) -> str:
    """Two-multiplier rolling hash (same family as the SimHash60 packer)."""
    if d.d == SPARK:
        return (
            f"aggregate(split({s}, ''), CAST(0 AS BIGINT), "
            f"(acc, c) -> (acc * {mult} + CAST(ascii(c) AS BIGINT)) % 1073741789)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {mult} + c) % 1073741789)"
    )


register_sql("hll_distinct_tokens", _hll_distinct_tokens, tables=[])


def _curation_rollup_cube(dialect: str) -> str:
    """Corpus accounting with GROUPING SETS — (lang x length-bucket),
    per-lang, per-bucket, and grand total in ONE pass (the reference has no
    grouping-set concept at all, SURVEY §2.4; Spark computes this with a
    single Expand + aggregate, no self-unions). Non-grouped dimensions are
    coalesced to 'ALL' so the two engines' NULL markers hash identically."""
    d = D(dialect)
    n = d.arr_len(d.split_ws("text"))
    return f"""
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(len_bucket, 'ALL') AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM (
  SELECT lang,
         CASE WHEN {n} < 60 THEN 'short' WHEN {n} < 100 THEN 'mid' ELSE 'long' END AS len_bucket,
         CAST({n} AS BIGINT) AS n_tokens
  FROM documents
) _d
GROUP BY GROUPING SETS ((lang, len_bucket), (lang), (len_bucket), ())
"""


register_sql("curation_rollup_cube", _curation_rollup_cube, tables=[])


# PII patterns shared verbatim by both dialects: POSIX-ish classes only, no
# \d / \w shorthand (engine regex flavors differ there). Planted corpus:
# every 7th doc carries a deterministic email / phone / IPv4 tail, so the
# operator is non-vacuous and exact-oracle-checkable.
PII_EMAIL = "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+[a-zA-Z]"
PII_PHONE = "[+]1-555-[0-9]{4}"
PII_IP = "192[.]168[.][0-9]{1,3}[.][0-9]{1,3}"


def _pii_scrub(dialect: str) -> str:
    """PII scrubbing — the curation pass every training corpus runs before
    release: count and redact emails / phone numbers / IPv4s. Pure codegen
    SQL (regexp_extract_all + regexp_replace), one scan, no Python.
    The redacted text itself is not emitted (the driver hash would drag
    megabytes through the compare); its portable rolling hash is, which
    pins byte-identical redaction in both engines."""
    d = D(dialect)
    planted = f"""
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN {d.fmt("%s contact user%d@mail.example.com now", "text", "doc_id")}
              WHEN doc_id % 7 = 3 THEN {d.fmt("%s call +1-555-%d ok", "text", "(1000 + doc_id % 9000)")}
              WHEN doc_id % 7 = 5 THEN {d.fmt("%s host 192.168.%d.%d up", "text", "(doc_id % 256)", "((doc_id * 7) % 256)")}
              ELSE text END AS text
  FROM documents"""
    redacted = d.regexp_replace_all(
        d.regexp_replace_all(d.regexp_replace_all("text", PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"),
        PII_IP,
        "<IP>",
    )
    return f"""
WITH pii_docs AS ({planted})
SELECT doc_id,
       CAST({d.regexp_count("text", PII_EMAIL)} AS INT) AS n_emails,
       CAST({d.regexp_count("text", PII_PHONE)} AS INT) AS n_phones,
       CAST({d.regexp_count("text", PII_IP)} AS INT) AS n_ips,
       CAST(length({redacted}) AS INT) AS redacted_len,
       {d.rolling_hash(redacted)} AS redacted_hash
FROM pii_docs
"""


register_sql("pii_scrub", _pii_scrub, tables=[])


CONTAM_N = 8  # 8-gram shingles, the usual benchmark-contamination window
CONTAM_MOD = 1000000007


def _contamination_check(dialect: str) -> str:
    """Benchmark-contamination check — per corpus doc, the fraction of its
    distinct 8-gram shingles that appear ANYWHERE in a held-out benchmark
    set (doc_id % 101 = 0 plays the benchmark; the corpus sample is
    doc_id % 10 = 1). The dedup-side precaution every eval depends on.

    Plan shape: both sides reduce to DISTINCT shingle hashes BEFORE the
    join — the benchmark side to a global distinct-h set, the corpus side
    to per-doc distinct — so the equi-join fan-out is at most 1 per
    (corpus doc, h): linear in corpus shingles, no hot-key quadratics (the
    blowup the spans operator needed a df-cap for cannot occur here).
    Only docs with at least one shared shingle are emitted."""
    d = D(dialect)
    toks = d.split_ws("text")
    # 8 token-hashes folded left-to-right: ((h0*31 + h1) % M)*31 + h2 ...
    def fold(idx_expr: callable) -> str:
        acc = idx_expr(0)
        for i in range(1, CONTAM_N):
            acc = f"(({acc}) * 31 + {idx_expr(i)}) % {CONTAM_MOD}"
        return acc

    if dialect == SPARK:
        th = f"transform({toks}, t -> {d.rolling_hash('t', CONTAM_MOD)})"
        shingles = lambda src, who: f"""
  SELECT doc_id, ({fold(lambda i: f"th_a[j + {i}]")}) % {CONTAM_MOD} AS h
  FROM (SELECT doc_id, {th} AS th_a FROM ({src}) _s WHERE {d.arr_len(toks)} >= {CONTAM_N}) _t
  LATERAL VIEW explode(sequence(0, size(th_a) - {CONTAM_N})) _j AS j"""
    else:
        th = f"list_transform({toks}, t -> {d.rolling_hash('t', CONTAM_MOD)})"
        shingles = lambda src, who: f"""
  SELECT doc_id, ({fold(lambda i: f"th_a[j + {i + 1}]")}) % {CONTAM_MOD} AS h
  FROM (SELECT doc_id, th_a, unnest(generate_series(0, len(th_a) - {CONTAM_N})) AS j
        FROM (SELECT doc_id, {th} AS th_a FROM ({src}) _s WHERE {d.arr_len(toks)} >= {CONTAM_N}) _t) _j"""
    bench_src = "SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0"
    # Planted contamination: every third corpus doc embeds a full benchmark
    # doc verbatim ((doc_id % 4) * 101 stays a valid benchmark id at every
    # scale factor), so the operator is non-vacuous and the fraction
    # gradient (partial vs total overlap) is exercised at any sf.
    corpus_src = f"""
    SELECT c.doc_id,
           CASE WHEN c.doc_id % 3 = 1 AND b.text IS NOT NULL
                THEN {d.fmt('%s %s', 'c.text', 'b.text')} ELSE c.text END AS text
    FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 1) c
    LEFT JOIN (SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0) b
      ON b.doc_id = (c.doc_id % 4) * 101"""
    return f"""
WITH bench_h AS (SELECT DISTINCT h FROM ({shingles(bench_src, 'bench')}) _b),
corpus_h AS (SELECT DISTINCT doc_id, h FROM ({shingles(corpus_src, 'corpus')}) _c),
totals AS (SELECT doc_id, count(*) AS n_shingles FROM corpus_h GROUP BY doc_id),
shared AS (
  SELECT c.doc_id, count(*) AS n_shared
  FROM corpus_h c JOIN bench_h b ON b.h = c.h
  GROUP BY c.doc_id
)
SELECT t.doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(s.n_shared AS BIGINT) AS n_shared,
       round(s.n_shared / CAST(t.n_shingles AS DOUBLE), 6) AS contamination_frac
FROM totals t JOIN shared s ON s.doc_id = t.doc_id
"""


register_sql("contamination_check", _contamination_check, tables=[])
