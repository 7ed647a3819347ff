"""Label-layer operators (reference: transform/labels.py).

- labels_load: S1 vector-label scan + F11 ISO/compact date extraction +
  F12 class-id extraction (regex `_CLASS_(\\d+)_`, default 1 —
  /root/reference/terrakit/transform/labels.py:322-326) + F7 presence checks.
- grouped_bbox: A1 per-date envelope union — geometry -> bounds box per row,
  per-datetime union bounds, one output row per (datetime, labelclass)
  sharing the combined envelope
  (/root/reference/terrakit/transform/labels.py:363-413). Envelope of a
  union of boxes == min/max of the box bounds, so the whole operator is a
  groupBy aggregate + a distinct-classes join — no geometry library needed
  and fully shuffle-parallel (one partial-agg shuffle on `datetime`).
"""

from __future__ import annotations

from terrakit_spark.dialect import D
from terrakit_spark.registry import register_sql


def _labels_load(dialect: str) -> str:
    d = D(dialect)
    tok = "regexp_extract(filename, 'label_(\\\\d{8})_', 1)" if dialect == "spark" else "regexp_extract(filename, 'label_(\\d{8})_', 1)"
    cls = "regexp_extract(filename, '_CLASS_(\\\\d+)_', 1)" if dialect == "spark" else "regexp_extract(filename, '_CLASS_(\\d+)_', 1)"
    return f"""
SELECT label_id,
       filename,
       {d.date_str(d.parse_date_token(tok))} AS date_extracted,
       CAST(coalesce(CAST(nullif({cls}, '') AS INT), 1) AS INT) AS class_extracted,
       CAST(datetime = {d.date_str(d.parse_date_token(tok))} AS INT) AS date_matches,
       cx - rx AS xmin, cy - ry AS ymin, cx + rx AS xmax, cy + ry AS ymax
FROM labels
"""


def _grouped_bbox(dialect: str) -> str:
    # identical text in both dialects — min/max aggregate + distinct join
    return """
SELECT dc.datetime, dc.labelclass, env.xmin, env.ymin, env.xmax, env.ymax
FROM (SELECT DISTINCT datetime, labelclass FROM labels) dc
JOIN (SELECT datetime,
             min(cx - rx) AS xmin, min(cy - ry) AS ymin,
             max(cx + rx) AS xmax, max(cy + ry) AS ymax
      FROM labels GROUP BY datetime) env
  ON dc.datetime = env.datetime
"""


def _label_tally(dialect: str) -> str:
    """A9 processed/failed tallies: rows whose filename date parses and whose
    class token is present count as processed (mirrors the {n}/{N} log
    tallies at /root/reference/terrakit/transform/labels.py:270-347)."""
    d = D(dialect)
    pat = "'label_(\\\\d{8})_CLASS_(\\\\d+)_'" if dialect == "spark" else "'label_(\\d{8})_CLASS_(\\d+)_'"
    return f"""
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN regexp_extract(filename, {pat}, 1) <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_processed,
       CAST(sum(CASE WHEN regexp_extract(filename, {pat}, 1) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
FROM labels
"""


def _metadata_lookup(dialect: str) -> str:
    """S3/J5 — filename -> date lookup against a metadata.csv table
    (broadcast hash join on filename,
    /root/reference/terrakit/transform/labels.py:232-245). Labels missing
    from the metadata (or with malformed dates) fall back to filename
    extraction; the tally mirrors the reference's failure counting."""
    d = D(dialect)
    tok = (
        "regexp_extract(l.filename, 'label_(\\\\d{8})_', 1)"
        if dialect == "spark"
        else "regexp_extract(l.filename, 'label_(\\d{8})_', 1)"
    )
    meta = """
SELECT filename, datetime AS mdate FROM labels WHERE label_id % 2 = 0
UNION ALL
SELECT 'orphan_file.json' AS filename, '2024-13-99' AS mdate
"""
    valid_mdate = "m.mdate IS NOT NULL AND m.mdate >= '1950-01-01' AND m.mdate <= '2026-12-31' AND length(m.mdate) = 10 AND substr(m.mdate, 6, 2) <= '12'"
    return f"""
SELECT l.label_id,
       CASE WHEN {valid_mdate} THEN 'metadata' ELSE 'filename' END AS date_source,
       CASE WHEN {valid_mdate} THEN m.mdate
            ELSE {d.date_str(d.parse_date_token(tok))} END AS resolved_date
FROM labels l
LEFT JOIN ({meta}) m ON m.filename = l.filename
"""


register_sql("labels_load", _labels_load, tables=["labels"])
register_sql("grouped_bbox", _grouped_bbox, tables=["labels"])
register_sql("label_tally", _label_tally, tables=["labels"])
register_sql("metadata_lookup", _metadata_lookup, tables=["labels"])
