"""Time-axis operators on the events stream table (the reference's cube
time-axis semantics re-expressed relationally):

- max_composite (A6): max-over-time composite
  (/root/reference/terrakit/download/data_connectors/nasa_earthdata.py:196-198).
- first_valid_mosaic (A7): first non-null per key in time-ascending order —
  stackstac.mosaic semantics
  (/root/reference/terrakit/download/data_connectors/sentinel_aws.py:269).
- dup_ts_merge (A8): duplicate-timestamp merge, backfilling nulls from later
  duplicates (combine_first,
  /root/reference/terrakit/general_utils/geospatial_util.py:534-565).
- temporal_range_filter (F6): tz-normalized closed-open range filter
  (/root/reference/terrakit/general_utils/geospatial_util.py:489-531).

'error' events play the role of nodata/nulls. The portable first-non-null
idiom is min(order_key) FILTER(valid) + join-back — identical SQL text in
both engines."""

from __future__ import annotations

from terrakit_spark.registry import register_sql


def _max_composite(dialect: str) -> str:
    return """
SELECT user_id,
       round(max(value), 6) AS max_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def _first_valid(dialect: str) -> str:
    return """
SELECT u.user_id, f.first_valid_value
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN (
  SELECT e.user_id, round(min(e2.value), 6) AS first_valid_value
  FROM (SELECT user_id, min(event_id) AS first_id
        FROM events WHERE event_type <> 'error' GROUP BY user_id) e
  JOIN events e2 ON e2.event_id = e.first_id
  GROUP BY e.user_id
) f ON f.user_id = u.user_id
"""


def _dup_ts_merge(dialect: str) -> str:
    """Group events into per-user minute buckets; within a bucket take the
    first non-error value (combine_first) and the row count."""
    if dialect == "spark":
        minute = "date_format(ts, 'yyyy-MM-dd HH:mm')"
    else:
        minute = "strftime(ts, '%Y-%m-%d %H:%M')"
    return f"""
SELECT g.user_id, g.minute, g.n_rows, round(v.value, 6) AS merged_value
FROM (
  SELECT user_id, {minute} AS minute, CAST(count(*) AS BIGINT) AS n_rows,
         min(CASE WHEN event_type <> 'error' THEN event_id END) AS first_valid_id
  FROM events GROUP BY user_id, {minute}
) g
LEFT JOIN events v ON v.event_id = g.first_valid_id
"""


def _temporal_range_filter(dialect: str) -> str:
    return """
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 06:00:00' AND ts < TIMESTAMP '2024-01-02 00:00:00'
"""


def _distinct_dates(dialect: str) -> str:
    """A2 — sorted distinct scene dates
    (/root/reference/terrakit/download/data_connectors/sentinel_aws.py:142-158)."""
    return """
SELECT DISTINCT scene_date_str FROM scenes
"""


register_sql("max_composite", _max_composite, tables=[])
register_sql("first_valid_mosaic", _first_valid, tables=[])
register_sql("dup_ts_merge", _dup_ts_merge, tables=[])
register_sql("temporal_range_filter", _temporal_range_filter, tables=[])
register_sql("distinct_dates", _distinct_dates, tables=["scenes"])
