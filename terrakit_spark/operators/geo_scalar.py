"""Scalar geo function library (SURVEY §2.8) as column expressions:

- lon_wrap: 0-360 <-> +/-180 normalization via lon - 360*floor((lon+180)/360)
  (/root/reference/terrakit/general_utils/geospatial_util.py:607-626 uses
  ((lon+180) % 360) - 180; the floor form is sign-safe in both dialects).
- pad_bbox: fractional padding
  (/root/reference/terrakit/download/geodata_utils.py:348-362).
- calculate_resolution: ellipsoidal metres-per-degree
  (/root/reference/terrakit/download/geodata_utils.py:271-294) — the
  truncated-series form used by the reference.
- date token extraction (F10): compact YYYYMMDD tokens from filenames,
  bounds-checked to [1950, now]
  (/root/reference/terrakit/general_utils/geospatial_util.py:754-822).
"""

from __future__ import annotations

from terrakit_spark.dialect import D
from terrakit_spark.registry import register_sql


def _geo_scalars(dialect: str) -> str:
    pad = "1.0e-1"
    # lon candidates deliberately include out-of-range values
    lon_raw = "(((scene_id * 37) % 720) - 360 + 2.5e-1)"
    wrap = f"({lon_raw} - 360 * floor(({lon_raw} + 180) / 360))"
    # metres per degree at latitude (truncated series, EPSG:4326)
    lat = "((ymin + ymax) / 2)"
    lat_rad = f"({lat} * pi() / 180)"
    m_per_deg_lat = f"(111132.92 - 559.82 * cos(2 * {lat_rad}) + 1.175 * cos(4 * {lat_rad}))"
    m_per_deg_lon = f"(111412.84 * cos({lat_rad}) - 93.5 * cos(3 * {lat_rad}))"
    return f"""
SELECT scene_id,
       round({wrap}, 6) AS lon_wrapped,
       round(xmin - (xmax - xmin) * {pad}, 6) AS padded_xmin,
       round(xmax + (xmax - xmin) * {pad}, 6) AS padded_xmax,
       round(ymin - (ymax - ymin) * {pad}, 6) AS padded_ymin,
       round(ymax + (ymax - ymin) * {pad}, 6) AS padded_ymax,
       round({m_per_deg_lat}, 4) AS m_per_deg_lat,
       round({m_per_deg_lon}, 4) AS m_per_deg_lon
FROM scenes
"""


def _date_token_extract(dialect: str) -> str:
    d = D(dialect)
    pat = "'(\\\\d{8})'" if dialect == "spark" else "'(\\d{8})'"
    tok = f"regexp_extract(filename, {pat}, 1)"
    parsed = d.parse_date_token(tok)
    return f"""
SELECT label_id, filename,
       {tok} AS token,
       CASE WHEN {tok} <> ''
             AND {parsed} >= DATE '1950-01-01' AND {parsed} <= DATE '2026-12-31'
            THEN {d.date_str(parsed)} END AS token_date
FROM labels
"""


def _domain_assign(dialect: str) -> str:
    """J3 — containment + smallest-area argmin (the CORDEX-domain pick,
    /root/reference/terrakit/download/data_connectors/climate_data_store.py:134-234):
    for each scene center, find domains containing it and keep the
    smallest-area one."""
    domains = """
SELECT * FROM (VALUES
  ('GLOBAL', -180.0, -90.0, 180.0, 90.0),
  ('WEST',   -180.0, -90.0,    0.0, 90.0),
  ('EAST',      0.0, -90.0,  180.0, 90.0),
  ('TROPICS', -180.0, -25.0, 180.0, 25.0),
  ('HOTSPOT',    8.0,  10.0,   16.0, 16.0),
  ('NORTHBOX', -60.0,  30.0,   60.0, 80.0)
) AS t(domain, dxmin, dymin, dxmax, dymax)
"""
    return f"""
SELECT scene_id, domain, domain_area FROM (
  SELECT s.scene_id, d.domain,
         (d.dxmax - d.dxmin) * (d.dymax - d.dymin) AS domain_area,
         row_number() OVER (
           PARTITION BY s.scene_id
           ORDER BY (d.dxmax - d.dxmin) * (d.dymax - d.dymin) ASC, d.domain ASC
         ) AS rn
  FROM (SELECT scene_id, (xmin + xmax) / 2 AS cx0, (ymin + ymax) / 2 AS cy0 FROM scenes) s
  JOIN ({domains}) d
    ON s.cx0 >= d.dxmin AND s.cx0 <= d.dxmax AND s.cy0 >= d.dymin AND s.cy0 <= d.dymax
) t WHERE rn = 1
"""


def _descriptive_stats(dialect: str) -> str:
    """A4 — mean/median/min/max/std/count
    (/root/reference/terrakit/general_utils/statistics.py:8-45), masked
    variant = pre-filter (non-error events)."""
    median = "percentile(value, 0.5)" if dialect == "spark" else "quantile_cont(value, 0.5)"
    # population std from exact sums, identical expression both engines
    return f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 6) AS mean_v,
       round({median}, 6) AS median_v,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       round(sqrt(sum(value * value) / count(*) - avg(value) * avg(value)), 6) AS std_v
FROM events
WHERE event_type <> 'error'
GROUP BY event_type
"""


register_sql("geo_scalars", _geo_scalars, tables=["scenes"])
register_sql("date_token_extract", _date_token_extract, tables=["labels"])
register_sql("domain_assign", _domain_assign, tables=["scenes"])
register_sql("descriptive_stats", _descriptive_stats, tables=[])
