"""Driver-facing pipeline queries.

- pipeline_summary_small: the FULL chip pipeline (as-of -> cell join -> burn
  -> chip -> stats) on the small-dims scene subset, reduced to one row per
  scene (chip count, total data sum incl. nodata, burned label mass) — with
  a closed-form DuckDB oracle. This is the end-to-end parity gate.
- chip_pipeline_full: the unrestricted pipeline rolled up per scene_date
  (rows-only check; per-pixel oracle intractable at full dims by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrakit_spark.dialect import DUCK
from terrakit_spark.operators.chips import SMALL_PRED_SQL
from terrakit_spark.registry import register_df, with_synth
from terrakit_spark.synth import NODATA_EVERY, PIXEL_BASE, PIXEL_MOD


def _summary(chips: DataFrame) -> DataFrame:
    return (
        chips.select(
            "scene_id",
            "scene_date_str",
            F.expr("aggregate(px_sum, CAST(0 AS BIGINT), (a, v) -> a + v)").alias("chip_sum"),
            "label_mass",
        )
        .groupBy("scene_id", "scene_date_str")
        .agg(
            F.count("*").alias("n_chips"),
            F.sum("chip_sum").alias("data_sum"),
            F.sum("label_mass").alias("label_mass"),
        )
    )


def pipeline_summary_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrakit_spark.pipeline import chip_pipeline  # lazy: avoids import cycle

    chips = chip_pipeline(spark, sf_dir, scene_pred=SMALL_PRED_SQL)
    return _summary(chips)


def chip_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrakit_spark.pipeline import chip_pipeline  # lazy: avoids import cycle

    # % 35, not % 25: scene dims cycle on (scene_id/5) % 5, and multiples
    # of 25 all land on index 0 (256x256 only). 35 = 5*7 walks every dims
    # index, so the full pipeline (and its oracle) exercises edge-clamped
    # OVERLAPPING windows (700x300, 512x768) and the tiny dims too.
    chips = chip_pipeline(spark, sf_dir, scene_pred="(scene_id % 35) = 0")
    return (
        _summary(chips)
        .groupBy("scene_date_str")
        .agg(
            F.sum("n_chips").alias("n_chips"),
            F.sum("data_sum").alias("data_sum"),
            F.sum("label_mass").alias("label_mass"),
        )
    )


# oracle: small scenes are matched iff their scene_date wins the as-of join
# for some label date; closed-form (was per-pixel: 100+ s at sf0.01, now <5 s).
# _pipeline_oracle is defined below next to the full-rollup variant; the
# registration at the bottom of the module runs after both definitions.



# chip_pipeline_full oracle: closed-form, no per-pixel x enumeration.
# - data_sum: per (scene, band, window-row, x-window) arithmetic series of
#   ((C0 + 17x) mod 10501) + 500 with explicit wrap and nodata-hole terms
#   (window width 256 => at most one mod-wrap and one nodata hole per row).
# - label_mass: per-row diamond x-intervals (closed form), DISTINCT, union
#   per (scene, y) via gaps-and-islands, clipped per x-window, weighted by
#   y-window coverage multiplicity (edge-clamped windows overlap).
# The DISTINCT before the island sweep is load-bearing: DuckDB 1.0's
# parallel window eval mis-split a 450-duplicate-interval partition into an
# extra island (observed at sf0.01); deduped partitions are tiny and safe.
def _pipeline_oracle(pred: str, rollup: bool) -> str:
    """Closed-form pipeline oracle, shared by the small-scene per-scene
    gate, the skip-zero variant (guard drops nothing on synthetic pixels),
    and the all-dims per-date rollup: window-exact arithmetic-series data
    sums + interval-union label mass (see chip_pipeline_full notes)."""
    ctes = r"""
WITH matched_dates AS (
  SELECT DISTINCT scene_date_str FROM (
    SELECT b.datetime,
           strftime(s.scene_date, '%Y-%m-%d') AS scene_date_str,
           row_number() OVER (PARTITION BY b.datetime
                              ORDER BY abs(datediff('day', b.dt, s.scene_date)) ASC, s.scene_date ASC) AS rn
    FROM (SELECT DISTINCT datetime, CAST(datetime AS DATE) AS dt FROM labels) b
    JOIN (SELECT DISTINCT scene_date FROM scenes) s
      ON s.scene_date >= b.dt AND s.scene_date <= (b.dt + CAST(7 AS INT))
  ) r WHERE rn = 1
),
sc AS (
  SELECT * FROM scenes WHERE ((scene_id % 35) = 0)
    AND scene_date_str IN (SELECT scene_date_str FROM matched_dates)
),
wx AS (
  SELECT scene_id, width,
         CAST(CASE WHEN xr + 256 > width THEN width - 256 ELSE xr END AS BIGINT) AS xa
  FROM (SELECT scene_id, width, unnest(generate_series(0, CAST(width AS BIGINT) - 1, 256)) AS xr FROM sc) _x
),
wxc AS (SELECT scene_id, greatest(xa, 0) AS x0, least(xa + 256, width) AS x1 FROM wx),
wy AS (
  SELECT scene_id, height,
         CAST(CASE WHEN yr + 256 > height THEN height - 256 ELSE yr END AS BIGINT) AS ya
  FROM (SELECT scene_id, height, unnest(generate_series(0, CAST(height AS BIGINT) - 1, 256)) AS yr FROM sc) _y
),
wyc AS (SELECT scene_id, greatest(ya, 0) AS y0, least(ya + 256, height) AS y1 FROM wy),
nx AS (SELECT scene_id, count(*) AS n FROM wx GROUP BY scene_id),
ny AS (SELECT scene_id, count(*) AS n FROM wy GROUP BY scene_id),
-- data_sum: per (scene, band, window-row y, x-window) closed form.
-- sum_{x=x0}^{x1-1} ((C0 + 17x) mod 10501) + 500 per pixel, one wrap max
-- (Cx <= 10500, 17*255 = 4335 -> Cx + 17(w-1) < 2*10501), plus at most one
-- nodata hole per window row (window width 256 < 997).
sby AS (
  SELECT w.scene_id, b.band, unnest(generate_series(w.y0, w.y1 - 1)) AS y
  FROM wyc w
  JOIN (SELECT scene_id, unnest(generate_series(0, CAST(bands AS BIGINT) - 1)) AS band FROM sc) b
    ON b.scene_id = w.scene_id
),
dsparts AS (
  SELECT scene_id,
         wlen * Cx + 17 * (wlen * (wlen - 1) // 2)
           - 10501 * greatest(0, wlen - (10501 - Cx + 16) // 17)
           + wlen * 500
           + CASE WHEN x_nd < x1 THEN -9999 - (((C0 + 17 * x_nd) % 10501) + 500) ELSE 0 END
           AS row_sum
  FROM (
    SELECT scene_id, x1,
           C0, (C0 + 17 * x0) % 10501 AS Cx, x1 - x0 AS wlen,
           CASE WHEN r_nd >= x0 THEN r_nd ELSE r_nd + 997 * ((x0 - r_nd + 996) // 997) END AS x_nd
    FROM (
      SELECT r.scene_id, x.x0, x.x1,
             (7 * r.scene_id + 13 * r.band + 31 * r.y) % 10501 AS C0,
             (997 - ((r.scene_id + r.band + r.y * s.width) % 997)) % 997 AS r_nd
      FROM sby r
      JOIN sc s ON s.scene_id = r.scene_id
      JOIN wxc x ON x.scene_id = r.scene_id
    ) _c
  ) _f
),
ds AS (SELECT scene_id, CAST(sum(row_sum) AS BIGINT) AS data_sum FROM dsparts GROUP BY scene_id),
-- label_mass: per-row x-interval of each diamond (closed form), union per
-- (scene, y) via gaps-and-islands, clipped to each x-window, weighted by
-- the y-window coverage multiplicity.
pairs AS (
  SELECT s.scene_id, s.width, s.height, s.xmin, s.ymax, l.cx, l.cy, l.rx, l.ry
  FROM sc s JOIN labels l
    ON l.cx + l.rx > s.xmin AND l.cx - l.rx < s.xmax
   AND l.cy + l.ry > s.ymin AND l.cy - l.ry < s.ymax
),
prows AS (
  SELECT *, unnest(generate_series(ylo, yhi)) AS y FROM (
    SELECT *,
      greatest(CAST(floor((ymax - cy - ry) / 7.8125e-3 - 5.0e-1) AS BIGINT) + 1, 0) AS ylo,
      least(CAST(ceil((ymax - cy + ry) / 7.8125e-3 - 5.0e-1) AS BIGINT) - 1, CAST(height AS BIGINT) - 1) AS yhi
    FROM pairs) _p
  WHERE ylo <= yhi
),
ivals AS (
  SELECT scene_id, y, greatest(xlo, 0) AS a, least(xhi, CAST(width AS BIGINT) - 1) AS b FROM (
    SELECT scene_id, width, y,
           CAST(floor((cx - t - xmin) / 7.8125e-3 - 5.0e-1) AS BIGINT) + 1 AS xlo,
           CAST(ceil((cx + t - xmin) / 7.8125e-3 - 5.0e-1) AS BIGINT) - 1 AS xhi
    FROM (
      SELECT scene_id, width, xmin, y, cx,
             rx * (1 - abs((ymax - (y + 5.0e-1) * 7.8125e-3) - cy) / ry) AS t
      FROM prows) _t
    WHERE t > 0) _i
  WHERE greatest(xlo, 0) <= least(xhi, CAST(width AS BIGINT) - 1)
),
ivals_d AS (SELECT DISTINCT scene_id, y, a, b FROM ivals),
ord_i AS (
  SELECT scene_id, y, a, b,
         max(b) OVER (PARTITION BY scene_id, y ORDER BY a, b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM ivals_d
),
isl AS (
  SELECT scene_id, y, a, b,
         sum(CASE WHEN prev_max IS NULL OR a > prev_max + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY scene_id, y ORDER BY a, b ROWS UNBOUNDED PRECEDING) AS gid
  FROM ord_i
),
uni AS (SELECT scene_id, y, min(a) AS a, max(b) AS b FROM isl GROUP BY scene_id, y, gid),
ymult AS (
  SELECT i.scene_id, i.y, count(*) AS mult
  FROM (SELECT DISTINCT scene_id, y FROM uni) i
  JOIN wyc w ON w.scene_id = i.scene_id AND i.y >= w.y0 AND i.y < w.y1
  GROUP BY i.scene_id, i.y
),
mass AS (
  SELECT m.scene_id, CAST(sum((least(m.b, w.x1 - 1) - greatest(m.a, w.x0) + 1) * ym.mult) AS BIGINT) AS label_mass
  FROM uni m
  JOIN wxc w ON w.scene_id = m.scene_id AND m.b >= w.x0 AND m.a <= w.x1 - 1
  JOIN ymult ym ON ym.scene_id = m.scene_id AND ym.y = m.y
  GROUP BY m.scene_id
)
"""
    if rollup:
        final = r"""SELECT s.scene_date_str,
       CAST(sum(nx.n * ny.n) AS BIGINT) AS n_chips,
       CAST(sum(ds.data_sum) AS BIGINT) AS data_sum,
       CAST(sum(coalesce(m.label_mass, 0)) AS BIGINT) AS label_mass
FROM sc s
JOIN nx ON nx.scene_id = s.scene_id
JOIN ny ON ny.scene_id = s.scene_id
JOIN ds ON ds.scene_id = s.scene_id
LEFT JOIN mass m ON m.scene_id = s.scene_id
GROUP BY s.scene_date_str
"""
    else:
        final = r"""
SELECT s.scene_id, s.scene_date_str,
       CAST(nx.n * ny.n AS BIGINT) AS n_chips,
       ds.data_sum,
       CAST(coalesce(m.label_mass, 0) AS BIGINT) AS label_mass
FROM sc s
JOIN nx ON nx.scene_id = s.scene_id
JOIN ny ON ny.scene_id = s.scene_id
JOIN ds ON ds.scene_id = s.scene_id
LEFT JOIN mass m ON m.scene_id = s.scene_id
"""
    return with_synth(DUCK, ctes.replace("((scene_id % 35) = 0)", f"({pred})") + final, tables=["labels", "scenes"])


_FULL_ORACLE = _pipeline_oracle("(scene_id % 35) = 0", rollup=True)
_ORACLE = _pipeline_oracle(SMALL_PRED_SQL, rollup=False)

register_df("pipeline_summary_small", pipeline_summary_small, oracle=_ORACLE)

register_df("chip_pipeline_full", chip_pipeline_full, oracle=_FULL_ORACLE)


def pipeline_skip_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F13 zero-scene guard path through the full pipeline: synthetic
    pixels are never all-zero (values >= 500 or nodata), so the guard drops
    nothing and the output equals pipeline_summary_small — which is exactly
    what the oracle pins (the guard's any() evaluates for every scene).
    The actually-dropping behaviour is pinned by test_zero_scene_guard."""
    from terrakit_spark.pipeline import chip_pipeline  # lazy: avoids import cycle

    chips = chip_pipeline(spark, sf_dir, scene_pred=SMALL_PRED_SQL, skip_zero_scenes=True)
    return _summary(chips)


def dataset_stats_quirk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 quirk variant as a driver-checked query: pixel_count = n_tiles *
    H*W of the LAST chip (max scene_id, max win_index) and a scalar
    mean/std collapse across bands
    (/root/reference/terrakit/chip/tiling.py:353-362)."""
    from terrakit_spark.pipeline import chip_pipeline, dataset_stats_quirk

    chips = chip_pipeline(spark, sf_dir, scene_pred=SMALL_PRED_SQL)
    out = dataset_stats_quirk(chips)
    return out.select(
        F.round("total_mean", 6).alias("total_mean"),
        F.round("total_std", 6).alias("total_std"),
    )


# quirk oracle: per-pixel value enumeration over the matched small scenes
# (exact integer sums / sums-of-squares), pixel_count from the max-scene_id
# chip dims, identical double division + sqrt expressions.
_QUIRK_ORACLE = with_synth(
    DUCK,
    f"""
WITH matched_dates AS (
  SELECT DISTINCT scene_date_str FROM (
    SELECT b.datetime,
           strftime(s.scene_date, '%Y-%m-%d') AS scene_date_str,
           row_number() OVER (PARTITION BY b.datetime
                              ORDER BY abs(datediff('day', b.dt, s.scene_date)) ASC, s.scene_date ASC) AS rn
    FROM (SELECT DISTINCT datetime, CAST(datetime AS DATE) AS dt FROM labels) b
    JOIN (SELECT DISTINCT scene_date FROM scenes) s
      ON s.scene_date >= b.dt AND s.scene_date <= (b.dt + CAST(7 AS INT))
  ) r WHERE rn = 1
),
small AS (
  SELECT * FROM scenes WHERE ({SMALL_PRED_SQL})
    AND scene_date_str IN (SELECT scene_date_str FROM matched_dates)
),
pxv AS (
  SELECT CAST(CASE WHEN (scene_id + band + y * width + x) % {NODATA_EVERY} = 0 THEN -9999
              ELSE (scene_id * 7 + band * 13 + y * 31 + x * 17) % {PIXEL_MOD} + {PIXEL_BASE} END AS BIGINT) AS v
  FROM (
    SELECT scene_id, width, band, y, unnest(generate_series(0, CAST(width - 1 AS BIGINT))) AS x
    FROM (SELECT scene_id, width, band, unnest(generate_series(0, CAST(height - 1 AS BIGINT))) AS y
          FROM (SELECT scene_id, width, height, unnest(generate_series(0, CAST(bands - 1 AS BIGINT))) AS band
                FROM small) _sb) _sy
  ) _px
),
tot AS (SELECT CAST(sum(v) AS BIGINT) AS sum_x, CAST(sum(v * v) AS BIGINT) AS sum_x2 FROM pxv),
pc AS (
  SELECT CAST((SELECT count(*) FROM small) * width * height AS BIGINT) AS pixel_count
  FROM small ORDER BY scene_id DESC LIMIT 1
)
SELECT round(CAST(sum_x AS DOUBLE) / pixel_count, 6) AS total_mean,
       round(sqrt(CAST(sum_x2 AS DOUBLE) / pixel_count
                  - (CAST(sum_x AS DOUBLE) / pixel_count) * (CAST(sum_x AS DOUBLE) / pixel_count)), 6) AS total_std
FROM tot, pc
""",
    tables=["labels", "scenes"],
)

register_df("pipeline_skip_zero", pipeline_skip_zero, oracle=_ORACLE)
register_df("dataset_stats_quirk", dataset_stats_quirk_query, oracle=_QUIRK_ORACLE)
