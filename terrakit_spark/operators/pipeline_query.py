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

    chips = chip_pipeline(spark, sf_dir, scene_pred="(scene_id % 25) = 0")
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
# for some label date; each yields exactly one (clipped) chip = whole image.
_ORACLE = with_synth(
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
data_sums AS (
  SELECT scene_id,
         CAST(sum(CASE WHEN (scene_id + band + y * width + x) % {NODATA_EVERY} = 0 THEN -9999
                       ELSE (scene_id * 7 + band * 13 + y * 31 + x * 17) % {PIXEL_MOD} + {PIXEL_BASE} END) AS BIGINT) AS data_sum
  FROM (
    SELECT scene_id, width, band, y, unnest(generate_series(0, CAST(width - 1 AS BIGINT))) AS x
    FROM (SELECT scene_id, width, band, unnest(generate_series(0, CAST(height - 1 AS BIGINT))) AS y
          FROM (SELECT scene_id, width, height, unnest(generate_series(0, CAST(bands - 1 AS BIGINT))) AS band
                FROM small) _sb) _sy
  ) _px GROUP BY scene_id
),
px AS (
  SELECT scene_id, y, x, gx, gy,
         CAST(floor(gx + 1.8e2) AS BIGINT) AS cell_x,
         CAST(floor(gy + 9.0e1) AS BIGINT) AS cell_y
  FROM (
    SELECT scene_id, y, x,
           xmin + (x + 5.0e-1) * 7.8125e-3 AS gx,
           ymax - (y + 5.0e-1) * 7.8125e-3 AS gy
    FROM (SELECT scene_id, xmin, ymax, y, unnest(generate_series(0, CAST(width - 1 AS BIGINT))) AS x
          FROM (SELECT scene_id, width, height, xmin, ymax, unnest(generate_series(0, CAST(height - 1 AS BIGINT))) AS y
                FROM small) _sy) _sx
  ) _g
),
lcells AS (
  SELECT label_id, cx, cy, rx, ry,
         unnest(generate_series(CAST(floor(cy - ry + 9.0e1) AS BIGINT),
                                CAST(floor(cy + ry + 9.0e1) AS BIGINT))) AS cell_y,
         cell_x
  FROM (SELECT label_id, cx, cy, rx, ry,
               unnest(generate_series(CAST(floor(cx - rx + 1.8e2) AS BIGINT),
                                      CAST(floor(cx + rx + 1.8e2) AS BIGINT))) AS cell_x
        FROM labels) _lx
),
mass AS (
  SELECT scene_id, count(*) AS label_mass FROM (
    SELECT DISTINCT p.scene_id, p.y, p.x
    FROM px p JOIN lcells l ON p.cell_x = l.cell_x AND p.cell_y = l.cell_y
    WHERE abs(p.gx - l.cx) / l.rx + abs(p.gy - l.cy) / l.ry < 1
  ) _c GROUP BY scene_id
)
SELECT s.scene_id, s.scene_date_str,
       CAST(1 AS BIGINT) AS n_chips,
       d.data_sum,
       CAST(coalesce(m.label_mass, 0) AS BIGINT) AS label_mass
FROM small s
JOIN data_sums d ON d.scene_id = s.scene_id
LEFT JOIN mass m ON m.scene_id = s.scene_id
""",
    tables=["labels", "scenes"],
)

register_df("pipeline_summary_small", pipeline_summary_small, oracle=_ORACLE)
register_df("chip_pipeline_full", chip_pipeline_full)
