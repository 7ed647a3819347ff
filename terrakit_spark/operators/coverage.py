"""Tile<->label area coverage: exact intersection area of every chip window
against every overlapping label polygon, rolled up per tile.

The reference approximates label coverage per chip by COUNTING burned pixels
(/root/reference/terrakit/chip/chip_and_label.py — mask.sum() over the
rasterized window); this operator computes the EXACT geometric area via the
vectorized Sutherland-Hodgman kernel (functions/geometry.py:clip_area) —
the area-weighted label-assignment a training-data pipeline uses to pick
chips worth keeping (coverage thresholds, class balance by area).

Plan: window grid (pure codegen explode) -> geo tile bboxes -> coarse-cell
equi-join to labels -> canonical-cell dedup + bbox prefilter (JVM-side) ->
Arrow clip-area refine -> per-tile aggregate. No oracle: DuckDB cannot run
the clipping kernel and the closed-form rect∩diamond integral is a case
explosion — correctness is pinned by tests/test_overlap_join.py's numpy
parity + Monte Carlo property tests instead (driver records the weaker
rows-only check; SURVEY §2 notes it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrakit_spark.functions.cells import cell_id, with_cover_cells
from terrakit_spark.functions.geometry import convex_intersection_area
from terrakit_spark.operators.spatial_join import _diamond_polys, _register_views
from terrakit_spark.registry import register_df
from terrakit_spark.synth import RES_SQL

TILE_CELL_DEG = 1.0  # chip windows are 2 deg; the 0.125-deg point grid would
#                      explode each tile to 17x17 cover cells for no pruning


def tile_coverage_join(
    tiles: DataFrame, polys: DataFrame, cell_deg: float = TILE_CELL_DEG, n_salts: int = 0
) -> DataFrame:
    """tiles(txmin..tymax, tverts CCW) x polys(xmin..ymax, vertices) ->
    pairs + exact intersection `area` (only area > 0 pairs survive).

    n_salts: hotspot-cell lever for dense regions — same combinatorial-
    skew class as convex_overlap_join (a hot cell's tile x label product
    is ONE join key, invisible to AQE's byte-keyed skew handling); the
    salted partitioning must be pinned with explicit numPartitions for
    the same reason (AQE coalescing merges salted keys back)."""
    t = with_cover_cells(tiles, "txmin", "tymin", "txmax", "tymax", out="_cell", cell_deg=cell_deg)
    g = with_cover_cells(polys, "xmin", "ymin", "xmax", "ymax", out="_cell", cell_deg=cell_deg)
    if n_salts > 0:
        from terrakit_spark.functions.cells import replicate_salts, with_salt

        t = with_salt(t, "_cell", n_salts, F.col("txmin") + F.col("tymax"), out="_salt")
        g = replicate_salts(g, n_salts, out="_salt")
        p = n_salts * 32
        t = t.repartition(p, "_cell", "_salt")
        g = g.repartition(p, "_cell", "_salt")
        cand = t.join(g, on=["_cell", "_salt"], how="inner").drop("_salt")
    else:
        cand = t.join(g, on="_cell", how="inner")
    canonical = cell_id(
        F.greatest(F.col("txmin"), F.col("xmin")),
        F.greatest(F.col("tymin"), F.col("ymin")),
        cell_deg,
    )
    cand = cand.filter(F.col("_cell") == canonical)
    cand = cand.filter(
        (F.col("txmin") <= F.col("xmax"))
        & (F.col("xmin") <= F.col("txmax"))
        & (F.col("tymin") <= F.col("ymax"))
        & (F.col("ymin") <= F.col("tymax"))
    )
    cand = cand.withColumn("area", convex_intersection_area(F.col("vertices"), F.col("tverts")))
    return cand.filter(F.col("area") > 0.0).drop("_cell")


def _geo_tiles(spark: SparkSession, scene_pred: str) -> DataFrame:
    """Chip windows in geo coordinates (scene xmin/ymin + window offset *
    RES), with a CCW rectangle vertex array for the clipping kernel."""
    return spark.sql(
        f"""
        SELECT scene_id, win_index,
               txmin, tymin, txmin + win_w * {RES_SQL} AS txmax, tymin + win_h * {RES_SQL} AS tymax,
               array(txmin, tymin,
                     txmin + win_w * {RES_SQL}, tymin,
                     txmin + win_w * {RES_SQL}, tymin + win_h * {RES_SQL},
                     txmin, tymin + win_h * {RES_SQL}) AS tverts
        FROM (
          SELECT w.scene_id, w.win_index, w.win_w, w.win_h,
                 s.xmin + w.win_x * {RES_SQL} AS txmin,
                 s.ymin + w.win_y * {RES_SQL} AS tymin
          FROM (SELECT scene_id, win_index, win_x, win_y, win_w, win_h
                FROM (SELECT scene_id, width, height,
                             CAST((x div 256) * ((height - 1) div 256 + 1) + (y div 256) AS INT) AS win_index,
                             CAST(CASE WHEN x + 256 > width THEN width - 256 ELSE x END AS INT) AS win_x,
                             CAST(CASE WHEN y + 256 > height THEN height - 256 ELSE y END AS INT) AS win_y,
                             256 AS win_w, 256 AS win_h
                      FROM scenes
                      LATERAL VIEW explode(sequence(0, CAST(width - 1 AS BIGINT), 256)) _x AS x
                      LATERAL VIEW explode(sequence(0, CAST(height - 1 AS BIGINT), 256)) _y AS y) _wg
                WHERE {scene_pred}) w
          JOIN scenes s ON w.scene_id = s.scene_id
        ) _t
        """
    )


def tile_label_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chip-window exact label coverage over the scene_id % 25 = 0
    subset: window count, per-label area sum, and coverage fraction of the
    2x2-degree tile. Sum-of-areas semantics (overlapping labels add)."""
    _register_views(spark, sf_dir)
    tiles = _geo_tiles(spark, "scene_id % 25 = 0")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    # salted by default: the pinned 512-task refine is both faster (30.8 vs
    # 41.5 s min at sf0.1) and far more noise-robust (31-32 s tight band vs
    # 42-127 s — a few-task refine is hostage to whichever cores degrade)
    pairs = tile_coverage_join(tiles, polys, n_salts=16)
    # tile area is exactly 4 deg^2: 256 px * 2^-7 deg/px = 2 deg per side
    return (
        pairs.groupBy("scene_id", "win_index")
        .agg(
            F.count("*").cast("int").alias("n_labels"),
            F.sum("area").alias("label_area"),
        )
        .withColumn("coverage", F.col("label_area") / F.lit(4.0))
    )


register_df("tile_label_coverage", tile_label_coverage)
