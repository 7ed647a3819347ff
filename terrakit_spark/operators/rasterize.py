"""J2 full — rasterize (label burn) onto scene grids.

The reference burns ALL label geometries onto every queried raster
(/root/reference/terrakit/download/download_data.py:326-396): fill 0 (or -1
with set_no_data), class id per polygon, later shapes overwriting earlier
(rasterio default). Spark plan:

  scenes --cover cells--> x labels --cover cells--> : cell equi-join
  (never a nested-loop theta join), distinct (scene,label) pairs, exact
  bbox-overlap refine, groupBy(scene) -> applyInPandas burn (vectorized
  ray-cast per polygon in geom_seq order) -> per-class pixel histograms.

The histogram (not the full image) is the query output so the oracle stays
tractable; the burn itself produces full label images in the chipping
pipeline. Burn-order correctness is pinned by overlapping polygons of
different classes in the synthetic layer + the arg_max(geom_seq) oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrakit_spark.dialect import DUCK
from terrakit_spark.functions.cells import with_cover_cells
from terrakit_spark.functions.geometry import ray_cast
from terrakit_spark.operators.chips import SMALL_PRED_SQL
from terrakit_spark.operators.spatial_join import _register_views
from terrakit_spark.registry import register_df, with_synth
from terrakit_spark.synth import RES, RES_SQL

BACKGROUND = 0  # /root/reference/terrakit/download/download_data.py:369


def burn_image(
    width: int,
    height: int,
    xmin: float,
    ymax: float,
    polys: list[np.ndarray],
    classes: list[int],
    res: float = RES,
    fill: int = BACKGROUND,
) -> np.ndarray:
    """Burn polygons (pre-sorted by geom_seq) over the pixel grid; later
    polygons overwrite earlier. Pixel center (x,y) = (xmin + (x+0.5)*res,
    ymax - (y+0.5)*res), north-up."""
    UNSET = np.int32(-2147483648)
    img = np.full((height, width), UNSET, dtype=np.int32)
    if len(polys) == 0:
        img[:] = fill
        return img
    xs = xmin + (np.arange(width, dtype=np.float64) + 0.5) * res
    ys = ymax - (np.arange(height, dtype=np.float64) + 0.5) * res  # decreasing
    ys_rev = ys[::-1]

    # coarse occupancy grid: per-tile unset counts let fully-occluded
    # polygons skip without touching pixels (painter's algorithm with
    # occlusion culling — dense hotspots overlap thousands of polygons)
    TS = 64
    th = (height + TS - 1) // TS
    tw = (width + TS - 1) // TS
    tiles_unset = np.zeros((th, tw), dtype=np.int64)
    for ty in range(th):
        for tx in range(tw):
            tiles_unset[ty, tx] = min(TS, height - ty * TS) * min(TS, width - tx * TS)

    # Precompute all bboxes vectorized (one pass instead of 2 numpy
    # reductions per polygon inside the loop — hotspot scenes see 10^4
    # overlapping polygons and the per-poly Python overhead is the cost).
    parr = np.stack(polys)  # (n, 4, 2) — diamonds/quads; ragged callers
    bx0a, by0a = parr.min(axis=1).T
    bx1a, by1a = parr.max(axis=1).T
    x_lo_a = np.searchsorted(xs, bx0a, "left")
    x_hi_a = np.searchsorted(xs, bx1a, "right")
    y_lo_a = height - np.searchsorted(ys_rev, by1a, "right")
    y_hi_a = height - np.searchsorted(ys_rev, by0a, "left")

    # REVERSE geom_seq order with first-write-wins == forward last-wins:
    # once a region is written, polygons underneath never pay a ray cast,
    # bounding total PIP work by O(pixels), not O(pixels x polygons).
    remaining = int(tiles_unset.sum())
    n = len(polys)
    for i in range(n - 1, -1, -1):
        x_lo, x_hi = int(x_lo_a[i]), int(x_hi_a[i])
        y_lo, y_hi = int(y_lo_a[i]), int(y_hi_a[i])
        if x_lo >= x_hi or y_lo >= y_hi:
            continue
        ty0, ty1 = y_lo // TS, (y_hi - 1) // TS + 1
        tx0, tx1 = x_lo // TS, (x_hi - 1) // TS + 1
        if tiles_unset[ty0:ty1, tx0:tx1].sum() == 0:
            continue
        block = img[y_lo:y_hi, x_lo:x_hi]
        unset = block == UNSET
        rows, cols = np.nonzero(unset)
        if rows.size == 0:
            continue
        poly = polys[i]
        hit = ray_cast(
            xs[x_lo + cols],
            ys[y_lo + rows],
            np.broadcast_to(poly, (rows.size, poly.shape[0], 2)),
        )
        nhit = int(hit.sum())
        if nhit:
            hr, hc = rows[hit], cols[hit]
            block[hr, hc] = classes[i]
            # decremental occupancy update: we know exactly which tiles the
            # written pixels fall in — no rescan (was a Python-loop recount
            # per written polygon, the hotspot-scene hot spot)
            np.subtract.at(
                tiles_unset,
                ((y_lo + hr) // TS, (x_lo + hc) // TS),
                1,
            )
            remaining -= nhit
            if remaining == 0:
                break  # image fully painted; all earlier polys are occluded
    img[img == UNSET] = fill
    return img


def scene_label_pairs(spark: SparkSession, scenes_sql_pred: str) -> DataFrame:
    """Candidate (scene, label) pairs via cover-cell equi-join + exact
    bbox-overlap refine — candidate pruning where the reference brute-forces
    every label against every raster. Both sides explode to cover cells;
    the join is a hash equi-join on cell (broadcast while the label side is
    small, shuffled+AQE-skew-split at scale)."""
    scenes = spark.sql(
        f"SELECT scene_id, width, height, xmin, ymin, xmax, ymax FROM scenes WHERE {scenes_sql_pred}"
    )
    labels = spark.sql(
        """
        SELECT label_id, labelclass, geom_seq, cx, cy, rx, ry,
               cx - rx AS lxmin, cy - ry AS lymin, cx + rx AS lxmax, cy + ry AS lymax
        FROM labels
        """
    )
    s = with_cover_cells(scenes, "xmin", "ymin", "xmax", "ymax", out="_cell")
    l_cells = with_cover_cells(labels, "lxmin", "lymin", "lxmax", "lymax", out="_cell")
    return (
        s.join(F.broadcast(l_cells), "_cell")
        .filter(
            (F.col("lxmin") <= F.col("xmax"))
            & (F.col("lxmax") >= F.col("xmin"))
            & (F.col("lymin") <= F.col("ymax"))
            & (F.col("lymax") >= F.col("ymin"))
        )
        .dropDuplicates(["scene_id", "label_id"])
        .select(
            "scene_id", "width", "height", "xmin", "ymax",
            "label_id", "labelclass", "geom_seq", "cx", "cy", "rx", "ry",
        )
    )


def burn_histogram(spark: SparkSession, sf_dir: str, fill: int = BACKGROUND) -> DataFrame:
    """(scene_id, label_class, n_px) histograms of the burned label images,
    including the background class (only when background pixels remain).
    fill selects the background value: 0 (default) or -1 — the reference's
    set_no_data mode (/root/reference/terrakit/download/
    download_data.py:369,387-388), which frees class 0 for real labels."""
    _register_views(spark, sf_dir)
    pairs = scene_label_pairs(spark, SMALL_PRED_SQL)
    scenes = spark.sql(f"SELECT scene_id, width, height, xmin, ymax FROM scenes WHERE {SMALL_PRED_SQL}")

    def burn_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("geom_seq")
        w = int(pdf["width"].iloc[0])
        h = int(pdf["height"].iloc[0])
        polys = [
            np.array([[cx - rx, cy], [cx, cy - ry], [cx + rx, cy], [cx, cy + ry]], dtype=np.float64)
            for cx, cy, rx, ry in zip(pdf["cx"], pdf["cy"], pdf["rx"], pdf["ry"])
        ]
        img = burn_image(
            w, h, float(pdf["xmin"].iloc[0]), float(pdf["ymax"].iloc[0]),
            polys, list(pdf["labelclass"]), fill=fill,
        )
        cls, cnt = np.unique(img, return_counts=True)
        return pd.DataFrame(
            {"scene_id": key[0], "label_class": cls.astype(np.int32), "n_px": cnt.astype(np.int64)}
        )

    hist = pairs.groupBy("scene_id").applyInPandas(
        burn_group, schema="scene_id long, label_class int, n_px long"
    )
    untouched = scenes.join(pairs.select("scene_id").distinct(), "scene_id", "left_anti").select(
        "scene_id",
        F.lit(fill).cast("int").alias("label_class"),
        (F.col("width").cast("long") * F.col("height").cast("long")).alias("n_px"),
    )
    return hist.unionByName(untouched)


# Candidate pixels come from per-(scene, label, row) diamond bboxes — NOT a
# pixels x cell-join (hotspot cells made that quadratic: 605 s at sf0.01;
# this form runs in seconds). Winner per pixel = max-geom_seq cover
# (last-wins burn), identical to the engine's reverse-order occlusion burn.
def _burn_oracle(fill: int) -> str:
    return with_synth(
        DUCK,
        f"""
WITH sc AS (
  SELECT scene_id, width, height, xmin, ymin, xmax, ymax
  FROM scenes WHERE {SMALL_PRED_SQL}
),
prs AS (
  SELECT s.scene_id, s.width, s.height, s.xmin, s.ymax,
         l.geom_seq, l.labelclass, l.cx, l.cy, l.rx, l.ry
  FROM sc s JOIN labels l
    ON l.cx - l.rx <= s.xmax AND l.cx + l.rx >= s.xmin
   AND l.cy - l.ry <= s.ymax AND l.cy + l.ry >= s.ymin
),
cand AS (
  SELECT scene_id, xmin, ymax, labelclass, geom_seq, cx, cy, rx, ry, y,
         unnest(generate_series(xlo, xhi)) AS x
  FROM (
    SELECT *,
      greatest(CAST(floor((cx - rx - xmin) / {RES_SQL} - 5.0e-1) AS BIGINT), 0) AS xlo,
      least(CAST(ceil((cx + rx - xmin) / {RES_SQL} - 5.0e-1) AS BIGINT), CAST(width AS BIGINT) - 1) AS xhi
    FROM (
      SELECT *, unnest(generate_series(ylo, yhi)) AS y FROM (
        SELECT *,
          greatest(CAST(floor((ymax - cy - ry) / {RES_SQL} - 5.0e-1) AS BIGINT) + 1, 0) AS ylo,
          least(CAST(ceil((ymax - cy + ry) / {RES_SQL} - 5.0e-1) AS BIGINT) - 1, CAST(height AS BIGINT) - 1) AS yhi
        FROM prs) _y
      WHERE ylo <= yhi) _x
  ) _c WHERE xlo <= xhi
),
covered AS (
  SELECT scene_id, y, x, arg_max(labelclass, geom_seq) AS cls
  FROM cand
  WHERE abs((xmin + (x + 5.0e-1) * {RES_SQL}) - cx) / rx
      + abs((ymax - (y + 5.0e-1) * {RES_SQL}) - cy) / ry < 1
  GROUP BY scene_id, y, x
),
per_class AS (
  SELECT scene_id, cls, count(*) AS n_px FROM covered GROUP BY scene_id, cls
),
totals AS (
  SELECT scene_id, CAST(width AS BIGINT) * CAST(height AS BIGINT) AS total FROM sc
)
SELECT scene_id, CAST(cls AS INT) AS label_class, CAST(n_px AS BIGINT) AS n_px FROM per_class
UNION ALL
SELECT t.scene_id, {fill} AS label_class,
       CAST(t.total - coalesce(c.covered_px, 0) AS BIGINT) AS n_px
FROM totals t
LEFT JOIN (SELECT scene_id, sum(n_px) AS covered_px FROM per_class GROUP BY scene_id) c
  ON c.scene_id = t.scene_id
WHERE t.total - coalesce(c.covered_px, 0) > 0
""",
        tables=["labels", "scenes"],
    )


def _burn_histogram_nodata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-class set_no_data variant: background burns as -1 instead of 0."""
    return burn_histogram(spark, sf_dir, fill=-1)


register_df("burn_histogram", burn_histogram, oracle=_burn_oracle(BACKGROUND))
register_df("burn_histogram_nodata", _burn_histogram_nodata, oracle=_burn_oracle(-1))
