"""S2 — raster polygonize: burned label rasters back to vector components
(the reference polygonizes raster label files with rasterio.features.shapes
and keeps shapes with value == label_value,
/root/reference/terrakit/transform/labels.py:167-196).

Spark shape: per-scene Arrow batch UDF running a vectorized numpy
connected-components labelling (4-connectivity, two-pass union-find) over
the burned image; emits one row per component with class, pixel count, and
bbox (the component geometry's envelope — full boundary tracing is the
rasterio analogue's job; envelope + mass is what downstream grouping
consumes). F1 (value filter) is the WHERE on label_class."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrakit_spark.operators.chips import SMALL_PRED_SQL
from terrakit_spark.operators.rasterize import burn_image
from terrakit_spark.operators.spatial_join import _register_views


def connected_components(img: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected labelling of nonzero same-value regions: vectorized
    min-label flooding (no scipy, no per-pixel Python). Each foreground
    pixel starts with its linear index; every iteration takes the min over
    same-value 4-neighbours until fixpoint (O(component diameter) cheap
    vector passes). Returns (component ids 1..n, count); 0 = background."""
    h, w = img.shape
    fg = img != 0
    ids = np.where(fg, np.arange(h * w, dtype=np.int64).reshape(h, w), np.int64(-1))
    while True:
        new = ids.copy()
        # up
        ok = fg[1:] & (img[1:] == img[:-1]) & (ids[:-1] >= 0)
        np.minimum(new[1:], np.where(ok, ids[:-1], np.int64(2**62)), out=new[1:])
        # down
        ok = fg[:-1] & (img[:-1] == img[1:]) & (ids[1:] >= 0)
        np.minimum(new[:-1], np.where(ok, ids[1:], np.int64(2**62)), out=new[:-1])
        # left
        ok = fg[:, 1:] & (img[:, 1:] == img[:, :-1]) & (ids[:, :-1] >= 0)
        np.minimum(new[:, 1:], np.where(ok, ids[:, :-1], np.int64(2**62)), out=new[:, 1:])
        # right
        ok = fg[:, :-1] & (img[:, :-1] == img[:, 1:]) & (ids[:, 1:] >= 0)
        np.minimum(new[:, :-1], np.where(ok, ids[:, 1:], np.int64(2**62)), out=new[:, :-1])
        if np.array_equal(new, ids):
            break
        ids = new
    out = np.zeros((h, w), dtype=np.int64)
    if fg.any():
        uniq, inv = np.unique(ids[fg], return_inverse=True)
        out[fg] = inv + 1
        return out, len(uniq)
    return out, 0


def polygonize_components(spark: SparkSession, sf_dir: str, label_value: int | None = None) -> DataFrame:
    """Burn small scenes, then polygonize: one row per connected component
    (scene_id, label_class, n_px, bbox in pixel coords)."""
    _register_views(spark, sf_dir)
    from terrakit_spark.operators.rasterize import scene_label_pairs

    pairs = scene_label_pairs(spark, SMALL_PRED_SQL)

    def poly_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("geom_seq")
        w, h = int(pdf["width"].iloc[0]), int(pdf["height"].iloc[0])
        polys = [
            np.array([[cx - rx, cy], [cx, cy - ry], [cx + rx, cy], [cx, cy + ry]], dtype=np.float64)
            for cx, cy, rx, ry in zip(pdf["cx"], pdf["cy"], pdf["rx"], pdf["ry"])
        ]
        img = burn_image(w, h, float(pdf["xmin"].iloc[0]), float(pdf["ymax"].iloc[0]), polys, list(pdf["labelclass"]))
        comp, n = connected_components(img)
        rows = []
        for cid in range(1, n + 1):
            m = comp == cid
            ys, xs = np.nonzero(m)
            cls = int(img[ys[0], xs[0]])
            rows.append((key[0], cid, cls, int(m.sum()), int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())))
        return pd.DataFrame(
            rows,
            columns=["scene_id", "component", "label_class", "n_px", "px_xmin", "px_ymin", "px_xmax", "px_ymax"],
        )

    out = pairs.groupBy("scene_id").applyInPandas(
        poly_group,
        schema="scene_id long, component int, label_class int, n_px long, px_xmin int, px_ymin int, px_xmax int, px_ymax int",
    )
    if label_value is not None:
        out = out.filter(F.col("label_class") == label_value)  # F1
    return out


def _polygonize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return polygonize_components(spark, sf_dir)


from terrakit_spark.registry import register_df  # noqa: E402

register_df("raster_polygonize", _polygonize_query)
