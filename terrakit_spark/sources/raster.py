"""Synthetic raster source — the engine's S6 "lazy raster stack" analogue.

Scenes are catalog rows; pixels are materialized per-partition with
mapInPandas (Arrow batches, numpy inside) as float32 C-order (bands, h, w)
binary payloads, nodata -9999 — the reference's cube layout
(/root/reference/terrakit/download/data_connectors/sentinel_aws.py:419-421,
sentinelhub.py:183-192). Raster bytes move through shuffles as opaque
binary columns, never as Python row objects.

Pixel values are the deterministic integer formula from synth.py, so the
DuckDB oracle can recompute any pixel in closed form."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from terrakit_spark.synth import NODATA_EVERY, PIXEL_BASE, PIXEL_MOD


def scene_pixels(scene_id: int, bands: int, height: int, width: int) -> np.ndarray:
    """(bands, h, w) float32 array for a scene — numpy mirror of
    synth.pixel_value_expr."""
    b = np.arange(bands, dtype=np.int64).reshape(-1, 1, 1)
    y = np.arange(height, dtype=np.int64).reshape(1, -1, 1)
    x = np.arange(width, dtype=np.int64).reshape(1, 1, -1)
    vals = (scene_id * 7 + b * 13 + y * 31 + x * 17) % PIXEL_MOD + PIXEL_BASE
    lin = scene_id + b + y * width + x
    out = np.where(lin % NODATA_EVERY == 0, -9999, vals).astype(np.float32)
    return out


def with_pixels(scenes: DataFrame) -> DataFrame:
    """Attach a `pixels` binary column to a scenes DataFrame (scene_id,
    bands, width, height, ... preserved)."""
    fields = ", ".join(f"{c} {t}" for c, t in scenes.dtypes)
    schema = f"{fields}, pixels binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                scene_pixels(int(s), int(b), int(h), int(w)).tobytes()
                for s, b, h, w in zip(pdf["scene_id"], pdf["bands"], pdf["height"], pdf["width"])
            ]
            pdf = pdf.copy()
            pdf["pixels"] = pixels
            yield pdf

    return scenes.mapInPandas(gen, schema=schema)
