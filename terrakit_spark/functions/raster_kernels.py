"""Per-chip raster math kernels (vectorized numpy; applied inside Arrow
batch UDFs — the hot path stays out of per-row Python):

- scale_bands: per-band multiply
  (/root/reference/terrakit/download/transformations/scale_data_xarray.py:17-37)
- impute_nodata_nearest: nearest-neighbour infill of -9999 holes, skipped
  when no holes exist
  (/root/reference/terrakit/download/transformations/impute_nans_xarray.py:17-50)
- normalize_band: min-max to [0,1]
  (/root/reference/terrakit/general_utils/plotting.py:21-35)
- descriptive_stats: mean/median/min/max/std/count, masked variant
  (/root/reference/terrakit/general_utils/statistics.py:8-45)
"""

from __future__ import annotations

import numpy as np

NODATA = -9999.0


def scale_bands(cube: np.ndarray, factors: list[float], nodata: float = NODATA) -> np.ndarray:
    """cube (bands, h, w); nodata pixels pass through unscaled."""
    out = cube.astype(np.float32, copy=True)
    for b, f in enumerate(factors):
        band = out[b]
        mask = band != nodata
        band[mask] = band[mask] * np.float32(f)
    return out


def impute_nodata_nearest(band: np.ndarray, nodata: float = NODATA, max_iters: int | None = None) -> np.ndarray:
    """Chebyshev-ring nearest-neighbour infill via iterative 4-neighbour
    dilation (deterministic neighbour priority: up, down, left, right).
    Returns the input unchanged (no copy) when there are no holes —
    mirroring the reference's skip-when-clean guard."""
    holes = band == nodata
    if not holes.any():
        return band
    out = band.copy()
    it = 0
    while holes.any():
        it += 1
        if max_iters is not None and it > max_iters:
            break
        shifted = [
            np.roll(out, 1, axis=0),  # value from the row above
            np.roll(out, -1, axis=0),
            np.roll(out, 1, axis=1),
            np.roll(out, -1, axis=1),
        ]
        # roll wraps around; mask wrapped edges to nodata
        shifted[0][0, :] = nodata
        shifted[1][-1, :] = nodata
        shifted[2][:, 0] = nodata
        shifted[3][:, -1] = nodata
        # deterministic composition: first valid among [up, down, left, right]
        filled = np.full_like(out, nodata)
        for s in shifted:
            use = (filled == nodata) & (s != nodata)
            filled[use] = s[use]
        grow = holes & (filled != nodata)
        if not grow.any():
            break  # fully-nodata image
        out[grow] = filled[grow]
        holes = out == nodata
    return out


def normalize_band(band: np.ndarray, nodata: float = NODATA) -> np.ndarray:
    valid = band != nodata
    if not valid.any():
        return band.astype(np.float32)
    lo = band[valid].min()
    hi = band[valid].max()
    rng = hi - lo if hi > lo else 1.0
    out = band.astype(np.float32, copy=True)
    out[valid] = (band[valid] - lo) / rng
    return out


def descriptive_stats(arr: np.ndarray, mask: np.ndarray | None = None) -> dict[str, float]:
    a = arr if mask is None else arr[mask > 0]
    a = a.astype(np.float64)
    return {
        "mean": float(a.mean()),
        "median": float(np.median(a)),
        "min": float(a.min()),
        "max": float(a.max()),
        "std": float(a.std()),
        "count": int(a.size),
    }
