from __future__ import annotations

import numpy as np

from terrakit_spark.functions.geometry import _pad_vertices, ray_cast
from terrakit_spark.functions.raster_kernels import (
    descriptive_stats,
    impute_nodata_nearest,
    normalize_band,
    scale_bands,
)
from terrakit_spark.operators.rasterize import burn_image


def test_scale_bands_skips_nodata():
    cube = np.array([[[2.0, -9999.0], [4.0, 8.0]]], dtype=np.float32)
    out = scale_bands(cube, [0.5])
    assert out[0, 0, 0] == 1.0 and out[0, 0, 1] == -9999.0 and out[0, 1, 1] == 4.0


def test_impute_fills_holes_and_skips_clean():
    band = np.array([[1.0, -9999.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
    out = impute_nodata_nearest(band)
    assert out[0, 1] == 5.0  # "up" slot empty -> down neighbour (row below)
    clean = np.ones((3, 3), dtype=np.float32)
    assert impute_nodata_nearest(clean) is clean  # skip-when-clean guard


def test_impute_multi_ring():
    band = np.full((5, 5), -9999.0, dtype=np.float32)
    band[0, 0] = 7.0
    out = impute_nodata_nearest(band)
    assert (out == 7.0).all()


def test_normalize_band():
    band = np.array([[0.0, 5.0], [10.0, -9999.0]], dtype=np.float32)
    out = normalize_band(band)
    assert out[0, 0] == 0.0 and out[0, 1] == 0.5 and out[1, 0] == 1.0 and out[1, 1] == -9999.0


def test_descriptive_stats_masked():
    a = np.array([1.0, 2.0, 3.0, 100.0])
    m = np.array([1, 1, 1, 0])
    s = descriptive_stats(a, m)
    assert s["mean"] == 2.0 and s["median"] == 2.0 and s["count"] == 3


def test_ray_cast_triangle():
    tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    px = np.array([1.0, 3.9, -0.5])
    py = np.array([1.0, 3.9, 1.0])
    polys = np.broadcast_to(tri, (3, 3, 2))
    assert list(ray_cast(px, py, polys)) == [True, False, False]


def test_pad_vertices_ragged():
    import pandas as pd

    v = pd.Series([[0.0, 0.0, 1.0, 0.0, 0.0, 1.0], [0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0]])
    out = _pad_vertices(v)
    assert out.shape == (2, 4, 2)
    # padded vertex repeats the last real vertex -> degenerate edge, no effect
    px = np.array([0.25, 1.0])
    py = np.array([0.25, 1.0])
    assert list(ray_cast(px, py, out)) == [True, True]


def test_burn_order_later_wins():
    # two overlapping diamonds, classes 1 then 2; overlap must be 2
    p1 = np.array([[0.0, 2.0], [2.0, 0.0], [4.0, 2.0], [2.0, 4.0]])
    p2 = np.array([[1.0, 2.0], [3.0, 0.0], [5.0, 2.0], [3.0, 4.0]])
    img = burn_image(6, 6, 0.0, 6.0, [p1, p2], [1, 2], res=1.0)
    img_rev = burn_image(6, 6, 0.0, 6.0, [p2, p1], [2, 1], res=1.0)
    assert (img == 2).any() and (img == 1).any()
    overlap = (img == 2) & (img_rev == 1)
    assert overlap.any()  # same pixels flip with order -> order is honoured


def test_edge_kernel_bit_identical_to_painter():
    """The batched edge-table kernel (the >=24-poly dispatch path) must be
    BIT-identical to the occlusion painter for any polygon soup: same
    ray-cast predicate, same last-wins burn order, both fill values."""
    import numpy as np

    from terrakit_spark.operators.rasterize import _burn_image_edges, _burn_image_painter
    from terrakit_spark.synth import RES

    for seed in range(12):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 800))
        w = int(rng.integers(8, 160))
        h = int(rng.integers(8, 160))
        xmin, ymax = -10.0, 5.0
        polys, classes = [], []
        for _ in range(n):
            cx = xmin + rng.uniform(-0.1, w * RES + 0.1)
            cy = ymax - rng.uniform(-0.1, h * RES + 0.1)
            rx = rng.uniform(0.1 * RES, 30 * RES)
            ry = rng.uniform(0.1 * RES, 30 * RES)
            polys.append(np.array([[cx - rx, cy], [cx, cy - ry], [cx + rx, cy], [cx, cy + ry]]))
            classes.append(int(rng.integers(1, 9)))
        for fill in (0, -1):
            a = _burn_image_painter(w, h, xmin, ymax, polys, classes, fill=fill)
            b = _burn_image_edges(w, h, xmin, ymax, polys, classes, RES, fill)
            assert b is not None and np.array_equal(a, b), f"seed={seed} fill={fill}"


def test_edge_kernel_vertex_on_pixel_center():
    """Diamond vertices exactly on pixel centers/edges — the strict
    crossing convention must agree between kernels at the boundary."""
    import numpy as np

    from terrakit_spark.operators.rasterize import _burn_image_edges, _burn_image_painter
    from terrakit_spark.synth import RES

    w = h = 48
    xmin, ymax = 0.0, h * RES
    polys, classes = [], []
    for i in range(40):
        cx = xmin + (i % w + 0.5) * RES
        cy = ymax - (i % h + 0.5) * RES
        r = (1 + i % 7) * RES
        polys.append(np.array([[cx - r, cy], [cx, cy - r], [cx + r, cy], [cx, cy + r]]))
        classes.append(i % 5 + 1)
    a = _burn_image_painter(w, h, xmin, ymax, polys, classes)
    b = _burn_image_edges(w, h, xmin, ymax, polys, classes, RES, 0)
    assert b is not None and np.array_equal(a, b)
