from __future__ import annotations

import numpy as np
import pytest

from terrakit_spark.operators.polygonize import connected_components
from terrakit_spark.validate import (
    ValidationError,
    validate_bbox,
    validate_collection,
    validate_date_range,
    validate_label_classes,
)


def test_validate_bbox():
    assert validate_bbox([-10, -5, 10, 5]) == [-10, -5, 10, 5]
    for bad in ([0, 0, 0], [10, -5, -10, 5], [-200, 0, 10, 5], [-10, 5, 10, -5]):
        with pytest.raises(ValidationError):
            validate_bbox(bad)


def test_validate_dates():
    validate_date_range("2024-01-01", "2024-02-01")
    with pytest.raises(ValidationError):
        validate_date_range("2024-02-01", "2024-01-01")
    with pytest.raises(ValidationError):
        validate_date_range("1949-12-31", "2024-01-01")
    with pytest.raises(ValidationError):
        validate_date_range("not-a-date", "2024-01-01")


def test_validate_collection_and_classes():
    validate_collection("synthetic-optical")
    with pytest.raises(ValidationError):
        validate_collection("nope")
    with pytest.raises(ValidationError):
        validate_label_classes([0, 1], set_no_data=False)
    assert validate_label_classes([0, 1], set_no_data=True) == []
    assert validate_label_classes([1, 3]) != []  # non-continuous -> warning


def test_connected_components_basic():
    img = np.array(
        [
            [1, 1, 0, 2],
            [0, 1, 0, 2],
            [3, 0, 1, 0],
            [3, 3, 1, 1],
        ],
        dtype=np.int32,
    )
    comp, n = connected_components(img)
    assert n == 4
    assert comp[0, 0] == comp[1, 1] != 0
    assert comp[0, 3] == comp[1, 3]
    assert comp[2, 0] == comp[3, 1]
    assert comp[2, 2] == comp[3, 3]
    # same value but diagonal only -> distinct components
    img2 = np.array([[1, 0], [0, 1]], dtype=np.int32)
    _, n2 = connected_components(img2)
    assert n2 == 2
    _, n0 = connected_components(np.zeros((3, 3), dtype=np.int32))
    assert n0 == 0


def test_polygonize_components_on_synth(synth, spark, sf_dir):
    from terrakit_spark.operators.polygonize import polygonize_components

    df = polygonize_components(spark, sf_dir).cache()
    rows = df.count()
    assert rows > 0
    bad = df.filter("label_class <= 0 OR n_px <= 0 OR px_xmax < px_xmin OR px_ymax < px_ymin").count()
    assert bad == 0
    # F1 value filter
    only2 = polygonize_components(spark, sf_dir, label_value=2)
    assert only2.filter("label_class <> 2").count() == 0


def test_pipeline_impute_transform(synth, spark, sf_dir):
    import numpy as np

    from terrakit_spark.pipeline import chip_pipeline

    chips = chip_pipeline(spark, sf_dir, scene_pred="(scene_id % 25) = 15", transforms=["impute_nans"])
    row = chips.select("data", "bands", "chip_w", "chip_h").first()
    cube = np.frombuffer(row.data, dtype=np.float32)
    assert not (cube == -9999.0).any()


def _shoelace2(ring):
    s = 0
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        s += x1 * y2 - x2 * y1
    return s


def test_ring_tracing_invariants_random_masks():
    """trace_rings must agree with the vectorized boundary_stats on any
    mask: total vertices, total edge length, and net signed area == n_px
    (exterior rings minus holes)."""
    import numpy as np

    from terrakit_spark.operators.polygonize import boundary_stats, connected_components, trace_rings

    rng = np.random.RandomState(7)
    for _ in range(200):
        h, w = rng.randint(1, 12), rng.randint(1, 12)
        img = (rng.rand(h, w) < 0.55).astype(np.int32)
        comp, n = connected_components(img)
        for cid in range(1, n + 1):
            m = comp == cid
            perim, nv = boundary_stats(m)
            rings = trace_rings(m)
            assert sum(len(r) for r in rings) == nv
            assert abs(sum(_shoelace2(r) for r in rings)) == 2 * int(m.sum())
            tot = 0
            for r in rings:
                for i in range(len(r)):
                    x1, y1 = r[i]
                    x2, y2 = r[(i + 1) % len(r)]
                    tot += abs(x1 - x2) + abs(y1 - y2)
            assert tot == perim


def test_polygonize_rings_on_synth(synth, spark, sf_dir):
    """Rings emitted by the distributed op satisfy the same invariants
    row-by-row (vertex count column == sum of ring lengths, net area ==
    n_px)."""
    from terrakit_spark.operators.polygonize import polygonize_components

    df = polygonize_components(spark, sf_dir, with_rings=True)
    for row in df.collect():
        rings = [[(v[0], v[1]) for v in ring] for ring in row.rings]
        assert sum(len(r) for r in rings) == row.n_vertices
        assert abs(sum(_shoelace2(r) for r in rings)) == 2 * row.n_px
