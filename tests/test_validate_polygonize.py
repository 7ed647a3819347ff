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
