"""Exact chip-file inventory parity — mirrors the reference's strictest
test (/root/reference/tests/component_tests/chip/test_chip_and_label.py:
17-118): for a (256*num_x) x (256*num_y) raster, exactly num_x*num_y
windows indexed x-major, file names `{stem}_{i}.data.tif` /
`{stem}_{i}.label.tif`, and the 10x10 sub-sample_dim raster yielding ONE
window at the clamped negative start."""

from __future__ import annotations

from terrakit_spark.pipeline import _windows
from terrakit_spark.synth import CHIP


def _names(scene_id: int, wins):
    out = []
    for i, _, _ in wins:
        out.append(f"{scene_id}_{i}.data.tif")
    for i, _, _ in wins:
        out.append(f"{scene_id}_{i}.label.tif")
    return out


def test_exact_inventory_512x768():
    wins = _windows(512, 768)
    # 2 x 3 grid, x-major: (0,0),(0,256),(0,512),(256,0),(256,256),(256,512)
    assert [(x, y) for _, x, y in wins] == [
        (0, 0), (0, 256), (0, 512), (256, 0), (256, 256), (256, 512),
    ]
    names = _names(7, wins)
    assert names[:3] == ["7_0.data.tif", "7_1.data.tif", "7_2.data.tif"]
    assert len(names) == 6 * 2  # num_x*num_y*2 files (reference: +3 aux files)


def test_exact_inventory_700x300():
    wins = _windows(700, 300)
    assert [(x, y) for _, x, y in wins] == [
        (0, 0), (0, 44), (256, 0), (256, 44), (444, 0), (444, 44),
    ]


def test_exact_inventory_10x10_single_clamped():
    wins = _windows(10, 10)
    assert wins == [(0, 10 - CHIP, 10 - CHIP)]  # one window at (-246, -246)


def test_store_naming_matches_windows(synth, spark, sf_dir):
    from terrakit_spark.registry import QUERIES

    pkg = QUERIES["dataset_package"](spark, sf_dir)
    row = pkg.filter("win_index = 0").first()
    assert row.file_path == f"{row.scene_id}_0.data.tif"
    assert row.label_file == f"{row.scene_id}_0.label.tif"
    # J4 pairing: label path derives from data path by suffix substitution
    assert row.file_path.replace(".data.", ".label.") == row.label_file
