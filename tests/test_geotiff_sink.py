"""K2/K3 GeoTIFF sink: pure-struct encoder roundtrip + the distributed
foreachPartition chip writer (no rasterio in the container; the reader
implements the same public TIFF 6.0 / GeoTIFF 1.0 layout to verify)."""

from __future__ import annotations

import glob
import os

import numpy as np

from terrakit_spark.sinks.geotiff import chips_with_geo, geotiff_bytes, parse_geotiff, write_chip_tifs


def test_geotiff_roundtrip_multiband():
    rng = np.random.RandomState(3)
    cube = (rng.rand(3, 7, 11) * 1000).astype(np.float32)
    buf = geotiff_bytes(cube, 9.25, 13.5, 0.0078125, ["RED", "GREEN", "BLUE"], nodata=-9999)
    p = parse_geotiff(buf)
    assert (p["width"], p["height"], p["bands"]) == (11, 7, 3)
    assert np.array_equal(p["cube"], cube)
    assert (p["xmin"], p["ymax"], p["res"]) == (9.25, 13.5, 0.0078125)
    assert p["nodata"] == -9999
    assert "RED" in p["gdal_metadata"] and 'sample="2"' in p["gdal_metadata"]
    # GeoKeyDirectory: version header + GTModelType=geographic + EPSG 4326
    assert p["geokeys"][:4] == [1, 1, 0, 3] and 4326 in p["geokeys"]


def test_geotiff_int32_label():
    lab = (np.arange(35, dtype=np.int32) % 4).reshape(5, 7)
    p = parse_geotiff(geotiff_bytes(lab, 0.0, 0.0, 1.0, ["LABEL"]))
    assert p["cube"].dtype == np.int32
    assert np.array_equal(p["cube"][0], lab)


def test_write_chip_tifs_distributed(synth, spark, sf_dir, tmp_path):
    from terrakit_spark.pipeline import chip_pipeline
    from terrakit_spark.synth import RES

    out = str(tmp_path / "tifs")
    chips = chip_pipeline(spark, sf_dir, scene_pred="(scene_id % 25) = 20")
    scenes = spark.table("scenes")
    geo = chips_with_geo(chips, scenes)
    write_chip_tifs(geo, out)
    files = sorted(glob.glob(os.path.join(out, "*.data.tif")))
    assert files, "no tifs written"
    # verify one chip against its source row
    row = geo.select(
        "scene_id", "win_index", "bands", "chip_w", "chip_h", "data", "label", "chip_xmin", "chip_ymax"
    ).first()
    p = parse_geotiff(open(os.path.join(out, f"{row.scene_id}_{row.win_index}.data.tif"), "rb").read())
    cube = np.frombuffer(row.data, dtype=np.float32).reshape(row.bands, row.chip_h, row.chip_w)
    assert np.array_equal(p["cube"], cube)
    assert p["xmin"] == row.chip_xmin and p["ymax"] == row.chip_ymax and p["res"] == RES
    lp = parse_geotiff(open(os.path.join(out, f"{row.scene_id}_{row.win_index}.label.tif"), "rb").read())
    assert np.array_equal(lp["cube"][0], np.frombuffer(row.label, dtype=np.int32).reshape(row.chip_h, row.chip_w))


def test_geotiff_roundtrip_property():
    """Arbitrary shapes/band counts/values (incl. negatives and extremes)
    survive encode->decode bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        nb=st.integers(1, 5),
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        xmin=st.floats(-180, 180, allow_nan=False),
        ymax=st.floats(-90, 90, allow_nan=False),
    )
    def check(nb, h, w, seed, xmin, ymax):
        rng = np.random.RandomState(seed)
        cube = ((rng.rand(nb, h, w) - 0.5) * 2e6).astype(np.float32)
        p = parse_geotiff(geotiff_bytes(cube, xmin, ymax, 0.0078125, nodata=-9999))
        assert np.array_equal(p["cube"], cube)
        assert p["xmin"] == xmin and p["ymax"] == ymax

    check()
