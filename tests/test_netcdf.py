"""K4/S8 NetCDF classic sink + scan: byte-level roundtrip and the
distributed write -> distributed read -> pixel-exact parity loop."""

from __future__ import annotations

import numpy as np

from terrakit_spark.sinks.netcdf import netcdf_bytes, parse_netcdf, read_scene_ncs, write_scene_ncs


def test_netcdf_roundtrip():
    rng = np.random.RandomState(11)
    cube = (rng.rand(2, 5, 9) * 100).astype(np.float32)
    lats = 13.0 - np.arange(5) * 0.1
    lons = 9.0 + np.arange(9) * 0.1
    buf = netcdf_bytes(
        cube, lats, lons, "data",
        global_attrs={"title": "t", "Conventions": "CF-1.6"},
        var_attrs={"_FillValue": np.float32(-9999), "grid_mapping_epsg": 4326},
    )
    assert buf[:4] == b"CDF\x01"
    p = parse_netcdf(buf)
    assert p["dims"] == {"band": 2, "lat": 5, "lon": 9}
    assert p["attrs"]["Conventions"] == "CF-1.6"
    assert np.array_equal(p["vars"]["data"]["data"], cube)
    assert np.allclose(p["vars"]["lat"]["data"], lats)
    assert np.allclose(p["vars"]["lon"]["data"], lons)
    assert p["vars"]["data"]["attrs"]["_FillValue"] == -9999
    assert p["vars"]["data"]["dims"] == ["band", "lat", "lon"]


def test_scene_nc_distributed_roundtrip(synth, spark, sf_dir, tmp_path):
    from terrakit_spark.sources.raster import with_pixels

    out = str(tmp_path / "ncs")
    scenes = spark.sql("SELECT * FROM scenes WHERE (scene_id % 25) = 20")
    write_scene_ncs(with_pixels(scenes), out)
    back = read_scene_ncs(spark, out)
    orig = {r.scene_id: r for r in with_pixels(scenes).collect()}
    got = {r.scene_id: r for r in back.collect()}
    assert set(got) == set(orig) and got
    for sid, r in got.items():
        o = orig[sid]
        assert (r.bands, r.height, r.width) == (o.bands, o.height, o.width)
        assert r.pixels == o.pixels  # float32 bytes identical
        assert abs(r.xmin - o.xmin) < 1e-9 and abs(r.ymax - o.ymax) < 1e-9


def test_netcdf_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(nb=st.integers(1, 4), h=st.integers(1, 30), w=st.integers(1, 30), seed=st.integers(0, 2**31 - 1))
    def check(nb, h, w, seed):
        rng = np.random.RandomState(seed)
        cube = ((rng.rand(nb, h, w) - 0.5) * 1e5).astype(np.float32)
        lats = 90.0 - np.arange(h) * 0.25
        lons = -180.0 + np.arange(w) * 0.25
        p = parse_netcdf(netcdf_bytes(cube, lats, lons, "data", global_attrs={"t": "x"}))
        assert np.array_equal(p["vars"]["data"]["data"], cube)
        assert np.allclose(p["vars"]["lat"]["data"], lats)
        assert p["dims"] == {"band": nb, "lat": h, "lon": w}

    check()
