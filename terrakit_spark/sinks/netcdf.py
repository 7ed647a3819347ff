"""NetCDF sink/scan (K4/S8) — pure-struct NetCDF-3 classic encoder/decoder,
no netCDF4/xarray required.

The reference writes per-date rasters to NetCDF via xarray
(/root/reference/terrakit/download/data_connectors/climate_data_store.py)
and reads NetCDF scenes back (S8). This module implements the PUBLIC
NetCDF classic format (CDF-1, NetCDF User Guide appendix B): big-endian
header with dimension/attribute/variable lists, fixed-size data section —
enough for (band, y, x) float32 grids with coordinate variables and
CF-style attributes. The distributed sink writes one .nc per scene from
executor tasks (foreachPartition, no driver collect)."""

from __future__ import annotations

import os
import struct

import numpy as np

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_NC_CHAR, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 2, 4, 5, 6
_SIZES = {_NC_CHAR: 1, _NC_INT: 4, _NC_FLOAT: 4, _NC_DOUBLE: 8}
_DTYPES = {_NC_INT: ">i4", _NC_FLOAT: ">f4", _NC_DOUBLE: ">f8"}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _attr_value(v) -> tuple[int, int, bytes]:
    """-> (nc_type, nelems, padded payload)"""
    if isinstance(v, str):
        raw = v.encode()
        return _NC_CHAR, len(raw), _pad4(raw)
    if isinstance(v, float):
        return _NC_DOUBLE, 1, struct.pack(">d", v)
    if isinstance(v, int):
        return _NC_INT, 1, struct.pack(">i", v)
    if isinstance(v, np.floating):
        return _NC_FLOAT, 1, struct.pack(">f", float(v))
    raise ValueError(f"unsupported attribute type: {type(v)}")


def _attr_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        t, n, payload = _attr_value(v)
        out += _name(k) + struct.pack(">II", t, n) + payload
    return out


def netcdf_bytes(
    cube: np.ndarray,
    lats: np.ndarray,
    lons: np.ndarray,
    var_name: str = "data",
    global_attrs: dict | None = None,
    var_attrs: dict | None = None,
) -> bytes:
    """Encode a (band, y, x) float32 cube + coordinate vectors as NetCDF-3
    classic bytes (dims band/lat/lon; vars lat, lon, <var_name>)."""
    if cube.ndim == 2:
        cube = cube[None]
    nb, h, w = cube.shape
    assert len(lats) == h and len(lons) == w
    dims = [("band", nb), ("lat", h), ("lon", w)]
    # variables: (name, nc_type, dimids, attrs, data_bytes)
    variables = [
        ("lat", _NC_DOUBLE, [1], {"units": "degrees_north"}, np.asarray(lats, ">f8").tobytes()),
        ("lon", _NC_DOUBLE, [2], {"units": "degrees_east"}, np.asarray(lons, ">f8").tobytes()),
        (
            var_name,
            _NC_FLOAT,
            [0, 1, 2],
            dict(var_attrs or {}),
            np.ascontiguousarray(cube, ">f4").tobytes(),
        ),
    ]

    header = b"CDF\x01" + struct.pack(">I", 0)  # numrecs = 0 (no record dim)
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for dname, dlen in dims:
        header += _name(dname) + struct.pack(">I", dlen)
    header += _attr_list(global_attrs or {})

    # variable list needs data offsets: compute header size with placeholder
    def var_list(begin_by_name: dict[str, int]) -> bytes:
        out = struct.pack(">II", _NC_VARIABLE, len(variables))
        for vname, vtype, dimids, vattrs, data in variables:
            vsize = len(_pad4(data))
            out += _name(vname) + struct.pack(">I", len(dimids))
            out += struct.pack(">" + "I" * len(dimids), *dimids)
            out += _attr_list(vattrs)
            out += struct.pack(">III", vtype, vsize, begin_by_name.get(vname, 0))
        return out

    probe = header + var_list({})
    off = len(probe)
    begins = {}
    for vname, _, _, _, data in variables:
        begins[vname] = off
        off += len(_pad4(data))
    body = b"".join(_pad4(data) for _, _, _, _, data in variables)
    return header + var_list(begins) + body


def parse_netcdf(buf: bytes) -> dict:
    """Decode what netcdf_bytes emits (classic CDF-1, no record dim)."""
    assert buf[:4] == b"CDF\x01", "not NetCDF classic"
    pos = 8

    def u32() -> int:
        nonlocal pos
        (v,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        return v

    def name() -> str:
        nonlocal pos
        n = u32()
        s = buf[pos : pos + n].decode()
        pos += n + (-n % 4)
        return s

    def attrs() -> dict:
        nonlocal pos
        tag, cnt = u32(), u32()
        out = {}
        for _ in range(cnt):
            k = name()
            t, n = u32(), u32()
            size = _SIZES[t] * n
            raw = buf[pos : pos + size]
            pos += size + (-size % 4)
            if t == _NC_CHAR:
                out[k] = raw.decode()
            else:
                out[k] = np.frombuffer(raw, _DTYPES[t]).tolist()
                if n == 1:
                    out[k] = out[k][0]
        return out

    tag, ndims = u32(), u32()
    dims = [(name(), u32()) for _ in range(ndims)]
    gattrs = attrs()
    tag, nvars = u32(), u32()
    out_vars = {}
    for _ in range(nvars):
        vname = name()
        nd = u32()
        dimids = [u32() for _ in range(nd)]
        vattrs = attrs()
        vtype, vsize, begin = u32(), u32(), u32()
        shape = tuple(dims[i][1] for i in dimids)
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, _DTYPES[vtype], count=count, offset=begin).reshape(shape)
        out_vars[vname] = {"data": arr, "attrs": vattrs, "dims": [dims[i][0] for i in dimids]}
    return {"dims": dict(dims), "attrs": gattrs, "vars": out_vars}


def write_scene_ncs(scenes_with_pixels, out_dir: str) -> None:
    """Distributed K4 sink: one CF-attributed {scene_id}.nc per scene row
    (scene rows carry pixels via sources.raster.with_pixels)."""
    from terrakit_spark.synth import NODATA, RES

    def _write(rows) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            nb, h, w = int(r.bands), int(r.height), int(r.width)
            cube = np.frombuffer(r.pixels, dtype=np.float32).reshape(nb, h, w)
            lats = float(r.ymax) - (np.arange(h) + 0.5) * RES
            lons = float(r.xmin) + (np.arange(w) + 0.5) * RES
            buf = netcdf_bytes(
                cube, lats, lons, "data",
                global_attrs={"title": f"scene {r.scene_id}", "Conventions": "CF-1.6"},
                var_attrs={"_FillValue": np.float32(NODATA), "grid_mapping_epsg": 4326},
            )
            with open(os.path.join(out_dir, f"{r.scene_id}.nc"), "wb") as fh:
                fh.write(buf)

    scenes_with_pixels.foreachPartition(_write)


def read_scene_ncs(spark, nc_dir: str):
    """S8 scan: parallel parse of a .nc directory back to scene rows
    (scene_id, bands, height, width, xmin, ymax, pixels) via binaryFile
    source + mapInPandas — the read path stays distributed and the decoder
    is the same public-format parser used for verification."""
    import pandas as pd

    from terrakit_spark.synth import RES

    files = spark.read.format("binaryFile").load(os.path.join(nc_dir, "*.nc"))

    def dec(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                p = parse_netcdf(bytes(content))
                cube = p["vars"]["data"]["data"]
                lats, lons = p["vars"]["lat"]["data"], p["vars"]["lon"]["data"]
                sid = int(os.path.basename(path).split(".")[0])
                rows.append(
                    (
                        sid, cube.shape[0], cube.shape[1], cube.shape[2],
                        float(lons[0] - 0.5 * RES), float(lats[0] + 0.5 * RES),
                        np.ascontiguousarray(cube, "<f4").tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["scene_id", "bands", "height", "width", "xmin", "ymax", "pixels"]
            )

    return files.mapInPandas(
        dec, schema="scene_id long, bands int, height int, width int, xmin double, ymax double, pixels binary"
    )
