"""WKB polygon exchange (S4) — the geometry-column serialization of the
reference's shapefile contract
(/root/reference/terrakit/download/download_data.py:185-217: label layers
travel as polygon geometry + datetime + class attributes).

No GDAL/shapely in the container, so the engine reads/writes the PUBLIC
well-known-binary layout directly (OGC 06-103r4): little-endian byte order
(01), geometry type 3 (Polygon), ring count, per-ring point count with a
closing point, IEEE-754 doubles. Arrow-batched pandas UDFs; numpy does the
per-vertex packing (no per-coordinate Python)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("binary")
def wkb_encode_polygon(verts: pd.Series) -> pd.Series:
    """flat [x0, y0, x1, y1, ...] -> single-ring WKB Polygon (ring closed
    by repeating the first vertex)."""
    out = []
    for v in verts:
        arr = np.asarray(v, dtype=np.float64).reshape(-1, 2)
        ring = np.vstack([arr, arr[:1]])
        out.append(
            struct.pack("<BII I", 1, 3, 1, len(ring)) + ring.astype("<f8").tobytes()
        )
    return pd.Series(out)


@pandas_udf("array<double>")
def wkb_decode_polygon(wkb: pd.Series) -> pd.Series:
    """WKB Polygon -> flat exterior-ring vertex list (closing point
    dropped). Validates byte order, geometry type, and ring closure."""
    out = []
    for buf in wkb:
        order, gtype, nrings = struct.unpack_from("<BII", buf, 0)
        if order != 1 or gtype != 3 or nrings < 1:
            raise ValueError(f"not a little-endian WKB polygon: {order=} {gtype=} {nrings=}")
        (npts,) = struct.unpack_from("<I", buf, 9)
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=13).reshape(-1, 2)
        if not (ring[0] == ring[-1]).all():
            raise ValueError("unclosed WKB ring")
        out.append([float(x) for x in ring[:-1].ravel()])
    return pd.Series(out)
