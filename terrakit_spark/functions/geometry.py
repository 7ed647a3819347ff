"""Vectorized geometry kernels (Arrow pandas UDFs, numpy inside).

- point_in_polygon: even-odd ray-cast, the exact test the reference gets
  from rasterio.features.rasterize's point sampling
  (/root/reference/terrakit/download/download_data.py:371-394). Vectorized
  across the batch AND across polygon edges; handles ragged vertex lists by
  padding with the last vertex (degenerate padded edges contribute nothing
  to the crossing count).
- rasterize_polygons: burn a list of (polygon, class) onto a pixel grid in
  geometry-sequence order — later shapes overwrite earlier ones, matching
  rasterio's default burn order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _pad_vertices(verts: pd.Series) -> np.ndarray:
    """Ragged list<double> [x0,y0,x1,y1,...] -> (n, max_nv, 2) float64,
    padded by repeating the last vertex."""
    arrs = [np.asarray(v, dtype=np.float64).reshape(-1, 2) for v in verts]
    max_nv = max((a.shape[0] for a in arrs), default=0)
    out = np.empty((len(arrs), max_nv, 2), dtype=np.float64)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
        if a.shape[0] < max_nv:
            out[i, a.shape[0] :] = a[-1]
    return out


def ray_cast(px: np.ndarray, py: np.ndarray, polys: np.ndarray) -> np.ndarray:
    """Even-odd ray cast. px, py: (n,); polys: (n, m, 2). Returns (n,) bool.
    Fully vectorized: loops only over the m polygon edges (m is small —
    quads here), never over the n rows."""
    n, m, _ = polys.shape
    inside = np.zeros(n, dtype=bool)
    xj = polys[:, m - 1, 0]
    yj = polys[:, m - 1, 1]
    for i in range(m):
        xi = polys[:, i, 0]
        yi = polys[:, i, 1]
        cond = (yi > py) != (yj > py)
        # division-free crossing test: px < (xj-xi)(py-yi)/(yj-yi) + xi
        # <=> sign-adjusted cross-multiplication (cond already excludes
        # yj == yi). ~2.5x faster than the divide + where form on the
        # hotspot burn path. Strict comparison in BOTH edge directions so a
        # point exactly on the edge line (lhs == rhs) never counts as a
        # crossing, matching the divide form's strict `px < xcross`.
        dy = yj - yi
        lhs = (px - xi) * dy
        rhs = (xj - xi) * (py - yi)
        inside ^= cond & (((lhs < rhs) & (dy > 0)) | ((lhs > rhs) & (dy < 0)))
        xj, yj = xi, yi
    return inside


def pip_expr(px: str, py: str, verts: str):
    """Even-odd ray-cast PIP as a PURE Spark SQL expression (higher-order
    aggregate over polygon edges) — whole-stage codegen, zero Python, no
    Arrow transfer. Semantically identical to the numpy ray_cast below:
    for edge i with predecessor j: crossing iff (yi>py) != (yj>py) and
    px < (xj-xi)*(py-yi)/(yj-yi)+xi; division guarded by CASE (the crossing
    condition is false whenever yj == yi).

    verts is a flat array<double> [x0,y0,x1,y1,...]."""
    from pyspark.sql import functions as F

    n = f"(size({verts}) div 2)"
    xi = f"{verts}[2*i]"
    yi = f"{verts}[2*i+1]"
    xj = f"{verts}[2*pmod(i - 1, {n})]"
    yj = f"{verts}[2*pmod(i - 1, {n}) + 1]"
    crossing = (
        f"CASE WHEN ({yi} > {py}) != ({yj} > {py}) "
        f"THEN {px} < ({xj} - {xi}) * ({py} - {yi}) / ({yj} - {yi}) + {xi} "
        f"ELSE false END"
    )
    return F.expr(
        f"aggregate(sequence(0, {n} - 1), false, (acc, i) -> acc != ({crossing}))"
    )


def _ray_cast_chunked(px: np.ndarray, py: np.ndarray, polys: np.ndarray) -> np.ndarray:
    """ray_cast over cache-resident slices — same DRAM story as the clip
    kernels (each edge pass streams ~8 (B,) temporaries): measured 2.5x at
    multi-million-row batches, bit-identical (pure batch split)."""
    n = len(px)
    if n <= _KERNEL_CHUNK:
        return ray_cast(px, py, polys)
    out = np.empty(n, dtype=bool)
    for i in range(0, n, _KERNEL_CHUNK):
        j = min(i + _KERNEL_CHUNK, n)
        out[i:j] = ray_cast(px[i:j], py[i:j], polys[i:j])
    return out


def _pip_fn(px: pd.Series, py: pd.Series, verts: pd.Series) -> pd.Series:
    if len(px) == 0:
        return pd.Series([], dtype=bool)
    arr = verts.to_numpy()
    try:
        # fast path: uniform vertex counts in the batch -> one bulk convert
        polys = np.asarray(arr.tolist(), dtype=np.float64).reshape(len(arr), -1, 2)
    except ValueError:
        polys = _pad_vertices(verts)
    return pd.Series(
        _ray_cast_chunked(px.to_numpy(np.float64), py.to_numpy(np.float64), polys)
    )


_pip_udf = None


def point_in_polygon(px, py, verts):
    """Column expression: ray-cast PIP as an Arrow pandas UDF (lazily built —
    pandas_udf needs an active SparkSession to parse its return type)."""
    global _pip_udf
    if _pip_udf is None:
        _pip_udf = pandas_udf(_pip_fn, "boolean")
    return _pip_udf(px, py, verts)


def point_in_polygon_bcast(spark, keys: np.ndarray, polys: np.ndarray, key_col, px, py):
    """Ray-cast PIP with the polygon GEOMETRY broadcast instead of shipped
    per candidate row: the Arrow transfer carries (px, py, key) — three
    scalars — and the UDF resolves key -> padded vertex row with one
    vectorized searchsorted into the broadcast cube. Kills both the
    JVM-side Arrow serialization of the nested vertex array (the measured
    dominant cost of the refine at sf1) AND the vertex bytes in the
    exploded polygon side's shuffle. The dimension must be driver-sized
    (N_polys x max_nv x 2 float64 — ~21 MB at sf1's 330k polygons);
    callers gate on a size probe, the column path remains the default.

    keys MUST be sorted ascending (asserted); every key_col value must be
    present (joined candidates came from this very polygon table)."""
    assert len(keys) == 0 or bool(np.all(np.diff(keys) > 0))
    b = spark.sparkContext.broadcast((keys, polys))

    def f(k: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        if len(k) == 0:
            return pd.Series([], dtype=bool)
        bk, bp = b.value
        idx = np.searchsorted(bk, k.to_numpy(np.int64))
        return pd.Series(
            _ray_cast_chunked(
                x.to_numpy(np.float64), y.to_numpy(np.float64), bp[idx]
            )
        )

    return pandas_udf(f, "boolean")(key_col, px, py)


# ------------------------------------------------------- convex SAT overlap
def sat_depth(va: np.ndarray, vb: np.ndarray) -> np.ndarray:
    """Signed separation depth for convex polygon pairs (separating-axis
    theorem). va: (n, m, 2); vb: (n, k, 2). Returns (n,) float64: the
    minimum, over every edge-normal axis of BOTH polygons, of the projected
    interval overlap — positive iff the interiors intersect (for convex
    polytopes the Minkowski-difference facet normals are a subset of the
    two polygons' edge normals, so strict SAT over those axes is exact),
    zero at tangency, negative when separated.

    Axes are UNNORMALIZED edge normals (perp of the edge vector), so the
    depth is in axis-scaled units, not metres — callers threshold it, they
    don't interpret it. Padded duplicate vertices (ragged batches) produce
    zero-length edges whose (0,0) normal is masked to +inf so it never
    decides the min.

    Loops run over the SMALL dims (axes x vertices, (m+k)^2 passes) and
    stream (n,) arrays, ray_cast-style: the einsum form that materializes
    (n, m+k, max(m,k)) projection tensors allocates GBs per million-row
    batch and ran 6-20x slower (DRAM-bound) with bit-identical output."""
    best = np.full(va.shape[0], np.inf)
    for P, Q in ((va, vb), (vb, va)):
        m = P.shape[1]
        for i in range(m):
            x0, y0 = P[:, i, 0], P[:, i, 1]
            x1, y1 = P[:, (i + 1) % m, 0], P[:, (i + 1) % m, 1]
            axx, axy = y0 - y1, x1 - x0  # normal (-e_y, e_x) of edge i->i+1
            pmin = pmax = qmin = qmax = None
            for j in range(m):
                pr = P[:, j, 0] * axx + P[:, j, 1] * axy
                pmin = pr if pmin is None else np.minimum(pmin, pr)
                pmax = pr if pmax is None else np.maximum(pmax, pr)
            for j in range(Q.shape[1]):
                qr = Q[:, j, 0] * axx + Q[:, j, 1] * axy
                qmin = qr if qmin is None else np.minimum(qmin, qr)
                qmax = qr if qmax is None else np.maximum(qmax, qr)
            gap = np.minimum(pmax - qmin, qmax - pmin)
            dead = (axx == 0.0) & (axy == 0.0)
            best = np.minimum(best, np.where(dead, np.inf, gap))
    return best


def _verts_batch(verts: pd.Series) -> np.ndarray:
    arr = verts.to_numpy()
    try:
        return np.asarray(arr.tolist(), dtype=np.float64).reshape(len(arr), -1, 2)
    except ValueError:
        return _pad_vertices(verts)


def _overlap_fn(va: pd.Series, vb: pd.Series) -> pd.Series:
    if len(va) == 0:
        return pd.Series([], dtype=np.float64)
    return pd.Series(sat_depth(_verts_batch(va), _verts_batch(vb)))


_overlap_udf = None


def convex_overlap_depth(verts_a, verts_b):
    """Column expression: SAT separation depth as an Arrow pandas UDF."""
    global _overlap_udf
    if _overlap_udf is None:
        _overlap_udf = pandas_udf(_overlap_fn, "double")
    return _overlap_udf(verts_a, verts_b)


def convex_overlap_depth_bcast(spark, keys_a: np.ndarray, cube_a: np.ndarray,
                               keys_b: np.ndarray, cube_b: np.ndarray,
                               key_a_col, key_b_col):
    """SAT separation depth with BOTH polygon layers' geometry broadcast
    (the point_in_polygon_bcast pattern, doubled): the Arrow transfer per
    candidate pair is two int64 keys instead of two nested vertex arrays;
    each side resolves via one vectorized searchsorted. The SAT kernel runs
    over cache-resident slices (it streams ~6 (B,) temporaries per axis
    pass — same DRAM story as the clip kernels). keys must be sorted
    ascending; driver-sized layers only — callers gate on a size probe."""
    assert len(keys_a) == 0 or bool(np.all(np.diff(keys_a) > 0))
    assert len(keys_b) == 0 or bool(np.all(np.diff(keys_b) > 0))
    b = spark.sparkContext.broadcast((keys_a, cube_a, keys_b, cube_b))

    def f(ka: pd.Series, kb: pd.Series) -> pd.Series:
        n = len(ka)
        if n == 0:
            return pd.Series([], dtype=np.float64)
        bka, bca, bkb, bcb = b.value
        ia = np.searchsorted(bka, ka.to_numpy(np.int64))
        ib = np.searchsorted(bkb, kb.to_numpy(np.int64))
        if n <= _KERNEL_CHUNK:
            return pd.Series(sat_depth(bca[ia], bcb[ib]))
        out = np.empty(n, dtype=np.float64)
        for i in range(0, n, _KERNEL_CHUNK):
            j = min(i + _KERNEL_CHUNK, n)
            out[i:j] = sat_depth(bca[ia[i:j]], bcb[ib[i:j]])
        return pd.Series(out)

    return pandas_udf(f, "double")(key_a_col, key_b_col)


# ------------------------------------------- convex intersection area (S-H)
def _clip_step(
    curx: np.ndarray,
    cury: np.ndarray,
    k: np.ndarray,
    dist: np.ndarray,
    alive: np.ndarray,
    pos: np.ndarray,
    L: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One Sutherland-Hodgman half-plane pass over the whole batch, given the
    per-vertex signed distances (>= 0 inside). Per-position emit masks (the
    crossing intersection point, then the inside endpoint), then a
    cumsum-scatter compaction (put_along_axis into a dump-slot-padded buffer)
    packs each row's emitted points back into sequence order. Returns
    (newx, newy, new_k) buffers of width L."""
    B = curx.shape[0]
    inside = dist >= 0.0
    kk = np.maximum(k, 1)[:, None]
    nxt_idx = (pos + 1) % kk
    nxtx = np.take_along_axis(curx, nxt_idx, axis=1)
    nxty = np.take_along_axis(cury, nxt_idx, axis=1)
    d_n = np.take_along_axis(dist, nxt_idx, axis=1)
    in_n = np.take_along_axis(inside, nxt_idx, axis=1)
    valid = (pos < k[:, None]) & alive[:, None]
    cross = (inside != in_n) & valid
    denom = dist - d_n
    t = np.divide(dist, denom, out=np.zeros_like(dist), where=denom != 0.0)
    iptx = curx + t * (nxtx - curx)
    ipty = cury + t * (nxty - cury)
    keep_n = in_n & valid
    # emit order per position: [intersection, next-if-inside]
    mask = np.empty((B, 2 * L), dtype=bool)
    mask[:, 0::2] = cross
    mask[:, 1::2] = keep_n
    emx = np.empty((B, 2 * L), dtype=np.float64)
    emy = np.empty((B, 2 * L), dtype=np.float64)
    emx[:, 0::2] = iptx
    emx[:, 1::2] = nxtx
    emy[:, 0::2] = ipty
    emy[:, 1::2] = nxty
    dest = np.cumsum(mask, axis=1) - 1
    dest = np.where(mask, np.minimum(dest, L - 1), L)  # unemitted -> dump slot
    newx = np.zeros((B, L + 1), dtype=np.float64)
    newy = np.zeros((B, L + 1), dtype=np.float64)
    np.put_along_axis(newx, dest, emx, axis=1)
    np.put_along_axis(newy, dest, emy, axis=1)
    return newx[:, :L], newy[:, :L], mask.sum(axis=1)


def _shoelace(curx: np.ndarray, cury: np.ndarray, k: np.ndarray, pos: np.ndarray) -> np.ndarray:
    kk = np.maximum(k, 1)[:, None]
    nxt_idx = (pos + 1) % kk
    nxtx = np.take_along_axis(curx, nxt_idx, axis=1)
    nxty = np.take_along_axis(cury, nxt_idx, axis=1)
    contrib = np.where(pos < k[:, None], curx * nxty - nxtx * cury, 0.0)
    area = 0.5 * np.abs(contrib.sum(axis=1))
    return np.where(k >= 3, area, 0.0)


def clip_area(subject: np.ndarray, ns: np.ndarray, clipper: np.ndarray, nc: np.ndarray) -> np.ndarray:
    """Exact intersection area of convex polygon pairs via Sutherland-
    Hodgman clipping, vectorized across the batch. subject: (B, Ls, 2) with
    per-row valid vertex counts ns; clipper: (B, Lc, 2) CCW with counts nc.
    Returns (B,) float64 areas (0 when disjoint or degenerate).

    The clip loop runs over the clipper's Lc half-planes (small); within
    each, every batch row advances together: per-position emit masks (the
    crossing intersection point, then the inside endpoint), then a
    cumsum-scatter compaction (put_along_axis into a dump-slot-padded
    buffer — 2x faster than the stable-argsort form it replaced, same
    output bit-for-bit) packs each row's emitted points back into sequence
    order. Clipping a convex n-gon by m half-planes yields <= n + m
    vertices, so one (B, Ls + Lc) buffer fits every intermediate; x and y
    live in separate planar arrays to keep every op a contiguous stream."""
    B, Ls, _ = subject.shape
    Lc = clipper.shape[1]
    L = Ls + Lc
    curx = np.zeros((B, L), dtype=np.float64)
    cury = np.zeros((B, L), dtype=np.float64)
    curx[:, :Ls] = subject[..., 0]
    cury[:, :Ls] = subject[..., 1]
    k = ns.astype(np.int64).copy()
    pos = np.arange(L)[None, :]
    bidx = np.arange(B)
    for e in range(Lc):
        alive = (k >= 3) & (e < nc)
        if not alive.any():
            break
        a = clipper[:, e]
        b = clipper[bidx, (e + 1) % np.maximum(nc, 1)]
        # half-plane: left of directed edge a->b (CCW clipper interior)
        ex, ey = (b - a)[:, 0:1], (b - a)[:, 1:2]
        dist = ex * (cury - a[:, 1:2]) - ey * (curx - a[:, 0:1])
        newx, newy, new_k = _clip_step(curx, cury, k, dist, alive, pos, L)
        curx[alive] = newx[alive]
        cury[alive] = newy[alive]
        k = np.where(alive, new_k, np.where(e < nc, 0, k))
    return _shoelace(curx, cury, k, pos)


def clip_area_rect(
    subject: np.ndarray,
    ns: np.ndarray,
    rx0: np.ndarray,
    ry0: np.ndarray,
    rx1: np.ndarray,
    ry1: np.ndarray,
) -> np.ndarray:
    """clip_area specialized to an AXIS-ALIGNED rectangle clipper per row —
    the tile-coverage hot path. Same Sutherland-Hodgman compaction, but each
    half-plane's signed distance is one subtraction (coordinate minus bound)
    instead of a cross product against gathered clipper vertices, and the
    caller ships 4 scalar columns over Arrow instead of an 8-double vertex
    array. subject: (B, Ls, 2) with valid counts ns; rects are (B,) bound
    arrays with rx0 <= rx1, ry0 <= ry1. Returns (B,) float64 areas."""
    B, Ls, _ = subject.shape
    L = Ls + 4
    curx = np.zeros((B, L), dtype=np.float64)
    cury = np.zeros((B, L), dtype=np.float64)
    curx[:, :Ls] = subject[..., 0]
    cury[:, :Ls] = subject[..., 1]
    k = ns.astype(np.int64).copy()
    pos = np.arange(L)[None, :]
    for e in range(4):
        alive = k >= 3
        if not alive.any():
            break
        if e == 0:
            dist = curx - rx0[:, None]
        elif e == 1:
            dist = rx1[:, None] - curx
        elif e == 2:
            dist = cury - ry0[:, None]
        else:
            dist = ry1[:, None] - cury
        newx, newy, new_k = _clip_step(curx, cury, k, dist, alive, pos, L)
        curx[alive] = newx[alive]
        cury[alive] = newy[alive]
        k = np.where(alive, new_k, 0)
    return _shoelace(curx, cury, k, pos)


def _counts_and_pad(verts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = verts.to_numpy()
    try:
        P = np.asarray(arr.tolist(), dtype=np.float64).reshape(len(arr), -1, 2)
        return P, np.full(len(arr), P.shape[1], dtype=np.int64)
    except ValueError:
        ns = np.array([len(v) // 2 for v in arr], dtype=np.int64)
        return _pad_vertices(verts), ns


# Cache-resident kernel tiles: the S-H clip allocates ~10 temporaries of
# (B, 2L) doubles per half-plane pass; at Arrow-batch B (10^5-10^6) those
# live in DRAM and the kernel runs memory-bound — measured 9.6x slower than
# the identical math on 16k-row slices (worse still with 32 workers sharing
# one socket's bandwidth). Chunking is a pure batch split: every op is
# row-independent, so outputs are bit-identical to the monolithic call.
_KERNEL_CHUNK = 16384


def _run_chunked(kernel, n: int, *arrays) -> np.ndarray:
    if n <= _KERNEL_CHUNK:
        return kernel(*arrays)
    out = np.empty(n, dtype=np.float64)
    for i in range(0, n, _KERNEL_CHUNK):
        j = min(i + _KERNEL_CHUNK, n)
        out[i:j] = kernel(*[a[i:j] for a in arrays])
    return out


def _area_fn(va: pd.Series, vb: pd.Series) -> pd.Series:
    if len(va) == 0:
        return pd.Series([], dtype=np.float64)
    A, na = _counts_and_pad(va)
    B_, nb = _counts_and_pad(vb)
    return pd.Series(_run_chunked(clip_area, len(va), A, na, B_, nb))


_area_udf = None


def convex_intersection_area(verts_a, verts_b):
    """Column expression: exact convex-pair intersection area (clip a by b).
    b must wind CCW; a may wind either way (shoelace abs)."""
    global _area_udf
    if _area_udf is None:
        _area_udf = pandas_udf(_area_fn, "double")
    return _area_udf(verts_a, verts_b)


def _rect_area_fn(
    va: pd.Series, x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series
) -> pd.Series:
    if len(va) == 0:
        return pd.Series([], dtype=np.float64)
    A, na = _counts_and_pad(va)
    return pd.Series(
        _run_chunked(
            clip_area_rect,
            len(va),
            A,
            na,
            x0.to_numpy(np.float64),
            y0.to_numpy(np.float64),
            x1.to_numpy(np.float64),
            y1.to_numpy(np.float64),
        )
    )


_rect_area_udf = None


def rect_intersection_area(verts, x0, y0, x1, y1):
    """Column expression: exact polygon x axis-aligned-rect intersection
    area (the specialized kernel + 4-scalar Arrow transfer)."""
    global _rect_area_udf
    if _rect_area_udf is None:
        _rect_area_udf = pandas_udf(_rect_area_fn, "double")
    return _rect_area_udf(verts, x0, y0, x1, y1)


def rect_intersection_area_bcast(spark, keys: np.ndarray, polys: np.ndarray,
                                 ns: np.ndarray, key_col, x0, y0, x1, y1):
    """rect_intersection_area with the polygon geometry broadcast (the
    point_in_polygon_bcast pattern): the Arrow transfer per pair is
    (key + 4 rect scalars) instead of the nested vertex array; geometry
    resolves via one vectorized searchsorted into the broadcast padded
    cube. keys must be sorted ascending; driver-sized dimensions only —
    callers gate on a size probe."""
    assert len(keys) == 0 or bool(np.all(np.diff(keys) > 0))
    b = spark.sparkContext.broadcast((keys, polys, ns))

    def f(k: pd.Series, rx0: pd.Series, ry0: pd.Series,
          rx1: pd.Series, ry1: pd.Series) -> pd.Series:
        if len(k) == 0:
            return pd.Series([], dtype=np.float64)
        bk, bp, bn = b.value
        idx = np.searchsorted(bk, k.to_numpy(np.int64))
        return pd.Series(
            _run_chunked(
                clip_area_rect,
                len(k),
                bp[idx],
                bn[idx],
                rx0.to_numpy(np.float64),
                ry0.to_numpy(np.float64),
                rx1.to_numpy(np.float64),
                ry1.to_numpy(np.float64),
            )
        )

    return pandas_udf(f, "double")(key_col, x0, y0, x1, y1)


def _poly_area_fn(va: pd.Series) -> pd.Series:
    if len(va) == 0:
        return pd.Series([], dtype=np.float64)
    A, na = _counts_and_pad(va)
    L = A.shape[1]
    curx = np.ascontiguousarray(A[..., 0])
    cury = np.ascontiguousarray(A[..., 1])
    return pd.Series(_shoelace(curx, cury, na, np.arange(L)[None, :]))


_poly_area_udf = None


def polygon_area(verts):
    """Column expression: a polygon's own (shoelace, abs) area — runs ONCE
    per polygon row, so callers can reuse it across candidate pairs (the
    fully-contained fast path skips the clip kernel entirely)."""
    global _poly_area_udf
    if _poly_area_udf is None:
        _poly_area_udf = pandas_udf(_poly_area_fn, "double")
    return _poly_area_udf(verts)
