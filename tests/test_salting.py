"""Hotspot-cell salting (north rule): the salted shuffle path must produce
EXACTLY the same join output as the unsalted path — salting only reshapes
the shuffle, never the result."""

from __future__ import annotations

from terrakit_spark.operators.spatial_join import _diamond_polys, _register_views, cell_pip_join


def test_salted_join_exactness(synth, spark, sf_dir):
    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")

    base = {
        (r.media_ref, r.label_id)
        for r in cell_pip_join(points, polys).select("media_ref", "label_id").collect()
    }
    salted = {
        (r.media_ref, r.label_id)
        for r in cell_pip_join(points, polys, n_salts=8).select("media_ref", "label_id").collect()
    }
    assert salted == base and len(base) > 0


def test_adaptive_cell_join_exactness(synth, spark, sf_dir):
    """Density-adaptive cell sizing (the round-4 sf1 lesson) is a
    candidate-generation device: whatever resolution it picks, the refined
    join output must equal the fixed-grid output exactly."""
    from terrakit_spark.operators.spatial_join import adaptive_cell_deg

    _register_views(spark, sf_dir)
    points = spark.table("media").select("media_ref", "mx", "my")
    polys = _diamond_polys(spark).select("label_id", "xmin", "ymin", "xmax", "ymax", "vertices")

    import math

    deg = adaptive_cell_deg(points, "mx", "my", polys)
    assert 1.0 / 256 <= deg <= 1.0
    assert math.log2(deg).is_integer()  # nested/deterministic power-of-two grid
    base = {
        (r.media_ref, r.label_id)
        for r in cell_pip_join(points, polys, cell_deg=0.125).select("media_ref", "label_id").collect()
    }
    adaptive = {
        (r.media_ref, r.label_id)
        for r in cell_pip_join(points, polys, cell_deg=deg).select("media_ref", "label_id").collect()
    }
    assert adaptive == base and len(base) > 0


def test_adaptive_cell_tracks_density(spark):
    """10x the points in the same area -> the selector picks a finer (or
    equal, when clamped) cell; sparse data picks a coarse cell."""
    from pyspark.sql import functions as F

    from terrakit_spark.operators.spatial_join import adaptive_cell_deg

    polys = spark.createDataFrame([(0.0, 0.0, 1.0, 1.0)], "xmin double, ymin double, xmax double, ymax double")

    def pts(n):
        return spark.range(n).select(
            (F.col("id") % 100 / 10.0).alias("mx"), (F.col("id") % 97 / 9.7).alias("my")
        )

    sparse = adaptive_cell_deg(pts(500), "mx", "my", polys)
    dense = adaptive_cell_deg(pts(50_000), "mx", "my", polys)
    assert dense <= sparse
    assert dense < sparse or dense == 1.0 / 256  # strictly finer unless clamped
