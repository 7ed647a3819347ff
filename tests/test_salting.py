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
