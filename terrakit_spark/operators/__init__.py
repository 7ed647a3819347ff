"""Importing this package registers every operator in the query registry."""

from terrakit_spark.operators import (  # noqa: F401
    asof,
    chips,
    flagship,
    knn,
    labels,
    rasterize,
    spatial_join,
    tiling,
)
