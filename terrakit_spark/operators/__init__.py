"""Importing this package registers every operator in the query registry."""

from terrakit_spark.operators import (  # noqa: F401
    asof,
    chips,
    coverage,
    dedup,
    flagship,
    geo_scalar,
    knn,
    labels,
    mosaic,
    multimodal,
    pipeline_query,
    polygonize,
    pyramid,
    rasterize,
    store,
    relational,
    similarity,
    spatial_join,
    split,
    textops,
    tiling,
)
from terrakit_spark.sources import rest, vrt  # noqa: F401  (S10 + S7 connector queries)
