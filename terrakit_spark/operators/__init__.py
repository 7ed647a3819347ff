"""Importing this package registers every operator in the query registry."""

from terrakit_spark.operators import (  # noqa: F401
    asof,
    flagship,
    labels,
    spatial_join,
    tiling,
)
