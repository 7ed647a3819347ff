"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship pipeline on /root/testdata/sf0.001.
queries()         — one entry per implemented operator from SURVEY.md §2.
oracle_sql()      — DuckDB-runnable equivalents (same deterministic synthetic
                    derivations, rendered in the DuckDB dialect).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import terrakit_spark.operators  # noqa: F401  (registers all operators)
from terrakit_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join of interleaved-document media spans against the
    polygon label layer (cell index + ray-cast PIP), rolled up per doc."""
    from terrakit_spark.operators.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
