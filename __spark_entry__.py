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


# Queries the driver's CORRECTNESS pass has never (or not recently) verified
# go FIRST, so a capped driver run reaches them before re-verifying the
# long-green rest (round-2 verdict item 3).
_PRIORITY = [
    "corpus_curation",
    "repetition_signals",
    "rest_point_forecast",
    "token_budget_sample",
    "vrt_window_stats",
    "dedup_clusters_star",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "minhash_lsh_128",
    "duplicate_ngram_spans",
    "hll_distinct_tokens",
    "curation_rollup_cube",
    "burn_histogram_nodata",
    "spatial_join_pip_salted",
    "shp_roundtrip",
    "curvilinear_clip",
    "bbox_tile_grid",
    "chip_inventory",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
    "window_grid",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
