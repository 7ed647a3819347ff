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


# LRU rotation (round-3 verdict item 1): the 22 queries with no r3 driver
# row go FIRST so a capped driver pass re-reaches them. ann_ivf leads —
# its codebook was rewritten in round 3 after its last driver row, plus
# the operators whose code changed THIS round (duplicate_ngram_spans cap,
# token_budget_sample two-pass, taco split fix).
_PRIORITY = [
    "ann_ivf",
    "spatial_join_pip_adaptive",
    "spatial_join_pip_sampled",
    "kmeans_embeddings",
    "kmeans_sizes",
    "ann_ivf_kmeans",
    "pii_scrub",
    "contamination_check",
    "duplicate_ngram_spans",
    "token_budget_sample",
    "ann_lsh_bucketed",
    "ann_topk_quantized",
    "burn_histogram",
    "chip_pipeline_full",
    "dataset_package",
    "dataset_package_counts",
    "dataset_stats_quirk",
    "distinct_dates",
    "media_decode_features",
    "media_frame_sample",
    "media_resize",
    "pipeline_skip_zero",
    "pipeline_summary_small",
    "pricing_summary",
    "raster_polygonize",
    "region_rollup",
    "sessionize_events",
    "split_assign",
    "split_counts",
    "temporal_range_filter",
    "top_orders_window",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
