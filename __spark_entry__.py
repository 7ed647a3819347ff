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


# LRU rotation (round-4 verdict item 2): the 29 queries with no r4 driver
# row go FIRST so a capped driver pass re-reaches them. shp_roundtrip
# leads — its sink was hardened in round 4 (sinks/shapefile.py overwrite
# guard + accumulator count) AFTER its last driver row, the exact pattern
# that left ann_ivf stale in round 3. Then the operators whose code
# changes THIS round (spatial_join default cell selector, burn kernel,
# top_orders_window plan), then the rest of the r3-only cohort.
_PRIORITY = [
    "shp_roundtrip",
    "wkb_roundtrip",
    "tortilla_index",  # new in round 5 (K6 byte-level container)
    "tortilla_read_back",  # new in round 5 (distributed payload reader)
    "polygon_overlap_join",  # new in round 5 (polygon x polygon SAT join, salted default)
    "polygon_overlap_join_unsalted",  # same oracle: salt-invariance proof
    "tile_label_coverage",  # new in round 5 (exact clip-area coverage; rows-only)
    # --- code changed in round 5 (re-prove after edit) ---
    "spatial_join_pip",
    "burn_histogram",
    "burn_histogram_nodata",
    "top_orders_window",
    "pipeline_summary_small",
    "chip_pipeline_full",
    # --- rest of the no-r4-row cohort (r3-green, rotate back in) ---
    "knn_grid",
    "labels_load",
    "metadata_lookup",
    "grouped_bbox",
    "window_grid",
    "chip_inventory",
    "bbox_tile_grid",
    "bbox_clip_360",
    "curvilinear_clip",
    "quadkey_cells",
    "max_composite",
    "first_valid_mosaic",
    "dup_ts_merge",
    "label_tally",
    "vrt_window_stats",
    "rest_point_forecast",
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "repetition_signals",
    "hll_distinct_tokens",
    "corpus_curation",
    "curation_rollup_cube",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
