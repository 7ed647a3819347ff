"""Function-level Python API mirroring the reference's four entry points,
so a user of the reference can switch call sites one-for-one:

  process_labels       /root/reference/terrakit/transform/labels.py:477-591
  download_data        /root/reference/terrakit/download/download_data.py:506-643
  chip_and_label_data  /root/reference/terrakit/chip/tiling.py:441-520
  taco_store_data      /root/reference/terrakit/store/taco.py:204-255

Differences are the distributed substrate, not the semantics: inputs are
Spark tables instead of file folders, outputs are DataFrames (lazily
planned) instead of files, and passing working_dir opts into the
snapshot-committed persistence the CLI stages use (the reference's
file-on-disk inter-stage IR upgraded to tables with lineage). The
``active`` flags mirror the reference's per-stage on/off switches
(each stage returns immediately when active=False)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from terrakit_spark.operators.spatial_join import _register_views


def process_labels(
    spark: SparkSession,
    sf_dir: str,
    dataset_name: str = "terrakit_curated_dataset",
    working_dir: str | None = None,
    active: bool = True,
    write_shp: bool = False,
) -> tuple[DataFrame, DataFrame] | None:
    """Load the label layer and its per-date grouped bboxes — the
    reference's (labels_gdf, grouped_boxes_gdf) return contract
    (transform/labels.py:591). write_shp mirrors the `*_labels.shp` save
    through the pure-struct shapefile sink."""
    if not active:
        return None
    _register_views(spark, sf_dir)
    labels = spark.sql(
        "SELECT label_id, geom_seq, datetime, labelclass, filename, cx, cy, rx, ry, "
        "cx - rx AS xmin, cy - ry AS ymin, cx + rx AS xmax, cy + ry AS ymax FROM labels"
    )
    bboxes = spark.sql(
        """
        SELECT dc.datetime, dc.labelclass, env.xmin, env.ymin, env.xmax, env.ymax
        FROM (SELECT DISTINCT datetime, labelclass FROM labels) dc
        JOIN (SELECT datetime, min(cx - rx) AS xmin, min(cy - ry) AS ymin,
                     max(cx + rx) AS xmax, max(cy + ry) AS ymax
              FROM labels GROUP BY datetime) env
          ON dc.datetime = env.datetime
        """
    )
    if working_dir:
        from terrakit_spark.cli import stage_labels

        stage_labels(spark, sf_dir, working_dir, write_shp=write_shp)
    return labels, bboxes


def download_data(
    spark: SparkSession,
    sf_dir: str,
    dataset_name: str = "terrakit_curated_dataset",
    working_dir: str | None = None,
    active: bool = True,
    max_cloud_cover: int = 80,
) -> DataFrame | None:
    """The as-of matched 'queried data' table (J1): label dates matched to
    scene dates within [d, d+post_days], first-minimum tie-break
    (download_data.py:219-324). max_cloud_cover feeds the connector
    predicate pushdown (F2) when scenes come from a connector source."""
    if not active:
        return None
    _register_views(spark, sf_dir)
    from terrakit_spark.operators.asof import _asof_join

    matched = spark.sql(_asof_join("spark")).filter("scene_date_str IS NOT NULL")
    if working_dir:
        from terrakit_spark.cli import stage_download

        stage_download(spark, sf_dir, working_dir)
    return matched


def chip_and_label_data(
    spark: SparkSession,
    sf_dir: str,
    dataset_name: str = "terrakit_curated_dataset",
    working_dir: str | None = None,
    active: bool = True,
    scene_pred: str = "true",
    transforms: list[str] | None = None,
    stats: bool = True,
) -> tuple[DataFrame, DataFrame | None] | None:
    """Burn + edge-clamped 256-window chipping of data and label cubes with
    the SAME window list (chip/tiling.py:298-345), returning (chips,
    dataset_stats or None) — the reference's chip list + stats-roundtrip
    pair (K8)."""
    if not active:
        return None
    from terrakit_spark.pipeline import chip_pipeline, dataset_stats

    chips = chip_pipeline(spark, sf_dir, scene_pred=scene_pred, transforms=transforms)
    if working_dir:
        from terrakit_spark.cli import stage_chip

        stage_chip(spark, sf_dir, working_dir, scene_pred, transforms)
    return chips, (dataset_stats(chips) if stats else None)


def taco_store_data(
    spark: SparkSession,
    chips: DataFrame,
    dataset_name: str = "terrakit_curated_dataset",
    active: bool = True,
) -> DataFrame | None:
    """Package chips with deterministic train/val/test splits — the
    tortilla/taco container replaced by a dataset table with a data_split
    column (store/taco.py:69-201; split discipline 64/16/20)."""
    if not active:
        return None
    from pyspark.sql import functions as F

    from terrakit_spark.operators.split import KNUTH

    key = F.col("scene_id") * 1000 + F.col("win_index")
    bucket = (key * F.lit(KNUTH)) % 100
    return chips.select(
        F.format_string("%d_%d.data.tif", "scene_id", "win_index").alias("file_path"),
        F.format_string("%d_%d.label.tif", "scene_id", "win_index").alias("label_file"),
        F.when(bucket < 64, "train").when(bucket < 80, "val").otherwise("test").alias("data_split"),
        "scene_id",
        "win_index",
        "scene_date_str",
        "label_mass",
    )
