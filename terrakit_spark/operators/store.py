"""K6 — dataset packaging (the reference's tortilla/taco store stage,
/root/reference/terrakit/store/taco.py:69-201): per-sample (data chip,
label chip) rows with split assignment and label-mass metadata
(/root/reference/terrakit/store/taco.py:147-149), as one dataset table.

The sample universe is the window-grid (every chip the pipeline emits);
split is the deterministic hash split (store/taco.py:85-90 fractions,
order-independent — documented delta). The oracle reproduces chip ids and
split assignment in closed form."""

from __future__ import annotations

from terrakit_spark.dialect import SPARK, D
from terrakit_spark.operators.split import split_case_sql
from terrakit_spark.registry import register_sql
from terrakit_spark.synth import CHIP


def _chip_grid(dialect: str) -> str:
    idiv = "div" if dialect == SPARK else "//"
    n_y = f"((height - 1) {idiv} {CHIP} + 1)"
    win_index = f"CAST((x {idiv} {CHIP}) * {n_y} + (y {idiv} {CHIP}) AS INT)"
    if dialect == SPARK:
        return f"""
SELECT scene_id, {win_index} AS win_index
FROM scenes
LATERAL VIEW explode(sequence(0, CAST(width - 1 AS BIGINT), {CHIP})) _x AS x
LATERAL VIEW explode(sequence(0, CAST(height - 1 AS BIGINT), {CHIP})) _y AS y
"""
    return f"""
SELECT scene_id, {win_index} AS win_index
FROM (SELECT scene_id, width, height, x, unnest(generate_series(0, CAST(height - 1 AS BIGINT), {CHIP})) AS y
      FROM (SELECT scene_id, width, height, unnest(generate_series(0, CAST(width - 1 AS BIGINT), {CHIP})) AS x
            FROM scenes) _sx) _sy
"""


def _dataset_package(dialect: str) -> str:
    d = D(dialect)
    sample_key = "(scene_id * 1000 + win_index)"
    return f"""
SELECT {d.fmt("%d_%d.data.tif", "scene_id", "win_index")} AS file_path,
       {d.fmt("%d_%d.label.tif", "scene_id", "win_index")} AS label_file,
       {split_case_sql(sample_key)} AS data_split,
       scene_id, win_index
FROM ({_chip_grid(dialect)}) g
"""


def _dataset_package_counts(dialect: str) -> str:
    return f"""
SELECT data_split, CAST(count(*) AS BIGINT) AS n_samples
FROM ({_dataset_package(dialect)}) p
GROUP BY data_split
"""


register_sql("dataset_package", _dataset_package, tables=["scenes"])
register_sql("dataset_package_counts", _dataset_package_counts, tables=["scenes"])


# --- K6 byte-level: tortilla container roundtrip (sinks/tortilla.py) ------
#
# The query runs the small-pred chip pipeline, packages the chips into
# tortilla-style container shards (distributed foreachPartition write),
# merges them into one two-level container (the reference's
# tortilla-of-tortillas, store/taco.py:173-199), then READS THE CONTAINER
# BACK and returns its flattened footer index — so the oracle checks what
# the bytes on disk actually say, not the DataFrame that produced them.
# burn_scar (the reference's label-mask value sum, taco.py:146-163) is
# pinned per scene by the burn-histogram oracle's argmax-winner pixels:
# small scenes are single-window chips, so chip mask == scene burn.


def _tortilla_fixture(spark, sf_dir: str) -> str:
    """Build (once, idempotent) the small-pred dataset container; returns
    its path. Shared by the footer-index and distributed-read-back
    queries so both check the same bytes on disk."""
    import os

    from pyspark.sql import functions as F

    from terrakit_spark.operators.chips import SMALL_PRED_SQL
    from terrakit_spark.operators.split import split_col
    from terrakit_spark.pipeline import chip_pipeline
    from terrakit_spark.sinks.geotiff import chips_with_geo
    from terrakit_spark.sinks.tortilla import merge_tortilla, write_tortilla_shards

    import hashlib

    from terrakit_spark.sinks.tortilla import FORMAT_VERSION

    # Key on a hash of the FULL path plus the container-format version:
    # two sf_dirs sharing a basename (.work/sf0.1 vs /root/testdata/sf0.1)
    # must not collide, and a writer-format change must force a rebuild
    # instead of silently validating stale bytes.
    from terrakit_spark.synth import SYNTH_VERSION

    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir.rstrip('/'))}|v{FORMAT_VERSION}|s{SYNTH_VERSION}".encode()
    ).hexdigest()[:16]
    base = os.path.basename(sf_dir.rstrip("/"))
    work = f"/tmp/terrakit_tortilla_{base}_{key}"
    final = os.path.join(work, "dataset.tortilla")
    if not os.path.exists(final):  # deterministic fixture, idempotent
        chips = chip_pipeline(spark, sf_dir, scene_pred=SMALL_PRED_SQL)
        scenes = spark.sql(f"SELECT * FROM scenes WHERE {SMALL_PRED_SQL}")
        packaged = chips_with_geo(chips, scenes).withColumn(
            "data_split", split_col(F.col("scene_id") * 1000 + F.col("win_index"))
        )
        shard_dir = os.path.join(work, "shards")
        write_tortilla_shards(
            packaged.repartition(4, "scene_id").sortWithinPartitions("scene_id", "win_index"),
            shard_dir,
        )
        merge_tortilla(shard_dir, final + ".tmp")
        os.replace(final + ".tmp", final)
    return final


def tortilla_index(spark, sf_dir: str):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from terrakit_spark.sinks.tortilla import load_samples

    final = _tortilla_fixture(spark, sf_dir)
    idx = load_samples(final)
    rows = [
        (
            str(r["tortilla:id"]),
            str(r["tortilla:part"]),
            str(r["tortilla:data_split"]),
            str(r["stac:time_start"]),
            None if pd_isna(r["burn_scar"]) else int(r["burn_scar"]),
        )
        for _, r in idx.iterrows()
    ]
    schema = StructType(
        [
            StructField("sample_id", StringType()),
            StructField("part_id", StringType()),
            StructField("data_split", StringType()),
            StructField("time_start", StringType()),
            StructField("burn_scar", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def pd_isna(v) -> bool:
    import pandas as pd

    return v is None or (pd.isna(v) if not isinstance(v, (list, tuple)) else False)


def _tortilla_oracle() -> str:
    from terrakit_spark.operators.pipeline_query import _pipeline_oracle
    from terrakit_spark.operators.rasterize import BACKGROUND, _burn_oracle

    # SMALL_PRED import kept local: operators.chips imports registry too
    from terrakit_spark.operators.chips import SMALL_PRED_SQL

    return f"""
SELECT CAST(p.scene_id AS VARCHAR) || '_0' AS sample_id,
       parts.part_id,
       {split_case_sql("(p.scene_id * 1000 + 0)")} AS data_split,
       p.scene_date_str AS time_start,
       CASE WHEN parts.part_id = 'label' THEN CAST(coalesce(v.vsum, 0) AS BIGINT) END AS burn_scar
FROM ({_pipeline_oracle(SMALL_PRED_SQL, rollup=False)}) p
CROSS JOIN (SELECT 'image' AS part_id UNION ALL SELECT 'label') parts
LEFT JOIN (
  SELECT scene_id, sum(label_class * n_px) AS vsum
  FROM ({_burn_oracle(BACKGROUND)}) h WHERE label_class > 0 GROUP BY scene_id
) v ON v.scene_id = p.scene_id
"""


def tortilla_read_back(spark, sf_dir: str):
    """The DISTRIBUTED read path of the container, value-checked: executors
    range-read the payload bytes (sinks/tortilla.py::read_tortilla) and
    DECODE them — burn_scar is recomputed from the label GeoTIFF's pixels,
    not trusted from the footer — yet the oracle is the same closed form
    as tortilla_index, so a payload byte broken anywhere in writer, merge,
    offsets, or reader breaks the value hash."""
    from terrakit_spark.sinks.tortilla import read_tortilla

    final = _tortilla_fixture(spark, sf_dir)
    samples = read_tortilla(spark, final)

    def _decode(batches):
        import pandas as pd

        from terrakit_spark.sinks.geotiff import parse_geotiff

        for pb in batches:
            scars = [
                int(parse_geotiff(bytes(payload))["cube"].sum()) if part == "label" else None
                for part, payload in zip(pb["part_id"], pb["payload"])
            ]
            out = pb[["sample_id", "part_id", "data_split", "time_start"]].copy()
            out["burn_scar"] = pd.array(scars, dtype="Int64")
            yield out

    return samples.mapInPandas(
        _decode,
        schema="sample_id string, part_id string, data_split string, "
        "time_start string, burn_scar long",
    )


from terrakit_spark.registry import register_df  # noqa: E402

register_df("tortilla_index", tortilla_index, oracle=_tortilla_oracle())
register_df("tortilla_read_back", tortilla_read_back, oracle=_tortilla_oracle())
