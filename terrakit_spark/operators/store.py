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
