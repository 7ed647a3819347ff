"""W1/W3/W4 — window-grid generation and bbox tiling.

- window_grid: the reference's chip-window rule
  (/root/reference/terrakit/chip/tiling.py:160-194): x,y starts at stride
  sample_dim=256; any window overrunning the edge is moved back to
  dim - sample_dim (edge windows overlap interior ones; images smaller than
  sample_dim yield ONE window with negative start — the 10x10 dummy.tif
  case, /root/reference/tests/component_tests/chip/test_chip_and_label.py:100-115).
  win_index enumerates x-major then y, matching `{stem}_{i}` chip naming
  (/root/reference/terrakit/chip/tiling.py:301).
  Pure relational: a sequence-explode per scene — no UDF, fully codegen'd,
  and embarrassingly parallel at 10^12 scenes.

- bbox_tile_grid: provider-limit AOI tiling
  (/root/reference/terrakit/download/geodata_utils.py:365-401): AOIs larger
  than 2400 px split into <=2200-px steps; plus the <244-px padding rule
  (/root/reference/terrakit/download/geodata_utils.py:404-444) reported as
  padded dims.
"""

from __future__ import annotations

from terrakit_spark.dialect import DUCK, SPARK, D
from terrakit_spark.registry import register_sql
from terrakit_spark.synth import CHIP

MAX_PX = 2400  # /root/reference/terrakit/download/geodata_utils.py:404-419
TILE_PX = 2200
MIN_PX = 244
PAD_TO = 224 // 2 + 50  # 162, padded around center


def _window_grid(dialect: str) -> str:
    c = CHIP
    clamp_x = f"CAST(CASE WHEN x + {c} > width THEN width - {c} ELSE x END AS INT)"
    clamp_y = f"CAST(CASE WHEN y + {c} > height THEN height - {c} ELSE y END AS INT)"
    n_y = f"((height - 1) {'div' if dialect == SPARK else '//'} {c} + 1)"
    x_i = f"(x {'div' if dialect == SPARK else '//'} {c})"
    y_i = f"(y {'div' if dialect == SPARK else '//'} {c})"
    win_index = f"CAST({x_i} * {n_y} + {y_i} AS INT)"
    if dialect == SPARK:
        return f"""
SELECT scene_id, width, height,
       {win_index} AS win_index,
       {clamp_x} AS win_x, {clamp_y} AS win_y,
       {c} AS win_w, {c} AS win_h
FROM scenes
LATERAL VIEW explode(sequence(0, CAST(width - 1 AS BIGINT), {c})) _x AS x
LATERAL VIEW explode(sequence(0, CAST(height - 1 AS BIGINT), {c})) _y AS y
"""
    return f"""
SELECT scene_id, width, height,
       {win_index} AS win_index,
       {clamp_x} AS win_x, {clamp_y} AS win_y,
       {c} AS win_w, {c} AS win_h
FROM (SELECT scene_id, width, height, x,
             unnest(generate_series(0, CAST(height - 1 AS BIGINT), {c})) AS y
      FROM (SELECT scene_id, width, height,
                   unnest(generate_series(0, CAST(width - 1 AS BIGINT), {c})) AS x
            FROM scenes) _sx) _sy
"""


def _chip_inventory(dialect: str) -> str:
    """Per-scene chip count: (num_x * num_y) windows -> *2 files (data+label),
    mirroring the exact-inventory test style
    (/root/reference/tests/component_tests/chip/test_chip_and_label.py:105-118)."""
    idiv = "div" if dialect == SPARK else "//"
    n_x = f"((width - 1) {idiv} {CHIP} + 1)"
    n_y = f"((height - 1) {idiv} {CHIP} + 1)"
    return f"""
SELECT scene_id, width, height,
       CAST({n_x} AS INT) AS num_x, CAST({n_y} AS INT) AS num_y,
       CAST({n_x} * {n_y} AS INT) AS n_chips,
       CAST({n_x} * {n_y} * 2 AS INT) AS n_files
FROM scenes
"""


def _bbox_tile_grid(dialect: str) -> str:
    """Tile counts + padded dims per scene under the provider pixel caps."""
    idiv = "div" if dialect == SPARK else "//"
    n_tx = f"CASE WHEN width > {MAX_PX} THEN ((width - 1) {idiv} {TILE_PX} + 1) ELSE 1 END"
    n_ty = f"CASE WHEN height > {MAX_PX} THEN ((height - 1) {idiv} {TILE_PX} + 1) ELSE 1 END"
    pad_w = f"CASE WHEN width < {MIN_PX} THEN {2 * PAD_TO} ELSE width END"
    pad_h = f"CASE WHEN height < {MIN_PX} THEN {2 * PAD_TO} ELSE height END"
    return f"""
SELECT scene_id, width, height,
       CAST({n_tx} AS INT) AS tiles_x, CAST({n_ty} AS INT) AS tiles_y,
       CAST({pad_w} AS INT) AS padded_w, CAST({pad_h} AS INT) AS padded_h
FROM scenes
"""


register_sql("window_grid", _window_grid, tables=["scenes"])
register_sql("chip_inventory", _chip_inventory, tables=["scenes"])
register_sql("bbox_tile_grid", _bbox_tile_grid, tables=["scenes"])
