"""K6 byte-level container sink: tortilla-style pack/read roundtrip and
the distributed shard + merge path over real pipeline chips."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from terrakit_spark.sinks.tortilla import (
    HEADER_LEN,
    MAGIC,
    load_samples,
    merge_tortilla,
    pack_samples,
    read_footer,
    read_sample,
)


def test_pack_read_roundtrip(tmp_path):
    samples = [
        {"id": "a", "part_id": "image", "file_format": "GTiff", "data": b"\x01\x02\x03",
         "data_split": "train", "time_start": "2020-01-01",
         "geotransform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], "raster_shape": [2, 3]},
        {"id": "a", "part_id": "label", "file_format": "GTiff", "data": b"\xff" * 10,
         "data_split": "train", "burn_scar": 7},
    ]
    buf = pack_samples(samples)
    assert buf[:2] == MAGIC
    ftr = read_footer(buf)
    assert list(ftr["tortilla:id"]) == ["a", "a"]
    assert list(ftr["tortilla:part"]) == ["image", "label"]
    assert ftr["tortilla:offset"].iloc[0] == HEADER_LEN
    assert read_sample(buf, ftr.iloc[0]) == b"\x01\x02\x03"
    assert read_sample(buf, ftr.iloc[1]) == b"\xff" * 10
    assert ftr["burn_scar"].iloc[1] == 7 and pd.isna(ftr["burn_scar"].iloc[0])
    assert list(ftr["stac:geotransform"].iloc[0]) == [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]


def test_merge_nests_shards(tmp_path):
    d = tmp_path / "shards"
    os.makedirs(d)
    for i, payload in enumerate((b"xyz", b"pq")):
        with open(d / f"part-{i:05d}.tortilla", "wb") as fh:
            fh.write(pack_samples([{"id": f"s{i}", "part_id": "image",
                                    "file_format": "GTiff", "data": payload}]))
    final = str(tmp_path / "all.tortilla")
    merge_tortilla(str(d), final)
    flat = load_samples(final)
    assert list(flat["tortilla:id"]) == ["s0", "s1"]
    assert list(flat["shard_id"]) == ["part-00000", "part-00001"]
    # absolute offsets: extract each payload straight from the final file
    with open(final, "rb") as fh:
        buf = fh.read()
    assert read_sample(buf, flat.iloc[0]) == b"xyz"
    assert read_sample(buf, flat.iloc[1]) == b"pq"


@pytest.mark.usefixtures("synth")
def test_tortilla_pipeline_container(spark, sf_dir, tmp_path):
    """End-to-end: chips -> distributed shards -> merged container; the
    extracted GTiff bytes decode back to the chip arrays and burn_scar
    equals the label value sum."""
    from pyspark.sql import functions as F

    from terrakit_spark.operators.chips import SMALL_PRED_SQL
    from terrakit_spark.operators.split import split_col
    from terrakit_spark.pipeline import chip_pipeline
    from terrakit_spark.sinks.geotiff import chips_with_geo, parse_geotiff
    from terrakit_spark.sinks.tortilla import write_tortilla_shards

    chips = chip_pipeline(spark, sf_dir, scene_pred=SMALL_PRED_SQL)
    scenes = spark.sql(f"SELECT * FROM scenes WHERE {SMALL_PRED_SQL}")
    packaged = chips_with_geo(chips, scenes).withColumn(
        "data_split", split_col(F.col("scene_id") * 1000 + F.col("win_index"))
    )
    rows = {(r.scene_id, r.win_index): r for r in packaged.collect()}
    assert rows

    shard_dir = str(tmp_path / "shards")
    write_tortilla_shards(packaged.repartition(3, "scene_id"), shard_dir)
    final = str(tmp_path / "ds.tortilla")
    merge_tortilla(shard_dir, final)

    flat = load_samples(final)
    assert len(flat) == 2 * len(rows)  # image + label per chip
    with open(final, "rb") as fh:
        buf = fh.read()
    for _, fr in flat.iterrows():
        sid, win = fr["tortilla:id"].split("_")
        src = rows[(int(sid), int(win))]
        parsed = parse_geotiff(read_sample(buf, fr))
        if fr["tortilla:part"] == "image":
            cube = np.frombuffer(src.data, dtype=np.float32).reshape(
                src.bands, src.chip_h, src.chip_w
            )
            assert np.array_equal(parsed["cube"], cube)
        else:
            lab = np.frombuffer(src.label, dtype=np.int32).reshape(src.chip_h, src.chip_w)
            assert np.array_equal(parsed["cube"][0], lab)
            assert fr["burn_scar"] == lab.sum()
        assert fr["tortilla:data_split"] == src.data_split
        assert fr["stac:time_start"] == src.scene_date_str
        assert list(fr["stac:raster_shape"]) == [src.chip_h, src.chip_w]


@pytest.mark.usefixtures("synth")
def test_read_tortilla_distributed(spark, sf_dir, tmp_path):
    """The distributed reader returns byte-identical payloads to the
    driver-side ranged reads, one task per shard, offsets intact."""
    from pyspark.sql import functions as F

    from terrakit_spark.operators.chips import SMALL_PRED_SQL
    from terrakit_spark.operators.split import split_col
    from terrakit_spark.pipeline import chip_pipeline
    from terrakit_spark.sinks.geotiff import chips_with_geo
    from terrakit_spark.sinks.tortilla import read_tortilla, write_tortilla_shards

    chips = chip_pipeline(spark, sf_dir, scene_pred=SMALL_PRED_SQL)
    scenes = spark.sql(f"SELECT * FROM scenes WHERE {SMALL_PRED_SQL}")
    packaged = chips_with_geo(chips, scenes).withColumn(
        "data_split", split_col(F.col("scene_id") * 1000 + F.col("win_index"))
    )
    shard_dir = str(tmp_path / "shards")
    write_tortilla_shards(packaged.repartition(3, "scene_id"), shard_dir)
    final = str(tmp_path / "ds.tortilla")
    merge_tortilla(shard_dir, final)

    got = {
        (r.sample_id, r.part_id): r
        for r in read_tortilla(spark, final).collect()
    }
    flat = load_samples(final)
    assert len(got) == len(flat)
    with open(final, "rb") as fh:
        buf = fh.read()
    for _, fr in flat.iterrows():
        r = got[(fr["tortilla:id"], fr["tortilla:part"])]
        assert bytes(r.payload) == read_sample(buf, fr)
        assert r.shard_id == fr["shard_id"]
        assert r.offset == fr["tortilla:offset"] and r.length == fr["tortilla:length"]
        assert r.data_split == fr["tortilla:data_split"]
