"""Function-level API mirror (reference entry points, one-for-one)."""

from __future__ import annotations

from terrakit_spark import api


def test_process_labels_contract(synth, spark, sf_dir):
    labels, bboxes = api.process_labels(spark, sf_dir)
    assert {"datetime", "labelclass", "filename"} <= set(labels.columns)
    # one bbox row per (datetime, labelclass); all rows of a date share the
    # envelope (transform/labels.py:363-413)
    rows = bboxes.collect()
    assert len({(r.datetime, r.labelclass) for r in rows}) == len(rows)
    per_date = {}
    for r in rows:
        per_date.setdefault(r.datetime, set()).add((r.xmin, r.ymin, r.xmax, r.ymax))
    assert all(len(v) == 1 for v in per_date.values())
    assert api.process_labels(spark, sf_dir, active=False) is None


def test_download_and_chip_and_store_chain(synth, spark, sf_dir):
    matched = api.download_data(spark, sf_dir)
    assert matched.count() > 0
    chips, stats = api.chip_and_label_data(spark, sf_dir, scene_pred="(scene_id % 25) = 15")
    n = chips.count()
    assert n > 0 and stats is not None and stats.count() > 0
    ds = api.taco_store_data(spark, chips)
    got = ds.collect()
    assert len(got) == n
    # the reference's split values, verbatim (store/taco.py:103-107)
    assert {r.data_split for r in got} <= {"train", "validation", "test"}
    # pairing discipline: label path derives from the data path by suffix
    # substitution (chip/tiling.py:282-284)
    assert all(r.label_file == r.file_path.replace(".data.tif", ".label.tif") for r in got)


def test_taco_split_fractions_survive_int64_scale(spark):
    """64/16/20 split discipline at corpus-scale scene ids: the old
    (key * KNUTH) % 100 silently wrapped int64 in non-ANSI Spark once
    scene_id exceeded ~3.4e6, routing every overflowed chip to 'train'.
    The overflow-safe bucket must keep all three splits near their
    fractions for keys far past the wrap point."""
    from pyspark.sql import functions as F

    chips = (
        spark.range(20_000)
        .select(
            (F.col("id") + 5_000_000).alias("scene_id"),  # key = scene_id*1000 > 2^63/KNUTH
            (F.col("id") % 7).alias("win_index"),
            F.lit("2024-01-01").alias("scene_date_str"),
            F.lit(0.0).alias("label_mass"),
        )
    )
    counts = {r.data_split: r.n for r in api.taco_store_data(spark, chips).groupBy("data_split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == 20_000
    for split, frac in (("train", 0.64), ("validation", 0.16), ("test", 0.20)):
        assert abs(counts.get(split, 0) / total - frac) < 0.02, counts


def test_download_data_threads_cloud_cover(synth, spark, sf_dir):
    """max_cloud_cover prunes the scene side (F2, scene_id %% 100 proxy):
    tightening the threshold can only shrink-or-hold the candidate scene
    set, and None disables the filter entirely."""
    all_rows = api.download_data(spark, sf_dir, max_cloud_cover=None).count()
    assert all_rows > 0
    assert api.download_data(spark, sf_dir, max_cloud_cover=4).count() <= all_rows
    # threshold 0 excludes every scene -> no match survives the NOT NULL gate
    assert api.download_data(spark, sf_dir, max_cloud_cover=0).count() == 0


def test_api_matches_cli_stage_outputs(synth, spark, sf_dir, tmp_path):
    """working_dir persists through the same snapshot tables the CLI
    stages write."""
    from terrakit_spark.plans.snapshots import SnapshotTable

    wd = str(tmp_path / "wd")
    labels, _ = api.process_labels(spark, sf_dir, working_dir=wd)
    stored = SnapshotTable(f"{wd}/labels").read(spark)
    assert stored.count() == labels.count()
