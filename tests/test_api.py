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
    assert {r.data_split for r in got} <= {"train", "val", "test"}
    # pairing discipline: label path derives from the data path by suffix
    # substitution (chip/tiling.py:282-284)
    assert all(r.label_file == r.file_path.replace(".data.tif", ".label.tif") for r in got)


def test_api_matches_cli_stage_outputs(synth, spark, sf_dir, tmp_path):
    """working_dir persists through the same snapshot tables the CLI
    stages write."""
    from terrakit_spark.plans.snapshots import SnapshotTable

    wd = str(tmp_path / "wd")
    labels, _ = api.process_labels(spark, sf_dir, working_dir=wd)
    stored = SnapshotTable(f"{wd}/labels").read(spark)
    assert stored.count() == labels.count()
