from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrakit_spark.sources.registry import get_connector, resolve_bands


def test_resolve_bands_alias_and_fuzzy():
    assert resolve_bands(["B02", "blue"], "synthetic-optical") == ["B02", "B02"]
    assert resolve_bands(["t2m_avg"], "synthetic-climate") == ["t2m_mean"]
    assert resolve_bands(["2m_temperature_mean"], "synthetic-climate") == ["t2m_mean"]
    assert resolve_bands(["tp"], "synthetic-climate") == ["tp_sum"]
    with pytest.raises(ValueError):
        resolve_bands(["nope"], "synthetic-optical")


def test_connector_pushdown(synth, spark):
    c = get_connector("synthetic")
    assert "synthetic-optical" in c.list_collections()
    found = c.find_scenes(spark, bbox=(9.0, 11.0, 14.0, 14.0), date_start="2024-01-01", date_end="2024-01-15")
    rows = found.select("xmin", "ymin", "scene_date").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.xmin <= 14.0 and r.ymin <= 14.0
        assert str(r.scene_date) <= "2024-01-15"
    with pytest.raises(ValueError):
        get_connector("does-not-exist")


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    from terrakit_spark.streaming.incremental import (
        batch_equivalent,
        run_available_now,
        windowed_event_counts_stream,
    )

    inp = str(tmp_path / "events_in")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(inp)
    )
    stream_df = windowed_event_counts_stream(spark, inp)
    run_available_now(stream_df, str(tmp_path / "ckpt"), "evt_counts")
    got = {tuple(r) for r in spark.table("evt_counts").collect()}
    want = {tuple(r) for r in batch_equivalent(spark, inp).collect()}
    assert got == want and len(want) > 0


def test_stateful_sessionization_matches_batch(spark, sf_dir, tmp_path):
    from terrakit_spark.streaming.incremental import (
        run_available_now,
        sessionize_batch,
        sessionize_stream,
    )

    inp = str(tmp_path / "sess_in")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(inp)
    )
    run_available_now(sessionize_stream(spark, inp), str(tmp_path / "sess_ckpt"), "sessions")
    got = {(r.user_id, r.session_start, r.n_events, r.sum_value) for r in spark.table("sessions").collect()}
    want = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in sessionize_batch(spark, inp).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_chip_ingest_matches_batch(synth, spark, sf_dir, tmp_path):
    """The full dataset-generation pipeline as a streaming ingest: scene
    acquisitions arriving in two waves produce, via two availableNow drains
    against one checkpoint, EXACTLY the chips the batch pipeline computes on
    the union — and an epoch replay cannot double-commit."""
    from terrakit_spark.pipeline import chip_pipeline
    from terrakit_spark.plans.snapshots import SnapshotTable
    from terrakit_spark.streaming.incremental import streaming_chip_ingest

    cols = "scene_id, scene_date, scene_date_str, width, height, bands, xmin, ymin, xmax, ymax"
    arrivals = str(tmp_path / "arrivals")
    spark.sql(f"SELECT {cols} FROM scenes WHERE (scene_id % 25) = 15").write.parquet(arrivals + "/wave=1")

    table = SnapshotTable(str(tmp_path / "chips_tbl"))
    ckpt = str(tmp_path / "ckpt")
    streaming_chip_ingest(spark, arrivals + "/wave=*", sf_dir, table, ckpt)
    n_after_wave1 = len(table.snapshots())
    assert n_after_wave1 >= 1

    # second wave: the checkpoint resumes, only new files are processed
    spark.sql(f"SELECT {cols} FROM scenes WHERE (scene_id % 25) = 20").write.parquet(arrivals + "/wave=2")
    streaming_chip_ingest(spark, arrivals + "/wave=*", sf_dir, table, ckpt)

    def rows_of(df):
        return sorted(
            (r.scene_id, r.win_index, r.win_x, r.win_y, bytes(r.data), bytes(r.label), r.label_mass)
            for r in df.collect()
        )

    got = rows_of(table.read(spark))
    want = rows_of(chip_pipeline(spark, sf_dir, scene_pred="(scene_id % 25) IN (15, 20)"))
    assert got == want and len(want) > 0

    # drained stream + no new files => no new snapshot (idempotent catch-up)
    n_snaps = len(table.snapshots())
    streaming_chip_ingest(spark, arrivals + "/wave=*", sf_dir, table, ckpt)
    assert len(table.snapshots()) == n_snaps

    # a FRESH checkpoint is a new stream identity whose epochs restart at
    # 0: the epoch guard is scoped per checkpoint, so it must REPROCESS
    # (commit again), not silently skip against the old stream's epoch 0
    streaming_chip_ingest(spark, arrivals + "/wave=*", sf_dir, table, str(tmp_path / "ckpt2"))
    assert len(table.snapshots()) > n_snaps


@pytest.mark.parametrize("state_mode", ["exact", "bloom"])
def test_stateful_streaming_dedup_matches_batch(spark, tmp_path, state_mode):
    """applyInPandasWithState first-seen dedup (both state backends: exact
    per-bucket set, and the bounded 65,536-bit bloom filter): two
    micro-batches with within-batch and cross-batch duplicates; the emitted
    set must equal the batch first-wins oracle, and a duplicate arriving in
    a LATER batch must not re-emit (state persisted across batches). At
    this cardinality the bloom FP contract (~1e-5) cannot fire, so both
    backends must agree exactly."""
    import datetime as dt

    from terrakit_spark.streaming.incremental import (
        batch_first_seen,
        streaming_first_seen,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    b1 = [(1, "fA", t0), (2, "fB", t0), (3, "fA", t0)]  # within-batch dup
    b2 = [(4, "fB", t0), (5, "fC", t0), (6, "fC", t0)]  # cross + within dup
    inp = str(tmp_path / "docs")
    schema = "doc_id long, fingerprint string, ts timestamp"
    spark.createDataFrame(b1, schema).write.parquet(inp + "/batch=1")

    out = str(tmp_path / "out")

    def drain():
        q = (
            streaming_first_seen(spark, inp + "/batch=*", state=state_mode)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    spark.createDataFrame(b2, schema).write.parquet(inp + "/batch=2")
    drain()  # resumes from the checkpoint: batch-1 state must persist

    got = {(r.doc_id, r.fingerprint) for r in spark.read.parquet(out).collect()}
    expected = {
        (r.doc_id, r.fingerprint)
        for r in batch_first_seen(spark, [inp + "/batch=1", inp + "/batch=2"]).collect()
    }
    assert got == expected == {(1, "fA"), (2, "fB"), (5, "fC")}


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data contract (§2.9): in APPEND mode a window is emitted once
    the watermark passes its end, and a row arriving BEHIND the watermark
    afterwards is dropped — it must not re-emit or alter the closed
    window. (The complete-mode queries above keep all state; this pins the
    production late-data semantics.)"""
    import datetime as dt

    from terrakit_spark.streaming.incremental import windowed_event_counts_stream

    inp = str(tmp_path / "late_in")
    out = str(tmp_path / "late_out")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    t0 = dt.datetime(2024, 1, 1, 10, 30, 0)

    def drain():
        q = (
            windowed_event_counts_stream(spark, inp + "/batch=*", watermark="10 minutes", window="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "late_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: two rows in the 10:00 window + one far-future row that
    # advances the watermark beyond 11:10, closing the 10:00 window
    b1 = [(1, t0, 1, "a", 1.0), (2, t0, 1, "a", 1.0), (3, t0 + dt.timedelta(hours=3), 1, "a", 1.0)]
    spark.createDataFrame(b1, schema).write.parquet(inp + "/batch=1")
    drain()
    got1 = {(r.window_start.hour, r.event_type): r.n for r in spark.read.parquet(out).collect()}
    assert got1.get((10, "a")) == 2  # closed window emitted exactly once

    # batch 2: a LATE row inside the already-closed 10:00 window
    spark.createDataFrame([(4, t0, 1, "a", 5.0)], schema).write.parquet(inp + "/batch=2")
    drain()
    rows = [r for r in spark.read.parquet(out).collect() if r.window_start.hour == 10]
    assert len(rows) == 1 and rows[0].n == 2  # late row dropped, window not re-emitted


def test_streaming_tile_pyramid_matches_batch(synth, spark, sf_dir, tmp_path):
    # two-file incremental ingest: the second availableNow drain must fold
    # the new points into the bounded tile state, landing exactly on the
    # all-files batch aggregate
    from terrakit_spark.streaming.incremental import (
        run_available_now,
        tile_pyramid_batch,
        tile_pyramid_stream,
    )

    inp = str(tmp_path / "media_in")
    media = spark.table("media").select("doc_num", "media_ref", "mx", "my")
    media.filter("doc_num % 2 = 0").drop("doc_num").write.parquet(inp)
    ckpt = str(tmp_path / "pyr_ckpt")
    run_available_now(tile_pyramid_stream(spark, inp), ckpt, "tile_pyr")
    # second batch of files arrives; same checkpoint resumes the state
    media.filter("doc_num % 2 = 1").drop("doc_num").write.mode("append").parquet(inp)
    run_available_now(tile_pyramid_stream(spark, inp), ckpt, "tile_pyr")
    got = {tuple(r) for r in spark.table("tile_pyr").collect()}
    want = {tuple(r) for r in tile_pyramid_batch(spark, inp).collect()}
    assert got == want and len(want) > 0
