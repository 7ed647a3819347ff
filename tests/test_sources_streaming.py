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
