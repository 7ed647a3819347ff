"""S10 REST point-forecast connector: horizon bucketing, window clamps,
transport seam (synthetic + directory replay)."""

from __future__ import annotations

import datetime as dt
import hashlib
import json

import pytest

from terrakit_spark.sources.rest import (
    DirectoryTransport,
    SyntheticTransport,
    forecast_days,
    forecast_url,
    point_forecast,
)

TODAY = dt.date(2026, 8, 16)


def test_horizon_bucketing():
    # (end - today).days + 1 bisected into [3, 5, 7, 10, 15]
    assert forecast_days("2026-08-16", "2026-08-16", TODAY) == 3
    assert forecast_days("2026-08-16", "2026-08-19", TODAY) == 5
    # bisect_right: an exact-horizon delta (7 days) rolls to the NEXT bucket
    # (reference behavior, theweathercompany.py:137-141)
    assert forecast_days("2026-08-16", "2026-08-22", TODAY) == 10
    assert forecast_days("2026-08-16", "2026-09-16", TODAY) == 15  # clamp to max
    with pytest.raises(ValueError, match="cannot be in the past"):
        forecast_days("2026-08-15", "2026-08-16", TODAY)
    with pytest.raises(ValueError, match="cannot be before start"):
        forecast_days("2026-08-20", "2026-08-17", TODAY)


def test_out_of_horizon_returns_empty(spark):
    pts = spark.createDataFrame([("p1", 10.0, 20.0)], "point_id string, lat double, lon double")
    out = point_forecast(spark, pts, "2026-10-01", "2026-10-05", today="2026-08-16")
    assert out.count() == 0


def test_directory_transport_replay(spark, tmp_path):
    """Canned responses replay through the same plumbing."""
    pts = spark.createDataFrame([("p1", 10.0, 20.0)], "point_id string, lat double, lon double")
    url = forecast_url(3, 10.0, 20.0)
    resp = SyntheticTransport().get(url, {"base_date": "2026-08-16"})
    (tmp_path / (hashlib.sha1(url.encode()).hexdigest() + ".json")).write_text(json.dumps(resp))

    fixture_dir = str(tmp_path)

    def factory():
        return DirectoryTransport(fixture_dir)

    out = point_forecast(
        spark, pts, "2026-08-16", "2026-08-17", transport_factory=factory, today="2026-08-16"
    ).collect()
    assert len(out) == 2  # 3-day response clamped to the 2 requested days
    assert {r.valid_date for r in out} == {"2026-08-16", "2026-08-17"}
    # missing fixture -> loud failure, not silent empty
    pts2 = spark.createDataFrame([("p2", 11.0, 21.0)], "point_id string, lat double, lon double")
    with pytest.raises(Exception, match="no cached response"):
        point_forecast(
            spark, pts2, "2026-08-16", "2026-08-17", transport_factory=factory, today="2026-08-16"
        ).collect()
