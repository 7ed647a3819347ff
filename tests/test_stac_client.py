"""S5 STAC API client: request pushdown fields, FeatureCollection parsing,
next-link pagination, DataFrame landing."""

from __future__ import annotations

from terrakit_spark.sources.stac import (
    PagedFixtureTransport,
    build_search_request,
    items_df,
    search_items,
)


def _feature(i, cc):
    return {
        "id": f"item-{i}",
        "collection": "sentinel-2-l2a",
        "bbox": [9.0, 11.0, 10.0, 12.0],
        "properties": {"datetime": f"2024-01-{i:02d}T10:00:00Z", "eo:cloud_cover": cc},
        "assets": {"B04": {"href": f"s3://bucket/item-{i}/B04.tif"}},
    }


def test_request_carries_pushdown_filters():
    req = build_search_request(
        ["sentinel-2-l2a"], bbox=[9, 11, 10, 12],
        date_start="2024-01-01", date_end="2024-01-31", max_cloud_cover=20.0,
    )
    assert req["bbox"] == [9, 11, 10, 12]
    assert req["datetime"] == "2024-01-01T00:00:00Z/2024-01-31T23:59:59Z"
    assert req["query"] == {"eo:cloud_cover": {"lte": 20.0}}


def test_pagination_and_parse(spark):
    pages = [
        {"type": "FeatureCollection", "features": [_feature(1, 5.0), _feature(2, 50.0)]},
        {"type": "FeatureCollection", "features": [_feature(3, 10.0)]},
        {"type": "FeatureCollection", "features": []},
    ]
    t = PagedFixtureTransport(pages)
    req = build_search_request(["sentinel-2-l2a"], max_cloud_cover=60.0)
    items = search_items(t, "https://stac.example/search", req)
    assert [i["item_id"] for i in items] == ["item-1", "item-2", "item-3"]
    assert len(t.requests) == 3  # followed both next links, stopped at the end
    assert all(body["query"]["eo:cloud_cover"]["lte"] == 60.0 for _, body in t.requests)

    df = items_df(spark, items)
    assert df.count() == 3
    row = df.filter("item_id = 'item-2'").first()
    assert row.cloud_cover == 50.0
    assert row.assets["B04"].endswith("B04.tif")
    assert row.bbox == [9.0, 11.0, 10.0, 12.0]
