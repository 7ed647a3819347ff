"""S5 — STAC API search client (the live-API half; catalog-side predicate
pushdown lives in sources/registry.py).

Implements the public STAC API item-search contract
(/root/reference/terrakit/download/data_connectors/ibmresearch_stac.py uses
pystac_client for the same): POST /search body with collections, bbox,
datetime range and a cloud-cover `query` filter, FeatureCollection response
pages chained through the `next` link. The HTTP layer is the same transport
seam as the REST/CDS connectors — pass any object with
`post(url, body) -> dict`; PagedFixtureTransport replays canned pages
offline. Search runs on the driver (item lists are small — the reference
does the same); the resulting item table is a regular DataFrame that joins
distributed against everything else."""

from __future__ import annotations

from typing import Any


def build_search_request(
    collections: list[str],
    bbox: list[float] | None = None,
    date_start: str | None = None,
    date_end: str | None = None,
    max_cloud_cover: float | None = None,
    limit: int = 100,
) -> dict:
    body: dict[str, Any] = {"collections": list(collections), "limit": limit}
    if bbox is not None:
        body["bbox"] = list(bbox)
    if date_start or date_end:
        body["datetime"] = f"{date_start or '..'}T00:00:00Z/{date_end or '..'}T23:59:59Z"
    if max_cloud_cover is not None:
        body["query"] = {"eo:cloud_cover": {"lte": max_cloud_cover}}
    return body


def parse_items(fc: dict) -> list[dict]:
    """FeatureCollection -> flat item rows (id, collection, datetime, bbox,
    cloud_cover, asset hrefs)."""
    rows = []
    for f in fc.get("features", []):
        props = f.get("properties", {})
        rows.append(
            {
                "item_id": f["id"],
                "collection": f.get("collection"),
                "datetime": props.get("datetime"),
                "bbox": [float(v) for v in f.get("bbox", [])],
                "cloud_cover": props.get("eo:cloud_cover"),
                "assets": {k: a.get("href") for k, a in f.get("assets", {}).items()},
            }
        )
    return rows


def _next_link(fc: dict) -> str | None:
    for link in fc.get("links", []):
        if link.get("rel") == "next":
            return link.get("href")
    return None


def search_items(transport, search_url: str, request: dict, max_pages: int = 100) -> list[dict]:
    """Paginated search: follow `next` links until exhausted."""
    items: list[dict] = []
    url, body = search_url, request
    for _ in range(max_pages):
        fc = transport.post(url, body)
        items.extend(parse_items(fc))
        nxt = _next_link(fc)
        if not nxt:
            break
        url, body = nxt, request
    return items


def items_df(spark, items: list[dict]):
    schema = (
        "item_id string, collection string, datetime string, bbox array<double>, "
        "cloud_cover double, assets map<string,string>"
    )
    rows = [
        (i["item_id"], i["collection"], i["datetime"], i["bbox"], i["cloud_cover"], i["assets"])
        for i in items
    ]
    return spark.createDataFrame(rows, schema)


class PagedFixtureTransport:
    """Offline replay: a list of FeatureCollection pages; `next` links are
    synthesized between consecutive pages. Records every request so tests
    can assert the pushed-down filters."""

    def __init__(self, pages: list[dict]):
        self.pages = pages
        self.requests: list[tuple[str, dict]] = []

    def post(self, url: str, body: dict) -> dict:
        self.requests.append((url, body))
        idx = int(url.rsplit("page=", 1)[1]) if "page=" in url else 0
        page = dict(self.pages[idx])
        if idx + 1 < len(self.pages):
            page = {**page, "links": [{"rel": "next", "href": f"{url.split('?')[0]}?page={idx + 1}"}]}
        return page
