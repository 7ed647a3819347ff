"""Pluggable source connectors — the reference's Connector abstraction
(list_collections/find_data/get_data, /root/reference/terrakit/download/
connector.py:11-98, factory switch /root/reference/terrakit/terrakit.py:48-66)
re-expressed as a registry of DataFrame-producing sources.

find_scenes pushes bbox + date-range + collection predicates INTO the scan
(the STAC-search pushdown analogue, /root/reference/terrakit/download/
data_connectors/sentinel_aws.py:59-95): on a partitioned table those
predicates are partition-pruned by Catalyst; here the synthetic connector
applies them to the scene catalog before any pixel is materialized."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---- catalog (S11; mirrors download/collections.json shape) ----------------
CATALOG: dict[str, dict] = {
    "synthetic-optical": {
        "connector": "synthetic",
        "bands": [
            {"band_name": "B01", "alt_names": ["coastal"], "resolution": 60},
            {"band_name": "B02", "alt_names": ["blue"], "resolution": 10},
            {"band_name": "B03", "alt_names": ["green"], "resolution": 10},
        ],
    },
    "synthetic-climate": {
        "connector": "synthetic",
        "bands": [
            {"band_name": "t2m_mean", "alt_names": ["2m_temperature_mean", "t2m_avg"], "resolution": 1000},
            {"band_name": "tp_sum", "alt_names": ["total_precipitation"], "resolution": 1000},
        ],
    },
}


def resolve_bands(requested: list[str], collection: str) -> list[str]:
    """F8/F9 band aliasing: exact band_name match, then alt_names, then the
    reference's avg<->mean abbreviation fuzz
    (/root/reference/terrakit/download/geodata_utils.py:31-141,195-248)."""
    cat = CATALOG[collection]["bands"]
    by_name = {b["band_name"]: b["band_name"] for b in cat}
    by_alt = {a: b["band_name"] for b in cat for a in b.get("alt_names", [])}
    out = []
    for r in requested:
        if r in by_name:
            out.append(r)
        elif r in by_alt:
            out.append(by_alt[r])
        else:
            # abbreviation fuzz: avg <-> mean substitution, then substring
            swapped = r.replace("avg", "mean") if "avg" in r else r.replace("mean", "avg")
            cand = [b for b in by_name if swapped in b or b in swapped]
            sub = [b for b in by_name if r in b or b in r]
            if swapped in by_name:
                out.append(swapped)
            elif swapped in by_alt:
                out.append(by_alt[swapped])
            elif sub:
                out.append(sub[0])
            elif cand:
                out.append(cand[0])
            else:
                raise ValueError(f"band {r!r} not in collection {collection!r}")
    return out


# ---- connectors -------------------------------------------------------------
@dataclass
class SyntheticConnector:
    """Scene catalog + deterministic pixels (the sandbox stand-in for a
    remote archive; a real connector would scan an Iceberg/STAC-indexed
    table with the same predicate shape)."""

    name: str = "synthetic"

    def list_collections(self) -> list[str]:
        return [c for c, v in CATALOG.items() if v["connector"] == self.name]

    def find_scenes(
        self,
        spark: SparkSession,
        bbox: tuple[float, float, float, float] | None = None,
        date_start: str | None = None,
        date_end: str | None = None,
        max_cloud_cover: float | None = None,
    ) -> DataFrame:
        df = spark.table("scenes")
        if bbox is not None:
            xmin, ymin, xmax, ymax = bbox
            df = df.filter(
                (F.col("xmin") <= xmax) & (F.col("xmax") >= xmin)
                & (F.col("ymin") <= ymax) & (F.col("ymax") >= ymin)
            )
        if date_start is not None:
            df = df.filter(F.col("scene_date") >= F.lit(date_start).cast("date"))
        if date_end is not None:
            df = df.filter(F.col("scene_date") <= F.lit(date_end).cast("date"))
        # cloud-cover filter (F2): synthetic proxy = scene_id % 100 as cc
        if max_cloud_cover is not None:
            df = df.filter((F.col("scene_id") % 100) < F.lit(max_cloud_cover))
        return df

    def get_scenes_with_pixels(self, scenes: DataFrame) -> DataFrame:
        from terrakit_spark.sources.raster import with_pixels

        return with_pixels(scenes)


_CONNECTORS = {"synthetic": SyntheticConnector}


def get_connector(name: str):
    """Factory switch (terrakit.py:48-66 analogue)."""
    try:
        return _CONNECTORS[name]()
    except KeyError:
        raise ValueError(f"unknown connector {name!r}; known: {sorted(_CONNECTORS)}") from None


def register_connector(name: str, cls) -> None:
    _CONNECTORS[name] = cls
