"""Input validation (F14) — the reference's pydantic-model checks
re-expressed as driver-side validators + CHECK-style DataFrame filters:

- bbox shape/order/bounds (-180<=w<e<=180, -90<=s<n<=90):
  /root/reference/terrakit/validate/helpers.py:188-196 and the duplicate
  validator /root/reference/terrakit/download/geodata_utils.py:562-590
- date order + range [1950-01-01, today]:
  /root/reference/terrakit/validate/helpers.py:15,104-121
- collection membership: /root/reference/terrakit/download/geodata_utils.py:195-248
- label-class continuity + class-0/background conflict:
  /root/reference/terrakit/download/download_data.py:346-367
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATE_MIN = _dt.date(1950, 1, 1)


class ValidationError(ValueError):
    pass


def validate_bbox(bbox: list[float]) -> list[float]:
    if len(bbox) != 4:
        raise ValidationError(f"bbox must have 4 elements, got {len(bbox)}")
    w, s, e, n = bbox
    if not (-180 <= w < e <= 180):
        raise ValidationError(f"bbox lon order/bounds invalid: w={w}, e={e}")
    if not (-90 <= s < n <= 90):
        raise ValidationError(f"bbox lat order/bounds invalid: s={s}, n={n}")
    return bbox


def validate_date_range(date_start: str, date_end: str) -> tuple[_dt.date, _dt.date]:
    try:
        ds = _dt.date.fromisoformat(date_start)
        de = _dt.date.fromisoformat(date_end)
    except ValueError as exc:
        raise ValidationError(f"dates must be YYYY-MM-DD: {exc}") from None
    today = _dt.date.today()
    if not (DATE_MIN <= ds <= today) or not (DATE_MIN <= de <= today):
        raise ValidationError(f"dates must be within [{DATE_MIN}, today]")
    if ds > de:
        raise ValidationError(f"date_start {ds} after date_end {de}")
    return ds, de


def validate_collection(collection: str) -> str:
    from terrakit_spark.sources.registry import CATALOG

    if collection not in CATALOG:
        raise ValidationError(f"unknown collection {collection!r}; known: {sorted(CATALOG)}")
    return collection


def validate_label_classes(classes: list[int], set_no_data: bool = False) -> list[str]:
    """Returns warnings; raises on the class-0/background conflict
    (download_data.py:349-357)."""
    warnings = []
    cs = sorted(set(classes))
    if not set_no_data and 0 in cs:
        raise ValidationError(
            "Labels use class 0 which conflicts with the background class; "
            "use set_no_data=True or classes >= 1"
        )
    start = 0 if set_no_data else 1
    if not (cs and cs[0] == start and cs[-1] == start + len(cs) - 1):
        warnings.append("Label classes are not a continuous list of indices")
    return warnings


def check_geometry_presence(df: DataFrame, cols: tuple[str, ...] = ("cx", "cy")) -> DataFrame:
    """F7 — drop rows lacking geometry (labels.py:330-335)."""
    cond = None
    for c in cols:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    return df.filter(cond)
