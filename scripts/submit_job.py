"""Cluster-launch smoke job: run via

  spark-submit --master local[4] --py-files dist/terrakit_spark.zip scripts/submit_job.py [sf_dir]

Imports the engine from the shipped zip only (no repo on sys.path) and runs
the flagship rollup + grouped bbox, printing row counts."""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.appName("terrakit_submit_smoke")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)

from terrakit_spark.operators.flagship import flagship  # noqa: E402  (from --py-files zip)
from terrakit_spark.registry import QUERIES  # noqa: E402
import terrakit_spark.operators  # noqa: E402, F401

n1 = flagship(spark, sf_dir).count()
n2 = QUERIES["grouped_bbox"](spark, sf_dir).count()
print(f"SUBMIT_OK flagship={n1} grouped_bbox={n2}")
spark.stop()
