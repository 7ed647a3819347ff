#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission:
#   spark-submit --py-files dist/terrakit_spark.zip your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/terrakit_spark.zip
zip -qr dist/terrakit_spark.zip terrakit_spark -x "*__pycache__*"
echo "dist/terrakit_spark.zip:"
unzip -l dist/terrakit_spark.zip | tail -2
