#!/usr/bin/env bash
# Package the engine for spark-submit --py-files deployment.
#
#   tools/make_submit_zip.sh [outdir]
#   spark-submit --py-files dist/log_analysis_system_spark.zip \
#     --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.0 \
#     your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist}"
mkdir -p "$out"
zip -qr "$out/log_analysis_system_spark.zip" log_analysis_system_spark \
    -x '*__pycache__*'
echo "wrote $out/log_analysis_system_spark.zip"
