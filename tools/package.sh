#!/usr/bin/env bash
# Build the --py-files zip for spark-submit cluster runs.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f bcm_spark.zip
zip -qr bcm_spark.zip biocypher_metta_spark -x '*__pycache__*'
echo "wrote bcm_spark.zip ($(du -h bcm_spark.zip | cut -f1))"
echo "submit: spark-submit --py-files bcm_spark.zip jobs/build_kg.py --help"
