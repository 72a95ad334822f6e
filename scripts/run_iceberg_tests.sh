#!/usr/bin/env bash
# Run the Iceberg lifecycle suite against a REAL Iceberg runtime
# (VERDICT r04 next-round #3).  This sandbox has no network (verified
# 2026-08-17: maven central unreachable, curl http_code 000) and ships
# no iceberg jar, so tests/test_iceberg_mapping.py skips offline; on
# any machine with either the jar or network, this script unskips it.
#
#   # option A: network — let Spark resolve the package
#   ./scripts/run_iceberg_tests.sh
#   # option B: offline with a vendored jar
#   ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-1.10.0.jar \
#       ./scripts/run_iceberg_tests.sh
#
# Or containerized (needs docker + network):
#   docker run --rm -v "$PWD":/repo -w /repo apache/spark:4.0.0-python3 \
#       bash scripts/run_iceberg_tests.sh
set -euo pipefail

RUNTIME_PKG="org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"
EXT="org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"

if [[ -n "${ICEBERG_JAR:-}" ]]; then
    export PYSPARK_SUBMIT_ARGS="--jars ${ICEBERG_JAR} --conf spark.sql.extensions=${EXT} pyspark-shell"
else
    export PYSPARK_SUBMIT_ARGS="--packages ${RUNTIME_PKG} --conf spark.sql.extensions=${EXT} pyspark-shell"
fi

exec python -m pytest tests/test_iceberg_mapping.py -v -rs "$@"
