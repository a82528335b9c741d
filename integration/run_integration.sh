#!/usr/bin/env bash
# One command: bring up Kafka + a Mongo replica set, run the gated
# integration tests against them, tear down.  RUNBOOK.md §5 documents
# what each test exercises.  Requires docker with the compose plugin
# and network access to pull the two images + the Spark connector
# jars (spark.jars.packages resolves from Maven on first use).
set -euo pipefail
cd "$(dirname "$0")"

SPARK_VERSION="$(python -c 'import pyspark; print(pyspark.__version__)')"
export IT_KAFKA_BOOTSTRAP="${IT_KAFKA_BOOTSTRAP:-localhost:9092}"
export IT_MONGO_URI="${IT_MONGO_URI:-mongodb://localhost:27017/?replicaSet=rs0&directConnection=true}"
# the gated tests pick the jars up via spark.jars.packages when this
# is set (see tests/test_integration_gated.py / conftest)
export IT_SPARK_PACKAGES="org.apache.spark:spark-sql-kafka-0-10_2.13:${SPARK_VERSION},org.mongodb.spark:mongo-spark-connector_2.13:10.4.1"

cleanup() { docker compose down -v --remove-orphans >/dev/null 2>&1 || true; }
trap cleanup EXIT

docker compose up -d --wait kafka mongo
docker compose run --rm mongo-init

cd ..
python -m pytest tests/test_integration_gated.py -v -x
