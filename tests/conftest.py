"""Shared fixtures: one SparkSession per test session, DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from pymongo_change_stream_reader_spark.session import get_spark
from pymongo_change_stream_reader_spark.sources.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection mirroring the driver's oracle: every table
    pre-registered as a view over the sf parquet files."""

    def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for name in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        return con

    return connect
