"""Simulate the driver's verify pass against __spark_entry__.

Drives the repo through its real consumer surface: imports
__spark_entry__ from the repo root (as the driver does), smoke-runs
entry(spark), then runs every queries() entry at the gate scale
(sf0.01) and compares with oracle_sql() via DuckDB using the same
column-sorted, order-insensitive comparison.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from pymongo_change_stream_reader_spark.queries import release_caches
from pymongo_change_stream_reader_spark.session import get_spark
from pymongo_change_stream_reader_spark.sources.tables import TABLES
from tests.parity import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="driver_sim")

    t0 = time.time()
    flagship = entrymod.entry(spark)
    rows = flagship.collect()
    print(f"entry(): {len(rows)} rows, schema={flagship.columns} "
          f"({time.time() - t0:.1f}s)")
    assert len(rows) > 0, "entry() returned no rows"

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, con.sql(oracles[name]))
                status = "PASS" if ok else f"FAIL {msg}"
                n_pass += ok
                n_fail += not ok
            else:
                n = df.count()
                status = f"ROWS-ONLY ({n} rows)"
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 - report and continue
            status = f"ERROR {type(e).__name__}: {e}"
            n_fail += 1
        release_caches(spark)  # no cache accumulation across 146 queries
        print(f"  {name:35s} {status[:120]:120s} {time.time() - t0:5.1f}s")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
