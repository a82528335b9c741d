"""Run one registered query from the CLI and print its result.

Usage:
    python tools/run_query.py <query_name> [sf_dir] [--explain]
    python tools/run_query.py --list [tag]

Examples:
    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py dedup_minhash_lsh /root/testdata/sf0.1
    python tools/run_query.py pipeline_group_agg --explain
    python tools/run_query.py --list dedup
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pymongo_change_stream_reader_spark.queries import _REGISTRY, spark_queries

    spark_queries()  # force module imports that populate the registry

    args = [a for a in sys.argv[1:] if a != "--explain"]
    explain = "--explain" in sys.argv
    specs = dict(_REGISTRY)
    if not args or args[0] == "--list":
        tag = args[1] if len(args) > 1 else None
        for name in sorted(specs):
            spec = specs[name]
            if tag and tag not in spec.tags:
                continue
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:40s} [{kind}] {', '.join(spec.tags)}")
        return 0
    name = args[0]
    if name not in specs:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    from pymongo_change_stream_reader_spark.session import get_spark

    spark = get_spark(app_name=f"run_query:{name}")
    df = specs[name].spark(spark, sf_dir)
    if explain:
        df.explain("formatted")
    df.show(50, truncate=120)
    print(f"{df.count()} rows @ {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
