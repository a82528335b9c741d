"""Partitioned writes + partition pruning: at 100 TB, data laid out by
a coarse key (date, event type) lets a filter skip entire directories —
the single biggest scan saver.  Verified at the plan level
(PartitionFilters) and by result equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_scan(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out)
    q = back.filter(F.col("event_type") == "purchase").select("event_id", "value")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be IN the partition filters, leaving
    # no row-level filter for event_type
    assert "isnotnull(event_type" in plan or "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]

    expected = events.filter(F.col("event_type") == "purchase").count()
    assert q.count() == expected


def test_partitioned_directories_exist(spark, tmp_path):
    import os

    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert dirs == {
        "event_type=signup", "event_type=click", "event_type=purchase",
        "event_type=error", "event_type=view",
    }


def test_vector_search_filter_reaches_scan(spark):
    """$vectorSearch's `filter` must land in the parquet scan's
    PushedFilters (scoring runs after the pruned read), and the
    sort+limit must collapse to TakeOrdered — no global sort."""
    from pymongo_change_stream_reader_spark.plans.pipeline import (
        translate_pipeline,
    )

    # a cached embeddings frame from an earlier test would replace the
    # parquet scan (InMemoryTableScan has no PushedFilters section)
    spark.catalog.clearCache()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    pipe = translate_pipeline(
        [
            {
                "$vectorSearch": {
                    "path": "embedding",
                    "queryVector": [0.1] * 64,
                    "limit": 5,
                    "filter": {"label": {"$gte": 3}},
                }
            }
        ]
    )
    plan = pipe(emb)._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(label,3)" in pushed
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_curation_e2e_plan_shape(spark):
    """The composed curation pipeline's physical plan at smoke scale:
    every join broadcasts (bench grams, contamination anti-join, the
    1-row budget total), nothing falls back to a sort-merge or
    cartesian shape, and the corpus source materializes ONCE behind
    the persist barrier (consumers read InMemoryTableScan)."""
    from pymongo_change_stream_reader_spark.queries.corpus_queries import (
        _curation_kept_per,
        corpus_curation_e2e,
    )

    # the corpus-sized stage (pre-allocator: the allocator's global
    # rank localCheckpoints, truncating the visible lineage)
    per = _curation_kept_per(spark, SF_SMOKE)
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("InMemoryTableScan") >= 2  # persist barrier in use

    df = corpus_curation_e2e(spark, SF_SMOKE)
    final = df._jdf.queryExecution().executedPlan().toString()
    assert final.count("SortMergeJoin") == 0
    assert final.count("CartesianProduct") == 0
    assert df.count() > 0
