"""Profile the composed relay's per-batch floor: sequential per-store
wall spans + per-store Spark JOB counts at a chosen event scale.

Usage: python tools/prof_composed.py [sf_dir] [target_events] [parallel]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pymongo_change_stream_reader_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    par = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark(app_name="prof_composed")

    from pyspark.sql import functions as F

    from pymongo_change_stream_reader_spark.operators.cdc import (
        filter_data_ops,
    )
    from pymongo_change_stream_reader_spark.operators.similarity import (
        write_ivf_index,
    )
    from pymongo_change_stream_reader_spark.sources.simulate import (
        simulate_change_stream,
    )
    from pymongo_change_stream_reader_spark.streaming.composed_relay import (
        composed_apply_batch,
    )

    DIM = 16

    def _emb(key_col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: F.pmod(F.xxhash64(F.col(key_col), i), F.lit(1000))
            / 500.0
            - 1.0,
        )

    ev = filter_data_ops(simulate_change_stream(spark, sf_dir))
    ev = ev.withColumn(
        "vec_key", F.expr("CAST(substring(_id._data, 4, 30) AS LONG)")
    )
    n_data = ev.count()
    pct = max(1, min(100, round(100 * target / max(1, n_data))))
    if pct < 100:
        ev = ev.filter(F.pmod(F.xxhash64("vec_key"), F.lit(100)) < pct)
    ev = ev.withColumn(
        "embedding",
        F.when(F.col("operationType") != "delete", _emb("vec_key")),
    ).withColumn(
        "fullDocument",
        F.when(
            F.col("fullDocument").isNotNull(),
            F.concat(
                F.lit('{"side": "f", "fk": "d'),
                F.pmod(F.col("vec_key"), F.lit(20)).cast("string"),
                F.lit('", '),
                F.substring(F.col("fullDocument"), 2, 1 << 30),
            ),
        ),
    ).select(
        "_id", "operationType", "clusterTime", "documentKey",
        "fullDocument", "vec_key", "embedding",
    )
    dims = spark.range(20).select(
        F.struct(
            F.concat(F.lit("dim"), F.col("id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        F.lit("insert").alias("operationType"),
        F.struct(
            F.lit(0).cast("long").alias("t"), F.lit(0).alias("i")
        ).alias("clusterTime"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias(
            "documentKey"
        ),
        F.concat(
            F.lit('{"side": "d", "dim_name": "dim'),
            F.col("id").cast("string"),
            F.lit('"}'),
        ).alias("fullDocument"),
        (F.col("id") + 10**15).alias("vec_key"),
        _emb("id").alias("embedding"),
    )
    n_batches = 3
    batches = [
        ev.filter(F.pmod(F.col("vec_key"), F.lit(n_batches)) == i)
        .unionByName(dims if i == 0 else dims.limit(0))
        .localCheckpoint(eager=True)
        for i in range(n_batches)
    ]
    n_events = sum(b.count() for b in batches)
    print(f"events={n_events} parallel={par}")

    base = tempfile.mkdtemp(prefix="prof_composed_")
    snap = spark.range(2000).select(
        (F.col("id") + 10**12).alias("vec_key")
    ).select(F.col("vec_key").alias("vec_id"), _emb("vec_key").alias("embedding"))

    def _stores(tag):
        root = os.path.join(base, tag)
        os.makedirs(os.path.join(root, "ckpt"), exist_ok=True)
        ann = os.path.join(root, "ivf")
        write_ivf_index(snap, ann, nlist=16, train_iters=1)
        return dict(
            checkpoint_dir=os.path.join(root, "ckpt"),
            replica_path=os.path.join(root, "replica"),
            dedup_index_path=os.path.join(root, "lsh"),
            dedup_flags_path=os.path.join(root, "flags"),
            bm25_index_path=os.path.join(root, "bm25"),
            ann_index_path=ann,
            ann_key_col="vec_key",
            agg_view_path=os.path.join(root, "view"),
            agg_group_path="$.k",
            agg_value_path="$.value_cents",
            agg_value_type="long",
            join_view_path=os.path.join(root, "jview"),
            join_dim_id_path=None,
        )

    tracker = spark.sparkContext.statusTracker()

    try:
        composed_apply_batch(
            batches[0].limit(200), 0, max_parallel_stores=par,
            **_stores("warm"),
        )
        kw = _stores("timed")
        timings: dict[str, float] = {}
        t0 = time.time()
        jobs0 = len(tracker.getJobIdsForGroup() or [])
        for i, b in enumerate(batches):
            per = {}
            tb = time.time()
            composed_apply_batch(
                b, i, store_timings=per, max_parallel_stores=par, **kw
            )
            print(f"batch {i}: {time.time()-tb:.2f}s "
                  + " ".join(f"{k}={v:.2f}" for k, v in sorted(per.items())))
            for k, v in per.items():
                timings[k] = timings.get(k, 0.0) + v
        total = time.time() - t0
        print(f"total={total:.2f}s events_per_s={n_events/total:.0f}")
        print("spans: " + " ".join(
            f"{k}={v:.2f}" for k, v in sorted(timings.items())))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
