"""Data-layout queries: Z-order clustering + min/max file skipping.

The reference engine (a CDC relay) has no layout optimizer; this
family is part of the training-data-pipeline surface: at 100 TB the
difference between "box query touches every file" and "box query
touches the files whose min/max envelope intersects the box" IS the
query latency, and Z-ordering is what makes those envelopes tight in
more than one dimension (operators/layout.py docstring for the
mechanics).

Three registered queries:

- ``layout_zorder_box_scan`` — end-to-end value correctness under the
  hash oracle: the rows a 2-D box predicate selects from the
  Z-rewritten table are exactly the rows it selects from the original
  (a layout rewrite must never change query results).
- ``layout_zorder_skip_stats`` — the layout PROPERTY under the
  property-boolean oracle pattern (agg_approx precedent): file-level
  min/max envelopes from ``file_minmax_manifest`` show the Z layout
  pruning a second-dimension slab scan that a 1-D-sorted layout
  cannot prune at all.
- ``layout_zorder_pruned_scan`` — the planning step USED end-to-end:
  the reader consults the manifest and opens only intersecting files,
  hash-equal to the full-table oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


def _rewrite_layouts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem twice under /tmp: Z-ordered on (l_partkey,
    l_suppkey) and linearly sorted on l_partkey alone (the layout a
    single-column OPTIMIZE would produce), 32 range files each."""
    import tempfile

    from pymongo_change_stream_reader_spark.operators.layout import (
        zorder_write,
    )

    li = load_table(spark, sf_dir, "lineitem")
    z_path = tempfile.mkdtemp(prefix="spark_layout_z_")
    lin_path = tempfile.mkdtemp(prefix="spark_layout_lin_")
    zorder_write(li, z_path, ["l_partkey", "l_suppkey"], n_files=32)
    (
        li.repartitionByRange(32, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    return z_path, lin_path


@query(
    "layout_zorder_box_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 199
      AND l_suppkey BETWEEN 1 AND 10
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Z-order layout rewrite preserves query results exactly: a "
    "2-D box predicate over the Morton-clustered copy of lineitem "
    "returns the same rows (hash-verified) as the original table — "
    "the invariant any OPTIMIZE/ZORDER implementation must keep.",
    tags=("layout",),
)
def layout_zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the rewrite is one sampled range exchange (no global
    sort) + one approxQuantile pass (bounded driver state); the scan
    back pushes both range predicates into the parquet reader
    (PushedFilters) where the Z layout's tight per-file envelopes let
    footer stats skip non-intersecting files/row-groups."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.layout import (
        zorder_write,
    )

    li = load_table(spark, sf_dir, "lineitem")
    path = tempfile.mkdtemp(prefix="spark_layout_box_")
    try:
        zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=32)
        return (
            spark.read.parquet(path)
            .filter(
                F.col("l_partkey").between(100, 199)
                & F.col("l_suppkey").between(1, 10)
            )
            .select(
                "l_orderkey",
                "l_linenumber",
                "l_partkey",
                "l_suppkey",
                F.round("l_extendedprice", 2).alias("price"),
            )
            .orderBy("l_orderkey", "l_linenumber")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "layout_zorder_skip_stats",
    oracle="""
    SELECT TRUE AS layouts_complete,
           TRUE AS z_prunes_slab,
           TRUE AS linear_cannot_prune_slab,
           TRUE AS z_prunes_box
    """,
    doc="Z-order skip property under the property-boolean oracle "
    "pattern (agg_approx precedent — file counts are layout-internal "
    "numbers DuckDB cannot reproduce, so the query emits booleans "
    "whose truth is computed Spark-side from the actual per-file "
    "min/max manifests): a slab predicate on the SECOND clustered "
    "dimension (bottom-10% of l_suppkey) intersects <= 50% of the "
    "Z-layout's file envelopes (expected ~12%: the slab pins the "
    "suppkey's top bit planes of the Morton key) while intersecting "
    ">= 90% of a l_partkey-sorted layout's files (suppkey is "
    "uncorrelated with that sort, so every envelope spans the full "
    "suppkey range); a 10%x10% 2-D box intersects <= 25% of the Z "
    "files.  Both rewrites preserve row count (layouts_complete).",
    tags=("layout",),
)
def layout_zorder_skip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the manifests are |files| rows (exactly what Delta/
    Iceberg persist in their logs); envelope-vs-predicate
    intersection is evaluated on those tiny frames, never by opening
    data files — the same planning step a lakehouse scan does."""
    import shutil

    from pymongo_change_stream_reader_spark.operators.layout import (
        file_minmax_manifest,
    )

    li = load_table(spark, sf_dir, "lineitem")
    n_rows = li.count()
    # slab/box bounds as fractions of the observed key ranges, so the
    # property holds at every SF (2 scalar rows collected)
    b = li.agg(
        F.min("l_partkey").alias("p_lo"),
        F.max("l_partkey").alias("p_hi"),
        F.min("l_suppkey").alias("s_lo"),
        F.max("l_suppkey").alias("s_hi"),
    ).collect()[0]
    s_cut = b["s_lo"] + 0.10 * (b["s_hi"] - b["s_lo"])
    p_cut = b["p_lo"] + 0.10 * (b["p_hi"] - b["p_lo"])
    z_path, lin_path = _rewrite_layouts(spark, sf_dir)
    try:
        cols = ["l_partkey", "l_suppkey"]
        man_z = file_minmax_manifest(spark, z_path, cols)
        man_lin = file_minmax_manifest(spark, lin_path, cols)

        def frac(man: DataFrame, pred) -> float:
            counts = man.agg(
                F.count("*").alias("n"),
                F.sum(pred.cast("int")).alias("hit"),
            ).collect()[0]
            return counts["hit"] / counts["n"]

        slab = F.col("l_suppkey_min") <= s_cut  # envelope meets slab
        box = (F.col("l_suppkey_min") <= s_cut) & (
            F.col("l_partkey_min") <= p_cut
        )
        z_slab, lin_slab = frac(man_z, slab), frac(man_lin, slab)
        z_box = frac(man_z, box)
        complete = (
            spark.read.parquet(z_path).count() == n_rows
            and spark.read.parquet(lin_path).count() == n_rows
        )
        return spark.createDataFrame(
            [
                (
                    bool(complete),
                    bool(z_slab <= 0.50),
                    bool(lin_slab >= 0.90),
                    bool(z_box <= 0.25),
                )
            ],
            "layouts_complete BOOLEAN, z_prunes_slab BOOLEAN, "
            "linear_cannot_prune_slab BOOLEAN, z_prunes_box BOOLEAN",
        )
    finally:
        shutil.rmtree(z_path, ignore_errors=True)
        shutil.rmtree(lin_path, ignore_errors=True)


@query(
    "layout_zorder_pruned_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 199
      AND l_suppkey BETWEEN 1 AND 10
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Manifest-driven scan planning END-TO-END: the same 2-D box as "
    "layout_zorder_box_scan, but the reader consults the per-file "
    "min/max manifest first and OPENS only the files whose envelope "
    "intersects the box (operators/layout.py:pruned_box_scan — the "
    "step Delta/Iceberg run against their logs).  Hash-equal to the "
    "full-table oracle because envelope pruning is correct for any "
    "layout; the Z layout is what makes the surviving-file count "
    "small (the skip fraction itself is pinned Spark-side in "
    "tests/test_layout.py and layout_zorder_skip_stats).",
    tags=("layout",),
)
def layout_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the manifest filter is |files| rows (served from the
    sidecar zorder_write persisted with the data — no rebuild scan);
    the data read is the surviving subset only — the scan never lists
    or opens pruned files."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_box_scan,
        zorder_write,
    )

    li = load_table(spark, sf_dir, "lineitem")
    path = tempfile.mkdtemp(prefix="spark_layout_pruned_")
    try:
        zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=32)
        df, n_read, n_total = pruned_box_scan(
            spark, path,
            {"l_partkey": (100, 199), "l_suppkey": (1, 10)},
        )
        assert n_read <= n_total
        return (
            df.select(
                "l_orderkey",
                "l_linenumber",
                "l_partkey",
                "l_suppkey",
                F.round("l_extendedprice", 2).alias("price"),
            )
            .orderBy("l_orderkey", "l_linenumber")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "layout_zorder_pruned_scan_distributed",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 199
      AND l_suppkey BETWEEN 1 AND 10
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="The NON-SELECTIVE-box variant of manifest pruning: the "
    "survivor set stays DISTRIBUTED (pruned_box_scan with "
    "collect_files=False semi-joins input_file_name() against the "
    "manifest's surviving files) so the driver never materializes a "
    "path list — at ~1M files a non-selective box's collected list is "
    "~100 MB of driver strings.  Hash-equal to the same full-table "
    "oracle as layout_zorder_pruned_scan: both plans must select "
    "exactly the box's rows.",
    tags=("layout",),
)
def layout_zorder_pruned_scan_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale: file listing stays Spark-side; the exact box predicate
    is still pushed to the parquet reader (row-group skipping), and
    the manifest join drops rows of non-surviving files."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_box_scan,
        zorder_write,
    )

    li = load_table(spark, sf_dir, "lineitem")
    path = tempfile.mkdtemp(prefix="spark_layout_pruned_d_")
    try:
        zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=32)
        df, n_read, n_total = pruned_box_scan(
            spark, path,
            {"l_partkey": (100, 199), "l_suppkey": (1, 10)},
            collect_files=False,
        )
        assert n_read <= n_total
        return (
            df.select(
                "l_orderkey",
                "l_linenumber",
                "l_partkey",
                "l_suppkey",
                F.round("l_extendedprice", 2).alias("price"),
            )
            .orderBy("l_orderkey", "l_linenumber")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "layout_bloom_point_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem
                        WHERE l_orderkey >= 1000)
    ORDER BY l_linenumber
    """,
    doc="Per-file BLOOM manifest point lookup: lineitem is "
    "range-rewritten on l_orderkey (32 files), a bloom sidecar over "
    "the key is built from ONE distributed pass over just that "
    "column (operators/layout.py:bloom_file_manifest — numpy "
    "splitmix64 double hashing, |files| x 8 KiB bitmaps), and the "
    "lookup probes the manifest with a codegen'd bitmask conjunction "
    "so only the file(s) that can contain the key are opened — the "
    "skip min/max envelopes cannot give a high-cardinality point "
    "predicate.  Hash-equal to the full-table oracle because blooms "
    "have no false negatives.",
    tags=("layout",),
)
def layout_bloom_point_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the manifest is |files| rows x n_bits/8 bytes built
    reading ONLY the key column per file; the probe filters that tiny
    frame driver-side-free (bit positions are 5 ints computed once
    from the scalar key) and opens ~1 file of 32.  The pruned-file
    count is pinned in tests/test_layout.py (bloom suite)."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_point_scan,
        write_bloom_manifest,
    )

    li = load_table(spark, sf_dir, "lineitem")
    key = li.filter(F.col("l_orderkey") >= 1000).agg(
        F.min("l_orderkey")
    ).first()[0]
    path = tempfile.mkdtemp(prefix="spark_layout_bloom_")
    try:
        (
            li.repartitionByRange(32, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite")
            .parquet(path)
        )
        write_bloom_manifest(spark, path, "l_orderkey", n_bits=65536)
        df, n_read, n_total = pruned_point_scan(
            spark, path, "l_orderkey", key
        )
        assert n_read <= n_total
        return (
            df.select(
                "l_orderkey",
                "l_linenumber",
                "l_partkey",
                "l_suppkey",
                F.round("l_extendedprice", 2).alias("price"),
            )
            .orderBy("l_linenumber")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
