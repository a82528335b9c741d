"""Z-order layout: Morton key arithmetic, rewrite round-trip, and the
file-skipping property the layout exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.layout import (
    file_minmax_manifest,
    zorder_key,
    zorder_write,
)

SF = "/root/testdata/sf0.001"


def _morton(px: int, py: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((px >> j) & 1) << (j * 2)
        z |= ((py >> j) & 1) << (j * 2 + 1)
    return z


def test_interleave_matches_python_morton(spark):
    # explicit 0..15 bucket ids on both dims: the column expression
    # must equal the textbook Morton interleave bit for bit
    from pymongo_change_stream_reader_spark.operators.layout import (
        _interleave,
    )

    n, bits = 16, 4
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "bx LONG, by LONG")
    out = {
        (r["bx"], r["by"]): r["z"]
        for r in df.withColumn(
            "z", _interleave([F.col("bx"), F.col("by")], bits)
        ).collect()
    }
    expect = {(x, y): _morton(x, y, bits) for x, y in rows}
    assert out == expect


def test_spread_table_composes_to_morton():
    # the table-lookup path zorder_key uses must agree with the
    # bit-twiddling spec for every 2-D bucket pair
    from pymongo_change_stream_reader_spark.operators.layout import (
        _spread_table,
    )

    bits = 4
    t = _spread_table(bits, 2)
    for x in range(1 << bits):
        for y in range(1 << bits):
            assert (t[x] << 0) + (t[y] << 1) == _morton(x, y, bits)


def test_zorder_key_orders_quantiles_not_values(spark):
    # zipfian-ish x: 99 small values and one huge outlier.  A min/max
    # width_bucket would put everything in bucket 0; quantile buckets
    # must spread the small values across the full range so the key
    # still segregates them.
    rows = [(float(i), 0.0) for i in range(99)] + [(1e12, 0.0)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    z = (
        df.withColumn("z", zorder_key(df, ["x", "y"], bits_per_dim=8))
        .select("x", "z")
        .collect()
    )
    by_x = sorted(z, key=lambda r: r["x"])
    zs = [r["z"] for r in by_x]
    assert zs == sorted(zs), "key must be monotone in x when y is constant"
    assert len(set(zs)) > 50, "quantile buckets must spread skewed values"


def test_zorder_write_roundtrip_exact(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "z")
    zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)
    key = ["l_orderkey", "l_linenumber"]
    assert (
        back.select(*key).exceptAll(li.select(*key)).count() == 0
        and li.select(*key).exceptAll(back.select(*key)).count() == 0
    )


def test_zorder_nulls_survive_and_sort_first(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 1.0), (5.0, None), (3.0, 4.0), (None, None)],
        "x DOUBLE, y DOUBLE",
    )
    with_z = df.withColumn("z", zorder_key(df, ["x", "y"], bits_per_dim=4))
    rows = with_z.collect()
    assert len(rows) == 4
    z_null_both = [r["z"] for r in rows if r["x"] is None and r["y"] is None]
    assert z_null_both == [0], "all-null row lands in the origin cell"


def test_zorder_skips_second_dimension_slab(spark, tmp_path):
    """The reason the operator exists: a slab predicate on the SECOND
    clustered column prunes most Z files while pruning nothing on a
    first-column-sorted layout."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    z_path, lin_path = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(li, z_path, ["l_partkey", "l_suppkey"], n_files=32)
    (
        li.repartitionByRange(32, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(lin_path)
    )
    b = li.agg(
        F.min("l_suppkey").alias("lo"), F.max("l_suppkey").alias("hi")
    ).collect()[0]
    s_cut = b["lo"] + 0.10 * (b["hi"] - b["lo"])

    def slab_frac(path: str) -> float:
        man = file_minmax_manifest(
            spark, path, ["l_partkey", "l_suppkey"]
        ).collect()
        hit = sum(1 for r in man if r["l_suppkey_min"] <= s_cut)
        return hit / len(man)

    z_frac, lin_frac = slab_frac(z_path), slab_frac(lin_path)
    assert lin_frac >= 0.9, f"1-D layout should not prune: {lin_frac}"
    assert z_frac <= 0.5, f"Z layout should prune the slab: {z_frac}"
    assert z_frac < lin_frac


def test_zorder_key_rejects_too_many_bits(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x DOUBLE, y DOUBLE")
    with pytest.raises(ValueError, match="bits"):
        df.withColumn(
            "z", zorder_key(df, ["x", "y"], bits_per_dim=32)
        ).collect()


def test_box_scan_pushes_both_predicates(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "z")
    zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    scan = (
        spark.read.parquet(path)
        .filter(
            F.col("l_partkey").between(100, 199)
            & F.col("l_suppkey").between(1, 5)
        )
        .select("l_orderkey")
    )
    # the default 100-char metadata truncation cuts the filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = scan._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for frag in (
        "GreaterThanOrEqual(l_partkey,100)",
        "LessThanOrEqual(l_partkey,199)",
        "GreaterThanOrEqual(l_suppkey,1)",
        "LessThanOrEqual(l_suppkey,5)",
    ):
        assert frag in pushed, (frag, pushed)
    # projection pruning: only the selected + filter columns are read
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" in read_schema
    assert "l_extendedprice" not in read_schema


def test_pruned_scan_equals_full_scan_and_skips(spark, tmp_path):
    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_box_scan,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "z")
    zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=32)
    box = {"l_partkey": (100, 149), "l_suppkey": (1, 3)}
    df, n_read, n_total = pruned_box_scan(spark, path, box)
    full = spark.read.parquet(path).filter(
        F.col("l_partkey").between(100, 149)
        & F.col("l_suppkey").between(1, 3)
    )
    key = ["l_orderkey", "l_linenumber"]
    assert df.select(*key).exceptAll(full.select(*key)).count() == 0
    assert full.select(*key).exceptAll(df.select(*key)).count() == 0
    assert n_read < n_total, (n_read, n_total)
    # a box outside every envelope opens nothing and returns nothing
    empty, n0, _ = pruned_box_scan(
        spark, path, {"l_partkey": (10**9, 10**9 + 1)}
    )
    assert n0 == 0 and empty.count() == 0


def test_manifest_sidecar_written_with_data(spark, tmp_path):
    """zorder_write persists the per-file min/max manifest as part of
    the write (footer decode only — no second scan of the data), the
    sidecar stays invisible to plain data reads, and its envelopes
    match the data-scan manifest exactly."""
    import os

    from pymongo_change_stream_reader_spark.operators.layout import (
        read_layout_manifest,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "z")
    cols = ["l_partkey", "l_suppkey"]
    zorder_write(li, path, cols, n_files=8)
    assert os.path.isdir(os.path.join(path, "_zorder_manifest"))
    man = read_layout_manifest(spark, path, cols)
    assert man is not None
    # underscore prefix: the sidecar is not table data
    assert spark.read.parquet(path).count() == li.count()

    def norm(p):
        return p.split("://")[-1].lstrip("/").replace("file:", "")

    footer = {
        norm(r["file"]): (r["l_partkey_min"], r["l_partkey_max"],
                          r["l_suppkey_min"], r["l_suppkey_max"])
        for r in man.collect()
    }
    scan = {
        norm(r["file"]): (r["l_partkey_min"], r["l_partkey_max"],
                          r["l_suppkey_min"], r["l_suppkey_max"])
        for r in file_minmax_manifest(spark, path, cols).collect()
    }
    assert footer == scan
    # no stats-less files in a fresh Spark write
    assert not any(r["__keep_always"] for r in man.collect())


def test_pruned_scan_uses_sidecar_and_distributed_path(spark, tmp_path):
    """pruned_box_scan defaults to the persisted sidecar (no rebuild)
    and its collect_files=False plan — survivor set kept distributed,
    semi-join on input_file_name() — returns the identical rows."""
    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_box_scan,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "z")
    zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=16)
    box = {"l_partkey": (100, 149), "l_suppkey": (1, 3)}
    df_c, n_c, total_c = pruned_box_scan(spark, path, box)
    df_d, n_d, total_d = pruned_box_scan(
        spark, path, box, collect_files=False
    )
    assert (n_c, total_c) == (n_d, total_d)
    key = ["l_orderkey", "l_linenumber"]
    assert df_d.select(*key).exceptAll(df_c.select(*key)).count() == 0
    assert df_c.select(*key).exceptAll(df_d.select(*key)).count() == 0
    assert 0 < n_c < total_c


# ---------------------------------------------------------------------------
# Per-file bloom manifests (point-lookup pruning)
# ---------------------------------------------------------------------------
def _bloom_table(spark, tmp_path, n_files=8):
    import pyspark.sql.functions as F

    path = str(tmp_path / "bloom_tbl")
    (
        spark.range(0, 4000)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("s"), (F.col("id") % 97).cast("string")).alias(
                "s"
            ),
        )
        .repartitionByRange(n_files, "k")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_bloom_point_scan_no_false_negatives_and_prunes(spark, tmp_path):
    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_point_scan,
        write_bloom_manifest,
    )

    path = _bloom_table(spark, tmp_path)
    write_bloom_manifest(spark, path, "k", n_bits=8192)
    # every probed key is found (no false negatives), and the
    # range layout means the true file count is 1 — blooms should
    # open only it plus rare false positives
    reads = []
    for key in (0, 1234, 2500, 3999):
        df, n_read, n_total = pruned_point_scan(spark, path, "k", key)
        rows = df.collect()
        assert [r["k"] for r in rows] == [key]
        assert n_total == 8
        reads.append(n_read)
    assert max(reads) <= 2  # 1 true file + at most 1 false positive


def test_bloom_point_scan_absent_key_reads_nearly_nothing(spark, tmp_path):
    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_point_scan,
        write_bloom_manifest,
    )

    path = _bloom_table(spark, tmp_path)
    write_bloom_manifest(spark, path, "k", n_bits=8192)
    df, n_read, n_total = pruned_point_scan(spark, path, "k", 10_000_000)
    assert df.count() == 0
    assert n_read <= 1  # absent key: only false-positive files survive


def test_bloom_string_keys(spark, tmp_path):
    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_point_scan,
        write_bloom_manifest,
    )

    path = _bloom_table(spark, tmp_path)
    write_bloom_manifest(spark, path, "s", n_bits=8192)
    df, n_read, n_total = pruned_point_scan(spark, path, "s", "s42")
    rows = df.collect()
    # s42 appears for ids 42, 139, ... spread across ALL files: the
    # bloom keeps every file (no false negatives) — correctness, not
    # pruning, is the property for a scattered key
    assert len(rows) == len([i for i in range(4000) if i % 97 == 42])
    assert all(r["s"] == "s42" for r in rows)


def test_bloom_probe_plan_is_expression_only(spark, tmp_path):
    from pymongo_change_stream_reader_spark.operators.layout import (
        bloom_file_manifest,
    )
    from pymongo_change_stream_reader_spark.operators.layout import (
        _bloom_positions,
    )
    import pyspark.sql.functions as F

    path = _bloom_table(spark, tmp_path)
    man = bloom_file_manifest(spark, path, "k", n_bits=8192).localCheckpoint()
    cond = None
    for pos in _bloom_positions(1234, 8192, 5):
        word, mask = pos >> 6, 1 << (pos & 63)
        mask = mask - (1 << 64) if mask >= (1 << 63) else mask
        c = F.element_at(F.col("bits"), word + 1).bitwiseAND(F.lit(mask)) != 0
        cond = c if cond is None else cond & c
    plan = man.filter(cond)._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_zorder_write_plus_bloom_sidecars_coexist(spark, tmp_path):
    import pyspark.sql.functions as F

    from pymongo_change_stream_reader_spark.operators.layout import (
        pruned_point_scan,
        read_bloom_manifest,
        write_bloom_manifest,
        zorder_write,
    )

    path = str(tmp_path / "z_bloom")
    df = spark.range(0, 3000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 3000).alias("y")
    )
    zorder_write(df, path, ["x", "y"], n_files=8)
    write_bloom_manifest(spark, path, "x", n_bits=8192)
    # both sidecars invisible to the table reader
    assert spark.read.parquet(path).count() == 3000
    assert read_bloom_manifest(spark, path, "x") is not None
    out, n_read, n_total = pruned_point_scan(spark, path, "x", 1500)
    assert [r["x"] for r in out.collect()] == [1500]
