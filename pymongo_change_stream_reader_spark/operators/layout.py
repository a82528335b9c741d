"""Multi-dimensional data layout — Z-order (Morton) clustering for
file/row-group skipping, the ``OPTIMIZE ... ZORDER BY`` analog.

Why this exists at 100 TB: a table range-sorted on ONE column prunes
scans that filter on that column and nothing else; a 2-D box predicate
(``WHERE x BETWEEN .. AND y BETWEEN ..``) on a layout sorted by ``x``
still touches every file for the ``y`` bound.  Interleaving the bits
of per-column QUANTILE buckets into one Morton key and range-writing
on that key gives every file a tight min/max envelope in EVERY
clustered dimension, so parquet footer stats (and any manifest-level
min/max index) skip the files whose envelope misses the box — the
touched-file count scales like the box's area fraction instead of its
side, turning a 100 TB scan into the handful of files that can match.

Spark-first mechanics, all JVM-side:

- per-column bucket ids come from ``approxQuantile`` cutpoints
  (Greenwald-Khanna, one pass, driver state = ``2^bits_per_dim``
  doubles per column — bounded at any scale) so skewed value
  distributions still spread uniformly across buckets (plain
  ``width_bucket`` over min/max would put 99% of a zipfian column in
  one bucket and skip nothing);
- the bucket lookup is a balanced binary-search tree of ``F.when``
  comparisons over the literal cutpoints — ~8 comparisons per row,
  whole-stage-codegen'd, no UDF and no interpreted HOF;
- bit interleave is a sum of ``shiftleft(bitwiseAND(...))`` terms —
  pure column arithmetic (``bits_per_dim * n_dims`` terms, all folded
  into one codegen'd projection);
- the write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
  — one sampled range exchange, no global sort.

The same key also feeds clustering WITHOUT a rewrite: ``zorder_key``
is an ordinary column, usable as a bucketing/clustering expression.

Reference parity: the reference engine (a CDC relay,
change_stream_reading/watch.py) has no layout optimizer; this is part
of the training-data-pipeline surface (SURVEY.md §2 extensions), with
semantics matching the published Delta Lake / Iceberg Z-order designs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "zorder_write",
    "file_minmax_manifest",
    "footer_minmax_manifest",
    "read_layout_manifest",
    "pruned_box_scan",
    "bloom_file_manifest",
    "write_bloom_manifest",
    "read_bloom_manifest",
    "pruned_point_scan",
]

_MANIFEST_DIR = "_zorder_manifest"
_BLOOM_DIR_FMT = "_bloom_manifest_{col}"


def _bucket_from_cuts(col: Column, cuts: list[float]) -> Column:
    """0-based bucket id of ``col`` among sorted quantile ``cuts``
    (= count of cuts <= col), as a balanced binary-search tree of
    ``F.when`` comparisons: ~2 * len(cuts) expression nodes but only
    ``ceil(log2(len(cuts)))`` comparisons EVALUATED per row, all
    inside whole-stage codegen.  (The obvious
    ``size(filter(cut_array, c -> c <= x))`` form is an interpreted
    higher-order function — 255 lambda calls per row cost ~15 s/rep
    on 600k rows at sf0.1; this tree benches ~10x faster.)  A null
    value fails every ``>=`` test and descends to bucket 0 — the same
    slot NULLS FIRST ordering gives."""
    x = col.cast("double")

    def rec(lo: int, hi: int) -> Column:
        # bucket id known to lie in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(x >= float(cuts[mid - 1]), rec(mid, hi)).otherwise(
            rec(lo, mid - 1)
        )

    if not cuts:
        return F.lit(0)
    return rec(0, len(cuts))


def _check_bits(bits_per_dim: int, n_dims: int) -> None:
    if bits_per_dim * n_dims > 63:
        raise ValueError(
            f"z-key needs {bits_per_dim * n_dims} bits; reduce "
            f"bits_per_dim ({bits_per_dim}) or dimensions ({n_dims})"
        )


def _interleave(buckets: list[Column], bits_per_dim: int) -> Column:
    """Morton-interleave ``bits_per_dim`` low bits of each bucket id:
    bit j of dim d lands at position ``j * n_dims + d``.  Max
    ``bits_per_dim * n_dims`` <= 63 (one signed long).

    Bit-twiddling spec / small explicit buckets only: it references
    each bucket expression ``bits_per_dim`` times, so feeding it the
    quantile-bucket expressions would blow the Catalyst tree up
    quadratically (255-literal cut array x 8 bit planes x dims —
    observed as minutes of driver-side planning).  ``zorder_key``
    instead spreads each bucket through a precomputed lookup table
    (``_spread_table``), referencing every bucket expression once."""
    n_dims = len(buckets)
    _check_bits(bits_per_dim, n_dims)
    z = F.lit(0).cast("long")
    for d, b in enumerate(buckets):
        b = b.cast("long")
        for j in range(bits_per_dim):
            z = z + F.shiftleft(
                F.shiftright(b, j).bitwiseAND(F.lit(1)), j * n_dims + d
            )
    return z


def _spread_table(bits_per_dim: int, n_dims: int) -> list[int]:
    """``table[v]`` = v's bits spread ``n_dims`` apart (bit j -> bit
    j * n_dims): the per-dim factor of the Morton key, so
    ``z = sum_d table[bucket_d] << d`` — one lookup per dim instead of
    one masked shift per (dim, bit)."""
    out = []
    for v in range(1 << bits_per_dim):
        s = 0
        for j in range(bits_per_dim):
            s |= ((v >> j) & 1) << (j * n_dims)
        out.append(s)
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
    relative_error: float = 0.01,
) -> Column:
    """Morton key column for ``df`` over numeric/temporal ``cols``.

    One ``approxQuantile`` pass per call computes the
    ``2^bits_per_dim - 1`` cutpoints of every column (driver state:
    255 doubles x n_dims at the default).  The returned Column is pure
    arithmetic — attach it with ``withColumn`` and range-write on it.
    """
    n_dims = len(cols)
    _check_bits(bits_per_dim, n_dims)
    n_buckets = 1 << bits_per_dim
    probs = [i / n_buckets for i in range(1, n_buckets)]
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    all_cuts = casted.stat.approxQuantile(cols, probs, relative_error)
    spread = F.array(
        *[F.lit(s) for s in _spread_table(bits_per_dim, n_dims)]
    )
    z = F.lit(0).cast("long")
    for d, (c, cuts) in enumerate(zip(cols, all_cuts)):
        # duplicate cutpoints (low-cardinality columns) collapse; the
        # surviving ids are then LEFT-ALIGNED onto the full bucket
        # range so the dimension's information lands in the HIGH bit
        # planes of the Morton key — otherwise a 10-distinct-value
        # column would only wiggle the low interleave bits and file
        # envelopes would not segregate on it at all
        uniq = sorted(set(cuts))
        b = _bucket_from_cuts(F.col(c), uniq)
        n_ids = len(uniq) + 1
        if n_ids < n_buckets:
            b = F.floor(b * F.lit(n_buckets) / F.lit(n_ids)).cast("long")
        # one table lookup spreads the whole bucket id: the bucket
        # expression appears ONCE in the plan (see _interleave's note)
        z = z + F.shiftleft(
            F.element_at(spread, b.cast("int") + F.lit(1)), d
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits_per_dim: int | None = None,
    write_manifest: bool = True,
) -> None:
    """Rewrite ``df`` at ``path`` clustered on the Z-order of ``cols``:
    sampled range exchange on the Morton key into ``n_files``
    partitions, key-sorted within each so parquet row-group stats are
    tight too, key dropped from the output schema.

    ``write_manifest`` (default) also persists the per-file min/max
    manifest of ``cols`` to ``<path>/_zorder_manifest`` AS PART OF THE
    WRITE — derived from the freshly written files' parquet FOOTERS
    (footer_minmax_manifest: |files| footer reads distributed over
    executors, no second pass over the data).  The underscore prefix
    keeps Spark's parquet reader from treating it as table data;
    pruned_box_scan picks it up automatically.

    ``bits_per_dim`` defaults to the resolution the LAYOUT can
    actually use: ``n_files`` envelopes only resolve ~log2(n_files)
    Morton bits plus headroom for in-file row-group stats —
    ``(log2(n_files) + 4) / n_dims`` per dim, floored at 4.  Keeping
    the cut count small also keeps the binary-search key inside
    expression codegen (measured at sf0.1: <= 31 cuts/dim evaluates
    ~4x faster than the interpreted fallback beyond it)."""
    import math

    if bits_per_dim is None:
        bits_per_dim = max(
            4, math.ceil((math.log2(max(n_files, 2)) + 4) / len(cols))
        )
    z = zorder_key(df, cols, bits_per_dim=bits_per_dim)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    if write_manifest:
        import os

        spark = df.sparkSession
        man = footer_minmax_manifest(spark, path, cols)
        man.write.mode("overwrite").parquet(
            os.path.join(path, _MANIFEST_DIR)
        )


def file_minmax_manifest(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max manifest of ``cols`` for the parquet table at
    ``path`` — the skip index a scan planner (or a human auditing a
    layout) consults: a file whose [min, max] envelope misses the
    predicate box can be skipped without opening it.  Built with one
    aggregation over the table grouped by ``input_file_name()``; at
    100 TB this produces |files| rows, and a real lakehouse would keep
    it incrementally (it is exactly what Delta/Iceberg store in their
    transaction log / manifest files)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def footer_minmax_manifest(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max manifest of ``cols`` built from the parquet
    FOOTERS alone — |files| footer reads, distributed over executors
    (mapInPandas over the file list, pyarrow metadata decode per
    file), never touching the data pages: the cheap way to produce
    the manifest AS PART OF a write instead of re-scanning the table
    (file_minmax_manifest's one-aggregation fallback).

    Emits the same (file, {c}_min, {c}_max) columns plus
    ``__keep_always``: True for a file where some required column's
    row groups lack min/max statistics WITHOUT being all-null — its
    envelope is unknown, so a planner must read it (pruning on a null
    envelope would silently drop matching rows).  An all-null column
    legitimately keeps a null envelope — no BETWEEN predicate can
    match a null, so skipping the file stays correct, matching the
    data-scan manifest's semantics."""
    import glob as _glob
    import os
    from typing import Iterator

    import pandas as pd

    table_schema = spark.read.parquet(path).select(*cols).schema
    types = {f.name: f.dataType.simpleString() for f in table_schema.fields}
    out_schema = "file STRING, " + ", ".join(
        f"`{c}_min` {types[c]}, `{c}_max` {types[c]}" for c in cols
    ) + ", __keep_always BOOLEAN"
    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    )

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                mins: dict = {c: None for c in cols}
                maxs: dict = {c: None for c in cols}
                unknown = False
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        c = col.path_in_schema
                        if c not in mins:
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            # stats absent: fine ONLY if the chunk is
                            # all-null (num_values counts non-nulls) —
                            # anything else means the envelope is
                            # unknowable and the file must be read
                            all_null = (
                                st is not None
                                and st.num_values == 0
                            )
                            if not all_null:
                                unknown = True
                            continue
                        mins[c] = (
                            st.min
                            if mins[c] is None
                            else min(mins[c], st.min)
                        )
                        maxs[c] = (
                            st.max
                            if maxs[c] is None
                            else max(maxs[c], st.max)
                        )
                row = [f]
                for c in cols:
                    row += [mins[c], maxs[c]]
                row.append(bool(unknown))
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=["file"]
                + [f"{c}_{m}" for c in cols for m in ("min", "max")]
                + ["__keep_always"],
            )

    fdf = spark.createDataFrame([(f,) for f in files], "file STRING")
    return fdf.repartition(max(1, min(len(files), 32))).mapInPandas(
        read_footers, out_schema
    )


def read_layout_manifest(
    spark, path: str, cols: list[str]
) -> DataFrame | None:
    """The manifest sidecar zorder_write persisted under
    ``<path>/_zorder_manifest``, if present AND covering ``cols``;
    None otherwise (callers fall back to building one)."""
    import os

    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    man = spark.read.parquet(mdir)
    need = {f"{c}_{m}" for c in cols for m in ("min", "max")}
    if not need.issubset(set(man.columns)):
        return None
    return man


def pruned_box_scan(
    spark,
    path: str,
    box: dict[str, tuple],
    manifest: DataFrame | None = None,
    collect_files: bool = True,
):
    """Manifest-driven scan planning: read ONLY the files whose
    min/max envelope intersects the predicate ``box``
    ({col: (lo, hi)}), then apply the exact predicate to the survivors
    — the lakehouse scan-planning step made explicit (Delta/Iceberg do
    the same against their transaction-log stats; vanilla
    ``spark.read.parquet(dir)`` only gets row-group-level skipping
    inside files it already opened).  Returns ``(df, files_read,
    files_total)`` so callers can assert the skip rate.

    ``manifest`` defaults to the sidecar zorder_write persisted with
    the data (read_layout_manifest — no rebuild), falling back to one
    data-scan rebuild (file_minmax_manifest).

    Two survivor plans:

    - ``collect_files=True`` (default): the surviving file list is
      collected and handed to the reader — zero I/O on pruned files;
      right for a SELECTIVE box, where the list is small.
    - ``collect_files=False``: the survivor set stays DISTRIBUTED —
      the scan semi-joins ``input_file_name()`` against the manifest's
      survivors, so the driver never holds a path list (at ~1M files a
      non-selective box's collected list is ~100 MB of driver
      strings).  The exact predicate is still pushed into the parquet
      reader, so footer stats skip row groups; the manifest join
      prunes rows of non-surviving files rather than skipping their
      listing.

    Correctness does not depend on the layout: a file whose envelope
    misses the box can hold no matching row, so the subset scan equals
    the full scan for ANY clustering — the LAYOUT (zorder_write) only
    decides how many files survive."""
    cols = list(box)
    if manifest is None:
        manifest = read_layout_manifest(spark, path, cols)
    if manifest is None:
        manifest = file_minmax_manifest(spark, path, cols)
    hit = None
    for c, (lo, hi) in box.items():
        h = (F.col(f"{c}_min") <= hi) & (F.col(f"{c}_max") >= lo)
        hit = h if hit is None else (hit & h)
    if "__keep_always" in manifest.columns:
        # unknown envelope (stats-less file): must be read, never pruned
        hit = F.coalesce(F.col("__keep_always"), F.lit(False)) | hit
    keep = manifest.filter(hit)
    total = manifest.count()
    pred = None
    for c, (lo, hi) in box.items():
        p = F.col(c).between(lo, hi)
        pred = p if pred is None else (pred & p)
    if not collect_files:
        n_read = keep.count()
        norm = lambda col: F.regexp_replace(col, "^file:/+", "/")
        scanned = spark.read.parquet(path).withColumn(
            "__file", norm(F.input_file_name())
        )
        survivors = keep.select(norm(F.col("file")).alias("__file"))
        df = (
            scanned.join(survivors, "__file", "semi")
            .drop("__file")
            .filter(pred)
        )
        return df, n_read, total
    files = [r["file"] for r in keep.select("file").collect()]
    if not files:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, total
    return spark.read.parquet(*files).filter(pred), len(files), total


# ---------------------------------------------------------------------------
# Per-file BLOOM manifests — the point-lookup complement to min/max.
#
# Min/max envelopes prune RANGE predicates; a point lookup on a
# high-cardinality key (doc id, order id) intersects almost every
# envelope of any layout not sorted on that key, so range stats skip
# nothing.  A tiny per-file bloom filter over the key column answers
# "can file F contain key k?" with no false negatives — exactly what
# Parquet's optional column bloom filters / Delta's file-level blooms
# store.  The manifest is |files| rows x (n_bits/8) bytes; probing it
# is a codegen'd bitmask expression over the manifest frame, and only
# the (typically 0-2) surviving files are opened.
# ---------------------------------------------------------------------------
_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_U64 = (1 << 64) - 1


def _splitmix64_int(x: int) -> int:
    """Scalar splitmix64 finalizer (public-domain mix constants) —
    the same arithmetic the numpy kernel runs, for driver-side
    probes."""
    x = (x + _SM_GAMMA) & _U64
    x = ((x ^ (x >> 30)) * _SM_M1) & _U64
    x = ((x ^ (x >> 27)) * _SM_M2) & _U64
    return x ^ (x >> 31)


def _hash_pair_int(v: int) -> tuple[int, int]:
    h1 = _splitmix64_int(v & _U64)
    h2 = _splitmix64_int((v ^ _SM_M1) & _U64)
    return h1, h2


def _hash_pair_str(v: str) -> tuple[int, int]:
    import hashlib

    d = hashlib.blake2b(v.encode("utf-8"), digest_size=16).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little"),
    )


def _bloom_positions(value, n_bits: int, n_hashes: int) -> list[int]:
    """The ``n_hashes`` bit positions of ``value`` under standard
    double hashing ``(h1 + i*h2) mod n_bits`` — the probe side runs
    this once per lookup on the driver; the build side runs the same
    arithmetic vectorized."""
    if isinstance(value, str):
        h1, h2 = _hash_pair_str(value)
    else:
        h1, h2 = _hash_pair_int(int(value))
    return [(h1 + i * h2) % n_bits for i in range(n_hashes)]


def bloom_file_manifest(
    spark,
    path: str,
    col: str,
    n_bits: int = 8192,
    n_hashes: int = 5,
) -> DataFrame:
    """Per-file bloom filters over ``col`` for the parquet table at
    ``path``: (file, bits array<long>, n_bits, n_hashes), one row per
    data file.  Distributed like footer_minmax_manifest: each task
    reads ONLY the key column of its files (pyarrow column pruning),
    hashes it (numpy-vectorized splitmix64 for integer keys, blake2b
    over the DISTINCT values otherwise — duplicates hash once), and
    sets bits in a ``n_bits/64``-long bitmap.  No shuffle, no second
    pass over other columns; |files| rows total.

    Sizing: false-positive rate ~ (1 - e^(-kn/m))^k with k=n_hashes,
    m=n_bits, n=distinct keys per file — the 8192/5 default holds
    ~1% FPR up to ~850 keys/file; size m ~ 9.6 bits per distinct key
    per file for 1%."""
    import glob as _glob
    import os
    from typing import Iterator

    import pandas as pd

    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    )
    words = n_bits // 64

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pyarrow.parquet as pq

        def mix(x):
            x = (x + np.uint64(_SM_GAMMA))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(_SM_M1)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(_SM_M2)
            return x ^ (x >> np.uint64(31))

        old = np.seterr(over="ignore")  # uint64 wrap IS the hash
        try:
            for pdf in batches:
                rows = []
                for f in pdf["file"]:
                    arr = pq.read_table(f, columns=[col]).column(0)
                    vals = arr.drop_null()
                    if pd.api.types.is_integer_dtype(vals.type.to_pandas_dtype()):
                        u = np.unique(vals.to_numpy(zero_copy_only=False)).astype(
                            np.uint64
                        )
                        h1 = mix(u)
                        h2 = mix(u ^ np.uint64(_SM_M1))
                    else:
                        pairs = [
                            _hash_pair_str(str(v))
                            for v in set(vals.to_pylist())
                        ]
                        h1 = np.array(
                            [p[0] for p in pairs], dtype=np.uint64
                        )
                        h2 = np.array(
                            [p[1] for p in pairs], dtype=np.uint64
                        )
                    bits = np.zeros(words, dtype=np.uint64)
                    for i in range(n_hashes):
                        pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                        np.bitwise_or.at(
                            bits,
                            (pos >> np.uint64(6)).astype(np.int64),
                            np.uint64(1) << (pos & np.uint64(63)),
                        )
                    rows.append((f, bits.view(np.int64).tolist()))
                yield pd.DataFrame(rows, columns=["file", "bits"])
        finally:
            np.seterr(**old)

    fdf = spark.createDataFrame([(f,) for f in files], "file STRING")
    man = fdf.repartition(max(1, min(len(files), 32))).mapInPandas(
        build, "file STRING, bits ARRAY<LONG>"
    )
    return man.select(
        "file",
        "bits",
        F.lit(n_bits).alias("n_bits"),
        F.lit(n_hashes).alias("n_hashes"),
    )


def write_bloom_manifest(
    spark, path: str, col: str, n_bits: int = 8192, n_hashes: int = 5
) -> None:
    """Persist ``bloom_file_manifest`` as a sidecar under
    ``<path>/_bloom_manifest_<col>`` (underscore prefix: invisible to
    the table's parquet reader), the bloom sibling of zorder_write's
    min/max sidecar."""
    import os

    man = bloom_file_manifest(spark, path, col, n_bits, n_hashes)
    man.write.mode("overwrite").parquet(
        os.path.join(path, _BLOOM_DIR_FMT.format(col=col))
    )


def read_bloom_manifest(spark, path: str, col: str) -> DataFrame | None:
    """The persisted bloom sidecar for ``col``, or None."""
    import os

    mdir = os.path.join(path, _BLOOM_DIR_FMT.format(col=col))
    if not os.path.isdir(mdir):
        return None
    return spark.read.parquet(mdir)


def pruned_point_scan(
    spark,
    path: str,
    col: str,
    value,
    manifest: DataFrame | None = None,
):
    """Point-lookup scan planning via the per-file blooms: compute the
    lookup key's ``n_hashes`` bit positions once on the driver (the
    key is a scalar), keep only manifest rows with ALL those bits set
    — a codegen'd bitmask conjunction over the |files|-row manifest,
    no UDF — then read just the surviving files with the exact
    ``col = value`` predicate pushed down.  Returns ``(df, files_read,
    files_total)``.

    No false negatives by bloom construction: a file containing the
    key has all its bits set, so the subset scan equals the full scan
    for ANY layout; the LAYOUT (e.g. zorder_write on the key) decides
    how many false-positive files survive."""
    manifest = (
        manifest
        if manifest is not None
        else read_bloom_manifest(spark, path, col)
    )
    if manifest is None:
        manifest = bloom_file_manifest(spark, path, col)
    first = manifest.select("n_bits", "n_hashes").first()
    n_bits, n_hashes = first["n_bits"], first["n_hashes"]
    cond = None
    for pos in _bloom_positions(value, n_bits, n_hashes):
        word, mask = pos >> 6, 1 << (pos & 63)
        # int64 view: the sign bit is just bit 63
        mask_lit = F.lit(mask - (1 << 64) if mask >= (1 << 63) else mask)
        c = (
            F.element_at(F.col("bits"), word + 1).bitwiseAND(mask_lit)
            != 0
        )
        cond = c if cond is None else (cond & c)
    keep = manifest.filter(cond)
    total = manifest.count()
    files = [r["file"] for r in keep.select("file").collect()]
    if not files:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, total
    return (
        spark.read.parquet(*files).filter(F.col(col) == value),
        len(files),
        total,
    )
