"""Lake-maintenance operators: small-file compaction + data clustering.

At 100 TB the dominant cost of every query is the scan, and two layout
pathologies destroy scan performance long before any operator runs:

* **Small files.** A streaming writer (our changelog parquet sink, any
  micro-batch ingest) emits one file per partition per batch; after a
  day that is millions of KB-sized files, and a scan pays an open +
  footer-read per file. :func:`compact` rewrites a dataset into
  ~``target_file_mb`` files.
* **No value locality.** Parquet row-group min/max pruning (and page
  indexes) only skip data when values are clustered — a filter on
  ``lang='fr'`` reads everything if every file holds every language.
  :func:`compact` with ``cluster_by`` range-partitions + sorts so each
  output file covers a narrow value range, making selective scans read
  a small fraction of files (the poor man's Z-order for one key
  hierarchy).

This is the batch analog of the reference keeping RocksDB compacted
behind its state backend (``CRMLSJoiner.scala:57-59``): the engine owns
storage hygiene, not the user. Both operators are pure Spark writes —
no driver-side data movement; ``repartitionByRange`` samples the
cluster key(s) to build balanced ranges, so skewed keys still yield
even file sizes.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(df: DataFrame) -> int:
    """Total on-disk size of the files backing a (file-sourced) frame.

    Uses the file list the scan already resolved — no extra listing.
    Local paths (no scheme, or ``file:``) are sized with one ``stat``
    each; any other scheme (hdfs://, s3a://, …) goes through the
    Hadoop FileSystem API, with ONE FileSystem resolved per
    (scheme, authority) — a frame whose files span filesystems (two
    S3 endpoints, hdfs + s3a) sizes each file against its own FS
    rather than throwing Hadoop's "Wrong FS".
    """
    from urllib.parse import unquote, urlparse

    from fink_joiner_spark.fsutil import HadoopFS

    total = 0
    fs_cache: dict[tuple[str, str], HadoopFS] = {}
    for f in df.inputFiles():
        u = urlparse(f)
        if u.scheme in ("", "file"):
            # inputFiles() entries are URI-encoded (space → %20):
            # decode before stat, and fall back to the Hadoop FS API
            # for anything the decoded local stat still can't see
            p = unquote(u.path)
            if os.path.exists(p):
                total += os.path.getsize(p)
                continue
        key = (u.scheme, u.netloc)
        fs = fs_cache.get(key)
        if fs is None:
            fs = fs_cache[key] = HadoopFS(df.sparkSession, f)
        total += fs.file_bytes(f)
    return total


def compact(
    df: DataFrame,
    dest_path: str,
    target_file_mb: float = 128,
    cluster_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
) -> int:
    """Rewrite ``df``'s data as ~``target_file_mb`` parquet files at
    ``dest_path``; returns the number of output files requested.

    * plain compaction: ``repartition(n)`` — round-robin, even sizes;
    * clustered compaction: ``repartitionByRange(n, *cluster_by)`` +
      ``sortWithinPartitions`` — each file covers a narrow range of the
      cluster key(s), so row-group min/max statistics prune selective
      scans down to the few matching files.

    ``n`` is computed from the *source* size; parquet re-encodes with
    the same encodings so output sizes track input sizes closely.
    """
    n = max(1, math.ceil(dataset_bytes(df) / (target_file_mb * 1024 * 1024)))
    if cluster_by:
        out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *(sort_within or cluster_by)
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dest_path)
    return n


def compact_partitioned(
    spark: SparkSession,
    data_path: str,
    partition_col: str,
    range_cols: Sequence[str],
    target_file_mb: float = 128,
) -> int:
    """Defragment a PARTITIONED parquet dataset in place, preserving
    its ``<partition_col>=`` directory layout — the maintenance pass
    for any append-maintained index dataset (BM25 ``postings/`` by
    ``pb``, IVF ``vectors/`` by ``cell``), where every incremental fold
    appends ~one file per partition and probe latency decays into
    file-open overhead after N batches.

    Rewrite: ``repartitionByRange(n, *range_cols)`` +
    ``sortWithinPartitions`` — unlike ``repartition(n, partition_col)``
    (which hashes on the dir key alone and collapses each partition to
    ONE output file no matter how big), ranges SPLIT an oversized
    partition across several key-contiguous tasks, so the partitioned
    write emits ~``target_file_mb`` files sorted by the secondary key
    — row-group min/max stats then prune the probe's residual filter.
    Returns the number of files requested.

    The rewrite lands in a sibling ``_compacting`` directory and is
    swapped in (Spark refuses — correctly — to overwrite a path it is
    reading). All side effects (crash repair, the two-rename swap) go
    through the Hadoop FileSystem API for the DATASET's own scheme, so
    the pass behaves identically on local disk, HDFS, and S3A; as with
    every plain-parquet maintenance job here, a concurrent reader
    inside the swap window needs the Delta/Iceberg upgrade for full
    isolation (rename is copy+delete on S3A).

    Crash recovery runs BEFORE any expensive work: a leftover staged
    dir is an incomplete rewrite (drop it); a leftover ``_retired``
    dir beside live data is post-swap debris (drop it); ``_retired``
    WITHOUT live data means the crash hit between the two renames —
    roll the old data back. PER-PARTITION debris from a crashed
    partition-scoped swap (an upsert/merge's ``pb=3__retired`` INSIDE
    the dataset, :func:`fsutil.swap_partition_dirs`) is repaired too:
    read as-is it would both duplicate stale rows into the rewrite and
    flip the inferred partition-column type to string.
    """
    from fink_joiner_spark.fsutil import HadoopFS, repair_partition_dirs

    fs = HadoopFS(spark, data_path)
    staged = data_path + "_compacting"
    retired = data_path + "_retired"
    if fs.exists(retired) and not fs.exists(data_path):
        fs.rename(retired, data_path)
    fs.delete(retired)
    fs.delete(staged)
    repair_partition_dirs(fs, data_path)

    src = spark.read.parquet(data_path)
    n = max(1, math.ceil(dataset_bytes(src) / (target_file_mb * 1024 * 1024)))
    (
        src.repartitionByRange(n, partition_col, *range_cols)
        .sortWithinPartitions(partition_col, *range_cols)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(staged)
    )
    fs.rename(data_path, retired)
    fs.rename(staged, data_path)
    fs.delete(retired)
    return n


def file_count(spark: SparkSession, path: str) -> int:
    """Number of data files in a parquet dataset (hygiene metric)."""
    return len(spark.read.parquet(path).inputFiles())


def partition_stats(
    df: DataFrame, partition_col: str, hot_ratio: float = 2.0
) -> DataFrame:
    """Per-partition health of a partitioned dataset — the imbalance
    monitor behind every frozen-layout index here. An IVF index serves
    against a frozen codebook and a BM25 index against a fixed bucket
    count; both accumulate skew as streamed-in data drifts from the
    build-time distribution, and the documented maintenance cadence
    ("monitor cell sizes, retrain/rebuild offline past budget" —
    ``similarity.update_ivf_index``) needs a number to watch. This is
    that number.

    Emits one row per partition value: ``n_rows``, ``n_files`` (the
    small-files decay that :func:`compact_partitioned` fixes),
    ``skew_ratio`` = n_rows / mean-rows-per-partition, and ``hot`` —
    true when the partition exceeds ``hot_ratio``× the mean, the
    retrain/compact trigger. The hot test is exact integer arithmetic
    (``n_rows·n_parts·1e6 ≥ ratio_micro·total``), so the flag can
    never flip on a float ulp; ``skew_ratio`` itself is one division,
    rounded.

    Plan: one scan restricted to the partition column plus file names
    (both metadata-derived — no data pages read), one partial-agg
    shuffle of O(partitions) rows, and the totals broadcast back.
    Cheap enough to run after every maintenance fold.
    """
    from pyspark.sql import functions as F

    ratio_micro = round(hot_ratio * 1_000_000)
    # input_file_name() is non-deterministic to the analyzer: project
    # it BEFORE the aggregate (disallowed as an aggregate argument)
    stats = (
        df.select(F.col(partition_col), F.input_file_name().alias("_file"))
        .groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
    )
    totals = stats.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_n_parts")
    )
    return stats.crossJoin(F.broadcast(totals)).select(
        partition_col,
        "n_rows",
        "n_files",
        (
            F.round(F.col("n_rows") * F.col("_n_parts") / F.col("_total"), 6)
            + F.lit(0.0)
        ).alias("skew_ratio"),
        (
            # decimal(38,0) operands: the product n_rows·n_parts·1e6
            # exceeds long range near ~9.2e12 rows·parts (reachable at
            # the 100 TB posture) and would silently wrap with ANSI
            # off, flipping the retrain trigger — decimal arithmetic
            # keeps the comparison exact at any realistic scale
            F.col("n_rows").cast("decimal(38,0)")
            * F.col("_n_parts")
            * F.lit(1_000_000)
            >= F.lit(ratio_micro).cast("decimal(38,0)") * F.col("_total")
        ).alias("hot"),
    )


def morton_key(x, y, bits: int = 16):
    """32-bit Morton (Z-order) interleave of two ``bits``-bit integer
    columns: bit i of ``x`` lands at position 2i, bit i of ``y`` at
    2i+1. Multi-dimensional layout key for :func:`compact`'s
    ``cluster_by`` — unlike a lexicographic (x, y) sort, sorting by the
    Z-key gives files that are narrow in BOTH dimensions, so row-group
    min/max statistics prune scans filtered on either column.

    Pure integer bit arithmetic (codegen-resident, no UDF); the DuckDB
    oracle is the identical shift/mask expression.
    """
    from pyspark.sql import functions as F

    xc = x.cast("long") if hasattr(x, "cast") else F.col(x).cast("long")
    yc = y.cast("long") if hasattr(y, "cast") else F.col(y).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB expression mirroring :func:`morton_key` bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
