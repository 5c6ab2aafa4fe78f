"""Sinks — write-side discipline for 100 TB outputs.

The reference has no sinks of its own (in-memory batches only; its
``json_union_to_text`` exists because Arrow unions can't hit Parquet —
our union struct just writes). These helpers encode the write-side rules
that matter at scale; they are thin on purpose — ``df.write`` IS the
engine, the value is the defaults.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "write_partitioned",
    "write_bucketed",
    "estimate_files",
    "write_training_shards",
    "write_jsonl",
    "compact_parquet",
]


def _norm_partition_by(partition_by) -> tuple:
    """str -> (str,): a bare column name must not iterate char-by-char
    into partitionBy('s','p','l','i','t')."""
    if isinstance(partition_by, str):
        return (partition_by,)
    return tuple(partition_by)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    target_file_rows: Optional[int] = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partitioned parquet write with small-file control.

    ``partition_by`` should be LOW-cardinality columns (date, language,
    source) — every distinct combination becomes a directory; a
    high-cardinality partition key is the classic small-files disaster.
    ``target_file_rows`` caps rows per output file via the writer's own
    ``maxRecordsPerFile`` option: the writer rolls to a new file when the
    cap is hit — NO extra pass over the input (an earlier draft ran
    ``df.count()`` to pre-size a repartition, which reads the whole
    input twice; at 100 TB that doubles the job).
    """
    partition_by = _norm_partition_by(partition_by)
    writer = df.write.mode(mode).format(fmt)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", int(target_file_rows))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed table write (saveAsTable — bucketing needs the catalog).

    Co-locates future joins/aggregations on ``bucket_by``: two tables
    bucketed the same way join with ZERO shuffle. The right call for
    repeatedly-joined 100 TB fact tables (e.g. documents bucketed by
    doc_id joined against minhash pair output)."""
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def estimate_files(df: DataFrame, partition_by: Sequence[str] = ()) -> DataFrame:
    """Pre-flight check: how many directories/files would this write
    create? One row per partition value combo with its row count —
    eyeball it BEFORE burning a 100 TB write on a bad partition key."""
    if not partition_by:
        return df.agg(F.count("*").alias("rows"))
    return df.groupBy(*partition_by).agg(F.count("*").alias("rows"))


def write_training_shards(
    packed: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = ("split", "shard"),
    order_by: Sequence[str] = ("batch_id",),
    target_file_rows: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write a packed training set (the output of
    ``operators.split.pack_batches`` / ``pack_positions`` /
    ``pipeline.training_prep``) as trainer-ready shards:

    * one directory per ``partition_by`` combo (split purity on disk —
      a train loader never lists val files);
    * ONE write task per partition via ``repartition(partition_by)``
      (without it, every upstream task writes a sliver into every
      directory — the small-files disaster squared);
    * rows sorted by ``order_by`` *within* each file
      (``sortWithinPartitions``), so a sequential reader sees batches
      in order without a shuffle at training time;
    * ``target_file_rows`` rolls files via ``maxRecordsPerFile``.

    Shard counts bound the repartition width; at 100 TB raise
    ``shards`` upstream rather than files-per-shard here."""
    partition_by = _norm_partition_by(partition_by)
    if isinstance(order_by, str):
        order_by = (order_by,)
    cols = set(packed.columns)
    missing = [c for c in (*partition_by, *order_by) if c not in cols]
    if missing:
        raise ValueError(f"packed output lacks columns: {missing}")
    out = packed.repartition(*[F.col(c) for c in partition_by])
    out = out.sortWithinPartitions(
        *[F.col(c) for c in (*partition_by, *order_by)]
    )
    write_partitioned(
        out,
        path,
        partition_by=tuple(partition_by),
        target_file_rows=target_file_rows,
        mode=mode,
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    target_file_rows: Optional[int] = None,
    compression: Optional[str] = "gzip",
    mode: str = "overwrite",
) -> None:
    """NDJSON (json-lines) write — the interchange format most external
    training/eval tooling reads. Same small-file discipline as
    :func:`write_partitioned` (``maxRecordsPerFile``, low-cardinality
    ``partition_by``); compressed by default (text JSON is ~5-10x
    parquet's size — at 100 TB an uncompressed jsonl export is a
    storage incident, pass ``compression=None`` deliberately)."""
    partition_by = _norm_partition_by(partition_by)
    writer = df.write.mode(mode).format("json")
    if compression:
        writer = writer.option("compression", compression)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", int(target_file_rows))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact_parquet(
    spark,
    path: str,
    *,
    target_file_bytes: int = 256 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files — the maintenance
    pass every long-lived ingest target needs (streaming sinks, hourly
    appends, and CDC merges all accrete small files, and at 100 TB the
    per-file open/footer cost dominates scans long before data volume
    does).

    Sizing comes from FILE METADATA (a directory walk summing on-disk
    parquet sizes), not a data pass; the rewrite itself is
    one coalesce-shaped job into a staging directory which then
    replaces the input via a two-rename swap (same driver-mounted
    filesystem contract as :func:`~..streaming.upsert_sink`). The swap
    is NOT one atomic operation: readers racing the swap can see a
    brief missing-directory window, and a crash between the two renames
    leaves the data in ``<path>.precompact`` — the next
    ``compact_parquet`` call detects that exact state and RESTORES it
    before proceeding (a backup alongside an intact ``path`` from some
    earlier failed cleanup is removed as stale). Skips and reports when
    the directory already has fewer than ``min_files`` files.

    Hive-partitioned layouts (``key=value`` subdirectories) are
    REFUSED: a flat rewrite would silently destroy the partition
    columns and downstream pruning — compact each leaf partition
    directory instead.

    Returns ``{"files_before", "files_after", "bytes", "compacted"}``.
    """
    import math
    import os
    import re
    import shutil

    backup = path.rstrip("/") + ".precompact"
    if os.path.isdir(backup):
        if not os.path.isdir(path):
            # crash window between the two renames: the previous run
            # moved path aside but died before promoting staging —
            # restore, then compact normally
            os.rename(backup, path)
        else:
            # path is intact, so the backup is a stale leftover from a
            # crash AFTER promotion but before cleanup
            shutil.rmtree(backup, ignore_errors=True)
    total = 0
    n_files = 0
    for root, dirs, files in os.walk(path):
        for d in dirs:
            if re.fullmatch(r"[^=/]+=[^/]*", d):
                raise ValueError(
                    f"{path} is Hive-partitioned ({d}/ under {root}); a "
                    "flat compaction would silently drop the partition "
                    "layout and its pruning — compact each leaf "
                    "partition directory instead"
                )
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n_files += 1
    if n_files < min_files:
        return {
            "files_before": n_files,
            "files_after": n_files,
            "bytes": total,
            "compacted": False,
        }
    n_out = max(1, math.ceil(total / target_file_bytes))
    staging = path.rstrip("/") + ".compacting"
    # repartition, not coalesce: coalesce(1) would also collapse the
    # UPSTREAM read parallelism into one task; repartition keeps the
    # scan wide and only narrows the write
    spark.read.parquet(path).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(staging)
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(backup, path)  # restore on failure
        raise
    shutil.rmtree(backup, ignore_errors=True)
    out_files = sum(
        1
        for _r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "files_before": n_files,
        "files_after": out_files,
        "bytes": total,
        "compacted": True,
    }
