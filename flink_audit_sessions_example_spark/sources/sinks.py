"""Batch/streaming parquet sinks with the date-partitioned layout.

The reference reads bare ``YYYYMMDD/`` trees (``DateFileFilter.java``);
the *production* layout this engine standardizes on for its own output is
Hive-partitioned ``date=YYYYMMDD/`` parquet — the layout Catalyst prunes
for free (`PruneFileSourcePartitions`), making every downstream date-range
query a partition-pruned scan instead of a full listing + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    date_col: str,
    mode: str = "overwrite",
) -> None:
    """Batch: write ``df`` as parquet partitioned by ``date=YYYYMMDD``
    derived from ``date_col``. Partition count per date follows the
    upstream parallelism; callers coalesce/repartition for file sizing."""
    df.withColumn(
        "date", F.date_format(F.col(date_col), "yyyyMMdd")
    ).write.partitionBy("date").mode(mode).parquet(path)


def read_partitioned_parquet(
    spark, path: str, *, min_date: str | None = None
) -> DataFrame:
    """Read the layout back; a ``min_date`` filter on the partition column
    is pruned at planning time (no files below the cutoff are listed)."""
    df = spark.read.parquet(path)
    if min_date is not None:
        df = df.where(F.col("date") >= min_date)
    return df


def stream_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    date_col: str,
    checkpoint_dir: str,
    available_now: bool = False,
    poll_seconds: int | None = None,
) -> StreamingQuery:
    """Streaming: append-mode parquet sink with the same layout —
    exactly-once file output via the checkpointed file-sink log."""
    writer = (
        df.withColumn("date", F.date_format(F.col(date_col), "yyyyMMdd"))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
        .queryName("audit-sessions-parquet")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_seconds is not None:
        writer = writer.trigger(processingTime=f"{poll_seconds} seconds")
    return writer.start()


def write_sized_parquet(
    df: DataFrame,
    path: str,
    *,
    bucket_key: str,
    partition_cols: "list[str] | tuple[str, ...]" = (),
    files_per_partition: int = 1,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
    num_tasks: int | None = None,
) -> None:
    """Batch parquet writer that makes OUTPUT FILE COUNT a choice — the
    small-files fix for pipeline outputs at scale.

    The naive ``df.write.partitionBy(...)`` emits one file per (task ×
    partition value) that task happens to hold: at 1000 tasks × 200
    partition values that is up to 200k shards of a few KB each, and
    every downstream scan pays a listing + open per shard. Here each row
    is assigned ``file_id = pmod(xxhash64(bucket_key), files_per_
    partition)`` and the frame is REPARTITIONED on
    ``(partition_cols…, file_id)``, so all rows of one output file
    co-locate in exactly one task — every partition directory gets at
    most ``files_per_partition`` files (fewer when file_ids hash into
    the same task), sized by choice instead of by accident.

    ``sort_cols`` additionally sorts rows WITHIN each output task before
    writing (``sortWithinPartitions`` — no extra exchange): clustering
    by a filter column tightens parquet row-group min/max bounds so
    downstream predicate pushdown skips row groups, and sorted columns
    run-length/dictionary compress better.

    ``bucket_key`` must be a stable, roughly-uniform column (a document
    id); a skewed key would funnel rows into few files. Deterministic:
    the same input produces the identical file assignment on any
    cluster/partitioning.

    ``num_tasks`` fixes the shuffle's task count EXPLICITLY (default:
    the cluster's default parallelism). A column-only ``repartition``
    leaves the count to ``spark.sql.shuffle.partitions`` and AQE, and
    AQE's small-output coalescing can merge every (partition, file_id)
    combination into one task — collapsing each directory back to a
    single file and silently defeating the sizing (observed at test
    scale). The explicit count is exempt from coalescing.
    """
    if files_per_partition < 1:
        raise ValueError(
            f"files_per_partition must be >= 1, got {files_per_partition}"
        )
    if num_tasks is None:
        num_tasks = df.sparkSession.sparkContext.defaultParallelism
    staged = df.withColumn(
        "_file_id",
        F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(files_per_partition)),
    )
    parts = [*partition_cols, "_file_id"]
    staged = staged.repartition(num_tasks, *[F.col(c) for c in parts])
    if sort_cols:
        staged = staged.sortWithinPartitions(*sort_cols)
    (
        staged.drop("_file_id")
        .write.partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )
