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
