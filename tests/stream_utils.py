"""Shared micro-batch stream driver for the streaming-twin tests.

ONE definition of the write-chunks → pin-mtimes → readStream →
foreachBatch-collect scaffold (it had been copied per test file —
review r11d; the mtime-determinism fix now lives here once:
FileStreamSource orders batches by MODIFICATION time, and
back-to-back writes can share an mtime at the source's granularity,
so each chunk gets a strictly increasing pinned mtime)."""

from __future__ import annotations

import os


def collect_stream_batches(
    spark,
    tmp_path,
    *,
    pa_schema,
    ddl_schema: str,
    chunks,
    make_query,
    output_mode: str,
    timeout_s: int = 600,
):
    """Write each chunk (list of dicts) as one parquet micro-batch file
    with pinned ascending mtimes, drive ``make_query(stream_df)`` with
    ``maxFilesPerTrigger=1`` + ``availableNow``, and return every row
    the query appended/updated across batches."""
    import pyarrow.parquet as pq
    from pyarrow import Table

    d = tmp_path / "stream_src"
    d.mkdir()
    for i, chunk in enumerate(chunks):
        path = str(d / f"b{i}.parquet")
        pq.write_table(Table.from_pylist(list(chunk), pa_schema), path)
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema(ddl_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    collected = []
    q = (
        make_query(stream)
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / "stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout_s), "stream did not drain"
    return collected
