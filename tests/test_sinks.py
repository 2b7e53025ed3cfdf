"""Partitioned-parquet sink tests: layout, partition pruning, and
exactly-once streaming resume from a checkpoint."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_audit_sessions_example_spark.sources.audit_source import (
    read_audits,
    stream_audits,
)
from flink_audit_sessions_example_spark.sources.sinks import (
    read_partitioned_parquet,
    stream_partitioned_parquet,
    write_partitioned_parquet,
)


def _line(user, seq, ts):
    return json.dumps(
        {"reqUser": user, "evtTime": ts, "result": 0, "event_count": 1,
         "seq_num": seq}
    )


def test_batch_partitioned_write_and_pruned_read(spark, tmp_path):
    src = tmp_path / "in" / "20240101"
    src.mkdir(parents=True)
    (src / "a.log").write_text(
        "\n".join(
            _line("u", i, f"2024-01-0{d} 10:00:00.000")
            for i, d in enumerate([1, 1, 2, 3], start=1)
        )
        + "\n"
    )
    audits = read_audits(spark, str(tmp_path / "in"))
    out = str(tmp_path / "out")
    write_partitioned_parquet(audits, out, date_col="evtTime")
    # hive layout on disk
    assert sorted(
        d for d in os.listdir(out) if d.startswith("date=")
    ) == ["date=20240101", "date=20240102", "date=20240103"]
    back = read_partitioned_parquet(spark, out, min_date="20240102")
    assert back.count() == 2
    # the partition filter prunes at plan time: only 2 partition dirs scanned
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    filters_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert ">= 20240102" in filters_line


def test_streaming_sink_resumes_exactly_once(spark, tmp_path):
    src = tmp_path / "stream-in"
    day = src / "20240110"
    day.mkdir(parents=True)
    (day / "a.log").write_text(
        "\n".join(_line("u", i, "2024-01-10 09:00:00.000") for i in range(5))
        + "\n"
    )
    out, ckpt = str(tmp_path / "stream-out"), str(tmp_path / "ckpt")

    def run_once():
        q = stream_partitioned_parquet(
            stream_audits(spark, str(src)),
            out,
            date_col="evtTime",
            checkpoint_dir=ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 5
    # second file appears; resume must process ONLY the new file
    (day / "b.log").write_text(
        "\n".join(_line("v", 100 + i, "2024-01-10 11:00:00.000") for i in range(3))
        + "\n"
    )
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == 8  # 5 + 3, nothing reprocessed
    assert result.select("seq_num").distinct().count() == 8
    assert result.where(F.col("reqUser") == "u").count() == 5
