"""stream_gap_sessions (native session_window twin): boundary-semantics
golden (exactly-at-gap merges — the batch twin's strict-> contract) and
cross-micro-batch equality of FINALIZED sessions vs the batch
gap_sessions over the real events table (join key (key, session_start);
session_seq is deliberately absent from the stream — the module
docstring states why)."""

from __future__ import annotations

import datetime as dt

from flink_audit_sessions_example_spark.operators.timeseries import (
    gap_sessions,
)
from flink_audit_sessions_example_spark.streaming.gap_sessions import (
    stream_gap_sessions,
)

_SENTINEL_KEY = -999


def _run_stream(spark, tmp_path, files, gap_minutes=30):
    """Drive the twin over parquet micro-batches; returns appended
    finalized session rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir()
    sch = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us"))]
    )
    for i, chunk in enumerate(files):
        path = str(d / f"b{i}.parquet")
        pq.write_table(
            pa.Table.from_pylist(
                [{"user_id": k, "ts": t} for k, t in chunk], sch
            ),
            path,
        )
        # deterministic batch order (FileStreamSource sorts by mtime)
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    collected = []
    q = (
        stream_gap_sessions(
            stream, key_col="user_id", ts_col="ts",
            gap_minutes=gap_minutes,
        )
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not drain"
    # the sentinel exists only to push the watermark past every real
    # session's finalization point; its own session never finalizes
    return [r for r in collected if r.user_id != _SENTINEL_KEY]


def test_exactly_at_gap_merges_like_batch(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=30)),      # == gap: SAME session
        (1, base + dt.timedelta(minutes=61)),      # 31 min: NEW session
    ]
    sentinel = [(_SENTINEL_KEY, base + dt.timedelta(days=30))]
    got = {
        (r.user_id, r.session_start): (
            r.session_end, r.n_events, r.duration_secs
        )
        for r in _run_stream(spark, tmp_path, [rows, sentinel])
    }
    assert got[(1, base)] == (
        base + dt.timedelta(minutes=30), 2, 1800
    )
    assert got[(1, base + dt.timedelta(minutes=61))] == (
        base + dt.timedelta(minutes=61), 1, 0
    )
    assert len(got) == 2


def test_finalized_sessions_equal_batch_on_real_events(spark, tmp_path):
    """Two micro-batches of the real events table (+ the watermark
    sentinel): every finalized streaming session equals the batch
    relation row-for-row on (key, session_start) -> (session_end,
    n_events, duration_secs)."""
    from conftest import SF_DIR
    from flink_audit_sessions_example_spark.sources import load_table

    events = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts")
        .orderBy("ts")
        .collect()
    )
    rows = [(r.user_id, r.ts) for r in events]
    max_ts = max(t for _, t in rows)
    half = len(rows) // 2
    sentinel = [(_SENTINEL_KEY, max_ts + dt.timedelta(days=30))]
    got = {
        (r.user_id, r.session_start): (
            r.session_end, r.n_events, r.duration_secs
        )
        for r in _run_stream(
            spark, tmp_path, [rows[:half], rows[half:] + sentinel]
        )
    }
    batch = {
        (r.user_id, r.session_start): (
            r.session_end, r.n_events, r.duration_secs
        )
        for r in gap_sessions(
            spark.createDataFrame(rows, "user_id bigint, ts timestamp"),
            key_col="user_id", ts_col="ts", gap_minutes=30,
        ).collect()
    }
    assert got == batch and got
