"""stream_pit_enrich: stream-static PIT enrichment must equal the
batch pit_join over the same facts and dimension snapshot — per row,
across micro-batches — and preserve LEFT row counts."""

from __future__ import annotations

from conftest import SF_DIR

import pyspark.sql.functions as F

from flink_audit_sessions_example_spark.operators.asof import pit_join
from flink_audit_sessions_example_spark.operators.history import (
    scd2_history,
)
from flink_audit_sessions_example_spark.plans.staged_r11 import (
    PIT_FACT_TYPES,
    PIT_STATE_TYPES,
)
from flink_audit_sessions_example_spark.sources import load_table
from flink_audit_sessions_example_spark.streaming.enrichment import (
    stream_pit_enrich,
)


def test_stream_pit_equals_batch_pit(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    events = load_table(spark, SF_DIR, "events")
    state = events.where(
        F.col("event_type").isin(*PIT_STATE_TYPES)
    ).select("user_id", "ts", "event_id", "event_type")
    dim = scd2_history(
        state, key_cols=["user_id"], ts_col="ts",
        attr_cols=["event_type"], tiebreak_cols=["event_id"],
    ).withColumnRenamed("event_type", "state").localCheckpoint()
    facts = events.where(
        F.col("event_type").isin(*PIT_FACT_TYPES)
    ).select("event_id", "ts", "user_id", "value")

    rows = [(r.event_id, r.ts, r.user_id, r.value) for r in facts.collect()]
    d = tmp_path / "facts"
    d.mkdir()
    sch = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("value", pa.float64())]
    )
    half = len(rows) // 2
    for name, chunk in (("b1.parquet", rows[:half]),
                        ("b2.parquet", rows[half:])):
        pq.write_table(
            pa.Table.from_pylist(
                [dict(zip(("event_id", "ts", "user_id", "value"), r))
                 for r in chunk],
                sch,
            ),
            str(d / name),
        )
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    collected = []
    q = (
        stream_pit_enrich(
            stream, dim, key_cols=["user_id"], ts_col="ts",
            payload_cols=["state", "version"],
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
    got = {r.event_id: (r.state, r.version, r.valid_from) for r in collected}
    want = {
        r.event_id: (r.state, r.version, r.valid_from)
        for r in pit_join(
            facts, dim, key_cols=["user_id"], ts_col="ts",
            payload_cols=["state", "version"],
        ).collect()
    }
    assert len(collected) == len(rows)  # LEFT: every fact once
    assert got == want and got
    # the NULL-enrichment path (facts before any state) is exercised
    assert any(v[0] is None for v in got.values())
