#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the r10/r11 operator
families (SCALING.md ledger). Process-per-arm:
``python scripts/probe_r10_sf1.py gen`` builds the missing sf1-style
EVENTS table (1M rows); then ``python scripts/probe_r10_sf1.py <op>
<sf0.1|sf1>`` times one op once.

Events generation (seeded, deterministic): 10 replicas of the real
sf0.1 events, each with a disjoint user-id block and a per-replica
fixed timestamp shift of a few minutes. That grows the KEY axis 10×
while preserving every per-user property the keyed operators cost out
on (event count, inter-arrival gaps, type mix) — the realistic way an
event log grows (more users, same behavior), unlike jittering more
events into the same users, which would inflate per-key state instead.
Docs/lineitem/part reuse the r3/r8 generated-sf1 artifacts (see
scripts/sf1_probe.py for the shingle-df-invariant document generator).

Ops: scd2, time_decay, streaks, pit, containment, unpivot, skyline.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def gen_events() -> None:
    from pyspark.sql import functions as F

    from flink_audit_sessions_example_spark.sources import load_table

    spark = _spark()
    ev = load_table(spark, SF01, "events", spread=False)
    out = ev.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("event_id") + F.col("_rep") * 10_000_000).alias("event_id"),
        # per-replica fixed shift of 137 s·rep: breaks exact ts
        # collisions across replicas without touching per-user gaps
        # NTZ like the driver's parquet (µs / isAdjustedToUTC=false) —
        # an LTZ column would trip load_table's physical-type sniffer
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.col("_rep") * 137_000_000
        ).cast("timestamp_ntz").alias("ts"),
        (F.col("user_id") + F.col("_rep") * 100_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    tmp = os.path.join(SF1, "_events_tmp")
    out.repartition(8).write.mode("overwrite").parquet(tmp)
    # load_table footer-sniffs a single FILE (ts physical-type repair),
    # so collapse the directory write into one parquet file
    import shutil

    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    table = ds.dataset(tmp, format="parquet").to_table()
    pq.write_table(table, os.path.join(SF1, "events.parquet"))
    shutil.rmtree(tmp)
    print("generated", table.num_rows, "events")
    spark.stop()


def main() -> None:
    op = sys.argv[1]
    if op == "gen":
        gen_events()
        return
    scale = sys.argv[2]
    base = SF01 if scale == "sf0.1" else SF1

    from pyspark.sql import functions as F

    from flink_audit_sessions_example_spark.sources import load_table

    spark = _spark()

    def warm(*tables):
        for t in tables:
            load_table(spark, base, t).write.format("noop").mode(
                "overwrite"
            ).save()

    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    if op == "scd2":
        warm("events")
        from flink_audit_sessions_example_spark.operators.history import (
            scd2_history,
        )

        ev = load_table(spark, base, "events").select(
            "user_id", "ts", "event_id", "event_type"
        )
        t0 = time.perf_counter()
        scd2_history(
            ev, key_cols=["user_id"], ts_col="ts",
            attr_cols=["event_type"], tiebreak_cols=["event_id"],
        ).write.format("noop").mode("overwrite").save()
    elif op == "time_decay":
        warm("events")
        from flink_audit_sessions_example_spark.operators.timeseries import (
            time_decay_stats,
        )

        ev = load_table(spark, base, "events").select(
            "user_id", "ts", "event_id", "value"
        )
        t0 = time.perf_counter()
        time_decay_stats(
            ev, key_col="user_id", ts_col="ts", value_col="value",
            tiebreak_cols=["event_id"], half_life_hours=24,
        ).write.format("noop").mode("overwrite").save()
    elif op == "streaks":
        warm("events")
        from flink_audit_sessions_example_spark.operators.timeseries import (
            activity_streaks,
        )

        ev = load_table(spark, base, "events")
        t0 = time.perf_counter()
        activity_streaks(ev, key_col="user_id", ts_col="ts").write.format(
            "noop"
        ).mode("overwrite").save()
    elif op == "pit":
        warm("events")
        from flink_audit_sessions_example_spark.operators.asof import (
            pit_join,
        )
        from flink_audit_sessions_example_spark.operators.history import (
            scd2_history,
        )

        ev = load_table(spark, base, "events")
        state = ev.where(
            F.col("event_type").isin("signup", "purchase", "error")
        ).select("user_id", "ts", "event_id", "event_type")
        dim = scd2_history(
            state, key_cols=["user_id"], ts_col="ts",
            attr_cols=["event_type"], tiebreak_cols=["event_id"],
        ).withColumnRenamed("event_type", "state")
        facts = ev.where(
            F.col("event_type").isin("view", "click")
        ).select("event_id", "ts", "user_id", "event_type", "value")
        t0 = time.perf_counter()
        pit_join(
            facts, dim, key_cols=["user_id"], ts_col="ts",
            payload_cols=["state", "version"],
        ).write.format("noop").mode("overwrite").save()
    elif op == "containment":
        warm("documents")
        from flink_audit_sessions_example_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        docs = load_table(spark, base, "documents").select(
            "doc_id", "text"
        )
        t0 = time.perf_counter()
        ngram_containment_pairs(
            docs, k=3, threshold=0.4, max_shingle_df=1000
        ).write.format("noop").mode("overwrite").save()
    elif op == "unpivot":
        warm("lineitem")
        from flink_audit_sessions_example_spark.operators.reshape import (
            unpivot_metrics,
        )

        li = load_table(spark, base, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
        t0 = time.perf_counter()
        unpivot_metrics(
            li,
            id_cols=["l_orderkey", "l_linenumber"],
            value_cols=[
                "l_quantity", "l_extendedprice", "l_discount", "l_tax"
            ],
        ).write.format("noop").mode("overwrite").save()
    elif op == "skyline":
        warm("part")
        from flink_audit_sessions_example_spark.operators.skyline import (
            skyline_2d,
        )

        part = load_table(spark, base, "part").select(
            "p_partkey", "p_retailprice", "p_size"
        )
        t0 = time.perf_counter()
        skyline_2d(
            part, min_col="p_retailprice", max_col="p_size"
        ).write.format("noop").mode("overwrite").save()
    else:
        raise SystemExit(f"unknown op {op}")
    print(f"{op} {scale} {time.perf_counter() - t0:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
