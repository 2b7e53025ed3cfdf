#!/usr/bin/env python
"""Pre-registration bench for the r30 staged queue (the r9 protocol:
every staged key gets an operative sf0.1 baseline BEFORE it enters the
driver bench). Bench-protocol conditions: one warmed local[32]
session, noop sink, min-of-2 per key; all five keys are exec-only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
    from flink_audit_sessions_example_spark.plans.staged_r30 import (
        STAGED_R30_QUERIES,
    )
    from flink_audit_sessions_example_spark.sources import load_table

    # warm exactly the tables the five keys read
    for t in "documents events embeddings".split():
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    for key, fn in STAGED_R30_QUERIES.items():
        times = []
        for _ in range(2):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"{key} {min(times):.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
