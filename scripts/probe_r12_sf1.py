#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the two r11-drained
iterative keys still missing SCALING.md exponents (r11 verdict #6):
``dedup_keep_best`` (documents: ngram pairs → CC fixpoint → survivor
election) and ``dedup_embed_cluster`` (embeddings: cosine pairs → CC
fixpoint). probe_r11_sf1 protocol: process-per-arm,
``python scripts/probe_r12_sf1.py <keep_best|embed_cluster> <sf0.1|sf1>``
times one arm once — CONSTRUCTION-INCLUSIVE (both are iterative-
fixpoint queries; bench.py times them the same way via
ITERATIVE_QUERIES). Artifacts: the sf1_probe.py generated corpus
(50k docs / 20k vectors, shingle-df-invariant mosaic — run
``python scripts/sf1_probe.py`` once to materialize)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")


def main() -> None:
    op = sys.argv[1]
    scale = sys.argv[2]
    base = SF01 if scale == "sf0.1" else SF1

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

    from flink_audit_sessions_example_spark.sources import load_table

    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    if op == "keep_best":
        load_table(spark, base, "documents").write.format("noop").mode(
            "overwrite"
        ).save()
        from flink_audit_sessions_example_spark.plans.staged_r11 import (
            q_dedup_keep_best,
        )

        t0 = time.perf_counter()
        q_dedup_keep_best(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "embed_cluster":
        load_table(
            spark, base, "embeddings", spread=False
        ).write.format("noop").mode("overwrite").save()
        from flink_audit_sessions_example_spark.plans.staged_r12 import (
            q_dedup_embed_cluster,
        )

        t0 = time.perf_counter()
        q_dedup_embed_cluster(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    else:
        raise SystemExit(f"unknown op {op}")
    print(f"{op} {scale} {time.perf_counter() - t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
